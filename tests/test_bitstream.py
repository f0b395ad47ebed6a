import io

from rdeic_tpu.utils.bitstream import read_body, write_body


def test_body_roundtrip(tmp_path):
    strings = [[b"hello-rans-stream"], [b"\x00\x01\x02hyper"]]
    buf = io.BytesIO()
    n = write_body(buf, (8, 12), strings)
    raw = buf.getvalue()
    assert n == len(raw)
    # header: zH, zW, n_strings big-endian uint32
    assert raw[:12] == (8).to_bytes(4, "big") + (12).to_bytes(4, "big") + (2).to_bytes(4, "big")
    out_strings, shape = read_body(io.BytesIO(raw))
    assert shape == (8, 12)
    assert out_strings == strings

    p = tmp_path / "x.bin"
    with p.open("wb") as f:
        write_body(f, (4, 4), [[b"abc"]])
    with p.open("rb") as f:
        s2, sh2 = read_body(f)
    assert s2 == [[b"abc"]] and sh2 == (4, 4)
