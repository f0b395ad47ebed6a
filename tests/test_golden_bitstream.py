"""Codec bitstream format stability: frozen params + input -> frozen bytes.

Role parity: compressai's stable stream format is the reference's implicit
guarantee (model/compression.py:151-213 writes strings that any later
version must decode). Here we pin OUR container + rANS + slice-program
format: a micro compression model with committed weights must produce
byte-identical streams and bit-exact decodes across framework versions.

Regenerate (ONLY on a deliberate format bump):
    RDEIC_REGEN_GOLDEN=1 python -m pytest tests/test_golden_bitstream.py -q
"""
import hashlib
import io
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

from rdeic_tpu.models.compression import CompressionModel
from rdeic_tpu.pipeline.codec import CompressionCodec
from rdeic_tpu.utils.bitstream import read_body, write_body

DATA = Path(__file__).parent / "data" / "golden_codec.npz"
SMALL = dict(
    in_nc=8, out_nc=4, N=8, M=8, slice_num=2, slice_ch=(4, 4), codebook_size=32
)


def _build():
    model = CompressionModel(**SMALL)
    x0 = jnp.zeros((1, 8, 8, 8))
    params = model.init(
        {"params": jax.random.PRNGKey(7)}, x0, rng=jax.random.PRNGKey(8)
    )
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 8, 8, 8)) * 2.0
    return model, params, x


def _save_golden(params, x, stream_bytes, c_latent, guide_hint):
    flat = {
        "/".join(k): np.asarray(v)
        for k, v in flatten_dict(params["params"]).items()
    }
    DATA.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        DATA,
        __input__=np.asarray(x),
        __stream__=np.frombuffer(stream_bytes, np.uint8),
        __c_latent__=np.asarray(c_latent),
        __guide_hint__=np.asarray(guide_hint),
        **flat,
    )


def _load_golden():
    data = np.load(DATA)
    special = ("__input__", "__stream__", "__c_latent__", "__guide_hint__")
    params = {
        "params": unflatten_dict(
            {tuple(k.split("/")): data[k] for k in data.files if k not in special}
        )
    }
    return (
        params,
        jnp.asarray(data["__input__"]),
        data["__stream__"].tobytes(),
        data["__c_latent__"],
        data["__guide_hint__"],
    )


def _container_bytes(out):
    buf = io.BytesIO()
    write_body(buf, out["shape"], out["strings"])
    return buf.getvalue()


def test_golden_bitstream_stable():
    if os.environ.get("RDEIC_REGEN_GOLDEN") == "1" or not DATA.exists():
        model, params, x = _build()
        codec = CompressionCodec(model, params)
        out = codec.compress(x)
        cl, gh = codec.decompress(out["strings"], out["shape"])
        _save_golden(params, x, _container_bytes(out), cl, gh)
        assert DATA.exists()
        if os.environ.get("RDEIC_REGEN_GOLDEN") != "1":
            print("golden data regenerated (was absent); commit tests/data/")
        return

    params, x, want_stream, want_cl, want_gh = _load_golden()
    model = CompressionModel(**SMALL)
    codec = CompressionCodec(model, params)

    out = codec.compress(x)
    got = _container_bytes(out)
    assert hashlib.md5(got).hexdigest() == hashlib.md5(want_stream).hexdigest(), (
        "bitstream format CHANGED — if deliberate, bump the container "
        "version and regenerate with RDEIC_REGEN_GOLDEN=1"
    )

    # a frozen stream from a previous version must still decode bit-exactly
    strings, shape = read_body(io.BytesIO(want_stream))
    cl, gh = codec.decompress(strings, shape)
    np.testing.assert_array_equal(np.asarray(cl), want_cl)
    np.testing.assert_array_equal(np.asarray(gh), want_gh)
