"""Container-overhead accounting for the lane formats at real payloads.

Builds synthetic entropy streams with the flagship 768x512 symbol count
(10 slices x anchor/nonanchor halves, 256 coded channels at /16) whose
payload size is steered by the symbol distribution — from the extreme-
compression regime (~1 KB, Kodak rate-5-like) up to the bench's ~200 KB —
then measures, for each lane count K and the adaptive policy:

    overhead(K) = lane_container_bytes(K) - single_stream_bytes

against the single-stream host coder (the rate the RD tables are judged
on, reference model/rdeic.py:665-668). Run on CPU; the coder is the
native library. Output: markdown table for BENCHLOG + JSON.

Usage: python tools/lane_overhead_table.py [--out /tmp/lane_overhead.json]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from rdeic_tpu.entropy.coder import (  # noqa: E402
    CdfTable,
    rans_encode,
    rans_encode_interleaved,
    rans_encode_interleaved_shared,
)
from rdeic_tpu.ops import gaussian as g  # noqa: E402

# flagship 768x512: y is 256 channels at 48x32; each slice splits into a
# checkerboard anchor/nonanchor half of slice_ch * 48 * 32 / 2 symbols
SLICE_CH = [8, 8, 8, 8, 16, 16, 32, 32, 64, 64]
H16, W16 = 32, 48


def pass_sizes():
    out = []
    for ch in SLICE_CH:
        half = ch * H16 * W16 // 2
        out += [half, half]
    return out


def make_case(table: CdfTable, rng, spec):
    """Entropy knob: ("sparse", p) = mostly-zero symbols with a +-1
    fraction p (the extreme-compression regime); ("normal", s) = round
    of N(0, s) at the matching scale index."""
    sizes = pass_sizes()
    n = sum(sizes)
    scale_table = np.asarray(g.get_scale_table())
    kind, v = spec
    if kind == "sparse":
        nz = rng.random(n) < v
        sign = rng.integers(0, 2, n) * 2 - 1
        syms = np.where(nz, sign, 0).astype(np.int32)
        idx_val = 4  # a tight low scale: zeros are cheap, +-1 codable
    else:
        syms = np.round(rng.normal(0, v, n)).astype(np.int32)
        idx_val = int(np.argmin(np.abs(scale_table - max(v,
                                                         scale_table[0]))))
    idxs = np.full(n, idx_val, np.int32)
    return syms, idxs, sizes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    cdf, lengths, offsets = g.build_cdf_tables(g.get_scale_table())
    table = CdfTable(cdf, lengths, offsets)
    rng = np.random.default_rng(0)

    rows = []
    # specs chosen to land near rate-5 (~1.2 KB), rate-1 (~6 KB),
    # mid (~40 KB), and the bench's random-weight regime (~200 KB)
    for spec in (("sparse", 0.0022), ("sparse", 0.013),
                 ("normal", 0.35), ("normal", 8.0)):
        syms, idxs, sizes = make_case(table, rng, spec)
        base = len(rans_encode(syms, idxs, table))
        row = {"payload_bytes": base,
               "bpp": round(base * 8 / (768 * 512), 5)}
        for k in (2, 8, 32, 128):
            v1_payload, lane_nbytes = rans_encode_interleaved(
                syms, idxs, sizes, k, table)
            v1_total = len(v1_payload) + 4 * (k + 1)  # + header w/ sizes
            v2_total = len(rans_encode_interleaved_shared(
                syms, idxs, sizes, k, table)) + 4  # + tag-only header
            row[f"v1_k{k}_oh_pct"] = round(100 * (v1_total - base) / base, 2)
            row[f"v2_k{k}_oh_pct"] = round(100 * (v2_total - base) / base, 2)
        # the adaptive policy (codec default: 2% budget)
        budget = (base) * 2.0 / 100.0
        k = 128
        while k > 2 and 4 * k + 4 > budget:
            k //= 2
        v2_total = len(rans_encode_interleaved_shared(
            syms, idxs, sizes, k, table)) + 4
        row["auto_k"] = k
        row["auto_oh_pct"] = round(100 * (v2_total - base) / base, 2)
        rows.append(row)
        print(json.dumps(row), flush=True)

    # markdown table for BENCHLOG
    print("\n| payload | bpp | v1 K=128 | v2 K=128 | v2 K=32 | v2 K=8 "
          "| auto (K) |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['payload_bytes']/1024:.2f} KB | {r['bpp']:.4f} "
              f"| +{r['v1_k128_oh_pct']}% | +{r['v2_k128_oh_pct']}% "
              f"| +{r['v2_k32_oh_pct']}% | +{r['v2_k8_oh_pct']}% "
              f"| +{r['auto_oh_pct']}% (K={r['auto_k']}) |")
    if args.out:
        Path(args.out).write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
