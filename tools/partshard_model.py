"""Partition-sharded nested engine: measured-anchored efficiency artifact
(PARTSHARD_BENCH.json, VERDICT r4 #3).

Real multi-chip hardware is not available in this environment, so the
artifact combines:

  - MEASURED single-chip anchors (same claim, slope-timed): the nested
    engine's per-block time at the headline depth and at 4x depth — the
    slope isolates the per-meta-row (meta-FDL MAC + filter) cost, the
    intercept the depth-independent part (block + meta transforms,
    glue) that replicates across the "part" axis;
  - a MODEL for D-way partition sharding: per-device time =
    intercept + rows/D * slope + t_collectives(D), with the per-chunk
    collectives (one psum of the [2, C, K, 2S] accumulator + one
    ppermute row hand-off) costed at ICI rates;
  - the CAPACITY table — the actual point of partition sharding: meta-FDL
    bytes per device vs IR length (a 10-minute IR does not fit one v5e).

The CPU-mesh functional equivalence is tested in tests/test_partnested.py;
the dryrun exercises the sharded dataflow end-to-end.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

S = 128
ICI_GBPS = 45.0  # v5e per-direction ICI link rate (1D ring neighbour)
HBM_GB = 16.0


def measure_anchor():
    jax = bench._setup_jax()
    import jax.numpy as jnp

    from neojax.conv import convolver as cv
    from neojax.conv import nested

    def slope_us(p_real):
        cfg = cv.PartitionedConfig(bench.BLOCK, p_real, bench.CHANNELS,
                                   storage="bf16")
        parts = bench._make_parts(p_real, cfg.num_bins)
        params = nested.nested_filter_params(cfg, parts, S)
        proc = jax.jit(partial(nested.process_nested, cfg),
                       donate_argnums=(1,))
        nbs = (1024, 4096)
        walls = []
        for nb in nbs:
            sig = bench._signal(nb)
            st, out = proc(params, nested.nested_init_state(cfg, params), sig)
            float(jnp.sum(jnp.abs(out)))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                st, out = proc(params, st, sig)
                float(jnp.sum(jnp.abs(out)))
                ts.append(time.perf_counter() - t0)
            walls.append(min(ts))
        return (walls[1] - walls[0]) / (nbs[1] - nbs[0]) * 1e6

    p1 = bench.P_REAL            # 10 s IR: P2 = 8 meta rows
    p2 = 4 * bench.P_REAL        # 40 s IR: P2 = 30 meta rows
    us1 = slope_us(p1)
    us2 = slope_us(p2)
    rows1 = -(-p1 // S)
    rows2 = -(-p2 // S)
    per_row = (us2 - us1) / (rows2 - rows1)
    fixed = us1 - rows1 * per_row
    return {
        "storage": "bf16", "chunk_blocks": S,
        "us_per_block_10s": round(us1, 2),
        "us_per_block_40s": round(us2, 2),
        "us_per_block_per_meta_row": round(per_row, 3),
        "us_per_block_depth_independent": round(fixed, 2),
    }


def model(anchor):
    c, k = bench.CHANNELS, bench.BLOCK + 1
    per_row = anchor["us_per_block_per_meta_row"]
    fixed = anchor["us_per_block_depth_independent"]

    # per-chunk collectives, amortized per block (S blocks per chunk):
    # psum of the [2, C, K, 2S] f32 accumulator (ring all-reduce over D:
    # 2*(D-1)/D message volumes) + one [2, C, K, 2S] row ppermute
    acc_bytes = 2 * c * k * 2 * S * 4
    row_bytes_bf16 = 2 * c * k * 2 * S * 2

    table = {}
    for ir_seconds in (10, 60, 600):
        p_real = int(np.ceil(ir_seconds * 48000 / bench.BLOCK))
        rows = -(-p_real // S)
        meta_gb = 2 * rows * c * k * 2 * S * 2 / 1e9  # bf16 planes
        t1 = fixed + rows * per_row
        entry = {
            "meta_rows": rows,
            "meta_fdl_gb_bf16": round(meta_gb, 2),
            "fits_one_chip": bool(meta_gb < 0.8 * HBM_GB),
            "us_per_block_1chip": round(t1, 1),
        }
        for d in (2, 4, 8):
            t_coll_us = (
                (2 * (d - 1) / d * acc_bytes + row_bytes_bf16)
                / (ICI_GBPS * 1e9) * 1e6 / S
            )
            td = fixed + rows / d * per_row + t_coll_us
            entry[f"D{d}"] = {
                "us_per_block": round(td, 1),
                "speedup": round(t1 / td, 2),
                "efficiency": round(t1 / (d * td), 3),
                "meta_gb_per_device": round(meta_gb / d, 2),
            }
        table[f"ir_{ir_seconds}s"] = entry
    return table


def main():
    jax = bench._setup_jax()
    out = {"metric": "partition_sharded_nested_efficiency"}
    if jax.default_backend() == "tpu":
        anchor = measure_anchor()
        out["measured_anchor"] = anchor
        out["model"] = model(anchor)
        out["note"] = (
            "Partition sharding of the nested engine is first a CAPACITY "
            "feature (meta-FDL bytes/device fall 1/D; IRs past ~3 min do "
            "not fit one chip) and second a speedup on the depth-"
            "proportional term only — the depth-independent transforms "
            "replicate over 'part' (Amdahl), so efficiency grows with IR "
            "depth. Collectives costed at ICI neighbour rate "
            f"({ICI_GBPS:.0f} GB/s); functional equivalence is CPU-mesh "
            "tested (tests/test_partnested.py)."
        )
    else:
        out["skipped"] = "requires the TPU for the measured anchor"
    print(json.dumps(out, indent=1))
    with open("PARTSHARD_BENCH.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
