"""Perceptual-sparsity quality x throughput sweep (VERDICT r3 next #2).

The reference plugin's actual use case: an A-weighted perceptual threshold
keeps low bins across ALL partitions
(``/root/reference/extra/plugin/src/dsp/DenseConvolution.cpp:205-267``) —
a bin-structured mask that kills no whole partition, so partition-chunk
skipping buys nothing. The fused stream kernel's lane-width skipping
(``kernels.sparse_mac.build_chunk_schedule(lanes=...)``) reads only each
chunk's live low-lane prefix instead.

This tool measures, on the production config (64 ch, 10 s room-like IR,
block 512, real v5e), BOTH sides of the trade per threshold:
  - throughput (samples/s, fetch-synced steady state) + speedup vs the
    dense fused engine in the SAME process/claim,
  - quality: max-channel spectrogram RMSE vs the dense output (the
    reference's BenchmarkTab metric, ``BenchmarkTab.cpp:80-92``).

The IR is a synthetic *room-like* IR (per-octave noise with RT60 falling
from 10 s at 20 Hz to 0.6 s at 20 kHz) — the frequency-dependent decay
that makes perceptual masks bin-structured in practice; a spectrally
flat IR (bench.py's _make_parts) stays ~99% dense at -60 dB and is the
wrong test for this feature.

Writes PERCEPTUAL_SWEEP.json. Run on the TPU: python tools/bench_perceptual.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 48000
BLOCK = 512
CHANNELS = 64
IR_SECONDS = 10.0
STORAGES = ["bf16", "split"]  # fast rung + the exact (f32) class
THRESHOLDS = [-40.0, -50.0, -60.0, -70.0]
NB = 1875  # ~20 s stream: the ~26 ms fetch-sync is <7% of wall time


def room_ir(p: int, block: int, seed: int = 0) -> np.ndarray:
    """Octave-band noise IR with RT60 from 10 s (20 Hz) to 0.6 s (20 kHz)."""
    rng = np.random.default_rng(seed)
    t_len = p * block
    t = np.arange(t_len) / SR
    spec = np.fft.rfft(rng.standard_normal(t_len))
    freqs = np.fft.rfftfreq(t_len, 1 / SR)
    ir = np.zeros(t_len, np.float32)
    n_bands = 10
    for bnd in range(n_bands):
        f_lo = 20.0 * (2**bnd)
        f_hi = min(20.0 * (2 ** (bnd + 1)), SR / 2)
        rt60 = 10.0 * (0.6 / 10.0) ** (bnd / (n_bands - 1))
        band = np.zeros_like(spec)
        sel = (freqs >= f_lo) & (freqs < f_hi)
        band[sel] = spec[sel]
        ir += np.fft.irfft(band, n=t_len).astype(np.float32) * np.exp(
            -6.908 * t / rt60
        ).astype(np.float32)
    return (ir / np.abs(ir).max()).astype(np.float32)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if jax.default_backend() != "tpu":
        print("requires the TPU; skipping", file=sys.stderr)
        return

    from neojax.bench.quality import max_channel_rms_error
    from neojax.conv import convolver as cv
    from neojax.conv.partition import uniform_partition
    from neojax.conv.sparse import perceptual_mask

    p = -(-int(np.ceil(IR_SECONDS * SR / BLOCK)) // 32) * 32  # 960
    ir = room_ir(p, BLOCK)
    parts = np.asarray(uniform_partition(ir[None], BLOCK))  # [1, P, K]

    sig = jax.jit(
        lambda: jax.random.uniform(
            jax.random.PRNGKey(1), (CHANNELS, NB * BLOCK), jnp.float32, -1, 1
        )
    )()
    jax.block_until_ready(sig)

    def run(mask, storage):
        cfg = cv.PartitionedConfig(
            BLOCK, p, CHANNELS, storage=storage, mac_backend="pallas", fused=True
        )
        params = cv.filter_params(cfg, parts, sparsity=mask)
        state = cv.init_state(cfg)
        proc = jax.jit(partial(cv.process, cfg), donate_argnums=(1,))
        st, out = proc(params, state, sig)
        head = np.asarray(out[:4, : 32 * BLOCK], np.float64)
        float(jnp.sum(jnp.abs(out)))  # fetch = reliable sync on this runtime
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            st, out = proc(params, st, sig)
            float(jnp.sum(jnp.abs(out)))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        return CHANNELS * NB * BLOCK / dt, dt, head

    def spectro(x):
        # Host-side numpy STFT (complex arrays cannot ride the TPU fetch
        # path on this runtime); same frame formula as neojax.fft.stft.
        x = np.asarray(x, np.float32)
        frame, tsz, hop = 1024, 2048, 512
        nf = (x.shape[-1] - frame) // hop + 1
        frames = np.stack(
            [x[:, i * hop : i * hop + frame] for i in range(nf)], axis=1
        )
        return np.fft.rfft(frames, n=tsz, axis=-1)

    by_storage = {}
    for storage in STORAGES:
        dense_sps, dense_dt, dense_head = run(None, storage)
        dense_spec = spectro(dense_head)
        print(
            f"# dense/{storage}: {dense_sps/1e6:.1f} M samples/s "
            f"({dense_dt/NB*1e6:.1f} us/block)",
            file=sys.stderr,
        )

        points = []
        for thr in THRESHOLDS:
            mask = perceptual_mask(parts[0], SR, thr)  # [P, K] bin-structured
            density = float(mask.mean())
            sps, dt, head = run(mask, storage)
            rmse = max_channel_rms_error(dense_spec, spectro(head))
            rmse_db = 20.0 * np.log10(rmse) if rmse > 0 else -200.0
            pt = {
                "threshold_db": thr,
                "density": round(density, 4),
                "samples_per_sec": round(sps, 1),
                "us_per_block": round(dt / NB * 1e6, 1),
                "speedup_vs_dense": round(sps / dense_sps, 2),
                "spectrogram_rmse": float(rmse),
                "spectrogram_rmse_db": round(float(rmse_db), 1),
            }
            points.append(pt)
            print(
                f"# {storage} thr {thr:.0f} dB: density {density:.3f}, "
                f"{sps/1e6:.1f} M samples/s ({pt['speedup_vs_dense']}x dense), "
                f"rmse {rmse_db:.1f} dB",
                file=sys.stderr,
            )
        by_storage[storage] = {
            "dense_samples_per_sec": round(dense_sps, 1),
            "dense_us_per_block": round(dense_dt / NB * 1e6, 1),
            "points": points,
        }

    out = {
        "metric": "perceptual_sparsity_sweep_64ch_10s_room_ir_block512",
        "storages": by_storage,
    }
    print(json.dumps(out))
    with open("PERCEPTUAL_SWEEP.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
