"""Headline benchmark: 64-channel, 10 s shared-IR partitioned convolution,
streaming block 512 @ 48 kHz (BASELINE.json config #3).

Prints ONE JSON line to stdout:
  metric: samples/s/chip (output samples x channels per wall second)
  vs_baseline: real-time factor for the whole 64-channel stream
     (value / (64 ch * 48000 Hz)); the reference publishes no absolute
     numbers (BASELINE.md), so its own CLI headline metric — real-time
     factor, ``extra/cli/src/convolver.cpp:108-113`` — is the baseline axis.

Variant breakdown goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def _setup_jax():
    import jax

    # Remote TPU compiles on this runtime can take minutes; the persistent
    # cache makes repeat bench runs start instantly.
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def bench_variant(scheme, storage, mac_backend, seconds=5.0, repeats=2):
    jax = _setup_jax()
    import jax.numpy as jnp

    from neojax.conv import convolver as cv

    sr = 48000
    block = 512
    channels = 64
    ir_seconds = 10.0
    # ceil(10s*48k/512) = 938 partitions, padded to a multiple of 32 (zero
    # filter partitions) so the Pallas MAC always gets full chunks.
    p_real = int(np.ceil(ir_seconds * sr / block))
    p = -(-p_real // 32) * 32

    cfg = cv.PartitionedConfig(
        block_size=block,
        num_partitions=p,
        channels=channels,
        scheme=scheme,
        storage=storage,
        mac_backend=mac_backend,
    )

    rng = np.random.default_rng(0)
    # Shared IR: [1, P, K] spectra (decaying reverb-like magnitudes).
    parts = (
        (rng.standard_normal((1, p_real, cfg.num_bins)) + 1j * rng.standard_normal((1, p_real, cfg.num_bins)))
        * (0.05 * np.exp(-np.arange(p_real) / (p_real / 4))[None, :, None])
    ).astype(np.complex64)
    parts = np.concatenate(
        [parts, np.zeros((1, p - p_real, cfg.num_bins), np.complex64)], axis=1
    )

    params = cv.filter_params(cfg, parts)
    state = cv.init_state(cfg)

    num_blocks = int(seconds * sr) // block
    sig = jnp.asarray(
        rng.uniform(-1, 1, (channels, num_blocks * block)), jnp.float32
    )

    proc = jax.jit(partial(cv.process, cfg), donate_argnums=(1,))

    # Warmup / compile. Synchronize via a device-side reduction fetched to
    # host — block_until_ready alone does not reliably synchronize on all
    # TPU runtimes.
    st, out = proc(params, state, sig)
    float(jnp.sum(jnp.abs(out)))

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        st, out = proc(params, st, sig)
        float(jnp.sum(jnp.abs(out)))
        times.append(time.perf_counter() - t0)

    dt = min(times)
    total_samples = channels * num_blocks * block
    return total_samples / dt, dt, num_blocks


def main():
    jax = _setup_jax()

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() == "tpu"
    print(f"# device: {dev}", file=sys.stderr)

    variants = (
        [("upols", "bf16", "pallas"), ("upols", "split", "pallas")]
        if on_tpu
        else [("upols", "dense", "xla"), ("upols", "split", "xla")]
    )
    results = {}
    for scheme, storage, mac in variants:
        try:
            sps, dt, nb = bench_variant(scheme, storage, mac)
            results[f"{scheme}/{storage}/{mac}"] = sps
            print(
                f"# {scheme}/{storage}/{mac}: "
                f"{sps/1e6:.1f} M samples/s ({dt*1e3:.1f} ms for {nb} blocks)",
                file=sys.stderr,
            )
        except Exception as e:  # keep the bench robust across platforms
            print(f"# {scheme}/{storage}/{mac} FAILED: {e}", file=sys.stderr)

    best_key = max(results, key=results.get)
    best = results[best_key]
    realtime_factor = best / (64 * 48000)
    print(f"# best: {best_key}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "partitioned_conv_64ch_10s_ir_block512_samples_per_sec_per_chip",
                "value": round(best, 1),
                "unit": "samples/s",
                "vs_baseline": round(realtime_factor, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
