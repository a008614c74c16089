"""Headline benchmark: 64-channel, 10 s shared-IR partitioned convolution,
streaming block 512 @ 48 kHz (BASELINE.json config #3).

Prints ONE JSON line to stdout:
  metric: samples/s/chip (output samples x channels per wall second)
  vs_baseline: real-time factor for the whole 64-channel stream
     (value / (64 ch * 48000 Hz)); the reference publishes no absolute
     numbers (BASELINE.md), so its own CLI headline metric — real-time
     factor, ``extra/cli/src/convolver.cpp:108-113`` — is the baseline axis.

Engines benchmarked (details to stderr):
  - nested:   two-level FDL mode (S=128 blocks/step; meta-FFT along the
    frame axis, elementwise partition MAC) — the throughput path.
    Each storage rung's SNR vs the f64 UPOLS oracle is measured per run
    and reported in the JSON (``snr_db_vs_f64``); the JSON is the single
    source of perf truth (README/PARITY cite it, never the other way).
  - chunked:  Toeplitz-MXU multi-block mode (same math, batched matmul)
  - hybrid:   two-stage (Gardner-style) scheduling — per-block head over the
    first S partitions + nested tail once per chunk: TRUE single-block
    (512-sample) latency at near-throughput speed (the real-time path)
  - perblock: uniform single-block streaming step (real-time baseline)

Throughput engines stream ~150 s of audio so the metric reflects
steady state: this remote-tunnel runtime adds ~28 ms of fixed dispatch +
sync latency per jit call, which would dominate a 10 s stream (the 10 s IR
/ block 512 / 64 ch *config* is unchanged; only the stream is longer).
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
    # _signal's length-invariant prefix (the shared SNR oracle depends on
    # it) holds only under partitionable threefry; pin it explicitly so a
    # config/env drift can't silently garbage the per-engine SNRs.
    jax.config.update("jax_threefry_partitionable", True)
    return jax


SR = 48000
BLOCK = 512
CHANNELS = 64
P_REAL = int(np.ceil(10.0 * SR / BLOCK))  # 938 partitions (10 s IR)


def _make_ir(p=None, block=None):
    """Time-domain bench IR: 10 s of exponentially decaying noise (the
    shape of a real reverb tail, like the WAV IRs the reference CLI
    convolves, ``extra/cli/src/convolver.cpp:60-148``)."""
    p = P_REAL if p is None else p
    block = BLOCK if block is None else block
    rng = np.random.default_rng(0)
    n = p * block
    t = np.arange(n)
    return rng.standard_normal(n) * (0.05 * np.exp(-t / (n / 4)))


def _make_parts(p, bins):
    """Partitioned spectra of the bench IR (``uniform_partition`` semantics:
    rfft of each B-sample segment zero-padded to 2B,
    ``uniform_partition.hpp:13-26``). Deriving the spectra from a real
    time-domain IR (rather than sampling random spectra) makes the exact
    convolution a plain f64 FFT convolution — so the SNR oracle can be
    evaluated at ANY stream offset, in particular in steady state."""
    b = bins - 1
    ir = _make_ir(p, b).reshape(p, b)
    seg = np.concatenate([ir, np.zeros_like(ir)], axis=-1)
    return np.fft.rfft(seg, axis=-1)[None].astype(np.complex64)


def _signal(num_blocks):
    """Test signal, generated ON DEVICE (the host->device copy of a ~2 GB
    steady-state stream over the remote tunnel dominated bench wall time).

    One fold_in key PER CHANNEL: threefry counts elements positionally, so
    the [c, :t] head is identical for every stream length — engines stream
    different nb (steady-state length varies by engine) but the SNR oracle
    sees the same 16-block prefix.
    """
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=0)
    def gen(t):
        keys = jax.vmap(
            lambda c: jax.random.fold_in(jax.random.PRNGKey(1), c)
        )(jnp.arange(CHANNELS))
        return jax.vmap(
            lambda k: jax.random.uniform(k, (t,), jnp.float32, -1, 1)
        )(keys)

    return gen(num_blocks * BLOCK)


# SNR check: _SNR_BLOCKS blocks x _SNR_CH channels of every engine's
# output vs one shared exact-f64 oracle, measured in STEADY STATE — the
# window starts at block _SNR_START, past the 938-block IR depth, so the
# delay line is fully populated. A cold-start window (r2-r4 protocol)
# systematically under-reads quantized storages: output blocks < P hold
# only the partial signal energy of the partitions streamed so far, while
# the inverse meta-FFT spreads each quantized row's noise white across
# ALL frames — the first 16 blocks see < 20% of the signal energy against
# the full row noise (measured ~6 dB low for int8, ~2 dB for DEFAULT-
# precision transforms). The reference's own tolerance checks run warmed
# convolvers (streams past the filter length,
# ``uniform_partitioned_convolver_test.cpp:59-88``), so steady state is
# the honest class measurement.
_SNR_START = 1152  # blocks; > P_REAL and a multiple of every chunk size
_SNR_BLOCKS = 16
_SNR_CH = 4


def _time(proc, params, state, sig, repeats=2):
    import jax
    import jax.numpy as jnp

    st, out = proc(params, state, sig)
    assert out.shape[-1] >= (_SNR_START + _SNR_BLOCKS) * BLOCK, (
        "stream too short for the steady-state SNR window"
    )
    head = np.asarray(
        out[:_SNR_CH, _SNR_START * BLOCK : (_SNR_START + _SNR_BLOCKS) * BLOCK],
        np.float64,
    )
    float(jnp.sum(jnp.abs(out)))  # host fetch = reliable sync
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        st, out = proc(params, st, sig)
        float(jnp.sum(jnp.abs(out)))
        times.append(time.perf_counter() - t0)
    return min(times), head


def _oracle_head():
    """Exact f64 linear convolution of the bench signal with the bench IR
    (one FFT multiply — the parts are uniform_partition spectra of a real
    time-domain IR, so the partitioned engines compute exactly this),
    sliced to the steady-state SNR window."""
    ir = _make_ir()
    sig = np.asarray(_signal(_SNR_START + _SNR_BLOCKS)[:_SNR_CH], np.float64)
    t_len = sig.shape[1]
    nfft = 1 << int(np.ceil(np.log2(t_len + ir.size)))
    out = np.fft.irfft(
        np.fft.rfft(sig, nfft) * np.fft.rfft(ir, nfft)[None], nfft
    )[:, :t_len]
    return out[:, _SNR_START * BLOCK :]


def _snr_db(head, oracle):
    err = head - oracle
    num = float(np.sum(oracle**2))
    den = float(np.sum(err**2))
    if den == 0:
        return float("inf")
    return 10.0 * np.log10(num / den)


def bench_chunked(storage="bf16", s=32, mult=16):
    jax = _setup_jax()
    import jax.numpy as jnp

    from neojax.conv import chunked
    from neojax.conv import convolver as cv

    cfg = cv.PartitionedConfig(BLOCK, P_REAL, CHANNELS, storage=storage)
    parts = _make_parts(P_REAL, cfg.num_bins)
    params = chunked.chunked_filter_params(cfg, parts, s)
    state = chunked.chunked_init_state(cfg, params)
    nb = (P_REAL - (P_REAL % s)) * mult  # ~150 s of audio (steady state)
    sig = _signal(nb)
    proc = jax.jit(
        partial(chunked.process_chunked, cfg, chunk_blocks=s), donate_argnums=(1,)
    )
    dt, head = _time(proc, params, state, sig)
    return CHANNELS * nb * BLOCK / dt, dt, nb, head, None


def bench_nested(storage="bf16", s=128, mult=16):
    jax = _setup_jax()
    import jax.numpy as jnp

    from neojax.conv import nested
    from neojax.conv import convolver as cv

    cfg = cv.PartitionedConfig(BLOCK, P_REAL, CHANNELS, storage=storage)
    parts = _make_parts(P_REAL, cfg.num_bins)
    params = nested.nested_filter_params(cfg, parts, s)
    state = nested.nested_init_state(cfg, params)
    nb = (P_REAL - (P_REAL % s)) * mult
    sig = _signal(nb)
    proc = jax.jit(partial(nested.process_nested, cfg), donate_argnums=(1,))
    dt, head = _time(proc, params, state, sig)
    return CHANNELS * nb * BLOCK / dt, dt, nb, head, None


def bench_hybrid(storage="bf16", s=64, mult=4):
    jax = _setup_jax()
    import jax.numpy as jnp

    from neojax.conv import hybrid
    from neojax.conv import convolver as cv

    cfg = cv.PartitionedConfig(BLOCK, P_REAL, CHANNELS, storage=storage)
    parts = _make_parts(P_REAL, cfg.num_bins)
    params = hybrid.hybrid_filter_params(cfg, parts, s)
    state = hybrid.hybrid_init_state(cfg, params)
    nb = (P_REAL - (P_REAL % s)) * mult
    sig = _signal(nb)
    proc = jax.jit(partial(hybrid.process_hybrid, cfg), donate_argnums=(1,))
    dt, head = _time(proc, params, state, sig)
    return CHANNELS * nb * BLOCK / dt, dt, nb, head, None


def _perblock_bytes(cfg, p, fused=False):
    """HBM bytes touched per block by the uniform per-block step: the full
    FDL read + one row write, rotated filter planes, DFT matrices, block IO.

    The fused path is the whole-stream kernel (``fused_stream``): the DFT
    matrices are fetched ONCE per stream (constant-index VMEM inputs) and
    the quant scale table lives in VMEM scratch — neither costs per-block
    HBM; the UPOLS window DMA reads each input sample twice.
    """
    lanes = cfg.block_size if cfg.use_packed else cfg.num_bins
    itemsize = {"dense": 8, "split": 4, "bf16": 2, "int16": 2, "int8": 1}[cfg.storage]
    n = cfg.transform_size
    fdl = 2 * p * cfg.channels * lanes * itemsize
    # rotated filter rows: storage-matched dtype on the fused path
    filt_item = 2 if (fused and cfg.storage in ("bf16", "int8")) else 4
    filt = 2 * p * lanes * filt_item
    if fused:
        mats = 0  # amortized across the stream (fetched once)
        io = cfg.channels * (n + cfg.block_size) * 4  # window r + block w
        scl = 0  # VMEM-resident scale table
    else:
        mats = (2 * n * lanes + 2 * lanes * n) * 4
        io = 2 * cfg.channels * cfg.block_size * 4
        scl = (2 * p * cfg.channels * 4) if cfg.storage in ("int8", "int16") else 0
    return fdl + filt + mats + io + scl


def bench_perblock(storage, mac, fused=None):
    jax = _setup_jax()
    import jax.numpy as jnp

    from neojax.conv import convolver as cv

    p = -(-P_REAL // 32) * 32  # padded for full Pallas chunks
    cfg = cv.PartitionedConfig(
        BLOCK, p, CHANNELS, storage=storage, mac_backend=mac, fused=fused
    )
    parts = _make_parts(P_REAL, cfg.num_bins)
    parts = np.concatenate(
        [parts, np.zeros((1, p - P_REAL, cfg.num_bins), np.complex64)], axis=1
    )
    params = cv.filter_params(cfg, parts)
    state = cv.init_state(cfg)
    nb = 8192  # ~87 s: amortizes the ~25 ms per-call tunnel RTT to <2 us/block
    sig = _signal(nb)
    proc = jax.jit(partial(cv.process, cfg), donate_argnums=(1,))
    dt, head = _time(proc, params, state, sig)
    from neojax.conv.convolver import _use_fused

    fu = _use_fused(cfg, params) if fused is None else fused
    return CHANNELS * nb * BLOCK / dt, dt, nb, head, _perblock_bytes(cfg, p, fu)


def bench_perblock_sparse(storage="bf16", density=0.3):
    """Per-block path with a band-limited keep-mask (IR-decay truncation
    structure): the tile-sparse MAC's HBM traffic scales with density, so
    throughput should approach dense/density (VERDICT #4's done-criterion).
    SNR vs the dense oracle is meaningless here (the masked filter is a
    different filter), so this row reports throughput only."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from neojax.conv import convolver as cv

    p = -(-P_REAL // 32) * 32
    cfg = cv.PartitionedConfig(BLOCK, p, CHANNELS, storage=storage, mac_backend="pallas")
    parts = _make_parts(P_REAL, cfg.num_bins)
    parts = np.concatenate(
        [parts, np.zeros((1, p - P_REAL, cfg.num_bins), np.complex64)], axis=1
    )
    mask = np.zeros((p, cfg.num_bins), bool)
    mask[: int(p * density)] = True
    params = cv.filter_params(cfg, parts, sparsity=mask)
    state = cv.init_state(cfg)
    nb = 8192
    sig = _signal(nb)
    proc = jax.jit(partial(cv.process, cfg), donate_argnums=(1,))
    dt, _ = _time(proc, params, state, sig)
    return CHANNELS * nb * BLOCK / dt, dt, nb, None, None


# Headline eligibility: an engine must meet the SNR class of its storage
# (vs the shared f64 UPOLS oracle) — the reference's own tolerance ladder
# translated to energy SNR on unit-range noise:
#   f32 split/dense: 1e-5 abs  (allclose.hpp:36-37)        -> >= 90 dB
#   int16 FDL:       1e-4 abs  (compressed_fdl_test.cpp)   -> >= 74 dB
#   int8 FDL:        5e-3 abs  (compressed_fdl_test.cpp)   -> >= 46 dB
#   bf16:            no reference analogue; class = its 8-bit-mantissa
#                    storage floor (eps/2 = 3.9e-3, int8-adjacent) -> >= 40 dB
# A faster row that misses its class is still reported — it just can't be
# the headline (VERDICT r2 #3).
_SNR_CLASS_DB = {"split": 90.0, "dense": 90.0, "int16": 74.0,
                 "int8": 46.0, "bf16": 40.0}


def _storage_of(name: str) -> str:
    for part in name.split("/"):
        if part in _SNR_CLASS_DB:
            return part
    return "split"


def main():
    jax = _setup_jax()
    on_tpu = jax.default_backend() == "tpu"
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    from neojax.bench.harness import (
        hbm_achievable_bytes_per_sec,
        hbm_peak_bytes_per_sec,
    )

    peak = hbm_peak_bytes_per_sec()
    achievable = hbm_achievable_bytes_per_sec() if on_tpu else None
    if achievable:
        print(f"# XLA read-stream rate (this session): "
              f"{achievable/1e9:.0f} GB/s", file=sys.stderr)
    oracle = _oracle_head()

    engines = {}
    failed = {}

    def record(name, fn):
        try:
            sps, dt, nb, head, bpb = fn()
            snr = _snr_db(head, oracle) if head is not None else None
            roof = (bpb * nb / dt / peak) if (bpb and peak) else None
            engines[name] = {
                "samples_per_sec": round(sps, 1),
                "us_per_block": round(dt / nb * 1e6, 1),
            }
            if snr is not None:
                engines[name]["snr_db_vs_f64"] = round(snr, 1)
                # Explicit class labeling (VERDICT r3 #4): a row below its
                # storage's reference SNR class says so in the artifact,
                # not just by its absence from headline eligibility.
                engines[name]["meets_snr_class"] = bool(
                    snr >= _SNR_CLASS_DB[_storage_of(name)]
                )
            if roof is not None:
                engines[name]["roofline_fraction"] = round(roof, 3)
                engines[name]["effective_gbps"] = round(bpb * nb / dt / 1e9, 1)
            msg = (
                f"# {name}: {sps/1e6:.1f} M samples/s "
                f"({dt/nb*1e6:.1f} us/block over {nb} blocks)"
            )
            if snr is not None:
                msg += f" snr {snr:.1f} dB"
            if roof is not None:
                msg += f" roofline {roof:.2f}"
            print(msg, file=sys.stderr)
        except Exception as e:
            # A broken engine must be VISIBLE in the artifact, not a
            # silently missing key (that is how BENCH_r02 shipped without
            # its sparse row): record the failure in the JSON.
            failed[name] = f"{type(e).__name__}: {e}"[:300]
            print(f"# {name} FAILED: {type(e).__name__}: {e}", file=sys.stderr)

    if on_tpu:
        record("nested/int8/S128", partial(bench_nested, "int8", 128))
        record("nested/bf16/S128", partial(bench_nested, "bf16", 128))
        record("nested/int16/S128", partial(bench_nested, "int16", 128))
        record("nested/split/S128", partial(bench_nested, "split", 128))
        record("chunked/bf16/S128", partial(bench_chunked, "bf16", 128))
        record("hybrid/bf16/S64", partial(bench_hybrid, "bf16", 64))
        record("hybrid/int8/S64", partial(bench_hybrid, "int8", 64))
        # Exact-class rows at TRUE single-block (512-sample) latency: the
        # reference's default convolver is exact f32 (allclose.hpp:36-37),
        # so the ladder needs a >=90 dB row that is not throughput-capped
        # by the uniform per-block step (VERDICT r3 #7).
        record("hybrid/split/S64", partial(bench_hybrid, "split", 64))
        record("hybrid/int16/S64", partial(bench_hybrid, "int16", 64))
        record("perblock/bf16/fused", partial(bench_perblock, "bf16", "pallas", True))
        record("perblock/int8/fused", partial(bench_perblock, "int8", "pallas", True))
        record("perblock/split/fused", partial(bench_perblock, "split", "pallas", True))
        record("perblock/bf16/pallas", partial(bench_perblock, "bf16", "pallas", False))
        record("perblock/bf16/sparse30", partial(bench_perblock_sparse, "bf16", 0.3))
    else:
        record("perblock/dense/xla", partial(bench_perblock, "dense", "xla"))

    if not engines:
        print(json.dumps({"metric": "error", "value": 0, "unit": "samples/s",
                          "vs_baseline": 0, "failed": failed}))
        return

    # Headline = fastest engine MEETING its storage's SNR class; sparse
    # rows run a reduced filter and are never eligible. Falls back to the
    # fastest dense row (flagged) if nothing qualifies.
    def _qualifies(k):
        e = engines[k]
        if "sparse" in k:
            return False
        snr = e.get("snr_db_vs_f64")
        return snr is not None and snr >= _SNR_CLASS_DB[_storage_of(k)]

    qual = [k for k in engines if _qualifies(k)]
    in_class = bool(qual)
    if not qual:
        qual = [k for k in engines if "sparse" not in k] or list(engines)
    best_key = max(qual, key=lambda k: engines[k]["samples_per_sec"])
    best = engines[best_key]["samples_per_sec"]
    print(f"# best (snr-class qualified: {in_class}): {best_key}", file=sys.stderr)

    # Session bandwidth context: the XLA read-stream loop is a REFERENCE
    # rate, not a ceiling — the kernels' big sequential DMAs can exceed it
    # (measured 553 vs ~405 GB/s). Re-probe at the end (clock ramps) and
    # record the ratio so a bad claim (slow chip) is visible in the JSON.
    if on_tpu:
        achievable = max(achievable or 0, hbm_achievable_bytes_per_sec())
        for e in engines.values():
            if "effective_gbps" in e and achievable:
                e["vs_xla_stream"] = round(
                    e["effective_gbps"] * 1e9 / achievable, 2
                )
    out = {
        "metric": "partitioned_conv_64ch_10s_ir_block512_samples_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "samples/s",
        "vs_baseline": round(best / (CHANNELS * SR), 3),
        "best_engine": best_key,
        "best_meets_snr_class": in_class,
        "engines": engines,
    }
    if achievable:
        out["xla_stream_gbps"] = round(achievable / 1e9, 1)
    if failed:
        out["failed"] = failed
    print(json.dumps(out))


if __name__ == "__main__":
    main()
