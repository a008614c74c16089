"""Round-3 device-gated pins: headline-depth SNR floors + at-scale sparse.

Closes VERDICT r2 items #1 (sparse kernel must compile AND be correct at
the production config P>=938), #3 (device SNR test at the headline
partition depth, not just P=128), and #6 (fused path's SNR floor per
storage as a tested contract, P>=512, against an f64 oracle).

Run with::

    NEOJAX_TPU_TESTS=1 python -m pytest tests/test_tpu_device_r3.py -q

Floors are set ~2 dB under values measured on v5e (2026-08; session
variance on the tunnel affects *timing*, not numerics) — a regression
that costs more than that margin is a real accuracy change.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from functools import partial

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires a real TPU device"
)

B = 512


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(11)


def _parts(rng, p, c=1):
    return (
        (rng.standard_normal((c, p, B + 1)) + 1j * rng.standard_normal((c, p, B + 1)))
        * (0.05 * np.exp(-np.arange(p) / (p / 4))[None, :, None])
    ).astype(np.complex64)


def _oracle_f64(parts, sig, b=B):
    """Exact UPOLS recurrence in host f64 (same schedule as conv.step)."""
    p = parts.shape[1]
    c, t = sig.shape
    nb = t // b
    n = 2 * b
    window = np.zeros((c, n))
    hist = np.zeros((p, c, b + 1), np.complex128)
    pf = parts[0].astype(np.complex128)
    out = np.zeros_like(sig, dtype=np.float64)
    for i in range(nb):
        window[:, :b] = window[:, b:]
        window[:, b:] = sig[:, i * b : (i + 1) * b]
        pos = i % p
        hist[pos] = np.fft.rfft(window, axis=-1)
        idx = (pos - np.arange(p)) % p
        acc = (hist[idx] * pf[:, None]).sum(0)
        out[:, i * b : (i + 1) * b] = np.fft.irfft(acc, n=n, axis=-1)[:, b:]
    return out


def _snr(out, ref):
    return 10 * np.log10(np.sum(ref**2) / max(1e-30, np.sum((out - ref) ** 2)))


# ------------------------------------------------ headline-depth nested SNR


@pytest.mark.parametrize(
    "storage,floor_db",
    [("int8", 35.0), ("bf16", 38.0), ("int16", 72.0), ("split", 90.0)],
)
def test_nested_snr_floor_at_headline_depth(rng_mod, storage, floor_db):
    """P=960 (the 10 s-IR production depth), S=128 — the exact meta-FDL
    depth the headline bench runs, where r2's int8 rung degraded to
    33.6 dB. Group-refined quant scales (nested._QUANT_GROUPS) must hold
    these floors at depth."""
    from neojax.conv import convolver as cv
    from neojax.conv import nested

    p, c, s = 960, 4, 128
    parts = _parts(rng_mod, p)
    sig_np = rng_mod.uniform(-1, 1, (c, 2 * s * B)).astype(np.float32)

    cfg = cv.PartitionedConfig(B, p, c, storage=storage)
    params = nested.nested_filter_params(cfg, parts, s)
    state = nested.nested_init_state(cfg, params)
    _, out = jax.jit(partial(nested.process_nested, cfg))(
        params, state, jnp.asarray(sig_np)
    )
    snr = _snr(np.asarray(out, np.float64), _oracle_f64(parts, sig_np))
    assert snr > floor_db, f"nested/{storage} at P=960: {snr:.1f} dB"


# ------------------------------------------------------- fused SNR floors


@pytest.mark.parametrize(
    "storage,floor_db", [("bf16", 44.0), ("int8", 38.0), ("split", 88.0)]
)
def test_fused_step_snr_floor_on_device(rng_mod, storage, floor_db):
    """The fused per-block Pallas pipeline at P=512 vs the f64 oracle —
    pins the storage-matched-matrix precision trade (VERDICT r2 weak #6)
    as a contract: bf16 matrices may cost vs f32 but must stay in the
    storage's class."""
    from neojax.conv import convolver as cv

    p, c = 512, 8
    parts = _parts(rng_mod, p)
    sig_np = rng_mod.uniform(-1, 1, (c, 24 * B)).astype(np.float32)

    cfg = cv.PartitionedConfig(
        B, p, c, storage=storage, mac_backend="pallas", fused=True
    )
    params = cv.filter_params(cfg, parts)
    state = cv.init_state(cfg)
    _, out = jax.jit(partial(cv.process, cfg))(params, state, jnp.asarray(sig_np))
    snr = _snr(np.asarray(out, np.float64), _oracle_f64(parts, sig_np))
    assert snr > floor_db, f"fused/{storage} at P=512: {snr:.1f} dB"


# ------------------------------------------- sparse MAC at production scale


def test_sparse_mac_headline_scale_on_device(rng_mod):
    """P=960, C=64, bf16 — the exact config whose compile failure hid the
    sparse row from BENCH_r02. Must compile, run, and match the dense MAC
    on the masked filter (the mask keeps the first 30% of partitions,
    the IR-truncation structure the bench row uses)."""
    from neojax.conv import fdl as fdl_lib
    from neojax.kernels.fdl_mac import choose_chunks, fdl_mac_pallas
    from neojax.kernels.sparse_mac import build_sparse_schedule, sparse_fdl_mac_pallas

    p, c, k = 960, 64, 512
    spec = rng_mod.standard_normal((2, p, c, k)).astype(np.float32) * 0.1
    planes = jnp.asarray(spec, jnp.bfloat16)
    mask = np.zeros((p, k), bool)
    mask[: int(p * 0.3)] = True
    fr_np = rng_mod.standard_normal((p, 1, k)).astype(np.float32)
    fi_np = rng_mod.standard_normal((p, 1, k)).astype(np.float32)
    fr_np[~mask[:, None, :]] = 0.0
    fi_np[~mask[:, None, :]] = 0.0

    k_tile, pc = choose_chunks(planes.dtype, p, c, k)
    sched = build_sparse_schedule(mask, pc, k_tile)

    # Rotation pos=17: rotated filter rows (the already-ring-rotated form
    # the kernel contract expects) = tiled-reversed dynamic slice.
    pos = 17
    frt = np.concatenate([fr_np[::-1], fr_np[::-1]], axis=0)
    fit = np.concatenate([fi_np[::-1], fi_np[::-1]], axis=0)
    fr_rot = jnp.asarray(frt[p - 1 - pos : 2 * p - 1 - pos])
    fi_rot = jnp.asarray(fit[p - 1 - pos : 2 * p - 1 - pos])

    sr, si = jax.jit(
        partial(sparse_fdl_mac_pallas, p_chunk=pc, k_tile=k_tile)
    )(planes, fr_rot, fi_rot, pos, jnp.asarray(sched["k_idx"]),
      jnp.asarray(sched["p_idx"]), jnp.asarray(sched["flags"]))
    lane = np.asarray(sched["lane_mask"])
    sr = np.where(lane, np.asarray(sr), 0.0)
    si = np.where(lane, np.asarray(si), 0.0)

    dr, di = jax.jit(fdl_mac_pallas)(planes, fr_rot, fi_rot)
    dr, di = np.asarray(dr), np.asarray(di)
    scale = max(np.abs(dr).max(), np.abs(di).max(), 1e-9)
    err = max(np.abs(sr - dr).max(), np.abs(si - di).max()) / scale
    assert err < 2e-4, f"sparse-vs-dense rel err {err:.2e} at P=960/C=64"


# ------------------------------------- stream kernel vs per-block kernel


@pytest.mark.parametrize("storage,tol", [("bf16", 5e-3), ("split", 1e-4), ("int8", 2e-2)])
def test_fused_stream_matches_per_block_on_device(rng_mod, storage, tol):
    """The whole-stream kernel (one pallas_call, grid over blocks) must
    reproduce the per-call fused step it replaced: same kernel math, only
    launch structure + DC/Nyquist precompute + tail-half inverse differ."""
    from neojax.conv import convolver as cv
    from neojax.conv.overlap import stream_blocks, unstream_blocks

    p, c, nb = 512, 8, 12
    parts = _parts(rng_mod, p)
    sig = jnp.asarray(rng_mod.uniform(-1, 1, (c, nb * B)), jnp.float32)

    cfg = cv.PartitionedConfig(
        B, p, c, storage=storage, mac_backend="pallas", fused=True
    )
    params = cv.filter_params(cfg, parts)

    _, out_stream = jax.jit(partial(cv.process, cfg))(
        params, cv.init_state(cfg), sig
    )

    def scan_proc(params, state, signal):
        blocks, length = stream_blocks(signal, cfg.block_size)

        def body(carry, blk):
            return cv.step(cfg, params, carry, blk)

        state, outs = jax.lax.scan(body, state, blocks)
        return state, unstream_blocks(outs, length)

    _, out_block = jax.jit(scan_proc)(params, cv.init_state(cfg), sig)
    a, b_ = np.asarray(out_stream), np.asarray(out_block)
    scale = max(1e-6, np.abs(b_).max())
    assert np.abs(a - b_).max() / scale < tol
