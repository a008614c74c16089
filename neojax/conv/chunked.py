"""Chunked (multi-block) partitioned convolution: the MXU throughput path.

The per-block streaming step (``conv.convolver.step``) is bound by the VPU:
each block re-reads the whole delay line for an elementwise MAC with O(1)
flops/byte. For offline/throughput workloads this module processes ``S``
blocks per step and reformulates the FDL MAC as a *batched Toeplitz matmul*
over frequency bins:

    acc[s, c, k] = sum_j filt[j, k] * spec[t + s - j, c, k]
                 = sum_m T_k[s, m] * hist[m, c, k]

where ``hist`` holds the last ``P - 1`` spectra plus the chunk's ``S`` new
ones (read ONCE per chunk — S-fold less HBM traffic than per-block
streaming) and ``T_k`` is the [S, P+S-1] Toeplitz form of filter bin k's
partition sequence, built once at filter-setup time. The contraction runs
on the MXU (batch = K bins, M = S, K = P+S-1, N = C), where the systolic
array delivers two orders of magnitude more flops than the VPU that the
per-block elementwise MAC uses. Complex arithmetic = 4 real matmuls.

Output is mathematically identical to the per-block path (same UPOLS/UPOLA
schedule; summation order differs within f32 tolerance). Latency grows to
S blocks — streaming real-time use keeps the per-block path.

Dtype policy: storage "split" contracts in f32 (Precision.HIGHEST),
"bf16" stores history + Toeplitz in bf16 and accumulates f32 on the MXU.
Shared (single-channel) filters only for now — the per-channel case would
need per-(k, c) Toeplitz batches.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from neojax.conv.convolver import PartitionedConfig, _canon_partitions
from neojax.fft import matmul_backend

__all__ = [
    "chunked_filter_params",
    "chunked_init_state",
    "process_chunked",
]


def _toeplitz(filt_plane: np.ndarray, s: int) -> np.ndarray:
    """[P, K] filter plane -> [K, S, P+S-1] Toeplitz bands.

    T[k, s, m] = filt[P-1+s-m, k] for the index in [0, P), else 0.
    """
    p, k = filt_plane.shape
    m_len = p + s - 1
    t = np.zeros((k, s, m_len), filt_plane.dtype)
    fk = filt_plane.T  # [K, P]
    for row in range(s):
        # m = P-1+row-j  for j in 0..P-1  ->  m from row to row+P-1 (reversed j)
        t[:, row, row : row + p] = fk[:, ::-1]
    return t


def chunked_filter_params(
    config: PartitionedConfig, partitions, chunk_blocks: int
) -> dict:
    """Build Toeplitz filter params for S-block chunked processing."""
    filt = _canon_partitions(config, np.asarray(partitions)).astype(np.complex64)
    if filt.shape[1] != 1:
        raise NotImplementedError("chunked mode currently requires a shared filter")
    plane = filt[:, 0, :]  # [P, K]

    dtype = jnp.bfloat16 if config.storage == "bf16" else jnp.float32
    t_re = _toeplitz(np.real(plane).astype(np.float32), chunk_blocks)
    t_im = _toeplitz(np.imag(plane).astype(np.float32), chunk_blocks)
    # Fold the complex structure into ONE real batched matmul per bin:
    #   [[Tr, -Ti], [Ti, Tr]] ([K, 2S, 2M]) @ [[Hr], [Hi]] ([K, 2M, C]).
    top = np.concatenate([t_re, -t_im], axis=2)
    bot = np.concatenate([t_im, t_re], axis=2)
    tcat = np.concatenate([top, bot], axis=1)  # [K, 2S, 2M]
    return {"tcat": jnp.asarray(tcat, dtype)}


def chunked_init_state(config: PartitionedConfig) -> dict:
    dtype = jnp.bfloat16 if config.storage == "bf16" else jnp.float32
    k = config.num_bins
    p = config.num_partitions
    c = config.channels
    return {
        "tail": jnp.zeros((c, config.block_size), jnp.float32),
        # Carried history: the last P-1 spectra, K-major for the batched
        # matmul ([K, P-1, C] per plane).
        "hist": jnp.zeros((2, k, p - 1, c), dtype),
    }


def _precision(config: PartitionedConfig):
    return lax.Precision.HIGHEST if config.storage != "bf16" else lax.Precision.DEFAULT


def process_chunked(
    config: PartitionedConfig,
    params: dict,
    state: dict,
    signal: jnp.ndarray,
    chunk_blocks: int,
):
    """Process [C, T] through the Toeplitz-MXU path, S blocks per scan step.

    T is padded up to a multiple of S*B (output trimmed; the returned state
    reflects the padded stream — use the per-block path when exact mid-
    stream state semantics matter).
    """
    b = config.block_size
    n = config.transform_size
    k = config.num_bins
    s = chunk_blocks
    hist_dtype = state["hist"].dtype

    signal = jnp.asarray(signal, jnp.float32)
    squeeze = signal.ndim == 1
    if squeeze:
        signal = signal[None]
    c, t_len = signal.shape

    num_chunks = -(-t_len // (s * b))
    padded = jnp.pad(signal, ((0, 0), (0, num_chunks * s * b - t_len)))
    # [num_chunks, S, C, B]
    blocks = jnp.moveaxis(
        padded.reshape(c, num_chunks, s, b), (1, 2), (0, 1)
    )

    prec = _precision(config)

    def chunk_step(carry, chunk):  # chunk [S, C, B]
        tail, hist = carry

        if config.scheme == "upols":
            prev = jnp.concatenate([tail[None], chunk[:-1]], axis=0)  # [S, C, B]
            frames = jnp.concatenate([prev, chunk], axis=-1)  # [S, C, 2B]
            new_tail = chunk[-1]
        else:  # upola
            frames = jnp.pad(chunk, ((0, 0), (0, 0), (0, n - b)))
            new_tail = None

        spec_re, spec_im = matmul_backend.rfft_split(frames, n)  # [S, C, K]

        # K-major new spectra: [K, S, C]
        new_re = jnp.transpose(spec_re, (2, 0, 1)).astype(hist_dtype)
        new_im = jnp.transpose(spec_im, (2, 0, 1)).astype(hist_dtype)

        hist_re = jnp.concatenate([hist[0], new_re], axis=1)  # [K, P-1+S, C]
        hist_im = jnp.concatenate([hist[1], new_im], axis=1)

        # One real batched matmul per bin with the complex structure folded
        # in ([K, 2S, 2M] @ [K, 2M, C]): rows 0..S-1 = re, S..2S-1 = im.
        hcat = jnp.concatenate([hist_re, hist_im], axis=1)  # [K, 2M, C]
        out_cat = lax.dot_general(
            params["tcat"],
            hcat,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [K, 2S, C]
        acc_re = out_cat[:, :s]
        acc_im = out_cat[:, s:]

        # back to [S, C, K] for the inverse transform
        acc_re = jnp.transpose(acc_re, (1, 2, 0))
        acc_im = jnp.transpose(acc_im, (1, 2, 0))
        y = matmul_backend.irfft_split(acc_re, acc_im, n)  # [S, C, 2B]

        if config.scheme == "upols":
            out = y[..., b:]
        else:
            prev_tails = jnp.concatenate(
                [tail[None], y[:-1, :, b:]], axis=0
            )  # [S, C, B]
            out = y[..., :b] + prev_tails
            new_tail = y[-1, :, b:]

        new_hist = jnp.stack([hist_re[:, s:, :], hist_im[:, s:, :]])
        return (new_tail.astype(jnp.float32), new_hist), out.astype(jnp.float32)

    (tail, hist), outs = lax.scan(
        chunk_step, (state["tail"], state["hist"]), blocks
    )
    # outs [num_chunks, S, C, B] -> [C, T]
    out = jnp.moveaxis(outs, 2, 0).reshape(c, num_chunks * s * b)[:, :t_len]
    if squeeze:
        out = out[0]
    return {"tail": tail, "hist": hist}, out
