"""Benchmark harness: wall-clock timing + items/s / bytes/s / flops counters.

Keeps the reference's measurement taxonomy (SURVEY.md section 5/6):
google-benchmark items/s + bytes/s (``extra/benchmark/src/convolution.cpp:42-44``),
FFT flop-rate ``5 N log2 N`` (``fft.cpp:37``), rfft round-trip flops
(``rfft.cpp:38-39``), and memcpy/multiply_add roofline probes
(``memcpy.cpp:27-36``) — re-expressed for TPU: per-chip throughput plus an
HBM-roofline fraction.

Timing protocol: synchronize by fetching a device-side reduction to host
(``block_until_ready`` alone does not reliably synchronize on all TPU
runtimes), subtract nothing, report the min over repeats.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "BenchResult",
    "measure",
    "fft_flops",
    "hbm_peak_bytes_per_sec",
    "hbm_achievable_bytes_per_sec",
    "memcpy_probe",
    "multiply_add_probe",
]

# Peak HBM bandwidth per chip, bytes/s (for roofline fractions).
_HBM_PEAK = {
    "TPU v5 lite": 819e9,  # v5e
    "TPU v4": 1228e9,
    "TPU v6": 1640e9,  # trillium
}


def hbm_peak_bytes_per_sec() -> float | None:
    kind = jax.devices()[0].device_kind
    for prefix, bw in _HBM_PEAK.items():
        if kind.startswith(prefix):
            return bw
    return None


@dataclasses.dataclass(frozen=True)
class BenchResult:
    name: str
    seconds: float
    items_per_sec: float | None = None
    bytes_per_sec: float | None = None
    flops_per_sec: float | None = None
    roofline_fraction: float | None = None

    def __str__(self):
        parts = [f"{self.name}: {self.seconds * 1e3:.2f} ms"]
        if self.items_per_sec:
            parts.append(f"{self.items_per_sec / 1e6:.1f} M items/s")
        if self.bytes_per_sec:
            parts.append(f"{self.bytes_per_sec / 1e9:.0f} GB/s")
        if self.flops_per_sec:
            parts.append(f"{self.flops_per_sec / 1e9:.0f} GFLOP/s")
        if self.roofline_fraction:
            parts.append(f"{self.roofline_fraction * 100:.0f}% of HBM roofline")
        return " | ".join(parts)


def _sync(out) -> None:
    leaves = jax.tree.leaves(out)
    if leaves:
        float(jnp.sum(jnp.abs(leaves[0]).astype(jnp.float32)))


def measure(
    name: str,
    fn: Callable,
    *args,
    repeats: int = 3,
    items: int | None = None,
    bytes_moved: int | None = None,
    flops: int | None = None,
) -> BenchResult:
    """Time ``fn(*args)`` (jit-compiled or not) with fetch-to-host sync."""
    out = fn(*args)
    _sync(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    peak = hbm_peak_bytes_per_sec()
    return BenchResult(
        name=name,
        seconds=dt,
        items_per_sec=items / dt if items else None,
        bytes_per_sec=bytes_moved / dt if bytes_moved else None,
        flops_per_sec=flops / dt if flops else None,
        roofline_fraction=(bytes_moved / dt / peak) if (bytes_moved and peak) else None,
    )


def fft_flops(n: int, batch: int = 1) -> int:
    """The reference's FFT flop model: 5 N log2 N per transform."""
    return int(5 * n * np.log2(n)) * batch


def hbm_achievable_bytes_per_sec(
    nbytes: int = 256 * 1024 * 1024, iters: int = 50
) -> float:
    """Measured achievable read-heavy HBM bandwidth, bytes/s.

    Runs an in-jit fori_loop summing 8 resident arrays (read-dominated,
    minimal VPU work) — the access pattern of the FDL MAC. Single-dispatch
    probes are useless on remote-tunnel runtimes (~28 ms fixed dispatch),
    and the SPEC peak is not reachable by any real kernel; roofline
    fractions against this number say how close a kernel is to what the
    chip actually delivers for this pattern in this session.
    """
    import jax.lax as lax

    n = nbytes // 8 // 4
    xs = [jnp.full((n,), float(i + 1), jnp.float32) for i in range(8)]

    @jax.jit
    def loop(*xs):
        def body(i, acc):
            s = acc
            for x in xs:
                s = s + x
            return s * 0.999

        return lax.fori_loop(0, iters, body, jnp.zeros((n,), jnp.float32))

    out = loop(*xs)
    float(jnp.sum(out[:8]))
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        out = loop(*xs)
        float(jnp.sum(out[:8]))
        times.append(time.perf_counter() - t0)
    dt = min(times) / iters
    return (nbytes + 2 * n * 4) / dt


def memcpy_probe(nbytes: int = 256 * 1024 * 1024) -> BenchResult:
    """HBM copy bandwidth probe (reference ``memcpy.cpp:27-36``)."""
    n = nbytes // 4
    x = jnp.arange(n, dtype=jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    return measure("memcpy", f, x, bytes_moved=2 * nbytes)


def multiply_add_probe(nbytes: int = 128 * 1024 * 1024) -> BenchResult:
    """Split-complex MAC bandwidth probe (``multiply_add.cpp``)."""
    n = nbytes // 4 // 4
    xr = jnp.ones((n,), jnp.float32)
    xi = jnp.ones((n,), jnp.float32)
    yr = jnp.ones((n,), jnp.float32)
    yi = jnp.ones((n,), jnp.float32)

    @jax.jit
    def mac(xr, xi, yr, yi):
        return xr * yr - xi * yi, xr * yi + xi * yr

    return measure(
        "multiply_add", mac, xr, xi, yr, yi, bytes_moved=6 * n * 4, flops=6 * n
    )
