"""neojax.core — bit/sizing helpers, windows, units, split-complex layout."""

from neojax.core import fixed_point
from neojax.core.bits import bit_ceil, bit_log2, idiv, ipow, is_pow2, next_order
from neojax.core.complexes import (
    from_split,
    split_conj,
    split_mul,
    split_mul_add,
    to_split,
)
from neojax.core.units import (
    a_weighting,
    amplitude_to_db,
    fast_log2,
    fast_log10,
    hertz_to_mel,
    mel_frequencies,
    mel_to_hertz,
    polar,
    rfftfreq,
)
from neojax.core.windows import (
    hamming_window,
    hann_window,
    make_window,
    rectangular_window,
)

__all__ = [
    "fixed_point",
    "bit_ceil",
    "bit_log2",
    "idiv",
    "ipow",
    "is_pow2",
    "next_order",
    "polar",
    "to_split",
    "from_split",
    "split_mul",
    "split_mul_add",
    "split_conj",
    "a_weighting",
    "amplitude_to_db",
    "fast_log2",
    "fast_log10",
    "hertz_to_mel",
    "mel_to_hertz",
    "mel_frequencies",
    "rfftfreq",
    "rectangular_window",
    "hann_window",
    "hamming_window",
    "make_window",
]
