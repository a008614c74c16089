"""Tiny numpy reference DCT-II (unscaled, matching neo's fallback_dct2_plan)."""

import numpy as np


def dct2_ref(x):
    n = len(x)
    k = np.arange(n)[:, None]
    t = np.arange(n)[None, :]
    mat = 2.0 * np.cos(np.pi * k * (2 * t + 1) / (2 * n))
    return (mat @ x).astype(np.float64)
