"""Generate the seeded input fixtures for the C++ golden-vector generator.

Run from the repo root:  python tools/goldens/gen_inputs.py
Then build + run the C++ generator:  tools/goldens/run.sh
"""

from __future__ import annotations

import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "..", "tests", "goldens")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(2024)

    def save(name, arr):
        np.save(os.path.join(OUT, name), arr)

    for n in (16, 256, 1024):
        z = (rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)).astype(np.complex64)
        save(f"in_cnoise_{n}.npy", z)
    save(
        "in_cnoise_1024_f64.npy",
        (rng.uniform(-1, 1, 1024) + 1j * rng.uniform(-1, 1, 1024)).astype(np.complex128),
    )
    for n in (16, 256, 1024):
        save(f"in_rnoise_{n}.npy", rng.uniform(-1, 1, n).astype(np.float32))

    save("in_sig.npy", rng.uniform(-1, 1, (2, 4096)).astype(np.float32))
    save("in_ir.npy", (rng.uniform(-1, 1, (2, 1000)) * 0.25).astype(np.float32))
    save("in_a64.npy", rng.uniform(-1, 1, 64).astype(np.float32))
    save("in_b33.npy", rng.uniform(-1, 1, 33).astype(np.float32))


if __name__ == "__main__":
    main()
