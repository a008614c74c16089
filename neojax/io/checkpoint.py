"""Streaming-state checkpoint / resume.

The reference has no checkpointing (SURVEY.md section 5): its only
persistent state is the convolver's streaming state (FDL ring
``dense_fdl.hpp:32``, overlap window ``overlap_save.hpp:55``, write pos
``fdl_index.hpp:40``). Here that state is an explicit pytree (the scan
carry), so a lost host resumes a stream from the last block boundary by
reloading {tail, FDL, pos} — cheap and exact (see
``tests/test_convolution.py::test_state_checkpoint_resume`` for bitwise
equality).

Two formats:
  - ``save_state``/``load_state``: dependency-free .npz (single host)
  - ``save_state_orbax``/``load_state_orbax``: orbax-checkpoint, for
    sharded multi-host state (each host writes its shards)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["save_state", "load_state", "save_state_orbax", "load_state_orbax"]


def _flatten(state: dict) -> dict:
    flat = {}
    for key, val in state.items():
        if isinstance(val, tuple):  # quantized FDL (planes, scales)
            for i, item in enumerate(val):
                flat[f"{key}.tuple{i}"] = np.asarray(item)
        else:
            flat[key] = np.asarray(val)
    return flat


def _unflatten(flat: dict) -> dict:
    state: dict = {}
    tuples: dict = {}
    for key, val in flat.items():
        if ".tuple" in key:
            base, idx = key.rsplit(".tuple", 1)
            tuples.setdefault(base, {})[int(idx)] = jnp.asarray(val)
        else:
            state[key] = jnp.asarray(val)
    for base, items in tuples.items():
        state[base] = tuple(items[i] for i in sorted(items))
    return state


def save_state(path: str, state: dict) -> None:
    """Serialize a convolver state pytree to an .npz file."""
    np.savez(path, **_flatten(jax.device_get(state)))


def load_state(path: str) -> dict:
    with np.load(path) as f:
        return _unflatten({k: f[k] for k in f.files})


def save_state_orbax(path: str, state: dict) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(path, state, force=True)


def load_state_orbax(path: str, like: dict) -> dict:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckpt:
        return ckpt.restore(path, like)
