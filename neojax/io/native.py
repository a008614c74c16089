"""ctypes loader for the native runtime (native/libneo_runtime.so).

The native library provides the host-side streaming runtime (WAV codec +
re-blocker) in C++ — the role the reference implements natively for its
CLI/plugin. Falls back gracefully: ``load_runtime()`` returns None if the
library hasn't been built (``make -C native``), and callers use the pure
Python paths.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

__all__ = ["load_runtime", "native_read_wav", "native_write_wav", "Reblocker", "Ring"]

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libneo_runtime.so",
)


@functools.lru_cache(maxsize=1)
def load_runtime(build: bool = True):
    """Load (building if needed and possible) the native runtime, or None."""
    if not os.path.exists(_LIB_PATH) and build:
        makefile_dir = os.path.dirname(_LIB_PATH)
        if os.path.exists(os.path.join(makefile_dir, "Makefile")):
            try:
                subprocess.run(
                    ["make", "-C", makefile_dir],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
    if not os.path.exists(_LIB_PATH):
        return None

    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u64p = ctypes.POINTER(ctypes.c_uint64)

    lib.neo_wav_probe.restype = ctypes.c_int
    lib.neo_wav_probe.argtypes = [u8p, ctypes.c_uint64, i32p, i32p, i32p, i32p, u64p]
    lib.neo_wav_decode.restype = ctypes.c_int
    lib.neo_wav_decode.argtypes = [u8p, ctypes.c_uint64, f32p]
    lib.neo_wav_encode16.restype = ctypes.c_int64
    lib.neo_wav_encode16.argtypes = [
        f32p, ctypes.c_int32, ctypes.c_uint64, ctypes.c_int32, u8p,
    ]
    lib.neo_reblocker_new.restype = ctypes.c_void_p
    lib.neo_reblocker_new.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.neo_reblocker_free.argtypes = [ctypes.c_void_p]
    lib.neo_reblocker_latency.restype = ctypes.c_int32
    lib.neo_reblocker_latency.argtypes = [ctypes.c_void_p]
    lib.neo_reblocker_push.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int32]
    lib.neo_reblocker_frames_ready.restype = ctypes.c_int32
    lib.neo_reblocker_frames_ready.argtypes = [ctypes.c_void_p]
    lib.neo_reblocker_pop_frame.restype = ctypes.c_int32
    lib.neo_reblocker_pop_frame.argtypes = [ctypes.c_void_p, f32p]
    lib.neo_reblocker_push_processed.argtypes = [ctypes.c_void_p, f32p]
    lib.neo_reblocker_pop.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int32]
    lib.neo_ring_new.restype = ctypes.c_void_p
    lib.neo_ring_new.argtypes = [ctypes.c_int64]
    lib.neo_ring_free.argtypes = [ctypes.c_void_p]
    lib.neo_ring_capacity.restype = ctypes.c_int64
    lib.neo_ring_capacity.argtypes = [ctypes.c_void_p]
    lib.neo_ring_readable.restype = ctypes.c_int64
    lib.neo_ring_readable.argtypes = [ctypes.c_void_p]
    lib.neo_ring_writable.restype = ctypes.c_int64
    lib.neo_ring_writable.argtypes = [ctypes.c_void_p]
    lib.neo_ring_write.restype = ctypes.c_int64
    lib.neo_ring_write.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int64]
    lib.neo_ring_read.restype = ctypes.c_int64
    lib.neo_ring_read.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int64]
    return lib


def _as_u8(buf: bytes):
    arr = np.frombuffer(buf, dtype=np.uint8)
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), arr


def native_read_wav(path: str):
    """Native WAV decode -> ([channels, frames] f32, sample_rate)."""
    lib = load_runtime()
    if lib is None:
        raise RuntimeError("native runtime not available")
    data = open(path, "rb").read()
    ptr, keep = _as_u8(data)
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    bits = ctypes.c_int32()
    fmt = ctypes.c_int32()
    frames = ctypes.c_uint64()
    rc = lib.neo_wav_probe(ptr, len(data), ch, sr, bits, fmt, frames)
    if rc != 0:
        raise ValueError(f"WAV probe failed ({rc}) for {path}")
    out = np.empty((ch.value, frames.value), np.float32)
    rc = lib.neo_wav_decode(
        ptr, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if rc != 0:
        raise ValueError(f"WAV decode failed ({rc}) for {path}")
    return out, sr.value


def native_write_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    lib = load_runtime()
    if lib is None:
        raise RuntimeError("native runtime not available")
    audio = np.ascontiguousarray(np.asarray(audio, np.float32))
    if audio.ndim == 1:
        audio = audio[None]
    ch, frames = audio.shape
    out = np.empty(44 + frames * ch * 2, np.uint8)
    n = lib.neo_wav_encode16(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ch,
        frames,
        sample_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    with open(path, "wb") as f:
        f.write(out[:n].tobytes())


class Reblocker:
    """Native frame re-blocker: arbitrary host block sizes in/out, fixed
    processing frames with one frame of latency (the reference plugin's
    ``ConstantOverlapAdd`` adapter, ``ConstantOverlapAdd.hpp:89-199``)."""

    def __init__(self, channels: int, frame_size: int):
        self._lib = load_runtime()
        if self._lib is None:
            raise RuntimeError("native runtime not available (make -C native)")
        self._h = self._lib.neo_reblocker_new(channels, frame_size)
        self.channels = channels
        self.frame_size = frame_size

    @property
    def latency(self) -> int:
        return self._lib.neo_reblocker_latency(self._h)

    def process(self, block: np.ndarray, frame_fn) -> np.ndarray:
        """Push a [C, N] host block, run ``frame_fn`` on every complete
        [C, F] frame, return [C, N] output (latency-compensated zeros at
        stream start)."""
        block = np.ascontiguousarray(np.asarray(block, np.float32))
        n = block.shape[-1]
        f32p = ctypes.POINTER(ctypes.c_float)
        self._lib.neo_reblocker_push(self._h, block.ctypes.data_as(f32p), n)
        while self._lib.neo_reblocker_frames_ready(self._h) > 0:
            frame = np.empty((self.channels, self.frame_size), np.float32)
            self._lib.neo_reblocker_pop_frame(self._h, frame.ctypes.data_as(f32p))
            processed = np.ascontiguousarray(
                np.asarray(frame_fn(frame), np.float32)
            )
            self._lib.neo_reblocker_push_processed(
                self._h, processed.ctypes.data_as(f32p)
            )
        out = np.empty((self.channels, n), np.float32)
        self._lib.neo_reblocker_pop(self._h, out.ctypes.data_as(f32p), n)
        return out

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.neo_reblocker_free(self._h)
            self._h = None


class Ring:
    """Native lock-free SPSC float ring buffer (audio-callback <-> compute
    worker transport; C++ ``neo_ring``)."""

    def __init__(self, min_capacity: int):
        if min_capacity <= 0:
            raise ValueError(f"ring capacity must be positive, got {min_capacity}")
        self._lib = load_runtime()
        if self._lib is None:
            raise RuntimeError("native runtime not available (make -C native)")
        self._h = self._lib.neo_ring_new(int(min_capacity))
        if not self._h:
            raise RuntimeError("native ring allocation failed")

    def __del__(self):
        lib = getattr(self, "_lib", None)
        h = getattr(self, "_h", None)
        if lib is not None and h:
            lib.neo_ring_free(h)
            self._h = None

    @property
    def capacity(self) -> int:
        return self._lib.neo_ring_capacity(self._h)

    @property
    def readable(self) -> int:
        return self._lib.neo_ring_readable(self._h)

    @property
    def writable(self) -> int:
        return self._lib.neo_ring_writable(self._h)

    def write(self, data: "np.ndarray") -> int:
        data = np.ascontiguousarray(data, np.float32).ravel()
        return self._lib.neo_ring_write(
            self._h, data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), data.size
        )

    def read(self, n: int) -> "np.ndarray":
        out = np.empty(int(n), np.float32)
        got = self._lib.neo_ring_read(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), int(n)
        )
        return out[:got]
