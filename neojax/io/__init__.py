"""neojax.io — WAV file I/O and streaming-state checkpointing."""

from neojax.io.checkpoint import (
    load_state,
    load_state_orbax,
    save_state,
    save_state_orbax,
)
from neojax.io.executor import StreamExecutor
from neojax.io.resample import polyphase_weights, resample
from neojax.io.wav import read_wav, write_wav

__all__ = [
    "read_wav",
    "write_wav",
    "resample",
    "polyphase_weights",
    "StreamExecutor",
    "save_state",
    "load_state",
    "save_state_orbax",
    "load_state_orbax",
]
