"""neojax.conv — the convolution engine (direct, FFT, OLS/OLA, partitioned FDL)."""

from neojax.conv.engines import Engine, make_engine
from neojax.conv.convolver import (
    Convolver,
    PartitionedConfig,
    filter_params,
    init_state,
    make_convolver,
    process,
    sparse_upola_convolver,
    sparse_upols_convolver,
    split_upola_convolver,
    split_upols_convolver,
    step,
    upola_convolver,
    upola_convolver_v2,
    upols_convolver,
)
from neojax.conv.chunked import (
    chunked_filter_params,
    chunked_init_state,
    process_chunked,
)
from neojax.conv.direct import direct_convolve
from neojax.conv.hybrid import (
    hybrid_filter_params,
    hybrid_init_state,
    process_hybrid,
)
from neojax.conv.nested import (
    nested_filter_params,
    nested_init_state,
    process_nested,
)
from neojax.conv.fft_conv import fft_convolve
from neojax.conv.modes import Method, Mode, output_size
from neojax.conv.overlap import OverlapAdd, OverlapSave, stream_blocks, unstream_blocks
from neojax.conv.partition import num_partitions, uniform_partition
from neojax.conv.sparse import perceptual_mask, perceptual_weights, sparsity_mask
from neojax.ops.normalize import normalize_impulse

__all__ = [
    "Engine",
    "make_engine",
    "Convolver",
    "PartitionedConfig",
    "filter_params",
    "init_state",
    "step",
    "process",
    "make_convolver",
    "upols_convolver",
    "upola_convolver",
    "upola_convolver_v2",
    "split_upols_convolver",
    "split_upola_convolver",
    "sparse_upols_convolver",
    "sparse_upola_convolver",
    "chunked_filter_params",
    "chunked_init_state",
    "process_chunked",
    "hybrid_filter_params",
    "hybrid_init_state",
    "process_hybrid",
    "nested_filter_params",
    "nested_init_state",
    "process_nested",
    "direct_convolve",
    "fft_convolve",
    "Mode",
    "Method",
    "output_size",
    "OverlapSave",
    "OverlapAdd",
    "stream_blocks",
    "unstream_blocks",
    "uniform_partition",
    "num_partitions",
    "sparsity_mask",
    "perceptual_mask",
    "perceptual_weights",
    "normalize_impulse",
]
