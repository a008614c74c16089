"""neojax.bench — throughput/roofline/SNR measurement harness."""

from neojax.bench.harness import (
    BenchResult,
    fft_flops,
    hbm_peak_bytes_per_sec,
    measure,
    memcpy_probe,
    multiply_add_probe,
)
from neojax.bench.quality import (
    QualityPoint,
    max_channel_rms_error,
    sparse_quality_sweep,
)
from neojax.bench.scaling import ScalingPoint, weak_scaling_sweep
from neojax.bench.spectrum import db_histogram, power_spectrum_image

__all__ = [
    "BenchResult",
    "measure",
    "fft_flops",
    "hbm_peak_bytes_per_sec",
    "memcpy_probe",
    "multiply_add_probe",
    "ScalingPoint",
    "weak_scaling_sweep",
    "QualityPoint",
    "max_channel_rms_error",
    "sparse_quality_sweep",
    "db_histogram",
    "power_spectrum_image",
]
