"""neojax.kernels — Pallas TPU kernels (fused FDL MAC, block pipeline)."""
