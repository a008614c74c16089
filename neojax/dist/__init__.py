"""neojax.dist — device meshes, sharded convolvers, multi-host streaming."""
