"""neojax.io — WAV file I/O."""
