"""neojax.bench — throughput/roofline/SNR measurement harness."""
