"""Pallas TPU kernels for the hot ops (fused four-step FFT, power spectra)."""
