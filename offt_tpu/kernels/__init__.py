"""Local transform kernels: mixed-radix MXU FFTs, r2c/c2r, Pallas fusions."""

from . import dft
from .stockham import fft, fft_1d, ifft

__all__ = ["dft", "fft", "fft_1d", "ifft"]
