"""Benchmark drivers and roofline model."""

from .roofline import CHIPS, ChipSpec, Roofline, fft3d_roofline

__all__ = ["CHIPS", "ChipSpec", "Roofline", "fft3d_roofline"]
