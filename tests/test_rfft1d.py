"""r2c/c2r 1-D correctness vs numpy.fft.rfft/irfft."""

import numpy as np
import pytest

from offt_tpu.kernels.rfft import irfft_1d, rfft_1d


def rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


@pytest.mark.parametrize("n", [2, 4, 8, 16, 64, 256, 1024, 96, 120, 1000])
def test_rfft_even(n):
    x = np.random.default_rng(n).standard_normal((3, n))
    got = rfft_1d(x)
    want = np.fft.rfft(x, axis=-1)
    assert rel_err(got, want) < 1e-12


@pytest.mark.parametrize("n", [1, 3, 9, 15, 127])
def test_rfft_odd(n):
    x = np.random.default_rng(n).standard_normal((2, n))
    got = rfft_1d(x)
    want = np.fft.rfft(x, axis=-1)
    assert rel_err(got, want) < 1e-11


@pytest.mark.parametrize("n", [2, 16, 64, 96, 1000])
def test_irfft_even(n):
    x = np.random.default_rng(n).standard_normal((2, n))
    xf = np.fft.rfft(x, axis=-1)
    got = irfft_1d(xf, n=n)
    want = np.fft.irfft(xf, n=n, axis=-1)
    assert rel_err(got, want) < 1e-12
    assert rel_err(got, x) < 1e-12


@pytest.mark.parametrize("n", [3, 9, 15])
def test_irfft_odd(n):
    x = np.random.default_rng(n).standard_normal((2, n))
    xf = np.fft.rfft(x, axis=-1)
    got = irfft_1d(xf, n=n)
    assert rel_err(got, x) < 1e-11


def test_rfft_axis():
    x = np.random.default_rng(0).standard_normal((6, 8, 10))
    for axis in [0, 1, 2]:
        got = rfft_1d(x, axis=axis)
        want = np.fft.rfft(x, axis=axis)
        assert rel_err(got, want) < 1e-12


def test_rfft_fp32():
    x = np.random.default_rng(1).standard_normal((4, 512)).astype(np.float32)
    got = rfft_1d(x)
    assert np.asarray(got).dtype == np.complex64
    want = np.fft.rfft(x, axis=-1)
    assert rel_err(got, want) < 1e-6


def test_roundtrip_fp32():
    x = np.random.default_rng(2).standard_normal((4, 256)).astype(np.float32)
    y = irfft_1d(rfft_1d(x), n=256)
    assert np.asarray(y).dtype == np.float32
    assert rel_err(y, x) < 1e-6
