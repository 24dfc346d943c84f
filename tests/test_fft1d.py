"""1-D kernel correctness vs numpy.fft (BASELINE config 1: N=2^20 fp32 at
1e-6 rel error; fp64 at 1e-12). Mirrors the reference's cross-backend
verification discipline (run-fft.c:451-503) with actual asserts."""

import numpy as np
import pytest

from offt_tpu.kernels import dft, fft_1d


def rel_err(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


def rand_complex(shape, dtype, seed=0):
    rng = np.random.default_rng(seed)
    real_dtype = np.float32 if dtype == np.complex64 else np.float64
    return (
        rng.standard_normal(shape).astype(real_dtype)
        + 1j * rng.standard_normal(shape).astype(real_dtype)
    ).astype(dtype)


@pytest.mark.parametrize("n", [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 4096])
def test_pow2_c64(n):
    x = rand_complex((4, n), np.complex64, seed=n)
    got = fft_1d(x)
    want = np.fft.fft(x, axis=-1)
    assert rel_err(got, want) < 1e-6


@pytest.mark.parametrize("n", [2, 64, 512, 4096])
def test_pow2_c128(n):
    x = rand_complex((3, n), np.complex128, seed=n)
    got = fft_1d(x)
    want = np.fft.fft(x, axis=-1)
    assert rel_err(got, want) < 1e-12


@pytest.mark.parametrize("n", [6, 12, 96, 100, 120, 360, 1000, 1536])
def test_mixed_radix(n):
    x = rand_complex((2, n), np.complex128, seed=n)
    got = fft_1d(x)
    want = np.fft.fft(x, axis=-1)
    assert rel_err(got, want) < 1e-12


@pytest.mark.parametrize("n", [7, 13, 127, 131, 257, 509])
def test_prime_bluestein(n):
    x = rand_complex((2, n), np.complex128, seed=n)
    got = fft_1d(x)
    want = np.fft.fft(x, axis=-1)
    assert rel_err(got, want) < 1e-11


@pytest.mark.parametrize("n", [131, 509])
def test_prime_bluestein_c64(n):
    x = rand_complex((2, n), np.complex64, seed=n)
    got = fft_1d(x)
    want = np.fft.fft(x, axis=-1)
    assert rel_err(got, want) < 2e-6


@pytest.mark.parametrize("n", [16, 360, 131])
def test_inverse_roundtrip(n):
    x = rand_complex((3, n), np.complex128, seed=n)
    got = fft_1d(fft_1d(x), inverse=True)
    assert rel_err(got, x) < 1e-12


def test_ifft_matches_numpy():
    x = rand_complex((2, 96), np.complex128)
    got = fft_1d(x, inverse=True)
    want = np.fft.ifft(x, axis=-1)
    assert rel_err(got, want) < 1e-12


@pytest.mark.parametrize("axis", [0, 1, 2, -1])
def test_axis_selection(axis):
    x = rand_complex((8, 12, 16), np.complex128)
    got = fft_1d(x, axis=axis)
    want = np.fft.fft(x, axis=axis)
    assert rel_err(got, want) < 1e-12


def test_radix_override():
    x = rand_complex((2, 64), np.complex128)
    for rad in [(2,) * 6, (4, 4, 4), (8, 8), (64,), (16, 4), (2, 32)]:
        got = fft_1d(x, radices=rad)
        assert rel_err(got, np.fft.fft(x, axis=-1)) < 1e-12


def test_radix_override_invalid():
    x = rand_complex((2, 64), np.complex128)
    with pytest.raises(ValueError):
        fft_1d(x, radices=(4, 4))


def test_large_n_fp32_baseline_config1():
    # BASELINE config 1: 1D c2c N=2^20 fp32 vs numpy at 1e-6 rel error.
    n = 1 << 20
    x = rand_complex((n,), np.complex64, seed=7)
    got = fft_1d(x)
    want = np.fft.fft(x)
    assert rel_err(got, want) < 1e-6


def test_factorize():
    assert dft.factorize(1024) == (32, 32)
    assert dft.factorize(256) == (16, 16)
    assert dft.factorize(1 << 20) == (128, 128, 64)
    for n in [2, 6, 30, 360, 1 << 20, 1000]:
        rad = dft.factorize(n)
        prod = 1
        for r in rad:
            prod *= r
        assert prod == n
        assert all(r <= dft.MAX_RADIX for r in rad)
    assert any(r > dft.MAX_RADIX for r in dft.factorize(131))
    assert not dft.is_supported_size(131)
    assert dft.is_supported_size(1 << 20)


def test_real_input_promoted():
    x = np.random.default_rng(0).standard_normal((4, 32))
    got = fft_1d(x.astype(np.float64))
    want = np.fft.fft(x, axis=-1)
    assert rel_err(got, want) < 1e-12
