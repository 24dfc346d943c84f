"""plan() dtype normalization for real transforms.

Passing the REAL dtype (float32) to a real-transform plan must behave
identically to passing the complex dtype: every fast-path gate keys on
spec.dtype == "complex64", so before normalization `plan(shape, "float32",
real=True, packed=True)` silently routed onto the unfused fallback —
returning the WRONG (numpy 129-lane) layout for packed=True and crashing
the packed inverse (irfft_1d expected Nz/2+1 bins).
"""

import numpy as np
import pytest

import offt_tpu


SHAPE = (16, 64, 256)  # packed path needs Nz/2 % 128 == 0, Ny % 8 == 0


@pytest.mark.parametrize("dtype", ["float32", "complex64"])
def test_real_dtype_normalizes(dtype):
    p = offt_tpu.plan(SHAPE, dtype, real=True, use_cache=False)
    assert p.spec.dtype == "complex64"


def test_float64_normalizes():
    p = offt_tpu.plan(SHAPE, "float64", real=True, use_cache=False)
    assert p.spec.dtype == "complex128"


def test_packed_float32_layout_and_values():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(SHAPE).astype(np.float32)
    p = offt_tpu.plan(SHAPE, "float32", real=True, planar=True, packed=True,
                      use_cache=False)
    yr, yi = p(x)
    m = SHAPE[2] // 2
    assert yr.shape == SHAPE[:2] + (m,)          # packed layout, not M+1
    v = np.fft.rfftn(x)
    # packed plane 0 = fft_xy(X_0) + i * fft_xy(X_M)  (pack_rfft3d)
    packed_ref = np.concatenate(
        [v[..., :1] + 1j * v[..., m:m + 1], v[..., 1:m]], axis=-1)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    err = np.linalg.norm(got - packed_ref) / np.linalg.norm(packed_ref)
    assert err < 1e-6

    # packed inverse roundtrip (crashed before normalization)
    pi = offt_tpu.plan(SHAPE, "float32", real=True, planar=True, packed=True,
                       inverse=True, use_cache=False)
    back = np.asarray(pi(yr, yi))
    assert back.shape == SHAPE
    assert np.linalg.norm(back - x) / np.linalg.norm(x) < 1e-6
