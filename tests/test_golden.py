"""Golden separable-input verification, mirroring the reference driver's
deterministic input f(x,y,z) = z + 10y + 100x (run-fft.c:46-126) and its
cross-backend output comparison (run-fft.c:451-503) — but with asserts.

A separable input's 3-D DFT is analytically checkable: f = a(x) + b(y) + c(z)
transforms to delta-supported combinations; we just compare against
numpy.fft on the exact same grid, plus spot-check the DC term
(sum of all inputs) exactly.
"""

import numpy as np
import pytest

import offt_tpu
from offt_tpu.dist import make_mesh


def golden_input(nx, ny, nz, dtype=np.float64):
    x = np.arange(nx).reshape(nx, 1, 1)
    y = np.arange(ny).reshape(1, ny, 1)
    z = np.arange(nz).reshape(1, 1, nz)
    return (z + 10.0 * y + 100.0 * x).astype(dtype) + 0j


def test_golden_local():
    g = golden_input(16, 16, 16)
    got = np.asarray(offt_tpu.fft3d(g))
    want = np.fft.fftn(g)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-12
    # DC bin = exact sum of inputs
    dc = got[0, 0, 0]
    assert abs(dc - g.sum()) / abs(g.sum()) < 1e-12


@pytest.mark.parametrize("p1,p2", [(2, 4), (1, 8), (8, 1)])
def test_golden_pencil(p1, p2):
    g = golden_input(16, 16, 16)
    mesh = make_mesh(p1, p2)
    got = np.asarray(offt_tpu.fft3d(g, mesh=mesh))
    want = np.fft.fftn(g)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-12


def test_golden_corner_values():
    """The reference prints output[0..4] with per-backend strides for manual
    comparison; we assert the corner row outright."""
    g = golden_input(8, 8, 8)
    got = np.asarray(offt_tpu.fft3d(g))
    want = np.fft.fftn(g)
    np.testing.assert_allclose(got[0, 0, :5], want[0, 0, :5], rtol=1e-12)
    np.testing.assert_allclose(got[:5, 0, 0], want[:5, 0, 0], rtol=1e-12)
