"""Seeded property fuzz: random shapes x meshes x transform kinds must
match numpy and roundtrip, including uneven/padded cases."""

import numpy as np
import pytest

import offt_tpu
from offt_tpu.dist import make_mesh


def rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.linalg.norm(a.ravel() - b.ravel()) / max(np.linalg.norm(b.ravel()), 1e-30)


MESHES = [None, (1, 1), (2, 4), (4, 2), (8, 1), (1, 8), (2, 2)]


@pytest.mark.parametrize("trial", range(10))
def test_fuzz_c2c(trial):
    rng = np.random.default_rng(1000 + trial)
    shape = tuple(int(rng.integers(4, 21)) for _ in range(3))
    mesh_cfg = MESHES[int(rng.integers(0, len(MESHES)))]
    mesh = make_mesh(*mesh_cfg) if mesh_cfg else None
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex128)
    got = offt_tpu.fft3d(x, mesh=mesh)
    assert rel_err(got, np.fft.fftn(x)) < 1e-11, (shape, mesh_cfg)
    back = offt_tpu.ifft3d(np.asarray(got), mesh=mesh)
    assert rel_err(back, x) < 1e-11, (shape, mesh_cfg)


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_r2c(trial):
    rng = np.random.default_rng(2000 + trial)
    shape = tuple(int(rng.integers(4, 19)) for _ in range(3))
    mesh_cfg = MESHES[int(rng.integers(0, len(MESHES)))]
    mesh = make_mesh(*mesh_cfg) if mesh_cfg else None
    x = rng.standard_normal(shape)
    got = offt_tpu.rfft3d(x, mesh=mesh)
    assert rel_err(got, np.fft.rfftn(x)) < 1e-11, (shape, mesh_cfg)
    back = offt_tpu.irfft3d(np.asarray(got), nz=shape[2], mesh=mesh)
    assert rel_err(back, x) < 1e-11, (shape, mesh_cfg)
