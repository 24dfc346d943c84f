"""MXU+VPU split core: N = rM * rV with full-width stage-A dots and a
radix-rV (2/4/8) pure-VPU butterfly stage (kernels/pallas_fft.py
_sublane_core_vpu). The measured round-3 win: 256^3 c2c 1.62 -> 1.02 ms
on v5e (the stacked sub-64-radix dots filled at most half the MXU's
output rows; rM in {64, 128} fills every weight row-tile).

Reference anchor: the phase kernels are the reference's perf core
(offt-compute.c:905-1206); this is their TPU-native re-expression."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from offt_tpu.kernels import pallas_fft as pf

BAR = 1e-5


def _relerr(got, want):
    return np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("n,rad", [(128, (64, 2)), (256, (64, 4)),
                                   (512, (64, 8)), (512, (128, 4)),
                                   (1024, (128, 8)), (96, (48, 2)),
                                   (32, (16, 2))])
@pytest.mark.parametrize("inv", [False, True])
@pytest.mark.parametrize("prec", ["highest", "stack6"])
def test_vpu_split_fft_last(rng, n, rad, inv, prec):
    x = (rng.standard_normal((4, n))
         + 1j * rng.standard_normal((4, n))).astype(np.complex64)
    yr, yi = pf.fft_last(jnp.asarray(x.real), jnp.asarray(x.imag),
                         inverse=inv, radices=rad, precision=prec)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.ifft(x, axis=-1) * n if inv else np.fft.fft(x, axis=-1)
    assert _relerr(got, want) < BAR


def test_vpu_split_gate():
    assert pf._is_vpu_split((64, 4))
    assert pf._is_vpu_split((128, 8))
    assert not pf._is_vpu_split((8, 32))      # rv too big
    assert not pf._is_vpu_split((4, 4))       # rm too small
    assert pf._is_vpu_split((64, 3))          # composite/odd VPU radices
    assert pf._is_vpu_split((64, 12)) and pf._is_vpu_split((64, 16))
    assert not pf._is_vpu_split((64, 5))      # rv not {2,3}-smooth <= 16
    assert not pf._is_vpu_split((256, 2))     # rm beyond MAX_RADIX


def test_vpu_tables_shapes():
    gs = pf._vpu_tables(256, 64, 4, False, 1.0, stacked=True)
    assert gs.shape == (4, 128, 12 * 64) and gs.dtype == np.dtype("bfloat16")
    gf = pf._vpu_tables(256, 64, 4, False, 1.0, stacked=False)
    assert gf.shape == (4, 128, 128) and gf.dtype == np.float32


def test_vpu_split_scale_folds(rng):
    """The norm scale rides the stage-A tables (zero runtime cost)."""
    x = (rng.standard_normal((4, 256))
         + 1j * rng.standard_normal((4, 256))).astype(np.complex64)
    yr, yi = pf.fft_last(jnp.asarray(x.real), jnp.asarray(x.imag),
                         radices=(64, 4), precision="stack6", scale=0.25)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert _relerr(got, 0.25 * np.fft.fft(x, axis=-1)) < BAR


def test_vpu_split_slab_and_x(rng):
    """The split is radix-driven, so every c2c kernel (slab, sublane,
    strided-x) routes through it via _core_apply."""
    x = (rng.standard_normal((32, 128, 128))
         + 1j * rng.standard_normal((32, 128, 128))).astype(np.complex64)
    yr, yi = pf.fft_slab_yz(jnp.asarray(x.real), jnp.asarray(x.imag),
                            rad_y=(64, 2), rad_z=(64, 2),
                            precision="stack6")
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fft(np.fft.fft(x, axis=-1), axis=-2)
    assert _relerr(got, want) < BAR
    yr, yi = pf.fft_sublane(jnp.asarray(x.real), jnp.asarray(x.imag),
                            axis=0, radices=(16, 2), precision="stack6")
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert _relerr(got, np.fft.fft(x, axis=0)) < BAR


def test_stacked_picker_costs():
    """dot_cost model: full-width stage-A dots dominate sub-64 pairs."""
    assert pf._pick_2stage(256, stacked=True) == (64, 4)
    assert pf._pick_2stage(1024, stacked=True) == (64, 16)
    assert pf._pick_2stage(768, stacked=True) == (64, 12)
    # non-pow2 still reachable: 320 = 40 * 8 (rm=40 fits one row tile)
    assert pf._pick_2stage(320, stacked=True) == (40, 8)


def test_vpu_split_rfft_kernels(rng):
    """r2c/c2r kernels consume the split via their _core_apply cores."""
    x = rng.standard_normal((256, 256)).astype(np.float32)
    # m = 128 -> (64, 2) under stack6
    pr, pi_ = pf.rfft_last_planar(jnp.asarray(x), precision="stack6",
                                  packed=True)
    back = pf.icrfft_last_planar(pr, pi_, precision="stack6")
    assert _relerr(np.asarray(back), x) < BAR


def test_vpu_split_dual_untangle(rng, monkeypatch):
    """Dual-transform untangle (m > _H_DOT_MAX) composes with the split:
    force dual at a small m by lowering the threshold."""
    monkeypatch.setattr(pf, "_H_DOT_MAX", 16)
    x = rng.standard_normal((64, 64, 64)).astype(np.float32)
    yr, yi = pf.rfft_slab_yz(jnp.asarray(x), precision="stack6")
    m = 32
    full = np.fft.rfft(x, axis=-1)
    pk = full[..., :m].copy()
    pk[..., 0] = full[..., 0].real + 1j * full[..., m].real
    want = np.fft.fft(pk, axis=-2)
    assert _relerr(np.asarray(yr) + 1j * np.asarray(yi), want) < BAR
    out = pf.irfft_slab_yz(yr, yi, 64, precision="stack6",
                           scale=1.0 / (64 * m))
    assert _relerr(np.asarray(out), x) < BAR


def test_fft3d_cube_roundtrip(rng):
    """Single-pass fused cube kernel (one HBM round trip for all three
    axes). Measured on v5e: LOSES to slab+padded-x at 8x128^3 (1.75 vs
    1.05 ms — in-register transposes + cube-granular pipelining outweigh
    the saved HBM trip, receipt in BENCH_LOCAL.jsonl) — kept as a tested
    capability, not the default path."""
    x = (rng.standard_normal((2, 32, 32, 128))
         + 1j * rng.standard_normal((2, 32, 32, 128))).astype(np.complex64)
    yr, yi = pf.fft3d_cube(jnp.asarray(x.real), jnp.asarray(x.imag),
                           precision="stack6")
    want = np.fft.fftn(x, axes=(-3, -2, -1))
    assert _relerr(np.asarray(yr) + 1j * np.asarray(yi), want) < BAR
    br, bi = pf.fft3d_cube(yr, yi, inverse=True, precision="stack6")
    assert _relerr(np.asarray(br) + 1j * np.asarray(bi), x) < BAR
    assert pf.can_fuse_cube(128, 128, 128)
    assert not pf.can_fuse_cube(256, 256, 256)   # past the VMEM budget
