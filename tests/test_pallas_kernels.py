"""Fused Pallas kernel correctness (interpret mode on CPU; the same code
compiles via Mosaic on TPU — chip accuracy is checked by the verify drive
and bench --verify)."""

import numpy as np
import pytest

import offt_tpu
from offt_tpu.dist import make_mesh
from offt_tpu.kernels import pallas_fft as pf
from offt_tpu.plan.params import PlanParams


def rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.linalg.norm(a.ravel() - b.ravel()) / max(np.linalg.norm(b.ravel()), 1e-30)


def rand_c64(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


@pytest.mark.parametrize("n", [8, 16, 64, 128, 256])
def test_fft_last(n):
    x = rand_c64((10, n), seed=n)
    yr, yi = pf.fft_last(x.real.copy(), x.imag.copy())
    assert rel_err(np.asarray(yr) + 1j * np.asarray(yi),
                   np.fft.fft(x, axis=-1)) < 1e-5


@pytest.mark.parametrize("axis", [0, 1])
def test_fft_sublane(axis):
    x = rand_c64((16, 32, 128), seed=axis)
    yr, yi = pf.fft_sublane(x.real.copy(), x.imag.copy(), axis)
    assert rel_err(np.asarray(yr) + 1j * np.asarray(yi),
                   np.fft.fft(x, axis=axis)) < 1e-5


def test_fft3d_planar_roundtrip():
    x = rand_c64((32, 32, 32), seed=3)
    yr, yi = pf.fft3d_planar(x.real.copy(), x.imag.copy())
    assert rel_err(np.asarray(yr) + 1j * np.asarray(yi), np.fft.fftn(x)) < 1e-5
    br, bi = pf.fft3d_planar(yr, yi, inverse=True)
    assert rel_err(np.asarray(br) + 1j * np.asarray(bi), x) < 1e-5


def test_radix_override_and_unsupported():
    x = rand_c64((8, 64), seed=4)
    yr, yi = pf.fft_last(x.real.copy(), x.imag.copy(), radices=(8, 8))
    assert rel_err(np.asarray(yr) + 1j * np.asarray(yi),
                   np.fft.fft(x, axis=-1)) < 1e-5
    assert not pf.can_use_pallas(2 ** 21)          # needs 3 stages
    assert not pf.can_use_pallas(131)              # prime > 128
    assert pf.can_use_pallas(1024)
    # 3-stage explicit radices are supported (r2 generalized core)
    yr, yi = pf.fft_last(x.real.copy(), x.imag.copy(), radices=(4, 4, 4))
    assert rel_err(np.asarray(yr) + 1j * np.asarray(yi),
                   np.fft.fft(x, axis=-1)) < 1e-5
    with pytest.raises(ValueError):  # >3 stages unsupported
        pf.fft_last(x.real.copy(), x.imag.copy(), radices=(2, 2, 4, 4))


def test_plan_use_pallas_local():
    x = rand_c64((16, 16, 16), seed=5)
    p = offt_tpu.plan((16, 16, 16), "complex64",
                      params=PlanParams(use_pallas=1), planar=True)
    yr, yi = p((x.real.copy(), x.imag.copy()))
    assert rel_err(np.asarray(yr) + 1j * np.asarray(yi), np.fft.fftn(x)) < 1e-5


def test_plan_use_pallas_complex_api():
    x = rand_c64((16, 16, 16), seed=6)
    got = offt_tpu.fft3d(x, params=PlanParams(use_pallas=1))
    assert rel_err(got, np.fft.fftn(x)) < 1e-5


def test_pencil_use_pallas():
    x = rand_c64((16, 16, 16), seed=7)
    mesh = make_mesh(2, 2)
    got = offt_tpu.fft3d(x, mesh=mesh,
                         params=PlanParams(p1=2, use_pallas=1))
    assert rel_err(got, np.fft.fftn(x)) < 1e-5


def test_pallas_fallback_fp64():
    # complex128 silently falls back to the unfused path
    x = rand_c64((8, 8, 8), seed=8).astype(np.complex128)
    got = offt_tpu.fft3d(x, params=PlanParams(use_pallas=1))
    assert rel_err(got, np.fft.fftn(x)) < 1e-12


def test_fused_rfft_kernel():
    for n in [16, 64, 256]:
        x = np.random.default_rng(n).standard_normal((10, n)).astype(np.float32)
        yr, yi = pf.rfft_last_planar(x)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        want = np.fft.rfft(x, axis=-1)
        assert rel_err(got, want) < 1e-5, n
    assert pf.can_use_rfft_last(256)
    assert not pf.can_use_rfft_last(7)       # odd
    with pytest.raises(ValueError):
        pf.rfft_last_planar(np.zeros((4, 7), np.float32))


def test_scale_folded_inverse():
    x = rand_c64((16, 16, 16), seed=77)
    yr, yi = pf.fft3d_planar(x.real.copy(), x.imag.copy(), inverse=True)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert rel_err(got, np.fft.ifftn(x)) < 1e-5


def test_padded_x_roundtrip():
    # shapes that trigger the stride-broken fwd AND inv paths
    x = rand_c64((16, 128, 128), seed=78)
    fr, fi = pf.fft3d_planar(x.real.copy(), x.imag.copy())
    br, bi = pf.fft3d_planar(np.asarray(fr), np.asarray(fi), inverse=True)
    rt = np.asarray(br) + 1j * np.asarray(bi)
    assert rel_err(rt, x) < 1e-5


def test_padded_x_y_true():
    """``y_true`` skips trailing pad ROWS of the padded intermediate —
    the x-chunk base-stride probe surface (DESIGN.md, 'the stack6
    ceiling is the MXU' entry; measured neutral on v5e, kept as tested
    capability)."""
    n, ny, nz = 16, 32, 128
    x = rand_c64((n, ny + 8, nz + 8), seed=81)
    gr, gi = pf.fft_x_from_padded(x.real.copy(), x.imag.copy(),
                                  z_true=nz, y_true=ny)
    got = np.asarray(gr) + 1j * np.asarray(gi)
    assert got.shape == (n, ny, nz)
    want = np.fft.fft(x[:, :ny, :nz], axis=0)
    assert rel_err(got, want) < 1e-5


def test_rfft3d_packed_fast_path():
    """Packed-Nyquist 3-D r2c: internal frequency axis = exactly M lanes
    (the 129-lane numpy layout costs ~2x traffic on TPU tiled storage)."""
    shape = (8, 16, 256)
    x = np.random.default_rng(3).standard_normal(shape).astype(np.float32)
    want = np.fft.rfftn(x.astype(np.float64))
    # numpy layout
    yr, yi = pf.rfft3d_planar(x)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert got.shape == want.shape
    assert rel_err(got, want) < 1e-5
    # packed layout + unpack converter
    pr, pi_ = pf.rfft3d_planar(x, packed=True)
    assert pr.shape[-1] == 128
    ur, ui = pf.unpack_rfft3d(pr, pi_)
    assert rel_err(np.asarray(ur) + 1j * np.asarray(ui), want) < 1e-5
    # pack converter inverts unpack
    rr, ri = pf.pack_rfft3d(ur, ui)
    assert rel_err(np.asarray(rr), np.asarray(pr)) < 1e-5


def test_irfft3d_both_layouts():
    shape = (8, 16, 256)
    rng = np.random.default_rng(4)
    x = rng.standard_normal(shape).astype(np.float32)
    yr, yi = pf.rfft3d_planar(x)
    back = pf.irfft3d_planar(yr, yi, shape[-1])
    assert rel_err(np.asarray(back), x) < 1e-5
    pr, pi_ = pf.rfft3d_planar(x, packed=True)
    backp = pf.irfft3d_planar(pr, pi_, shape[-1], packed=True)
    assert rel_err(np.asarray(backp), x) < 1e-5
    # c2r against numpy on an arbitrary hermitian spectrum
    w = np.fft.rfftn(rng.standard_normal(shape))
    br = pf.irfft3d_planar(w.real.astype(np.float32),
                           w.imag.astype(np.float32), shape[-1])
    want = np.fft.irfftn(w, s=shape, axes=(0, 1, 2))
    assert rel_err(np.asarray(br), want) < 1e-5


def test_plan_packed_rfft():
    import offt_tpu

    shape = (8, 16, 256)
    x = np.random.default_rng(5).standard_normal(shape).astype(np.float32)
    from offt_tpu.plan.params import PlanParams
    params = PlanParams(use_pallas=1)
    p = offt_tpu.plan(shape, "complex64", real=True, planar=True,
                      packed=True, params=params, use_cache=False)
    pr, pi_ = p(x)
    assert pr.shape == shape[:-1] + (128,)
    pinv = offt_tpu.plan(shape, "complex64", real=True, inverse=True,
                         planar=True, packed=True, params=params,
                         use_cache=False)
    back = pinv((pr, pi_))
    assert rel_err(np.asarray(back), x) < 1e-5
    # packed demands eligibility
    with pytest.raises(ValueError):
        offt_tpu.plan((7, 7, 7), "complex64", real=True, planar=True,
                      packed=True, use_cache=False)
    with pytest.raises(ValueError):
        offt_tpu.plan(shape, "complex64", real=True, packed=True,
                      use_cache=False)  # planar required


def test_pick_lane_tile_mosaic_rules():
    """The lane tile must be a 128-multiple or the full extent (Mosaic
    rule); regression for lanes=320*320 where halving a 768 guess finds
    no legal value (hardware-only failure, caught on v5e)."""
    pick = pf._pick_lane_tile
    assert pick(320 * 320, 768) == 640          # largest 128-mult divisor
    assert pick(256 * 256, 1024) == 1024
    assert pick(24, 128) == 24                  # full extent fallback
    assert pick(97 * 3, 512) == 97 * 3          # no 128-mult divisor
    assert pick(256, 64) == 128 or pick(256, 64) == 256  # legalized
    for lanes, tgt in [(320 * 320, 768), (768 * 768, 512), (1, 128)]:
        tl = pick(lanes, tgt)
        assert lanes % tl == 0 and (tl % 128 == 0 or tl == lanes)


def test_three_stage_core_all_kernels():
    """Generalized 1-3 stage core (r2): every kernel entry point accepts a
    3-stage radix tuple and matches numpy (reference analogue: FFTW plans
    arbitrary factorizations per axis, offt-compute.c:700-760)."""
    x = rand_c64((4, 64, 64), seed=11)
    # sublane (middle axis)
    yr, yi = pf.fft_sublane(x.real.copy(), x.imag.copy(), 1,
                            radices=(4, 4, 4))
    assert rel_err(np.asarray(yr) + 1j * np.asarray(yi),
                   np.fft.fft(x, axis=1)) < 1e-5
    # slab (y, z fused) with mixed stage counts
    yr, yi = pf.fft_slab_yz(x.real.copy(), x.imag.copy(),
                            rad_y=(4, 4, 4), rad_z=(8, 8))
    ref = np.fft.fft(np.fft.fft(x, axis=-1), axis=-2)
    assert rel_err(np.asarray(yr) + 1j * np.asarray(yi), ref) < 1e-5
    # inverse roundtrip through the 3-stage path
    br, bi = pf.fft_sublane(np.asarray(yr), np.asarray(yi), 1,
                            inverse=True, radices=(4, 4, 4),
                            scale=1.0 / 64)
    br2, bi2 = pf.fft_last(np.asarray(br), np.asarray(bi),
                           inverse=True, radices=(4, 4, 4),
                           scale=1.0 / 64)
    assert rel_err(np.asarray(br2) + 1j * np.asarray(bi2), x) < 1e-5


def test_three_stage_feasibility_gate():
    """PlanParams radix validation mirrors the kernel's stage limits —
    but only when the Pallas path is requested; the unfused stockham
    path runs any <=MAX_RADIX factorization (e.g. 2^20 = 128*128*64)."""
    from offt_tpu.plan.params import infeasible_reason
    from offt_tpu.plan.api import ProblemSpec
    spec = ProblemSpec(shape=(64, 64, 64), dtype="complex64")
    ok = PlanParams(use_pallas=1, radix_z=(4, 4, 4))
    assert infeasible_reason(spec, ok) is None
    bad4 = PlanParams(use_pallas=1, radix_z=(2, 2, 4, 4))
    assert "3 kernel stages" in infeasible_reason(spec, bad4)
    spec512 = ProblemSpec(shape=(512, 512, 512), dtype="complex64")
    bad_big = PlanParams(use_pallas=1, radix_z=(2, 4, 64))
    assert "must be in" in infeasible_reason(spec512, bad_big)
    bad_one = PlanParams(use_pallas=1, radix_z=(1, 8, 8))
    assert "must be in" in infeasible_reason(spec, bad_one)
    # stockham path: the same tuples are feasible (run unfused)
    assert infeasible_reason(spec, bad4.replace(use_pallas=0)) is None
    assert infeasible_reason(spec512, bad_big.replace(use_pallas=0)) is None
    # x_tile validation
    assert infeasible_reason(spec512, PlanParams(x_tile=(16, 128))) is None
    assert "x_tile" in infeasible_reason(spec512, PlanParams(x_tile=(7, 128)))
    assert "x_tile" in infeasible_reason(spec512, PlanParams(x_tile=(8, 96)))


@pytest.mark.parametrize("norm,shape", [
    ("ortho", (16, 16, 16)),
    ("forward", (16, 16, 16)),
    # 128^3: row stride 64 KiB pow2 -> the stride-padded x path is
    # active, exercising the out_scale fold in fft_x_from_padded (fwd)
    # and the out_scale/(N^3) slab fold (inv)
    ("ortho", (128, 128, 128)),
])
def test_norm_folded_into_fused_path(norm, shape):
    """norm scaling on the fused planar c2c path rides the final stage's
    constant tables (no elementwise pass); matches numpy's conventions
    fwd and inv (reference: FFTW leaves scaling to the caller — this is
    a TPU-side upgrade, free at kernel level)."""
    x = rand_c64(shape, seed=9)
    p = offt_tpu.plan(shape, "complex64", planar=True, norm=norm,
                      params=PlanParams(use_pallas=1), use_cache=False)
    yr, yi = p((x.real.copy(), x.imag.copy()))
    want = np.fft.fftn(x, norm=norm)
    assert rel_err(np.asarray(yr) + 1j * np.asarray(yi), want) < 1e-5
    pinv = offt_tpu.plan(shape, "complex64", planar=True, norm=norm,
                         inverse=True, params=PlanParams(use_pallas=1),
                         use_cache=False)
    br, bi = pinv((yr, yi))
    assert rel_err(np.asarray(br) + 1j * np.asarray(bi), x) < 1e-5


def test_x_tile_plan_path():
    """x_tile threads from PlanParams through the padded-x kernels (fwd
    and inv) and stays numerically identical to the default tile."""
    shape = (128, 128, 128)
    x = rand_c64(shape, seed=12)
    base = offt_tpu.plan(shape, "complex64", planar=True,
                         params=PlanParams(use_pallas=1), use_cache=False)
    tiled = offt_tpu.plan(shape, "complex64", planar=True,
                          params=PlanParams(use_pallas=1, x_tile=(16, 128)),
                          use_cache=False)
    br, bi = base((x.real.copy(), x.imag.copy()))
    tr, ti = tiled((x.real.copy(), x.imag.copy()))
    assert rel_err(np.asarray(tr) + 1j * np.asarray(ti),
                   np.asarray(br) + 1j * np.asarray(bi)) < 1e-6
    inv = offt_tpu.plan(shape, "complex64", planar=True, inverse=True,
                        params=PlanParams(use_pallas=1, x_tile=(16, 128)),
                        use_cache=False)
    rr, ri = inv((tr, ti))
    assert rel_err(np.asarray(rr) + 1j * np.asarray(ri), x) < 1e-5
    # vmem-busting tile rejected at feasibility
    from offt_tpu.plan.params import infeasible_reason
    from offt_tpu.plan.api import ProblemSpec
    spec = ProblemSpec(shape=(2048, 2048, 2048), dtype="complex64")
    assert "VMEM" in infeasible_reason(spec, PlanParams(x_tile=(64, 512)))


def test_dual_untangle_branches():
    """M > _H_DOT_MAX routes the r2c/c2r untangle through the
    dual-transform path (second half-transform fwd; reversal folded into
    the gamma constant inv) — every other r2c test here has M <= 128 and
    only exercises the dense-dot branch. nz=512 -> M=256 covers: the
    slab fwd kernel, the 3-D packed path + roundtrip, the numpy-layout
    unpack, and the 1-D packed c2r kernel."""
    assert pf._H_DOT_MAX == 128
    rng = np.random.default_rng(13)
    # fwd slab (M=256, dual)
    x = rng.standard_normal((4, 16, 512)).astype(np.float32)
    yr, yi = pf.rfft_slab_yz(x)
    w = np.fft.rfft(x, axis=-1)
    packed = w[..., :256].copy()
    packed[..., 0] = w[..., 0].real + 1j * w[..., 256].real
    want = np.fft.fft(packed, axis=-2)
    assert rel_err(np.asarray(yr) + 1j * np.asarray(yi), want) < 1e-5
    # full 3-D packed roundtrip + numpy layout through plan()
    x3 = rng.standard_normal((64, 16, 512)).astype(np.float32)
    pr, pi_ = pf.rfft3d_planar(x3, packed=True)
    back = pf.irfft3d_planar(pr, pi_, 512, packed=True)
    assert rel_err(np.asarray(back), x3) < 1e-5
    got = pf.rfft3d_planar(x3)
    want3 = np.fft.rfftn(x3.astype(np.float64))
    assert rel_err(np.asarray(got[0]) + 1j * np.asarray(got[1]), want3) < 1e-5
    # 1-D packed c2r kernel, dual branch
    x1 = rng.standard_normal((16, 512)).astype(np.float32)
    qr, qi = pf.rfft_last_planar(x1, packed=True)
    back1 = pf.icrfft_last_planar(np.asarray(qr), np.asarray(qi))
    assert rel_err(back1, x1) < 1e-5


def test_fft_last_large_n():
    """n=2048 last-axis kernel: the default 512-row block needs the
    scoped-vmem limit RAISED (32 MB vs Mosaic's 16 MB default) — found
    on hardware via 8x2048^2 2-D plans (r2); interpret mode locks the
    call structure and numerics."""
    x = rand_c64((4, 2048), seed=20)
    yr, yi = pf.fft_last(x.real.copy(), x.imag.copy())
    assert rel_err(np.asarray(yr) + 1j * np.asarray(yi),
                   np.fft.fft(x, axis=-1)) < 1e-5


@pytest.mark.parametrize("inverse", [False, True])
def test_padded_x_1d_route(inverse):
    """fft_1d_planar routes a 3rd-from-last axis with a 64KiB-divisible
    row stride through pad + the pitched-read x kernel (the distributed
    pipeline's local x stage fix; gate mirrors fft3d_planar's)."""
    x = rand_c64((16, 32, 512), seed=91)     # 32*512*4 = 2^16 stride
    assert pf.can_use_padded_x(16, 32, 512)
    yr, yi = pf.fft_1d_planar(x.real.copy(), x.imag.copy(), axis=0,
                              inverse=inverse)
    fn = np.fft.ifft if inverse else np.fft.fft
    want = fn(x.astype(np.complex128), axis=0)
    assert rel_err(np.asarray(yr) + 1j * np.asarray(yi), want) < 1e-5


def test_padded_x_1d_route_batched():
    x = rand_c64((2, 16, 32, 512), seed=92)
    yr, yi = pf.fft_1d_planar(x.real.copy(), x.imag.copy(), axis=1)
    want = np.fft.fft(x.astype(np.complex128), axis=1)
    assert rel_err(np.asarray(yr) + 1j * np.asarray(yi), want) < 1e-5


def test_padded_x_1d_route_x_tile():
    """The x_tile knob reaches fft_1d_planar's padded-x branch (the
    tuner's x_tile dimension must change the executable it measures, not
    silently no-op on the distributed local-x stage)."""
    x = rand_c64((16, 32, 512), seed=93)
    yr, yi = pf.fft_1d_planar(x.real.copy(), x.imag.copy(), axis=0,
                              x_tile=(16, 128))
    want = np.fft.fft(x.astype(np.complex128), axis=0)
    assert rel_err(np.asarray(yr) + 1j * np.asarray(yi), want) < 1e-5
