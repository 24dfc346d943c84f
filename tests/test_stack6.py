"""precision="stack6": contraction-stacked 6-term bf16 radix dots.

The same six cross products as precision=highest (bf16x6), issued as ONE
deep bf16 matmul per radix stage instead of six shallow passes — f32-grade
accuracy (~2e-7 measured at 256^3 on v5e) at ~1/3 the MXU time on
depth-limited dots. These tests run the kernels in interpret mode on CPU;
the arithmetic (bf16 splits + f32-accumulated dots) is identical to TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from offt_tpu.kernels import pallas_fft as pf

BAR = 1e-6


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _planar(rng, shape):
    re = rng.standard_normal(shape).astype(np.float32)
    im = rng.standard_normal(shape).astype(np.float32)
    return re, im


def _relerr(got, ref):
    return np.linalg.norm(got - ref) / np.linalg.norm(ref)


def test_stack6_tables_are_bf16_stacked():
    t = pf._tables(64, 8, False, stacked=True)
    assert t["g1"].dtype == np.dtype("bfloat16")
    assert t["g1"].shape == (16, 96)          # (2r1, 12r1)
    assert t["g2"].shape == (8, 16, 96)       # (r1, 2r2, 12r2)
    # non-loop-core shapes fall back to f32 (merge core at highest)
    t = pf._tables(64, 64, False, stacked=True)
    assert t["g1"].dtype == np.float32


def test_stack6_pick_prefers_vpu_split():
    # the MXU+VPU split (full-width stage-A dots + butterfly stage) wins
    # the per-element pass-cost model at pow2 sizes
    assert pf._pick_2stage(256, stacked=True) == (64, 4)
    assert pf._pick_2stage(128, stacked=True) == (64, 2)
    assert pf._pick_2stage(512, stacked=True) == (64, 8)
    # explicit radices always win
    assert pf._pick_2stage(256, radices=(16, 16), stacked=True) == (16, 16)
    # among loop-core pairs the model still prefers small r1 on ties
    # (historical (8,32)-beats-(16,16) measurement)
    def dot_cost(r):
        return (-(-2 * r // 128)) * (-(-12 * r // 128)) / r
    assert dot_cost(8) + dot_cost(32) < dot_cost(16) + dot_cost(16)


def test_stack6_fft3d_c2c(rng):
    re, im = _planar(rng, (8, 64, 64))
    x = re + 1j * im
    yr, yi = pf.fft3d_planar(jnp.asarray(re), jnp.asarray(im),
                             precision="stack6")
    assert _relerr(np.asarray(yr) + 1j * np.asarray(yi),
                   np.fft.fftn(x)) < BAR


def test_stack6_fft3d_inverse(rng):
    re, im = _planar(rng, (8, 64, 64))
    x = re + 1j * im
    yr, yi = pf.fft3d_planar(jnp.asarray(re), jnp.asarray(im),
                             inverse=True, precision="stack6")
    assert _relerr(np.asarray(yr) + 1j * np.asarray(yi),
                   np.fft.ifftn(x)) < BAR


def test_stack6_merge_fallback(rng):
    # radix > _LOOP_MAX_RADIX cannot stack; must silently run highest
    re, im = _planar(rng, (8, 64))
    x = re + 1j * im
    yr, yi = pf.fft_last(jnp.asarray(re), jnp.asarray(im),
                         precision="stack6", radices=(64, 1))
    assert _relerr(np.asarray(yr) + 1j * np.asarray(yi),
                   np.fft.fft(x, axis=-1)) < BAR


def test_stack6_rfft_slab_packed(rng):
    xr = rng.standard_normal((4, 64, 256)).astype(np.float32)
    yr, yi = pf.rfft_slab_yz(jnp.asarray(xr), precision="stack6")
    v = np.fft.rfft(xr, axis=-1)
    packed = np.concatenate(
        [v[..., :1].real + 1j * v[..., 128:129].real, v[..., 1:128]],
        axis=-1)
    ref = np.fft.fft(packed, axis=-2)
    assert _relerr(np.asarray(yr) + 1j * np.asarray(yi), ref) < BAR


def test_stack6_plan_roundtrip(rng):
    import offt_tpu

    re, im = _planar(rng, (32, 32, 32))
    x = re + 1j * im
    params = None
    p = offt_tpu.plan((32, 32, 32), "complex64", planar=True,
                      params=params, use_cache=False)
    # force stack6 + pallas explicitly (CPU default is highest/no-pallas)
    p = offt_tpu.plan((32, 32, 32), "complex64", planar=True,
                      params=p.params.replace(precision="stack6",
                                              use_pallas=1),
                      use_cache=False)
    yr, yi = p._fn(re, im)
    assert _relerr(np.asarray(yr) + 1j * np.asarray(yi),
                   np.fft.fftn(x)) < BAR


def test_precision_feasibility():
    from offt_tpu.plan.params import PlanParams, ProblemSpec, infeasible_reason

    spec = ProblemSpec((64, 64, 64))
    assert infeasible_reason(
        spec, PlanParams(precision="stack6", use_pallas=1)) is None
    assert infeasible_reason(spec, PlanParams(precision="bogus")) is not None
    assert infeasible_reason(
        spec, PlanParams(precision="high", use_pallas=1)) is not None
    # stack6 without the Pallas kernels is a duplicate of 'highest' on the
    # unfused path — rejected so the search space has no identical points
    assert infeasible_reason(
        spec, PlanParams(precision="stack6", use_pallas=0)) is not None
