"""precision="stack3": 2-word contraction-stacked bf16 radix dots.

The mid-accuracy tier between "default" (one bf16 pass, ~5e-3 on TPU)
and "stack6" (3-word/6-product, ~2e-7): G and x split into TWO bf16
words each, the three largest cross products G0x0 + G0x1 + G1x0 stacked
along the contraction — depth 6r instead of stack6's 12r, HALF the MXU
slots, dropping only the O(2^-16) G1x1 term (~5e-6 measured emulated,
matching the round-4 "dropping any term costs ~1e-5" decomposition in
DESIGN.md). Explicit opt-in via PlanParams(precision="stack3") — never
a tuner search point (the tuner scores time only and would always trade
the 1e-6 accuracy bar away; tune/space.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from offt_tpu.kernels import pallas_fft as pf

# measured emulated ~6e-6; bar leaves jitter headroom while proving the
# tier sits far from both neighbors (stack6 < 1e-6, default bf16 ~5e-3)
BAR = 5e-5


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def _planar(rng, shape):
    return (rng.standard_normal(shape).astype(np.float32),
            rng.standard_normal(shape).astype(np.float32))


def _relerr(got, ref):
    return np.linalg.norm(got - ref) / np.linalg.norm(ref)


def test_stack3_tables_are_half_depth():
    t6 = pf._tables(64, 8, False, stacked=3)
    t3 = pf._tables(64, 8, False, stacked=2)
    assert t3["g1"].dtype == np.dtype("bfloat16")
    assert t3["g1"].shape == (16, 48)            # (2r1, 6r1)
    assert t6["g1"].shape == (16, 96)            # (2r1, 12r1)
    assert t3["g2"].shape == (8, 16, 48)
    # legacy bool spelling still means stack6
    assert pf._tables(64, 8, False, stacked=True)["g1"].shape == (16, 96)


def test_stack3_pick_same_split_family():
    # halving the stacked depth scales both candidates' pass counts
    # equally at these sizes — the MXU+VPU split still wins
    assert pf._pick_2stage(256, stacked=2) == (64, 4)
    assert pf._pick_2stage(512, stacked=2) == (64, 8)


def test_stack3_error_tier(rng):
    """stack3 lands between stack6 and a plain bf16 pass."""
    re, im = _planar(rng, (8, 64, 64))
    x = re + 1j * im
    ref = np.fft.fftn(x)
    errs = {}
    for prec in ("stack6", "stack3"):
        yr, yi = pf.fft3d_planar(jnp.asarray(re), jnp.asarray(im),
                                 precision=prec)
        errs[prec] = _relerr(np.asarray(yr) + 1j * np.asarray(yi), ref)
    assert errs["stack6"] < 1e-6
    assert errs["stack3"] < BAR
    assert errs["stack3"] > errs["stack6"]       # it IS a lower tier


def test_stack3_inverse_and_vpu_split(rng):
    re, im = _planar(rng, (8, 64, 64))
    x = re + 1j * im
    yr, yi = pf.fft3d_planar(jnp.asarray(re), jnp.asarray(im),
                             inverse=True, precision="stack3")
    assert _relerr(np.asarray(yr) + 1j * np.asarray(yi),
                   np.fft.ifftn(x)) < BAR
    # explicit MXU+VPU split radices route _sublane_core_vpu with
    # half-depth tables ((2r1, 6r1) per j)
    yr, yi = pf.fft3d_planar(jnp.asarray(re), jnp.asarray(im),
                             precision="stack3", rad_z=(16, 4),
                             rad_y=(16, 4), rad_x=(4, 2))
    assert _relerr(np.asarray(yr) + 1j * np.asarray(yi),
                   np.fft.fftn(x)) < BAR


def test_stack3_rfft_slab_packed(rng):
    xr = rng.standard_normal((4, 64, 256)).astype(np.float32)
    yr, yi = pf.rfft_slab_yz(jnp.asarray(xr), precision="stack3")
    v = np.fft.rfft(xr, axis=-1)
    packed = np.concatenate(
        [v[..., :1].real + 1j * v[..., 128:129].real, v[..., 1:128]],
        axis=-1)
    ref = np.fft.fft(packed, axis=-2)
    assert _relerr(np.asarray(yr) + 1j * np.asarray(yi), ref) < BAR


def test_stack3_plan_roundtrip(rng):
    import offt_tpu

    re, im = _planar(rng, (32, 32, 32))
    x = re + 1j * im
    p = offt_tpu.plan((32, 32, 32), "complex64", planar=True,
                      use_cache=False)
    p = offt_tpu.plan((32, 32, 32), "complex64", planar=True,
                      params=p.params.replace(precision="stack3",
                                              use_pallas=1),
                      use_cache=False)
    yr, yi = p._fn(re, im)
    assert _relerr(np.asarray(yr) + 1j * np.asarray(yi),
                   np.fft.fftn(x)) < BAR


def test_stack3_feasibility():
    from offt_tpu.plan.params import (PlanParams, ProblemSpec,
                                      infeasible_reason)

    spec = ProblemSpec((64, 64, 64))
    assert infeasible_reason(
        spec, PlanParams(precision="stack3", use_pallas=1)) is None
    # like stack6: without Pallas it duplicates 'highest' — rejected
    assert infeasible_reason(
        spec, PlanParams(precision="stack3", use_pallas=0)) is not None


def test_stack3_not_a_search_point():
    from offt_tpu.plan.params import ProblemSpec
    from offt_tpu.tune.space import build_space

    # include_pallas=True: CPU hosts default the Pallas knob block off
    space = build_space(ProblemSpec((64, 64, 64)), include_pallas=True)
    prec = [d for d in space.dims if d.name == "precision"]
    assert prec, "precision dim missing from the Pallas knob block"
    assert "stack3" not in prec[0].values
    assert "default" not in prec[0].values
