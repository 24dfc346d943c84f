"""Fused Pallas TPU kernels: batched 1-D FFT in one HBM round trip.

The unfused matmul path (stockham.py) costs ~3-5 HBM passes per axis
(reshape/transpose materialization between radix stages). These kernels do
the full 1-or-2-stage mixed-radix transform in VMEM, so each axis of a 3-D
FFT is exactly one HBM read + one write:

- ``fft_sublane``: transform along any non-last axis of a (N, L) tile —
  used for the y and x axes of a 3-D array *without any transposes at
  all*: both radix stages are sublane-axis MXU contractions and the
  natural output order falls out of the final reshape.
- ``fft_last``: transform along the last (lane) axis — the same core
  wrapped in a VMEM transpose sandwich (lanes cannot be split in-register).

Everything is planar (separate float32 real/imag arrays): TPU Pallas has no
complex dtype, and some TPU runtimes cannot transfer complex arrays at all.
Each complex radix stage is ONE folded real matmul [[Fr,-Fi],[Fi,Fr]] @
[re; im] (doubled contraction depth = 2x MXU utilization at sub-128
radices) at precision=HIGHEST (bf16x6) — measured 1.7e-7 rel err at 256^3
on v5e vs 5e-3 with default precision.

Reference parity note: this subsumes the FFTW 1-D plan cache + explicit
pack/unpack/transpose kernels of rchyena/offt (offt-compute.c:329-489,
905-2993); the cache sub-tile knobs (Px1/Py1/...) collapse into the block
shape knobs (rows/lanes per block).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dft

# Default MXU precision for the DFT contractions. "highest" (bf16x6) is
# required for the 1e-6 fp32 target; the tuner may trade it down via the
# precision argument for error-tolerant workloads.
DEFAULT_PRECISION = "highest"

# Mosaic's DEFAULT scoped-vmem limit is 16 MiB, but v5e accepts raised
# limits (probed: blocks up to ~85 MiB compile and run at
# vmem_limit_bytes=128 MiB). Large-shape kernels (512^3 slabs, padded-x
# blocks) pass an explicit limit instead of refusing to fuse.
_VMEM_DEFAULT = 16 << 20
# probed ceiling is 128 MiB on v5e; 120 leaves headroom (and enables
# tb=2 slab blocks at 768^2: 93.5 -> 88.0 ms full 768^3)
_VMEM_CAP = 120 << 20


def _vmem_params(est_bytes: int, grid_dims: int = 0) -> dict:
    """compiler_params kwargs: scoped-vmem limit + grid semantics.

    Raises the scoped-vmem limit when the estimated working set exceeds
    the Mosaic default; a fixed 2 MiB of headroom covers what the
    block-size formulas don't model (constant tables, Mosaic stack
    temps) — a 512^3 tuning trial OOM'd the scoped limit by exactly its
    46 KiB of radix tables.

    ``grid_dims``: every kernel in this module writes disjoint 1:1
    blocks, so OFFT_DIMSEM=1 declares all grid dims "parallel" instead
    of Mosaic's default arbitrary/sequential semantics (A/B queued in
    run_round4b_hw.py; default stays off until the chip receipt)."""
    cp = {}
    if grid_dims and os.environ.get("OFFT_DIMSEM", "0") == "1":
        cp["dimension_semantics"] = ("parallel",) * grid_dims
    if _stack6_presplit():
        # The stage-wide operand pre-split keeps 6 bf16 copies of the
        # block live alongside the f32 planes (~1.3x scoped usage,
        # measured: 18.22M vs the 16M default at a 128-block, 22.76M vs
        # 19.75M at a 256-block). Scale the estimate and never fall back
        # to the Mosaic default.
        est_bytes = int(est_bytes * 1.5)
        cp["vmem_limit_bytes"] = int(
            min(max(est_bytes + (2 << 20), 24 << 20), _VMEM_CAP))
    elif est_bytes > _VMEM_DEFAULT:
        cp["vmem_limit_bytes"] = int(min(est_bytes + (2 << 20), _VMEM_CAP))
    if not cp:
        return {}
    return {"compiler_params": pltpu.CompilerParams(**cp)}


def _interpret() -> bool:
    # OFFT_FORCE_MOSAIC=1: emit real Mosaic kernels even on a CPU host —
    # for AOT compiles against a TPU topology (tests/test_memlayout_tpu
    # measures the TRUE custom-call layout behavior; interpret-mode
    # lowering legally fuses away the relayouts those tests pin down)
    if os.environ.get("OFFT_FORCE_MOSAIC", "0") == "1":
        return False
    return jax.default_backend() != "tpu"


def _stack6_presplit() -> bool:
    """A/B switch for the stage-wide operand pre-split (read at trace
    time; see _sublane_core_vpu)."""
    return os.environ.get("OFFT_STACK6_PRESPLIT", "0") == "1"


def _fold_complex(f: np.ndarray) -> np.ndarray:
    """Real block matrix G = [[Fr, -Fi], [Fi, Fr]] so that
    G @ [re; im] == [Re(F@x); Im(F@x)] — one real matmul with doubled
    contraction depth instead of 4 small ones (2x MXU utilization at
    sub-128 radices, 4x fewer dot launches)."""
    top = np.concatenate([f.real, -f.imag], axis=1)
    bot = np.concatenate([f.imag, f.real], axis=1)
    return np.concatenate([top, bot], axis=0)


# --------------------------------------------------------------------------
# "stack6" precision: f32-grade accuracy at ~1/3 the MXU time of
# precision=highest for depth-limited dots.
#
# precision=highest on a bf16 MXU issues SIX sequential passes (3-word
# operand splits, the 6 largest cross products). Our radix dots have
# contraction depth 2r = 32..64 of the MXU's 128 — each pass wastes
# 50-75% of the systolic depth. Instead we stack the same six products
# along the CONTRACTION axis: G = G0+G1+G2 (exact 3-word bf16 split,
# precomputed), x = x0+x1+x2 (runtime VPU split), and
#   dot([G0 G0 G0 G1 G1 G2], [x0;x1;x2;x0;x1;x0])
# computes all six terms in ONE bf16 matmul of depth 12r with f32
# accumulation. Depth 12r (192 at r=16) fills the MXU instead of looping
# shallow passes: same arithmetic, ~3x less MXU time. Emulated accuracy
# over a 6-dot chain (the depth of a 256^3 transform): 1.95e-7 vs
# highest's measured 1.24e-7 — the dropped terms are O(2^-27).
# Full-depth dots (the r2c untangle matrices, depth 2M >= 256) gain
# nothing and stay at highest.
# --------------------------------------------------------------------------

_STACK_WORDS = {"stack6": 3, "stack3": 2}


def _stack_words(precision) -> int:
    """Word count of a stacked precision mode: 3 for "stack6" (3-word
    splits, 6 retained cross products, ~2e-7), 2 for "stack3" (2-word
    splits, 3 retained products, ~2e-5 at HALF the MXU slots), 0 for the
    non-stacked modes."""
    return _STACK_WORDS.get(precision, 0)


def _words_of(stacked) -> int:
    """Normalize a ``stacked`` table/picker argument: False/0 -> 0,
    True -> 3 (legacy stack6 spelling), else the word count itself."""
    if stacked is True:
        return 3
    return int(stacked or 0)


def _stack_np(g: np.ndarray, words: int = 3) -> np.ndarray:
    """Exact ``words``-word bf16 split of a constant matrix, the
    retained cross products stacked along the contraction (last) axis.
    words=3 (stack6) pairs with the runtime operand order
    [x0; x1; x2; x0; x1; x0]; words=2 (stack3) with [x0; x1; x0] —
    products G0x0 + (G0x1 + G1x0), dropping the O(2^-16) G1x1 term."""
    import ml_dtypes

    bf = ml_dtypes.bfloat16
    g = g.astype(np.float32)
    g0 = g.astype(bf).astype(np.float32)
    g1 = (g - g0).astype(bf).astype(np.float32)
    if words == 2:
        return np.concatenate([g0.astype(bf), g0.astype(bf),
                               g1.astype(bf)], axis=-1)
    g2 = (g - g0 - g1).astype(bf)
    return np.concatenate([g0.astype(bf), g0.astype(bf), g0.astype(bf),
                           g1.astype(bf), g1.astype(bf), g2], axis=-1)


def _stack6_np(g: np.ndarray) -> np.ndarray:
    return _stack_np(g, 3)


def _split3(x):
    """Runtime 3-word bf16 split of a data operand (x = x0 + x1 + x2 up
    to the dropped O(2^-27) tail)."""
    x0 = x.astype(jnp.bfloat16)
    r = x - x0.astype(jnp.float32)
    x1 = r.astype(jnp.bfloat16)
    x2 = (r - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    return x0, x1, x2


def _split3_cat(x):
    """3-word split stacked along the contraction (first) axis in the
    order matching _stack_np(words=3)."""
    x0, x1, x2 = _split3(x)
    return jnp.concatenate([x0, x1, x2, x0, x1, x0], axis=0)


def _split2_cat(x):
    """2-word split stacked to match _stack_np(words=2)."""
    x0 = x.astype(jnp.bfloat16)
    x1 = (x - x0.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([x0, x1, x0], axis=0)


def _stacked_dot(g_cat, x):
    """One deep bf16 matmul == the shallow highest-precision passes.
    The stacking variant is inferred from the table: a stack6 table is
    6x the operand depth, a stack3 table 3x."""
    ratio = g_cat.shape[-1] // x.shape[0]
    cat = _split3_cat(x) if ratio == 6 else _split2_cat(x)
    return jnp.dot(g_cat, cat, preferred_element_type=jnp.float32)


def _dot_precision(precision: str) -> str:
    """Precision for direct (non-stacked) jnp.dot sites: the stacked
    modes only apply to the radix-stage dots; everything else runs
    highest."""
    return "highest" if _stack_words(precision) else precision


@functools.lru_cache(maxsize=None)
def _tables(n: int, r1: int, inverse: bool, scale: float = 1.0,
            stacked: bool = False):
    """Folded f32 DFT matrices + twiddles for n = r1 * r2.

    ``scale`` is folded into the twiddle table (applied exactly once per
    element between the stages) so inverse 1/N normalization costs zero
    extra HBM passes.

    When the LOOP core applies (max radix <= _LOOP_MAX_RADIX, r2 > 1),
    the "g2" slot instead carries a stacked (r1, 2r2, 2r2) family of
    per-row-group stage-B matrices with the twiddles (and scale) folded
    IN: y_k1 = fold(F2 * tw[k1, :]) @ a_k1. The VPU twiddle pass vanishes;
    A/B on v5e measured perf-NEUTRAL (the twiddle overlapped with MXU
    anyway) but accuracy improves ~20% (1.2e-7 vs 1.5e-7 at 256^3 — one
    fewer f32 rounding per element). _sublane_core dispatches on g2.ndim.

    ``stacked`` (a word count — 3 = stack6, 2 = stack3, True = 3): the
    g1/g2 matrices come back as bf16 contraction-stacked expansions (see
    _stack_np); only available on the loop-core path — otherwise f32
    tables are returned and callers fall back to precision=highest
    (detected via dtype)."""
    stacked = _words_of(stacked)
    r2 = n // r1
    f1 = dft.dft_matrix(r1, np.complex128, inverse)
    f2 = dft.dft_matrix(r2, np.complex128, inverse)
    tw = dft.twiddles(r1, r2, np.complex128, inverse) * scale  # (r1, r2)
    loop_core = max(r1, r2) <= _LOOP_MAX_RADIX and r2 > 1
    if loop_core:
        g2 = np.stack([_fold_complex(f2 * tw[k1][None, :])
                       for k1 in range(r1)])       # (r1, 2r2, 2r2)
    else:
        g2 = _fold_complex(f2)                     # (2r2, 2r2)
    g1 = _fold_complex(f1)                         # (2r1, 2r1)
    out = {"twr": tw.real.astype(np.float32),
           "twi": tw.imag.astype(np.float32)}
    if stacked and loop_core:
        # NOTE (measured, r2): pairing adjacent k1 stage-B matrices into
        # block-diagonal (4r2, 24r2) dots for full 128-row MXU occupancy
        # LOSES on v5e (256^3 c2c 1.94 ms vs 1.60 unpaired; big slab
        # flat) — Mosaic already amortizes weight loads across the
        # unrolled per-k1 dots, and the doubled weight footprint only
        # hurts. Keep the per-group (2r2, 12r2) layout.
        out["g1"] = _stack_np(g1, stacked)         # (2r1, 12r1) bf16
        out["g2"] = _stack_np(g2, stacked)         # (r1, 2r2, 12r2) bf16
    else:
        out["g1"] = g1.astype(np.float32)
        out["g2"] = g2.astype(np.float32)
    return out


def _pick_2stage(n: int, radices=None,
                 stacked: bool = False) -> tuple[int, int] | None:
    """Choose (r1, r2) with both <= MAX_RADIX, or None if not expressible.

    ``stacked`` (a word count — 3 = stack6, 2 = stack3, True = 3) picks
    the split by MXU PASS count of the contraction-stacked dots — stage
    cost ceil(12r/128) at stack6, ceil(6r/128) at stack3 — preferring a
    small r1 on ties (deeper, fewer stage-B dots). Measured at 256^3 on
    v5e: (8,32) 1.382 ms vs (16,16) 1.597 vs (32,8)-z 1.587."""
    stacked = _words_of(stacked)
    if radices is not None:
        if len(radices) == 2 and all(r <= dft.MAX_RADIX for r in radices):
            return int(radices[0]), int(radices[1])
        if len(radices) == 1 and radices[0] <= dft.MAX_RADIX:
            return int(radices[0]), 1
        return None
    if stacked:
        # per-element MXU pass cost: a dot stage of radix r streams
        # ceil(2r/128) row tiles x ceil(depth_mult*r/128) contraction
        # passes per r transformed rows (depth_mult = 2 * retained
        # products: 12 at stack6, 6 at stack3). The MXU+VPU split pays
        # only its stage-A dots (the butterfly stage is VPU adds);
        # tie-breaks prefer the split (frees the MXU) and then the
        # smaller VPU radix.
        mult = 12 if stacked == 3 else 6

        def dot_cost(r):
            return (-(-2 * r // 128)) * (-(-mult * r // 128)) / r

        best = None
        for a in range(2, _LOOP_MAX_RADIX + 1):
            if n % a != 0:
                continue
            b = n // a
            if not (1 < b <= _LOOP_MAX_RADIX):
                continue
            cost = (dot_cost(a) + dot_cost(b), 1, a)
            if best is None or cost < best[0]:
                best = (cost, (a, b))
        for rv in _VPU_RADICES:
            if n % rv:
                continue
            rm = n // rv
            if not (16 <= rm <= dft.MAX_RADIX):
                continue
            # light VPU-work penalty (scalar MACs grow with rv) so a
            # bigger butterfly must buy a real MXU saving to win
            cost = (dot_cost(rm) + 0.004 * rv, 0, rv)
            if best is None or cost < best[0]:
                best = (cost, (rm, rv))
        if best is not None:
            return best[1]
    rad = dft.factorize(n)
    if len(rad) == 1 and rad[0] <= dft.MAX_RADIX:
        return int(rad[0]), 1
    if len(rad) == 2:
        return int(rad[0]), int(rad[1])
    return None


# --------------------------------------------------------------------------
# shared 2-stage core: transform along the SUBLANE axis of (N, L) data.
# Mosaic cannot split the lane dimension in-register (probed on v5e:
# (512,256)->(512,16,16) is "unsupported shape cast"), but sublane splits,
# lane-preserving reshapes and minor-2D transposes all work — so every
# kernel routes the transform axis through sublanes.
# --------------------------------------------------------------------------

# radix ceiling for the fully-unrolled loop core (r1 + r2 dots per block);
# beyond this the merged-reshape core keeps trace/compile time bounded.
# Canonical value lives in dft.LOOP_MAX_RADIX (plan feasibility mirrors it).
_LOOP_MAX_RADIX = dft.LOOP_MAX_RADIX


def _pick_lane_tile(lanes: int, target: int) -> int:
    """Largest legal lane-tile <= target. Mosaic block rule: the lane dim
    must be a MULTIPLE OF 128 or equal the full array extent — naive
    halving of a non-divisor guess can walk straight past every legal
    value (lanes = 320*320 has 512 but no power-of-two-of-768 divisor;
    found on hardware, interpret mode never checks)."""
    target = min(target, lanes)
    if lanes % target == 0 and (target % 128 == 0 or target == lanes):
        return target
    best = max((c for c in range(128, target + 1, 128) if lanes % c == 0),
               default=0)
    return best or lanes


def _sublane_core(xr, xi, g1, g2, twr, twi, r1: int, r2: int,
                  precision: str = DEFAULT_PRECISION):
    """FFT over the first axis of (N, L) planar vectors; natural output
    order (flat index k2*r1 + k1 falls out of the reshape).

    Each complex radix stage is a *folded* real matmul (see _fold_complex).
    Two code paths:
    - loop core (small radices): one (2r, 2r) @ (2r, L) dot per digit slice.
      All data stays in its (sublane, lane) layout — no lane-crossing
      relayouts. Measured 0.65 ms/axis at 256^3 on v5e.
    - merge core (large radices): two big dots over lane-merged operands
      (0.90 ms/axis — the (r1, r2, L) -> (2r1, r2*L) reshape crosses lanes,
      but the dot count stays O(1)).
    """
    if max(r1, r2) <= _LOOP_MAX_RADIX and r2 > 1:
        return _sublane_core_loop(xr, xi, g1, g2, twr, twi, r1, r2, precision)
    return _sublane_core_merge(xr, xi, g1, g2, twr, twi, r1, r2,
                               _dot_precision(precision))


# --------------------------------------------------------------------------
# generalized N-stage core (1, 2, or 3 radix stages) over a flat consts
# list, so kernels can carry per-axis table lists of varying length.
# 3-stage = stage A (radix r1 dot per digit slice) + VPU twiddle + the
# folded 2-stage core per k1-group.
#
# Measured on v5e (A/B, chained): 3-stage LOSES to 2-stage everywhere the
# 2-stage loop core applies — 256^3 (4,8,8) 3.44 ms vs (8,32) 1.60;
# 512^3 (8,8,8) 25.8 ms vs (16,32) 13.4. The stack6 pass-count model
# (ceil(12r/128) per stage) predicted a win but ignores MXU output-row
# utilization: a radix-8 stacked dot is (16,96)@(96,L) — 16 of 128 output
# rows busy — while radix-32 fills 64 rows over 3 deep passes. 3-stage is
# therefore a CAPABILITY path (N whose 2-stage split exceeds the radix
# bounds, e.g. stack6 at N=2048=(8,16,16)), never the default pick:
# _pick_stages only returns 3 stages on explicit request.
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _core_tables(n: int, radices: tuple, inverse: bool, scale: float = 1.0,
                 stacked: bool = False) -> tuple:
    """Constant tables for _core_apply as a flat tuple of arrays.

    len(radices)==1: [G]                       (folded dense DFT)
    len(radices)==2: [g1, g2, twr, twi]        (= _tables layout)
    len(radices)==3: [gA, twAr, twAi, g1, g2, twr, twi]
                     (outer stage-A matrix + outer (r1, n/r1) twiddle +
                      inner 2-stage tables for m = r2*r3; ``scale`` rides
                      the INNER tables so it is applied exactly once)
    """
    if len(radices) == 1:
        g = _fold_complex(dft.dft_matrix(radices[0], np.complex128, inverse)
                          * scale)
        return (g.astype(np.float32),)
    if len(radices) == 2:
        if _is_vpu_split(radices):
            return (_vpu_tables(n, radices[0], radices[1], inverse, scale,
                                stacked),)
        t = _tables(n, radices[0], inverse, scale, stacked)
        return (t["g1"], t["g2"], t["twr"], t["twi"])
    r1, r2, r3 = radices
    m = r2 * r3
    ga = _fold_complex(dft.dft_matrix(r1, np.complex128, inverse))
    twa = dft.twiddles(r1, m, np.complex128, inverse)       # (r1, m)
    if stacked and r1 <= _LOOP_MAX_RADIX:
        ga = _stack_np(ga, _words_of(stacked))
    else:
        ga = ga.astype(np.float32)
    inner = _core_tables(m, (r2, r3), inverse, scale, stacked)
    return (ga, twa.real.astype(np.float32), twa.imag.astype(np.float32),
            *inner)


def _core_apply(xr, xi, consts: list, radices: tuple,
                precision: str = DEFAULT_PRECISION, inverse: bool = False):
    """FFT over the first axis of (N, L) planar vectors with 1-3 radix
    stages; natural output order (DIT: flat output index composes as
    k_last * (earlier radices product) + ... + k1).

    ``inverse`` only steers the MXU+VPU core's butterfly sign — the dot
    stages' direction is baked into the tables."""
    if len(radices) == 1:
        g = consts[0]
        xs = jnp.concatenate([xr, xi], axis=0)
        r = radices[0]
        y = jnp.dot(g, xs, preferred_element_type=jnp.float32,
                    precision=_dot_precision(precision))
        return y[:r], y[r:]
    if len(radices) == 2:
        if len(consts) == 1:   # MXU+VPU split (see _is_vpu_split)
            return _sublane_core_vpu(xr, xi, consts[0], radices[0],
                                     radices[1], inverse, precision)
        g1, g2, twr, twi = consts
        return _sublane_core(xr, xi, g1, g2, twr, twi,
                             radices[0], radices[1], precision)
    r1 = radices[0]
    m = radices[1] * radices[2]
    lanes = xr.shape[-1]
    ga, twar, twai = consts[0], consts[1], consts[2]
    inner = consts[3:]
    stacked = _stack_words(precision) > 0 and ga.dtype == jnp.bfloat16
    x3r = xr.reshape(r1, m, lanes)
    x3i = xi.reshape(r1, m, lanes)
    # stage A: per-digit-slice dot over the r1 axis, then the outer
    # twiddle W_n^{k1 j} on the VPU (folding it into matrices would need
    # per-(k1, j) copies — the VPU mul overlaps with the MXU anyway)
    outs_r, outs_i = [], []
    for j in range(m):
        xs = jnp.concatenate([x3r[:, j, :], x3i[:, j, :]], axis=0)
        if stacked:
            a = _stacked_dot(ga, xs)
        else:
            a = jnp.dot(ga, xs, preferred_element_type=jnp.float32,
                        precision=_dot_precision(precision))
        ar, ai = a[:r1], a[r1:]
        outs_r.append(ar * twar[:, j:j + 1] - ai * twai[:, j:j + 1])
        outs_i.append(ar * twai[:, j:j + 1] + ai * twar[:, j:j + 1])
    # per-k1 group: inner transform of length m over the j axis
    rows_r, rows_i = [], []
    for k1 in range(r1):
        br = jnp.stack([outs_r[j][k1] for j in range(m)], axis=0)
        bi = jnp.stack([outs_i[j][k1] for j in range(m)], axis=0)
        yr, yi = _core_apply(br, bi, inner, radices[1:], precision,
                             inverse=inverse)
        rows_r.append(yr)
        rows_i.append(yi)
    n = r1 * m
    yr = jnp.stack(rows_r, axis=1).reshape(n, lanes)  # flat k_inner*r1 + k1
    yi = jnp.stack(rows_i, axis=1).reshape(n, lanes)
    return yr, yi


def _pick_stages(n: int, radices=None, stacked: bool = False):
    """Radix stages for _core_apply: an explicit 1-3 stage tuple (3-stage
    requires every radix <= _LOOP_MAX_RADIX), else the 2-stage pick."""
    if radices is not None:
        rad = tuple(int(r) for r in radices)
        prod = 1
        for r in rad:
            prod *= r
        if prod != n or len(rad) > 3 or any(r > dft.MAX_RADIX for r in rad):
            return None
        if len(rad) == 3 and (max(rad) > _LOOP_MAX_RADIX or min(rad) < 2):
            return None
        return rad
    return _pick_2stage(n, None, stacked)


def _sublane_core_loop(xr, xi, g1, g2, twr, twi, r1, r2, precision):
    n = r1 * r2
    lanes = xr.shape[-1]
    x3r = xr.reshape(r1, r2, lanes)
    x3i = xi.reshape(r1, r2, lanes)
    folded_tw = g2.ndim == 3   # per-k1 stage-B matrices, twiddles inside
    # stack6: the tables arrived bf16 contraction-stacked (see _stack6_np);
    # each radix dot becomes one deep bf16 matmul instead of 6 shallow
    # highest-precision passes
    stacked = _stack_words(precision) > 0 and g1.dtype == jnp.bfloat16
    precision = _dot_precision(precision)
    # stage A: per-n2 digit slice, contraction depth 2*r1 on sublanes
    outs_r, outs_i = [], []
    for j in range(r2):
        xs = jnp.concatenate([x3r[:, j, :], x3i[:, j, :]], axis=0)
        if stacked:
            a = _stacked_dot(g1, xs)
        else:
            a = jnp.dot(g1, xs, preferred_element_type=jnp.float32,
                        precision=precision)
        ar, ai = a[:r1], a[r1:]
        if folded_tw:
            outs_r.append(ar)
            outs_i.append(ai)
        else:
            outs_r.append(ar * twr[:, j:j + 1] - ai * twi[:, j:j + 1])
            outs_i.append(ar * twi[:, j:j + 1] + ai * twr[:, j:j + 1])
    # stage B: per-k1 row group, contraction depth 2*r2 (twiddles folded
    # into the per-group matrix when folded_tw — zero VPU twiddle work)
    rows_r, rows_i = [], []
    for k1 in range(r1):
        bs = jnp.concatenate(
            [jnp.stack([outs_r[j][k1] for j in range(r2)], axis=0),
             jnp.stack([outs_i[j][k1] for j in range(r2)], axis=0)], axis=0)
        if stacked:
            c = _stacked_dot(g2[k1], bs)
        else:
            c = jnp.dot(g2[k1] if folded_tw else g2, bs,
                        preferred_element_type=jnp.float32,
                        precision=precision)
        rows_r.append(c[:r2])
        rows_i.append(c[r2:])
    yr = jnp.stack(rows_r, axis=1).reshape(n, lanes)  # (r2, r1, L) flat
    yi = jnp.stack(rows_i, axis=1).reshape(n, lanes)
    return yr, yi


# --------------------------------------------------------------------------
# MXU+VPU split core: N = rM * rV with the radix-rM stage as full-width
# stacked dots and the radix-rV (2/4/8) stage as PURE-VPU butterflies.
#
# Why: the stacked radix dot's weight is (2r, 12r) — at r <= 32 it fills
# at most 64 of the MXU's 128 output rows, so every pass wastes >= 50% of
# the array (the measured root cause of the 2.1x-off-HBM-floor ceiling,
# PARITY.md #5). Choosing rM with 2*rM a multiple of 128 (rM = 64, 128)
# makes every weight row-tile FULL; the leftover factor rV = N/rM runs as
# radix-2/4/8 butterflies on the VPU, whose twiddle factors are exactly
# {±1, ±i, (±1±i)/sqrt2} — adds plus a couple of constant scalings, no
# MXU time at all. The inter-stage twiddles W_N^{k1 j} are folded into
# rV per-j copies of the stage-A matrix (row-scaled before the bf16
# split, like the loop core's folded g2 — one less f32 rounding), which
# costs nothing: a 12*rM-deep dot reloads weight tiles every 128 lanes
# anyway. Per-element MXU cost drops from
#   ceil(12*r1/128)/r1 + ceil(12*r2/128)/r2      (two dot stages)
# to
#   ceil(2*rM/128)*ceil(12*rM/128)/rM            (one full-width stage)
# e.g. 256 = (8,32) 0.219 -> (64,4) 0.094 passes/element (2.3x), and
# 512 = (16,32) 0.250 -> (64,8) 0.094 (2.7x).
# Reference anchor: the phase kernels ARE the reference's perf core
# (offt-compute.c:905-1206); this is the TPU-native re-expression.
# --------------------------------------------------------------------------

_SQRT_HALF = 0.7071067811865476


def _is_vpu_split(radices) -> bool:
    """True when a 2-stage radix pair routes to the MXU+VPU core."""
    return (len(radices) == 2 and radices[1] in _VPU_RADICES
            and 16 <= radices[0] <= dft.MAX_RADIX)


@functools.lru_cache(maxsize=None)
def _vpu_tables(n: int, r1: int, r2: int, inverse: bool, scale: float = 1.0,
                stacked: bool = False) -> np.ndarray:
    """Per-j stage-A matrices for the MXU+VPU core: g_j = fold(diag(
    W_n^{k1 j} * scale) @ F_r1) stacked over j — the inter-stage twiddle
    (and any norm scale) rides the constant, so the kernel's VPU work is
    ONLY the radix-r2 butterfly adds."""
    f1 = dft.dft_matrix(r1, np.complex128, inverse)
    tw = dft.twiddles(r1, r2, np.complex128, inverse) * scale   # (r1, r2)
    mats = [_fold_complex(f1 * tw[:, j][:, None]) for j in range(r2)]
    stacked = _words_of(stacked)
    if stacked:
        # (r2, 2r1, 12r1) bf16 at stack6 / (r2, 2r1, 6r1) at stack3
        return np.stack([_stack_np(m, stacked) for m in mats])
    return np.stack(mats).astype(np.float32)            # (r2, 2r1, 2r1) f32


def _bfly2(ts, inverse):
    (ar, ai), (br, bi) = ts
    return [(ar + br, ai + bi), (ar - br, ai - bi)]


def _bfly4(ts, inverse):
    (r0, i0), (r1_, i1), (r2_, i2), (r3, i3) = ts
    u0r, u0i = r0 + r2_, i0 + i2
    u1r, u1i = r0 - r2_, i0 - i2
    u2r, u2i = r1_ + r3, i1 + i3
    u3r, u3i = r1_ - r3, i1 - i3
    y0 = (u0r + u2r, u0i + u2i)
    y2 = (u0r - u2r, u0i - u2i)
    if inverse:     # W4^-1 = +i
        y1 = (u1r - u3i, u1i + u3r)
        y3 = (u1r + u3i, u1i - u3r)
    else:           # W4 = -i
        y1 = (u1r + u3i, u1i - u3r)
        y3 = (u1r - u3i, u1i + u3r)
    return [y0, y1, y2, y3]


def _bfly3(ts, inverse):
    # X1/X2 = t0 - s/2 -+ i*(sqrt3/2)*d with s = t1+t2, d = t1-t2
    (r0, i0), (r1_, i1), (r2_, i2) = ts
    sr, si = r1_ + r2_, i1 + i2
    dr, di = r1_ - r2_, i1 - i2
    c = 0.8660254037844386  # sqrt(3)/2
    br, bi = r0 - 0.5 * sr, i0 - 0.5 * si
    if inverse:
        return [(r0 + sr, i0 + si),
                (br - c * di, bi + c * dr),
                (br + c * di, bi - c * dr)]
    return [(r0 + sr, i0 + si),
            (br + c * di, bi - c * dr),
            (br - c * di, bi + c * dr)]


def _cmul_const(tr, ti, c):
    """(tr + i ti) * c for a Python complex constant, folding the
    {1, -1, i, -i} special cases to pure adds/swaps."""
    cr, ci = c.real, c.imag
    if abs(ci) < 1e-15:
        if abs(cr - 1.0) < 1e-15:
            return tr, ti
        if abs(cr + 1.0) < 1e-15:
            return -tr, -ti
        return cr * tr, cr * ti
    if abs(cr) < 1e-15:
        if abs(ci - 1.0) < 1e-15:
            return -ti, tr
        if abs(ci + 1.0) < 1e-15:
            return ti, -tr
        return -ci * ti, ci * tr
    return cr * tr - ci * ti, cr * ti + ci * tr


def _bfly8(ts, inverse):
    e = _bfly4(ts[0::2], inverse)
    o = _bfly4(ts[1::2], inverse)
    c = _SQRT_HALF
    (o1r, o1i), (o2r, o2i), (o3r, o3i) = o[1], o[2], o[3]
    if inverse:     # W8^-k: (1+i)/sqrt2, +i, (-1+i)/sqrt2
        o1 = ((o1r - o1i) * c, (o1i + o1r) * c)
        o2 = (-o2i, o2r)
        o3 = ((-o3r - o3i) * c, (o3r - o3i) * c)
    else:           # W8^k: (1-i)/sqrt2, -i, (-1-i)/sqrt2
        o1 = ((o1r + o1i) * c, (o1i - o1r) * c)
        o2 = (o2i, -o2r)
        o3 = ((o3i - o3r) * c, (-o3i - o3r) * c)
    tws = [o[0], o1, o2, o3]
    return ([(e[k][0] + tws[k][0], e[k][1] + tws[k][1]) for k in range(4)]
            + [(e[k][0] - tws[k][0], e[k][1] - tws[k][1]) for k in range(4)])


_BFLY = {2: _bfly2, 3: _bfly3, 4: _bfly4, 8: _bfly8}

# composite VPU radices: {2,3}-smooth, bounded so the butterfly stays a
# small add/const-mul network (per-element VPU MACs grow ~log rV)
_VPU_RADICES = (2, 3, 4, 6, 8, 12, 16)


def _dft_vpu(ts, inverse):
    """DFT over a list of planar (re, im) array pairs — the VPU stage.

    Hand-coded bases 2/3/4/8; composite lengths recurse Cooley-Tukey
    (decimation in time over the smallest prime factor p):
        X_k = sum_b W_n^{bk} * B_b[k mod q],   B_b = DFT_q(ts[b::p])
    The W_n^{bk} are Python complex constants folded at trace time
    ({1, -1, +-i} become adds/swaps — _cmul_const)."""
    n = len(ts)
    if n in _BFLY:
        return _BFLY[n](ts, inverse)
    p = 2 if n % 2 == 0 else 3
    q = n // p
    subs = [_dft_vpu(ts[b::p], inverse) for b in range(p)]
    sign = 1.0 if inverse else -1.0
    out = []
    for k in range(n):
        accr, acci = subs[0][k % q]
        for b in range(1, p):
            w = complex(np.cos(2 * np.pi * b * k / n),
                        sign * np.sin(2 * np.pi * b * k / n))
            tr, ti = _cmul_const(*subs[b][k % q], w)
            accr = accr + tr
            acci = acci + ti
        out.append((accr, acci))
    return out


def _sublane_core_vpu(xr, xi, gs, r1, r2, inverse, precision):
    """FFT over the first axis of (N, L) planar vectors, N = r1 * r2:
    r2 full-width stage-A dots (twiddles pre-folded into gs[j]) followed
    by a radix-r2 butterfly across the j accumulators — natural output
    order (row index k2 * r1 + k1, same as the loop core)."""
    n = r1 * r2
    lanes = xr.shape[-1]
    x3r = xr.reshape(r1, r2, lanes)
    x3i = xi.reshape(r1, r2, lanes)
    stacked = gs.dtype == jnp.bfloat16
    prec = _dot_precision(precision)
    # the stage-wide presplit A/B assembles the 12-slice stack6 operand
    # explicitly; stack3 tables (6r1-deep) take the per-dot path
    presplit = (stacked and _stack6_presplit()
                and gs.shape[-1] == 12 * r1)
    if presplit:
        # A/B variant (OFFT_STACK6_PRESPLIT=1): 3-word-split the WHOLE
        # stage input once (two big VPU passes Mosaic can pipeline
        # against the block DMA) instead of per-dot; per-j operands
        # assemble from slices. Same arithmetic, different op
        # granularity — candidate fix for the stack6 operand-build
        # residual (~1.4x-of-floor on the 768-class pass, VERDICT r3 #4).
        sr = _split3(x3r)
        si = _split3(x3i)
    ts = []
    for j in range(r2):
        if presplit:
            xs = jnp.concatenate(
                [w[:, j, :] for w in (sr[0], si[0], sr[1], si[1],
                                      sr[2], si[2], sr[0], si[0],
                                      sr[1], si[1], sr[0], si[0])], axis=0)
            a = jnp.dot(gs[j], xs, preferred_element_type=jnp.float32)
        else:
            xs = jnp.concatenate([x3r[:, j, :], x3i[:, j, :]], axis=0)
            if stacked:
                a = _stacked_dot(gs[j], xs)
            else:
                a = jnp.dot(gs[j], xs, preferred_element_type=jnp.float32,
                            precision=prec)
        ts.append((a[:r1], a[r1:]))
    ys = _dft_vpu(ts, inverse)
    yr = jnp.stack([y[0] for y in ys], axis=0).reshape(n, lanes)
    yi = jnp.stack([y[1] for y in ys], axis=0).reshape(n, lanes)
    return yr, yi


def _sublane_core_merge(xr, xi, g1, g2, twr, twi, r1, r2, precision):
    n = r1 * r2
    lanes = xr.shape[-1]
    xs = jnp.concatenate(
        [xr.reshape(r1, r2, lanes), xi.reshape(r1, r2, lanes)], axis=0)

    # stage A: (2r1, 2r1) @ (2r1, r2*L) -> [Yr(k1); Yi(k1)]
    a = jax.lax.dot_general(
        g1, xs.reshape(2 * r1, r2 * lanes), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ).reshape(2 * r1, r2, lanes)
    ar, ai = a[:r1], a[r1:]

    # twiddle (VPU)
    twr = twr[:, :, None]
    twi = twi[:, :, None]
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr

    if r2 == 1:
        return br.reshape(n, lanes), bi.reshape(n, lanes)

    # stage B: stack re/im along n2, contract depth 2*r2
    bs = jnp.concatenate([br, bi], axis=1)          # (r1, 2r2, L)
    c = jax.lax.dot_general(
        g2, bs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )                                                # (2r2, r1, L)
    return c[:r2].reshape(n, lanes), c[r2:].reshape(n, lanes)


# --------------------------------------------------------------------------
# last-axis kernel: VMEM-transpose sandwich around the sublane core
# --------------------------------------------------------------------------

def _last_kernel(*refs, radices: tuple, precision: str = DEFAULT_PRECISION,
                 inverse: bool = False):
    xr_ref, xi_ref = refs[0], refs[1]
    consts = [r[:] for r in refs[2:-2]]
    or_ref, oi_ref = refs[-2], refs[-1]
    yr, yi = _core_apply(xr_ref[:].T, xi_ref[:].T, consts, radices, precision,
                         inverse=inverse)
    or_ref[:] = yr.T
    oi_ref[:] = yi.T


def _f32_trace(fn):
    """Public-entry decorator: trace with x64 promotion OFF. Every kernel
    in this module is f32/bf16 planar by design, and a gridded
    pallas_call does not legalize under ``jax_enable_x64`` (probed:
    Mosaic 'func.return' error on ANY gridded kernel — a JAX limitation,
    not shape-specific). The traced program is identical to an x64-off
    session's; without this an x64-enabled user session crashes with an
    opaque internal error on every Pallas-path plan."""
    @functools.wraps(fn)
    def wrapped(*a, **kw):
        with jax.enable_x64(False):
            return fn(*a, **kw)
    return wrapped


@_f32_trace
def fft_last(xr: jax.Array, xi: jax.Array, inverse: bool = False,
             radices=None, block_rows: int = 0,
             precision: str = DEFAULT_PRECISION, scale: float = 1.0,
             alias: bool = False):
    """Batched FFT along the last axis of planar (..., N) float32 arrays.

    Returns (yr, yi). No 1/N scaling on inverse (caller handles, matching
    stockham internals). Requires N expressible in 1-3 radix stages.
    ``alias=True`` writes over the input buffers (see fft_sublane); it
    requires a batch that is already a block multiple (no pad copy).
    """
    n = xr.shape[-1]
    rad = _pick_stages(n, radices, stacked=_stack_words(precision))
    if rad is None:
        raise ValueError(f"N={n} not expressible as a Pallas kernel")
    lead = xr.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    xr2 = xr.reshape(b, n)
    xi2 = xi.reshape(b, n)
    # rows become lanes inside the kernel (transpose sandwich): use a
    # 128-multiple block; pad the batch if needed
    tb = block_rows or max(128, min(512, (1 << 21) // max(n, 1) & ~127))
    tb = min(tb, -(-b // 128) * 128)
    bp = -(-b // tb) * tb
    if bp != b:
        if alias:
            # the pad COPY would silently void the aliased-footprint
            # guarantee the caller asked for — refuse loudly
            raise ValueError(f"alias requires the batch ({b}) to be a "
                             f"block multiple ({tb})")
        xr2 = jnp.pad(xr2, ((0, bp - b), (0, 0)))
        xi2 = jnp.pad(xi2, ((0, bp - b), (0, 0)))
    consts = [jnp.asarray(c) for c in
              _core_tables(n, rad, inverse, scale,
                           stacked=_stack_words(precision))]
    kernel = functools.partial(_last_kernel, radices=rad, precision=precision,
                               inverse=inverse)
    grid = (bp // tb,)
    row_spec = pl.BlockSpec((tb, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_spec = [pl.BlockSpec(c.shape, lambda i, c=c: (0,) * c.ndim,
                               memory_space=pltpu.VMEM) for c in consts]
    yr, yi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, row_spec] + const_spec,
        out_specs=(row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct((bp, n), jnp.float32),
                   jax.ShapeDtypeStruct((bp, n), jnp.float32)),
        interpret=_interpret(),
        **({"input_output_aliases": {0: 0, 1: 1}} if alias else {}),
        # in/out planar pairs double-buffered + transpose/core temps;
        # without this the default 16M scoped limit rejects n >= 2048
        # at the default 512-row block (hit at 8x2048^2 2-D, r2)
        **_vmem_params(16 * tb * n * 4
                       + sum(c.nbytes for c in consts) + (1 << 20), grid_dims=1),
    )(xr2, xi2, *consts)
    if bp != b:
        yr = yr[:b]
        yi = yi[:b]
    return yr.reshape(*lead, n), yi.reshape(*lead, n)


# --------------------------------------------------------------------------
# sublane-axis kernel (y / x axes of a 3-D array: zero transposes)
# --------------------------------------------------------------------------

def _sublane_kernel(*refs, radices: tuple,
                    precision: str = DEFAULT_PRECISION,
                    inverse: bool = False):
    # data refs are (1, N, lanes) blocks
    xr_ref, xi_ref = refs[0], refs[1]
    consts = [r[:] for r in refs[2:-2]]
    or_ref, oi_ref = refs[-2], refs[-1]
    yr, yi = _core_apply(xr_ref[0], xi_ref[0], consts, radices, precision,
                         inverse=inverse)
    or_ref[0] = yr
    oi_ref[0] = yi


@_f32_trace
def fft_sublane(xr: jax.Array, xi: jax.Array, axis: int,
                inverse: bool = False, radices=None, block_lanes: int = 0,
                precision: str = DEFAULT_PRECISION, scale: float = 1.0,
                alias: bool = False):
    """Batched FFT along any non-last axis of planar float32 arrays.

    The array is viewed as (prefix, N, lanes) with lanes = product of the
    trailing dims; each grid cell transforms one (N, lane-tile) block with
    sublane-axis MXU contractions — no data transposition anywhere.

    ``alias=True`` writes the output over the input buffers
    (input_output_aliases): in/out block maps are 1:1, so each grid
    step only overwrites the block it already holds in VMEM. This is
    what lets HBM-scale transforms run in ONE array's footprint (the
    in-place 1024^3 c2c path).
    """
    axis = axis % xr.ndim
    if axis == xr.ndim - 1:
        raise ValueError("use fft_last for the last axis")
    n = xr.shape[axis]
    rad = _pick_stages(n, radices, stacked=_stack_words(precision))
    if rad is None:
        raise ValueError(f"N={n} not expressible as a Pallas kernel")
    # VMEM budget: 4 planar arrays (in+out) are double-buffered across grid
    # steps plus ~2 block-sized intermediates -> keep n*tl*4B around 1 MiB
    # (n=512, tl=1024 measured 21.4M scoped vmem > the 16M limit)
    tl_target = block_lanes or max(128, min(1024,
                                            ((1 << 18) // max(n, 1)) & ~127))
    if axis < xr.ndim - 2:
        # Direct n-D route. Flattening the trailing dims into one lane
        # axis at the HOST is NOT a layout bitcast under TPU tiling (the
        # lane dim changes), so XLA materializes a full copy of each
        # plane: measured a 64 MB temp (= one plane) on a (512,256,128)
        # x pass and an 8 GiB temp that OOM'd the in-place 1024^3 chain.
        # Reshapes that KEEP the last dim are free — view as
        # (B, n, MID, last) and block it like the pitched x kernel.
        mid = int(np.prod(xr.shape[axis + 1:-1]))
        tiles = _sublane_nd_tiles(n, mid, xr.shape[-1], tl_target)
        if tiles is not None:
            return _sublane_nd(xr, xi, axis, n, rad, inverse, precision,
                               scale, alias, tiles)
    pre = int(np.prod(xr.shape[:axis])) if axis else 1
    lanes = int(np.prod(xr.shape[axis + 1:]))
    shape3 = (pre, n, lanes)
    xr3 = xr.reshape(shape3)
    xi3 = xi.reshape(shape3)
    tl = _pick_lane_tile(lanes, tl_target)
    consts = [jnp.asarray(c) for c in
              _core_tables(n, rad, inverse, scale,
                           stacked=_stack_words(precision))]
    kernel = functools.partial(_sublane_kernel, radices=rad,
                               precision=precision, inverse=inverse)
    grid = (pre, lanes // tl)
    blk = pl.BlockSpec((1, n, tl), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    const_spec = [pl.BlockSpec(c.shape, lambda i, j, c=c: (0,) * c.ndim,
                               memory_space=pltpu.VMEM) for c in consts]

    yr, yi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk, blk] + const_spec,
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct(shape3, jnp.float32),
                   jax.ShapeDtypeStruct(shape3, jnp.float32)),
        interpret=_interpret(),
        **({"input_output_aliases": {0: 0, 1: 1}} if alias else {}),
        **_vmem_params(12 * n * tl * 4, grid_dims=2),
    )(xr3, xi3, *consts)
    return yr.reshape(xr.shape), yi.reshape(xr.shape)


def _sublane_nd_tiles(n, mid, last, tl_target):
    """Legal (ty, tz) block tile for the direct n-D sublane route, or
    None to fall back to the flattened-lanes path. Mosaic block rules:
    tz must be a multiple of 128 or the full last extent; ty a multiple
    of 8 or the full mid extent — and the in-kernel (ty, tz) -> lanes
    merge additionally needs an aligned tz whenever ty > 1."""
    tz = _pick_lane_tile(last, min(tl_target, last))
    if tz % 128:
        return (1, tz) if mid == 1 else None
    want = max(8, (tl_target // tz) & ~7)
    ty = max((c for c in range(8, min(mid, want) + 1, 8) if mid % c == 0),
             default=0)
    if not ty:
        # full-extent mid (legal at any size) if the block still fits vmem
        if 12 * n * mid * tz * 4 <= _VMEM_CAP:
            ty = mid
        else:
            return None
    return (ty, tz)


def _sublane_nd(xr, xi, axis, n, rad, inverse, precision, scale, alias,
                tiles):
    """fft_sublane's 3rd-from-last-and-deeper route: (1, n, ty, tz)
    blocks over a (B, n, MID, last) view — every host reshape keeps the
    last dim, so none materializes. The kernel merges (ty, tz) into
    lanes in VMEM (the proven _x_strided_kernel pattern)."""
    b = int(np.prod(xr.shape[:axis])) if axis else 1
    mid = int(np.prod(xr.shape[axis + 1:-1]))
    last = xr.shape[-1]
    ty, tz = tiles
    consts = [jnp.asarray(c) for c in
              _core_tables(n, rad, inverse, scale,
                           stacked=_stack_words(precision))]
    kernel = functools.partial(_x_strided_kernel, radices=rad,
                               precision=precision, inverse=inverse)
    shape4 = (b, n, mid, last)
    xr4 = xr.reshape(shape4)
    xi4 = xi.reshape(shape4)
    blk = pl.BlockSpec((1, n, ty, tz), lambda i, j, k: (i, 0, j, k),
                       memory_space=pltpu.VMEM)
    const_spec = [pl.BlockSpec(c.shape, lambda i, j, k, c=c: (0,) * c.ndim,
                               memory_space=pltpu.VMEM) for c in consts]
    yr, yi = pl.pallas_call(
        kernel,
        grid=(b, mid // ty, last // tz),
        in_specs=[blk, blk] + const_spec,
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct(shape4, jnp.float32),
                   jax.ShapeDtypeStruct(shape4, jnp.float32)),
        interpret=_interpret(),
        **({"input_output_aliases": {0: 0, 1: 1}} if alias else {}),
        **_vmem_params(12 * n * ty * tz * 4
                       + sum(c.nbytes for c in consts), grid_dims=3),
    )(xr4, xi4, *consts)
    return yr.reshape(xr.shape), yi.reshape(xr.shape)


# --------------------------------------------------------------------------
# planar 1-D dispatch + full 3-D transform
# --------------------------------------------------------------------------

def can_use_pallas(n: int, radices=None) -> bool:
    return _pick_stages(n, radices) is not None


def bank_conflict_stride(ny: int, nz: int) -> bool:
    """True when the f32 x-axis row stride (ny*nz*4 bytes) serializes HBM
    channels: any stride DIVISIBLE by 2^16 bytes, not just exact powers
    of two (768^2*4 = 2^18*9 measured the same ~2x wall as pow2 until
    rerouted). The single gate shared by fft3d_planar's fused path and
    fft_1d_planar's standalone x dispatch."""
    return (ny * nz * 4) % (1 << 16) == 0


@_f32_trace
def fft_1d_planar(xr, xi, axis: int = -1, inverse: bool = False,
                  radices=None, scale: bool = True,
                  precision: str = DEFAULT_PRECISION, block: int = 0,
                  out_scale: float = 1.0, alias: bool = False,
                  x_tile=None):
    """Planar 1-D FFT along ``axis`` (numpy fft/ifft semantics).

    The inverse 1/N normalization — and any extra ``out_scale`` (norm
    conventions, see fft3d_planar) — is folded into the kernel's twiddle
    tables: zero extra HBM passes.

    ``x_tile`` sets the pitched-read kernel's (ty, tz) block when the
    padded-x route fires (a 3rd-from-last axis with a bank-conflicting
    row stride); ``block`` tiles the last/sublane kernels — the two knobs
    tune whichever kernel the axis dispatches to."""
    axis = axis % xr.ndim
    n = xr.shape[axis]
    knob = out_scale * ((1.0 / n) if (inverse and scale) else 1.0)
    if n == 1:
        # degenerate axis (2-D transforms ride the 3-D pipeline with
        # nx = 1): identity times the folded scale, zero kernel passes
        return (xr if knob == 1.0 else xr * jnp.float32(knob),
                xi if knob == 1.0 else xi * jnp.float32(knob))
    if axis == xr.ndim - 1:
        yr, yi = fft_last(xr, xi, inverse=inverse, radices=radices,
                          precision=precision, block_rows=block, scale=knob,
                          alias=alias)
    elif (axis == xr.ndim - 3 and not alias
          and bank_conflict_stride(xr.shape[-2], xr.shape[-1])
          and can_use_padded_x(n, xr.shape[-2], xr.shape[-1], radices)):
        # bank-conflicting x row stride (divisible by 2^16 bytes — HBM
        # channel serialization, see the fft3d_planar gate): pay one
        # contiguous pad pass to break the stride, then the pitched-read
        # x kernel. This is the DISTRIBUTED pipeline's local x stage fix
        # (per-shard pow2 strides hit the same wall the fused single-chip
        # path already routes around; offt-compute.c:2347-2993 is the
        # reference's phase-2 FFTx hot kernel) and the unfused path's.
        padw = [(0, 0)] * xr.ndim
        padw[-1] = (0, _STRIDE_PAD)
        ty, tz = x_tile or (8, 128)
        yr, yi = fft_x_from_padded(jnp.pad(xr, padw), jnp.pad(xi, padw),
                                   xr.shape[-1], inverse=inverse,
                                   radices=radices, precision=precision,
                                   scale=knob, ty=ty, tz=tz)
    else:
        yr, yi = fft_sublane(xr, xi, axis, inverse=inverse, radices=radices,
                             precision=precision, block_lanes=block,
                             scale=knob, alias=alias)
    return yr, yi


# --------------------------------------------------------------------------
# single-pass fused 3-D kernel for VMEM-resident cubes (<= ~128^3).
# One HBM read + one write for ALL THREE axes (the slab + x path pays
# two round trips). Per cube: x runs directly on sublanes; y and z each
# pay one in-register transpose sandwich with full-width (n, n^2) cores.
# The reference has no analogue (FFTW is strictly per-axis) — this is
# the "re-designed tpu-first" headroom of the build brief, and the
# natural per-chunk local transform for distributed plans.
# --------------------------------------------------------------------------

# VMEM budget: in+out planar pairs (double-buffered across the batch
# grid) + ~4 full-cube temps + tables. Mosaic reported 100.06M actual at
# 8x128^3 (a 12-plane estimate fell 960K short); 13 planes ~ 109 MiB
# stays under the 120 MiB probed cap.
_CUBE_VMEM_PLANES = 13
_CUBE_MAX_ELEMS = 1 << 21      # 128^3


def _cube_kernel(*refs, rx: tuple, ry: tuple, rz: tuple, ncx: int,
                 ncy: int, precision: str, inverse: bool):
    xr_ref, xi_ref = refs[0], refs[1]
    cx = [r[:] for r in refs[2:2 + ncx]]
    cy = [r[:] for r in refs[2 + ncx:2 + ncx + ncy]]
    cz = [r[:] for r in refs[2 + ncx + ncy:-2]]
    or_ref, oi_ref = refs[-2], refs[-1]
    _, nx, ny, nz = xr_ref.shape
    ar = xr_ref[0].reshape(nx, ny * nz)
    ai = xi_ref[0].reshape(nx, ny * nz)
    ar, ai = _core_apply(ar, ai, cx, rx, precision, inverse=inverse)
    # y: minor-2D swap puts y last, then the transpose sandwich
    a3r = jnp.swapaxes(ar.reshape(nx, ny, nz), 1, 2)    # (x, z, y)
    a3i = jnp.swapaxes(ai.reshape(nx, ny, nz), 1, 2)
    br = a3r.reshape(nx * nz, ny).T                     # (y, x*z)
    bi = a3i.reshape(nx * nz, ny).T
    br, bi = _core_apply(br, bi, cy, ry, precision, inverse=inverse)
    b3r = jnp.swapaxes(br.T.reshape(nx, nz, ny), 1, 2)  # (x, y, z)
    b3i = jnp.swapaxes(bi.T.reshape(nx, nz, ny), 1, 2)
    # z: same sandwich as the slab kernel's z stage
    cr = b3r.reshape(nx * ny, nz).T                     # (z, x*y)
    ci = b3i.reshape(nx * ny, nz).T
    cr, ci = _core_apply(cr, ci, cz, rz, precision, inverse=inverse)
    or_ref[0] = cr.T.reshape(nx, ny, nz)
    oi_ref[0] = ci.T.reshape(nx, ny, nz)


def can_fuse_cube(nx: int, ny: int, nz: int,
                  rad_x=None, rad_y=None, rad_z=None,
                  precision: str = DEFAULT_PRECISION) -> bool:
    stk = _stack_words(precision)
    return (nx * ny * nz <= _CUBE_MAX_ELEMS
            and nz % 128 == 0 and ny % 8 == 0
            and _pick_stages(nx, rad_x, stacked=stk) is not None
            and _pick_stages(ny, rad_y, stacked=stk) is not None
            and _pick_stages(nz, rad_z, stacked=stk) is not None)


@_f32_trace
def fft3d_cube(xr: jax.Array, xi: jax.Array, inverse: bool = False,
               rad_z=None, rad_y=None, rad_x=None,
               precision: str = DEFAULT_PRECISION, out_scale: float = 1.0):
    """Fused 3-D c2c over planar (..., X, Y, Z) in ONE HBM round trip.

    Inverse folds 1/N (and ``out_scale``) into the z-stage tables."""
    nx, ny, nz = xr.shape[-3:]
    stk = _stack_words(precision)
    rx = _pick_stages(nx, rad_x, stacked=stk)
    ry = _pick_stages(ny, rad_y, stacked=stk)
    rz = _pick_stages(nz, rad_z, stacked=stk)
    if not can_fuse_cube(nx, ny, nz, rad_x, rad_y, rad_z, precision):
        raise ValueError(f"cube ({nx},{ny},{nz}) not fusable")
    lead = xr.shape[:-3]
    b = int(np.prod(lead)) if lead else 1
    xr4 = xr.reshape(b, nx, ny, nz)
    xi4 = xi.reshape(b, nx, ny, nz)
    scale = out_scale * ((1.0 / (nx * ny * nz)) if inverse else 1.0)
    cx = _core_tables(nx, rx, inverse, stacked=stk)
    cy = _core_tables(ny, ry, inverse, stacked=stk)
    cz = _core_tables(nz, rz, inverse, scale, stacked=stk)
    consts = [jnp.asarray(v) for v in (*cx, *cy, *cz)]
    kernel = functools.partial(_cube_kernel, rx=rx, ry=ry, rz=rz,
                               ncx=len(cx), ncy=len(cy),
                               precision=precision, inverse=inverse)
    blk = pl.BlockSpec((1, nx, ny, nz), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    const_spec = [pl.BlockSpec(c.shape, lambda i, c=c: (0,) * c.ndim,
                               memory_space=pltpu.VMEM) for c in consts]
    yr, yi = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[blk, blk] + const_spec,
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct((b, nx, ny, nz), jnp.float32),
                   jax.ShapeDtypeStruct((b, nx, ny, nz), jnp.float32)),
        interpret=_interpret(),
        **_vmem_params(_CUBE_VMEM_PLANES * nx * ny * nz * 4
                       + sum(c.nbytes for c in consts), grid_dims=1),
    )(xr4, xi4, *consts)
    shp = lead + (nx, ny, nz)
    return yr.reshape(shp), yi.reshape(shp)


@_f32_trace
def fft3d_planar(xr, xi, inverse: bool = False,
                 rad_z=None, rad_y=None, rad_x=None,
                 precision: str = DEFAULT_PRECISION, block: int = 0,
                 slab_rows: int = 0, out_scale: float = 1.0,
                 x_tile=None, in_place: bool = False):
    """Full 3-D c2c transform on planar arrays: 2-3 HBM round trips
    (fused (y,z) slab when it fits VMEM + one kernel per remaining axis).

    ``out_scale`` multiplies the result at ZERO runtime cost — it rides
    the final stage's constant tables (norm='ortho'/'forward' conventions
    come free here, unlike an elementwise post-multiply which costs a
    full HBM read+write pass).

    ``in_place=True`` aliases every kernel's output onto its input, so
    the whole transform runs in ONE planar pair's HBM footprint (pair
    the calling jit with donated inputs). This forgoes the stride-padded
    x layout (pad changes the shape), trading x-pass bank conflicts for
    the halved footprint — the only way 1024^3 c2c fits a 16 GB chip."""
    ax, ay, az = xr.ndim - 3, xr.ndim - 2, xr.ndim - 1
    kw = {"precision": precision, "block": block}
    ny, nz = xr.shape[ay], xr.shape[az]
    fuse = can_fuse_slab(ny, nz, rad_y, rad_z)
    if in_place:
        nx_ = xr.shape[ax]
        if nx_ == 1:
            # 2-D: last + sublane kernel pair, both aliased
            xr, xi = fft_1d_planar(xr, xi, az, inverse=inverse,
                                   radices=rad_z, alias=True, **kw)
            return fft_1d_planar(xr, xi, ay, inverse=inverse,
                                 radices=rad_y, out_scale=out_scale,
                                 alias=True, **kw)
        if not fuse:
            raise ValueError("in_place needs a fusable (y,z) slab")
        if not inverse:
            xr, xi = fft_slab_yz(xr, xi, rad_y=rad_y, rad_z=rad_z,
                                 precision=precision, block_rows=slab_rows,
                                 alias=True)
            return fft_sublane(xr, xi, ax, radices=rad_x,
                               precision=precision, block_lanes=block,
                               scale=out_scale, alias=True)
        xr, xi = fft_sublane(xr, xi, ax, inverse=True, radices=rad_x,
                             precision=precision, block_lanes=block,
                             scale=1.0 / nx_, alias=True)
        return fft_slab_yz(xr, xi, inverse=True, rad_y=rad_y, rad_z=rad_z,
                           precision=precision,
                           scale=out_scale / (ny * nz),
                           block_rows=slab_rows, alias=True)
    if not inverse:
        # stride-padded x path: only when the slab fuses, x is 2-stage
        # expressible and the x row stride is bank-conflicting — any
        # stride DIVISIBLE by a large power of two serializes HBM
        # channels, not just exact powers (768^2*4 = 2^18 * 9 measured
        # 2x: 61.1 -> 31.5 ms full 768^3 once routed here). Leading
        # batch dims ride along — both kernels take 4-D.
        nx_ = xr.shape[ax]
        if nx_ == 1:
            # 2-D case: z + y axis kernels, no x pass (the old routing
            # pushed the length-1 axis through the padded-x kernel as
            # 65k tiny blocks - 21.3 ms at 64x1024^2). The last+sublane
            # pair beats the fused slab at every 2-D size measured
            # (1024x256^2 3.70 vs 4.09, 256x512^2 3.40 vs 3.73,
            # 64x1024^2 3.32 vs 4.52 ms) - the slab's per-row y loop
            # only pays off fused against a real x stage.
            xr, xi = fft_1d_planar(xr, xi, az, radices=rad_z, **kw)
            return fft_1d_planar(xr, xi, ay, radices=rad_y,
                                 out_scale=out_scale, **kw)
        use_padded_x = (nx_ > 1 and fuse
                        and can_use_padded_x(nx_, ny, nz, rad_x)
                        and bank_conflict_stride(ny, nz))
        if use_padded_x:
            xr, xi = fft_slab_yz(xr, xi, rad_y=rad_y, rad_z=rad_z,
                                 precision=precision, zpad=_STRIDE_PAD,
                                 block_rows=slab_rows)
            ty, tz = x_tile or (8, 128)
            return fft_x_from_padded(xr, xi, nz, radices=rad_x,
                                     precision=precision, scale=out_scale,
                                     ty=ty, tz=tz)
        if fuse:
            xr, xi = fft_slab_yz(xr, xi, rad_y=rad_y, rad_z=rad_z,
                                 precision=precision, block_rows=slab_rows)
        else:
            xr, xi = fft_1d_planar(xr, xi, az, radices=rad_z, **kw)
            xr, xi = fft_1d_planar(xr, xi, ay, radices=rad_y, **kw)
        xr, xi = fft_1d_planar(xr, xi, ax, radices=rad_x,
                               out_scale=out_scale, x_tile=x_tile, **kw)
        return xr, xi
    nx_ = xr.shape[ax]
    if nx_ == 1:
        xr, xi = fft_1d_planar(xr, xi, ay, inverse=True, radices=rad_y, **kw)
        return fft_1d_planar(xr, xi, az, inverse=True, radices=rad_z,
                             out_scale=out_scale, **kw)
    use_padded_x = (nx_ > 1 and fuse
                    and can_use_padded_x(nx_, ny, nz, rad_x)
                    and bank_conflict_stride(ny, nz))
    if use_padded_x:
        # the three axis transforms commute, so the inverse reuses the
        # FORWARD order (slab -> padded intermediate -> pitched x) with
        # inverse tables: both stride-sensitive x accesses (the loads)
        # stay conflict-free. The old mirror order (x first, reading the
        # unpadded pow2-strided input) measured 1.58 ms vs 1.37 forward
        # at 256^3 — the x stage paid the bank conflicts the forward
        # path was built to break. 1/N rides the x stage's tables.
        ty, tz = x_tile or (8, 128)
        xr, xi = fft_slab_yz(xr, xi, inverse=True, rad_y=rad_y,
                             rad_z=rad_z, precision=precision,
                             zpad=_STRIDE_PAD, block_rows=slab_rows)
        return fft_x_from_padded(xr, xi, nz, inverse=True, radices=rad_x,
                                 precision=precision,
                                 scale=out_scale / (nx_ * ny * nz),
                                 ty=ty, tz=tz)
    xr, xi = fft_1d_planar(xr, xi, ax, inverse=True, radices=rad_x,
                           x_tile=x_tile, **kw)
    if fuse:
        return fft_slab_yz(xr, xi, inverse=True, rad_y=rad_y,
                           rad_z=rad_z, precision=precision,
                           scale=out_scale / (ny * nz), block_rows=slab_rows)
    xr, xi = fft_1d_planar(xr, xi, ay, inverse=True, radices=rad_y, **kw)
    xr, xi = fft_1d_planar(xr, xi, az, inverse=True, radices=rad_z,
                           out_scale=out_scale, **kw)
    return xr, xi


@_f32_trace
def fft_1d_complex(x, axis: int = -1, inverse: bool = False, radices=None,
                   scale: bool = True, precision: str = DEFAULT_PRECISION,
                   block: int = 0, x_tile=None):
    """Complex-array wrapper over the planar kernels (for call sites that
    carry complex64 values inside jit, e.g. the distributed pipeline)."""
    yr, yi = fft_1d_planar(jnp.real(x), jnp.imag(x), axis=axis,
                           inverse=inverse, radices=radices, scale=scale,
                           precision=precision, block=block, x_tile=x_tile)
    return jax.lax.complex(yr, yi)


# --------------------------------------------------------------------------
# fused (y, z) slab kernel: two axes in ONE HBM round trip.
# Per x-row, the whole (Y, Z) slab lives in VMEM: transform z via the
# transpose sandwich, then y directly on sublanes. A 3-D FFT becomes
# 2 HBM round trips total (slab + x-axis) instead of 3.
# --------------------------------------------------------------------------

# slab ceiling in ELEMENTS of (Y, Z): the working set is ~24 slab-planes
# (in/out double-buffered planar pairs + stage intermediates; 512x512
# measured 16.34 MiB = ~16 planes) and the raised vmem limit caps at
# _VMEM_CAP, so 1M elems (1024^2) is the largest fusable slab
_SLAB_VMEM_LIMIT = 1 << 20
# empirical planes-of-slab working-set multiplier for the vmem estimate
_SLAB_VMEM_PLANES = 24


def _pick_slab_rows(block_rows: int, slab_elems: int, p: int) -> int:
    """Shared x-rows-per-block heuristic for every (y,z)-slab kernel.

    ``slab_elems`` is the per-row working-set element count (use the
    SAME measure on mirrored fwd/inv kernels — an n-vs-m asymmetry here
    cost a measured 6% on the irfft slab, r3). Bigger blocks mean bigger
    DMAs (tb=4 at 256^2: 2.25 -> 2.07 ms full 256^3), but blocks that
    barely fit the scoped-vmem cap starve Mosaic's pipelining — the
    auto heuristic halves tb until HALF the cap is free (768^2 tb=2 fit
    at 113 MiB but measured 33.8 ms vs 30.8 at tb=1; 1024^3 r2c tb=2 at
    100 MiB measured 54.3 vs 47.2 at tb=1)."""
    tb = block_rows or max(2, min(8, (1 << 18) // max(slab_elems, 1)))
    if not block_rows:
        while tb > 1 and _SLAB_VMEM_PLANES * tb * slab_elems * 4 > _VMEM_CAP // 2:
            tb //= 2
    while tb > 1 and _SLAB_VMEM_PLANES * tb * slab_elems * 4 > _VMEM_CAP:
        tb //= 2
    tb = min(tb, p)
    while p % tb != 0:
        tb -= 1
    return tb


def _slab_kernel(*refs, rz: tuple, ry: tuple, ncz: int,
                 precision: str = DEFAULT_PRECISION, inverse: bool = False):
    # blocks are (TB, Y, Z): TB x-rows per block (bigger DMAs for small
    # slabs); the z stage batches all TB*Y pencils in one transposed core
    # call, the y stage runs per-row (y must be on sublanes per slab)
    xr_ref, xi_ref = refs[0], refs[1]
    cz = [r[:] for r in refs[2:2 + ncz]]
    cy = [r[:] for r in refs[2 + ncz:-2]]
    or_ref, oi_ref = refs[-2], refs[-1]
    tb, ny, nz = xr_ref.shape
    xr = xr_ref[:].reshape(tb * ny, nz)
    xi = xi_ref[:].reshape(tb * ny, nz)
    zr, zi = _core_apply(xr.T, xi.T, cz, rz, precision,
                         inverse=inverse)                    # (Z, TB*Y)
    zr = zr.T.reshape(tb, ny, nz)
    zi = zi.T.reshape(tb, ny, nz)
    for t in range(tb):
        yr, yi = _core_apply(zr[t], zi[t], cy, ry, precision,
                             inverse=inverse)                  # (Y, Z)
        or_ref[t] = yr
        oi_ref[t] = yi


def can_fuse_slab(ny: int, nz: int, rad_y=None, rad_z=None) -> bool:
    return (ny * nz <= _SLAB_VMEM_LIMIT
            and _pick_stages(ny, rad_y) is not None
            and _pick_stages(nz, rad_z) is not None)


@_f32_trace
def fft_slab_yz(xr: jax.Array, xi: jax.Array, inverse: bool = False,
                rad_y=None, rad_z=None,
                precision: str = DEFAULT_PRECISION, zpad: int = 0,
                z_true: int = 0, scale: float = 1.0, block_rows: int = 0,
                alias: bool = False):
    """FFT along the last TWO axes of planar (..., Y, Z) float32 arrays in a
    single fused kernel (one HBM read + one write for both axes).

    ``zpad`` appends unwritten pad lanes per (x, y) row of the OUTPUT
    (stride-breaking layout for the downstream x-axis kernel); the result
    then has trailing shape (Y, Z + zpad). ``z_true`` declares that the
    INPUT's z axis carries trailing pad lanes to skip (pitched reads).
    ``alias=True`` (requires zpad == 0 and no input pad) writes over the
    input buffers — the in-place HBM-scale path (see fft_sublane)."""
    if alias and (zpad or z_true):
        raise ValueError("alias requires identical in/out layouts")
    ny, nz = xr.shape[-2], xr.shape[-1]
    if z_true:
        nz = z_true
    ry = _pick_stages(ny, rad_y, stacked=_stack_words(precision))
    rz = _pick_stages(nz, rad_z, stacked=_stack_words(precision))
    if ry is None or rz is None or ny * nz > _SLAB_VMEM_LIMIT:
        raise ValueError(f"slab ({ny},{nz}) not fusable")
    lead = xr.shape[:-2]
    p = int(np.prod(lead)) if lead else 1
    in_shape3 = (p, ny, xr.shape[-1])
    xr3 = xr.reshape(in_shape3)
    xi3 = xi.reshape(in_shape3)
    stk = _stack_words(precision)
    cz = _core_tables(nz, rz, inverse, stacked=stk)
    cy = _core_tables(ny, ry, inverse, scale, stacked=stk)  # scale rides y
    consts = [jnp.asarray(v) for v in (*cz, *cy)]
    kernel = functools.partial(_slab_kernel, rz=rz, ry=ry, ncz=len(cz),
                               precision=precision, inverse=inverse)
    tb = _pick_slab_rows(block_rows, ny * nz, p)
    # in/out blocks carry only the true z lanes; any trailing pad lanes in
    # the in/out ARRAYS are skipped by partial coverage (pitched DMA)
    in_blk = pl.BlockSpec((tb, ny, nz), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((tb, ny, nz), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    const_spec = [pl.BlockSpec(c.shape, lambda i, c=c: (0,) * c.ndim,
                               memory_space=pltpu.VMEM) for c in consts]
    out_shape3 = (p, ny, nz + zpad)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(p // tb,),
        in_specs=[in_blk, in_blk] + const_spec,
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct(out_shape3, jnp.float32),
                   jax.ShapeDtypeStruct(out_shape3, jnp.float32)),
        interpret=_interpret(),
        **({"input_output_aliases": {0: 0, 1: 1}} if alias else {}),
        **_vmem_params(_SLAB_VMEM_PLANES * tb * ny * nz * 4
                       + sum(c.nbytes for c in consts), grid_dims=1),
    )(xr3, xi3, *consts)
    out_trail = lead + (ny, nz + zpad)
    return yr.reshape(out_trail), yi.reshape(out_trail)


# --------------------------------------------------------------------------
# stride-padded x-axis path.
# The x-axis of a pow2 cube has a row stride of Y*Z*4 bytes — a large power
# of two, which serializes HBM banks (measured on v5e: a strided identity
# pass costs 3.2x the contiguous one; padding the stride recovers 2x).
# The (y,z) slab kernel can write into a Z-padded intermediate for free
# (partial output blocks), and the x kernel reads pitched (X, TY, Z) blocks
# that skip the pad — no extra traffic anywhere.
# --------------------------------------------------------------------------

# pad lanes appended per (x, y) row of the intermediate; 8 lanes push the
# x-row stride from 2^18 to 2^13 * odd at 256^3
_STRIDE_PAD = 8


def _x_strided_kernel(*refs, radices: tuple, precision: str,
                      inverse: bool = False):
    # data blocks are (1, X, TY, TZ)
    xr_ref, xi_ref = refs[0], refs[1]
    consts = [r[:] for r in refs[2:-2]]
    or_ref, oi_ref = refs[-2], refs[-1]
    n, ty, z = xr_ref.shape[1], xr_ref.shape[2], xr_ref.shape[3]
    xr = xr_ref[0].reshape(n, ty * z)
    xi = xi_ref[0].reshape(n, ty * z)
    yr, yi = _core_apply(xr, xi, consts, radices, precision, inverse=inverse)
    or_ref[0] = yr.reshape(n, ty, z)
    oi_ref[0] = yi.reshape(n, ty, z)


# working-set multiplier for the (X, 8, 128) x-kernel blocks: in/out planar
# pairs double-buffered (8 blocks) + core temps (512^3 measured 24.01 MiB
# = 12 blocks + 12 KiB of tables; 16 leaves headroom)
_X_VMEM_BLOCKS = 16


def can_use_padded_x(n: int, ny: int, nz: int, radices=None) -> bool:
    """Blocks are (X, 8, 128): sublane dim must divide 8, minor 128
    (Mosaic block rules); the working set must fit the RAISED vmem limit
    (v5e accepts up to ~100 MiB scoped vmem — n=2048 still qualifies)."""
    return (_pick_stages(n, radices) is not None
            and ny % 8 == 0 and nz % 128 == 0
            and _X_VMEM_BLOCKS * n * 8 * 128 * 4 <= _VMEM_CAP)


@_f32_trace
def fft_x_from_padded(xr3, xi3, z_true: int, inverse: bool = False,
                      radices=None, precision: str = DEFAULT_PRECISION,
                      scale: float = 1.0, out_lanes: int = 0,
                      ty: int = 8, tz: int = 128, y_true: int = 0):
    # tile A/B on v5e at 256^3 (loop-timed, stack6): (8,128) 0.620 ms,
    # (16,128) 0.850, (8,256) 0.870 — bigger blocks LOSE (shallower
    # double-buffering under the vmem limit outweighs larger DMA rows);
    # the defaults stay (8,128), the knobs remain for other parts/shapes.
    """x-axis FFT over a (..., X, Y, Z+pad) padded intermediate; writes the
    unpadded (..., X, Y, Z) result. Input blocks are pitched (X, 8, 128)
    reads that skip the pad lanes entirely; leading dims become grid dims.

    ``out_lanes`` (>= z_true) allocates extra unwritten output lanes —
    consumers that append a plane (the r2c Nyquist fixup) can then update
    in place instead of paying a full-array concatenate pass.

    ``y_true`` (< Y) declares trailing pad ROWS on the input's y axis to
    skip (the grid covers only the true rows; the output has y_true
    rows). A one-sublane-tile y pad makes the PLANE stride an odd
    multiple of 2^12 under the (8,128) physical tiling, so the n
    x-chunks a block gathers stop landing on one HBM bank column."""
    lead = xr3.shape[:-3]
    b = int(np.prod(lead)) if lead else 1
    n, ny, zp = xr3.shape[-3:]
    if y_true:
        ny = y_true
    xr4 = xr3.reshape(b, n, xr3.shape[-2], zp)
    xi4 = xi3.reshape(b, n, xr3.shape[-2], zp)
    rad = _pick_stages(n, radices, stacked=_stack_words(precision))
    if rad is None:
        raise ValueError(f"N={n} not expressible")
    # output lane extent is zo = max(out_lanes, z_true): a non-128-mult
    # tz is only legal when it equals BOTH the input pad width and the
    # output extent (Mosaic: block lane dim = 128-mult or full extent)
    zo_chk = max(out_lanes, z_true)
    if (ny % ty or z_true % tz or zo_chk % tz
            or (tz % 128 and not (tz == zp == zo_chk))):
        raise ValueError(f"tile ({ty},{tz}) illegal for ({ny},{z_true})")
    consts = [jnp.asarray(c) for c in
              _core_tables(n, rad, inverse, scale,
                           stacked=_stack_words(precision))]
    kernel = functools.partial(_x_strided_kernel, radices=rad,
                               precision=precision, inverse=inverse)
    blk = pl.BlockSpec((1, n, ty, tz), lambda i, j, k: (i, 0, j, k),
                       memory_space=pltpu.VMEM)
    const_spec = [pl.BlockSpec(c.shape, lambda i, j, k, c=c: (0,) * c.ndim,
                               memory_space=pltpu.VMEM) for c in consts]
    zo = max(out_lanes, z_true)
    out_shape4 = (b, n, ny, zo)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(b, ny // ty, z_true // tz),
        in_specs=[blk, blk] + const_spec,
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct(out_shape4, jnp.float32),
                   jax.ShapeDtypeStruct(out_shape4, jnp.float32)),
        interpret=_interpret(),
        **_vmem_params(_X_VMEM_BLOCKS * n * ty * tz * 4
                       + sum(c.nbytes for c in consts) + (1 << 20), grid_dims=3),
    )(xr4, xi4, *consts)
    out_shape = lead + (n, ny, zo)
    return yr.reshape(out_shape), yi.reshape(out_shape)


@_f32_trace
def fft_x_to_padded(xr3, xi3, zpad: int = _STRIDE_PAD, inverse: bool = False,
                    radices=None, precision: str = DEFAULT_PRECISION,
                    scale: float = 1.0, z_true: int = 0,
                    ty: int = 8, tz: int = 128):
    """x-axis FFT reading an unpadded (..., X, Y, Z) array and writing a
    Z-padded (..., X, Y, Z+zpad) intermediate (stride-breaking layout for a
    downstream pitched-read consumer, e.g. the inverse slab). Unscaled.

    ``z_true`` (< Z) restricts the transform to the first z_true input
    lanes (pitched reads skip the rest — the c2r path drops its Nyquist
    lane this way without a slice pass)."""
    lead = xr3.shape[:-3]
    b = int(np.prod(lead)) if lead else 1
    n, ny, nz = xr3.shape[-3:]
    if z_true:
        nz = z_true
    xr4 = xr3.reshape(b, n, ny, xr3.shape[-1])
    xi4 = xi3.reshape(b, n, ny, xr3.shape[-1])
    rad = _pick_stages(n, radices, stacked=_stack_words(precision))
    if rad is None:
        raise ValueError(f"N={n} not expressible")
    if ny % ty or nz % tz or tz % 128:
        raise ValueError(f"tile ({ty},{tz}) illegal for ({ny},{nz})")
    consts = [jnp.asarray(c) for c in
              _core_tables(n, rad, inverse, scale,
                           stacked=_stack_words(precision))]
    kernel = functools.partial(_x_strided_kernel, radices=rad,
                               precision=precision, inverse=inverse)
    blk = pl.BlockSpec((1, n, ty, tz), lambda i, j, k: (i, 0, j, k),
                       memory_space=pltpu.VMEM)
    const_spec = [pl.BlockSpec(c.shape, lambda i, j, k, c=c: (0,) * c.ndim,
                               memory_space=pltpu.VMEM) for c in consts]
    out_shape4 = (b, n, ny, nz + zpad)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(b, ny // ty, nz // tz),
        in_specs=[blk, blk] + const_spec,
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct(out_shape4, jnp.float32),
                   jax.ShapeDtypeStruct(out_shape4, jnp.float32)),
        interpret=_interpret(),
        **_vmem_params(_X_VMEM_BLOCKS * n * ty * tz * 4
                       + sum(c.nbytes for c in consts) + (1 << 20), grid_dims=3),
    )(xr4, xi4, *consts)
    out_shape = lead + (n, ny, nz + zpad)
    return yr.reshape(out_shape), yi.reshape(out_shape)


# --------------------------------------------------------------------------
# fused r2c last-axis kernel: packed half-length transform + untangle in
# one pass. The reference reaches r2c through FFTW's r2c plans
# (offt-compute.c setup_p1d is_r2c); our unfused path (kernels/rfft.py)
# costs several XLA passes for the pack/untangle — here the untangle runs
# on the sublane form inside the kernel (reversal = sublane flip+roll).
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _rfft_tables(n: int, dtype_name: str = "float32"):
    """Planar W^k = exp(-2i pi k / N) columns for k = 0..M-1 (M = N/2)."""
    m = n // 2
    k = np.arange(m, dtype=np.float64)
    ang = 2.0 * np.pi * k / n
    wr = np.cos(ang).reshape(m, 1)
    wi = (-np.sin(ang)).reshape(m, 1)
    dt = np.dtype(dtype_name)
    return wr.astype(dt), wi.astype(dt)


def _rfft_last_kernel(*refs, rm: tuple, ncm: int, precision: str,
                      packed: bool = False):
    vr_ref, vi_ref = refs[0], refs[1]
    cm = [r[:] for r in refs[2:2 + ncm]]
    wr, wi = refs[2 + ncm], refs[3 + ncm]
    or_ref, oi_ref = refs[-2], refs[-1]
    m = vr_ref.shape[1]
    vrt = vr_ref[:].T
    vit = vi_ref[:].T
    # half-length c2c with the packed rows on sublanes
    vfr, vfi = _core_apply(vrt, vit, cm, rm, precision)    # (M, TB)
    # Mosaic has no reversal primitive; use conj(V[(M-k) mod M]) =
    # DFT(conj(v))[k] — a second half-length transform (compute-light at
    # these radices, and it shares the loaded inputs)
    urr, uri = _core_apply(vrt, -vit, cm, rm, precision)   # = conj(V[M-k])
    xer = 0.5 * (vfr + urr)
    xei = 0.5 * (vfi + uri)
    xor_ = 0.5 * (vfi - uri)
    xoi = -0.5 * (vfr - urr)
    # X[k] = Xe[k] + W^k * Xo[k], k = 0..M-1
    xr = xer + wr[:] * xor_ - wi[:] * xoi
    xi = xei + wr[:] * xoi + wi[:] * xor_
    if packed:
        # Nyquist packing: row 0 := X[0].re + i * X[M].re (both real)
        row0_re = xer[:1] + xor_[:1]
        row0_im = xer[:1] - xor_[:1]
        or_ref[:] = jnp.concatenate([row0_re, xr[1:]], axis=0).T
        oi_ref[:] = jnp.concatenate([row0_im, xi[1:]], axis=0).T
        return
    # X[M] = Xe[0] - Xo[0] (purely real)
    last_r = (xer[:1] - xor_[:1])
    last_i = jnp.zeros_like(last_r)
    out_r = jnp.concatenate([xr, last_r], axis=0)          # (M+1, TB)
    out_i = jnp.concatenate([xi, last_i], axis=0)
    or_ref[:] = out_r.T
    oi_ref[:] = out_i.T


def can_use_rfft_last(n: int, radices=None) -> bool:
    return n % 2 == 0 and n >= 4 and _pick_2stage(n // 2, radices) is not None


@_f32_trace
def rfft_last_planar(x: jax.Array, radices=None,
                     precision: str = DEFAULT_PRECISION, block_rows: int = 0,
                     packed: bool = False):
    """Fused r2c along the last axis: real (..., N) -> planar (..., N//2+1)
    (or the packed (..., N//2) layout with ``packed=True`` — plane 0
    carries X_0 + i*X_M; the distributed pipeline's aligned format).

    The even/odd packing happens outside (one strided-slice pass); the
    half-length transform and the untangle are one kernel pass.
    """
    n = x.shape[-1]
    m = n // 2
    pick = _pick_2stage(m, radices, stacked=_stack_words(precision))
    if pick is None or n % 2 != 0:
        raise ValueError(f"N={n} not expressible for the fused r2c kernel")
    r1, r2 = pick
    mo = m if packed else m + 1
    lead = x.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(b, n).astype(jnp.float32)
    vr = x2[:, 0::2]
    vi = x2[:, 1::2]
    tb = block_rows or max(128, min(512, (1 << 21) // max(m, 1) & ~127))
    tb = min(tb, -(-b // 128) * 128)
    bp = -(-b // tb) * tb
    if bp != b:
        vr = jnp.pad(vr, ((0, bp - b), (0, 0)))
        vi = jnp.pad(vi, ((0, bp - b), (0, 0)))
    cm = _core_tables(m, pick, False, stacked=_stack_words(precision))
    wr, wi = _rfft_tables(n)
    consts = [jnp.asarray(v) for v in (*cm, wr, wi)]
    kernel = functools.partial(_rfft_last_kernel, rm=pick, ncm=len(cm),
                               precision=precision, packed=packed)
    in_spec = pl.BlockSpec((tb, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tb, mo), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_spec = [pl.BlockSpec(c.shape, lambda i, c=c: (0,) * c.ndim,
                               memory_space=pltpu.VMEM) for c in consts]
    yr, yi = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=[in_spec, in_spec] + const_spec,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((bp, mo), jnp.float32),
                   jax.ShapeDtypeStruct((bp, mo), jnp.float32)),
        interpret=_interpret(),
        # large-M guard (same bug class as fft_last at n>=2048, r2);
        # 24 blocks: the dual-transform untangle doubles the core temps
        # (measured 20.6M actual vs a 16-block 19.1M estimate at m=2048)
        **_vmem_params(24 * tb * max(m, mo) * 4
                       + sum(c.nbytes for c in consts) + (1 << 20), grid_dims=1),
    )(vr, vi, *consts)
    if bp != b:
        yr = yr[:b]
        yi = yi[:b]
    return yr.reshape(*lead, mo), yi.reshape(*lead, mo)


# --------------------------------------------------------------------------
# packed-Nyquist 3-D r2c/c2r fast path.
#
# A (..., Nz/2+1) frequency axis is the r2c killer on TPU: 129 lanes
# physically occupy TWO 128-lane tiles, so every downstream pass moves ~2x
# the bytes and every kernel block misaligns. Instead we keep the internal
# frequency axis at exactly M = Nz/2 lanes by PACKING the (purely real,
# for real input) k=0 and k=M planes into one complex plane
# P = X_0 + i*X_M — the classic two-real-FFTs-in-one-complex trick, applied
# across the z-frequency axis. The y/x transforms are complex-linear and
# act per-frequency-plane, so the packing survives them; a cheap 2-D
# conjugate-symmetry untangle of plane 0 at the very end recovers the
# numpy rfftn layout. (Reference: r2c is first-class throughout
# offt-compute.c, setup_p1d is_r2c paths; the packing itself is the
# TPU-native replacement for FFTW's r2c storage.)
#
# Forward pipeline (2 HBM passes + one small plane fixup):
#   rfft_slab_yz:  real (P, Y, N) -> planar (P, Y, M+pad)
#                  [in-kernel: even/odd sublane split -> half-length z core
#                   x2 (reversal-free untangle) -> pack row 0 -> y core]
#   fft_x_from_padded: pitched x pass at M aligned lanes
#   host-side fixup: 2-D untangle of plane 0 -> (..., M+1)
# Inverse mirrors it (pack planes 0/M -> inverse x -> c2r slab with fused
# untangle + even/odd interleave -> real output).
# --------------------------------------------------------------------------


# Largest M for which the r2c/c2r untangle runs as a dense folded
# (2M, 2M) dot. The dot has perfect MXU lane utilization but O(M^2)
# FLOPs; past M=128 (one 256-deep pass) it dominates the whole slab
# (measured at M=512 on v5e: the r2c slab cost 2x the c2c slab at the
# same dims). Larger M uses the dual-transform untangle instead.
_H_DOT_MAX = 128


@functools.lru_cache(maxsize=None)
def _crfft_dual_tables(n: int) -> tuple:
    """(alpha', gamma) diagonal constants for the dual-transform c2r
    re-tangle: v = idft(alpha' . X') + conj(idft(gamma . X')) + V0,
    gamma[k] = conj(beta'[(M-k) % M]) — the reversal rides the CONSTANT
    (free, host-side), never the data (Mosaic has no reversal op).
    Row 0 is ZEROED: the packed plane 0 (A = X0.re, B = XM.re) feeds only
    the kernels' broadcast V0 term, so the diagonals must not see it —
    folding the mask here deletes two (M, L) concats per kernel.
    Returns (ar, ai, gr, gi) as (M, 1) float32 columns, unscaled."""
    m = n // 2
    k = np.arange(m)
    th = 2.0 * np.pi * k / n
    alpha = 0.5 * (1.0 - np.sin(th)) + 0.5j * np.cos(th)
    beta = 0.5 * (1.0 + np.sin(th)) - 0.5j * np.cos(th)
    gamma = np.conj(beta[(m - k) % m])
    alpha[0] = 0.0
    gamma[0] = 0.0
    return (alpha.real.reshape(m, 1).astype(np.float32),
            alpha.imag.reshape(m, 1).astype(np.float32),
            gamma.real.reshape(m, 1).astype(np.float32),
            gamma.imag.reshape(m, 1).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _rfft_h_matrix(n: int) -> np.ndarray:
    """The r2c untangle as ONE folded real matrix H (2M x 2M):
    [Xr; Xi] = H @ [Vr; Vi], where V = fft_M(even + i*odd) and
    X[k] = alpha[k] V[k] + beta[k] conj(V[M-k]) (alpha = (1-iW^k)/2,
    beta = (1+iW^k)/2, W = exp(-2i pi/N)); row M+0 is replaced by the
    Nyquist packing X[M].re = Re(V0) - Im(V0). One depth-2M MXU dot
    (perfect 128-lane utilization) replaces the reversal trick's second
    2-stage core + the twiddled VPU untangle chain."""
    m = n // 2
    k = np.arange(m)
    th = 2.0 * np.pi * k / n
    ar = (1.0 - np.sin(th)) * 0.5      # Re alpha
    ai = -np.cos(th) * 0.5             # Im alpha
    br = (1.0 + np.sin(th)) * 0.5      # Re beta
    bi = np.cos(th) * 0.5              # Im beta
    rho = (-k) % m                      # reversal permutation M-k mod M
    h = np.zeros((2 * m, 2 * m))
    idx = np.arange(m)
    # Xr[k] = ar*Vr[k] - ai*Vi[k] + br*Vr[rho] + bi*Vi[rho]
    h[idx, idx] += ar
    h[idx, m + idx] += -ai
    h[idx, rho] += br
    h[idx, m + rho] += bi
    # Xi[k] = ai*Vr[k] + ar*Vi[k] + bi*Vr[rho] - br*Vi[rho]
    h[m + idx, idx] += ai
    h[m + idx, m + idx] += ar
    h[m + idx, rho] += bi
    h[m + idx, m + rho] += -br
    # packed Nyquist: row (imag, k=0) := X[M].re = Vr[0] - Vi[0]
    h[m, :] = 0.0
    h[m, 0] = 1.0
    h[m, m] = -1.0
    return h.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _crfft_g_matrix(n: int, scale: float = 1.0) -> np.ndarray:
    """The c2r re-tangle as ONE folded real matrix G (2M x 2M):
    [Vr; Vi] = G @ [Xr; Xi] for the PACKED half-spectrum (plane 0 carries
    A = X[0] in re, B = X[M] in im). V[k] = alpha'[k] X[k] +
    beta'[k] conj(X[M-k]) (alpha' = (1+iW^-k)/2, beta' = (1-iW^-k)/2)
    for k >= 1; V[0] = (A+B)/2 + i(A-B)/2. ``scale`` (1/(Nx*Ny*M) for an
    exact inverse after unscaled x/y passes) is folded in."""
    m = n // 2
    g = np.zeros((2 * m, 2 * m))
    k = np.arange(1, m)
    th = 2.0 * np.pi * k / n
    ar = (1.0 - np.sin(th)) * 0.5      # Re alpha'
    ai = np.cos(th) * 0.5              # Im alpha'
    br = (1.0 + np.sin(th)) * 0.5      # Re beta'
    bi = -np.cos(th) * 0.5             # Im beta'
    rho = m - k                         # in 1..M-1 (never the packed row)
    # Vr[k] = ar*Xr[k] - ai*Xi[k] + br*Xr[rho] + bi*Xi[rho]
    g[k, k] += ar
    g[k, m + k] += -ai
    g[k, rho] += br
    g[k, m + rho] += bi
    # Vi[k] = ai*Xr[k] + ar*Xi[k] + bi*Xr[rho] - br*Xi[rho]
    g[m + k, k] += ai
    g[m + k, m + k] += ar
    g[m + k, rho] += bi
    g[m + k, m + rho] += -br
    # packed row 0: A = Xr[0], B = Xi[0]; V[0] = (A+B)/2 + i(A-B)/2
    g[0, 0] = 0.5
    g[0, m] = 0.5
    g[m, 0] = 0.5
    g[m, m] = -0.5
    return (g * scale).astype(np.float32)


def can_use_rfft3d(nx: int, ny: int, nz: int,
                   rad_x=None, rad_y=None, rad_z=None) -> bool:
    """Gate for the packed 3-D fast path: M = Nz/2 must be a lane-tile
    multiple (x-kernel blocks are (X, 8, 128)) and every axis 2-stage."""
    m = nz // 2
    return (nz % 2 == 0 and m % 128 == 0 and ny % 8 == 0
            and _pick_2stage(m, rad_z) is not None
            and _pick_2stage(ny, rad_y) is not None
            and _pick_2stage(nx, rad_x) is not None
            and ny * m <= _SLAB_VMEM_LIMIT
            and can_use_padded_x(nx, ny, m, rad_x))


def _rfft_slab_kernel(*refs, rm: tuple, ry: tuple, ncm: int,
                      precision: str, dual: bool):
    """Fused r2c(z)+fft(y) slab. Two untangle strategies (see
    _rfft_h_matrix / the module-level _H_DOT_MAX note):

    - dual=False (M <= _H_DOT_MAX): untangle+packing as ONE dense folded
      dot — a (2M, 2M) matrix at full MXU lane utilization.
    - dual=True (large M): the dense dot's O(M^2) FLOPs dominate (at
      M=512 it is ~20x the z-stage itself; measured 2x the whole c2c
      slab at the same dims on v5e). Instead compute conj(V[M-k]) =
      fft_M(conj(v))[k] as a SECOND half-length transform (Mosaic has no
      lane/sublane reversal primitive) and untangle on the VPU —
      2 z-stages + O(M) work instead of O(M^2)."""
    x_ref = refs[0]
    cm = [r[:] for r in refs[1:1 + ncm]]
    nunt = 2 if dual else 1
    unt = refs[1 + ncm:1 + ncm + nunt]
    cy = [r[:] for r in refs[1 + ncm + nunt:-2]]
    or_ref, oi_ref = refs[-2], refs[-1]
    if dual:
        wr, wi = unt
    else:
        h_mat, = unt
    tb, ny, n = x_ref.shape
    m = n // 2
    flat = x_ref[:].reshape(tb * ny, n)
    xt = flat.T                                   # (N, TB*Y)
    v3 = xt.reshape(m, 2, tb * ny)                # sublane split: even/odd
    vrt = v3[:, 0, :]
    vit = v3[:, 1, :]
    vfr, vfi = _core_apply(vrt, vit, cm, rm, precision)    # V = fft_M(v)
    if dual:
        urr, uri = _core_apply(vrt, -vit, cm, rm, precision)
        xer = 0.5 * (vfr + urr)                   # = conj(V[M-k]) parts
        xei = 0.5 * (vfi + uri)
        xor_ = 0.5 * (vfi - uri)
        xoi = -0.5 * (vfr - urr)
        xr = xer + wr[:] * xor_ - wi[:] * xoi     # X = Xe + W^k Xo
        xi = xei + wr[:] * xoi + wi[:] * xor_
        row0_re = xer[:1] + xor_[:1]              # X[0].re
        row0_im = xer[:1] - xor_[:1]              # packed: X[M].re
        xs_r = jnp.concatenate([row0_re, xr[1:]], axis=0)
        xs_i = jnp.concatenate([row0_im, xi[1:]], axis=0)
    else:
        # untangle + Nyquist packing = one folded dot (_rfft_h_matrix)
        xs = jnp.dot(h_mat[:], jnp.concatenate([vfr, vfi], axis=0),
                     preferred_element_type=jnp.float32,
                     precision=_dot_precision(precision))
        xs_r, xs_i = xs[:m], xs[m:]
    zr = xs_r.T.reshape(tb, ny, m)
    zi = xs_i.T.reshape(tb, ny, m)
    for t in range(tb):
        yr, yi = _core_apply(zr[t], zi[t], cy, ry, precision)
        or_ref[t] = yr
        oi_ref[t] = yi


@_f32_trace
def rfft_slab_yz(x: jax.Array, rad_y=None, rad_z=None,
                 precision: str = DEFAULT_PRECISION, zpad: int = 0,
                 block_rows: int = 0):
    """Fused r2c(z) + fft(y) over real (..., Y, N) in ONE HBM pass: reads
    real data (half the bytes of a planar pair), writes the packed
    (..., Y, M(+zpad)) planar half-spectrum."""
    ny, n = x.shape[-2], x.shape[-1]
    m = n // 2
    ry = _pick_2stage(ny, rad_y, stacked=_stack_words(precision))
    rm = _pick_2stage(m, rad_z, stacked=_stack_words(precision))
    if ry is None or rm is None or n % 2 != 0:
        raise ValueError(f"rfft slab ({ny},{n}) not fusable")
    lead = x.shape[:-2]
    p = int(np.prod(lead)) if lead else 1
    x3 = x.reshape(p, ny, n).astype(jnp.float32)
    stk = _stack_words(precision)
    cm = _core_tables(m, rm, False, stacked=stk)
    cy = _core_tables(ny, ry, False, stacked=stk)
    dual = m > _H_DOT_MAX
    untangle = _rfft_tables(n) if dual else (_rfft_h_matrix(n),)
    consts = [jnp.asarray(v) for v in (*cm, *untangle, *cy)]
    kernel = functools.partial(_rfft_slab_kernel, rm=rm, ry=ry, ncm=len(cm),
                               precision=precision, dual=dual)
    tb = _pick_slab_rows(block_rows, ny * m, p)
    in_blk = pl.BlockSpec((tb, ny, n), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((tb, ny, m), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    const_spec = [pl.BlockSpec(c.shape, lambda i, c=c: (0,) * c.ndim,
                               memory_space=pltpu.VMEM) for c in consts]
    out3 = (p, ny, m + zpad)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(p // tb,),
        in_specs=[in_blk] + const_spec,
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct(out3, jnp.float32),
                   jax.ShapeDtypeStruct(out3, jnp.float32)),
        interpret=_interpret(),
        **_vmem_params(_SLAB_VMEM_PLANES * tb * ny * m * 4, grid_dims=1),
    )(x3, *consts)
    out_trail = lead + (ny, m + zpad)
    return yr.reshape(out_trail), yi.reshape(out_trail)


def _plane0_split(yr, yi):
    """Split the packed plane 0 (= fft_xy(X_0) + i*fft_xy(X_M)) into the
    true k=0 and k=M planes via 2-D conjugate symmetry. Returns complex
    (a, b) planes of shape (..., X, Y)."""
    p = jax.lax.complex(yr[..., 0], yi[..., 0])     # (..., X, Y)
    rev = jnp.conj(jnp.roll(jnp.flip(p, axis=(-2, -1)), shift=(1, 1),
                            axis=(-2, -1)))          # conj(P[-kx, -ky])
    a = 0.5 * (p + rev)                              # fft_xy(X_0)
    b = -0.5j * (p - rev)                            # fft_xy(X_M)
    return a, b


def _asm_mp1_kernel(yr_ref, yi_ref, ar_ref, ai_ref, br_ref, bi_ref,
                    or_ref, oi_ref):
    m = yr_ref.shape[-1]
    or_ref[:, :, :m] = yr_ref[:]
    oi_ref[:, :, :m] = yi_ref[:]
    or_ref[:, :, 0] = ar_ref[:]
    oi_ref[:, :, 0] = ai_ref[:]
    or_ref[:, :, m] = br_ref[:]
    oi_ref[:, :, m] = bi_ref[:]


def _assemble_mp1(yr, yi, a, b):
    """(..., M) packed planar + the split 0/M planes -> numpy-layout
    (..., M+1). A dedicated one-pass kernel: XLA's own concatenate /
    dynamic-update-slice into a 129-lane (two-lane-tile) layout costs
    ~0.85-1.4 ms at 256^3 on v5e; this kernel does it in ~0.35 ms."""
    m = yr.shape[-1]
    lead = yr.shape[:-2]
    ny = yr.shape[-2]
    rows = int(np.prod(lead)) if lead else 1
    yr2 = yr.reshape(rows, ny, m)
    yi2 = yi.reshape(rows, ny, m)
    a2r = jnp.real(a).reshape(rows, ny)
    a2i = jnp.imag(a).reshape(rows, ny)
    b2r = jnp.real(b).reshape(rows, ny)
    b2i = jnp.imag(b).reshape(rows, ny)
    tx = max(1, min(16, (1 << 20) // max(ny * m, 1)))
    while rows % tx != 0:
        tx -= 1
    blk_in = pl.BlockSpec((tx, ny, m), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_pl = pl.BlockSpec((tx, ny), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    blk_out = pl.BlockSpec((tx, ny, m + 1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_r, out_i = pl.pallas_call(
        _asm_mp1_kernel,
        grid=(rows // tx,),
        in_specs=[blk_in, blk_in, blk_pl, blk_pl, blk_pl, blk_pl],
        out_specs=(blk_out, blk_out),
        out_shape=(jax.ShapeDtypeStruct((rows, ny, m + 1), jnp.float32),
                   jax.ShapeDtypeStruct((rows, ny, m + 1), jnp.float32)),
        interpret=_interpret(),
        **_vmem_params(11 * tx * ny * m * 4, grid_dims=1),
    )(yr2, yi2, a2r, a2i, b2r, b2i)
    return (out_r.reshape(lead + (ny, m + 1)),
            out_i.reshape(lead + (ny, m + 1)))


def unpack_rfft3d(yr, yi):
    """Convert the packed half-spectrum (..., M) to numpy rfftn layout
    (..., M+1) — the plane-0/Nyquist untangle + one assembly pass."""
    a, b = _plane0_split(yr, yi)
    return _assemble_mp1(yr, yi, a, b)


def pack_rfft3d(yr, yi):
    """Convert a numpy-layout half-spectrum (..., M+1) to the packed
    (..., M) form (plane 0 := plane0 + i*planeM)."""
    m = yr.shape[-1] - 1
    pr = yr[..., :1] - yi[..., m:m + 1]
    pi = yi[..., :1] + yr[..., m:m + 1]
    return (jnp.concatenate([pr, yr[..., 1:m]], axis=-1),
            jnp.concatenate([pi, yi[..., 1:m]], axis=-1))


@_f32_trace
def rfft3d_planar(x: jax.Array, rad_z=None, rad_y=None, rad_x=None,
                  precision: str = DEFAULT_PRECISION, slab_rows: int = 0,
                  packed: bool = False, x_tile=None):
    """Full 3-D r2c on a real (..., X, Y, N) array.

    Two HBM passes (fused r2c+y slab, pitched x kernel at M aligned
    lanes). With ``packed=True`` returns the packed (..., M) half-spectrum
    (plane 0 = plane0 + i*planeM) — the TPU-native format, loop-timed
    1.00 ms at 256^3 on v5e with stack6 (2.2x XLA rfftn); spectral
    pipelines that multiply in frequency space and invert never need to
    unpack. Default returns the numpy rfftn layout (..., M+1) via one
    extra assembly pass (1.31 ms, 1.7x XLA). ``rad_z`` factors M = N//2."""
    n = x.shape[-1]
    m = n // 2
    yr, yi = rfft_slab_yz(x, rad_y=rad_y, rad_z=rad_z, precision=precision,
                          zpad=_STRIDE_PAD, block_rows=slab_rows)
    ty, tz = x_tile or (8, 128)
    yr, yi = fft_x_from_padded(yr, yi, m, radices=rad_x, precision=precision,
                               ty=ty, tz=tz)
    if packed:
        return yr, yi
    return unpack_rfft3d(yr, yi)


def _crfft_slab_kernel(*refs, rm: tuple, ry: tuple, ncy: int, ncm: int,
                       precision: str, has_side: bool, dual: bool,
                       scale: float = 1.0):
    """Fused ifft(y) + c2r(z) slab. ``dual`` mirrors _rfft_slab_kernel:
    past _H_DOT_MAX the dense G re-tangle dot is replaced by TWO inverse
    half-transforms of diagonally pre-scaled inputs (the reversal in
    conj(X[M-k]) is folded into the gamma constant, _crfft_dual_tables),
    plus a broadcast V0 term (row 0 of the packed spectrum feeds ONLY
    V[0], and idft(e0) is the all-ones column)."""
    base = 4 if has_side else 2
    if has_side:
        xr_ref, xi_ref, sr_ref, si_ref = refs[:4]
    else:
        xr_ref, xi_ref = refs[:2]
    cy = [r[:] for r in refs[base:base + ncy]]
    cm = [r[:] for r in refs[base + ncy:base + ncy + ncm]]
    if dual:
        ar_, ai_, gr_, gi_ = refs[base + ncy + ncm:base + ncy + ncm + 4]
    else:
        g_mat = refs[base + ncy + ncm]
    o_ref = refs[-1]
    tb, ny, m = xr_ref.shape
    n = 2 * m
    if has_side:
        # inject the separately x-transformed Nyquist plane into plane 0
        # (pack = plane0 + i*sideM; packing commutes with the y inverse)
        mask = (jax.lax.broadcasted_iota(jnp.int32, (1, m), 1) == 0
                ).astype(jnp.float32)
    # inverse y per row (packed plane 0 rides along: complex-linear)
    rows_r, rows_i = [], []
    for t in range(tb):
        xr_t = xr_ref[t]
        xi_t = xi_ref[t]
        if has_side:
            sr = sr_ref[t].T                      # (ny, 1)
            si = si_ref[t].T
            xr_t = xr_t + (-si) * mask
            xi_t = xi_t + sr * mask
        yr, yi = _core_apply(xr_t, xi_t, cy, ry, precision, inverse=True)
        rows_r.append(yr)
        rows_i.append(yi)
    zr = jnp.stack(rows_r, axis=0).reshape(tb * ny, m).T   # (M, TB*Y)
    zi = jnp.stack(rows_i, axis=0).reshape(tb * ny, m).T
    if dual:
        a0r, a0i = zr[:1], zi[:1]             # packed A = X0.re, B = XM.re
        # row 0 masking rides the tables (_crfft_dual_tables zeroes it)
        pr = ar_[:] * zr - ai_[:] * zi        # alpha' . X'
        pi_ = ar_[:] * zi + ai_[:] * zr
        qr = gr_[:] * zr - gi_[:] * zi        # gamma . X'
        qi = gr_[:] * zi + gi_[:] * zr
        v1r, v1i = _core_apply(pr, pi_, cm, rm, precision, inverse=True)
        v2r, v2i = _core_apply(qr, qi, cm, rm, precision, inverse=True)
        s = jnp.float32(0.5 * scale)
        vr = v1r + v2r + s * (a0r + a0i)      # + V0 (idft(e0) = ones)
        vi = v1i - v2i + s * (a0r - a0i)
    else:
        # re-tangle (+ packed unpack + normalization) = one folded dot
        vs = jnp.dot(g_mat[:], jnp.concatenate([zr, zi], axis=0),
                     preferred_element_type=jnp.float32,
                     precision=_dot_precision(precision))
        vr, vi = _core_apply(vs[:m], vs[m:], cm, rm, precision,
                             inverse=True)
    # interleave: x[2j] = Re v, x[2j+1] = Im v (sublane-preserving reshape)
    out = jnp.stack([vr, vi], axis=1).reshape(n, tb * ny)
    o_ref[:] = out.T.reshape(tb, ny, n)


@_f32_trace
def irfft_slab_yz(xr: jax.Array, xi: jax.Array, n: int, rad_y=None,
                  rad_z=None, precision: str = DEFAULT_PRECISION,
                  scale: float = 1.0, block_rows: int = 0,
                  side_r=None, side_i=None):
    """Fused ifft(y) + c2r(z) over packed planar (..., Y, M(+pad)) in ONE
    HBM pass; writes the real (..., Y, N) result. Input pad lanes beyond M
    are skipped by partial block coverage (pitched reads).

    ``scale`` multiplies the alpha/beta tables AND the row-0 correction;
    the exact-recovery value is 1/(upstream unscaled factor x M) — e.g.
    1/(Nx*Ny*M) after unscaled inverse x and y passes (the ifft_M's own
    1/M is included there)."""
    m = n // 2
    ny = xr.shape[-2]
    ry = _pick_2stage(ny, rad_y, stacked=_stack_words(precision))
    rm = _pick_2stage(m, rad_z, stacked=_stack_words(precision))
    if ry is None or rm is None:
        raise ValueError(f"c2r slab ({ny},{n}) not fusable")
    lead = xr.shape[:-2]
    p = int(np.prod(lead)) if lead else 1
    in3 = (p, ny, xr.shape[-1])
    xr3 = xr.reshape(in3)
    xi3 = xi.reshape(in3)
    stk = _stack_words(precision)
    cy = _core_tables(ny, ry, True, stacked=stk)
    cm = _core_tables(m, rm, True, stacked=stk)
    # the unscaled inverse core computes a plain sum (no 1/M); the G
    # matrix (or the dual-path alpha/gamma diagonals + V0 term) carries
    # the whole requested scale
    has_side = side_r is not None
    dual = m > _H_DOT_MAX
    if dual:
        ar_, ai_, gr_, gi_ = _crfft_dual_tables(n)
        s = np.float32(scale)
        retangle = (ar_ * s, ai_ * s, gr_ * s, gi_ * s)
    else:
        retangle = (_crfft_g_matrix(n, float(scale)),)
    consts = [jnp.asarray(v) for v in (*cy, *cm, *retangle)]
    kernel = functools.partial(_crfft_slab_kernel, rm=rm, ry=ry,
                               ncy=len(cy), ncm=len(cm),
                               precision=precision, has_side=has_side,
                               dual=dual, scale=float(scale))
    # working set on ny*m, MATCHING rfft_slab_yz: both slabs move the
    # same bytes per block (in + out = 2n lanes' worth either way)
    tb = _pick_slab_rows(block_rows, ny * m, p)
    in_blk = pl.BlockSpec((tb, ny, m), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((tb, ny, n), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    const_spec = [pl.BlockSpec(c.shape, lambda i, c=c: (0,) * c.ndim,
                               memory_space=pltpu.VMEM) for c in consts]
    args = [xr3, xi3]
    in_specs = [in_blk, in_blk]
    if has_side:
        side_blk = pl.BlockSpec((tb, 1, ny), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        args += [side_r.reshape(p, 1, ny), side_i.reshape(p, 1, ny)]
        in_specs += [side_blk, side_blk]
    out = pl.pallas_call(
        kernel,
        grid=(p // tb,),
        in_specs=in_specs + const_spec,
        out_specs=out_blk,
        out_shape=jax.ShapeDtypeStruct((p, ny, n), jnp.float32),
        interpret=_interpret(),
        **_vmem_params(_SLAB_VMEM_PLANES * tb * ny * m * 4, grid_dims=1),
    )(*args, *consts)
    return out.reshape(lead + (ny, n))


@_f32_trace
def irfft3d_planar(xr: jax.Array, xi: jax.Array, nz: int = 0,
                   rad_z=None, rad_y=None, rad_x=None,
                   precision: str = DEFAULT_PRECISION, slab_rows: int = 0,
                   packed: bool = False, x_tile=None):
    """Full 3-D c2r on planar half-spectra -> real (..., X, Y, N).

    Accepts either the numpy layout (..., M+1) or, with ``packed=True``,
    the packed (..., M) form produced by ``rfft3d_planar(packed=True)``.
    Mirror of the forward: inverse x (writing the stride-broken padded
    intermediate), fused inverse-y + c2r slab. For numpy-layout input the
    Nyquist plane takes a cheap side path (its own small x-inverse,
    injected into plane 0 inside the slab kernel) so the main pipeline
    never touches the misaligned M+1-lane layout."""
    lanes = xr.shape[-1]
    m = lanes if packed else lanes - 1
    n = nz or 2 * m
    nx_, ny = xr.shape[-3], xr.shape[-2]
    side_r = side_i = None
    if not packed:
        # Nyquist side path: unscaled x-inverse of the (.., X, Y) plane M
        side_r, side_i = fft_1d_planar(
            xr[..., m], xi[..., m], axis=-2, inverse=True, radices=rad_x,
            scale=False, precision=precision)
    ty, tz = x_tile or (8, 128)
    xr, xi = fft_x_to_padded(xr, xi, zpad=_STRIDE_PAD, inverse=True,
                             radices=rad_x, precision=precision,
                             z_true=0 if packed else m, ty=ty, tz=tz)
    return irfft_slab_yz(xr, xi, n, rad_y=rad_y, rad_z=rad_z,
                         precision=precision,
                         scale=1.0 / (nx_ * ny * m), block_rows=slab_rows,
                         side_r=side_r, side_i=side_i)


# --------------------------------------------------------------------------
# packed last-axis c2r: the 1-D mirror of rfft_last_planar(packed=True),
# used as the distributed pipeline's final z-stage (plan(..., mesh,
# real=True, packed=True)). One kernel pass: G-matrix re-tangle (packed
# plane unpack + scale folded in) -> inverse half-length core -> even/odd
# interleave, all inside the transpose sandwich.
# --------------------------------------------------------------------------

def _icrfft_last_kernel(*refs, rm: tuple, ncm: int, precision: str,
                        dual: bool, scale: float = 1.0):
    xr_ref, xi_ref = refs[0], refs[1]
    cm = [r[:] for r in refs[2:2 + ncm]]
    if dual:
        ar_, ai_, gr_, gi_ = refs[2 + ncm:6 + ncm]
    else:
        g_mat = refs[2 + ncm]
    o_ref = refs[-1]
    m = xr_ref.shape[1]
    zr = xr_ref[:].T                                   # (M, TB)
    zi = xi_ref[:].T
    if dual:
        # same dual-transform re-tangle as _crfft_slab_kernel (row-0
        # masking rides the zeroed table rows)
        a0r, a0i = zr[:1], zi[:1]
        pr = ar_[:] * zr - ai_[:] * zi
        pi_ = ar_[:] * zi + ai_[:] * zr
        qr = gr_[:] * zr - gi_[:] * zi
        qi = gr_[:] * zi + gi_[:] * zr
        v1r, v1i = _core_apply(pr, pi_, cm, rm, precision, inverse=True)
        v2r, v2i = _core_apply(qr, qi, cm, rm, precision, inverse=True)
        s = jnp.float32(0.5 * scale)
        vr = v1r + v2r + s * (a0r + a0i)
        vi = v1i - v2i + s * (a0r - a0i)
    else:
        vs = jnp.dot(g_mat[:], jnp.concatenate([zr, zi], axis=0),
                     preferred_element_type=jnp.float32,
                     precision=_dot_precision(precision))
        vr, vi = _core_apply(vs[:m], vs[m:], cm, rm, precision,
                             inverse=True)                 # v = idft_M(V)
    out = jnp.stack([vr, vi], axis=1).reshape(2 * m, xr_ref.shape[0])
    o_ref[:] = out.T


@_f32_trace
def icrfft_last_planar(xr: jax.Array, xi: jax.Array, n: int = 0,
                       radices=None, precision: str = DEFAULT_PRECISION,
                       scale: float = 0.0, block_rows: int = 0):
    """Packed c2r along the last axis: planar (..., M) packed -> real
    (..., N = 2M). ``scale`` defaults to the exact-inverse 1/M (pass the
    combined factor when upstream passes were left unscaled)."""
    m = xr.shape[-1]
    n = n or 2 * m
    pick = _pick_2stage(m, radices, stacked=_stack_words(precision))
    if pick is None:
        raise ValueError(f"M={m} not expressible for the packed c2r kernel")
    r1, r2 = pick
    if not scale:
        scale = 1.0 / m
    lead = xr.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    xr2 = xr.reshape(b, m).astype(jnp.float32)
    xi2 = xi.reshape(b, m).astype(jnp.float32)
    tb = block_rows or max(128, min(512, (1 << 21) // max(m, 1) & ~127))
    tb = min(tb, -(-b // 128) * 128)
    bp = -(-b // tb) * tb
    if bp != b:
        xr2 = jnp.pad(xr2, ((0, bp - b), (0, 0)))
        xi2 = jnp.pad(xi2, ((0, bp - b), (0, 0)))
    cm = _core_tables(m, pick, True, stacked=_stack_words(precision))
    dual = m > _H_DOT_MAX
    if dual:
        s = np.float32(scale)
        retangle = tuple(v * s for v in _crfft_dual_tables(n))
    else:
        retangle = (_crfft_g_matrix(n, float(scale)),)
    consts = [jnp.asarray(v) for v in (*cm, *retangle)]
    kernel = functools.partial(_icrfft_last_kernel, rm=pick, ncm=len(cm),
                               precision=precision, dual=dual,
                               scale=float(scale))
    in_spec = pl.BlockSpec((tb, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tb, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_spec = [pl.BlockSpec(c.shape, lambda i, c=c: (0,) * c.ndim,
                               memory_space=pltpu.VMEM) for c in consts]
    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=[in_spec, in_spec] + const_spec,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bp, n), jnp.float32),
        interpret=_interpret(),
        # large-M guard (same bug class as fft_last at n>=2048, r2);
        # 24 blocks: the dual re-tangle runs two inverse cores
        **_vmem_params(24 * tb * n * 4
                       + sum(c.nbytes for c in consts) + (1 << 20), grid_dims=1),
    )(xr2, xi2, *consts)
    if bp != b:
        out = out[:b]
    return out.reshape(*lead, n)
