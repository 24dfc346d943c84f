"""Long 1-D FFT via the four-step factorization n = n1 * n2.

The reference's local 1-D engine handles arbitrary lengths with FFTW
sub-plans (``setup_p1d``, offt-compute.c:329-489). Our fused Pallas core
is 2-stage (n <= 128*128 = 16384); beyond that the unfused Stockham path
pays 3+ full HBM round trips per transform plus XLA transpose
materializations. This module re-expresses long 1-D transforms the
TPU-native way: view the length-n vector as an (n1, n2) matrix and run

    step 1:  FFT_{n1} along the SUBLANE axis       (fused kernel, no
             transpose — the 3-D pipeline's y-axis pattern)
    step 2:  twiddle multiply T[k1, j2] = w^(k1*j2) (one VPU pass; norm
             scaling folds in here for free)
    step 3:  FFT_{n2} along the LANE axis           (fused kernel)
    step 4:  transpose (n1, n2) -> (n2, n1), ravel  (natural output order)

so a 2^20-point transform is 2 fused kernel passes + 1 elementwise pass
+ 1 transpose copy instead of the unfused chain. Derivation: with
j = j1*n2 + j2 and k = k1 + n1*k2,

    X[k1 + n1*k2] = FFT_{j2->k2}( w^(j2*k1) * FFT_{j1->k1}(x)[k1, j2] )

(dft.py module docstring) — the output viewed as (n2, n1) row-major is
exactly the step-3 result transposed.

BASELINE config 1 (1-D c2c N=2^20) rides this route via a degenerate
(1, 1, n) plan; the split is the ``split_1d`` PlanParams knob (auto:
balanced divisors, lanes preferring 128-multiples).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dft
from . import pallas_fft as pf


# Measured split-ORDER wisdom (docs/receipts/splitorder_b16.jsonl, chip,
# b=16 in-jit fori_loop timing; + the saturation confirm pass,
# saturation.jsonl). The balance rule is strongly confirmed (the most
# balanced pair wins at every receipted length, 8-40%), but the ORDER
# within the winning pair is shape-specific with no clean model: 2^19
# and 5*2^17 prefer small-first (the default, 10-13%), while 3*2^18 runs
# (1024, 768) 1.74-1.83x faster than (768, 1024) single-transform (three
# independent sessions) and 1.06x batched. Absorbing receipted order
# wins here is the reference's own lifecycle — production tuning flows
# into the default point (params_set_default, offt-compute.c:3127-3225).
_MEASURED_SPLITS = {3 * (1 << 18): (1024, 768)}


def pick_split(n: int, split=None, divisor: int = 1):
    """Choose (n1, n2) with n1*n2 == n, both fused-kernel expressible, or
    None. An explicit ``split`` (the split_1d knob) is validated only.

    Auto policy: measured per-length wisdom first (_MEASURED_SPLITS);
    otherwise most-balanced pair, preferring 128-multiple extents (full
    lane tiles / whole sublane tiles in the two fused kernels) and
    breaking the within-pair order tie small-first (n1 <= n2) — the
    receipted default (splitorder_b16.jsonl). Both orders of every
    divisor pair are candidates; the old picker never considered
    n1 > n2, which is exactly where the 3*2^18 win lives.

    ``divisor``: additionally require divisor | n1 and divisor | n2 —
    the distributed four-step engine (dist/long1d.py) shards both
    matrix axes over the device count, so its exchanges need equal
    static shards on each."""
    if n <= 1:
        return None

    def _ok(a, b):
        return (a > 1 and b > 1 and a % divisor == 0 and b % divisor == 0
                and pf.can_use_pallas(a) and pf.can_use_pallas(b))

    if split is not None:
        n1, n2 = int(split[0]), int(split[1])
        if n1 * n2 == n and _ok(n1, n2):
            return n1, n2
        return None
    m = _MEASURED_SPLITS.get(n)
    if m is not None and _ok(m[0], m[1]):
        return m
    best = None
    for d in range(2, int(np.sqrt(n)) + 1):
        if n % d:
            continue
        for n1, n2 in ((d, n // d), (n // d, d)):
            if not _ok(n1, n2):
                continue
            # rank: full 128-tiles first (lane side weightier), then
            # balance, then the small-first order default
            key = (0 if n2 % 128 == 0 else 1, 0 if n1 % 128 == 0 else 1,
                   max(n1, n2) / min(n1, n2), 0 if n1 <= n2 else 1)
            if best is None or key < best[0]:
                best = (key, (n1, n2))
    return best[1] if best else None


def can_use_four_step(n: int, split=None) -> bool:
    """True when the four-step route applies AND the single fused 2-stage
    kernel does not (the 2-stage kernel is strictly fewer passes, so it
    always wins when expressible)."""
    return not pf.can_use_pallas(n) and pick_split(n, split) is not None


@functools.lru_cache(maxsize=32)
def _twiddle_planar(n1: int, n2: int, inverse: bool, scale: float):
    """f64-generated four-step twiddle table T[k1, j2] (dft.twiddles) as
    an f32 planar pair, with any norm/out scale folded in (free)."""
    t = dft.twiddles(n1, n2, np.complex128, inverse) * scale
    return (np.ascontiguousarray(t.real.astype(np.float32)),
            np.ascontiguousarray(t.imag.astype(np.float32)))


# --------------------------------------------------------------------------
# fused kernels: the naive route is 4 HBM round trips (sublane FFT,
# twiddle multiply, lane FFT, transpose copy). The twiddle is elementwise
# in exactly step 1's output block layout -> fold it into that kernel's
# epilogue (free VPU work under the MXU); and step 3's transpose sandwich
# already PRODUCES the (n2, tb) transposed block in VMEM -> write it
# directly into a (.., n2, n1) output instead of transposing back and
# paying a separate XLA transpose pass. 4 round trips -> 2.
# --------------------------------------------------------------------------


def _step1tw_kernel(*refs, radices: tuple, ncore: int, precision: str,
                    inverse: bool):
    # data blocks (1, n1, TL); twiddle blocks (n1, TL)
    xr_ref, xi_ref = refs[0], refs[1]
    consts = [r[:] for r in refs[2:2 + ncore]]
    twr, twi = refs[2 + ncore][:], refs[3 + ncore][:]
    or_ref, oi_ref = refs[-2], refs[-1]
    yr, yi = pf._core_apply(xr_ref[0], xi_ref[0], consts, radices,
                            precision, inverse=inverse)
    or_ref[0] = yr * twr - yi * twi
    oi_ref[0] = yr * twi + yi * twr


def _step3t_kernel(*refs, radices: tuple, precision: str, inverse: bool):
    # in blocks (1, TB, n2); out blocks (1, n2, TB) — the transpose
    # sandwich's natural product, written without transposing back
    xr_ref, xi_ref = refs[0], refs[1]
    consts = [r[:] for r in refs[2:-2]]
    or_ref, oi_ref = refs[-2], refs[-1]
    yr, yi = pf._core_apply(xr_ref[0].T, xi_ref[0].T, consts, radices,
                            precision, inverse=inverse)
    or_ref[0] = yr
    oi_ref[0] = yi


def _tile(n: int, target: int) -> int:
    """Largest 128-multiple divisor of n at most ``target`` (n % 128 == 0
    required by the caller)."""
    t = max(128, min(n, target) & ~127)
    while n % t:
        t -= 128
    return t


def _step1_twiddle(xr3, xi3, n1, n2, rad1, inverse, precision, scale, block,
                   tw=None):
    """Fused step 1+2: FFT_{n1} over sublanes with the four-step twiddle
    (and all norm scaling) applied in the kernel epilogue.

    ``tw``: optional caller-supplied (twr, twi) planar pair of shape
    (n1, n2) REPLACING the internally-built table — the distributed
    engine (dist/long1d.py) passes each device's column chunk of the
    global twiddle this way (``scale`` is then ignored; the caller
    folds all scaling into its table)."""
    b = xr3.shape[0]
    tl = block or _tile(n2, (1 << 18) // max(n1, 1))
    if n2 % tl:
        tl = _tile(n2, tl)
    words = pf._stack_words(precision)
    consts = [jnp.asarray(c) for c in
              pf._core_tables(n1, rad1, inverse, 1.0, stacked=words)]
    if tw is None:
        twr, twi = _twiddle_planar(n1, n2, inverse, scale)
        tw = [jnp.asarray(twr), jnp.asarray(twi)]
    else:
        tw = [jnp.asarray(tw[0]), jnp.asarray(tw[1])]
    kernel = functools.partial(_step1tw_kernel, radices=rad1,
                               ncore=len(consts), precision=precision,
                               inverse=inverse)
    grid = (b, n2 // tl)
    dspec = pl.BlockSpec((1, n1, tl), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    cspec = [pl.BlockSpec(c.shape, lambda i, j, c=c: (0,) * c.ndim,
                          memory_space=pltpu.VMEM) for c in consts]
    tspec = [pl.BlockSpec((n1, tl), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)] * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[dspec, dspec] + cspec + tspec,
        out_specs=(dspec, dspec),
        out_shape=(jax.ShapeDtypeStruct((b, n1, n2), jnp.float32),) * 2,
        interpret=pf._interpret(),
        # 4 data planes + 2 twiddle planes, all double-buffered, plus
        # ~2 core-temp planes and headroom (real-Mosaic AOT measured
        # 22.9M at (1024, 256) blocks — the 18x estimate under-shot)
        **pf._vmem_params(26 * n1 * tl * 4 + sum(c.nbytes for c in consts)
                          + (2 << 20), grid_dims=2),
    )(xr3, xi3, *consts, *tw)


def _step3_transposed(zr3, zi3, n1, n2, rad2, inverse, precision, block):
    """Fused step 3+4: FFT_{n2} over lanes, each block written TRANSPOSED
    into a (B, n2, n1) output (k2-major = the natural four-step order)."""
    b = zr3.shape[0]
    tb = block or _tile(n1, (1 << 18) // max(n2, 1))
    if n1 % tb:
        tb = _tile(n1, tb)
    words = pf._stack_words(precision)
    consts = [jnp.asarray(c) for c in
              pf._core_tables(n2, rad2, inverse, 1.0, stacked=words)]
    kernel = functools.partial(_step3t_kernel, radices=rad2,
                               precision=precision, inverse=inverse)
    grid = (b, n1 // tb)
    ispec = pl.BlockSpec((1, tb, n2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, n2, tb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    cspec = [pl.BlockSpec(c.shape, lambda i, j, c=c: (0,) * c.ndim,
                          memory_space=pltpu.VMEM) for c in consts]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ispec, ispec] + cspec,
        out_specs=(ospec, ospec),
        out_shape=(jax.ShapeDtypeStruct((b, n2, n1), jnp.float32),) * 2,
        interpret=pf._interpret(),
        **pf._vmem_params(26 * tb * n2 * 4 + sum(c.nbytes for c in consts)
                          + (2 << 20), grid_dims=2),
    )(zr3, zi3, *consts)


@pf._f32_trace
def step12_planar(xr3, xi3, rad1, inverse: bool, precision: str, tw,
                  block: int = 0):
    """Distributed-shard step 1+2: FFT over sublanes of (B, n1, n2_local)
    planar arrays with the caller's twiddle COLUMN CHUNK (n1, n2_local)
    applied in the kernel epilogue. All norm scaling must already be
    folded into ``tw`` (dist/long1d.py builds it per-device-sharded)."""
    b, n1, n2l = xr3.shape
    return _step1_twiddle(xr3, xi3, n1, n2l, rad1, inverse, precision,
                          1.0, block, tw=tw)


@pf._f32_trace
def step34_planar(zr3, zi3, rad2, inverse: bool, precision: str,
                  block: int = 0):
    """Distributed-shard step 3+4: FFT over lanes of (B, n1_local, n2)
    planar arrays, blocks written TRANSPOSED into (B, n2, n1_local) —
    the same fused transpose-sandwich kernel as the local route. NO
    inverse 1/n scaling here (the caller's twiddle carries it)."""
    b, n1l, n2 = zr3.shape
    return _step3_transposed(zr3, zi3, n1l, n2, rad2, inverse, precision,
                             block)


@pf._f32_trace
def fft_four_step_planar(xr, xi, inverse: bool = False, split=None,
                         precision: str = pf.DEFAULT_PRECISION,
                         out_scale: float = 1.0, block: int = 0):
    """Planar long-1-D FFT along the LAST axis (numpy fft/ifft semantics;
    inverse includes the 1/n scaling, folded into the twiddle/tables).
    Leading axes are batch.

    Fast path (both factors 128-multiples): TWO fused Pallas passes —
    step 1+2 (sublane FFT + twiddle epilogue) and step 3+4 (lane FFT with
    transposed block writes) — i.e. 2 HBM round trips for the whole
    transform. Other splits fall back to the 4-pass composition
    (fft_sublane, twiddle, fft_last, XLA transpose)."""
    n = xr.shape[-1]
    sp = pick_split(n, split)
    if sp is None:
        raise ValueError(f"N={n} has no four-step split")
    n1, n2 = sp
    lead = xr.shape[:-1]
    b = 1
    for d in lead:
        b *= int(d)
    # all norm scaling rides the step-2 twiddle (free VPU epilogue);
    # 1/n = 1/n1 * 1/n2 exactly in f32 for the pow2 splits, and the f64
    # twiddle generation absorbs the product error elsewhere
    scale = out_scale * ((1.0 / n) if inverse else 1.0)
    words = pf._stack_words(precision)
    rad1 = pf._pick_stages(n1, None, stacked=words)
    rad2 = pf._pick_stages(n2, None, stacked=words)
    import os
    fused_env = os.environ.get("OFFT_FOURSTEP_FUSED", "1") != "0"  # A/B knob
    if fused_env and n1 % 128 == 0 and n2 % 128 == 0 and rad1 and rad2:
        xr3 = xr.reshape(b, n1, n2)
        xi3 = xi.reshape(b, n1, n2)
        zr, zi = _step1_twiddle(xr3, xi3, n1, n2, rad1, inverse,
                                precision, scale, block)
        zr, zi = _step3_transposed(zr, zi, n1, n2, rad2, inverse,
                                   precision, block)
        return zr.reshape(lead + (n,)), zi.reshape(lead + (n,))
    xr2 = xr.reshape(lead + (n1, n2))
    xi2 = xi.reshape(lead + (n1, n2))
    # step 1: FFT_{n1} over sublanes
    yr, yi = pf.fft_sublane(xr2, xi2, axis=xr2.ndim - 2, inverse=inverse,
                            precision=precision, block_lanes=block)
    # step 2: twiddle (+ ALL scaling, folded here for free)
    tr, ti = _twiddle_planar(n1, n2, inverse, scale)
    tr = jnp.asarray(tr)
    ti = jnp.asarray(ti)
    zr = yr * tr - yi * ti
    zi = yr * ti + yi * tr
    # step 3: FFT_{n2} over lanes
    zr, zi = pf.fft_last(zr, zi, inverse=inverse, precision=precision,
                         block_rows=block)
    # step 4: Z[k1, k2] = X[k1 + n1*k2] -> transpose, ravel
    zr = jnp.swapaxes(zr, -1, -2).reshape(lead + (n,))
    zi = jnp.swapaxes(zi, -1, -2).reshape(lead + (n,))
    return zr, zi
