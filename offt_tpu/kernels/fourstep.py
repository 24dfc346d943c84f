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

import jax.numpy as jnp
import numpy as np

from . import dft
from . import pallas_fft as pf


def pick_split(n: int, split=None):
    """Choose (n1, n2) with n1*n2 == n, both fused-kernel expressible, or
    None. An explicit ``split`` (the split_1d knob) is validated only.

    Auto policy: balanced (minimizes total radix work sum over the four
    stage radices), preferring a lane extent n2 that is a 128-multiple
    (full lane tiles in both kernels) and n2 >= n1 (wider rows amortize
    the step-3 transpose sandwich)."""
    if n <= 1:
        return None
    if split is not None:
        n1, n2 = int(split[0]), int(split[1])
        if (n1 > 1 and n2 > 1 and n1 * n2 == n
                and pf.can_use_pallas(n1) and pf.can_use_pallas(n2)):
            return n1, n2
        return None
    best = None
    for d in range(2, int(np.sqrt(n)) + 1):
        if n % d:
            continue
        n1, n2 = d, n // d
        if not (pf.can_use_pallas(n1) and pf.can_use_pallas(n2)):
            continue
        # rank: full lane tiles first, then balance (small n2/n1 ratio)
        key = (0 if n2 % 128 == 0 else 1, n2 // n1)
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


def fft_four_step_planar(xr, xi, inverse: bool = False, split=None,
                         precision: str = pf.DEFAULT_PRECISION,
                         out_scale: float = 1.0, block: int = 0):
    """Planar long-1-D FFT along the LAST axis (numpy fft/ifft semantics;
    inverse includes the 1/n scaling, split across the two sub-stages'
    folded tables). Leading axes are batch."""
    n = xr.shape[-1]
    sp = pick_split(n, split)
    if sp is None:
        raise ValueError(f"N={n} has no four-step split")
    n1, n2 = sp
    lead = xr.shape[:-1]
    xr2 = xr.reshape(lead + (n1, n2))
    xi2 = xi.reshape(lead + (n1, n2))
    # step 1: FFT_{n1} over sublanes; inverse folds 1/n1 into the tables
    s1 = (1.0 / n1) if inverse else 1.0
    yr, yi = pf.fft_sublane(xr2, xi2, axis=xr2.ndim - 2, inverse=inverse,
                            precision=precision, scale=s1,
                            block_lanes=block)
    # step 2: twiddle (+ the caller's norm scale, folded here for free)
    tr, ti = _twiddle_planar(n1, n2, inverse, out_scale)
    tr = jnp.asarray(tr)
    ti = jnp.asarray(ti)
    zr = yr * tr - yi * ti
    zi = yr * ti + yi * tr
    # step 3: FFT_{n2} over lanes; inverse folds 1/n2
    s2 = (1.0 / n2) if inverse else 1.0
    zr, zi = pf.fft_last(zr, zi, inverse=inverse, precision=precision,
                         scale=s2, block_rows=block)
    # step 4: Z[k1, k2] = X[k1 + n1*k2] -> transpose, ravel
    zr = jnp.swapaxes(zr, -1, -2).reshape(lead + (n,))
    zi = jnp.swapaxes(zi, -1, -2).reshape(lead + (n,))
    return zr, zi
