"""Per-stage timing breakdown.

Re-expression of the reference's 17-slot interval-timer array
(offt.h:171-188: ALL/FFTz/FFTy/FFTx/TRANSPOSE/PACK/UNPACK/WAIT..., bracketed
with MPI_Wtime around every stage, printed per rep by offt_print_time).
Under XLA we cannot bracket inside one fused program, so the breakdown
jit-compiles each stage *separately* and times it with the chained-execution
method (see bench.py for why block_until_ready cannot be trusted on
tunneled runtimes). Stage sums exceed the fused end-to-end time; the
difference is the fusion/overlap win and is reported as ``fusion_gain``.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np


def time_fn(fn: Callable, args: tuple, k_small: int = 2, k_large: int = 12,
            tries: int = 2) -> float:
    """Per-iteration seconds for fn(*args); output fed back when shapes
    match (forces serialization), else same inputs re-issued."""
    import jax

    def chain(k):
        out = args
        t0 = time.perf_counter()
        for _ in range(k):
            res = fn(*out)
            out = res if isinstance(res, tuple) else (res,)
            if len(out) != len(args) or any(
                    o.shape != a.shape or o.dtype != a.dtype
                    for o, a in zip(out, args)):
                out = args
        leaf = out[0]
        _ = float(leaf[(0,) * leaf.ndim])  # single-element readback
        return time.perf_counter() - t0

    chain(k_small)
    t_s = min(chain(k_small) for _ in range(tries))
    t_l = min(chain(k_large) for _ in range(tries))
    return max((t_l - t_s) / (k_large - k_small), 1e-9)


def fft3d_breakdown(shape, params=None, dtype="complex64",
                    mesh=None) -> dict[str, float]:
    """Per-axis + fused timing (seconds) for a 3-D c2c plan.

    Keys: fft_z / fft_y / fft_x (separately-jitted single-axis passes),
    total_fused (the real plan), stage_sum, fusion_gain. With a mesh, adds
    total_phase1 / total_phase2 style split via t-chunk boundaries is not
    separable under GSPMD; only the fused total is reported per phase
    structure (documented limitation).
    """
    import jax
    import jax.numpy as jnp

    import offt_tpu
    from ..dist.pencil import axis_fft
    from ..plan.params import ProblemSpec, default_params

    if params is None:
        p = 1 if mesh is None else mesh.devices.size
        params = default_params(ProblemSpec(shape=tuple(shape), dtype=dtype,
                                            p=p))
    rng = np.random.default_rng(0)
    re = jax.device_put(rng.standard_normal(shape).astype(np.float32))
    im = jax.device_put(rng.standard_normal(shape).astype(np.float32))
    args = (re, im)
    rads = {2: params.radix_z, 1: params.radix_y, 0: params.radix_x}

    def stage(axis):
        def fn(r, i):
            c = axis_fft(jax.lax.complex(r, i), axis, False, rads[axis],
                         params)
            return jnp.real(c), jnp.imag(c)
        return jax.jit(fn)

    out: dict[str, float] = {}
    if mesh is None:
        out["fft_z"] = time_fn(stage(2), args)
        out["fft_y"] = time_fn(stage(1), args)
        out["fft_x"] = time_fn(stage(0), args)
    plan = offt_tpu.plan(shape, dtype, mesh=mesh, params=params, planar=True)
    out["total_fused"] = time_fn(plan._fn, args)
    stages = [v for k, v in out.items() if k.startswith("fft_")]
    if stages:
        out["stage_sum"] = sum(stages)
        out["fusion_gain"] = out["stage_sum"] - out["total_fused"]
    return out
