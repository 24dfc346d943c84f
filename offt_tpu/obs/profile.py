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
            tries: int = 2, feedback: bool = True) -> float:
    """Per-iteration seconds for fn(*args); output fed back when shapes
    match (forces serialization), else same inputs re-issued.
    ``feedback=False`` always re-issues — required when outputs carry a
    different sharding than the inputs (feeding them back would insert a
    resharding collective, or error on pinned in_shardings)."""
    import jax

    def chain(k):
        out = args
        t0 = time.perf_counter()
        for _ in range(k):
            res = fn(*out)
            res_t = res if isinstance(res, tuple) else (res,)
            out = args
            if feedback and len(res_t) == len(args) and all(
                    o.shape == a.shape and o.dtype == a.dtype
                    for o, a in zip(res_t, args)):
                out = res_t
        leaf = (res if isinstance(res, tuple) else (res,))[0]
        _ = float(leaf[(0,) * leaf.ndim])  # single-element readback
        return time.perf_counter() - t0

    chain(k_small)
    t_s = min(chain(k_small) for _ in range(tries))
    t_l = min(chain(k_large) for _ in range(tries))
    return max((t_l - t_s) / (k_large - k_small), 1e-9)


def time_fn_looped(body, carry, k1: int = 4, k2: int = 44,
                   tries: int = 2) -> float:
    """Per-iteration seconds for ``carry = body(carry)`` timed INSIDE one
    jit program via lax.fori_loop, differencing two loop lengths.

    This is the trustworthy timer for non-chainable functions (e.g. r2c,
    whose output shape differs from its input): re-issuing the same
    arguments k times from the host is unreliable through tunneled TPU
    runtimes (observed 0.0-ms and 1e-9 artifacts — the k executions hide
    behind constant dispatch/readback jitter). Inside the loop every
    iteration is data-dependent on the last, so the device must run all k.

    ``body`` must return a carry of the same structure; use ``fence``
    to pin a same-shape output to a scalar derived from the real result:

        def body(x):
            yr, yi = rfft(x)
            return fence(x, yr[0, 0, 0])
    """
    return time_fn_looped_stats(body, carry, k1=k1, k2=k2, tries=tries,
                                pairs=1)["min"]


def time_fn_looped_stats(body, carry, k1: int = 4, k2: int = 44,
                         tries: int = 2, pairs: int = 3) -> dict:
    """Like :func:`time_fn_looped` but reports the DISTRIBUTION over
    ``pairs`` independent loop-pair differences instead of a single draw.

    The tunneled chip shows ±10% session variance; a single (t_k2-t_k1)
    difference can under- or over-report a build by a round's worth of
    progress. Both fori_loop programs are compiled ONCE (remote compiles
    are ~40 s each); each pair then interleaves ``tries`` executions of
    each length and differences the per-pair minima. Returns::

        {"median": s, "min": s, "max": s, "pairs": [s, ...]}

    ``median`` is the honest headline; ``(max-min)/median`` is the
    observed relative spread of the session.
    """
    import jax

    def compile_runner(k):
        @jax.jit
        def run(c):
            return jax.lax.fori_loop(0, k, lambda i, c: body(c), c)

        out = run(carry)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(leaf[(0,) * leaf.ndim])      # warm compile + drain

        def measure():
            best = float("inf")
            for _i in range(tries):
                t0 = time.perf_counter()
                o = run(carry)
                lf = jax.tree_util.tree_leaves(o)[0]
                _ = float(lf[(0,) * lf.ndim])
                best = min(best, time.perf_counter() - t0)
            return best

        return measure

    m_a = compile_runner(k1)
    m_b = compile_runner(k2)
    diffs = []
    for _p in range(pairs):
        ta = m_a()
        tb = m_b()
        diffs.append(max((tb - ta) / (k2 - k1), 1e-9))
    srt = sorted(diffs)
    mid = len(srt) // 2
    median = (srt[mid] if len(srt) % 2 else 0.5 * (srt[mid - 1] + srt[mid]))
    return {"median": median, "min": srt[0], "max": srt[-1], "pairs": diffs}


def fence(x, dep):
    """Return ``x`` data-dependent on ``dep`` so a fori_loop timing body
    cannot be elided, hoisted, or reordered.

    NOT an optimization_barrier: XLA drops a barrier operand whose tuple
    output is unused, silently DCE-ing the whole timed computation
    (measured: zero loop slope on v5e). Instead the dependency is a VALUE
    edge — ``dep * 1e-45`` (runtime-zero after underflow, but not
    statically foldable) is added into one row of ``x`` via an in-place
    dynamic_update_slice; the next iteration's input is bit-identical yet
    data-dependent on this iteration's output."""
    import jax
    import jax.numpy as jnp

    eps = (dep * 1e-45).astype(x.dtype)
    sizes = (1,) * (x.ndim - 1) + (min(128, x.shape[-1]),)
    zeros = (0,) * x.ndim
    row = jax.lax.dynamic_slice(x, zeros, sizes)
    return jax.lax.dynamic_update_slice(x, row + eps, zeros)


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
        p = 1
        if mesh is not None:
            from ..dist.mesh import mesh_shape
            p = mesh_shape(mesh)[0] * mesh_shape(mesh)[1]
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


def pencil_breakdown(shape, mesh, params=None,
                     dtype="complex64") -> dict[str, float]:
    """Distributed per-phase breakdown (seconds) on a (p1, p2) mesh.

    The reference brackets 17 timer slots inside one execution
    (offt.h:171-188: FFTz/PACK1/WAIT1/UNPACK1/FFTy/... per phase). Under
    GSPMD one fused program is not internally bracketable, so each stage
    is a separately-jitted shard_map'd sub-program over the SAME shardings
    the real pipeline uses:

      fft_z -> exchange_1 (z<->y all_to_all over COL) -> fft_y ->
      exchange_2 (y<->x over ROW) -> fft_x

    ``stage_sum - total_fused`` is the measured fusion/overlap win — the
    TPU equivalent of the overlap the reference's W-window buys
    (offt-compute.c:3614-3647). Requires mesh-divisible extents."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import offt_tpu
    from ..dist.mesh import COL, ROW, mesh_shape
    from ..dist.pencil import _transpose, axis_fft
    from ..plan.params import ProblemSpec, default_params

    nx, ny, nz = shape
    p1, p2 = mesh_shape(mesh)
    if nx % p1 or ny % p2 or ny % p1 or nz % p2:
        raise ValueError(f"breakdown needs mesh-divisible extents, "
                         f"got {shape} on {p1}x{p2}")
    if params is None:
        params = default_params(
            ProblemSpec(shape=tuple(shape), dtype=dtype, p=p1 * p2), p1=p1)

    rng = np.random.default_rng(0)
    spec_in = P(ROW, COL, None)       # z-pencils
    spec_mid = P(ROW, None, COL)      # y-pencils
    spec_out = P(None, ROW, COL)      # x-pencils (transposed out)

    def planar_sm(local_fn, in_spec, out_spec):
        def planar(r, i):
            c = local_fn(jax.lax.complex(r, i))
            return jnp.real(c), jnp.imag(c)
        sm = jax.shard_map(planar, mesh=mesh, in_specs=(in_spec, in_spec),
                           out_specs=(out_spec, out_spec), check_vma=False)
        return jax.jit(sm)

    def args_for(sspec):
        sh = NamedSharding(mesh, sspec)
        re = jax.device_put(rng.standard_normal(shape).astype(np.float32), sh)
        im = jax.device_put(rng.standard_normal(shape).astype(np.float32), sh)
        return re, im

    stages = {
        "fft_z": (lambda c: axis_fft(c, 2, False, params.radix_z, params),
                  spec_in, spec_in),
        "exchange_1": (lambda c: _transpose(c, COL, 2, 1, p2, params.s1,
                                            params.v & 1),
                       spec_in, spec_mid),
        "fft_y": (lambda c: axis_fft(c, 1, False, params.radix_y, params),
                  spec_mid, spec_mid),
        "exchange_2": (lambda c: _transpose(c, ROW, 1, 0, p1, params.s2,
                                            (params.v >> 1) & 1),
                       spec_mid, spec_out),
        "fft_x": (lambda c: axis_fft(c, 0, False, params.radix_x, params),
                  spec_out, spec_out),
    }
    out: dict[str, float] = {}
    for name, (fn, si, so) in stages.items():
        out[name] = time_fn(planar_sm(fn, si, so), args_for(si),
                            feedback=False)
    plan = offt_tpu.plan(shape, dtype, mesh=mesh, params=params, planar=True)
    out["total_fused"] = time_fn(plan._fn, args_for(spec_in),
                                 feedback=False)
    out["stage_sum"] = sum(v for k, v in out.items()
                           if k != "total_fused")
    out["overlap_gain"] = out["stage_sum"] - out["total_fused"]
    return out
