"""Headline benchmark: single-chip 3-D c2c FFT throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is our speed relative to XLA's built-in FFT
(jnp.fft.fftn) on the same chip and shape (>1 means offt-tpu is faster) —
the TPU-side stand-in for the reference's FFTW-MPI comparison baseline
(run-fft.c -a 1).

Timing note: on tunneled TPU runtimes ``block_until_ready`` can return
before execution finishes, a full readback measures PCIe/tunnel transfer,
and per-execution host dispatch adds ~0.2 ms of constant overhead that
does NOT cancel in chained differencing (it scales with K). The honest
device-time measurement loops the transform INSIDE one jit program
(lax.fori_loop, each iteration data-dependent on the last) and
differences two loop lengths — see offt_tpu/obs/profile.py:time_fn_looped.

Both transforms run norm='ortho' so the chained values stay O(1) in
magnitude across arbitrarily long loops (an unnormalized forward chain
overflows f32 after ~11 iterations of 256^3). For offt the ortho scale is
folded into the final stage's constant tables (zero extra cost — measured
identical to unnormalized); XLA pays its own elementwise multiply, which
is its real cost of computing the same function.

FLOP convention: 5 * n * log2(n) with n = total complex points (HPC
Challenge / FFTW convention), independent of the algorithm actually used.
"""

import json
import math
import os
import sys
import time


def bench_chained(fn, args, k_small=2, k_large=22, tries=3):
    """Per-iteration seconds via host-chained differencing (legacy; kept
    for non-jittable callables — includes per-iteration dispatch)."""
    def chain(k):
        out = args
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*out)
        _ = float(out[0][(0,) * out[0].ndim])  # drain queue with tiny readback
        return time.perf_counter() - t0

    chain(k_small)  # warm up / compile
    t_s = min(chain(k_small) for _ in range(tries))
    t_l = min(chain(k_large) for _ in range(tries))
    return max((t_l - t_s) / (k_large - k_small), 1e-9)


def _device_watchdog(timeout_s: float = 300.0, probes: int = 3,
                     backoff_s: float = 180.0):
    """Fail fast (one diagnostic JSON line) instead of hanging forever
    when the tunneled TPU is unreachable — observed 2026-08-17: the axon
    terminal went away mid-session and jax.devices() blocked
    indefinitely, which would otherwise wedge the whole bench run.

    Retries: a single 300 s probe cost round 3 its headline receipt when
    a transient tunnel stall happened to overlap capture time
    (BENCH_r03.json value:null). Now up to ``probes`` attempts with
    ``backoff_s`` sleeps between them; only after all fail does the
    diagnostic line print. Each probe runs in a fresh daemon thread
    because a hung device_put never returns — the stuck thread is
    abandoned, not joined. Tune via OFFT_BENCH_PROBES / OFFT_BENCH_PROBE_S
    / OFFT_BENCH_BACKOFF_S."""
    import threading

    timeout_s = float(os.environ.get("OFFT_BENCH_PROBE_S", timeout_s))
    probes = int(os.environ.get("OFFT_BENCH_PROBES", probes))
    backoff_s = float(os.environ.get("OFFT_BENCH_BACKOFF_S", backoff_s))

    errs = []
    for attempt in range(probes):
        result = {}

        def probe(res=result):
            try:
                import numpy as np
                import jax
                import jax.numpy as jnp
                x = jax.device_put(np.ones(8, np.float32))
                res["ok"] = float(jnp.sum(x)) == 8.0
            except Exception as e:  # noqa: BLE001 - diagnostic path
                res["err"] = str(e)

        th = threading.Thread(target=probe, daemon=True)
        th.start()
        th.join(timeout_s)
        if result.get("ok"):
            if attempt:
                print(f"# device probe succeeded on attempt {attempt + 1}",
                      file=sys.stderr)
            return
        errs.append(result.get("err", f"probe hang ({timeout_s:.0f}s)"))
        print(f"# device probe {attempt + 1}/{probes} failed: {errs[-1]}",
              file=sys.stderr)
        if attempt + 1 < probes:
            time.sleep(backoff_s)
    print(json.dumps({
        "metric": "3dfft_256^3_c2c_single_chip",
        "value": None,
        "unit": "GFLOP/s",
        "vs_baseline": None,
        "error": (f"device unreachable after {probes} probes of "
                  f"{timeout_s:.0f}s (backoff {backoff_s:.0f}s): "
                  + "; ".join(errs)),
    }))
    sys.exit(0)


def main():
    _device_watchdog()
    import numpy as np
    import jax
    import jax.numpy as jnp

    import offt_tpu
    from offt_tpu.obs.profile import time_fn_looped, time_fn_looped_stats

    n = int(os.environ.get("OFFT_BENCH_N", "256"))
    shape = (n, n, n)
    total = n ** 3
    flops = 5.0 * total * math.log2(total)

    rng = np.random.default_rng(0)
    re = jax.device_put(rng.standard_normal(shape).astype(np.float32))
    im = jax.device_put(rng.standard_normal(shape).astype(np.float32))

    # use_cache=True: explicitly pick the tuned cached/bundled plan if one
    # exists for this shape on this device kind (plan/tuned_defaults.json)
    p = offt_tpu.plan(shape, "complex64", planar=True, norm="ortho",
                      use_cache=True)
    # the tunneled chip shows ±10% run-to-run variance (shared tenancy).
    # Both fori_loop programs are compiled ONCE (~40 s each remote), then
    # ``pairs`` independent loop-pair differences are drawn on the same
    # executables; the headline is the MEDIAN pair, and the spread is
    # reported so a bad draw is visible instead of silently mis-grading.
    # tries=2 x pairs=4 = 16 timed executions: each costs a full tunnel
    # readback round-trip (measured multi-second under congestion), and
    # 4 pairs already bound the spread (observed 5% across 5)
    t_start = time.perf_counter()
    st = time_fn_looped_stats(lambda c: tuple(p._fn(*c)), (re, im),
                              tries=2, pairs=4)
    print(f"# ours timed in {time.perf_counter() - t_start:.0f}s",
          file=sys.stderr)
    t_ours = st["median"]
    gflops = flops / t_ours / 1e9

    def xla_fft(c):
        y = jnp.fft.fftn(jax.lax.complex(c[0], c[1]), norm="ortho")
        return jnp.real(y), jnp.imag(y)

    try:
        # short loops: XLA's per-iter time is ~3x ours, slope well above
        # noise, and each loop length costs a fresh ~40 s remote compile
        t_start = time.perf_counter()
        t_xla = time_fn_looped(xla_fft, (re, im), k1=2, k2=12, tries=4)
        print(f"# xla timed in {time.perf_counter() - t_start:.0f}s",
              file=sys.stderr)
        vs_baseline = t_xla / t_ours  # >1 means we are faster
    except Exception as e:  # XLA FFT may be unsupported on some runtimes
        print(f"# xla fft baseline failed: {e}", file=sys.stderr)
        vs_baseline = None

    spread = (st["max"] - st["min"]) / t_ours if t_ours else 0.0
    print(json.dumps({
        "metric": f"3dfft_{n}^3_c2c_single_chip",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        # distribution over independent loop-pair differences (same
        # executables): value is the median; best/spread expose session
        # variance on the shared tunneled chip
        "best": round(flops / st["min"] / 1e9, 2),
        "spread_rel": round(spread, 3),
        "pairs_ms": [round(x * 1e3, 3) for x in st["pairs"]],
    }))


if __name__ == "__main__":
    main()
