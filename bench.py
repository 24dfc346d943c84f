"""Headline benchmark: single-chip 3-D c2c FFT throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is our speed relative to XLA's built-in FFT
(jnp.fft.fftn) on the same chip and shape (>1 means offt-tpu is faster) —
the TPU-side stand-in for the reference's FFTW-MPI comparison baseline
(run-fft.c -a 1).

Timing note: on tunneled TPU runtimes ``block_until_ready`` can return
before execution finishes and a full readback measures PCIe/tunnel
transfer, not compute. We therefore time K chained executions (output fed
back as input, forcing serialization) ending in a single scalar readback,
and difference two K values to cancel the constant readback overhead.

FLOP convention: 5 * n * log2(n) with n = total complex points (HPC
Challenge / FFTW convention), independent of the algorithm actually used.
"""

import json
import math
import os
import sys
import time


def bench_chained(fn, args, k_small=2, k_large=22, tries=3):
    """Per-iteration seconds via chained-execution differencing."""
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


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import offt_tpu

    n = int(os.environ.get("OFFT_BENCH_N", "256"))
    shape = (n, n, n)
    total = n ** 3
    flops = 5.0 * total * math.log2(total)

    rng = np.random.default_rng(0)
    re = jax.device_put(rng.standard_normal(shape).astype(np.float32))
    im = jax.device_put(rng.standard_normal(shape).astype(np.float32))

    p = offt_tpu.plan(shape, "complex64", planar=True)
    t_ours = bench_chained(p._fn, (re, im))
    gflops = flops / t_ours / 1e9

    @jax.jit
    def xla_fft(r, i):
        y = jnp.fft.fftn(jax.lax.complex(r, i))
        return jnp.real(y), jnp.imag(y)

    try:
        t_xla = bench_chained(xla_fft, (re, im))
        vs_baseline = t_xla / t_ours  # >1 means we are faster
    except Exception as e:  # XLA FFT may be unsupported on some runtimes
        print(f"# xla fft baseline failed: {e}", file=sys.stderr)
        vs_baseline = None

    print(json.dumps({
        "metric": f"3dfft_{n}^3_c2c_single_chip",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
