"""Decompose the fused four-step route's wall time at 2^24 into its two
Pallas passes (step 1+2 sublane FFT + twiddle epilogue; step 3+4 lane
FFT with transposed writes) on the real chip — is one pass pathological,
or is the gap to the MXU floor (0.84 ms model vs 3.44 ms measured)
spread evenly (narrow 128-lane cores + pipelining overhead)?

Run on the chip session:  python docs/receipts/probe_fourstep_passes.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from offt_tpu.kernels import fourstep
from offt_tpu.kernels import pallas_fft as pf
from offt_tpu.obs.profile import time_fn_looped, fence

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 24


def main():
    n1, n2 = fourstep.pick_split(N)
    print(f"# split {n1} x {n2}", file=sys.stderr)
    words = pf._stack_words("stack6")
    rad1 = pf._pick_stages(n1, None, stacked=words)
    rad2 = pf._pick_stages(n2, None, stacked=words)
    print(f"# radices {rad1} / {rad2}", file=sys.stderr)
    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((1, n1, n2)).astype(np.float32))
    xi = jax.device_put(rng.standard_normal((1, n1, n2)).astype(np.float32))

    def step1(c):
        a, b = c
        yr, yi = fourstep._step1_twiddle(a, b, n1, n2, rad1, False,
                                         "stack6", 1.0, 0)
        return fence(yr, yr[0, :1, :1]), yi

    def step3(c):
        a, b = c
        yr, yi = fourstep._step3_transposed(a, b, n1, n2, rad2, False,
                                            "stack6", 0)
        # output is (1, n2, n1): square split, so feeding back typechecks
        return fence(yr, yr[0, :1, :1]), yi

    def full(c):
        a, b = c
        yr, yi = fourstep.fft_four_step_planar(
            a.reshape(1, N), b.reshape(1, N), precision="stack6")
        yr = yr.reshape(1, n1, n2)
        return fence(yr, yr[0, :1, :1]), yi.reshape(1, n1, n2)

    def xla(c):
        a, b = c
        y = jnp.fft.fft(jax.lax.complex(a, b).reshape(1, N))
        yr = jnp.real(y).reshape(1, n1, n2)
        return fence(yr, yr[0, :1, :1]), jnp.imag(y).reshape(1, n1, n2)

    # sub-0.3-ms bodies underspread the default 4/44 pair through tunnel
    # jitter (the CLAUDE.md k-pair trap — a first pass at 2^20 returned
    # 0.0-ms artifacts); stretch the loop difference for small N
    kw = {"k1": 8, "k2": 288} if N <= (1 << 21) else {}
    rows = []
    for name, body in (("step12", step1), ("step34", step3),
                       ("full", full), ("xla_fft", xla)):
        t = time_fn_looped(jax.jit(body), (xr, xi), **kw)
        rows.append({"step": "fourstep_passes", "case": name, "n": int(N),
                     "t_ms": round(t * 1e3, 4)})
        print(json.dumps(rows[-1]), flush=True)
    out = os.path.join(os.path.dirname(__file__), "fourstep_ab.jsonl")
    with open(out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
