"""Probe: empirical MXU throughput of the stack6 stacked-dot construct
(the inner loop of every kernel) on VMEM-resident data, as a function of
lane width L, plus the concat-vs-six-separate-dots A/B.

Construct: per iteration, 3-word-split a (128, L) f32 operand, build the
6-stack (concat) or issue 6 depth-128 dots + f32 adds (six), dot with a
(128, 768) bf16 table. Serial dependency between iterations (the timing
chain), R iterations inside one kernel via lax.fori_loop.

Informs the MXU-slot cost model: slots/elem/stage = 128*768/r1 = 1536 at
every (64, rV) radix pick, so the 3-D stack6 MXU floor is
n^3*1536*3*2/peak.

Appends JSONL rows to round4_hw.jsonl (step "mxuwidth").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
OUT = os.path.join(os.path.dirname(__file__), "round4_hw.jsonl")


def log(**kw):
    row = {"step": "mxuwidth", "t": time.strftime("%Y-%m-%dT%H:%M:%S"), **kw}
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl

    from offt_tpu.obs.profile import fence, time_fn_looped_stats

    def split3(x):
        x0 = x.astype(jnp.bfloat16)
        r = x - x0.astype(jnp.float32)
        x1 = r.astype(jnp.bfloat16)
        x2 = (r - x1.astype(jnp.float32)).astype(jnp.bfloat16)
        return x0, x1, x2

    def mk(mode, R):
        def kern(g_ref, x_ref, o_ref):
            gcat = g_ref[:]
            gs = [gcat[:, k * 128:(k + 1) * 128] for k in range(6)]

            def step(i, acc):
                x0, x1, x2 = split3(acc)
                if mode == "concat":
                    xc = jnp.concatenate([x0, x1, x2, x0, x1, x0], axis=0)
                    y = jnp.dot(gcat, xc,
                                preferred_element_type=jnp.float32)
                else:
                    ps = [jnp.dot(gs[k], w,
                                  preferred_element_type=jnp.float32)
                          for k, w in enumerate((x0, x1, x2, x0, x1, x0))]
                    y = ps[0] + ps[1] + ps[2] + ps[3] + ps[4] + ps[5]
                return y + acc * 0.25

            o_ref[:] = lax.fori_loop(0, R, step, x_ref[:])
        return kern

    g = jnp.asarray((np.random.randn(128, 768) * 2e-3)
                    .astype(np.float32)).astype(jnp.bfloat16)
    cases = [("concat", 1024, 512), ("six", 1024, 512),
             ("concat", 512, 1024), ("concat", 256, 2048),
             ("concat", 128, 4096)]
    for mode, L, R in cases:
        x = jnp.asarray(np.random.randn(128, L).astype(np.float32))
        macs = R * 128 * 768 * L

        @jax.jit
        def run(x, m=mode, R=R):
            return pl.pallas_call(
                mk(m, R),
                out_shape=jax.ShapeDtypeStruct((128, L), jnp.float32))(g, x)

        def body(c, run=run):
            y = run(c)
            return fence(c, y[0, 0])

        st = time_fn_looped_stats(body, x, pairs=3)
        log(mode=mode, L=L, us_per_call=round(st["median"] * 1e6, 1),
            tflops=round(2 * macs / st["median"] / 1e12, 1),
            pairs_us=[round(p * 1e6, 1) for p in st["pairs"]])


if __name__ == "__main__":
    main()
