"""Probe: slab-vs-x decomposition at 512^3 and 768^3 against the
MXU-slot model. The stacked radix core costs 1536 MAC-slots per complex
element per stage at every (64, rV) pick, so the 3-D MXU floor is
  n^3 * 1536 * 3 * 2 / 197e12 s
(256^3: 0.78 ms; 512^3: 6.3 ms; 768^3: 21.2 ms). One-pass HBM floor is
n^3*4*4/819e9 (read+write planar pairs). Which pass is off its floor at
the big shapes?

Appends JSONL rows to round4_hw.jsonl (step "bigshape").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
OUT = os.path.join(os.path.dirname(__file__), "round4_hw.jsonl")


def log(**kw):
    row = {"step": "bigshape", "t": time.strftime("%Y-%m-%dT%H:%M:%S"), **kw}
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from offt_tpu.kernels import pallas_fft as pf
    from offt_tpu.obs.profile import fence, time_fn_looped_stats

    for n, k2 in ((512, 44), (768, 24)):
        kr, ki = jax.random.split(jax.random.PRNGKey(0))
        re = jax.block_until_ready(
            jax.random.normal(kr, (n, n, n), jnp.float32))
        im = jax.block_until_ready(
            jax.random.normal(ki, (n, n, n), jnp.float32))

        def timed(name, fn, args):
            def body(c):
                yr, yi = fn(c[0], c[1])
                idx = (0,) * yr.ndim
                return fence(c[0], yr[idx]), c[1]

            st = time_fn_looped_stats(body, args, k2=k2, pairs=3)
            log(n=n, name=name, ms=round(st["median"] * 1e3, 3),
                pairs=[round(p * 1e3, 3) for p in st["pairs"]])

        timed("slab8", lambda r, i: pf.fft_slab_yz(r, i, precision="stack6",
                                                   zpad=8), (re, im))
        timed("pipe", lambda r, i: pf.fft3d_planar(r, i, precision="stack6"),
              (re, im))
        del re, im
        # x-pass input values are irrelevant: generate directly in the
        # padded shape (no pad pass, no doubled footprint at 768^3)
        rp = jax.block_until_ready(
            jax.random.normal(kr, (n, n, n + 8), jnp.float32))
        ip = jax.block_until_ready(
            jax.random.normal(ki, (n, n, n + 8), jnp.float32))
        timed("xpass", lambda r, i: pf.fft_x_from_padded(
            r, i, z_true=n, precision="stack6"), (rp, ip))
        del rp, ip


if __name__ == "__main__":
    main()
