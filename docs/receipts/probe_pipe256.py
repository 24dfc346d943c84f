"""Probe: decompose the full 256^3 forward pipeline (measured ~1.02 ms)
against its stages measured in isolation. The padded-x pass alone reads
0.33-0.36 ms (round4_hw.jsonl step xchunk) — AT the one-pass HBM floor —
so the residual vs slab+x is elsewhere: the slab's zpad write, the
inter-kernel boundary, or the plan wrapper.

Steps (loop-timed, pairs=3):
  slab0    fft_slab_yz zpad=0
  slab8    fft_slab_yz zpad=8 (the layout the pipeline uses)
  xpass    fft_x_from_padded from (256,256,264)   [re-measure]
  pipe     fft3d_planar (the exact pipeline composition)
  plan     offt_tpu.plan()(x) (adds wrapper overhead if any)

Appends JSONL rows to round4_hw.jsonl (step "pipe256").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
OUT = os.path.join(os.path.dirname(__file__), "round4_hw.jsonl")


def log(**kw):
    row = {"step": "pipe256", "t": time.strftime("%Y-%m-%dT%H:%M:%S"), **kw}
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import offt_tpu
    from offt_tpu.kernels import pallas_fft as pf
    from offt_tpu.obs.profile import fence, time_fn_looped_stats

    n = 256
    key = jax.random.PRNGKey(0)
    kr, ki = jax.random.split(key)

    def make(shape):
        re = jax.random.normal(kr, shape, jnp.float32)
        im = jax.random.normal(ki, shape, jnp.float32)
        return jax.block_until_ready(re), jax.block_until_ready(im)

    def timed(name, fn, shape, **meta):
        re, im = make(shape)

        def body(c):
            yr, yi = fn(c[0], c[1])
            idx = (0,) * yr.ndim
            return fence(c[0], yr[idx]), c[1]

        st = time_fn_looped_stats(body, (re, im), pairs=3)
        log(name=name, ms=round(st["median"] * 1e3, 4),
            pairs=[round(p * 1e3, 4) for p in st["pairs"]], **meta)
        del re, im

    timed("slab0", lambda r, i: pf.fft_slab_yz(r, i, precision="stack6"),
          (n, n, n))
    timed("slab8", lambda r, i: pf.fft_slab_yz(r, i, precision="stack6",
                                               zpad=8), (n, n, n))
    timed("xpass", lambda r, i: pf.fft_x_from_padded(r, i, z_true=n,
                                                     precision="stack6"),
          (n, n, n + 8))
    timed("pipe", lambda r, i: pf.fft3d_planar(r, i, precision="stack6"),
          (n, n, n))
    p = offt_tpu.plan((n, n, n), "complex64", planar=True, use_cache=False)
    timed("plan", lambda r, i: p._fn(r, i), (n, n, n))


if __name__ == "__main__":
    main()
