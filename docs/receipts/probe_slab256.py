"""Probe: the (y,z) slab is the 256^3 hot spot (0.56-0.63 ms vs the
0.323 ms one-pass floor; the x pass is AT floor — round4_hw.jsonl step
pipe256). Questions:

  1. zpad write cost: zpad=8 adds +0.07 ms. Is that the 264-lane extent
     forcing partial-lane-tile writes (8x8 tail of an 8x128 tile, RMW)?
     zpad=128 (full 3-tile extent, writes cover exactly 2 full tiles)
     should recover it; the x pass reads zp=384 at the same speed as
     zp=264 (step xchunk: 0.333 vs 0.353).
  2. tb sensitivity at zpad=128.
  3. The composed pipe (1.10 ms) is 0.14 ms more than slab8+xpass in
     isolation (0.96). Does a manual jit(slab -> xpass) show the same
     gap (XLA inter-kernel glue), or is it fft3d_planar-specific?

Appends JSONL rows to round4_hw.jsonl (step "slab256").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
OUT = os.path.join(os.path.dirname(__file__), "round4_hw.jsonl")


def log(**kw):
    row = {"step": "slab256", "t": time.strftime("%Y-%m-%dT%H:%M:%S"), **kw}
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from offt_tpu.kernels import pallas_fft as pf
    from offt_tpu.obs.profile import fence, time_fn_looped_stats

    n = 256
    kr, ki = jax.random.split(jax.random.PRNGKey(0))
    re = jax.block_until_ready(jax.random.normal(kr, (n, n, n), jnp.float32))
    im = jax.block_until_ready(jax.random.normal(ki, (n, n, n), jnp.float32))

    def timed(name, fn, **meta):
        def body(c):
            yr, yi = fn(c[0], c[1])
            idx = (0,) * yr.ndim
            return fence(c[0], yr[idx]), c[1]

        st = time_fn_looped_stats(body, (re, im), pairs=3)
        log(name=name, ms=round(st["median"] * 1e3, 4),
            pairs=[round(p * 1e3, 4) for p in st["pairs"]], **meta)

    for zpad in (0, 8, 128):
        timed(f"slab_zp{zpad}",
              lambda r, i, z=zpad: pf.fft_slab_yz(r, i, precision="stack6",
                                                  zpad=z))
    for tb in (2, 8):
        timed(f"slab_zp128_tb{tb}",
              lambda r, i, t=tb: pf.fft_slab_yz(r, i, precision="stack6",
                                                zpad=128, block_rows=t))

    def comp8(r, i):
        r, i = pf.fft_slab_yz(r, i, precision="stack6", zpad=8)
        return pf.fft_x_from_padded(r, i, z_true=n, precision="stack6")

    def comp128(r, i):
        r, i = pf.fft_slab_yz(r, i, precision="stack6", zpad=128)
        return pf.fft_x_from_padded(r, i, z_true=n, precision="stack6")

    timed("comp_zp8", comp8)
    timed("comp_zp128", comp128)
    timed("pipe_ref", lambda r, i: pf.fft3d_planar(r, i, precision="stack6"))


if __name__ == "__main__":
    main()
