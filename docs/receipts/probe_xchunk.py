"""Probe: is the padded-x kernel's residual (0.62 ms vs the 0.32 ms
single-pass floor at 256^3) the x-CHUNK BASE stride conflict?

Background (DESIGN.md, stride-padded x path): _STRIDE_PAD=8 pushes the
LOGICAL plane stride from 2^18 to 2^13*33 B at 256^3. But if XLA
physically tiles the minor dim to 128-lane multiples, a 264-lane row is
stored as 384 physical lanes and the PHYSICAL plane stride is
256*384*4 = 3*2^17 — still 64KiB-divisible, i.e. all 256 x-chunk base
addresses a block gathers are congruent mod 2^16 (one bank column).
Padding the Y axis by one sublane tile (256 -> 264 rows) makes the
physical plane stride 264*384*4 = 99*2^12 regardless, at +3% footprint.

Steps (each loop-timed, time_fn_looped_stats pairs=3):
  base    x pass from (256, 256, 264)  — today's layout
  zpad128 x pass from (256, 256, 384)  — physically identical to base
          IF tiling pads 264->384; slower than base only if storage is
          dense (disambiguates the physical-layout question)
  ypad    x pass from (256, 264, 264), y_true=256 — chunk-base fix
  ypad_tz256  same + tz=256 (longer burst rows, re-tile A/B under the
          fixed chunk bases)
  outpad  base input, out_lanes=264 — pads the WRITE side's z only
          (write chunk bases unchanged; isolates read vs write gains)

Appends JSONL rows to round4_hw.jsonl (step "xchunk").
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
OUT = os.path.join(os.path.dirname(__file__), "round4_hw.jsonl")


def log(**kw):
    row = {"step": "xchunk", "t": time.strftime("%Y-%m-%dT%H:%M:%S"), **kw}
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from offt_tpu.kernels import pallas_fft as pf
    from offt_tpu.obs.profile import fence, time_fn_looped_stats

    n = 256
    key = jax.random.PRNGKey(0)

    def make(ny_pad, zp):
        kr, ki = jax.random.split(key)
        re = jax.random.normal(kr, (n, ny_pad, zp), jnp.float32)
        im = jax.random.normal(ki, (n, ny_pad, zp), jnp.float32)
        return jax.block_until_ready(re), jax.block_until_ready(im)

    def timed(name, ny_pad, zp, **kw):
        re, im = make(ny_pad, zp)
        run = functools.partial(pf.fft_x_from_padded, z_true=n,
                                precision="stack6", **kw)

        def body(c):
            yr, yi = run(c[0], c[1])
            return fence(c[0], yr[0, 0, 0]), c[1]

        st = time_fn_looped_stats(body, (re, im), pairs=3)
        log(name=name, ny_pad=ny_pad, zp=zp,
            ms=round(st["median"] * 1e3, 4),
            pairs=[round(p * 1e3, 4) for p in st["pairs"]], **{
                k: v for k, v in kw.items() if k != "radices"})
        del re, im
        return st["median"]

    timed("base", n, n + 8)
    timed("zpad128", n, n + 128)
    timed("ypad", n + 8, n + 8, y_true=n)
    timed("ypad_tz256", n + 8, n + 8, y_true=n, tz=256)
    # out_lanes must be a tz multiple; 384 pads the WRITE row stride to
    # 1536 B (the output's z_true=256 rows are 2^10 apart today — the
    # same row conflict the input-side zpad fixed)
    timed("outpad", n, n + 8, out_lanes=n + 128)
    timed("ypad_outpad", n + 8, n + 8, y_true=n, out_lanes=n + 128)


if __name__ == "__main__":
    main()
