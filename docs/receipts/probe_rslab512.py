"""Probe: phase ledger of the fused r2c(z)+fft(y) slab at 512^3
(m=256 dual-untangle path). MXU-slot floors: z transform 1.05 ms, dual
second transform +1.05, y stage 1.05, slab HBM ~1.33 -> slab floor
~3.15 ms; x pass floor ~1.33. Ledger r2c 512^3 packed = 7.05 ms total,
i.e. ~64% of the 4.5 ms sum — WORSE than c2c's 75-83%. Which phase?

Kernel-body variants (cost probes; nodual/noy/nount are numerically
wrong on purpose):
  full     production body (2 m-transforms + VPU untangle + per-row y)
  nodual   second m-transform skipped (urr := vfr)
  nount    untangle skipped too (straight V -> y)
  noy      y stage skipped (untangled spectrum written directly)
  copy     even/odd split + transposes only (DMA + relayout floor)

Also times rfft_slab_yz / fft_x_from_padded(m) / rfft3d_planar packed
for the composition view.

Appends JSONL rows to round4_hw.jsonl (step "rslab512").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
OUT = os.path.join(os.path.dirname(__file__), "round4_hw.jsonl")


def log(**kw):
    row = {"step": "rslab512", "t": time.strftime("%Y-%m-%dT%H:%M:%S"), **kw}
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from offt_tpu.kernels import pallas_fft as pf
    from offt_tpu.obs.profile import fence, time_fn_looped_stats

    n = 512
    ny = n
    m = n // 2
    rm = pf._pick_2stage(m, None, stacked=True)
    ry = pf._pick_2stage(ny, None, stacked=True)
    cm = pf._core_tables(m, rm, False, stacked=True)
    cy = pf._core_tables(ny, ry, False, stacked=True)
    wr_, wi_ = pf._rfft_tables(n)

    def body_of(mode, tb):
        ncm = len(cm)

        def kern(*refs):
            x_ref = refs[0]
            cmk = [r[:] for r in refs[1:1 + ncm]]
            wr = refs[1 + ncm]
            wi = refs[2 + ncm]
            cyk = [r[:] for r in refs[3 + ncm:-2]]
            or_ref, oi_ref = refs[-2], refs[-1]
            tbk = x_ref.shape[0]
            flat = x_ref[:].reshape(tbk * ny, n)
            xt = flat.T
            v3 = xt.reshape(m, 2, tbk * ny)
            vrt = v3[:, 0, :]
            vit = v3[:, 1, :]
            if mode == "copy":
                or_ref[:] = vrt.T.reshape(tbk, ny, m)
                oi_ref[:] = vit.T.reshape(tbk, ny, m)
                return
            vfr, vfi = pf._core_apply(vrt, vit, cmk, rm, "stack6")
            if mode in ("full", "noy"):
                urr, uri = pf._core_apply(vrt, -vit, cmk, rm, "stack6")
            elif mode == "nodual":
                urr, uri = vfr, vfi
            if mode == "nount":
                xs_r, xs_i = vfr, vfi
            else:
                xer = 0.5 * (vfr + urr)
                xei = 0.5 * (vfi + uri)
                xor_ = 0.5 * (vfi - uri)
                xoi = -0.5 * (vfr - urr)
                xr = xer + wr[:] * xor_ - wi[:] * xoi
                xi = xei + wr[:] * xoi + wi[:] * xor_
                row0_re = xer[:1] + xor_[:1]
                row0_im = xer[:1] - xor_[:1]
                xs_r = jnp.concatenate([row0_re, xr[1:]], axis=0)
                xs_i = jnp.concatenate([row0_im, xi[1:]], axis=0)
            zr = xs_r.T.reshape(tbk, ny, m)
            zi = xs_i.T.reshape(tbk, ny, m)
            if mode == "noy":
                or_ref[:] = zr
                oi_ref[:] = zi
                return
            for t in range(tbk):
                yr, yi = pf._core_apply(zr[t], zi[t], cyk, ry, "stack6")
                or_ref[t] = yr
                oi_ref[t] = yi
        return kern

    consts = [jnp.asarray(v) for v in (*cm, wr_, wi_, *cy)]
    tb = pf._pick_slab_rows(0, ny * m, n)

    def make_call(mode):
        in_blk = pl.BlockSpec((tb, ny, n), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        out_blk = pl.BlockSpec((tb, ny, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        cspec = [pl.BlockSpec(c.shape, lambda i, c=c: (0,) * c.ndim,
                              memory_space=pltpu.VMEM) for c in consts]

        @jax.jit
        def run(x):
            return pl.pallas_call(
                body_of(mode, tb),
                grid=(n // tb,),
                in_specs=[in_blk] + cspec,
                out_specs=(out_blk, out_blk),
                out_shape=(jax.ShapeDtypeStruct((n, ny, m), jnp.float32),
                           jax.ShapeDtypeStruct((n, ny, m), jnp.float32)),
                **pf._vmem_params(pf._SLAB_VMEM_PLANES * tb * ny * m * 4
                                  + sum(c.nbytes for c in consts),
                                  grid_dims=1),
            )(x, *consts)
        return run

    x = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (n, ny, n), jnp.float32))

    log(name="meta", tb=tb, rm=list(rm), ry=list(ry))
    for mode in ("copy", "nount", "nodual", "noy", "full"):
        run = make_call(mode)

        def body(c, run=run):
            yr, yi = run(c)
            return fence(c, yr[0, 0, 0])

        st = time_fn_looped_stats(body, x, pairs=3)
        log(name=mode, ms=round(st["median"] * 1e3, 3),
            pairs=[round(p * 1e3, 3) for p in st["pairs"]])

    # production composition
    def bslab(c):
        yr, yi = pf.rfft_slab_yz(c, precision="stack6", zpad=8)
        return fence(c, yr[0, 0, 0])

    st = time_fn_looped_stats(bslab, x, pairs=3)
    log(name="rfft_slab_prod", ms=round(st["median"] * 1e3, 3),
        pairs=[round(p * 1e3, 3) for p in st["pairs"]])

    def bfull(c):
        yr, yi = pf.rfft3d_planar(c, precision="stack6", packed=True)
        return fence(c, yr[0, 0, 0])

    st = time_fn_looped_stats(bfull, x, pairs=3)
    log(name="rfft3d_packed", ms=round(st["median"] * 1e3, 3),
        pairs=[round(p * 1e3, 3) for p in st["pairs"]])


if __name__ == "__main__":
    main()
