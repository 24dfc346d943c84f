"""Probe: widen the r2c slab's y-stage at 512^3. The y stage runs
per-row at L=m=256 lanes — below the MXU's ~512-lane efficiency knee
(step mxuwidth: 134 TFLOP/s at 256 vs 172 at 512) and measured 1.27 ms
vs its 1.05 ms slot floor (step rslab512). Variant: lane-concat the tb
rows into ONE (ny, tb*m) core call, slice back per row on write.
(The c2c slab's y stage already runs at L=nz >= 512 at the shapes where
this matters — the concat trick is r2c/c2r-slab-specific.)

Appends JSONL rows to round4_hw.jsonl (step "ryconcat").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
OUT = os.path.join(os.path.dirname(__file__), "round4_hw.jsonl")


def log(**kw):
    row = {"step": "ryconcat", "t": time.strftime("%Y-%m-%dT%H:%M:%S"), **kw}
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

    def body_of(mode):
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
            vfr, vfi = pf._core_apply(vrt, vit, cmk, rm, "stack6")
            urr, uri = pf._core_apply(vrt, -vit, cmk, rm, "stack6")
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
            if mode == "yconcat":
                wr2 = jnp.concatenate([zr[t] for t in range(tbk)], axis=-1)
                wi2 = jnp.concatenate([zi[t] for t in range(tbk)], axis=-1)
                yr, yi = pf._core_apply(wr2, wi2, cyk, ry, "stack6")
                for t in range(tbk):
                    or_ref[t] = yr[:, t * m:(t + 1) * m]
                    oi_ref[t] = yi[:, t * m:(t + 1) * m]
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
                body_of(mode),
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

    # correctness vs numpy: fused r2c(z)+fft(y) = rfft along z (packed)
    # then fft along y. Compare packed interior bins only (k=1..m-1).
    got = make_call("yconcat")(x)
    gr = np.asarray(got[0])[..., 1:]
    gi = np.asarray(got[1])[..., 1:]
    xn = np.asarray(x)
    want = np.fft.fft(np.fft.rfft(xn, axis=2), axis=1)[..., 1:m]
    err = (np.linalg.norm((gr + 1j * gi) - want)
           / np.linalg.norm(want))
    log(name="yconcat_err", err=float(err), tb=tb)

    for mode in ("full", "yconcat", "full", "yconcat"):
        run = make_call(mode)

        def body(c, run=run):
            yr, yi = run(c)
            return fence(c, yr[0, 0, 0])

        st = time_fn_looped_stats(body, x, pairs=3)
        log(name=mode, ms=round(st["median"] * 1e3, 3),
            pairs=[round(p * 1e3, 3) for p in st["pairs"]])


if __name__ == "__main__":
    main()
