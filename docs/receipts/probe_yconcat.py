"""Probe: widen the slab's y-stage dots. The MXU sustains ~134 TFLOP/s
at L=256 lanes vs ~170 at L>=512 (round4_hw.jsonl step mxuwidth), and
the slab's y stage runs per-x-row at L=nz=256. Variant: lane-concat the
tb rows into ONE (ny, tb*nz) core call (legal: 128-mult chunks), slice
the result back per row on write. vs the production per-row loop.

Appends JSONL rows to round4_hw.jsonl (step "yconcat").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
OUT = os.path.join(os.path.dirname(__file__), "round4_hw.jsonl")


def log(**kw):
    row = {"step": "yconcat", "t": time.strftime("%Y-%m-%dT%H:%M:%S"), **kw}
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

    n = 256
    rad = (64, 4)
    cz = pf._core_tables(n, rad, False, stacked=True)
    cy = pf._core_tables(n, rad, False, 1.0, stacked=True)

    def body_of(mode, tb):
        def kern(*refs):
            xr_ref, xi_ref = refs[0], refs[1]
            ncz = len(cz)
            czk = [r[:] for r in refs[2:2 + ncz]]
            cyk = [r[:] for r in refs[2 + ncz:-2]]
            or_ref, oi_ref = refs[-2], refs[-1]
            tbk, ny, nz = xr_ref.shape
            xr = xr_ref[:].reshape(tbk * ny, nz)
            xi = xi_ref[:].reshape(tbk * ny, nz)
            zr, zi = pf._core_apply(xr.T, xi.T, czk, rad, "stack6")
            zr = zr.T.reshape(tbk, ny, nz)
            zi = zi.T.reshape(tbk, ny, nz)
            if mode == "yconcat":
                wr = jnp.concatenate([zr[t] for t in range(tbk)], axis=-1)
                wi = jnp.concatenate([zi[t] for t in range(tbk)], axis=-1)
                yr, yi = pf._core_apply(wr, wi, cyk, rad, "stack6")
                for t in range(tbk):
                    or_ref[t] = yr[:, t * nz:(t + 1) * nz]
                    oi_ref[t] = yi[:, t * nz:(t + 1) * nz]
                return
            for t in range(tbk):
                yr, yi = pf._core_apply(zr[t], zi[t], cyk, rad, "stack6")
                or_ref[t] = yr
                oi_ref[t] = yi
        return kern

    consts = [jnp.asarray(v) for v in (*cz, *cy)]

    def make_call(mode, tb):
        blk = pl.BlockSpec((tb, n, n), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        cspec = [pl.BlockSpec(c.shape, lambda i, c=c: (0,) * c.ndim,
                              memory_space=pltpu.VMEM) for c in consts]

        @jax.jit
        def run(xr, xi):
            return pl.pallas_call(
                body_of(mode, tb),
                grid=(n // tb,),
                in_specs=[blk, blk] + cspec,
                out_specs=(blk, blk),
                out_shape=(jax.ShapeDtypeStruct((n, n, n), jnp.float32),
                           jax.ShapeDtypeStruct((n, n, n), jnp.float32)),
                **pf._vmem_params(pf._SLAB_VMEM_PLANES * tb * n * n * 4
                                  + sum(c.nbytes for c in consts),
                                  grid_dims=1),
            )(xr, xi, *consts)
        return run

    kr, ki = jax.random.split(jax.random.PRNGKey(0))
    re = jax.block_until_ready(jax.random.normal(kr, (n, n, n), jnp.float32))
    im = jax.block_until_ready(jax.random.normal(ki, (n, n, n), jnp.float32))

    x = np.asarray(re) + 1j * np.asarray(im)
    want = np.fft.fft(np.fft.fft(x, axis=2), axis=1)
    got = make_call("yconcat", 4)(re, im)
    gotc = np.asarray(got[0]) + 1j * np.asarray(got[1])
    err = np.linalg.norm(gotc - want) / np.linalg.norm(want)
    log(name="yconcat_err", err=float(err))

    for mode, tb in (("full", 4), ("yconcat", 4), ("yconcat", 8),
                     ("full", 4), ("yconcat", 4)):
        run = make_call(mode, tb)

        def body(c, run=run):
            yr, yi = run(c[0], c[1])
            return fence(c[0], yr[0, 0, 0]), c[1]

        st = time_fn_looped_stats(body, (re, im), pairs=3)
        log(name=mode, tb=tb, ms=round(st["median"] * 1e3, 4),
            pairs=[round(p * 1e3, 4) for p in st["pairs"]])


if __name__ == "__main__":
    main()
