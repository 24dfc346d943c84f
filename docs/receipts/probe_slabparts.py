"""Probe: cost ledger of the (y,z) slab kernel's internal phases at
256^3 (tb=4, stack6, radix (64,4)). Variants of the slab kernel body:

  copy      blocks in -> out (the DMA floor for this block shape)
  tpose     transpose + transpose-back only (the z-stage's relayout tax)
  zonly     transpose, z-core, transpose-back (no y stage)
  yonly     per-row y-core loop only (no z stage)
  ybatch    y-core as ONE wide call: (tb,ny,nz) -> swap(0,1) -> lane-merge
            (ny, tb*nz) -> core -> split -> swap back. Tests whether one
            wide dot beats tb narrow dots despite two sublane shuffles.
  full      the production kernel body (reference)

Appends JSONL rows to round4_hw.jsonl (step "slabparts").
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
OUT = os.path.join(os.path.dirname(__file__), "round4_hw.jsonl")


def log(**kw):
    row = {"step": "slabparts",
           "t": time.strftime("%Y-%m-%dT%H:%M:%S"), **kw}
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
    tb = 4
    rad = (64, 4)
    stk = True
    cz = pf._core_tables(n, rad, False, stacked=stk)
    cy = pf._core_tables(n, rad, False, 1.0, stacked=stk)

    def body_of(mode):
        def kern(*refs):
            xr_ref, xi_ref = refs[0], refs[1]
            ncz = len(cz)
            czk = [r[:] for r in refs[2:2 + ncz]]
            cyk = [r[:] for r in refs[2 + ncz:-2]]
            or_ref, oi_ref = refs[-2], refs[-1]
            tbk, ny, nz = xr_ref.shape
            xr = xr_ref[:].reshape(tbk * ny, nz)
            xi = xi_ref[:].reshape(tbk * ny, nz)
            if mode == "copy":
                or_ref[:] = xr.reshape(tbk, ny, nz)
                oi_ref[:] = xi.reshape(tbk, ny, nz)
                return
            if mode == "tpose":
                zr, zi = xr.T, xi.T
                or_ref[:] = zr.T.reshape(tbk, ny, nz)
                oi_ref[:] = zi.T.reshape(tbk, ny, nz)
                return
            if mode in ("zonly", "full"):
                zr, zi = pf._core_apply(xr.T, xi.T, czk, rad, "stack6")
                zr = zr.T.reshape(tbk, ny, nz)
                zi = zi.T.reshape(tbk, ny, nz)
            else:
                zr = xr.reshape(tbk, ny, nz)
                zi = xi.reshape(tbk, ny, nz)
            if mode in ("zonly",):
                or_ref[:] = zr
                oi_ref[:] = zi
                return
            if mode == "ybatch":
                wr = zr.swapaxes(0, 1).reshape(ny, tbk * nz)
                wi = zi.swapaxes(0, 1).reshape(ny, tbk * nz)
                yr, yi = pf._core_apply(wr, wi, cyk, rad, "stack6")
                or_ref[:] = yr.reshape(ny, tbk, nz).swapaxes(0, 1)
                oi_ref[:] = yi.reshape(ny, tbk, nz).swapaxes(0, 1)
                return
            for t in range(tbk):
                yr, yi = pf._core_apply(zr[t], zi[t], cyk, rad, "stack6")
                or_ref[t] = yr
                oi_ref[t] = yi
        return kern

    consts = [jnp.asarray(v) for v in (*cz, *cy)]
    blk = pl.BlockSpec((tb, n, n), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    cspec = [pl.BlockSpec(c.shape, lambda i, c=c: (0,) * c.ndim,
                          memory_space=pltpu.VMEM) for c in consts]

    def make_call(mode):
        @jax.jit
        def run(xr, xi):
            return pl.pallas_call(
                body_of(mode),
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

    # correctness pin for ybatch (same math, new shuffles)
    x = np.asarray(re) + 1j * np.asarray(im)
    want = np.fft.fft(np.fft.fft(x, axis=2), axis=1)
    got = make_call("ybatch")(re, im)
    gotc = np.asarray(got[0]) + 1j * np.asarray(got[1])
    err = np.linalg.norm(gotc - want) / np.linalg.norm(want)
    log(name="ybatch_err", err=float(err))

    for mode in ("copy", "tpose", "zonly", "yonly", "ybatch", "full"):
        run = make_call(mode)

        def body(c, run=run):
            yr, yi = run(c[0], c[1])
            return fence(c[0], yr[0, 0, 0]), c[1]

        st = time_fn_looped_stats(body, (re, im), pairs=3)
        log(name=mode, ms=round(st["median"] * 1e3, 4),
            pairs=[round(p * 1e3, 4) for p in st["pairs"]])


if __name__ == "__main__":
    main()
