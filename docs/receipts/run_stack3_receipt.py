"""stack3-tier hardware receipt: 256^3 c2c fwd, stack6 vs stack3 vs
default on the real chip (loop-timed, same session), plus accuracy.

The stack3 MXU floor is half of stack6's (768 vs 1536 MAC-slots/elem/
stage -> 0.39 ms at 256^3); this receipt records how much of that
halving the pipeline realizes and pins the accuracy tier. Appends JSONL
rows to stack3_receipt.jsonl.
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)
OUT = os.path.join(HERE, "stack3_receipt.jsonl")


def main():
    import numpy as np
    import jax

    import offt_tpu
    from offt_tpu.obs.profile import time_fn_looped_stats

    n = 256
    shape = (n, n, n)
    flops = 5.0 * n ** 3 * np.log2(n ** 3)
    rng = np.random.default_rng(0)
    re = jax.device_put(rng.standard_normal(shape).astype(np.float32))
    im = jax.device_put(rng.standard_normal(shape).astype(np.float32))

    # small accuracy probe (single-mode cos input: analytically checkable
    # without a full readback — big-shape receipt methodology)
    small = (64, 64, 128)
    xs = rng.standard_normal(small).astype(np.float32)
    ys = rng.standard_normal(small).astype(np.float32)
    ref = np.fft.fftn(xs + 1j * ys)

    base = offt_tpu.plan(shape, "complex64", planar=True, norm="ortho",
                         use_cache=True)
    rows = []
    for prec in ("stack6", "stack3", "default"):
        pp = base.params.replace(precision=prec, use_pallas=1)
        p = offt_tpu.plan(shape, "complex64", planar=True, norm="ortho",
                          params=pp, use_cache=False)
        t0 = time.perf_counter()
        st = time_fn_looped_stats(lambda c: tuple(p._fn(*c)), (re, im),
                                  tries=2, pairs=4)
        wall = time.perf_counter() - t0
        from offt_tpu.plan.params import PlanParams
        ps = offt_tpu.plan(small, "complex64", planar=True,
                           params=PlanParams(use_pallas=1, precision=prec),
                           use_cache=False)
        yr, yi = ps((xs, ys))
        err = float(np.linalg.norm((np.asarray(yr) + 1j * np.asarray(yi))
                                   - ref) / np.linalg.norm(ref))
        row = {"step": "stack3_ab", "precision": prec, "n": n,
               "t_ms": round(st["median"] * 1e3, 4),
               "pairs_ms": [round(x * 1e3, 3) for x in st["pairs"]],
               "gflops": round(flops / st["median"] / 1e9, 1),
               "rel_err_64x64x128": err, "wall_s": round(wall, 1),
               "t": time.strftime("%Y-%m-%dT%H:%M:%S")}
        rows.append(row)
        with open(OUT, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
    s6 = next(r for r in rows if r["precision"] == "stack6")
    s3 = next(r for r in rows if r["precision"] == "stack3")
    summary = {"step": "stack3_summary",
               "speedup_vs_stack6": round(s6["t_ms"] / s3["t_ms"], 3),
               "t": time.strftime("%Y-%m-%dT%H:%M:%S")}
    with open(OUT, "a") as fh:
        fh.write(json.dumps(summary) + "\n")
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
