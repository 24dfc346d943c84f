"""Round-4 second hardware queue (after the sublane-reshape fix and the
dimension_semantics declaration). Appends JSONL rows to round4_hw.jsonl.

Steps:
  dimsem    OFFT_DIMSEM=0 vs 1 A/B (parallel grid semantics) at 256^3 and
            512^3 c2c — all kernels write disjoint 1:1 blocks
  subfix    deep-axis sublane pass A/B vs the receipts taken BEFORE the
            materialized-reshape fix (same shapes, same methodology)
  inplace   re-run of the in-place receipt: 256^3 A/B should improve (its
            x stage was paying the reshape copy) and 1024^3 now compiles
            with zero HLO temp
  bench     headline 256^3 dry run (post-fix sanity for BENCH_r04)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
OUT = os.path.join(os.path.dirname(__file__), "round4_hw.jsonl")


def log(step, **kw):
    row = {"step": step, "t": time.strftime("%Y-%m-%dT%H:%M:%S"), **kw}
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def step_dimsem():
    """Same-session A/B of parallel grid semantics. Separate processes
    per flag: the env is read at trace time and executables cache."""
    script = r'''
import os, sys, json
sys.path.insert(0, "%s")
import numpy as np, jax, offt_tpu
from offt_tpu.obs.profile import time_fn_looped_stats
out = {}
for n in (256, 512):
    rng = np.random.default_rng(0)
    re = jax.device_put(rng.standard_normal((n,)*3).astype(np.float32))
    im = jax.device_put(rng.standard_normal((n,)*3).astype(np.float32))
    p = offt_tpu.plan((n,)*3, "complex64", planar=True, norm="ortho",
                      use_cache=False)
    st = time_fn_looped_stats(lambda c: tuple(p._fn(*c)), (re, im),
                              tries=2, pairs=3,
                              k2=44 if n == 256 else 12)
    out[n] = st
    del re, im
print("RESULT " + json.dumps({str(k): {"median": v["median"],
                                       "pairs": v["pairs"]}
                              for k, v in out.items()}))
''' % os.path.join(os.path.dirname(__file__), "..", "..")
    res = {}
    for flag in ("0", "1"):
        env = dict(os.environ, OFFT_DIMSEM=flag)
        rc = subprocess.run([sys.executable, "-c", script], env=env,
                            capture_output=True, text=True, timeout=1800)
        for ln in rc.stdout.splitlines():
            if ln.startswith("RESULT "):
                res[flag] = json.loads(ln[7:])
        if flag not in res:
            log("dimsem", flag=flag, error=rc.stderr.strip()[-300:])
    for n in ("256", "512"):
        if all(f in res and n in res[f] for f in "01"):
            off = res["0"][n]["median"]
            on = res["1"][n]["median"]
            log("dimsem", n=int(n), off_ms=round(off * 1e3, 3),
                on_ms=round(on * 1e3, 3), speedup=round(off / on, 3),
                off_pairs=[round(x * 1e3, 3) for x in res["0"][n]["pairs"]],
                on_pairs=[round(x * 1e3, 3) for x in res["1"][n]["pairs"]])


def step_subfix():
    import numpy as np
    import jax
    from offt_tpu.kernels import pallas_fft as pf
    from offt_tpu.obs.profile import time_fn_looped_stats

    for shape in [(512, 128, 256), (512, 256, 128), (256, 128, 128),
                  (256, 32, 512)]:
        rng = np.random.default_rng(1)
        xr = jax.device_put(rng.standard_normal(shape).astype(np.float32))
        xi = jax.device_put(rng.standard_normal(shape).astype(np.float32))
        sub = jax.jit(lambda c: pf.fft_sublane(c[0], c[1], 0))
        st = time_fn_looped_stats(sub, (xr, xi), tries=2, pairs=3)
        log("subfix", shape=list(shape),
            sublane_ms=round(st["median"] * 1e3, 3),
            pairs=[round(x * 1e3, 3) for x in st["pairs"]])


def step_inplace():
    rc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "run_inplace_receipt.py")],
        capture_output=True, text=True, timeout=3600)
    log("inplace", rc=rc.returncode, out=rc.stdout.strip().splitlines(),
        err=rc.stderr.strip().splitlines()[-5:] if rc.returncode else [])


def step_bench():
    import numpy as np
    import jax
    import offt_tpu
    from offt_tpu.obs.profile import time_fn_looped_stats

    n = 256
    rng = np.random.default_rng(0)
    re = jax.device_put(rng.standard_normal((n,) * 3).astype(np.float32))
    im = jax.device_put(rng.standard_normal((n,) * 3).astype(np.float32))
    p = offt_tpu.plan((n,) * 3, "complex64", planar=True, norm="ortho",
                      use_cache=True)
    st = time_fn_looped_stats(lambda c: tuple(p._fn(*c)), (re, im),
                              tries=2, pairs=4)
    flops = 5.0 * n ** 3 * np.log2(n ** 3)
    log("bench4b", n=n, median_ms=round(st["median"] * 1e3, 3),
        gflops=round(flops / st["median"] / 1e9, 1),
        pairs_ms=[round(x * 1e3, 3) for x in st["pairs"]])


STEPS = {"dimsem": step_dimsem, "subfix": step_subfix,
         "inplace": step_inplace, "bench": step_bench}


def main():
    names = sys.argv[1:] or ["dimsem", "subfix", "inplace", "bench"]
    for name in names:
        t0 = time.time()
        try:
            STEPS[name]()
        except Exception as e:  # noqa: BLE001
            log(name, fatal=repr(e)[:300])
        print(f"# step {name} took {time.time() - t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
