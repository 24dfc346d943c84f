"""Round-4 hardware queue — run on the real chip the moment the tunnel
returns. Every step is independently try/except'd and appends one JSONL
row to docs/receipts/round4_hw.jsonl as it lands, so a mid-run tunnel
drop preserves partial receipts. Select steps by name:

    python docs/receipts/run_round4_hw.py            # all steps
    python docs/receipts/run_round4_hw.py bench inplace

Steps:
  probe     tiny device_put with a watchdog (fails fast if tunnel is dead)
  bench     headline 256^3 c2c loop-timed (the BENCH_r04 dry run)
  inplace   the queued r3 in-place receipt (aliased correctness, 256^3
            A/B, 1024^3 single-chip) — runs run_inplace_receipt.py
  paddedx   distributed-x-stage fix A/B: shard-shaped strided 1-D x
            transform, pitched-read route vs forced sublane pass
  presplit  stack6 operand-build A/B: 256^3 + 768^3 c2c with
            OFFT_STACK6_PRESPLIT=0 vs 1 (VERDICT r3 #4)
  tune      FAST_TUNING broadened defaults: tune + cache ~8 extra configs
            with fast_trial=2 (VERDICT r3 #8)
"""

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
OUT = os.path.join(os.path.dirname(__file__), "round4_hw.jsonl")


def log(step, **kw):
    row = {"step": step, "t": time.strftime("%Y-%m-%dT%H:%M:%S"), **kw}
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def probe(timeout_s=120.0):
    res = {}

    def go():
        try:
            import numpy as np
            import jax
            import jax.numpy as jnp
            x = jax.device_put(np.ones(8, np.float32))
            res["ok"] = float(jnp.sum(x)) == 8.0
        except Exception as e:  # noqa: BLE001
            res["err"] = repr(e)[:200]

    th = threading.Thread(target=go, daemon=True)
    th.start()
    th.join(timeout_s)
    ok = bool(res.get("ok"))
    log("probe", ok=ok, err=res.get("err"))
    return ok


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
    log("bench", n=n, median_ms=round(st["median"] * 1e3, 3),
        gflops=round(flops / st["median"] / 1e9, 1),
        pairs_ms=[round(x * 1e3, 3) for x in st["pairs"]])


def step_inplace():
    rc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "run_inplace_receipt.py")],
        capture_output=True, text=True, timeout=3600)
    log("inplace", rc=rc.returncode, out=rc.stdout.strip().splitlines(),
        err=rc.stderr.strip().splitlines()[-3:] if rc.returncode else [])


def step_paddedx():
    """A/B the new fft_1d_planar pitched-read route on a shard-shaped
    strided x transform (the distributed local x stage; 1x1-mesh
    methodology per the r3 FAST_TUNING receipt)."""
    import numpy as np
    import jax
    from offt_tpu.kernels import pallas_fft as pf
    from offt_tpu.obs.profile import time_fn_looped

    # per-shard shapes from 512^3 on (2,4)/(4,2) meshes and 256^3 on (2,2):
    for shape in [(512, 128, 256), (512, 256, 128), (256, 128, 128),
                  (256, 32, 512)]:
        n, ny, nz = shape
        stride_hit = (ny * nz * 4) % (1 << 16) == 0
        rng = np.random.default_rng(1)
        xr = jax.device_put(rng.standard_normal(shape).astype(np.float32))
        xi = jax.device_put(rng.standard_normal(shape).astype(np.float32))

        def routed(c):
            return pf.fft_1d_planar(c[0], c[1], axis=0)

        def sublane(c):
            return pf.fft_sublane(c[0], c[1], 0)

        try:
            t_new = time_fn_looped(jax.jit(routed), (xr, xi), k1=2, k2=12)
            t_old = time_fn_looped(jax.jit(sublane), (xr, xi), k1=2, k2=12)
            log("paddedx", shape=list(shape), stride_hit=stride_hit,
                routed_ms=round(t_new * 1e3, 3),
                sublane_ms=round(t_old * 1e3, 3),
                speedup=round(t_old / t_new, 3))
        except Exception as e:  # noqa: BLE001
            log("paddedx", shape=list(shape), error=repr(e)[:300])


def step_presplit():
    """OFFT_STACK6_PRESPLIT A/B at 256^3 and 768^3 (VERDICT r3 #4: close
    toward the 0.65 ms HBM floor or log the negative)."""
    import numpy as np
    import jax
    import offt_tpu
    from offt_tpu.obs.profile import time_fn_looped

    for n in (256, 768):
        times = {}
        for flag in ("0", "1"):
            os.environ["OFFT_STACK6_PRESPLIT"] = flag
            rng = np.random.default_rng(2)
            re = jax.device_put(
                rng.standard_normal((n,) * 3).astype(np.float32))
            im = jax.device_put(
                rng.standard_normal((n,) * 3).astype(np.float32))
            p = offt_tpu.plan((n,) * 3, "complex64", planar=True,
                              norm="ortho")
            try:
                k2 = 12 if n == 256 else 6
                times[flag] = time_fn_looped(
                    lambda c: tuple(p._fn(*c)), (re, im), k1=2, k2=k2)
            except Exception as e:  # noqa: BLE001
                log("presplit", n=n, flag=flag, error=repr(e)[:300])
            del re, im
        os.environ.pop("OFFT_STACK6_PRESPLIT", None)
        if len(times) == 2:
            log("presplit", n=n,
                default_ms=round(times["0"] * 1e3, 3),
                presplit_ms=round(times["1"] * 1e3, 3),
                speedup=round(times["0"] / times["1"], 3))


def step_tune():
    """Broaden the bundled tuned defaults with cheap FAST_TUNING runs
    (fast_trial=2), storing winners in the persistent plan cache."""
    from offt_tpu.tune import tune

    configs = [
        # (shape, kwargs) — non-cubic, batched, 2-D-ish, inverse, r2c
        ((256, 256, 512), {}),
        ((512, 256, 256), {}),
        ((320, 320, 320), {"inverse": True}),
        ((512, 512, 512), {"inverse": True}),
        ((256, 256, 256), {"real": True}),
        ((512, 512, 512), {"real": True, "inverse": True}),
        ((128, 512, 512), {}),
        ((64, 1024, 1024), {}),
    ]
    for shape, kw in configs:
        try:
            res = tune(shape, "complex64", max_trials=14, fast_trial=2,
                       save=True, **kw)
            log("tune", shape=list(shape), **{k: str(v) for k, v in kw.items()},
                best_ms=round(res.best_perf * 1e3, 3),
                default_ms=round(res.default_perf * 1e3, 3),
                speedup=round(res.speedup_vs_default, 3),
                best=str(res.best_params))
        except Exception as e:  # noqa: BLE001
            log("tune", shape=list(shape), error=repr(e)[:300])


STEPS = {"bench": step_bench, "inplace": step_inplace,
         "paddedx": step_paddedx, "presplit": step_presplit,
         "tune": step_tune}


def main():
    names = sys.argv[1:] or ["bench", "inplace", "paddedx", "presplit",
                             "tune"]
    if not probe():
        print("device unreachable; aborting", file=sys.stderr)
        return 1
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
