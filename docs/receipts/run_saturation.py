"""Tuning-target saturation receipts (VERDICT r4 weak #2 / next #8).

BASELINE.md row "autotuned >= 20% over default" needs, per shape, either
a WIN receipt (some searched point beats the default heuristic by >=20%)
or a SATURATION proof: independent strategies (NM and random-N; plus an
expert brute-subset over the radix/block corner the heuristic actually
decides) all landing within the measured session jitter of the default —
i.e. the default IS the optimum of the space, formally re-scoping the
target for that shape class (the reference's own success criterion is
default-beating on MPI clusters where the default is a bad guess;
params_set_default offt-compute.c:3127-3225 vs our production-informed
picks).

Per shape this emits one JSONL row:
  {shape, default_ms[2 draws], nm_best, nm_trials, rand_best, brute_best,
   brute_points, spread, speedup, verdict: "win"|"saturated"|"headroom"}

verdict rules: speedup >= 1.2 -> win; best within (1 + spread) of
default -> saturated; else headroom (real but < 20%).

Shapes: the chip-swept cubics (256^3 saturated in r4, 320^3 the best
known 12%) plus the NEW round-5 classes where the space has fresh knobs:
long 1-D (split_1d x block) and a non-cubic slab.

Run on the real chip: python docs/receipts/run_saturation.py
[--only 256 | 1d20 | ...]. Appends to saturation.jsonl; resumable (skips
shapes already receipted unless --redo).
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)
OUT = os.path.join(HERE, "saturation.jsonl")

SHAPES = {
    "256": ((256, 256, 256), 30, 24),
    "320": ((320, 320, 320), 30, 24),
    "1d20": ((1, 1, 1 << 20), 30, 24),
    "1d_np2": ((1, 1, 3 * (1 << 18)), 24, 16),   # 786432: mixed radices
    "slab": ((64, 1024, 1024), 24, 16),
}


def log(row):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def done_keys():
    keys = set()
    if os.path.exists(OUT):
        with open(OUT) as fh:
            for ln in fh:
                try:
                    row = json.loads(ln)
                except ValueError:
                    continue
                if "verdict" in row:
                    keys.add(row.get("key"))
    return keys


def expert_points(shape):
    """Brute-subset: the corner of the space the default heuristic
    actually decides — radix alternates x block sizes (and split_1d for
    degenerate 1-D shapes), everything else at the default."""
    from offt_tpu.plan.params import PlanParams, ProblemSpec, \
        default_params, infeasible_reason
    from offt_tpu.tune.space import build_space

    spec = ProblemSpec(shape=tuple(shape), dtype="complex64")
    space = build_space(spec, include_pallas=True)
    dflt = default_params(spec)
    by_name = {d.name: d.values for d in space.dims}
    pts = []
    for rz in by_name.get("radix_z", (None,))[:6]:
        for blk in (0, 256, 512):
            for s1d in by_name.get("split_1d", (None,))[:4]:
                p = PlanParams(**{**dflt.__dict__, "radix_z": rz,
                                  "block_batch": blk, "split_1d": s1d,
                                  "use_pallas": 1})
                if infeasible_reason(spec, p) is None and p not in pts:
                    pts.append(p)
    return pts[:18]


def run_shape(key, shape, nm_trials, rand_trials):
    import offt_tpu
    from offt_tpu.tune.tuner import tune, _default_timer
    from offt_tpu.plan.api import plan as build_plan
    from offt_tpu.plan.params import ProblemSpec, default_params

    t0 = time.time()
    timer = _default_timer()

    # --- two independent default draws (jitter band) -------------------
    spec = ProblemSpec(shape=tuple(shape), dtype="complex64")
    dflt = default_params(spec)
    dpl = build_plan(shape, "complex64", params=dflt, use_cache=False,
                     planar=True)
    d1 = timer(dpl)
    d2 = timer(dpl)
    spread = abs(d1 - d2) / max(min(d1, d2), 1e-12)
    log({"key": key, "stage": "default", "ms": [d1 * 1e3, d2 * 1e3],
         "spread": spread, "t": time.strftime("%Y-%m-%dT%H:%M:%S")})

    # --- NM and random searches ----------------------------------------
    res_nm = tune(shape, strategy="nm", max_trials=nm_trials, save=False,
                  log_path=os.path.join(HERE, f"sat_{key}_nm.jsonl"))
    log({"key": key, "stage": "nm", "best_ms": res_nm.best_perf * 1e3,
         "default_ms": res_nm.default_perf * 1e3,
         "trials": len(res_nm.trials),
         "best": res_nm.best_params.__dict__ and str(res_nm.best_params)})
    res_rd = tune(shape, strategy="random", max_trials=rand_trials,
                  save=False, seed=5,
                  log_path=os.path.join(HERE, f"sat_{key}_rand.jsonl"))
    log({"key": key, "stage": "random", "best_ms": res_rd.best_perf * 1e3,
         "trials": len(res_rd.trials)})

    # --- expert brute-subset -------------------------------------------
    brute_best, brute_pt, brute_n = float("inf"), None, 0
    for p in expert_points(shape):
        try:
            pl = build_plan(shape, "complex64", params=p, use_cache=False,
                            planar=True)
            ms = timer(pl)
        except Exception as e:
            log({"key": key, "stage": "brute_err", "params": str(p),
                 "error": repr(e)[:200]})
            continue
        brute_n += 1
        if ms < brute_best:
            brute_best, brute_pt = ms, p
        log({"key": key, "stage": "brute", "ms": ms * 1e3,
             "radix_z": p.radix_z, "block": p.block_batch,
             "split_1d": p.split_1d})

    default_ms = min(d1, d2, res_nm.default_perf)
    best_ms = min(res_nm.best_perf, res_rd.best_perf, brute_best)
    speedup = default_ms / best_ms if best_ms > 0 else 0.0
    # jitter floor: chip sessions show up to ~10%; never call a win or
    # saturation inside the measured band + 3% floor
    band = max(spread, 0.03)
    if speedup >= 1.2:
        verdict = "win"
    elif speedup <= 1.0 + band:
        verdict = "saturated"
    else:
        verdict = "headroom"
    log({"key": key, "shape": list(shape), "verdict": verdict,
         "speedup": round(speedup, 4), "default_ms": default_ms * 1e3,
         "best_ms": best_ms * 1e3, "spread": round(spread, 4),
         "nm_best_ms": res_nm.best_perf * 1e3,
         "rand_best_ms": res_rd.best_perf * 1e3,
         "brute_best_ms": (brute_best * 1e3 if brute_n else None),
         "brute_points": brute_n,
         "wall_s": round(time.time() - t0, 1),
         "t": time.strftime("%Y-%m-%dT%H:%M:%S")})


def _best_point_of(key):
    """Recover the winning PlanParams for a receipted shape from the
    sweep's own logs (nm/random tune_done rows or the brute rows)."""
    from offt_tpu.plan.cache import _params_from_json
    from offt_tpu.plan.params import PlanParams, ProblemSpec, default_params

    verdict = None
    brute = []
    with open(OUT) as fh:
        for ln in fh:
            try:
                row = json.loads(ln)
            except ValueError:
                continue
            if row.get("key") != key:
                continue
            if row.get("stage") == "brute":
                brute.append(row)
            if "verdict" in row and "confirmed" not in row:
                verdict = row
    if verdict is None:
        return None, None, None
    shape = tuple(verdict["shape"])
    cands = {"nm": verdict.get("nm_best_ms"),
             "rand": verdict.get("rand_best_ms"),
             "brute": verdict.get("brute_best_ms")}
    src = min((k for k in cands if cands[k] is not None), key=lambda k: cands[k])
    if src == "brute":
        b = min(brute, key=lambda r: r["ms"])
        spec = ProblemSpec(shape=shape, dtype="complex64")
        p = default_params(spec).replace(
            radix_z=tuple(b["radix_z"]) if b.get("radix_z") else None,
            block_batch=b.get("block", 0) or 0,
            split_1d=tuple(b["split_1d"]) if b.get("split_1d") else None,
            use_pallas=1)
        return shape, p, verdict
    # nm/random: last tune_done row of the per-strategy event log
    path = os.path.join(HERE, f"sat_{key}_{src}.jsonl")
    best = None
    with open(path) as fh:
        for ln in fh:
            try:
                row = json.loads(ln)
            except ValueError:
                continue
            if row.get("kind") == "tune_done" and row.get("best"):
                best = row["best"]
    return shape, (_params_from_json(best) if best else None), verdict


def confirm(keys=None):
    """Re-measure each receipted shape's claimed best against the default
    INTERLEAVED in one session (d,b,d,b,d,b; median each) — kills the
    min-over-draws jitter bias a 50-draw sweep bakes into its raw
    verdict (the 0.295 ms artifact class, VERDICT r4 weak #1)."""
    from offt_tpu.plan.api import plan as build_plan
    from offt_tpu.plan.params import ProblemSpec, default_params
    from offt_tpu.tune.tuner import _default_timer

    timer = _default_timer()
    for key in (keys or done_keys()):
        shape, best_p, verdict = _best_point_of(key)
        if shape is None or best_p is None:
            print(f"# {key}: no recoverable best point", flush=True)
            continue
        spec = ProblemSpec(shape=shape, dtype="complex64")
        if best_p == default_params(spec):
            # the sweep never beat the heuristic point — timing the same
            # plan twice only measures jitter (the r5 1d20 "1.27x win"
            # artifact); the verdict is saturated by construction
            log({"key": key, "shape": list(shape), "stage": "confirmed",
                 "verdict": "saturated", "confirmed": True, "speedup": 1.0,
                 "best_params": str(best_p),
                 "note": "best point == default point; skipped re-timing",
                 "raw_verdict": verdict.get("verdict"),
                 "t": time.strftime("%Y-%m-%dT%H:%M:%S")})
            continue
        dpl = build_plan(shape, "complex64", params=default_params(spec),
                         use_cache=False, planar=True)
        bpl = build_plan(shape, "complex64", params=best_p,
                         use_cache=False, planar=True)
        ds, bs = [], []
        for _ in range(3):
            ds.append(timer(dpl))
            bs.append(timer(bpl))
        dm = sorted(ds)[1]
        bm = sorted(bs)[1]
        speedup = dm / bm if bm > 0 else 0.0
        spread = (max(ds) - min(ds)) / max(min(ds), 1e-12)
        band = max(spread, 0.03)
        if speedup >= 1.2:
            v = "win"
        elif speedup <= 1.0 + band:
            v = "saturated"
        else:
            v = "headroom"
        log({"key": key, "shape": list(shape), "stage": "confirmed",
             "verdict": v, "confirmed": True, "speedup": round(speedup, 4),
             "default_ms_draws": [d * 1e3 for d in ds],
             "best_ms_draws": [b * 1e3 for b in bs],
             "default_ms": dm * 1e3, "best_ms": bm * 1e3,
             "best_params": str(best_p), "spread": round(spread, 4),
             "raw_verdict": verdict.get("verdict"),
             "t": time.strftime("%Y-%m-%dT%H:%M:%S")})
    print("CONFIRM DONE", flush=True)


def main():
    argv = sys.argv[1:]
    only = set(argv[argv.index("--only") + 1].split(",")) \
        if "--only" in argv else None
    if "--confirm" in argv:
        confirm(sorted(only) if only else None)
        return
    redo = "--redo" in argv
    skip = set() if redo else done_keys()
    for key, (shape, nm_n, rd_n) in SHAPES.items():
        if only and key not in only:
            continue
        if key in skip:
            print(f"# {key}: already receipted, skipping", flush=True)
            continue
        run_shape(key, shape, nm_n, rd_n)
    print("SATURATION DONE", flush=True)


if __name__ == "__main__":
    main()
