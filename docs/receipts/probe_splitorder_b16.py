"""Four-step split-order A/B, batched HBM-bound regime (the decisive one).

probe_splitorder.py measured single 1-D transforms (0.08-0.4 ms) with
the host-chained timer and got spreads up to 12x — below tunnel jitter,
unusable except for the thrice-reproduced 3*2^18 ordering. This probe
re-asks the question where the answer is physical: batch=16 rows
(each loop iteration ~1.5-3 ms, HBM-bound — the regime where the fused
four-step already showed its 1.90x, fourstep_ab.jsonl) timed INSIDE one
jit program via time_fn_looped_stats (lax.fori_loop differencing,
3 pairs, median + spread per split).

Decides kernels/fourstep.py:pick_split's ordering rule. Reference
analogue: setup_p1d's per-factorization choice (offt-compute.c:329-489).

Run on the real chip: python docs/receipts/probe_splitorder_b16.py
Appends JSONL rows to splitorder_b16.jsonl.
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)
OUT = os.path.join(HERE, "splitorder_b16.jsonl")

B = 16
CASES = {
    "2^20": 1 << 20,
    "3*2^18": 3 * (1 << 18),
    "2^19": 1 << 19,
    "5*2^17": 5 * (1 << 17),
}


def log(row):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def candidates(n):
    import numpy as np
    from offt_tpu.kernels import pallas_fft as pf

    pairs = []
    for d in range(2, int(np.sqrt(n)) + 1):
        if n % d:
            continue
        a, b = d, n // d
        for n1, n2 in ((a, b), (b, a)):
            if (pf.can_use_pallas(n1) and pf.can_use_pallas(n2)
                    and (n1, n2) not in pairs):
                pairs.append((n1, n2))
    pairs.sort(key=lambda p: (max(p) / min(p),
                              0 if p[1] % 128 == 0 else 1))
    return pairs[:5]


def main():
    import numpy as np
    import jax

    from offt_tpu.kernels.fourstep import pick_split
    from offt_tpu.obs.profile import time_fn_looped_stats
    from offt_tpu.plan.api import plan as build_plan
    from offt_tpu.plan.params import ProblemSpec, default_params

    rng = np.random.default_rng(0)
    for key, n in CASES.items():
        auto = pick_split(n)
        cands = candidates(n)
        if auto not in cands:
            cands.insert(0, auto)
        shape = (1, 1, n)
        spec = ProblemSpec(shape=shape, dtype="complex64")
        re = jax.device_put(
            rng.standard_normal((B, 1, 1, n)).astype(np.float32))
        im = jax.device_put(
            rng.standard_normal((B, 1, 1, n)).astype(np.float32))
        rows = []
        for sp in cands:
            p = default_params(spec).replace(split_1d=sp, use_pallas=1)
            try:
                pl = build_plan(shape, "complex64", params=p,
                                batch_dims=1, use_cache=False, planar=True)
                st = time_fn_looped_stats(lambda c: pl(c), (re, im),
                                          k1=4, k2=44, tries=2, pairs=3)
            except Exception as e:
                log({"key": key, "split": list(sp), "error": repr(e)[:160]})
                continue
            med, lo, hi = st["median"], st["min"], st["max"]
            rows.append((med, sp))
            log({"key": key, "n": n, "b": B, "split": list(sp),
                 "median_ms": med * 1e3, "min_ms": lo * 1e3,
                 "max_ms": hi * 1e3,
                 "spread": round((hi - lo) / max(med, 1e-12), 4),
                 "auto": sp == auto})
        if not rows:
            continue
        rows.sort()
        best_ms, best_sp = rows[0]
        auto_ms = next(m for m, sp in rows if sp == auto)
        log({"key": key, "n": n, "b": B, "verdict": True,
             "auto_split": list(auto), "auto_ms": auto_ms * 1e3,
             "best_split": list(best_sp), "best_ms": best_ms * 1e3,
             "auto_over_best": round(auto_ms / best_ms, 4),
             "t": time.strftime("%Y-%m-%dT%H:%M:%S")})
    print("SPLITORDER_B16 DONE", flush=True)


if __name__ == "__main__":
    main()
