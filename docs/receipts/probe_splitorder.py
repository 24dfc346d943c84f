"""Four-step split-order A/B: does n1 > n2 beat the auto picker's
n2 >= n1 preference?

The r5 saturation sweep's brute stage found split_1d=(1024, 768) running
1.83x faster than the auto pick (768, 1024) at N = 786432 = 3*2^18
(saturation.jsonl key 1d_np2) — but through heavy tunnel jitter
(default-draw spread 0.39). This probe re-measures split orders
INTERLEAVED in one session per length, median of 3 draws each, across
the length classes the picker serves:

    2^20        = 1024*1024  (symmetric control)
    3*2^18      = 768*1024 vs 1024*768
    2^19        = 512*1024 vs 1024*512 (vs balanced 724^2: not integer)
    5*2^17      = 640*1024 vs 1024*640
    2^15*48     = 12288*128-class small factor (256*6144 not expressible;
                  skip non-candidates automatically)

Run on the real chip: python docs/receipts/probe_splitorder.py
Appends one JSONL row per (n, split) to splitorder.jsonl plus a verdict
row per n. Reference analogue: setup_p1d's per-factorization plan choice
(offt-compute.c:329-489) — there FFTW wisdom picks; here we measure and
fold the answer into kernels/fourstep.py:pick_split.
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)
OUT = os.path.join(HERE, "splitorder.jsonl")

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
    """Every expressible ordered split, deduped: the auto pick, its swap,
    and the next-most-balanced alternative each way."""
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
    # keep it cheap: rank by balance (lane-128-mult tiebreak), keep 6
    pairs.sort(key=lambda p: (max(p) / min(p),
                              0 if p[1] % 128 == 0 else 1))
    return pairs[:6]


def main():
    from offt_tpu.plan.api import plan as build_plan
    from offt_tpu.plan.params import ProblemSpec, default_params
    from offt_tpu.tune.tuner import _default_timer

    timer = _default_timer()
    for key, n in CASES.items():
        from offt_tpu.kernels.fourstep import pick_split
        auto = pick_split(n)
        cands = candidates(n)
        if auto not in cands:
            cands.insert(0, auto)
        shape = (1, 1, n)
        spec = ProblemSpec(shape=shape, dtype="complex64")
        plans = {}
        for sp in cands:
            p = default_params(spec).replace(split_1d=sp, use_pallas=1)
            try:
                plans[sp] = build_plan(shape, "complex64", params=p,
                                       use_cache=False, planar=True)
            except Exception as e:
                log({"key": key, "split": list(sp),
                     "error": repr(e)[:160]})
        # interleave: 3 rounds over all candidates, median per candidate
        draws = {sp: [] for sp in plans}
        for sp, pl in plans.items():  # warm compile
            timer(pl)
        for _ in range(3):
            for sp, pl in plans.items():
                draws[sp].append(timer(pl))
        rows = []
        for sp, ds in draws.items():
            med = sorted(ds)[len(ds) // 2]
            spread = (max(ds) - min(ds)) / max(min(ds), 1e-12)
            rows.append((med, sp, spread))
            log({"key": key, "n": n, "split": list(sp),
                 "ms": [d * 1e3 for d in ds], "median_ms": med * 1e3,
                 "spread": round(spread, 4), "auto": sp == auto})
        rows.sort()
        best_ms, best_sp, _ = rows[0]
        auto_ms = next(m for m, sp, _ in rows if sp == auto)
        log({"key": key, "n": n, "verdict": True,
             "auto_split": list(auto), "auto_ms": auto_ms * 1e3,
             "best_split": list(best_sp), "best_ms": best_ms * 1e3,
             "auto_over_best": round(auto_ms / best_ms, 4),
             "t": time.strftime("%Y-%m-%dT%H:%M:%S")})
    print("SPLITORDER DONE", flush=True)


if __name__ == "__main__":
    main()
