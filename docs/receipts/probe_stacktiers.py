"""Stacked-precision tier ladder probe (VERDICT r4 weak #3 / next #4).

Question: is there a 4- or 5-product stacked bf16 scheme between stack3
(3 products, ~6e-6) and stack6 (6 products, ~2e-7) that lands UNDER the
fp32 accuracy bar (1e-6) at less MXU cost than stack6?

Method: emulate the MXU's exact arithmetic in numpy — bf16 operand
rounding (ml_dtypes), exact bf16 x bf16 products, f32 accumulation —
on a folded-DFT-like matrix (entries cos in [-1, 1]) times Gaussian
data, at the two contraction depths our radix dots actually use
(2*r1 = 128 and 12*r1 = 768 at the production (64, rV) pick). This is
bit-faithful to the kernel path: _stack_np splits the PRECOMPUTED f64
tables, _split*_cat splits the runtime data, and the TPU MXU multiplies
bf16 exactly into f32 accumulators, which numpy reproduces.

Schemes (word-index products G_i x_j retained):
  stack3  (2-word)        00 01 10           — shipped, ~6e-6 on chip
  stack4  (2-word)        00 01 10 11
  stack5a (G 2w, x 3w)    00 01 02 10 11
  stack5b (G 3w, x 2w)    00 01 10 11 20
  stack6  (3-word)        00 01 02 10 11 20  — shipped default, ~2e-7

Result (captured in the DESIGN.md section "No <=1e-6 tier exists below
stack6"): the 4- and 5-product tiers land at 2.0-3.4e-6 — ALL above the
1e-6 bar. The cap is structural: any scheme whose G or x uses only two
bf16 words carries a ~2^-18 representation residual, and any dropped
product with i+j = 2 is itself ~2^-18; the minimal product set covering
every term down to 2^-27 is exactly stack6's six. So the ladder's next
rung below stack6 is ~2e-6 at 5/6 the slots — strictly the wrong side
of the bar — and no stack4/stack5 kernel mode is shipped.

Usage: python docs/receipts/probe_stacktiers.py  (appends one JSON line
per scheme/depth to stacktiers.jsonl; pure CPU, no chip needed — the
probe measures rounding semantics, not time).
"""

import json
import os
import time

import ml_dtypes
import numpy as np

bf = ml_dtypes.bfloat16
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "stacktiers.jsonl")

SCHEMES = [
    ("stack3", [(0, 0), (0, 1), (1, 0)], 2, 2),
    ("stack4", [(0, 0), (0, 1), (1, 0), (1, 1)], 2, 2),
    ("stack5a", [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1)], 2, 3),
    ("stack5b", [(0, 0), (0, 1), (1, 0), (1, 1), (2, 0)], 3, 2),
    ("stack6", [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (2, 0)], 3, 3),
]


def split(a, words):
    outs = []
    r = a.astype(np.float64).astype(np.float32)
    for _ in range(words):
        w = r.astype(bf).astype(np.float32)
        outs.append(w)
        r = r - w
    return outs


def scheme_err(G, x, terms, gw, xw, exact):
    Gs, xs = split(G, gw), split(x, xw)
    acc = np.zeros((G.shape[0], x.shape[1]), np.float32)
    for i, j in terms:
        p = np.dot(Gs[i].astype(bf).astype(np.float32),
                   xs[j].astype(bf).astype(np.float32))
        acc = acc + p.astype(np.float32)
    return float(np.abs(acc - exact).max() / np.abs(exact).max())


def main():
    rng = np.random.default_rng(0)
    rows = []
    for depth in (128, 768):  # 2*r1 and 12*r1 at the (64, rV) pick
        G = np.cos(rng.uniform(0, 2 * np.pi, (128, depth)))
        x = rng.standard_normal((depth, 512))
        exact = G.astype(np.float64) @ x.astype(np.float64)
        f32 = float(np.abs(
            np.dot(G.astype(np.float32), x.astype(np.float32))
            - exact).max() / np.abs(exact).max())
        for name, terms, gw, xw in SCHEMES:
            err = scheme_err(G, x, terms, gw, xw, exact)
            row = {"scheme": name, "depth": depth, "products": len(terms),
                   "rel_err": err, "f32_ref_err": f32,
                   "passes_1e6_bar": err < 1e-6,
                   "t": time.strftime("%Y-%m-%dT%H:%M:%S")}
            rows.append(row)
            print(json.dumps(row), flush=True)
    with open(OUT, "a") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
