"""Pipeline-overlap evidence (VERDICT round 1, item 5).

The reference's whole point is measured comm/compute overlap: its W-window
software pipeline posts tile i's nonblocking all-to-all while computing
tile i-W (offt-compute.c:3614-3647). Our TPU re-expression chunks each
phase into t1/t2 per-chunk collectives and bounds in-flight chunks with an
optimization_barrier window (dist/pencil.py pencil_pipeline).

What can be *proven* without multi-chip TPU hardware:
- the chunking is real: the compiled module contains exactly t1 + t2
  all-to-all ops (one per chunk), not one fused exchange;
- compute interleaves with the chunk collectives in program order (each
  chunk's local FFT work sits between neighbouring chunks' exchanges);
- the w knob materializes as optimization_barrier ops in the lowered
  module (the compiled CPU module drops them after scheduling; on TPU the
  async scheduler uses them to bound in-flight collectives).

The wall-clock w/s sweep on the 8-device CPU mesh lives in
docs/receipts/overlap_sweep_cpu.jsonl (relative numbers only — CPU has no
async collectives, so w mostly measures barrier overhead there).
"""

import re

import numpy as np
import jax
import pytest

import offt_tpu
from offt_tpu.dist import make_mesh
from offt_tpu.plan.params import PlanParams

SHAPE = (32, 32, 32)
AVALS = (jax.ShapeDtypeStruct(SHAPE, np.float32),) * 2


def _plan(t1, t2, w, s=0):
    mesh = make_mesh(2, 4)
    params = PlanParams(p1=2, t1=t1, t2=t2, w1=w, w2=w, s1=s, s2=s)
    return offt_tpu.plan(SHAPE, "complex64", mesh=mesh, params=params,
                         planar=True)


def test_chunked_collectives_in_compiled_hlo():
    """t1 + t2 chunk exchanges survive to the compiled module."""
    for t1, t2 in [(1, 1), (4, 4), (2, 8)]:
        p = _plan(t1, t2, w=min(t1, t2, 2))
        txt = p._fn.lower(*AVALS).compile().as_text()
        assert txt.count("all-to-all(") == t1 + t2, (t1, t2)


def test_pipeline_shape_in_compiled_entry():
    """The compiled entry has the pipeline shape the async scheduler
    needs: per-chunk compute precedes the t1 phase-1 exchanges, mid-axis
    compute separates them from the t2 phase-2 exchanges, and the last
    exchange is followed by compute. (The *runtime* interleaving of chunk
    i's unpack with chunk i+1's collective is an async-scheduler property
    only observable on real multi-chip hardware; CPU collectives are
    synchronous.)"""
    p = _plan(4, 4, w=2)
    txt = p._fn.lower(*AVALS).compile().as_text()
    entry = next(b for b in txt.split("\n\n") if "ENTRY" in b)
    kinds = []
    for line in entry.splitlines():
        s = line.strip()
        if " = " not in s:
            continue
        rhs = s.split(" = ", 1)[1]
        if "all-to-all(" in rhs:
            kinds.append("a2a")
        elif "fusion(" in rhs or " dot(" in f" {rhs}":
            kinds.append("compute")
    first = kinds.index("a2a")
    last = len(kinds) - 1 - kinds[::-1].index("a2a")
    assert kinds[:first].count("compute") >= 4      # chunk FFTs before comm
    assert kinds[first:last].count("compute") >= 2  # mid compute between phases
    assert kinds[last + 1:].count("compute") >= 2   # last-axis FFTs after
    assert kinds.count("a2a") == 8


def test_window_emits_optimization_barriers():
    """w > 0 ties chunk i to chunk i-w via optimization_barrier in the
    lowered module; w = 0 leaves scheduling unconstrained."""
    p0 = _plan(4, 4, w=0)
    pw = _plan(4, 4, w=2)
    low0 = p0._fn.lower(*AVALS).as_text()
    loww = pw._fn.lower(*AVALS).as_text()
    assert "opt_barrier" not in low0 and "optimization_barrier" not in low0
    assert ("opt_barrier" in loww) or ("optimization_barrier" in loww)


def test_ring_decomposes_exchange_into_permutes():
    """s=1 replaces each chunk all-to-all with a ring of p-1 single-hop
    collective-permutes (each independently overlappable)."""
    p = _plan(2, 2, w=1, s=1)
    txt = p._fn.lower(*AVALS).compile().as_text()
    assert txt.count("all-to-all(") == 0
    # phase 1 ring: (p2-1)=3 hops per chunk x 2 chunks; phase 2: 1 hop x 2
    assert len(re.findall(r"collective-permute(?:-start)?\(", txt)) == 8


@pytest.mark.parametrize("w", [0, 1, 2])
def test_windowed_pipeline_correct(w):
    rng = np.random.default_rng(w)
    re_ = rng.standard_normal(SHAPE).astype(np.float32)
    im = rng.standard_normal(SHAPE).astype(np.float32)
    p = _plan(4, 4, w=w)
    yr, yi = p((re_, im))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fftn(re_ + 1j * im)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5
