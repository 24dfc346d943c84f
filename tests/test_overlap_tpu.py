"""Overlap structure in TPU-SCHEDULED HLO (VERDICT r2 weak #4).

test_overlap.py asserts on CPU-compiled modules; TPU's latency-hiding
scheduler may legally reorder differently. Here the distributed pipeline
is AOT-compiled against a REAL v5e 2x4 topology description
(jax.experimental.topologies — no chips needed, the compiler targets the
topology) and the assertions run on the TPU executable's HLO:

- each pipeline chunk's exchange survives per-chunk (TPU lowers one
  complex all-to-all as TWO f32 ops — re and im — so t chunks emit 2t
  all-to-alls per phase), with the two phases visible as the two
  replica-group shapes (COL groups of p2, ROW groups of p1) —
  offt-compute.c:3614-3647 MPI_Ialltoallv pipeline parity;
- the ring strategy (s=1) lowers to collective-permutes with no
  all-to-all at all.

Skips when no TPU compiler/topology support is available (pure-CPU CI).
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _topology_mesh():
    from jax.experimental import topologies

    from offt_tpu.dist.mesh import make_mesh

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    return make_mesh(2, 4, devices=list(topo.devices))


@pytest.fixture(scope="module")
def tpu_mesh():
    try:
        return _topology_mesh()
    except Exception as e:
        pytest.skip(f"no TPU topology support: {type(e).__name__}")


AVALS = tuple(jax.ShapeDtypeStruct((32, 32, 32), jnp.float32)
              for _ in range(2))


def _compile(tpu_mesh, **params_kw):
    import offt_tpu
    from offt_tpu.plan.params import PlanParams

    params = PlanParams(use_pallas=0, **params_kw)
    p = offt_tpu.plan((32, 32, 32), "complex64", mesh=tpu_mesh,
                      params=params, planar=True, use_cache=False)
    return p._fn.lower(*AVALS).compile().as_text()


def _a2a_lines(txt):
    return [ln for ln in txt.splitlines() if re.search(r" all-to-all\(", ln)]


def test_tpu_chunked_all_to_alls_per_phase(tpu_mesh):
    """2*t1 + 2*t2 per-chunk exchanges survive TPU scheduling, split
    across the two phases by replica-group shape."""
    for t1, t2 in ((2, 2), (4, 2)):
        txt = _compile(tpu_mesh, p1=2, t1=t1, t2=t2, w1=2, w2=2)
        lines = _a2a_lines(txt)
        assert len(lines) == 2 * (t1 + t2), (t1, t2, len(lines))
        # phase 1 exchanges ride COL groups of p2=4 ranks; phase 2 ROW
        # pairs — both present, with per-phase chunk counts
        col = [ln for ln in lines if "{0,1,2,3}" in ln]
        row = [ln for ln in lines if "{0,4}" in ln]
        assert len(col) == 2 * t1, (t1, len(col))
        assert len(row) == 2 * t2, (t2, len(row))


def test_tpu_ring_lowers_to_permutes(tpu_mesh):
    """s=1 ring: collective-permutes, zero all-to-alls, on TPU too."""
    txt = _compile(tpu_mesh, p1=2, t1=2, t2=2, s1=1, s2=1)
    assert len(_a2a_lines(txt)) == 0
    assert txt.count("collective-permute") > 0
