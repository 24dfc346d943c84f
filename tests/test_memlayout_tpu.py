"""Hidden-copy regressions via AOT TPU memory analysis (no chips needed).

Flattening trailing dims into one lane axis at the host is not a layout
bitcast under TPU tiling — XLA materializes a full plane copy. Round 4
measured a 64 MB temp (exactly one plane) on a (512,256,128) deep-axis
sublane pass, and an 8 GiB temp that OOM'd the in-place 1024^3 chain
(offt-compute.c:2347-2993 is the reference's equivalent hot x stage).
These tests pin the fix: the deep-axis route and the aliased in-place
chain must compile for a real v5e topology with ~zero HLO temp.

Compiles against ``jax.experimental.topologies`` like test_overlap_tpu
(the TPU compiler targets the topology description; no devices needed);
skips wherever libtpu/topology support is absent.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# anything well under one f32 plane of the test shapes — temps beyond
# this mean a materialized relayout crept back in
_TEMP_CAP = 1 << 20


@pytest.fixture(scope="module")
def tpu_dev():
    from jax.experimental import topologies

    try:
        # smallest legal v5e topology (host bounds are 2x2); the 1-device
        # mesh below compiles against a single device of it
        topo = topologies.get_topology_desc("v5e:2x2", "tpu")
        return list(topo.devices)[0]
    except Exception as e:
        pytest.skip(f"no TPU topology support: {type(e).__name__}")


def _temp_bytes(tpu_dev, fn, avals, donate=()):
    import os

    mesh = Mesh(np.array([tpu_dev]), ("d",))
    sh = NamedSharding(mesh, P())
    # real Mosaic lowering (interpret-mode emulation legally fuses the
    # relayouts these tests exist to catch)
    os.environ["OFFT_FORCE_MOSAIC"] = "1"
    try:
        # trace with the suite's x64 mode off: x64 promotion produces
        # 64-bit values Mosaic cannot legalize (the kernels are f32/bf16
        # by design; real sessions run x64-off)
        with jax.enable_x64(False):
            j = jax.jit(fn, in_shardings=(sh,) * len(avals),
                        out_shardings=sh, donate_argnums=donate)
            return (j.lower(*avals).compile().memory_analysis()
                    .temp_size_in_bytes)
    finally:
        os.environ.pop("OFFT_FORCE_MOSAIC", None)


def test_deep_axis_sublane_pass_has_no_copy(tpu_dev):
    """3rd-from-last-axis fft_sublane: the (B, n, MID, last) block route
    must leave no materialized reshape (was: one full plane)."""
    from offt_tpu.kernels import pallas_fft as pf

    avals = (jax.ShapeDtypeStruct((512, 256, 128), jnp.float32),) * 2
    tmp = _temp_bytes(tpu_dev, lambda a, b: pf.fft_sublane(a, b, 0), avals)
    assert tmp < _TEMP_CAP, f"sublane pass materialized {tmp} temp bytes"


def test_in_place_chain_is_fully_aliased(tpu_dev):
    """in_place+donate c2c: every kernel aliases through, zero HLO temp —
    the structural property behind the 1024^3-in-8-GiB capacity claim."""
    import offt_tpu
    from offt_tpu.plan.params import PlanParams

    # explicit use_pallas: default_params gates it off on the CPU host
    # platform this test process runs under (compilation targets TPU)
    pp = PlanParams(use_pallas=1, precision="stack6")
    p = offt_tpu.plan((256, 256, 256), "complex64", planar=True,
                      in_place=True, donate=True, use_cache=False,
                      params=pp)
    avals = (jax.ShapeDtypeStruct((256, 256, 256), jnp.float32),) * 2
    tmp = _temp_bytes(tpu_dev, lambda a, b: p._fn(a, b), avals,
                      donate=(0, 1))
    assert tmp < _TEMP_CAP, f"in-place chain materialized {tmp} temp bytes"


def test_fused_four_step_has_no_transpose_copy(tpu_dev):
    """The fused long-1-D route (kernels/fourstep.py fast path) must emit
    NO separate twiddle or transpose pass: step 3's transposed block
    writes replace the XLA transpose copy (was: a full array temp).
    Budget: well under one planar copy of the 2^20 array (4 MiB)."""
    from offt_tpu.kernels import fourstep

    n = 1 << 20
    avals = (jax.ShapeDtypeStruct((1, 1, n), jnp.float32),) * 2
    tmp = _temp_bytes(tpu_dev,
                      lambda a, b: fourstep.fft_four_step_planar(a, b),
                      avals)
    assert tmp < 2 * (1 << 20), \
        f"fused four-step materialized {tmp} temp bytes"


def test_x64_session_still_compiles(tpu_dev):
    """An x64-enabled user session must not crash Pallas-path plans:
    gridded pallas_call does not legalize under jax_enable_x64 (a JAX
    limitation), so every public kernel entry traces under
    ``jax.enable_x64(False)`` (pallas_fft._f32_trace). This compiles a
    c2c plan with the suite's x64 mode LEFT ON."""
    import os

    import offt_tpu
    from offt_tpu.plan.params import PlanParams

    assert jax.config.jax_enable_x64  # the suite runs x64-on
    pp = PlanParams(use_pallas=1, precision="stack6")
    p = offt_tpu.plan((128, 128, 128), "complex64", planar=True,
                      use_cache=False, params=pp)
    mesh = Mesh(np.array([tpu_dev]), ("d",))
    sh = NamedSharding(mesh, P())
    avals = (jax.ShapeDtypeStruct((128, 128, 128), jnp.float32),) * 2
    os.environ["OFFT_FORCE_MOSAIC"] = "1"
    try:
        j = jax.jit(lambda a, b: p._fn(a, b), in_shardings=(sh, sh),
                    out_shardings=sh)
        j.lower(*avals).compile()  # raises without the f32-trace guard
    finally:
        os.environ.pop("OFFT_FORCE_MOSAIC", None)
