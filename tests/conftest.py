"""Test harness config: 8 virtual CPU devices so distributed (mesh) paths run
without TPU hardware — the TPU-native answer to the reference's
"mpirun -n N on one host" testing story (SURVEY.md §4.5)."""

import os

# force CPU for the test suite (the session env pins JAX_PLATFORMS to the
# real TPU tunnel); set OFFT_TPU_TEST_REAL=1 to run tests on hardware.
if not os.environ.get("OFFT_TPU_TEST_REAL"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import tempfile

os.environ.setdefault("OFFT_TPU_CACHE_DIR",
                      tempfile.mkdtemp(prefix="offt_test_cache_"))

import jax  # noqa: E402

if not os.environ.get("OFFT_TPU_TEST_REAL"):
    # env var alone does not beat the session's axon plugin registration
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
