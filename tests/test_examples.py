"""Every shipped example is runnable and self-verifying (each asserts
its own numerical checks and exits 0) — examples rot without this.
Mirrors the reference's examples/ being part of the build (SURVEY.md
§2b #41)."""

import pathlib
import subprocess
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).resolve().parents[1] / "examples").glob("*.py"))


@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(script):
    proc = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=600, env={"PATH": "/usr/bin:/bin", "HOME": "/tmp",
                          "JAX_PLATFORMS": "cpu",
                          "XLA_FLAGS":
                          "--xla_force_host_platform_device_count=8"})
    assert proc.returncode == 0, proc.stderr[-2000:]
