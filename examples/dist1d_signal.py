"""Distributed long-1-D FFT demo: one signal too long for comfort on a
single device, four-step-sharded over every device on the mesh
(dist/long1d.py — natural-order in/out, fused local kernels, three
tunable exchanges).

The use case: picking tones out of a very long 1-D record (radio
astronomy channelization, pulsar search, long audio) where the record is
produced ALREADY SHARDED across the mesh — the plan consumes and emits
the natural contiguous-chunk layout, so no host gather ever happens.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python examples/dist1d_signal.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if not os.environ.get("OFFT_EXAMPLE_REAL"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import offt_tpu
from offt_tpu.dist import make_mesh


def main():
    ndev = len(jax.devices())
    p1 = int(np.sqrt(ndev))
    while ndev % p1:
        p1 -= 1
    mesh = make_mesh(p1, ndev // p1)
    print(f"mesh: {dict(mesh.shape)} on {jax.default_backend()}")

    n = 1 << 18                      # 262144-sample record
    tones = (1234, 77777, 131072 - 9)
    t = np.arange(n)
    sig = sum(np.exp(2j * np.pi * k * t / n) for k in tones)
    sig = (sig + 0.01 * (np.random.default_rng(0).standard_normal(n)
                         + 1j * np.random.default_rng(1).standard_normal(n))
           ).astype(np.complex64).reshape(1, 1, n)

    fwd = offt_tpu.plan((1, 1, n), "complex64", mesh=mesh, norm="ortho")
    inv = offt_tpu.plan((1, 1, n), "complex64", mesh=mesh, norm="ortho",
                        inverse=True)
    assert fwd._shards is not None, "dist-1d engine did not engage"
    print(f"input sharding: {fwd.input_sharding.spec} "
          f"(contiguous 1/{ndev} chunks of the flat record)")

    # place the record in the plan's natural sharding (in production the
    # producer writes its chunk locally; here device_put models that)
    xs = jax.device_put(sig, fwd.input_sharding)
    spec = fwd(xs)

    # the spectrum comes back in the SAME flat layout: peak-picking is a
    # local argmax per shard + one tiny host reduction
    mag = np.abs(np.asarray(spec))[0, 0]
    found = np.sort(np.argpartition(mag, -3)[-3:])
    print("tones injected:", sorted(tones), " found:", found.tolist())
    assert set(found.tolist()) == set(tones)

    # denoise: zero everything below threshold, inverse back — one jitted
    # distributed program end to end
    @jax.jit
    def denoise(x):
        s = fwd(x)
        s = jnp.where(jnp.abs(s) > 0.1 * np.sqrt(n), s, 0)
        return inv(s)

    clean = np.asarray(denoise(xs))[0, 0]
    want = sum(np.exp(2j * np.pi * k * t / n) for k in tones)
    err = np.linalg.norm(clean - want) / np.linalg.norm(want)
    print(f"denoised rel err vs pure tones: {err:.2e}")
    assert err < 2e-2
    print("OK")


if __name__ == "__main__":
    main()
