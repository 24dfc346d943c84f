"""Hardware queue (run on the real chip; prepared during the r3 tunnel outage).

1. Mosaic input_output_aliases probe (correctness of aliased kernels)
2. in-place 256^3 c2c: verify vs numpy + loop-timed A/B vs normal plan
3. in-place 1024^3 c2c single-chip receipt (single-mode verification)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
import offt_tpu
from offt_tpu.obs.profile import time_fn_looped, fence

rng = np.random.default_rng(0)

# ---- 1. aliased-kernel correctness on hardware (small, fast) ----
x = (rng.standard_normal((64, 64, 256))
     + 1j * rng.standard_normal((64, 64, 256))).astype(np.complex64)
p_ip = offt_tpu.plan((64, 64, 256), "complex64", planar=True,
                     in_place=True, donate=True)
yr, yi = p_ip((x.real.copy(), x.imag.copy()))
got = np.asarray(yr) + 1j * np.asarray(yi)
want = np.fft.fftn(x)
err = np.linalg.norm(got - want) / np.linalg.norm(want)
print(f"[1] in-place aliased fwd on chip: rel err {err:.3e}", flush=True)
assert err < 1e-5

# ---- 2. 256^3 A/B: in-place vs normal (the capacity-mode cost) ----
N = 256
re = jax.device_put(rng.standard_normal((N,) * 3).astype(np.float32))
im = jax.device_put(rng.standard_normal((N,) * 3).astype(np.float32))
p_norm = offt_tpu.plan((N,) * 3, "complex64", planar=True)
p_ipb = offt_tpu.plan((N,) * 3, "complex64", planar=True, in_place=True,
                      donate=True)

def body_norm(c):
    a, b = c
    yr, yi = p_norm._fn(a, b)
    return fence(a, yr[..., :1]), b

def body_ip(c):
    yr, yi = p_ipb._fn(*c)
    return fence(yr, yr[..., :1]), yi

t_n = time_fn_looped(jax.jit(body_norm), (re, im))
t_i = time_fn_looped(jax.jit(body_ip), (re, im))
print(f"[2] 256^3 c2c: normal {t_n*1e3:.3f} ms, in-place {t_i*1e3:.3f} ms "
      f"({t_i/t_n:.2f}x)", flush=True)
del re, im

# ---- 3. 1024^3 c2c on ONE chip (XLA OOMs; non-aliased needs 16+ GiB) ----
N = 1024
K = (3, 5, 7)

@jax.jit
def make_mode():
    xv = jnp.arange(N, dtype=jnp.float32)
    ax = 2 * jnp.pi * K[0] * xv / N
    ay = 2 * jnp.pi * K[1] * xv / N
    az = 2 * jnp.pi * K[2] * xv / N
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    cxy = cx[:, None] * cy[None, :] - sx[:, None] * sy[None, :]
    sxy = sx[:, None] * cy[None, :] + cx[:, None] * sy[None, :]
    re = (cxy[:, :, None] * cz[None, None, :]
          - sxy[:, :, None] * sz[None, None, :])
    return re, jnp.zeros_like(re)

p_big = offt_tpu.plan((N,) * 3, "complex64", planar=True, in_place=True,
                      donate=True)
t0 = time.time()
re, im = make_mode()
jax.block_until_ready((re, im))
print(f"[3] mode generated on device in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
yr, yi = p_big((re, im))
peak = float(yr[K[0], K[1], K[2]])
t_exec = time.time() - t0
rel = abs(peak - N ** 3 / 2) / (N ** 3 / 2)
side = abs(float(yr[11, 13, 17])) / (N ** 3 / 2)
print(f"[3] 1024^3 c2c in-place: exec+readback {t_exec:.1f}s, peak rel "
      f"err {rel:.2e}, side-bin leakage {side:.2e}", flush=True)
assert rel < 1e-4 and side < 1e-4
# Timing: host-chained differencing with DONATED calls. A fori_loop
# carry cannot alias through the inlined inner jit, so the loop needs
# carry+result = 16 GiB and OOMs (hit 2026-08-18, same reason the 768^3
# bench is chained+donate). Chaining p_big._fn keeps ONE planar pair
# live; the first call's 8 GiB result must also die before regenerating
# inputs.
del re, im, yr, yi
re2, im2 = make_mode()

def chain(k, a, b):
    t0 = time.time()
    for _ in range(k):
        a, b = p_big._fn(a, b)
    _ = float(a[0, 0, 0])  # drain the queue with a tiny readback
    return time.time() - t0, a, b

_, re2, im2 = chain(2, re2, im2)  # warm
ts, tl = [], []
for _ in range(3):
    t, re2, im2 = chain(2, re2, im2)
    ts.append(t)
    t, re2, im2 = chain(12, re2, im2)
    tl.append(t)
t_big = max((min(tl) - min(ts)) / 10, 1e-9)
n3 = N ** 3
gf = 5 * n3 * np.log2(n3) / t_big / 1e9
print(f"[3] 1024^3 c2c in-place chained: {t_big*1e3:.1f} ms "
      f"({gf:.0f} GFLOP/s)", flush=True)
print("HW QUEUE DONE", flush=True)
