"""Reverse-mode autodiff for FFT plans.

FFTs are linear, so every cotangent rule is another plan:

- c2c, complex calling convention: the full 3-D DFT matrix is SYMMETRIC
  (tensor product of symmetric 1-D DFTs), and JAX's complex-cotangent
  convention wraps the real transpose in conj() on both sides, which for
  a symmetric W collapses to plain W — the VJP of a complex c2c plan is
  the SAME plan applied to the cotangent (verified against
  jax.vjp(jnp.fft.fft): N*ifft(ct) is wrong, fft(ct) is right).
- c2c, planar (re, im) convention: cotangents are plain real pairs, so
  the rule is the pure R^2-transpose: the real fold of W^H — i.e. the
  DIRECTION-FLIPPED plan with the NORM FLIPPED (backward <-> forward,
  ortho self-adjoint): adjoint(a*F) = a*conj(F) = a*G.
- rfft: the transpose of x -> {X_k}_{k<=M} is implementation-free
  (every correct rfftn computes the same map on all of R^N):
  ct -> Re(unnormalized-idft(zero_pad_z(ct))) — one inverse c2c plan
  with the flipped norm, real part of the output. The packed layout's
  plane 0 carries X_0 + i*X_M, so its cotangent injects as
  ct'[0] = ct_P, ct'[M] = -i*ct_P.
- irfft: transpose of the packed pipeline (irfft = idft o retangle o
  pack): a forward rfft plan with the flipped norm, interior bins
  doubled (each interior half-spectrum bin represents itself and its
  conjugate mirror), and the pack matrix transposed back onto the
  plane-0/M bins.

Forward-mode (jvp) is not wired: jax.custom_vjp functions reject jvp,
and the tangent rule would just be the plan itself — call the plan on
the tangent directly. The reference has no analogue (MPI/C has no
autodiff); this is TPU-first API surface for jax.grad users
(spectral losses, neural operators, differentiable physics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flip_norm(norm):
    """The adjoint of a norm-scaled DFT is the direction-flipped plan
    with the complementary norm: adjoint(a*F) = a*G, and
    plan(inverse, norm=flip) applies exactly a*G (ortho is unitary)."""
    if norm in (None, "backward"):
        return "forward"
    if norm == "forward":
        return "backward"
    return "ortho"


def _zero_pad_z(ctr, cti, nz: int, packed: bool):
    """Assemble the full-length-z complex cotangent (planar) from a
    half-spectrum cotangent: bins M+1..N-1 are zero (NOT a Hermitian
    extension — the transpose of a half-spectrum map is zero-padded).
    Packed plane 0 carries (X_0 + i*X_M): its cotangent splits as
    ct'[0] = ct_P and ct'[M] = -i*ct_P."""
    m = nz // 2
    lead = ctr.shape[:-1]
    zshape = lead + (nz - ctr.shape[-1],)
    if not packed:   # numpy layout (..., M+1): bins land in place
        z = jnp.zeros(zshape, ctr.dtype)
        return (jnp.concatenate([ctr, z], axis=-1),
                jnp.concatenate([cti, z], axis=-1))
    # packed (..., M): plane 0 -> bins 0 and M; -i*(a+ib) = b - ia
    z1 = jnp.zeros(lead + (nz - m - 1,), ctr.dtype)
    return (jnp.concatenate([ctr, cti[..., :1], z1], axis=-1),
            jnp.concatenate([cti, -ctr[..., :1], z1], axis=-1))


def _half_weights(nf: int, nz: int, packed: bool, dtype):
    """Interior-bin doubling for the irfft transpose: every half-spectrum
    bin 1..ceil(N/2)-1 stands for itself AND its conjugate mirror; the
    self-paired bins (0, and M when N is even, = the packed plane 0)
    count once."""
    w = [1.0] + [2.0] * (nf - 1)
    if not packed and nz % 2 == 0:
        w[-1] = 1.0
    return jnp.asarray(w, dtype)


def wrap_plan_fn(fn, *, shape, dtype, mesh, real: bool, inverse: bool,
                 norm, batch_dims: int, planar_in: bool, planar_out: bool,
                 packed: bool, batch_sharded: bool = False, params=None):
    """Wrap a built plan executable with jax.custom_vjp so jax.grad /
    jax.vjp work through it. ``fn`` must be the plan's linear executable
    (planar or complex calling convention).

    Returns None (= use native autodiff) for inverse-real plans outside
    the fused local packed pipeline: their transpose depends on the
    pipeline's off-Hermitian bin-0/M convention, and the generic jnp
    paths (fp64, odd N) are natively differentiable AND exact. The c2c
    rule (symmetric W) and the rfft rule (zero-pad + Re) are
    implementation-free, so those wrap unconditionally. Known limit:
    jax.grad of a DISTRIBUTED complex64 irfft plan raises (Pallas
    stages inside, no wrapper formula) — use float64 or grad through
    the forward plan instead."""
    from .api import plan  # deferred: api imports this module

    flip = _flip_norm(norm)
    nz = shape[2]

    if real and inverse:
        from ..kernels import pallas_fft as pf
        fused = (mesh is None and jnp.dtype(dtype) == jnp.complex64
                 and (params is None or params.use_pallas)
                 and pf.can_use_rfft3d(*shape))
        if not fused:
            return None  # native jnp autodiff (exact for generic paths)

    def _adj_c2c_planar(ctr, cti):
        p = plan(shape, dtype, mesh=mesh, inverse=not inverse,
                 norm=flip, batch_dims=batch_dims, planar=True,
                 batch_sharded=batch_sharded)
        return p._fn(ctr, cti)

    def _adj_rfft_planar(ctr, cti):
        # transpose of real -> half-spectrum: zero-pad + inverse c2c,
        # keep the real plane
        fr, fi = _zero_pad_z(ctr, cti, nz, packed)
        p = plan(shape, dtype, mesh=mesh, inverse=True, norm=flip,
                 batch_dims=batch_dims, planar=True)
        zr, _ = p._fn(fr, fi)
        return zr

    def _adj_irfft_planar(y_ct):
        # transpose of the FUSED packed pipeline (the only wrapped
        # irfft): forward packed rfft (flipped norm) + interior
        # doubling, then pack^T back onto the numpy layout if needed
        p = plan(shape, dtype, mesh=None, real=True, inverse=False,
                 norm=flip, batch_dims=batch_dims, planar=True,
                 packed=True)
        vr, vi = p._fn(y_ct)
        w = _half_weights(vr.shape[-1], nz, packed=True, dtype=vr.dtype)
        vr = vr * w
        vi = vi * w
        if packed:
            return vr, vi
        # pack^T: the packed plane-0 cotangent (a, b) feeds the numpy
        # layout as ct_w0 = a + ib, ct_wM = b - ia
        return (jnp.concatenate([vr, vi[..., :1]], axis=-1),
                jnp.concatenate([vi, -vr[..., :1]], axis=-1))

    if planar_in and planar_out:          # c2c planar
        @jax.custom_vjp
        def dfn(re, im):
            return fn(re, im)

        def fwd(re, im):
            return fn(re, im), None

        def bwd(_, ct):
            return _adj_c2c_planar(*ct)

        dfn.defvjp(fwd, bwd)
        return dfn

    if planar_out and not planar_in:      # rfft planar: real -> pair
        @jax.custom_vjp
        def dfn(x):
            return fn(x)

        def fwd(x):
            return fn(x), None

        def bwd(_, ct):
            return (_adj_rfft_planar(*ct),)

        dfn.defvjp(fwd, bwd)
        return dfn

    if planar_in and not planar_out:      # irfft planar: pair -> real
        @jax.custom_vjp
        def dfn(re, im):
            return fn(re, im)

        def fwd(re, im):
            return fn(re, im), None

        def bwd(_, ct):
            return _adj_irfft_planar(ct)

        dfn.defvjp(fwd, bwd)
        return dfn

    # ---- complex calling convention (CPU / fp64 / generic paths) ----
    # JAX's complex-cotangent convention is conj o (R-transpose) o conj.
    # For the symmetric c2c DFT that collapses mathematically to the
    # primal map a*W, but the cotangent arrives with the OUTPUT sharding
    # — so express a*W via the direction-flipped plan (whose in/out
    # shardings are the primal's swapped): a*W*ct = conj(a*G*conj(ct)).
    if not real:
        def _adj_c2c(ct):
            p = plan(shape, dtype, mesh=mesh, inverse=not inverse,
                     norm=flip, batch_dims=batch_dims,
                     batch_sharded=batch_sharded)
            return jnp.conj(p._fn(jnp.conj(ct)))

        @jax.custom_vjp
        def dfn(x):
            return fn(x)

        def fwd(x):
            return fn(x), None

        def bwd(_, ct):
            return (_adj_c2c(ct),)

        dfn.defvjp(fwd, bwd)
        return dfn

    if not inverse:                       # complex rfft: real -> complex
        @jax.custom_vjp
        def dfn(x):
            return fn(x)

        def fwd(x):
            return fn(x), None

        def bwd(_, ct):
            # conj convention; output real so the outer conj is a no-op
            g = _adj_rfft_planar(jnp.real(ct), -jnp.imag(ct))
            return (g.astype(jnp.float64 if jnp.dtype(dtype) ==
                             jnp.complex128 else jnp.float32),)

        dfn.defvjp(fwd, bwd)
        return dfn

    @jax.custom_vjp                       # complex irfft: complex -> real
    def dfn(x):
        return fn(x)

    def fwd(x):
        return fn(x), None

    def bwd(_, ct):
        gr, gi = _adj_irfft_planar(ct)
        return (jax.lax.complex(gr, -gi).astype(jnp.dtype(dtype)),)

    dfn.defvjp(fwd, bwd)
    return dfn
