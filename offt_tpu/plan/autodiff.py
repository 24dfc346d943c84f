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

Forward-mode: the planar paths and the complex c2c path are declared
via jax.custom_derivatives.linear_call (primal + plain transpose), so
jvp/jacfwd AND vjp/grad both work, with higher-order AD free (the
transpose of linear_call(f, fT) is linear_call(fT, f)). Only the mixed
real<->complex rfft/irfft COMPLEX calling conventions stay on
custom_vjp (reverse mode only) — their planar twins support both
modes. The reference has no analogue (MPI/C has no autodiff); this is
TPU-first API surface for jax.grad users (spectral losses, neural
operators, differentiable physics).
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


def _make_linear_wrapper(fn, two_in: bool, transpose_fn):
    """jax.custom_derivatives.linear_call shell: the primal is declared
    LINEAR with ``transpose_fn`` as its plain (un-conjugated) transpose.
    Unlike custom_vjp this supports BOTH differentiation modes — the
    jvp of a linear map is the map itself, the vjp is derived from the
    transpose (JAX adds its complex-conjugation convention), and
    higher-order AD is free (the transpose of linear_call(f, ft) is
    linear_call(ft, f)). Used for the planar paths (pure R-linear) and
    the complex c2c path (C-linear); the mixed real<->complex rfft/irfft
    complex conventions stay on custom_vjp (reverse mode only)."""
    from jax.custom_derivatives import linear_call

    if two_in:
        def dfn(a, b):
            return linear_call(lambda _, xs: fn(*xs),
                               lambda _, ct: tuple(transpose_fn(ct)),
                               (), (a, b))
    else:
        def dfn(a):
            return linear_call(lambda _, x: fn(x),
                               lambda _, ct: transpose_fn(ct), (), a)
    return dfn


def _make_vjp_wrapper(fn, two_in: bool, bwd_fn):
    """custom_vjp shell: primal = fn, no residuals, bwd = bwd_fn(ct)
    returning the input-cotangent tuple."""
    if two_in:
        @jax.custom_vjp
        def dfn(a, b):
            return fn(a, b)

        def fwd(a, b):
            return fn(a, b), None
    else:
        @jax.custom_vjp
        def dfn(a):
            return fn(a)

        def fwd(a):
            return fn(a), None

    def bwd(_, ct):
        return bwd_fn(ct)

    dfn.defvjp(fwd, bwd)
    return dfn


def wrap_plan_fn(fn, *, shape, dtype, mesh, real: bool, inverse: bool,
                 norm, batch_dims: int, planar_in: bool, planar_out: bool,
                 packed: bool, batch_sharded: bool = False, params=None,
                 in_place: bool = False):
    """Wrap a built plan executable with jax.custom_vjp so jax.grad /
    jax.vjp work through it. ``fn`` must be the plan's linear executable
    (planar or complex calling convention).

    Pipelines with no Pallas inside (fp64, or use_pallas=0) return None
    and differentiate NATIVELY — exact, and forward-mode (jvp/jacfwd)
    keeps working there; custom_vjp-wrapped Pallas paths support
    reverse mode only (call the plan on tangents directly for a manual
    jvp: FFTs are linear). The c2c rule (symmetric W) and the rfft rule
    (zero-pad + Re) are implementation-free; the even-N c2r rule
    transposes the untangle algebra that EVERY even-N c2r pipeline here
    shares (fused packed slab, icrfft_last, the generic irfft_1d —
    verified identical off-manifold); the odd-N c2r rule transposes the
    Hermitian-extension pipeline (no Nyquist, no pack: bin 0 weight 1,
    every other bin weight 2)."""
    from .api import plan  # deferred: api imports this module

    flip = _flip_norm(norm)
    nz = shape[2]

    # Pallas-free pipelines: native autodiff is exact and supports
    # forward mode — don't wrap (the kernels gate on complex64 + the
    # use_pallas knob; everything else is pure jnp).
    has_pallas = (jnp.dtype(dtype) == jnp.complex64
                  and (params is None or params.use_pallas))
    if not has_pallas:
        return None

    _adj_cache = {}

    def _adj_plan(planar=True, **kw):
        # memoized: an eager jax.grad loop executes bwd per step, and an
        # unmemoized plan() would re-jit the adjoint every time (20-40 s
        # per remote TPU compile)
        key = (planar, tuple(sorted((k, str(v)) for k, v in kw.items())))
        if key not in _adj_cache:
            try:
                # inherit the primal's params (use_pallas/precision/
                # radices) — the adjoint should run the same kernel
                # family the primal does
                _adj_cache[key] = plan(shape, dtype, batch_dims=batch_dims,
                                       planar=planar, norm=flip,
                                       params=params, **kw)
            except ValueError:
                # direction-flipped feasibility can differ (chunk roles
                # swap); fall back to the cache/heuristic point
                _adj_cache[key] = plan(shape, dtype, batch_dims=batch_dims,
                                       planar=planar, norm=flip, **kw)
        return _adj_cache[key]

    def _adj_c2c_planar(ctr, cti):
        # capacity-mode primal -> capacity-mode adjoint: without
        # in_place the backward would need the 2x footprint the primal
        # exists to avoid (the cotangent is a temporary, safe to alias)
        p = _adj_plan(mesh=mesh, inverse=not inverse,
                      batch_sharded=batch_sharded, in_place=in_place)
        return p._fn(ctr, cti)

    def _adj_rfft_planar(ctr, cti):
        # transpose of real -> half-spectrum: zero-pad + inverse c2c,
        # keep the real plane
        fr, fi = _zero_pad_z(ctr, cti, nz, packed)
        p = _adj_plan(mesh=mesh, inverse=True,
                      batch_sharded=batch_sharded)
        zr, _ = p._fn(fr, fi)
        return zr

    def _adj_irfft_planar(y_ct):
        # transpose of the shared even/odd c2r untangle: forward rfft
        # (flipped norm) + interior-bin doubling + pack^T. The packed
        # primal uses the packed adjoint plan directly; the numpy
        # layout folds pack o rfft_np: p0 = v0 + i*vM, ct_w0 = p0,
        # ct_wM = -i*p0 (interior x2).
        if nz % 2 != 0:
            # ODD N: the primal is Hermitian-extension + c2c inverse +
            # Re (kernels/rfft.py:86-92) — no Nyquist, no pack. Its
            # exact transpose: u = flipped-norm forward fft of the real
            # cotangent; ext^T adds conj(u[n-j]) to bin j>=1, and for a
            # REAL cotangent u[n-j] == conj(u[j]), so the mirror term
            # is just u[j] again: bin 0 weight 1, every other bin
            # weight 2 (_half_weights keeps w[-1] = 2 for odd N).
            p = _adj_plan(mesh=mesh, real=True, inverse=False,
                          batch_sharded=batch_sharded)
            vr, vi = p._fn(y_ct)
            w = _half_weights(vr.shape[-1], nz, packed=False,
                              dtype=vr.dtype)
            return vr * w, vi * w
        if packed:
            p = _adj_plan(mesh=mesh, real=True, inverse=False,
                          packed=True)
            vr, vi = p._fn(y_ct)
            w = _half_weights(vr.shape[-1], nz, packed=True,
                              dtype=vr.dtype)
            return vr * w, vi * w
        p = _adj_plan(mesh=mesh, real=True, inverse=False,
                      batch_sharded=batch_sharded)
        vr, vi = p._fn(y_ct)           # numpy layout (..., M+1)
        m = vr.shape[-1] - 1
        p0r = vr[..., :1] - vi[..., m:]      # p0 = v0 + i*vM (weight 1)
        p0i = vi[..., :1] + vr[..., m:]
        # interior bins double (self + conjugate mirror)
        return (jnp.concatenate([p0r, vr[..., 1:m] * 2.0, p0i], axis=-1),
                jnp.concatenate([p0i, vi[..., 1:m] * 2.0, -p0r], axis=-1))

    if planar_in and planar_out:          # c2c planar
        return _make_linear_wrapper(fn, True,
                                    lambda ct: _adj_c2c_planar(*ct))

    if planar_out and not planar_in:      # rfft planar: real -> pair
        return _make_linear_wrapper(fn, False,
                                    lambda ct: _adj_rfft_planar(*ct))

    if planar_in and not planar_out:      # irfft planar: pair -> real
        return _make_linear_wrapper(fn, True, _adj_irfft_planar)

    # ---- complex calling convention ----
    # JAX's complex-cotangent convention is conj o (R-transpose) o conj.
    # For the symmetric c2c DFT that collapses mathematically to the
    # primal map a*W, but the cotangent arrives with the OUTPUT sharding
    # — so express a*W via the direction-flipped plan (whose in/out
    # shardings are the primal's swapped): a*W*ct = conj(a*G*conj(ct)).
    if not real:
        def _t_c2c(ct):
            # plain C-linear transpose: a*W^T = a*W (symmetric), with
            # the cotangent arriving in the OUTPUT sharding — express
            # via the direction-flipped plan (swapped in/out shardings):
            # a*W*ct = conj(a*G*conj(ct))
            p = _adj_plan(mesh=mesh, inverse=not inverse,
                          batch_sharded=batch_sharded, planar=False)
            return jnp.conj(p._fn(jnp.conj(ct)))

        return _make_linear_wrapper(fn, False, _t_c2c)

    if not inverse:                       # complex rfft: real -> complex
        def _bwd_rfft(ct):
            # conj convention; output real so the outer conj is a no-op
            g = _adj_rfft_planar(jnp.real(ct), -jnp.imag(ct))
            return (g.astype(jnp.float32),)

        return _make_vjp_wrapper(fn, False, _bwd_rfft)

    def _bwd_irfft(ct):                   # complex irfft: complex -> real
        gr, gi = _adj_irfft_planar(ct)
        return (jax.lax.complex(gr, -gi).astype(jnp.dtype(dtype)),)

    return _make_vjp_wrapper(fn, False, _bwd_irfft)
