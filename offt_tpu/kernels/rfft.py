"""Real-input (r2c) and real-output (c2r) 1-D transforms.

The reference gets r2c from FFTW's ``fftw_plan_many_dft_r2c`` along z
(offt-compute.c setup_p1d, is_r2c paths; the Nz/2+1 frequency fold appears
throughout, e.g. offt-compute.c:63). Here we use the classic even/odd
packing: a length-N real FFT = one length-N/2 complex FFT (our MXU
mixed-radix engine) + an O(N) untangle pass that XLA fuses -- halving both
FLOPs and HBM traffic vs. transforming a complexified copy.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .stockham import _as_complex_dtype, fft_1d


def _real_dtype(cdtype) -> jnp.dtype:
    return jnp.dtype(jnp.float64 if jnp.dtype(cdtype) == jnp.complex128 else jnp.float32)


@functools.lru_cache(maxsize=None)
def _half_twiddles(n: int, dtype_name: str, inverse: bool) -> np.ndarray:
    """W^k = exp(-+2i pi k / N) for k = 0..N/2 (float64-generated)."""
    m = n // 2
    k = np.arange(m + 1, dtype=np.float64)
    ang = 2.0 * math.pi * k / n
    w = np.cos(ang) + (1j if inverse else -1j) * np.sin(ang)
    return w.astype(np.dtype(dtype_name))


def rfft_1d(x: jax.Array, axis: int = -1, radices=None,
            fft_fn=None) -> jax.Array:
    """Forward r2c along ``axis``: real (..., N) -> complex (..., N//2+1).

    Matches ``np.fft.rfft``. Even N uses the packed half-length transform;
    odd N falls back to a full c2c and slices the non-negative bins.
    ``fft_fn(v, axis, inverse)`` overrides the inner c2c (e.g. the fused
    Pallas kernel on TPU).
    """
    x = jnp.asarray(x)
    axis = axis % x.ndim
    n = x.shape[axis]
    cdtype = _as_complex_dtype(x.dtype)
    do_fft = fft_fn or (lambda v, ax, inv: fft_1d(v, axis=ax, inverse=inv,
                                                  radices=radices))
    if n % 2 != 0 or n < 2:
        full = do_fft(x.astype(cdtype), axis, False)
        return jax.lax.slice_in_dim(full, 0, n // 2 + 1, axis=axis)
    x = jnp.moveaxis(x, axis, -1)
    m = n // 2
    v = x[..., 0::2].astype(cdtype) + 1j * x[..., 1::2].astype(cdtype)
    vf = do_fft(v, -1, False)
    # V[(M - k) mod M], k = 0..M  (two wrap-around entries)
    vr = jnp.concatenate(
        [vf[..., :1], vf[..., :0:-1], vf[..., :1]], axis=-1
    )  # length M+1
    vf1 = jnp.concatenate([vf, vf[..., :1]], axis=-1)  # V[k], k = 0..M
    xe = 0.5 * (vf1 + jnp.conj(vr))
    xo = -0.5j * (vf1 - jnp.conj(vr))
    w = jnp.asarray(_half_twiddles(n, str(cdtype), inverse=False))
    out = xe + w * xo
    return jnp.moveaxis(out, -1, axis)


def irfft_1d(x: jax.Array, n: int | None = None, axis: int = -1,
             radices=None, fft_fn=None) -> jax.Array:
    """Inverse c2r along ``axis``: complex (..., N//2+1) -> real (..., N).

    Matches ``np.fft.irfft`` (assumes conjugate symmetry of the implied full
    spectrum; scales by 1/N). ``fft_fn`` as in :func:`rfft_1d`.
    """
    x = jnp.asarray(x)
    axis = axis % x.ndim
    nf = x.shape[axis]
    n = n if n is not None else 2 * (nf - 1)
    cdtype = _as_complex_dtype(x.dtype)
    rdtype = _real_dtype(cdtype)
    do_fft = fft_fn or (lambda v, ax, inv: fft_1d(v, axis=ax, inverse=inv,
                                                  radices=radices))
    if n % 2 != 0 or n < 2:
        # rebuild the full spectrum and do a c2c inverse
        x_m = jnp.moveaxis(x.astype(cdtype), axis, -1)
        tail = jnp.conj(x_m[..., 1 : n - nf + 1][..., ::-1])
        full = jnp.concatenate([x_m[..., :nf], tail], axis=-1)
        out = do_fft(full, -1, True).real.astype(rdtype)
        return jnp.moveaxis(out, -1, axis)
    if nf != n // 2 + 1:
        raise ValueError(f"expected {n // 2 + 1} frequency bins, got {nf}")
    x = jnp.moveaxis(x.astype(cdtype), axis, -1)
    m = n // 2
    xr = x[..., ::-1]  # X[M - k], k = 0..M
    xe = 0.5 * (x + jnp.conj(xr))
    w = jnp.asarray(_half_twiddles(n, str(cdtype), inverse=True))  # conj(W^k)
    xo = 0.5 * (x - jnp.conj(xr)) * w
    v = (xe + 1j * xo)[..., :m]
    vt = do_fft(v, -1, True)
    out = jnp.stack([vt.real, vt.imag], axis=-1).reshape(vt.shape[:-1] + (n,))
    return jnp.moveaxis(out.astype(rdtype), -1, axis)
