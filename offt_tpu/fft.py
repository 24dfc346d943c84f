"""``numpy.fft``-compatible namespace backed by offt-tpu plans.

The reference exposes a planned FFTW-style C API (offt.h:236-244) and
leaves "I just want ``np.fft.fftn(x)``" to FFTW's own convenience layer.
This module is the switching-user equivalent for offt-tpu: the complete
``numpy.fft`` surface (fft/ifft/rfft/irfft/hfft/ihfft, the 2-D and n-D
variants, and the shift/freq helpers) routed through cached
:func:`offt_tpu.plan` executables, so one-line callers still get the
fused Pallas pipelines, the tuned-plan cache, and autodiff.

Mapping: 1-D and 2-D calls run as degenerate ``(1, 1, n)`` / ``(1, ny,
nz)`` 3-D plans (the METHOD-ONE degenerate-axis pattern the distributed
pipeline already uses, offt-compute.c:3896-3950); n-D calls group the
trailing three transform axes into one fused 3-D plan and peel the
remaining axes in further groups of three. Norms compose exactly across
groups (each group scales by its own axis-product).

Caveats vs numpy:

- dtype follows JAX conventions: float32/complex64 in, complex64 out;
  float64/complex128 route to the fp64 (unfused, 1e-12) pipeline only
  when ``jax_enable_x64`` is on.
- On TPU runtimes without complex host<->device transfer (axon tunnel),
  call these inside ``jax.jit`` or use ``plan(..., planar=True)``
  directly — eager complex *inputs/outputs* cannot cross the boundary
  there (README "planar boundary").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .plan import api as _api

__all__ = [
    "fft", "ifft", "rfft", "irfft", "hfft", "ihfft",
    "fft2", "ifft2", "rfft2", "irfft2",
    "fftn", "ifftn", "rfftn", "irfftn",
    "fftshift", "ifftshift", "fftfreq", "rfftfreq",
    "use_mesh",
]


# ---- plan cache ----------------------------------------------------------

# default mesh for every namespace transform (None = single device).
# numpy has no such concept; this is the one deliberate surface
# extension — numpy-style one-liners running distributed.
_MESH = None


class use_mesh:
    """Route namespace transforms through a device mesh.

    Context manager or plain setter::

        with offt_tpu.fft.use_mesh(make_mesh(2, 4)):
            X = offt_tpu.fft.fft(x)        # distributed long-1-D engine
        offt_tpu.fft.use_mesh(mesh)        # sticky until use_mesh(None)

    1-D c2c calls ride the distributed four-step engine
    (dist/long1d.py) where a P-divisible split exists; 2-D/3-D groups
    ride the pencil pipeline (prefer ``make_mesh(1, p)`` for 2-D — a
    degenerate leading axis on a p1 > 1 mesh pads). Real transforms in
    the numpy M+1 layout fall back to the degenerate single-device
    path on (1, 1, n) shapes; use ``plan(real=True, packed=True)``
    directly for the distributed real 1-D engine.
    """

    def __init__(self, mesh):
        global _MESH
        self._prev = _MESH
        _MESH = mesh

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        global _MESH
        _MESH = self._prev
        return False


@functools.lru_cache(maxsize=256)
def _plan_for_mesh(shape3, dtype, real, inverse, norm, batch_dims, mesh):
    return _api.plan(shape3, dtype, real=real, inverse=inverse,
                     norm=norm, batch_dims=batch_dims, mesh=mesh)


def _plan_cached(shape3, dtype, real, inverse, norm, batch_dims):
    return _plan_for_mesh(shape3, dtype, real, inverse, norm, batch_dims,
                          _MESH)


def _cname(dt) -> str:
    """The transform's complex dtype name for an input dtype (JAX
    promotion rules: only 64-bit inputs under x64 reach the fp64 path)."""
    dt = jnp.dtype(dt)
    if dt in (jnp.dtype(jnp.complex128),) or (
            dt == jnp.dtype(jnp.float64) and jax.config.jax_enable_x64):
        return "complex128"
    return "complex64"


def _rname(cdt: str) -> str:
    return "float64" if cdt == "complex128" else "float32"


def _fix_len(a, axis: int, n: int):
    """numpy's input-length rule: crop to the first ``n`` elements or
    zero-pad at the end."""
    axis = axis % a.ndim
    cur = a.shape[axis]
    if cur > n:
        return jax.lax.slice_in_dim(a, 0, n, axis=axis)
    if cur < n:
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, n - cur)
        return jnp.pad(a, pad)
    return a


# ---- trailing-group plan application -------------------------------------

def _tail_c2c(a, m: int, norm, inverse: bool):
    """c2c transform over the LAST ``m`` (1..3) axes via one plan."""
    lead = a.shape[:a.ndim - m]
    tail = a.shape[a.ndim - m:]
    shape3 = (1,) * (3 - m) + tail
    p = _plan_cached(shape3, _cname(a.dtype), False, inverse, norm,
                     len(lead))
    return p(a.reshape(lead + shape3)).reshape(lead + tail)


def _tail_real_fwd(a, m: int, norm):
    """r2c over the last axis + c2c over the other ``m - 1`` tail axes."""
    lead = a.shape[:a.ndim - m]
    tail = a.shape[a.ndim - m:]
    shape3 = (1,) * (3 - m) + tail
    p = _plan_cached(shape3, _rname(_cname(a.dtype)), True, False, norm,
                     len(lead))
    y = p(a.reshape(lead + shape3))
    return y.reshape(lead + tail[:-1] + (tail[-1] // 2 + 1,))


def _tail_real_inv(a, m: int, n_out: int, norm):
    """c2r (output length ``n_out``) over the last axis + inverse c2c over
    the other ``m - 1`` tail axes. Input last axis must already be
    ``n_out // 2 + 1``.

    numpy semantics (1-D only): the DC (and, for even ``n_out``,
    Nyquist) bins of a 1-D c2r input are real by Hermitian symmetry and
    numpy *discards* their imaginary parts; our packed kernels would
    otherwise consume them (the packed layout carries plane0 +
    i*planeNyq), so zero them for ``m == 1``. For fused multi-axis
    groups those bins still hold the other axes' spectra (imaginary
    parts are real data there, and numpy's own discard happens only
    after its per-axis ifft sweep) — multi-axis inverse real transforms
    agree with numpy on Hermitian-consistent inputs (e.g. any rfftn
    output) and differ only in how inconsistent garbage bins are
    folded."""
    if m == 1:
        idx = jnp.arange(a.shape[-1])
        edge = (idx == 0) | ((n_out % 2 == 0) & (idx == a.shape[-1] - 1))
        a = jnp.where(edge, jnp.real(a).astype(a.dtype), a)
    lead = a.shape[:a.ndim - m]
    tail = a.shape[a.ndim - m:]
    shape3 = (1,) * (3 - m) + tail[:-1] + (n_out,)
    p = _plan_cached(shape3, _cname(a.dtype), True, True, norm, len(lead))
    y = p(a.reshape(lead + (1,) * (3 - m) + tail))
    return y.reshape(lead + tail[:-1] + (n_out,))


def _grouped_c2c(a, k: int, norm, inverse: bool):
    """c2c transform over the last ``k`` axes, three at a time (each
    group one fused plan; FFT axes commute so grouping is free)."""
    if k == 0:
        return a
    m = 3 if k >= 3 else k
    a = _tail_c2c(a, m, norm, inverse)
    if k > m:
        nd = a.ndim
        # park the m done axes at the front of the k-axis tail block so
        # the remaining k-m untransformed axes become the new tail
        a = jnp.moveaxis(a, tuple(range(nd - m, nd)),
                         tuple(range(nd - k, nd - k + m)))
        a = _grouped_c2c(a, k - m, norm, inverse)
        a = jnp.moveaxis(a, tuple(range(nd - k, nd - k + m)),
                         tuple(range(nd - m, nd)))
    return a


def _on_axes(a, axes, fn):
    """Transpose ``axes`` (in order) to the end, apply ``fn``, restore."""
    rest = [i for i in range(a.ndim) if i not in axes]
    order = rest + list(axes)
    a = jnp.transpose(a, order)
    a = fn(a)
    inv = [0] * a.ndim
    for i, ax in enumerate(order):
        inv[ax] = i
    return jnp.transpose(a, inv)


# ---- axes / s resolution (numpy semantics) --------------------------------

def _resolve(a, s, axes):
    if axes is None:
        axes = (list(range(a.ndim)) if s is None
                else list(range(a.ndim - len(s), a.ndim)))
    axes = [ax % a.ndim for ax in axes]
    if s is None:
        s = [a.shape[ax] for ax in axes]
    if len(s) != len(axes):
        raise ValueError("s and axes must have the same length")
    return list(s), axes


# ---- 1-D ------------------------------------------------------------------

def fft(a, n=None, axis=-1, norm=None):
    """1-D c2c FFT along ``axis`` (numpy.fft.fft semantics)."""
    return _fft1(a, n, axis, norm, inverse=False)


def ifft(a, n=None, axis=-1, norm=None):
    return _fft1(a, n, axis, norm, inverse=True)


def _fft1(a, n, axis, norm, inverse):
    a = jnp.asarray(a)
    cdt = _cname(a.dtype)
    if not jnp.iscomplexobj(a):
        a = a.astype(cdt)
    axis = axis % a.ndim
    if n is not None:
        a = _fix_len(a, axis, n)
    if axis != a.ndim - 1:
        return _on_axes(a, [axis], lambda t: _tail_c2c(t, 1, norm, inverse))
    return _tail_c2c(a, 1, norm, inverse)


def rfft(a, n=None, axis=-1, norm=None):
    """1-D r2c FFT: real input -> ``n//2 + 1`` spectrum (numpy layout)."""
    a = jnp.asarray(a)
    if jnp.iscomplexobj(a):
        a = jnp.real(a)
    a = a.astype(_rname(_cname(a.dtype)))
    axis = axis % a.ndim
    if n is not None:
        a = _fix_len(a, axis, n)
    if axis != a.ndim - 1:
        return _on_axes(a, [axis], lambda t: _tail_real_fwd(t, 1, norm))
    return _tail_real_fwd(a, 1, norm)


def irfft(a, n=None, axis=-1, norm=None):
    """1-D c2r inverse: spectrum -> real length ``n`` (default
    ``2 * (m - 1)``)."""
    a = jnp.asarray(a)
    cdt = _cname(a.dtype)
    if not jnp.iscomplexobj(a):
        a = a.astype(cdt)
    axis = axis % a.ndim
    if n is None:
        n = 2 * (a.shape[axis] - 1)
    a = _fix_len(a, axis, n // 2 + 1)
    if axis != a.ndim - 1:
        return _on_axes(a, [axis], lambda t: _tail_real_inv(t, 1, n, norm))
    return _tail_real_inv(a, 1, n, norm)


_SWAP = {None: "forward", "backward": "forward",
         "forward": "backward", "ortho": "ortho"}


def hfft(a, n=None, axis=-1, norm=None):
    """FFT of a Hermitian-symmetric (real-spectrum) signal — real output
    of length ``n`` (default ``2 * (m - 1)``). numpy identity:
    ``hfft(a, n) == irfft(conj(a), n)`` under the swapped norm."""
    if norm not in _SWAP:
        raise ValueError(f"norm must be backward|ortho|forward, got {norm!r}")
    return irfft(jnp.conj(jnp.asarray(a)), n, axis, norm=_SWAP[norm])


def ihfft(a, n=None, axis=-1, norm=None):
    """Inverse of :func:`hfft` (conjugate rfft under the swapped norm)."""
    if norm not in _SWAP:
        raise ValueError(f"norm must be backward|ortho|forward, got {norm!r}")
    return jnp.conj(rfft(a, n, axis, norm=_SWAP[norm]))


# ---- 2-D / n-D ------------------------------------------------------------

def fft2(a, s=None, axes=(-2, -1), norm=None):
    return fftn(a, s, axes, norm)


def ifft2(a, s=None, axes=(-2, -1), norm=None):
    return ifftn(a, s, axes, norm)


def rfft2(a, s=None, axes=(-2, -1), norm=None):
    return rfftn(a, s, axes, norm)


def irfft2(a, s=None, axes=(-2, -1), norm=None):
    return irfftn(a, s, axes, norm)


def fftn(a, s=None, axes=None, norm=None):
    """n-D c2c FFT over ``axes`` (default: all)."""
    return _fftn(a, s, axes, norm, inverse=False)


def ifftn(a, s=None, axes=None, norm=None):
    return _fftn(a, s, axes, norm, inverse=True)


def _fftn(a, s, axes, norm, inverse):
    a = jnp.asarray(a)
    cdt = _cname(a.dtype)
    if not jnp.iscomplexobj(a):
        a = a.astype(cdt)
    s, axes = _resolve(a, s, axes)
    for ax, n in zip(axes, s):
        a = _fix_len(a, ax, n)
    if not axes:
        return a
    if len(set(axes)) != len(axes):
        # numpy allows repeated axes (transform applied repeatedly);
        # peel them one at a time
        for ax in axes:
            a = _fft1(a, None, ax, norm, inverse)
        return a
    return _on_axes(a, axes,
                    lambda t: _grouped_c2c(t, len(axes), norm, inverse))


def rfftn(a, s=None, axes=None, norm=None):
    """n-D real FFT: r2c over ``axes[-1]``, c2c over the rest."""
    a = jnp.asarray(a)
    if jnp.iscomplexobj(a):
        a = jnp.real(a)
    a = a.astype(_rname(_cname(a.dtype)))
    s, axes = _resolve(a, s, axes)
    if not axes:
        raise ValueError("rfftn requires at least one transform axis")
    if len(set(axes)) != len(axes):
        raise ValueError("rfftn does not support repeated axes")
    for ax, n in zip(axes, s):
        a = _fix_len(a, ax, n)
    k = len(axes)
    m = 3 if k >= 3 else k
    # real group: the last m axes of `axes` (contains the r2c axis)
    a = _on_axes(a, axes[k - m:], lambda t: _tail_real_fwd(t, m, norm))
    if k > m:
        a = _fftn(a, None, axes[:k - m], norm, inverse=False)
    return a


def irfftn(a, s=None, axes=None, norm=None):
    """n-D inverse real FFT: inverse c2c over ``axes[:-1]``, c2r over
    ``axes[-1]`` with output length ``s[-1]`` (default
    ``2 * (m - 1)``)."""
    a = jnp.asarray(a)
    cdt = _cname(a.dtype)
    if not jnp.iscomplexobj(a):
        a = a.astype(cdt)
    want_s = s
    s, axes = _resolve(a, s, axes)
    if not axes:
        raise ValueError("irfftn requires at least one transform axis")
    if len(set(axes)) != len(axes):
        raise ValueError("irfftn does not support repeated axes")
    if want_s is None:
        s[-1] = 2 * (a.shape[axes[-1]] - 1)
    for ax, n in zip(axes[:-1], s[:-1]):
        a = _fix_len(a, ax, n)
    n_out = s[-1]
    a = _fix_len(a, axes[-1], n_out // 2 + 1)
    k = len(axes)
    m = 3 if k >= 3 else k
    if k > m:
        a = _fftn(a, None, axes[:k - m], norm, inverse=True)
    return _on_axes(a, axes[k - m:],
                    lambda t: _tail_real_inv(t, m, n_out, norm))


# ---- helpers --------------------------------------------------------------

def fftshift(x, axes=None):
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    return jnp.roll(x, [x.shape[ax] // 2 for ax in axes], axes)


def ifftshift(x, axes=None):
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    return jnp.roll(x, [-(x.shape[ax] // 2) for ax in axes], axes)


def fftfreq(n, d=1.0, *, dtype=None):
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                      else jnp.float32)
    k = jnp.concatenate([jnp.arange(0, (n - 1) // 2 + 1),
                         jnp.arange(-(n // 2), 0)]).astype(dtype)
    return k / (n * d)


def rfftfreq(n, d=1.0, *, dtype=None):
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                      else jnp.float32)
    return jnp.arange(0, n // 2 + 1).astype(dtype) / (n * d)
