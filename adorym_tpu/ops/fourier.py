"""Fourier-domain primitives on native complex64 arrays.

The reference keeps every complex quantity as a (real, imag) pair of float
tensors and routes all FFTs through a ~90-function backend-dispatch layer
(``adorym/wrappers.py:674-830``).  On TPU we use native ``jnp.complex64``
end-to-end: XLA has first-class complex FFTs and fuses the surrounding
elementwise work, so the entire wrapper layer disappears.

Conventions (matching the reference):
  * ``fft2`` / ``ifft2`` operate on the last two axes by default and are
    unnormalized unless ``norm='ortho'`` is requested
    (``adorym/wrappers.py:700-724``).
  * ``fourier_shift`` applies the subpixel shift as a phase ramp
    ``exp(-2 pi i (fy * dy + fx * dx))`` in the frequency domain
    (``adorym/propagate.py:25-42``: ``realign_image_fourier``).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _batched_2d(fft_fn, x, norm, axes):
    """Run a 2D FFT with leading batch dims flattened.

    The flatten-reshape forces the operand to a default (row-major) layout
    before the FFT custom-call.  On TPU it is a no-op for already-canonical
    layouts; on the XLA:CPU backend it works around fft_thunk's
    ``IsMonotonicWithDim0Major`` requirement, which GSPMD-partitioned
    gather/transpose chains otherwise violate (RET_CHECK crash).
    """
    if axes != (-2, -1) or x.ndim <= 3:
        return fft_fn(x, axes=axes, norm=norm)
    s = x.shape
    out = fft_fn(x.reshape((-1,) + s[-2:]), axes=(-2, -1), norm=norm)
    return out.reshape(s)


def fft2(x, norm=None, axes=(-2, -1)):
    return _batched_2d(jnp.fft.fft2, x, norm, axes)


def ifft2(x, norm=None, axes=(-2, -1)):
    return _batched_2d(jnp.fft.ifft2, x, norm, axes)


def fftshift2(x, axes=(-2, -1)):
    return jnp.fft.fftshift(x, axes=axes)


def ifftshift2(x, axes=(-2, -1)):
    return jnp.fft.ifftshift(x, axes=axes)


def fft2_and_shift(x, norm=None, axes=(-2, -1)):
    """fftshifted 2D FFT — the Fraunhofer far-field operator
    (``adorym/wrappers.py:726-742``)."""
    return jnp.fft.fftshift(fft2(x, norm=norm, axes=axes), axes=axes)


def ifft2_and_shift(x, norm=None, axes=(-2, -1)):
    """fftshifted 2D inverse FFT (``adorym/wrappers.py:745-757``)."""
    return jnp.fft.fftshift(ifft2(x, norm=norm, axes=axes), axes=axes)


def ishift_and_ifft2(x, norm=None, axes=(-2, -1)):
    """Inverse of :func:`fft2_and_shift` (``adorym/wrappers.py:760-772``)."""
    return ifft2(jnp.fft.ifftshift(x, axes=axes), norm=norm, axes=axes)


@functools.lru_cache(maxsize=64)
def _freq_grids(shape: tuple) -> tuple:
    """Cached (fy, fx) pixel-frequency grids for a 2D shape (cycles/pixel)."""
    fy = np.fft.fftfreq(shape[0]).astype(np.float32)[:, None]
    fx = np.fft.fftfreq(shape[1]).astype(np.float32)[None, :]
    return fy, fx


def shift_phase_ramp(shape, shift, dtype=jnp.complex64):
    """Frequency-domain phase ramp implementing a real-space shift.

    ``shift`` is ``(dy, dx)`` in pixels; may be traced (differentiable), and
    may carry leading batch dimensions (``shift[..., 0]`` = dy).  Returns a
    complex array broadcastable against an fft2'd image of ``shape``.
    """
    fy, fx = _freq_grids(tuple(shape))
    fy = jnp.asarray(fy)
    fx = jnp.asarray(fx)
    shift = jnp.asarray(shift)
    dy = shift[..., 0][..., None, None]
    dx = shift[..., 1][..., None, None]
    phase = -2.0 * jnp.pi * (fy * dy + fx * dx)
    return jnp.exp(1j * phase.astype(jnp.float32)).astype(dtype)


def fourier_shift(img, shift, axes=(-2, -1)):
    """Subpixel shift of a (batched) 2D complex image via Fourier phase ramp.

    Matches ``realign_image_fourier`` (``adorym/propagate.py:25-42``):
    a positive ``shift[0]`` moves the image down (+y), ``shift[1]`` right
    (+x).  Differentiable with respect to both ``img`` and ``shift``.

    ``img``: complex array whose last two axes are (y, x) — other axis orders
    can be used via ``axes`` but the ramp broadcast assumes trailing (y, x).
    ``shift``: float array ``[..., 2]`` broadcastable against img's batch dims.
    """
    f = fft2(img, axes=axes)
    shape = (img.shape[axes[0]], img.shape[axes[1]])
    ramp = shift_phase_ramp(shape, shift, dtype=f.dtype)
    return ifft2(f * ramp, axes=axes)


def dft_matrix(n: int, inverse: bool = False, dtype=np.complex64) -> np.ndarray:
    """Dense DFT matrix — lets small FFTs run on the MXU as matmuls.

    On TPU, XLA's FFT runs on the VPU/scalar path; for the small per-patch
    transforms that dominate ptychography (72..256 px), ``F @ X @ F.T`` on
    the 128x128 systolic array can beat the native FFT.  Used by the fused
    Pallas multislice kernel.
    """
    k = np.arange(n)
    sign = 2j if inverse else -2j
    mat = np.exp(sign * np.pi * np.outer(k, k) / n).astype(dtype)
    if inverse:
        mat /= n
    return mat
