"""Image-space helpers: priors, conversions, synthetic masks, resampling.

Gathers the TPU-native equivalents of the reference's scattered image math:
``total_variation[_3d]`` / ``image_gradient`` (``adorym/util.py:1409-1455``),
``pcc`` (``adorym/wrappers.py:1221-1236``), mag/phase conversions
(``adorym/util.py:1591-1599``), disk/gaussian generators
(``adorym/util.py:189-196``, ``generate_disk``), ``upsample_2x``
(``adorym/util.py:1578``), and the ramp filter
(``adorym/wrappers.py:1240-1262``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def total_variation(arr, axes):
    """Mean absolute circular difference along ``axes``
    (``adorym/util.py:1409-1424``)."""
    res = 0.0
    for ax in axes:
        res = res + jnp.sum(jnp.abs(jnp.roll(arr, 1, axis=ax) - arr))
    return res / arr.size


def total_variation_3d(arr, axis_offset=0):
    """3D TV over axes ``axis_offset + (0, 1, 2)``
    (``adorym/util.py:1427-1440``)."""
    return total_variation(arr, (axis_offset, axis_offset + 1, axis_offset + 2))


def image_gradient(arr, axes):
    """Squared roll-difference gradient magnitude map
    (``adorym/util.py:1443-1455``)."""
    g = 0.0
    for ax in axes:
        g = g + (jnp.roll(arr, 1, axis=ax) - arr) ** 2
    return g


def pearson_corr_along_last(arr):
    """Product-form Pearson correlation across the last axis
    (``adorym/wrappers.py:1221-1236``): multiply the centered slices
    elementwise, sum, normalize by the product of stds, abs."""
    centered = arr - jnp.mean(arr, axis=tuple(range(arr.ndim - 1)), keepdims=True)
    nom = jnp.sum(jnp.prod(centered, axis=-1))
    denom = jnp.prod(jnp.std(arr, axis=tuple(range(arr.ndim - 1))))
    return jnp.abs(nom / denom)


def mag_phase_to_real_imag(mag, phase):
    """(``adorym/util.py:1591``)"""
    return mag * jnp.cos(phase), mag * jnp.sin(phase)


def real_imag_to_mag_phase(re, im):
    """(``adorym/util.py:1596``)"""
    return jnp.sqrt(re ** 2 + im ** 2), jnp.arctan2(im, re)


def generate_gaussian_map(size, mag_max, mag_sigma, phase_max, phase_sigma):
    """Centered Gaussian magnitude/phase maps (``adorym/util.py:189-196``).
    Host-side numpy — used only at init time."""
    py = np.arange(size[0]) - (size[0] - 1.0) / 2
    px = np.arange(size[1]) - (size[1] - 1.0) / 2
    pxx, pyy = np.meshgrid(px, py)
    r2 = pxx ** 2 + pyy ** 2
    map_mag = mag_max * np.exp(-r2 / (2 * mag_sigma ** 2))
    map_phase = phase_max * np.exp(-r2 / (2 * phase_sigma ** 2))
    return map_mag, map_phase


def generate_disk(shape, radius, anti_aliasing=5):
    """Antialiased disk mask (reference ``generate_disk``,
    ``adorym/util.py`` near :1470).  Host-side numpy."""
    shape = np.asarray(shape)
    radius = int(radius)
    x = np.linspace(-shape[1] / 2, shape[1] / 2, shape[1] * anti_aliasing)
    y = np.linspace(-shape[0] / 2, shape[0] / 2, shape[0] * anti_aliasing)
    xx, yy = np.meshgrid(x, y)
    a = (xx ** 2 + yy ** 2 <= radius ** 2).astype(np.float64)
    res = a.reshape(shape[0], anti_aliasing, shape[1], anti_aliasing).mean(axis=(1, 3))
    return res


def generate_sphere(shape, radius, anti_aliasing=5):
    """Antialiased solid sphere mask (``adorym/util.py:1458``)."""
    shape = np.asarray(shape)
    aa = anti_aliasing
    grids = np.meshgrid(*[np.linspace(-s / 2, s / 2, s * aa) for s in shape],
                        indexing='ij')
    vol = (sum(g ** 2 for g in grids) <= radius ** 2).astype(np.float64)
    view = vol.reshape(*[d for s in shape for d in (s, aa)])
    return view.mean(axis=tuple(range(1, 2 * len(shape), 2)))


def generate_shell(shape, radius, thickness=1, anti_aliasing=2):
    """Spherical shell mask — the FSC integration element
    (``adorym/util.py`` near :1480)."""
    outer = generate_sphere(shape, radius + thickness / 2, anti_aliasing)
    inner = generate_sphere(shape, radius - thickness / 2, anti_aliasing)
    return outer - inner


def generate_ring(shape, radius, thickness=1, anti_aliasing=2):
    """Annulus mask — the FRC integration element."""
    outer = generate_disk(shape, radius + thickness / 2, anti_aliasing)
    inner = generate_disk(shape, radius - thickness / 2, anti_aliasing)
    return outer - inner


def upsample_2x(arr):
    """Nearest-neighbor 2x upsampling along the first three axes, used by the
    multiscale schedule (``adorym/util.py:1578``)."""
    out = arr
    for ax in range(min(3, arr.ndim)):
        out = np.repeat(out, 2, axis=ax)
    return out


def ramp_filter(arr, axis=2, filter_type='hamming'):
    """Frequency-domain 1D window filter for FBP-style tomography
    (``adorym/wrappers.py:1240-1262``)."""
    import scipy.signal.windows

    n = arr.shape[axis]
    filt = jnp.asarray(getattr(scipy.signal.windows, filter_type)(n),
                       dtype=jnp.float32)
    arr = jnp.moveaxis(arr, axis, -1)
    f = jnp.fft.fft(arr.astype(jnp.complex64), axis=-1) * filt
    arr = jnp.real(jnp.fft.ifft(f, axis=-1))
    return jnp.moveaxis(arr, -1, axis)
