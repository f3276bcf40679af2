"""Conventional (non-AD) reconstruction algorithms: ePIE and
multi-distance CTF phase retrieval.

Redesign of ``adorym/conventional.py``.  ePIE's per-position Python loop
with magnitude replacement (:66-69) and the object/probe update rules
(:73-87) become one jitted ``lax.fori_loop`` over scan positions with the
object updated in place on device; the CTF retrieval (:112-151) is a direct
transcription of the filter math on complex arrays.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .constants import PI, wavelength_nm
from .ops.fourier import (fft2, ifft2, fft2_and_shift, fourier_shift,
                          ishift_and_ifft2)
from .ops.propagate import gen_freq_mesh
from .ops.warp import affine_transform_2d


def epie_reconstruct(data, probe, probe_pos, obj_init,
                     energy_ev=None, psize_cm=None, alpha=1.0,
                     n_epochs=100, raw_data_type='magnitude',
                     update_probe=True, probe_pos_correction=None):
    """Classic extended ptychographic iterative engine.

    Args:
      data: ``[n_pos, py, px]`` measured magnitudes (or intensities, per
        ``raw_data_type``) for a single view.
      probe: complex ``[py, px]`` initial probe.
      probe_pos: int ``[n_pos, 2]`` scan positions (non-negative; pre-pad
        the object, cf. ``adorym/conventional.py:28``).
      obj_init: complex ``[Y, X]`` initial transmission.
      probe_pos_correction: optional float ``[n_pos, 2]`` sub-pixel probe
        shifts applied per position (``adorym/conventional.py:42-49``).

    Returns (object, probe) after ``n_epochs`` sweeps.

    Update rules (``adorym/conventional.py:66-87``): Fraunhofer magnitude
    replacement, then
      O += alpha * conj(P) d / max|P|^2 ;  P += alpha * conj(O) d / max|O|^2
    applied per scan position, sequentially (the classic serial ePIE; the
    reference's "minibatch" variant with mean probe updates is recovered
    with ``minibatch_size=1`` semantics).
    """
    data = jnp.abs(jnp.asarray(data))
    if raw_data_type == 'intensity':
        data = jnp.sqrt(data)
    probe = jnp.asarray(probe, jnp.complex64)
    obj = jnp.asarray(obj_init, jnp.complex64)
    pos = jnp.asarray(probe_pos, jnp.int32)
    corr = (None if probe_pos_correction is None
            else jnp.asarray(probe_pos_correction, jnp.float32))
    py, px = probe.shape

    has_corr = corr is not None

    def one_position(carry, j):
        obj, probe, data, pos, corr = carry
        p = pos[j]
        subobj = jax.lax.dynamic_slice(obj, (p[0], p[1]), (py, px))
        probe_j = fourier_shift(probe, corr[j]) if has_corr else probe
        ex = probe_j * subobj
        dp = fft2_and_shift(ex)
        mag = jnp.maximum(jnp.abs(dp), 1e-12)
        dp = dp * (data[j] / mag)
        phi = ishift_and_ifft2(dp)
        d = phi - ex
        o_new = subobj + alpha * jnp.conj(probe_j) * d / jnp.max(jnp.abs(probe_j) ** 2)
        obj = jax.lax.dynamic_update_slice(obj, o_new, (p[0], p[1]))
        if update_probe:
            probe = probe + alpha * jnp.conj(subobj) * d / jnp.max(jnp.abs(subobj) ** 2)
        return (obj, probe, data, pos, corr), None

    # data/pos/corr ride in the carry (jit ARGUMENTS, not closure
    # constants — large float closure constants are corrupted by the axon
    # TPU remote compile).
    @jax.jit
    def one_epoch(obj, probe, data, pos, corr):
        (obj, probe, *_), _ = jax.lax.scan(
            one_position, (obj, probe, data, pos, corr),
            jnp.arange(pos.shape[0]))
        return obj, probe

    if corr is None:
        corr_arg = jnp.zeros((pos.shape[0], 2), jnp.float32)
    else:
        corr_arg = corr
    for _ in range(n_epochs):
        obj, probe = one_epoch(obj, probe, data, pos, corr_arg)
    return obj, probe


def multidistance_ctf(prj_ls, free_prop_cm, energy_ev, psize_cm, kappa=50.0,
                      safe_zone_width=0, prj_affine_ls=None):
    """Multi-distance CTF phase retrieval
    (``multidistance_ctf_wrapped``, ``adorym/conventional.py:112-151``).

    Args:
      prj_ls: ``[n_dists, y, x]`` measured normalized intensities (flat
        field ~ 1).
      free_prop_cm: ``[n_dists]`` propagation distances.

    Returns the retrieved phase map ``[y, x]`` (real).
    """
    prj = jnp.asarray(prj_ls, jnp.float32)
    if prj_affine_ls is not None:
        prj = jnp.stack([affine_transform_2d(prj[i:i + 1],
                                             jnp.asarray(prj_affine_ls[i]))[0]
                         for i in range(prj.shape[0])])
    if safe_zone_width > 0:
        prj = jnp.pad(prj, [(0, 0), (safe_zone_width,) * 2,
                            (safe_zone_width,) * 2], mode='edge')
    lmbda_nm = wavelength_nm(energy_ev)
    voxel_nm = (psize_cm * 1e7,) * 3
    u, v = gen_freq_mesh(voxel_nm, prj.shape[-2:])
    quad = u * u + v * v
    ft = fft2((prj - 1.0).astype(jnp.complex64), norm='ortho')
    dist_nm_ls = np.asarray(free_prop_cm) * 1e7

    num = 0.0
    den = 0.0
    for i in range(len(dist_nm_ls)):
        xi = PI * lmbda_nm * dist_nm_ls[i] * quad
        filt = jnp.sin(xi) + jnp.cos(xi) / kappa
        num = num + filt * ft[i]
        den = den + 2.0 * filt ** 2
    phase = ifft2(num / (den + 1e-10), norm='ortho')
    phase = jnp.real(phase)
    if safe_zone_width > 0:
        phase = phase[safe_zone_width:-safe_zone_width,
                      safe_zone_width:-safe_zone_width]
    return phase
