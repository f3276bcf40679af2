"""Ptychography / ptychotomography forward model.

TPU-native redesign of ``PtychographyModel``
(``adorym/forward_model.py:164-404``).  The reference's per-spot Python loops
(probe shifting :296-307, sub-object slicing :314-334, per-mode propagation
:337-375) become batched array ops: one vmapped dynamic-slice gather for the
patches, one broadcasted phase-ramp multiply for all sub-pixel probe shifts,
and a single multislice ``lax.scan`` carrying a ``[n_modes, N, y, x]`` wave
stack — everything inside one jitted function.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..config import ReconConfig
from ..constants import wavelength_nm
from ..ops import patches as patch_ops
from ..ops import propagate as prop
from ..ops.fourier import fourier_shift
from ..ops.rotate import rotate, tilt_rotate
from .base import incoherent_mode_sum


def complex_probe(probe):
    """``[n_modes, py, px, 2]`` float -> ``[n_modes, py, px]`` complex."""
    return (probe[..., 0] + 1j * probe[..., 1]).astype(jnp.complex64)


def select_probe(params, batch):
    """Per-angle probes (``shared_probe_among_angles=False``,
    ``adorym/ptychography.py:658-660``): a 5D probe ``[n_theta, n_modes,
    py, px, 2]`` is indexed by the current angle."""
    probe = params['probe']
    if probe.ndim == 5:
        probe = probe[batch['i_theta']]
    return probe


def prepare_probe(params: Dict, batch: Dict, cfg: ReconConfig):
    """Apply global probe refinements: defocus and per-angle position offset
    (``adorym/forward_model.py:249-262``)."""
    geo = cfg.geometry
    probe = complex_probe(select_probe(params, batch))
    if cfg.refine.optimize_probe_defocusing:
        lmbda_nm = wavelength_nm(geo.energy_ev)
        voxel_nm = (geo.psize_cm * 1e7,) * 3
        dist_nm = params['probe_defocus_mm'][0] * 1e6
        h = prop.fresnel_kernel(probe.shape[-2:], voxel_nm, lmbda_nm, dist_nm,
                                fresnel_approx=geo.fresnel_approx,
                                sign_convention=geo.sign_convention)
        probe = prop.ifft2(prop.fft2(probe) * h)
    if cfg.refine.optimize_probe_pos_offset:
        offset = params['probe_pos_offset'][batch['i_theta']]
        probe = fourier_shift(probe, offset)
    return probe


def rotated_object(params: Dict, batch: Dict, cfg: ReconConfig):
    """Rotate the object to the view angle (``adorym/forward_model.py:264-281``).

    2D mode and single-angle runs skip rotation.  With tilt active
    (refined, or fixed via ``initial_tilt``) the rotation is the 3-axis tilt
    sequence, which takes precedence over ``rotate_out_of_loop`` exactly as
    in the reference (``adorym/forward_model.py:265-276``).
    """
    obj = params['obj']
    geo = cfg.geometry
    if geo.two_d_mode:
        return obj
    if cfg.refine.tilt_active:
        tilts = params['tilt_ls'][:, batch['i_theta']]
        # The tilt path stays BILINEAR regardless of ``interpolation``:
        # the reference's tilt branch calls ``w.rotate`` which has no
        # interpolation kwarg (``adorym/forward_model.py:274-276``,
        # ``wrappers.py:1178``) — and nearest's rounded-index gather has
        # zero gradient w.r.t. the angles, which would silently freeze
        # tilt refinement.
        return tilt_rotate(obj, tilts)
    if cfg.train.rotate_out_of_loop:
        # Driver rotates once per angle outside AD and rotates the gradient
        # back (``adorym/ptychography.py:937-940,1069-1078``).
        return obj
    return rotate(obj, batch['theta'], axis=0,
                  method=cfg.train.interpolation)


def shifted_probes(probe, params: Dict, batch: Dict, cfg: ReconConfig):
    """Per-spot sub-pixel probe shifts from ``probe_pos_correction``.

    The reference stacks per-spot Fourier-shifted probes in a Python loop
    (``adorym/forward_model.py:296-307``); here one batched phase-ramp
    multiply produces ``[N, n_modes, py, px]``, sharing the probe's forward
    FFT across the batch.
    """
    if not cfg.refine.optimize_all_probe_pos:
        return probe  # [n_modes, py, px] — shared across the batch
    shifts = params['probe_pos_correction'][batch['i_theta'], batch['ind_batch']]
    from ..ops.fourier import ifft2, shift_phase_ramp
    f = jnp.fft.fft2(probe)                                  # [n_modes, py, px]
    ramp = shift_phase_ramp(probe.shape[-2:], shifts)        # [N, py, px]
    return ifft2(f[None] * ramp[:, None])                    # [N, n_modes, py, px]


def predict(params: Dict, batch: Dict, cfg: ReconConfig,
            pad_arr: Optional[np.ndarray] = None, return_wave: bool = False,
            gather_fn=None):
    """Predicted detected magnitudes ``[N, py, px]`` for one minibatch.

    ``params``: pytree of optimizables (SURVEY §2.4).  ``batch``: traced
    per-batch values — ``i_theta`` (int), ``theta`` (rad), ``pos_batch``
    ``[N, 2]`` float scan positions, ``ind_batch`` ``[N]`` int spot indices.
    ``pad_arr``: static padding from :func:`..ops.patches.calculate_pad`.
    ``return_wave``: return complex exit waves ``[n_modes, N, y, x]`` before
    detection instead (simulation mode, ``adorym/forward_model.py:487-490``).
    ``gather_fn(obj, pos, probe_size)``: optional patch gather override —
    the driver passes the explicit halo-exchange gather when the object is
    sharded over the mesh's 'op' axis.
    """
    geo = cfg.geometry
    obj_rot = rotated_object(params, batch, cfg)

    if pad_arr is None:
        pad_arr = np.zeros((2, 2), dtype=np.int64)
    obj_rot = patch_ops.pad_object(obj_rot, pad_arr, cfg.train.unknown_type)

    pos = jnp.round(batch['pos_batch']).astype(jnp.int32)
    pos = pos + jnp.asarray([pad_arr[0, 0], pad_arr[1, 0]], dtype=jnp.int32)
    if gather_fn is not None:
        subobj = gather_fn(obj_rot, pos, geo.probe_size)
    else:
        # Vacuum-fill semantics for windows past the (padded) edge,
        # matching the reference's off-edge chunk reads
        # (``adorym/util.py:975-997``); with the static scan table the
        # pre-padding already guarantees in-range windows, but traced or
        # caller-supplied positions may not.
        subobj = patch_ops.extract_patches_vacuum(
            obj_rot, pos, geo.probe_size,
            unknown_type=cfg.train.unknown_type)
    return predict_from_patches(params, batch, subobj, cfg,
                                return_wave=return_wave)


def predict_from_patches(params: Dict, batch: Dict, subobj, cfg: ReconConfig,
                         return_wave: bool = False, prebinned_z: bool = False,
                         zmajor: bool = False):
    """Forward model from pre-extracted object patches ``[N, py, px, z, 2]``
    — or, with ``zmajor=True``, ``[zb, 2, N, py, px]`` (the fused Pallas
    kernels' operand layout; extraction emitted it directly and no
    relayout happens on the fused path).

    ``prebinned_z``: the patches' z axis is already reduced in bins of
    ``geometry.binning`` (delta_beta sums) — the driver hoisted the bin
    reduction to once per angle; skip re-binning in the propagator.

    Split out of :func:`predict` so the driver's angle-fused step can
    differentiate at PATCH granularity and scatter-add into its gradient
    accumulator directly (XLA's generic scatter in the extract_patches VJP
    runs well off the HBM roofline)."""
    geo = cfg.geometry
    if prebinned_z and (geo.pure_projection or geo.slice_pos_cm_ls is not None
                        or cfg.train.unknown_type != 'delta_beta'):
        raise ValueError('prebinned_z requires the plain delta_beta '
                         'multislice branch')
    probe = prepare_probe(params, batch, cfg)
    if zmajor:
        if (geo.pure_projection or geo.slice_pos_cm_ls is not None
                or cfg.train.unknown_type != 'delta_beta'):
            raise ValueError('zmajor patches require the plain delta_beta '
                             'multislice branch')
        # Derived split views: consumed only by the non-fused fallback
        # (dead-code-eliminated when the fused kernel takes db_zmajor).
        delta = jnp.moveaxis(subobj[:, 0], 0, -1)
        beta = jnp.moveaxis(subobj[:, 1], 0, -1)
    else:
        # [N, py, px, z, 2]
        delta = subobj[..., 0]
        beta = subobj[..., 1]

    probes = shifted_probes(probe, params, batch, cfg)
    if probes.ndim == 4:
        # [N, n_modes, py, px] -> [n_modes, N, py, px]
        wave = jnp.swapaxes(probes, 0, 1)
    else:
        # shared probe: broadcast (free) to the full [n_modes, N, py, px]
        # stack so the multislice scan carry has a fixed shape.
        wave = jnp.broadcast_to(
            probes[:, None, :, :],
            (probes.shape[0], delta.shape[0]) + probes.shape[-2:])

    db_stack = None if zmajor else subobj
    db_zmajor = subobj if zmajor else None
    if cfg.train.run_bfloat16:
        # One cast of the packed stack (usually a no-op: the bf16-extract
        # path already hands bf16 patches); delta/beta slice from it so
        # every consumer sees the same values.
        if zmajor:
            db_zmajor = subobj.astype(jnp.bfloat16)
            delta = jnp.moveaxis(db_zmajor[:, 0], 0, -1)
            beta = jnp.moveaxis(db_zmajor[:, 1], 0, -1)
        else:
            db_stack = subobj.astype(jnp.bfloat16)
            delta = db_stack[..., 0]
            beta = db_stack[..., 1]

    kappa = None
    if cfg.refine.optimize_ctf_lg_kappa:
        kappa = 10.0 ** params['ctf_lg_kappa'][0]

    if geo.pure_projection:
        exit_wave = prop.pure_projection_modulate(
            delta, beta, wave, geo.energy_ev, geo.psize_cm,
            slice_spacing_cm=geo.slice_spacing_cm,
            unknown_type=cfg.train.unknown_type,
            sign_convention=geo.sign_convention,
            scale_ri_by_k=geo.scale_ri_by_k, kappa=kappa,
            is_minus_logged=geo.is_minus_logged,
            return_sqrt=(cfg.loss.raw_data_type == 'intensity'))
    elif geo.slice_pos_cm_ls is not None:
        slice_pos = (params['slice_pos_cm_ls']
                     if cfg.refine.optimize_slice_pos
                     else jnp.asarray(geo.slice_pos_cm_ls))
        exit_wave = prop.sparse_multislice_propagate(
            delta, beta, wave, geo.energy_ev, geo.psize_cm, slice_pos,
            unknown_type=cfg.train.unknown_type,
            fresnel_approx=geo.fresnel_approx,
            sign_convention=geo.sign_convention,
            scale_ri_by_k=geo.scale_ri_by_k)
    else:
        fused = {'auto': 'auto', 'on': True, 'off': False}[
            cfg.train.fused_multislice]
        # Hand the detector propagation to the propagator so the fused
        # Pallas path can fold it into its last kernel step (the exit wave
        # then never round-trips HBM); ineligible whenever something sits
        # BETWEEN the exit wave and the detector (prj_pos_offset shift) or
        # the distance itself is refined (gradients must flow through the
        # XLA free-space propagation).
        final_prop = None
        if (cfg.train.fuse_farfield != 'off'
                and not cfg.refine.optimize_prj_pos_offset
                and not cfg.refine.optimize_free_prop):
            final_prop = {'free_prop_cm': geo.free_prop_cm,
                          'normalize_fft': cfg.loss.normalize_fft}
        exit_wave = prop.multislice_propagate(
            delta, beta, wave, geo.energy_ev, geo.psize_cm,
            slice_spacing_cm=geo.slice_spacing_cm, binning=geo.binning,
            unknown_type=cfg.train.unknown_type,
            fresnel_approx=geo.fresnel_approx,
            sign_convention=geo.sign_convention,
            scale_ri_by_k=geo.scale_ri_by_k, kappa=kappa, fused=fused,
            prebinned=prebinned_z, mxu_bf16=cfg.train.run_bfloat16,
            final_prop=final_prop, db_stack=db_stack,
            db_zmajor=db_zmajor)
        if final_prop is not None:
            det_wave = exit_wave.astype(jnp.complex64)
            if return_wave:
                return det_wave
            return incoherent_mode_sum(det_wave)

    if cfg.refine.optimize_prj_pos_offset:
        exit_wave = fourier_shift(exit_wave,
                                  params['prj_pos_offset'][batch['i_theta']])

    free_prop_cm = geo.free_prop_cm
    if cfg.refine.optimize_free_prop:
        free_prop_cm = params['free_prop_cm'][0]
    lmbda_nm = wavelength_nm(geo.energy_ev)
    dz_cm = geo.psize_cm if geo.slice_spacing_cm is None else geo.slice_spacing_cm
    voxel_nm = (geo.psize_cm * 1e7, geo.psize_cm * 1e7, dz_cm * 1e7)
    det_wave = prop.free_space_propagate(
        exit_wave.astype(jnp.complex64), free_prop_cm, lmbda_nm, voxel_nm,
        sign_convention=geo.sign_convention,
        normalize_fft=cfg.loss.normalize_fft,
        fresnel_approx=geo.fresnel_approx)

    if return_wave:
        return det_wave
    if geo.pure_projection and geo.is_minus_logged:
        # The modulated "wave" already is the predicted image (real-valued).
        return jnp.abs(det_wave) if det_wave.ndim == 3 else incoherent_mode_sum(det_wave)
    return incoherent_mode_sum(det_wave)
