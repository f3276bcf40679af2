"""Refinable-parameter registry, initialization, and constraints.

One pytree of optimizables replaces the reference's module-level wiring of
~10 auxiliary parameter optimizers (``adorym/optimizers.py:793-1089``).
Every parameter is a real-valued float32 array (complex quantities are
``[..., 2]`` real pairs), so all optimizers are ordinary real transforms and
the complex-gradient conjugation subtlety never arises.

Catalog (SURVEY §2.4; reference creation at ``adorym/ptychography.py:698-734``):
  obj                  [y, x, z, 2]
  probe                [n_modes, py, px, 2]
  probe_defocus_mm     [1]
  probe_pos_offset     [n_theta, 2]
  prj_pos_offset       [n_theta, 2]
  probe_pos_correction [n_theta, n_pos, 2]   (or [n_dists, 2] multi-dist)
  slice_pos_cm_ls      [n_slices]
  free_prop_cm         [n_dists]
  tilt_ls              [3, n_theta]
  prj_affine_ls        [n_dists, 2, 3]
  ctf_lg_kappa         [1]
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ReconConfig
from .optimizers import OptSpec


def build_aux_params(cfg: ReconConfig, n_theta: int, n_pos: int,
                     probe_pos_correction_init=None,
                     slice_pos_cm_ls=None, free_prop_cm=None,
                     tilt_init=None, prj_affine_init=None,
                     ctf_lg_kappa_init=None) -> Dict[str, jnp.ndarray]:
    """Create the auxiliary refinable parameters (excluding obj/probe)."""
    r = cfg.refine
    geo = cfg.geometry
    params: Dict[str, jnp.ndarray] = {}
    if r.optimize_probe_defocusing:
        params['probe_defocus_mm'] = jnp.zeros(1, jnp.float32)
    if r.optimize_probe_pos_offset:
        params['probe_pos_offset'] = jnp.zeros((n_theta, 2), jnp.float32)
    if r.optimize_prj_pos_offset:
        params['prj_pos_offset'] = jnp.zeros((n_theta, 2), jnp.float32)
    if r.optimize_all_probe_pos:
        if probe_pos_correction_init is not None:
            params['probe_pos_correction'] = jnp.asarray(
                probe_pos_correction_init, jnp.float32)
        elif geo.n_dists > 1:
            # Multi-distance holography: one registration shift per distance
            # (``adorym/ptychography.py:709``).
            params['probe_pos_correction'] = jnp.zeros((geo.n_dists, 2),
                                                       jnp.float32)
        else:
            params['probe_pos_correction'] = jnp.zeros((n_theta, n_pos, 2),
                                                       jnp.float32)
    if r.optimize_slice_pos:
        params['slice_pos_cm_ls'] = jnp.asarray(slice_pos_cm_ls, jnp.float32)
    if r.optimize_free_prop:
        fp = free_prop_cm if free_prop_cm is not None else geo.free_prop_cm
        params['free_prop_cm'] = jnp.atleast_1d(jnp.asarray(fp, jnp.float32))
    if r.optimize_tilt or r.fixed_tilt:
        params['tilt_ls'] = (jnp.asarray(tilt_init, jnp.float32)
                             if tilt_init is not None
                             else jnp.zeros((3, n_theta), jnp.float32))
    if r.optimize_prj_affine:
        if prj_affine_init is not None:
            params['prj_affine_ls'] = jnp.asarray(prj_affine_init, jnp.float32)
        else:
            eye = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
            params['prj_affine_ls'] = jnp.tile(eye[None], (geo.n_dists, 1, 1))
    if r.optimize_ctf_lg_kappa:
        # Default: start at log10 of the configured CTF kappa — a bare
        # Reconstructor(ctf_kappa=K) then refines from K exactly like
        # the api's ctf_lg_kappa kwarg (``adorym/ptychography.py:733``).
        if ctf_lg_kappa_init is None:
            ctf_lg_kappa_init = float(np.log10(cfg.train.ctf_kappa))
        params['ctf_lg_kappa'] = jnp.full((1,), ctf_lg_kappa_init, jnp.float32)
    return params


#: Optimizer kinds usable for auxiliary (non-object) leaves; second-order
#: kinds drive only the object, as in the reference where CG/Curveball are
#: created for ``obj`` and every aux optimizer is first-order
#: (``adorym/optimizers.py:809-958``).
_FIRST_ORDER_KINDS = ('adam', 'momentum', 'gd')


def _aux_spec(name: str, kind: str, lr: float) -> OptSpec:
    if kind not in _FIRST_ORDER_KINDS:
        raise ValueError(
            f'optimizer kind {kind!r} for {name!r}: auxiliary parameters '
            f'support first-order kinds {_FIRST_ORDER_KINDS} only')
    return OptSpec(kind=kind, step_size=lr)


def build_opt_specs(cfg: ReconConfig) -> Dict[str, OptSpec]:
    """Per-leaf optimizer specs: the object uses the configured optimizer;
    auxiliary parameters use their per-parameter kind (reference
    ``optimizer_probe`` etc. kwargs, ``adorym/ptychography.py:144-155``),
    defaulting to Adam with their own learning rate
    (``adorym/optimizers.py:809-958``)."""
    r = cfg.refine
    t = cfg.train
    specs: Dict[str, OptSpec] = {}
    if t.optimize_object:
        specs['obj'] = OptSpec(kind=t.optimizer, step_size=t.learning_rate)
    if r.optimize_probe:
        specs['probe'] = _aux_spec('probe', r.probe_optimizer,
                                   r.probe_learning_rate)
    aux = [
        ('probe_defocus_mm', r.optimize_probe_defocusing,
         r.probe_defocusing_optimizer, r.probe_defocusing_learning_rate),
        ('probe_pos_offset', r.optimize_probe_pos_offset,
         r.probe_pos_offset_optimizer, r.probe_pos_offset_learning_rate),
        ('prj_pos_offset', r.optimize_prj_pos_offset,
         r.prj_pos_offset_optimizer, r.prj_pos_offset_learning_rate),
        ('probe_pos_correction', r.optimize_all_probe_pos,
         r.all_probe_pos_optimizer, r.all_probe_pos_learning_rate),
        ('slice_pos_cm_ls', r.optimize_slice_pos,
         r.slice_pos_optimizer, r.slice_pos_learning_rate),
        ('free_prop_cm', r.optimize_free_prop,
         r.free_prop_optimizer, r.free_prop_learning_rate),
        ('tilt_ls', r.optimize_tilt, r.tilt_optimizer, r.tilt_learning_rate),
        ('prj_affine_ls', r.optimize_prj_affine,
         r.prj_affine_optimizer, r.prj_affine_learning_rate),
        ('ctf_lg_kappa', r.optimize_ctf_lg_kappa,
         r.ctf_lg_kappa_optimizer, r.ctf_lg_kappa_learning_rate),
    ]
    for name, on, kind, lr in aux:
        if on:
            specs[name] = _aux_spec(name, kind, lr)
    return specs


def apply_param_constraints(params: Dict[str, jnp.ndarray],
                            cfg: ReconConfig) -> Dict[str, jnp.ndarray]:
    """Post-update stabilizers (``adorym/optimizers.py:1040-1074``):

      * probe_pos_correction: subtract the mean over all leading axes so
        refined positions cannot drift collectively;
      * slice_pos_cm_ls: anchor slice 0 at its original position;
      * prj_affine_ls: pin distance 0's transform to the identity.
    """
    params = dict(params)
    if 'probe_pos_correction' in params:
        ppc = params['probe_pos_correction']
        params['probe_pos_correction'] = ppc - jnp.mean(
            ppc, axis=tuple(range(ppc.ndim - 1)), keepdims=True)
    if 'slice_pos_cm_ls' in params:
        sp = params['slice_pos_cm_ls']
        params['slice_pos_cm_ls'] = sp - sp[0]
    if 'prj_affine_ls' in params:
        eye = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                          params['prj_affine_ls'].dtype)
        params['prj_affine_ls'] = params['prj_affine_ls'].at[0].set(eye)
    return params


def apply_object_constraints(obj: jnp.ndarray, cfg: ReconConfig,
                             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Object-side constraints after each update
    (``adorym/ptychography.py:1135-1158``): non-negativity,
    phase-only/absorption-only projections, finite-support mask."""
    t = cfg.train
    if t.non_negativity and t.unknown_type != 'real_imag':
        obj = jnp.clip(obj, 0.0, None)
    if t.unknown_type == 'delta_beta':
        if t.object_type == 'absorption_only':
            obj = obj.at[..., 0].set(0.0)
        elif t.object_type == 'phase_only':
            obj = obj.at[..., 1].set(0.0)
    else:
        re, im = obj[..., 0], obj[..., 1]
        norm = jnp.sqrt(re ** 2 + im ** 2)
        if t.object_type == 'absorption_only':
            obj = jnp.stack([norm, jnp.zeros_like(im)], axis=-1)
        elif t.object_type == 'phase_only':
            safe = jnp.maximum(norm, 1e-12)
            obj = jnp.stack([re / safe, im / safe], axis=-1)
    if mask is not None:
        # Finite support (``adorym/array_ops.py:239-272``): zero delta/beta
        # outside the mask; real_imag vacuum is (1, 0).
        m = mask.astype(obj.dtype)
        while m.ndim < obj.ndim:
            m = m[..., None]
        if t.unknown_type == 'real_imag':
            vac = jnp.stack([jnp.ones_like(obj[..., 0]),
                             jnp.zeros_like(obj[..., 1])], axis=-1)
            obj = obj * m + vac * (1 - m)
        else:
            obj = obj * m
    return obj


def probe_update_gate(cfg: ReconConfig, global_batch_index) -> jnp.ndarray:
    """Probe-update window (``adorym/optimizers.py:1023``): update only when
    ``probe_update_delay <= i < probe_update_limit``."""
    r = cfg.refine
    lo = r.probe_update_delay
    hi = r.probe_update_limit if r.probe_update_limit is not None else np.inf
    i = global_batch_index
    return jnp.logical_and(i >= lo, i < hi)


def aux_update_gate(cfg: ReconConfig, global_batch_index) -> jnp.ndarray:
    """Auxiliary-parameter update delay (``adorym/optimizers.py:1037``):
    every refinable except obj/probe is frozen until
    ``other_params_update_delay`` global batches have run."""
    return global_batch_index >= cfg.refine.other_params_update_delay
