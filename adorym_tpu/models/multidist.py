"""Multi-distance near-field holography forward model.

TPU-native redesign of ``MultiDistModel`` (``adorym/forward_model.py:809-1092``).

Physics: a (full-field) probe illuminates the object; the exit wave is
Fresnel-propagated to ``n_dists`` detector distances, producing one hologram
per distance.  Large fields of view are processed as tiles ("blocks") padded
by a *safe zone* so propagation fringes don't wrap at tile edges
(``adorym/forward_model.py:917-995``); the safe zone is cropped after
propagation (:1027-1031).

Data layout matches the reference: ``data[theta, i_dist * n_blocks + block]``
— the driver expands a batch of block indices to all distances via
:func:`expand_indices`.

Registration refinements are applied to the *measured* data, exactly as the
reference does (``adorym/forward_model.py:1066-1088``): per-distance affine
(``prj_affine_ls``), per-angle offset, and per-distance shifts
(``probe_pos_correction`` has shape ``[n_dists, 2]`` here).
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
from ..ops.rotate import rotate
from ..ops.warp import affine_transform_2d
from .base import incoherent_mode_sum
from .ptychography import complex_probe


def _safe_zone_width(cfg: ReconConfig) -> int:
    szw = cfg.geometry.safe_zone_width
    if szw is None:
        # Fringe half-width ~ sqrt(lambda * z) in pixels
        # (the reference demos use ceil(sqrt(lambda z) / psize) * |factor|).
        lmbda_nm = wavelength_nm(cfg.geometry.energy_ev)
        psize_nm = cfg.geometry.psize_cm * 1e7
        fp = cfg.geometry.free_prop_cm
        zmax_nm = float(np.max(np.asarray(fp))) * 1e7
        szw = int(np.ceil(np.sqrt(lmbda_nm * zmax_nm) / psize_nm))
    return szw


def compute_pad(cfg: ReconConfig, obj_size_yx, probe_pos) -> np.ndarray:
    """Static object padding: every safe-zone-expanded tile must be in
    range (``adorym/forward_model.py:917-919``)."""
    szw = _safe_zone_width(cfg)
    sub = cfg.geometry.probe_size
    return patch_ops.calculate_pad(obj_size_yx,
                                   np.asarray(probe_pos) - szw,
                                   (sub[0] + 2 * szw, sub[1] + 2 * szw))


def gather_window(cfg: ReconConfig):
    """The object window each batch element reads: a safe-zone-expanded
    tile.  Lets the driver size the explicit halo-exchange gather for this
    model (op-sharded objects) — safe-zone tiles are just bigger patches."""
    szw = _safe_zone_width(cfg)
    sub = cfg.geometry.probe_size
    return (sub[0] + 2 * szw, sub[1] + 2 * szw)


def expand_indices(inds: np.ndarray, n_pos: int, cfg: ReconConfig) -> np.ndarray:
    """Block indices -> measurement indices for all distances
    (``adorym/forward_model.py:1053-1056``)."""
    n_dists = cfg.geometry.n_dists
    n_blocks = n_pos // n_dists
    return np.concatenate([np.asarray(inds) + i * n_blocks
                           for i in range(n_dists)])


def predict(params: Dict, batch: Dict, cfg: ReconConfig,
            pad_arr: Optional[np.ndarray] = None, return_wave: bool = False,
            gather_fn=None):
    """Predicted hologram magnitudes ``[n_dists * N, sy, sx]``.

    ``batch['pos_batch']``: top-left corners of the N blocks (sub-probe
    tiles); for single-block full-field runs this is ``[[0, 0]]``.
    """
    geo = cfg.geometry
    szw = _safe_zone_width(cfg)
    sub = tuple(geo.probe_size)           # sub-probe (detector) size
    tile = (sub[0] + 2 * szw, sub[1] + 2 * szw)

    obj = params['obj']
    if not geo.two_d_mode:
        obj = rotate(obj, batch['theta'], axis=0,
                     method=cfg.train.interpolation)

    probe = complex_probe(params['probe'])     # [n_modes, Y, X] full field
    if cfg.refine.optimize_probe_defocusing:
        lmbda_nm = wavelength_nm(geo.energy_ev)
        voxel_nm = (geo.psize_cm * 1e7,) * 3
        dist_nm = params['probe_defocus_mm'][0] * 1e6
        h = prop.fresnel_kernel(probe.shape[-2:], voxel_nm, lmbda_nm, dist_nm,
                                fresnel_approx=geo.fresnel_approx,
                                sign_convention=geo.sign_convention)
        probe = prop.ifft2(prop.fft2(probe) * h)

    # Pad object (vacuum) and probe (unit plane wave) by the safe zone so
    # any tile at ``pos - szw`` with size ``tile`` is in range
    # (``adorym/forward_model.py:917-929``).
    pos = jnp.round(batch['pos_batch']).astype(jnp.int32)
    if pad_arr is None:
        pad_arr = np.array([[szw, szw], [szw, szw]], dtype=np.int64)
    obj_p = patch_ops.pad_object(obj, pad_arr, cfg.train.unknown_type)
    probe_p = jnp.pad(probe,
                      [(0, 0), tuple(pad_arr[0]), tuple(pad_arr[1])],
                      constant_values=1.0 + 0.0j)
    tile_pos = pos + jnp.asarray([pad_arr[0][0] - szw, pad_arr[1][0] - szw],
                                 jnp.int32)

    if gather_fn is not None:
        # Explicit halo-exchange gather over an op-sharded object (the
        # driver passes it when the mesh geometry allows).
        subobj = gather_fn(obj_p, tile_pos, tile)
    else:
        subobj = patch_ops.extract_patches(obj_p, tile_pos, tile)
    delta, beta = subobj[..., 0], subobj[..., 1]  # [N,ty,tx,z(,2)]

    def probe_tile(pos2):
        import jax
        return jax.lax.dynamic_slice(
            probe_p, (0, pos2[0], pos2[1]),
            (probe_p.shape[0],) + tile)
    import jax
    subprobe = jax.vmap(probe_tile)(tile_pos)                   # [N,modes,ty,tx]
    wave0 = jnp.swapaxes(subprobe, 0, 1)                        # [modes,N,ty,tx]

    kappa = None
    if cfg.refine.optimize_ctf_lg_kappa:
        kappa = 10.0 ** params['ctf_lg_kappa'][0]

    lmbda_nm = wavelength_nm(geo.energy_ev)
    dz_cm = geo.psize_cm if geo.slice_spacing_cm is None else geo.slice_spacing_cm
    voxel_nm = (geo.psize_cm * 1e7, geo.psize_cm * 1e7, dz_cm * 1e7)

    if cfg.refine.optimize_free_prop:
        dists_cm = params['free_prop_cm']
    else:
        dists_cm = jnp.asarray(np.atleast_1d(np.asarray(geo.free_prop_cm,
                                                        dtype=np.float64)))

    if cfg.train.forward_algorithm == 'fresnel':
        if geo.pure_projection:
            exit_wave = prop.pure_projection_modulate(
                delta, beta, wave0, geo.energy_ev, geo.psize_cm,
                slice_spacing_cm=geo.slice_spacing_cm,
                unknown_type=cfg.train.unknown_type,
                sign_convention=geo.sign_convention,
                scale_ri_by_k=geo.scale_ri_by_k, kappa=kappa)
        else:
            exit_wave = prop.multislice_propagate(
                delta, beta, wave0, geo.energy_ev, geo.psize_cm,
                slice_spacing_cm=geo.slice_spacing_cm, binning=geo.binning,
                unknown_type=cfg.train.unknown_type,
                fresnel_approx=geo.fresnel_approx,
                sign_convention=geo.sign_convention,
                scale_ri_by_k=geo.scale_ri_by_k, kappa=kappa)
        if cfg.refine.optimize_prj_pos_offset:
            exit_wave = fourier_shift(
                exit_wave, params['prj_pos_offset'][batch['i_theta']])
        mags = []
        for i_dist in range(geo.n_dists):
            det = prop.fresnel_propagate(exit_wave, dists_cm[i_dist] * 1e7,
                                         lmbda_nm, voxel_nm,
                                         fresnel_approx=geo.fresnel_approx,
                                         sign_convention=geo.sign_convention)
            mags.append(incoherent_mode_sum(det))
    else:  # 'ctf' branch (adorym/forward_model.py:1011-1012)
        kappa_ctf = 10.0 ** params['ctf_lg_kappa'][0] \
            if 'ctf_lg_kappa' in params else cfg.train.ctf_kappa
        mags = []
        for i_dist in range(geo.n_dists):
            m = prop.modulate_and_get_ctf(delta, beta, geo.energy_ev,
                                          geo.psize_cm, dists_cm[i_dist],
                                          kappa=kappa_ctf)
            mags.append(jnp.abs(m))

    out = jnp.concatenate(mags, axis=0)          # [n_dists*N, ty, tx]
    if return_wave:
        return out
    if szw > 0:
        out = out[:, szw:szw + sub[0], szw:szw + sub[1]]
    return out


def transform_measured(params: Dict, batch: Dict, measured, cfg: ReconConfig):
    """Apply registration refinements to the measured holograms
    (``adorym/forward_model.py:1066-1088``): per-distance affine, per-angle
    global Fourier shift, per-distance Fourier shifts."""
    n_dists = cfg.geometry.n_dists
    N = measured.shape[0] // n_dists
    measured = measured.astype(jnp.complex64)
    if cfg.refine.optimize_prj_affine:
        parts = []
        for i in range(n_dists):
            m = jnp.abs(measured[N * i:N * (i + 1)])
            parts.append(affine_transform_2d(m, params['prj_affine_ls'][i])
                         .astype(jnp.complex64))
        measured = jnp.concatenate(parts)
    if cfg.refine.optimize_probe_pos_offset:
        offset = params['probe_pos_offset'][batch['i_theta']]
        measured = fourier_shift(measured, offset)
    if cfg.refine.optimize_all_probe_pos:
        parts = []
        for i in range(n_dists):
            shift = params['probe_pos_correction'][i]
            parts.append(fourier_shift(measured[N * i:N * (i + 1)], shift))
        measured = jnp.concatenate(parts)
    return jnp.abs(measured)
