"""Drop-in reference-compatible API.

``reconstruct_ptychography(**params)`` accepts the reference's kwarg surface
(``adorym/ptychography.py:54-174``) and maps it onto the typed config +
:class:`~adorym_tpu.recon.Reconstructor`.  A user of the reference can point
their demo script's params dict at this function.

``distribution_mode`` maps onto the TPU design: ``'shared_file'`` enables
host-offloaded optimizer moments, ``'distributed_object'`` is object
sharding over the mesh (pass ``parallel_object_axis``).

Intentionally not supported (no TPU equivalent needed / superseded):
  * ``backend``/``cpu_only``/``gpu_index``/``xpu`` — single JAX backend;
  * ``n_split_mpi_ata``, ``core_parallelization``,
    ``precalculate_rotation_coords``, ``cache_dtype``,
    ``dynamic_dropping`` — reference-internal knobs.
Unknown kwargs warn and are ignored.
"""

from __future__ import annotations

import os
import warnings
from typing import Any, Dict, Optional

import numpy as np

from .config import (Geometry, IOConfig, LossConfig, ParallelConfig,
                     ReconConfig, RefineConfig, TrainConfig)
from .constants import PI
from .recon import Reconstructor


_IGNORED = {
    # Backend/device selection and MPI/HDF5 plumbing subsumed by JAX:
    # one implementation, mesh sharding, no lookup tables (computed
    # in-jit — and correct for non-cubic volumes, unlike the reference's
    # f16 tables), no HDF5 caches (cache_dtype), no alltoall splits.
    'backend', 'cpu_only', 'gpu_index', 'xpu', 'core_parallelization',
    'precalculate_rotation_coords', 'cache_dtype', 'n_split_mpi_ata',
    'dist_mode_n_batch_per_update',
    # Dead in the reference (signature-only): dynamic_dropping /
    # dropping_threshold (:161), fourier_disparity (:121).
    'dynamic_dropping', 'dropping_threshold',
    'fourier_disparity', 'debug',
    # optimizer_batch_number_increment ('angle'|'batch') picks the object
    # optimizer's step-counter granularity upstream
    # (adorym/ptychography.py:1267-1271).  Here the counter advances per
    # UPDATE, uniformly: one per batch under 'immediate' (= the
    # reference's 'batch' setting) and one per angle under 'per angle'
    # accumulation (= its default 'angle').  The reference's default
    # 'angle' counting combined with per-batch immediate updates applies
    # a stale Adam bias correction (counter lags the updates); matching
    # that would reproduce an inconsistency, not a behavior.  See
    # PARITY.md deviations.
    'optimizer_batch_number_increment',
    'n_dp_batch', 'run_float64',
    # Dead in the reference itself (accepted but never read anywhere in
    # adorym/ptychography.py's body): probe_circ_mask (signature-only,
    # :161), n_epoch_final_pass (:68), fix_object (:77),
    # dynamic_rate (:161 — the driver hardcodes dynamic_rate=True when it
    # builds the GD optimizer, :427; this package's GD matches that).
    'probe_circ_mask', 'n_epoch_final_pass', 'fix_object', 'dynamic_rate',
}

#: Map a reference per-parameter optimizer kwarg value (an Optimizer object
#: or a kind string) onto an OptSpec kind.
def _optimizer_kind(value, kwarg_name):
    if value is None:
        return 'adam'
    if isinstance(value, str):
        return value.lower()
    name = type(value).__name__.lower().replace('optimizer', '')
    if name in ('adam', 'gd', 'momentum'):
        return name
    warnings.warn(f'{kwarg_name}: cannot map {type(value).__name__} onto a '
                  f'first-order kind; using adam')
    return 'adam'

#: kwargs consumed by probe initialization (``adorym/util.py:198-283``)
_PROBE_KWARGS = {'probe_mag_sigma', 'probe_phase_sigma', 'probe_phase_max',
                 'probe_mag_max', 'aperture_radius', 'beamstop_radius',
                 'probe_defocus_cm'}


def reconstruct_ptychography(
        fname, obj_size, probe_pos=None, theta_st=0.0, theta_end=PI,
        n_theta=None, theta_downsample=None, energy_ev=None, psize_cm=None,
        free_prop_cm=None, raw_data_type='magnitude', is_minus_logged=False,
        slice_pos_cm_ls=None,
        n_epochs='auto', crit_conv_rate=0.03, max_nepochs=200,
        regularizers=None, alpha_d=None, alpha_b=None, gamma=1e-6,
        minibatch_size=None, multiscale_level=1, initial_guess=None,
        random_guess_means_sigmas=(8.7e-7, 5.1e-8, 1e-7, 1e-8),
        n_batch_per_update=1, reweighted_l1=False,
        update_scheme='immediate', unknown_type='delta_beta',
        optimize_object=True, optimizer='adam', learning_rate=1e-5,
        finite_support_mask_path=None, shrink_cycle=None,
        shrink_threshold=1e-9, object_type='normal', non_negativity=False,
        forward_model='auto', forward_algorithm='fresnel', ctf_lg_kappa=1.7,
        binning=1, fresnel_approx=True, pure_projection=False,
        two_d_mode=False, probe_type='gaussian', probe_initial=None,
        probe_extra_defocus_cm=None, n_probe_modes=1,
        rescale_probe_intensity=False, loss_function_type='lsq',
        poisson_multiplier=1.0, beamstop=None, normalize_fft=False,
        safe_zone_width=0, scale_ri_by_k=True, sign_convention=1,
        save_path='.', output_folder=None, save_intermediate=False,
        store_checkpoint=True, use_checkpoint=True,
        force_to_use_checkpoint=False, n_batch_per_checkpoint=10,
        rotate_out_of_loop=False,
        optimize_probe=False, probe_learning_rate=1e-5, optimizer_probe=None,
        probe_update_delay=0, probe_update_limit=None,
        optimize_probe_defocusing=False, probe_defocusing_learning_rate=1e-5,
        optimizer_probe_defocusing=None,
        optimize_probe_pos_offset=False, probe_pos_offset_learning_rate=1e-2,
        optimizer_probe_pos_offset=None,
        optimize_prj_pos_offset=False, prj_pos_offset_learning_rate=1e-2,
        optimizer_prj_pos_offset=None,
        optimize_all_probe_pos=False, all_probe_pos_learning_rate=1e-2,
        optimizer_all_probe_pos=None,
        optimize_slice_pos=False, slice_pos_learning_rate=1e-4,
        optimizer_slice_pos=None,
        optimize_free_prop=False, free_prop_learning_rate=1e-2,
        optimizer_free_prop=None,
        optimize_prj_affine=False, prj_affine_learning_rate=1e-3,
        optimizer_prj_affine=None,
        optimize_tilt=False, tilt_learning_rate=1e-3, optimizer_tilt=None,
        initial_tilt=None,
        optimize_ctf_lg_kappa=False, ctf_lg_kappa_learning_rate=1e-3,
        optimizer_ctf_lg_kappa=None,
        other_params_update_delay=0,
        randomize_probe_pos=False,
        save_intermediate_level='batch', save_history=False,
        common_probe_pos=True, shared_probe_among_angles=True,
        update_using_external_algorithm=None,
        use_epie=False, epie_alpha=0.8, pupil_function=None,
        t_max_min=None, run_bfloat16=False, save_stdout=False,
        distribution_mode=None,
        parallel_data_axis=1, parallel_object_axis=1, use_orbax=False,
        **kwargs) -> Dict[str, Any]:
    """Run a reconstruction from an Adorym-layout HDF5 file.  Returns the
    results dict (object, probe, refined params, loss history)."""
    interpolation = kwargs.pop('interpolation', 'bilinear')
    if interpolation not in ('bilinear', 'nearest'):
        raise ValueError(f'unknown interpolation {interpolation!r}')
    for k in kwargs:
        if k in _IGNORED or k in _PROBE_KWARGS:
            continue
        warnings.warn(f'reconstruct_ptychography: ignoring unsupported '
                      f'kwarg {k!r}')

    from .io.data import RawDataset
    ds = RawDataset(os.path.join(save_path, fname))
    data = ds.all_magnitudes()
    energy_ev = ds.energy_ev(energy_ev)
    psize_cm = ds.psize_cm(psize_cm)
    if free_prop_cm is None:
        free_prop_cm = ds.free_prop_cm(None)
    theta_ls = ds.theta_ls(theta_st, theta_end)
    if obj_size[-1] == 1:
        two_d_mode = True
    # Track which ORIGINAL angle indices survive selection, so per-angle
    # metadata (probe_pos_px_i) is read for the right angles even after
    # downsampling/truncation.
    theta_idx = np.arange(len(theta_ls))
    if two_d_mode:
        theta_idx = theta_idx[:1]
    if theta_downsample:
        theta_idx = theta_idx[::theta_downsample]
    if n_theta is not None and not two_d_mode:
        theta_idx = theta_idx[:n_theta]
    theta_ls = theta_ls[theta_idx]
    data = data[theta_idx]

    if not common_probe_pos:
        # Per-angle scan grids (``adorym/ptychography.py:265-273``): read
        # metadata/probe_pos_px_i for the selected original angles, pad
        # ragged counts to the max by repeating the last position
        # (duplicates only re-weight those spots' gradients slightly).
        per_angle = [ds.probe_pos_per_angle(int(i)) for i in theta_idx]
        n_max = max(len(p) for p in per_angle)
        probe_pos = np.stack([
            np.concatenate([p, np.repeat(p[-1:], n_max - len(p), axis=0)])
            for p in per_angle])
    elif probe_pos is None:
        probe_pos = ds.probe_pos()
    if probe_pos is None:
        probe_pos = np.array([[0.0, 0.0]])
    probe_pos = np.asarray(probe_pos, dtype=np.float64)

    fp = free_prop_cm
    is_multi_dist = (fp is not None and not isinstance(fp, str)
                     and np.size(fp) > 1)
    n_dists = int(np.size(fp)) if is_multi_dist else 1
    if fp is None:
        fp_cfg = None
    elif isinstance(fp, str):
        fp_cfg = fp
    elif np.size(fp) == 1:
        fp_cfg = float(np.ravel(fp)[0])
    else:
        fp_cfg = tuple(float(x) for x in np.ravel(fp))

    if is_multi_dist:
        probe_size = tuple(obj_size[:2])
    else:
        probe_size = tuple(data.shape[-2:])

    reg_list = None
    if regularizers is not None:
        # Accept this package's regularizer dataclasses directly, and map
        # reference-style objects (same class names + alpha_d/alpha_b/gamma
        # attributes) onto them.
        from .models import regularizers as regs_mod
        reg_list = []
        for r in regularizers:
            if isinstance(r, regs_mod.Regularizer):
                reg_list.append(r)
                continue
            name = type(r).__name__
            ours = getattr(regs_mod, name, None)
            if ours is None:
                warnings.warn(f'unknown regularizer {name!r} ignored')
                continue
            kw = {}
            for field in ('alpha_d', 'alpha_b', 'gamma'):
                if hasattr(r, field):
                    kw[field] = getattr(r, field)
            ut = getattr(r, 'unknown_type', unknown_type)
            reg_list.append(ours(ut, **kw))

    geometry = Geometry(
        obj_size=tuple(obj_size), probe_size=probe_size,
        energy_ev=energy_ev, psize_cm=psize_cm, free_prop_cm=fp_cfg,
        binning=binning, fresnel_approx=fresnel_approx,
        sign_convention=sign_convention, two_d_mode=two_d_mode,
        pure_projection=pure_projection, is_minus_logged=is_minus_logged,
        scale_ri_by_k=scale_ri_by_k,
        slice_pos_cm_ls=(tuple(slice_pos_cm_ls)
                         if slice_pos_cm_ls is not None
                         and np.size(slice_pos_cm_ls) > 1 else None),
        n_dists=n_dists,
        safe_zone_width=safe_zone_width if safe_zone_width else (
            None if is_multi_dist else 0))
    loss_cfg = LossConfig(
        loss_function_type=loss_function_type, raw_data_type=raw_data_type,
        poisson_multiplier=poisson_multiplier, normalize_fft=normalize_fft,
        alpha_d=alpha_d or 0.0, alpha_b=alpha_b or 0.0, gamma=gamma or 0.0,
        reweighted_l1=reweighted_l1)
    refine = RefineConfig(
        optimize_probe=optimize_probe, probe_learning_rate=probe_learning_rate,
        probe_optimizer=_optimizer_kind(optimizer_probe, 'optimizer_probe'),
        probe_update_delay=probe_update_delay,
        probe_update_limit=probe_update_limit,
        optimize_probe_defocusing=optimize_probe_defocusing,
        probe_defocusing_learning_rate=probe_defocusing_learning_rate,
        probe_defocusing_optimizer=_optimizer_kind(
            optimizer_probe_defocusing, 'optimizer_probe_defocusing'),
        optimize_probe_pos_offset=optimize_probe_pos_offset,
        probe_pos_offset_learning_rate=probe_pos_offset_learning_rate,
        probe_pos_offset_optimizer=_optimizer_kind(
            optimizer_probe_pos_offset, 'optimizer_probe_pos_offset'),
        optimize_prj_pos_offset=optimize_prj_pos_offset,
        prj_pos_offset_learning_rate=prj_pos_offset_learning_rate,
        prj_pos_offset_optimizer=_optimizer_kind(
            optimizer_prj_pos_offset, 'optimizer_prj_pos_offset'),
        optimize_all_probe_pos=optimize_all_probe_pos,
        all_probe_pos_learning_rate=all_probe_pos_learning_rate,
        all_probe_pos_optimizer=_optimizer_kind(
            optimizer_all_probe_pos, 'optimizer_all_probe_pos'),
        optimize_slice_pos=optimize_slice_pos,
        slice_pos_learning_rate=slice_pos_learning_rate,
        slice_pos_optimizer=_optimizer_kind(optimizer_slice_pos,
                                            'optimizer_slice_pos'),
        optimize_free_prop=optimize_free_prop,
        free_prop_learning_rate=free_prop_learning_rate,
        free_prop_optimizer=_optimizer_kind(optimizer_free_prop,
                                            'optimizer_free_prop'),
        optimize_tilt=optimize_tilt, tilt_learning_rate=tilt_learning_rate,
        tilt_optimizer=_optimizer_kind(optimizer_tilt, 'optimizer_tilt'),
        # Known tilts activate the tilt-rotation branch even without
        # refinement (``adorym/forward_model.py:265-276``).
        fixed_tilt=initial_tilt is not None,
        optimize_prj_affine=optimize_prj_affine,
        prj_affine_learning_rate=prj_affine_learning_rate,
        prj_affine_optimizer=_optimizer_kind(optimizer_prj_affine,
                                             'optimizer_prj_affine'),
        optimize_ctf_lg_kappa=optimize_ctf_lg_kappa,
        ctf_lg_kappa_learning_rate=ctf_lg_kappa_learning_rate,
        ctf_lg_kappa_optimizer=_optimizer_kind(optimizer_ctf_lg_kappa,
                                               'optimizer_ctf_lg_kappa'),
        other_params_update_delay=other_params_update_delay)
    train = TrainConfig(
        n_epochs=n_epochs, crit_conv_rate=crit_conv_rate,
        max_nepochs=max_nepochs,
        minibatch_size=minibatch_size or len(probe_pos),
        learning_rate=learning_rate, optimizer=optimizer,
        optimize_object=optimize_object, update_scheme=update_scheme,
        unknown_type=unknown_type, object_type=object_type,
        non_negativity=non_negativity, shrink_cycle=shrink_cycle,
        shrink_threshold=shrink_threshold,
        randomize_probe_pos=randomize_probe_pos,
        multiscale_level=multiscale_level,
        theta_downsample=theta_downsample,
        n_batch_per_update=n_batch_per_update,
        rotate_out_of_loop=rotate_out_of_loop,
        interpolation=interpolation,
        n_probe_modes=n_probe_modes,
        forward_algorithm=forward_algorithm,
        ctf_kappa=10.0 ** ctf_lg_kappa, run_bfloat16=run_bfloat16)
    io_cfg = IOConfig(
        fname=fname, save_path=save_path,
        output_folder=output_folder or 'recon',
        finite_support_mask_path=finite_support_mask_path,
        save_intermediate=save_intermediate,
        save_intermediate_level=save_intermediate_level,
        save_history=save_history,
        store_checkpoint=store_checkpoint, use_checkpoint=use_checkpoint,
        use_orbax=use_orbax,
        force_to_use_checkpoint=force_to_use_checkpoint,
        n_batch_per_checkpoint=n_batch_per_checkpoint, t_max_min=t_max_min,
        save_stdout=save_stdout)
    # distribution_mode mapping: the reference's three storage/parallelism
    # branches collapse onto the mesh + memory-kind config (SURVEY §2.2).
    offload_state = False
    offload_object = False
    if distribution_mode == 'shared_file':
        # SF kept object/gradient/moments out of device memory via parallel
        # HDF5; the TPU equivalent keeps the optimizer moments in host
        # memory (streamed through HBM once per update) and — when the
        # object itself outgrows HBM and the run qualifies — the object
        # too, as pinned-host y-slabs ('auto').
        offload_state = True
        offload_object = 'auto'
    elif distribution_mode == 'distributed_object':
        if parallel_object_axis <= 1:
            warnings.warn(
                "distribution_mode='distributed_object' maps onto object "
                'sharding over the mesh: pass parallel_object_axis>1 '
                '(z-slab analog) — running unsharded')
    elif distribution_mode is not None:
        warnings.warn(f'unknown distribution_mode {distribution_mode!r} '
                      'ignored')
    parallel = ParallelConfig(data_axis=parallel_data_axis,
                              object_axis=parallel_object_axis,
                              offload_optimizer_state=offload_state,
                              offload_object=offload_object)
    cfg = ReconConfig(geometry=geometry, loss=loss_cfg, refine=refine,
                      train=train, parallel=parallel, io=io_cfg)

    # -- model selection (``adorym/ptychography.py:533-547``) --------------
    if forward_model == 'auto':
        from .models import multidist as md_model
        from .models import ptychography as pt_model
        model = md_model if is_multi_dist else pt_model
    else:
        model = forward_model

    # -- initial object / probe -------------------------------------------
    from .utils.initialize import initialize_object, initialize_probe
    obj_init = initialize_object(
        tuple(obj_size), unknown_type=unknown_type, object_type=object_type,
        initial_guess=initial_guess,
        random_guess_means_sigmas=random_guess_means_sigmas,
        non_negativity=non_negativity, seed=0)
    probe_kwargs = dict(kwargs)
    probe_init = initialize_probe(
        probe_size, probe_type, probe_initial=probe_initial,
        pupil_function=pupil_function, n_probe_modes=n_probe_modes,
        energy_ev=energy_ev, psize_cm=psize_cm,
        sign_convention=sign_convention,
        extra_defocus_cm=probe_extra_defocus_cm,
        data_for_ifft=data[0] if probe_type == 'ifft' else None,
        data_for_rescale=data[0:1] if rescale_probe_intensity else None,
        raw_data_type=raw_data_type, normalize_fft=normalize_fft,
        rescale_intensity=rescale_probe_intensity, seed=0, **probe_kwargs)

    if not shared_probe_among_angles:
        # Independent probe per angle (``adorym/ptychography.py:658-660``).
        probe_init = np.tile(probe_init[None], (len(theta_ls), 1, 1, 1, 1))

    mask = None
    if finite_support_mask_path is not None:
        from .io.output import read_tiff
        mask = read_tiff(finite_support_mask_path)
        if mask.ndim == 2 and len(obj_size) == 3 and obj_size[2] > 1:
            mask = np.repeat(mask[:, :, None], obj_size[2], axis=2)
        elif mask.ndim == 3 and mask.shape[0] == obj_size[2]:
            mask = np.moveaxis(mask, 0, -1)

    out_folder = os.path.join(save_path, output_folder) if output_folder \
        else None

    if use_epie:
        from .conventional import epie_reconstruct
        probe_c = probe_init[0, ..., 0] + 1j * probe_init[0, ..., 1]
        obj_c = obj_init[..., 0, 0] + 1j * obj_init[..., 0, 1] \
            if unknown_type == 'real_imag' else \
            np.ones(obj_size[:2], np.complex64)
        pad = np.maximum(-probe_pos.min(axis=0), 0).astype(int)
        obj_rec, probe_rec = epie_reconstruct(
            data[0], probe_c, probe_pos.astype(int) + pad, obj_c,
            energy_ev=energy_ev, psize_cm=psize_cm, alpha=epie_alpha,
            n_epochs=max_nepochs if n_epochs == 'auto' else int(n_epochs),
            raw_data_type=raw_data_type)
        return {'obj': np.asarray(obj_rec), 'probe': np.asarray(probe_rec)}

    mesh = None
    if parallel_data_axis * parallel_object_axis > 1:
        from .parallel.mesh import make_mesh
        mesh = make_mesh(parallel)

    # The refinable starts at the user's ctf_lg_kappa, like the reference
    # (``adorym/ptychography.py:733``), not at build_aux_params' default.
    aux_init = {}
    if optimize_ctf_lg_kappa:
        aux_init['ctf_lg_kappa'] = float(ctf_lg_kappa)
    if initial_tilt is not None:
        # tilt_ls = initial_tilt verbatim (``adorym/ptychography.py:681-682``).
        aux_init['tilt_ls'] = np.asarray(initial_tilt, np.float32)
    aux_init = aux_init or None

    # -- multiscale schedule (``adorym/ptychography.py:354``) --------------
    results = None
    prev_pass = None
    for level in range(multiscale_level - 1, -1, -1):
        ds_level = 2 ** level
        if ds_level > 1:
            import dataclasses as dc
            small = tuple(max(1, s // ds_level) for s in obj_size[:2]) + \
                (max(1, obj_size[2] // ds_level) if obj_size[2] > 1 else 1,)
            g = dc.replace(geometry, obj_size=small,
                           probe_size=tuple(max(1, p // ds_level)
                                            for p in probe_size),
                           psize_cm=psize_cm * ds_level)
            cfg_l = dc.replace(cfg, geometry=g)
            data_l = data[:, :, ::ds_level, ::ds_level]
            pos_l = probe_pos / ds_level
            obj_l = initialize_object(small, unknown_type=unknown_type,
                                      object_type=object_type,
                                      random_guess_means_sigmas=random_guess_means_sigmas,
                                      non_negativity=non_negativity,
                                      previous_pass=prev_pass, seed=0)
            # Slice the trailing SPATIAL axes: probe_init is
            # [n_modes, py, px, 2], or [n_theta, n_modes, py, px, 2] when
            # shared_probe_among_angles=False.
            probe_l = probe_init[..., ::ds_level, ::ds_level, :]
        else:
            cfg_l = cfg
            data_l = data
            pos_l = probe_pos
            obj_l = obj_init if prev_pass is None else initialize_object(
                tuple(obj_size), unknown_type=unknown_type,
                object_type=object_type,
                random_guess_means_sigmas=random_guess_means_sigmas,
                non_negativity=non_negativity, previous_pass=prev_pass,
                seed=0)
            probe_l = probe_init
        rec = Reconstructor(cfg_l, data=data_l, probe_pos=pos_l,
                            theta_ls=theta_ls, obj_init=obj_l,
                            probe_init=probe_l, beamstop=beamstop,
                            finite_support_mask=(mask if ds_level == 1 else None),
                            aux_init=aux_init,
                            model=model, mesh=mesh, reg_list=reg_list,
                            external_algorithm=update_using_external_algorithm,
                            output_folder=(out_folder if ds_level == 1 else None))
        results = rec.run()
        obj = results['obj']
        prev_pass = (obj[..., 0], obj[..., 1])
    ds.close()
    return results
