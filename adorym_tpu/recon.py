"""Reconstruction driver: the training loop.

TPU-native redesign of ``reconstruct_ptychography``
(``adorym/ptychography.py:54-1296``).  Structure:

  * a Python epoch/angle/batch loop that only shuffles indices and slices
    the measured data (host-side, cheap);
  * ONE jitted ``train_step`` doing forward + AD + optimizer + constraints
    on device — the reference's per-batch sequence of rotate / chunk-read /
    grad / allreduce / update / constraint phases
    (``adorym/ptychography.py:859-1262``) collapses into this single
    compiled program;
  * batches are ``minibatch_size`` same-angle scan positions, matching the
    reference's global-batch construction (``adorym/ptychography.py:786-846``).

Distribution: the step function is sharding-agnostic.  Under a device mesh
the object/probe carry ``NamedSharding``s and the measured batch is sharded
over the data axis; XLA inserts the ``psum``s that replace the reference's
MPI allreduce (see ``adorym_tpu.parallel``).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import ReconConfig
from .models import base as model_base
from .models import regularizers as regs
from .models import ptychography as ptycho_model
from .optim import optimizers as opt_lib
from .optim import params as param_lib
from .ops import patches as patch_ops
from .ops import propagate as prop
from .utils import profiling as _prof


def build_regularizers(cfg: ReconConfig) -> List[regs.Regularizer]:
    """Regularizer list from config weights
    (``adorym/ptychography.py:549-564``)."""
    ls: List[regs.Regularizer] = []
    lc = cfg.loss
    ut = cfg.train.unknown_type
    if lc.alpha_d or lc.alpha_b:
        if lc.reweighted_l1:
            ls.append(regs.ReweightedL1Regularizer(ut, lc.alpha_d, lc.alpha_b))
        else:
            ls.append(regs.L1Regularizer(ut, lc.alpha_d, lc.alpha_b))
    if lc.gamma:
        ls.append(regs.TVRegularizer(ut, lc.gamma))
    if lc.corr_reg:
        ls.append(regs.CorrRegularizer(ut, lc.corr_reg))
    if lc.grad_corr_reg:
        ls.append(regs.GradCorrRegularizer(ut, lc.grad_corr_reg))
    return ls



def _band_rotate_fwd(band, valid, theta, cfg, px0, px1):
    """Shared band-decomposition FORWARD (single-device ``step_band`` and
    the mesh ``_build_mc_imm_step.grad_body``): vacuum-fill invalid rows
    (rotation preserves the constant vacuum plane exactly, so filling
    before rotating matches the reference's rotate-then-pad order),
    rotate(+prebin) the band, pad x, cast for bf16 extraction."""
    import numpy as _np
    from .ops.rotate import rotate, rotate_and_bin_z
    geo = cfg.geometry
    if cfg.train.unknown_type == 'real_imag':
        vac = jnp.zeros_like(band).at[..., 0].set(1.0)
    else:
        vac = jnp.zeros_like(band)
    band = jnp.where(valid, band, vac)
    prebin = _band_prebin(cfg)
    interp = cfg.train.interpolation
    if prebin:
        rb = rotate_and_bin_z(band, theta, geo.binning, method=interp)
    else:
        rb = rotate(band, theta, method=interp)
    rb = patch_ops.pad_object(rb, _np.array([[0, 0], [px0, px1]], _np.int64),
                              cfg.train.unknown_type)
    if cfg.train.run_bfloat16:
        rb = rb.astype(jnp.bfloat16)
    return rb


#: Force the tap-gather exact adjoint on/off regardless of backend
#: (None = auto: TPU only, where XLA's scatter lowering of the vjp
#: transpose is serialization-bound).  Tests override this to cover the
#: taps path on the CPU mesh.
FORCE_ADJOINT_TAPS = None


def _use_adjoint_taps(cfg) -> bool:
    if FORCE_ADJOINT_TAPS is not None:
        return bool(FORCE_ADJOINT_TAPS)
    return (cfg.train.interpolation == 'bilinear'
            and jax.default_backend() == 'tpu')


def _band_adjoint_back(acc, valid, theta, cfg, px0, X, nz):
    """Shared band-decomposition BACKWARD: crop the x padding from the
    band cotangent, expand z, apply the EXACT per-plane rotation adjoint
    (the same linear transpose AD uses on the full object), and mask the
    vacuum rows out.

    On TPU (bilinear) the adjoint runs as the tap-GATHER reformulation
    (``rotate_adjoint_taps`` — exact, no scatter, reads the binned
    accumulator directly so the z repeat never materializes); jax.vjp's
    scatter lowering is serialization-bound there (16.4 ms of the
    21.7 ms immediate step, tools/probe_imm.py / NOTES #15)."""
    from .ops.rotate import rotate_adjoint, rotate_adjoint_taps
    geo = cfg.geometry
    gb = acc[:, px0:px0 + X]
    prebin = _band_prebin(cfg)
    if _use_adjoint_taps(cfg) and cfg.train.interpolation == 'bilinear':
        g_band = rotate_adjoint_taps(
            gb, theta, binning=geo.binning if prebin else 1, nz_full=nz)
        return jnp.where(valid, g_band, 0.0)
    if prebin:
        gb = jnp.repeat(gb, geo.binning, axis=2)[:, :, :nz]
    g_band = rotate_adjoint(gb, theta, method=cfg.train.interpolation)
    return jnp.where(valid, g_band, 0.0)


def _band_grad_back(acc, valid, theta, cfg, px0, X, nz):
    """Band-gradient rotate-back dispatch for the immediate scheme: the
    reference-faithful EXACT adjoint (default), or the opt-in -theta
    interpolation (``imm_grad_rotation='interp'``) — a fused gather
    reading the binned accumulator directly, the per-angle scheme's
    default rotate-back approximation.  The exact adjoint is the
    immediate step's dominant cost (16.45 of 21.7 ms at the flagship,
    XLA's serialized scatter lowering of the bilinear-gather transpose;
    tools/probe_imm.py, NOTES #15)."""
    if cfg.train.imm_grad_rotation == 'exact':
        return _band_adjoint_back(acc, valid, theta, cfg, px0, X, nz)
    from .ops.rotate import rotate, rotate_expanded_from_binned_z
    geo = cfg.geometry
    gb = acc[:, px0:px0 + X]
    if _band_prebin(cfg):
        g_band = rotate_expanded_from_binned_z(
            gb, -theta, geo.binning, nz, method=cfg.train.interpolation)
    else:
        g_band = rotate(gb, -theta, method=cfg.train.interpolation)
    return jnp.where(valid, g_band, 0.0)


def _band_prebin(cfg) -> bool:
    geo = cfg.geometry
    return (cfg.train.prebin_z in ('auto', 'on') and geo.binning > 1
            and cfg.train.unknown_type == 'delta_beta'
            and not geo.pure_projection and geo.slice_pos_cm_ls is None)


def _slab_order(keys):
    """Numeric slab-key order ('s0', 's10', 's100' — lexicographic sort
    scrambles above 100 slabs)."""
    return sorted(keys, key=lambda k: int(k[1:]))


def _deslab_obj_state(state):
    """Concatenate slab-dict object optimizer state (written by the
    slab-streamed offload path) back into full arrays."""
    if 'obj' not in state or not isinstance(state['obj'], dict):
        return state
    obj_st = {}
    for name, v in state['obj'].items():
        if isinstance(v, dict) and v and all(k.startswith('s') for k in v):
            obj_st[name] = np.concatenate([v[k] for k in _slab_order(v)],
                                          axis=0)
        else:
            obj_st[name] = v
    return {**state, 'obj': obj_st}


class Reconstructor:
    """Owns params, optimizer state, and the compiled step for one run."""

    def __init__(self, cfg: ReconConfig, *, data: np.ndarray,
                 probe_pos: np.ndarray, theta_ls: Optional[np.ndarray] = None,
                 obj_init: Optional[np.ndarray] = None,
                 probe_init: Optional[np.ndarray] = None,
                 beamstop: Optional[np.ndarray] = None,
                 finite_support_mask: Optional[np.ndarray] = None,
                 aux_init: Optional[Dict[str, Any]] = None,
                 predict_fn=None, model=None, mesh=None,
                 output_folder: Optional[str] = None, reg_list=None,
                 external_algorithm: Optional[str] = None):
        self.cfg = cfg
        geo = cfg.geometry
        # ``data`` may be an in-memory array or a native FastLoader
        # (mmap-backed, threaded prefetch — see io/fastloader.py); with a
        # loader, batch staging overlaps the previous device step.
        from .io import fastloader as fl_mod
        if isinstance(data, fl_mod.FastLoader):
            self.loader = data
            self.data = None
            self.n_theta, self.n_pos = data.shape[:2]
        else:
            self.loader = None
            self.data = np.abs(np.asarray(data)).astype(np.float32)
            self.n_theta = self.data.shape[0]
            self.n_pos = self.data.shape[1]
        # probe_pos: [n_pos, 2] shared across angles, or [n_theta, n_pos, 2]
        # for per-angle scan grids (``common_probe_pos=False``; ragged
        # per-angle counts are padded to the max by the caller, as the
        # reference does at ``adorym/ptychography.py:688-691``).
        self.probe_pos = np.asarray(probe_pos, dtype=np.float64)
        if theta_ls is None:
            theta_ls = np.zeros(self.n_theta)
        self.theta_ls = np.asarray(theta_ls, dtype=np.float32)
        # A "model" is any namespace with a ``predict(params, batch, cfg,
        # pad_arr)`` plus optional hooks: ``transform_measured(params,
        # batch, measured, cfg)`` (multi-dist registration refinements
        # applied to the data) and ``expand_indices(inds, n_pos, cfg)``
        # (batch index -> measurement rows, e.g. one block -> all dists).
        self.model = model or ptycho_model
        self.predict_fn = predict_fn or self.model.predict
        self.transform_measured = getattr(self.model, 'transform_measured', None)
        self.expand_indices = getattr(self.model, 'expand_indices', None)

        # -- parameters ----------------------------------------------------
        from .utils.initialize import initialize_object, initialize_probe
        if obj_init is None:
            obj_init = initialize_object(geo.obj_size,
                                         unknown_type=cfg.train.unknown_type,
                                         object_type=cfg.train.object_type,
                                         non_negativity=cfg.train.non_negativity,
                                         seed=cfg.train.seed)
        if probe_init is None:
            probe_init = initialize_probe(
                geo.probe_size, 'plane', n_probe_modes=cfg.train.n_probe_modes,
                energy_ev=geo.energy_ev, psize_cm=geo.psize_cm)
        params: Dict[str, Any] = {
            'obj': jnp.asarray(obj_init, jnp.float32),
            'probe': jnp.asarray(probe_init, jnp.float32),
        }
        aux_kw = dict(
            slice_pos_cm_ls=geo.slice_pos_cm_ls,
            free_prop_cm=(geo.free_prop_cm
                          if not isinstance(geo.free_prop_cm, str) else None))
        if cfg.refine.tilt_active:
            if geo.two_d_mode:
                # Reference parity (``adorym/forward_model.py:280``).
                raise NotImplementedError(
                    'tilt is not implemented for two_d_mode')
            # The axis-0 tilt component IS the view angle, refined around
            # its nominal value (``adorym/ptychography.py:681-682``).
            aux_kw['tilt_init'] = np.stack([
                self.theta_ls,
                np.zeros_like(self.theta_ls),
                np.zeros_like(self.theta_ls)])
        for k, v in (aux_init or {}).items():
            # aux_init entries override geometry-derived defaults; bare
            # names map onto the *_init kwargs of build_aux_params.
            if k == 'slice_pos_cm_ls' or k == 'free_prop_cm':
                aux_kw[k] = v
            elif k == 'probe_pos_correction':
                aux_kw['probe_pos_correction_init'] = v
            elif k == 'tilt_ls':
                aux_kw['tilt_init'] = v
            elif k == 'prj_affine_ls':
                aux_kw['prj_affine_init'] = v
            elif k == 'ctf_lg_kappa':
                aux_kw['ctf_lg_kappa_init'] = float(np.ravel(v)[0])
            else:
                aux_kw[k] = v
        params.update(param_lib.build_aux_params(
            cfg, self.n_theta, self.n_pos, **aux_kw))
        self.params = params

        # -- sharding ------------------------------------------------------
        # With a mesh, params/optimizer state carry NamedShardings and jit
        # propagates them; XLA inserts the psum/collectives that replace
        # the reference's MPI allreduce/alltoall (SURVEY §2.3).
        self.mesh = mesh
        if mesh is not None:
            from .parallel.mesh import shard_params
            self.params = params = shard_params(params, mesh, cfg.parallel)
            # A minibatch the data axis does not divide (prime widths like
            # the flagship's 23) is handled: the structured fast paths pad
            # spots at weight 0, and the generic path stages such batches
            # replicated (parallel.mesh.batch_specs).

        self.specs = param_lib.build_opt_specs(cfg)
        # Second-order object optimizers keep their own state; auxiliary
        # leaves still use first-order specs (reference behavior:
        # CG/Curveball drive the object, Adam drives the rest).
        self.second_order = cfg.train.optimizer in ('cg', 'curveball')
        if self.second_order:
            self.specs.pop('obj', None)
        if ('obj' in self.specs and cfg.parallel.offload_optimizer_state
                and mesh is None):
            # Host-offloaded moments: never materialize them in HBM — at
            # beyond-HBM object sizes the transient device zeros (2x the
            # object for Adam) would OOM before the offload moves them.
            # eval_shape gives the state structure without allocating;
            # the offload block below device_puts the numpy zeros straight
            # into pinned host memory.
            aux_specs = {k: v for k, v in self.specs.items() if k != 'obj'}
            self.opt_state = opt_lib.tree_init(aux_specs, params)
            st_struct = jax.eval_shape(
                lambda p: opt_lib.opt_init(self.specs['obj'], p),
                params['obj'])
            self.opt_state['obj'] = {
                name: np.zeros(sd.shape, sd.dtype)
                for name, sd in st_struct.items()}
        else:
            self.opt_state = opt_lib.tree_init(self.specs, params)
        if self.second_order and cfg.train.optimize_object:
            from .optim import second_order as so
            if cfg.train.optimizer == 'cg':
                self.opt_state['obj'] = so.cg_init(params['obj'])
            else:
                self.opt_state['obj'] = so.curveball_init(params['obj'])

        # -- statics -------------------------------------------------------
        compute_pad = getattr(self.model, 'compute_pad', None)
        if compute_pad is not None:
            self.pad_arr = compute_pad(cfg, geo.obj_size[:2], self.probe_pos)
        else:
            self.pad_arr = patch_ops.calculate_pad(
                geo.obj_size[:2], self.probe_pos.reshape(-1, 2),
                geo.probe_size)
        # Explicit halo-exchange gather for the object-sharded axis
        # (opt-in; see parallel/halo.py).
        self._gather_fn = None
        # Models that accept a gather_fn: ptychography (probe-size
        # windows) and multi-dist (safe-zone tiles — just bigger patches;
        # ``gather_window`` reports the tile size).
        _gw = getattr(self.model, 'gather_window', None)
        _halo_capable = self.model is ptycho_model or _gw is not None
        if (mesh is not None and cfg.parallel.object_axis > 1
                and cfg.parallel.use_halo_gather  # 'auto' or True
                and _halo_capable):
            y_pad = geo.obj_size[0] + int(self.pad_arr[0][0] + self.pad_arr[0][1])
            n_op = cfg.parallel.object_axis
            window_y = (_gw(cfg)[0] if _gw is not None
                        else geo.probe_size[0])
            if y_pad % n_op == 0 and window_y <= y_pad // n_op:
                from .parallel.halo import sharded_patch_gather
                self._gather_fn = (lambda o, p, ps:
                                   sharded_patch_gather(o, p, ps, mesh))
            elif cfg.parallel.use_halo_gather is True:
                import warnings
                warnings.warn('use_halo_gather requested but geometry does '
                              'not satisfy its constraints; falling back to '
                              'GSPMD partitioning (full-object all-gather '
                              'for the patch gather)')
        if self._gather_fn is None and self.model is ptycho_model:
            # The scan table is static and pad_arr was computed from it, so
            # every window is provably in range: use the plain clamped
            # dynamic-slice gather (measured ~16% faster at flagship shapes
            # than predict's default vacuum-masked gather, whose OOB
            # handling can never trigger here).
            self._gather_fn = patch_ops.extract_patches
        # Structured scatter: when every minibatch is one constant-stride
        # grid row (host-checkable — the table is static and batches are
        # sequential slices), the angle-fused step accumulates gradients at
        # patch granularity with scatter_rowgrid_add instead of XLA's
        # generic scatter (~5x off roofline at flagship shapes).
        self._rowgrid_stride = None
        if (self.model is ptycho_model
                and self.probe_pos.ndim == 2
                and not cfg.train.randomize_probe_pos):
            self._rowgrid_stride = patch_ops.detect_row_grid(
                self.probe_pos, cfg.train.minibatch_size, geo.probe_size)
        # Angle-fused gradient chunking (see angle_step): per-batch fixed
        # costs amortize ~4x when several minibatches share one
        # forward/backward, bounded by an HBM working-set estimate
        # (~3 patch-stacks for fwd+bwd, leaving ~6 object-sized buffers for
        # the rotate/accumulate pipeline).
        for knob, val in (('prebin_z', cfg.train.prebin_z),
                          ('stream_rotation', cfg.train.stream_rotation)):
            if val not in ('auto', 'on', 'off'):
                raise ValueError(f"{knob} must be 'auto'|'on'|'off', "
                                 f"got {val!r}")
        if cfg.train.imm_grad_rotation not in ('exact', 'interp'):
            raise ValueError("imm_grad_rotation must be 'exact'|'interp', "
                             f"got {cfg.train.imm_grad_rotation!r}")
        # Mirror angle_step's ACTUAL patch_mode gate (patch granularity +
        # prebin) so the chunk sizing never assumes binned-depth stacks on
        # a path that moves full-depth ones (e.g. the mesh halo gather).
        self._patch_mode = (mesh is None
                            and (cfg.train.patch_grad
                                 or self._rowgrid_stride is not None)
                            and hasattr(self.model, 'predict_from_patches')
                            and self.transform_measured is None
                            and self._gather_fn is patch_ops.extract_patches)
        self._prebin = (self._patch_mode
                        and cfg.train.prebin_z in ('auto', 'on')
                        and geo.binning > 1
                        and cfg.train.unknown_type == 'delta_beta'
                        and not geo.pure_projection
                        and geo.slice_pos_cm_ls is None)
        nz_patch = geo.obj_size[2]
        if self._prebin:
            # Patch stacks move at binned depth (prebin hoist, angle_step).
            nz_patch = -(-nz_patch // geo.binning)
        patch_bytes = (cfg.train.minibatch_size * geo.probe_size[0]
                       * geo.probe_size[1] * nz_patch * 2 * 4)
        obj_bytes = int(np.prod(geo.obj_size)) * 2 * 4
        # Budgets derive from the actual per-device capacity (measured
        # tuning was on a 16 GB v5e: 10e9 usable after a 6 GB reserve for
        # XLA temporaries/fragmentation, 14.5e9 for data residency).
        from .utils import profiling as _prof
        hbm = _prof.hbm_limit_bytes()
        # Under object offload only BINNED object buffers persist in HBM
        # (the full-res object lives host-side, visited slab-wise) —
        # budget accordingly or beyond-HBM runs collapse to fuse_g=1.
        # Mirrors every engage condition knowable at this point, so the
        # optimistic budget cannot be applied to a run that then keeps
        # the full object in HBM.
        _obj_off_likely = (
            mesh is None and bool(cfg.parallel.offload_object)
            and cfg.parallel.offload_optimizer_state
            and cfg.parallel.offload_slabs > 1
            and self._patch_mode and self._prebin
            and not cfg.train.exact_grad_rotation
            and cfg.train.update_scheme == 'per angle'
            and cfg.train.rotate_out_of_loop
            and cfg.train.n_batch_per_update <= 1
            and not self.second_order
            and not cfg.refine.tilt_active
            and finite_support_mask is None and reg_list is None
            and not (cfg.loss.alpha_d or cfg.loss.alpha_b or cfg.loss.gamma
                     or cfg.loss.corr_reg or cfg.loss.grad_corr_reg)
            and (cfg.parallel.offload_object is True
                 or obj_bytes > _prof.obj_offload_auto_bytes(hbm)))
        _obj_budget = (obj_bytes // max(1, geo.binning)
                       if _obj_off_likely else obj_bytes)
        avail = (hbm - _prof.xla_reserve_bytes(hbm)) - 6 * _obj_budget
        # ~6 patch-stack-sized buffers live through fwd+bwd (patches, their
        # gradient, delta/beta splits, wave stacks) — measured at flagship
        # shapes; g=12 (3 stacks assumed) OOMed by 0.2G on a 16G chip.
        # When the Pallas delta_beta kernel will engage (bf16 auto / forced
        # 'on'), its stored-intermediates variant additionally keeps the
        # per-chunk forward wavefield stack (2 f32 arrays of
        # [n_steps, n_modes, g*mb, py, px] ~= 2*n_modes patch stacks per g)
        # resident through the backward — budget for it so enabling
        # run_bfloat16 at flagship chunk sizes cannot blow the f32-tuned
        # working set.
        pallas_db = (cfg.train.unknown_type == 'delta_beta'
                     and not geo.pure_projection
                     and geo.slice_pos_cm_ls is None and geo.fresnel_approx
                     and (cfg.train.fused_multislice == 'on'
                          or (cfg.train.fused_multislice == 'auto'
                              and cfg.train.run_bfloat16
                              and jax.default_backend() == 'tpu')))
        bufs = 6 + 2 * cfg.train.n_probe_modes if pallas_db else 6
        self._chunk_bufs = bufs
        self._pallas_db = pallas_db
        self._fuse_g = (int(max(1, min(64, avail // max(1, bufs * patch_bytes))))
                        if avail > 0 else 1)
        # Whole-chunk separable grid scatter (scatter_grid2d_add): when the
        # table is a complete 2D grid and chunks carry no padded rows, the
        # per-row tile RMW loop collapses into two lane passes + ONE tile
        # update (+5-8% in-program, interleaved A/B).  NOTE: wrapping the
        # same scatter as a custom-VJP gather backward was a NEGATIVE
        # result (the custom_vjp boundary blocks extract/modulator fusion,
        # 5.5-5.8k vs 6.6-7.3k patterns/s) — only the plain swap ships.
        self._grid_scatter_rows = None
        if self._rowgrid_stride is not None and self.n_pos:
            full = patch_ops.detect_full_grid(
                self.probe_pos, cfg.train.minibatch_size, geo.probe_size)
            mb_ = cfg.train.minibatch_size
            if full is not None and self.n_pos % mb_ == 0:
                n_b = self.n_pos // mb_
                g_ = min(self._fuse_g, n_b)
                if (-(-n_b // g_)) * g_ == n_b:
                    self._grid_scatter_rows = g_
        # Device-resident dataset for the angle path: per-angle H2D staging
        # serializes with compute on remote-dispatch links (measured 4-5x
        # epoch wall at the flagship on the axon tunnel).  Enable when the
        # dataset fits alongside the working set (object buffers + fused
        # patch stacks); multi-chip keeps per-angle staging (the dataset
        # would need dp-sharding, and local links don't have the problem).
        # Device residency beats a larger gradient chunk: per-angle host
        # staging serializes with compute on remote-dispatch links
        # (measured 4-5x epoch wall, round 2) while chunk-fusion gains
        # saturate well below the cap — so when shrinking fuse_g would
        # let the dataset live on-device (inside the conservative
        # xla-reserve budget), shrink it.
        if (mesh is None and self.data is not None
                and not _obj_off_likely):
            # The full xla_reserve double-counts here: the reserve was
            # measured at flagship shapes WITH the chunk buffers this
            # formula already accounts (bufs * patch_bytes * g).  The
            # residual (rotation temps, streams, fragmentation) measured
            # <= 3.8 GB at the 500-angle flagship fit (data 5.48 G +
            # chunks 5.6 G at whole-angle g=23 + object buffers ran with
            # ~3.8 G unaccounted, no OOM); 3.5 GB scaled to HBM keeps a
            # whole-angle chunk there.  v5p note: the residual is
            # program-scoped (rotation temps scale with the OBJECT, which
            # obj_budget already covers; streams/fragmentation track the
            # chunk) — capping is the right shape, but see the TODO(v5p)
            # in utils/profiling.xla_reserve_bytes.
            resid = min(3.5e9, 0.22 * hbm)
            fit = (hbm - resid) - 6 * _obj_budget - self.data.nbytes
            g_fit = int(fit // max(1, bufs * patch_bytes))
            if 1 <= g_fit < self._fuse_g:
                self._fuse_g = g_fit
        ws_bytes = 6 * _obj_budget + bufs * patch_bytes * self._fuse_g
        self._data_dev_ok = (mesh is None
                             and self.data is not None
                             and self.data.nbytes
                             <= (hbm - _prof.data_headroom_bytes(hbm))
                             - ws_bytes)
        if (not self._data_dev_ok and mesh is None
                and self.data is not None
                and jax.default_backend() == 'tpu'):
            # Only the remote-dispatch (TPU tunnel) backend serializes
            # per-angle host staging with compute; local CPU/GPU backends
            # stage cheaply, so the warning would be noise there.
            import warnings
            warnings.warn(
                f'dataset ({self.data.nbytes / 1e9:.2f} GB) does not fit '
                'device-resident next to the working set '
                f'({ws_bytes / 1e9:.2f} GB); per-angle host staging may '
                'serialize with compute on this remote-dispatch link')
        self.beamstop_mask = model_base.make_beamstop_mask(beamstop)
        self.finite_support_mask = (None if finite_support_mask is None
                                    else jnp.asarray(finite_support_mask))
        self.reg_list = (list(reg_list) if reg_list is not None
                         else build_regularizers(cfg))
        self._needs_weight_l1 = any(
            isinstance(r, regs.ReweightedL1Regularizer) for r in self.reg_list)
        self.weight_l1 = (jnp.ones_like(params['obj'])
                          if self._needs_weight_l1 else None)

        # Optional non-AD object update applied after each optimizer step
        # (``update_using_external_algorithm``,
        # ``adorym/array_ops.py:274-286``): 'ctf' replaces the delta channel
        # with the multi-distance CTF retrieval of the measured data.
        self.external_algorithm = external_algorithm

        self.i_opt_batch = 0      # optimizer step counter (i_full_angle)
        self.global_batch = 0     # epoch*n_batch + i_batch, for update gates
        self.loss_history: List[float] = []
        self.stop_requested = False
        self._t_start = time.time()
        self._ckpt_seconds = 0.0
        self._ckpt_warned = False
        from .utils.profiling import Timers
        self.timers = Timers()
        self._data_dev = None   # device-resident dataset (fused epochs)
        self.verbose = False

        # -- outputs / checkpointing (reference output tree; only active
        #    when an output folder is given) ------------------------------
        self.output_folder = output_folder
        self._logger = None
        self._stdout_f = None
        self._start_epoch = 0
        self._start_batch = 0
        if output_folder is not None:
            if cfg.io.save_stdout:
                # Tee progress lines to a timestamped file
                # (``adorym/misc.py:249-257``).  The reference's
                # print_flush always emits the progress lines save_stdout
                # tees, so requesting the tee also turns them on here.
                os.makedirs(output_folder, exist_ok=True)
                ts = time.strftime('%Y%m%d_%H%M%S')
                self._stdout_f = open(
                    os.path.join(output_folder, f'stdout_{ts}.txt'), 'a')
                self.verbose = True
            from .io import checkpoint as ckpt_lib
            from .io import output as out_lib
            os.makedirs(output_folder, exist_ok=True)
            out_lib.write_summary(cfg, output_folder)
            if cfg.io.use_checkpoint:
                restored = ckpt_lib.restore_checkpoint(
                    os.path.join(output_folder, 'checkpoint'))
                if restored is not None:
                    r_params, r_state, i_epoch, i_batch, extra = restored
                    # Object saved as y-slab dicts (object offload runs)
                    # normalizes to a full array; the offload block below
                    # re-splits per the CURRENT config.
                    if isinstance(r_params.get('obj'), dict):
                        r_params = {**r_params, 'obj': np.concatenate(
                            [r_params['obj'][k]
                             for k in _slab_order(r_params['obj'])],
                            axis=0)}
                    # Beyond-HBM restores must NOT materialize the object
                    # or its moments on device (jnp.asarray would commit
                    # tens of GB before the offload blocks re-home them):
                    # keep them as numpy; the offload split device_puts
                    # slab-wise straight to pinned host.
                    keep_host_obj = (bool(cfg.parallel.offload_object)
                                     and mesh is None)
                    keep_host_state = (cfg.parallel.offload_optimizer_state
                                       and mesh is None)
                    self.params = {
                        k: (np.asarray(v) if k == 'obj' and keep_host_obj
                            else jnp.asarray(v))
                        for k, v in r_params.items()}
                    # Checkpoints written under slab-streamed offload store
                    # the obj state as y-slab dicts; normalize to full
                    # arrays (the offload block below re-splits per the
                    # CURRENT config, so slab counts may differ across
                    # runs).
                    r_state = _deslab_obj_state(r_state)
                    self.opt_state = {
                        k: jax.tree.map(
                            np.asarray if k == 'obj' and keep_host_state
                            else jnp.asarray, v)
                        for k, v in r_state.items()}
                    # Checkpoints store the NEXT (epoch, batch) to run,
                    # exactly like the reference's resume position
                    # (``adorym/ptychography.py:848-859``): completed work
                    # is never re-applied.
                    self._start_epoch = i_epoch
                    self._start_batch = int(i_batch)
                    self.i_opt_batch = int(extra.get('i_opt_batch', 0))
                    self.global_batch = int(extra.get('global_batch', 0))
                elif cfg.io.force_to_use_checkpoint:
                    raise FileNotFoundError(
                        'force_to_use_checkpoint set but no checkpoint found')
            self._logger = out_lib.LossLogger(
                output_folder,
                append=self._start_epoch > 0 or self._start_batch > 0)

        # -- out-of-core optimizer state (reference 'shared_file' analog,
        #    ``adorym/optimizers.py:96-113,339-363``): the object's moments
        #    live in pinned host memory and stream through HBM once per
        #    update inside the jitted step. ---------------------------------
        self._off_state = (cfg.parallel.offload_optimizer_state
                           and bool(jax.tree.leaves(
                               self.opt_state.get('obj', {}))))
        # XLA:CPU cannot emit host-memory-kind outputs from jit (the
        # annotate_device_placement custom call is TPU-only), so there the
        # state is re-homed eagerly after each step instead.
        self._rehome_after_step = (self._off_state
                                   and jax.default_backend() == 'cpu')
        self._state_host_sh = self._state_dev_sh = None
        self._off_slabbed = False
        if self._off_state:
            # Slab-stream first-order moments so the update's transient HBM
            # is ~2 slabs, not the full m/v (reference analog: slice-strided
            # file moment updates, ``adorym/optimizers.py:339-363``).  Each
            # slab is a separate host array — slicing a host-resident array
            # inside jit is not portably supported.
            can_slab = ('obj' in self.specs
                        and cfg.parallel.offload_slabs > 1
                        and (mesh is None or cfg.parallel.object_axis == 1))
            if can_slab:
                ny = int(self.params['obj'].shape[0])
                k = min(cfg.parallel.offload_slabs, ny)
                bounds = np.linspace(0, ny, k + 1).astype(int)
                self._slab_keys = [f's{i:02d}' for i in range(k)]
                self._slab_ranges = [(int(bounds[i]),
                                      int(bounds[i + 1] - bounds[i]))
                                     for i in range(k)]
                self.opt_state['obj'] = {
                    name: {key: arr[st:st + sz]
                           for key, (st, sz) in zip(self._slab_keys,
                                                    self._slab_ranges)}
                    for name, arr in self.opt_state['obj'].items()}
                self._off_slabbed = True
            # State leaves are numpy (never-allocated-on-device) on a
            # single chip, jax arrays under a mesh — derive the device
            # sharding from the object param for the former (itself numpy
            # after a beyond-HBM checkpoint restore).
            _obj_sh = getattr(self.params['obj'], 'sharding', None) \
                or jax.sharding.SingleDeviceSharding(jax.devices()[0])
            self._state_dev_sh = jax.tree.map(
                lambda x: getattr(x, 'sharding', _obj_sh)
                .with_memory_kind('device'),
                self.opt_state['obj'])
            self._state_host_sh = jax.tree.map(
                lambda s: s.with_memory_kind('pinned_host'),
                self._state_dev_sh)
            self.opt_state['obj'] = jax.tree.map(
                jax.device_put, self.opt_state['obj'], self._state_host_sh)

        # -- beyond-HBM objects: the object itself lives in pinned host
        #    memory as y-slabs (the last shared-file property,
        #    ``adorym/array_ops.py:62-73``).  Each angle touches HBM with
        #    one slab at a time: slab -> fused rotate+bin (output is
        #    1/binning the size, stays in HBM) for the forward, and
        #    slab -> update -> slab for the optimizer; the full-resolution
        #    object is never device-resident. -----------------------------
        self._obj_offloaded = False
        want_obj_off = cfg.parallel.offload_object
        if want_obj_off == 'auto':
            if mesh is not None:
                # Mesh: each op shard holds obj/object_axis; offload when
                # the PER-DEVICE share crosses the same fit boundary.
                per_dev = obj_bytes / max(1, cfg.parallel.object_axis)
                want_obj_off = (self._off_state
                                and per_dev
                                > _prof.obj_offload_auto_bytes(hbm))
            else:
                want_obj_off = (self._off_slabbed
                                and obj_bytes
                                > _prof.obj_offload_auto_bytes(hbm))
        self._want_obj_off_mesh = False
        if want_obj_off and mesh is not None:
            # Mesh composition: each op shard keeps ITS slab pinned-host
            # (the shard IS the slab — reference analog: N-rank shared-
            # file, ``adorym/array_ops.py:62-73``).  Resolved after the
            # mc-layout build below, which defines the per-angle HBM-visit
            # structure this rides on.
            self._want_obj_off_mesh = cfg.parallel.offload_object
            want_obj_off = False
        if want_obj_off:
            problems = []
            if not self._off_slabbed:
                problems.append('offload_optimizer_state with '
                                'offload_slabs>1')
            if not (self._patch_mode and self._prebin):
                problems.append('the patch-granular prebin angle path '
                                '(row-grid scan table, delta_beta, '
                                'binning>1)')
            if geo.two_d_mode:
                problems.append('a 3D object')
            if cfg.train.exact_grad_rotation:
                problems.append('the interp gradient rotate-back '
                                '(exact_grad_rotation=False)')
            if self.reg_list or self._needs_weight_l1:
                problems.append('no regularizers')
            if self.finite_support_mask is not None:
                problems.append('no finite-support mask')
            if (cfg.train.update_scheme != 'per angle'
                    or not cfg.train.rotate_out_of_loop
                    or cfg.train.n_batch_per_update > 1):
                problems.append("update_scheme='per angle' with "
                                'rotate_out_of_loop')
            if self.second_order:
                problems.append('a first-order object optimizer')
            if cfg.refine.tilt_active:
                problems.append('no tilt')
            if problems:
                if cfg.parallel.offload_object is True:
                    raise ValueError(
                        'offload_object requires: ' + '; '.join(problems))
            else:
                obj = self.params['obj']
                self._obj_dev_sh = {}
                self._obj_host_sh = {}
                slabs = {}
                for key, (st, sz) in zip(self._slab_keys,
                                         self._slab_ranges):
                    sl = obj[st:st + sz]
                    dsh = (getattr(sl, 'sharding', None)
                           or jax.sharding.SingleDeviceSharding(
                               jax.devices()[0])).with_memory_kind('device')
                    self._obj_dev_sh[key] = dsh
                    self._obj_host_sh[key] = dsh.with_memory_kind(
                        'pinned_host')
                    slabs[key] = jax.device_put(sl, self._obj_host_sh[key])
                self.params = {**self.params, 'obj': slabs}
                self._obj_offloaded = True
        if (not self._obj_offloaded
                and isinstance(self.params.get('obj'), np.ndarray)):
            # A host-kept restore whose offload declined (e.g. 'auto' at
            # small scale): back to an ordinary device array.
            self.params = {**self.params,
                           'obj': jnp.asarray(self.params['obj'])}
        self._rehome_after_step = (self._rehome_after_step
                                   or (self._obj_offloaded
                                       and jax.default_backend() == 'cpu'))

        # Mesh patch-granular fast path (the reference's DO mode at full
        # speed): host-side layout + eligibility; the step itself is built
        # inside _build_step.
        self._mc_decline_reasons = []
        self._mc = self._build_mc_layout()
        # Immediate-update scheme (the reference default): its own mesh
        # fast path (band-granular per-batch steps, _build_mc_imm_step).
        self._mci = None
        if self._mc is None and cfg.train.update_scheme == 'immediate':
            # Fresh reasons list: the per-angle layout's scheme-mismatch
            # entry is not a decline of THIS path.
            self._mc_decline_reasons = []
            self._mci = self._build_mc_imm_layout()
        # Mesh x beyond-HBM object: per-op-shard pinned-host slabs,
        # visiting HBM once per angle inside _mc_step (full-res slab in
        # for the fused rotate+bin; slab+moments in/out for the update).
        self._obj_off_mesh = False
        if self._want_obj_off_mesh:
            problems = []
            if self._mc is None:
                problems.append(
                    'the mesh patch-granular fast path ('
                    + ('; '.join(self._mc_decline_reasons) or 'geometry')
                    + ')')
            elif not self._mc['prebin']:
                problems.append('prebin (delta_beta, binning>1)')
            if self.reg_list or self._needs_weight_l1:
                # Regularizers materialize the rotated FULL-res object in
                # HBM (they ride GSPMD outside the shard_map) — defeats
                # the beyond-HBM streaming contract.
                problems.append('no regularizers')
            if not self._off_state:
                problems.append('offload_optimizer_state')
            if problems:
                if self._want_obj_off_mesh is True:
                    raise ValueError('offload_object under a mesh '
                                     'requires: ' + '; '.join(problems))
            else:
                dev_sh = self.params['obj'].sharding
                self._obj_mesh_dev_sh = dev_sh.with_memory_kind('device')
                self._obj_mesh_host_sh = dev_sh.with_memory_kind(
                    'pinned_host')
                self.params = {**self.params,
                               'obj': jax.device_put(
                                   self.params['obj'],
                                   self._obj_mesh_host_sh)}
                self._obj_off_mesh = True
                self._rehome_after_step = (
                    self._rehome_after_step
                    or jax.default_backend() == 'cpu')
        if (self._mc is None and self._mci is None
                and self.mesh is not None
                and cfg.parallel.object_axis > 1):
            # The user explicitly asked for a distributed object; signal
            # that the patch-granular fast path declined (the generic
            # GSPMD/halo path still runs correctly, just unoptimized) —
            # the silent-fallback analog of use_halo_gather's warning.
            import warnings
            why = '; '.join(self._mc_decline_reasons) or 'geometry'
            warnings.warn('mesh patch-granular fast path declined '
                          f'({why}); running the generic GSPMD path')

        self._step = self._build_step()
        if self._obj_offloaded:
            self._build_offl_steps()

    def _build_offl_steps(self):
        """Jitted pieces for the host-streamed-OBJECT angle (one Python
        dispatch per slab instead of one giant program): per-slab
        rotate+bin into the binned buffer, the patch-chunk accumulate,
        the aux update, and per-slab object updates.

        Why separate dispatches: inside one compiled program XLA
        schedules every slab's host<->HBM transfer and update
        concurrently — the full beyond-HBM object in flight at once
        (measured 28 GB scheduled at 1024^3 vs 15.75 GB HBM; an
        optimization_barrier chain only delays consumers while transfer
        buffers stay alive, and barriering the host side trips the
        host-offload pass).  Per-call dispatch bounds residency to ~1
        slab + temps by construction; the ~2x slab-count dispatches per
        angle are noise at beyond-HBM scales."""
        cfg = self.cfg
        geo = cfg.geometry
        from .ops.rotate import (rotate_and_bin_z,
                                 rotate_expanded_from_binned_z)
        binning = geo.binning
        nz_full = geo.obj_size[2]
        k0 = self._slab_keys[0]
        dev_sh = self._obj_dev_sh[k0]
        host_sh = self._obj_host_sh[k0]
        st_dev_sh = {n: self._state_dev_sh[n][k0]
                     for n in self._state_dev_sh}
        st_host_sh = {n: self._state_host_sh[n][k0]
                      for n in self._state_host_sh}
        obj_spec = self.specs['obj']
        cpu = jax.default_backend() == 'cpu'

        def rot_slab(obj_b, host_slab, theta, st):
            slab = jax.device_put(host_slab, dev_sh)
            return jax.lax.dynamic_update_slice_in_dim(
                obj_b, rotate_and_bin_z(slab, theta, binning, method=cfg.train.interpolation),
                st, axis=0)

        def accum(aux, obj_b, theta, i_theta, pos_all, inds_all,
                  measured_all, w_all):
            obj_pad = patch_ops.pad_object(obj_b, self.pad_arr,
                                           cfg.train.unknown_type)
            # Same chunk scan as the in-step patch branch (shared code).
            (acc_obj, acc_aux), losses = self._patch_accum(
                obj_pad, aux, theta, i_theta, pos_all, inds_all,
                measured_all, w_all)
            p = self.pad_arr
            g_binned = acc_obj[p[0][0]:acc_obj.shape[0] - p[0][1],
                               p[1][0]:acc_obj.shape[1] - p[1][1]]
            return g_binned, acc_aux, losses

        def aux_apply(aux_params, aux_state, acc_aux, i_opt_batch,
                      global_batch):
            specs_aux = {k: v for k, v in self.specs.items() if k != 'obj'}
            upd, new_state = opt_lib.tree_apply(
                specs_aux, aux_params, acc_aux, aux_state, i_opt_batch,
                update_mask=self._update_mask(global_batch))
            return param_lib.apply_param_constraints(upd, cfg), new_state

        def slab_update(host_o, host_st, g_binned, theta, i_opt_batch, st):
            sz = host_o.shape[0]
            # Just-in-time full-depth slab gradient: expand the binned
            # accumulator rows and interp-rotate back, per y-plane.
            g_k = rotate_expanded_from_binned_z(
                jax.lax.dynamic_slice_in_dim(g_binned, st, sz, axis=0),
                -theta, binning, nz_full, method=cfg.train.interpolation)
            o_k = jax.device_put(host_o, dev_sh)
            st_k = {n: jax.device_put(host_st[n], st_dev_sh[n])
                    for n in host_st}
            o2, st2 = opt_lib.opt_apply(obj_spec, o_k, g_k, st_k,
                                        i_opt_batch)
            o2 = param_lib.apply_object_constraints(o2, cfg, None)
            return (jax.device_put(o2, host_sh),
                    {n: jax.device_put(v, st_host_sh[n])
                     for n, v in st2.items()})

        self._offl_rot = jax.jit(rot_slab, donate_argnums=(0,))
        self._offl_accum = jax.jit(accum, donate_argnums=(1,))
        self._offl_aux = jax.jit(aux_apply, donate_argnums=(1,))
        self._offl_slab = jax.jit(slab_update,
                                  donate_argnums=(() if cpu else (0, 1)))

    def _run_offl_angle(self, i_theta, pos_all, inds_all, measured, w_all):
        """Drive one angle of the host-streamed-OBJECT path (see
        _build_offl_steps).  Mutates params/opt_state; returns per-batch
        losses [n_c, g]."""
        geo = self.cfg.geometry
        th = jnp.asarray(self.theta_ls[i_theta], jnp.float32)
        it = jnp.asarray(i_theta, jnp.int32)
        iob = jnp.asarray(self.i_opt_batch, jnp.int32)
        gb = jnp.asarray(self.global_batch, jnp.int32)
        nzb = -(-geo.obj_size[2] // geo.binning)
        obj_b = jnp.zeros(
            (geo.obj_size[0], geo.obj_size[1], nzb, 2), jnp.float32)
        for key, (st, sz) in zip(self._slab_keys, self._slab_ranges):
            obj_b = self._offl_rot(obj_b, self.params['obj'][key], th,
                                   jnp.asarray(st, jnp.int32))
        aux = {k: v for k, v in self.params.items() if k != 'obj'}
        aux_state = {k: v for k, v in self.opt_state.items() if k != 'obj'}
        g_binned, acc_aux, losses = self._offl_accum(
            aux, obj_b, th, it, pos_all, inds_all, measured, w_all)
        upd_aux, new_aux_state = self._offl_aux(aux, aux_state, acc_aux,
                                                iob, gb)
        new_obj = {}
        for key, (st, sz) in zip(self._slab_keys, self._slab_ranges):
            host_st = {n: self.opt_state['obj'][n][key]
                       for n in self.opt_state['obj']}
            o2, st2 = self._offl_slab(self.params['obj'][key], host_st,
                                      g_binned, th, iob,
                                      jnp.asarray(st, jnp.int32))
            new_obj[key] = o2
            for n in st2:
                self.opt_state['obj'][n][key] = st2[n]
        self.params = dict(upd_aux)
        self.params['obj'] = new_obj
        self.opt_state = {**new_aux_state, 'obj': self.opt_state['obj']}
        return losses

    def _build_mc_layout(self):
        """Host-side eligibility + static layout for the mesh patch-mode
        angle step (``_mc_step``) — the multi-chip composition of the
        single-chip fast path (patch-granular accumulation, structured
        row-grid scatter, prebin hoist, device-resident data).

        Decomposition (reference semantics ``adorym/util.py:889-1102``, but
        with ZERO host round-trips and only neighbor/psum collectives):

          * the object stays sharded in y-slabs over 'op'; rotation about
            the view axis is per-y-plane, so each shard rotates its own
            slab with no communication (the reference rotates per-rank
            slabs the same way, ``adorym/ptychography.py:930-934``);
          * every minibatch of a row-grid scan table is ONE grid row with a
            single y origin — whole minibatches are owned by the op shard
            whose padded slab contains that origin, so patch extraction and
            the structured scatter are shard-local against a slab extended
            by a probe-height halo (2 tiny ``ppermute``s per angle);
          * 'dp' splits the patches WITHIN each row; the slab gradient
            accumulator is ``psum``'d over 'dp' once per angle;
          * measured data lives device-resident, pre-gathered into the
            (op, dp) layout — per-angle H2D drops to two scalars.

        Returns the layout dict, or None when ineligible (the generic
        GSPMD/halo-gather path then runs instead).
        """
        cfg = self.cfg
        geo = cfg.geometry
        mesh = self.mesh
        if mesh is None:
            return None
        why = self._mc_decline_reasons = []
        # Ragged-aware detection (like the imm layout): a final PARTIAL
        # row is accepted and weight-padded below; the strict single-chip
        # structured-scatter stride (self._rowgrid_stride) stays None for
        # ragged tables.
        rg = None
        if (self.model is ptycho_model and self.probe_pos.ndim == 2
                and not cfg.train.randomize_probe_pos):
            rg = patch_ops.detect_row_grid_ragged(
                self.probe_pos, cfg.train.minibatch_size, geo.probe_size)
        if rg is None:
            why.append('scan table is not a (possibly ragged) '
                       'constant-stride row grid')
        if self.model is not ptycho_model:
            why.append('model is not far-field ptychography')
        elif not hasattr(self.model, 'predict_from_patches'):
            why.append('model has no patch-granular forward')
        if self.transform_measured is not None:
            why.append('measured-data transform active')
        if self.second_order:
            why.append('second-order optimizer')
        if cfg.refine.tilt_active:
            why.append('tilt rotation active')
        if self.data is None:
            why.append('no in-memory dataset')
        if cfg.train.update_scheme != 'per angle':
            why.append("update_scheme is not 'per angle'")
        if cfg.train.n_batch_per_update > 1:
            why.append('n_batch_per_update > 1')
        if self.external_algorithm is not None:
            why.append('external algorithm hook active')
        if why:
            return None
        n_dp = cfg.parallel.data_axis
        n_op = cfg.parallel.object_axis
        mb = cfg.train.minibatch_size
        Y, X, nz = geo.obj_size
        py, px = geo.probe_size
        if Y % n_op:
            why.append(f'divisibility: object y {Y} %% object_axis '
                       f'{n_op} != 0')
            return None
        # Prime/ragged row widths (the REAL flagship scans 23-wide rows,
        # demos/multislice_ptycho_256_theta.py:66-87) pad each row's mb
        # spots to mp*n_dp with weight-0 virtual spots that CONTINUE the
        # row's stride — the per-row mean stays exact (weighted sum / mb)
        # and the structured scatter keeps its constant-stride shape; the
        # analog of the reference's padded alltoall
        # (adorym/util.py:889-1003).
        stride, n_last = rg
        mp = -(-mb // n_dp)
        mb_pad = mp * n_dp
        p = self.pad_arr
        p0, p1 = int(p[0][0]), int(p[0][1])
        px0, px1 = int(p[1][0]), int(p[1][1])
        # Extra vacuum columns keep the padded virtual spots in-frame.
        px1 += stride * (mb_pad - mb)
        # Extra vacuum rows so the padded working extent divides 'op'
        # (harmless: positions are unchanged, the surplus is cropped with
        # the rest of the padding).
        p1 += (-(Y + p0 + p1)) % n_op
        Y_p = Y + p0 + p1
        S_u = Y // n_op
        S_p = Y_p // n_op
        h1, h2 = p0, p1 + py
        if py > S_p or max(h1, h2, p0, p1) > S_u:
            why.append(f'probe height {py} or halo exceeds the per-shard '
                       f'slab ({S_p} padded / {S_u} unpadded rows)')
            return None
        prebin = _band_prebin(cfg)
        nzb = -(-nz // geo.binning) if prebin else nz
        pos = np.round(self.probe_pos).astype(np.int64)
        n_rows = -(-pos.shape[0] // mb)
        y0_pad = pos[::mb, 0] + p0
        owner = y0_pad // S_p
        rows_by = [np.nonzero(owner == k)[0] for k in range(n_op)]
        n_max = max((len(r) for r in rows_by), default=0) or 1
        # Per-device chunk sizing: same working-set model as the
        # single-chip _fuse_g, with slab-sized object buffers and
        # per-device (ceil(mb/n_dp)-wide) patch stacks.
        from .utils import profiling as _prof
        hbm = _prof.hbm_limit_bytes()
        slab_bytes = S_p * (X + px0 + px1) * nzb * 2 * 4
        patch_dev_bytes = mp * py * px * nzb * 2 * 4
        avail = (hbm - _prof.xla_reserve_bytes(hbm)) - 6 * slab_bytes
        g_rows = int(max(1, min(64, n_max,
                                avail // max(1, self._chunk_bufs
                                             * patch_dev_bytes))))
        n_c = -(-n_max // g_rows)
        R = n_c * g_rows
        row_ids = np.zeros((n_op, R), np.int64)
        w = np.zeros((n_op, R), np.float32)
        for k in range(n_op):
            rk = rows_by[k]
            if len(rk):
                row_ids[k, :len(rk)] = rk
                row_ids[k, len(rk):] = rk[-1]
                w[k, :len(rk)] = 1.0
            # shards with no rows run row 0 at weight 0 (pure padding)
        # Per-device patch tables: positions in the shard-LOCAL padded
        # frame (y) / global padded frame (x), spot indices for data and
        # probe_pos_correction.  Spot slots j >= mb are the weight-0
        # virtual pads: index clamps to the row's last real spot (any
        # valid data row works — the weight zeroes the contribution), x
        # continues the row's stride (detect_row_grid guarantees
        # x_j = x_0 + stride*j for the real spots).
        j_all = np.arange(mb_pad)
        # Per-row real-spot counts: mb everywhere except a RAGGED final
        # row (n_last real spots); pads clamp to the row's last real
        # spot, and — matching make_batches's deterministic repeat-last
        # padding — that spot carries weight 1 + n_duplicates, the exact
        # duplicate-spot semantics of the generic per-batch mean.
        nr_row = np.full(n_rows, mb, np.int64)
        nr_row[-1] = n_last
        wrow = np.zeros((n_rows, mb_pad), np.float32)
        for r in range(n_rows):
            wrow[r, :nr_row[r]] = 1.0
            wrow[r, nr_row[r] - 1] += mb - nr_row[r]
        spot = (row_ids[..., None] * mb
                + np.minimum(j_all, (nr_row[row_ids] - 1)[..., None])
                ).reshape(n_op, R, n_dp, mp)
        x_tab = (pos[row_ids * mb, 1][..., None]
                 + stride * j_all).reshape(n_op, R, n_dp, mp)
        # Per-spot weights: row weight x per-row spot weights.
        wsp = (w[..., None]
               * wrow[row_ids]).astype(np.float32).reshape(
                   n_op, R, n_dp, mp)
        y_loc = (y0_pad[row_ids] - np.arange(n_op)[:, None] * S_p)
        pos_mc = np.zeros((n_c, n_op, n_dp, g_rows * mp, 2), np.float32)
        inds_mc = np.zeros((n_c, n_op, n_dp, g_rows * mp), np.int32)
        ws_mc = np.zeros((n_c, n_op, n_dp, g_rows * mp), np.float32)
        for k in range(n_op):
            for c in range(n_c):
                sl = slice(c * g_rows, (c + 1) * g_rows)
                for d in range(n_dp):
                    inds_mc[c, k, d] = spot[k, sl, d].reshape(-1)
                    pos_mc[c, k, d, :, 0] = np.repeat(y_loc[k, sl], mp)
                    pos_mc[c, k, d, :, 1] = x_tab[k, sl, d].reshape(-1) \
                        + px0
                    ws_mc[c, k, d] = wsp[k, sl, d].reshape(-1)
        # Device-resident measured data in the same layout; fall back to
        # the generic path when the per-device share cannot fit next to
        # the working set.
        data_dev_bytes = (self.n_theta * R * mp * py * px * 4)
        if data_dev_bytes > ((hbm - _prof.data_headroom_bytes(hbm))
                             - (6 * slab_bytes + self._chunk_bufs
                                * patch_dev_bytes * g_rows)):
            why.append(f'device-resident data share ({data_dev_bytes / 1e9:.2f}'
                       ' GB/device) does not fit next to the working set')
            return None
        return dict(n_dp=n_dp, n_op=n_op, mb=mb, mp=mp, g_rows=g_rows,
                    n_c=n_c, R=R, S_u=S_u, S_p=S_p, p0=p0, p1=p1, px0=px0,
                    px1=px1, h1=h1, h2=h2, py=py, px=px, Y=Y, X=X, nz=nz,
                    nzb=nzb, prebin=prebin, n_rows=n_rows, stride=stride,
                    n_last=n_last, row_ids=row_ids, w=w, pos_mc=pos_mc,
                    inds_mc=inds_mc, ws_mc=ws_mc, dev=None)

    def _mc_device_tables(self):
        """Lazily stage the static mc tables + the full dataset onto the
        mesh (once per run)."""
        mc = self._mc
        if mc['dev'] is not None:
            return mc['dev']
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp, op = self.cfg.parallel.axis_names
        ns = lambda spec: NamedSharding(self.mesh, spec)
        data_mc = np.empty((self.n_theta, mc['n_op'], mc['n_dp'],
                            mc['R'] * mc['mp'], mc['py'], mc['px']),
                           np.float32)
        for k in range(mc['n_op']):
            for d in range(mc['n_dp']):
                data_mc[:, k, d] = self.data[:, mc['inds_mc'][:, k, d]
                                             .reshape(-1)]
        dev = dict(
            pos=jax.device_put(jnp.asarray(mc['pos_mc']),
                               ns(P(None, op, dp))),
            inds=jax.device_put(jnp.asarray(mc['inds_mc']),
                                ns(P(None, op, dp))),
            w=jax.device_put(jnp.asarray(mc['ws_mc']), ns(P(None, op, dp))),
            data=jax.device_put(jnp.asarray(data_mc), ns(P(None, op, dp))))
        mc['dev'] = dev
        return dev

    def _build_mc_imm_layout(self):
        """Host-side eligibility + static layout for the mesh IMMEDIATE-
        update step (``_build_mc_imm_step``) — the multi-chip composition
        of the reference's DEFAULT ``update_scheme='immediate'``
        (``adorym/ptychography.py:1095-1099``; flagship demo config
        ``demos/multislice_ptycho_256_theta.py:66-87``).

        Decomposition: every minibatch is ONE row of the grid scan table
        (a single y origin), processed by ALL devices — rotation about
        the view axis is per-y-plane, so only the row's ``py`` object
        planes matter for the batch:

          * each op shard contributes its owned rows of the UNROTATED
            y-band; one band psum over 'op' assembles it everywhere
            (no ownership constraint — the band may straddle shards);
          * every device rotates(+bins) the band (py planes — cheap) and
            extracts/grads its ``mb/(n_op*n_dp)`` patches of the row;
          * one band-shaped psum over the whole mesh assembles the batch
            cotangent; the exact per-plane rotation adjoint (same linear
            map AD uses in the single-device immediate step) carries it
            back, and each shard adds its owned rows into its slab grad;
          * the shared ``apply_step`` applies the per-batch update on the
            op-sharded params (elementwise — GSPMD, no collectives).

        Collective budget per BATCH: 2 band psums + 1 scalar/aux psum —
        vs the reference's per-batch object-chunk alltoalls.  Returns the
        layout dict, or None when ineligible.
        """
        cfg = self.cfg
        geo = cfg.geometry
        mesh = self.mesh
        if mesh is None or cfg.train.update_scheme != 'immediate':
            return None
        why = self._mc_decline_reasons
        # Ragged-aware detection: a final PARTIAL row is accepted here
        # (weight-padded below) even though the strict single-chip
        # structured-scatter paths decline it.
        rg = None
        if (self.model is ptycho_model and self.probe_pos.ndim == 2
                and not cfg.train.randomize_probe_pos):
            rg = patch_ops.detect_row_grid_ragged(
                self.probe_pos, cfg.train.minibatch_size, geo.probe_size)
        if rg is None:
            why.append('scan table is not a (possibly ragged) '
                       'constant-stride row grid')
        if self.model is not ptycho_model:
            why.append('model is not far-field ptychography')
        elif not hasattr(self.model, 'predict_from_patches'):
            why.append('model has no patch-granular forward')
        if self.transform_measured is not None:
            why.append('measured-data transform active')
        if self.second_order:
            why.append('second-order optimizer')
        if cfg.refine.tilt_active:
            why.append('tilt rotation active')
        if cfg.train.rotate_out_of_loop:
            why.append('rotate_out_of_loop with immediate updates')
        if cfg.geometry.two_d_mode:
            why.append('2D mode (generic path handles it)')
        if self.data is None:
            why.append('no in-memory dataset')
        if cfg.train.n_batch_per_update > 1:
            why.append('n_batch_per_update > 1')
        if self.external_algorithm is not None:
            why.append('external algorithm hook active')
        if self._off_state:
            why.append('offloaded optimizer state (per-batch host '
                       'streaming would thrash)')
        if why:
            return None
        n_dp = cfg.parallel.data_axis
        n_op = cfg.parallel.object_axis
        n_dev = n_dp * n_op
        mb = cfg.train.minibatch_size
        Y, X, nz = geo.obj_size
        py, px = geo.probe_size
        if Y % n_op:
            why.append(f'divisibility: object y {Y} % object_axis '
                       f'{n_op} != 0')
            return None
        stride, n_last = rg
        p = self.pad_arr
        px0, px1 = int(p[1][0]), int(p[1][1])
        # Prime/ragged widths pad each row's spot slots to mpp*n_dev with
        # weight-0 virtual spots continuing the stride (the per-angle
        # layout's technique); a RAGGED final row additionally matches
        # ``make_batches``'s deterministic repeat-last padding by giving
        # the last real spot weight 1 + n_duplicates — exactly the
        # duplicate-spot semantics of the generic per-batch step, since
        # duplicated patches are identical functions of the params.
        mpp = -(-mb // n_dev)
        mb_pad = mpp * n_dev
        px1 += stride * (mb_pad - mb)
        prebin = _band_prebin(cfg)
        nzb = -(-nz // geo.binning) if prebin else nz
        pos = np.asarray(self.probe_pos, np.float32)
        n_rows = -(-self.n_pos // mb)
        y0 = np.round(pos[::mb, 0]).astype(np.int32)
        # Per-device tables: device (k, d) owns the row's contiguous spot
        # block [(k*n_dp + d)*mpp, ...+mpp).  Virtual pad slots continue
        # the row's stride from its LAST REAL spot; their indices clamp
        # to it (weight 0 makes the data value irrelevant).
        pos_imm = np.zeros((n_rows, mb_pad, 2), np.float32)
        inds_imm = np.zeros((n_rows, mb_pad), np.int32)
        ws_imm = np.zeros((n_rows, mb_pad), np.float32)
        for r in range(n_rows):
            st = r * mb
            n_real = min(mb, self.n_pos - st)
            pos_imm[r, :n_real] = pos[st:st + n_real]
            j = np.arange(n_real, mb_pad)
            pos_imm[r, n_real:, 0] = pos[st, 0]
            pos_imm[r, n_real:, 1] = (pos[st + n_real - 1, 1]
                                      + stride * (j - (n_real - 1)))
            inds_imm[r] = st + np.minimum(np.arange(mb_pad), n_real - 1)
            ws_imm[r, :n_real] = 1.0
            ws_imm[r, n_real - 1] += mb - n_real   # repeat-last duplicates
        pos_imm = pos_imm.reshape(n_rows, n_op, n_dp, mpp, 2)
        inds_imm = inds_imm.reshape(n_rows, n_op, n_dp, mpp)
        ws_imm = ws_imm.reshape(n_rows, n_op, n_dp, mpp)
        hbm = _prof.hbm_limit_bytes()
        data_dev_bytes = self.n_theta * n_rows * mpp * py * px * 4
        band_bytes = py * (X + px0 + px1) * nz * 2 * 4
        if data_dev_bytes > ((hbm - _prof.data_headroom_bytes(hbm))
                             - (6 * band_bytes
                                + self._chunk_bufs * mpp * py * px
                                * nzb * 2 * 4)):
            why.append(f'device-resident data share '
                       f'({data_dev_bytes / 1e9:.2f} GB/device) does not '
                       'fit next to the working set')
            return None
        return dict(n_dp=n_dp, n_op=n_op, mb=mb, mpp=mpp, mb_pad=mb_pad,
                    stride=stride, n_last=n_last, px0=px0,
                    px1=px1, py=py, px=px, Y=Y, X=X, nz=nz, nzb=nzb,
                    prebin=prebin, n_rows=n_rows, y0=y0, pos_imm=pos_imm,
                    inds_imm=inds_imm, ws_imm=ws_imm, dev=None)

    def _mc_imm_device_tables(self):
        """Lazily stage the immediate-path tables + the full dataset onto
        the mesh (once per run)."""
        mci = self._mci
        if mci['dev'] is not None:
            return mci['dev']
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp, op = self.cfg.parallel.axis_names
        ns = lambda spec: NamedSharding(self.mesh, spec)
        # Spots are contiguous per device block, so when no slots were
        # padded the data table is a pure reshape (a VIEW) of the dataset
        # — no host-side copy of the multi-GB array before the device
        # transfer.  Padded layouts (prime/ragged widths) gather by the
        # clamped index table instead (a host copy; the weight-0 pad
        # slots just repeat a real row).
        shape_imm = (self.n_theta, mci['n_rows'], mci['n_op'],
                     mci['n_dp'], mci['mpp'], mci['py'], mci['px'])
        if mci['mb_pad'] == mci['mb'] and self.n_pos % mci['mb'] == 0:
            data_imm = self.data.reshape(shape_imm)
        else:
            data_imm = self.data[:, mci['inds_imm'].reshape(-1)].reshape(
                shape_imm)
        dev = dict(
            pos=jax.device_put(jnp.asarray(mci['pos_imm']),
                               ns(P(None, op, dp))),
            inds=jax.device_put(jnp.asarray(mci['inds_imm']),
                                ns(P(None, op, dp))),
            w=jax.device_put(jnp.asarray(mci['ws_imm']),
                             ns(P(None, op, dp))),
            data=jax.device_put(jnp.asarray(data_imm),
                                ns(P(None, None, op, dp))))
        mci['dev'] = dev
        return dev

    def _rehome_state(self):
        """Move the object's optimizer state (and, when offloaded, the
        object slabs) back to pinned host memory (CPU backend only — see
        ``_rehome_after_step``)."""
        if not self._rehome_after_step:
            return
        if self._off_state:
            self.opt_state['obj'] = jax.tree.map(
                jax.device_put, self.opt_state['obj'], self._state_host_sh)
        if self._obj_offloaded:
            self.params['obj'] = jax.tree.map(
                jax.device_put, self.params['obj'], self._obj_host_sh)
        if getattr(self, '_obj_off_mesh', False):
            self.params = {**self.params,
                           'obj': jax.device_put(self.params['obj'],
                                                 self._obj_mesh_host_sh)}

    def _print(self, msg: str):
        print(msg, flush=True)
        if self._stdout_f is not None:
            self._stdout_f.write(f'[{time.strftime("%H:%M:%S")}] {msg}\n')
            self._stdout_f.flush()

    def _apply_external_algorithm(self):
        if self.external_algorithm is None:
            return
        if self.external_algorithm != 'ctf':
            raise ValueError(self.external_algorithm)
        from .conventional import multidistance_ctf
        geo = self.cfg.geometry
        n_dists = geo.n_dists
        n_blocks = self.n_pos // n_dists
        # Full-field layout: one hologram per distance
        # (``adorym/array_ops.py:276``: prj[0]).
        prj = self.data[0][::n_blocks] if n_blocks > 1 else self.data[0]
        kappa = (10.0 ** float(np.asarray(self.params['ctf_lg_kappa'])[0])
                 if 'ctf_lg_kappa' in self.params else self.cfg.train.ctf_kappa)
        affine = (np.asarray(self.params['prj_affine_ls'])
                  if 'prj_affine_ls' in self.params else None)
        phase = multidistance_ctf(prj, np.asarray(geo.free_prop_cm),
                                  geo.energy_ev, geo.psize_cm, kappa=kappa,
                                  prj_affine_ls=affine)
        obj = self.params['obj']
        self.params = {**self.params,
                       'obj': obj.at[..., 0].set(phase[..., None])}

    def _save_intermediate(self, i_epoch: int, i_batch: int):
        """Intermediate object/probe TIFFs (``adorym/util.py:1958-2028``):
        with ``save_history`` each dump keeps an ``_{epoch}_{batch}`` suffix,
        otherwise the same files are overwritten."""
        from .io import output as out_lib
        inter = os.path.join(self.output_folder, 'intermediate')
        if not self.cfg.io.save_history:
            suffix = ''
        elif i_batch < 0:   # epoch-level dump
            suffix = f'_{i_epoch}'
        else:
            suffix = f'_{i_epoch}_{i_batch}'
        out_lib.output_object(self.obj, inter, self.cfg.train.unknown_type,
                              name_suffix=suffix)
        out_lib.output_probe(np.asarray(self.params['probe']), inter,
                             name_suffix=suffix)
        self._save_intermediate_params(inter, i_epoch, i_batch)

    def _save_intermediate_params(self, inter: str, i_epoch: int,
                                  i_batch: int):
        """Refined-parameter history, reference layout
        (``adorym/optimizers.py:1111-1160``): per-parameter folders under
        ``intermediate/``; scalar offsets append to one file, array params
        write per-epoch ``<name>_<epoch>.txt`` (``prj_affine_<epoch>.txt``
        is what ``tools/affine_transform_images.py`` consumes)."""
        ep = max(i_epoch, 0)
        for name, v in self.params.items():
            if name in ('obj', 'probe') or name not in self.specs:
                continue
            arr = np.asarray(v)
            d = os.path.join(inter, 'prj_affine' if name == 'prj_affine_ls'
                             else ('probe_pos' if name == 'probe_pos_correction'
                                   else name))
            os.makedirs(d, exist_ok=True)
            if name in ('probe_pos_offset', 'prj_pos_offset'):
                path = os.path.join(d, f'{name}.txt')
                mode = 'a' if (i_epoch > 0 or i_batch > 0) else 'w'
                with open(path, mode) as f:
                    f.write(f'{i_epoch:4d}, {max(i_batch, 0):4d}, '
                            f'{list(arr.flatten())}\n')
            elif name == 'prj_affine_ls':
                np.savetxt(os.path.join(d, f'prj_affine_{ep}.txt'),
                           np.concatenate(arr, 0))
            elif name == 'probe_pos_correction':
                np.savetxt(os.path.join(d, f'probe_pos_correction_{ep}.txt'),
                           arr.reshape(-1, arr.shape[-1]))
            else:
                np.savetxt(os.path.join(d, f'{name}_{ep}.txt'),
                           np.atleast_1d(arr).reshape(arr.shape[0], -1)
                           if arr.ndim > 1 else np.atleast_1d(arr))

    def save_checkpoint(self, i_epoch: int, i_batch: int):
        t0 = time.time()
        out = self._save_checkpoint_inner(i_epoch, i_batch)
        self._ckpt_seconds += time.time() - t0
        # A checkpoint moves the full params + optimizer state to host; on
        # slow device->host links (remote tunnels run ~14 MB/s) the
        # reference's default 10-batch cadence can dominate the run.
        if (not self._ckpt_warned and self._ckpt_seconds > 60
                and self._ckpt_seconds > 0.5 * (time.time() - self._t_start)):
            import warnings
            warnings.warn(
                'checkpointing has consumed more than half the wall time '
                f'({self._ckpt_seconds:.0f}s) — raise n_batch_per_checkpoint '
                'or set store_checkpoint=False (device->host transfer of '
                'the full parameter/optimizer state per checkpoint is slow '
                'on this link)')
            self._ckpt_warned = True
        return out

    def _save_checkpoint_inner(self, i_epoch: int, i_batch: int):
        from .io import checkpoint as ckpt_lib
        if self.cfg.io.use_orbax:
            # Pass jax.Arrays straight through: orbax writes per-device
            # shards; no host gather of a large sharded object.
            params, state = self.params, self.opt_state
        else:
            params = jax.tree.map(np.asarray, self.params)
            state = jax.tree.map(np.asarray, self.opt_state)
        return ckpt_lib.save_checkpoint(
            os.path.join(self.output_folder, 'checkpoint'),
            params, state, i_epoch, i_batch,
            extra={'i_opt_batch': np.asarray(self.i_opt_batch),
                   'global_batch': np.asarray(self.global_batch)},
            use_orbax=self.cfg.io.use_orbax)

    # ------------------------------------------------------------------
    def loss_fn(self, params, batch, measured, weight_l1):
        cfg = self.cfg
        if self._gather_fn is not None:
            pred = self.predict_fn(params, batch, cfg, self.pad_arr,
                                   gather_fn=self._gather_fn)
        else:
            pred = self.predict_fn(params, batch, cfg, self.pad_arr)
        if self.transform_measured is not None:
            measured = self.transform_measured(params, batch, measured, cfg)
        loss = model_base.mismatch_loss(
            pred, measured, cfg.loss.loss_function_type,
            cfg.loss.raw_data_type, cfg.loss.poisson_multiplier,
            self.beamstop_mask)
        if self.reg_list:
            loss = loss + regs.total_regularization(
                self.reg_list, params['obj'], weight_l1=weight_l1)
        return loss

    def _build_step(self):
        cfg = self.cfg
        # XLA:CPU aborts when a donated input lives in pinned_host (the
        # buffer-kind check trips during aliasing); TPU handles it.  Skip
        # the affected donations there — it only costs a transient host
        # copy.
        cpu = jax.default_backend() == 'cpu'
        if cpu and self._obj_off_mesh:
            donate = ()        # host-kind leaves in BOTH params and state
        elif cpu and self._off_state:
            donate = (0,)
        else:
            donate = (0, 1)

        def grad_step(params, batch, measured, weight_l1):
            return jax.value_and_grad(self.loss_fn)(params, batch, measured,
                                                    weight_l1)

        def obj_state_in(obj_state):
            """Offloaded (whole-array) object moments: host -> HBM."""
            if not self._off_state or self._off_slabbed:
                return obj_state
            return jax.tree.map(jax.device_put, obj_state,
                                self._state_dev_sh)

        def obj_state_out(obj_state):
            """Offloaded (whole-array) object moments: HBM -> host."""
            if not self._off_state or self._off_slabbed:
                return obj_state
            return jax.tree.map(jax.device_put, obj_state,
                                self._state_host_sh)

        def update_mask(global_batch):
            """Traced per-leaf update gates: probe delay/limit window plus
            the all-aux ``other_params_update_delay``."""
            mask = {}
            if 'probe' in self.specs:
                mask['probe'] = param_lib.probe_update_gate(cfg, global_batch)
            if cfg.refine.other_params_update_delay > 0:
                gate = param_lib.aux_update_gate(cfg, global_batch)
                for k in self.specs:
                    if k not in ('obj', 'probe'):
                        mask[k] = gate
            return mask

        self._update_mask = update_mask

        def patch_accum(obj_pad, aux, theta, i_theta, pos_all, inds_all,
                        measured_all, w_all):
            """Scan the angle's minibatch chunks at PATCH granularity,
            scatter-adding gradients into an obj_pad-shaped accumulator
            (structured row-grid/2D-grid scatter when the table allows).
            Shared by angle_step's patch branch and the host-streamed-
            object driver (_build_offl_steps).  Returns
            ((acc_obj, acc_aux), per-batch losses)."""
            geo = cfg.geometry
            g = w_all.shape[1]
            mb = cfg.train.minibatch_size
            prebin = self._prebin
            predict_patches = self.model.predict_from_patches
            pad_off = jnp.asarray([self.pad_arr[0][0], self.pad_arr[1][0]],
                                  jnp.int32)
            # run_bfloat16: extract patches from a bf16 copy of the
            # (binned, padded) object — identical patch VALUES (the model
            # casts delta/beta to bf16 anyway; casting before extraction
            # commutes with the copy) at HALF the extract and cotangent
            # HBM bytes.  The cotangents come back bf16; the structured
            # scatters upcast them inside their fused adds, so the
            # accumulator stays exact f32.  Measured at the flagship
            # chunk: extract 11.4->4.3 ms, grad 39.6->33.6 ms,
            # band-kernel scatter 6.6->3.1 ms.
            obj_ex = (obj_pad.astype(jnp.bfloat16)
                      if cfg.train.run_bfloat16 else obj_pad)
            # Z-major extraction: keep the extraction copy
            # pre-transposed so every chunk's patches are born in the
            # multislice z-major [zb, 2, N, py, px] layout and the
            # per-chunk moveaxis prep disappears (both kernel paths win —
            # measured -10% bf16 / -6% f32 on the flagship chunk grad).
            # Bit-identical trajectories (pure relayout on both sides of
            # AD).
            zm = ((cfg.train.zmajor_extract == 'on'
                   or (cfg.train.zmajor_extract == 'auto'
                       and jax.default_backend() == 'tpu'))
                  and not geo.two_d_mode
                  and cfg.train.unknown_type == 'delta_beta'
                  and not geo.pure_projection
                  and geo.slice_pos_cm_ls is None)
            obj_zx = (jnp.transpose(obj_ex, (2, 3, 0, 1)) if zm else None)

            def mismatch(subobj, aux_p, batch, meas, w):
                pred = predict_patches(aux_p, batch, subobj, cfg,
                                       prebinned_z=prebin, zmajor=zm)
                per_item = model_base.mismatch_loss(
                    pred, meas, cfg.loss.loss_function_type,
                    cfg.loss.raw_data_type, cfg.loss.poisson_multiplier,
                    self.beamstop_mask, per_item=True)
                per_batch = per_item.reshape(g, -1).mean(axis=1)
                return jnp.sum(per_batch * w), per_batch

            def body(carry, xs):
                acc_obj, acc_aux = carry
                pos_c, inds_c, meas_c, w = xs
                batch = {'i_theta': i_theta, 'theta': theta,
                         'pos_batch': pos_c, 'ind_batch': inds_c}
                pos_int = jnp.round(pos_c).astype(jnp.int32) + pad_off
                if zm:
                    subobj = patch_ops.extract_patches_zmajor(
                        obj_zx, pos_int, geo.probe_size)
                elif self._grid_scatter_rows == g:
                    # Complete-grid chunk: band-gather extraction (the
                    # exact transpose of the Pallas scatter below) —
                    # bit-identical patches, one band read per
                    # overlapping patch row instead of per-patch
                    # dynamic-slice re-reads.
                    subobj = patch_ops.extract_grid2d_best(
                        obj_ex, pos_int[0, 0], pos_int[0, 1],
                        self._rowgrid_stride, g, mb, geo.probe_size)
                else:
                    subobj = patch_ops.extract_patches(obj_ex, pos_int,
                                                       geo.probe_size)
                (_, per_batch), (g_sub, g_aux) = jax.value_and_grad(
                    mismatch, argnums=(0, 1), has_aux=True)(
                        subobj, aux, batch, meas_c, w)
                if zm:
                    # Back to the scatter layout [N, py, px, zb, 2] (the
                    # backward's packed transpose — unchanged cost; only
                    # the FORWARD relayout was deleted).
                    g_sub = jnp.transpose(g_sub, (2, 3, 4, 0, 1))
                if self._rowgrid_stride is not None:
                    # Constant-stride grid rows: lane decomposition
                    # instead of a scatter.  Full-grid chunks collapse
                    # further into ONE separable 2D-grid update.
                    if self._grid_scatter_rows == g:
                        acc_obj = patch_ops.scatter_grid2d_add_best(
                            acc_obj, g_sub, pos_int[0, 0], pos_int[0, 1],
                            self._rowgrid_stride, g)
                    else:
                        for r in range(g):
                            acc_obj = patch_ops.scatter_rowgrid_add(
                                acc_obj, g_sub[r * mb:(r + 1) * mb],
                                pos_int[r * mb, 0], pos_int[r * mb, 1],
                                self._rowgrid_stride)
                else:
                    acc_obj = patch_ops.scatter_patches_add(acc_obj, g_sub,
                                                            pos_int)
                acc_aux = jax.tree.map(jnp.add, acc_aux, g_aux)
                return (acc_obj, acc_aux), per_batch

            zero = (jnp.zeros_like(obj_pad),
                    jax.tree.map(jnp.zeros_like, aux))
            return jax.lax.scan(body, zero,
                                (pos_all, inds_all, measured_all, w_all))

        self._patch_accum = patch_accum

        def apply_updates(params, grads, opt_state, i_opt_batch, mask,
                          obj_slab_grad=None):
            """First-order updates for every spec'd leaf, with the object's
            offloaded state streamed whole (or slab-by-slab) through HBM.

            ``obj_slab_grad(start, size)``: optional lazy object-gradient
            producer for the slabbed path — rotation acts per y-plane, so
            the angle step can hand over the BINNED accumulated gradient
            and have each slab's full-depth rotate-back computed just in
            time, never materializing the object-sized gradient."""
            if not self._off_slabbed:
                if 'obj' in opt_state:
                    opt_state = {**opt_state,
                                 'obj': obj_state_in(opt_state['obj'])}
                upd_params, opt_state = opt_lib.tree_apply(
                    self.specs, params, grads, opt_state, i_opt_batch,
                    update_mask=mask)
                if 'obj' in opt_state:
                    opt_state = {**opt_state,
                                 'obj': obj_state_out(opt_state['obj'])}
                return upd_params, opt_state
            # Slab-streamed: aux leaves via tree_apply, object per y-slab —
            # each slab's m/v transfer in, update, transfer out, so only
            # ~2 slabs of state are ever HBM-resident (XLA frees each
            # slab's buffers after its last use).
            specs_aux = {k: v for k, v in self.specs.items() if k != 'obj'}
            upd_params, new_state = opt_lib.tree_apply(
                specs_aux, params, grads, opt_state, i_opt_batch,
                update_mask=mask)
            obj_spec = self.specs['obj']
            new_obj_state = {name: {} for name in opt_state['obj']}
            # In-place slab updates (dynamic_update_slice chain): with the
            # step's params donated this aliases into the existing object
            # buffer — a jnp.concatenate of the slabs materialized a SECOND
            # object-sized array, the difference between 768^3 fitting and
            # OOMing by 2G.
            upd_obj = params['obj']
            for key, (st, sz) in zip(self._slab_keys, self._slab_ranges):
                # Slice from the progressively-updated buffer: identical
                # values (slabs are disjoint), but the data dependency
                # SERIALIZES the slab chain — sliced from params, XLA
                # overlaps every slab's m/v transfers and update temps
                # (~4 slab-sized live buffers each, the 768^3 OOM).
                o_k = jax.lax.slice_in_dim(upd_obj, st, st + sz, axis=0)
                g_k = (obj_slab_grad(st, sz) if obj_slab_grad is not None
                       else jax.lax.slice_in_dim(grads['obj'], st, st + sz,
                                                 axis=0))
                st_k = {name: jax.device_put(opt_state['obj'][name][key],
                                             self._state_dev_sh[name][key])
                        for name in opt_state['obj']}
                o2, st2 = opt_lib.opt_apply(obj_spec, o_k, g_k, st_k,
                                            i_opt_batch)
                upd_obj = jax.lax.dynamic_update_slice_in_dim(upd_obj, o2,
                                                              st, axis=0)
                for name, arr in st2.items():
                    new_obj_state[name][key] = jax.device_put(
                        arr, self._state_host_sh[name][key])
            upd_params['obj'] = upd_obj
            new_state['obj'] = new_obj_state
            return upd_params, new_state

        def apply_step(params, opt_state, grads, i_opt_batch, global_batch,
                       support_mask, obj_slab_grad=None):
            mask = update_mask(global_batch)
            if obj_slab_grad is not None and not self._off_slabbed:
                grads = {**grads,
                         'obj': obj_slab_grad(0, params['obj'].shape[0])}
                obj_slab_grad = None
            upd_params, opt_state = apply_updates(params, grads, opt_state,
                                                  i_opt_batch, mask,
                                                  obj_slab_grad)
            upd_params = param_lib.apply_param_constraints(upd_params, cfg)
            upd_params['obj'] = param_lib.apply_object_constraints(
                upd_params['obj'], cfg, support_mask)
            return upd_params, opt_state

        # Exposed pieces for the accumulate-then-update schemes
        # ('per angle' updates, rotate_out_of_loop; see run_epoch).
        self._grad_step = jax.jit(grad_step)
        self._apply_only = jax.jit(apply_step, donate_argnums=donate)
        self._accum_grads = jax.jit(
            lambda a, b: jax.tree.map(jnp.add, a, b))
        # Shrink-wrap mask update (``adorym/array_ops.py:331-335``): zero the
        # support where delta dropped below threshold.  Jitted once — a fresh
        # ``jax.jit(lambda ...)`` per call would retrace every time.
        self._shrink_fn = jax.jit(
            lambda m, o: m * (o[..., 0] >= cfg.train.shrink_threshold))
        if not cfg.geometry.two_d_mode:
            from .ops.rotate import rotate, rotate_adjoint
            _interp = cfg.train.interpolation
            self._rotate_fwd = jax.jit(
                lambda o, th: rotate(o, th, method=_interp))
            # Gradient rotate-back: the reference interpolates at -theta
            # (``adorym/ptychography.py:1069-1078``) — a gather, ~3x faster
            # than the scatter-heavy exact transpose.
            # Full-OBJECT exact adjoint stays on the vjp scatter: the
            # 256-plane slices amortize the scatter's per-update cost,
            # and the tap-gather's 2x extended area LOSES there
            # (27.4 vs 23.2 ms measured, tools/probe_adjoint_full.py) —
            # taps only wins at BAND height (_band_adjoint_back).
            if cfg.train.exact_grad_rotation:
                grad_back = lambda g, th: rotate_adjoint(g, th,
                                                         method=_interp)
            else:
                grad_back = lambda g, th: rotate(g, -th, method=_interp)
            self._rotate_adj = jax.jit(grad_back)
            self._grad_back = grad_back

        def angle_step(params, opt_state, theta, i_theta, pos_all, inds_all,
                       measured_all, w_all, weight_l1, i_opt_batch,
                       global_batch, support_mask):
            """One whole angle in a single compiled program: rotate once,
            scan over the angle's minibatch CHUNKS accumulating gradients,
            rotate the object gradient back, apply the update.  Replaces
            n_batches host dispatches with one — under remote-dispatch
            latency this is the difference between being latency-bound and
            compute-bound.

            Chunking: per-angle accumulation is linear, so ``fuse_g``
            minibatches are differentiated in ONE forward/backward — the
            per-batch fixed costs amortize (measured 4x fewer us/pattern at
            flagship shapes going 23 -> 276 patterns per chunk).  The chunk
            objective is the w-weighted sum of per-batch MEAN losses, so the
            accumulated gradient (and Adam step) is bit-for-math identical
            to the unfused loop; ``w`` zeroes the batches that only pad the
            last chunk.  Inputs: pos/inds/measured ``[n_c, g*mb, ...]``,
            ``w_all [n_c, g]``."""
            from .ops.rotate import (rotate, rotate_and_bin_z,
                                     rotate_expanded_from_binned_z)
            g = w_all.shape[1]

            # Single source of truth with the __init__ chunk sizing.
            patch_mode = self._patch_mode
            prebin = self._prebin
            # Streaming rotation: with the prebin hoist and the interp
            # (-theta) gradient rotate-back, neither the rotated full-res
            # object nor the expanded full-res gradient need ever exist —
            # rotate_and_bin_z / rotate_expanded_from_binned_z fold the bin
            # reduction/expansion into the gathers chunk-by-chunk
            # (bit-exact; regularizers need the full rotated object, so
            # they disable it).
            # Streaming costs ~25% at sizes that fit comfortably (the
            # chunked mapped gathers lower worse than the bulk rotate), so
            # 'auto' enables it only when the object is big enough that the
            # two saved object-sized buffers decide whether the run fits
            # (>= ~1.5 GB per channel-pair, i.e. ~576^3 and up).
            # (The host-streamed-OBJECT path never reaches angle_step —
            # _run_epoch_angles drives it as per-slab jit calls instead,
            # see _build_offl_steps.)
            obj_nbytes = int(np.prod(params['obj'].shape)) * 4
            from .utils.profiling import stream_rotation_auto_bytes
            _sra_bytes = stream_rotation_auto_bytes()
            stream_rot = (prebin and not cfg.geometry.two_d_mode
                          and (cfg.train.stream_rotation == 'on'
                               or (cfg.train.stream_rotation == 'auto'
                                   and obj_nbytes
                                   > _sra_bytes))
                          and not cfg.train.exact_grad_rotation
                          and not self.reg_list)
            if cfg.geometry.two_d_mode or stream_rot:
                p_rot = params
            else:
                p_rot = {**params, 'obj': rotate(
                    params['obj'], theta, method=cfg.train.interpolation)}

            def per_batch_mismatch(pred, meas):
                per_item = model_base.mismatch_loss(
                    pred, meas, cfg.loss.loss_function_type,
                    cfg.loss.raw_data_type, cfg.loss.poisson_multiplier,
                    self.beamstop_mask, per_item=True)
                return per_item.reshape(g, -1).mean(axis=1)

            def reg_value(obj_rot):
                if not self.reg_list:
                    return 0.0
                return regs.total_regularization(self.reg_list, obj_rot,
                                                 weight_l1=weight_l1)

            if patch_mode:
                # Differentiate at PATCH granularity and scatter-add into
                # the accumulator ourselves: XLA's generic scatter in the
                # extract_patches VJP runs off the HBM roofline, and it
                # would also materialize a full-object-sized zeros array
                # per minibatch.
                geo = cfg.geometry
                mb = cfg.train.minibatch_size
                nz_full = geo.obj_size[2]
                # Hoist the binning z-reduction to once per angle: patches
                # (and their scatter-added gradients) then move 1/binning
                # of the HBM bytes per chunk.  The chunk math is unchanged
                # — the propagator's bin step IS this sum (delta_beta), so
                # summing before extraction == extracting then binning.
                if stream_rot:
                    # Rotate + bin fused chunk-by-chunk: the rotated
                    # full-res object never exists.
                    obj_pad = patch_ops.pad_object(
                        rotate_and_bin_z(params['obj'], theta, geo.binning, method=cfg.train.interpolation),
                        self.pad_arr, cfg.train.unknown_type)
                else:
                    obj_pad = patch_ops.pad_object(p_rot['obj'],
                                                   self.pad_arr,
                                                   cfg.train.unknown_type)
                    if prebin:
                        obj_pad = prop.bin_z_sum(obj_pad, geo.binning,
                                                 axis=2)
                aux = {k: v for k, v in p_rot.items() if k != 'obj'}
                (acc_obj, acc_aux), losses = patch_accum(
                    obj_pad, aux, theta, i_theta, pos_all, inds_all,
                    measured_all, w_all)
                # Crop the padding halo (gradients into vacuum padding drop).
                p = self.pad_arr
                g_rot = acc_obj[p[0][0]:acc_obj.shape[0] - p[0][1],
                                p[1][0]:acc_obj.shape[1] - p[1][1]]
                # Adjoint of the bin-sum: every physical slice gets its
                # bin's gradient (z-pad slices drop with the crop).  With
                # the interp (-theta) rotate-back and no regularizers the
                # expansion FUSES into the rotate-back gather instead
                # (rotate_expanded_from_binned_z — bit-exact, and ~30%
                # faster than expand-then-rotate at the flagship: the
                # gather is index-bound, so reading the binned source
                # helps while the 134MB repeat materialization hurts).
                fused_back = (prebin and not stream_rot
                              and not self.reg_list
                              and not cfg.train.exact_grad_rotation
                              and not cfg.geometry.two_d_mode)
                if prebin and not stream_rot and not fused_back:
                    g_rot = jnp.repeat(g_rot, geo.binning,
                                       axis=2)[:, :, :nz_full]
                # Regularizers act on the (rotated) object, identically in
                # every accumulated batch: one grad scaled by the number of
                # REAL batches.
                if self.reg_list:
                    n_real = jnp.sum(w_all)
                    rv, g_reg = jax.value_and_grad(
                        lambda o: reg_value(o))(p_rot['obj'])
                    g_rot = g_rot + n_real * g_reg
                    losses = losses + rv
                acc = {**acc_aux, 'obj': g_rot}
            else:
                def chunk_loss(p, pos_c, inds_c, meas_c, w):
                    batch = {'i_theta': i_theta, 'theta': theta,
                             'pos_batch': pos_c, 'ind_batch': inds_c}
                    if self._gather_fn is not None:
                        pred = self.predict_fn(p, batch, cfg, self.pad_arr,
                                               gather_fn=self._gather_fn)
                    else:
                        pred = self.predict_fn(p, batch, cfg, self.pad_arr)
                    if self.transform_measured is not None:
                        meas_c = self.transform_measured(p, batch, meas_c,
                                                         cfg)
                    per_batch = per_batch_mismatch(pred, meas_c)
                    rv = reg_value(p['obj'])
                    total = jnp.sum(per_batch * w) + jnp.sum(w) * rv
                    return total, per_batch + rv

                def body(acc, xs):
                    pos_c, inds_c, meas_c, w = xs
                    (_, per_batch), grads = jax.value_and_grad(
                        chunk_loss, has_aux=True)(p_rot, pos_c, inds_c,
                                                  meas_c, w)
                    return jax.tree.map(jnp.add, acc, grads), per_batch

                zero = jax.tree.map(jnp.zeros_like, p_rot)
                acc, losses = jax.lax.scan(
                    body, zero, (pos_all, inds_all, measured_all, w_all))
            if stream_rot:
                # Fused expand + interp rotate-back, deferred to the
                # optimizer: reads the BINNED gradient directly (bit-exact
                # vs expand-then-rotate), and under slab-offloaded state
                # each y-slab's full-depth gradient exists only while that
                # slab updates.
                g_binned = acc['obj']

                def obj_slab_grad(st, sz):
                    sl = jax.lax.slice_in_dim(g_binned, st, st + sz, axis=0)
                    return rotate_expanded_from_binned_z(
                        sl, -theta, cfg.geometry.binning, nz_full, method=cfg.train.interpolation)

                params, opt_state = apply_step(params, opt_state, acc,
                                               i_opt_batch, global_batch,
                                               support_mask,
                                               obj_slab_grad=obj_slab_grad)
                return params, opt_state, losses
            if not cfg.geometry.two_d_mode:
                if patch_mode and fused_back:
                    acc = {**acc, 'obj': rotate_expanded_from_binned_z(
                        acc['obj'], -theta, geo.binning, nz_full, method=cfg.train.interpolation)}
                else:
                    acc = {**acc, 'obj': self._grad_back(acc['obj'],
                                                         theta)}
            params, opt_state = apply_step(params, opt_state, acc,
                                           i_opt_batch, global_batch,
                                           support_mask)
            return params, opt_state, losses

        self._angle_step = jax.jit(angle_step, donate_argnums=donate)

        def angles_epoch(params, opt_state, theta_e, itheta_e, pos_e,
                         inds_e, w_e, data_dev, weight_l1, i_opt0, gb0,
                         n_b, support_mask):
            """A WHOLE per-angle epoch as one program: ``lax.scan`` of
            ``angle_step`` over the epoch's angles, measurement rows
            gathered from the device-resident dataset inside the scan.
            Each angle's step is the SAME traced computation as the
            per-angle dispatch (identical trajectories), but the per-angle
            host staging + dispatch gaps disappear — measured 57 vs 67-74
            ms/angle at the flagship bench on the remote-dispatch tunnel
            (chained fenced steps vs the host loop).  Eligibility:
            :meth:`Reconstructor._angles_fused_ok`."""

            def body(carry, xs):
                p, o, i_opt, gb = carry
                theta, i_theta, pos_all, inds_all, w_all = xs
                rows = data_dev[i_theta]
                measured_all = rows[inds_all.reshape(-1)].reshape(
                    inds_all.shape + rows.shape[1:])
                # Reweighted-L1 weights refresh at every angle boundary,
                # exactly like the per-angle dispatch loop — but from the
                # scan carry, so the whole epoch still fuses.
                wl1 = (Reconstructor._weight_l1_refresh(p['obj'])
                       if self._needs_weight_l1 else weight_l1)
                p, o, losses = angle_step(p, o, theta, i_theta, pos_all,
                                          inds_all, measured_all, w_all,
                                          wl1, i_opt, gb,
                                          support_mask)
                return (p, o, i_opt + 1, gb + n_b), losses

            (params, opt_state, _, _), losses = jax.lax.scan(
                body, (params, opt_state, i_opt0, gb0),
                (theta_e, itheta_e, pos_e, inds_e, w_e))
            return params, opt_state, losses

        self._angles_epoch = jax.jit(angles_epoch, donate_argnums=donate)

        if self._mc is not None:
            self._mc_step = self._build_mc_step(apply_step, donate)
        if self._mci is not None:
            self._mc_imm_epoch = self._build_mc_imm_step(apply_step, donate)

        # Band-granular immediate step: the reference's DEFAULT
        # update_scheme='immediate' differentiates through the rotation
        # of the FULL object every batch (exact adjoint ~28 ms at the
        # flagship), but every minibatch of a row-grid table touches only
        # its row's py object planes — rotation is per-y-plane, so
        # rotating/adjoining just the band is the same linear chain AD
        # applies to the full object (the mesh immediate path's
        # decomposition, proven to 1.6e-8 there).  Rotation cost drops by
        # ~py/Y per batch.  Regularizers evaluate on the full object via
        # their own AD and add by the sum rule.
        band_ok = (self.mesh is None and not cfg.geometry.two_d_mode
                   and cfg.train.update_scheme == 'immediate'
                   and not cfg.train.rotate_out_of_loop
                   and not cfg.refine.tilt_active
                   and not self.second_order
                   and self._rowgrid_stride is not None
                   and self.model is ptycho_model
                   and hasattr(self.model, 'predict_from_patches')
                   and self.transform_measured is None
                   and self.external_algorithm is None)
        if (cfg.train.imm_grad_rotation == 'interp'
                and cfg.train.update_scheme == 'immediate'
                and not band_ok and self._mci is None):
            # The knob only reaches the band/mesh decompositions; the
            # generic step differentiates through the rotation (exact).
            import warnings
            warnings.warn("imm_grad_rotation='interp' requires the "
                          'band-granular immediate fast path (row-grid '
                          'scan table, 3D far-field ptychography); '
                          'running the exact-AD generic step instead')

        def step_band(params, opt_state, batch, measured, weight_l1,
                      i_opt_batch, global_batch, support_mask):
            geo = cfg.geometry
            Y, X, nz = geo.obj_size
            py, px = geo.probe_size
            px0, px1 = int(self.pad_arr[1][0]), int(self.pad_arr[1][1])
            prebin = _band_prebin(cfg)   # == self._prebin under band_ok
            nzb = -(-nz // geo.binning) if prebin else nz
            stride = self._rowgrid_stride
            theta = batch['theta']
            obj = params['obj']
            aux = {n: v for n, v in params.items() if n != 'obj'}

            y0 = jnp.round(batch['pos_batch'][0, 0]).astype(jnp.int32)
            u = y0 + jnp.arange(py)
            valid = ((u >= 0) & (u < Y))[:, None, None, None]
            idx = jnp.clip(u, 0, Y - 1)
            rb = _band_rotate_fwd(obj[idx], valid, theta, cfg, px0, px1)

            posi = jnp.round(batch['pos_batch']).astype(jnp.int32)
            posi = jnp.stack([jnp.zeros_like(posi[:, 0]),
                              posi[:, 1] + px0], axis=1)

            def mismatch(subobj, aux_p):
                pred = self.model.predict_from_patches(
                    aux_p, batch, subobj, cfg, prebinned_z=prebin)
                return model_base.mismatch_loss(
                    pred, measured, cfg.loss.loss_function_type,
                    cfg.loss.raw_data_type, cfg.loss.poisson_multiplier,
                    self.beamstop_mask)

            subobj = patch_ops.extract_patches(rb, posi, (py, px))
            loss, (g_sub, g_aux) = jax.value_and_grad(
                mismatch, argnums=(0, 1))(subobj, aux)

            acc = jnp.zeros((py, X + px0 + px1, nzb, 2), jnp.float32)
            acc = patch_ops.scatter_rowgrid_add(acc, g_sub, posi[0, 0],
                                                posi[0, 1], stride)
            g_band = _band_grad_back(acc, valid, theta, cfg, px0, X,
                                        nz)
            g_obj = jnp.zeros_like(obj).at[idx].add(g_band)
            grads = dict(g_aux)
            grads['obj'] = g_obj
            if self.reg_list:
                rv, rg = jax.value_and_grad(
                    lambda ob: regs.total_regularization(
                        self.reg_list, ob, weight_l1=weight_l1))(obj)
                grads['obj'] = grads['obj'] + rg
                loss = loss + rv

            mask = update_mask(global_batch)
            upd_params, opt_state = apply_updates(params, grads, opt_state,
                                                  i_opt_batch, mask)
            upd_params = param_lib.apply_param_constraints(upd_params, cfg)
            upd_params['obj'] = param_lib.apply_object_constraints(
                upd_params['obj'], cfg, support_mask)
            return upd_params, opt_state, loss

        def step(params, opt_state, batch, measured, weight_l1, i_opt_batch,
                 global_batch, support_mask):
            loss, grads = jax.value_and_grad(self.loss_fn)(
                params, batch, measured, weight_l1)
            mask = update_mask(global_batch)
            upd_params, opt_state = apply_updates(params, grads, opt_state,
                                                  i_opt_batch, mask)

            if self.second_order and cfg.train.optimize_object:
                from .optim import second_order as so
                # Second-order object state streams whole-array (its update
                # is not element-wise separable over slabs).
                opt_state = {**opt_state,
                             'obj': obj_state_in(opt_state['obj'])}

                def loss_obj_fn(o):
                    return self.loss_fn({**params, 'obj': o}, batch,
                                        measured, weight_l1)

                if cfg.train.optimizer == 'cg':
                    obj_new, obj_state, _ = so.cg_step(
                        loss_obj_fn, params['obj'], grads['obj'], loss,
                        opt_state['obj'])
                else:
                    def pred_fn(o):
                        return self.predict_fn({**params, 'obj': o}, batch,
                                               cfg, self.pad_arr)

                    meas = measured
                    if self.transform_measured is not None:
                        meas = self.transform_measured(params, batch,
                                                       measured, cfg)

                    def loss_pred_fn(pred):
                        return model_base.mismatch_loss(
                            pred, meas, cfg.loss.loss_function_type,
                            cfg.loss.raw_data_type,
                            cfg.loss.poisson_multiplier,
                            self.beamstop_mask)

                    obj_new, obj_state, _ = so.curveball_step(
                        pred_fn, loss_pred_fn, loss_obj_fn, params['obj'],
                        opt_state['obj'])
                upd_params['obj'] = obj_new
                opt_state = {**opt_state, 'obj': obj_state_out(obj_state)}

            # Leaves without specs (fixed probe etc.) pass through untouched.
            upd_params = param_lib.apply_param_constraints(upd_params, cfg)
            upd_params['obj'] = param_lib.apply_object_constraints(
                upd_params['obj'], cfg, support_mask)
            return upd_params, opt_state, loss

        def epoch_fused(params, opt_state, theta_b, itheta_b, pos_b, inds_b,
                        data_dev, weight_l1, i_opt_batch0, global_batch0,
                        support_mask):
            """A whole immediate-update epoch as ONE compiled program: scan
            the per-batch train step over the epoch's (shuffled) batches.
            For 2D workloads remote-dispatch latency dominates the tiny
            per-batch compute; this replaces n_batches dispatches + host
            stagings per epoch with one.  The measured DATASET stays
            device-resident across epochs (``data_dev``) — each scan step
            gathers its batch rows on device, so epochs do zero H2D.
            Shrink-wrap runs in-scan on its reference cadence
            (``adorym/ptychography.py:1220-1225``), and so does the
            reweighted-L1 weight refresh (every 10 batches from the
            carried params, ``adorym/ptychography.py:994-1000``)."""
            t = cfg.train
            has_mask = support_mask is not None
            needs_wl1 = self._needs_weight_l1

            def body(carry, xs):
                params, opt_state, mask, wl1 = carry
                i_b, th, it, pos, inds = xs
                meas = data_dev[it, inds]
                batch = {'i_theta': it, 'theta': th, 'pos_batch': pos,
                         'ind_batch': inds}
                if needs_wl1:
                    wl1 = jax.lax.cond(
                        i_b % 10 == 0,
                        lambda o, _: Reconstructor._weight_l1_refresh(o),
                        lambda _, w: w, params['obj'], wl1)
                params, opt_state, loss = (step_band if band_ok
                                            else step)(
                    params, opt_state, batch, meas,
                    wl1 if needs_wl1 else weight_l1,
                    i_opt_batch0 + i_b, global_batch0 + i_b,
                    mask if has_mask else None)
                if has_mask and t.shrink_cycle is not None:
                    gate = jnp.logical_and(i_b > 0,
                                           i_b % t.shrink_cycle == 0)
                    shrunk = mask * (params['obj'][..., 0]
                                     >= t.shrink_threshold)
                    mask = jnp.where(gate, shrunk, mask)
                return (params, opt_state, mask, wl1), loss

            n_b = theta_b.shape[0]
            zero = jnp.zeros((), jnp.float32)
            carry0 = (params, opt_state,
                      support_mask if has_mask else zero,
                      weight_l1 if needs_wl1 else zero)
            (params, opt_state, mask, _), losses = jax.lax.scan(
                body, carry0,
                (jnp.arange(n_b, dtype=jnp.int32), theta_b, itheta_b,
                 pos_b, inds_b))
            return params, opt_state, (mask if has_mask else None), losses

        self._epoch_fused = jax.jit(epoch_fused, donate_argnums=donate)
        return jax.jit(step_band if band_ok else step,
                       donate_argnums=donate)

    def _build_mc_step(self, apply_step, donate):
        """Compile the mesh patch-granular angle step (layout from
        ``_build_mc_layout``): one program per angle — shard-local rotate +
        prebin, halo-extended patch extraction, patch-granular grad with
        structured row-grid scatter into a slab accumulator, dp-psum, one
        halo-add, shard-local rotate-back, then the shared ``apply_step``.

        Collective budget per angle: 2 halo ``ppermute``s in, 1 out, one
        accumulator ``psum`` over 'dp', one tiny aux-grad ``psum`` — vs the
        reference's per-batch MPI alltoalls (``adorym/util.py:940,1056``).
        """
        cfg = self.cfg
        geo = cfg.geometry
        mc = self._mc
        mesh = self.mesh
        dp_ax, op_ax = cfg.parallel.axis_names
        from jax.sharding import PartitionSpec as P
        from .ops.rotate import (rotate, rotate_adjoint, rotate_and_bin_z,
                                 rotate_expanded_from_binned_z)
        from .parallel.halo import neighbor_extend
        predict_patches = self.model.predict_from_patches
        n_op, n_dp = mc['n_op'], mc['n_dp']
        S_u, S_p = mc['S_u'], mc['S_p']
        p0, px0, px1 = mc['p0'], mc['px0'], mc['px1']
        py, px = mc['py'], mc['px']
        gp, mp, mb = mc['g_rows'], mc['mp'], mc['mb']
        Y, X, nz, nzb = mc['Y'], mc['X'], mc['nz'], mc['nzb']
        prebin = mc['prebin']
        stride = mc['stride']
        two_d = geo.two_d_mode
        real_imag = cfg.train.unknown_type == 'real_imag'
        pad_x = np.array([[0, 0], [px0, px1]], np.int64)

        def grad_body(params_l, theta, i_theta, pos_l, inds_l, w_l, data_l):
            # Per-device blocks: squeeze the sharded op/dp axes.
            pos_l = pos_l[:, 0, 0]
            inds_l = inds_l[:, 0, 0]
            w_l = w_l[:, 0, 0]
            meas = data_l[i_theta, 0, 0].reshape(
                (mc['n_c'], gp * mp, py, px))
            k = jax.lax.axis_index(op_ax)
            obj = params_l['obj']                    # [S_u, X, nz, 2]
            aux = {n: v for n, v in params_l.items() if n != 'obj'}

            # Shard-local rotation (per-y-plane) + prebin, then x padding.
            if two_d:
                slab = obj
            elif prebin:
                slab = rotate_and_bin_z(obj, theta, geo.binning, method=cfg.train.interpolation)
            else:
                slab = rotate(obj, theta, method=cfg.train.interpolation)
            slab = patch_ops.pad_object(slab, pad_x, cfg.train.unknown_type)

            # Re-slab from the unpadded parameter grid to the padded
            # working grid + probe-height patch halo: two tiny ppermutes,
            # one window slice, vacuum where rows fall outside the object.
            ext = neighbor_extend(slab, mc['h1'], mc['h2'], op_ax, n_op)
            start = k * (S_p - S_u)
            win = jax.lax.dynamic_slice_in_dim(ext, start, S_p + py, axis=0)
            u = k * S_p - p0 + jnp.arange(S_p + py)
            valid = ((u >= 0) & (u < Y)).reshape(
                (S_p + py,) + (1,) * (win.ndim - 1))
            if real_imag:
                vac = jnp.zeros_like(win).at[..., 0].set(1.0)
            else:
                vac = jnp.zeros_like(win)
            win = jnp.where(valid, win, vac)
            if cfg.train.run_bfloat16:
                # Same bf16-extraction trick as the single-chip
                # patch_accum: value-identical patches, half the
                # extract/cotangent bytes; scatter upcasts into f32.
                win = win.astype(jnp.bfloat16)

            def mismatch(subobj, aux_p, batch, meas_c, w_c):
                pred = predict_patches(aux_p, batch, subobj, cfg,
                                       prebinned_z=prebin)
                per_item = model_base.mismatch_loss(
                    pred, meas_c, cfg.loss.loss_function_type,
                    cfg.loss.raw_data_type, cfg.loss.poisson_multiplier,
                    self.beamstop_mask, per_item=True)
                # Rows are shard-local; 'dp' holds mp of each row's
                # (padded) mb_pad patches with per-SPOT weights ``w_c``
                # (0 on the virtual pads and on whole padded rows), so
                # the local weighted sum / mb is a partial of the true
                # per-row mean — the dp-psum of both the losses and the
                # gradients restores the exact single-device objective.
                per_row = (per_item.reshape(gp, mp)
                           * w_c.reshape(gp, mp)).sum(axis=1) / mb
                return jnp.sum(per_row), per_row

            def chunk(carry, xs):
                acc_ext, acc_aux = carry
                pos_c, inds_c, meas_c, w_c = xs
                batch = {'i_theta': i_theta, 'theta': theta,
                         'pos_batch': pos_c, 'ind_batch': inds_c}
                posi = pos_c.astype(jnp.int32)
                subobj = patch_ops.extract_patches(win, posi, (py, px))
                (_, per_row), (g_sub, g_aux) = jax.value_and_grad(
                    mismatch, argnums=(0, 1), has_aux=True)(
                        subobj, aux, batch, meas_c, w_c)
                for r in range(gp):
                    acc_ext = patch_ops.scatter_rowgrid_add(
                        acc_ext, g_sub[r * mp:(r + 1) * mp],
                        posi[r * mp, 0], posi[r * mp, 1], stride)
                acc_aux = jax.tree.map(jnp.add, acc_aux, g_aux)
                return (acc_ext, acc_aux), per_row

            zero = (jnp.zeros((S_p + py, X + px0 + px1, nzb, 2),
                              jnp.float32),
                    jax.tree.map(jnp.zeros_like, aux))
            (acc_ext, acc_aux), losses = jax.lax.scan(
                chunk, zero, (pos_l, inds_l, meas, w_l))

            acc_ext = jax.lax.psum(acc_ext, dp_ax)
            g_aux = jax.lax.psum(acc_aux, (dp_ax, op_ax))
            losses = jax.lax.psum(losses, dp_ax)

            # Halo-add: the bottom py overflow rows belong to the next
            # shard's slab top (transpose of the gather halo).
            perm_fwd = [(i, (i + 1) % n_op) for i in range(n_op)]
            recv = jax.lax.ppermute(acc_ext[S_p:], op_ax, perm_fwd)
            acc_slab = acc_ext[:S_p].at[:py].add(recv)
            # Re-slab back to the unpadded parameter grid and crop x.
            ext2 = neighbor_extend(acc_slab, mc['p1'], p0, op_ax, n_op)
            start2 = p0 + mc['p1'] - k * (S_p - S_u)
            g_slab = jax.lax.dynamic_slice_in_dim(ext2, start2, S_u, axis=0)
            g_slab = g_slab[:, px0:px0 + X]
            # Expand z + rotate back — per-y-plane, shard-local.
            if two_d:
                g_obj = g_slab
            elif prebin and not cfg.train.exact_grad_rotation:
                g_obj = rotate_expanded_from_binned_z(
                    g_slab, -theta, geo.binning, nz, method=cfg.train.interpolation)
            else:
                if prebin:
                    g_obj = jnp.repeat(g_slab, geo.binning,
                                       axis=2)[:, :, :nz]
                else:
                    g_obj = g_slab
                g_obj = (rotate_adjoint(g_obj, theta, method=cfg.train.interpolation)
                         if cfg.train.exact_grad_rotation
                         else rotate(g_obj, -theta, method=cfg.train.interpolation))
            return g_obj, g_aux, losses

        spec_params = {n: (P(op_ax) if n == 'obj' else P())
                       for n in self.params}
        grad_fn = jax.shard_map(
            grad_body, mesh=mesh,
            in_specs=(spec_params, P(), P(), P(None, op_ax, dp_ax),
                      P(None, op_ax, dp_ax), P(None, op_ax, dp_ax),
                      P(None, op_ax, dp_ax)),
            out_specs=(P(op_ax), P(), P(None, op_ax)),
            check_vma=False)

        obj_off = self._obj_off_mesh
        cpu_be = jax.default_backend() == 'cpu'
        reg_list = self.reg_list
        needs_wl1 = self._needs_weight_l1
        n_real_rows = float(mc['n_rows'])
        interp = cfg.train.interpolation
        grad_back = getattr(self, '_grad_back', None)

        def mc_step(params, opt_state, theta, i_theta, pos_mc, inds_mc,
                    w_mc, data_mc, weight_l1, i_opt_batch, global_batch,
                    support_mask):
            if obj_off:
                # Per-op-shard pinned-host slab: one HBM visit per angle
                # (XLA:CPU cannot emit host-kind jit outputs — the driver
                # re-homes eagerly there instead).
                params = {**params,
                          'obj': jax.device_put(params['obj'],
                                                self._obj_mesh_dev_sh)}
            g_obj, g_aux, losses = grad_fn(params, theta, i_theta, pos_mc,
                                           inds_mc, w_mc, data_mc)
            grads = dict(g_aux)
            grads['obj'] = g_obj
            if reg_list:
                # Regularizers ride GSPMD on the op-sharded object OUTSIDE
                # the shard_map (the mesh-imm technique, VERDICT r4 item
                # 3): reference semantics evaluate them on the ROTATED
                # object once per accumulated batch (the single-chip
                # angle_step's ``n_real * g_reg``), and rotation is
                # per-y-plane so the extra rotate/rotate-back stay
                # shard-local — TV's 1-voxel x/z stencils partition with
                # automatic halos, never a full-object gather.
                obj_r = (params['obj'] if two_d
                         else rotate(params['obj'], theta, method=interp))
                rv, g_reg = jax.value_and_grad(
                    lambda o: regs.total_regularization(
                        reg_list, o, weight_l1=weight_l1))(obj_r)
                g_back = g_reg if two_d else grad_back(g_reg, theta)
                grads['obj'] = grads['obj'] + n_real_rows * g_back
                losses = losses + rv
            params, opt_state = apply_step(params, opt_state, grads,
                                           i_opt_batch, global_batch,
                                           support_mask)
            if obj_off and not cpu_be:
                params = {**params,
                          'obj': jax.device_put(params['obj'],
                                                self._obj_mesh_host_sh)}
            return params, opt_state, losses

        def mc_angles_epoch(params, opt_state, theta_e, itheta_e, pos_mc,
                            inds_mc, w_mc, data_mc, weight_l1, i_opt0,
                            gb0, n_b, support_mask):
            """Whole per-angle epoch of mesh steps as ONE program (the
            multi-chip analog of ``angles_epoch``): the scan tables and
            dataset already live sharded on the mesh, so scanning the
            angles removes the only remaining per-angle host work — the
            dispatch itself and its gaps.  The reweighted-L1 weights
            refresh in-scan at angle boundaries from the carried params,
            like ``angles_epoch``."""

            def body(carry, xs):
                p, o, i_opt, gb = carry
                theta, i_theta = xs
                wl1 = (Reconstructor._weight_l1_refresh(p['obj'])
                       if needs_wl1 else weight_l1)
                p, o, losses = mc_step(p, o, theta, i_theta, pos_mc,
                                       inds_mc, w_mc, data_mc, wl1,
                                       i_opt, gb, support_mask)
                return (p, o, i_opt + 1, gb + n_b), losses

            (params, opt_state, _, _), losses = jax.lax.scan(
                body, (params, opt_state, i_opt0, gb0),
                (theta_e, itheta_e))
            return params, opt_state, losses

        self._mc_angles_epoch = jax.jit(mc_angles_epoch,
                                        donate_argnums=donate)
        return jax.jit(mc_step, donate_argnums=donate)

    def _build_mc_imm_step(self, apply_step, donate):
        """Compile the mesh IMMEDIATE-update epoch (layout from
        ``_build_mc_imm_layout``): one program per epoch scanning per-
        batch steps — band psum in, rotate+grad the row band, band psum
        back, exact per-plane rotation adjoint, shard-local slab add,
        per-batch ``apply_step`` on the op-sharded params.

        Trajectory-equal (to f32 reduction noise) to the single-device
        immediate-fused epoch: the band decomposition is the same linear
        chain AD differentiates there — rotation is per-y-plane, so
        slicing the row band before rotating commutes with rotating the
        full object, and the band psum/adjoint are the extraction
        scatter's and rotation's exact transposes.
        """
        cfg = self.cfg
        geo = cfg.geometry
        mci = self._mci
        mesh = self.mesh
        dp_ax, op_ax = cfg.parallel.axis_names
        from jax.sharding import PartitionSpec as P
        from .ops.rotate import rotate, rotate_adjoint, rotate_and_bin_z
        predict_patches = self.model.predict_from_patches
        n_op, n_dp = mci['n_op'], mci['n_dp']
        px0, px1 = mci['px0'], mci['px1']
        py, px = mci['py'], mci['px']
        mpp, mb = mci['mpp'], mci['mb']
        Y, X, nz, nzb = mci['Y'], mci['X'], mci['nz'], mci['nzb']
        prebin = mci['prebin']
        stride = mci['stride']
        S_u = Y // n_op
        real_imag = cfg.train.unknown_type == 'real_imag'
        interp = cfg.train.interpolation
        pad_x = np.array([[0, 0], [px0, px1]], np.int64)

        def grad_body(params_l, theta, i_theta, i_row, y0, pos_l, inds_l,
                      w_l, data_l):
            pos_r = pos_l[i_row, 0, 0]               # [mpp, 2] float
            inds_r = inds_l[i_row, 0, 0]             # [mpp]
            w_r = w_l[i_row, 0, 0]                   # [mpp] spot weights
            meas = data_l[i_theta, i_row, 0, 0]      # [mpp, py, px]
            k = jax.lax.axis_index(op_ax)
            obj = params_l['obj']                    # [S_u, X, nz, 2]
            aux = {n: v for n, v in params_l.items() if n != 'obj'}

            # Assemble the row's UNROTATED y-band from the op slabs: each
            # shard contributes its owned rows, one psum merges them (at
            # most two shards own any given row — contributions are
            # disjoint).  Rows outside the object are vacuum, exactly the
            # post-rotation padding of the single-device step (rotation
            # preserves the constant vacuum plane bit-exactly, so
            # vacuum-fill commutes with the per-plane rotation).
            u = y0 + jnp.arange(py)                  # unpadded band rows
            loc = u - k * S_u
            own = (loc >= 0) & (loc < S_u)
            idx = jnp.clip(loc, 0, S_u - 1)
            band_k = jnp.where(own[:, None, None, None], obj[idx], 0.0)
            band = jax.lax.psum(band_k, op_ax)       # [py, X, nz, 2]
            valid = ((u >= 0) & (u < Y))[:, None, None, None]
            # Shared band decomposition (same code as the single-device
            # step_band): vacuum fill, rotate(+bin) the py planes
            # (duplicated per device — ~py/Y of a full rotation), x pad,
            # bf16 cast.
            rb = _band_rotate_fwd(band, valid, theta, cfg, px0, px1)

            def mismatch(subobj, aux_p, batch, meas_c):
                pred = predict_patches(aux_p, batch, subobj, cfg,
                                       prebinned_z=prebin)
                per_item = model_base.mismatch_loss(
                    pred, meas_c, cfg.loss.loss_function_type,
                    cfg.loss.raw_data_type, cfg.loss.poisson_multiplier,
                    self.beamstop_mask, per_item=True)
                # mpp slots of the batch's mb items live here, with
                # per-SPOT weights (0 on virtual pads; repeat-last
                # multiplicity on a ragged final row); the psum of the
                # weighted partial sums restores the exact batch mean.
                return jnp.sum(per_item * w_r) / mb

            batch = {'i_theta': i_theta, 'theta': theta,
                     'pos_batch': pos_r, 'ind_batch': inds_r}
            posi = jnp.round(pos_r).astype(jnp.int32)
            posi = jnp.stack([jnp.zeros_like(posi[:, 0]),
                              posi[:, 1] + px0], axis=1)
            subobj = patch_ops.extract_patches(rb, posi, (py, px))
            loss_part, (g_sub, g_aux) = jax.value_and_grad(
                mismatch, argnums=(0, 1))(subobj, aux, batch, meas)

            acc = jnp.zeros((py, X + px0 + px1, nzb, 2), jnp.float32)
            acc = patch_ops.scatter_rowgrid_add(acc, g_sub, posi[0, 0],
                                                posi[0, 1], stride)
            acc = jax.lax.psum(acc, (dp_ax, op_ax))
            g_aux = jax.lax.psum(g_aux, (dp_ax, op_ax))
            loss = jax.lax.psum(loss_part, (dp_ax, op_ax))

            # Backward (shared dispatch): default is the exact per-plane
            # rotation ADJOINT (the same linear transpose AD applies in
            # the single-device immediate step); imm_grad_rotation=
            # 'interp' selects the -theta interpolation instead — the
            # single-device band step uses the same dispatch, so mesh and
            # single-device stay trajectory-equal under either setting.
            g_band = _band_grad_back(acc, valid, theta, cfg, px0, X,
                                        nz)
            g_slab = jnp.zeros_like(obj).at[idx].add(
                jnp.where(own[:, None, None, None], g_band, 0.0))
            return g_slab, g_aux, loss

        spec_params = {n: (P(op_ax) if n == 'obj' else P())
                       for n in self.params}
        grad_fn = jax.shard_map(
            grad_body, mesh=mesh,
            in_specs=(spec_params, P(), P(), P(), P(),
                      P(None, op_ax, dp_ax), P(None, op_ax, dp_ax),
                      P(None, op_ax, dp_ax),
                      P(None, None, op_ax, dp_ax)),
            out_specs=(P(op_ax), P(), P()),
            check_vma=False)

        reg_list = self.reg_list
        needs_wl1 = self._needs_weight_l1

        def mc_imm_epoch(params, opt_state, theta_b, itheta_b, irow_b,
                         y0_b, pos_t, inds_t, w_t, data_t, weight_l1,
                         i_opt0, gb0, support_mask):
            """A whole immediate epoch of mesh per-batch steps as ONE
            program (the mesh analog of ``epoch_fused``).  Regularizers
            evaluate OUTSIDE the shard_map via GSPMD on the op-sharded
            object — their stencils (TV's 1-voxel neighbors) partition
            into automatic halo exchanges, never a full-object gather —
            and their gradient adds to the band gradient (sum rule; same
            total as the single-device joint AD).  The reweighted-L1
            weights refresh in-scan on the reference's 10-batch cadence
            like ``epoch_fused``."""

            t = cfg.train
            has_mask = support_mask is not None

            def body(carry, xs):
                p, o, i_b, wl1, mask = carry
                theta, i_theta, i_row, y0 = xs
                g_slab, g_aux, loss = grad_fn(p, theta, i_theta, i_row,
                                              y0, pos_t, inds_t, w_t,
                                              data_t)
                grads = dict(g_aux)
                grads['obj'] = g_slab
                if reg_list:
                    if needs_wl1:
                        wl1 = jax.lax.cond(
                            i_b % 10 == 0,
                            lambda ob, _: Reconstructor._weight_l1_refresh(
                                ob),
                            lambda _, w: w, p['obj'], wl1)
                    rv, rg = jax.value_and_grad(
                        lambda ob: regs.total_regularization(
                            reg_list, ob, weight_l1=wl1))(p['obj'])
                    grads['obj'] = grads['obj'] + rg
                    loss = loss + rv
                p, o = apply_step(p, o, grads, i_opt0 + i_b, gb0 + i_b,
                                  mask if has_mask else None)
                # In-scan shrink-wrap on the reference cadence, like the
                # single-chip epoch_fused (elementwise on the sharded
                # object — GSPMD, no collectives).
                if has_mask and t.shrink_cycle is not None:
                    gate = jnp.logical_and(i_b > 0,
                                           i_b % t.shrink_cycle == 0)
                    shrunk = mask * (p['obj'][..., 0]
                                     >= t.shrink_threshold)
                    mask = jnp.where(gate, shrunk, mask)
                return (p, o, i_b + 1, wl1, mask), loss

            n_b = theta_b.shape[0]
            zero = jnp.zeros((), jnp.float32)
            wl1_0 = weight_l1 if needs_wl1 else zero
            mask0 = support_mask if has_mask else zero
            (params, opt_state, _, _, mask), losses = jax.lax.scan(
                body, (params, opt_state, jnp.asarray(0, jnp.int32),
                       wl1_0, mask0),
                (theta_b, itheta_b, irow_b, y0_b))
            return params, opt_state, (mask if has_mask else None), losses

        return jax.jit(mc_imm_epoch, donate_argnums=donate)

    # ------------------------------------------------------------------
    def make_batches(self, rng: np.random.Generator):
        """Same-angle minibatches, angles shuffled, positions in scan order
        (shuffled only under ``randomize_probe_pos``,
        ``adorym/ptychography.py:808``) and padded to a full final batch
        (``adorym/ptychography.py:791-847``).

        Final-batch padding: the reference re-draws RANDOM spots; for a
        static (non-randomized) ragged ROW-GRID table we instead repeat
        the LAST spot — deterministic, and exactly expressible as a
        per-spot weight multiplicity, which is what lets the mesh
        immediate fast path process ragged rows (``_build_mc_imm_layout``;
        documented deviation, PARITY.md).  Random tables keep the
        reference's re-draw."""
        mb = self.cfg.train.minibatch_size
        n_spots = self.probe_pos.shape[-2]  # blocks (multi-dist) or spots
        deterministic_pad = (not self.cfg.train.randomize_probe_pos
                             and self.probe_pos.ndim == 2
                             and patch_ops.detect_row_grid_ragged(
                                 self.probe_pos, mb,
                                 self.cfg.geometry.probe_size) is not None)
        batches = []
        for i_theta in rng.permutation(self.n_theta):
            spots = (rng.permutation(n_spots)
                     if self.cfg.train.randomize_probe_pos
                     else np.arange(n_spots))
            n_batches = -(-n_spots // mb)
            pad = n_batches * mb - n_spots
            if pad:
                tail = (np.full(pad, n_spots - 1) if deterministic_pad
                        else rng.choice(n_spots, pad))
                spots = np.concatenate([spots, tail])
            for b in range(n_batches):
                batches.append((int(i_theta), spots[b * mb:(b + 1) * mb]))
        return batches

    def _stage_angle(self, i_theta, inds_list):
        """Chunked per-angle tables for ``angle_step``: fuse ``fuse_g``
        minibatches per gradient chunk, padding the batch axis with
        repeats of the last batch at weight 0 (see the angle_step
        docstring).  Returns numpy ``(inds [n_c, g*mb] int32,
        pos [n_c, g*mb, 2] f32, w [n_c, g] f32, n_b)``."""
        inds_arr = np.stack(inds_list)                    # [n_b, mb]
        n_b = len(inds_list)
        mb = inds_arr.shape[1]
        g = min(self._fuse_g, n_b)
        n_c = -(-n_b // g)
        pad_b = n_c * g - n_b
        w_arr = np.ones(n_b, np.float32)
        if pad_b:
            inds_arr = np.concatenate(
                [inds_arr, np.repeat(inds_arr[-1:], pad_b, axis=0)])
            w_arr = np.concatenate([w_arr, np.zeros(pad_b, np.float32)])
        pos_table = (self.probe_pos if self.probe_pos.ndim == 2
                     else self.probe_pos[i_theta])
        pos = pos_table[inds_arr].reshape(n_c, g * mb, 2)
        return (inds_arr.reshape(n_c, g * mb).astype(np.int32),
                pos.astype(np.float32), w_arr.reshape(n_c, g), n_b)

    @staticmethod
    def _weight_l1_refresh(obj):
        """Reweighted-L1 weights ``max(obj) / (|obj| + 1e-4 mean(obj))``
        (``adorym/ptychography.py:997-999``); ones until the object first
        becomes nonzero.  Pure device math — the fused epoch recomputes it
        in-scan at every angle boundary."""
        denom = jnp.abs(obj) + 1e-4 * jnp.mean(obj)
        w = jnp.where(denom > 0, jnp.max(obj) / denom, 1.0)
        return jnp.nan_to_num(w, nan=1.0, posinf=1.0)

    def _rol_active(self) -> bool:
        """Rotate-out-of-loop semantics are in effect.  Tilt (refined or
        fixed) has precedence: the model applies the 3-axis tilt rotation
        inside AD, so the driver must neither pre-rotate by theta nor
        rotate gradients back (``adorym/forward_model.py:265-276``)."""
        t = self.cfg.train
        return (t.rotate_out_of_loop and not self.cfg.geometry.two_d_mode
                and not self.cfg.refine.tilt_active)

    def _per_angle_path_ok(self) -> bool:
        """The epoch routes to the per-angle accumulate path
        (:meth:`_run_epoch_angles`) — see the routing comment in
        :meth:`run_epoch`."""
        t = self.cfg.train
        rol = self._rol_active()
        use_accum = ((t.update_scheme == 'per angle' or rol
                      or t.n_batch_per_update > 1)
                     and not self.second_order)
        return (use_accum and t.update_scheme == 'per angle'
                and t.n_batch_per_update <= 1
                and (rol or self.cfg.geometry.two_d_mode)
                and self.expand_indices is None)

    @staticmethod
    def _group_batches(batches):
        """Group (contiguous, same-angle) batches by angle:
        ``[(i_theta, [inds, ...]), ...]``."""
        groups = []
        for i_theta, inds in batches:
            if groups and groups[-1][0] == i_theta:
                groups[-1][1].append(inds)
            else:
                groups.append((i_theta, [inds]))
        return groups

    def _angles_fused_ok(self, groups) -> bool:
        """Whole-epoch fusion of the per-angle scheme (``angles_epoch``):
        eligible when no step needs a mid-epoch host visit — the dataset
        is device-resident, nothing streams through the host (offload,
        loader), no per-batch host-side state (external algorithm, shrink
        cycle, batch-level dumps; the reweighted-L1 refresh is pure device
        math and recomputes in-scan at angle boundaries), and every
        angle has the same batch count (uniform scan shapes).
        Mid-epoch checkpoints collapse to epoch granularity, like
        ``_run_epoch_fused`` (PARITY.md 'Known deviations')."""
        return (self._mc is None and self.mesh is None
                and not self._obj_offloaded and not self._off_state
                and self.loader is None and self._data_dev_ok
                and self.data is not None
                and self.external_algorithm is None
                and self.cfg.train.shrink_cycle is None
                and len(groups) > 1
                and len({len(il) for _, il in groups}) == 1
                and not (self.output_folder is not None
                         and self.cfg.io.save_intermediate
                         and self.cfg.io.save_intermediate_level == 'batch'))

    def _mc_fused_ok(self, groups) -> bool:
        """Epoch fusion gate for the mesh fast path: like
        :meth:`_angles_fused_ok` but the residency conditions are already
        guaranteed by ``_build_mc_layout`` (sharded device tables, no
        loader/offload; regularizers ride GSPMD in-step and rwL1
        refreshes in-scan)."""
        return (self._mc is not None and not self._off_state
                and self.cfg.train.shrink_cycle is None
                and len(groups) > 1
                and len({len(il) for _, il in groups}) == 1
                and not (self.output_folder is not None
                         and self.cfg.io.save_intermediate
                         and self.cfg.io.save_intermediate_level == 'batch'))

    def _run_epoch_mc_fused(self, i_epoch: int, groups, mc_dev,
                            callback) -> float:
        """Whole per-angle epoch of mesh steps in one program (see
        ``mc_angles_epoch`` in _build_mc_step)."""
        return self._fused_finish(
            self._mc_fused_dispatch(i_epoch, groups, mc_dev), callback)

    def _mc_fused_dispatch(self, i_epoch: int, groups, mc_dev) -> dict:
        """Mesh analog of :meth:`_fused_dispatch` (same pending contract)."""
        mc = self._mc
        n_b = len(groups[0][1])
        theta_e = np.asarray([self.theta_ls[i] for i, _ in groups],
                             np.float32)
        itheta_e = np.asarray([i for i, _ in groups], np.int32)
        with self.timers.time('angle_step'):
            self.params, self.opt_state, losses = self._mc_angles_epoch(
                self.params, self.opt_state, jnp.asarray(theta_e),
                jnp.asarray(itheta_e), mc_dev['pos'], mc_dev['inds'],
                mc_dev['w'], mc_dev['data'], self.weight_l1,
                jnp.asarray(self.i_opt_batch, jnp.int32),
                jnp.asarray(self.global_batch, jnp.int32),
                jnp.asarray(n_b, jnp.int32), self.finite_support_mask)
        n_groups = len(groups)
        gb_before = self.global_batch
        self.i_opt_batch += n_groups
        self.global_batch += n_groups * n_b
        self._rehome_state()
        return {'i_epoch': i_epoch, 'losses': losses,
                'map_losses': lambda ls: np.concatenate(
                    [self._mc_map_losses(ls[a]) for a in range(n_groups)]),
                'label': 'fused mesh angles',
                'gb_before': gb_before, 'gb_after': self.global_batch}

    def _mc_map_losses(self, losses_np):
        """Map one angle's mesh slot losses ``[n_c, n_op*g_rows]`` back to
        scan-order rows (shared by the fused and per-angle mc paths)."""
        mc = self._mc
        rid, wmask = mc['row_ids'], mc['w'] > 0
        ls = losses_np.reshape(mc['n_c'], mc['n_op'], mc['g_rows'])
        per_shard = ls.transpose(1, 0, 2).reshape(mc['n_op'], mc['R'])
        pr = np.zeros(mc['n_rows'], np.float32)
        for k in range(mc['n_op']):
            pr[rid[k][wmask[k]]] = per_shard[k][wmask[k]]
        return pr

    def _mc_imm_ok(self, batches) -> bool:
        """Epoch gate for the mesh immediate fast path: nothing needs a
        mid-epoch host visit (batch dumps; shrink-wrap runs IN-scan) and
        the epoch's batches are whole in-order rows
        of the static table (``make_batches`` shuffles angles but keeps
        positions in scan order unless ``randomize_probe_pos``)."""
        if (self._mci is None or self.loader is not None
                or self.expand_indices is not None
                or (self.output_folder is not None
                    and self.cfg.io.save_intermediate
                    and self.cfg.io.save_intermediate_level == 'batch')):
            return False
        mb = self._mci['mb']
        n_pos = self.n_pos
        for _, inds in batches:
            inds = np.asarray(inds)
            if len(inds) != mb or inds[0] % mb:
                return False
            # A full row is [st, st+mb); the ragged final row is the real
            # tail + make_batches's deterministic repeat-last padding
            # (clamping arange reproduces both).
            expect = np.minimum(np.arange(inds[0], inds[0] + mb),
                                n_pos - 1)
            if not np.array_equal(inds, expect):
                return False
        return True

    def _run_epoch_mc_imm(self, i_epoch: int, batches, callback) -> float:
        """Whole immediate epoch of mesh per-batch steps in one program
        (see ``mc_imm_epoch`` in _build_mc_imm_step)."""
        return self._fused_finish(
            self._mc_imm_dispatch(i_epoch, batches), callback)

    def _mc_imm_dispatch(self, i_epoch: int, batches) -> dict:
        """Mesh-immediate analog of :meth:`_fused_dispatch` (same
        pending contract, so :meth:`run_epochs` can pipeline it)."""
        mci = self._mci
        dev = self._mc_imm_device_tables()
        n_b = len(batches)
        mb = mci['mb']
        theta_b = np.empty(n_b, np.float32)
        itheta_b = np.empty(n_b, np.int32)
        irow_b = np.empty(n_b, np.int32)
        for i, (i_theta, inds) in enumerate(batches):
            theta_b[i] = self.theta_ls[i_theta]
            itheta_b[i] = i_theta
            irow_b[i] = inds[0] // mb
        y0_b = mci['y0'][irow_b]
        with self.timers.time('train_step'):
            self.params, self.opt_state, mask, losses = self._mc_imm_epoch(
                self.params, self.opt_state, jnp.asarray(theta_b),
                jnp.asarray(itheta_b), jnp.asarray(irow_b),
                jnp.asarray(y0_b), dev['pos'], dev['inds'], dev['w'],
                dev['data'], self.weight_l1,
                jnp.asarray(self.i_opt_batch, jnp.int32),
                jnp.asarray(self.global_batch, jnp.int32),
                self.finite_support_mask)
        if mask is not None:
            self.finite_support_mask = mask
        gb_before = self.global_batch
        self.i_opt_batch += n_b
        self.global_batch += n_b
        self._rehome_state()
        return {'i_epoch': i_epoch, 'losses': losses,
                'map_losses': lambda ls: ls.ravel(),
                'label': 'fused mesh immediate',
                'gb_before': gb_before, 'gb_after': self.global_batch}

    def _fused_dispatch(self, i_epoch: int, groups) -> dict:
        """Stage + enqueue one whole-epoch ``angles_epoch`` program and
        return a pending handle WITHOUT fetching the losses — the D2H
        fetch in :meth:`_fused_finish` is the only sync, so a caller may
        dispatch the next epoch first and hide this epoch's dispatch +
        round-trip cost behind device execution (see :meth:`run_epochs`)."""
        staged = [self._stage_angle(i_theta, il) for i_theta, il in groups]
        n_b = staged[0][3]
        inds_e = np.stack([s[0] for s in staged])
        pos_e = np.stack([s[1] for s in staged])
        w_e = np.stack([s[2] for s in staged])
        theta_e = np.asarray([self.theta_ls[i] for i, _ in groups],
                             np.float32)
        itheta_e = np.asarray([i for i, _ in groups], np.int32)
        with self.timers.time('data_staging'):
            if self._data_dev is None:
                self._data_dev = jnp.asarray(self.data)
        with self.timers.time('angle_step'):
            self.params, self.opt_state, losses = self._angles_epoch(
                self.params, self.opt_state, jnp.asarray(theta_e),
                jnp.asarray(itheta_e), jnp.asarray(pos_e),
                jnp.asarray(inds_e), jnp.asarray(w_e), self._data_dev,
                self.weight_l1, jnp.asarray(self.i_opt_batch, jnp.int32),
                jnp.asarray(self.global_batch, jnp.int32),
                jnp.asarray(n_b, jnp.int32), self.finite_support_mask)
        n_groups = len(groups)
        gb_before = self.global_batch
        self.i_opt_batch += n_groups
        self.global_batch += n_groups * n_b
        self._rehome_state()
        return {'i_epoch': i_epoch, 'losses': losses,
                'map_losses': lambda ls: ls.reshape(
                    n_groups, -1)[:, :n_b].ravel(),
                'label': 'fused angles',
                'gb_before': gb_before, 'gb_after': self.global_batch}

    def _fused_finish(self, pend: dict, callback) -> float:
        """Fetch a pending fused epoch's losses (the sync point) and run
        the host-side epilogue: logging, checkpoint cadence, walltime."""
        t = self.cfg.train
        i_epoch = pend['i_epoch']
        # The D2H fetch is where device execution is actually awaited —
        # time it into angle_step so the verbose patterns/s covers
        # execution, not just the (async) dispatch.
        with self.timers.time('angle_step'):
            losses_np = np.asarray(pend['losses'])
        losses = [float(v) for v in pend['map_losses'](losses_np)]
        if callback is not None or self._logger is not None:
            for b, l in enumerate(losses):
                if callback is not None:
                    callback(i_epoch, b, l)
                if self._logger is not None:
                    self._logger.log(i_epoch, b, l)
        # Checkpoint at epoch granularity, on the reference's cross-epoch
        # every-N-batches cadence: save when this epoch's global batch
        # counter crossed a multiple of n_batch_per_checkpoint (a
        # per-epoch ``len(losses) >= N`` test would never save when one
        # epoch has fewer batches than the cadence).
        n_ckpt = self.cfg.io.n_batch_per_checkpoint
        # The checkpoint stores the NEXT (epoch, batch) to run — here the
        # epoch just completed, so resume at (i_epoch + 1, 0).
        if (self.output_folder is not None and self.cfg.io.store_checkpoint
                and pend['gb_after'] // n_ckpt > pend['gb_before'] // n_ckpt):
            self.save_checkpoint(i_epoch + 1, 0)
        t_max = self.cfg.io.t_max_min
        if t_max is not None and (time.time() - self._t_start) / 60 > t_max:
            if self.output_folder is not None:
                self.save_checkpoint(i_epoch + 1, 0)
            self.stop_requested = True
        mean_loss = float(np.mean(losses))
        self.loss_history.append(mean_loss)
        if self.verbose:
            n_patterns = len(losses) * t.minibatch_size
            dt = self.timers.total.get('angle_step', 0.0) or 1e-9
            self._print(f'[epoch {i_epoch}] loss={mean_loss:.4e} '
                        f'{n_patterns / dt:.1f} patterns/s ({pend["label"]}); '
                        f'{self.timers.summary()}')
            self.timers.reset()
        return mean_loss

    def _run_epoch_angles_fused(self, i_epoch: int, groups,
                                callback) -> float:
        """One compiled program for the whole per-angle epoch (see
        ``angles_epoch`` in _build_step): removes the per-angle host
        staging and dispatch gaps — measured 57 vs 67-74 ms/angle at the
        flagship bench over the remote-dispatch tunnel."""
        return self._fused_finish(self._fused_dispatch(i_epoch, groups),
                                  callback)

    def run_epochs(self, n_epochs: int, start_epoch: Optional[int] = None,
                   callback=None) -> list:
        """Pipelined multi-epoch driver: when consecutive epochs take the
        fused-angles path with no mid-stream host visit, epoch ``r+1`` is
        DISPATCHED before epoch ``r``'s losses are fetched, so the
        per-epoch dispatch + D2H round trip (the dominant fixed cost of a
        short epoch on a remote-dispatch link) overlaps device execution.
        Math and trajectories are identical to sequential
        :meth:`run_epoch` calls — only the loss fetch is deferred by one
        epoch (``tests/test_fused_angles_epoch.py``).  Epochs that are
        not eligible (or that must checkpoint / dump intermediates, whose
        epilogue reads ``params`` and must not observe the next epoch's
        update) drain the pipeline and run through :meth:`run_epoch`.

        Returns the per-epoch mean losses, one per epoch."""
        if start_epoch is None:
            # Resume-aware like run(): continue after a restored
            # checkpoint rather than replaying epoch labels from 0.
            start_epoch = self._start_epoch
        out = []
        pending = None
        # Checkpoints/intermediates read params at finish time; with the
        # next epoch already dispatched they would capture ITS state, so
        # any host-side output — including the t_max emergency
        # checkpoint — disables pipelining for the run.  A user callback
        # might do the same (it is invoked at finish time and can touch
        # ``rec.params``), so it disables pipelining too.
        may_pipeline = (callback is None
                        and (self.output_folder is None
                             or not (self.cfg.io.store_checkpoint
                                     or self.cfg.io.save_intermediate
                                     or self.cfg.io.t_max_min is not None)))
        for i_epoch in range(start_epoch, start_epoch + n_epochs):
            if self.stop_requested:  # t_max walltime exit
                break
            rng = np.random.default_rng(self.cfg.train.seed + i_epoch)
            batches = self.make_batches(rng)
            groups = self._group_batches(batches)
            fused_ok = (self._per_angle_path_ok()
                        and self._angles_fused_ok(groups))
            mc_ok = (not fused_ok and self._per_angle_path_ok()
                     and self._mc is not None
                     and self._mc_fused_ok(groups))
            imm_ok = (not (fused_ok or mc_ok)
                      and not self._per_angle_path_ok()
                      and self._mci is not None
                      and self._mc_imm_ok(batches))
            sfi_ok = (not (fused_ok or mc_ok or imm_ok)
                      and not self._per_angle_path_ok()
                      and self._imm_fused_ok(batches))
            if may_pipeline and (fused_ok or mc_ok or imm_ok or sfi_ok):
                if fused_ok:
                    pend = self._fused_dispatch(i_epoch, groups)
                elif mc_ok:
                    pend = self._mc_fused_dispatch(
                        i_epoch, groups, self._mc_device_tables())
                elif imm_ok:
                    pend = self._mc_imm_dispatch(i_epoch, batches)
                else:
                    pend = self._imm_fused_dispatch(i_epoch, batches)
                if pending is not None:
                    out.append(self._fused_finish(pending, callback))
                pending = pend
            else:
                if pending is not None:
                    out.append(self._fused_finish(pending, callback))
                    pending = None
                # run_epoch re-derives the same rng from (seed + i_epoch),
                # reproducing the batches used for the eligibility check.
                out.append(self.run_epoch(i_epoch, callback=callback))
        if pending is not None:
            out.append(self._fused_finish(pending, callback))
        return out

    def _angle_epilogue(self, i_epoch: int, i_batch_epoch: int,
                        n_b_angle: int, n_b_epoch: int = -1) -> int:
        """Shared per-angle host epilogue of the per-angle dispatch paths
        (single-chip and mesh): shrink-wrap at angle granularity — the
        slow path updates the mask every ``shrink_cycle`` batches
        (``adorym/ptychography.py:1220-1225``), here the check runs once
        per angle, applying when the epoch's batch counter crossed a
        cycle boundary inside this angle — batch-level intermediate dumps
        (at angle granularity, one host visit per angle), checkpoint
        cadence rounded to angle boundaries, and the t_max walltime exit
        (sets ``stop_requested``).  Returns the advanced batch counter."""
        prev_b = i_batch_epoch
        i_batch_epoch += n_b_angle
        t = self.cfg.train
        if (self.finite_support_mask is not None
                and t.shrink_cycle is not None
                and i_batch_epoch // t.shrink_cycle
                > prev_b // t.shrink_cycle):
            self.finite_support_mask = self._shrink_fn(
                self.finite_support_mask, self.params['obj'])
        if (self.output_folder is not None
                and self.cfg.io.save_intermediate
                and self.cfg.io.save_intermediate_level == 'batch'):
            self._save_intermediate(i_epoch, i_batch_epoch - 1)
        # Checkpoints store the NEXT (epoch, batch) to run.  At an angle
        # boundary that is (i_epoch, batches-done-this-epoch), or the next
        # epoch when this was the last angle — resume skips the completed
        # angles (run_epoch), so no update is ever applied twice.
        if i_batch_epoch == n_b_epoch:
            nxt = (i_epoch + 1, 0)
        else:
            nxt = (i_epoch, i_batch_epoch)
        if (self.output_folder is not None
                and self.cfg.io.store_checkpoint
                and self.i_opt_batch % max(
                    1, self.cfg.io.n_batch_per_checkpoint
                    // max(1, n_b_angle)) == 0):
            self.save_checkpoint(*nxt)
        t_max = self.cfg.io.t_max_min
        if t_max is not None and (time.time() - self._t_start) / 60 > t_max:
            if self.output_folder is not None:
                self.save_checkpoint(*nxt)
            self.stop_requested = True
        return i_batch_epoch

    def _run_epoch_angles(self, i_epoch: int, batches, callback,
                          skip: int = 0) -> float:
        """Angle-granular epoch: every angle's minibatches run inside one
        jitted ``angle_step`` (see _build_step).  ``skip``: number of
        leading batches already completed by an interrupted run (resume)
        — whole angles are dropped (saves happen at angle boundaries, so
        the split is exact; a misaligned count rounds DOWN, re-running at
        most one angle whose update never applied)."""
        t = self.cfg.train
        groups = self._group_batches(batches)
        n_b_epoch = sum(len(il) for _, il in groups)
        dropped = 0
        if skip:
            kept = []
            for i_theta, il in groups:
                if dropped + len(il) <= skip and not kept:
                    dropped += len(il)
                else:
                    kept.append((i_theta, il))
            groups = kept

        if not skip and self._angles_fused_ok(groups):
            return self._run_epoch_angles_fused(i_epoch, groups, callback)
        mc = self._mc
        if mc is not None:
            mc_dev = self._mc_device_tables()
            if not skip and self._mc_fused_ok(groups):
                return self._run_epoch_mc_fused(i_epoch, groups, mc_dev,
                                                callback)
        losses_dev = []
        i_batch_epoch = dropped  # per-epoch batch counter (resume-aware)
        for i_theta, inds_list in groups:
            if mc is not None:
                # Mesh patch-granular fast path: the static tables + the
                # dataset already live sharded on the mesh — the per-angle
                # call moves two scalars.
                if self._needs_weight_l1:
                    self.weight_l1 = self._weight_l1_refresh(
                        self.params['obj'])
                with self.timers.time('angle_step'):
                    self.params, self.opt_state, losses = self._mc_step(
                        self.params, self.opt_state,
                        jnp.asarray(self.theta_ls[i_theta], jnp.float32),
                        jnp.asarray(i_theta, jnp.int32),
                        mc_dev['pos'], mc_dev['inds'], mc_dev['w'],
                        mc_dev['data'], self.weight_l1,
                        jnp.asarray(self.i_opt_batch, jnp.int32),
                        jnp.asarray(self.global_batch, jnp.int32),
                        self.finite_support_mask)
                self.i_opt_batch += 1
                self.global_batch += len(inds_list)
                self._rehome_state()
                losses_dev.append(losses)
                i_batch_epoch = self._angle_epilogue(
                    i_epoch, i_batch_epoch, len(inds_list), n_b_epoch)
                if self.stop_requested:
                    break
                continue
            if self._needs_weight_l1:
                self.weight_l1 = self._weight_l1_refresh(self.params['obj'])
            inds_np, pos_np, w_np, n_b = self._stage_angle(i_theta,
                                                           inds_list)
            n_c = inds_np.shape[0]
            pos_all = jnp.asarray(pos_np)
            inds_all = jnp.asarray(inds_np)
            w_all = jnp.asarray(w_np)
            with self.timers.time('data_staging'):
                if self.loader is not None:
                    # Out-of-core data: the native mmap loader gathers the
                    # whole angle's rows (page-cache-hot after epoch 0).
                    measured = jnp.asarray(
                        self.loader.gather(i_theta, inds_np.ravel())
                        .reshape(inds_np.shape + self.loader.shape[2:]))
                elif self._data_dev_ok:
                    if self._data_dev is None:
                        self._data_dev = jnp.asarray(self.data)
                    # Zero per-angle H2D: gather the angle's rows on device.
                    measured = self._data_dev[i_theta][inds_all].reshape(
                        inds_np.shape + self.data.shape[2:])
                else:
                    measured = jnp.asarray(
                        self.data[i_theta][inds_np].reshape(
                            inds_np.shape + self.data.shape[2:]))
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                dp = self.cfg.parallel.axis_names[0]
                # Chunk-axis dp split only when it divides (device_put
                # rejects uneven shardings); else replicate — correct,
                # redundant-compute (see parallel.mesh.batch_specs).
                n_chunk = int(pos_all.shape[1])
                bspec = (P(None, dp)
                         if n_chunk % self.cfg.parallel.data_axis == 0
                         else P())
                pos_all = jax.device_put(
                    pos_all, NamedSharding(self.mesh, bspec))
                inds_all = jax.device_put(
                    inds_all, NamedSharding(self.mesh, bspec))
                measured = jax.device_put(
                    measured, NamedSharding(self.mesh, bspec))
            with self.timers.time('angle_step'):
                if self._obj_offloaded:
                    losses = self._run_offl_angle(i_theta, pos_all,
                                                  inds_all, measured,
                                                  w_all)
                else:
                    self.params, self.opt_state, losses = self._angle_step(
                        self.params, self.opt_state,
                        jnp.asarray(self.theta_ls[i_theta], jnp.float32),
                        jnp.asarray(i_theta, jnp.int32),
                        pos_all, inds_all, measured, w_all, self.weight_l1,
                        jnp.asarray(self.i_opt_batch, jnp.int32),
                        jnp.asarray(self.global_batch, jnp.int32),
                        self.finite_support_mask)
            losses = jnp.ravel(losses)[:n_b]
            self.i_opt_batch += 1
            self.global_batch += len(inds_list)
            self._rehome_state()
            self._apply_external_algorithm()
            losses_dev.append(losses)
            i_batch_epoch = self._angle_epilogue(i_epoch, i_batch_epoch,
                                                 len(inds_list), n_b_epoch)
            if self.stop_requested:
                break

        if mc is not None:
            # Map the [n_c, n_op*g_rows] per-slot losses back to scan-order
            # rows (padding slots carry weight 0 and are dropped).
            losses = list(np.concatenate(
                [self._mc_map_losses(np.asarray(arr))
                 for arr in losses_dev]))
        else:
            losses = list(np.concatenate([np.asarray(v)
                                          for v in losses_dev]))
        if callback is not None or self._logger is not None:
            for b, l in enumerate(losses, start=dropped):
                if callback is not None:
                    callback(i_epoch, b, float(l))
                if self._logger is not None:
                    self._logger.log(i_epoch, b, float(l))
        mean_loss = float(np.mean(losses))
        self.loss_history.append(mean_loss)
        if self.verbose:
            n_patterns = len(losses) * self.cfg.train.minibatch_size
            dt = self.timers.total.get('angle_step', 0.0) or 1e-9
            self._print(f'[epoch {i_epoch}] loss={mean_loss:.4e} '
                        f'{n_patterns / dt:.1f} patterns/s; '
                        f'{self.timers.summary()}')
            self.timers.reset()
        return mean_loss

    def _run_epoch_fused(self, i_epoch: int, batches, callback) -> float:
        """Whole-epoch fusion for the immediate-update scheme (see
        ``epoch_fused`` in _build_step): one device dispatch per epoch."""
        return self._fused_finish(
            self._imm_fused_dispatch(i_epoch, batches), callback)

    def _imm_fused_dispatch(self, i_epoch: int, batches) -> dict:
        """Single-device immediate analog of :meth:`_fused_dispatch`
        (same pending contract, so :meth:`run_epochs` can pipeline it).
        The in-scan rwL1 refresh fires at batch 0, so the weight_l1
        argument is never stale under pipelining; the shrink-wrap mask
        chains through the returned (async) device value."""
        t = self.cfg.train
        n_b = len(batches)
        theta_b = np.empty(n_b, np.float32)
        itheta_b = np.empty(n_b, np.int32)
        inds_arr = np.empty((n_b, t.minibatch_size), np.int64)
        pos_b = np.empty((n_b, t.minibatch_size, 2), np.float32)
        for i, (i_theta, inds) in enumerate(batches):
            theta_b[i] = self.theta_ls[i_theta]
            itheta_b[i] = i_theta
            inds_arr[i] = inds
            table = (self.probe_pos if self.probe_pos.ndim == 2
                     else self.probe_pos[i_theta])
            pos_b[i] = table[inds]
        with self.timers.time('data_staging'):
            if self._data_dev is None:
                # Once per run: the dataset stays device-resident; every
                # fused epoch gathers batch rows on device (zero H2D).
                self._data_dev = jnp.asarray(self.data)
        with self.timers.time('angle_step'):
            self.params, self.opt_state, mask, losses = self._epoch_fused(
                self.params, self.opt_state,
                jnp.asarray(theta_b), jnp.asarray(itheta_b),
                jnp.asarray(pos_b), jnp.asarray(inds_arr, jnp.int32),
                self._data_dev, self.weight_l1,
                jnp.asarray(self.i_opt_batch, jnp.int32),
                jnp.asarray(self.global_batch, jnp.int32),
                self.finite_support_mask)
        if mask is not None:
            self.finite_support_mask = mask
        gb_before = self.global_batch
        self.i_opt_batch += n_b
        self.global_batch += n_b
        self._rehome_state()
        return {'i_epoch': i_epoch, 'losses': losses,
                'map_losses': lambda ls: ls.ravel(),
                'label': 'fused epoch',
                'gb_before': gb_before, 'gb_after': self.global_batch}

    def _imm_fused_ok(self, batches) -> bool:
        """Eligibility of the single-device fused immediate epoch (the
        routing conditions of :meth:`run_epoch`, shared with
        :meth:`run_epochs` for pipelining)."""
        t = self.cfg.train
        use_accum = ((t.update_scheme == 'per angle' or self._rol_active()
                      or t.n_batch_per_update > 1)
                     and not self.second_order)
        data_bytes = (self.data.dtype.itemsize * len(batches)
                      * t.minibatch_size
                      * int(np.prod(self.data.shape[2:]))
                      if self.data is not None else np.inf)
        return (not use_accum and not self.second_order
                and self.external_algorithm is None
                and self.loader is None and self.expand_indices is None
                and self.mesh is None
                and not (self.output_folder is not None
                         and self.cfg.io.save_intermediate
                         and self.cfg.io.save_intermediate_level
                         == 'batch')
                and data_bytes <= _prof.data_headroom_bytes())

    def run_epoch(self, i_epoch: int, rng: Optional[np.random.Generator] = None,
                  callback=None) -> float:
        if rng is None:
            rng = np.random.default_rng(self.cfg.train.seed + i_epoch)
        # Per-batch losses stay on device until the epoch ends: a per-batch
        # scalar fetch would serialize dispatch on the host<->TPU round-trip
        # and halve sustained throughput.
        losses_dev = []
        batch_ids = []
        batches = self.make_batches(rng)
        # Resume position: a restored checkpoint names the NEXT (epoch,
        # batch) to run; the first resumed epoch skips its completed
        # leading batches (``adorym/ptychography.py:859`` starting_batch).
        skip = 0
        if i_epoch == self._start_epoch and self._start_batch:
            skip = min(self._start_batch, len(batches))
            self._start_batch = 0
        # Reweighted-L1 weight refresh cadence: every 10 batches, exactly
        # like the reference (``adorym/ptychography.py:998``).
        update_interval = 10

        # Accumulate-then-update schemes: 'per angle' gating
        # (``adorym/ptychography.py:1095-1099``) and rotate-out-of-loop
        # (``:937-940,1069-1078``): the object is rotated ONCE per angle
        # outside AD, per-batch gradients (w.r.t. the rotated object)
        # accumulate on device, and at the angle boundary the summed
        # gradient is rotated back by the adjoint and applied.  For the
        # flagship 256^3 run this replaces 2 rotations/batch with
        # 2 rotations/angle.
        t = self.cfg.train
        # Tilt (refined or fixed) has precedence over rotate_out_of_loop:
        # the model applies the 3-axis tilt rotation inside AD, so the
        # driver must neither pre-rotate by theta nor rotate gradients back
        # (``adorym/forward_model.py:265-276`` — the tilt branch ignores
        # self.rotate_out_of_loop).
        rol = self._rol_active()
        use_accum = ((t.update_scheme == 'per angle' or rol
                      or t.n_batch_per_update > 1)
                     and not self.second_order)
        # Fastest path: one compiled program per ANGLE (rotate + scan over
        # minibatches + adjoint + update) — one host dispatch per angle.
        # Requires rotate-out-of-loop semantics (the in-jit pre-rotation IS
        # that mode) or 2D mode where there is no rotation at all, AND
        # 'per angle' updates (the fused step applies ONE optimizer update
        # per angle; with update_scheme='immediate' the reference updates
        # per batch even under rotate_out_of_loop,
        # ``adorym/ptychography.py:1095-1099``).
        if self._per_angle_path_ok():
            # (Out-of-core measurement data composes: with a FastLoader the
            # angle's rows stream through the native mmap gather.)
            return self._run_epoch_angles(i_epoch, batches, callback,
                                          skip=skip)
        # Immediate-update epochs fuse into ONE compiled program (a scan of
        # the per-batch step) when nothing needs a mid-epoch host visit:
        # remote-dispatch latency dominates small 2D batches otherwise.
        if (not use_accum and skip == 0 and self._mci is not None
                and self._mc_imm_ok(batches)):
            return self._run_epoch_mc_imm(i_epoch, batches, callback)
        if skip == 0 and self._imm_fused_ok(batches):
            return self._run_epoch_fused(i_epoch, batches, callback)
        accum = None
        n_acc = 0
        obj_rot = None
        cur_angle = None

        for i_batch, (i_theta, inds) in list(enumerate(batches))[skip:]:
            if self._needs_weight_l1 and i_batch % update_interval == 0:
                # Reweighted-L1 weight refresh every 10 batches, exactly
                # like the reference (``adorym/ptychography.py:997-999``).
                self.weight_l1 = self._weight_l1_refresh(self.params['obj'])
            pos_table = (self.probe_pos if self.probe_pos.ndim == 2
                         else self.probe_pos[i_theta])
            batch = {
                'i_theta': jnp.asarray(i_theta, jnp.int32),
                'theta': jnp.asarray(self.theta_ls[i_theta], jnp.float32),
                'pos_batch': jnp.asarray(pos_table[inds], jnp.float32),
                'ind_batch': jnp.asarray(inds, jnp.int32),
            }
            data_inds = (inds if self.expand_indices is None
                         else self.expand_indices(inds, self.n_pos, self.cfg))
            with self.timers.time('data_staging'):
                if self.loader is not None:
                    # Double-buffered native prefetch: batch i was enqueued
                    # while step i-1 ran; enqueue batch i+1 now.
                    if i_batch == 0:
                        self.loader.prefetch(0, i_theta, data_inds)
                    if i_batch + 1 < len(batches):
                        nt, ni = batches[i_batch + 1]
                        ndi = (ni if self.expand_indices is None else
                               self.expand_indices(ni, self.n_pos, self.cfg))
                        self.loader.prefetch((i_batch + 1) % 2, nt, ndi)
                    measured = jnp.asarray(
                        self.loader.get(i_batch % 2, len(data_inds)))
                else:
                    measured = jnp.asarray(self.data[i_theta][data_inds])
            if self.mesh is not None:
                from .parallel.mesh import shard_batch
                batch, measured = shard_batch(batch, measured, self.mesh,
                                              self.cfg.parallel)
            if not use_accum:
              with self.timers.time('train_step'):
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state, batch, measured,
                    self.weight_l1,
                    jnp.asarray(self.i_opt_batch, jnp.int32),
                    jnp.asarray(self.global_batch, jnp.int32),
                    self.finite_support_mask)
                self.i_opt_batch += 1
                self._rehome_state()
                self._apply_external_algorithm()
            else:
                if rol and (obj_rot is None or cur_angle != i_theta):
                    obj_rot = self._rotate_fwd(self.params['obj'],
                                               batch['theta'])
                    cur_angle = i_theta
                p_grad = ({**self.params, 'obj': obj_rot} if rol
                          else self.params)
                loss, grads = self._grad_step(p_grad, batch, measured,
                                              self.weight_l1)
                accum = grads if accum is None else self._accum_grads(accum,
                                                                      grads)
                n_acc += 1
                last_of_angle = (i_batch == len(batches) - 1
                                 or batches[i_batch + 1][0] != i_theta)
                # Only 'per angle' defers to the angle boundary; with
                # 'immediate' the reference applies an optimizer step per
                # batch even under rotate_out_of_loop (the gradient is
                # rotated back each batch, ``adorym/ptychography.py:
                # 1069-1078,1095-1099``).
                if t.update_scheme == 'per angle':
                    gate = last_of_angle
                else:
                    gate = last_of_angle or n_acc >= t.n_batch_per_update
                if gate:
                    if rol:
                        accum = {**accum,
                                 'obj': self._rotate_adj(accum['obj'],
                                                         batch['theta'])}
                    self.params, self.opt_state = self._apply_only(
                        self.params, self.opt_state, accum,
                        jnp.asarray(self.i_opt_batch, jnp.int32),
                        jnp.asarray(self.global_batch, jnp.int32),
                        self.finite_support_mask)
                    self.i_opt_batch += 1
                    self._rehome_state()
                    accum = None
                    n_acc = 0
                    # obj_rot stays STALE until the angle changes: the
                    # reference rotates only on angle boundaries
                    # (``adorym/ptychography.py:918-943``), so with
                    # 'immediate' updates the within-angle forward uses the
                    # angle-start object while obj updates accumulate.
            self.global_batch += 1
            # Shrink-wrap: every shrink_cycle batches, zero the support
            # mask where delta dropped below threshold
            # (``adorym/ptychography.py:1220-1225``,
            # ``adorym/array_ops.py:331-335``).
            if (self.finite_support_mask is not None
                    and t.shrink_cycle is not None and i_batch > 0
                    and i_batch % t.shrink_cycle == 0):
                self.finite_support_mask = self._shrink_fn(
                    self.finite_support_mask, self.params['obj'])
            if (self.output_folder is not None
                    and self.cfg.io.save_intermediate
                    and self.cfg.io.save_intermediate_level == 'batch'):
                self._save_intermediate(i_epoch, i_batch)
            losses_dev.append(loss)
            batch_ids.append(i_batch)
            # Checkpoints store the NEXT (epoch, batch) to run.
            nxt = ((i_epoch + 1, 0) if i_batch + 1 == len(batches)
                   else (i_epoch, i_batch + 1))
            if (self.output_folder is not None
                    and self.cfg.io.store_checkpoint
                    and (i_batch + 1) % self.cfg.io.n_batch_per_checkpoint == 0):
                self.save_checkpoint(*nxt)
            # HPC walltime guard (``adorym/ptychography.py:864-868``):
            # checkpoint and stop cleanly before the scheduler kills us.
            t_max = self.cfg.io.t_max_min
            if t_max is not None and (time.time() - self._t_start) / 60 > t_max:
                if self.output_folder is not None:
                    self.save_checkpoint(*nxt)
                self.stop_requested = True
                break
        losses = [float(v) for v in np.asarray(jnp.stack(losses_dev))]
        if callback is not None or self._logger is not None:
            for b, l in zip(batch_ids, losses):
                if callback is not None:
                    callback(i_epoch, b, l)
                if self._logger is not None:
                    self._logger.log(i_epoch, b, l)
        mean_loss = float(np.mean(losses))
        self.loss_history.append(mean_loss)
        if self.verbose:
            from .utils.profiling import device_memory_stats
            n_patterns = len(batches) * self.cfg.train.minibatch_size
            dt = self.timers.total.get('train_step', 0.0) or 1e-9
            mem = device_memory_stats()
            mem_s = (f"; hbm {mem['bytes_in_use_mb']:.0f}/"
                     f"{mem['peak_bytes_mb']:.0f}MB peak" if mem else '')
            self._print(f'[epoch {i_epoch}] loss={mean_loss:.4e} '
                        f'{n_patterns / max(dt, 1e-9):.1f} patterns/s; '
                        f'{self.timers.summary()}{mem_s}')
            self.timers.reset()
        return mean_loss

    def run(self, n_epochs: Optional[int] = None, callback=None) -> Dict[str, Any]:
        t = self.cfg.train
        if n_epochs is None:
            n_epochs = t.max_nepochs if t.n_epochs == 'auto' else int(t.n_epochs)
        auto = t.n_epochs == 'auto'
        rng = np.random.default_rng(t.seed)
        # Resumed runs replay the skipped epochs' rng draws so the stream
        # (and therefore each epoch's batch shuffle) matches the
        # uninterrupted run exactly.
        for _ in range(self._start_epoch):
            self.make_batches(rng)
        i_epoch = self._start_epoch - 1
        for i_epoch in range(self._start_epoch, n_epochs):
            t0 = time.time()
            loss = self.run_epoch(i_epoch, rng, callback=callback)
            dt = time.time() - t0
            if (self.output_folder is not None
                    and self.cfg.io.save_intermediate
                    and self.cfg.io.save_intermediate_level != 'batch'):
                self._save_intermediate(i_epoch, -1)
            if self.stop_requested:
                break
            if auto and len(self.loss_history) >= 2:
                prev = self.loss_history[-2]
                if prev > 0 and (prev - loss) / abs(prev) < t.crit_conv_rate:
                    break
        if self.output_folder is not None:
            from .io import output as out_lib
            out_lib.output_object(self.obj, self.output_folder,
                                  self.cfg.train.unknown_type)
            out_lib.output_probe(np.asarray(self.params['probe']),
                                 self.output_folder)
            if self.cfg.io.store_checkpoint and not self.stop_requested:
                # Final checkpoint: resume position is the epoch after the
                # last completed one (resume-aware — loss_history is not
                # restored across resumes, so its length is not the label).
                self.save_checkpoint(i_epoch + 1, 0)
        return self.results()

    # ------------------------------------------------------------------
    def results(self) -> Dict[str, Any]:
        out = {k: np.asarray(v) for k, v in self.params.items()
               if not isinstance(v, dict)}
        if isinstance(self.params.get('obj'), dict):
            out['obj'] = self.obj
        out['loss_history'] = np.asarray(self.loss_history)
        return out

    @property
    def obj(self) -> np.ndarray:
        o = self.params['obj']
        if isinstance(o, dict):
            return np.concatenate([np.asarray(o[k])
                                   for k in _slab_order(o)], axis=0)
        return np.asarray(o)

    @property
    def probe(self) -> np.ndarray:
        p = np.asarray(self.params['probe'])
        return p[..., 0] + 1j * p[..., 1]
