"""Update-scheme semantics: per-angle accumulation and rotate_out_of_loop.

Since rotation is linear, accumulating per-batch gradients through in-loop
rotation must equal adjoint-rotating the accumulated gradient of the
rotated object — so 'per angle' with and without ``rotate_out_of_loop``
must produce identical parameter trajectories (the reference's two DP
variants, ``adorym/ptychography.py:937-940,1069-1078``).
"""

import numpy as np
import pytest

from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
from adorym_tpu.recon import Reconstructor
from adorym_tpu.simulate import simulate
from adorym_tpu.utils.initialize import initialize_probe


def _setup(seed=0):
    n, pn = 24, 12
    cfg_kw = dict(obj_size=(n, n, n), probe_size=(pn, pn),
                  energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf')
    rng = np.random.default_rng(seed)
    obj_true = np.stack([rng.random((n, n, n)) * 1e-3,
                         rng.random((n, n, n)) * 3e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=3,
                             probe_phase_sigma=3, probe_phase_max=0.3)
    xs = np.arange(0, n - pn + 1, 6)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    theta_ls = np.linspace(0, np.pi, 3, endpoint=False)
    cfg0 = ReconConfig(geometry=Geometry(**cfg_kw),
                       train=TrainConfig(minibatch_size=3))
    data = simulate(cfg0, obj_true, probe, pos, theta_ls)
    return cfg_kw, obj_true, probe, pos, theta_ls, data


def _run(cfg_kw, obj_true, probe, pos, theta_ls, data, **train_kw):
    cfg = ReconConfig(geometry=Geometry(**cfg_kw),
                      train=TrainConfig(minibatch_size=3, seed=7,
                                        **{'learning_rate': 1e-5,
                                           **train_kw}))
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        theta_ls=theta_ls, obj_init=np.zeros_like(obj_true))
    for ep in range(3):
        loss = rec.run_epoch(ep)
    return rec, loss


def test_rotate_out_of_loop_matches_in_loop():
    """With the EXACT linear-map transpose for the gradient rotate-back,
    out-of-loop rotation reproduces the in-loop trajectory to roundoff
    (rotation is linear)."""
    args = _setup()
    rec_in, loss_in = _run(*args, update_scheme='per angle',
                           rotate_out_of_loop=False)
    rec_out, loss_out = _run(*args, update_scheme='per angle',
                             rotate_out_of_loop=True,
                             exact_grad_rotation=True)
    np.testing.assert_allclose(loss_in, loss_out, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rec_in.params['obj']),
                               np.asarray(rec_out.params['obj']),
                               atol=1e-5)


def test_interp_grad_rotation_tracks_exact():
    """The default gradient rotate-back interpolates at -theta like the
    reference (``adorym/ptychography.py:1069-1078``) instead of the exact
    transpose; the trajectories stay close and converge equivalently."""
    args = _setup()
    rec_exact, loss_e = _run(*args, update_scheme='per angle',
                             rotate_out_of_loop=True,
                             exact_grad_rotation=True)
    rec_interp, loss_i = _run(*args, update_scheme='per angle',
                              rotate_out_of_loop=True)
    assert np.isfinite(loss_i)
    np.testing.assert_allclose(loss_i, loss_e, rtol=0.05)
    # The two descent directions differ at rotation-boundary voxels (the
    # transpose scatters where the interpolation clamps), so compare the
    # fields globally, not element-wise.
    o_e = np.asarray(rec_exact.params['obj']).ravel()
    o_i = np.asarray(rec_interp.params['obj']).ravel()
    corr = np.corrcoef(o_e, o_i)[0, 1]
    # 24^3 random-noise volumes exaggerate boundary effects; production
    # volumes agree far closer.  The reference itself uses the interpolated
    # rotate-back, so this mode is the parity-faithful one.
    assert corr > 0.9, corr


def test_per_angle_converges():
    args = _setup(seed=1)
    rec, loss = _run(*args, update_scheme='per angle')
    assert np.isfinite(loss)
    assert loss < rec.loss_history[0]


def test_n_batch_per_update():
    args = _setup(seed=2)
    rec, loss = _run(*args, n_batch_per_update=2)
    # 9 positions / mb 3 = 3 batches per angle -> 2 updates per angle
    assert rec.i_opt_batch == 3 * 2 * 3  # angles * updates/angle * epochs
    assert np.isfinite(loss)


def test_rol_immediate_updates_per_batch():
    """With update_scheme='immediate', rotate_out_of_loop applies an
    optimizer step per BATCH — only 'per angle' defers to the angle boundary
    (``adorym/ptychography.py:1095-1099``).  Round 1 coerced rol+'immediate'
    to per-angle accumulation, changing the Adam moment trajectory."""
    args = _setup()
    _, _, _, pos, theta_ls, _ = args
    n_batches_per_angle = -(-len(pos) // 3)
    rec_imm, loss_imm = _run(*args, update_scheme='immediate',
                             rotate_out_of_loop=True)
    rec_pa, _ = _run(*args, update_scheme='per angle',
                     rotate_out_of_loop=True)
    # 3 epochs: per-batch stepping gives n_angles*n_batches optimizer steps
    # per epoch; per-angle gives n_angles.
    assert rec_imm.i_opt_batch == 3 * len(theta_ls) * n_batches_per_angle
    assert rec_pa.i_opt_batch == 3 * len(theta_ls)
    assert np.isfinite(loss_imm)
    # The trajectories must differ (bias correction sees different counters).
    assert not np.allclose(np.asarray(rec_imm.params['obj']),
                           np.asarray(rec_pa.params['obj']), atol=1e-6)


def test_shrink_wrap_updates_in_fast_path():
    """The angle-fused epoch path must shrink the finite-support mask on the
    shrink_cycle cadence (``adorym/array_ops.py:331-335``) — round 1 applied
    the mask but never shrank it there."""
    cfg_kw, obj_true, probe, pos, theta_ls, data = _setup()
    mask = np.ones(cfg_kw['obj_size'], np.float32)
    for scheme, rol in [('per angle', True), ('immediate', False)]:
        cfg = ReconConfig(geometry=Geometry(**cfg_kw),
                          train=TrainConfig(minibatch_size=3,
                                            learning_rate=1e-6, seed=7,
                                            update_scheme=scheme,
                                            rotate_out_of_loop=rol,
                                            shrink_cycle=2,
                                            shrink_threshold=1e-5))
        rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                            theta_ls=theta_ls,
                            obj_init=np.zeros_like(obj_true),
                            finite_support_mask=mask)
        rec.run_epoch(0)
        m = np.asarray(rec.finite_support_mask)
        # A zero-initialized object sits below threshold almost everywhere:
        # the mask must have shrunk in both epoch paths.
        assert m.mean() < 0.9, (scheme, rol, m.mean())


@pytest.mark.parametrize('binning', [4, 5])
def test_prebin_z_hoist_matches_in_chunk_binning(binning):
    """The prebin hoist (bin the rotated object once per angle, angle_step)
    must reproduce the in-chunk binning trajectory: the propagator's bin
    step is a z-sum (delta_beta), which commutes with patch extraction.
    binning=5 exercises the short far-side bin (24 % 5 != 0)."""
    cfg_kw, obj_true, probe, pos, theta_ls, data = _setup(seed=3)
    cfg_kw = dict(cfg_kw, binning=binning)
    rec_off, loss_off = _run(cfg_kw, obj_true, probe, pos, theta_ls, data,
                             update_scheme='per angle',
                             rotate_out_of_loop=True, prebin_z='off')
    rec_on, loss_on = _run(cfg_kw, obj_true, probe, pos, theta_ls, data,
                           update_scheme='per angle',
                           rotate_out_of_loop=True, prebin_z='auto')
    # Sum-order roundoff only (float32 bin sums associate differently).
    np.testing.assert_allclose(loss_on, loss_off, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rec_on.params['obj']),
                               np.asarray(rec_off.params['obj']), atol=1e-6)


def test_stream_rotation_matches_bulk():
    """stream_rotation='on' (rotate_and_bin_z + deferred binned rotate-back)
    must reproduce the bulk rotate/bin/expand trajectory bit-for-bit —
    the streaming path is what the largest single-chip objects run."""
    cfg_kw, obj_true, probe, pos, theta_ls, data = _setup(seed=4)
    cfg_kw = dict(cfg_kw, binning=4)
    rec_bulk, loss_bulk = _run(cfg_kw, obj_true, probe, pos, theta_ls, data,
                               update_scheme='per angle',
                               rotate_out_of_loop=True,
                               stream_rotation='off')
    rec_st, loss_st = _run(cfg_kw, obj_true, probe, pos, theta_ls, data,
                           update_scheme='per angle',
                           rotate_out_of_loop=True, stream_rotation='on')
    np.testing.assert_allclose(loss_st, loss_bulk, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rec_st.params['obj']),
                               np.asarray(rec_bulk.params['obj']),
                               atol=1e-7)


def test_device_resident_data_matches_staged():
    """The device-resident dataset gather (zero per-angle H2D) must match
    per-angle host staging exactly — the two branches of
    _run_epoch_angles' data path."""
    cfg_kw, obj_true, probe, pos, theta_ls, data = _setup(seed=5)

    def run(force_staged):
        cfg = ReconConfig(geometry=Geometry(**cfg_kw),
                          train=TrainConfig(minibatch_size=3,
                                            learning_rate=1e-5, seed=7,
                                            update_scheme='per angle',
                                            rotate_out_of_loop=True))
        rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                            theta_ls=theta_ls,
                            obj_init=np.zeros_like(obj_true))
        if force_staged:
            rec._data_dev_ok = False
        losses = [rec.run_epoch(ep) for ep in range(2)]
        return rec, losses

    rec_dev, losses_dev = run(False)
    assert rec_dev._data_dev is not None     # the resident path engaged
    rec_st, losses_st = run(True)
    np.testing.assert_allclose(losses_dev, losses_st, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rec_dev.params['obj']),
                               np.asarray(rec_st.params['obj']), atol=1e-7)


def test_grid_scatter_matches_row_loop():
    """The whole-chunk separable grid scatter (full-grid tables) must match
    the per-row lane-scatter loop exactly."""
    cfg_kw, obj_true, probe, pos, theta_ls, data = _setup(seed=6)

    def run(force_rows):
        cfg = ReconConfig(geometry=Geometry(**cfg_kw),
                          train=TrainConfig(minibatch_size=3,
                                            learning_rate=1e-5, seed=7,
                                            update_scheme='per angle',
                                            rotate_out_of_loop=True))
        rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                            theta_ls=theta_ls,
                            obj_init=np.zeros_like(obj_true))
        if force_rows:
            rec._grid_scatter_rows = None
        losses = [rec.run_epoch(ep) for ep in range(2)]
        return rec, losses

    rec_g, losses_g = run(False)
    assert rec_g._grid_scatter_rows is not None   # grid path engaged
    rec_r, losses_r = run(True)
    np.testing.assert_allclose(losses_g, losses_r, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rec_g.params['obj']),
                               np.asarray(rec_r.params['obj']), atol=1e-7)


def test_grid_scatter_multi_chunk():
    """Grid scatter with MULTIPLE chunks per angle (g < n_rows, no padded
    rows): each chunk's sub-grid lands at its own traced origin."""
    n, pn, mb = 30, 12, 4
    cfg_kw = dict(obj_size=(n, n, n), probe_size=(pn, pn),
                  energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf',
                  binning=4)
    rng = np.random.default_rng(8)
    obj_true = np.stack([rng.random((n, n, n)) * 1e-3,
                         rng.random((n, n, n)) * 3e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=3,
                             probe_phase_sigma=3, probe_phase_max=0.3)
    xs = np.arange(0, n - pn + 1, 6)[:4]
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    theta_ls = np.linspace(0, np.pi, 2, endpoint=False)
    cfg = ReconConfig(geometry=Geometry(**cfg_kw),
                      train=TrainConfig(minibatch_size=mb,
                                        learning_rate=1e-5, seed=7,
                                        update_scheme='per angle',
                                        rotate_out_of_loop=True))
    data = simulate(cfg, obj_true, probe, pos, theta_ls)

    def run(grid_rows):
        rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                            theta_ls=theta_ls,
                            obj_init=np.zeros_like(obj_true))
        rec._fuse_g = 2                   # 4 rows -> 2 chunks of 2 rows
        rec._grid_scatter_rows = grid_rows
        losses = [rec.run_epoch(ep) for ep in range(2)]
        return rec, losses

    rec_g, losses_g = run(2)
    rec_r, losses_r = run(None)
    np.testing.assert_allclose(losses_g, losses_r, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rec_g.params['obj']),
                               np.asarray(rec_r.params['obj']), atol=1e-7)


def test_band_immediate_matches_full_rotation_immediate():
    """The band-granular immediate step (rotate only the row's py object
    planes; the mesh-immediate decomposition on one chip) reproduces the
    full-object-rotation immediate trajectory to f32 noise — same linear
    chain, ~py/Y of the rotation cost."""
    cfg_kw, obj_true, probe, pos, theta_ls, data = _setup(seed=5)
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    cfg = ReconConfig(geometry=Geometry(**cfg_kw),
                      train=TrainConfig(minibatch_size=3, learning_rate=1e-3,
                                        optimizer='gd',
                                        update_scheme='immediate', seed=7))
    kw = dict(data=data, probe_pos=pos, probe_init=probe,
              theta_ls=theta_ls, obj_init=np.zeros_like(obj_true))
    rec_band = Reconstructor(cfg, **kw)
    rec_full = Reconstructor(cfg, **kw)
    # Disable the band fast path on the comparison instance by clearing
    # the row-grid stride before (re)building its step.
    rec_full._rowgrid_stride = None
    rec_full._step = rec_full._build_step()
    for ep in range(3):
        l_b = rec_band.run_epoch(ep)
        l_f = rec_full.run_epoch(ep)
        np.testing.assert_allclose(l_b, l_f, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rec_band.params['obj']),
                               np.asarray(rec_full.params['obj']),
                               rtol=1e-3, atol=1e-6)


def test_imm_interp_grad_rotation_converges_and_tracks_exact():
    """The opt-in ``imm_grad_rotation='interp'`` replaces the immediate
    band step's exact rotation adjoint (its dominant cost on TPU —
    16.45 of 21.7 ms at the flagship, tools/probe_imm.py) with the
    -theta interpolation.  Quality contract: converges on the small 3D
    drive and tracks the exact trajectory at interpolation-approximation
    level."""
    args = _setup(seed=11)
    # GD: the object is the sum of the gradients, so the correlation
    # reflects the gradient approximation directly (Adam's 1/sqrt(v)
    # sign-normalizes near-zero voxels and amplifies ANY gradient
    # difference into lr-sized divergences — measured corr 0.90 under
    # Adam for this same drive).  Thresholds mirror
    # test_interp_grad_rotation_tracks_exact (the per-angle scheme's
    # identical approximation): 24^3 random-noise volumes exaggerate the
    # boundary effects (measured corr 0.933 here); finer production
    # grids agree far closer.
    rec_e, loss_e = _run(*args, update_scheme='immediate',
                         optimizer='gd')
    rec_i, loss_i = _run(*args, update_scheme='immediate',
                         optimizer='gd', imm_grad_rotation='interp')
    assert np.isfinite(loss_i)
    np.testing.assert_allclose(loss_i, loss_e, rtol=0.05)
    o_e = np.asarray(rec_e.params['obj']).ravel()
    o_i = np.asarray(rec_i.params['obj']).ravel()
    assert np.corrcoef(o_e, o_i)[0, 1] > 0.9


def test_adjoint_taps_band_step_matches_vjp_adjoint():
    """The tap-gather exact adjoint (auto on TPU) produces the same
    band-step trajectories as the vjp adjoint — forced on here so the
    CPU mesh covers the TPU-selected code path."""
    from adorym_tpu import recon as rec_mod
    args = _setup(seed=15)
    rec_v, loss_v = _run(*args, update_scheme='immediate',
                         optimizer='gd', learning_rate=1e-4)
    old = rec_mod.FORCE_ADJOINT_TAPS
    rec_mod.FORCE_ADJOINT_TAPS = True
    try:
        rec_t, loss_t = _run(*args, update_scheme='immediate',
                             optimizer='gd', learning_rate=1e-4)
    finally:
        rec_mod.FORCE_ADJOINT_TAPS = old
    np.testing.assert_allclose(loss_t, loss_v, rtol=1e-4)
    # atol 1e-6: f32 association noise on near-zero voxels (the taps
    # formulation sums the same real terms in a different order).
    np.testing.assert_allclose(np.asarray(rec_t.params['obj']),
                               np.asarray(rec_v.params['obj']),
                               rtol=1e-4, atol=1e-6)


def test_run_epochs_pipelines_single_device_imm():
    """run_epochs pipelining covers the SINGLE-DEVICE fused immediate
    epoch (one dispatch per epoch, next epoch dispatched before this
    epoch's loss fetch): identical losses to sequential run_epoch
    calls."""
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    cfg_kw, obj_true, probe, pos, theta_ls, data = _setup(seed=18)
    cfg = ReconConfig(geometry=Geometry(**cfg_kw),
                      train=TrainConfig(minibatch_size=3,
                                        learning_rate=1e-5, seed=7,
                                        update_scheme='immediate'))
    kw = dict(data=data, probe_pos=pos, probe_init=probe,
              theta_ls=theta_ls, obj_init=np.zeros_like(obj_true))
    rec_a = Reconstructor(cfg, **kw)
    rec_b = Reconstructor(cfg, **kw)
    rng = np.random.default_rng(cfg.train.seed)
    assert rec_a._imm_fused_ok(rec_a.make_batches(rng))
    seq = [rec_a.run_epoch(ep) for ep in range(3)]
    pip = rec_b.run_epochs(3, start_epoch=0)
    np.testing.assert_allclose(seq, pip, rtol=0, atol=0)


def test_imm_grad_rotation_validates():
    import pytest
    args = _setup(seed=11)
    with pytest.raises(ValueError, match='imm_grad_rotation'):
        _run(*args, update_scheme='immediate', imm_grad_rotation='typo')


def test_band_immediate_with_position_refinement():
    """The band step's aux gradients (per-spot probe_pos_correction via
    ind_batch) match the full-rotation immediate step."""
    from adorym_tpu.config import Geometry, ReconConfig, RefineConfig, TrainConfig
    cfg_kw, obj_true, probe, pos, theta_ls, data = _setup(seed=6)
    cfg = ReconConfig(geometry=Geometry(**cfg_kw),
                      refine=RefineConfig(optimize_all_probe_pos=True,
                                          all_probe_pos_learning_rate=1e-3),
                      train=TrainConfig(minibatch_size=3, learning_rate=1e-3,
                                        optimizer='gd',
                                        update_scheme='immediate', seed=9))
    kw = dict(data=data, probe_pos=pos, probe_init=probe,
              theta_ls=theta_ls, obj_init=np.zeros_like(obj_true))
    rec_band = Reconstructor(cfg, **kw)
    rec_full = Reconstructor(cfg, **kw)
    rec_full._rowgrid_stride = None
    rec_full._step = rec_full._build_step()
    for ep in range(2):
        l_b = rec_band.run_epoch(ep)
        l_f = rec_full.run_epoch(ep)
        np.testing.assert_allclose(l_b, l_f, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(rec_band.params['probe_pos_correction']),
        np.asarray(rec_full.params['probe_pos_correction']),
        rtol=1e-3, atol=1e-7)


def test_band_immediate_with_probe_modes_and_poisson():
    """Band step x incoherent probe modes x Poisson loss: equality with
    the full-rotation step holds across the loss/mode branches."""
    import dataclasses as dc
    from adorym_tpu.config import (Geometry, LossConfig, ReconConfig,
                                   TrainConfig)
    cfg_kw, obj_true, probe, pos, theta_ls, data = _setup(seed=8)
    probe2 = np.concatenate([probe, probe * 0.3], axis=0)
    cfg = ReconConfig(geometry=Geometry(**cfg_kw),
                      loss=LossConfig(loss_function_type='poisson',
                                      poisson_multiplier=1e4),
                      train=TrainConfig(minibatch_size=3, learning_rate=1e-4,
                                        optimizer='gd', n_probe_modes=2,
                                        update_scheme='immediate', seed=11))
    kw = dict(data=data, probe_pos=pos, probe_init=probe2,
              theta_ls=theta_ls, obj_init=np.zeros_like(obj_true))
    rec_band = Reconstructor(cfg, **kw)
    rec_full = Reconstructor(cfg, **kw)
    rec_full._rowgrid_stride = None
    rec_full._step = rec_full._build_step()
    for ep in range(2):
        l_b = rec_band.run_epoch(ep)
        l_f = rec_full.run_epoch(ep)
        np.testing.assert_allclose(l_b, l_f, rtol=1e-4)
