"""Whole-epoch fusion of the per-angle scheme (``angles_epoch``).

The fused path scans the SAME traced ``angle_step`` over the epoch's
angles inside one program (recon.py ``_run_epoch_angles_fused``), so its
trajectories must match the per-angle dispatch loop exactly.  The
reference's rotate-out-of-loop driver is the per-angle dispatch analog
(``adorym/ptychography.py:937-940,1069-1078``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
from adorym_tpu.recon import Reconstructor


def _setup(n=24, pn=12, n_theta=3, mb=4):
    rng = np.random.default_rng(0)
    theta_ls = np.linspace(0, np.pi, n_theta, endpoint=False)
    k = 4
    xs = (np.arange(k) * ((n - pn) // (k - 1))).clip(0, n - pn)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float64)
    data = rng.random((n_theta, len(pos), pn, pn)).astype(np.float32)
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                          energy_ev=5000., psize_cm=1e-7,
                          free_prop_cm='inf', binning=2),
        train=TrainConfig(minibatch_size=mb, learning_rate=1e-3,
                          optimizer='adam', rotate_out_of_loop=True,
                          update_scheme='per angle'))
    obj0 = rng.random((n, n, n, 2)).astype(np.float32) * 1e-3
    return cfg, data, pos, theta_ls, obj0


def _run(force_fused, n_epochs=3):
    cfg, data, pos, theta_ls, obj0 = _setup()
    rec = Reconstructor(cfg, data=data, probe_pos=pos, theta_ls=theta_ls,
                        obj_init=obj0.copy())
    # The device-residency budget check is platform-dependent; pin it so
    # both paths are exercised deterministically on the CPU mesh.
    rec._data_dev_ok = force_fused
    took_fused = []
    orig = rec._run_epoch_angles_fused

    def spy(*a, **kw):
        took_fused.append(True)
        return orig(*a, **kw)

    rec._run_epoch_angles_fused = spy
    losses = [rec.run_epoch(ep) for ep in range(n_epochs)]
    return losses, np.asarray(rec.params['obj']), bool(took_fused)


def test_fused_angles_epoch_matches_loop():
    l_fused, obj_fused, fused_taken = _run(True)
    l_loop, obj_loop, loop_fused = _run(False)
    assert fused_taken, 'fused path did not engage'
    assert not loop_fused, 'control run unexpectedly took the fused path'
    np.testing.assert_allclose(l_fused, l_loop, rtol=1e-6)
    np.testing.assert_allclose(obj_fused, obj_loop, rtol=1e-5, atol=1e-8)


@pytest.mark.skipif(len(__import__('jax').devices()) < 8,
                    reason='needs 8 virtual devices')
def test_mc_fused_epoch_matches_mc_loop():
    """Mesh variant (``mc_angles_epoch``): scanning the shard_map angle
    step must reproduce the per-angle dispatch trajectories."""
    from adorym_tpu.config import ParallelConfig
    from adorym_tpu.parallel.mesh import make_mesh
    from adorym_tpu.simulate import simulate
    from adorym_tpu.utils.initialize import initialize_probe

    n, pn, nz = 32, 8, 8
    cfg0 = ReconConfig(
        geometry=Geometry(obj_size=(n, n, nz), probe_size=(pn, pn),
                          energy_ev=5000., psize_cm=1e-7,
                          free_prop_cm='inf', binning=2),
        train=TrainConfig(minibatch_size=4, learning_rate=1e-4,
                          update_scheme='per angle',
                          rotate_out_of_loop=True))
    rng = np.random.default_rng(0)
    obj_true = np.stack([rng.random((n, n, nz)) * 1e-3,
                         rng.random((n, n, nz)) * 3e-5],
                        -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.,
                             psize_cm=1e-7, probe_mag_sigma=2,
                             probe_phase_sigma=2, probe_phase_max=0.3)
    xs = np.arange(0, n - pn + 1, 8)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    theta_ls = np.linspace(0, np.pi, 3, endpoint=False)
    data = simulate(cfg0, obj_true, probe, pos, theta_ls)
    pcfg = ParallelConfig(data_axis=2, object_axis=4)
    cfg = ReconConfig(geometry=cfg0.geometry, train=cfg0.train,
                      parallel=pcfg)
    kw = dict(data=data, probe_pos=pos, probe_init=probe,
              theta_ls=theta_ls, obj_init=(obj_true * 0.5).copy())
    runs = {}
    for fused in (True, False):
        rec = Reconstructor(cfg, mesh=make_mesh(pcfg), **kw)
        assert rec._mc is not None
        if not fused:
            rec._mc_fused_ok = lambda groups: False
        losses = [rec.run_epoch(ep) for ep in range(2)]
        runs[fused] = (losses, np.asarray(rec.params['obj']))
    np.testing.assert_allclose(runs[True][0], runs[False][0], rtol=1e-6)
    np.testing.assert_allclose(runs[True][1], runs[False][1], rtol=1e-5,
                               atol=1e-8)
    # Pipelined run_epochs on the mesh path: identical to sequential.
    rec = Reconstructor(cfg, mesh=make_mesh(pcfg), **kw)
    pip = rec.run_epochs(2)
    np.testing.assert_allclose(pip, runs[True][0], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(rec.params['obj']),
                                  runs[True][1])


def test_fused_angles_epoch_with_reweighted_l1():
    """The reweighted-L1 weight refresh is recomputed IN-SCAN at every
    angle boundary of the fused epoch; trajectories must match the
    per-angle dispatch loop, which refreshes host-side at the same
    boundaries."""
    import dataclasses
    out = {}
    for fused in (True, False):
        cfg, data, pos, theta_ls, obj0 = _setup()
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, alpha_d=1e-6,
                                          reweighted_l1=True))
        rec = Reconstructor(cfg, data=data, probe_pos=pos,
                            theta_ls=theta_ls, obj_init=obj0.copy())
        assert rec._needs_weight_l1
        rec._data_dev_ok = fused
        took = []
        orig = rec._run_epoch_angles_fused
        rec._run_epoch_angles_fused = lambda *a, **kw: (took.append(1),
                                                        orig(*a, **kw))[1]
        losses = [rec.run_epoch(ep) for ep in range(3)]
        assert bool(took) == fused
        out[fused] = (losses, np.asarray(rec.params['obj']))
    np.testing.assert_allclose(out[True][0], out[False][0], rtol=1e-6)
    np.testing.assert_allclose(out[True][1], out[False][1], rtol=1e-5,
                               atol=1e-8)


def test_immediate_fused_epoch_with_reweighted_l1(tmp_path):
    """The immediate-update whole-epoch fusion refreshes reweighted-L1
    weights in-scan every 10 batches (the reference cadence,
    ``adorym/ptychography.py:994-1000``); with 12 batches/epoch the
    refresh fires mid-epoch (i_b=0 and 10) and the trajectory must match
    the slow per-batch dispatch loop (forced in the control run via the
    batch-level-dump gate, which only adds file I/O)."""
    import dataclasses
    out = {}
    for fused in (True, False):
        cfg, data, pos, theta_ls, obj0 = _setup()
        cfg = dataclasses.replace(
            cfg,
            loss=dataclasses.replace(cfg.loss, alpha_d=1e-6,
                                     reweighted_l1=True),
            train=dataclasses.replace(cfg.train, rotate_out_of_loop=False,
                                      update_scheme='immediate'))
        kw = {}
        if not fused:
            cfg = dataclasses.replace(
                cfg, io=dataclasses.replace(cfg.io, save_intermediate=True,
                                            save_intermediate_level='batch',
                                            store_checkpoint=False))
            kw['output_folder'] = str(tmp_path / 'slow')
        rec = Reconstructor(cfg, data=data, probe_pos=pos,
                            theta_ls=theta_ls, obj_init=obj0.copy(), **kw)
        assert rec._needs_weight_l1
        took = []
        orig = rec._run_epoch_fused
        rec._run_epoch_fused = lambda *a, **kw2: (took.append(1),
                                                  orig(*a, **kw2))[1]
        losses = [rec.run_epoch(ep) for ep in range(3)]
        assert bool(took) == fused
        out[fused] = (losses, np.asarray(rec.params['obj']))
    np.testing.assert_allclose(out[True][0], out[False][0], rtol=1e-6)
    np.testing.assert_allclose(out[True][1], out[False][1], rtol=1e-5,
                               atol=1e-8)


def test_run_epochs_pipelined_matches_sequential():
    """run_epochs defers each epoch's loss fetch behind the next epoch's
    dispatch; the math (losses and final object) must be identical to
    sequential run_epoch calls, and the pipeline must actually engage
    (dispatch count running ahead of finish count)."""
    cfg, data, pos, theta_ls, obj0 = _setup()
    n_epochs = 3

    rec = Reconstructor(cfg, data=data, probe_pos=pos, theta_ls=theta_ls,
                        obj_init=obj0.copy())
    rec._data_dev_ok = True
    seq_losses = [rec.run_epoch(ep) for ep in range(n_epochs)]
    seq_obj = np.asarray(rec.params['obj'])

    rec2 = Reconstructor(cfg, data=data, probe_pos=pos, theta_ls=theta_ls,
                        obj_init=obj0.copy())
    rec2._data_dev_ok = True
    overlapped = []
    orig_dispatch = rec2._fused_dispatch
    orig_finish = rec2._fused_finish
    state = {'dispatched': 0, 'finished': 0}

    def spy_dispatch(*a, **kw):
        state['dispatched'] += 1
        overlapped.append(state['dispatched'] - state['finished'])
        return orig_dispatch(*a, **kw)

    def spy_finish(*a, **kw):
        state['finished'] += 1
        return orig_finish(*a, **kw)

    rec2._fused_dispatch = spy_dispatch
    rec2._fused_finish = spy_finish
    pip_losses = rec2.run_epochs(n_epochs)
    pip_obj = np.asarray(rec2.params['obj'])

    assert max(overlapped) >= 2, 'pipeline never ran an epoch ahead'
    assert state['dispatched'] == state['finished'] == n_epochs
    np.testing.assert_allclose(pip_losses, seq_losses, rtol=1e-6)
    np.testing.assert_array_equal(pip_obj, seq_obj)


def test_run_epochs_does_not_pipeline_with_host_outputs(tmp_path):
    """With store_checkpoint on, run_epochs must NOT run an epoch ahead:
    the checkpoint epilogue reads params and would otherwise serialize the
    next epoch's state under the finished epoch's label."""
    import dataclasses
    cfg, data, pos, theta_ls, obj0 = _setup()
    cfg = dataclasses.replace(
        cfg, io=dataclasses.replace(cfg.io, store_checkpoint=True,
                                    use_checkpoint=False,
                                    n_batch_per_checkpoint=5))
    rec = Reconstructor(cfg, data=data, probe_pos=pos, theta_ls=theta_ls,
                        obj_init=obj0.copy(), output_folder=str(tmp_path))
    rec._data_dev_ok = True
    state = {'d': 0, 'f': 0, 'max_ahead': 0}
    od, of = rec._fused_dispatch, rec._fused_finish

    def sd(*a, **kw):
        state['d'] += 1
        state['max_ahead'] = max(state['max_ahead'],
                                 state['d'] - state['f'])
        return od(*a, **kw)

    def sf(*a, **kw):
        state['f'] += 1
        return of(*a, **kw)

    rec._fused_dispatch, rec._fused_finish = sd, sf
    rec.run_epochs(3)
    assert state['d'] == state['f'] == 3
    assert state['max_ahead'] == 1, state


def test_run_epochs_does_not_pipeline_with_callback():
    """A user callback runs at finish time and may read ``rec.params``;
    with one passed, run_epochs must stay one-epoch-at-a-time so the
    callback never observes the next epoch's in-flight state."""
    cfg, data, pos, theta_ls, obj0 = _setup()
    rec = Reconstructor(cfg, data=data, probe_pos=pos, theta_ls=theta_ls,
                        obj_init=obj0.copy())
    rec._data_dev_ok = True
    state = {'d': 0, 'f': 0, 'max_ahead': 0}
    od, of = rec._fused_dispatch, rec._fused_finish

    def sd(*a, **kw):
        state['d'] += 1
        state['max_ahead'] = max(state['max_ahead'], state['d'] - state['f'])
        return od(*a, **kw)

    def sf(*a, **kw):
        state['f'] += 1
        return of(*a, **kw)

    rec._fused_dispatch, rec._fused_finish = sd, sf
    seen = []
    rec.run_epochs(3, callback=lambda ep, b, l: seen.append((ep, b)))
    assert state['d'] == state['f'] == 3
    assert state['max_ahead'] == 1, state
    assert seen, 'callback never invoked'


def test_run_epochs_falls_back_when_ineligible():
    """With the fused gate closed (host-resident data), run_epochs must
    produce the same result via sequential run_epoch."""
    cfg, data, pos, theta_ls, obj0 = _setup()
    rec = Reconstructor(cfg, data=data, probe_pos=pos, theta_ls=theta_ls,
                        obj_init=obj0.copy())
    rec._data_dev_ok = False
    seq = [rec.run_epoch(ep) for ep in range(2)]
    rec2 = Reconstructor(cfg, data=data, probe_pos=pos, theta_ls=theta_ls,
                         obj_init=obj0.copy())
    rec2._data_dev_ok = False
    pip = rec2.run_epochs(2)
    np.testing.assert_allclose(pip, seq, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(rec2.params['obj']),
                                  np.asarray(rec.params['obj']))


def test_fused_epoch_checkpoints_on_cross_epoch_cadence(tmp_path):
    """A fused epoch with fewer batches than n_batch_per_checkpoint must
    still checkpoint when the CROSS-epoch batch counter crosses the
    cadence (the reference checkpoints every N batches across epochs,
    ``adorym/ptychography.py:879-895``); a per-epoch ``len(losses) >= N``
    test would never save."""
    import dataclasses
    cfg, data, pos, theta_ls, obj0 = _setup()  # 3 angles x 4 batches = 12
    cfg = dataclasses.replace(
        cfg, io=dataclasses.replace(cfg.io, store_checkpoint=True,
                                    use_checkpoint=False,
                                    n_batch_per_checkpoint=20))
    rec = Reconstructor(cfg, data=data, probe_pos=pos, theta_ls=theta_ls,
                        obj_init=obj0.copy(), output_folder=str(tmp_path))
    rec._data_dev_ok = True
    saved = []
    orig = rec.save_checkpoint
    rec.save_checkpoint = lambda *a, **kw: (saved.append(a), orig(*a, **kw))
    took_fused = []
    orig_fused = rec._fused_dispatch
    rec._fused_dispatch = lambda *a, **kw: (took_fused.append(True),
                                            orig_fused(*a, **kw))[1]
    rec.run_epoch(0)   # gb 0->12: no crossing
    assert took_fused and not saved
    rec.run_epoch(1)   # gb 12->24: crosses 20 -> checkpoint
    assert len(saved) == 1
    rec.run_epoch(2)   # gb 24->36: no crossing
    assert len(saved) == 1
    rec.run_epoch(3)   # gb 36->48: crosses 40 -> checkpoint
    assert len(saved) == 2


def test_fused_gate_rejects_host_visit_configs():
    cfg, data, pos, theta_ls, obj0 = _setup()
    rec = Reconstructor(cfg, data=data, probe_pos=pos, theta_ls=theta_ls,
                        obj_init=obj0)
    rec._data_dev_ok = True
    groups = [(0, [np.arange(4)] * 4), (1, [np.arange(4)] * 4)]
    assert rec._angles_fused_ok(groups)
    # ragged per-angle batch counts
    assert not rec._angles_fused_ok([(0, [np.arange(4)] * 4),
                                     (1, [np.arange(4)] * 3)])
    # single angle: nothing to fuse over
    assert not rec._angles_fused_ok(groups[:1])
    rec._data_dev_ok = False
    assert not rec._angles_fused_ok(groups)


def test_fused_path_checkpoint_resume(tmp_path):
    """Checkpoint/resume through the angle-fused path: a run interrupted
    after 2 epochs and resumed for 2 more must land exactly where an
    uninterrupted 4-epoch run does (params and optimizer state round-trip
    through the npz checkpoint)."""
    import dataclasses
    cfg, data, pos, theta_ls, obj0 = _setup()
    io_on = dataclasses.replace(cfg.io, store_checkpoint=True,
                                use_checkpoint=False,
                                n_batch_per_checkpoint=1)

    rec = Reconstructor(dataclasses.replace(cfg, io=io_on), data=data,
                        probe_pos=pos, theta_ls=theta_ls,
                        obj_init=obj0.copy(), output_folder=str(tmp_path))
    rec._data_dev_ok = True
    for ep in range(4):
        rec.run_epoch(ep)
    ref_obj = np.asarray(rec.params['obj'])

    out2 = tmp_path / 'resumed'
    rec1 = Reconstructor(dataclasses.replace(cfg, io=io_on), data=data,
                         probe_pos=pos, theta_ls=theta_ls,
                         obj_init=obj0.copy(), output_folder=str(out2))
    rec1._data_dev_ok = True
    for ep in range(2):
        rec1.run_epoch(ep)
    io_resume = dataclasses.replace(io_on, use_checkpoint=True)
    rec2 = Reconstructor(dataclasses.replace(cfg, io=io_resume), data=data,
                         probe_pos=pos, theta_ls=theta_ls,
                         obj_init=obj0.copy(), output_folder=str(out2))
    rec2._data_dev_ok = True
    assert rec2._start_epoch == 2, rec2._start_epoch
    for ep in range(rec2._start_epoch, 4):
        rec2.run_epoch(ep)
    np.testing.assert_allclose(np.asarray(rec2.params['obj']), ref_obj,
                               rtol=0, atol=0)
