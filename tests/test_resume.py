"""Exact checkpoint/resume semantics.

Checkpoints store the NEXT (epoch, batch) to run — the reference's resume
contract (``adorym/ptychography.py:848-859``): a run killed at any point
and resumed from its last checkpoint replays from the checkpointed state
and lands exactly where the uninterrupted run does (no update applied
twice, none skipped)."""

import dataclasses

import numpy as np

from adorym_tpu.config import Geometry, IOConfig, ReconConfig, TrainConfig
from adorym_tpu.recon import Reconstructor


def _setup_2d(mb=1, n_batch_per_update=1):
    n, pn = 24, 12
    rng = np.random.default_rng(2)
    xs = np.arange(0, n - pn + 1, 6)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float64)
    data = rng.random((1, len(pos), pn, pn)).astype(np.float32)
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(pn, pn),
                          energy_ev=5000., psize_cm=1e-7,
                          free_prop_cm='inf', two_d_mode=True),
        train=TrainConfig(minibatch_size=mb, learning_rate=1e-3,
                          optimizer='adam',
                          n_batch_per_update=n_batch_per_update))
    obj0 = rng.random((n, n, 1, 2)).astype(np.float32) * 1e-3
    return cfg, data, pos, obj0


def _setup_3d():
    n, pn, n_theta = 16, 8, 3
    rng = np.random.default_rng(3)
    xs = np.arange(0, n - pn + 1, 8)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float64)
    data = rng.random((n_theta, len(pos), pn, pn)).astype(np.float32)
    theta_ls = np.linspace(0, np.pi, n_theta, endpoint=False)
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                          energy_ev=5000., psize_cm=1e-7,
                          free_prop_cm='inf', binning=2),
        train=TrainConfig(minibatch_size=2, learning_rate=1e-3,
                          optimizer='adam', update_scheme='per angle',
                          rotate_out_of_loop=True))
    obj0 = rng.random((n, n, n, 2)).astype(np.float32) * 1e-3
    return cfg, data, pos, theta_ls, obj0


def _with_io(cfg, **kw):
    return dataclasses.replace(cfg, io=dataclasses.replace(cfg.io, **kw))


def test_midepoch_crash_replay_is_exact(tmp_path):
    """Per-batch (immediate) path: a run killed after epoch 0 resumes
    from its last MID-EPOCH checkpoint, replays the tail batches from the
    checkpointed state, and matches the uninterrupted run bit-for-bit.
    (n_batch_per_update=2 keeps the epoch off the whole-epoch-fused
    path, which checkpoints at epoch granularity by design; the
    checkpoint cadence 4 lands on accumulation-group boundaries, so
    exactness holds.)"""
    cfg, data, pos, obj0 = _setup_2d(n_batch_per_update=2)
    io_on = dict(store_checkpoint=True, use_checkpoint=False,
                 n_batch_per_checkpoint=4)
    n_epochs = 3

    ref = Reconstructor(_with_io(cfg, **io_on), data=data, probe_pos=pos,
                        obj_init=obj0.copy(),
                        output_folder=str(tmp_path / 'a'))
    for ep in range(n_epochs):
        ref.run_epoch(ep)
    ref_obj = np.asarray(ref.params['obj'])

    # "Crash" after epoch 0: the folder's last checkpoint is mid-epoch-0
    # (9 batches, cadence 4 -> next position (0, 8)).
    out = str(tmp_path / 'b')
    r1 = Reconstructor(_with_io(cfg, **io_on), data=data, probe_pos=pos,
                       obj_init=obj0.copy(), output_folder=out)
    r1.run_epoch(0)
    r2 = Reconstructor(_with_io(cfg, **{**io_on, 'use_checkpoint': True}),
                       data=data, probe_pos=pos, obj_init=obj0.copy(),
                       output_folder=out)
    assert (r2._start_epoch, r2._start_batch) == (0, 8)
    for ep in range(r2._start_epoch, n_epochs):
        r2.run_epoch(ep)
    np.testing.assert_array_equal(np.asarray(r2.params['obj']), ref_obj)


def test_angle_path_resume_is_exact(tmp_path):
    """Per-angle (rotate-out-of-loop) path: checkpoints land on angle
    boundaries; resume skips exactly the completed angles."""
    cfg, data, pos, theta_ls, obj0 = _setup_3d()
    io_on = dict(store_checkpoint=True, use_checkpoint=False,
                 n_batch_per_checkpoint=1)
    n_epochs = 3

    ref = Reconstructor(_with_io(cfg, **io_on), data=data, probe_pos=pos,
                        theta_ls=theta_ls, obj_init=obj0.copy(),
                        output_folder=str(tmp_path / 'a'))
    for ep in range(n_epochs):
        ref.run_epoch(ep)
    ref_obj = np.asarray(ref.params['obj'])

    out = str(tmp_path / 'b')
    r1 = Reconstructor(_with_io(cfg, **io_on), data=data, probe_pos=pos,
                       theta_ls=theta_ls, obj_init=obj0.copy(),
                       output_folder=out)
    r1.run_epoch(0)
    r1.run_epoch(1)
    r2 = Reconstructor(_with_io(cfg, **{**io_on, 'use_checkpoint': True}),
                       data=data, probe_pos=pos, theta_ls=theta_ls,
                       obj_init=obj0.copy(), output_folder=out)
    # Every angle checkpointed; the last one completed epoch 1.
    assert (r2._start_epoch, r2._start_batch) == (2, 0)
    for ep in range(r2._start_epoch, n_epochs):
        r2.run_epoch(ep)
    np.testing.assert_array_equal(np.asarray(r2.params['obj']), ref_obj)


def test_run_driver_resume_matches_uninterrupted(tmp_path):
    """The top-level run() driver: interrupted at the epoch level and
    resumed, the rng stream is replayed so batch shuffles (and therefore
    the trajectory) match the uninterrupted run exactly."""
    cfg, data, pos, obj0 = _setup_2d(mb=3)
    io_on = dict(store_checkpoint=True, use_checkpoint=False,
                 n_batch_per_checkpoint=3)

    ref = Reconstructor(_with_io(cfg, **io_on), data=data, probe_pos=pos,
                        obj_init=obj0.copy(),
                        output_folder=str(tmp_path / 'a'))
    ref.run(n_epochs=4)
    ref_obj = np.asarray(ref.params['obj'])

    out = str(tmp_path / 'b')
    r1 = Reconstructor(_with_io(cfg, **io_on), data=data, probe_pos=pos,
                       obj_init=obj0.copy(), output_folder=out)
    r1.run(n_epochs=2)
    r2 = Reconstructor(_with_io(cfg, **{**io_on, 'use_checkpoint': True}),
                       data=data, probe_pos=pos, obj_init=obj0.copy(),
                       output_folder=out)
    assert r2._start_epoch == 2
    r2.run(n_epochs=4)
    np.testing.assert_array_equal(np.asarray(r2.params['obj']), ref_obj)
