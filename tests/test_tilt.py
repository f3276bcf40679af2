"""Tilt semantics: precedence over rotate_out_of_loop, and fixed
(non-refined) tilts via ``initial_tilt``.

Reference: the 3-axis tilt-rotation branch activates whenever
``optimize_tilt`` or ``initial_tilt is not None`` and takes precedence over
``rotate_out_of_loop`` (``adorym/forward_model.py:265-276``); tilt_ls is
initialized from ``initial_tilt`` or the nominal view angles
(``adorym/ptychography.py:681-682``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from adorym_tpu.config import Geometry, ReconConfig, RefineConfig, TrainConfig
from adorym_tpu.recon import Reconstructor
from adorym_tpu.simulate import simulate
from adorym_tpu.utils.initialize import initialize_probe


def _probe(pn, seed=0):
    return initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                            psize_cm=1e-7, probe_mag_sigma=pn / 4,
                            probe_phase_sigma=pn / 4, probe_phase_max=0.3,
                            seed=seed)


def _setup(n=16, pn=16, seed=3):
    rng = np.random.default_rng(seed)
    obj_true = np.stack([rng.random((n, n, n)) * 1e-3,
                         rng.random((n, n, n)) * 3e-5], -1).astype(np.float32)
    probe = _probe(pn, seed)
    pos = np.array([[0.0, 0.0]])
    geo = Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                   energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf')
    return obj_true, probe, pos, geo


def _run(cfg, data, pos, probe, theta_ls, obj0, n_epochs=3, aux_init=None):
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        theta_ls=theta_ls, obj_init=obj0, aux_init=aux_init)
    for ep in range(n_epochs):
        rec.run_epoch(ep)
    return rec


def test_tilt_precedence_over_rotate_out_of_loop():
    """tilt + rotate_out_of_loop must follow the SAME trajectory as tilt
    alone: the model's tilt rotation replaces the view rotation entirely, so
    the driver must not pre-rotate by theta (previously double-rotated)."""
    obj_true, probe, pos, geo = _setup()
    theta_ls = np.asarray([0.3, 0.9], np.float32)
    cfg_sim = ReconConfig(geometry=geo, train=TrainConfig(minibatch_size=1))
    data = simulate(cfg_sim, obj_true, probe, pos, theta_ls)

    refine = RefineConfig(optimize_tilt=True, tilt_learning_rate=1e-3)
    obj0 = (obj_true * 0.5).astype(np.float32)
    recs = []
    for rol in (False, True):
        cfg = ReconConfig(
            geometry=geo, refine=refine,
            train=TrainConfig(minibatch_size=1, learning_rate=1e-7,
                              optimizer='adam', update_scheme='per angle',
                              rotate_out_of_loop=rol, seed=7))
        recs.append(_run(cfg, data, pos, probe, theta_ls, obj0.copy()))
    np.testing.assert_allclose(np.asarray(recs[0].params['tilt_ls']),
                               np.asarray(recs[1].params['tilt_ls']),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(recs[0].params['obj']),
                               np.asarray(recs[1].params['obj']),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(recs[0].loss_history, recs[1].loss_history,
                               rtol=1e-6)


def test_fixed_tilt_matches_optimize_tilt_forward():
    """fixed_tilt reconstructs with the 3-axis rotation at the GIVEN tilts:
    with zero object learning rate the loss equals the optimize_tilt run's
    first loss (same forward), and tilt_ls itself never moves."""
    obj_true, probe, pos, geo = _setup(seed=4)
    theta_ls = np.asarray([0.5], np.float32)
    cfg_sim = ReconConfig(geometry=geo, train=TrainConfig(minibatch_size=1))
    data = simulate(cfg_sim, obj_true, probe, pos, theta_ls)

    tilt = np.stack([theta_ls, [0.1], [0.0]]).astype(np.float32)
    cfg_fixed = ReconConfig(
        geometry=geo, refine=RefineConfig(fixed_tilt=True),
        train=TrainConfig(minibatch_size=1, learning_rate=0.0,
                          optimizer='gd', seed=1))
    rec_f = Reconstructor(cfg_fixed, data=data, probe_pos=pos,
                          probe_init=probe, theta_ls=theta_ls,
                          obj_init=obj_true.copy(),
                          aux_init={'tilt_ls': tilt})
    # No optimizer spec for the fixed tilt leaf.
    assert 'tilt_ls' not in rec_f.specs
    loss_f = rec_f.run_epoch(0)
    np.testing.assert_array_equal(np.asarray(rec_f.params['tilt_ls']), tilt)

    cfg_opt = ReconConfig(
        geometry=geo,
        refine=RefineConfig(optimize_tilt=True, tilt_learning_rate=0.0),
        train=TrainConfig(minibatch_size=1, learning_rate=0.0,
                          optimizer='gd', seed=1))
    rec_o = Reconstructor(cfg_opt, data=data, probe_pos=pos,
                          probe_init=probe, theta_ls=theta_ls,
                          obj_init=obj_true.copy(),
                          aux_init={'tilt_ls': tilt})
    loss_o = rec_o.run_epoch(0)
    # Different compiled programs (tilt_ls spec'd vs pass-through): f32
    # reassociation noise only.
    np.testing.assert_allclose(loss_f, loss_o, rtol=1e-5)


def test_fixed_tilt_recovery():
    """Reconstructing data acquired with a known nonzero tilt: supplying the
    true tilts (fixed_tilt) converges; pretending the tilt is just theta
    leaves a much higher loss floor."""
    obj_true, probe, pos, geo = _setup(seed=5)
    theta_ls = np.asarray([0.2, 1.1], np.float32)
    tilt_true = np.stack([theta_ls, [0.15, -0.1], [0.0, 0.0]]).astype(np.float32)

    # Simulate THROUGH the tilt branch: fixed tilts, ground-truth object.
    from adorym_tpu.models import ptychography as pm
    cfg_t = ReconConfig(geometry=geo, refine=RefineConfig(fixed_tilt=True),
                        train=TrainConfig(minibatch_size=1))
    params = {'obj': jnp.asarray(obj_true),
              'probe': jnp.asarray(probe),
              'tilt_ls': jnp.asarray(tilt_true)}
    data = np.stack([
        np.asarray(pm.predict(params, {'i_theta': jnp.asarray(i),
                                       'theta': jnp.asarray(theta_ls[i]),
                                       'pos_batch': jnp.asarray(pos, jnp.float32),
                                       'ind_batch': jnp.asarray([0])},
                              cfg_t))
        for i in range(2)])

    # At the TRUE object, the forward with the true tilts reproduces the
    # data exactly; ignoring the tilt (plain theta rotation) cannot.
    losses = {}
    for label, refine, aux in (
            ('true_tilt', RefineConfig(fixed_tilt=True),
             {'tilt_ls': tilt_true}),
            ('no_tilt', RefineConfig(), None)):
        cfg = ReconConfig(geometry=geo, refine=refine,
                          train=TrainConfig(minibatch_size=1,
                                            learning_rate=0.0,
                                            optimizer='gd', seed=2))
        rec = _run(cfg, data, pos, probe, theta_ls, obj_true.copy(),
                   n_epochs=1, aux_init=aux)
        losses[label] = rec.loss_history[-1]
    assert losses['true_tilt'] < 1e-3 * losses['no_tilt'], losses

    # And gradient descent under the fixed tilt makes progress from a
    # degraded initialization.
    cfg = ReconConfig(geometry=geo, refine=RefineConfig(fixed_tilt=True),
                      train=TrainConfig(minibatch_size=1, learning_rate=1e-3,
                                        optimizer='adam', seed=2))
    rec = _run(cfg, data, pos, probe, theta_ls,
               (obj_true * 0.3).astype(np.float32), n_epochs=15,
               aux_init={'tilt_ls': tilt_true})
    assert rec.loss_history[-1] < 0.5 * rec.loss_history[0], rec.loss_history


def test_initial_tilt_api_kwarg(tmp_path):
    """The reference ``initial_tilt`` kwarg is honored end-to-end: tilt_ls
    exists, holds the supplied values, and is not updated."""
    from adorym_tpu.api import reconstruct_ptychography
    from adorym_tpu.simulate import simulate_to_file
    obj_true, probe, pos, geo = _setup(n=8, pn=8, seed=6)
    theta_ls = np.asarray([0.0, 0.7], np.float32)
    cfg_sim = ReconConfig(geometry=geo, train=TrainConfig(minibatch_size=1))
    path = str(tmp_path / 'data.h5')
    simulate_to_file(path, cfg_sim, obj_true, probe, pos, theta_ls)
    tilt = np.stack([theta_ls, [0.05, 0.0], [0.0, 0.0]]).astype(np.float32)
    probe_c = probe[0, ..., 0] + 1j * probe[0, ..., 1]
    res = reconstruct_ptychography(
        fname='data.h5', save_path=str(tmp_path), obj_size=(8, 8, 8),
        probe_pos=pos, probe_initial=(np.abs(probe_c), np.angle(probe_c)),
        probe_type='supplied', initial_tilt=tilt, n_epochs=1,
        minibatch_size=1, learning_rate=1e-6, output_folder=None,
        store_checkpoint=False, use_checkpoint=False, gamma=0.0)
    np.testing.assert_array_equal(res['tilt_ls'], tilt)
