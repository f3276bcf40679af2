"""End-to-end refinement of the remaining auxiliary parameters:
slice positions (sparse multislice), tilt, projection position offset,
probe defocus."""

import numpy as np
import pytest

from adorym_tpu.config import Geometry, ReconConfig, RefineConfig, TrainConfig
from adorym_tpu.recon import Reconstructor
from adorym_tpu.simulate import simulate
from adorym_tpu.utils.initialize import initialize_probe


def _probe(pn, seed=0):
    return initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                            psize_cm=1e-7, probe_mag_sigma=pn / 4,
                            probe_phase_sigma=pn / 4, probe_phase_max=0.3)


def test_slice_position_gradients():
    """Sparse multislice slice-position gradients: the loss is exactly
    minimized at the true separation and the analytic gradient matches
    finite differences.  (Global descent cannot be asserted: the landscape
    oscillates at the Talbot scale — same physics in the reference.)"""
    import jax
    import jax.numpy as jnp
    from adorym_tpu.models import ptychography as pm
    from adorym_tpu.models.base import mismatch_loss
    n, pn = 32, 32
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter
    sm = gaussian_filter(rng.random((n, n, 2)), (3, 3, 0))
    obj_true = np.stack([sm * 3e-3, sm * 8e-5], -1).astype(np.float32)
    probe = _probe(pn)
    pos = np.array([[0.0, 0.0]])
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 2), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', slice_pos_cm_ls=(0.0, 12e-4)),
        train=TrainConfig(minibatch_size=1, seed=0),
        refine=RefineConfig(optimize_slice_pos=True))
    data = jnp.asarray(simulate(cfg, obj_true, probe, pos)[0])
    batch = {'i_theta': jnp.asarray(0), 'theta': jnp.asarray(0.0),
             'pos_batch': jnp.asarray(pos, jnp.float32),
             'ind_batch': jnp.asarray([0])}

    def loss_at(sp1):
        params = {'obj': jnp.asarray(obj_true), 'probe': jnp.asarray(probe),
                  'slice_pos_cm_ls': jnp.asarray([0.0, sp1], jnp.float32)}
        return mismatch_loss(pm.predict(params, batch, cfg), data)

    # Exact minimum at the true separation.
    assert float(loss_at(12e-4)) < 1e-9
    assert float(loss_at(11e-4)) > 1e-4
    assert float(loss_at(13e-4)) > 1e-4
    # Analytic gradient matches finite differences away from the minimum.
    g = float(jax.grad(loss_at)(10e-4))
    eps = 1e-8
    fd = (float(loss_at(10e-4 + eps)) - float(loss_at(10e-4 - eps))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=0.05)


def test_tilt_refinement_runs():
    """optimize_tilt: the axis-0 tilt is initialized at the nominal view
    angle (adorym/ptychography.py:681-682) and refined toward the TRUE
    angle the data was acquired at."""
    n, pn = 16, 16
    rng = np.random.default_rng(1)
    obj_true = np.stack([rng.random((n, n, n)) * 1e-3,
                         rng.random((n, n, n)) * 3e-5], -1).astype(np.float32)
    probe = _probe(pn, 1)
    pos = np.array([[0.0, 0.0]])
    cfg_sim = ReconConfig(
        geometry=Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf'),
        train=TrainConfig(minibatch_size=1, seed=1))
    data = simulate(cfg_sim, obj_true, probe, pos, np.asarray([0.45]))
    refine = RefineConfig(optimize_tilt=True, tilt_learning_rate=5e-3)
    cfg = ReconConfig(geometry=cfg_sim.geometry,
                      train=TrainConfig(minibatch_size=1, learning_rate=0.0,
                                        optimizer='gd', seed=1),
                      refine=refine)
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        theta_ls=np.asarray([0.4]),   # nominal, wrong by 0.05
                        obj_init=obj_true.copy())
    np.testing.assert_allclose(np.asarray(rec.params['tilt_ls'])[0, 0], 0.4)
    for ep in range(100):
        loss = rec.run_epoch(ep)
    tilt = float(np.asarray(rec.params['tilt_ls'])[0, 0])
    assert abs(tilt - 0.45) < 0.01, tilt
    assert np.isfinite(loss)


def test_prj_pos_offset_refinement():
    """optimize_prj_pos_offset: exit-wave shift applied after the object;
    recover a simulated detector-side shift."""
    n, pn = 32, 32
    rng = np.random.default_rng(2)
    from scipy.ndimage import gaussian_filter
    sm = gaussian_filter(rng.random((n, n, 1)), (3, 3, 0))
    obj_true = np.stack([sm * 3e-3, sm * 8e-5], -1).astype(np.float32)
    probe = _probe(pn, 2)
    pos = np.array([[0.0, 0.0]])
    # Simulate WITH a known exit-wave shift by refining-path injection.
    cfg_shift = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm=0.02, two_d_mode=True),
        train=TrainConfig(minibatch_size=1, seed=2),
        refine=RefineConfig(optimize_prj_pos_offset=True,
                            prj_pos_offset_learning_rate=5e-2))
    from adorym_tpu.models import ptychography as pm
    import jax.numpy as jnp
    params = {'obj': jnp.asarray(obj_true), 'probe': jnp.asarray(probe),
              'prj_pos_offset': jnp.asarray([[1.5, -2.0]], jnp.float32)}
    batch = {'i_theta': jnp.asarray(0), 'theta': jnp.asarray(0.0),
             'pos_batch': jnp.asarray(pos, jnp.float32),
             'ind_batch': jnp.asarray([0])}
    data = np.asarray(pm.predict(params, batch, cfg_shift))[None]

    rec = Reconstructor(cfg_shift, data=data, probe_pos=pos,
                        probe_init=probe, obj_init=obj_true.copy())
    for ep in range(200):
        loss = rec.run_epoch(ep)
    off = np.asarray(rec.params['prj_pos_offset'])[0]
    np.testing.assert_allclose(off, [1.5, -2.0], atol=0.5)


def test_probe_defocus_refinement():
    """optimize_probe_defocusing: recover a simulated probe defocus."""
    n, pn = 32, 32
    rng = np.random.default_rng(3)
    from scipy.ndimage import gaussian_filter
    sm = gaussian_filter(rng.random((n, n, 1)), (3, 3, 0))
    obj_true = np.stack([sm * 3e-3, sm * 8e-5], -1).astype(np.float32)
    probe = _probe(pn, 3)
    pos = np.array([[0.0, 0.0]])
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', two_d_mode=True),
        train=TrainConfig(minibatch_size=1, learning_rate=0.0,
                          optimizer='gd', seed=3),
        refine=RefineConfig(optimize_probe_defocusing=True,
                            probe_defocusing_learning_rate=3e-2))
    from adorym_tpu.models import ptychography as pm
    import jax.numpy as jnp
    true_defocus = 0.3  # mm
    params = {'obj': jnp.asarray(obj_true), 'probe': jnp.asarray(probe),
              'probe_defocus_mm': jnp.asarray([true_defocus], jnp.float32)}
    batch = {'i_theta': jnp.asarray(0), 'theta': jnp.asarray(0.0),
             'pos_batch': jnp.asarray(pos, jnp.float32),
             'ind_batch': jnp.asarray([0])}
    data = np.asarray(pm.predict(params, batch, cfg))[None]
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        obj_init=obj_true.copy())
    err0 = true_defocus
    for ep in range(150):
        rec.run_epoch(ep)
    df = float(np.asarray(rec.params['probe_defocus_mm'])[0])
    assert abs(df - true_defocus) < err0 * 0.5, df


def _pos_refine_problem(**refine_kw):
    n, pn = 32, 16
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', two_d_mode=True),
        train=TrainConfig(minibatch_size=8, learning_rate=1e-4, seed=0),
        refine=RefineConfig(optimize_all_probe_pos=True,
                            all_probe_pos_learning_rate=1e-2, **refine_kw))
    rng = np.random.default_rng(3)
    obj_true = np.stack([rng.random((n, n, 1)) * 1e-3,
                         rng.random((n, n, 1)) * 3e-5], -1).astype(np.float32)
    probe = _probe(pn)
    xs = np.arange(0, n - pn + 1, 4)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    data = simulate(cfg, obj_true, probe, pos)
    return cfg, obj_true, probe, pos, data


def test_other_params_update_delay():
    """Aux params are frozen until other_params_update_delay global batches
    have run (``adorym/optimizers.py:1037``)."""
    cfg, obj_true, probe, pos, data = _pos_refine_problem(
        other_params_update_delay=10_000)
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        obj_init=np.zeros_like(obj_true))
    rec.run_epoch(0)
    ppc = np.asarray(rec.params['probe_pos_correction'])
    assert np.all(ppc == 0), 'aux updated despite delay'

    # Same problem without the delay: the correction must move.
    cfg2, *_ = _pos_refine_problem(other_params_update_delay=0)
    rec2 = Reconstructor(cfg2, data=data, probe_pos=pos, probe_init=probe,
                         obj_init=np.zeros_like(obj_true))
    rec2.run_epoch(0)
    assert np.any(np.asarray(rec2.params['probe_pos_correction']) != 0)

    # And the object keeps training either way.
    assert not np.allclose(rec.obj, 0)


def test_per_param_optimizer_kind():
    """`optimizer_*` kwargs select per-parameter first-order kinds
    (``adorym/ptychography.py:144-155``)."""
    from adorym_tpu.optim.params import build_opt_specs
    cfg, obj_true, probe, pos, data = _pos_refine_problem(
        all_probe_pos_optimizer='gd')
    specs = build_opt_specs(cfg)
    assert specs['probe_pos_correction'].kind == 'gd'
    # GD on the positions must run end-to-end and move the parameter.
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        obj_init=np.zeros_like(obj_true))
    rec.run_epoch(0)
    assert np.any(np.asarray(rec.params['probe_pos_correction']) != 0)

    with pytest.raises(ValueError, match='first-order'):
        cfg_bad, *_ = _pos_refine_problem(all_probe_pos_optimizer='curveball')
        build_opt_specs(cfg_bad)


def test_ctf_lg_kappa_initialized_from_kwarg():
    """The ctf_lg_kappa refinable starts at the user's value (reference
    initializes the variable from the kwarg, ``adorym/ptychography.py:733``),
    not at a hardcoded default."""
    n = 16
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(n, n),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm=(1e-4, 2e-4), n_dists=2,
                          two_d_mode=True),
        train=TrainConfig(minibatch_size=1, forward_algorithm='ctf'),
        refine=RefineConfig(optimize_ctf_lg_kappa=True))
    from adorym_tpu.models import multidist as md_model
    data = np.ones((1, 2, n, n), np.float32)
    pos = np.array([[0.0, 0.0]])
    rec = Reconstructor(cfg, data=data, probe_pos=pos, model=md_model,
                        aux_init={'ctf_lg_kappa': 1.7})
    np.testing.assert_allclose(np.asarray(rec.params['ctf_lg_kappa']), 1.7)
