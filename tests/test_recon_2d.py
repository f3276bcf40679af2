"""End-to-end 2D ptychography: simulate -> reconstruct -> verify.

The rebuild's answer to the reference's smoke test strategy (SURVEY §4),
with actual numeric assertions: loss must collapse and the recovered phase
must correlate with the ground truth.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from adorym_tpu.config import Geometry, LossConfig, ReconConfig, RefineConfig, TrainConfig
from adorym_tpu.recon import Reconstructor
from adorym_tpu.simulate import simulate
from adorym_tpu.utils.initialize import initialize_probe


def make_phantom(n, nz=1, scale_d=2e-3, scale_b=5e-5, seed=0):
    """Smooth random blobs as delta/beta channels."""
    rng = np.random.default_rng(seed)
    k = rng.normal(size=(n // 8, n // 8, nz))
    up = np.kron(k, np.ones((8, 8, 1)))
    from scipy.ndimage import gaussian_filter
    sm = gaussian_filter(up, (4, 4, 0))
    sm = (sm - sm.min()) / (sm.max() - sm.min())
    delta = (sm * scale_d).astype(np.float32)
    beta = (sm * scale_b).astype(np.float32)
    return np.stack([delta, beta], axis=-1)


def grid_positions(obj_n, probe_n, stride):
    xs = np.arange(0, obj_n - probe_n + 1, stride)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    return np.stack([yy.ravel(), xx.ravel()], axis=-1).astype(np.float64)


@pytest.fixture(scope='module')
def sim_2d():
    n, pn = 64, 32
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf',
                          two_d_mode=True),
        train=TrainConfig(minibatch_size=8, learning_rate=1e-4, seed=1),
    )
    obj_true = make_phantom(n)
    probe = initialize_probe((pn, pn), 'gaussian', n_probe_modes=1,
                             energy_ev=5000.0, psize_cm=1e-7,
                             probe_mag_sigma=6, probe_phase_sigma=6,
                             probe_phase_max=0.5)
    pos = grid_positions(n, pn, 8)
    data = simulate(cfg, obj_true, probe, pos)
    return cfg, obj_true, probe, pos, data


def test_simulated_data_shapes(sim_2d):
    cfg, obj_true, probe, pos, data = sim_2d
    assert data.shape == (1, len(pos), 32, 32)
    assert np.all(np.isfinite(data))
    assert data.max() > 0


def test_reconstruction_converges(sim_2d):
    cfg, obj_true, probe, pos, data = sim_2d
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        obj_init=np.zeros_like(obj_true))
    loss0 = rec.run_epoch(0)
    for ep in range(1, 30):
        loss = rec.run_epoch(ep)
    assert loss < loss0 * 0.02, f'loss {loss0} -> {loss}: insufficient convergence'

    # Recovered delta must correlate strongly with the phantom in the
    # well-illuminated interior.
    sl = slice(12, 52)
    rec_d = rec.obj[sl, sl, 0, 0]
    true_d = obj_true[sl, sl, 0, 0]
    corr = np.corrcoef(rec_d.ravel(), true_d.ravel())[0, 1]
    assert corr > 0.9, f'phantom correlation too low: {corr}'


def test_probe_refinement_improves_fit(sim_2d):
    """Start from a slightly wrong probe; optimize_probe should reduce loss
    below the fixed-probe run."""
    cfg, obj_true, probe, pos, data = sim_2d
    probe_bad = probe * 0.8
    cfg_fix = cfg
    rec_fix = Reconstructor(cfg_fix, data=data, probe_pos=pos,
                            probe_init=probe_bad,
                            obj_init=np.zeros_like(obj_true))
    cfg_opt = ReconConfig(
        geometry=cfg.geometry,
        train=cfg.train,
        refine=RefineConfig(optimize_probe=True, probe_learning_rate=1e-3))
    rec_opt = Reconstructor(cfg_opt, data=data, probe_pos=pos,
                            probe_init=probe_bad,
                            obj_init=np.zeros_like(obj_true))
    for ep in range(12):
        loss_fix = rec_fix.run_epoch(ep)
        loss_opt = rec_opt.run_epoch(ep)
    assert loss_opt < loss_fix * 0.5, (loss_fix, loss_opt)


def test_poisson_loss_runs(sim_2d):
    cfg, obj_true, probe, pos, data = sim_2d
    cfg_p = ReconConfig(geometry=cfg.geometry,
                        loss=LossConfig(loss_function_type='poisson'),
                        train=cfg.train)
    rec = Reconstructor(cfg_p, data=data + 1e-3, probe_pos=pos,
                        probe_init=probe, obj_init=np.zeros_like(obj_true))
    l_first = rec.run_epoch(0)
    l_last = None
    for ep in range(1, 8):
        l_last = rec.run_epoch(ep)
    assert np.isfinite(l_last)
    # Must have descended from the zero-object start (epoch-mean losses:
    # per-batch Poisson losses are offset by batch-dependent constants and
    # are not comparable across batch orderings).
    assert l_last < l_first
    # And the object should have moved toward the phantom.
    sl = slice(12, 52)
    corr = np.corrcoef(rec.obj[sl, sl, 0, 0].ravel(),
                       obj_true[sl, sl, 0, 0].ravel())[0, 1]
    assert corr > 0.5, corr


def test_regularized_recon_runs(sim_2d):
    cfg, obj_true, probe, pos, data = sim_2d
    cfg_r = ReconConfig(geometry=cfg.geometry,
                        loss=LossConfig(alpha_d=1e-9, alpha_b=1e-10, gamma=1e-9),
                        train=cfg.train)
    rec = Reconstructor(cfg_r, data=data, probe_pos=pos, probe_init=probe,
                        obj_init=np.zeros_like(obj_true))
    l0 = rec.run_epoch(0)
    l3 = None
    for ep in range(1, 4):
        l3 = rec.run_epoch(ep)
    assert l3 < l0


def test_fused_epoch_matches_per_batch_loop(sim_2d):
    """Immediate-update epochs fuse into one compiled scan of the train
    step; the trajectory must match the per-batch dispatch loop exactly
    (measured 1.46x on the axon TPU from removing per-batch dispatches)."""
    cfg, obj_true, probe, pos, data = sim_2d
    recs = {}
    for fused in (True, False):
        rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                            obj_init=np.zeros_like(obj_true))
        if not fused:
            # An (identity) expand_indices hook forces the per-batch loop.
            rec.expand_indices = lambda inds, n, c: inds
        for ep in range(3):
            loss = rec.run_epoch(ep)
        recs[fused] = (np.asarray(rec.params['obj']), loss)
    np.testing.assert_allclose(recs[True][0], recs[False][0], atol=1e-6)
    np.testing.assert_allclose(recs[True][1], recs[False][1], rtol=1e-5)
