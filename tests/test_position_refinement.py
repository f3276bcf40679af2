"""Probe-position-error refinement (BASELINE config #3 analog): simulate at
perturbed positions, reconstruct from the nominal grid with
``optimize_all_probe_pos`` and verify the corrections recover the errors."""

import numpy as np
import pytest

from adorym_tpu.config import Geometry, ReconConfig, RefineConfig, TrainConfig
from adorym_tpu.recon import Reconstructor
from adorym_tpu.simulate import simulate
from adorym_tpu.utils.initialize import initialize_probe


def test_position_correction_recovers_errors():
    from scipy.ndimage import gaussian_filter
    n, pn = 64, 32
    rng = np.random.default_rng(0)
    img = gaussian_filter(rng.random((n, n, 1)), (3, 3, 0))
    img = (img - img.min()) / max(np.ptp(img), 1e-12)
    obj_true = np.stack([img * 3e-3, img * 8e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=6,
                             probe_phase_sigma=6, probe_phase_max=0.4)
    xs = np.arange(0, n - pn + 1, 8)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos_nominal = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    err = rng.uniform(-1.5, 1.5, pos_nominal.shape)
    pos_true = pos_nominal + err

    cfg_sim = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', two_d_mode=True),
        train=TrainConfig(minibatch_size=len(pos_true)))
    data = simulate(cfg_sim, obj_true, probe, pos_true)

    cfg = ReconConfig(
        geometry=cfg_sim.geometry,
        train=TrainConfig(minibatch_size=25, learning_rate=2e-4, seed=1),
        refine=RefineConfig(optimize_all_probe_pos=True,
                            all_probe_pos_learning_rate=5e-2))
    rec = Reconstructor(cfg, data=data, probe_pos=pos_nominal,
                        probe_init=probe, obj_init=np.zeros_like(obj_true))
    for ep in range(60):
        loss = rec.run_epoch(ep)

    corr = np.asarray(rec.params['probe_pos_correction'])[0]
    # Patch extraction rounds positions, so the recoverable error is the
    # rounded perturbation; the drift constraint removes the mean.
    err_eff = np.round(pos_true) - pos_nominal
    err_c = err_eff - err_eff.mean(axis=0)
    resid_before = np.abs(err_c).mean()
    resid_after = np.abs(corr - err_c).mean()
    assert resid_after < resid_before * 0.6, (resid_before, resid_after)

    # And the refined run must beat a fixed-position run.
    cfg_fix = ReconConfig(geometry=cfg_sim.geometry,
                          train=cfg.train)
    rec_fix = Reconstructor(cfg_fix, data=data, probe_pos=pos_nominal,
                            probe_init=probe,
                            obj_init=np.zeros_like(obj_true))
    for ep in range(60):
        loss_fix = rec_fix.run_epoch(ep)
    assert loss < loss_fix * 0.7, (loss, loss_fix)
