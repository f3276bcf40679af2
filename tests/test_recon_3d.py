"""End-to-end 3D multislice tomography / ptychotomography.

Mirrors the reference's CI config (``tests/test_multislice_tomography_64.py``:
full-field plane probe, free_prop_cm=0, L1-regularized, finite support) at
reduced size, plus a scanning multislice ptychotomography case — with actual
convergence assertions.
"""

import numpy as np
import pytest

from adorym_tpu.config import Geometry, LossConfig, ReconConfig, TrainConfig
from adorym_tpu.recon import Reconstructor
from adorym_tpu.simulate import simulate
from adorym_tpu.utils.initialize import initialize_probe


def make_phantom_3d(n, seed=0):
    """Spherical-ish blob phantom with delta/beta channels."""
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.mgrid[:n, :n, :n].astype(np.float32)
    c = (n - 1) / 2
    vol = np.zeros((n, n, n), np.float32)
    for _ in range(4):
        cy, cx, cz = rng.uniform(0.3 * n, 0.7 * n, 3)
        r = rng.uniform(0.08 * n, 0.18 * n)
        vol += np.exp(-(((zz - cy) ** 2 + (yy - cx) ** 2 + (xx - cz) ** 2)
                        / (2 * r ** 2)))
    vol /= vol.max()
    return np.stack([vol * 1e-3, vol * 3e-5], axis=-1).astype(np.float32)


def sphere_mask(n, radius_frac=0.45):
    zz, yy, xx = np.mgrid[:n, :n, :n].astype(np.float32)
    c = (n - 1) / 2
    r2 = (zz - c) ** 2 + (yy - c) ** 2 + (xx - c) ** 2
    return (r2 <= (radius_frac * n) ** 2).astype(np.float32)


@pytest.fixture(scope='module')
def tomo_sim():
    n = 32
    n_theta = 12
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, n), probe_size=(n, n),
                          energy_ev=800.0, psize_cm=0.67e-7,
                          free_prop_cm=None),
        loss=LossConfig(alpha_d=1e-9 * n ** 3, alpha_b=1e-10 * n ** 3,
                        reweighted_l1=True),
        train=TrainConfig(minibatch_size=1, learning_rate=5e-6, seed=2),
    )
    obj_true = make_phantom_3d(n)
    probe = initialize_probe((n, n), 'plane', n_probe_modes=1,
                             energy_ev=800.0, psize_cm=0.67e-7)
    pos = np.array([[0.0, 0.0]])
    theta_ls = np.linspace(0, 2 * np.pi, n_theta, endpoint=False)
    data = simulate(cfg, obj_true, probe, pos, theta_ls)
    return cfg, obj_true, probe, pos, theta_ls, data


def test_simulation_sane(tomo_sim):
    cfg, obj_true, probe, pos, theta_ls, data = tomo_sim
    assert data.shape == (12, 1, 32, 32)
    assert np.all(np.isfinite(data))
    # Plane probe through a weak object: magnitudes near 1.
    assert 0.5 < data.mean() < 1.5


def test_multislice_tomography_converges(tomo_sim):
    cfg, obj_true, probe, pos, theta_ls, data = tomo_sim
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        theta_ls=theta_ls,
                        obj_init=np.zeros_like(obj_true),
                        finite_support_mask=sphere_mask(32))
    losses = [rec.run_epoch(ep) for ep in range(40)]
    assert losses[-1] < losses[0] * 0.1, (losses[0], losses[-1])
    # Magnitude-only full-field data without detector propagation senses
    # delta only through intra-object diffraction, and 12 views of a weak
    # object bound the attainable fidelity — the loss collapse above is the
    # real AD/optimizer check; correlation is a regression guard.
    mask = sphere_mask(32) > 0
    for ch, thresh in ((0, 0.5), (1, 0.6)):
        corr = np.corrcoef(rec.obj[..., ch][mask].ravel(),
                           obj_true[..., ch][mask].ravel())[0, 1]
        assert corr > thresh, (ch, corr)


def test_ptychotomography_scanning(tomo_sim):
    """Scanning-probe multislice ptychotomography: 2x2 positions, 16^2
    probe over the 32^3 object."""
    _, obj_true, _, _, theta_ls, _ = tomo_sim
    n, pn = 32, 16
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf'),
        train=TrainConfig(minibatch_size=4, learning_rate=1e-5, seed=3),
    )
    probe = initialize_probe((pn, pn), 'gaussian', n_probe_modes=1,
                             energy_ev=5000.0, psize_cm=1e-7,
                             probe_mag_sigma=4, probe_phase_sigma=4,
                             probe_phase_max=0.3)
    xs = np.arange(0, n - pn + 1, 8)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    data = simulate(cfg, obj_true, probe, pos, theta_ls[:6])
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        theta_ls=theta_ls[:6],
                        obj_init=np.zeros_like(obj_true))
    losses = [rec.run_epoch(ep) for ep in range(20)]
    assert losses[-1] < losses[0] * 0.1, (losses[0], losses[-1])


def test_binning_consistency(tomo_sim):
    """binning=2 should give a close (not identical) forward model and
    still converge."""
    cfg, obj_true, probe, pos, theta_ls, data = tomo_sim
    cfg2 = ReconConfig(geometry=Geometry(
        obj_size=cfg.geometry.obj_size, probe_size=cfg.geometry.probe_size,
        energy_ev=cfg.geometry.energy_ev, psize_cm=cfg.geometry.psize_cm,
        free_prop_cm=None, binning=2),
        loss=cfg.loss, train=cfg.train)
    data2 = simulate(cfg2, obj_true, probe, pos, theta_ls)
    rel = np.abs(data2 - data).mean() / np.abs(data).mean()
    assert rel < 0.02, rel  # weak object: binned model is a close approximation


def test_fused_kernel_epoch_matches_xla(tomo_sim):
    """fused_multislice='on' through the FULL driver (model -> packed
    db_stack -> Pallas db kernels in interpret mode -> AD) must track the
    XLA-FFT path's loss curve closely — guards the packed-glue production
    path end to end, including the folded farfield (free_prop_cm='inf')
    and binning=2 (the non-prebinned packed pad+bin prep)."""
    _, obj_true, _, _, theta_ls, _ = tomo_sim
    n, pn = 32, 16
    base = dict(obj_size=(n, n, n), probe_size=(pn, pn),
                energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf',
                binning=2)
    probe = initialize_probe((pn, pn), 'gaussian', n_probe_modes=1,
                             energy_ev=5000.0, psize_cm=1e-7,
                             probe_mag_sigma=4, probe_phase_sigma=4,
                             probe_phase_max=0.3)
    xs = np.arange(0, n - pn + 1, 8)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)

    data = simulate(ReconConfig(geometry=Geometry(**base)),
                    obj_true, probe, pos, theta_ls[:3])

    def run(fused):
        cfg = ReconConfig(
            geometry=Geometry(**base),
            train=TrainConfig(minibatch_size=4, learning_rate=1e-5, seed=3,
                              fused_multislice=fused))
        rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                            theta_ls=theta_ls[:3],
                            obj_init=np.zeros_like(obj_true))
        return np.asarray([rec.run_epoch(ep) for ep in range(3)])

    l_xla = run('off')
    l_pal = run('on')
    # Interpret-mode kernels run the HIGHEST-precision f32 dots (~4.5e-7
    # per transform); updates WITHIN each epoch compound that noise, so
    # even epoch 0 (3 updates deep by its last batch) sits at ~3e-4.
    np.testing.assert_allclose(l_pal[0], l_xla[0], rtol=1e-3)
    np.testing.assert_allclose(l_pal, l_xla, rtol=5e-3)
