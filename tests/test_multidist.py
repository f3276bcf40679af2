"""Multi-distance near-field holography (BASELINE config #4 analog).

Simulate holograms of a 2D complex object at several distances, then
reconstruct — with free-prop refinement, affine registration, and the CTF
branch exercised.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from adorym_tpu.config import Geometry, ReconConfig, RefineConfig, TrainConfig
from adorym_tpu.models import multidist
from adorym_tpu.recon import Reconstructor
from adorym_tpu.simulate import simulate
from adorym_tpu.utils.initialize import initialize_probe


N = 64
# Chosen so the Fresnel fringe scale sqrt(lambda z) spans ~2-9 px at
# 17.5 keV / 100 nm pixels — real defocus contrast at every distance.
DISTS = (0.05, 0.12, 0.3, 0.7)  # cm


def make_object_2d(seed=0):
    """real_imag-type 2D object: transmission ~ 1 with smooth phase."""
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(seed)
    ph = gaussian_filter(rng.normal(size=(N, N, 1)), (6, 6, 0))
    ph = ph / np.abs(ph).max() * 0.5
    mag = 1.0 - 0.1 * gaussian_filter(rng.random((N, N, 1)), (6, 6, 0))
    return np.stack([mag * np.cos(ph), mag * np.sin(ph)], -1).astype(np.float32)


def base_cfg(refine=None, forward_algorithm='fresnel'):
    return ReconConfig(
        geometry=Geometry(obj_size=(N, N, 1), probe_size=(N, N),
                          energy_ev=17500.0, psize_cm=1e-5,
                          free_prop_cm=DISTS, n_dists=len(DISTS),
                          two_d_mode=True, safe_zone_width=0),
        train=TrainConfig(minibatch_size=1, learning_rate=1e-2,
                          unknown_type='real_imag', seed=0,
                          forward_algorithm=forward_algorithm),
        refine=refine or RefineConfig(),
    )


@pytest.fixture(scope='module')
def holo_sim():
    cfg = base_cfg()
    obj_true = make_object_2d()
    probe = initialize_probe((N, N), 'plane')
    pos = np.array([[0.0, 0.0]])
    data = simulate(cfg, obj_true, probe, pos, model=multidist)
    return cfg, obj_true, probe, pos, data


def test_simulated_hologram_shapes(holo_sim):
    cfg, obj_true, probe, pos, data = holo_sim
    assert data.shape == (1, len(DISTS), N, N)
    # Weak-object holograms: contrast around unity.
    assert 0.5 < data.mean() < 1.5
    # Different distances give different fringes.
    assert np.abs(data[0, 0] - data[0, -1]).max() > 1e-3


def test_holography_reconstruction_converges(holo_sim):
    cfg, obj_true, probe, pos, data = holo_sim
    obj0 = np.stack([np.ones((N, N, 1)), np.zeros((N, N, 1))], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        obj_init=obj0, model=multidist)
    losses = [rec.run_epoch(ep) for ep in range(200)]
    assert losses[-1] < losses[0] * 0.02, (losses[0], losses[-1])
    # Phase of the recovered transmission should correlate with the truth.
    ph_rec = np.arctan2(rec.obj[..., 1], rec.obj[..., 0])[:, :, 0]
    ph_true = np.arctan2(obj_true[..., 1], obj_true[..., 0])[:, :, 0]
    sl = slice(8, 56)
    corr = np.corrcoef(ph_rec[sl, sl].ravel(), ph_true[sl, sl].ravel())[0, 1]
    assert corr > 0.9, corr


def test_free_prop_refinement(holo_sim):
    """Start with slightly wrong distances; optimize_free_prop should pull
    them toward the truth."""
    cfg0, obj_true, probe, pos, data = holo_sim
    wrong = tuple(d * 1.15 for d in DISTS)
    refine = RefineConfig(optimize_free_prop=True, free_prop_learning_rate=1e-5)
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(N, N, 1), probe_size=(N, N),
                          energy_ev=17500.0, psize_cm=1e-5,
                          free_prop_cm=wrong, n_dists=len(DISTS),
                          two_d_mode=True, safe_zone_width=0),
        train=cfg0.train, refine=refine)
    obj0 = np.stack([np.ones((N, N, 1)), np.zeros((N, N, 1))], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        obj_init=obj0, model=multidist)
    d_before = np.abs(np.asarray(rec.params['free_prop_cm']) - np.asarray(DISTS)).mean()
    for ep in range(30):
        rec.run_epoch(ep)
    d_after = np.abs(np.asarray(rec.params['free_prop_cm']) - np.asarray(DISTS)).mean()
    assert d_after < d_before, (d_before, d_after)


def test_affine_registration_path_runs(holo_sim):
    cfg0, obj_true, probe, pos, data = holo_sim
    refine = RefineConfig(optimize_prj_affine=True,
                          prj_affine_learning_rate=1e-4)
    cfg = ReconConfig(geometry=cfg0.geometry, train=cfg0.train, refine=refine)
    obj0 = np.stack([np.ones((N, N, 1)), np.zeros((N, N, 1))], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        obj_init=obj0, model=multidist)
    l0 = rec.run_epoch(0)
    l1 = rec.run_epoch(1)
    assert np.isfinite(l1) and l1 < l0
    # Distance-0 affine stays pinned at identity.
    aff = np.asarray(rec.params['prj_affine_ls'])
    np.testing.assert_allclose(aff[0], [[1, 0, 0], [0, 1, 0]], atol=1e-6)


def test_safe_zone_blocks():
    """Tiled prediction with a safe zone approximates the single-tile
    full-field prediction."""
    cfg_full = base_cfg()
    obj_true = make_object_2d(seed=3)
    probe = initialize_probe((N, N), 'plane')
    full = simulate(cfg_full, obj_true, probe, np.array([[0.0, 0.0]]),
                    model=multidist)
    # 2x2 tiles of 32^2 with a 16-px safe zone
    cfg_t = ReconConfig(
        geometry=Geometry(obj_size=(N, N, 1), probe_size=(32, 32),
                          energy_ev=17500.0, psize_cm=1e-5,
                          free_prop_cm=DISTS, n_dists=len(DISTS),
                          two_d_mode=True, safe_zone_width=16),
        train=TrainConfig(minibatch_size=4, unknown_type='real_imag'))
    pos = np.array([[0, 0], [0, 32], [32, 0], [32, 32]], dtype=float)
    tiled = simulate(cfg_t, obj_true, probe, pos, model=multidist)
    # Reassemble tiles at distance 0 and compare interiors.
    recon_img = np.zeros((N, N), np.float32)
    for k, (y, x) in enumerate(pos.astype(int)):
        recon_img[y:y + 32, x:x + 32] = tiled[0, k]
    err = np.abs(recon_img[8:-8, 8:-8] - full[0, 0][8:-8, 8:-8]).mean()
    scale = np.abs(full[0, 0]).mean()
    assert err / scale < 0.02, err / scale


def test_ctf_forward_branch(holo_sim):
    """CTF forward algorithm produces finite magnitudes and a decreasing
    loss with the kappa parameter refinable."""
    obj_true_db = np.stack([np.abs(np.random.default_rng(0)
                                   .normal(0, 1e-7, (N, N, 1))),
                            np.zeros((N, N, 1))], -1).astype(np.float32)
    refine = RefineConfig(optimize_ctf_lg_kappa=True,
                          ctf_lg_kappa_learning_rate=1e-3)
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(N, N, 1), probe_size=(N, N),
                          energy_ev=17500.0, psize_cm=1e-5,
                          free_prop_cm=DISTS, n_dists=len(DISTS),
                          two_d_mode=True, safe_zone_width=0),
        train=TrainConfig(minibatch_size=1, learning_rate=1e-9,
                          unknown_type='delta_beta',
                          forward_algorithm='ctf'),
        refine=refine)
    probe = initialize_probe((N, N), 'plane')
    pos = np.array([[0.0, 0.0]])
    data = simulate(cfg, obj_true_db, probe, pos, model=multidist)
    assert np.all(np.isfinite(data))
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        obj_init=np.zeros_like(obj_true_db), model=multidist)
    l0 = rec.run_epoch(0)
    l2 = None
    for ep in range(1, 3):
        l2 = rec.run_epoch(ep)
    assert np.isfinite(l2)


def test_external_ctf_algorithm_hook():
    """update_using_external_algorithm='ctf': after each optimizer step the
    object's delta channel is replaced with the multi-distance CTF retrieval
    (adorym/array_ops.py:274-286)."""
    from scipy.ndimage import gaussian_filter
    from adorym_tpu.recon import Reconstructor
    rng = np.random.default_rng(7)
    kappa = 200.0
    ph = gaussian_filter(rng.normal(size=(N, N, 1)), (5, 5, 0))
    ph = ph / np.abs(ph).max() * 0.05
    mag = np.exp(ph[..., 0] / kappa)
    obj_true = np.stack([mag[..., None] * np.cos(ph),
                         mag[..., None] * np.sin(ph)], -1).astype(np.float32)
    cfg_sim = base_cfg()
    data = simulate(cfg_sim, obj_true, initialize_probe((N, N), 'plane'),
                    np.array([[0.0, 0.0]]), model=multidist) ** 2
    cfg = ReconConfig(
        geometry=cfg_sim.geometry,
        train=TrainConfig(minibatch_size=1, learning_rate=0.0,
                          optimizer='gd', unknown_type='delta_beta',
                          ctf_kappa=kappa))
    rec = Reconstructor(cfg, data=data, probe_pos=np.array([[0.0, 0.0]]),
                        probe_init=initialize_probe((N, N), 'plane'),
                        obj_init=np.zeros((N, N, 1, 2), np.float32),
                        model=multidist, external_algorithm='ctf')
    rec.run_epoch(0)
    corr = np.corrcoef(rec.obj[6:58, 6:58, 0, 0].ravel(),
                       ph[6:58, 6:58, 0].ravel())[0, 1]
    assert abs(corr) > 0.95, corr
