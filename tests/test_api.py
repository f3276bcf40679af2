"""Drop-in API: reference-style params dict -> full reconstruction with the
reference's output tree, plus checkpoint/resume and metrics."""

import os

import numpy as np
import pytest

from adorym_tpu import reconstruct_ptychography
from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
from adorym_tpu.simulate import simulate_to_file
from adorym_tpu.utils.initialize import initialize_probe


@pytest.fixture(scope='module')
def data_file(tmp_path_factory):
    """Small 2D ptychography dataset in the reference HDF5 layout."""
    root = tmp_path_factory.mktemp('apidata')
    n, pn = 48, 24
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf',
                          two_d_mode=True),
        train=TrainConfig(minibatch_size=8))
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(0)
    sm = gaussian_filter(rng.random((n, n, 1)), (4, 4, 0))
    sm = (sm - sm.min()) / np.ptp(sm)
    obj_true = np.stack([sm * 2e-3, sm * 5e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=5,
                             probe_phase_sigma=5, probe_phase_max=0.4)
    xs = np.arange(0, n - pn + 1, 6)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    simulate_to_file(str(root / 'data.h5'), cfg, obj_true, probe, pos)
    np.save(root / 'probe.npy', probe)
    np.save(root / 'obj_true.npy', obj_true)
    return root


def reference_style_params(root, **over):
    """A params dict in the reference's style
    (cf. tests/test_multislice_tomography_64.py in the reference)."""
    params = {
        'fname': 'data.h5',
        'save_path': str(root),
        'output_folder': 'recon_test',
        'obj_size': (48, 48, 1),
        'two_d_mode': True,
        'n_epochs': 10,
        'learning_rate': 1e-4,
        'minibatch_size': 8,
        'optimizer': 'adam',
        'probe_type': 'gaussian',
        'probe_mag_sigma': 5,
        'probe_phase_sigma': 5,
        'probe_phase_max': 0.4,
        'free_prop_cm': 'inf',
        'alpha_d': None, 'alpha_b': None, 'gamma': 0,
        'use_checkpoint': False,
        'save_intermediate': False,
        'backend': 'pytorch',   # reference kwarg: silently ignored
        'cpu_only': True,       # reference kwarg: silently ignored
    }
    params.update(over)
    return params


def test_api_reconstructs_and_writes_output_tree(data_file):
    params = reference_style_params(data_file)
    results = reconstruct_ptychography(**params)
    assert results['obj'].shape == (48, 48, 1, 2)
    lh = results['loss_history']
    assert lh[-1] < lh[0] * 0.2, lh

    out = data_file / 'recon_test'
    assert (out / 'summary.txt').exists()
    assert (out / 'convergence' / 'loss_rank_0.txt').exists()
    assert (out / 'delta_ds_1.tiff').exists()
    assert (out / 'beta_ds_1.tiff').exists()
    assert (out / 'probe_mag_ds_1.tiff').exists()
    assert (out / 'checkpoint' / 'checkpoint.npz').exists()
    # Loss CSV parses
    from adorym_tpu.io.output import parse_loss_data
    curve = parse_loss_data(str(out))
    assert len(curve) > 0 and np.isfinite(curve).all()


def test_api_checkpoint_resume(data_file):
    params = reference_style_params(
        data_file, output_folder='recon_ckpt', n_epochs=3,
        store_checkpoint=True, use_checkpoint=False,
        n_batch_per_checkpoint=5)
    r1 = reconstruct_ptychography(**params)
    # Second run resumes from the stored checkpoint and continues.
    params2 = reference_style_params(
        data_file, output_folder='recon_ckpt', n_epochs=5,
        store_checkpoint=True, use_checkpoint=True)
    r2 = reconstruct_ptychography(**params2)
    assert r2['loss_history'][-1] <= r1['loss_history'][-1] * 1.5


def test_api_epie_branch(data_file):
    params = reference_style_params(
        data_file, output_folder=None, use_epie=True, n_epochs=20,
        epie_alpha=0.5, unknown_type='real_imag')
    results = reconstruct_ptychography(**params)
    assert results['obj'].shape == (48, 48)
    assert np.isfinite(results['obj']).all()


def test_api_multiscale(data_file):
    params = reference_style_params(
        data_file, output_folder='recon_ms', multiscale_level=2, n_epochs=4)
    results = reconstruct_ptychography(**params)
    assert results['obj'].shape == (48, 48, 1, 2)
    assert np.isfinite(results['loss_history']).all()


def test_api_multiscale_per_angle_probe(data_file):
    """Multiscale downsampling with shared_probe_among_angles=False: the 5D
    [n_theta, modes, py, px, 2] probe must stride the SPATIAL axes (advisor
    round-1 finding: ``probe_init[:, ::ds, ::ds]`` sliced modes/y)."""
    params = reference_style_params(
        data_file, output_folder='recon_ms5d', multiscale_level=2,
        n_epochs=4, shared_probe_among_angles=False, optimize_probe=True)
    results = reconstruct_ptychography(**params)
    assert results['obj'].shape == (48, 48, 1, 2)
    assert results['probe'].shape[-3:] == (24, 24, 2)
    assert np.isfinite(results['loss_history']).all()


def test_api_unknown_kwarg_warns(data_file):
    params = reference_style_params(data_file, output_folder=None,
                                    n_epochs=1)
    params['definitely_not_a_kwarg'] = 42
    with pytest.warns(UserWarning, match='definitely_not_a_kwarg'):
        reconstruct_ptychography(**params)


def test_metrics_fsc():
    from adorym_tpu.metrics import (fourier_shell_correlation, fsc_crossing,
                                    register_translation)
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter
    vol = gaussian_filter(rng.normal(size=(32, 32, 32)), 2)
    radii, fsc = fourier_shell_correlation(vol, vol)
    np.testing.assert_allclose(fsc, 1.0, atol=1e-6)
    noisy = vol + rng.normal(size=vol.shape) * vol.std()
    radii, fsc2 = fourier_shell_correlation(vol, noisy)
    assert fsc2[0] > 0.8 and fsc2[-1] < fsc2[0]
    assert 0 < fsc_crossing(radii, fsc2, 0.5) <= 1.0

    img = gaussian_filter(rng.normal(size=(64, 64)), 2)
    shifted = np.fft.ifft2(np.fft.fft2(img) * np.exp(
        -2j * np.pi * (np.fft.fftfreq(64)[:, None] * 3.4
                       + np.fft.fftfreq(64)[None, :] * (-1.7)))).real
    shift = register_translation(shifted, img, upsample_factor=20)
    np.testing.assert_allclose(shift, [3.4, -1.7], atol=0.1)


def test_intermediate_parameter_history(tmp_path):
    """Refined-parameter histories land in the reference layout
    (``adorym/optimizers.py:1111-1160``): intermediate/prj_affine/
    prj_affine_<epoch>.txt etc. — the format tools/affine_transform_images
    consumes."""
    import dataclasses
    from adorym_tpu.config import (Geometry, IOConfig, ReconConfig,
                                   RefineConfig, TrainConfig)
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate
    from adorym_tpu.utils.initialize import initialize_probe

    n, pn = 24, 12
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', two_d_mode=True),
        train=TrainConfig(minibatch_size=4, learning_rate=1e-4),
        refine=RefineConfig(optimize_all_probe_pos=True,
                            optimize_probe_pos_offset=True),
        io=IOConfig(save_intermediate=True, save_intermediate_level='epoch',
                    store_checkpoint=False, use_checkpoint=False))
    rng = np.random.default_rng(0)
    obj_true = np.stack([rng.random((n, n, 1)) * 1e-3,
                         rng.random((n, n, 1)) * 3e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=3,
                             probe_phase_sigma=3, probe_phase_max=0.3)
    xs = np.arange(0, n - pn + 1, 6)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    data = simulate(cfg, obj_true, probe, pos)
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        obj_init=np.zeros_like(obj_true),
                        output_folder=str(tmp_path / 'out'))
    rec.run(n_epochs=2)
    inter = tmp_path / 'out' / 'intermediate'
    ppc = np.loadtxt(inter / 'probe_pos' / 'probe_pos_correction_1.txt')
    assert ppc.shape == (len(pos), 2)
    offs = (inter / 'probe_pos_offset' / 'probe_pos_offset.txt').read_text()
    assert offs.strip()


def test_theta_downsample_selects_matching_per_angle_grids(tmp_path):
    """With common_probe_pos=False and theta_downsample, the surviving
    angles must read THEIR OWN scan grids (original indices 0, 2, ...), not
    the first len(theta)//ds grids (advisor round-1 finding)."""
    from adorym_tpu.io.data import write_data_file
    from adorym_tpu.simulate import simulate

    n, pn = 32, 16
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 4), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf'),
        train=TrainConfig(minibatch_size=9))
    rng = np.random.default_rng(0)
    obj_true = np.stack([rng.random((n, n, 4)) * 1e-3,
                         rng.random((n, n, 4)) * 3e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=3,
                             probe_phase_sigma=3, probe_phase_max=0.3)
    theta_ls = np.linspace(0, np.pi, 4, endpoint=False)
    xs = np.arange(0, n - pn - 3, 6)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    base = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    # Distinct grid per angle (shifted by the angle index).
    grids = [base + i for i in range(4)]
    data = np.stack([
        simulate(cfg, obj_true, probe, grids[i], np.array([theta_ls[i]]))[0]
        for i in range(4)])

    full = tmp_path / 'full.h5'
    sub = tmp_path / 'sub.h5'
    write_data_file(str(full), data, theta=theta_ls,
                    energy_ev=5000.0, psize_cm=1e-7,
                    probe_pos_per_angle=grids)
    write_data_file(str(sub), data[[0, 2]], theta=theta_ls[[0, 2]],
                    energy_ev=5000.0, psize_cm=1e-7,
                    probe_pos_per_angle=[grids[0], grids[2]])

    kw = dict(obj_size=(n, n, 4), n_epochs=2, minibatch_size=9,
              learning_rate=1e-5, optimizer='adam', common_probe_pos=False,
              probe_type='supplied',
              probe_initial=(np.hypot(probe[..., 0], probe[..., 1]),
                             np.arctan2(probe[..., 1], probe[..., 0])),
              free_prop_cm='inf', use_checkpoint=False,
              save_path=str(tmp_path), output_folder=None)
    r_ds = reconstruct_ptychography(fname='full.h5', theta_downsample=2,
                                    **kw)
    r_sub = reconstruct_ptychography(fname='sub.h5', **kw)
    np.testing.assert_allclose(r_ds['loss_history'], r_sub['loss_history'],
                               rtol=1e-6)
