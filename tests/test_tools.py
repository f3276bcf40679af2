"""Data tools (ports of reference tools/) + simulation resume."""

import importlib.util
import os
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
TOOLS = os.path.join(HERE, '..', 'tools')


def _load(name):
    spec = importlib.util.spec_from_file_location(
        'tool_' + name, os.path.join(TOOLS, name + '.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
def test_create_noisy_data(tmp_path):
    import h5py
    m = _load('create_noisy_data')
    rng = np.random.default_rng(0)
    data = rng.random((2, 3, 16, 16)).astype(np.float32) + 0.5
    # SNR grows with the photon budget.
    _, snr_lo = m.add_poisson_noise(data, 1e1, seed=0)
    _, snr_hi = m.add_poisson_noise(data, 1e4, seed=0)
    assert snr_hi > snr_lo * 10
    src = tmp_path / 'clean.h5'
    with h5py.File(src, 'w') as f:
        f.create_dataset('exchange/data', data=data)
        f.create_dataset('metadata/energy_ev', data=5000.0)
    out = m.main([str(src), '--n_ph_per_px', '1e3', '--seed', '1'])
    with h5py.File(out, 'r') as f:
        noisy = f['exchange/data'][...]
        assert f['metadata/energy_ev'][()] == 5000.0
    assert noisy.shape == data.shape
    assert not np.allclose(noisy, data)
    assert np.allclose(noisy, data, atol=0.5)


def test_convert_aps_2idd(tmp_path):
    import h5py
    m = _load('convert_aps_2idd_to_adorym')
    rng = np.random.default_rng(1)
    src = tmp_path / 'beamline.h5'
    with h5py.File(src, 'w') as f:
        f.create_dataset('dp', data=rng.random((5, 8, 8)).astype(np.float32))
        f.create_dataset('lambda', data=np.array([1.4089e-10]))  # ~8.8 keV
        f.create_dataset('dx', data=np.array([1.3279e-8]))       # m
        f.create_dataset('ppX', data=rng.random(5) * 1e-6)
        f.create_dataset('ppY', data=rng.random(5) * 1e-6)
    out = tmp_path / 'data.h5'
    info = m.convert(str(src), str(out))
    assert abs(info['energy_ev'] - 8801.2) < 1.0
    from adorym_tpu.io.data import RawDataset
    ds = RawDataset(str(out))
    assert ds.all_magnitudes().shape == (1, 5, 8, 8)
    pos = ds.probe_pos()
    assert pos.shape == (5, 2) and pos.min() >= 0


def test_convert_multidistance_with_blocks(tmp_path):
    m = _load('convert_multidistance_to_adorym')
    from adorym_tpu.io.output import write_tiff
    rng = np.random.default_rng(2)
    src = tmp_path / 'raw'
    os.makedirs(src)
    imgs = {}
    for t in range(2):
        for d in range(3):
            img = rng.random((16, 16)).astype(np.float32)
            imgs[(t, d)] = img
            write_tiff(img, str(src / f'data_{t:04d}_{d:02d}.tiff'))
    out = tmp_path / 'md.h5'
    info = m.convert(str(src), [0.1, 0.2, 0.3], 'data', str(out),
                     n_blocks_y=2, n_blocks_x=2, energy_ev=17500.,
                     psize_cm=1e-5)
    assert info['n_blocks'] == 4 and info['block_shape'] == (8, 8)
    import h5py
    with h5py.File(out, 'r') as f:
        data = f['exchange/data'][...]
        assert data.shape == (2, 12, 8, 8)
        # Row layout i_dist * n_blocks + block; block 1 is top-right tile.
        np.testing.assert_allclose(data[1, 1 * 4 + 1], imgs[(1, 1)][:8, 8:])
        np.testing.assert_allclose(f['metadata/free_prop_cm'][...],
                                   [0.1, 0.2, 0.3])


def test_register_multidistance(tmp_path):
    m = _load('register_multidistance_data')
    from adorym_tpu.io.output import read_tiff, write_tiff
    from scipy.ndimage import gaussian_filter, shift as nd_shift
    rng = np.random.default_rng(3)
    base = gaussian_filter(rng.random((32, 32)), 2).astype(np.float32)
    src = tmp_path / 'raw'
    os.makedirs(src)
    true_shifts = [np.zeros(2), np.array([2.0, -3.0])]
    for t in range(2):
        for d in range(2):
            img = nd_shift(base + 0.1 * t, -true_shifts[d], order=1,
                           mode='wrap')
            write_tiff(img, str(src / f'data_{t:04d}_{d:02d}.tiff'))
    out_dir, shifts = m.register_folder(str(src), 'data')
    # img was shifted by -s, so the measured correction is +s.
    np.testing.assert_allclose(shifts[1], true_shifts[1], atol=0.2)
    reg = read_tiff(os.path.join(out_dir, 'data_0000_01.tiff'))
    ref = read_tiff(os.path.join(out_dir, 'data_0000_00.tiff'))
    assert np.abs(reg - ref).mean() < 0.02


def test_rescale_cone_to_parallel():
    m = _load('rescale_multidistance_data')
    from scipy.ndimage import zoom, gaussian_filter
    rng = np.random.default_rng(4)
    img = gaussian_filter(rng.random((40, 40)), 3).astype(np.float32)
    # Distance 1 (reference frame) is magnified 1.5625x; distance 0 only
    # 1.25x — its image shows the scene smaller by a factor 0.8.
    z_sd, z_od = 100.0, np.array([20.0, 36.0])
    mag = z_sd / (z_sd - z_od)
    small = zoom(img, mag[0] / mag[1], order=1)   # 32x32
    frame0 = np.pad(small, 4, mode='edge')        # back to 40x40
    out, z_eff, mags = m.convert_cone_to_parallel([frame0, img], z_sd, z_od)
    assert out[0].shape == img.shape
    # Rescaling zooms frame0 by mag1/mag0 = 1.25, recovering the scene scale.
    sl = slice(10, 30)
    corr = np.corrcoef(np.asarray(out[0])[sl, sl].ravel(),
                       img[sl, sl].ravel())[0, 1]
    assert corr > 0.95, corr
    np.testing.assert_allclose(z_eff, (z_sd - z_od) * z_od / z_sd)


def test_initialize_probe_er():
    m = _load('initialize_probe_er')
    n = 32
    yy, xx = np.mgrid[:n, :n] - (n - 1) / 2
    true_probe = (np.hypot(yy, xx) <= 6).astype(np.complex64)
    dp = np.abs(np.fft.fftshift(np.fft.fft2(true_probe)))
    probe, mse = m.retrieve_probe(dp, mask_radius=8, n_epochs=300)
    # ER/HIO yields an initial GUESS (the reference's algorithm stagnates
    # similarly on a hard-edged disk); require a far-field fit well below
    # the trivial zero-probe baseline and support confinement.
    assert mse < 0.3 * np.mean(dp ** 2), (mse, np.mean(dp ** 2))
    yy, xx = np.mgrid[:n, :n] - (n - 1) / 2
    inside = np.hypot(yy, xx) <= 8
    e_in = np.sum(np.abs(probe[inside]) ** 2)
    e_out = np.sum(np.abs(probe[~inside]) ** 2)
    assert e_in > 5 * e_out, (e_in, e_out)


def test_stitch_distributed_objects(tmp_path):
    m = _load('stitch_distributed_objects')
    from adorym_tpu.io.output import read_tiff, write_tiff
    rng = np.random.default_rng(5)
    slabs = [rng.random((4, 8, 8)).astype(np.float32) for _ in range(3)]
    for r, s in enumerate(slabs):
        write_tiff(s, str(tmp_path / f'delta_rank_{r}.tiff'))
        write_tiff(s + 1, str(tmp_path / f'beta_rank_{r}.tiff'))
    out = m.stitch(str(tmp_path))
    assert len(out) == 2
    stack = read_tiff(os.path.join(str(tmp_path), 'delta_stack.tiff'))
    np.testing.assert_allclose(stack, np.concatenate(slabs, 0))


def test_convert_csv_to_tiff(tmp_path):
    m = _load('convert_csv_to_tiff')
    from adorym_tpu.io.output import read_tiff
    arr = np.array([[1.5e-1 + 2.0e-2j, -3.0e-3 - 4.0e-1j],
                    [5.0e+0 + 0.0e+0j, -1.0e-2 + 7.5e-1j]])
    path = tmp_path / 'dump.csv'
    with open(path, 'w') as f:
        for row in arr:
            f.write(', '.join(f'({v.real:.4e}+{v.imag:.4e}j)'.replace('+-', '-')
                              for v in row) + '\n')
    mag_p, ph_p = m.convert(str(path))
    np.testing.assert_allclose(read_tiff(mag_p), np.abs(arr), rtol=1e-3)


def test_affine_transform_images(tmp_path):
    m = _load('affine_transform_images')
    from adorym_tpu.io.output import read_tiff, write_tiff
    rng = np.random.default_rng(6)
    src = tmp_path / 'imgs'
    os.makedirs(src)
    for t in range(2):
        for d in range(2):
            write_tiff(rng.random((16, 16)).astype(np.float32),
                       str(src / f'img_{t:04d}_{d:02d}.tiff'))
    eye = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    mats = np.concatenate([eye, eye * np.array([[0.9], [0.9]])])
    np.savetxt(tmp_path / 'mats.txt', mats)
    out = m.apply_affines(str(src), str(tmp_path / 'mats.txt'),
                          str(tmp_path / 'out'), 'img')
    # Identity affine: distance-0 images unchanged.
    a = read_tiff(os.path.join(out, 'img_0000_00.tiff'))
    b = read_tiff(str(src / 'img_0000_00.tiff'))
    np.testing.assert_allclose(a, b, atol=1e-5)


# ---------------------------------------------------------------------------
def test_simulation_resume(tmp_path):
    """Killing and restarting a multi-angle simulation continues from the
    checkpointed angle (``adorym/simulation.py:474-486``)."""
    import h5py
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.simulate import simulate_to_file
    from adorym_tpu.utils.initialize import initialize_probe

    n, pn = 16, 8
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 4), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf'),
        train=TrainConfig(minibatch_size=4))
    rng = np.random.default_rng(0)
    obj = np.stack([rng.random((n, n, 4)) * 1e-3,
                    rng.random((n, n, 4)) * 3e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'plane')
    pos = np.array([[0.0, 0.0], [4.0, 4.0], [8.0, 8.0]])
    theta = np.linspace(0, np.pi, 5, endpoint=False)

    straight = simulate_to_file(str(tmp_path / 'a.h5'), cfg, obj, probe,
                                pos, theta)
    full = simulate_to_file(str(tmp_path / 'b.h5'), cfg, obj, probe, pos,
                            theta, use_checkpoint=True)
    np.testing.assert_allclose(full, straight, atol=1e-6)
    assert not os.path.exists(str(tmp_path / 'b.h5') +
                              '.sim_checkpoint_i_theta.txt')

    # Simulate an interruption after angle 2: corrupt later angles and
    # plant the checkpoint; resume must rewrite exactly angles 2..4.
    path = str(tmp_path / 'b.h5')
    with h5py.File(path, 'r+') as f:
        f['exchange/data'][2:] = -1.0
    np.savetxt(path + '.sim_checkpoint_i_theta.txt', [2], fmt='%d')
    resumed = simulate_to_file(path, cfg, obj, probe, pos, theta,
                               use_checkpoint=True)
    np.testing.assert_allclose(resumed, straight, atol=1e-6)


def test_monitor_reconstruction(tmp_path):
    """The monitor tool (CLI port of the reference's
    monitor_reconstruction.ipynb) reports loss tail + latest intermediate
    dumps from a live output folder, and renders the status figure."""
    from adorym_tpu.config import Geometry, IOConfig, ReconConfig, TrainConfig
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate
    from adorym_tpu.utils.initialize import initialize_probe
    import dataclasses as dc

    n, pn = 16, 8
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', two_d_mode=True),
        train=TrainConfig(minibatch_size=4, learning_rate=1e-4),
        io=IOConfig(save_intermediate=True, save_intermediate_level='epoch',
                    store_checkpoint=False, use_checkpoint=False))
    rng = np.random.default_rng(0)
    obj = np.stack([rng.random((n, n, 1)) * 1e-3,
                    rng.random((n, n, 1)) * 3e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'plane')
    pos = np.array([[0.0, 0.0], [4.0, 4.0], [8.0, 8.0], [8.0, 0.0]])
    data = simulate(cfg, obj, probe, pos)
    out = str(tmp_path / 'run')
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        obj_init=np.zeros_like(obj), output_folder=out)
    for ep in range(2):
        rec.run_epoch(ep)
        rec._save_intermediate(ep, -1)

    mon = _load('monitor_reconstruction')
    text, curve, obj_path, probe_path = mon.report(out)
    assert 'last loss' in text and len(curve) == 2
    assert obj_path is not None and os.path.exists(obj_path)
    assert probe_path is not None and os.path.exists(probe_path)
    png = str(tmp_path / 'status.png')
    mon.save_figure(png, curve, obj_path, probe_path)
    assert os.path.getsize(png) > 0
