"""Native C++ batch loader: correctness of sync gather and async prefetch."""

import os

import numpy as np
import pytest

from adorym_tpu.io import fastloader


pytestmark = pytest.mark.skipif(not fastloader.available(),
                                reason='native loader unavailable')


@pytest.fixture(scope='module')
def raw_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp('fastloader')
    rng = np.random.default_rng(0)
    data = rng.random((3, 20, 8, 8)).astype(np.float32)
    raw = str(root / 'data.raw')
    data.tofile(raw)
    return raw, data


def test_sync_gather_matches_numpy(raw_dataset):
    raw, data = raw_dataset
    ld = fastloader.FastLoader(raw, data.shape)
    idx = [3, 17, 0, 9]
    out = ld.gather(1, idx)
    np.testing.assert_array_equal(out, data[1][idx])
    ld.close()


def test_async_prefetch(raw_dataset):
    raw, data = raw_dataset
    ld = fastloader.FastLoader(raw, data.shape, n_slots=2)
    idx_a = [0, 5, 10]
    idx_b = [1, 2, 3, 4]
    ld.prefetch(0, 0, idx_a)
    ld.prefetch(1, 2, idx_b)
    np.testing.assert_array_equal(ld.get(0, len(idx_a)), data[0][idx_a])
    np.testing.assert_array_equal(ld.get(1, len(idx_b)), data[2][idx_b])
    # Reuse slots
    ld.prefetch(0, 1, idx_b)
    np.testing.assert_array_equal(ld.get(0, len(idx_b)), data[1][idx_b])
    ld.close()


def test_h5_conversion(raw_dataset, tmp_path):
    raw, data = raw_dataset
    from adorym_tpu.io.data import write_data_file
    h5 = str(tmp_path / 'd.h5')
    write_data_file(h5, data)
    raw2 = str(tmp_path / 'd.raw')
    shape = fastloader.convert_h5_to_raw(h5, raw2)
    assert tuple(shape) == data.shape
    ld = fastloader.FastLoader(raw2, shape)
    np.testing.assert_allclose(ld.gather(0, [0]), np.abs(data[0][[0]]))
    ld.close()


def test_open_missing_file_fails():
    with pytest.raises(RuntimeError):
        fastloader.FastLoader('/nonexistent/file.raw', (1, 1, 4, 4))


def test_angle_fused_epoch_with_loader(tmp_path):
    """The angle-fused 3D path composes with out-of-core measurement data:
    a FastLoader-backed run must match the in-memory trajectory exactly."""
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate
    from adorym_tpu.utils.initialize import initialize_probe

    n, pn = 24, 12
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', binning=4),
        train=TrainConfig(minibatch_size=3, learning_rate=1e-5, seed=7,
                          update_scheme='per angle',
                          rotate_out_of_loop=True))
    rng = np.random.default_rng(0)
    obj_true = np.stack([rng.random((n, n, n)) * 1e-3,
                         rng.random((n, n, n)) * 3e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=3,
                             probe_phase_sigma=3, probe_phase_max=0.3)
    xs = np.arange(0, n - pn + 1, 6)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    theta_ls = np.linspace(0, np.pi, 3, endpoint=False)
    data = simulate(cfg, obj_true, probe, pos, theta_ls)

    raw = str(tmp_path / 'data.raw')
    np.ascontiguousarray(data, np.float32).tofile(raw)
    ld = fastloader.FastLoader(raw, data.shape)

    def run(src):
        rec = Reconstructor(cfg, data=src, probe_pos=pos, probe_init=probe,
                            theta_ls=theta_ls,
                            obj_init=np.zeros_like(obj_true))
        losses = [rec.run_epoch(ep) for ep in range(2)]
        return rec, losses

    rec_mem, losses_mem = run(data)
    rec_ld, losses_ld = run(ld)
    ld.close()
    np.testing.assert_allclose(losses_ld, losses_mem, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rec_ld.params['obj']),
                               np.asarray(rec_mem.params['obj']), atol=1e-7)
