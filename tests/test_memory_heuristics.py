"""Device-derived memory budgets: the driver's working-set heuristics
(gradient-chunk fusing, data residency, rotation chunking) scale with the
actual per-device capacity instead of hardcoding the 16 GB v5e they were
tuned on."""

import numpy as np
import pytest

from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
from adorym_tpu.ops import rotate
from adorym_tpu.utils import profiling


def _mock_hbm(monkeypatch, nbytes):
    monkeypatch.setattr(profiling, 'hbm_limit_bytes', lambda: float(nbytes))


def _make_rec(n=64, pn=24, n_theta=2, n_pos=9, mb=3):
    from adorym_tpu.recon import Reconstructor
    rng = np.random.default_rng(0)
    data = rng.random((n_theta, n_pos, pn, pn)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(3) * 12.0, np.arange(3) * 12.0,
                         indexing='ij')
    pos = np.stack([ys.ravel(), xs.ravel()], -1)
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                          binning=4),
        train=TrainConfig(minibatch_size=mb))
    return Reconstructor(cfg, data=data, probe_pos=pos,
                         theta_ls=np.linspace(0, 1, n_theta))


def test_fuse_g_scales_with_hbm(monkeypatch):
    _mock_hbm(monkeypatch, 16e9)
    g_16 = _make_rec()._fuse_g
    # A tiny chip must fuse less; a big chip at least as much (the cap at
    # 64 may bind at both ends for small test shapes, so drive the small
    # end well below it).
    _mock_hbm(monkeypatch, 6.2e9)
    g_small = _make_rec()._fuse_g
    assert g_small < g_16 or g_16 == 64
    assert g_small >= 1
    _mock_hbm(monkeypatch, 95e9)
    assert _make_rec()._fuse_g >= g_16


def test_data_residency_scales_with_hbm(monkeypatch):
    # ~9.5 MB dataset: resident on 16 GB, refused when the capacity barely
    # exceeds the 1.5 GB reserve.
    _mock_hbm(monkeypatch, 16e9)
    assert _make_rec()._data_dev_ok
    _mock_hbm(monkeypatch, 1.51e9)
    assert not _make_rec()._data_dev_ok


def test_rotation_chunking_scales_with_hbm(monkeypatch):
    nbytes = int(600e6)
    _mock_hbm(monkeypatch, 16e9)   # threshold 512 MB -> chunked
    assert rotate._carried_chunks(64, nbytes) > 1
    _mock_hbm(monkeypatch, 95e9)   # threshold ~3 GB -> single pass
    assert rotate._carried_chunks(64, nbytes) == 1


def test_default_on_cpu_is_16g():
    # Tests run on the CPU backend: the heuristics must sit exactly on the
    # published v5e tuning.
    assert profiling.hbm_limit_bytes() == profiling.DEFAULT_HBM_BYTES == 16e9
