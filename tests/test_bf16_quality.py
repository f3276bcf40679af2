"""End-to-end quality of the run_bfloat16 path (the advertised fastest
flagship setting: on TPU it also selects the fused Pallas delta_beta
kernel, whose gradients are separately verified against the scan path in
test_pallas_multislice).

Validated bound (documented in CLAUDE.md): a bf16 reconstruction recovers
the phantom as well as f32 (correlation-vs-truth within 0.02) and
correlates >0.95 with the f32 reconstruction; only the converged LOSS
FLOOR sits a few x higher (bf16 forward noise rectified by the lsq
mismatch)."""

import numpy as np
from scipy.ndimage import gaussian_filter

from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
from adorym_tpu.recon import Reconstructor
from adorym_tpu.simulate import simulate
from adorym_tpu.utils.initialize import initialize_probe


def test_bf16_reconstruction_matches_f32_quality():
    n, pn, nz = 32, 16, 16
    rng = np.random.default_rng(0)
    sm = gaussian_filter(rng.random((n, n, nz)), 1.5)
    sm = (sm - sm.min()) / (sm.max() - sm.min())
    obj_true = np.stack([sm * 1e-3, sm * 3e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=4,
                             probe_phase_sigma=4, probe_phase_max=0.3)
    xs = np.arange(0, n - pn + 1, 8)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    theta_ls = np.linspace(0, np.pi, 12, endpoint=False)

    geo = Geometry(obj_size=(n, n, nz), probe_size=(pn, pn),
                   energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf',
                   binning=4)
    data = simulate(ReconConfig(geometry=geo,
                                train=TrainConfig(minibatch_size=4)),
                    obj_true, probe, pos, theta_ls)
    out = {}
    for bf16 in (False, True):
        cfg = ReconConfig(geometry=geo,
                          train=TrainConfig(minibatch_size=4,
                                            learning_rate=2e-6,
                                            run_bfloat16=bf16))
        rec = Reconstructor(cfg, data=data, probe_pos=pos,
                            probe_init=probe, theta_ls=theta_ls,
                            obj_init=np.zeros_like(obj_true))
        hist = [rec.run_epoch(ep) for ep in range(20)]
        out[bf16] = (rec.obj[..., 0].ravel(), hist)

    truth = obj_true[..., 0].ravel()
    corr_f32 = np.corrcoef(out[False][0], truth)[0, 1]
    corr_bf16 = np.corrcoef(out[True][0], truth)[0, 1]
    cross = np.corrcoef(out[False][0], out[True][0])[0, 1]
    # Measured on this config: f32 0.831, bf16 0.829, cross 0.984.
    assert corr_bf16 > corr_f32 - 0.02, (corr_f32, corr_bf16)
    assert corr_f32 > 0.7, corr_f32
    assert cross > 0.95, cross
    # Early epochs track closely; the converged floor may sit a few x
    # above f32's (bf16 forward noise) — that gap is the documented cost.
    h32, h16 = np.asarray(out[False][1]), np.asarray(out[True][1])
    np.testing.assert_allclose(h16[:4], h32[:4], rtol=0.3)
    assert h16[-1] < 5 * h32[-1], (h16[-1], h32[-1])
