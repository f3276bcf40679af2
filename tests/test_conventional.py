"""Conventional algorithms: ePIE and multi-distance CTF phase retrieval."""

import numpy as np
import jax.numpy as jnp
import pytest

from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
from adorym_tpu.conventional import epie_reconstruct, multidistance_ctf
from adorym_tpu.models import multidist
from adorym_tpu.simulate import simulate
from adorym_tpu.utils.initialize import initialize_probe


def test_epie_recovers_object():
    """Simulate far-field ptychography of a complex transmission and
    reconstruct with ePIE."""
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(0)
    n, pn = 48, 24
    ph = gaussian_filter(rng.normal(size=(n, n)), 4)
    ph = ph / np.abs(ph).max() * 0.8
    obj_true = np.exp(1j * ph).astype(np.complex64)

    probe_np = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                                psize_cm=1e-7, probe_mag_sigma=6,
                                probe_phase_sigma=6, probe_phase_max=0.2)
    probe = probe_np[0, ..., 0] + 1j * probe_np[0, ..., 1]

    xs = np.arange(0, n - pn + 1, 4)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1)

    # Far-field magnitudes: |fftshift(fft2(P * O_patch))|
    data = []
    for (y, x) in pos:
        ex = probe * obj_true[y:y + pn, x:x + pn]
        data.append(np.abs(np.fft.fftshift(np.fft.fft2(ex))))
    data = np.stack(data)

    obj0 = np.ones((n, n), np.complex64)
    obj_rec, probe_rec = epie_reconstruct(data, probe, pos, obj0,
                                          alpha=1.0, n_epochs=150)
    sl = slice(10, 38)
    ph_rec = np.angle(np.asarray(obj_rec))[sl, sl]
    corr = np.corrcoef(ph_rec.ravel(), ph[sl, sl].ravel())[0, 1]
    # The object/probe phase-ramp ambiguity bounds attainable correlation.
    assert corr > 0.9, corr


def test_epie_fixed_probe():
    rng = np.random.default_rng(1)
    n, pn = 32, 16
    obj_true = np.exp(1j * 0.3 * rng.random((n, n))).astype(np.complex64)
    probe = np.ones((pn, pn), np.complex64)
    pos = np.array([[y, x] for y in range(0, 17, 4) for x in range(0, 17, 4)])
    data = np.stack([np.abs(np.fft.fftshift(np.fft.fft2(
        probe * obj_true[y:y + pn, x:x + pn]))) for (y, x) in pos])
    obj_rec, probe_rec = epie_reconstruct(data, probe, pos,
                                          np.ones((n, n), np.complex64),
                                          n_epochs=30, update_probe=False)
    np.testing.assert_allclose(np.asarray(probe_rec), probe)
    assert np.isfinite(np.asarray(obj_rec)).all()


def test_multidistance_ctf_phase_retrieval():
    """Retrieve the phase of a weak object from multi-distance holograms
    produced by the AD forward model."""
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(2)
    N = 64
    DISTS = (0.05, 0.12, 0.3, 0.7)
    kappa = 200.0
    ph = gaussian_filter(rng.normal(size=(N, N, 1)), (5, 5, 0))
    ph = ph / np.abs(ph).max() * 0.05           # weak phase
    mag = np.exp(ph[..., 0] / kappa)            # homogeneous object: ln m = phi/kappa
    obj_true = np.stack([mag[..., None] * np.cos(ph),
                         mag[..., None] * np.sin(ph)], -1).astype(np.float32)

    cfg = ReconConfig(
        geometry=Geometry(obj_size=(N, N, 1), probe_size=(N, N),
                          energy_ev=17500.0, psize_cm=1e-5,
                          free_prop_cm=DISTS, n_dists=len(DISTS),
                          two_d_mode=True, safe_zone_width=0),
        train=TrainConfig(minibatch_size=1, unknown_type='real_imag'))
    probe = initialize_probe((N, N), 'plane')
    holo_mags = simulate(cfg, obj_true, probe, np.array([[0.0, 0.0]]),
                         model=multidist)[0]     # [n_dists, N, N]
    intensities = holo_mags ** 2

    phase = np.asarray(multidistance_ctf(intensities, np.asarray(DISTS),
                                         17500.0, 1e-5, kappa=kappa))
    # CTF retrieves -phi up to sign convention; compare |correlation|.
    sl = slice(6, 58)
    corr = np.corrcoef(phase[sl, sl].ravel(), ph[sl, sl, 0].ravel())[0, 1]
    assert abs(corr) > 0.85, corr


def test_epie_with_position_corrections():
    """ePIE with sub-pixel probe_pos_correction shifts
    (adorym/conventional.py:42-49)."""
    rng = np.random.default_rng(4)
    n, pn = 32, 16
    from scipy.ndimage import gaussian_filter
    ph = gaussian_filter(rng.normal(size=(n, n)), 3)
    obj_true = np.exp(1j * ph / np.abs(ph).max() * 0.5).astype(np.complex64)
    probe = np.ones((pn, pn), np.complex64)
    pos = np.array([[y, x] for y in range(0, 17, 4) for x in range(0, 17, 4)])
    corr = rng.uniform(-0.4, 0.4, (len(pos), 2)).astype(np.float32)
    # Simulate with the sub-pixel-shifted probes.
    import jax.numpy as jnp
    from adorym_tpu.ops.fourier import fourier_shift
    data = []
    for j, (y, x) in enumerate(pos):
        pj = np.asarray(fourier_shift(jnp.asarray(probe), jnp.asarray(corr[j])))
        data.append(np.abs(np.fft.fftshift(np.fft.fft2(
            pj * obj_true[y:y + pn, x:x + pn]))))
    data = np.stack(data)
    from adorym_tpu.conventional import epie_reconstruct
    obj_rec, _ = epie_reconstruct(data, probe, pos,
                                  np.ones((n, n), np.complex64),
                                  n_epochs=40, update_probe=False,
                                  probe_pos_correction=corr)
    sl = slice(6, 26)
    corr_coef = np.corrcoef(np.angle(np.asarray(obj_rec))[sl, sl].ravel(),
                            ph[sl, sl].ravel() / np.abs(ph).max() * 0.5)[0, 1]
    # Sub-pixel shift approximation in the update rule bounds fidelity.
    assert corr_coef > 0.75, corr_coef
