"""Coverage for remaining ops: backpropagation, IR kernel, ramp filter,
beamstop, shrink-wrap, phantom generators, scipy bridge, profiling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adorym_tpu.ops import propagate as prop
from adorym_tpu.ops.image import (generate_ring, generate_shell,
                                  generate_sphere, ramp_filter)


class TestBackprop:
    def test_backprop_inverts_forward_phase(self):
        """Forward then backward multislice through the same (pure-phase)
        object returns the original wave: the conjugate modulation cancels
        the phase and the negative-distance kernels cancel the diffraction
        (``adorym/propagate.py:291-464``)."""
        rng = np.random.default_rng(0)
        n, nz = 32, 5
        delta = (rng.random((1, n, n, nz)) * 1e-6).astype(np.float32)
        beta = np.zeros_like(delta)
        wave = (rng.normal(size=(1, n, n))
                + 1j * rng.normal(size=(1, n, n))).astype(np.complex64)
        fwd = prop.multislice_propagate(jnp.asarray(delta), jnp.asarray(beta),
                                        jnp.asarray(wave), 5000.0, 1e-7)
        # Undo: propagate the exit wave backward through the same object.
        # Note order: forward ends with a modulation; backward starts with
        # the conjugate of the LAST slice.
        back = prop.multislice_propagate(jnp.asarray(delta), jnp.asarray(beta),
                                         fwd, 5000.0, 1e-7, backprop=True)
        np.testing.assert_allclose(np.asarray(back), wave, atol=1e-4)

    def test_backprop_binning_tail(self):
        """With nz % binning != 0 the backward pass puts the short bin
        first (``adorym/propagate.py:381-383``) — check vs an explicit
        transcription."""
        rng = np.random.default_rng(1)
        n, nz, binning = 16, 7, 3
        delta = (rng.random((1, n, n, nz)) * 1e-6).astype(np.float32)
        beta = (rng.random((1, n, n, nz)) * 1e-8).astype(np.float32)
        wave = jnp.ones((1, n, n), jnp.complex64)
        out = prop.multislice_propagate(jnp.asarray(delta), jnp.asarray(beta),
                                        wave, 5000.0, 1e-7, binning=binning,
                                        backprop=True)
        # Reference transcription (negative-z, conj modulation)
        lam = 1240.0 / 5000.0
        k1 = 2 * np.pi / lam
        h = np.exp(1j * np.pi * lam * (-binning) *
                   ((np.fft.fftfreq(n)[:, None]) ** 2
                    + (np.fft.fftfreq(n)[None, :]) ** 2))
        w = np.ones((1, n, n), np.complex64)
        i_slice = nz
        n_steps = int(np.ceil(nz / binning))
        for i_step in range(n_steps):
            step = (nz % binning or binning) if i_step == 0 else binning
            d = delta[..., i_slice - step:i_slice].sum(-1)
            b = beta[..., i_slice - step:i_slice].sum(-1)
            w = w * np.exp(-k1 * b + 1j * k1 * d)
            if i_step < n_steps - 1:
                w = np.fft.ifft2(np.fft.fft2(w) * h)
            i_slice -= step
        np.testing.assert_allclose(np.asarray(out), w, atol=1e-4)


def test_ir_kernel_matches_reference_formula():
    """Parity with an independent transcription of ``get_kernel_ir``
    (``adorym/propagate.py:106-128``), including its un-shifted real-space
    sampling convention."""
    n = 64
    lam, dist, psize = 0.25, 20000.0, 4.0
    h = np.asarray(prop.fresnel_kernel_ir((n, n), (psize, psize), lam, dist))
    size = psize * n
    k = 2 * np.pi / lam
    coords = np.arange(-size / 2, size / 2, psize)
    x, y = np.meshgrid(coords, coords)
    h_ref = (np.exp(1j * k * dist) / (1j * lam * dist)
             * np.exp(1j * k / (2 * dist) * (x ** 2 + y ** 2)))
    h_ref = np.fft.fft2(h_ref)
    np.testing.assert_allclose(h, h_ref.astype(np.complex64), rtol=2e-3,
                               atol=2e-6)


def test_ramp_filter_attenuates_dc():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((4, 8, 32)).astype(np.float32) + 5.0)
    out = np.asarray(ramp_filter(x, axis=2, filter_type='hamming'))
    assert out.shape == x.shape
    # hamming window passes DC at 0.08 weight
    np.testing.assert_allclose(out.mean(), np.asarray(x).mean() * 0.08,
                               rtol=0.1)


def test_beamstop_mask_excludes_pixels():
    from adorym_tpu.models.base import make_beamstop_mask, mismatch_loss
    beamstop = np.ones((8, 8), np.float32)
    beamstop[3:5, 3:5] = 0  # blocked pixels
    mask = make_beamstop_mask(beamstop)
    pred = jnp.ones((2, 8, 8))
    meas = jnp.ones((2, 8, 8)).at[:, 3:5, 3:5].set(100.0)  # garbage behind stop
    loss = mismatch_loss(pred, meas, beamstop_mask=mask)
    assert float(loss) == 0.0
    loss_nomask = mismatch_loss(pred, meas)
    assert float(loss_nomask) > 0


def test_shrink_wrap_shrinks_mask():
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate
    from adorym_tpu.utils.initialize import initialize_probe
    n = 16
    rng = np.random.default_rng(0)
    obj_true = np.zeros((n, n, 1, 2), np.float32)
    obj_true[4:12, 4:12, 0, 0] = 1e-3
    probe = initialize_probe((n, n), 'plane')
    pos = np.array([[0.0, 0.0]])
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(n, n),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', two_d_mode=True),
        train=TrainConfig(minibatch_size=1, learning_rate=1e-5,
                          shrink_cycle=1, shrink_threshold=1e-7))
    data = simulate(cfg, obj_true, probe, pos)
    # Duplicate the single position so an epoch has >1 batch (shrink fires
    # on i_batch > 0).
    data = np.repeat(data, 4, axis=1)
    pos4 = np.repeat(pos, 4, axis=0)
    mask0 = np.ones((n, n, 1), np.float32)
    rec = Reconstructor(cfg, data=data, probe_pos=pos4, probe_init=probe,
                        obj_init=np.zeros_like(obj_true),
                        finite_support_mask=mask0)
    for ep in range(3):
        rec.run_epoch(ep)
    m = np.asarray(rec.finite_support_mask)
    assert m.sum() < mask0.sum()   # shrunk somewhere
    assert np.isfinite(rec.loss_history[-1])


def test_phantom_generators():
    s = generate_sphere((16, 16, 16), 5, anti_aliasing=2)
    assert s.shape == (16, 16, 16)
    assert 0.9 < s.max() <= 1.0
    expected = 4 / 3 * np.pi * 5 ** 3
    assert abs(s.sum() - expected) / expected < 0.1
    sh = generate_shell((16, 16, 16), 5, anti_aliasing=2)
    assert sh.sum() > 0 and sh.min() >= -1e-6
    r = generate_ring((16, 16), 5)
    assert r.sum() > 0


def test_scipy_bridge_newton_cg():
    from adorym_tpu.optim.scipy_bridge import scipy_minimize_object
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.random((12, 6)).astype(np.float32))
    target = jnp.asarray(rng.random(12).astype(np.float32))

    def pred_fn(x):
        return A @ x

    def loss_pred(p):
        return jnp.sum((p - target) ** 2)

    def loss_obj(x):
        return loss_pred(pred_fn(x))

    x = scipy_minimize_object(loss_obj, np.zeros(6, np.float32),
                              method='Newton-CG', pred_fn=pred_fn,
                              loss_pred_fn=loss_pred,
                              options={'maxiter': 50})
    x_opt = np.linalg.lstsq(np.asarray(A), np.asarray(target), rcond=None)[0]
    np.testing.assert_allclose(x, x_opt, atol=1e-3)


def test_profiling_timers():
    from adorym_tpu.utils.profiling import Timers, device_memory_stats
    t = Timers()
    with t.time('a'):
        pass
    with t.time('a'):
        pass
    assert t.count['a'] == 2
    assert 'a:' in t.summary()
    device_memory_stats()  # must not raise


def test_probe_init_types():
    from adorym_tpu.utils.initialize import initialize_probe
    # aperture_defocus: disk aperture Fresnel-defocused
    p = initialize_probe((32, 32), 'aperture_defocus', energy_ev=5000.0,
                         psize_cm=1e-7, aperture_radius=8,
                         probe_defocus_cm=1e-4, beamstop_radius=2)
    assert p.shape == (1, 32, 32, 2) and np.isfinite(p).all()
    mag = np.sqrt(p[0, ..., 0] ** 2 + p[0, ..., 1] ** 2)
    assert mag.max() > 0.1  # light got through

    # ifft: back-estimate from measured magnitudes
    rng = np.random.default_rng(0)
    data = rng.random((5, 32, 32)).astype(np.float32)
    p2 = initialize_probe((32, 32), 'ifft', energy_ev=5000.0, psize_cm=1e-7,
                          data_for_ifft=data)
    assert p2.shape == (1, 32, 32, 2) and np.isfinite(p2).all()

    # supplied + pupil + rescale-to-data-intensity
    mag0 = np.ones((32, 32))
    pupil = np.zeros((32, 32)); pupil[8:24, 8:24] = 1
    p3 = initialize_probe((32, 32), 'supplied',
                          probe_initial=(mag0, np.zeros((32, 32))),
                          pupil_function=pupil, energy_ev=5000.0,
                          psize_cm=1e-7, rescale_intensity=True,
                          data_for_rescale=data[None],
                          raw_data_type='magnitude')
    assert np.isfinite(p3).all()
    assert p3[0, 0, 0, 0] == 0.0       # pupil-masked corner
    assert np.abs(p3[0, 16, 16, 0]) > 0

    # multi-mode expansion adds mode-breaking noise
    p4 = initialize_probe((16, 16), 'plane', n_probe_modes=3, seed=0)
    assert p4.shape == (3, 16, 16, 2)
    assert not np.allclose(p4[0], p4[1])


def test_detect_row_grid_ragged():
    """Ragged-aware row-grid detection (the mesh layouts' gate for
    real-scan tables whose last row is partial)."""
    from adorym_tpu.ops.patches import detect_row_grid, detect_row_grid_ragged

    def grid(rows, cols, s=4, drop=0):
        ys, xs = np.meshgrid(np.arange(rows) * s, np.arange(cols) * s,
                             indexing='ij')
        pos = np.stack([ys.ravel(), xs.ravel()], -1).astype(float)
        return pos[:len(pos) - drop]

    probe = (8, 8)
    # Divisible table: both agree; n_last == mb.
    assert detect_row_grid(grid(4, 4), 4, probe) == 4
    assert detect_row_grid_ragged(grid(4, 4), 4, probe) == (4, 4)
    # Ragged final row: strict declines, ragged reports the tail count.
    assert detect_row_grid(grid(4, 4, drop=3), 4, probe) is None
    assert detect_row_grid_ragged(grid(4, 4, drop=3), 4, probe) == (4, 1)
    assert detect_row_grid_ragged(grid(4, 4, drop=2), 4, probe) == (4, 2)
    # Tail breaking the stride declines both.
    pos = grid(4, 4, drop=2)
    pos[-1, 1] += 1
    assert detect_row_grid_ragged(pos, 4, probe) is None
    # Tail on a different y declines.
    pos = grid(4, 4, drop=2)
    pos[-1, 0] += 1
    assert detect_row_grid_ragged(pos, 4, probe) is None
    # No full rows at all declines.
    assert detect_row_grid_ragged(grid(1, 4, drop=2), 4, probe) is None
    # Stride must divide the probe width.
    assert detect_row_grid_ragged(grid(4, 4, s=3), 4, probe) is None
