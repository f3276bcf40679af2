"""Golden-value tests for the propagation core.

Validates against an independent numpy transcription of the reference
formulas (``adorym/propagate.py``) — not against reference code — plus
analytic invariants (energy conservation, forward/backward inversion).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from adorym_tpu.constants import wavelength_nm
from adorym_tpu.ops import propagate as prop
from adorym_tpu.ops.fourier import fourier_shift


def np_fresnel_kernel(shape, voxel_nm, lmbda_nm, dist_nm, sign=1):
    """Independent numpy Fresnel TF kernel per adorym/propagate.py:62-72."""
    u = np.fft.fftfreq(shape[0])[:, None] / voxel_nm[0]
    v = np.fft.fftfreq(shape[1])[None, :] / voxel_nm[1]
    return np.exp(-sign * 1j * np.pi * lmbda_nm * dist_nm * (u ** 2 + v ** 2))


def np_multislice(delta, beta, wave, energy_ev, psize_cm, binning=1, sign=1):
    """Independent numpy multislice per adorym/propagate.py:131-288."""
    lmbda_nm = 1240.0 / energy_ev
    voxel_nm = np.array([psize_cm] * 3) * 1e7
    dz = voxel_nm[2]
    k1 = 2 * np.pi * dz / lmbda_nm
    nz = delta.shape[-1]
    n_steps = int(np.ceil(nz / binning))
    h = np_fresnel_kernel(wave.shape[-2:], voxel_nm, lmbda_nm, dz * binning, sign)
    for i_step in range(n_steps):
        i0 = i_step * binning
        step = min(binning, nz - i0)
        d = delta[..., i0:i0 + step].sum(-1)
        b = beta[..., i0:i0 + step].sum(-1)
        wave = wave * np.exp(-k1 * b - sign * 1j * k1 * d)
        if i_step < n_steps - 1:
            if step == binning:
                wave = np.fft.ifft2(np.fft.fft2(wave) * h)
            else:
                h2 = np_fresnel_kernel(wave.shape[-2:], voxel_nm, lmbda_nm, dz * step, sign)
                wave = np.fft.ifft2(np.fft.fft2(wave) * h2)
    return wave


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestFresnelKernel:
    def test_matches_reference_formula(self):
        shape = (64, 64)
        voxel = (1.0, 1.0, 1.0)
        lam = wavelength_nm(5000.0)
        for sign in (1, -1):
            h = prop.fresnel_kernel(shape, voxel, lam, 2000.0, sign_convention=sign)
            ref = np_fresnel_kernel(shape, voxel, lam, 2000.0, sign)
            # float32 phase accumulation over ~1e3 rad -> ~1e-5 wrap error
            np.testing.assert_allclose(np.asarray(h), ref, atol=1e-4)

    def test_unitary(self):
        h = prop.fresnel_kernel((32, 32), (1.0, 1.0), 0.25, 500.0)
        np.testing.assert_allclose(np.abs(np.asarray(h)), 1.0, atol=1e-6)

    def test_full_propagator_masks_evanescent(self):
        # At low energy/large freq, 1 - lambda^2 (u^2+v^2) < 0 for corner modes.
        h = prop.fresnel_kernel((64, 64), (1.0, 1.0), 3.0, 100.0,
                                fresnel_approx=False)
        h = np.asarray(h)
        assert np.any(h == 0)
        nonzero = h[h != 0]
        np.testing.assert_allclose(np.abs(nonzero), 1.0, atol=1e-6)


class TestFresnelPropagate:
    def test_energy_conserved(self, rng):
        wave = (rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32))).astype(np.complex64)
        out = prop.fresnel_propagate(jnp.asarray(wave), 1000.0, 0.25, (1.0, 1.0, 1.0))
        np.testing.assert_allclose(np.sum(np.abs(np.asarray(out)) ** 2),
                                   np.sum(np.abs(wave) ** 2), rtol=1e-4)

    def test_forward_backward_identity(self, rng):
        wave = (rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32))).astype(np.complex64)
        fwd = prop.fresnel_propagate(jnp.asarray(wave), 800.0, 0.25, (1.0, 1.0, 1.0))
        back = prop.fresnel_propagate(fwd, -800.0, 0.25, (1.0, 1.0, 1.0))
        np.testing.assert_allclose(np.asarray(back), wave, atol=1e-4)

    def test_gaussian_spreads(self):
        # A focused Gaussian should broaden on propagation.
        n = 128
        y, x = np.mgrid[:n, :n] - n / 2
        wave = np.exp(-(x ** 2 + y ** 2) / (2 * 3.0 ** 2)).astype(np.complex64)
        out = np.asarray(prop.fresnel_propagate(jnp.asarray(wave), 5e4, 0.25, (1.0, 1.0, 1.0)))
        inten = np.abs(out) ** 2
        w_out = np.sqrt((inten * (x ** 2 + y ** 2)).sum() / inten.sum())
        inten0 = np.abs(wave) ** 2
        w_in = np.sqrt((inten0 * (x ** 2 + y ** 2)).sum() / inten0.sum())
        assert w_out > 1.5 * w_in


class TestMultislice:
    @pytest.mark.parametrize('binning', [1, 2, 3])
    @pytest.mark.parametrize('sign', [1, -1])
    def test_matches_numpy_reference(self, rng, binning, sign):
        N, n, nz = 2, 32, 7
        delta = (rng.random((N, n, n, nz)) * 1e-6).astype(np.float32)
        beta = (rng.random((N, n, n, nz)) * 1e-8).astype(np.float32)
        wave = (rng.normal(size=(N, n, n)) + 1j * rng.normal(size=(N, n, n))).astype(np.complex64)
        out = prop.multislice_propagate(
            jnp.asarray(delta), jnp.asarray(beta), jnp.asarray(wave),
            energy_ev=5000.0, psize_cm=1e-7, binning=binning,
            sign_convention=sign)
        ref = np_multislice(delta, beta, wave, 5000.0, 1e-7, binning, sign)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_vacuum_object_is_free_propagation(self, rng):
        """Zero delta/beta => pure chain of Fresnel steps over (nz-1)*dz."""
        n, nz = 32, 5
        wave = (rng.normal(size=(1, n, n)) + 1j * rng.normal(size=(1, n, n))).astype(np.complex64)
        zero = jnp.zeros((1, n, n, nz), dtype=jnp.float32)
        out = prop.multislice_propagate(zero, zero, jnp.asarray(wave),
                                        energy_ev=5000.0, psize_cm=1e-7)
        lam = wavelength_nm(5000.0)
        direct = prop.fresnel_propagate(jnp.asarray(wave), (nz - 1) * 1.0,
                                        lam, (1.0, 1.0, 1.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(direct), atol=1e-5)

    def test_kappa_constraint(self, rng):
        n, nz = 16, 3
        delta = (rng.random((1, n, n, nz)) * 1e-6).astype(np.float32)
        kappa = 0.1
        out_kappa = prop.multislice_propagate(
            jnp.asarray(delta), jnp.zeros_like(jnp.asarray(delta)),
            jnp.ones((1, n, n), jnp.complex64), 5000.0, 1e-7, kappa=kappa)
        out_explicit = prop.multislice_propagate(
            jnp.asarray(delta), jnp.asarray(delta * kappa),
            jnp.ones((1, n, n), jnp.complex64), 5000.0, 1e-7)
        np.testing.assert_allclose(np.asarray(out_kappa),
                                   np.asarray(out_explicit), atol=1e-6)

    def test_real_imag_mode(self, rng):
        n, nz = 16, 4
        tre = rng.random((1, n, n, nz)).astype(np.float32)
        tim = (rng.random((1, n, n, nz)) * 0.1).astype(np.float32)
        wave = jnp.ones((1, n, n), jnp.complex64)
        out = prop.multislice_propagate(jnp.asarray(tre), jnp.asarray(tim),
                                        wave, 5000.0, 1e-7,
                                        unknown_type='real_imag')
        # Independent: modulate by (tre + i tim), propagate between slices.
        lam = 1240.0 / 5000.0
        w_np = np.ones((1, n, n), np.complex64)
        h = np_fresnel_kernel((n, n), (1.0, 1.0), lam, 1.0)
        for i in range(nz):
            w_np = w_np * (tre[..., i] + 1j * tim[..., i])
            if i < nz - 1:
                w_np = np.fft.ifft2(np.fft.fft2(w_np) * h)
        np.testing.assert_allclose(np.asarray(out), w_np, atol=1e-5)

    def test_intermediate_wavefields(self, rng):
        n, nz = 16, 4
        delta = (rng.random((1, n, n, nz)) * 1e-6).astype(np.float32)
        beta = np.zeros_like(delta)
        wave = jnp.ones((1, n, n), jnp.complex64)
        out, inter = prop.multislice_propagate(
            jnp.asarray(delta), jnp.asarray(beta), wave, 5000.0, 1e-7,
            return_intermediate=True)
        assert inter.shape == (nz, 1, n, n)
        np.testing.assert_allclose(np.asarray(inter[0]), np.ones((1, n, n)),
                                   atol=1e-6)


class TestSparseMultislice:
    def test_matches_dense_on_regular_grid(self, rng):
        """Sparse multislice at regular psize spacing == dense multislice."""
        n, nz = 32, 4
        delta = (rng.random((1, n, n, nz)) * 1e-6).astype(np.float32)
        beta = (rng.random((1, n, n, nz)) * 1e-8).astype(np.float32)
        wave = (rng.normal(size=(1, n, n)) + 1j * rng.normal(size=(1, n, n))).astype(np.complex64)
        psize = 1e-7
        slice_pos = jnp.arange(nz) * psize
        sparse = prop.sparse_multislice_propagate(
            jnp.asarray(delta), jnp.asarray(beta), jnp.asarray(wave),
            5000.0, psize, slice_pos)
        dense = prop.multislice_propagate(
            jnp.asarray(delta), jnp.asarray(beta), jnp.asarray(wave),
            5000.0, psize)
        np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                                   atol=1e-5)

    def test_many_slices_scan_matches_unrolled(self, rng, monkeypatch):
        """Above SPARSE_UNROLL_MAX slices the propagator switches to a
        lax.scan (bounded compile time); values and slice-position
        gradients are identical to the unrolled path.  Compared in f64 —
        f32 slice-position gradients carry large cancellation noise (the
        terms are huge oscillatory sums), which would swamp the
        comparison without being an implementation difference."""
        import jax
        n, nz = 16, 20
        with jax.enable_x64(True):
            delta = jnp.asarray(rng.random((1, n, n, nz)) * 1e-6)
            beta = jnp.asarray(rng.random((1, n, n, nz)) * 1e-8)
            wave = jnp.asarray(rng.normal(size=(1, n, n))
                               + 1j * rng.normal(size=(1, n, n)))
            psize = 1e-7
            pos = jnp.asarray(np.arange(nz) * 2.5 * psize)

            def out_mag(pos_v):
                o = prop.sparse_multislice_propagate(
                    delta, beta, wave, 5000.0, psize, pos_v)
                return jnp.sum(jnp.abs(o) ** 2)

            assert nz > prop.SPARSE_UNROLL_MAX
            v_scan, g_scan = jax.value_and_grad(out_mag)(pos)
            monkeypatch.setattr(prop, 'SPARSE_UNROLL_MAX', 100)
            v_unr, g_unr = jax.value_and_grad(out_mag)(pos)
            np.testing.assert_allclose(float(v_scan), float(v_unr),
                                       rtol=1e-12)
            np.testing.assert_allclose(np.asarray(g_scan),
                                       np.asarray(g_unr), rtol=1e-9)


class TestPureProjection:
    def test_minus_logged_returns_beta_sum(self, rng):
        n, nz = 16, 5
        beta = rng.random((1, n, n, nz)).astype(np.float32)
        delta = np.zeros_like(beta)
        wave = jnp.ones((1, n, n), jnp.complex64)
        out = prop.pure_projection_modulate(
            jnp.asarray(delta), jnp.asarray(beta), wave, 5000.0, 1e-7,
            is_minus_logged=True)
        np.testing.assert_allclose(np.asarray(out).real, beta.sum(-1), atol=1e-5)

    def test_phase_modulation(self, rng):
        n, nz = 16, 3
        delta = (rng.random((1, n, n, nz)) * 1e-6).astype(np.float32)
        beta = (rng.random((1, n, n, nz)) * 1e-8).astype(np.float32)
        wave = jnp.ones((1, n, n), jnp.complex64)
        out = prop.pure_projection_modulate(jnp.asarray(delta),
                                            jnp.asarray(beta), wave,
                                            5000.0, 1e-7)
        lam = 1240.0 / 5000.0
        k1 = 2 * np.pi * 1.0 / lam
        expected = np.exp(-k1 * beta.sum(-1) - 1j * k1 * delta.sum(-1))
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


class TestFourierShift:
    def test_integer_shift_equals_roll(self, rng):
        img = (rng.normal(size=(16, 16)) + 1j * rng.normal(size=(16, 16))).astype(np.complex64)
        out = fourier_shift(jnp.asarray(img), jnp.asarray([3.0, -2.0]))
        np.testing.assert_allclose(np.asarray(out), np.roll(img, (3, -2), (0, 1)),
                                   atol=1e-4)

    def test_half_pixel_round_trip(self, rng):
        img = (rng.normal(size=(16, 16)) + 1j * rng.normal(size=(16, 16))).astype(np.complex64)
        out = fourier_shift(fourier_shift(jnp.asarray(img), jnp.asarray([0.5, 0.5])),
                            jnp.asarray([-0.5, -0.5]))
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-4)


class TestFreeSpace:
    def test_inf_is_shifted_fft(self, rng):
        wave = (rng.normal(size=(2, 16, 16)) + 1j * rng.normal(size=(2, 16, 16))).astype(np.complex64)
        out = prop.free_space_propagate(jnp.asarray(wave), 'inf', 0.25, (1.0, 1.0, 1.0))
        ref = np.fft.fftshift(np.fft.fft2(wave), axes=(-2, -1))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)

    def test_none_is_identity(self, rng):
        wave = (rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))).astype(np.complex64)
        out = prop.free_space_propagate(jnp.asarray(wave), None, 0.25, (1.0, 1.0, 1.0))
        np.testing.assert_allclose(np.asarray(out), wave)
