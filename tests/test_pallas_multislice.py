"""Fused Pallas multislice kernel vs the lax.scan reference implementation.

Runs in Pallas interpreter mode on CPU; the same kernel compiles via Mosaic
on TPU (exercised by bench.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adorym_tpu.ops import propagate as prop
from adorym_tpu.ops.pallas_multislice import multislice_fused


def make_inputs(S=5, M=2, N=3, n=16, seed=0):
    rng = np.random.default_rng(seed)
    t = (rng.normal(size=(S, N, n, n)) + 1j * rng.normal(size=(S, N, n, n))
         ).astype(np.complex64) * 0.1 + 1.0
    w = (rng.normal(size=(M, N, n, n)) + 1j * rng.normal(size=(M, N, n, n))
         ).astype(np.complex64)
    h = prop.fresnel_kernel((n, n), (1.0, 1.0, 1.0), 0.25, 3.0)
    return jnp.asarray(t), jnp.asarray(w), h


def scan_reference(t, w, h):
    def step(wv, tt):
        return jnp.fft.ifft2(jnp.fft.fft2(wv * tt) * h), None
    wv, _ = jax.lax.scan(step, w, t[:-1])
    return wv * t[-1]


class TestFusedMultislice:
    def test_forward_matches_scan(self):
        t, w, h = make_inputs()
        fused = multislice_fused(t, w, h, True)
        ref = scan_reference(t, w, h)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=1e-4)

    def test_single_step(self):
        t, w, h = make_inputs(S=1)
        fused = multislice_fused(t, w, h, True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(w * t[0]),
                                   atol=1e-5)

    def test_gradients_match_scan(self):
        t, w, h = make_inputs(S=4, M=1, N=2, n=8)
        target = np.random.default_rng(1).normal(size=(1, 2, 8, 8))

        def loss_fused(t, w):
            out = multislice_fused(t, w, h, True)
            return jnp.mean((jnp.abs(out) - target) ** 2)

        def loss_scan(t, w):
            out = scan_reference(t, w, h)
            return jnp.mean((jnp.abs(out) - target) ** 2)

        gt_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(t, w)
        gt_s, gw_s = jax.grad(loss_scan, argnums=(0, 1))(t, w)
        np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_s),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_s),
                                   atol=1e-5)

    def test_mode_broadcast_gradient(self):
        """t's gradient must sum over the probe-mode axis."""
        t, w, h = make_inputs(S=3, M=3, N=2, n=8)

        def loss_fused(t):
            return jnp.sum(jnp.abs(multislice_fused(t, w, h, True)) ** 2)

        def loss_scan(t):
            return jnp.sum(jnp.abs(scan_reference(t, w, h)) ** 2)

        gt_f = jax.grad(loss_fused)(t)
        gt_s = jax.grad(loss_scan)(t)
        np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_s),
                                   atol=1e-4)


class TestMultisliceDB:
    """The modulator-fused kernel with the invertible (no stored
    intermediates) backward: multislice_db vs the unfused scan path.

    At these test sizes the auto-selection would pick the stored variant;
    the fixture drops the switch threshold so every test here exercises the
    INVERTIBLE kernel — the one production selects for >2 GB bf16 chunks."""

    @pytest.fixture(autouse=True)
    def _force_invertible(self, monkeypatch):
        monkeypatch.setattr(prop, 'DB_STORED_MAX_BYTES', -1.0)

    @staticmethod
    def _setup(nz=16, binning=4, M=2, N=5, n=24, seed=0):
        rng = np.random.default_rng(seed)
        delta = jnp.asarray(rng.random((N, n, n, nz), np.float32) * 1e-3)
        beta = jnp.asarray(rng.random((N, n, n, nz), np.float32) * 3e-5)
        wave = jnp.asarray((rng.random((M, N, n, n))
                            + 1j * rng.random((M, N, n, n)))
                           .astype(np.complex64))
        tgt = jnp.asarray(rng.random((M, N, n, n), np.float32))
        return delta, beta, wave, tgt, binning

    @staticmethod
    def _loss(delta, beta, wave, tgt, binning, fused, **kw):
        from adorym_tpu.ops import propagate as prop
        o = prop.multislice_propagate(delta, beta, wave, 5000.0, 1e-7,
                                      binning=binning, fused=fused, **kw)
        return jnp.mean((jnp.abs(o) - tgt) ** 2)

    @pytest.mark.parametrize('nz,binning', [(16, 4), (13, 4), (6, 1)])
    def test_forward_and_grads_match_scan(self, nz, binning):
        """Forward + all three gradients vs the XLA scan path, including a
        short far-side bin (13 % 4) and binning=1."""
        delta, beta, wave, tgt, _ = self._setup(nz=nz, binning=binning)
        g_db = jax.grad(self._loss, argnums=(0, 1, 2))(
            delta, beta, wave, tgt, binning, True)
        g_ref = jax.grad(self._loss, argnums=(0, 1, 2))(
            delta, beta, wave, tgt, binning, False)
        for a, r in zip(g_db, g_ref):
            scale = float(jnp.max(jnp.abs(r))) or 1.0
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(r) / scale, atol=2e-5)

    def test_backprop_direction(self):
        delta, beta, wave, tgt, binning = self._setup()
        g_db = jax.grad(self._loss, argnums=(0, 1))(
            delta, beta, wave, tgt, binning, True, backprop=True)
        g_ref = jax.grad(self._loss, argnums=(0, 1))(
            delta, beta, wave, tgt, binning, False, backprop=True)
        for a, r in zip(g_db, g_ref):
            scale = float(jnp.max(jnp.abs(r))) or 1.0
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(r) / scale, atol=2e-5)

    def test_kappa_gradient_flows(self):
        """beta = kappa * delta outside the kernel: d loss / d kappa must
        match the unfused path (single-material constraint refinement)."""
        delta, beta, wave, tgt, binning = self._setup()

        def loss_k(lg_kappa, fused):
            kappa = 10.0 ** lg_kappa
            return self._loss(delta, beta, wave, tgt, binning, fused,
                              kappa=kappa)

        g_db = jax.grad(loss_k)(jnp.asarray(1.7), True)
        g_ref = jax.grad(loss_k)(jnp.asarray(1.7), False)
        np.testing.assert_allclose(float(g_db), float(g_ref), rtol=1e-4)

    def test_high_absorption_gradient_accuracy(self):
        """The invertible backward reconstructs wavefields via
        ``1/t = exp(+k1*beta)``, amplifying f32 roundoff exponentially with
        per-step absorption.  Validate the documented bound: gradients stay
        within rtol ~1e-4 of the scan path up to k1*beta ~ 3 per binned
        step (the physical regime is orders of magnitude below this)."""
        delta, beta, wave, tgt, binning = self._setup(nz=16, binning=4)
        # psize 1e-7 cm at 5 keV: k1 = 2*pi*dz_nm/lambda_nm ~ 25.3.
        # Scale beta so each binned step (4 slices) absorbs strongly:
        # max k1 * sum_bin(beta) ~ 3.
        k1 = 2 * np.pi * (1e-7 * 1e7) / (1240.0 / 5000.0)
        beta = beta / float(jnp.max(beta)) * (3.0 / k1 / binning)
        g_db = jax.grad(self._loss, argnums=(0, 1, 2))(
            delta, beta, wave, tgt, binning, True)
        g_ref = jax.grad(self._loss, argnums=(0, 1, 2))(
            delta, beta, wave, tgt, binning, False)
        for a, r in zip(g_db, g_ref):
            scale = float(jnp.max(jnp.abs(r))) or 1.0
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(r) / scale, atol=1e-4)


class TestDBVariantSelection:
    """multislice_propagate's stored-vs-invertible switch at
    DB_STORED_MAX_BYTES (``ops/propagate.py``)."""

    @staticmethod
    def _run(monkeypatch, threshold):
        calls = []
        from adorym_tpu.ops import pallas_multislice as pm
        real_db = pm.multislice_db_packed
        real_st = pm.multislice_db_stored_packed
        monkeypatch.setattr(pm, 'multislice_db_packed',
                            lambda *a, **k: calls.append('invertible')
                            or real_db(*a, **k))
        monkeypatch.setattr(pm, 'multislice_db_stored_packed',
                            lambda *a, **k: calls.append('stored')
                            or real_st(*a, **k))
        monkeypatch.setattr(prop, 'DB_STORED_MAX_BYTES', threshold)
        rng = np.random.default_rng(3)
        delta = jnp.asarray(rng.random((2, 8, 8, 6), np.float32) * 1e-3)
        beta = jnp.asarray(rng.random((2, 8, 8, 6), np.float32) * 3e-5)
        wave = jnp.asarray((rng.random((1, 2, 8, 8))
                            + 1j * rng.random((1, 2, 8, 8)))
                           .astype(np.complex64))
        out = prop.multislice_propagate(delta, beta, wave, 5000.0, 1e-7,
                                        binning=2, fused=True)
        return calls, np.asarray(out)

    def test_boundary(self, monkeypatch):
        calls_lo, out_lo = self._run(monkeypatch, -1.0)   # always invertible
        assert calls_lo == ['invertible']
        calls_hi, out_hi = self._run(monkeypatch, 1e18)   # always stored
        assert calls_hi == ['stored']
        np.testing.assert_allclose(out_lo, out_hi, atol=1e-5)


class TestFinalProp:
    """Folding the detector propagation into the kernel's last step
    (``final_prop``): forward and all gradients must match applying
    ``free_space_propagate`` on the exit wave via XLA."""

    @staticmethod
    def _setup(seed=0, N=3, n=16, nz=8, M=2):
        rng = np.random.default_rng(seed)
        delta = jnp.asarray(rng.random((N, n, n, nz), np.float32) * 1e-3)
        beta = jnp.asarray(rng.random((N, n, n, nz), np.float32) * 3e-5)
        wave = jnp.asarray((rng.random((M, N, n, n))
                            + 1j * rng.random((M, N, n, n)))
                           .astype(np.complex64))
        tgt = jnp.asarray(rng.random((M, N, n, n), np.float32))
        return delta, beta, wave, tgt

    @staticmethod
    def _loss(delta, beta, wave, tgt, fused, final_prop, sign, fp, norm):
        from adorym_tpu.constants import wavelength_nm
        o = prop.multislice_propagate(
            delta, beta, wave, 5000.0, 1e-7, binning=2, fused=fused,
            sign_convention=sign,
            final_prop=({'free_prop_cm': fp, 'normalize_fft': norm}
                        if final_prop else None))
        if not final_prop:
            lmbda_nm = wavelength_nm(5000.0)
            o = prop.free_space_propagate(o, fp, lmbda_nm, (1.0, 1.0, 1.0),
                                          sign_convention=sign,
                                          normalize_fft=norm)
        return jnp.mean((jnp.abs(o) - tgt) ** 2), o

    @pytest.mark.parametrize('variant', ['stored', 'invertible'])
    @pytest.mark.parametrize('sign,fp,norm', [
        (1, 'inf', False),        # Fraunhofer, unnormalized
        (1, 'inf', True),         # Fraunhofer, ortho
        (-1, 'inf', False),       # opposite sign convention (ifft2 + shift)
        (1, 1e-4, False),         # finite (near-field): folded Fresnel TF
        (1, None, False),         # identity free prop
    ])
    def test_fold_matches_xla_tail(self, monkeypatch, variant, sign, fp,
                                   norm):
        monkeypatch.setattr(prop, 'DB_STORED_MAX_BYTES',
                            -1.0 if variant == 'invertible' else 1e18)
        delta, beta, wave, tgt = self._setup()

        def run(final_prop):
            (l, o), g = jax.value_and_grad(
                self._loss, argnums=(0, 1, 2), has_aux=True)(
                    delta, beta, wave, tgt, True, final_prop, sign, fp, norm)
            return o, g

        o_fold, g_fold = run(True)
        o_ref, g_ref = run(False)
        sc = float(jnp.max(jnp.abs(o_ref))) or 1.0
        np.testing.assert_allclose(np.asarray(o_fold) / sc,
                                   np.asarray(o_ref) / sc, atol=3e-6)
        for a, r in zip(g_fold, g_ref):
            sc = float(jnp.max(jnp.abs(r))) or 1.0
            np.testing.assert_allclose(np.asarray(a) / sc,
                                       np.asarray(r) / sc, atol=3e-5)

    def test_unfused_paths_apply_xla_tail(self):
        """final_prop on the scan path (fused=False) equals the manual
        tail exactly — same ops, one call site."""
        delta, beta, wave, tgt = self._setup()
        (_, o1), _ = jax.value_and_grad(
            self._loss, argnums=(0,), has_aux=True)(
                delta, beta, wave, tgt, False, True, 1, 'inf', False)
        (_, o2), _ = jax.value_and_grad(
            self._loss, argnums=(0,), has_aux=True)(
                delta, beta, wave, tgt, False, False, 1, 'inf', False)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))

    @pytest.mark.parametrize('n', [8, 9])   # even and odd fftshift
    @pytest.mark.parametrize('sign,norm', [(1, False), (1, True),
                                           (-1, False)])
    def test_final_prop_mats_exact(self, n, sign, norm):
        """(ay, ax) reproduce free_space_propagate as matrices; the
        supplied inverses are exact (unnormalized DFT is not unitary)."""
        ay, ax, ayi, axi = prop.final_prop_mats(
            (n, n), (1.0, 1.0, 1.0), 0.25, 'inf', sign_convention=sign,
            normalize_fft=norm)
        rng = np.random.default_rng(5)
        w = jnp.asarray((rng.random((n, n)) + 1j * rng.random((n, n)))
                        .astype(np.complex64))
        ref = prop.free_space_propagate(w, 'inf', 0.25, (1.0, 1.0, 1.0),
                                        sign_convention=sign,
                                        normalize_fft=norm)
        out = ay @ w @ ax.T
        sc = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(np.asarray(out) / sc,
                                   np.asarray(ref) / sc, atol=2e-6)
        np.testing.assert_allclose(np.asarray(ayi @ ay), np.eye(n),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(axi @ ax), np.eye(n),
                                   atol=2e-6)

    def test_backprop_rejected(self):
        delta, beta, wave, _ = self._setup()
        with pytest.raises(ValueError, match='backprop'):
            prop.multislice_propagate(
                delta, beta, wave, 5000.0, 1e-7, binning=2, fused=False,
                backprop=True,
                final_prop={'free_prop_cm': 'inf', 'normalize_fft': False})


class TestMultisliceDBStored:
    """The modulator-fused kernel with STORED intermediates (the default
    f-mode delta_beta fused kernel) vs the XLA scan path."""

    def test_forward_and_grads_match_scan(self):
        from adorym_tpu.ops import propagate as prop
        from adorym_tpu.ops.pallas_multislice import multislice_db_stored
        from adorym_tpu.ops.fourier import fft2, ifft2
        rng = np.random.default_rng(1)
        S, N, n, M = 6, 4, 16, 2
        d = jnp.asarray(rng.random((S, N, n, n), np.float32) * 1e-2)
        b = jnp.asarray(rng.random((S, N, n, n), np.float32) * 1e-3)
        w = jnp.asarray((rng.random((M, N, n, n))
                         + 1j * rng.random((M, N, n, n)))
                        .astype(np.complex64))
        h = jnp.asarray(np.exp(-1j * np.pi * 0.01 * (
            np.add.outer(np.fft.fftfreq(n) ** 2,
                         np.fft.fftfreq(n) ** 2))).astype(np.complex64))
        k1, s = 1.7, 1.0
        tgt = jnp.asarray(rng.random((M, N, n, n), np.float32))

        def loss_st(d, b, w):
            o = multislice_db_stored(d, b, w, h, k1, s, True)
            return jnp.mean((jnp.abs(o) - tgt) ** 2)

        def loss_ref(d, b, w):
            amp = jnp.exp(-k1 * b)
            ph = -s * k1 * d
            t_all = (amp * jnp.cos(ph)
                     + 1j * amp * jnp.sin(ph)).astype(jnp.complex64)

            def step(wv, t):
                return ifft2(fft2(wv * t[None]) * h), None

            wv, _ = jax.lax.scan(step, w, t_all[:-1])
            return jnp.mean((jnp.abs(wv * t_all[-1][None]) - tgt) ** 2)

        g1 = jax.grad(loss_st, argnums=(0, 1, 2))(d, b, w)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(d, b, w)
        for a, r in zip(g1, g2):
            sc = float(jnp.max(jnp.abs(r))) or 1.0
            np.testing.assert_allclose(np.asarray(a) / sc,
                                       np.asarray(r) / sc, atol=5e-5)


class TestStoredUnroll:
    """Z-unrolling of the stored-db kernels (several z-steps per grid
    cell, ``_pick_unroll``) is BIT-identical to the unroll=1 sweep: the
    steps run in the same order with the same f32 scratch carry — only
    the grid decomposition changes."""

    @staticmethod
    def _run(S, N=3, n=16, M=2, seed=3, variant='stored'):
        import adorym_tpu.ops.pallas_multislice as _pm
        multislice_db_stored = (_pm.multislice_db_stored
                                if variant == 'stored' else _pm.multislice_db)
        rng = np.random.default_rng(seed)
        d = jnp.asarray(rng.random((S, N, n, n), np.float32) * 1e-2)
        b = jnp.asarray(rng.random((S, N, n, n), np.float32) * 1e-3)
        w = jnp.asarray((rng.random((M, N, n, n))
                         + 1j * rng.random((M, N, n, n)))
                        .astype(np.complex64))
        h = jnp.asarray(np.exp(-1j * np.pi * 0.01 * (
            np.add.outer(np.fft.fftfreq(n) ** 2,
                         np.fft.fftfreq(n) ** 2))).astype(np.complex64))
        tgt = jnp.asarray(rng.random((M, N, n, n), np.float32))

        def loss(d, b, w):
            o = multislice_db_stored(d, b, w, h, 1.7, 1.0, True)
            return jnp.mean((jnp.abs(o) - tgt) ** 2)

        out = multislice_db_stored(d, b, w, h, 1.7, 1.0, True)
        grads = jax.grad(loss, argnums=(0, 1, 2))(d, b, w)
        return out, grads

    @pytest.mark.parametrize('variant', ['stored', 'invertible'])
    @pytest.mark.parametrize('S,expected_u', [(8, 4), (6, 2), (5, 1)])
    def test_unrolled_bitwise_equals_u1(self, monkeypatch, S, expected_u,
                                        variant):
        import adorym_tpu.ops.pallas_multislice as pm
        assert pm._pick_unroll(S, 2, 3, 16, 16, 4) == expected_u
        out_u, g_u = self._run(S, variant=variant)
        monkeypatch.setattr(pm, '_pick_unroll',
                            lambda *a, **k: 1)
        out_1, g_1 = self._run(S, variant=variant)
        np.testing.assert_array_equal(np.asarray(out_u), np.asarray(out_1))
        for a, r in zip(g_u, g_1):
            if variant == 'stored':
                np.testing.assert_array_equal(np.asarray(a), np.asarray(r))
            else:
                # The invertible backward's unrolled grads sit one ulp off
                # the u1 sweep (straight-line vs cond-wrapped code contracts
                # fma differently); the op ORDER is identical — forward is
                # still bitwise above.
                sc = float(np.max(np.abs(np.asarray(r)))) or 1.0
                np.testing.assert_allclose(np.asarray(a) / sc,
                                           np.asarray(r) / sc, atol=1e-5)

    def test_pick_unroll_vmem_bound(self):
        """Large streamed blocks (big M / NB / f32) push the picker back
        down to 2 or 1."""
        import adorym_tpu.ops.pallas_multislice as pm
        # Flagship-ish: bf16 planes, M=1, NB=17, 72^2 -> 4.
        assert pm._pick_unroll(32, 1, 17, 72, 72, 2) == 4
        # Same at f32 doubles the streamed bytes -> 2.
        assert pm._pick_unroll(32, 1, 17, 72, 72, 4) == 2
        # Five probe modes at f32 -> streamed blocks too big even at 2.
        assert pm._pick_unroll(32, 5, 17, 72, 72, 4) == 1
        # Indivisible step counts fall straight back to 1.
        assert pm._pick_unroll(31, 1, 17, 72, 72, 2) == 1
