"""Optimizer tests: transform math vs reference semantics, and CG /
Curveball end-to-end on a small ptychography problem."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
from adorym_tpu.optim import OptSpec, opt_apply, opt_init
from adorym_tpu.optim.second_order import (CGSpec, cg_init, cg_step,
                                           curveball_init, curveball_step,
                                           make_gvp)
from adorym_tpu.recon import Reconstructor
from adorym_tpu.simulate import simulate
from adorym_tpu.utils.initialize import initialize_probe


class TestFirstOrder:
    def test_adam_matches_reference_math(self):
        """Reference Adam: adorym/optimizers.py:309-320 (eps after sqrt)."""
        rng = np.random.default_rng(0)
        x = rng.random(10).astype(np.float32)
        spec = OptSpec(kind='adam', step_size=0.01)
        state = opt_init(spec, jnp.asarray(x))
        m = np.zeros(10)
        v = np.zeros(10)
        xr = x.copy()
        xa = jnp.asarray(x)
        for i in range(5):
            g = rng.random(10).astype(np.float32) - 0.5
            xa, state = opt_apply(spec, xa, jnp.asarray(g), state, i)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mhat = m / (1 - 0.9 ** (i + 1))
            vhat = v / (1 - 0.999 ** (i + 1))
            xr = xr - 0.01 * mhat / (np.sqrt(vhat) + 1e-7)
        np.testing.assert_allclose(np.asarray(xa), xr, rtol=1e-5)

    def test_gd_halving_schedule(self):
        """Closed-form halving vs the reference's loop
        (adorym/optimizers.py:453-461)."""
        spec = OptSpec(kind='gd', step_size=1.0, dynamic_rate=True,
                       first_downrate_iteration=92)

        def ref_step(i_batch):
            step = 1.0
            threshold = 92
            i = 1
            while threshold < i_batch:
                threshold += 92 * 2 ** i
                i += 1
                step /= 2.0
            return step

        x0 = jnp.ones(1)
        g = jnp.ones(1)
        for i_batch in [0, 1, 91, 92, 93, 100, 275, 276, 277, 640, 645, 2000]:
            out, _ = opt_apply(spec, x0, g, {}, jnp.asarray(i_batch))
            got = float(x0[0] - out[0])
            assert got == pytest.approx(ref_step(i_batch), rel=1e-6), i_batch

    def test_momentum(self):
        spec = OptSpec(kind='momentum', step_size=0.1, gamma=0.9)
        x = jnp.zeros(3)
        state = opt_init(spec, x)
        g = jnp.ones(3)
        x, state = opt_apply(spec, x, g, state, 0)
        np.testing.assert_allclose(np.asarray(x), -0.1)
        x, state = opt_apply(spec, x, g, state, 1)
        np.testing.assert_allclose(np.asarray(x), -0.1 - 0.19, rtol=1e-6)


class TestGVP:
    def test_gvp_equals_dense_gauss_newton(self):
        """GVP(v) must equal J^T H J v computed densely on a tiny problem."""
        rng = np.random.default_rng(1)
        Amat = jnp.asarray(rng.random((6, 4)).astype(np.float32))
        target = jnp.asarray(rng.random(6).astype(np.float32))

        def pred_fn(x):
            return jnp.tanh(Amat @ x)

        def loss_pred(p):
            return jnp.sum((p - target) ** 4)  # non-trivial Hessian

        x0 = jnp.asarray(rng.random(4).astype(np.float32))
        gvp, full_grad, pred = make_gvp(pred_fn, loss_pred, x0)

        J = jax.jacobian(pred_fn)(x0)
        H = jax.hessian(loss_pred)(pred_fn(x0))
        G = J.T @ H @ J
        v = jnp.asarray(rng.random(4).astype(np.float32))
        np.testing.assert_allclose(np.asarray(gvp(v)), np.asarray(G @ v),
                                   rtol=1e-4)
        g_ref = jax.grad(lambda x: loss_pred(pred_fn(x)))(x0)
        np.testing.assert_allclose(np.asarray(full_grad), np.asarray(g_ref),
                                   rtol=1e-4)

    def test_curveball_on_quadratic(self):
        """On a linear-least-squares problem Curveball should converge in a
        few steps (it is exact Newton there up to the lambda damping)."""
        rng = np.random.default_rng(2)
        # Scale so the Gauss-Newton curvature dominates the lambda=1
        # damping (the reference also starts at lambda=1 and adapts by
        # 0.999/step — tiny problems with ~0.1-scale Hessians would take
        # thousands of steps).
        Amat = jnp.asarray(rng.random((8, 5)).astype(np.float32)) * 3.0
        target = jnp.asarray(rng.random(8).astype(np.float32))

        def pred_fn(x):
            return Amat @ x

        def loss_pred(p):
            return jnp.sum((p - target) ** 2)

        def loss_obj(x):
            return loss_pred(pred_fn(x))

        x = jnp.zeros(5)
        state = curveball_init(x)
        for _ in range(40):
            x, state, _ = curveball_step(pred_fn, loss_pred, loss_obj, x,
                                         state)
        x_opt = jnp.linalg.lstsq(Amat, target)[0]
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_opt),
                                   atol=5e-3)

    def test_cg_on_rosenbrockish(self):
        def loss_obj(x):
            return jnp.sum((x[1:] - x[:-1] ** 2) ** 2) + jnp.sum((1 - x) ** 2)

        x = jnp.zeros(4)
        state = cg_init(x)
        f = loss_obj(x)
        for _ in range(60):
            g = jax.grad(loss_obj)(x)
            x, state, f = cg_step(loss_obj, x, g, loss_obj(x), state)
        assert float(loss_obj(x)) < 1e-2


def _small_problem(optimizer, lr=1e-5, seed=0):
    n, pn = 32, 16
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf',
                          two_d_mode=True),
        # randomize_probe_pos: CG's minibatch line search is sensitive to
        # spot ordering; shuffled batches (as before the flag matched the
        # reference's sequential default) keep it stable on this problem.
        train=TrainConfig(minibatch_size=8, learning_rate=lr,
                          optimizer=optimizer, seed=seed,
                          randomize_probe_pos=True),
    )
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    sm = gaussian_filter(rng.random((n, n, 1)), (3, 3, 0))
    obj_true = np.stack([sm * 2e-3, sm * 5e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=4,
                             probe_phase_sigma=4, probe_phase_max=0.4)
    xs = np.arange(0, n - pn + 1, 4)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    data = simulate(cfg, obj_true, probe, pos)
    return cfg, obj_true, probe, pos, data


class TestEndToEnd:
    @pytest.mark.parametrize('optimizer,lr,n_ep,factor', [
        ('gd', 1e-3, 15, 0.5),
        ('momentum', 1e-4, 15, 0.5),
        ('cg', 1.0, 10, 0.1),
        ('curveball', 1.0, 10, 0.05),
    ])
    def test_optimizer_converges(self, optimizer, lr, n_ep, factor):
        cfg, obj_true, probe, pos, data = _small_problem(optimizer, lr)
        rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                            obj_init=np.zeros_like(obj_true))
        losses = [rec.run_epoch(ep) for ep in range(n_ep)]
        assert np.isfinite(losses[-1])
        assert losses[-1] < losses[0] * factor, (optimizer, losses[0],
                                                 losses[-1])
