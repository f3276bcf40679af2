"""Second-order object optimizers: Curveball (Gauss-Newton) and CG.

Redesign of ``CurveballOptimizer`` / ``CGOptimizer`` + the line searches
(``adorym/optimizers.py:486-705``, ``adorym/linesearch.py``).  The
reference builds Gauss-Newton-vector products by composing autograd
``make_vjp``/``make_jvp``/``make_hvp`` closures host-side
(``adorym/differentiator.py:44-78``); here the same GVP is three lines of
``jax.jvp``/``jax.vjp`` and the whole update — including the Armijo
backtracking loop — compiles into the training step
(``lax.while_loop``), so line-search loss evaluations never leave the
device.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Gauss-Newton-vector product
# ---------------------------------------------------------------------------

def make_gvp(pred_fn: Callable, loss_pred_fn: Callable, obj):
    """Return (gvp, full_grad, pred) for the Gauss-Newton curvature
    ``J^T H J`` at ``obj``.

    ``pred_fn(obj) -> magnitudes``; ``loss_pred_fn(pred) -> scalar`` (the
    data-mismatch term only — the reference's HVP is with respect to the
    prediction, so regularizers drop out,
    ``adorym/differentiator.py:66-69``).
    """
    pred, jvp_to_pred = jax.linearize(pred_fn, obj)
    vjp_from_pred = jax.vjp(pred_fn, obj)[1]
    loss_grad_fn = jax.grad(loss_pred_fn)

    def hvp(v):
        return jax.jvp(loss_grad_fn, (pred,), (v,))[1]

    def gvp(v):
        return vjp_from_pred(hvp(jvp_to_pred(v)))[0]

    full_grad = vjp_from_pred(loss_grad_fn(pred))[0]
    return gvp, full_grad, pred


# ---------------------------------------------------------------------------
# Curveball
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CurveballSpec:
    alpha: float = 1.0
    lmbda_init: float = 1.0
    lmbda_factor: float = 0.999   # trust-region adaptation rate


def curveball_init(obj) -> Dict:
    return {'z': jnp.zeros_like(obj), 'lmbda': jnp.asarray(1.0, jnp.float32)}


def curveball_step(pred_fn, loss_pred_fn, loss_obj_fn, obj, state,
                   spec: CurveballSpec = CurveballSpec()):
    """One Curveball update (``adorym/optimizers.py:506-590``):

      dz   = GVP(z) + lambda z + grad
      (beta, rho) from the 2x2 subspace system
      z   <- rho z - beta dz;  obj <- obj + alpha z
      lambda adapted from the quadratic-model fit ratio gamma.
    """
    z, lmbda = state['z'], state['lmbda']
    gvp, g, pred = make_gvp(pred_fn, loss_pred_fn, obj)
    loss_0 = loss_pred_fn(pred)

    gz = gvp(z)
    dz = gz + lmbda * z + g
    gdz = gvp(dz)

    def dot(a, b):
        return jnp.sum(a * b)

    a11 = dot(dz, gdz) + lmbda * dot(dz, dz)
    a12 = dot(z, gdz) + lmbda * dot(z, dz)
    a22 = dot(z, gz) + lmbda * dot(z, z)
    b1 = dot(g, dz)
    b2 = dot(g, z)
    A = jnp.asarray([[a11, a12], [a12, a22]])
    b = jnp.asarray([[b1], [b2]])
    p = -jnp.linalg.pinv(A) @ b
    beta, rho = -p[0, 0], p[1, 0]

    z_new = rho * z - beta * dz
    obj_new = obj + spec.alpha * z_new

    # Trust-region lambda update (``adorym/optimizers.py:582-590``).
    loss_1 = loss_obj_fn(obj_new)
    d_quad = -0.5 * jnp.sum((jnp.linalg.pinv(A) @ b) * b)
    gamma = (loss_1 - loss_0) / jnp.where(d_quad == 0, 1.0, d_quad)
    lmbda_new = jnp.where(gamma > 1.5, lmbda * spec.lmbda_factor,
                          jnp.where(gamma < 0.5, lmbda / spec.lmbda_factor,
                                    lmbda))
    return obj_new, {'z': z_new, 'lmbda': lmbda_new}, loss_0


# ---------------------------------------------------------------------------
# Conjugate gradient + Armijo line search
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CGSpec:
    initial_stepsize: float = 10.0
    contraction_factor: float = 0.5
    optimism: float = 2.0
    suff_decr: float = 1e-4
    stepsize_threshold_low: float = 1e-10
    maxiter: int = 16
    normalize_alpha: bool = True


def cg_init(obj) -> Dict:
    return {'s': jnp.zeros_like(obj),
            'g_old': jnp.zeros_like(obj),
            'alpha_suggested': jnp.asarray(0.0, jnp.float32),
            'first': jnp.asarray(True)}


def _armijo_search(loss_obj_fn, obj, s, g, f0, alpha0, spec: CGSpec):
    """Backtracking Armijo line search as a ``lax.while_loop``
    (``adorym/linesearch.py:106-200``).  Returns (newx, newf, alpha,
    step_count)."""
    df0 = jnp.sum(s * g)

    def body(carry):
        alpha, _, _, count = carry
        alpha = jnp.where(count == 0, alpha, alpha * spec.contraction_factor)
        newf = loss_obj_fn(obj + alpha * s)
        return alpha, newf, df0, count + 1

    def cond(carry):
        alpha, newf, _, count = carry
        not_done = newf > f0 + spec.suff_decr * alpha * df0
        return jnp.logical_and(
            jnp.logical_or(count == 0, jnp.logical_and(
                not_done, alpha > spec.stepsize_threshold_low)),
            count <= spec.maxiter)

    alpha, newf, _, count = jax.lax.while_loop(
        cond, body, (alpha0, jnp.asarray(jnp.inf, jnp.float32), df0,
                     jnp.asarray(0, jnp.int32)))
    ok = newf <= f0
    newx = jnp.where(ok, 1.0, 0.0) * (obj + alpha * s) \
        + jnp.where(ok, 0.0, 1.0) * obj
    return newx, jnp.where(ok, newf, f0), jnp.where(ok, alpha, 0.0), count


def cg_step(loss_obj_fn, obj, g, f0, state, spec: CGSpec = CGSpec()):
    """One Polak-Ribiere CG update with adaptive line search
    (``adorym/optimizers.py:606-705``)."""
    d = -g
    d_old = -state['g_old']
    beta_num = jnp.sum(d * (d - d_old))
    beta_den = jnp.sum(d_old * d_old)
    beta = jnp.where(state['first'], 0.0,
                     jnp.maximum(beta_num / jnp.where(beta_den == 0, 1.0,
                                                      beta_den), 0.0))
    s = d + beta * state['s']
    # Fall back to steepest descent if not a descent direction
    # (``adorym/optimizers.py:676-678``).
    s = jnp.where(jnp.sum(s * g) >= 0, d, s)

    s_norm = jnp.sqrt(jnp.sum(s * s))
    alpha_default = (spec.initial_stepsize / jnp.maximum(s_norm, 1e-30)
                     if spec.normalize_alpha else
                     jnp.asarray(spec.initial_stepsize, jnp.float32))
    alpha0 = jnp.where(state['alpha_suggested'] > 0,
                       state['alpha_suggested'], alpha_default)

    newx, newf, alpha, count = _armijo_search(loss_obj_fn, obj, s, g, f0,
                                              alpha0, spec)

    # Step-size suggestion for next call (``adorym/linesearch.py:180-190``):
    # 1 eval -> push luck; 2 evals -> keep pace; more -> recover.
    suggested = jnp.where(count == 2, alpha, spec.optimism * alpha)
    new_state = {'s': s, 'g_old': g,
                 'alpha_suggested': suggested.astype(jnp.float32),
                 'first': jnp.asarray(False)}
    return newx, new_state, newf
