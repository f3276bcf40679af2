"""scipy.optimize bridge for whole-dataset batch optimization.

Redesign of ``ScipyOptimizer`` (``adorym/optimizers.py:706-746``): wraps the
jitted loss/grad/GVP in numpy-flat callables for
``scipy.optimize.minimize``.  As in the reference, this is meant for
single-minibatch (full-batch) problems where CG/Newton-CG convergence
theory actually applies.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def scipy_minimize_object(loss_obj_fn: Callable, obj0, method='CG',
                          options: Optional[dict] = None,
                          pred_fn: Optional[Callable] = None,
                          loss_pred_fn: Optional[Callable] = None,
                          step_size: float = 1.0):
    """Minimize ``loss_obj_fn(obj)`` over the object with scipy.

    ``pred_fn``/``loss_pred_fn`` enable the Gauss-Newton ``hessp`` used by
    Newton-CG / trust-region methods (``adorym/optimizers.py:738-744``).
    Returns the optimized object array.
    """
    import scipy.optimize

    shape = obj0.shape
    loss_jit = jax.jit(loss_obj_fn)
    grad_jit = jax.jit(jax.grad(loss_obj_fn))

    def fun(x):
        return float(loss_jit(jnp.asarray(x.reshape(shape), jnp.float32)))

    def jac(x):
        g = grad_jit(jnp.asarray(x.reshape(shape), jnp.float32))
        return np.asarray(g, np.float64).ravel() * step_size

    hessp = None
    if pred_fn is not None and loss_pred_fn is not None:
        from .second_order import make_gvp

        @jax.jit
        def gvp_at(x, v):
            gvp, _, _ = make_gvp(pred_fn, loss_pred_fn, x)
            return gvp(v)

        def hessp(x, p):
            out = gvp_at(jnp.asarray(x.reshape(shape), jnp.float32),
                         jnp.asarray(p.reshape(shape), jnp.float32))
            return np.asarray(out, np.float64).ravel()

    res = scipy.optimize.minimize(fun, np.asarray(obj0, np.float64).ravel(),
                                  method=method, jac=jac, hessp=hessp,
                                  options=options)
    return np.asarray(res.x, np.float32).reshape(shape)
