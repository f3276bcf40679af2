"""First-order optimizers as pure (init, apply) transforms.

Redesign of the reference's stateful ``Optimizer`` hierarchy
(``adorym/optimizers.py:32-485``): state is a pytree threaded through the
jitted step, so the same code serves every distribution mode — sharded state
simply inherits the parameter's sharding, which subsumes the reference's
three per-mode storage containers (``adorym/optimizers.py:79-94``).

Per-parameter optimizer instances with individual learning rates (the
reference's per-variable wiring, ``adorym/optimizers.py:793-958``) are
expressed by keeping a dict of specs keyed like the params pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OptSpec:
    """Static optimizer hyperparameters for one parameter leaf."""
    kind: str = 'adam'               # adam | momentum | gd
    step_size: float = 1e-3
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-7                # reference default (adorym/optimizers.py:275)
    gamma: float = 0.9               # momentum decay
    dynamic_rate: bool = True        # GD step-halving schedule
    first_downrate_iteration: int = 92


def opt_init(spec: OptSpec, param) -> Dict[str, Any]:
    """State for one leaf; shapes follow the (possibly sharded) param."""
    if spec.kind == 'adam':
        return {'m': jnp.zeros_like(param), 'v': jnp.zeros_like(param)}
    if spec.kind == 'momentum':
        return {'v': jnp.zeros_like(param)}
    if spec.kind == 'gd':
        return {}
    raise ValueError(f'unknown optimizer kind {spec.kind}')


def _gd_step_size(spec: OptSpec, i_batch):
    """GD dynamic halving (``adorym/optimizers.py:453-461``): the step is
    halved whenever ``i_batch`` crosses ``f*(2^n - 1)`` for n = 1, 2, ...
    Closed form so it works with a traced ``i_batch``."""
    if not spec.dynamic_rate:
        return spec.step_size
    f = float(spec.first_downrate_iteration)
    n = jnp.floor(jnp.log2(jnp.maximum(i_batch - 1, 0) / f + 1.0))
    return spec.step_size * 0.5 ** jnp.maximum(n, 0.0)


def opt_apply(spec: OptSpec, param, grad, state: Dict[str, Any], i_batch):
    """One update for one leaf.  ``i_batch`` may be traced.

    Math matches the reference exactly:
      adam:     ``adorym/optimizers.py:309-320`` (bias-corrected, eps after
                sqrt)
      momentum: ``adorym/optimizers.py:400-402`` (velocity = gamma*v +
                lr*g; x -= v)
      gd:       ``adorym/optimizers.py:453-462``
    """
    if spec.kind == 'adam':
        m = spec.b1 * state['m'] + (1 - spec.b1) * grad
        v = spec.b2 * state['v'] + (1 - spec.b2) * grad * grad
        t = i_batch + 1
        mhat = m / (1 - spec.b1 ** t)
        vhat = v / (1 - spec.b2 ** t)
        param = param - spec.step_size * mhat / (jnp.sqrt(vhat) + spec.eps)
        return param, {'m': m, 'v': v}
    if spec.kind == 'momentum':
        v = spec.gamma * state['v'] + spec.step_size * grad
        return param - v, {'v': v}
    if spec.kind == 'gd':
        return param - _gd_step_size(spec, i_batch) * grad, state
    raise ValueError(f'unknown optimizer kind {spec.kind}')


def tree_init(specs: Dict[str, OptSpec], params: Dict[str, Any]):
    """Optimizer state for every leaf that has a spec."""
    return {k: opt_init(specs[k], params[k]) for k in specs}


def tree_apply(specs: Dict[str, OptSpec], params: Dict[str, Any],
               grads: Dict[str, Any], states: Dict[str, Any], i_batch,
               update_mask: Optional[Dict[str, Any]] = None):
    """Apply per-leaf updates.  ``update_mask[k]`` (a traced bool) gates the
    update of leaf ``k`` — used for probe update delay windows
    (``adorym/optimizers.py:1023``) and per-angle update schemes without
    retracing."""
    new_params = dict(params)
    new_states = dict(states)
    for k, spec in specs.items():
        p, s = opt_apply(spec, params[k], grads[k], states[k], i_batch)
        if update_mask is not None and k in update_mask:
            gate = update_mask[k]
            p = jax.tree.map(lambda new, old: jnp.where(gate, new, old), p, params[k])
            s = jax.tree.map(lambda new, old: jnp.where(gate, new, old), s, states[k])
        new_params[k] = p
        new_states[k] = s
    return new_params, new_states
