"""Forward-model base: measurement losses and shared prediction plumbing.

Pure-function redesign of ``adorym/forward_model.py:28-162``.  The reference
passes the driver's entire ``locals()`` into each model as ``common_vars``;
here every static comes from a frozen config dataclass and every traced value
from explicit pytrees, so the whole loss is one jittable function of
``(params, batch, measured)``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_jvp
def safe_sqrt(x):
    """sqrt with a clamped derivative at 0.

    The detected magnitude is ``sqrt(sum_m |psi_m|^2)``; where the predicted
    intensity underflows to exactly 0 in float32, the true sqrt derivative is
    infinite and poisons the whole gradient with NaNs.  The reference skirts
    this only by running float64 on CPU.  Forward value is exact; the
    derivative is ``0.5 / max(sqrt(x), 1e-6)``.
    """
    return jnp.sqrt(x)


@safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.sqrt(x)
    return y, dx * 0.5 / jnp.maximum(y, 1e-6)


def mismatch_loss(pred_mag, measured, loss_type='lsq',
                  raw_data_type='magnitude', poisson_multiplier=1.0,
                  beamstop_mask=None, per_item=False):
    """Data-mismatch loss on detected magnitudes.

    Matches ``ForwardModel.get_mismatch_loss`` (``adorym/forward_model.py:88-103``):

      * ``lsq`` + magnitude data: ``mean((pred - |I|)^2)``
      * ``lsq`` + intensity data: ``mean((pred - sqrt(|I|))^2)``
      * ``poisson``: ``mean(pred^2 m - d m log(pred^2 m))`` with
        ``d = |I|^2`` (magnitude data) or ``|I|`` (intensity data).

    ``beamstop_mask``: optional {0,1} float map over detector pixels; loss is
    averaged over unmasked pixels only (``adorym/forward_model.py:121-135``).

    ``per_item=True`` returns the per-pattern pixel means ``[N]`` instead of
    the batch scalar (``mean(per_item(...)) == mismatch_loss(...)``) — used
    by the fused multi-batch gradient path to keep per-batch loss logging.
    """
    measured = jnp.abs(measured)
    if loss_type == 'lsq':
        target = measured if raw_data_type == 'magnitude' else jnp.sqrt(measured)
        per_pixel = (pred_mag - target) ** 2
    elif loss_type == 'poisson':
        m = poisson_multiplier
        d = measured ** 2 if raw_data_type == 'magnitude' else measured
        pred_i = pred_mag ** 2 * m
        per_pixel = pred_i - d * m * jnp.log(jnp.maximum(pred_i, 1e-12))
    else:
        raise ValueError(f'unknown loss_function_type {loss_type}')
    pixel_axes = tuple(range(1, per_pixel.ndim))
    if beamstop_mask is not None:
        mask = beamstop_mask.astype(per_pixel.dtype)
        if per_item:
            return (jnp.sum(per_pixel * mask, axis=pixel_axes)
                    / jnp.sum(mask))
        return jnp.sum(per_pixel * mask) / (jnp.sum(mask) * pred_mag.shape[0])
    if per_item:
        return jnp.mean(per_pixel, axis=pixel_axes)
    return jnp.mean(per_pixel)


def make_beamstop_mask(beamstop) -> Optional[np.ndarray]:
    """Threshold a raw beamstop map into a {0,1} mask
    (``adorym/forward_model.py:121-126``)."""
    if beamstop is None:
        return None
    b = np.asarray(beamstop)
    return (b >= 1e-5).astype(np.float32)


def incoherent_mode_sum(exit_waves):
    """Detected magnitude from per-mode exit waves ``[n_modes, ..., y, x]``:
    ``sqrt(sum_m |psi_m|^2)`` (``adorym/forward_model.py:355-375``)."""
    inten = jnp.sum(jnp.real(exit_waves) ** 2 + jnp.imag(exit_waves) ** 2,
                    axis=0)
    return safe_sqrt(inten)
