"""Object-prior regularizers.

Pure-function redesign of ``adorym/regularizers.py``: each regularizer is a
small dataclass with a jit-friendly ``__call__(obj, weight_l1=None)``
returning a scalar.  Stateful pieces of the reference (the reweighted-L1
weight refresh, ``adorym/ptychography.py:994-1000``) live in the driver as
explicit arrays threaded through the loss.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp

from ..ops.image import (image_gradient, pearson_corr_along_last,
                         total_variation_3d)


@dataclasses.dataclass(frozen=True)
class Regularizer:
    unknown_type: str = 'delta_beta'

    def __call__(self, obj, weight_l1=None, axis_offset=0):
        return 0.0


def _mag_phase_channels(obj, unknown_type):
    c0 = obj[..., 0]
    c1 = obj[..., 1]
    if unknown_type == 'real_imag':
        return jnp.sqrt(c0 ** 2 + c1 ** 2), jnp.arctan2(c1, c0)
    return c0, c1


@dataclasses.dataclass(frozen=True)
class L1Regularizer(Regularizer):
    """``adorym/regularizers.py:18-47``."""
    alpha_d: float = 0.0
    alpha_b: float = 0.0

    def __call__(self, obj, weight_l1=None, axis_offset=0):
        reg = 0.0
        if self.unknown_type == 'delta_beta':
            if self.alpha_d:
                reg = reg + self.alpha_d * jnp.mean(jnp.abs(obj[..., 0]))
            if self.alpha_b:
                reg = reg + self.alpha_b * jnp.mean(jnp.abs(obj[..., 1]))
        else:
            om, ph = _mag_phase_channels(obj, 'real_imag')
            if self.alpha_d:
                reg = reg + self.alpha_d * jnp.mean(jnp.abs(om - jnp.mean(om)))
            if self.alpha_b:
                reg = reg + self.alpha_b * jnp.mean(jnp.abs(ph))
        return reg


@dataclasses.dataclass(frozen=True)
class ReweightedL1Regularizer(Regularizer):
    """``adorym/regularizers.py:49-84``.  ``weight_l1`` has the object's
    shape; the driver refreshes it every ``update_interval`` batches as
    ``1 / (|obj| + eps)`` (``adorym/ptychography.py:994-1000``)."""
    alpha_d: float = 0.0
    alpha_b: float = 0.0

    def __call__(self, obj, weight_l1=None, axis_offset=0):
        assert weight_l1 is not None, 'ReweightedL1 needs weight_l1'
        reg = 0.0
        if self.unknown_type == 'delta_beta':
            if self.alpha_d:
                reg = reg + self.alpha_d * jnp.mean(weight_l1[..., 0] * jnp.abs(obj[..., 0]))
            if self.alpha_b:
                reg = reg + self.alpha_b * jnp.mean(weight_l1[..., 1] * jnp.abs(obj[..., 1]))
        else:
            om, ph = _mag_phase_channels(obj, 'real_imag')
            wm = weight_l1[..., 0] ** 2 + weight_l1[..., 1] ** 2
            if self.alpha_d:
                reg = reg + self.alpha_d * jnp.mean(wm * jnp.abs(om - jnp.mean(om)))
            if self.alpha_b:
                reg = reg + self.alpha_b * jnp.mean(wm * jnp.abs(ph))
        return reg


@dataclasses.dataclass(frozen=True)
class TVRegularizer(Regularizer):
    """``adorym/regularizers.py:86-110``."""
    gamma: float = 0.0

    def __call__(self, obj, weight_l1=None, axis_offset=0):
        if self.unknown_type == 'delta_beta':
            o1, o2 = obj[..., 0], obj[..., 1]
        else:
            r, i = obj[..., 0], obj[..., 1]
            o1, o2 = r ** 2 + i ** 2, jnp.arctan2(i, r)
        return self.gamma * (total_variation_3d(o1, axis_offset)
                             + total_variation_3d(o2, axis_offset))


@dataclasses.dataclass(frozen=True)
class CorrRegularizer(Regularizer):
    """Inter-slice Pearson correlation (``adorym/regularizers.py:113-138``)."""
    gamma: float = 0.0

    def __call__(self, obj, weight_l1=None, axis_offset=0):
        o1, o2 = _mag_phase_channels(obj, self.unknown_type)
        return self.gamma * (pearson_corr_along_last(o1)
                             + pearson_corr_along_last(o2))


@dataclasses.dataclass(frozen=True)
class GradCorrRegularizer(Regularizer):
    """Correlation of per-slice gradient maps
    (``adorym/regularizers.py:141-168``)."""
    gamma: float = 0.0

    def __call__(self, obj, weight_l1=None, axis_offset=0):
        o1, o2 = _mag_phase_channels(obj, self.unknown_type)
        nd = o1.ndim
        axes = (nd - 3, nd - 2)
        g1 = image_gradient(o1, axes)
        g2 = image_gradient(o2, axes)
        return self.gamma * (pearson_corr_along_last(g1)
                             + pearson_corr_along_last(g2))


def total_regularization(reg_list: Sequence[Regularizer], obj,
                         weight_l1=None, axis_offset=0):
    reg = 0.0
    for r in reg_list:
        reg = reg + r(obj, weight_l1=weight_l1, axis_offset=axis_offset)
    return reg
