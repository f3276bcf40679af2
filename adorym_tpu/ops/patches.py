"""Probe-footprint patch extraction and scatter.

Replaces the reference's Python loop of fancy slices over scan positions
(``adorym/forward_model.py:314-334``) with a single vmapped
``lax.dynamic_slice`` — one fused XLA gather for the whole minibatch, and its
AD transpose is exactly the scatter-add the reference hand-writes for the
distributed-object path (``adorym/util.py:1006-1102``).

Object layout: ``obj[y, x, z, 2]`` (delta/beta channels last), matching the
reference parameter shape (``README.rst:283-305``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def calculate_pad(obj_size_yx, probe_pos, probe_size) -> np.ndarray:
    """Static padding so that every ``[pos, pos + probe_size)`` window is in
    range.  Host-side, from the full (un-refined) scan-position table —
    mirrors ``calculate_pad_len`` (``adorym/util.py:1374-1406``).

    Returns ``[[top, bottom], [left, right]]`` (int).
    """
    probe_pos = np.asarray(probe_pos)
    pad_arr = np.zeros((2, 2), dtype=np.int64)
    for ax in range(2):
        lo = int(np.floor(probe_pos[:, ax].min()))
        hi = int(np.ceil(probe_pos[:, ax].max())) + int(probe_size[ax])
        if lo < 0:
            pad_arr[ax, 0] = -lo
        if hi > int(obj_size_yx[ax]):
            pad_arr[ax, 1] = hi - int(obj_size_yx[ax])
    return pad_arr


def pad_object(obj, pad_arr, unknown_type='delta_beta'):
    """Pad ``obj[y, x, ...]`` by ``pad_arr`` with vacuum values.

    delta_beta: pad both channels with 0 (vacuum = no material).
    real_imag: pad the real channel with 1 and imag with 0 (vacuum
    transmission = 1+0j) — ``adorym/util.py:1340-1350``.
    """
    if not np.count_nonzero(pad_arr):
        return obj
    pad_width = [tuple(pad_arr[0]), tuple(pad_arr[1])] + [(0, 0)] * (obj.ndim - 2)
    if unknown_type == 'real_imag':
        re = jnp.pad(obj[..., 0], pad_width[:-1], constant_values=1.0)
        im = jnp.pad(obj[..., 1], pad_width[:-1], constant_values=0.0)
        return jnp.stack([re, im], axis=-1)
    return jnp.pad(obj, pad_width, constant_values=0.0)


def extract_patches(obj, positions, probe_size):
    """Extract ``[N, py, px, ...]`` sub-blocks at integer ``positions[N, 2]``.

    ``positions`` may be traced; starts are clamped into range by
    ``dynamic_slice`` semantics (callers pre-pad so this never triggers for
    valid configs).  Trailing axes of ``obj`` (z, channels) ride along whole.
    """
    py, px = int(probe_size[0]), int(probe_size[1])
    trailing = obj.shape[2:]

    def slice_one(pos):
        start = (pos[0], pos[1]) + (0,) * len(trailing)
        return jax.lax.dynamic_slice(obj, start, (py, px) + trailing)

    return jax.vmap(slice_one)(positions.astype(jnp.int32))


def scatter_patches_add(obj, patches, positions):
    """Add ``patches[N, py, px, ...]`` into ``obj`` at ``positions[N, 2]``.

    The explicit transpose of :func:`extract_patches` — used by conventional
    (non-AD) algorithms like ePIE (``adorym/conventional.py:73-87``); the AD
    path gets this for free as the VJP of ``extract_patches``.
    """
    trailing = obj.shape[2:]

    def body(i, acc):
        pos = positions[i].astype(jnp.int32)
        start = (pos[0], pos[1]) + (0,) * len(trailing)
        cur = jax.lax.dynamic_slice(acc, start, patches.shape[1:])
        return jax.lax.dynamic_update_slice(acc, cur + patches[i], start)

    return jax.lax.fori_loop(0, patches.shape[0], body, obj)
