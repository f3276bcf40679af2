"""Checkpoint / resume.

Replaces the reference's mixture of ``checkpoint.txt`` + per-mode ``.npy``
object dumps + per-optimizer moment files + pickled parameter dicts
(``adorym/misc.py:179-211``, ``adorym/optimizers.py:143-188,779-791``) with
one atomic ``.npz`` per checkpoint holding the full params pytree, optimizer
state, and loop counters (arrays gather to host on fetch).

``use_orbax=True`` switches to an orbax/tensorstore checkpoint instead: no
host gather — each device writes its own shards — which is the TPU-native
replacement for the reference's parallel-HDF5 ``shared_file`` persistence
(``adorym/array_ops.py:62-73``).  Restore auto-detects which format is
present.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _flatten(tree: Dict[str, Any], prefix: str = '',
             convert: bool = True) -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        key = f'{prefix}{k}'
        if isinstance(v, dict):
            flat.update(_flatten(v, key + '/', convert))
        else:
            # convert=False keeps (possibly sharded) jax.Arrays as-is so
            # orbax writes per-device shards without a host gather.
            flat[key] = np.asarray(v) if convert else v
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
                    extra: Optional[Dict[str, Any]] = None,
                    use_orbax: bool = False):
    """Atomic checkpoint write (write tmp, rename) matching the reference's
    cadence semantics (``adorym/misc.py:179-195``).  With ``use_orbax``,
    arrays may be (sharded) ``jax.Array``s and are written shard-by-shard
    through tensorstore instead of being gathered into one npz."""
    os.makedirs(folder, exist_ok=True)
    payload = {'__i_epoch': np.asarray(i_epoch),
               '__i_batch': np.asarray(i_batch)}
    payload.update(_flatten(params, 'params/', convert=not use_orbax))
    payload.update(_flatten(opt_state, 'state/', convert=not use_orbax))
    if extra:
        payload.update(_flatten(extra, 'extra/'))
    if use_orbax:
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(folder, 'orbax'))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
        # Orbax commits (atomic rename + metadata) on a background thread;
        # close() blocks until the checkpoint is durable — the same
        # guarantee the npz tmp+rename path gives.
        ckptr.close()
        return path
    tmp = os.path.join(folder, 'checkpoint.npz.tmp')
    final = os.path.join(folder, 'checkpoint.npz')
    with open(tmp, 'wb') as f:
        np.savez(f, **payload)
    os.replace(tmp, final)
    return final


def restore_checkpoint(folder: str):
    """Returns (params, opt_state, i_epoch, i_batch, extra) or None if no
    checkpoint exists (``adorym/misc.py:198-211``).  Auto-detects the orbax
    or npz format (orbax preferred when both exist)."""
    opath = os.path.join(folder, 'orbax')
    npath = os.path.join(folder, 'checkpoint.npz')
    if os.path.isdir(opath):
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(os.path.abspath(opath))
        flat = {k: np.asarray(v) for k, v in restored.items()}
    elif os.path.exists(npath):
        with np.load(npath, allow_pickle=False) as z:
            flat = {k: z[k] for k in z.files}
    else:
        return None
    i_epoch = int(flat.pop('__i_epoch'))
    i_batch = int(flat.pop('__i_batch'))
    tree = _unflatten(flat)
    return (tree.get('params', {}), tree.get('state', {}), i_epoch, i_batch,
            tree.get('extra', {}))
