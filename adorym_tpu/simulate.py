"""Forward simulation of measurement data.

TPU-native equivalent of ``simulate_ptychography``
(``adorym/simulation.py:38-693``): run the forward model on a known object
and write predictions into an ``exchange/data`` HDF5 file in the reference's
layout, so simulated datasets are interchangeable between frameworks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import functools

from .config import ReconConfig
from .models import ptychography as ptycho_model
from .ops import patches as patch_ops


# params is an ARGUMENT, never a closure: on the axon TPU, large float
# arrays embedded as jit constants come back measurably wrong (~10% at
# 128^2) through the remote AOT compile, silently corrupting simulated
# data.  Module-level so the compilation caches across per-angle
# simulate() calls in the checkpointed path.
@functools.partial(jax.jit,
                   static_argnames=('predict', 'cfg', 'pad', 'return_wave'))
def _fwd(params, theta, i_theta, pos, inds, *, predict, cfg, pad,
         return_wave):
    batch = {'i_theta': i_theta, 'theta': theta, 'pos_batch': pos,
             'ind_batch': inds}
    return predict(params, batch, cfg, np.asarray(pad),
                   return_wave=return_wave)


def simulate(cfg: ReconConfig, obj: np.ndarray, probe: np.ndarray,
             probe_pos: np.ndarray, theta_ls: Optional[np.ndarray] = None,
             return_wave: bool = False, minibatch_size: int = 0,
             model=None) -> np.ndarray:
    """Simulate diffraction data for every (angle, scan position).

    Args:
      obj: ``[y, x, z, 2]`` ground-truth object (delta/beta channels).
      probe: ``[n_modes, py, px, 2]`` probe.
      probe_pos: ``[n_pos, 2]`` scan positions (pixels).
      theta_ls: view angles in rad (default: single zero angle).
      return_wave: write complex exit waves instead of magnitudes (the
        reference's fullfield simulation mode,
        ``adorym/forward_model.py:487-490``).

    Returns ``[n_theta, n_pos, py, px]`` float magnitudes (or complex waves).
    """
    # Simulation runs the bare forward model: disable parameter-refinement
    # branches that would read auxiliary params not present here.
    import dataclasses
    from .config import RefineConfig
    cfg = dataclasses.replace(cfg, refine=RefineConfig())

    obj = np.asarray(obj)
    probe = np.asarray(probe)
    if obj.ndim != 4 or obj.shape[-1] != 2:
        raise ValueError(f'obj must be [y, x, z, 2], got {obj.shape}')
    if probe.ndim != 4 or probe.shape[-1] != 2:
        raise ValueError(
            f'probe must be [n_modes, py, px, 2], got {probe.shape}')
    if theta_ls is None:
        theta_ls = np.zeros(1)
    probe_pos = np.asarray(probe_pos, dtype=np.float64)
    n_pos = len(probe_pos)
    model = model or ptycho_model
    compute_pad = getattr(model, 'compute_pad', None)
    if compute_pad is not None:
        pad_arr = compute_pad(cfg, cfg.geometry.obj_size[:2], probe_pos)
    else:
        pad_arr = patch_ops.calculate_pad(cfg.geometry.obj_size[:2], probe_pos,
                                          cfg.geometry.probe_size)
    params = {'obj': jnp.asarray(obj, jnp.float32),
              'probe': jnp.asarray(probe, jnp.float32)}

    mb = minibatch_size or n_pos
    if not minibatch_size:
        # Cap the default batch so the full-depth patch stack stays modest
        # (~512 MB): one giant batch at flagship scale (529 positions x
        # 256 z) is a 5.6 GB gather per angle.
        per_pos = (int(np.prod(cfg.geometry.probe_size))
                   * cfg.geometry.obj_size[2] * 2 * 4)
        mb = max(1, min(mb, int(512e6 // max(1, per_pos))))

    pad_key = tuple(tuple(int(v) for v in row) for row in pad_arr)
    out = []
    for i_theta, theta in enumerate(theta_ls):
        per_angle = []
        for b0 in range(0, n_pos, mb):
            inds = np.arange(b0, min(b0 + mb, n_pos))
            pred = _fwd(params,
                        jnp.asarray(theta, jnp.float32),
                        jnp.asarray(i_theta, jnp.int32),
                        jnp.asarray(probe_pos[inds], jnp.float32),
                        jnp.asarray(inds, jnp.int32),
                        predict=model.predict, cfg=cfg, pad=pad_key,
                        return_wave=return_wave)
            if return_wave:
                # [n_modes, N, y, x] -> mode 0 complex wave
                pred = pred[0]
            per_angle.append(np.asarray(pred))
        out.append(np.concatenate(per_angle, axis=0))
    return np.stack(out, axis=0)


def simulate_to_file(path: str, cfg: ReconConfig, obj, probe, probe_pos,
                     theta_ls=None, use_checkpoint: bool = False, **kwargs):
    """Simulate and write the reference-layout HDF5 file.

    ``use_checkpoint``: write angle-by-angle with an ``i_theta`` resume
    checkpoint next to the file (``<path>.sim_checkpoint_i_theta.txt``),
    matching ``adorym/simulation.py:474-486`` — killing and restarting a
    long multi-angle simulation continues where it left off.  The
    checkpoint is removed on completion.
    """
    from .io.data import write_data_file
    if not use_checkpoint:
        data = simulate(cfg, obj, probe, probe_pos, theta_ls, **kwargs)
        write_data_file(path, data, theta=theta_ls, probe_pos=probe_pos,
                        energy_ev=cfg.geometry.energy_ev,
                        psize_cm=cfg.geometry.psize_cm,
                        free_prop_cm=(None if isinstance(cfg.geometry.free_prop_cm, str)
                                      else cfg.geometry.free_prop_cm))
        return data

    import os
    import h5py
    if theta_ls is None:
        theta_ls = np.zeros(1)
    ckpt = path + '.sim_checkpoint_i_theta.txt'
    start = 0
    if os.path.exists(ckpt) and os.path.exists(path):
        try:
            start = int(np.loadtxt(ckpt).ravel()[0])
        except Exception:
            start = 0
    if start == 0:
        # Probe one angle to learn the per-angle output shape, then create
        # the full dataset up front so later angles append in place.
        first = simulate(cfg, obj, probe, probe_pos, theta_ls[:1], **kwargs)
        write_data_file(path, np.zeros((len(theta_ls),) + first.shape[1:],
                                       first.dtype),
                        theta=theta_ls, probe_pos=probe_pos,
                        energy_ev=cfg.geometry.energy_ev,
                        psize_cm=cfg.geometry.psize_cm,
                        free_prop_cm=(None if isinstance(cfg.geometry.free_prop_cm, str)
                                      else cfg.geometry.free_prop_cm))
        with h5py.File(path, 'r+') as f:
            f['exchange/data'][0] = first[0]
        start = 1
        np.savetxt(ckpt, [start], fmt='%d')
    for i_theta in range(start, len(theta_ls)):
        per_angle = simulate(cfg, obj, probe, probe_pos,
                             theta_ls[i_theta:i_theta + 1], **kwargs)
        with h5py.File(path, 'r+') as f:
            f['exchange/data'][i_theta] = per_angle[0]
        np.savetxt(ckpt, [i_theta + 1], fmt='%d')
    os.remove(ckpt)
    with h5py.File(path, 'r') as f:
        return f['exchange/data'][...]
