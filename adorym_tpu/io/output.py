"""Run outputs: TIFF images, loss CSVs, run summaries.

Replaces the reference's dxchange/TIFF output helpers
(``adorym/util.py:1958-2028`` ``output_object``/``output_probe``), per-rank
loss CSVs (``adorym/ptychography.py:768-769,1261``), and ``summary.txt``
(``adorym/misc.py:149-176``) — same output tree so downstream tooling keeps
working:

  output_folder/
    convergence/loss_rank_0.txt     i_epoch,i_batch,loss,time
    intermediate/object/ ...        float32 TIFF stacks
    intermediate/probe/ ...
    summary.txt
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import numpy as np


# ---------------------------------------------------------------------------
# Float32 TIFF I/O (tifffile is not available; PIL mode 'F' handles
# single-channel float TIFFs, multi-page for stacks)
# ---------------------------------------------------------------------------

def write_tiff(arr, path):
    from PIL import Image
    arr = np.asarray(arr, dtype=np.float32)
    path = str(path)
    if not path.endswith(('.tif', '.tiff')):
        path = path + '.tiff'
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if arr.ndim == 2:
        Image.fromarray(arr, mode='F').save(path)
    elif arr.ndim == 3:
        frames = [Image.fromarray(a, mode='F') for a in arr]
        frames[0].save(path, save_all=True, append_images=frames[1:])
    else:
        raise ValueError(f'cannot write {arr.ndim}-D array as TIFF')
    return path


def read_tiff(path) -> np.ndarray:
    from PIL import Image, ImageSequence
    img = Image.open(path)
    frames = [np.asarray(f, dtype=np.float32)
              for f in ImageSequence.Iterator(img)]
    return frames[0] if len(frames) == 1 else np.stack(frames)


# ---------------------------------------------------------------------------
# Object / probe dumps (``adorym/util.py:1958-2028``)
# ---------------------------------------------------------------------------

def output_object(obj, output_folder, unknown_type='delta_beta',
                  ds_level=1, name_suffix=''):
    """Write the object's two channels as TIFF stacks.  delta_beta ->
    delta/beta; real_imag -> magnitude/phase (reference naming)."""
    obj = np.asarray(obj)
    c0, c1 = obj[..., 0], obj[..., 1]
    if unknown_type == 'real_imag':
        mag = np.sqrt(c0 ** 2 + c1 ** 2)
        ph = np.arctan2(c1, c0)
        names = ('obj_mag', 'obj_phase')
        c0, c1 = mag, ph
    else:
        names = ('delta', 'beta')
    paths = []
    for name, ch in zip(names, (c0, c1)):
        # z-major stack for 3D viewing, like the reference's dxchange dumps
        img = np.moveaxis(ch, -1, 0) if ch.ndim == 3 else ch
        paths.append(write_tiff(img, os.path.join(
            output_folder, f'{name}_ds_{ds_level}{name_suffix}')))
    return paths


def output_probe(probe, output_folder, ds_level=1, name_suffix=''):
    """Probe magnitude/phase TIFFs per mode (``adorym/util.py:2009``)."""
    probe = np.asarray(probe)
    if probe.ndim > 4:
        # Per-angle probes [n_theta, n_modes, py, px, 2]: flatten leading
        # axes into TIFF pages.
        probe = probe.reshape((-1,) + probe.shape[-3:])
    pr, pi = probe[..., 0], probe[..., 1]
    mag = np.sqrt(pr ** 2 + pi ** 2)
    ph = np.arctan2(pi, pr)
    return [write_tiff(mag, os.path.join(output_folder,
                                         f'probe_mag_ds_{ds_level}{name_suffix}')),
            write_tiff(ph, os.path.join(output_folder,
                                        f'probe_phase_ds_{ds_level}{name_suffix}'))]


# ---------------------------------------------------------------------------
# Loss CSV + summary
# ---------------------------------------------------------------------------

class LossLogger:
    """Per-rank loss CSV, reference format
    (``convergence/loss_rank_N.txt``: ``i_epoch,i_batch,loss,time``)."""

    def __init__(self, output_folder, rank=0, append=False):
        conv = os.path.join(output_folder, 'convergence')
        os.makedirs(conv, exist_ok=True)
        self.path = os.path.join(conv, f'loss_rank_{rank}.txt')
        # The reference truncates on every run (``adorym/ptychography.py:768``,
        # mode 'w') and loses history across checkpoint resumes; append when
        # resuming instead.
        if append and os.path.exists(self.path):
            self._f = open(self.path, 'a')
        else:
            self._f = open(self.path, 'w')
            self._f.write('i_epoch,i_batch,loss,time\n')
        self._t0 = time.time()

    def log(self, i_epoch, i_batch, loss):
        self._f.write(f'{i_epoch},{i_batch},{loss},{time.time() - self._t0}\n')
        self._f.flush()

    def close(self):
        self._f.close()


def parse_loss_data(output_folder) -> np.ndarray:
    """Average loss curves across rank CSVs
    (``adorym/visualization.py:7-21``)."""
    import glob
    conv = os.path.join(output_folder, 'convergence')
    curves = []
    for p in sorted(glob.glob(os.path.join(conv, 'loss_rank_*.txt'))):
        rows = np.genfromtxt(p, delimiter=',', names=True)
        curves.append(rows['loss'])
    n = min(len(c) for c in curves)
    return np.mean([c[:n] for c in curves], axis=0)


def write_summary(cfg, output_folder, extra: Optional[dict] = None):
    """Dump the full typed config as ``summary.txt``
    (``adorym/misc.py:149-176``)."""
    os.makedirs(output_folder, exist_ok=True)
    path = os.path.join(output_folder, 'summary.txt')
    with open(path, 'w') as f:
        f.write('============== SUMMARY ==============\n')
        for section in dataclasses.fields(cfg):
            sub = getattr(cfg, section.name)
            f.write(f'[{section.name}]\n')
            for field in dataclasses.fields(sub):
                f.write(f'  {field.name} = {getattr(sub, field.name)}\n')
        for k, v in (extra or {}).items():
            f.write(f'{k} = {v}\n')
    return path
