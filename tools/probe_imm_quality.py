#!/usr/bin/env python
"""Phantom-recovery quality of the IMMEDIATE scheme's two backwards at
chosen scale: ``imm_grad_rotation='exact'`` vs ``'interp'``.

The small-scale CPU drives measured a REAL quality cost for the interp
approximation (32^3: corr 0.61 vs 0.82; 64^3: 0.83 vs 0.93 — NOTES
#15).  This probe runs the same comparison at flagship-class resolution
on the TPU, where the interpolation error should be far smaller (finer
grid).

Usage: python tools/probe_imm_quality.py [--n 256] [--angles 48]
       [--epochs 8] [--bf16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=256)
    ap.add_argument('--probe', type=int, default=72)
    ap.add_argument('--binning', type=int, default=8)
    ap.add_argument('--angles', type=int, default=48)
    ap.add_argument('--epochs', type=int, default=8)
    ap.add_argument('--lr', type=float, default=2e-6)
    ap.add_argument('--bf16', action='store_true')
    args = ap.parse_args()

    from scipy.ndimage import gaussian_filter
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate
    from adorym_tpu.utils.initialize import initialize_probe

    n, pn = args.n, args.probe
    rng = np.random.default_rng(0)
    sm = gaussian_filter(rng.random((n, n, n)).astype(np.float32),
                         n / 20).astype(np.float32)
    sm = (sm - sm.min()) / (sm.max() - sm.min())
    obj_true = np.stack([sm * 1e-3, sm * 3e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=20,
                             probe_phase_sigma=20, probe_phase_max=0.3)
    xs = np.arange(23) * 8 - 4                      # the bench scan
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float64)
    theta_ls = np.linspace(0, np.pi, args.angles, endpoint=False)
    geo = Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                   energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf',
                   binning=args.binning)
    t0 = time.time()
    data = simulate(ReconConfig(geometry=geo,
                                train=TrainConfig(minibatch_size=23)),
                    obj_true, probe, pos, theta_ls)
    data = np.asarray(data)
    print(f'simulated {data.shape} in {time.time() - t0:.0f}s',
          flush=True)
    truth = obj_true[..., 0].ravel()
    out = {}
    for mode in ('exact', 'interp'):
        cfg = ReconConfig(
            geometry=geo,
            train=TrainConfig(minibatch_size=23, learning_rate=args.lr,
                              update_scheme='immediate',
                              imm_grad_rotation=mode,
                              fused_multislice='auto',
                              run_bfloat16=args.bf16))
        rec = Reconstructor(cfg, data=data, probe_pos=pos,
                            probe_init=probe, theta_ls=theta_ls,
                            obj_init=np.zeros_like(obj_true))
        t0 = time.time()
        hist = rec.run_epochs(args.epochs)
        dt = time.time() - t0
        o = np.asarray(rec.obj[..., 0]).ravel()
        c = float(np.corrcoef(o, truth)[0, 1])
        out[mode] = o
        print(f'{mode:7s}: corr-to-phantom {c:.4f}  loss '
              f'{hist[0]:.3e} -> {hist[-1]:.3e}  ({dt:.0f}s)',
              flush=True)
    cross = float(np.corrcoef(out['exact'], out['interp'])[0, 1])
    print(f'cross-correlation exact vs interp: {cross:.4f}')


if __name__ == '__main__':
    main()
