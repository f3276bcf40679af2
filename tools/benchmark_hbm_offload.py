#!/usr/bin/env python
"""Demonstrate the single-chip beyond-HBM-state ceiling with offloaded
optimizer moments.

Runs one epoch of multislice ptychotomography at a given object size with
or without ``offload_optimizer_state``.  Measured on a v5e (15.75G HBM),
2026-08:

  704^3 (obj 2.6G, params+moments 7.8G):
    nooffload  -> OOM at compile ("Used 16.57G of 15.75G hbm")
    offload    -> runs (chunked rotation bounds the gather temporaries;
                  moments stream from pinned host memory slab-by-slab)
  768^3: OOM either way at 17.7G — the remaining copies are the object
    param + rotated object + gradient accumulator + adjoint, i.e. the
    transient working set, not optimizer state.
  offload-object (round 3): the object ITSELF also lives in pinned host
    memory as y-slabs, driven as per-slab jit calls — 1024^3 (object
    8.2G + Adam moments 24.6G, 32.8G total vs 15.75G HBM) trains end to
    end; steady-state epoch (2 angles x 3200 patterns) 53 s on the axon
    tunnel (the per-angle 3x-object host traffic runs at the tunnel's
    ~1 GB/s; datacenter PCIe is an order of magnitude faster).

  python tools/benchmark_hbm_offload.py offload --n 704
  python tools/benchmark_hbm_offload.py offload-object --n 1024
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('mode', choices=['offload', 'nooffload',
                                    'offload-object'])
    p.add_argument('--n', type=int, default=704)
    p.add_argument('--pn', type=int, default=72)
    p.add_argument('--epochs', type=int, default=2)
    args = p.parse_args(argv)

    from adorym_tpu.config import (Geometry, ParallelConfig, ReconConfig,
                                   TrainConfig)
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate
    from adorym_tpu.utils.initialize import initialize_probe
    from adorym_tpu.utils.profiling import device_memory_stats

    n, pn = args.n, args.pn
    obj_off = args.mode == 'offload-object'
    off = args.mode == 'offload' or obj_off
    if obj_off:
        # Row-grid scan table (stride divides the probe) so the
        # patch-granular fast path — required by offload_object — engages;
        # each minibatch is one grid row.
        stride = pn // 3
        xs = np.arange(0, n - pn + 1, stride)
        mb = len(xs)
    else:
        stride = max(1, (n - pn) // 3)
        xs = np.arange(0, n - pn + 1, stride)
        mb = 8
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float64)
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                          energy_ev=5000., psize_cm=1e-7,
                          free_prop_cm='inf', binning=8),
        train=TrainConfig(minibatch_size=mb, learning_rate=1e-7,
                          rotate_out_of_loop=True,
                          update_scheme='per angle'),
        parallel=ParallelConfig(offload_optimizer_state=off,
                                offload_object=obj_off))
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.,
                             psize_cm=1e-7, probe_mag_sigma=20,
                             probe_phase_sigma=20, probe_phase_max=0.3)
    theta = np.linspace(0, np.pi, 2, endpoint=False)
    if obj_off:
        # Synthetic measurements: a full-resolution simulation forward
        # would itself need the beyond-HBM machinery being demonstrated.
        rng = np.random.default_rng(0)
        data = rng.random((len(theta), len(pos), pn, pn),
                          dtype=np.float32) * 1e-2
    else:
        data = simulate(cfg, np.zeros((n, n, n, 2), np.float32), probe,
                        pos, theta)
    import time
    t0 = time.time()
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        theta_ls=theta,
                        obj_init=np.zeros((n, n, n, 2), np.float32))
    if obj_off:
        assert rec._obj_offloaded, 'offload_object did not engage'
    print(f'init {time.time() - t0:.0f}s', flush=True)
    loss = None
    for ep in range(args.epochs):
        t0 = time.time()
        loss = rec.run_epoch(ep)
        print(f'epoch {ep}: loss={loss:.3e} {time.time() - t0:.0f}s '
              f'({len(pos) * len(theta) / (time.time() - t0):.0f} '
              'patterns/s)', flush=True)
    stats = device_memory_stats()
    obj_mb = n ** 3 * 8 / 2 ** 20
    extra = (f" in_use={stats['bytes_in_use_mb']:.0f}MB "
             f"peak={stats['peak_bytes_mb']:.0f}MB" if stats else '')
    print(f'mode={args.mode} n={n} obj={obj_mb:.0f}MB '
          f'state={3 * obj_mb:.0f}MB loss={loss:.3e}{extra}')


if __name__ == '__main__':
    main()
