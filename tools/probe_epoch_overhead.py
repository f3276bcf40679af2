#!/usr/bin/env python
"""Split per-ANGLE compute from per-EPOCH fixed cost in the fused path.

bench.py times ``run_epoch`` per call; each call pays the epoch program's
dispatch + the losses D2H fetch once.  With few angles per epoch that
fixed cost is a large per-angle tax (at 4 angles, a 28 ms round trip is
7 ms/angle — the gap between the phase-sum and the bench number).  This
probe runs the SAME flagship epoch at two angle counts and solves

    T(n) = a * n + c

for the per-angle cost ``a`` and the per-epoch constant ``c``.

Usage: python tools/probe_epoch_overhead.py [--n1 4] [--n2 16] [--bf16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

N_OBJ = 256
N_PROBE = 72
MINIBATCH = 23
BINNING = 8


def epoch_times(n_theta, bf16, reps):
    import jax.numpy as jnp  # noqa: F401
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.recon import Reconstructor

    cfg = ReconConfig(
        geometry=Geometry(obj_size=(N_OBJ, N_OBJ, N_OBJ),
                          probe_size=(N_PROBE, N_PROBE),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', binning=BINNING),
        train=TrainConfig(minibatch_size=MINIBATCH, learning_rate=1e-7,
                          optimizer='adam', rotate_out_of_loop=True,
                          update_scheme='per angle',
                          fused_multislice='auto', run_bfloat16=bf16))
    xs = np.arange(23) * 8 - 4
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float64)
    rng = np.random.default_rng(0)
    data = rng.random((n_theta, len(pos), N_PROBE, N_PROBE)).astype(
        np.float32)
    theta_ls = np.linspace(0, np.pi, n_theta, endpoint=False)
    obj0 = np.zeros((N_OBJ, N_OBJ, N_OBJ, 2), np.float32)
    rec = Reconstructor(cfg, data=data, probe_pos=pos, theta_ls=theta_ls,
                        obj_init=obj0)
    rec.run_epoch(0)  # compile
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        rec.run_epoch(1 + r)
        ts.append(time.perf_counter() - t0)
    del rec
    return ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n1', type=int, default=4)
    ap.add_argument('--n2', type=int, default=16)
    ap.add_argument('--reps', type=int, default=9)
    ap.add_argument('--bf16', action='store_true')
    args = ap.parse_args()

    # Two builds only — each flagship epoch program is a multi-minute
    # compile on the remote pool, so the A/B/A interleave is a luxury;
    # the pool-drift caveat applies to the split below.
    t1a = epoch_times(args.n1, args.bf16, args.reps)
    t2 = epoch_times(args.n2, args.bf16, args.reps)
    t1b = []

    def med(xs):
        s = sorted(xs)
        return s[len(s) // 2]

    m1 = med(t1a + t1b)
    m2 = med(t2)
    n1, n2 = args.n1, args.n2
    a = (m2 - m1) / (n2 - n1)
    c = m1 - a * n1
    pps = MINIBATCH * 23
    print(f'epoch medians: T({n1})={m1*1e3:.1f} ms  T({n2})={m2*1e3:.1f} ms')
    print(f'  per-angle a = {a*1e3:.2f} ms  -> {pps / a:.0f} patterns/s')
    print(f'  per-epoch c = {c*1e3:.2f} ms '
          f'({c / m1 * 100:.0f}% of the {n1}-angle epoch)')
    print(f'  raw n1: {[round(t*1e3,1) for t in t1a + t1b]}')
    print(f'  raw n2: {[round(t*1e3,1) for t in t2]}')


if __name__ == '__main__':
    main()
