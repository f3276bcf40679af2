#!/usr/bin/env python
"""Interleaved A/B: standard vs Z-MAJOR patch extraction for the fused
delta_beta chunk gradient (VERDICT r3 task 2a — kill the ~3.1 ms
moveaxis prep).

Both variants compute the SAME chunk cotangent in the scatter layout
[N, py, px, zb, 2] from the same binned object:

  std : extract [N,py,px,zb,2] -> grad (kernel prep moveaxis inside)
  zm  : transpose object once -> extract_zmajor [zb,2,N,py,px] -> grad
        (no kernel prep) -> transpose cotangent back

The object transpose is charged to the zm variant (it amortizes once
per angle; at the flagship the whole angle is one chunk, so charging it
fully is the conservative comparison).  Values are asserted identical
to f32 tolerance.

Usage: python tools/probe_zmajor.py [--n 256] [--chunk 529] [--bf16]
                                    [--reps 7]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def fence(fn):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree.leaves(out)
        s = sum(jnp.sum(jnp.real(l[(0,) * (l.ndim - 1)])) for l in leaves)
        return out, s

    def call(*args):
        out, s = wrapped(*args)
        float(s)
        return out

    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=256)
    ap.add_argument('--probe', type=int, default=72)
    ap.add_argument('--binning', type=int, default=8)
    ap.add_argument('--chunk', type=int, default=529)
    ap.add_argument('--reps', type=int, default=7)
    ap.add_argument('--bf16', action='store_true')
    args = ap.parse_args()

    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.models import ptychography as pt
    from adorym_tpu.ops import patches as patch_ops

    n, pn, b = args.n, args.probe, args.binning
    nz_b = n // b
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', binning=b),
        train=TrainConfig(minibatch_size=args.chunk, learning_rate=1e-7,
                          run_bfloat16=args.bf16))

    rng = np.random.default_rng(0)
    obj_b = jnp.asarray(rng.random((n, n, nz_b, 2), np.float32) * 1e-3)
    if args.bf16:
        obj_b = jax.jit(lambda x: x.astype(jnp.bfloat16))(obj_b)
    probe = jnp.asarray(np.stack([np.ones((1, pn, pn), np.float32),
                                  np.zeros((1, pn, pn), np.float32)], -1))
    k = int(round(args.chunk ** 0.5))
    xs = (np.arange(k) * ((n - pn) // max(1, k - 1))).clip(0, n - pn)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1)[:args.chunk]
    pos_d = jnp.asarray(pos, jnp.int32)
    meas = jnp.asarray(rng.random((args.chunk, pn, pn), np.float32))
    batch = {'i_theta': jnp.asarray(0, jnp.int32),
             'theta': jnp.asarray(0.3, jnp.float32),
             'pos_batch': pos_d.astype(jnp.float32),
             'ind_batch': jnp.arange(args.chunk, dtype=jnp.int32)}

    def loss_of(pred):
        return jnp.mean((pred - meas) ** 2)

    def std_variant(ob, pr):
        sub = patch_ops.extract_patches(ob, pos_d, (pn, pn))

        def loss(s):
            return loss_of(pt.predict_from_patches(
                {'probe': pr}, batch, s, cfg, prebinned_z=True))

        return jax.grad(loss)(sub)

    def zm_variant(ob, pr):
        ozx = jnp.transpose(ob, (2, 3, 0, 1))
        sub = patch_ops.extract_patches_zmajor(ozx, pos_d, (pn, pn))

        def loss(s):
            return loss_of(pt.predict_from_patches(
                {'probe': pr}, batch, s, cfg, prebinned_z=True,
                zmajor=True))

        g = jax.grad(loss)(sub)
        return jnp.transpose(g, (2, 3, 4, 0, 1))

    fa = fence(std_variant)
    fb = fence(zm_variant)
    ga = fa(obj_b, probe)
    gb = fb(obj_b, probe)
    np.testing.assert_allclose(np.asarray(ga, np.float32),
                               np.asarray(gb, np.float32),
                               rtol=2e-2 if args.bf16 else 1e-5,
                               atol=1e-9)

    tiny = jnp.zeros((8,), jnp.float32)
    jt = fence(lambda x: x + 1.0)
    jt(tiny)
    ta, tb, floors = [], [], []
    for _ in range(args.reps):
        t0 = time.perf_counter(); jt(tiny)
        floors.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter(); fa(obj_b, probe)
        ta.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter(); fb(obj_b, probe)
        tb.append((time.perf_counter() - t0) * 1e3)
    fl = np.median(floors)
    print(f'dispatch floor {fl:.2f} ms')
    print(f'std extract+grad : {np.median(np.asarray(ta) - fl):7.2f} ms '
          f'(all {[round(x - fl, 1) for x in ta]})')
    print(f'zm  extract+grad : {np.median(np.asarray(tb) - fl):7.2f} ms '
          f'(all {[round(x - fl, 1) for x in tb]})')


if __name__ == '__main__':
    main()
