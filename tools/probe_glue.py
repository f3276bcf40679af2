#!/usr/bin/env python
"""Measure the XLA glue at the Pallas multislice boundary.

The db kernels stream z-major planes ``[zb, B, py, px]`` while the patch
stack lives z-minor ``[B, py, px, zb, 2]`` (the lane-flattened layout the
band gather/scatter kernels require).  The bridge is XLA transposes:

  fwd:  delta_z = moveaxis(s[..., 0], -1, 0); beta_z = moveaxis(s[..., 1], ...)
  bwd:  ds = stack([moveaxis(gd, 0, -1), moveaxis(gb, 0, -1)], -1)

This probe times the current two-output form against a single packed
transpose ``[zb, 2, B, py, px]`` (one pass over the bytes if XLA's
multi-output fusion is NOT already doing that), plus the bf16-vs-f32 and
cast-fused variants, to size the glue-removal lever before touching the
kernels.

Usage: python tools/probe_glue.py [--b 529] [--zb 32] [--p 72]
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
        s = sum(jnp.sum(jnp.real(l[(0,) * (l.ndim - 1)]).astype(jnp.float32))
                for l in leaves)
        return out, s

    def call(*args):
        out, s = wrapped(*args)
        float(s)
        return out

    return call


def timeit(call, *args, reps=7):
    call(*args)
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        call(*args)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=529)
    ap.add_argument('--zb', type=int, default=32)
    ap.add_argument('--p', type=int, default=72)
    ap.add_argument('--reps', type=int, default=7)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B, zb, p = args.b, args.zb, args.p
    rng = np.random.default_rng(0)
    s16 = jnp.asarray(rng.random((B, p, p, zb, 2), np.float32),
                      jnp.bfloat16)
    s32 = s16.astype(jnp.float32)
    gd = jnp.asarray(rng.random((zb, B, p, p), np.float32), jnp.bfloat16)
    gb = jnp.asarray(rng.random((zb, B, p, p), np.float32), jnp.bfloat16)
    gpk = jnp.stack([gd, gb], 1)  # [zb, 2, B, p, p]

    tiny = jnp.zeros((8,), jnp.float32)
    rtt = timeit(fence(lambda x: x + 1.0), tiny, reps=max(10, args.reps))

    res = {}
    # Current fwd glue: split + two moveaxis (bf16 in, bf16 out).
    res['fwd split2 bf16'] = timeit(fence(
        lambda s: (jnp.moveaxis(s[..., 0], -1, 0),
                   jnp.moveaxis(s[..., 1], -1, 0))), s16, reps=args.reps)
    # Candidate: one packed transpose.
    res['fwd packed bf16'] = timeit(fence(
        lambda s: jnp.moveaxis(s, (3, 4), (0, 1))), s16, reps=args.reps)
    # With the f32->bf16 cast fused in (the pre-extract path already casts,
    # but the non-bf16-extract path pays it here).
    res['fwd split2 f32->bf16'] = timeit(fence(
        lambda s: (jnp.moveaxis(s[..., 0], -1, 0).astype(jnp.bfloat16),
                   jnp.moveaxis(s[..., 1], -1, 0).astype(jnp.bfloat16))),
        s32, reps=args.reps)
    res['fwd packed f32->bf16'] = timeit(fence(
        lambda s: jnp.moveaxis(s, (3, 4), (0, 1)).astype(jnp.bfloat16)),
        s32, reps=args.reps)

    # Current bwd glue: two moveaxis + stack.
    res['bwd stack2 bf16'] = timeit(fence(
        lambda a, b: jnp.stack([jnp.moveaxis(a, 0, -1),
                                jnp.moveaxis(b, 0, -1)], -1)),
        gd, gb, reps=args.reps)
    # Candidate: one packed transpose back.
    res['bwd packed bf16'] = timeit(fence(
        lambda g: jnp.moveaxis(g, (0, 1), (3, 4))), gpk, reps=args.reps)

    bytes_one_way = B * p * p * zb * 2 * 2
    print(f'\n[{B},{p},{p},{zb},2] bf16 = {bytes_one_way/1e6:.0f} MB '
          f'on {jax.devices()[0].platform} '
          f'(floor {rtt:.1f} ms subtracted; r+w floor at 819 GB/s = '
          f'{2*bytes_one_way/819e9*1e3:.2f} ms):')
    for k, v in res.items():
        print(f'  {k:>22}: {max(0.0, v - rtt):7.2f} ms')


if __name__ == '__main__':
    main()
