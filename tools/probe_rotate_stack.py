#!/usr/bin/env python
"""Corner-STACKED rotation gathers (VERDICT r3 task 3: rotation is
INDEX/descriptor-bound, not bandwidth-bound).

The bilinear rotation gathers 4 corners with 4 separate advanced-index
gathers, each descriptor moving a [Y,2] (~2 KB) contiguous vector; the
hypothesis is that XLA:TPU's gather is bound by per-index descriptor
rate.  Variants build a corner-stacked SOURCE (neighbors materialized
next to each other) so fewer gathers with bigger slices move the same
math:

  A: 4 corner gathers of vol[..., Y, 2]           (production)
  B: 2 gathers of a z-neighbor-paired vol2 [X, zb, 2, Y, 2]
  C: 1 gather of a 4-corner vol4 [X, zb, 2, 2, Y, 2]

Semantics: the mapped-z rotate-back (rotate_expanded_from_binned_z) at
flagship shapes — source [Y, X, zb, 2] binned, output full-res
[Y, X, nz, 2].  Values asserted equal to the production path.

Usage: python tools/probe_rotate_stack.py [--n 256] [--binning 8]
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
        return out, jnp.sum(out[:, 0, ::7, 0].astype(jnp.float32))

    def call(*args):
        out, s = wrapped(*args)
        float(s)
        return out

    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=256)
    ap.add_argument('--binning', type=int, default=8)
    ap.add_argument('--reps', type=int, default=7)
    ap.add_argument('--theta', type=float, default=0.9)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from adorym_tpu.ops.rotate import (_rotation_source_coords,
                                       rotate_expanded_from_binned_z)

    n, b = args.n, args.binning
    zb = n // b
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.random((n, n, zb, 2), np.float32))
    theta = args.theta

    # A: production
    fa = fence(lambda x: rotate_expanded_from_binned_z(x, theta, b, n))

    c1, c2 = _rotation_source_coords((n, n), jnp.asarray(theta, jnp.float32))
    s1 = n

    def corner_indices():
        cc1 = jnp.clip(c1, 0.0, s1 - 1.0)
        cc2 = jnp.clip(c2, 0.0, n - 1.0)
        f1 = jnp.floor(cc1)
        f2 = jnp.floor(cc2)
        w1 = cc1 - f1
        w2 = cc2 - f2
        i1 = f1.astype(jnp.int32)
        i2 = f2.astype(jnp.int32)
        i1c = jnp.minimum(i1 + 1, s1 - 1)
        i2c = jnp.minimum(i2 + 1, n - 1)
        return i1, i1c, i2 // b, i2c // b, w1, w2

    def build_vol2(x):
        # [Y, X, zb, 2] -> z-neighbor pairs [Y, X, zb, 2(k2), 2]
        nxt = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
        return jnp.stack([x, nxt], axis=3)

    def variant_b(x):
        i1, i1c, i2b, i2bc, w1, w2 = corner_indices()
        db = (i2bc - i2b).ravel()
        v2 = build_vol2(x)                       # [Y, X, zb, 2, 2]
        vt = jnp.transpose(v2, (1, 2, 3, 0, 4))  # [X, zb, 2, Y, 2]
        a1 = i1.ravel()
        a1c = i1c.ravel()
        bz = i2b.ravel()
        gf = vt[a1, bz]                          # [P, 2, Y, 2]
        gc = vt[a1c, bz]
        dbx = db[:, None, None].astype(vt.dtype)
        w1f = w1.ravel()[:, None, None]
        w2f = w2.ravel()[:, None, None]
        top = gf[:, 0] * (1 - w2f) + (gf[:, 0] * (1 - dbx)
                                      + gf[:, 1] * dbx) * w2f
        bot = gc[:, 0] * (1 - w2f) + (gc[:, 0] * (1 - dbx)
                                      + gc[:, 1] * dbx) * w2f
        out = top * (1 - w1f) + bot * w1f        # [P, Y, 2]
        out = out.reshape(n, n, n, 2)            # [X, nz, Y, 2]
        return jnp.transpose(out, (2, 0, 1, 3))

    def variant_c(x):
        i1, i1c, i2b, i2bc, w1, w2 = corner_indices()
        da = (i1c - i1).ravel()
        db = (i2bc - i2b).ravel()
        v2 = build_vol2(x)                       # [Y, X, zb, 2, 2]
        nxt1 = jnp.concatenate([v2[:, 1:], v2[:, -1:]], axis=1)
        v4 = jnp.stack([v2, nxt1], axis=2)       # [Y, X, 2(k1), zb, 2(k2), 2]
        vt = jnp.transpose(v4, (1, 3, 2, 4, 0, 5))  # [X, zb, 2, 2, Y, 2]
        G = vt[i1.ravel(), i2b.ravel()]          # [P, 2, 2, Y, 2]
        dax = da[:, None, None].astype(vt.dtype)
        dbx = db[:, None, None].astype(vt.dtype)
        w1f = w1.ravel()[:, None, None]
        w2f = w2.ravel()[:, None, None]
        wff = (1 - w1f) * (1 - w2f)
        wfc = (1 - w1f) * w2f
        wcf = w1f * (1 - w2f)
        wcc = w1f * w2f
        u00 = wff + wfc * (1 - dbx) + wcf * (1 - dax) \
            + wcc * (1 - dax) * (1 - dbx)
        u01 = wfc * dbx + wcc * (1 - dax) * dbx
        u10 = wcf * dax + wcc * dax * (1 - dbx)
        u11 = wcc * dax * dbx
        out = (G[:, 0, 0] * u00 + G[:, 0, 1] * u01
               + G[:, 1, 0] * u10 + G[:, 1, 1] * u11)
        out = out.reshape(n, n, n, 2)
        return jnp.transpose(out, (2, 0, 1, 3))

    fb = fence(variant_b)
    fc = fence(variant_c)

    ya = fa(g)
    yb = fb(g)
    yc = fc(g)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(ya),
                               rtol=1e-5, atol=1e-6)

    import jax.numpy as jnp2
    tiny = jnp2.zeros((8,), jnp2.float32)
    jt = fence(lambda x: (x + 1.0).reshape(1, 1, 8, 1))
    jt(tiny)
    ta, tb, tc, fl = [], [], [], []
    for _ in range(args.reps):
        t0 = time.perf_counter(); jt(tiny)
        fl.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter(); fa(g)
        ta.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter(); fb(g)
        tb.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter(); fc(g)
        tc.append((time.perf_counter() - t0) * 1e3)
    f = np.median(fl)
    print(f'floor {f:.2f} ms')
    for name, t in (('A 4-gather prod', ta), ('B 2-gather pairs', tb),
                    ('C 1-gather quad', tc)):
        print(f'{name}: {np.median(np.asarray(t) - f):7.2f} ms '
              f'({[round(x - f, 1) for x in t]})')


if __name__ == '__main__':
    main()
