#!/usr/bin/env python
"""Interleaved A/B: 4-corner advanced-indexing gathers vs ONE windowed
lax.gather (slice_sizes=(2,2,Y)) for the bilinear rotation plane sample.

The rotation gather is INDEX-bound (CLAUDE.md): all y-planes share the
same (x,z) sample coordinates, so y already rides the minor axis and each
index fetches a whole y row.  A 2x2 windowed gather fetches all four
bilinear corners per index — 4x fewer indices for the same bytes.  The
window-start clamp (min(floor(c), s-2), w = c - start) is exactly the
boundary weight shift, so results are bit-identical (multiplying by an
exact 0/1 at the clipped edge).

Usage: python tools/probe_rotate_window.py [--n 256] [--rounds 8]
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
    ap.add_argument('--rounds', type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from adorym_tpu.ops.rotate import _rotation_source_coords

    n = args.n
    rng = np.random.default_rng(0)
    vol_np = rng.random((n, n, n), np.float32)
    vol = jnp.asarray(vol_np)          # [y, x, z]
    theta = 0.37

    c1, c2 = _rotation_source_coords((n, n), theta)
    s1 = s2 = n

    def four_gather(v):
        # Mirror of ops/rotate._bilinear_gather_plane for axis-0 rotation.
        cc1 = jnp.clip(c1, 0.0, s1 - 1.0)
        cc2 = jnp.clip(c2, 0.0, s2 - 1.0)
        f1 = jnp.floor(cc1)
        f2 = jnp.floor(cc2)
        w1 = cc1 - f1
        w2 = cc2 - f2
        i1 = f1.astype(jnp.int32)
        i2 = f2.astype(jnp.int32)
        i1c = jnp.minimum(i1 + 1, s1 - 1)
        i2c = jnp.minimum(i2 + 1, s2 - 1)
        flat1 = [i1.ravel(), i1.ravel(), i1c.ravel(), i1c.ravel()]
        flat2 = [i2.ravel(), i2c.ravel(), i2.ravel(), i2c.ravel()]
        wts = [((1 - w1) * (1 - w2)).ravel(), ((1 - w1) * w2).ravel(),
               (w1 * (1 - w2)).ravel(), (w1 * w2).ravel()]
        vt = jnp.transpose(v, (1, 2, 0))  # [x, z, y]
        out = None
        for a, b, wt in zip(flat1, flat2, wts):
            vals = vt[a, b]
            wt = wt[:, None].astype(vals.dtype)
            out = vals * wt if out is None else out + vals * wt
        return jnp.transpose(out.reshape(n, n, n), (2, 0, 1))

    def window_gather(v):
        cc1 = jnp.clip(c1, 0.0, s1 - 1.0)
        cc2 = jnp.clip(c2, 0.0, s2 - 1.0)
        i1 = jnp.minimum(jnp.floor(cc1).astype(jnp.int32), s1 - 2)
        i2 = jnp.minimum(jnp.floor(cc2).astype(jnp.int32), s2 - 2)
        w1 = (cc1 - i1).ravel()[:, None]
        w2 = (cc2 - i2).ravel()[:, None]
        vt = jnp.transpose(v, (1, 2, 0))  # [x, z, y]
        idx = jnp.stack([i1.ravel(), i2.ravel()], -1)
        dn = lax.GatherDimensionNumbers(offset_dims=(1, 2, 3),
                                        collapsed_slice_dims=(),
                                        start_index_map=(0, 1))
        g = lax.gather(vt, idx, dn, slice_sizes=(2, 2, n),
                       mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        out = (g[:, 0, 0] * ((1 - w1) * (1 - w2))
               + g[:, 0, 1] * ((1 - w1) * w2)
               + g[:, 1, 0] * (w1 * (1 - w2))
               + g[:, 1, 1] * (w1 * w2))
        return jnp.transpose(out.reshape(n, n, n), (2, 0, 1))

    def fence(fn):
        @jax.jit
        def wrapped(v):
            out = fn(v)
            return out, jnp.sum(out[0, 0, :8])

        def call(v):
            out, sc = wrapped(v)
            float(sc)
            return out

        return call

    fa = fence(four_gather)
    fb = fence(window_gather)
    ra = np.asarray(jax.device_get(fa(vol)))
    rb = np.asarray(jax.device_get(fb(vol)))
    bit = np.array_equal(ra.view(np.int32), rb.view(np.int32))
    print(f'bit-identical: {bit}; max abs diff '
          f'{np.abs(ra - rb).max():.3e}')

    tiny = jnp.zeros((8,), jnp.float32)
    jtiny = jax.jit(lambda x: jnp.sum(x + 1.0))
    float(jtiny(tiny))
    sa, sb, floors = [], [], []
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        float(jtiny(tiny))
        floors.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter(); fa(vol)
        sa.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter(); fb(vol)
        sb.append((time.perf_counter() - t0) * 1e3)
    floor = np.median(floors)
    a = np.asarray(sa) - floor
    b = np.asarray(sb) - floor
    print(f'floor {floor:.1f} ms; floor-subtracted ms:')
    print(f'  4-gather: median {np.median(a):6.2f} min {a.min():6.2f}')
    print(f'  windowed: median {np.median(b):6.2f} min {b.min():6.2f}')


if __name__ == '__main__':
    main()
