#!/usr/bin/env python
"""A/B the full-object exact rotation adjoint: jax.vjp scatter vs the
tap-gather reformulation (``rotate_adjoint_taps``) at flagship scale.

The band-scale result (+8%, tools/probe_imm.py) need not transfer: the
full-object adjoint moves 256-plane slices per descriptor, a different
bandwidth/descriptor balance.  Scan-of-K slopes cancel the tunnel
round trip.

Usage: python tools/probe_adjoint_full.py [--n 256] [--k1 2 --k2 6]
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
    ap.add_argument('--k1', type=int, default=2)
    ap.add_argument('--k2', type=int, default=6)
    ap.add_argument('--reps', type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from adorym_tpu.ops.rotate import rotate_adjoint, rotate_adjoint_taps

    n = args.n
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((n, n, n, 2), np.float32) * 1e-3)
    theta = jnp.asarray(0.3, jnp.float32)

    def make(fn, k):
        @jax.jit
        def run(x):
            def body(c, _):
                y = fn(c, theta)
                # keep the chain serial without changing magnitudes
                return y * 0.5 + c * 0.5, ()
            (y, _) = jax.lax.scan(body, x, None, length=k)[0], None
            return y.ravel()[0]
        return run

    def timed(run):
        float(run(x0))
        best = float('inf')
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    print(f'devices: {jax.devices()}', flush=True)
    for name, fn in (('vjp', lambda c, t: rotate_adjoint(c, t)),
                     ('taps', lambda c, t: rotate_adjoint_taps(c, t))):
        t1 = timed(make(fn, args.k1))
        t2 = timed(make(fn, args.k2))
        slope = (t2 - t1) / (args.k2 - args.k1) * 1e3
        print(f'{name:5s} K{args.k1} {t1*1e3:8.1f}  K{args.k2} '
              f'{t2*1e3:8.1f}  -> {slope:7.2f} ms/adjoint', flush=True)


if __name__ == '__main__':
    main()
