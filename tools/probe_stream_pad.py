#!/usr/bin/env python
"""Measure the lane-padding DMA tax on the db-kernel streams.

XLA:TPU stores HBM arrays tiled T(8,128)/T(16,128): a [.., 72, 72] patch
pane pads its minor dim 72 -> 128 lanes, so every DMA moves 78% more
bytes than the logical array.  This probe times pass-through Pallas copy
kernels (same grid/blocking as the stored-db stream) over
  A: [S, 2, N, 72, 72]   (production layout, padded lanes)
  B: [S, 2, N, 5184]     (flattened panes, ~0% pad at 5184 = 40.5*128)
to size the flattened-stream lever before touching the math kernels.

Usage: python tools/probe_stream_pad.py [--rounds 8] [--f32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=544)
    ap.add_argument('--probe', type=int, default=72)
    ap.add_argument('--steps', type=int, default=32)
    ap.add_argument('--nb', type=int, default=17)
    ap.add_argument('--unroll', type=int, default=4)
    ap.add_argument('--rounds', type=int, default=8)
    ap.add_argument('--f32', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.devices()[0].platform not in ('tpu',)
    S, N, P, NB, U = args.steps, args.n, args.probe, args.nb, args.unroll
    dt = jnp.float32 if args.f32 else jnp.bfloat16
    rng = np.random.default_rng(0)
    a = jax.jit(lambda x: x.astype(dt))(
        jnp.asarray(rng.random((S, 2, N, P, P), np.float32)))
    # Flat variants: Mosaic requires the last two BLOCK dims to be
    # divisible by (8, 128) or equal to the array dims.  A flat block
    # (U, 2, NB, P*P) with NB=17 in the second-to-last slot satisfies
    # neither, so the flat stream uses an 8-multiple batch block NBf with
    # the batch zero-padded up to a whole number of NBf blocks; the
    # padded share is reported so GB/s stays comparable.
    NBf = max(8, -(-NB // 8) * 8)
    Nf = -(-N // NBf) * NBf
    b = jax.jit(lambda x: jnp.pad(x.reshape(S, 2, N, P * P),
                                  ((0, 0), (0, 0), (0, Nf - N), (0, 0))))(a)

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def build(shape, block, nb_blk):
        grid = (shape[2] // nb_blk, S // U)
        spec = pl.BlockSpec(block, lambda bk, st: (st, 0, bk)
                            + (0,) * (len(block) - 3),
                            memory_space=pltpu.VMEM)
        f = pl.pallas_call(copy_kernel, grid=grid, in_specs=[spec],
                           out_specs=spec,
                           out_shape=jax.ShapeDtypeStruct(shape, dt),
                           interpret=interpret)

        @jax.jit
        def run(x):
            y = f(x)
            # Fence on a reduction spanning every grid cell (one element
            # per batch block and z step) — a single-element fetch only
            # forces the first output tile under the tunnel's async
            # dispatch and can under-count late cells.
            v = y[:, 0, ::nb_blk]
            v = v.reshape(v.shape[0], v.shape[1], -1)[..., 0]
            return y, jnp.sum(v.astype(jnp.float32))

        def call(x):
            y, s = run(x)
            float(s)
            return y

        return call

    def reshape_kernel(x_ref, o_ref):
        # Stream flat, relayout to panes (what the math kernels need),
        # touch the panes, relayout back to flat for the output stream.
        x = x_ref[...].reshape(U, 2, NBf, P, P)
        y = x + x.astype(jnp.float32).astype(x.dtype) * 0  # keep the panes live
        o_ref[...] = y.reshape(U, 2, NBf, P * P)

    def build_reshape():
        grid = (Nf // NBf, S // U)
        spec = pl.BlockSpec((U, 2, NBf, P * P),
                            lambda bk, st: (st, 0, bk, 0),
                            memory_space=pltpu.VMEM)
        f = pl.pallas_call(reshape_kernel, grid=grid, in_specs=[spec],
                           out_specs=spec,
                           out_shape=jax.ShapeDtypeStruct(b.shape, dt),
                           interpret=interpret)

        @jax.jit
        def run(x):
            y = f(x)
            v = y[:, 0, ::NBf, 0]
            return y, jnp.sum(v.astype(jnp.float32))

        def call(x):
            y, s = run(x)
            float(s)
            return y

        return call

    fa = build(a.shape, (U, 2, NB, P, P), NB)
    fb = build(b.shape, (U, 2, NBf, P * P), NBf)
    fa(a); fb(b)
    # The flat->panes in-kernel reshape is not Mosaic-lowerable on all
    # toolchains ('unsupported shape cast'); measure it when it builds,
    # report the failure otherwise — fa/fb still size the padding tax.
    try:
        fc = build_reshape()
        fc(b)
    except Exception as e:
        print(f'flat+reshape variant unavailable: {type(e).__name__}: '
              f'{str(e)[:120]}', file=sys.stderr)
        fc = None

    tiny = jnp.zeros((8,), jnp.float32)
    jtiny = jax.jit(lambda x: jnp.sum(x + 1.0))
    float(jtiny(tiny))
    sa, sb, sc, floors = [], [], [], []
    for _ in range(args.rounds):
        t0 = time.perf_counter(); float(jtiny(tiny))
        floors.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter(); fa(a)
        sa.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter(); fb(b)
        sb.append((time.perf_counter() - t0) * 1e3)
        if fc is not None:
            t0 = time.perf_counter(); fc(b)
            sc.append((time.perf_counter() - t0) * 1e3)
    floor = np.median(floors)
    gb = a.size * a.dtype.itemsize * 2 / 1e9   # read + write, logical
    gbf = b.size * b.dtype.itemsize * 2 / 1e9  # flat incl. batch zero-pad
    av = np.median(np.asarray(sa) - floor)
    bv = np.median(np.asarray(sb) - floor)
    print(f'floor {floor:.1f} ms; logical traffic {gb:.2f} GB (r+w); '
          f'flat batch-padded {N}->{Nf} ({gbf:.2f} GB moved)')
    print(f'  padded  [..,{P},{P}]: {av:6.2f} ms  ({gb / av * 1e3:5.0f} GB/s)')
    print(f'  flat    [..,{P * P}]: {bv:6.2f} ms  ({gbf / bv * 1e3:5.0f} GB/s)')
    if sc:
        cv = np.median(np.asarray(sc) - floor)
        print(f'  flat+reshape panes : {cv:6.2f} ms  '
              f'({gbf / cv * 1e3:5.0f} GB/s)')


if __name__ == '__main__':
    main()
