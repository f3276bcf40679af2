#!/usr/bin/env python
"""Interleaved A/B of the production stored-db kernel at unroll=1 vs
the _pick_unroll choice, fwd and fwd+bwd, at the flagship chunk.

Usage: python tools/probe_unroll.py [--rounds 10] [--f32]
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
    ap.add_argument('--chunk', type=int, default=529)
    ap.add_argument('--rounds', type=int, default=10)
    ap.add_argument('--f32', action='store_true')
    ap.add_argument('--ua', type=int, default=1,
                    help='first forced unroll (A side)')
    ap.add_argument('--ub', type=int, default=0,
                    help='second forced unroll (0 = the _pick_unroll choice)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import adorym_tpu.ops.pallas_multislice as pm

    interpret = jax.devices()[0].platform not in ('tpu',)
    bf16 = not args.f32
    pn, b = args.probe, args.binning
    S = args.n // b
    N = args.chunk
    rng = np.random.default_rng(0)
    obj_dtype = jnp.bfloat16 if bf16 else jnp.float32
    cast = jax.jit(lambda a: a.astype(obj_dtype))
    d = cast(jnp.asarray(rng.random((S, N, pn, pn), np.float32) * 1e-3))
    bb = cast(jnp.asarray(rng.random((S, N, pn, pn), np.float32) * 1e-4))
    w_r = jnp.ones((1, N, pn, pn), jnp.float32)
    w_i = jnp.zeros((1, N, pn, pn), jnp.float32)
    lmbda_nm = 1239.84 / 5000.0
    voxel_nm = 1e-7 * 1e7
    dz_nm = b * voxel_nm
    k1 = float(2 * np.pi * dz_nm / lmbda_nm)
    fy = np.fft.fftfreq(pn, voxel_nm)
    quad = fy[:, None] ** 2 + fy[None, :] ** 2
    phase_np = (-np.pi * lmbda_nm * dz_nm * quad).astype(np.float32)
    h_r = jnp.asarray(np.cos(phase_np))
    h_i = jnp.asarray(np.sin(phase_np))

    natural = pm._pick_unroll(S, 1, pm._pick_nb(1, N, pn, pn), pn, pn,
                              2 if bf16 else 4)
    ua = args.ua
    ub = args.ub or natural
    print(f'natural unroll = {natural}; comparing u{ua} vs u{ub}')

    real_pick = pm._pick_unroll

    def build(forced):
        # Bind the forced unroll at TRACE time via the module global; the
        # compiled executables keep whatever was picked when traced.
        def fwd(d_, b_, wr_, wi_, hr_, hi_):
            w = (wr_ + 1j * wi_).astype(jnp.complex64)
            h = (hr_ + 1j * hi_).astype(jnp.complex64)
            o = pm.multislice_db_stored(d_, b_, w, h, k1, 1.0, interpret,
                                        bf16)
            return jnp.sum(jnp.abs(o[:, 0, 0, 0]))

        def fwdbwd(d_, b_, wr_, wi_, hr_, hi_):
            def loss(d_, b_):
                w = (wr_ + 1j * wi_).astype(jnp.complex64)
                h = (hr_ + 1j * hi_).astype(jnp.complex64)
                o = pm.multislice_db_stored(d_, b_, w, h, k1, 1.0,
                                            interpret, bf16)
                return jnp.sum(jnp.abs(o) ** 2)
            gd, gb = jax.grad(loss, argnums=(0, 1))(d_, b_)
            return (gd[0, 0, 0, 0].astype(jnp.float32)
                    + gb[0, 0, 0, 0].astype(jnp.float32))

        pm._pick_unroll = (lambda *a, **k: forced) if forced else real_pick
        try:
            jf = jax.jit(fwd)
            jg = jax.jit(fwdbwd)
            # Compile now, while the override is active.
            float(jf(d, bb, w_r, w_i, h_r, h_i))
            float(jg(d, bb, w_r, w_i, h_r, h_i))
        finally:
            pm._pick_unroll = real_pick
        return jf, jg

    f1, g1 = build(ua)
    fU, gU = build(ub)

    def once(fn):
        t0 = time.perf_counter()
        float(fn(d, bb, w_r, w_i, h_r, h_i))
        return (time.perf_counter() - t0) * 1e3

    tiny = jnp.zeros((8,), jnp.float32)
    jtiny = jax.jit(lambda x: jnp.sum(x + 1.0))
    float(jtiny(tiny))
    samples = {k: [] for k in (f'fwd u{ua}', f'fwd u{ub}',
                               f'f+b u{ua}', f'f+b u{ub}')}
    floors = []
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        float(jtiny(tiny))
        floors.append((time.perf_counter() - t0) * 1e3)
        samples[f'fwd u{ua}'].append(once(f1))
        samples[f'fwd u{ub}'].append(once(fU))
        samples[f'f+b u{ua}'].append(once(g1))
        samples[f'f+b u{ub}'].append(once(gU))
    floor = np.median(floors)
    print(f'floor {floor:.1f} ms; floor-subtracted ms:')
    for k, v in samples.items():
        a = np.asarray(v) - floor
        print(f'  {k:>8}: median {np.median(a):6.2f}  min {a.min():6.2f}  '
              f'max {a.max():6.2f}')


if __name__ == '__main__':
    main()
