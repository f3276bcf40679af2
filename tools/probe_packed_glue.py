#!/usr/bin/env python
"""Interleaved A/B of the db-kernel GLUE at the flagship chunk.

A (old production): split the [N,p,p,zb,2] patch stack into delta/beta,
two strided moveaxis into z-major, kernels take two operands, backward
cotangents return through two moveaxis + a stack.
B (new production): ONE packed transpose [zb,2,N,p,p] in, packed kernel
operand, packed gradient out through one transpose back.

Both sides run the SAME multislice_db_stored kernels; only the XLA glue
differs — this isolates the packed-glue lever end to end (fwd and
fwd+bwd through jax.grad wrt the patch stack).

Usage: python tools/probe_packed_glue.py [--rounds 10] [--f32]
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
    # The z-minor patch-stack layout the driver extracts.
    s_np = rng.random((N, pn, pn, S, 2), np.float32) * 1e-3
    stack = jax.jit(lambda a: a.astype(obj_dtype))(jnp.asarray(s_np))
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

    def run_old(s, wr_, wi_, hr_, hi_):
        w = (wr_ + 1j * wi_).astype(jnp.complex64)
        h = (hr_ + 1j * hi_).astype(jnp.complex64)
        d = jnp.moveaxis(s[..., 0], -1, 0)
        bb = jnp.moveaxis(s[..., 1], -1, 0)
        db = jnp.stack([d, bb], 1)   # fuses with the movaxes; kernel operand
        return pm.multislice_db_stored_packed(db, w, h, k1, 1.0,
                                              interpret, bf16)

    def run_new(s, wr_, wi_, hr_, hi_):
        w = (wr_ + 1j * wi_).astype(jnp.complex64)
        h = (hr_ + 1j * hi_).astype(jnp.complex64)
        db = jnp.moveaxis(s, (3, 4), (0, 1))
        return pm.multislice_db_stored_packed(db, w, h, k1, 1.0,
                                              interpret, bf16)

    def fwd(run):
        def f(s, wr_, wi_, hr_, hi_):
            o = run(s, wr_, wi_, hr_, hi_)
            return jnp.sum(jnp.abs(o[:, 0, 0, 0]))
        return jax.jit(f)

    def fwdbwd(run):
        def f(s, wr_, wi_, hr_, hi_):
            def loss(s_):
                o = run(s_, wr_, wi_, hr_, hi_)
                return jnp.sum(jnp.abs(o) ** 2)
            g = jax.grad(loss)(s)
            return g[0, 0, 0, 0, 0].astype(jnp.float32)
        return jax.jit(f)

    fA, gA = fwd(run_old), fwdbwd(run_old)
    fB, gB = fwd(run_new), fwdbwd(run_new)
    for fn in (fA, gA, fB, gB):
        float(fn(stack, w_r, w_i, h_r, h_i))

    def once(fn):
        t0 = time.perf_counter()
        float(fn(stack, w_r, w_i, h_r, h_i))
        return (time.perf_counter() - t0) * 1e3

    tiny = jnp.zeros((8,), jnp.float32)
    jtiny = jax.jit(lambda x: jnp.sum(x + 1.0))
    float(jtiny(tiny))
    samples = {k: [] for k in ('fwd old', 'fwd packed',
                               'f+b old', 'f+b packed')}
    floors = []
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        float(jtiny(tiny))
        floors.append((time.perf_counter() - t0) * 1e3)
        samples['fwd old'].append(once(fA))
        samples['fwd packed'].append(once(fB))
        samples['f+b old'].append(once(gA))
        samples['f+b packed'].append(once(gB))
    floor = np.median(floors)
    print(f'floor {floor:.1f} ms; floor-subtracted ms '
          f'({"bf16" if bf16 else "f32"}, chunk {N}, S {S}, p {pn}):')
    for k, v in samples.items():
        a = np.asarray(v) - floor
        print(f'  {k:>11}: median {np.median(a):6.2f}  min {a.min():6.2f}  '
              f'max {a.max():6.2f}')


if __name__ == '__main__':
    main()
