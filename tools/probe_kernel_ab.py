#!/usr/bin/env python
"""Round-robin interleaved A/B of the promising probe_kernel variants.

probe_kernel.py times each variant's reps consecutively; the shared pool
drifted 25% WITHIN one such run (stored fwd 14.75 ms at the start, 10.94 ms
re-measured at the end), so its cross-variant ordering is unreliable.  This
probe interleaves single reps round-robin across variants so every variant
samples the same pool conditions, and reports per-variant median + spread.

Usage: python tools/probe_kernel_ab.py [--rounds 12] [--f32]
"""

import argparse
import functools
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
    ap.add_argument('--rounds', type=int, default=12)
    ap.add_argument('--f32', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from adorym_tpu.ops import pallas_multislice as pm
    import tools.probe_kernel as pk

    interpret = jax.devices()[0].platform not in ('tpu',)
    bf16 = not args.f32
    n, pn, b = args.n, args.probe, args.binning
    S = n // b
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
    fy = np.fft.fftfreq(pn, voxel_nm)
    quad = fy[:, None] ** 2 + fy[None, :] ** 2
    phase_np = (-np.pi * lmbda_nm * dz_nm * quad).astype(np.float32)
    h_r = jnp.asarray(np.cos(phase_np))
    h_i = jnp.asarray(np.sin(phase_np))

    # Reuse probe_kernel's variant machinery by monkey-filling its module
    # globals it closes over.
    pk_ns = dict(M=1, pn=pn, pm=pm, jnp=jnp, jax=jax, interpret=interpret,
                 k1=float(2 * np.pi * dz_nm / lmbda_nm), s_sign=1.0)

    # Inline a minimal copy of call_variant bound to these params.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k1 = pk_ns['k1']
    s_sign = 1.0
    M = 1

    def make_fwd(unroll, record_t=False):
        def kern(d_ref, b_ref, w0_r_ref, w0_i_ref,
                 py_r, py_i, px_r, px_i,
                 out_r_ref, out_i_ref, inter_r_ref, inter_i_ref,
                 w_r, w_i):
            step = pl.program_id(1)
            n_cells = pl.num_programs(1)

            @pl.when(step == 0)
            def _():
                w_r[:] = w0_r_ref[:]
                w_i[:] = w0_i_ref[:]

            for u in range(unroll):
                if not record_t:
                    inter_r_ref[u] = w_r[:].astype(inter_r_ref.dtype)
                    inter_i_ref[u] = w_i[:].astype(inter_i_ref.dtype)
                tr, ti = pm._db_mod(d_ref[u], b_ref[u], k1, s_sign)
                mr = w_r[:] * tr - w_i[:] * ti
                mi = w_r[:] * ti + w_i[:] * tr
                if record_t:
                    inter_r_ref[u] = tr.astype(inter_r_ref.dtype)[None]
                    inter_i_ref[u] = ti.astype(inter_i_ref.dtype)[None]
                if unroll == 1:
                    @pl.when(step < n_cells - 1)
                    def _():
                        pr, pi = pm._apply_prop(mr, mi, py_r[:], py_i[:],
                                                px_r[:], px_i[:])
                        w_r[:] = pr
                        w_i[:] = pi
                else:
                    gstep = step * unroll + u
                    total = n_cells * unroll

                    @pl.when(gstep < total - 1)
                    def _():
                        pr, pi = pm._apply_prop(mr, mi, py_r[:], py_i[:],
                                                px_r[:], px_i[:])
                        w_r[:] = pr
                        w_i[:] = pi

                    @pl.when(gstep == total - 1)
                    def _():
                        w_r[:] = mr
                        w_i[:] = mi

            @pl.when(step == n_cells - 1)
            def _():
                out_r_ref[:] = w_r[:]
                out_i_ref[:] = w_i[:]

        return kern

    def call_variant(d_, b_, w_r_, w_i_, hr, hi, unroll=1, record_t=False):
        N0 = d_.shape[1]
        NB = pm._pick_nb(M, N0, pn, pn)
        (d_, b_, w_r_, w_i_), Np = pm._pad_batch(
            (d_, b_, w_r_, w_i_), N0, NB, (0.0, 0.0, 0.0, 0.0))
        n_blocks = Np // NB
        py, px = pm._fold_prop_mats(hr, hi, pn, pn)
        mats = pm._split_prop_variants(py, px)
        vmem = pltpu.VMEM
        n_cells = S // unroll
        db_spec = pl.BlockSpec((unroll, NB, pn, pn),
                               lambda bk, st: (st, bk, 0, 0),
                               memory_space=vmem)
        w0_spec = pl.BlockSpec((M, NB, pn, pn), lambda bk, st: (0, bk, 0, 0),
                               memory_space=vmem)

        def m_spec(nn):
            return pl.BlockSpec((nn, nn), lambda bk, st: (0, 0),
                                memory_space=vmem)

        inter_spec = pl.BlockSpec((unroll, M, NB, pn, pn),
                                  lambda bk, st: (st, 0, bk, 0, 0),
                                  memory_space=vmem)
        out_shapes = (
            jax.ShapeDtypeStruct((M, Np, pn, pn), jnp.float32),
            jax.ShapeDtypeStruct((M, Np, pn, pn), jnp.float32),
            jax.ShapeDtypeStruct((S, M, Np, pn, pn), d_.dtype),
            jax.ShapeDtypeStruct((S, M, Np, pn, pn), d_.dtype),
        )
        kern = make_fwd(unroll, record_t)
        with pm._dot_precision(bf16):
            return pl.pallas_call(
                kern,
                grid=(n_blocks, n_cells),
                in_specs=[db_spec, db_spec, w0_spec, w0_spec]
                         + [m_spec(pn)] * 4,
                out_specs=(w0_spec, w0_spec, inter_spec, inter_spec),
                out_shape=out_shapes,
                scratch_shapes=[pltpu.VMEM((M, NB, pn, pn), jnp.float32)] * 2,
                interpret=interpret,
            )(d_, b_, w_r_, w_i_, *mats)

    variants = {
        'base(u1)': functools.partial(call_variant),
        'unroll=2': functools.partial(call_variant, unroll=2),
        'unroll=4': functools.partial(call_variant, unroll=4),
        'record-t': functools.partial(call_variant, record_t=True),
    }
    calls = {k: pk.fence(v) for k, v in variants.items()}

    # Equivalence check first (vs production stored kernel).  Must run
    # under jit: eager _fold_prop_mats does a complex H2D (dft_matrix is
    # numpy) which the axon tunnel rejects.
    ref = jax.jit(lambda d_, b_, wr_, wi_, hr_, hi_: pm.multislice_db_stored(
        d_, b_, (wr_ + 1j * wi_).astype(jnp.complex64),
        (hr_ + 1j * hi_).astype(jnp.complex64),
        k1, s_sign, interpret, bf16))(d, bb, w_r, w_i, h_r, h_i)

    # Compare ON-device (complex D2H also fails through the tunnel) and
    # fetch only the two real scalars.
    @jax.jit
    def rel_err(gr, gi, r):
        dev = jnp.abs((gr + 1j * gi) - r)
        return jnp.max(dev), jnp.max(jnp.abs(r))

    for name, c in calls.items():
        out = c(d, bb, w_r, w_i, h_r, h_i)
        num, den = rel_err(out[0][:, :N], out[1][:, :N], ref)
        print(f'{name}: max rel dev vs production fwd = '
              f'{float(num) / max(1e-12, float(den)):.2e}')

    samples = {k: [] for k in calls}
    tiny = jnp.zeros((8,), jnp.float32)
    floor_call = pk.fence(lambda x: x + 1.0)
    floors = []
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        floor_call(tiny)
        floors.append(time.perf_counter() - t0)
        for name, c in calls.items():
            t0 = time.perf_counter()
            c(d, bb, w_r, w_i, h_r, h_i)
            samples[name].append(time.perf_counter() - t0)
    floor = np.median(floors) * 1e3
    print(f'\nfloor {floor:.1f} ms (median of {args.rounds}); '
          f'per-variant ms, floor-subtracted:')
    for name, s in samples.items():
        a = np.asarray(s) * 1e3 - floor
        print(f'  {name:>9}: median {np.median(a):6.2f}  '
              f'min {a.min():6.2f}  max {a.max():6.2f}')


if __name__ == '__main__':
    main()
