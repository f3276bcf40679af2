#!/usr/bin/env python
"""Dissect the fused multislice Pallas kernel's cost structure in-session.

The z-scan kernel (``ops/pallas_multislice.py``) is ~56% of the flagship
per-angle pipeline, yet a naive roofline (DMA ~0.5 ms, bf16 MXU ~0.6 ms,
modulator transcendentals ~2.3 ms at the 529-pattern chunk) sums to far
less than the measured wall.  This probe times VARIANT kernels that
disable one ingredient at a time, all in one session (the shared pool
varies 2x across sessions — only interleaved numbers mean anything):

  stored fwd / fwd+bwd   the production multislice_db_stored baseline
  invertible fwd         no intermediate recording (isolates inter writes)
  mod=linear             transmission = (d, b) directly: no exp/sincos
  prop=off               modulation only: no DFT matmuls / transposes
  copy-only              neither: pure grid + DMA stream floor
  unroll=2               two z-steps per grid cell (halves per-cell cost)
  halfsteps              n_steps/2 at same data volume (per-step scaling)

Usage: python tools/probe_kernel.py [--n 256] [--chunk 529] [--f32]
"""

import argparse
import functools
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


def timeit(call, *args, reps=5):
    call(*args)
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        call(*args)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=256)
    ap.add_argument('--probe', type=int, default=72)
    ap.add_argument('--binning', type=int, default=8)
    ap.add_argument('--chunk', type=int, default=529)
    ap.add_argument('--reps', type=int, default=7)
    ap.add_argument('--f32', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from adorym_tpu.ops import pallas_multislice as pm
    from adorym_tpu.ops import propagate as prop

    interpret = jax.devices()[0].platform not in ('tpu',)
    bf16 = not args.f32
    n, pn, b = args.n, args.probe, args.binning
    S = n // b
    N = args.chunk
    M = 1
    rng = np.random.default_rng(0)
    obj_dtype = jnp.bfloat16 if bf16 else jnp.float32
    # bf16 H2D fails UNIMPLEMENTED on the axon tunnel (like complex64):
    # transfer f32, cast on device.
    cast = jax.jit(lambda a: a.astype(obj_dtype))
    d = cast(jnp.asarray(rng.random((S, N, pn, pn), np.float32) * 1e-3))
    bb = cast(jnp.asarray(rng.random((S, N, pn, pn), np.float32) * 1e-4))
    # jnp.ones(complex64) hoists a complex constant into an H2D transfer,
    # which axon rejects — build the complex wave from a real input.
    wave = jax.jit(lambda r: (r + 0j).astype(jnp.complex64))(
        jnp.ones((M, N, pn, pn), jnp.float32))
    lmbda_nm = 1239.84 / 5000.0
    voxel_nm = 1e-7 * 1e7
    dz_nm = b * voxel_nm
    k1 = float(2 * np.pi * dz_nm / lmbda_nm)
    s_sign = 1.0
    # Fresnel kernel for one binned step, built host-side in pure numpy
    # (complex64 H2D fails on the axon tunnel — and fresnel_kernel's eager
    # jnp.exp would do exactly that transfer): H = exp(-i*pi*lmbda*z*(u^2+v^2)).
    fy = np.fft.fftfreq(pn, voxel_nm)
    fx = np.fft.fftfreq(pn, voxel_nm)
    quad = fy[:, None] ** 2 + fx[None, :] ** 2
    phase_np = (-1.0 * np.pi * lmbda_nm * dz_nm * quad).astype(np.float32)
    # h stays as two REAL device planes passed as jit ARGUMENTS throughout:
    # complex closure constants require a complex D2H at trace time, which
    # the tunnel rejects (and large f32 closure constants come back wrong).
    h_r = jnp.asarray(np.cos(phase_np).astype(np.float32))
    h_i = jnp.asarray(np.sin(phase_np).astype(np.float32))

    results = {}
    tiny = jnp.zeros((8,), jnp.float32)
    rtt = timeit(fence(lambda x: x + 1.0), tiny, reps=max(10, args.reps))

    def _h(hr, hi):
        return (hr + 1j * hi).astype(jnp.complex64)

    st_fwd = fence(lambda d_, b_, w_, hr, hi: pm.multislice_db_stored(
        d_, b_, w_, _h(hr, hi), k1, s_sign, interpret, bf16))
    results['stored fwd'] = timeit(st_fwd, d, bb, wave, h_r, h_i,
                                   reps=args.reps)

    def st_grad(d_, b_, w_, hr, hi):
        def loss(d_, b_):
            o = pm.multislice_db_stored(d_, b_, w_, _h(hr, hi), k1, s_sign,
                                        interpret, bf16)
            return jnp.sum(jnp.abs(o) ** 2)
        return jax.grad(loss, argnums=(0, 1))(d_, b_)

    results['stored fwd+bwd'] = timeit(fence(st_grad), d, bb, wave, h_r, h_i,
                                       reps=args.reps)

    inv_fwd = fence(lambda d_, b_, w_, hr, hi: pm.multislice_db(
        d_, b_, w_, _h(hr, hi), k1, s_sign, interpret, bf16))
    results['invertible fwd'] = timeit(inv_fwd, d, bb, wave, h_r, h_i,
                                       reps=args.reps)

    # ----- variant kernels ---------------------------------------------
    # A parameterized copy of _fwd_db_st_kernel: mod_mode in
    # {'exp', 'linear', 'off'}, prop on/off, z-unroll factor.
    def make_fwd(mod_mode, do_prop, unroll, record=True, record_t=False):
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
                if record and not record_t:
                    inter_r_ref[u] = w_r[:].astype(inter_r_ref.dtype)
                    inter_i_ref[u] = w_i[:].astype(inter_i_ref.dtype)
                if mod_mode == 'exp':
                    tr, ti = pm._db_mod(d_ref[u], b_ref[u], k1, s_sign)
                elif mod_mode == 'linear':
                    tr = d_ref[u].astype(jnp.float32)
                    ti = b_ref[u].astype(jnp.float32)
                else:
                    tr, ti = None, None
                if tr is not None:
                    mr = w_r[:] * tr - w_i[:] * ti
                    mi = w_r[:] * ti + w_i[:] * tr
                else:
                    mr, mi = w_r[:] + 0.0, w_i[:] + 0.0
                if record and record_t and tr is not None:
                    inter_r_ref[u] = tr.astype(inter_r_ref.dtype)[None]
                    inter_i_ref[u] = ti.astype(inter_i_ref.dtype)[None]
                last = (step == n_cells - 1) if unroll == 1 else None
                if do_prop:
                    if unroll == 1:
                        @pl.when(step < n_cells - 1)
                        def _():
                            pr, pi = pm._apply_prop(mr, mi, py_r[:], py_i[:],
                                                    px_r[:], px_i[:])
                            w_r[:] = pr
                            w_i[:] = pi
                    else:
                        # unrolled: propagate unconditionally (last-step
                        # accuracy irrelevant for timing)
                        pr, pi = pm._apply_prop(mr, mi, py_r[:], py_i[:],
                                                px_r[:], px_i[:])
                        w_r[:] = pr
                        w_i[:] = pi
                else:
                    w_r[:] = mr
                    w_i[:] = mi

            @pl.when(step == n_cells - 1)
            def _():
                out_r_ref[:] = w_r[:]
                out_i_ref[:] = w_i[:]

        return kern

    def call_variant(d_, b_, w_r, w_i, hr, hi, mod_mode='exp', do_prop=True,
                     unroll=1, record=True, record_t=False, steps=None):
        S_ = d_.shape[0] if steps is None else steps
        d_ = d_[:S_]
        b_ = b_[:S_]
        N0 = d_.shape[1]
        NB = pm._pick_nb(M, N0, pn, pn)
        (d_, b_, w_r, w_i), Np = pm._pad_batch((d_, b_, w_r, w_i), N0, NB,
                                               (0.0, 0.0, 0.0, 0.0))
        n_blocks = Np // NB
        py, px = pm._fold_prop_mats(hr, hi, pn, pn)
        mats = pm._split_prop_variants(py, px)
        vmem = pltpu.VMEM
        n_cells = S_ // unroll
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
        out_shapes = [
            jax.ShapeDtypeStruct((M, Np, pn, pn), jnp.float32),
            jax.ShapeDtypeStruct((M, Np, pn, pn), jnp.float32),
            jax.ShapeDtypeStruct((S_, M, Np, pn, pn), d_.dtype),
            jax.ShapeDtypeStruct((S_, M, Np, pn, pn), d_.dtype),
        ]
        out_specs = [w0_spec, w0_spec, inter_spec, inter_spec]
        if not record:
            # Dummy tiny outputs so the kernel signature stays uniform.
            inter_sm = pl.BlockSpec((unroll, M, NB, pn, pn),
                                    lambda bk, st: (0, 0, 0, 0, 0),
                                    memory_space=vmem)
            out_shapes[2] = jax.ShapeDtypeStruct((unroll, M, NB, pn, pn),
                                                 d_.dtype)
            out_shapes[3] = out_shapes[2]
            out_specs[2] = inter_sm
            out_specs[3] = inter_sm
        kern = make_fwd(mod_mode, do_prop, unroll, record, record_t)
        with pm._dot_precision(bf16):
            return pl.pallas_call(
                kern,
                grid=(n_blocks, n_cells),
                in_specs=[db_spec, db_spec, w0_spec, w0_spec]
                         + [m_spec(pn)] * 4,
                out_specs=tuple(out_specs),
                out_shape=tuple(out_shapes),
                scratch_shapes=[pltpu.VMEM((M, NB, pn, pn), jnp.float32)] * 2,
                interpret=interpret,
            )(d_, b_, w_r, w_i, *mats)

    w_r = jnp.real(wave)
    w_i = jnp.imag(wave)

    variants = [
        ('variant baseline', dict()),
        ('mod=linear', dict(mod_mode='linear')),
        ('mod=off', dict(mod_mode='off')),
        ('prop=off', dict(do_prop=False)),
        ('copy-only', dict(mod_mode='off', do_prop=False)),
        ('no-record', dict(record=False)),
        ('record-t', dict(record_t=True)),
        ('unroll=2', dict(unroll=2)),
        ('unroll=4', dict(unroll=4)),
        ('halfsteps', dict(steps=S // 2)),
    ]
    for name, kw in variants:
        try:
            f = fence(functools.partial(call_variant, **kw))
            results[name] = timeit(f, d, bb, w_r, w_i, h_r, h_i,
                                   reps=args.reps)
        except Exception as e:
            print(f'  [{name} failed: {type(e).__name__}: {e}]',
                  file=sys.stderr)

    # Re-time the baseline at the end: pool drift bracket.
    results['stored fwd (again)'] = timeit(st_fwd, d, bb, wave, h_r, h_i,
                                           reps=args.reps)

    results = {k_: max(0.0, v - rtt) for k_, v in results.items()}
    print(f'\n{n}^3 S={S} steps, probe {pn}^2, chunk {N}, '
          f'{"bf16" if bf16 else "f32"} on {jax.devices()[0].platform} '
          f'(floor {rtt:.1f} ms subtracted):')
    for k_, v in results.items():
        print(f'  {k_:>18}: {v:8.2f} ms')


if __name__ == '__main__':
    main()
