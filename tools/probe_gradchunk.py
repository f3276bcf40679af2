#!/usr/bin/env python
"""Split the flagship grad_chunk phase into its internal stages.

The angle-fused profiler (``profile_flagship.py``) times the fused
fwd+AD gradient of a whole-angle patch chunk as ONE number; this probe
separates it so optimization effort lands on the dominant stage:

  extract       patch gather from the binned rotated object
  fwd           predict_from_patches forward only
  fwd+bwd       the full value_and_grad (== profile's grad_chunk)
  multislice    the z-scan alone, fwd and fwd+bwd
  farfield      free-space propagation + mode sum + loss alone, fwd+bwd

Usage: python tools/probe_gradchunk.py [--n 256] [--chunk 529] [--bf16]
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
    ap.add_argument('--reps', type=int, default=5)
    ap.add_argument('--bf16', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.models import ptychography as pt
    from adorym_tpu.ops import patches as patch_ops
    from adorym_tpu.ops import propagate as prop

    n, pn, b = args.n, args.probe, args.binning
    nz_b = n // b
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', binning=b),
        train=TrainConfig(minibatch_size=args.chunk, learning_rate=1e-7,
                          run_bfloat16=args.bf16))
    geo = cfg.geometry

    rng = np.random.default_rng(0)
    obj_b = jnp.asarray(rng.random((n, n, nz_b, 2), np.float32) * 1e-3)
    probe = jnp.asarray(np.stack([np.ones((1, pn, pn), np.float32),
                                  np.zeros((1, pn, pn), np.float32)], -1))
    k = int(round(args.chunk ** 0.5))
    xs = (np.arange(k) * ((n - pn) // max(1, k - 1))).clip(0, n - pn)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1)[:args.chunk]
    pos_d = jnp.asarray(pos, jnp.int32)
    meas = jnp.asarray(rng.random((args.chunk, pn, pn), np.float32))
    theta = jnp.asarray(0.3, jnp.float32)
    batch = {'i_theta': jnp.asarray(0, jnp.int32), 'theta': theta,
             'pos_batch': pos_d.astype(jnp.float32),
             'ind_batch': jnp.arange(args.chunk, dtype=jnp.int32)}

    results = {}
    tiny = jnp.zeros((8,), jnp.float32)
    rtt = timeit(fence(lambda x: x + 1.0), tiny, reps=max(10, args.reps))

    ext = fence(lambda ob: patch_ops.extract_patches(ob, pos_d, (pn, pn)))
    results['extract'] = timeit(ext, obj_b, reps=args.reps)
    sub = ext(obj_b)

    # A/B: band-gather grid extraction (Pallas transpose of the grid
    # scatter) — bit-identical patches, each object byte read once per
    # overlapping patch-row band instead of per-patch dynamic slices.
    stride_g = int(pos[1, 1] - pos[0, 1]) if len(pos) > 1 else pn
    k_rows = int(round(args.chunk ** 0.5))
    if k_rows * k_rows == args.chunk:
        extg = fence(lambda ob: patch_ops.extract_grid2d_best(
            ob, jnp.asarray(pos[0, 0]), jnp.asarray(pos[0, 1]),
            stride_g, k_rows, k_rows, (pn, pn)))
        results['extract grid2d [A/B]'] = timeit(extg, obj_b,
                                                 reps=args.reps)
        np.testing.assert_array_equal(np.asarray(extg(obj_b)),
                                      np.asarray(sub))

    fwd = fence(lambda s, pr: pt.predict_from_patches(
        {'probe': pr}, batch, s, cfg, prebinned_z=True))
    results['fwd'] = timeit(fwd, sub, probe, reps=args.reps)

    def chunk_grad(s, pr, meas):
        def loss(s):
            pred = pt.predict_from_patches({'probe': pr}, batch, s, cfg,
                                           prebinned_z=True)
            return jnp.mean((pred - meas) ** 2)
        return jax.grad(loss)(s)

    results['fwd+bwd'] = timeit(fence(chunk_grad), sub, probe, meas,
                                reps=args.reps)

    # multislice alone (bf16 cast + z-scan, no far-field / loss)
    def ms_only(s, pr):
        delta, beta = s[..., 0], s[..., 1]
        if cfg.train.run_bfloat16:
            delta = delta.astype(jnp.bfloat16)
            beta = beta.astype(jnp.bfloat16)
        wave = jnp.broadcast_to(
            pt.complex_probe(pr)[:, None],
            (pr.shape[0], delta.shape[0]) + pr.shape[1:3])
        fused = {'auto': 'auto', 'on': True, 'off': False}[
            cfg.train.fused_multislice]
        return prop.multislice_propagate(
            delta, beta, wave, geo.energy_ev, geo.psize_cm,
            binning=geo.binning, fresnel_approx=geo.fresnel_approx,
            sign_convention=geo.sign_convention, fused=fused,
            prebinned=True, mxu_bf16=cfg.train.run_bfloat16)

    results['multislice fwd'] = timeit(fence(ms_only), sub, probe,
                                       reps=args.reps)

    def ms_grad(s, pr):
        def loss(s):
            return jnp.sum(jnp.abs(ms_only(s, pr)) ** 2)
        return jax.grad(loss)(s)

    results['multislice fwd+bwd'] = timeit(fence(ms_grad), sub, probe,
                                           reps=args.reps)

    # far-field detection + loss alone, taking the exit wave as input
    wave0 = fence(ms_only)(sub, probe)

    def det_grad(w, meas):
        def loss(w):
            from adorym_tpu.models.base import incoherent_mode_sum
            lmbda_nm = 1239.84 / 5000.0
            voxel = (geo.psize_cm * 1e7,) * 3
            det = prop.free_space_propagate(
                w.astype(jnp.complex64), 'inf', lmbda_nm, voxel,
                sign_convention=geo.sign_convention,
                normalize_fft=cfg.loss.normalize_fft,
                fresnel_approx=geo.fresnel_approx)
            pred = incoherent_mode_sum(det)
            return jnp.mean((pred - meas) ** 2)
        return jax.grad(loss)(w)

    results['farfield fwd+bwd'] = timeit(fence(det_grad), wave0, meas,
                                         reps=args.reps)

    if args.bf16:
        # A/B: extract from a pre-cast bf16 binned object — value-identical
        # patches, half the extract/cast/cotangent HBM bytes; the cotangent
        # comes back bf16.
        obj_b16 = fence(lambda o: o.astype(jnp.bfloat16))(obj_b)
        ext16 = fence(lambda ob: patch_ops.extract_patches(ob, pos_d,
                                                           (pn, pn)))
        results['extract bf16 [A/B]'] = timeit(ext16, obj_b16,
                                               reps=args.reps)
        sub16 = ext16(obj_b16)
        if k_rows * k_rows == args.chunk:
            extg16 = fence(lambda ob: patch_ops.extract_grid2d_best(
                ob, jnp.asarray(pos[0, 0]), jnp.asarray(pos[0, 1]),
                stride_g, k_rows, k_rows, (pn, pn)))
            results['extract grid2d bf16 [A/B]'] = timeit(
                extg16, obj_b16, reps=args.reps)
        results['fwd+bwd bf16-sub [A/B]'] = timeit(
            fence(chunk_grad), sub16, probe, meas, reps=args.reps)
        g16 = fence(chunk_grad)(sub16, probe, meas)

        # A/B: detector propagation folded into the kernel's last step
        # (fuse_farfield, the default) vs the separate XLA farfield
        # dispatch.  The default 'fwd+bwd bf16-sub' row above already
        # includes the fold; this row switches it off.
        from dataclasses import replace as _dc_replace
        cfg_nofold = _dc_replace(
            cfg, train=_dc_replace(cfg.train, fuse_farfield='off'))

        def chunk_grad_nofold(s, pr, meas):
            def loss(s):
                pred = pt.predict_from_patches(
                    {'probe': pr}, batch, s, cfg_nofold, prebinned_z=True)
                return jnp.mean((pred - meas) ** 2)
            return jax.grad(loss)(s)

        results['fwd+bwd bf16 NOfold [A/B]'] = timeit(
            fence(chunk_grad_nofold), sub16, probe, meas, reps=args.reps)

        # Multislice alone from bf16 patches (the production layout after
        # bf16-extraction): splits the kernel's fwd and bwd costs without
        # the f32->bf16 cast+transpose glue the f32 rows above pay.
        results['multislice fwd bf16-sub [A/B]'] = timeit(
            fence(ms_only), sub16, probe, reps=args.reps)
        results['multislice fwd+bwd bf16-sub [A/B]'] = timeit(
            fence(ms_grad), sub16, probe, reps=args.reps)

        # bf16 cotangent through the scatter paths
        stride = int(pos[1, 1] - pos[0, 1]) if len(pos) > 1 else pn
        rows = k
        acc = jnp.zeros((n, n, nz_b, 2), jnp.float32)
        sc = fence(lambda a, g: patch_ops.scatter_grid2d_add(
            a, g, jnp.asarray(pos[0, 0]), jnp.asarray(pos[0, 1]),
            stride, rows))
        results['scatter_g2d bf16-cot [A/B]'] = timeit(sc, acc, g16,
                                                       reps=args.reps)
        from adorym_tpu.ops import pallas_scatter_grid as psg
        if psg.supported(g16.shape, stride):
            scp = fence(lambda a, g: psg.scatter_grid2d_add_pallas(
                a, g, jnp.asarray(pos[0, 0]), jnp.asarray(pos[0, 1]),
                stride, rows,
                interpret=jax.devices()[0].platform != 'tpu'))
            try:
                results['scatter_pallas bf16-cot [A/B]'] = timeit(
                    scp, acc, g16, reps=args.reps)
            except Exception as e:
                print(f'  [pallas bf16 scatter failed: {e}]')

    results = {k_: max(0.0, v - rtt) for k_, v in results.items()}
    print(f'\n{n}^3 binned z={nz_b}, probe {pn}^2, chunk {args.chunk}, '
          f'{"bf16" if args.bf16 else "f32"} on '
          f'{jax.devices()[0].platform} (floor {rtt:.1f} ms subtracted):')
    for k_, v in results.items():
        print(f'  {k_:>18}: {v:8.2f} ms')


if __name__ == '__main__':
    main()
