#!/usr/bin/env python
"""Per-phase profile of the flagship (256^3 multislice ptychotomography)
angle step on the current device.

Times each phase of the angle-fused training step as a standalone jitted
program, fenced by a scalar computed INSIDE the same jit and fetched to
host (on the axon tunnel ``block_until_ready`` is a no-op; only a host
fetch syncs).  Structured replacement for the reference's per-batch phase
prints (``adorym/ptychography.py:943,988,1041,1052,1198``).

Phases:
  rotate_fwd    object -> view frame            (once per angle)
  prebin        z bin-sum of the rotated object (once per angle)
  grad_chunk    fused fwd+AD of `chunk` patterns at binned depth
  scatter       rowgrid scatter-add of the chunk's patch gradients
  expand        binned gradient -> full depth (bin-sum adjoint)
  rotate_back   gradient -> object frame (interp at -theta)
  adam_apply    Adam update of the object

Usage: python tools/profile_flagship.py [--n 256] [--chunk 529]
"""

import argparse
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def fence(fn):
    """Wrap a jitted fn so calling it returns only after the device work
    finished: fetch a scalar computed from the outputs inside the jit."""
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
    call(*args)  # compile + warm
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
    ap.add_argument('--chunk', type=int, default=529,
                    help='patterns per fused gradient chunk')
    ap.add_argument('--reps', type=int, default=5)
    ap.add_argument('--bf16', action='store_true',
                    help='profile the run_bfloat16 fast path')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.models import ptychography as pt
    from adorym_tpu.ops import patches as patch_ops
    from adorym_tpu.ops.rotate import rotate
    from adorym_tpu.optim import optimizers as opt_lib
    from adorym_tpu.optim.optimizers import OptSpec

    n, pn, b = args.n, args.probe, args.binning
    nz_b = n // b
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', binning=b),
        train=TrainConfig(minibatch_size=args.chunk, learning_rate=1e-7,
                          run_bfloat16=args.bf16))

    rng = np.random.default_rng(0)
    obj = jnp.asarray(rng.random((n, n, n, 2), np.float32) * 1e-3)
    probe = jnp.asarray(np.stack([np.ones((1, pn, pn), np.float32),
                                  np.zeros((1, pn, pn), np.float32)], -1))
    k = int(round(args.chunk ** 0.5))
    xs = (np.arange(k) * ((n - pn) // max(1, k - 1))).clip(0, n - pn)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1)[:args.chunk]
    pos_d = jnp.asarray(pos, jnp.int32)
    meas = jnp.asarray(rng.random((args.chunk, pn, pn), np.float32))
    theta = jnp.asarray(0.3, jnp.float32)

    results = {}

    # Dispatch + fence round-trip floor (remote tunnels pay ~10s of ms per
    # host fetch); subtracted from every phase below.
    tiny = jnp.zeros((8,), jnp.float32)
    rtt = timeit(fence(lambda x: x + 1.0), tiny, reps=max(10, args.reps))

    rot = fence(lambda o, th: rotate(o, th))
    results['rotate_fwd'] = timeit(rot, obj, theta, reps=args.reps)
    obj_rot = rot(obj, theta)

    prebin = fence(lambda o: o.reshape(n, n, nz_b, b, 2).sum(axis=3))
    results['prebin'] = timeit(prebin, obj_rot, reps=args.reps)
    obj_b = prebin(obj_rot)

    batch = {'i_theta': jnp.asarray(0, jnp.int32), 'theta': theta,
             'pos_batch': pos_d.astype(jnp.float32),
             'ind_batch': jnp.arange(args.chunk, dtype=jnp.int32)}

    def chunk_grad(ob, pr, meas):
        # Mirrors recon.patch_accum: under run_bfloat16 the patches are
        # extracted from a bf16 copy (value-identical, half the bytes)
        # and the cotangent comes back bf16.
        if args.bf16:
            ob = ob.astype(jnp.bfloat16)
        sub = patch_ops.extract_patches(ob, pos_d, (pn, pn))

        def loss(sub):
            pred = pt.predict_from_patches({'probe': pr}, batch, sub, cfg,
                                           prebinned_z=True)
            return jnp.mean((pred - meas) ** 2)

        return jax.grad(loss)(sub)

    cg = fence(chunk_grad)
    results[f'grad_chunk[{args.chunk}]'] = timeit(cg, obj_b, probe, meas,
                                                  reps=args.reps)
    g_sub = cg(obj_b, probe, meas)

    stride = int(pos[1, 1] - pos[0, 1]) if len(pos) > 1 else pn
    row = k

    def scatter(acc, g_sub):
        for r in range(len(pos) // row):
            acc = patch_ops.scatter_rowgrid_add(
                acc, g_sub[r * row:(r + 1) * row],
                jnp.asarray(pos[r * row, 0]), jnp.asarray(pos[r * row, 1]),
                stride)
        return acc

    sc = fence(scatter)
    results['scatter'] = timeit(sc, jnp.zeros_like(obj_b), g_sub,
                                reps=args.reps)

    sc2 = fence(lambda acc, g: patch_ops.scatter_grid2d_add(
        acc, g, jnp.asarray(pos[0, 0]), jnp.asarray(pos[0, 1]), stride,
        len(pos) // row))
    results['scatter_grid2d'] = timeit(sc2, jnp.zeros_like(obj_b), g_sub,
                                       reps=args.reps)

    # Same ops with the trailing [z, 2] flattened so the minor axis is
    # 64-wide instead of 2-wide (lane-utilization probe).
    g_flat = fence(lambda g: g.reshape(g.shape[:3] + (-1,)))(g_sub)
    acc_flat = jnp.zeros((obj_b.shape[0], obj_b.shape[1], nz_b * 2),
                         jnp.float32)
    sc3 = fence(lambda acc, g: patch_ops.scatter_grid2d_add(
        acc, g, jnp.asarray(pos[0, 0]), jnp.asarray(pos[0, 1]), stride,
        len(pos) // row))
    results['scatter_g2d_flat'] = timeit(sc3, acc_flat, g_flat,
                                         reps=args.reps)
    sc4 = fence(lambda acc, g: scatter(acc, g))
    results['scatter_row_flat'] = timeit(sc4, acc_flat, g_flat,
                                         reps=args.reps)
    from adorym_tpu.ops import pallas_scatter_grid as psg
    if psg.supported(g_sub.shape, stride):
        sc5 = fence(lambda acc, g: psg.scatter_grid2d_add_pallas(
            acc, g, jnp.asarray(pos[0, 0]), jnp.asarray(pos[0, 1]),
            stride, len(pos) // row,
            interpret=jax.devices()[0].platform != 'tpu'))
        results['scatter_g2d_pallas'] = timeit(
            sc5, jnp.zeros_like(obj_b), g_sub, reps=args.reps)

        def scatter_row_pallas(acc, g_sub):
            for r in range(len(pos) // row):
                acc = psg.scatter_rowgrid_add_pallas(
                    acc, g_sub[r * row:(r + 1) * row],
                    jnp.asarray(pos[r * row, 0]),
                    jnp.asarray(pos[r * row, 1]), stride,
                    interpret=jax.devices()[0].platform != 'tpu')
            return acc

        sc6 = fence(scatter_row_pallas)
        results['scatter_row_pallas'] = timeit(
            sc6, jnp.zeros_like(obj_b), g_sub, reps=args.reps)
    acc_b = jnp.zeros_like(obj_b)

    # In-situ flat-layout probe: the whole chunk body (extract from a
    # [Y,X,zb*2] object, reshape to 5D for the physics, grad, reshape the
    # cotangent back to flat) — is the 17%-faster flat scatter eaten by
    # reshape copies inside the scan body?
    obj_flat2 = fence(lambda o: o.reshape(n, n, nz_b * 2))(obj_b)

    def chunk_grad_flat(ob_flat, pr, meas):
        sub_f = patch_ops.extract_patches(ob_flat, pos_d, (pn, pn))

        def loss(sub_f):
            sub = sub_f.reshape(sub_f.shape[:3] + (nz_b, 2))
            pred = pt.predict_from_patches({'probe': pr}, batch, sub, cfg,
                                           prebinned_z=True)
            return jnp.mean((pred - meas) ** 2)

        return jax.grad(loss)(sub_f)

    cgf = fence(chunk_grad_flat)
    results['grad_chunk_flat'] = timeit(cgf, obj_flat2, probe, meas,
                                        reps=args.reps)

    def chunk_grad_obj(ob, pr, meas):
        # Variant: differentiate straight to the (binned) object — the
        # extract_patches VJP is XLA's generic scatter-add.
        def loss(ob):
            sub = patch_ops.extract_patches(ob, pos_d, (pn, pn))
            pred = pt.predict_from_patches({'probe': pr}, batch, sub, cfg,
                                           prebinned_z=True)
            return jnp.mean((pred - meas) ** 2)

        return jax.grad(loss)(ob)

    cgo = fence(chunk_grad_obj)
    xla_scatter_ms = timeit(cgo, obj_b, probe, meas, reps=args.reps)

    expand = fence(lambda g: jnp.repeat(g, b, axis=2)[:, :, :n])
    results['expand'] = timeit(expand, acc_b, reps=args.reps)
    g_full = expand(acc_b)

    rot_back = fence(lambda g, th: rotate(g, -th))
    results['rotate_back'] = timeit(rot_back, g_full, theta, reps=args.reps)

    spec = OptSpec(kind='adam', step_size=1e-7)
    state = opt_lib.opt_init(spec, obj)
    apply_ = fence(lambda p, g, s: opt_lib.opt_apply(spec, p, g, s,
                                                     jnp.asarray(3)))
    results['adam_apply'] = timeit(apply_, obj, g_full, state, reps=args.reps)

    results = {k_: max(0.0, v - rtt) for k_, v in results.items()}
    # The alternative scatter formulations are A/B probes of ONE pipeline
    # phase — excluded from the pipeline total.
    ab_only = ('scatter_grid2d', 'scatter_g2d_flat', 'scatter_row_flat', 'grad_chunk_flat', 'scatter_g2d_pallas', 'scatter_row_pallas')
    total = sum(v for k_, v in results.items() if k_ not in ab_only)
    print(f'\n{args.n}^3, probe {pn}^2, binning {b}, chunk {args.chunk} '
          f'on {jax.devices()[0].platform} '
          f'(dispatch+fence floor {rtt:.1f} ms, subtracted):')
    for k_, v in results.items():
        tag = ' [A/B]' if k_ in ab_only else ''
        pct = f'({100 * v / total:4.1f}%)' if k_ not in ab_only else ''
        print(f'  {k_:>18}: {v:8.2f} ms  {pct}{tag}')
    print(f'  {"sum":>18}: {total:8.2f} ms '
          f'-> {args.chunk / total * 1e3:.0f} patterns/s equivalent')
    print(f'  [A/B] grad chunk with XLA generic scatter instead of '
          f'extract+rowgrid: {max(0.0, xla_scatter_ms - rtt):.2f} ms')


if __name__ == '__main__':
    main()
