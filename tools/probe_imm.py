#!/usr/bin/env python
"""Decompose the IMMEDIATE-scheme per-batch step at the flagship config.

BENCH_r04 put the reference-default ``update_scheme='immediate'`` at
~1,034 patterns/s (band step, mb 23) = ~22 ms/batch, 13x below the
per-angle headline, with no phase accounting (VERDICT r4 weak #1).

Methodology: the remote tunnel's per-dispatch round trip (~20-25 ms)
swamps single-call timings, so every variant runs as a ``lax.scan`` of
K chained steps (carry = object[+moments]) and the per-step cost is the
SLOPE between two K values.  Phase isolation is by dead-code
elimination: each variant's carry depends only on the stages it keeps,
so XLA drops the rest.

  band        carry <- o + 0*rb[0,0,0,0]        (band gather+rotate only)
  grad        carry <- o + 0*loss               (+ extract + fwd/bwd)
  gd          carry <- o - lr*g_obj             (+ scatter+adjoint+slab add
                                                 + one full-object AXPY)
  full        Adam on the full object           (production step shape)
  band_adam   Adam moments touched only in the band (lazy-decay bound;
              NOT math-equal to full Adam — decayed moments outside the
              band are deferred — this times the TRAFFIC bound)

Usage: python tools/probe_imm.py [--n 256] [--bf16] [--k1 4 --k2 12]
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
    ap.add_argument('--mb', type=int, default=23)
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--k1', type=int, default=4)
    ap.add_argument('--k2', type=int, default=12)
    ap.add_argument('--reps', type=int, default=5)
    ap.add_argument('--fused', default='auto',
                    help="fused_multislice ('auto'|'on'|'off') — 'off' "
                         'A/Bs the XLA-FFT z-scan at the small immediate '
                         'batch')
    ap.add_argument('--only', default=None,
                    help='comma list of variants to run (default all)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu import recon as rec_mod
    from adorym_tpu.models import ptychography as pmod
    from adorym_tpu.models import base as model_base
    from adorym_tpu.ops import patches as patch_ops
    from adorym_tpu.utils.initialize import initialize_probe

    n, pn, mb = args.n, args.probe, args.mb
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', binning=args.binning),
        train=TrainConfig(minibatch_size=mb, learning_rate=1e-7,
                          update_scheme='immediate',
                          fused_multislice=args.fused,
                          run_bfloat16=args.bf16))
    stride = 8
    xs = np.arange(23) * stride - 4
    pos_row = np.stack([np.full(23, xs[11]), xs], -1).astype(np.float32)
    px0 = px1 = 4
    nzb = -(-n // args.binning)
    py, px = pn, pn

    rng = np.random.default_rng(0)
    obj0 = jnp.asarray(rng.random((n, n, n, 2), np.float32) * 1e-3)
    probe = jnp.asarray(initialize_probe(
        (pn, pn), 'gaussian', energy_ev=5000.0, psize_cm=1e-7,
        probe_mag_sigma=20, probe_phase_sigma=20, probe_phase_max=0.3))
    theta = jnp.asarray(0.3, jnp.float32)
    meas = jnp.asarray(rng.random((mb, pn, pn), np.float32))

    y0 = int(pos_row[0, 0])
    u = y0 + np.arange(py)
    valid = jnp.asarray(((u >= 0) & (u < n))[:, None, None, None])
    idx = jnp.asarray(np.clip(u, 0, n - 1))
    posi = jnp.asarray(
        np.stack([np.zeros(mb, np.int64),
                  np.round(pos_row[:, 1]).astype(np.int64) + px0], 1))
    aux = {'probe': probe}

    def stages(o):
        rb = rec_mod._band_rotate_fwd(o[idx], valid, theta, cfg, px0, px1)
        batch = {'i_theta': jnp.asarray(0, jnp.int32), 'theta': theta,
                 'pos_batch': posi.astype(jnp.float32),
                 'ind_batch': jnp.arange(mb, dtype=jnp.int32)}

        def mismatch(subobj, aux_p):
            pred = pmod.predict_from_patches(aux_p, batch, subobj, cfg,
                                             prebinned_z=True)
            return model_base.mismatch_loss(
                pred, meas, cfg.loss.loss_function_type,
                cfg.loss.raw_data_type, cfg.loss.poisson_multiplier, None)

        subobj = patch_ops.extract_patches(rb, posi, (py, px))
        loss, (g_sub, g_aux) = jax.value_and_grad(
            mismatch, argnums=(0, 1))(subobj, aux)
        acc = jnp.zeros((py, n + px0 + px1, nzb, 2), jnp.float32)
        acc = patch_ops.scatter_rowgrid_add(acc, g_sub, posi[0, 0],
                                            posi[0, 1], stride)
        g_band = rec_mod._band_adjoint_back(acc, valid, theta, cfg,
                                            px0, n, n)
        g_obj = jnp.zeros_like(o).at[idx].add(g_band)
        return rb, loss, g_band, g_obj

    lr, b1, b2, eps = 1e-7, 0.9, 0.999, 1e-8

    def v_band(carry, _):
        o, m, v = carry
        rb = rec_mod._band_rotate_fwd(o[idx], valid, theta, cfg, px0, px1)
        o = o + 0.0 * rb[0, 0, 0, 0].astype(jnp.float32)
        return (o, m, v), ()

    def v_grad(carry, _):
        o, m, v = carry
        _, loss, _, _ = stages(o)
        return (o + 0.0 * loss, m, v), ()

    def v_gd(carry, _):
        o, m, v = carry
        _, _, _, g_obj = stages(o)
        return (o - lr * g_obj, m, v), ()

    def v_full(carry, _):
        o, m, v = carry
        _, _, _, g = stages(o)
        m2 = b1 * m + (1 - b1) * g
        v2 = b2 * v + (1 - b2) * g * g
        return (o - lr * m2 / (jnp.sqrt(v2) + eps), m2, v2), ()

    def v_band_adam(carry, _):
        o, m, v = carry
        _, _, g_band, _ = stages(o)
        m2 = b1 * m[idx] + (1 - b1) * g_band
        v2 = b2 * v[idx] + (1 - b2) * g_band * g_band
        upd = -lr * m2 / (jnp.sqrt(v2) + eps)
        return (o.at[idx].add(upd), m.at[idx].set(m2),
                v.at[idx].set(v2)), ()

    def stages_fine(o):
        """Like stages() but returning every intermediate for the finer
        back-stage decomposition."""
        rb = rec_mod._band_rotate_fwd(o[idx], valid, theta, cfg, px0, px1)
        batch = {'i_theta': jnp.asarray(0, jnp.int32), 'theta': theta,
                 'pos_batch': posi.astype(jnp.float32),
                 'ind_batch': jnp.arange(mb, dtype=jnp.int32)}

        def mismatch(subobj, aux_p):
            pred = pmod.predict_from_patches(aux_p, batch, subobj, cfg,
                                             prebinned_z=True)
            return model_base.mismatch_loss(
                pred, meas, cfg.loss.loss_function_type,
                cfg.loss.raw_data_type, cfg.loss.poisson_multiplier, None)

        subobj = patch_ops.extract_patches(rb, posi, (py, px))
        loss, (g_sub, g_aux) = jax.value_and_grad(
            mismatch, argnums=(0, 1))(subobj, aux)
        acc = jnp.zeros((py, n + px0 + px1, nzb, 2), jnp.float32)
        acc = patch_ops.scatter_rowgrid_add(acc, g_sub, posi[0, 0],
                                            posi[0, 1], stride)
        return loss, acc

    def v_scatter(carry, _):
        o, m, v = carry
        _, acc = stages_fine(o)
        return (o + 0.0 * jnp.sum(acc), m, v), ()

    def v_adjoint(carry, _):
        o, m, v = carry
        _, acc = stages_fine(o)
        g_band = rec_mod._band_adjoint_back(acc, valid, theta, cfg,
                                            px0, n, n)
        return (o + 0.0 * jnp.sum(g_band), m, v), ()

    def v_slabadd(carry, _):
        o, m, v = carry
        _, acc = stages_fine(o)
        g_band = rec_mod._band_adjoint_back(acc, valid, theta, cfg,
                                            px0, n, n)
        g_obj = jnp.zeros_like(o).at[idx].add(g_band)
        return (o + 0.0 * jnp.sum(g_obj), m, v), ()

    import dataclasses as _dc
    cfg_interp = _dc.replace(
        cfg, train=_dc.replace(cfg.train, imm_grad_rotation='interp'))

    def v_interp(carry, _):
        """Production step shape with imm_grad_rotation='interp' (the
        fused -theta gather reading the binned accumulator)."""
        o, m, v = carry
        _, acc = stages_fine(o)
        g_band = rec_mod._band_grad_back(acc, valid, theta, cfg_interp,
                                         px0, n, n)
        g = jnp.zeros_like(o).at[idx].add(g_band)
        m2 = b1 * m + (1 - b1) * g
        v2 = b2 * v + (1 - b2) * g * g
        return (o - lr * m2 / (jnp.sqrt(v2) + eps), m2, v2), ()

    def v_taps(carry, _):
        """Production step shape with the tap-gather EXACT adjoint
        (rotate_adjoint_taps reading the binned accumulator)."""
        from adorym_tpu.ops.rotate import rotate_adjoint_taps
        o, m, v = carry
        _, acc = stages_fine(o)
        gb = acc[:, px0:px0 + n]
        g_band = rotate_adjoint_taps(gb, theta, binning=args.binning,
                                     nz_full=n)
        g_band = jnp.where(valid, g_band, 0.0)
        g = jnp.zeros_like(o).at[idx].add(g_band)
        m2 = b1 * m + (1 - b1) * g
        v2 = b2 * v + (1 - b2) * g * g
        return (o - lr * m2 / (jnp.sqrt(v2) + eps), m2, v2), ()

    variants = {'band': v_band, 'grad': v_grad,
                'scatter': v_scatter, 'adjoint': v_adjoint,
                'slabadd': v_slabadd, 'gd': v_gd,
                'full': v_full, 'band_adam': v_band_adam,
                'interp': v_interp, 'taps': v_taps}

    def make_scan(body, k):
        @jax.jit
        def run(o, m, v):
            (o, m, v), _ = jax.lax.scan(body, (o, m, v), None, length=k)
            return (o.ravel()[0] + m.ravel()[0] + v.ravel()[0])
        return run

    def timed(run):
        zeros = jnp.zeros_like(obj0)
        float(run(obj0, zeros, zeros))       # compile + warm
        best = float('inf')
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run(obj0, zeros, zeros))
            best = min(best, time.perf_counter() - t0)
        return best

    print(f'devices: {jax.devices()}  bf16={args.bf16} '
          f'fused={args.fused}', flush=True)
    if args.only:
        keep = args.only.split(',')
        variants = {k: v for k, v in variants.items() if k in keep}
    slopes = {}
    for name, body in variants.items():
        t1 = timed(make_scan(body, args.k1))
        t2 = timed(make_scan(body, args.k2))
        slope = (t2 - t1) / (args.k2 - args.k1) * 1e3
        slopes[name] = slope
        print(f'{name:10s} K{args.k1} {t1*1e3:8.1f} ms  K{args.k2} '
              f'{t2*1e3:8.1f} ms  -> {slope:7.2f} ms/step', flush=True)

    if args.only:
        return
    print('\nphase decomposition (ms/step):')
    print(f"  band rotate+gather      {slopes['band']:7.2f}")
    print(f"  extract+grad (mb {args.mb:3d})   "
          f"{slopes['grad'] - slopes['band']:7.2f}")
    print(f"  rowgrid scatter         "
          f"{slopes['scatter'] - slopes['grad']:7.2f}")
    print(f"  repeat+exact adjoint    "
          f"{slopes['adjoint'] - slopes['scatter']:7.2f}")
    print(f"  slab add (at[idx].add)  "
          f"{slopes['slabadd'] - slopes['adjoint']:7.2f}")
    print(f"  GD full-object write    {slopes['gd'] - slopes['slabadd']:7.2f}")
    print(f"  Adam extra (m/v traffic){slopes['full'] - slopes['gd']:7.2f}")
    print(f"  full step               {slopes['full']:7.2f}  "
          f"(= {args.mb / slopes['full'] * 1e3:.0f} pps)")
    print(f"  band-Adam step          {slopes['band_adam']:7.2f}  "
          f"(= {args.mb / slopes['band_adam'] * 1e3:.0f} pps)")
    print(f"  interp-back step        {slopes['interp']:7.2f}  "
          f"(= {args.mb / slopes['interp'] * 1e3:.0f} pps)")
    print(f"  taps-EXACT step         {slopes['taps']:7.2f}  "
          f"(= {args.mb / slopes['taps'] * 1e3:.0f} pps)")


if __name__ == '__main__':
    main()
