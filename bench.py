"""Benchmark: 256^3 multislice ptychotomography training step throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "patterns/s/chip", "vs_baseline": N}

Config mirrors the reference flagship (``demos/multislice_ptycho_256_theta.py``:
256^3 cone object, 23x23 scan positions per angle, 72^2 probe, Fraunhofer
far field, binning 8, Adam).  The measured quantity is steady-state
diffraction patterns/sec/chip for the full jitted training step
(forward + AD + optimizer update), the reference's "angles/sec" analog
(``adorym/ptychography.py:1255``).

Baseline: the same step in the reference implementation (PyTorch CPU
backend) measured once on this machine and cached to
``.bench_baseline.json``; ``vs_baseline`` assumes ideal linear scaling to
the 8-rank MPI CPU configuration (generous to the reference).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, '.bench_baseline.json')

# Flagship geometry (demos/multislice_ptycho_256_theta.py:52-93)
N_OBJ = 256
N_PROBE = 72
MINIBATCH = 23
BINNING = 8
ENERGY_EV = 5000.0
PSIZE_CM = 1.e-7
N_STEPS_MEASURE = 12


def _positions():
    xs = np.arange(23) * 8 - 4  # 23x23 grid, stride 8 (roughly the demo's)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    return np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float64)


def measure_ours() -> float:
    import jax
    import jax.numpy as jnp
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.recon import Reconstructor

    cfg = ReconConfig(
        geometry=Geometry(obj_size=(N_OBJ, N_OBJ, N_OBJ),
                          probe_size=(N_PROBE, N_PROBE),
                          energy_ev=ENERGY_EV, psize_cm=PSIZE_CM,
                          free_prop_cm='inf', binning=BINNING),
        train=TrainConfig(minibatch_size=MINIBATCH, learning_rate=1e-7,
                          optimizer='adam'),
    )
    pos = _positions()
    rng = np.random.default_rng(0)
    n_theta = 4
    data = rng.random((n_theta, len(pos), N_PROBE, N_PROBE)).astype(np.float32)
    theta_ls = np.linspace(0, np.pi, n_theta, endpoint=False)
    obj0 = np.zeros((N_OBJ, N_OBJ, N_OBJ, 2), np.float32)
    rec = Reconstructor(cfg, data=data, probe_pos=pos, theta_ls=theta_ls,
                        obj_init=obj0)

    batches = rec.make_batches(np.random.default_rng(0))[:N_STEPS_MEASURE + 3]

    def run_one(i_theta, inds):
        batch = {
            'i_theta': jnp.asarray(i_theta, jnp.int32),
            'theta': jnp.asarray(rec.theta_ls[i_theta], jnp.float32),
            'pos_batch': jnp.asarray(rec.probe_pos[inds], jnp.float32),
            'ind_batch': jnp.asarray(inds, jnp.int32),
        }
        measured = jnp.asarray(rec.data[i_theta][inds])
        rec.params, rec.opt_state, loss = rec._step(
            rec.params, rec.opt_state, batch, measured, rec.weight_l1,
            jnp.asarray(rec.i_opt_batch, jnp.int32),
            jnp.asarray(rec.global_batch, jnp.int32))
        return loss

    # Warmup (compile + first execution).  NOTE: under the axon tunnel
    # ``block_until_ready`` is a no-op; only a device->host fetch
    # (``float``) actually synchronizes, so every timing fence below is a
    # scalar fetch.
    for i_theta, inds in batches[:3]:
        float(run_one(i_theta, inds))
    # Sustained throughput: enqueue the measured steps back-to-back and
    # fence once on the final loss — the params chain makes it depend on
    # every prior step, so the fetch waits for the whole pipeline.
    t0 = time.time()
    loss = None
    for i_theta, inds in batches[3:3 + N_STEPS_MEASURE]:
        loss = run_one(i_theta, inds)
    float(loss)
    dt = time.time() - t0
    return MINIBATCH * N_STEPS_MEASURE / dt


def measure_reference_baseline() -> float:
    """One training batch of the same config in the reference (PyTorch CPU),
    via its public wrappers — measured, not assumed."""
    import types
    import importlib

    # The reference hard-imports dxchange (tiff I/O) at module load; it is
    # not used on the compute path we time.
    if 'dxchange' not in sys.modules:
        stub = types.ModuleType('dxchange')
        stub.read_tiff = lambda *a, **k: np.zeros((1, 1), np.float32)
        stub.write_tiff = lambda *a, **k: None
        sys.modules['dxchange'] = stub
    sys.path.insert(0, '/root/reference')
    import adorym.wrappers as w
    import adorym.global_settings as gs
    from adorym.propagate import multislice_propagate_batch

    gs.backend = 'pytorch'
    import torch as tc

    rng = np.random.default_rng(0)
    # One minibatch of sub-objects through multislice + Fraunhofer + lsq
    # loss + autograd backward — the per-batch compute of the flagship run.
    subobj = tc.tensor(rng.random((MINIBATCH, N_PROBE, N_PROBE, N_OBJ, 2),
                                  ).astype(np.float32) * 1e-3,
                       requires_grad=True)
    probe_r = tc.tensor(np.ones((MINIBATCH, N_PROBE, N_PROBE), np.float32))
    probe_i = tc.tensor(np.zeros((MINIBATCH, N_PROBE, N_PROBE), np.float32))
    target = tc.tensor(rng.random((MINIBATCH, N_PROBE, N_PROBE)
                                  ).astype(np.float32))

    def one_step():
        ex_r, ex_i = multislice_propagate_batch(
            subobj, probe_r, probe_i, ENERGY_EV, PSIZE_CM,
            free_prop_cm='inf', binning=BINNING,
            obj_batch_shape=[MINIBATCH, N_PROBE, N_PROBE, N_OBJ],
            type='delta_beta', sign_convention=1)
        mag = tc.sqrt(ex_r ** 2 + ex_i ** 2)
        loss = tc.mean((mag - target) ** 2)
        loss.backward()

    one_step()  # warmup
    t0 = time.time()
    one_step()
    dt = time.time() - t0
    return MINIBATCH / dt


def get_baseline() -> dict:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    try:
        pps_1rank = measure_reference_baseline()
        entry = {'reference_patterns_per_sec_1rank_cpu': pps_1rank,
                 'assumed_ranks': 8,
                 'reference_patterns_per_sec_8rank_cpu': pps_1rank * 8}
    except Exception as e:  # reference not runnable here
        entry = {'error': f'{type(e).__name__}: {e}',
                 'reference_patterns_per_sec_8rank_cpu': None}
    with open(BASELINE_CACHE, 'w') as f:
        json.dump(entry, f)
    return entry


def main():
    ours = measure_ours()
    base = get_baseline()
    ref = base.get('reference_patterns_per_sec_8rank_cpu')
    vs = (ours / ref) if ref else None
    print(json.dumps({
        'metric': 'ptychotomo_256_patterns_per_sec_per_chip',
        'value': round(ours, 3),
        'unit': 'patterns/s/chip',
        'vs_baseline': round(vs, 3) if vs else None,
    }))


if __name__ == '__main__':
    main()
