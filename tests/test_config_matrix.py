"""Cross-feature configuration matrix: combinations of scheme / rotation /
precision / optimizer / refinement / regularization knobs that no single
feature test crosses.  Each combo runs a short 3D reconstruction and must
(a) not crash, (b) produce finite, DECREASING loss.  This is the guard
against silent mis-gated feature interactions (the round-2 escape was
exactly one of these: tilt + rotate_out_of_loop double-rotated, with every
individual feature test green)."""

import dataclasses

import numpy as np
import pytest

from adorym_tpu.config import (Geometry, LossConfig, ReconConfig,
                               RefineConfig, TrainConfig)
from adorym_tpu.recon import Reconstructor
from adorym_tpu.simulate import simulate
from adorym_tpu.utils.initialize import initialize_probe

N, PN, N_THETA = 16, 8, 3


@pytest.fixture(scope='module')
def drive():
    rng = np.random.default_rng(5)
    obj_true = np.stack([rng.random((N, N, N)) * 1e-3,
                         rng.random((N, N, N)) * 3e-5],
                        -1).astype(np.float32)
    probe = initialize_probe((PN, PN), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=3,
                             probe_phase_sigma=3, probe_phase_max=0.3)
    xs = np.arange(0, N - PN + 1, 8)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float64)
    theta_ls = np.linspace(0, np.pi, N_THETA, endpoint=False)
    geo = Geometry(obj_size=(N, N, N), probe_size=(PN, PN),
                   energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf',
                   binning=2)
    cfg = ReconConfig(geometry=geo, train=TrainConfig(minibatch_size=2))
    data = simulate(cfg, obj_true, probe, pos, theta_ls)
    return geo, data, pos, probe, theta_ls


CASES = [
    # (label, train overrides, refine overrides, loss overrides)
    ('perangle_rol_bf16_modes',
     dict(update_scheme='per angle', rotate_out_of_loop=True,
          run_bfloat16=True, n_probe_modes=2),
     dict(optimize_probe=True), {}),
    ('perangle_rol_shrink_tv',
     dict(update_scheme='per angle', rotate_out_of_loop=True,
          shrink_cycle=2, shrink_threshold=1e-9),
     {}, dict(gamma=1e-9)),
    ('immediate_rwl1_positions',
     dict(), dict(optimize_all_probe_pos=True,
                  all_probe_pos_learning_rate=1e-3),
     dict(alpha_d=1e-8, alpha_b=1e-9, reweighted_l1=True)),
    ('fixed_tilt_probe_opt_bf16',
     dict(run_bfloat16=True),
     dict(fixed_tilt=True, optimize_probe=True), {}),
    ('perangle_rol_posoffset_momentum',
     dict(update_scheme='per angle', rotate_out_of_loop=True,
          optimizer='momentum'),
     dict(optimize_probe_pos_offset=True), {}),
    ('tilt_refine_immediate_modes',
     dict(n_probe_modes=2),
     dict(optimize_tilt=True, tilt_learning_rate=1e-5), {}),
    ('perangle_norol_nonneg_exactrot',
     dict(update_scheme='per angle', exact_grad_rotation=True,
          non_negativity=True), {}, {}),
    ('rol_immediate_scheme_l1',
     dict(rotate_out_of_loop=True), {},
     dict(alpha_d=1e-8, alpha_b=1e-9)),
    ('imm_interp_bf16_shrink_positions',
     dict(imm_grad_rotation='interp', run_bfloat16=True,
          shrink_cycle=2, shrink_threshold=1e-9),
     dict(optimize_all_probe_pos=True,
          all_probe_pos_learning_rate=1e-3), {}),
]


MESH_CASES = [
    ('mesh_perangle_rol_shrink',
     dict(update_scheme='per angle', rotate_out_of_loop=True,
          shrink_cycle=2, shrink_threshold=1e-9), {}, {}),
    ('mesh_offload_state_probe_opt',
     dict(), dict(optimize_probe=True), {}),
    ('mesh_rwl1_immediate',
     dict(), {}, dict(alpha_d=1e-8, alpha_b=1e-9, reweighted_l1=True)),
    ('mesh_imm_interp_probe_opt',
     dict(imm_grad_rotation='interp'), dict(optimize_probe=True), {}),
]


@pytest.mark.parametrize('label,train_kw,refine_kw,loss_kw',
                         MESH_CASES, ids=[c[0] for c in MESH_CASES])
def test_feature_combination_mesh(drive, label, train_kw, refine_kw,
                                  loss_kw):
    """The same interaction guard under a (dp=2, op=2) mesh (+ offloaded
    moments in one case)."""
    from adorym_tpu.config import ParallelConfig
    from adorym_tpu.parallel.mesh import make_mesh
    geo, data, pos, probe, theta_ls = drive
    pcfg = ParallelConfig(data_axis=2, object_axis=2,
                          offload_optimizer_state='offload' in label)
    cfg = ReconConfig(
        geometry=geo,
        train=TrainConfig(minibatch_size=2, learning_rate=1e-6,
                          **train_kw),
        refine=RefineConfig(**refine_kw),
        loss=LossConfig(**loss_kw),
        parallel=pcfg)
    rec = Reconstructor(cfg, mesh=make_mesh(pcfg), data=data,
                        probe_pos=pos, probe_init=probe,
                        theta_ls=theta_ls,
                        obj_init=np.zeros((N, N, N, 2), np.float32))
    losses = [float(np.mean(rec.run_epoch(ep))) for ep in range(8)]
    assert np.all(np.isfinite(losses)), (label, losses)
    assert losses[-1] < losses[0], (label, losses)


@pytest.mark.parametrize('label,train_kw,refine_kw,loss_kw',
                         CASES, ids=[c[0] for c in CASES])
def test_feature_combination(drive, label, train_kw, refine_kw, loss_kw):
    geo, data, pos, probe, theta_ls = drive
    tilted = refine_kw.get('fixed_tilt') or refine_kw.get('optimize_tilt')
    cfg = ReconConfig(
        geometry=geo,
        train=TrainConfig(minibatch_size=2, learning_rate=1e-6,
                          **train_kw),
        refine=RefineConfig(**refine_kw),
        loss=LossConfig(**loss_kw))
    aux = {}
    if tilted:
        aux['tilt_ls'] = np.stack(
            [theta_ls + 0.01, np.full(N_THETA, 0.01),
             np.full(N_THETA, -0.005)]).astype(np.float32)
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        theta_ls=theta_ls,
                        obj_init=np.zeros((N, N, N, 2), np.float32),
                        aux_init=aux or None)
    losses = [float(np.mean(rec.run_epoch(ep))) for ep in range(8)]
    assert np.all(np.isfinite(losses)), (label, losses)
    assert losses[-1] < losses[0], (label, losses)
