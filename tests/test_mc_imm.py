"""Mesh IMMEDIATE-update fast path (``_build_mc_imm_step``): the
multi-chip composition of the reference's DEFAULT update scheme
(``adorym/ptychography.py:1095-1099``; flagship demo config
``demos/multislice_ptycho_256_theta.py:66-87``) — per-batch band-granular
steps over the (dp, op) mesh, trajectory-equal to the single-device
immediate-fused epoch."""

import dataclasses as dc
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adorym_tpu.config import (Geometry, ParallelConfig, ReconConfig,
                               RefineConfig, TrainConfig)
from adorym_tpu.parallel.mesh import make_mesh
from adorym_tpu.recon import Reconstructor
from adorym_tpu.simulate import simulate
from adorym_tpu.utils.initialize import initialize_probe


def _setup(seed=0, nz=8, binning=2, mb=4, pn=8, stride=8, n=32,
           refine=None, **train_kw):
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, nz), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', binning=binning),
        refine=refine or RefineConfig(),
        train=TrainConfig(minibatch_size=mb, update_scheme='immediate',
                          seed=seed,
                          **{'learning_rate': 1e-4, **train_kw}))
    rng = np.random.default_rng(seed)
    obj_true = np.stack([rng.random((n, n, nz)) * 1e-3,
                         rng.random((n, n, nz)) * 3e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=2,
                             probe_phase_sigma=2, probe_phase_max=0.3)
    xs = np.arange(0, n - pn + 1, stride)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    theta_ls = np.linspace(0, np.pi, 3, endpoint=False)
    data = simulate(cfg, obj_true, probe, pos, theta_ls)
    return cfg, obj_true, probe, pos, theta_ls, data


def _pair(cfg, obj_true, probe, pos, theta_ls, data, dp, op):
    kw = dict(data=data, probe_pos=pos, probe_init=probe,
              theta_ls=theta_ls, obj_init=(obj_true * 0.5).copy())
    rec1 = Reconstructor(cfg, **kw)
    import dataclasses as dc
    pcfg = ParallelConfig(data_axis=dp, object_axis=op)
    cfg_m = dc.replace(cfg, parallel=pcfg)
    rec8 = Reconstructor(cfg_m, mesh=make_mesh(pcfg), **kw)
    return rec1, rec8


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
class TestMcImmediate:
    @pytest.mark.parametrize('dp,op', [(2, 2), (1, 4), (2, 4)])
    def test_engages_and_matches_single_device(self, dp, op):
        """The mesh takes the immediate fast path and its trajectory
        matches the single-device immediate-fused epoch to f32 noise.
        (Tolerances are looser than the per-angle mc tests': immediate
        applies 12 Adam updates/epoch whose early 1/sqrt(v) division
        amplifies reduction-order noise — a SINGLE step from identical
        params matches to 1.6e-8, measured.)"""
        mb = 8 if dp * op == 8 else 4
        pn = 4 if dp * op == 8 else 8
        stride = 4 if dp * op == 8 else 8
        # GD for the tight trajectory bound: it is LINEAR in the gradient,
        # so reduction-order noise stays additive (~1e-6) instead of being
        # amplified through Adam's sign-like 1/sqrt(v) at near-zero-grad
        # voxels (each flip is an lr-sized divergence; see the Adam test
        # below for the global-agreement check).
        args = _setup(mb=mb, pn=pn, stride=stride, optimizer='gd',
                      learning_rate=1e-3)
        rec1, rec8 = _pair(*args, dp, op)
        assert rec8._mci is not None, rec8._mc_decline_reasons
        for ep in range(3):
            l1 = rec1.run_epoch(ep)
            l8 = rec8.run_epoch(ep)
            np.testing.assert_allclose(l1, l8, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(rec8.params['obj']),
                                   np.asarray(rec1.params['obj']),
                                   rtol=1e-3, atol=1e-6)

    def test_adam_trajectory_agrees_globally(self):
        """Adam trajectories: per-voxel equality is not a meaningful
        contract (near-zero-grad voxels sign-flip on 1e-8 noise), so
        assert the loss curve and the FIELD-level agreement instead."""
        args = _setup(mb=4, pn=8, stride=8)
        rec1, rec8 = _pair(*args, 2, 2)
        assert rec8._mci is not None
        for ep in range(3):
            l1 = rec1.run_epoch(ep)
            l8 = rec8.run_epoch(ep)
            np.testing.assert_allclose(l1, l8, rtol=5e-3)
        o1 = np.asarray(rec1.params['obj']).ravel()
        o8 = np.asarray(rec8.params['obj']).ravel()
        assert np.corrcoef(o1, o8)[0, 1] > 0.999
        assert np.abs(o1 - o8).max() < 5 * float(
            rec1.cfg.train.learning_rate) * 36  # bounded by lr per update

    def test_single_step_matches_tightly(self):
        """From IDENTICAL params, one mesh immediate step equals one
        single-device step to f32 roundoff — pins the math itself,
        independent of trajectory compounding."""
        import jax.numpy as jnp
        args = _setup(mb=4, pn=8, stride=8)
        rec1, rec8 = _pair(*args, 2, 2)
        assert rec8._mci is not None
        rng = np.random.default_rng(rec1.cfg.train.seed)
        batches = rec1.make_batches(rng)
        dev = rec8._mc_imm_device_tables()
        mci = rec8._mci
        for i_theta, inds in batches[:3] + batches[8:9]:
            theta = rec1.theta_ls[i_theta]
            batch = {'i_theta': jnp.asarray(i_theta, jnp.int32),
                     'theta': jnp.asarray(theta, jnp.float32),
                     'pos_batch': jnp.asarray(rec1.probe_pos[inds],
                                              jnp.float32),
                     'ind_batch': jnp.asarray(inds, jnp.int32)}
            measured = jnp.asarray(rec1.data[i_theta][inds])
            # Fresh pytree copies per call: both compiled fns donate their
            # params/opt_state arguments.
            cp = lambda t: jax.tree.map(jnp.array, t)
            p1, _, l1 = rec1._step(cp(rec1.params), cp(rec1.opt_state),
                                   batch, measured, rec1.weight_l1,
                                   jnp.asarray(0, jnp.int32),
                                   jnp.asarray(0, jnp.int32), None)
            irow = inds[0] // mci['mb']
            p8, _, _, l8 = rec8._mc_imm_epoch(
                cp(rec8.params), cp(rec8.opt_state),
                jnp.asarray([theta], jnp.float32),
                jnp.asarray([i_theta], jnp.int32),
                jnp.asarray([irow], jnp.int32),
                jnp.asarray([mci['y0'][irow]], jnp.int32),
                dev['pos'], dev['inds'], dev['w'], dev['data'], None,
                jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                None)
            np.testing.assert_allclose(float(l1), float(l8[0]), rtol=1e-5)
            np.testing.assert_allclose(np.asarray(p8['obj']),
                                       np.asarray(p1['obj']),
                                       rtol=1e-5, atol=1e-7)

    def test_probe_refinement_composes(self):
        """Aux-leaf (probe) per-batch updates ride the same psum and
        match single-device."""
        args = _setup(seed=2, refine=RefineConfig(
            optimize_probe=True, probe_learning_rate=1e-3))
        rec1, rec8 = _pair(*args, 2, 2)
        assert rec8._mci is not None, rec8._mc_decline_reasons
        for ep in range(2):
            l1 = rec1.run_epoch(ep)
            l8 = rec8.run_epoch(ep)
            np.testing.assert_allclose(l1, l8, rtol=5e-3)
        np.testing.assert_allclose(np.asarray(rec8.params['probe']),
                                   np.asarray(rec1.params['probe']),
                                   rtol=5e-3, atol=5e-6)

    def test_bf16_composes(self):
        """run_bfloat16 runs through the mesh immediate path and tracks
        the single-device bf16 trajectory."""
        args = _setup(seed=5, run_bfloat16=True)
        rec1, rec8 = _pair(*args, 2, 2)
        assert rec8._mci is not None, rec8._mc_decline_reasons
        for ep in range(2):
            l1 = rec1.run_epoch(ep)
            l8 = rec8.run_epoch(ep)
            # bf16 forward noise feeds the same Adam amplification; only
            # the curve-level agreement is meaningful.
            np.testing.assert_allclose(l1, l8, rtol=2e-2)

    def test_nonuniform_theta_order_consistent(self):
        """Shuffled angle order (per-epoch rng) reproduces the single-
        device batch order exactly — same losses batch-for-batch."""
        args = _setup(seed=7)
        rec1, rec8 = _pair(*args, 2, 2)
        assert rec8._mci is not None
        got1, got8 = [], []
        rec1.run_epoch(4, callback=lambda e, b, l: got1.append((b, l)))
        rec8.run_epoch(4, callback=lambda e, b, l: got8.append((b, l)))
        assert [b for b, _ in got1] == [b for b, _ in got8]
        np.testing.assert_allclose([l for _, l in got1],
                                   [l for _, l in got8], rtol=5e-3)

    def test_collective_budget_and_no_allgather(self):
        """Compiled HLO: band-sized psums only — no all-gather or
        all-to-all, no collective at full-object y extent (budget
        statement: ``_build_mc_imm_layout`` docstring)."""
        cfg, obj_true, probe, pos, theta_ls, data = _setup(
            seed=1, mb=8, pn=4, stride=4)
        pcfg = ParallelConfig(data_axis=2, object_axis=4)
        cfg_m = ReconConfig(geometry=cfg.geometry, train=cfg.train,
                            parallel=pcfg)
        rec = Reconstructor(cfg_m, mesh=make_mesh(pcfg), data=data,
                            probe_pos=pos, probe_init=probe,
                            theta_ls=theta_ls,
                            obj_init=(obj_true * 0.5).copy())
        assert rec._mci is not None, rec._mc_decline_reasons
        dev = rec._mc_imm_device_tables()
        nb = 2
        txt = rec._mc_imm_epoch.lower(
            rec.params, rec.opt_state,
            jnp.zeros(nb, jnp.float32), jnp.zeros(nb, jnp.int32),
            jnp.zeros(nb, jnp.int32), jnp.zeros(nb, jnp.int32),
            dev['pos'], dev['inds'], dev['w'], dev['data'], None,
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            None).compile().as_text()

        def op_lines(kind):
            return [l for l in txt.splitlines() if f'{kind}(' in l
                    and '=' in l]

        assert op_lines('all-gather') == []
        assert op_lines('all-to-all') == []
        Y = cfg.geometry.obj_size[0]
        py = cfg.geometry.probe_size[0]
        for l in op_lines('all-reduce') + op_lines('collective-permute'):
            for d in re.findall(r'f32\[([\d,]+)\]', l):
                dims = tuple(map(int, d.split(',')))
                if len(dims) >= 3:
                    assert dims[0] <= py, (dims, l)

    def test_small_minibatch_engages_by_padding(self):
        """mb smaller than the device count (mb=4 on 8 devices — the old
        'divisibility' decline) now ENGAGES via weight-0 spot padding
        (mpp=1, 4 virtual slots) and matches single-device."""
        args = _setup(seed=3, optimizer='gd', learning_rate=1e-3)
        rec1, rec8 = _pair(*args, 2, 4)
        assert rec8._mci is not None, rec8._mc_decline_reasons
        mci = rec8._mci
        assert mci['mb_pad'] == 8 and mci['mpp'] == 1
        assert float(mci['ws_imm'].sum()) == mci['n_rows'] * mci['mb']
        for ep in range(2):
            l1 = rec1.run_epoch(ep)
            l8 = rec8.run_epoch(ep)
            np.testing.assert_allclose(l1, l8, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(rec8.params['obj']),
                                   np.asarray(rec1.params['obj']),
                                   rtol=1e-3, atol=1e-6)

    def test_prime_row_width_collective_budget(self):
        """The padded prime-width imm geometry keeps band-sized
        collectives only (no all-gather/all-to-all; nothing at
        full-object y extent)."""
        cfg, obj_true, probe, pos, theta_ls, data = _setup(
            seed=19, mb=7, pn=8, stride=4, n=32)
        pcfg = ParallelConfig(data_axis=2, object_axis=4)
        cfg_m = ReconConfig(geometry=cfg.geometry, train=cfg.train,
                            parallel=pcfg)
        rec = Reconstructor(cfg_m, mesh=make_mesh(pcfg), data=data,
                            probe_pos=pos, probe_init=probe,
                            theta_ls=theta_ls,
                            obj_init=(obj_true * 0.5).copy())
        assert rec._mci is not None, rec._mc_decline_reasons
        dev = rec._mc_imm_device_tables()
        nb = 2
        txt = rec._mc_imm_epoch.lower(
            rec.params, rec.opt_state,
            jnp.zeros(nb, jnp.float32), jnp.zeros(nb, jnp.int32),
            jnp.zeros(nb, jnp.int32), jnp.zeros(nb, jnp.int32),
            dev['pos'], dev['inds'], dev['w'], dev['data'], None,
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            None).compile().as_text()
        lines = txt.splitlines()
        assert [l for l in lines if 'all-gather(' in l and '=' in l] == []
        assert [l for l in lines if 'all-to-all(' in l and '=' in l] == []
        py = cfg.geometry.probe_size[0]
        for l in lines:
            if ('all-reduce(' in l or 'collective-permute(' in l) \
                    and '=' in l:
                for d in re.findall(r'f32\[([\d,]+)\]', l):
                    dims = tuple(map(int, d.split(',')))
                    if len(dims) >= 3:
                        assert dims[0] <= py, (dims, l)

    def test_prime_row_width_engages_and_matches(self):
        """Flagship-analog PRIME row width (7-wide rows, the 23-analog)
        on a full 8-device mesh: weight-0 spot padding engages the
        immediate fast path (VERDICT r4 item 1) and the trajectory
        matches single-device."""
        args = _setup(seed=11, mb=7, pn=8, stride=4, n=32,
                      optimizer='gd', learning_rate=1e-3)
        # 7x7 grid: _setup's arange(0, 32-8+1, 4) gives 7 columns.
        assert len(args[3]) == 49
        rec1, rec8 = _pair(*args, 2, 4)
        assert rec8._mci is not None, rec8._mc_decline_reasons
        mci = rec8._mci
        assert mci['mpp'] == 1 and mci['mb_pad'] == 8
        assert float(mci['ws_imm'].sum()) == mci['n_rows'] * 7
        for ep in range(2):
            l1 = rec1.run_epoch(ep)
            l8 = rec8.run_epoch(ep)
            np.testing.assert_allclose(l1, l8, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(rec8.params['obj']),
                                   np.asarray(rec1.params['obj']),
                                   rtol=1e-3, atol=1e-6)

    def test_ragged_final_row_engages_and_matches(self):
        """A scan whose LAST row is partial (n_pos % mb != 0 — common in
        real scans) takes the imm path via repeat-last weight padding
        (VERDICT r4 item 4) and matches the generic single-device path,
        which sees the SAME deterministic repeat-last batches from
        make_batches."""
        cfg, obj_true, probe, pos, theta_ls, _ = _setup(
            seed=13, mb=8, pn=4, stride=4, n=32,
            optimizer='gd', learning_rate=1e-3)
        pos = pos[:-3]          # 8x8 grid minus 3: ragged 5-spot last row
        from adorym_tpu.simulate import simulate
        data = simulate(cfg, obj_true, probe, pos, theta_ls)
        rec1, rec8 = _pair(cfg, obj_true, probe, pos, theta_ls, data,
                           2, 4)
        assert rec8._mci is not None, rec8._mc_decline_reasons
        mci = rec8._mci
        assert mci['n_last'] == 5 and mci['n_rows'] == 8
        # Last row: 4 real spots at weight 1, the 5th at 1+3 duplicates.
        w_last = mci['ws_imm'][-1].reshape(-1)
        assert float(w_last.sum()) == 8.0 and float(w_last.max()) == 4.0
        for ep in range(2):
            l1 = rec1.run_epoch(ep)
            l8 = rec8.run_epoch(ep)
            np.testing.assert_allclose(l1, l8, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(rec8.params['obj']),
                                   np.asarray(rec1.params['obj']),
                                   rtol=1e-3, atol=1e-6)

    def test_imm_interp_grad_rotation_composes(self):
        """imm_grad_rotation='interp' (the fast opt-in backward) runs
        through the mesh immediate path via the shared _band_grad_back
        dispatch — trajectory-equal to single-device under the same
        setting (binning=2 here, so the fused binned-source gather
        branch is exercised)."""
        args = _setup(seed=17, optimizer='gd', learning_rate=1e-3,
                      imm_grad_rotation='interp')
        rec1, rec8 = _pair(*args, 2, 2)
        assert rec8._mci is not None, rec8._mc_decline_reasons
        for ep in range(2):
            l1 = rec1.run_epoch(ep)
            l8 = rec8.run_epoch(ep)
            np.testing.assert_allclose(l1, l8, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(rec8.params['obj']),
                                   np.asarray(rec1.params['obj']),
                                   rtol=1e-3, atol=1e-6)

    def test_ineligible_declines_with_reason(self):
        """A non-row-grid table (randomized positions) falls back to the
        generic path and says why."""
        cfg, obj_true, probe, pos, theta_ls, data = _setup(
            seed=3, randomize_probe_pos=True)
        pcfg = ParallelConfig(data_axis=2, object_axis=4)
        cfg_m = ReconConfig(geometry=cfg.geometry, train=cfg.train,
                            parallel=pcfg)
        with pytest.warns(UserWarning, match='fast path declined'):
            rec = Reconstructor(cfg_m, mesh=make_mesh(pcfg), data=data,
                                probe_pos=pos, probe_init=probe,
                                theta_ls=theta_ls,
                                obj_init=(obj_true * 0.5).copy())
        assert rec._mci is None
        assert any('row grid' in r for r in rec._mc_decline_reasons)
        # ... and the generic path still reconstructs.
        l0 = rec.run_epoch(0)
        assert np.isfinite(l0)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_run_epochs_pipelines_mc_imm():
    """run_epochs pipelining covers the mesh-immediate path: identical
    losses to sequential run_epoch calls (only the fetch is deferred)."""
    args = _setup(seed=9)
    _, rec_a = _pair(*args, 2, 2)
    _, rec_b = _pair(*args, 2, 2)
    assert rec_a._mci is not None
    seq = [rec_a.run_epoch(ep) for ep in range(3)]
    pip = rec_b.run_epochs(3, start_epoch=0)
    np.testing.assert_allclose(seq, pip, rtol=0, atol=0)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_regularizers_compose_with_mc_imm():
    """Regularized immediate runs (the reference FLAGSHIP demo config has
    alpha_d/alpha_b/gamma on) take the mesh fast path: the reg terms
    evaluate via GSPMD stencils on the sharded object and the trajectory
    matches single-device (GD for the tight bound), with no full-object
    all-gather introduced."""
    import dataclasses as dc
    from adorym_tpu.config import LossConfig
    cfg, obj_true, probe, pos, theta_ls, data = _setup(
        seed=11, optimizer='gd', learning_rate=1e-3)
    n3 = float(np.prod(cfg.geometry.obj_size))
    cfg = dc.replace(cfg, loss=LossConfig(alpha_d=1e-9 * n3,
                                          alpha_b=1e-10 * n3,
                                          gamma=1e-9 * n3))
    rec1, rec8 = _pair(cfg, obj_true, probe, pos, theta_ls, data, 2, 2)
    assert rec8._mci is not None, rec8._mc_decline_reasons
    assert rec8.reg_list
    for ep in range(2):
        l1 = rec1.run_epoch(ep)
        l8 = rec8.run_epoch(ep)
        np.testing.assert_allclose(l1, l8, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rec8.params['obj']),
                               np.asarray(rec1.params['obj']),
                               rtol=1e-3, atol=1e-6)
    # HLO check: the reg stencils must not introduce a full-object
    # all-gather.
    dev = rec8._mc_imm_device_tables()
    mci = rec8._mci
    import jax.numpy as jnp
    nb = 2
    txt = rec8._mc_imm_epoch.lower(
        rec8.params, rec8.opt_state,
        jnp.zeros(nb, jnp.float32), jnp.zeros(nb, jnp.int32),
        jnp.zeros(nb, jnp.int32), jnp.zeros(nb, jnp.int32),
        dev['pos'], dev['inds'], dev['w'], dev['data'], rec8.weight_l1,
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
        None).compile().as_text()
    Y = cfg.geometry.obj_size[0]
    import re as _re
    for l in txt.splitlines():
        if 'all-gather(' in l and '=' in l:
            for d in _re.findall(r'f32\[([\d,]+)\]', l):
                dims = tuple(map(int, d.split(',')))
                if len(dims) >= 3:
                    assert dims[0] < Y, (dims, l)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_shrink_wrap_composes_with_mc_imm():
    """In-scan shrink-wrap (reference cadence) runs inside the mesh
    immediate epoch and matches the single-device fused epoch."""
    import dataclasses as dc
    args = _setup(seed=13, optimizer='gd', learning_rate=1e-3)
    cfg = dc.replace(args[0], train=dc.replace(
        args[0].train, shrink_cycle=4, shrink_threshold=1e-9,
        non_negativity=True))
    obj_true, probe, pos, theta_ls, data = args[1:]
    mask = np.ones(cfg.geometry.obj_size, np.float32)
    kw = dict(data=data, probe_pos=pos, probe_init=probe,
              theta_ls=theta_ls, obj_init=(obj_true * 0.5).copy(),
              finite_support_mask=mask)
    from adorym_tpu.parallel.mesh import make_mesh
    rec1 = Reconstructor(cfg, **kw)
    pcfg = ParallelConfig(data_axis=2, object_axis=2)
    cfg_m = dc.replace(cfg, parallel=pcfg)
    rec8 = Reconstructor(cfg_m, mesh=make_mesh(pcfg), **kw)
    assert rec8._mci is not None, rec8._mc_decline_reasons
    for ep in range(2):
        l1 = rec1.run_epoch(ep)
        l8 = rec8.run_epoch(ep)
        np.testing.assert_allclose(l1, l8, rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(rec1.finite_support_mask),
        np.asarray(rec8.finite_support_mask))


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_probe_pos_correction_composes_with_mc_imm():
    """Per-spot position refinement (probe_pos_correction, indexed by the
    device-local ind_batch) rides the aux psum and matches single-device."""
    args = _setup(seed=15, refine=RefineConfig(
        optimize_all_probe_pos=True, all_probe_pos_learning_rate=1e-3))
    rec1, rec8 = _pair(*args, 2, 2)
    assert rec8._mci is not None, rec8._mc_decline_reasons
    for ep in range(2):
        l1 = rec1.run_epoch(ep)
        l8 = rec8.run_epoch(ep)
        np.testing.assert_allclose(l1, l8, rtol=5e-3)
    np.testing.assert_allclose(
        np.asarray(rec8.params['probe_pos_correction']),
        np.asarray(rec1.params['probe_pos_correction']),
        rtol=5e-3, atol=1e-6)
