"""Out-of-core: host-offloaded optimizer state + orbax checkpoints.

The TPU-native replacement for the reference's ``shared_file`` mode
(``adorym/array_ops.py:62-73``, ``adorym/optimizers.py:96-113,339-363``):
the object's optimizer moments live in pinned host memory and stream
through HBM once per update; checkpoints optionally write per-device
shards via orbax/tensorstore instead of gathering to one npz.
"""

import dataclasses

import numpy as np
import pytest

from adorym_tpu.config import (Geometry, IOConfig, ParallelConfig,
                               ReconConfig, TrainConfig)
from adorym_tpu.recon import Reconstructor
from adorym_tpu.simulate import simulate
from adorym_tpu.utils.initialize import initialize_probe


def _problem(optimizer='adam', offload=False, n=24, nz=None,
             update_scheme='immediate', rol=False):
    nz = nz if nz is not None else n
    pn = 12
    two_d = nz == 1
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, nz), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', two_d_mode=two_d),
        train=TrainConfig(minibatch_size=4, learning_rate=1e-5,
                          optimizer=optimizer, seed=1,
                          update_scheme=update_scheme,
                          rotate_out_of_loop=rol),
        parallel=ParallelConfig(offload_optimizer_state=offload))
    rng = np.random.default_rng(5)
    obj_true = np.stack([rng.random((n, n, nz)) * 1e-3,
                         rng.random((n, n, nz)) * 3e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=3,
                             probe_phase_sigma=3, probe_phase_max=0.3)
    xs = np.arange(0, n - pn + 1, 6)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    theta_ls = np.zeros(1) if two_d else np.linspace(0, np.pi, 2,
                                                     endpoint=False)
    data = simulate(cfg, obj_true, probe, pos, theta_ls)
    return cfg, obj_true, probe, pos, theta_ls, data


@pytest.mark.parametrize('optimizer,scheme,rol', [
    ('adam', 'immediate', False),
    ('adam', 'per angle', True),     # angle-fused fast path
    ('momentum', 'immediate', False),
    ('curveball', 'immediate', False),   # second-order obj state
])
def test_offloaded_state_matches_device_state(optimizer, scheme, rol):
    """Moving the moments to pinned_host must not change the math at all."""
    cfg, obj_true, probe, pos, theta_ls, data = _problem(optimizer,
                                                         update_scheme=scheme,
                                                         rol=rol)
    runs = {}
    for off in (False, True):
        cfg_o = dataclasses.replace(
            cfg, parallel=ParallelConfig(offload_optimizer_state=off))
        rec = Reconstructor(cfg_o, data=data, probe_pos=pos,
                            probe_init=probe, theta_ls=theta_ls,
                            obj_init=np.zeros_like(obj_true))
        # Pin the epoch driver: offloaded state is ineligible for the
        # fused-angles epoch, so the device-state control must use the
        # same per-angle dispatch loop for a bit-exact comparison
        # (the fused scan compiles angle_step in a different program,
        # which may fuse reductions differently at the last ulp).
        rec._data_dev_ok = False
        for ep in range(3):
            loss = rec.run_epoch(ep)
        runs[off] = (np.asarray(rec.params['obj']), loss, rec)
    np.testing.assert_allclose(runs[True][0], runs[False][0], atol=0)
    np.testing.assert_allclose(runs[True][1], runs[False][1], rtol=0)
    # And the state really lives in host memory.
    rec_off = runs[True][2]
    import jax
    kinds = jax.tree.leaves(jax.tree.map(
        lambda x: x.sharding.memory_kind, rec_off.opt_state['obj']))
    assert kinds and all(k == 'pinned_host' for k in kinds), kinds
    # While non-offloaded state sits in device memory.
    rec_on = runs[False][2]
    kinds_on = jax.tree.leaves(jax.tree.map(
        lambda x: x.sharding.memory_kind, rec_on.opt_state['obj']))
    assert all(k == 'device' for k in kinds_on), kinds_on


def test_offload_with_sharded_object():
    """Offload composes with mesh sharding: moments are host-resident AND
    shard-partitioned like the object."""
    import jax
    from adorym_tpu.parallel.mesh import make_mesh
    cfg, obj_true, probe, pos, theta_ls, data = _problem(
        'adam', update_scheme='per angle', rol=True)
    pcfg = ParallelConfig(data_axis=4, object_axis=2,
                          offload_optimizer_state=True)
    cfg = dataclasses.replace(cfg, parallel=pcfg)
    mesh = make_mesh(pcfg)
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        theta_ls=theta_ls, obj_init=np.zeros_like(obj_true),
                        mesh=mesh)
    loss = rec.run_epoch(0)
    assert np.isfinite(loss)
    m = rec.opt_state['obj']['m']
    assert m.sharding.memory_kind == 'pinned_host'
    assert m.sharding.spec and m.sharding.spec[0] == 'op'


def test_orbax_checkpoint_roundtrip(tmp_path):
    from adorym_tpu.io import checkpoint as ckpt_lib
    import jax.numpy as jnp
    params = {'obj': jnp.arange(12.0).reshape(3, 4),
              'probe': jnp.ones((2, 2))}
    state = {'obj': {'m': jnp.zeros((3, 4)), 'v': jnp.full((3, 4), 2.0)}}
    folder = str(tmp_path / 'ck')
    ckpt_lib.save_checkpoint(folder, params, state, 4, 7,
                             extra={'i_opt_batch': np.asarray(9)},
                             use_orbax=True)
    out = ckpt_lib.restore_checkpoint(folder)
    assert out is not None
    r_params, r_state, i_epoch, i_batch, extra = out
    assert (i_epoch, i_batch) == (4, 7)
    assert int(extra['i_opt_batch']) == 9
    np.testing.assert_array_equal(r_params['obj'],
                                  np.arange(12.0).reshape(3, 4))
    np.testing.assert_array_equal(r_state['obj']['v'], np.full((3, 4), 2.0))
    # Overwrite with newer state: restore sees the latest.
    ckpt_lib.save_checkpoint(folder, params, state, 5, 0, use_orbax=True)
    assert ckpt_lib.restore_checkpoint(folder)[2] == 5


def test_orbax_resume_matches_uninterrupted(tmp_path):
    """Kill-and-resume through an orbax checkpoint reproduces the
    uninterrupted trajectory (same guarantee the npz path has)."""
    cfg, obj_true, probe, pos, theta_ls, data = _problem('adam', n=16)
    io_cfg = IOConfig(store_checkpoint=True, use_checkpoint=True,
                      use_orbax=True, n_batch_per_checkpoint=10_000)
    cfg = dataclasses.replace(cfg, io=io_cfg)
    kw = dict(data=data, probe_pos=pos, probe_init=probe, theta_ls=theta_ls,
              obj_init=np.zeros_like(obj_true))

    straight = Reconstructor(cfg, **kw)
    for ep in range(4):
        straight.run_epoch(ep)

    folder = str(tmp_path / 'run')
    first = Reconstructor(cfg, output_folder=folder, **kw)
    for ep in range(2):
        first.run_epoch(ep)
    first.save_checkpoint(2, 0)
    assert (tmp_path / 'run' / 'checkpoint' / 'orbax').is_dir()

    resumed = Reconstructor(cfg, output_folder=folder, **kw)
    assert resumed._start_epoch == 2
    for ep in range(2, 4):
        resumed.run_epoch(ep)
    np.testing.assert_allclose(np.asarray(resumed.params['obj']),
                               np.asarray(straight.params['obj']), atol=1e-7)


def test_slabbed_checkpoint_restores_into_any_config(tmp_path):
    """A checkpoint written under slab-streamed offload restores into a
    non-offloaded run (and vice versa): slab dicts are normalized to full
    arrays on restore and re-split per the current config."""
    cfg, obj_true, probe, pos, theta_ls, data = _problem('adam', n=16,
                                                         offload=True)
    io_cfg = IOConfig(store_checkpoint=True, use_checkpoint=True,
                      n_batch_per_checkpoint=10_000)
    kw = dict(data=data, probe_pos=pos, probe_init=probe, theta_ls=theta_ls,
              obj_init=np.zeros_like(obj_true))
    folder = str(tmp_path / 'run')

    cfg_off = dataclasses.replace(cfg, io=io_cfg)
    first = Reconstructor(cfg_off, output_folder=folder, **kw)
    assert first._off_slabbed
    for ep in range(2):
        first.run_epoch(ep)
    first.save_checkpoint(2, 0)

    # Resume WITHOUT offload: state must arrive as full arrays.
    cfg_on = dataclasses.replace(
        cfg, io=io_cfg, parallel=ParallelConfig(offload_optimizer_state=False))
    resumed = Reconstructor(cfg_on, output_folder=folder, **kw)
    assert resumed._start_epoch == 2
    m = resumed.opt_state['obj']['m']
    assert hasattr(m, 'shape') and m.shape == resumed.params['obj'].shape

    # Uninterrupted offloaded run for trajectory comparison.
    straight = Reconstructor(cfg_off, **kw)
    for ep in range(4):
        straight.run_epoch(ep)
    for ep in range(2, 4):
        resumed.run_epoch(ep)
    np.testing.assert_allclose(np.asarray(resumed.params['obj']),
                               np.asarray(straight.params['obj']), atol=1e-7)
