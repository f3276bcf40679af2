"""Halo-exchange sharded patch gather vs the dense reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adorym_tpu.ops.patches import extract_patches
from adorym_tpu.parallel.halo import (sharded_patch_gather,
                                      sharded_patch_scatter_add)


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


@pytest.fixture
def mesh():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ('dp', 'op'))


def _setup(mesh, seed=0):
    rng = np.random.default_rng(seed)
    Y, X, Z = 32, 24, 3          # 4 op shards of 8 rows
    obj = rng.random((Y, X, Z, 2)).astype(np.float32)
    # windows of 8x8 rows — may span two adjacent shards
    pos = np.asarray([[0, 0], [5, 3], [8, 8], [13, 16], [24, 0], [23, 11]])
    obj_s = jax.device_put(jnp.asarray(obj), NamedSharding(mesh, P('op')))
    return obj, obj_s, jnp.asarray(pos)


class TestHaloGather:
    def test_matches_dense_gather(self, mesh):
        obj, obj_s, pos = _setup(mesh)
        out = sharded_patch_gather(obj_s, pos, (8, 8), mesh)
        ref = extract_patches(jnp.asarray(obj), pos, (8, 8))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-7)

    def test_vjp_is_scatter_add(self, mesh):
        """AD through the halo gather must equal AD through the dense
        gather — psum/ppermute/dynamic_slice transposes compose into the
        reference's gradient scatter (adorym/util.py:1006-1102)."""
        obj, obj_s, pos = _setup(mesh, seed=1)

        def dense(o):
            return jnp.sum(jnp.sin(extract_patches(o, pos, (8, 8))))

        def halo(o):
            return jnp.sum(jnp.sin(sharded_patch_gather(o, pos, (8, 8),
                                                        mesh)))

        g_dense = jax.grad(dense)(jnp.asarray(obj))
        g_halo = jax.grad(halo)(obj_s)
        np.testing.assert_allclose(np.asarray(g_halo), np.asarray(g_dense),
                                   atol=1e-6)

    def test_explicit_scatter_add(self, mesh):
        obj, obj_s, pos = _setup(mesh, seed=2)
        patches = jnp.ones((pos.shape[0], 8, 8, 3, 2), jnp.float32)
        out = sharded_patch_scatter_add(obj_s, patches, pos, mesh)
        from adorym_tpu.ops.patches import scatter_patches_add
        ref = scatter_patches_add(jnp.asarray(obj), patches, pos)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_rejects_probe_taller_than_shard(self, mesh):
        obj, obj_s, pos = _setup(mesh)
        with pytest.raises(AssertionError, match='taller'):
            sharded_patch_gather(obj_s, pos, (16, 8), mesh)


def test_halo_gather_in_reconstruction(mesh):
    """Full reconstruction with use_halo_gather matches GSPMD partitioning."""
    from adorym_tpu.config import (Geometry, ParallelConfig, ReconConfig,
                                   TrainConfig)
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate
    from adorym_tpu.utils.initialize import initialize_probe
    n, pn = 32, 8
    rng = np.random.default_rng(3)
    obj_true = np.stack([rng.random((n, n, 2)) * 1e-3,
                         rng.random((n, n, 2)) * 3e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=2,
                             probe_phase_sigma=2, probe_phase_max=0.3)
    xs = np.arange(0, n - pn + 1, 8)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    theta_ls = np.linspace(0, np.pi, 2, endpoint=False)

    def run(use_halo):
        pcfg = ParallelConfig(data_axis=2, object_axis=4,
                              use_halo_gather=use_halo)
        cfg = ReconConfig(
            geometry=Geometry(obj_size=(n, n, 2), probe_size=(pn, pn),
                              energy_ev=5000.0, psize_cm=1e-7,
                              free_prop_cm='inf'),
            train=TrainConfig(minibatch_size=8, learning_rate=1e-5, seed=3),
            parallel=pcfg)
        data = simulate(cfg, obj_true, probe, pos, theta_ls)
        from adorym_tpu.parallel.mesh import make_mesh
        rec = Reconstructor(cfg, mesh=make_mesh(pcfg), data=data,
                            probe_pos=pos, probe_init=probe,
                            theta_ls=theta_ls,
                            obj_init=np.zeros_like(obj_true))
        losses = [rec.run_epoch(ep) for ep in range(2)]
        return losses, (rec._gather_fn is not None)

    l_halo, used = run(True)
    assert used, 'halo gather was not engaged'
    l_gspmd, _ = run(False)
    np.testing.assert_allclose(l_halo, l_gspmd, rtol=1e-3)


def test_multidist_halo_gather_no_allgather():
    """The halo gather also covers the multi-dist model: safe-zone tiles
    are just bigger patches (``gather_window``).  With op>1 the compiled
    grad step shows NO full-object all-gather, and the loss/gradient match
    the unsharded run."""
    import re
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from adorym_tpu.config import (Geometry, LossConfig, ParallelConfig,
                                   ReconConfig, TrainConfig)
    from adorym_tpu.models import multidist
    from adorym_tpu.parallel.mesh import make_mesh
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip('needs 8 virtual devices')
    n, sub, szw = 64, 16, 4
    dists = (0.05, 0.12)
    rng = np.random.default_rng(5)
    from scipy.ndimage import gaussian_filter
    ph = gaussian_filter(rng.normal(size=(n, n, 1)), (3, 3, 0))
    ph = ph / np.abs(ph).max() * 0.3
    obj_true = np.stack([np.cos(ph), np.sin(ph)], -1).astype(np.float32)

    def cfg_for(pcfg):
        return ReconConfig(
            geometry=Geometry(obj_size=(n, n, 1), probe_size=(sub, sub),
                              energy_ev=17500.0, psize_cm=1e-5,
                              free_prop_cm=dists, n_dists=2,
                              two_d_mode=True, safe_zone_width=szw),
            loss=LossConfig(raw_data_type='intensity'),
            train=TrainConfig(minibatch_size=4, learning_rate=1e-3,
                              unknown_type='real_imag'),
            parallel=pcfg)

    from adorym_tpu.utils.initialize import initialize_probe
    probe = initialize_probe((n, n), 'plane')
    xs = np.arange(0, n, sub, dtype=float)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1)   # 16 blocks of 16^2
    cfg1 = cfg_for(ParallelConfig())
    data = simulate(cfg1, obj_true, probe, pos, model=multidist) ** 2

    obj0 = np.stack([np.ones((n, n, 1)), np.zeros((n, n, 1))],
                    -1).astype(np.float32)
    kw = dict(data=data, probe_pos=pos, probe_init=probe, obj_init=obj0,
              model=multidist)
    rec1 = Reconstructor(cfg1, **kw)
    pcfg = ParallelConfig(data_axis=4, object_axis=2)
    cfg8 = cfg_for(pcfg)
    mesh = make_mesh(pcfg)
    rec8 = Reconstructor(cfg8, mesh=mesh, **kw)
    assert rec8._gather_fn is not None, 'multidist halo did not engage'

    inds = np.arange(4)
    data_inds = multidist.expand_indices(inds, rec8.n_pos, cfg8)
    batch = {'i_theta': jnp.asarray(0, jnp.int32),
             'theta': jnp.asarray(0.0, jnp.float32),
             'pos_batch': jnp.asarray(pos[inds], jnp.float32),
             'ind_batch': jnp.asarray(inds, jnp.int32)}
    meas = jnp.asarray(data[0][data_inds])
    l1, g1 = jax.value_and_grad(rec1.loss_fn)(rec1.params, batch, meas,
                                              None)
    sb = {k: jax.device_put(v, NamedSharding(mesh, P('dp')))
          if k in ('pos_batch', 'ind_batch') else v
          for k, v in batch.items()}
    sm = jax.device_put(meas, NamedSharding(mesh, P('dp')))
    l8, g8 = rec8._grad_step(rec8.params, sb, sm, None)
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1['obj']),
                               np.asarray(g8['obj']), rtol=1e-3, atol=3e-6)
    txt = rec8._grad_step.lower(rec8.params, sb, sm,
                                None).compile().as_text()
    ags = re.findall(r'all-gather[^\n]*', txt)
    bad = [a for a in ags if re.search(rf'\[{n},{n},1', a)]
    assert bad == [], bad
