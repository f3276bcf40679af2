"""Tests for differentiable rotation and patch extraction."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adorym_tpu.ops import patches as patch_ops
from adorym_tpu.ops.rotate import rotate, rotate_adjoint, tilt_rotate


def np_rotate_ref(obj, theta, axis=0):
    """Independent numpy transcription of apply_rotation_primitive
    (adorym/util.py:555-621): rotate about `axis`, bilinear, edge clamp."""
    s = obj.shape[:3]
    axes_rot = [a for a in range(3) if a != axis]
    s1, s2 = s[axes_rot[0]], s[axes_rot[1]]
    ctr1, ctr2 = (s1 - 1) / 2, (s2 - 1) / 2
    g1, g2 = np.meshgrid(np.arange(s1) - ctr1, np.arange(s2) - ctr2,
                         indexing='ij')
    c1 = np.cos(theta) * g1 - np.sin(theta) * g2 + ctr1
    c2 = np.sin(theta) * g1 + np.cos(theta) * g2 + ctr2
    c1 = np.clip(c1, 0, s1 - 1)
    c2 = np.clip(c2, 0, s2 - 1)
    f1 = np.floor(c1).astype(int)
    f2 = np.floor(c2).astype(int)
    w1, w2 = c1 - f1, c2 - f2
    c1c = np.minimum(f1 + 1, s1 - 1)
    c2c = np.minimum(f2 + 1, s2 - 1)
    out = np.empty_like(obj)
    mov = np.moveaxis(obj, axis, 0)
    outm = np.moveaxis(out, axis, 0)
    for i in range(s[axis]):
        plane = mov[i]
        outm[i] = (plane[f1, f2] * ((1 - w1) * (1 - w2))[..., None]
                   + plane[f1, c2c] * ((1 - w1) * w2)[..., None]
                   + plane[c1c, f2] * (w1 * (1 - w2))[..., None]
                   + plane[c1c, c2c] * (w1 * w2)[..., None])
    return out


class TestRotate:
    @pytest.mark.parametrize('axis', [0, 1, 2])
    @pytest.mark.parametrize('theta', [0.3, -1.1, 2.4])
    def test_matches_reference_semantics(self, axis, theta):
        rng = np.random.default_rng(1)
        obj = rng.random((8, 9, 10, 2)).astype(np.float32)
        out = rotate(jnp.asarray(obj), theta, axis=axis)
        ref = np_rotate_ref(obj, theta, axis=axis)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_zero_rotation_identity(self):
        rng = np.random.default_rng(2)
        obj = rng.random((6, 6, 6, 2)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(rotate(jnp.asarray(obj), 0.0)),
                                   obj, atol=1e-6)

    def test_adjoint_is_transpose(self):
        """<R x, y> == <x, R^T y> for random x, y."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((6, 7, 8, 2)).astype(np.float32))
        y = jnp.asarray(rng.random((6, 7, 8, 2)).astype(np.float32))
        theta = 0.7
        lhs = jnp.vdot(rotate(x, theta), y)
        rhs = jnp.vdot(x, rotate_adjoint(y, theta))
        np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)

    @pytest.mark.parametrize('theta', [0.0, 0.3, 0.7854, 1.5708, 2.5,
                                       3.1416, -0.9])
    def test_adjoint_taps_matches_vjp(self, theta):
        """The tap-gather exact adjoint (no scatter) equals jax.vjp's
        transpose to f32 association noise — including the edge-clamp
        pile-up lines the 9-tap interior alone would miss."""
        from adorym_tpu.ops.rotate import rotate_adjoint_taps
        rng = np.random.default_rng(5)
        y = jnp.asarray(rng.random((5, 16, 16, 2)).astype(np.float32))
        ref = rotate_adjoint(y, theta)
        got = rotate_adjoint_taps(y, theta)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_adjoint_taps_rectangular_and_binned(self):
        from adorym_tpu.ops.rotate import rotate_adjoint_taps
        rng = np.random.default_rng(6)
        # Rectangular plane.
        y = jnp.asarray(rng.random((3, 12, 20, 2)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(rotate_adjoint_taps(y, 0.9)),
            np.asarray(rotate_adjoint(y, 0.9)), rtol=1e-4, atol=1e-5)
        # Binned z source: reading acc[z // binning] equals the adjoint
        # of the materialized repeat.
        nz, binning = 16, 4
        acc = jnp.asarray(rng.random((5, 16, nz // binning, 2))
                          .astype(np.float32))
        expanded = jnp.repeat(acc, binning, axis=2)
        ref = rotate_adjoint(expanded, 1.1)
        got = rotate_adjoint_taps(acc, 1.1, binning=binning, nz_full=nz)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_adjoint_taps_is_transpose(self):
        """<R x, y> == <x, R_taps^T y> directly against the forward."""
        from adorym_tpu.ops.rotate import rotate_adjoint_taps
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.random((4, 10, 13, 2)).astype(np.float32))
        y = jnp.asarray(rng.random((4, 10, 13, 2)).astype(np.float32))
        theta = 1.3
        lhs = float(jnp.vdot(rotate(x, theta), y))
        rhs = float(jnp.vdot(x, rotate_adjoint_taps(y, theta)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-5)

    def test_grad_wrt_theta(self):
        """d/dtheta of a smooth functional of the rotated object exists and
        matches finite differences."""
        rng = np.random.default_rng(4)
        obj = jnp.asarray(rng.random((8, 8, 8, 1)).astype(np.float32))
        target = rotate(obj, 0.35)

        def loss(theta):
            return jnp.mean((rotate(obj, theta) - target) ** 2)

        g = jax.grad(loss)(0.3)
        eps = 1e-3
        fd = (loss(0.3 + eps) - loss(0.3 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=0.05, atol=1e-5)
        # And the gradient should push theta toward the target angle.
        assert float(g) < 0

    def test_tilt_rotate_composes(self):
        rng = np.random.default_rng(5)
        obj = jnp.asarray(rng.random((6, 6, 6, 2)).astype(np.float32))
        out = tilt_rotate(obj, jnp.asarray([0.1, 0.2, -0.3]))
        step = rotate(rotate(rotate(obj, 0.1, 0), 0.2, 1), -0.3, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(step), atol=1e-6)


class TestPatches:
    def test_extract_matches_slicing(self):
        rng = np.random.default_rng(6)
        obj = rng.random((20, 24, 3, 2)).astype(np.float32)
        pos = np.array([[0, 0], [5, 7], [12, 16]])
        out = patch_ops.extract_patches(jnp.asarray(obj), jnp.asarray(pos), (8, 8))
        for i, (y, x) in enumerate(pos):
            np.testing.assert_allclose(np.asarray(out[i]), obj[y:y + 8, x:x + 8])

    def test_pad_and_extract_out_of_range(self):
        rng = np.random.default_rng(7)
        obj = rng.random((16, 16, 2, 2)).astype(np.float32)
        pos = np.array([[-3, -2], [12, 13]])
        pad = patch_ops.calculate_pad((16, 16), pos, (8, 8))
        np.testing.assert_array_equal(pad, [[3, 4], [2, 5]])
        padded = patch_ops.pad_object(jnp.asarray(obj), pad)
        shifted = jnp.asarray(pos + pad[:, 0])
        out = patch_ops.extract_patches(padded, shifted, (8, 8))
        # First patch: rows 0..2, cols 0..1 are zero padding.
        np.testing.assert_allclose(np.asarray(out[0][:3]), 0.0)
        np.testing.assert_allclose(np.asarray(out[0][3:, 2:]), obj[:5, :6])

    def test_real_imag_padding_values(self):
        obj = np.ones((4, 4, 1, 2), np.float32)
        pad = np.array([[1, 1], [0, 0]])
        padded = np.asarray(patch_ops.pad_object(jnp.asarray(obj), pad, 'real_imag'))
        assert padded[0, 0, 0, 0] == 1.0  # vacuum transmission real part
        assert padded[0, 0, 0, 1] == 0.0

    def test_extract_vjp_is_scatter_add(self):
        """AD through extract_patches scatter-adds overlapping patch
        cotangents — the semantics of sync_subblocks (adorym/util.py:1006)."""
        obj = jnp.zeros((10, 10, 1, 1))
        pos = jnp.asarray([[0, 0], [2, 2]])

        def f(o):
            return jnp.sum(patch_ops.extract_patches(o, pos, (4, 4)))

        g = np.asarray(jax.grad(f)(obj))[..., 0, 0]
        # Overlap region [2:4, 2:4] gets contributions from both patches.
        assert g[3, 3] == 2.0
        assert g[0, 0] == 1.0
        assert g[9, 9] == 0.0

    def test_scatter_patches_add(self):
        obj = jnp.zeros((8, 8, 1, 1))
        patches = jnp.ones((2, 4, 4, 1, 1))
        pos = jnp.asarray([[0, 0], [2, 2]])
        out = np.asarray(patch_ops.scatter_patches_add(obj, patches, pos))[..., 0, 0]
        assert out[3, 3] == 2.0
        assert out[0, 0] == 1.0
        assert out.sum() == 32.0


class TestExtractVacuum:
    """Off-edge windows see vacuum, matching the reference's OOB chunk
    reads (``adorym/util.py:975-997``)."""

    def _dense_reference(self, obj, pos, p, fill):
        """Numpy ground truth: read from an object embedded in an infinite
        vacuum."""
        H, W = obj.shape[:2]
        m = 2 * p  # margin large enough for every test position
        big = np.zeros((H + 2 * m, W + 2 * m) + obj.shape[2:], np.float32)
        if fill == 'real_imag':
            big[..., 0] = 1.0
        big[m:m + H, m:m + W] = obj
        return np.stack([big[m + y:m + y + p, m + x:m + x + p]
                         for (y, x) in pos])

    @pytest.mark.parametrize('unknown_type', ['delta_beta', 'real_imag'])
    def test_forward_matches_dense(self, unknown_type):
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        obj = rng.random((16, 16, 3, 2)).astype(np.float32)
        p = 6
        pos = np.array([[-3, -5], [0, 0], [14, 13], [-6, 18], [5, -2]],
                       np.int32)
        out = patch_ops.extract_patches_vacuum(
            jnp.asarray(obj), jnp.asarray(pos), (p, p),
            unknown_type=unknown_type)
        want = self._dense_reference(
            obj, pos, p, 'real_imag' if unknown_type == 'real_imag' else '0')
        np.testing.assert_allclose(np.asarray(out), want, atol=0)

    def test_boundary_gradients_match_dense(self):
        """Gradients for windows past the edge equal the gradient computed
        on a large vacuum-padded object (the reference's semantics: OOB
        content is constant vacuum, so it carries no gradient)."""
        import jax
        import jax.numpy as jnp
        rng = np.random.default_rng(1)
        obj = rng.random((12, 12, 2, 2)).astype(np.float32)
        p = 5
        pos = np.array([[-2, -4], [9, 10], [3, 3]], np.int32)
        w = rng.random((len(pos), p, p, 2, 2)).astype(np.float32)

        def loss_vac(o):
            pt = patch_ops.extract_patches_vacuum(o, jnp.asarray(pos), (p, p))
            return jnp.sum(pt * w)

        def loss_dense(o):
            big = jnp.zeros((12 + 2 * p, 12 + 2 * p, 2, 2), jnp.float32)
            big = big.at[p:p + 12, p:p + 12].set(o)
            pt = patch_ops.extract_patches(big, jnp.asarray(pos) + p, (p, p))
            return jnp.sum(pt * w)

        g_vac = jax.grad(loss_vac)(jnp.asarray(obj))
        g_dense = jax.grad(loss_dense)(jnp.asarray(obj))
        np.testing.assert_allclose(np.asarray(g_vac), np.asarray(g_dense),
                                   atol=1e-6)
        assert np.any(np.asarray(g_vac) != 0)

    def test_in_range_equals_plain_extract(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(2)
        obj = rng.random((20, 20, 1, 2)).astype(np.float32)
        pos = np.array([[0, 0], [12, 12], [3, 9]], np.int32)
        a = patch_ops.extract_patches_vacuum(jnp.asarray(obj),
                                             jnp.asarray(pos), (8, 8))
        b = patch_ops.extract_patches(jnp.asarray(obj), jnp.asarray(pos),
                                      (8, 8))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize('nz_full,binning', [(16, 4), (10, 3)])
def test_rotate_expanded_from_binned_matches_expand_then_rotate(nz_full,
                                                                binning):
    """The fused expand+rotate gather (now the DEFAULT gradient
    rotate-back on the prebin fast path, recon.angle_step fused_back)
    must be EXACTLY rotate(repeat(g, binning)[..., :nz_full], theta) —
    including the short final bin when binning does not divide nz."""
    from adorym_tpu.ops.rotate import rotate_expanded_from_binned_z
    rng = np.random.default_rng(0)
    zb = -(-nz_full // binning)
    g = jnp.asarray(rng.random((12, 12, zb, 2)).astype(np.float32))
    for theta in (0.3, -1.2, 2.9):
        ref = rotate(jnp.repeat(g, binning, axis=2)[:, :, :nz_full],
                     jnp.asarray(theta, jnp.float32))
        fused = rotate_expanded_from_binned_z(
            g, jnp.asarray(theta, jnp.float32), binning, nz_full)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_chunked_rotation_matches_unchunked(monkeypatch):
    """Large volumes rotate chunk-by-chunk over the carried axis (bounds
    the 4 object-sized gather temporaries); results match the one-shot
    gather to float32 roundoff for every rotation axis."""
    import jax.numpy as jnp
    import adorym_tpu.ops.rotate as R
    rng = np.random.default_rng(0)
    obj = rng.random((24, 20, 16, 2)).astype(np.float32)
    from adorym_tpu.utils import profiling
    hbm = profiling.hbm_limit_bytes()
    for axis in (0, 1, 2):
        a = np.asarray(R.rotate(jnp.asarray(obj), 0.37, axis=axis))
        monkeypatch.setattr(R, '_CHUNK_THRESHOLD_FRAC', 1 / hbm)
        monkeypatch.setattr(R, '_CHUNK_TARGET_FRAC',
                            20 * 16 * 2 * 4 * 3 / hbm)
        b = np.asarray(R.rotate(jnp.asarray(obj), 0.37, axis=axis))
        monkeypatch.undo()
        np.testing.assert_allclose(a, b, atol=1e-6)
    # And the adjoint stays the exact transpose under chunking.
    monkeypatch.setattr(R, '_CHUNK_THRESHOLD_FRAC', 1 / hbm)
    import jax
    cot = jnp.asarray(rng.random(obj.shape).astype(np.float32))
    x = jnp.asarray(obj)
    fwd = R.rotate(x, 0.37)
    adj = R.rotate_adjoint(cot, 0.37)
    lhs = float(jnp.vdot(fwd, cot))
    rhs = float(jnp.vdot(x, adj))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_grid_extractor_vjp_matches_generic():
    """make_grid_extractor's custom backward (separable grid scatter) must
    equal the generic extract_patches VJP."""
    import jax
    import jax.numpy as jnp
    from adorym_tpu.ops import patches as p

    rng = np.random.default_rng(0)
    rows, cols, py, px, s = 3, 4, 12, 12, 4
    obj = jnp.asarray(rng.random((30, 40, 5, 2)).astype(np.float32))
    ct_seed = jnp.asarray(rng.random((rows * cols, py, px, 5, 2))
                          .astype(np.float32))
    y0, x0 = 2, 3
    yy = y0 + s * np.repeat(np.arange(rows), cols)
    xx = x0 + s * np.tile(np.arange(cols), rows)
    pos = jnp.asarray(np.stack([yy, xx], -1), jnp.int32)

    ex = p.make_grid_extractor(s, rows, cols, (py, px))
    origin = jnp.asarray([y0, x0], jnp.float32)

    out_grid = ex(obj, origin)
    out_ref = p.extract_patches(obj, pos, (py, px))
    np.testing.assert_array_equal(np.asarray(out_grid), np.asarray(out_ref))

    def loss_grid(o):
        return jnp.sum(ex(o, origin) * ct_seed)

    def loss_ref(o):
        return jnp.sum(p.extract_patches(o, pos, (py, px)) * ct_seed)

    g1 = jax.grad(loss_grid)(obj)
    g2 = jax.grad(loss_ref)(obj)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def np_rotate_nearest_ref(obj, theta, axis=0):
    """Nearest-neighbor transcription of the reference's
    interpolation='nearest' grid_sample mode (adorym/wrappers.py:1106):
    same source coordinates, rounded to the closest voxel."""
    s = obj.shape[:3]
    axes_rot = [a for a in range(3) if a != axis]
    s1, s2 = s[axes_rot[0]], s[axes_rot[1]]
    ctr1, ctr2 = (s1 - 1) / 2, (s2 - 1) / 2
    g1, g2 = np.meshgrid(np.arange(s1) - ctr1, np.arange(s2) - ctr2,
                         indexing='ij')
    c1 = np.cos(theta) * g1 - np.sin(theta) * g2 + ctr1
    c2 = np.sin(theta) * g1 + np.cos(theta) * g2 + ctr2
    i1 = np.clip(np.round(c1), 0, s1 - 1).astype(int)
    i2 = np.clip(np.round(c2), 0, s2 - 1).astype(int)
    out = np.empty_like(obj)
    mov = np.moveaxis(obj, axis, 0)
    outm = np.moveaxis(out, axis, 0)
    for i in range(s[axis]):
        outm[i] = mov[i][i1, i2]
    return out


class TestNearestRotation:
    @pytest.mark.parametrize('axis', [0, 1, 2])
    @pytest.mark.parametrize('theta', [0.3, -1.1, 2.4])
    def test_matches_round_index(self, axis, theta):
        rng = np.random.default_rng(11)
        obj = rng.random((8, 9, 10, 2)).astype(np.float32)
        out = rotate(jnp.asarray(obj), theta, axis=axis, method='nearest')
        ref = np_rotate_nearest_ref(obj, theta, axis=axis)
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_zero_rotation_identity(self):
        rng = np.random.default_rng(12)
        obj = rng.random((6, 6, 6, 2)).astype(np.float32)
        out = rotate(jnp.asarray(obj), 0.0, method='nearest')
        np.testing.assert_array_equal(np.asarray(out), obj)

    def test_streaming_rotate_bin_matches_materialized(self):
        """The fused rotate+bin and binned-source rotate-back keep their
        bit-exactness contracts under nearest resampling."""
        from adorym_tpu.ops.rotate import (rotate_and_bin_z,
                                           rotate_expanded_from_binned_z)
        from adorym_tpu.ops.propagate import bin_z_sum
        rng = np.random.default_rng(13)
        obj = jnp.asarray(rng.random((8, 10, 12, 2)).astype(np.float32))
        th, b = 0.7, 3
        fused = rotate_and_bin_z(obj, th, b, method='nearest')
        ref = bin_z_sum(rotate(obj, th, method='nearest'), b, axis=2)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))

        g = jnp.asarray(rng.random((8, 10, 4, 2)).astype(np.float32))
        back = rotate_expanded_from_binned_z(g, -th, b, 12, method='nearest')
        ref2 = rotate(jnp.repeat(g, b, axis=2)[:, :, :12], -th,
                      method='nearest')
        np.testing.assert_array_equal(np.asarray(back), np.asarray(ref2))

    def test_tilt_and_adjoint_accept_method(self):
        from adorym_tpu.ops.rotate import rotate_adjoint
        rng = np.random.default_rng(14)
        obj = jnp.asarray(rng.random((6, 6, 6, 2)).astype(np.float32))
        t = tilt_rotate(obj, jnp.asarray([0.1, -0.2, 0.3]),
                        method='nearest')
        assert np.isfinite(np.asarray(t)).all()
        # Nearest rotation is a 0/1 selection matrix; <Rx, y> == <x, R^T y>.
        x = jnp.asarray(rng.random((6, 6, 6, 2)).astype(np.float32))
        y = jnp.asarray(rng.random((6, 6, 6, 2)).astype(np.float32))
        lhs = jnp.vdot(rotate(x, 0.5, method='nearest'), y)
        rhs = jnp.vdot(x, rotate_adjoint(y, 0.5, method='nearest'))
        np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_recon_converges_with_nearest_interpolation():
    """End-to-end: a tiny 3D ptycho-tomo run with interpolation='nearest'
    (the reference's alternative grid_sample mode) drives the loss down."""
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate
    from adorym_tpu.utils.initialize import initialize_probe
    n, pn = 16, 8
    cfg_kw = dict(obj_size=(n, n, n), probe_size=(pn, pn),
                  energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf')
    rng = np.random.default_rng(21)
    obj_true = np.stack([rng.random((n, n, n)) * 1e-3,
                         rng.random((n, n, n)) * 3e-5], -1).astype(np.float32)
    probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                             psize_cm=1e-7, probe_mag_sigma=2,
                             probe_phase_sigma=2, probe_phase_max=0.3)
    xs = np.arange(0, n - pn + 1, 4)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    theta_ls = np.linspace(0, np.pi, 3, endpoint=False)
    cfg = ReconConfig(geometry=Geometry(**cfg_kw),
                      train=TrainConfig(minibatch_size=3, learning_rate=1e-5,
                                        interpolation='nearest'))
    data = simulate(cfg, obj_true, probe, pos, theta_ls)
    rec = Reconstructor(cfg, data=data, probe_pos=pos, probe_init=probe,
                        theta_ls=theta_ls, obj_init=np.zeros_like(obj_true))
    l0 = rec.run_epoch(0)
    l_last = None
    for ep in range(1, 4):
        l_last = rec.run_epoch(ep)
    assert np.isfinite(l_last) and l_last < l0


class TestZMajorExtract:
    def test_zmajor_extraction_matches_moveaxis(self):
        from adorym_tpu.ops.patches import (extract_patches,
                                            extract_patches_zmajor)
        rng = np.random.default_rng(31)
        obj = jnp.asarray(rng.random((20, 22, 6, 2)).astype(np.float32))
        pos = jnp.asarray([[0, 3], [5, 7], [12, 14]], dtype=jnp.int32)
        ref = jnp.moveaxis(extract_patches(obj, pos, (8, 8)),
                           (-2, -1), (0, 1))
        got = extract_patches_zmajor(jnp.transpose(obj, (2, 3, 0, 1)),
                                     pos, (8, 8))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_zmajor_trajectory_bit_identical(self):
        """zmajor_extract='on' is a pure relayout: identical losses and
        object, bit for bit, with the fused kernel forced on (interpret
        mode off-TPU)."""
        import dataclasses as dc
        from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
        from adorym_tpu.recon import Reconstructor
        from adorym_tpu.simulate import simulate
        from adorym_tpu.utils.initialize import initialize_probe
        n, pn, nz = 16, 8, 8
        rng = np.random.default_rng(33)
        obj_true = np.stack([rng.random((n, n, nz)) * 1e-3,
                             rng.random((n, n, nz)) * 3e-5],
                            -1).astype(np.float32)
        probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                                 psize_cm=1e-7, probe_mag_sigma=2,
                                 probe_phase_sigma=2, probe_phase_max=0.3)
        xs = np.arange(0, n - pn + 1, 8)
        yy, xx = np.meshgrid(xs, xs, indexing='ij')
        pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
        theta_ls = np.linspace(0, np.pi, 2, endpoint=False)
        base = ReconConfig(
            geometry=Geometry(obj_size=(n, n, nz), probe_size=(pn, pn),
                              energy_ev=5000.0, psize_cm=1e-7,
                              free_prop_cm='inf', binning=2),
            train=TrainConfig(minibatch_size=4, learning_rate=1e-4,
                              update_scheme='per angle',
                              rotate_out_of_loop=True,
                              fused_multislice='on'))
        data = simulate(base, obj_true, probe, pos, theta_ls)
        kw = dict(data=data, probe_pos=pos, probe_init=probe,
                  theta_ls=theta_ls, obj_init=(obj_true * 0.5).copy())
        recs = []
        for zmx in ('off', 'on'):
            cfg = dc.replace(base, train=dc.replace(
                base.train, zmajor_extract=zmx))
            rec = Reconstructor(cfg, **kw)
            if zmx == 'on':
                assert rec._pallas_db   # the gate this path rides on
            losses = [rec.run_epoch(ep) for ep in range(2)]
            recs.append((rec, losses))
        (r0, l0), (r1, l1) = recs
        assert l0 == l1, (l0, l1)
        np.testing.assert_array_equal(np.asarray(r0.params['obj']),
                                      np.asarray(r1.params['obj']))


def test_nearest_keeps_tilt_refinable():
    """interpolation='nearest' must NOT freeze tilt refinement: the tilt
    path stays bilinear like the reference (its w.rotate has no
    interpolation kwarg, adorym/forward_model.py:274-276) — nearest's
    rounded-index gather has zero gradient w.r.t. the angles."""
    import dataclasses as dc
    from adorym_tpu.config import Geometry, ReconConfig, RefineConfig, TrainConfig
    from adorym_tpu.models.ptychography import rotated_object
    rng = np.random.default_rng(41)
    obj = jnp.asarray(rng.random((8, 8, 8, 2)).astype(np.float32))
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(8, 8, 8), probe_size=(4, 4)),
        refine=RefineConfig(optimize_tilt=True),
        train=TrainConfig(interpolation='nearest'))
    tilts = jnp.asarray([[0.1], [0.2], [0.3]], jnp.float32)

    def loss(t):
        params = {'obj': obj, 'tilt_ls': t}
        batch = {'i_theta': jnp.asarray(0, jnp.int32),
                 'theta': jnp.asarray(0.0, jnp.float32)}
        return jnp.sum(rotated_object(params, batch, cfg) ** 2)

    g = jax.grad(loss)(tilts)
    assert np.abs(np.asarray(g)).max() > 0


def test_unknown_interpolation_method_raises():
    rng = np.random.default_rng(42)
    obj = jnp.asarray(rng.random((6, 6, 6, 2)).astype(np.float32))
    with pytest.raises(ValueError, match='unknown interpolation'):
        rotate(obj, 0.3, method='nearset')
