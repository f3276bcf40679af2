"""Streaming band-kernel grid scatter vs the XLA separable-pass tile
(interpret mode on CPU; Mosaic on TPU via the profiler/bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

from adorym_tpu.ops import patches as patch_ops
from adorym_tpu.ops import pallas_scatter_grid as psg


@pytest.mark.parametrize('rows,cols,py,px,s,trail', [
    (4, 4, 16, 16, 8, (8, 2)),
    (3, 5, 24, 16, 8, (16,)),    # single trailing dim
    (2, 2, 8, 8, 8, (16, 2)),    # stride == probe
    (5, 3, 16, 24, 8, (32,)),
])
def test_tile_matches_xla(rows, cols, py, px, s, trail):
    rng = np.random.default_rng(0)
    N = rows * cols
    cot = jnp.asarray(rng.normal(size=(N, py, px) + trail)
                      .astype(np.float32))
    assert psg.supported(cot.shape, s)
    acc_shape = ((rows - 1) * s + py + 24,
                 (cols - 1) * s + px + 16) + trail
    acc = jnp.asarray(rng.normal(size=acc_shape).astype(np.float32))
    y0, x0 = jnp.asarray(8), jnp.asarray(8)
    ref = patch_ops.scatter_grid2d_add(acc, cot, y0, x0, s, rows)
    got = psg.scatter_grid2d_add_pallas(acc, cot, y0, x0, s, rows,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)


def test_supported_gate():
    # stride not a sublane multiple
    assert not psg.supported((4, 16, 16, 4, 2), 4)
    # lane shift not a multiple of 128: stride*C = 8*6 = 48
    assert not psg.supported((4, 16, 16, 3, 2), 8)
    # flagship shape: stride*C = 8*64 = 512
    assert psg.supported((529, 72, 72, 32, 2), 8)


def test_row_tile_matches_xla():
    rng = np.random.default_rng(1)
    cols, py, px, s = 5, 16, 16, 8
    cot = jnp.asarray(rng.normal(size=(cols, py, px, 8, 2))
                      .astype(np.float32))
    acc = jnp.asarray(rng.normal(size=(40, 72, 8, 2)).astype(np.float32))
    y0, x0 = jnp.asarray(8), jnp.asarray(8)
    ref = patch_ops.scatter_rowgrid_add(acc, cot, y0, x0, s)
    got = psg.scatter_rowgrid_add_pallas(acc, cot, y0, x0, s,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)


def test_bf16_cotangent_f32_accumulation():
    """The run_bfloat16 patch path streams bf16 cotangents into an f32
    accumulator: the band sums must accumulate at f32 (out_dtype follows
    acc), matching the XLA path on the upcast cotangents."""
    rng = np.random.default_rng(2)
    rows, cols, py, px, s = 4, 4, 16, 16, 8
    cot = jnp.asarray(rng.normal(size=(rows * cols, py, px, 8, 2))
                      .astype(np.float32)).astype(jnp.bfloat16)
    acc = jnp.asarray(rng.normal(size=(64, 64, 8, 2)).astype(np.float32))
    y0, x0 = jnp.asarray(8), jnp.asarray(8)
    ref = patch_ops.scatter_grid2d_add(acc, cot, y0, x0, s, rows)
    got = psg.scatter_grid2d_add_pallas(acc, cot, y0, x0, s, rows,
                                        interpret=True)
    assert ref.dtype == jnp.float32 and got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)
    # f32 accumulation of the upcast bf16 values == numpy double-precision
    # accumulation of those same values (no bf16 summation error).
    dense = np.asarray(acc, np.float64)
    cotf = np.asarray(cot.astype(jnp.float32), np.float64)
    for i in range(rows * cols):
        r, j = divmod(i, cols)
        yy, xx = 8 + s * r, 8 + s * j
        dense[yy:yy + py, xx:xx + px] += cotf[i]
    np.testing.assert_allclose(np.asarray(got), dense, atol=1e-5)


def test_bf16_rowgrid_f32_accumulation():
    rng = np.random.default_rng(3)
    cols, py, px, s = 5, 16, 16, 8
    cot = jnp.asarray(rng.normal(size=(cols, py, px, 8, 2))
                      .astype(np.float32)).astype(jnp.bfloat16)
    acc = jnp.asarray(rng.normal(size=(40, 72, 8, 2)).astype(np.float32))
    y0, x0 = jnp.asarray(8), jnp.asarray(8)
    out = patch_ops.scatter_rowgrid_add(acc, cot, y0, x0, s)
    assert out.dtype == jnp.float32
    dense = np.asarray(acc, np.float64)
    cotf = np.asarray(cot.astype(jnp.float32), np.float64)
    for j in range(cols):
        dense[8:8 + py, 8 + s * j:8 + s * j + px] += cotf[j]
    np.testing.assert_allclose(np.asarray(out), dense, atol=1e-5)


@pytest.mark.parametrize('rows,cols,py,px,s,trail', [
    (4, 4, 16, 16, 8, (8, 2)),
    (3, 5, 24, 16, 8, (16,)),
    (2, 2, 8, 8, 8, (16, 2)),    # stride == probe
    (5, 3, 16, 24, 8, (32,)),
])
def test_extract_matches_dynamic_slice(rows, cols, py, px, s, trail):
    """The band-gather extraction is a pure copy: bit-identical to the
    vmapped dynamic-slice extract on the same grid."""
    rng = np.random.default_rng(4)
    obj_shape = ((rows - 1) * s + py + 24,
                 (cols - 1) * s + px + 16) + trail
    obj = jnp.asarray(rng.normal(size=obj_shape).astype(np.float32))
    y0, x0 = jnp.asarray(8), jnp.asarray(8)
    ys = 8 + s * np.arange(rows)
    xs = 8 + s * np.arange(cols)
    pos = jnp.asarray(np.stack(np.meshgrid(ys, xs, indexing='ij'),
                               -1).reshape(-1, 2).astype(np.int32))
    ref = patch_ops.extract_patches(obj, pos, (py, px))
    got = psg.extract_grid2d_pallas(obj, y0, x0, s, rows, cols, (py, px),
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_extract_bf16_pure_copy():
    """bf16 source (the run_bfloat16 extract path) stays a bit-exact
    copy through the band gather."""
    rng = np.random.default_rng(5)
    rows, cols, py, px, s = 3, 4, 16, 16, 8
    obj = jnp.asarray(rng.normal(size=(64, 72, 8, 2))
                      .astype(np.float32)).astype(jnp.bfloat16)
    y0, x0 = jnp.asarray(8), jnp.asarray(8)
    ys = 8 + s * np.arange(rows)
    xs = 8 + s * np.arange(cols)
    pos = jnp.asarray(np.stack(np.meshgrid(ys, xs, indexing='ij'),
                               -1).reshape(-1, 2).astype(np.int32))
    ref = patch_ops.extract_patches(obj, pos, (py, px))
    got = psg.extract_grid2d_pallas(obj, y0, x0, s, rows, cols, (py, px),
                                    interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)),
        np.asarray(ref.astype(jnp.float32)))


def test_extract_best_cpu_fallback_identical():
    """extract_grid2d_best on CPU routes to the dynamic-slice gather and
    must match explicit positions exactly."""
    rng = np.random.default_rng(6)
    rows, cols, py, px, s = 4, 3, 16, 16, 8
    obj = jnp.asarray(rng.normal(size=(72, 64, 8, 2)).astype(np.float32))
    ys = 4 + s * np.arange(rows)
    xs = 12 + s * np.arange(cols)
    pos = jnp.asarray(np.stack(np.meshgrid(ys, xs, indexing='ij'),
                               -1).reshape(-1, 2).astype(np.int32))
    ref = patch_ops.extract_patches(obj, pos, (py, px))
    got = patch_ops.extract_grid2d_best(obj, jnp.asarray(4),
                                        jnp.asarray(12), s, rows, cols,
                                        (py, px))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
