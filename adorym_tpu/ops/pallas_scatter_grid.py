"""Pallas kernel for the full-grid patch scatter-add tile.

:func:`..patches.scatter_grid2d_add` collapses a complete-grid chunk's
patch cotangents into one contiguous tile via two separable lane passes
(stacked shifted adds).  XLA executes those as k-way add fusions that
re-read the cotangent stack per shifted view — measured ~21 ms for a
529-patch flagship chunk, ~7x off the HBM roofline (the tile itself is
16 MB and the cotangents 1.4 GB).

This kernel builds the SAME tile band-by-band instead: output band ``b``
(``stride`` tile rows) is the sum of the ``ky = py/stride`` patch-row
slices that overlap it — no read-modify-write, no repeated shifted
views.  Every tile byte is written once; cotangent bytes are read once
each plus a clipped-block overfetch on the (ky-1)*ky edge grid steps
whose slice falls outside the grid (~(ky-1)/rows extra reads, ~35% at
the flagship ky=9/rows=23 — still 3x faster than the XLA tile).  Layout trick: the trailing ``(px, z, 2)`` dims flatten
into the lane axis (``px*z*2`` lanes, a multiple of 128 at flagship
shapes), so the in-band x shift of patch ``j`` is a lane offset
``j*stride*z*2`` — itself a multiple of 128 — and both the streamed
blocks and the VMEM band accumulator sit on exact (8, 128) tiles.

The caller adds the returned tile into the accumulator with one
``dynamic_update_slice`` (identical to the XLA path's final step).
Alignment gates (else fall back to the XLA path): ``stride % 8 == 0``
and ``stride * C % 128 == 0`` where ``C`` is the flattened trailing
size.

Reference semantics: the gradient scatter of the distributed-object
alltoall (``adorym/util.py:1006-1102``), restricted to complete
constant-stride grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _band_kernel(cot_ref, out_ref, acc, *, ky, cols, rows, lane_shift,
                 pxc):
    """Accumulate one (band, slice, patch) block; flush on the last."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero():
        acc[...] = jnp.zeros_like(acc)

    r = b - i
    valid = jnp.logical_and(r >= 0, r < rows)

    @pl.when(valid)
    def _add():
        off = j * lane_shift
        acc[:, pl.dslice(off, pxc)] += cot_ref[0].astype(acc.dtype)

    @pl.when(jnp.logical_and(i == ky - 1, j == cols - 1))
    def _flush():
        out_ref[...] = acc[...]


def grid2d_tile(cot, stride, rows, interpret=False, out_dtype=None):
    """The complete-grid scatter tile for ``cot[rows*cols, py, px, ...]``
    — equal to :func:`..patches.scatter_grid2d_add`'s internal tile.

    Returns ``[(rows+ky-1)*stride, (cols+kx-1)*stride, ...]`` with
    patch ``(r, j)`` added at ``(r*stride, j*stride)``.

    ``out_dtype``: accumulation/output dtype (default ``cot.dtype``) —
    the run_bfloat16 patch path streams bf16 cotangents (half the HBM
    read bytes) but accumulates the ky-way band sums in f32.
    """
    out_dtype = cot.dtype if out_dtype is None else out_dtype
    N, py, px = cot.shape[:3]
    trailing = cot.shape[3:]
    cols = N // rows
    ky = py // stride
    kx = px // stride
    C = int(np.prod(trailing)) if trailing else 1
    pxc = px * C
    lane_shift = stride * C
    W = (cols + kx - 1) * stride * C
    Ry = rows + ky - 1

    cot3 = cot.reshape(N, py, pxc)

    out = pl.pallas_call(
        functools.partial(_band_kernel, ky=ky, cols=cols, rows=rows,
                          lane_shift=lane_shift, pxc=pxc),
        grid=(Ry, ky, cols),
        in_specs=[pl.BlockSpec(
            (1, stride, pxc),
            lambda b, i, j: (jnp.clip(b - i, 0, rows - 1) * cols + j, i, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((stride, W), lambda b, i, j: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ry * stride, W), out_dtype),
        scratch_shapes=[pltpu.VMEM((stride, W), out_dtype)],
        interpret=interpret,
    )(cot3)
    return out.reshape((Ry * stride, (cols + kx - 1) * stride) + trailing)


def _extract_kernel(tile_ref, out_ref, *, cols, lane_shift, pxc):
    """One (patch-row r, slice i) cell: every column patch's i-th
    stride-row slice is the same tile band at a 128-aligned lane
    offset — pure copies, no arithmetic."""
    for j in range(cols):
        out_ref[j] = tile_ref[:, pl.dslice(j * lane_shift, pxc)]


def grid2d_extract(tile, stride, rows, cols, probe_size, interpret=False):
    """Inverse of :func:`grid2d_tile`: patches ``[rows*cols, py, px, ...]``
    whose window ``(r, j)`` starts at ``(r*stride, j*stride)`` of
    ``tile[(rows+ky-1)*stride, (cols+kx-1)*stride, ...]``.

    The gather mirrors the scatter band kernel: grid cell ``(r, i)``
    loads ONE band (``stride`` tile rows, re-read only ``ky`` times
    total across overlapping patch rows) and emits all ``cols`` patch
    slices as static 128-aligned lane slices.  The vmapped
    ``dynamic_slice`` extract re-reads every tile byte ``ky*kx`` times
    through slice machinery instead (~4-7 ms at the flagship vs ~1 ms
    here); values are bit-identical (pure copy).
    """
    py, px = int(probe_size[0]), int(probe_size[1])
    trailing = tile.shape[2:]
    ky = py // stride
    C = int(np.prod(trailing)) if trailing else 1
    pxc = px * C
    lane_shift = stride * C
    W = tile.shape[1] * C
    N = rows * cols

    tile2 = tile.reshape(tile.shape[0], W)
    out = pl.pallas_call(
        functools.partial(_extract_kernel, cols=cols,
                          lane_shift=lane_shift, pxc=pxc),
        grid=(rows, ky),
        in_specs=[pl.BlockSpec((stride, W), lambda r, i: (r + i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cols, stride, pxc),
                               lambda r, i: (r, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, py, pxc), tile.dtype),
        interpret=interpret,
    )(tile2)
    return out.reshape((N, py, px) + trailing)


def extract_grid2d_pallas(obj, y0, x0, stride, rows, cols, probe_size,
                          interpret=False):
    """Complete-grid patch extraction from ``obj`` with origin
    ``(y0, x0)`` (traced ok): the band-kernel gather over one
    ``dynamic_slice`` of the grid's full extent — the exact transpose of
    :func:`scatter_grid2d_add_pallas`'s tile + update."""
    py, px = int(probe_size[0]), int(probe_size[1])
    ky = py // stride
    kx = px // stride
    Ty = (rows + ky - 1) * stride
    Tx = (cols + kx - 1) * stride
    start = (y0, x0) + (0,) * (obj.ndim - 2)
    tile = jax.lax.dynamic_slice(obj, start, (Ty, Tx) + obj.shape[2:])
    return grid2d_extract(tile, stride, rows, cols, probe_size,
                          interpret=interpret)


def supported(cot_shape, stride) -> bool:
    """Alignment gate: band rows on sublane tiles, x shifts on lane
    tiles."""
    py, px = cot_shape[1], cot_shape[2]
    C = int(np.prod(cot_shape[3:])) if len(cot_shape) > 3 else 1
    return (stride % 8 == 0 and (stride * C) % 128 == 0
            and py % stride == 0 and px % stride == 0)


def scatter_grid2d_add_pallas(acc, cot, y0, x0, stride, rows,
                              interpret=False):
    """Drop-in for :func:`..patches.scatter_grid2d_add` using the
    streaming band kernel for the tile."""
    tile = grid2d_tile(cot, stride, rows, interpret=interpret,
                       out_dtype=acc.dtype)
    start = (y0, x0) + (0,) * (acc.ndim - 2)
    cur = jax.lax.dynamic_slice(acc, start, tile.shape[:2] + acc.shape[2:])
    return jax.lax.dynamic_update_slice(acc, cur + tile, start)


def scatter_rowgrid_add_pallas(acc, cot, y0, x0, stride, interpret=False):
    """Drop-in for :func:`..patches.scatter_rowgrid_add`: one grid ROW's
    patches as a rows=1 band-kernel tile + a single RMW (each row has
    its own traced y origin, so rows cannot share a tile).

    NEGATIVE RESULT — not routed to by the driver: per-row kernel
    launches + per-row accumulator RMWs cost 54 ms for a 23-row flagship
    chunk vs 23 ms for the XLA shifted-add path (the full-grid
    :func:`scatter_grid2d_add_pallas`, amortizing one launch and one RMW
    over all rows, is the one that wins at 6-7 ms).  Kept as a tested
    A/B probe (``tools/profile_flagship.py --bf16``)."""
    return scatter_grid2d_add_pallas(acc, cot, y0, x0, stride, 1,
                                     interpret=interpret)
