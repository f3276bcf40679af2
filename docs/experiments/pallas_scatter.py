"""Pallas scatter-add of probe-footprint patches into the object.

The VJP of patch extraction is a scatter-add of ``[N, py, px, z, 2]``
windows into the object — the gradient-routing step the reference
implements as an MPI alltoall + slab accumulation
(``adorym/util.py:1006-1102``).  XLA lowers this to a generic scatter that
runs ~4-5x off the HBM roofline on TPU; this kernel instead walks the
patches on the sequential TPU grid, DMA-ing each window HBM->VMEM, adding,
and writing back — overlapping windows are safe because TPU grid steps
execute in order on a core.

Mosaic alignment: window DMAs must respect the (8, 128) sublane/lane
tiling, so the object is viewed as ``[Y, X, Z*2]`` (z and the delta/beta
channel merged into the lane dimension, blocked in 128s), the x offset is
rounded down to the sublane tile and the patch is placed at one of the 8
possible sub-tile offsets via predicated static slices.

STATUS: experiment, NOT part of the package (moved out of
adorym_tpu.ops in round 3).  Compiles and matches XLA exactly on
hardware, but the sequential load-add-store round trips are latency-bound
(13.8ms vs XLA's 11.2ms at the flagship shape) — overlapping windows
forbid naive double buffering, and pipelining across the (disjoint) lane
blocks of one patch remains unattempted.  It was superseded outright by
the STRUCTURED scatters that ship in ops/patches.py
(scatter_rowgrid_add / scatter_grid2d_add): for grid scan tables they
replace the scatter with static shifted adds + one contiguous tile
update, which is faster than both this kernel and XLA's scatter.  The
companion test_pallas_scatter.py here runs standalone:
``python -m pytest docs/experiments/test_pallas_scatter.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8      # sublane tile
_LANE = 128   # lane tile


def _scatter_kernel(pos_ref, patches_ref, acc_ref, out_ref, scratch, sem):
    """grid = (N, n_laneblocks); out aliases the acc input.

    scratch: [py, px + _SUB, lane_blk] window; the patch lands at sublane
    offset dx = x - align_down(x, 8) selected by predicated static slices.
    """
    n = pl.program_id(0)
    zb = pl.program_id(1)
    py = patches_ref.shape[1]
    px = patches_ref.shape[2]
    lane_blk = patches_ref.shape[3]
    y = pos_ref[n, 0]
    x = pos_ref[n, 1]
    x_al = (x // _SUB) * _SUB
    dx = x - x_al

    window = out_ref.at[pl.ds(y, py), pl.ds(x_al, px + _SUB),
                        pl.ds(zb * lane_blk, lane_blk)]
    load = pltpu.make_async_copy(window, scratch, sem)
    load.start()
    load.wait()
    patch = patches_ref[0]
    for off in range(_SUB):
        @pl.when(dx == off)
        def _():
            scratch[:, off:off + px, :] += patch
    store = pltpu.make_async_copy(scratch, window, sem)
    store.start()
    store.wait()


def scatter_patches_add_pallas(acc, patches, positions, interpret=False):
    """``acc[y:y+py, x:x+px, :, :] += patches[n]`` for every patch, in grid
    order.

    ``acc``: ``[Y, X, Z, C]`` float32; ``patches``: ``[N, py, px, Z, C]``;
    ``positions``: int ``[N, 2]``, windows in range AND
    ``x + px + 8 <= X`` — the aligned super-window needs one extra sublane
    tile on the right (``extract_patches_fused`` pads for this).
    On hardware ``Z*C`` should be a multiple of 128 for lane blocking
    (otherwise the full lane extent is transferred per window).
    """
    N, py, px, Z, C = patches.shape
    Y, X = acc.shape[:2]
    lanes = Z * C
    acc3 = acc.reshape(Y, X, lanes)
    patches3 = patches.reshape(N, py, px, lanes)
    if lanes % _LANE != 0:
        lane_blk = lanes
    else:
        lane_blk = _LANE
        # Cap window VMEM at ~4MB by growing the lane block when small.
        while (lane_blk * 2 <= lanes
               and py * (px + _SUB) * lane_blk * 2 * 4 * 3 < 4 * 2 ** 20):
            lane_blk *= 2
        while lanes % lane_blk:
            lane_blk //= 2
    grid = (N, lanes // lane_blk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, py, px, lane_blk),
                         lambda n, zb, pos: (n, 0, 0, zb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((py, px + _SUB, lane_blk), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(acc3.shape, acc3.dtype),
        input_output_aliases={2: 0},   # acc (arg 2 incl. prefetch) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(positions.astype(jnp.int32), patches3, acc3)
    return out.reshape(acc.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def extract_patches_fused(obj, positions, probe_size, interpret=False):
    """Patch extraction whose VJP scatters through the Pallas kernel.

    The gradient accumulator is padded by one sublane tile on the right of
    axis 1 inside the VJP so every aligned super-window stays in range; the
    pad's gradient is discarded.
    """
    from adorym_tpu.ops.patches import extract_patches
    return extract_patches(obj, positions, probe_size)


def _epf_fwd(obj, positions, probe_size, interpret):
    from adorym_tpu.ops.patches import extract_patches
    # The object rides as residual only for its shape/dtype (no extra
    # memory: it is alive in the caller anyway).
    return extract_patches(obj, positions, probe_size), (obj, positions)


def _epf_bwd(probe_size, interpret, res, g):
    obj, positions = res
    Y, X = obj.shape[:2]
    acc = jnp.zeros((Y, X + _SUB) + obj.shape[2:], obj.dtype)
    out = scatter_patches_add_pallas(acc, g.astype(obj.dtype), positions,
                                     interpret=interpret)
    return out[:, :X], None


extract_patches_fused.defvjp(_epf_fwd, _epf_bwd)
