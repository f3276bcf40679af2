"""Pallas scatter-add of probe-footprint patches into the object.

The VJP of patch extraction is a scatter-add of ``[N, py, px, z, 2]``
windows into the object — the gradient-routing step the reference
implements as an MPI alltoall + slab accumulation
(``adorym/util.py:1006-1102``).  XLA lowers this to a generic scatter that
runs ~4-5x off the HBM roofline on TPU; this kernel instead walks the
patches on the sequential TPU grid, DMA-ing each window HBM->VMEM, adding,
and writing back — overlapping windows are safe because TPU grid steps
execute in order on a core.

Exposed as :func:`extract_patches_fused`, a drop-in for
``ops.patches.extract_patches`` whose custom VJP routes through the kernel.

STATUS: numerics validated (interpret mode matches XLA exactly, incl.
overlapping windows); on real hardware Mosaic rejects the window DMA —
"Slice shape along dimension 3 must be aligned to tiling (128)" — because
the ``[Y, X, Z, 2]`` layout puts 2 channels in the lane dimension and patch
offsets are arbitrary.  Making it hardware-ready needs aligned super-window
transfers + in-VMEM ``pltpu.roll`` placement (see CLAUDE.md perf notes);
until then the driver keeps XLA's scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(pos_ref, patches_ref, acc_ref, out_ref, scratch, sem):
    """grid = (N, n_zblocks); out aliases the zero-initialized acc input."""
    n = pl.program_id(0)
    zb = pl.program_id(1)
    py, px, zblk, C = scratch.shape
    y = pos_ref[n, 0]
    x = pos_ref[n, 1]
    window = out_ref.at[pl.ds(y, py), pl.ds(x, px),
                        pl.ds(zb * zblk, zblk), :]
    load = pltpu.make_async_copy(window, scratch, sem)
    load.start()
    load.wait()
    scratch[:] += patches_ref[0]
    store = pltpu.make_async_copy(scratch, window, sem)
    store.start()
    store.wait()


def scatter_patches_add_pallas(acc, patches, positions, interpret=False):
    """``acc[y:y+py, x:x+px, :, :] += patches[n]`` for every patch, in grid
    order.  ``acc``: ``[Y, X, Z, C]``; ``patches``: ``[N, py, px, Z, C]``;
    ``positions``: int ``[N, 2]`` (in range — callers pre-pad)."""
    N, py, px, Z, C = patches.shape
    # Block z so window + patch block + double buffering fit VMEM.
    zblk = Z
    while zblk > 1 and py * px * zblk * C * 4 * 3 > 6 * 2 ** 20:
        zblk //= 2
    assert Z % zblk == 0
    grid = (N, Z // zblk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, py, px, zblk, C),
                         lambda n, zb, pos: (n, 0, 0, zb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((py, px, zblk, C), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        input_output_aliases={2: 0},   # acc (arg 2 incl. prefetch) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(positions.astype(jnp.int32), patches, acc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def extract_patches_fused(obj, positions, probe_size, interpret=False):
    """Patch extraction whose VJP scatters through the Pallas kernel."""
    from .patches import extract_patches
    return extract_patches(obj, positions, probe_size)


def _epf_fwd(obj, positions, probe_size, interpret):
    from .patches import extract_patches
    # The object itself rides as residual only for its shape/dtype (no
    # extra memory: it is alive in the caller anyway).
    return extract_patches(obj, positions, probe_size), (obj, positions)


def _epf_bwd(probe_size, interpret, res, g):
    obj, positions = res
    acc = jnp.zeros_like(obj)
    return (scatter_patches_add_pallas(acc, g.astype(obj.dtype), positions,
                                       interpret=interpret), None)


extract_patches_fused.defvjp(_epf_fwd, _epf_bwd)
