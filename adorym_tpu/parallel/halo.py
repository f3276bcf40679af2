"""Explicit halo-exchange patch gather over an object-sharded mesh axis.

The reference's distributed-object mode assembles per-probe-footprint chunks
from z(y)-slab owners with a hand-rolled MPI alltoall
(``adorym/util.py:889-1003``) and scatter-adds gradients back with the
inverse alltoall (``:1006-1102``).  The TPU-native equivalent below keeps
the object sharded on its y axis and moves only a probe-height *halo*
between ring neighbors with ``ppermute`` (ICI neighbor traffic), then
resolves patch ownership locally — no host round-trips, no full-object
all-gather.  The AD transpose (psum -> broadcast, dynamic_slice ->
scatter-add, ppermute -> reverse ppermute) is exactly the reference's
gradient scatter, generated automatically.

GSPMD can auto-partition the plain ``extract_patches`` too, but may choose
an all-gather of the full object; this is the explicitly-scheduled version
for objects that do not fit one chip.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def sharded_patch_gather(obj, positions, probe_size, mesh: Mesh,
                         axis: str = 'op'):
    """Gather ``[N, py, px, ...]`` patches from an object sharded on axis 0.

    Args:
      obj: ``[Y, X, ...]`` array sharded over mesh axis ``axis`` on dim 0
        (Y divisible by the axis size; ``py <= Y // axis_size``).
      positions: int ``[N, 2]`` top-left corners, already offset into the
        (padded) object frame — every window must be in range.
      probe_size: (py, px) static window size.

    Returns the patch stack, replicated over ``axis``.
    """
    py, px = int(probe_size[0]), int(probe_size[1])
    n_shards = mesh.shape[axis]
    Y = obj.shape[0]
    S = Y // n_shards
    assert S * n_shards == Y, 'object y extent must divide the op axis'
    assert py <= S, ('probe taller than a shard slab — use fewer shards '
                     f'(py={py} > S={S})')
    trailing = obj.shape[2:]

    # ppermute: each shard sends its TOP (py-1 would suffice; py keeps the
    # shapes friendly) rows to the PREVIOUS shard, which appends them as a
    # bottom halo.
    perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    def local(slab, pos):
        k = jax.lax.axis_index(axis)
        halo = jax.lax.ppermute(slab[:py], axis, perm)
        ext = jnp.concatenate([slab, halo], axis=0)   # [S + py, X, ...]

        owner = pos[:, 0] // S
        local_y = jnp.where(owner == k, pos[:, 0] - k * S, 0)

        def one(ly, x):
            start = (ly, x) + (0,) * len(trailing)
            return jax.lax.dynamic_slice(ext, start, (py, px) + trailing)

        patches = jax.vmap(one)(local_y.astype(jnp.int32),
                                pos[:, 1].astype(jnp.int32))
        mask = (owner == k).astype(patches.dtype)
        patches = patches * mask.reshape((-1,) + (1,) * (patches.ndim - 1))
        # Each patch is owned by exactly one shard; the psum assembles the
        # full batch everywhere (transpose: broadcast, i.e. the reference's
        # gradient fan-out before scatter-add).
        return jax.lax.psum(patches, axis)

    other_axes = [a for a in mesh.axis_names if a != axis]
    spec_obj = P(axis)
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(spec_obj, P()),
                       out_specs=P(),
                       check_vma=False)
    return fn(obj, positions.astype(jnp.int32))


def neighbor_extend(slab, h1: int, h2: int, axis: str, n_shards: int):
    """``[prev shard's last h1 rows ; slab ; next shard's first h2 rows]``.

    Two ring ``ppermute``s of tiny (probe-height-order) row blocks — the
    building block for re-slabbing between the unpadded parameter grid and
    the padded working grid in the mesh patch step.  Circular: edge shards
    receive wrap-around rows, which callers mask to vacuum (they map
    outside the global extent) or never read.
    """
    parts = []
    if h1:
        perm_fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        parts.append(jax.lax.ppermute(slab[-h1:], axis, perm_fwd))
    parts.append(slab)
    if h2:
        perm_bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        parts.append(jax.lax.ppermute(slab[:h2], axis, perm_bwd))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else slab


def sharded_patch_scatter_add(obj, patches, positions, mesh: Mesh,
                              axis: str = 'op'):
    """Explicit transpose of :func:`sharded_patch_gather`: add patches into
    the sharded object (used by non-AD algorithms; AD callers get this via
    the VJP automatically)."""
    cotangent = patches

    def f(o):
        return sharded_patch_gather(o, positions, patches.shape[1:3], mesh,
                                    axis)

    _, vjp = jax.vjp(f, jnp.zeros_like(obj))
    return obj + vjp(cotangent)[0]
