"""Probe-footprint patch extraction and scatter.

Replaces the reference's Python loop of fancy slices over scan positions
(``adorym/forward_model.py:314-334``) with a single vmapped
``lax.dynamic_slice`` — one fused XLA gather for the whole minibatch, and its
AD transpose is exactly the scatter-add the reference hand-writes for the
distributed-object path (``adorym/util.py:1006-1102``).

Object layout: ``obj[y, x, z, 2]`` (delta/beta channels last), matching the
reference parameter shape (``README.rst:283-305``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def calculate_pad(obj_size_yx, probe_pos, probe_size) -> np.ndarray:
    """Static padding so that every ``[pos, pos + probe_size)`` window is in
    range.  Host-side, from the full (un-refined) scan-position table —
    mirrors ``calculate_pad_len`` (``adorym/util.py:1374-1406``).

    Returns ``[[top, bottom], [left, right]]`` (int).
    """
    probe_pos = np.asarray(probe_pos)
    pad_arr = np.zeros((2, 2), dtype=np.int64)
    for ax in range(2):
        lo = int(np.floor(probe_pos[:, ax].min()))
        hi = int(np.ceil(probe_pos[:, ax].max())) + int(probe_size[ax])
        if lo < 0:
            pad_arr[ax, 0] = -lo
        if hi > int(obj_size_yx[ax]):
            pad_arr[ax, 1] = hi - int(obj_size_yx[ax])
    return pad_arr


def pad_object(obj, pad_arr, unknown_type='delta_beta'):
    """Pad ``obj[y, x, ...]`` by ``pad_arr`` with vacuum values.

    delta_beta: pad both channels with 0 (vacuum = no material).
    real_imag: pad the real channel with 1 and imag with 0 (vacuum
    transmission = 1+0j) — ``adorym/util.py:1340-1350``.
    """
    if not np.count_nonzero(pad_arr):
        return obj
    pad_width = [tuple(pad_arr[0]), tuple(pad_arr[1])] + [(0, 0)] * (obj.ndim - 2)
    if unknown_type == 'real_imag':
        re = jnp.pad(obj[..., 0], pad_width[:-1], constant_values=1.0)
        im = jnp.pad(obj[..., 1], pad_width[:-1], constant_values=0.0)
        return jnp.stack([re, im], axis=-1)
    return jnp.pad(obj, pad_width, constant_values=0.0)


def extract_patches(obj, positions, probe_size):
    """Extract ``[N, py, px, ...]`` sub-blocks at integer ``positions[N, 2]``.

    ``positions`` may be traced; starts are clamped into range by
    ``dynamic_slice`` semantics (callers pre-pad so this never triggers for
    valid configs).  Trailing axes of ``obj`` (z, channels) ride along whole.
    """
    py, px = int(probe_size[0]), int(probe_size[1])
    trailing = obj.shape[2:]

    def slice_one(pos):
        start = (pos[0], pos[1]) + (0,) * len(trailing)
        return jax.lax.dynamic_slice(obj, start, (py, px) + trailing)

    return jax.vmap(slice_one)(positions.astype(jnp.int32))


def extract_patches_zmajor(obj_zm, positions, probe_size):
    """Z-major variant of :func:`extract_patches`: ``obj_zm`` is the
    padded object pre-transposed to ``[zb, 2, Yp, Xp]`` so the extracted
    stack ``[zb, 2, N, py, px]`` is ALREADY the fused delta_beta Pallas
    kernels' operand layout — the per-chunk z-major ``moveaxis`` prep
    (measured ~3.1 ms additive at the flagship chunk, not fused into the
    Pallas call by XLA) disappears.  Values are bit-identical to
    ``moveaxis(extract_patches(obj, pos), (-2, -1), (0, 1))``: both are
    pure relayouts of the same windows."""
    py, px = int(probe_size[0]), int(probe_size[1])
    zb, ch = obj_zm.shape[0], obj_zm.shape[1]

    def slice_one(pos):
        return jax.lax.dynamic_slice(
            obj_zm, (0, 0, pos[0], pos[1]), (zb, ch, py, px))

    # [N, zb, 2, py, px] -> [zb, 2, N, py, px]
    out = jax.vmap(slice_one)(positions.astype(jnp.int32))
    return jnp.transpose(out, (1, 2, 0, 3, 4))


def extract_patches_vacuum(obj, positions, probe_size,
                           unknown_type='delta_beta'):
    """Like :func:`extract_patches`, but windows reaching past the object
    edge see VACUUM instead of clamp-shifted content — the semantics of the
    reference's off-edge chunk reads (``adorym/util.py:975-997``: out-of-
    bounds rows padded with 0, or (1, 0) for real_imag).

    Implementation keeps the fast fused dynamic-slice gather: slice at the
    clamped start, roll the patch by the clamp offset, and mask the
    rolled-in rows/cols to vacuum.  All shapes static; ``positions`` may be
    traced and arbitrarily out of range.  The VJP scatters only the valid
    region back (gradients into vacuum drop), matching the reference's
    slab accumulation (``adorym/util.py:1070-1100``).
    """
    py, px = int(probe_size[0]), int(probe_size[1])
    H, W = obj.shape[0], obj.shape[1]
    trailing = obj.shape[2:]
    limit = jnp.asarray([H - py, W - px], jnp.int32)
    iy = jnp.arange(py, dtype=jnp.int32)
    ix = jnp.arange(px, dtype=jnp.int32)

    def slice_one(pos):
        s = pos.astype(jnp.int32)
        c = jnp.clip(s, 0, limit)
        start = (c[0], c[1]) + (0,) * len(trailing)
        patch = jax.lax.dynamic_slice(obj, start, (py, px) + trailing)
        d = c - s  # desired[r] = clamped[r - d]; valid for d <= r < py + d
        patch = jnp.roll(patch, shift=(d[0], d[1]), axis=(0, 1))
        valid = ((iy >= d[0]) & (iy < py + d[0]))[:, None] \
            & ((ix >= d[1]) & (ix < px + d[1]))[None, :]
        valid = valid.reshape((py, px) + (1,) * len(trailing))
        if unknown_type == 'real_imag':
            vac = jnp.zeros_like(patch).at[..., 0].set(1.0)
        else:
            vac = jnp.zeros_like(patch)
        return jnp.where(valid, patch, vac)

    return jax.vmap(slice_one)(positions)


def detect_row_grid(pos_table, minibatch_size, probe_size):
    """Host-side check whether every minibatch of the (static) scan table is
    one constant-stride grid row: same y, x = x0 + s*j with ``s`` dividing
    the probe width.

    When it holds, the per-batch gradient scatter-add reduces to ``k = px/s``
    static shifted adds + one contiguous tile update
    (:func:`scatter_rowgrid_add`) instead of XLA's generic scatter, which
    runs ~5x off the HBM roofline at flagship shapes.  Returns the stride
    or None.
    """
    pos = np.round(np.asarray(pos_table)).astype(np.int64)
    if pos.ndim != 2 or len(pos) == 0 or len(pos) % minibatch_size:
        return None
    if minibatch_size < 2:
        return None
    strides = set()
    for b0 in range(0, len(pos), minibatch_size):
        batch = pos[b0:b0 + minibatch_size]
        if not np.all(batch[:, 0] == batch[0, 0]):
            return None
        dx = np.diff(batch[:, 1])
        if not (np.all(dx == dx[0]) and dx[0] > 0):
            return None
        strides.add(int(dx[0]))
    if len(strides) != 1:
        return None
    s = strides.pop()
    if s > int(probe_size[1]) or int(probe_size[1]) % s:
        return None
    return s


def detect_row_grid_ragged(pos_table, minibatch_size, probe_size):
    """Like :func:`detect_row_grid` but also accepts a final PARTIAL row
    (``len(pos) % minibatch_size != 0``) — the common real-scan shape the
    reference handles by re-drawing spots into the last batch
    (``adorym/ptychography.py:816-846``).

    The full rows must pass the strict check; the trailing partial row
    must be one constant-stride run at the same stride (a single spot is
    accepted as-is).  Returns ``(stride, n_last)`` with ``n_last`` the
    real-spot count of the LAST row (``== minibatch_size`` when the
    table divides), or None.
    """
    pos = np.round(np.asarray(pos_table)).astype(np.int64)
    if pos.ndim != 2 or len(pos) == 0 or minibatch_size < 2:
        return None
    n_full = len(pos) // minibatch_size
    n_last = len(pos) - n_full * minibatch_size
    if n_full == 0:
        return None
    s = detect_row_grid(pos[:n_full * minibatch_size], minibatch_size,
                        probe_size)
    if s is None:
        return None
    if n_last == 0:
        return s, minibatch_size
    tail = pos[n_full * minibatch_size:]
    if not np.all(tail[:, 0] == tail[0, 0]):
        return None
    if n_last >= 2:
        dx = np.diff(tail[:, 1])
        if not np.all(dx == s):
            return None
    return s, n_last


def scatter_rowgrid_add(acc, cot, y0, x0, stride):
    """Add ``cot[N, py, px, ...]`` patch cotangents whose windows sit at
    ``(y0, x0 + stride*j)`` into ``acc`` — the structured replacement for
    the generic scatter (reference scatter semantics:
    ``adorym/util.py:1070-1100``).

    Split each patch's x axis into ``k = px/stride`` stride-wide lanes; lane
    ``b`` of patch ``j`` lands at grid column ``j + b``, so the whole batch
    collapses into ``k`` STATIC shifted adds over a ``[N+k-1]`` column
    buffer, then one contiguous read-modify-write of the covered
    ``[py, (N-1)*stride + px]`` tile.  No scatter op, no collisions — pure
    sequential HBM traffic.
    """
    N, py, px = cot.shape[:3]
    k = px // stride
    trailing = cot.shape[3:]
    z = jnp.reshape(cot, (N, py, k, stride) + trailing)
    # k static shifted adds over the column-block axis (lane b of patch j
    # lands at column block j + b).  Measured faster than an equivalent
    # 0/1-matrix matmul formulation (tiny contraction dims starve the MXU:
    # 1630 vs 910 patterns/s at flagship shapes).
    # Accumulate in the ACCUMULATOR's dtype: bf16 cotangents (the
    # run_bfloat16 patch path halves the scatter's HBM read bytes) are
    # upcast inside the fused adds, not summed at bf16 precision.
    w_buf = jnp.zeros((N + k - 1, py, stride) + trailing, acc.dtype)
    for b in range(k):
        w_buf = w_buf.at[b:b + N].add(z[:, :, b].astype(acc.dtype))
    tile = jnp.moveaxis(w_buf, 0, 1)            # [py, N+k-1, stride, ...]
    width = (N + k - 1) * stride                # = (N-1)*stride + px
    tile = jnp.reshape(tile, (py, width) + trailing)
    start = (y0, x0) + (0,) * (acc.ndim - 2)
    cur = jax.lax.dynamic_slice(acc, start, (py, width) + acc.shape[2:])
    return jax.lax.dynamic_update_slice(acc, cur + tile, start)


def detect_full_grid(pos_table, minibatch_size, probe_size):
    """Host-side check whether the (static) scan table is one complete
    2D constant-stride grid: every minibatch a grid row
    (:func:`detect_row_grid`), rows at the same stride in y, all rows
    sharing the x base, and the stride dividing BOTH probe dims.

    When it holds, a whole multi-row gradient chunk scatter-adds with
    :func:`scatter_grid2d_add` — two separable lane passes and a single
    contiguous tile update, instead of one tile read-modify-write per row.
    Returns the stride or None.
    """
    s = detect_row_grid(pos_table, minibatch_size, probe_size)
    if s is None:
        return None
    pos = np.round(np.asarray(pos_table)).astype(np.int64)
    y0s = pos[::minibatch_size, 0]
    x0s = pos[::minibatch_size, 1]
    if len(y0s) < 2 or not np.all(x0s == x0s[0]):
        return None
    dy = np.diff(y0s)
    if not (np.all(dy == s)):
        return None
    if int(probe_size[0]) % s:
        return None
    return s


def scatter_grid2d_add(acc, cot, y0, x0, stride, rows):
    """Add ``cot[rows*cols, py, px, ...]`` patch cotangents of a complete
    2D grid — patch ``(r, j)`` at ``(y0 + stride*r, x0 + stride*j)`` —
    into ``acc`` with NO serialized read-modify-write chains.

    Both axes get the lane decomposition of :func:`scatter_rowgrid_add`
    (lane ``b`` of patch index ``i`` lands at grid slot ``i + b``), each
    expressed as a stack of shifted zero-padded views reduced in ONE sum —
    every cotangent element is read exactly once per pass and XLA fuses
    the stack+sum into a k-way add.  Ends with a single contiguous tile
    update covering the whole grid footprint.
    """
    N, py, px = cot.shape[:3]
    cols = N // rows
    kx = px // stride
    ky = py // stride
    trailing = cot.shape[3:]
    ntr = len(trailing)

    # ---- x pass: [rows, cols, py, kx, s] -> [rows, Cx, py, s] ----
    # Sums run in the accumulator's dtype (bf16 cotangents upcast in the
    # fused k-way adds — see scatter_rowgrid_add).
    z = jnp.reshape(cot, (rows, cols, py, kx, stride) + trailing)
    Cx = cols + kx - 1
    zp = jnp.pad(z, ((0, 0), (kx - 1, kx - 1), (0, 0), (0, 0), (0, 0))
                 + ((0, 0),) * ntr)
    xsum = jnp.stack(
        [jax.lax.slice_in_dim(zp[:, :, :, b], kx - 1 - b, kx - 1 - b + Cx,
                              axis=1).astype(acc.dtype)
         for b in range(kx)], 0).sum(axis=0)

    # ---- y pass: [rows, Cx, ky, s, s] -> [Ry, Cx, s, s] ----
    zy = jnp.reshape(xsum, (rows, Cx, ky, stride, stride) + trailing)
    Ry = rows + ky - 1
    zyp = jnp.pad(zy, ((ky - 1, ky - 1), (0, 0), (0, 0), (0, 0), (0, 0))
                  + ((0, 0),) * ntr)
    ysum = jnp.stack(
        [jax.lax.slice_in_dim(zyp[:, :, b], ky - 1 - b, ky - 1 - b + Ry,
                              axis=0) for b in range(ky)], 0).sum(axis=0)

    # ---- assemble [Ry, Cx, s, s, ...] -> tile [Ry*s, Cx*s, ...] ----
    tile = jnp.moveaxis(ysum, 2, 1)               # [Ry, s, Cx, s, ...]
    tile = jnp.reshape(tile, (Ry * stride, Cx * stride) + trailing)
    start = (y0, x0) + (0,) * (acc.ndim - 2)
    cur = jax.lax.dynamic_slice(acc, start,
                                (Ry * stride, Cx * stride) + acc.shape[2:])
    return jax.lax.dynamic_update_slice(acc, cur + tile, start)


def scatter_grid2d_add_best(acc, cot, y0, x0, stride, rows):
    """Route the complete-grid scatter to the Pallas streaming band
    kernel when eligible (TPU + aligned shapes): it reads every
    cotangent byte once instead of XLA's per-shifted-view re-reads —
    measured 7.3 vs 22.0 ms on the flagship chunk (see
    pallas_scatter_grid.py).  Bit-compatible fallback otherwise."""
    if jax.default_backend() == 'tpu':
        from . import pallas_scatter_grid as psg
        if psg.supported(cot.shape, stride):
            return psg.scatter_grid2d_add_pallas(acc, cot, y0, x0, stride,
                                                 rows)
    return scatter_grid2d_add(acc, cot, y0, x0, stride, rows)


def extract_grid2d_best(obj, y0, x0, stride, rows, cols, probe_size):
    """Complete-grid patch extraction routed to the Pallas band gather
    when eligible (TPU + the same alignment gate as the scatter): reads
    each object byte once per overlapping patch-row band instead of the
    vmapped ``dynamic_slice``'s per-patch re-reads.  Bit-identical
    values (pure copy); falls back to :func:`extract_patches`."""
    py, px = int(probe_size[0]), int(probe_size[1])
    if jax.default_backend() == 'tpu':
        from . import pallas_scatter_grid as psg
        shape = (rows * cols, py, px) + obj.shape[2:]
        if psg.supported(shape, stride):
            return psg.extract_grid2d_pallas(obj, y0, x0, stride, rows,
                                             cols, probe_size)
    ys = y0 + stride * jnp.arange(rows, dtype=jnp.int32)
    xs = x0 + stride * jnp.arange(cols, dtype=jnp.int32)
    pos = jnp.stack(jnp.meshgrid(ys, xs, indexing='ij'),
                    -1).reshape(-1, 2)
    return extract_patches(obj, pos, probe_size)


def make_grid_extractor(stride, rows, cols, probe_size):
    """Patch gather for a complete 2D grid whose VJP is
    :func:`scatter_grid2d_add` instead of XLA's generic scatter (which runs
    ~10x slower at flagship shapes and materializes a full cotangent patch
    stack).

    Returns ``extract(obj, origin)`` with ``origin = [y0, x0]`` (float32,
    traced): patches ``[rows*cols, py, px, ...]`` of windows at
    ``(y0 + stride*r, x0 + stride*j)``.
    """
    py, px = int(probe_size[0]), int(probe_size[1])

    def _positions(origin):
        o = jnp.round(origin).astype(jnp.int32)
        r = jnp.arange(rows, dtype=jnp.int32)
        j = jnp.arange(cols, dtype=jnp.int32)
        yy = o[0] + stride * jnp.repeat(r, cols)
        xx = o[1] + stride * jnp.tile(j, rows)
        return jnp.stack([yy, xx], -1)

    @jax.custom_vjp
    def extract(obj, origin):
        return extract_patches(obj, _positions(origin), (py, px))

    def fwd(obj, origin):
        return extract(obj, origin), (obj.shape, origin)

    def bwd(res, ct):
        shape, origin = res
        o = jnp.round(origin).astype(jnp.int32)
        g = scatter_grid2d_add(jnp.zeros(shape, ct.dtype), ct,
                               o[0], o[1], stride, rows)
        return g, jnp.zeros_like(origin)

    extract.defvjp(fwd, bwd)
    return extract


def scatter_patches_add(obj, patches, positions):
    """Add ``patches[N, py, px, ...]`` into ``obj`` at ``positions[N, 2]``.

    The explicit transpose of :func:`extract_patches` — used by conventional
    (non-AD) algorithms like ePIE (``adorym/conventional.py:73-87``); the AD
    path gets this for free as the VJP of ``extract_patches``.
    """
    trailing = obj.shape[2:]

    def body(i, acc):
        pos = positions[i].astype(jnp.int32)
        start = (pos[0], pos[1]) + (0,) * len(trailing)
        cur = jax.lax.dynamic_slice(acc, start, patches.shape[1:])
        return jax.lax.dynamic_update_slice(acc, cur + patches[i], start)

    return jax.lax.fori_loop(0, patches.shape[0], body, obj)
