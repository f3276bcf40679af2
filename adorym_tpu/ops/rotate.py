"""Differentiable 3D rotation via bilinear gather.

TPU-native replacement for the reference's rotation machinery
(``adorym/util.py:446-696``), which precomputes per-angle coordinate lookup
tables, saves them to disk as float16 ``.npy`` files, and re-reads them every
batch.  Here the coordinates are a few trig ops on an iota grid, computed
inside the jitted step — no disk, no host round-trip — and the bilinear
gather's transpose (the scatter-add ``apply_rotation_transpose``,
``adorym/util.py:623-696``) falls out of JAX AD automatically.

Semantics match ``apply_rotation_primitive`` (``adorym/util.py:555-621``):
rotation about ``axis`` (default 0 = y), coordinates relative to the array
center ``(s-1)/2``, source coords edge-clamped, bilinear interpolation.
Differentiable with respect to both the object and ``theta`` (the latter
covers the reference's ``w.rotate`` tilt-refinement path,
``adorym/wrappers.py:1178``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _rotation_source_coords(shape2, theta):
    """Source (pre-rotation) coordinates for each target pixel of a 2D plane.

    ``shape2`` = (s1, s2) of the two rotated axes; ``theta`` may be traced.
    Returns (c1, c2), float32 arrays of shape ``shape2`` — matching
    ``calculate_original_coordinates_for_rotation`` (``adorym/util.py:465-477``).
    """
    s1, s2 = shape2
    ctr1 = (s1 - 1) / 2.0
    ctr2 = (s2 - 1) / 2.0
    g1 = jnp.arange(s1, dtype=jnp.float32)[:, None] - ctr1
    g2 = jnp.arange(s2, dtype=jnp.float32)[None, :] - ctr2
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    c1 = cos_t * g1 - sin_t * g2 + ctr1
    c2 = sin_t * g1 + cos_t * g2 + ctr2
    return c1, c2


def _nearest_gather_plane(vol, c1, c2, ax1, ax2):
    """Nearest-neighbor sample of ``vol`` at (c1, c2) along axes (ax1, ax2)
    — the reference's ``interpolation='nearest'`` grid_sample mode
    (``adorym/wrappers.py:1106``): one rounded-index gather, zero
    interpolation weights (and hence zero theta gradient, matching
    grid_sample's piecewise-constant nearest mode)."""
    s1 = vol.shape[ax1]
    s2 = vol.shape[ax2]
    i1 = jnp.clip(jnp.round(c1), 0, s1 - 1).astype(jnp.int32)
    i2 = jnp.clip(jnp.round(c2), 0, s2 - 1).astype(jnp.int32)
    perm = [ax1, ax2] + [a for a in range(vol.ndim) if a not in (ax1, ax2)]
    v = jnp.transpose(vol, perm)
    out = v[i1.ravel(), i2.ravel()].reshape(c1.shape + v.shape[2:])
    return jnp.transpose(out, np.argsort(perm))


def _gather_plane(vol, c1, c2, ax1, ax2, method):
    if method == 'nearest':
        return _nearest_gather_plane(vol, c1, c2, ax1, ax2)
    if method != 'bilinear':
        raise ValueError(f'unknown interpolation method {method!r} '
                         "(expected 'bilinear' or 'nearest')")
    return _bilinear_gather_plane(vol, c1, c2, ax1, ax2)


def _bilinear_gather_plane(vol, c1, c2, ax1, ax2):
    """Bilinear sample of ``vol`` at (c1, c2) along axes (ax1, ax2).

    ``c1``/``c2`` have the same shape as the (ax1, ax2) plane; all other axes
    of ``vol`` are carried along.  Edge-clamp semantics
    (``adorym/util.py:586-588``).
    """
    s1 = vol.shape[ax1]
    s2 = vol.shape[ax2]
    c1 = jnp.clip(c1, 0.0, s1 - 1.0)
    c2 = jnp.clip(c2, 0.0, s2 - 1.0)
    f1 = jnp.floor(c1)
    f2 = jnp.floor(c2)
    w1 = c1 - f1
    w2 = c2 - f2
    i1 = f1.astype(jnp.int32)
    i2 = f2.astype(jnp.int32)
    i1c = jnp.minimum(i1 + 1, s1 - 1)
    i2c = jnp.minimum(i2 + 1, s2 - 1)

    # Flatten the sampled plane, gather 4 corners with advanced indexing.
    flat1 = [i1.ravel(), i1.ravel(), i1c.ravel(), i1c.ravel()]
    flat2 = [i2.ravel(), i2c.ravel(), i2.ravel(), i2c.ravel()]
    wts = [((1 - w1) * (1 - w2)).ravel(), ((1 - w1) * w2).ravel(),
           (w1 * (1 - w2)).ravel(), (w1 * w2).ravel()]

    # Move sampled axes to front for a single fused gather per corner.
    perm = [ax1, ax2] + [a for a in range(vol.ndim) if a not in (ax1, ax2)]
    v = jnp.transpose(vol, perm)
    out = None
    for a, b, wt in zip(flat1, flat2, wts):
        vals = v[a, b]  # [n_plane, *rest]
        wt = wt.reshape((-1,) + (1,) * (vals.ndim - 1)).astype(vals.dtype)
        out = vals * wt if out is None else out + vals * wt
    plane_shape = c1.shape
    out = out.reshape(plane_shape + v.shape[2:])
    # Undo the permutation.
    inv = np.argsort(perm)
    return jnp.transpose(out, inv)


#: Above this object size the rotation processes the carried axis in
#: sequential chunks: the 4 corner-gather temporaries are each object-sized,
#: so an unchunked rotate peaks at ~4x the object — the binding constraint
#: for large single-chip volumes (a 768^3 run exceeds 16G HBM through the
#: rotation alone).  Chunking bounds the temporaries to ~4 chunks.
#: Fractions of the per-device capacity, tuned on a 16 GB v5e
#: (512 MB threshold / 128 MB chunks = 1/32 and 1/128 of HBM).
_CHUNK_THRESHOLD_FRAC = 1 / 32
_CHUNK_TARGET_FRAC = 1 / 128


def _carried_chunks(n_carried: int, nbytes: int) -> int:
    """Smallest divisor of ``n_carried`` whose chunks fit the target
    (both scaled to the device's actual memory capacity)."""
    from ..utils import profiling as _prof
    hbm = _prof.hbm_limit_bytes()
    if nbytes <= hbm * _CHUNK_THRESHOLD_FRAC:
        return 1
    want = int(np.ceil(nbytes / (hbm * _CHUNK_TARGET_FRAC)))
    for k in range(want, n_carried + 1):
        if n_carried % k == 0:
            return k
    return 1


def rotate(obj, theta, axis=0, method='bilinear'):
    """Rotate a volume ``[s0, s1, s2, ...]`` about ``axis`` by ``theta`` rad.

    Trailing axes beyond the first three (e.g. the 2 delta/beta channels) are
    carried along unchanged, matching the reference's treatment of
    ``obj[y, x, z, 2]``.  Differentiable in ``obj`` and ``theta``.
    ``method`` selects the resampling (the reference's ``interpolation``
    kwarg): 'bilinear' (default) or 'nearest'.

    Large volumes rotate chunk-by-chunk over the carried (rotation) axis —
    each slice along ``axis`` rotates independently, so the result is
    identical while peak memory stays ~1 chunk of gather temporaries.
    """
    axes_rot = [a for a in range(3) if a != axis]
    c1, c2 = _rotation_source_coords((obj.shape[axes_rot[0]], obj.shape[axes_rot[1]]),
                                     jnp.asarray(theta, dtype=jnp.float32))
    k = _carried_chunks(obj.shape[axis], obj.size * obj.dtype.itemsize)
    if k == 1:
        return _gather_plane(obj, c1, c2, axes_rot[0], axes_rot[1], method)
    # Move the carried axis to the front and rotate chunk-by-chunk with a
    # fori_loop writing into a preallocated buffer; inside a chunk the
    # rotated plane is always axes (1, 2).  (A stacked lax.map output of
    # shape [k, chunk, X, Z, 2] gets a tiled layout that pads the size-2
    # channel dim to 128 on TPU — 64x the memory.)
    vol = jnp.moveaxis(obj, axis, 0)
    cy = vol.shape[0] // k

    def body(i, out):
        sl = jax.lax.dynamic_slice_in_dim(vol, i * cy, cy, 0)
        r = _gather_plane(sl, c1, c2, 1, 2, method)
        return jax.lax.dynamic_update_slice_in_dim(out, r, i * cy, 0)

    out = jax.lax.fori_loop(0, k, body, jnp.zeros_like(vol))
    return jnp.moveaxis(out, 0, axis)


def _bilinear_gather_plane_mapped_z(vol_b, c1, c2, nz_full, binning,
                                    method='bilinear'):
    """Bilinear sample in the (x, z) plane of a z-BINNED volume as if it
    were expanded to full depth: corner index ``z`` reads ``vol_b[z //
    binning]`` (the expansion is piecewise-constant in z, so only the
    corner lookup changes).  ``vol_b``: [x, zb, ...]; returns the plane
    ``c1.shape + trailing``."""
    s1 = vol_b.shape[0]
    if method not in ('bilinear', 'nearest'):
        raise ValueError(f'unknown interpolation method {method!r} '
                         "(expected 'bilinear' or 'nearest')")
    if method == 'nearest':
        i1 = jnp.clip(jnp.round(c1), 0, s1 - 1).astype(jnp.int32)
        i2 = (jnp.clip(jnp.round(c2), 0, nz_full - 1).astype(jnp.int32)
              // binning)
        return vol_b[i1.ravel(), i2.ravel()].reshape(
            c1.shape + vol_b.shape[2:])
    c1 = jnp.clip(c1, 0.0, s1 - 1.0)
    c2 = jnp.clip(c2, 0.0, nz_full - 1.0)
    f1 = jnp.floor(c1)
    f2 = jnp.floor(c2)
    w1 = c1 - f1
    w2 = c2 - f2
    i1 = f1.astype(jnp.int32)
    i2 = f2.astype(jnp.int32)
    i1c = jnp.minimum(i1 + 1, s1 - 1)
    i2c = jnp.minimum(i2 + 1, nz_full - 1)
    i2 = i2 // binning
    i2c = i2c // binning
    flat1 = [i1.ravel(), i1.ravel(), i1c.ravel(), i1c.ravel()]
    flat2 = [i2.ravel(), i2c.ravel(), i2.ravel(), i2c.ravel()]
    wts = [((1 - w1) * (1 - w2)).ravel(), ((1 - w1) * w2).ravel(),
           (w1 * (1 - w2)).ravel(), (w1 * w2).ravel()]
    out = None
    for a, b, wt in zip(flat1, flat2, wts):
        vals = vol_b[a, b]
        wt = wt.reshape((-1,) + (1,) * (vals.ndim - 1)).astype(vals.dtype)
        out = vals * wt if out is None else out + vals * wt
    return out.reshape(c1.shape + vol_b.shape[2:])


def rotate_and_bin_z(obj, theta, binning, method='bilinear'):
    """``bin_z(rotate(obj, theta))`` WITHOUT materializing the rotated
    full-resolution volume: each y-chunk is gathered and bin-summed before
    the next is produced.  For large objects this removes an object-sized
    buffer from the peak (a 768^3 delta/beta pair is 3.6 GB) and skips the
    separate full-resolution bin pass.

    ``obj``: [y, x, z, 2] (delta_beta channels — the bin identity is 0);
    returns [y, x, ceil(z/binning), 2].  Exactly equals
    ``rotate(obj, theta)`` followed by the zero-padded z bin-sum.
    """
    y, x, nz = obj.shape[:3]
    nz_b = -(-nz // binning)
    c1, c2 = _rotation_source_coords((x, nz),
                                     jnp.asarray(theta, dtype=jnp.float32))
    k = _carried_chunks(y, obj.size * obj.dtype.itemsize)
    cy = y // k if y % k == 0 else y

    def one_chunk(sl):
        from .propagate import bin_z_sum
        return bin_z_sum(_gather_plane(sl, c1, c2, 1, 2, method), binning,
                         axis=2)

    if cy == y:
        return one_chunk(obj)

    def body(i, out):
        sl = jax.lax.dynamic_slice_in_dim(obj, i * cy, cy, 0)
        return jax.lax.dynamic_update_slice_in_dim(out, one_chunk(sl),
                                                   i * cy, 0)

    out0 = jnp.zeros((y, x, nz_b) + obj.shape[3:], obj.dtype)
    return jax.lax.fori_loop(0, k, body, out0)


def rotate_expanded_from_binned_z(g_binned, theta, binning, nz_full,
                                  method='bilinear'):
    """``rotate(expand_z(g_binned), theta)`` WITHOUT materializing the
    expanded volume: the z expansion is piecewise-constant, so the bilinear
    corner lookups read ``g_binned[..., z // binning, :]`` directly.  Used
    for the gradient rotate-back (caller passes ``-theta``): the full-res
    rotated gradient is the only object-sized buffer produced.

    ``g_binned``: [y, x, zb, 2]; returns [y, x, nz_full, 2], exactly equal
    to ``rotate(jnp.repeat(g_binned, binning, 2)[:, :, :nz_full], theta)``.
    """
    y = g_binned.shape[0]
    x = g_binned.shape[1]
    c1, c2 = _rotation_source_coords((x, nz_full),
                                     jnp.asarray(theta, dtype=jnp.float32))
    out_bytes = (y * x * nz_full * int(np.prod(g_binned.shape[3:]))
                 * g_binned.dtype.itemsize)
    k = _carried_chunks(y, out_bytes)
    cy = y // k if y % k == 0 else y

    def one_chunk(sl):
        # vmap the plane sampler over the carried y axis of this chunk.
        return jax.vmap(
            lambda p: _bilinear_gather_plane_mapped_z(p, c1, c2, nz_full,
                                                      binning, method))(sl)

    if cy == y:
        return one_chunk(g_binned)

    def body(i, out):
        sl = jax.lax.dynamic_slice_in_dim(g_binned, i * cy, cy, 0)
        return jax.lax.dynamic_update_slice_in_dim(out, one_chunk(sl),
                                                   i * cy, 0)

    out0 = jnp.zeros((y, x, nz_full) + g_binned.shape[3:], g_binned.dtype)
    return jax.lax.fori_loop(0, k, body, out0)


def _taps_margin(s1: int, s2: int) -> int:
    """Static extension margin covering every theta: the rotated grid's
    sample coordinates overshoot an axis by at most
    ``sqrt(a^2 + b^2) - a`` (half-extents a, b), plus slack for the
    +-1 tap window and f32 rounding of the inverse-map centers."""
    a, b = (s1 - 1) / 2.0, (s2 - 1) / 2.0
    return int(np.ceil(float(np.hypot(a, b)) - min(a, b))) + 2


def rotate_adjoint_taps(cot, theta, binning: int = 1,
                        nz_full: int = None):
    """EXACT transpose of ``rotate(·, theta, axis=0, method='bilinear')``
    as a pure GATHER — no scatter anywhere.

    ``jax.vjp`` of the rotation's 4-corner gather lowers to an XLA
    scatter of ~4x|plane| slice updates, which TPU serializes (~16x off
    the bandwidth roofline — the immediate scheme's dominant cost,
    tools/probe_imm.py / NOTES #15).  This reformulation is exact:

    * Edge-clamped bilinear sampling of ``src`` equals UNCLAMPED
      sampling of the edge-replicated extension of ``src`` (replicated
      texels are constant along the clamped directions), so the adjoint
      factorizes as replicate^T (cheap margin-strip sums folded into the
      edge lines) after the unclamped adjoint on the extended grid.
    * The unclamped adjoint at extended texel ``e`` is a sum over output
      points ``p`` with ``|c(p) - e| < 1`` per axis (tent weights); all
      such ``p`` lie within the 3x3 integer window around
      ``round(R^{-1}(e))`` (the rotated unit box has circumradius
      sqrt(2) < 1.5), so 9 weighted tap-gathers reconstruct it exactly.
      Tap weights recompute the forward coordinates ``c(p)`` with the
      same f32 expression as :func:`_rotation_source_coords` — identical
      values, so the summed terms equal AD's (up to f32 association).

    ``cot``: the rotated-frame cotangent ``[Y, S1, S2, *rest]``; with
    ``binning > 1`` it is given z-BINNED (``[Y, S1, ceil(nz/binning),
    *rest]``) and read as its piecewise-constant expansion to
    ``nz_full`` — the repeat never materializes.  Returns the
    source-frame cotangent at full depth.
    """
    S1 = cot.shape[1]
    S2 = int(nz_full) if binning > 1 else cot.shape[2]
    M1 = _taps_margin(S1, S2)
    M2 = _taps_margin(S2, S1)
    ctr1 = (S1 - 1) / 2.0
    ctr2 = (S2 - 1) / 2.0
    theta = jnp.asarray(theta, jnp.float32)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    # Inverse-map centers for every extended texel (used only to LOCATE
    # the tap window, so f32 rounding here cannot break exactness).
    e1 = jnp.arange(S1 + 2 * M1, dtype=jnp.float32)[:, None] - M1 - ctr1
    e2 = jnp.arange(S2 + 2 * M2, dtype=jnp.float32)[None, :] - M2 - ctr2
    p1c = cos_t * e1 + sin_t * e2 + ctr1
    p2c = -sin_t * e1 + cos_t * e2 + ctr2
    b1 = jnp.round(p1c).astype(jnp.int32)
    b2 = jnp.round(p2c).astype(jnp.int32)
    e1_idx = e1 + ctr1        # the source-index value each texel holds
    e2_idx = e2 + ctr2
    # Plane-axes-first view for the shared-index tap gathers.
    v = jnp.moveaxis(cot, 0, 2)             # [S1, S2(b), Y, *rest]
    acc = None
    for d1 in (-1, 0, 1):
        for d2 in (-1, 0, 1):
            t1 = b1 + d1
            t2 = b2 + d2
            valid = ((t1 >= 0) & (t1 < S1) & (t2 >= 0) & (t2 < S2))
            t1 = jnp.clip(t1, 0, S1 - 1)
            t2 = jnp.clip(t2, 0, S2 - 1)
            # Forward coords of the tap output point — the SAME f32
            # expression tree as _rotation_source_coords, so the weights
            # match the forward's bit-for-bit.
            g1 = t1.astype(jnp.float32) - ctr1
            g2 = t2.astype(jnp.float32) - ctr2
            c1t = cos_t * g1 - sin_t * g2 + ctr1
            c2t = sin_t * g1 + cos_t * g2 + ctr2
            w = (jnp.maximum(0.0, 1.0 - jnp.abs(c1t - e1_idx))
                 * jnp.maximum(0.0, 1.0 - jnp.abs(c2t - e2_idx))
                 * valid)
            t2v = t2 // binning if binning > 1 else t2
            vals = v[t1.ravel(), t2v.ravel()]        # [N, Y, *rest]
            w = w.reshape((-1,) + (1,) * (vals.ndim - 1)).astype(
                vals.dtype)
            acc = vals * w if acc is None else acc + vals * w
    ext = acc.reshape((S1 + 2 * M1, S2 + 2 * M2) + acc.shape[1:])
    # replicate^T: fold the margin strips into the edge lines, per axis.
    core = ext[M1:M1 + S1]
    core = core.at[0].add(ext[:M1].sum(axis=0))
    core = core.at[S1 - 1].add(ext[M1 + S1:].sum(axis=0))
    core2 = core[:, M2:M2 + S2]
    core2 = core2.at[:, 0].add(core[:, :M2].sum(axis=1))
    core2 = core2.at[:, S2 - 1].add(core[:, M2 + S2:].sum(axis=1))
    return jnp.moveaxis(core2, 2, 0)        # back to [Y, S1, S2, *rest]


def rotate_adjoint(cotangent, theta, axis=0, method='bilinear'):
    """Transpose (adjoint) of :func:`rotate` at the same ``theta``.

    The reference uses this to rotate accumulated gradients back to the 0-deg
    frame (``apply_rotation(..., reverse=True)`` -> ``apply_rotation_transpose``,
    ``adorym/util.py:623-696``; driver use at ``adorym/ptychography.py:1069-1078``).
    Note this is the linear-map transpose, not rotation by ``-theta``.
    Since :func:`rotate` is linear in the object, the VJP at any primal is
    exact.
    """
    cotangent = jnp.asarray(cotangent)
    _, vjp = jax.vjp(lambda o: rotate(o, theta, axis=axis, method=method),
                     jnp.zeros_like(cotangent))
    return vjp(cotangent)[0]


def tilt_rotate(obj, tilts, method='bilinear'):
    """Apply the 3-axis tilt sequence used for tilt refinement
    (``adorym/forward_model.py:274-276``): rotate about axes 0, 1, 2 in turn
    by ``tilts[0..2]``.  Differentiable in ``tilts``."""
    obj = rotate(obj, tilts[0], axis=0, method=method)
    obj = rotate(obj, tilts[1], axis=1, method=method)
    obj = rotate(obj, tilts[2], axis=2, method=method)
    return obj
