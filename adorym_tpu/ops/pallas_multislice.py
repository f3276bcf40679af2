"""Fused multislice propagation as a Pallas TPU kernel.

The multislice hot loop is, per z-step, an elementwise complex modulation
followed by a tiny 2D FFT-convolve on ``[N, ny, nx]`` patches
(``adorym/propagate.py:207-258``).  XLA lowers the small mixed-radix FFTs
poorly on TPU; here each step's two transforms run as dense DFT *matmuls on
the MXU* (for patch sizes up to ~256 the O(n^3) matmul beats the FFT on a
systolic array), and the wavefield never leaves VMEM across the z scan —
the per-step slice modulators stream in from HBM through Pallas's
double-buffered block pipeline.

Complex math is carried as separate real/imag float32 planes (Mosaic has no
native complex).  The backward pass is the physics adjoint: conjugate
transfer function, reversed step order, with forward intermediates streamed
back from HBM (they are a natural per-step kernel output).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fourier import dft_matrix


def _cmatmul_right(ar, ai, br, bi):
    """(a @ b) for complex operands given as real/imag, contracting a's last
    axis.  a: [..., k], b: [k, n].

    Precision defaults to HIGHEST: Mosaic's DEFAULT dot precision is a
    single bf16 MXU pass, which costs ~1% relative error PER TRANSFORM —
    measured 2.8% mean / 9.6% max forward error after only 8 z-steps on a
    v5e.  HIGHEST (multi-pass f32) brings the kernel to 4.5e-7 mean error
    vs a float64 reference.  (Mosaic supports only DEFAULT and HIGHEST;
    the bf16 single-pass mode stays available behind ``run_bfloat16``.)
    """
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=_DOT_PRECISION[0])
    # Gauss 3-multiplication form: the kernel is MXU-throughput-bound at
    # the padded [*,128]x[128,128] tile shapes, so trading the 4th dot for
    # three cheap VPU adds is a straight 25% MXU-work cut.  b-side combos
    # are [k, n] (the small fixed DFT mats); a-side adds are elementwise.
    k1 = dot(ar + ai, br)
    k2 = dot(ar, bi - br)
    k3 = dot(ai, br + bi)
    return k1 - k3, k1 + k2


# Trace-time switch consulted by the kernel bodies (Pallas kernel fns
# can't thread extra static args through pallas_call cleanly).
# Thread-local: concurrent traces from different threads (one bf16, one
# f32) must not race the precision into each other's compiled program.
import threading

_DOT_TLS = threading.local()


class _DotPrecisionProxy:
    def __getitem__(self, _):
        return getattr(_DOT_TLS, 'p', jax.lax.Precision.HIGHEST)


_DOT_PRECISION = _DotPrecisionProxy()


class _dot_precision:
    """Context manager selecting the MXU dot precision for kernels traced
    within (trace-time only — compiled executables keep their precision)."""

    def __init__(self, bf16):
        self.p = jax.lax.Precision.DEFAULT if bf16 else jax.lax.Precision.HIGHEST

    def __enter__(self):
        self.prev = getattr(_DOT_TLS, 'p', jax.lax.Precision.HIGHEST)
        _DOT_TLS.p = self.p

    def __exit__(self, *exc):
        _DOT_TLS.p = self.prev


def _fold_prop_mats(h_r, h_i, ny, nx):
    """Per-axis FOLDED propagation matrices for a SEPARABLE (paraxial)
    transfer kernel: ``P_ax = G diag(h_ax) F``, so ONE complex matmul per
    axis replaces the FFT -> *H -> IFFT triple (the delta_beta kernels
    are gated on ``fresnel_approx``, where ``H[y,x] = hy[y]*hx[x]``
    exactly, with ``hy = H[:,0]/H[0,0]``, ``hx = H[0,:]`` — index 0 is
    the zero frequency, so ``H[0,0] = 1``).  Halves the kernels' MXU
    work at the padded 128-tile dot shapes that bound them.

    Built OUTSIDE the kernel at HIGHEST precision, once per trace.
    Returns ``(py, px)`` as complex arrays with ``P[out, in]``
    orientation; P is unitary (|entries| <= 1, bf16-friendly).
    """
    hi = jax.lax.Precision.HIGHEST
    h = (h_r + 1j * h_i).astype(jnp.complex64)
    hy = h[:, 0] / h[0, 0]
    hx = h[0, :]
    fy = jnp.asarray(dft_matrix(ny))
    gy = jnp.asarray(dft_matrix(ny, inverse=True))
    fx = jnp.asarray(dft_matrix(nx))
    gx = jnp.asarray(dft_matrix(nx, inverse=True))
    py = jnp.matmul(gy * hy[None, :], fy, precision=hi)
    px = jnp.matmul(gx * hx[None, :], fx, precision=hi)
    return py, px


def _split_prop_variants(py, px, transpose=False, inverse=False):
    """Real/imag pairs oriented so the kernel's ``w @ arg.T`` applies the
    requested propagation.  Forward: ``w @ P^T`` (arg = P).  Transpose
    (cotangent flow, JAX's unconjugated convention): ``w @ P``
    (arg = P^T).  Inverse (wave reconstruction, |h| = 1):
    ``G diag(conj h) F = conj(P)^T`` because the DFT mats are symmetric
    and ``conj(G) = F/n`` — so ``w @ (P^{-1})^T = w @ conj(P)``
    (arg = conj(P).T)."""
    if inverse:
        py, px = jnp.conj(py).T, jnp.conj(px).T
    elif transpose:
        py, px = py.T, px.T
    return (jnp.real(py), jnp.imag(py), jnp.real(px), jnp.imag(px))


def _apply_prop(wr, wi, my_r, my_i, mx_r, mx_i):
    """``w <- P w`` with folded per-axis mats: x pass right-matmul by
    ``mx.T``, ONE transpose, y pass by ``my.T``, transpose back."""
    batch = wr.shape[:-2]
    ny, nx = wr.shape[-2:]
    B = int(np.prod(batch)) if batch else 1
    ar = wr.reshape(B * ny, nx)
    ai = wi.reshape(B * ny, nx)
    xr, xi = _cmatmul_right(ar, ai, mx_r.T, mx_i.T)
    tr = jnp.transpose(xr.reshape(B, ny, nx), (0, 2, 1)).reshape(B * nx, ny)
    ti = jnp.transpose(xi.reshape(B, ny, nx), (0, 2, 1)).reshape(B * nx, ny)
    yr, yi = _cmatmul_right(tr, ti, my_r.T, my_i.T)
    ur = jnp.transpose(yr.reshape(B, nx, ny), (0, 2, 1)).reshape(*batch, ny, nx)
    ui = jnp.transpose(yi.reshape(B, nx, ny), (0, 2, 1)).reshape(*batch, ny, nx)
    return ur, ui


def _propagate_block(wr, wi, h_r, h_i, mats):
    """One Fresnel step: FFT2 -> *H -> IFFT2, all in VMEM.

    The two transforms share the transposed intermediate: x pass,
    ONE transpose to [B, nx, ny], y pass, H applied TRANSPOSED, inverse
    y pass, ONE transpose back, inverse x pass — 2 wave-block transposes
    per propagation instead of the naive 4.  Same transform to f32
    roundoff (the inverse now associates y-then-x instead of x-then-y).
    """
    fy_r, fy_i, fx_r, fx_i, gy_r, gy_i, gx_r, gx_i = mats
    batch = wr.shape[:-2]
    ny, nx = wr.shape[-2:]
    B = int(np.prod(batch)) if batch else 1
    # x axis: out[b,y,x] = sum_k w[b,y,k] Fx[x,k] -> (B*ny, nx) @ Fx^T
    ar = wr.reshape(B * ny, nx)
    ai = wi.reshape(B * ny, nx)
    xr, xi = _cmatmul_right(ar, ai, fx_r.T, fx_i.T)
    # transpose once to [B, nx, ny]
    tr = jnp.transpose(xr.reshape(B, ny, nx), (0, 2, 1)).reshape(B * nx, ny)
    ti = jnp.transpose(xi.reshape(B, ny, nx), (0, 2, 1)).reshape(B * nx, ny)
    # y axis in transposed layout: (B*nx, ny) @ Fy^T
    yr, yi = _cmatmul_right(tr, ti, fy_r.T, fy_i.T)
    # H in transposed layout: broadcast H^T [nx, ny] over B
    ht_r = h_r.T.reshape(1, nx, ny)
    ht_i = h_i.T.reshape(1, nx, ny)
    y3r = yr.reshape(B, nx, ny)
    y3i = yi.reshape(B, nx, ny)
    pr = (y3r * ht_r - y3i * ht_i).reshape(B * nx, ny)
    pi = (y3r * ht_i + y3i * ht_r).reshape(B * nx, ny)
    # inverse y pass, still transposed
    qr, qi = _cmatmul_right(pr, pi, gy_r.T, gy_i.T)
    # transpose back to [B, ny, nx]
    ur = jnp.transpose(qr.reshape(B, nx, ny), (0, 2, 1)).reshape(B * ny, nx)
    ui = jnp.transpose(qi.reshape(B, nx, ny), (0, 2, 1)).reshape(B * ny, nx)
    # inverse x pass
    vr, vi = _cmatmul_right(ur, ui, gx_r.T, gx_i.T)
    return (vr.reshape(*batch, ny, nx), vi.reshape(*batch, ny, nx))


def _fwd_kernel(t_r_ref, t_i_ref, w0_r_ref, w0_i_ref, h_r_ref, h_i_ref,
                fy_r, fy_i, fx_r, fx_i, gy_r, gy_i, gx_r, gx_i,
                out_r_ref, out_i_ref, inter_r_ref, inter_i_ref,
                w_r, w_i):
    """Grid (n_batch_blocks, n_steps); the wave block lives in VMEM
    scratch across the z-steps of its batch block."""
    step = pl.program_id(1)
    n_steps = pl.num_programs(1)

    @pl.when(step == 0)
    def _():
        w_r[:] = w0_r_ref[:]
        w_i[:] = w0_i_ref[:]

    # Record the wavefield entering this step (the backward pass residual).
    inter_r_ref[0] = w_r[:]
    inter_i_ref[0] = w_i[:]

    # Modulate by this step's slice transmission.
    tr = t_r_ref[0]
    ti = t_i_ref[0]
    mr = w_r[:] * tr - w_i[:] * ti
    mi = w_r[:] * ti + w_i[:] * tr

    @pl.when(step < n_steps - 1)
    def _():
        mats = (fy_r[:], fy_i[:], fx_r[:], fx_i[:],
                gy_r[:], gy_i[:], gx_r[:], gx_i[:])
        pr, pi = _propagate_block(mr, mi, h_r_ref[:], h_i_ref[:], mats)
        w_r[:] = pr
        w_i[:] = pi

    @pl.when(step == n_steps - 1)
    def _():
        out_r_ref[:] = mr
        out_i_ref[:] = mi


def _bwd_kernel(t_r_ref, t_i_ref, inter_r_ref, inter_i_ref,
                g_r_ref, g_i_ref, hc_r_ref, hc_i_ref,
                fy_r, fy_i, fx_r, fx_i, gy_r, gy_i, gx_r, gx_i,
                gt_r_ref, gt_i_ref, gw_r_ref, gw_i_ref,
                a_r, a_i):
    """Reverse sweep: grid step s visits z-step (n_steps-1-s).

    JAX's complex-cotangent convention is the UNconjugated transpose (vjp of
    ``w*t`` w.r.t. ``w`` is ``t*g``; vjp of ``fft2`` is ``fft2``), so the
    transpose of the Fresnel step ``P = G H F`` is ``P^T = F H G`` — same
    kernel H, transform order swapped — and the modulation transposes to a
    plain complex multiply (no conjugates).
    """
    s = pl.program_id(1)
    n_steps = pl.num_programs(1)

    @pl.when(s == 0)
    def _():
        a_r[:] = g_r_ref[:]
        a_i[:] = g_i_ref[:]

    @pl.when(s > 0)
    def _():
        # Entering any step but the last, the cotangent first flows through
        # the transpose of the propagation that followed the modulation:
        # P^T = F H G (inverse transform first, then forward).
        mats = (gy_r[:], gy_i[:], gx_r[:], gx_i[:],
                fy_r[:], fy_i[:], fx_r[:], fx_i[:])
        pr, pi = _propagate_block(a_r[:], a_i[:], hc_r_ref[:], hc_i_ref[:],
                                  mats)
        a_r[:] = pr
        a_i[:] = pi

    # Cotangent w.r.t. this step's t: a * w_in; then through the
    # modulation: a *= t (plain transposes in JAX's convention).
    wr = inter_r_ref[0]
    wi = inter_i_ref[0]
    tr = t_r_ref[0]
    ti = t_i_ref[0]
    # Sum the slice-transmission cotangent over the probe-mode axis (t
    # broadcasts over modes in the forward pass).
    gt_r_ref[0] = jnp.sum(a_r[:] * wr - a_i[:] * wi, axis=0)
    gt_i_ref[0] = jnp.sum(a_r[:] * wi + a_i[:] * wr, axis=0)
    new_r = a_r[:] * tr - a_i[:] * ti
    new_i = a_r[:] * ti + a_i[:] * tr
    a_r[:] = new_r
    a_i[:] = new_i

    @pl.when(s == n_steps - 1)
    def _():
        gw_r_ref[:] = a_r[:]
        gw_i_ref[:] = a_i[:]


# ---------------------------------------------------------------------------
# delta/beta-fused variant: modulator computed IN-KERNEL, backward
# reconstructs the forward wavefields by INVERTING the propagation
# ---------------------------------------------------------------------------

def _db_mod(d, b, k1, s):
    """Slice transmission t = exp(-k1*b) * exp(-i*s*k1*d) as (re, im).

    The object planes stream in their NATIVE dtype (bf16 under
    run_bfloat16 — half the HBM bytes) and upcast on the VPU here, so the
    transcendentals always evaluate at f32."""
    d = d.astype(jnp.float32)
    b = b.astype(jnp.float32)
    amp = jnp.exp(-k1 * b)
    ph = -s * k1 * d
    return amp * jnp.cos(ph), amp * jnp.sin(ph)


def _fwd_db_kernel(db_ref, w0_r_ref, w0_i_ref,
                   py_r, py_i, px_r, px_i, *rest, k1, s, final=False,
                   unroll=1):
    """Like _fwd_kernel but takes the two REAL object channels (PACKED as
    one ``[U, 2, NB, ny, nx]`` block — slot 0 delta, slot 1 beta, so the
    caller-side glue is ONE fused transpose of the ``[..., z, 2]`` patch
    stack instead of two strided ones) and computes the complex modulator
    on the VPU — half the modulator stream bytes and NO intermediate
    -wavefield output (the backward reconstructs them).
    Propagation via the FOLDED per-axis mats (:func:`_fold_prop_mats`).

    ``final=True`` threads 4 extra matrix refs (ay, ax as real/imag): the
    object-to-detector propagation folded into the LAST step, so the kernel
    emits the DETECTOR wave and the exit wave never round-trips HBM.

    ``unroll``: z-steps per grid cell (must divide n_steps) — amortizes the
    measured per-grid-cell overhead, bit-identical math (see
    :func:`_fwd_db_st_kernel`)."""
    if final:
        ay_r, ay_i, ax_r, ax_i, out_r_ref, out_i_ref, w_r, w_i = rest
    else:
        out_r_ref, out_i_ref, w_r, w_i = rest
    step = pl.program_id(1)
    n_cells = pl.num_programs(1)

    @pl.when(step == 0)
    def _():
        w_r[:] = w0_r_ref[:]
        w_i[:] = w0_i_ref[:]

    for u in range(unroll):
        tr, ti = _db_mod(db_ref[u, 0], db_ref[u, 1], k1, s)
        mr = w_r[:] * tr - w_i[:] * ti
        mi = w_r[:] * ti + w_i[:] * tr

        if u < unroll - 1:
            pr, pi = _apply_prop(mr, mi, py_r[:], py_i[:], px_r[:], px_i[:])
            w_r[:] = pr
            w_i[:] = pi
        else:
            @pl.when(step < n_cells - 1)
            def _():
                pr, pi = _apply_prop(mr, mi, py_r[:], py_i[:],
                                     px_r[:], px_i[:])
                w_r[:] = pr
                w_i[:] = pi

            @pl.when(step == n_cells - 1)
            def _():
                if final:
                    fr, fi = _apply_prop(mr, mi, ay_r[:], ay_i[:],
                                         ax_r[:], ax_i[:])
                    out_r_ref[:] = fr
                    out_i_ref[:] = fi
                else:
                    out_r_ref[:] = mr
                    out_i_ref[:] = mi


def _fwd_db_st_kernel(db_ref, w0_r_ref, w0_i_ref,
                      py_r, py_i, px_r, px_i, *rest, k1, s, final=False,
                      unroll=1):
    """Modulator-fused forward that RECORDS the per-step entering
    wavefields (like _fwd_kernel) — pairs with _bwd_db_st_kernel's cheap
    1-propagation backward.  Streams half the modulator bytes of the
    t_all kernel (two f32 planes instead of complex); the object channels
    arrive PACKED ``[U, 2, NB, ny, nx]`` (see :func:`_fwd_db_kernel`).
    Propagation via the FOLDED per-axis mats (:func:`_fold_prop_mats`).

    ``final=True``: 4 extra refs (ay, ax real/imag) fold the detector
    propagation into the last step (see :func:`_fwd_db_kernel`).

    ``unroll``: z-steps per grid cell (must divide n_steps; the caller
    picks it).  Fewer, larger grid cells measurably beat the per-cell
    overhead at flagship shapes (~15% on the forward, interleaved A/B
    2026-08-18) while the math stays BIT-identical — within a cell the
    steps run in the exact same order with the same f32 scratch carry."""
    if final:
        (ay_r, ay_i, ax_r, ax_i, out_r_ref, out_i_ref,
         inter_r_ref, inter_i_ref, w_r, w_i) = rest
    else:
        out_r_ref, out_i_ref, inter_r_ref, inter_i_ref, w_r, w_i = rest
    step = pl.program_id(1)
    n_cells = pl.num_programs(1)

    @pl.when(step == 0)
    def _():
        w_r[:] = w0_r_ref[:]
        w_i[:] = w0_i_ref[:]

    for u in range(unroll):
        # Recorded in the object planes' dtype: bf16 under run_bfloat16 —
        # the stored stack's DMA cost is the measured gap between this and
        # the invertible forward (~5 ms/flagship chunk at f32), and the
        # records only feed the gt products in the backward.
        inter_r_ref[u] = w_r[:].astype(inter_r_ref.dtype)
        inter_i_ref[u] = w_i[:].astype(inter_i_ref.dtype)

        tr, ti = _db_mod(db_ref[u, 0], db_ref[u, 1], k1, s)
        mr = w_r[:] * tr - w_i[:] * ti
        mi = w_r[:] * ti + w_i[:] * tr

        if u < unroll - 1:
            # Interior of the cell: never the last global step (the caller
            # guarantees unroll | n_steps), so propagate unconditionally.
            pr, pi = _apply_prop(mr, mi, py_r[:], py_i[:], px_r[:], px_i[:])
            w_r[:] = pr
            w_i[:] = pi
        else:
            @pl.when(step < n_cells - 1)
            def _():
                pr, pi = _apply_prop(mr, mi, py_r[:], py_i[:],
                                     px_r[:], px_i[:])
                w_r[:] = pr
                w_i[:] = pi

            @pl.when(step == n_cells - 1)
            def _():
                if final:
                    fr, fi = _apply_prop(mr, mi, ay_r[:], ay_i[:],
                                         ax_r[:], ax_i[:])
                    out_r_ref[:] = fr
                    out_i_ref[:] = fi
                else:
                    out_r_ref[:] = mr
                    out_i_ref[:] = mi


def _bwd_db_st_kernel(db_ref, inter_r_ref, inter_i_ref,
                      g_r_ref, g_i_ref, ty_r, ty_i, tx_r, tx_i,
                      *rest, k1, s, final=False, unroll=1):
    """Reverse sweep with stored intermediates (like _bwd_kernel) but the
    modulator recomputed from the two PACKED object planes and the
    cotangent emitted directly as a packed (gd, gb) ``[U, 2, NB, ny, nx]``
    block — the modulator VJP fuses in-kernel and the caller-side glue
    back to the ``[..., z, 2]`` patch layout is ONE fused transpose.
    ``ty/tx``: TRANSPOSE-variant folded mats (cotangent flows through
    ``P^T``).

    ``final=True``: 4 extra refs (TRANSPOSED final mats) — the incoming
    cotangent is in detector space and first flows through the transpose
    of the folded detector propagation.

    ``unroll``: z-steps per grid cell, processed in DESCENDING z within
    the cell (the grid already runs cells in reverse z); must divide
    n_steps.  Bit-identical to unroll=1 — same op order, same carry."""
    if final:
        fy_r, fy_i, fx_r, fx_i, gdb_ref, gw_r_ref, gw_i_ref, a_r, a_i = rest
    else:
        gdb_ref, gw_r_ref, gw_i_ref, a_r, a_i = rest
    st = pl.program_id(1)
    n_cells = pl.num_programs(1)

    for u in range(unroll - 1, -1, -1):
        if u == unroll - 1:
            @pl.when(st == 0)
            def _():
                if final:
                    pr, pi = _apply_prop(g_r_ref[:], g_i_ref[:],
                                         fy_r[:], fy_i[:], fx_r[:], fx_i[:])
                    a_r[:] = pr
                    a_i[:] = pi
                else:
                    a_r[:] = g_r_ref[:]
                    a_i[:] = g_i_ref[:]

            @pl.when(st > 0)
            def _():
                pr, pi = _apply_prop(a_r[:], a_i[:], ty_r[:], ty_i[:],
                                     tx_r[:], tx_i[:])
                a_r[:] = pr
                a_i[:] = pi
        else:
            # Interior reverse step: never the first global one.
            pr, pi = _apply_prop(a_r[:], a_i[:], ty_r[:], ty_i[:],
                                 tx_r[:], tx_i[:])
            a_r[:] = pr
            a_i[:] = pi

        wr = inter_r_ref[u].astype(jnp.float32)
        wi = inter_i_ref[u].astype(jnp.float32)
        tr, ti = _db_mod(db_ref[u, 0], db_ref[u, 1], k1, s)
        gt_r = jnp.sum(a_r[:] * wr - a_i[:] * wi, axis=0)
        gt_i = jnp.sum(a_r[:] * wi + a_i[:] * wr, axis=0)
        # Chain through t = exp(u) (see _bwd_db_kernel).  gd/gb emit in the
        # object planes' native dtype (bf16 under run_bfloat16).
        cu_r = gt_r * tr - gt_i * ti
        cu_i = gt_r * ti + gt_i * tr
        gdb_ref[u, 1] = (-k1 * cu_r).astype(gdb_ref.dtype)
        gdb_ref[u, 0] = (s * k1 * cu_i).astype(gdb_ref.dtype)
        new_r = a_r[:] * tr - a_i[:] * ti
        new_i = a_r[:] * ti + a_i[:] * tr
        a_r[:] = new_r
        a_i[:] = new_i

    @pl.when(st == n_cells - 1)
    def _():
        gw_r_ref[:] = a_r[:]
        gw_i_ref[:] = a_i[:]


def _bwd_db_kernel(db_ref, out_r_ref, out_i_ref, g_r_ref, g_i_ref,
                   ty_r, ty_i, tx_r, tx_i, iy_r, iy_i, ix_r, ix_i,
                   *rest, k1, s, final=False, unroll=1):
    """Reverse sweep with NO stored intermediates: the Fresnel step is
    invertible (H is unit-modulus under the paraxial approximation and the
    delta_beta transmission never vanishes), so the pre-modulation
    wavefield of every step is reconstructed on the fly:
    ``m(z) = P^{-1}(w(z+1))``, ``w(z) = m(z) / t(z)``, with
    ``P^{-1} = IFFT . conj(H) . FFT`` and ``1/t = exp(+k1*b)*exp(+i*s*k1*d)``
    computed directly from the object channels (no division).
    Cotangent flow is the plain transpose, as in _bwd_kernel.
    ``ty/tx``: TRANSPOSE-variant folded mats; ``iy/ix``: INVERSE-variant
    (:func:`_split_prop_variants`).

    ``final=True``: 8 extra refs — the TRANSPOSE (fy/fx) and exact INVERSE
    (ey/ex) of the folded detector propagation.  The recorded output is
    then the DETECTOR wave: the cotangent enters through the transpose and
    the exit wave is reconstructed through the inverse (the Fraunhofer DFT
    is invertible exactly; unlike the unit-modulus Fresnel mats its
    unnormalized form is NOT unitary, so the inverse is supplied, not
    derived by conjugation)."""
    if final:
        (fy_r, fy_i, fx_r, fx_i, ey_r, ey_i, ex_r, ex_i,
         gdb_ref, gw_r_ref, gw_i_ref, a_r, a_i, v_r, v_i) = rest
    else:
        gdb_ref, gw_r_ref, gw_i_ref, a_r, a_i, v_r, v_i = rest
    st = pl.program_id(1)
    n_cells = pl.num_programs(1)

    for u in range(unroll - 1, -1, -1):
        if u == unroll - 1:
            @pl.when(st == 0)
            def _():
                if final:
                    pr, pi = _apply_prop(g_r_ref[:], g_i_ref[:],
                                         fy_r[:], fy_i[:], fx_r[:], fx_i[:])
                    a_r[:] = pr
                    a_i[:] = pi
                    qr, qi = _apply_prop(out_r_ref[:], out_i_ref[:],
                                         ey_r[:], ey_i[:], ex_r[:], ex_i[:])
                    v_r[:] = qr          # m(S-1) reconstructed from det wave
                    v_i[:] = qi
                else:
                    a_r[:] = g_r_ref[:]
                    a_i[:] = g_i_ref[:]
                    v_r[:] = out_r_ref[:]  # m(S-1) = exit wave (no final)
                    v_i[:] = out_i_ref[:]

            @pl.when(st > 0)
            def _():
                # Cotangent through the transpose of the following
                # propagation; wave reconstruction through the inverse:
                # m(z) = P^{-1}(w(z+1)).
                pr, pi = _apply_prop(a_r[:], a_i[:], ty_r[:], ty_i[:],
                                     tx_r[:], tx_i[:])
                a_r[:] = pr
                a_i[:] = pi
                qr, qi = _apply_prop(v_r[:], v_i[:], iy_r[:], iy_i[:],
                                     ix_r[:], ix_i[:])
                v_r[:] = qr
                v_i[:] = qi
        else:
            # Interior reverse step: never the first global one.
            pr, pi = _apply_prop(a_r[:], a_i[:], ty_r[:], ty_i[:],
                                 tx_r[:], tx_i[:])
            a_r[:] = pr
            a_i[:] = pi
            qr, qi = _apply_prop(v_r[:], v_i[:], iy_r[:], iy_i[:],
                                 ix_r[:], ix_i[:])
            v_r[:] = qr
            v_i[:] = qi

        d = db_ref[u, 0].astype(jnp.float32)
        b = db_ref[u, 1].astype(jnp.float32)
        amp = jnp.exp(-k1 * b)
        ph = -s * k1 * d
        cph = jnp.cos(ph)
        sph = jnp.sin(ph)
        tr = amp * cph
        ti = amp * sph
        inv_amp = jnp.exp(k1 * b)
        ur = inv_amp * cph
        ui = -inv_amp * sph
        # w(z) = m(z) * (1/t)
        wr = v_r[:] * ur - v_i[:] * ui
        wi = v_r[:] * ui + v_i[:] * ur
        # Modulator cotangent gt = sum_modes(a * w) (unconjugated), chained
        # through t = exp(u), u = -k1*b + i*(-s*k1*d): cot_u = gt * t, then
        # the real->complex boundary (verified against jax.vjp of
        # slice_modulator): cot_b = -k1*Re(cot_u); cot_d = +s*k1*Im(cot_u)
        # (JAX's ``complex`` primitive transpose conjugates — the imag
        # channel flips sign).
        gt_r = jnp.sum(a_r[:] * wr - a_i[:] * wi, axis=0)
        gt_i = jnp.sum(a_r[:] * wi + a_i[:] * wr, axis=0)
        cu_r = gt_r * tr - gt_i * ti
        cu_i = gt_r * ti + gt_i * tr
        gdb_ref[u, 1] = (-k1 * cu_r).astype(gdb_ref.dtype)
        gdb_ref[u, 0] = (s * k1 * cu_i).astype(gdb_ref.dtype)
        # Cotangent through the modulation (plain multiply), carry w.
        na_r = a_r[:] * tr - a_i[:] * ti
        na_i = a_r[:] * ti + a_i[:] * tr
        a_r[:] = na_r
        a_i[:] = na_i
        v_r[:] = wr
        v_i[:] = wi

    @pl.when(st == n_cells - 1)
    def _():
        gw_r_ref[:] = a_r[:]
        gw_i_ref[:] = a_i[:]


def _dft_mats(ny, nx):
    fy = dft_matrix(ny)
    fx = dft_matrix(nx)
    gy = dft_matrix(ny, inverse=True)
    gx = dft_matrix(nx, inverse=True)
    return tuple(jnp.asarray(m) for pair in
                 [(fy.real, fy.imag), (fx.real, fx.imag),
                  (gy.real, gy.imag), (gx.real, gx.imag)]
                 for m in pair)


def _pick_nb(M, N, ny, nx):
    """Batch-block size keeping the kernel's VMEM footprint — roughly 10
    double-buffered wave-block-sized buffers plus the matmul stack
    temporaries — comfortably inside the 16MB scoped budget.  Callers pad
    N up to a multiple of the block."""
    nb = N
    # 16 buffers: HIGHEST-precision dots hold ~3x the matmul temporaries of
    # the single-pass default (an 18.4M scoped-vmem OOM at 10 buffers).
    while nb > 1 and 16 * M * nb * ny * nx * 4 > 4 * 2 ** 20:
        nb = (nb + 1) // 2
    return nb


def _pick_unroll(n_steps, M, NB, ny, nx, itemsize):
    """Z-steps per grid cell for the stored-db kernels.  Must divide
    n_steps exactly (interior steps propagate unconditionally, so a
    ragged tail would apply a propagation the math doesn't have).  Bounded
    by the streamed VMEM blocks: d, b and the two recorded planes scale
    with the unroll factor (double-buffered), and the rest of the kernel's
    footprint is what :func:`_pick_nb` already budgeted."""
    for u in (4, 2):
        streamed = 2 * (2 + 2 * M) * u * NB * ny * nx * itemsize
        if n_steps % u == 0 and streamed <= 8 * 2 ** 20:
            return u
    return 1


def _cparams(U):
    """Mosaic compiler params for a given unroll.  The default 16M scoped
    VMEM fits the double-buffered streams up to U=4 at flagship blocks;
    forced larger unrolls (probes / future tuning) need headroom."""
    if U <= 4:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)


def _pad_batch(arrs, N, NB, fills):
    """Pad each [.., N, ny, nx] array's batch dim up to a multiple of NB."""
    pad = (-N) % NB
    if pad == 0:
        return arrs, N
    out = []
    for a, fill in zip(arrs, fills):
        widths = [(0, 0)] * a.ndim
        widths[-3] = (0, pad)
        out.append(jnp.pad(a, widths, constant_values=fill))
    return out, N + pad


def _call_fwd(t_r, t_i, w_r, w_i, h_r, h_i, interpret=False, bf16=False):
    """t: [S, N, ny, nx]; wave: [M, N, ny, nx] (M = probe modes)."""
    with _dot_precision(bf16):
        return _call_fwd_inner(t_r, t_i, w_r, w_i, h_r, h_i, interpret)


def _call_fwd_inner(t_r, t_i, w_r, w_i, h_r, h_i, interpret=False):
    n_steps, N0, ny, nx = t_r.shape
    M = w_r.shape[0]
    NB = _pick_nb(M, N0, ny, nx)
    # Pad the batch so NB divides it (t pads with 1s = identity modulation,
    # waves with 0s); callers crop.
    (t_r, t_i, w_r, w_i), N = _pad_batch((t_r, t_i, w_r, w_i), N0, NB,
                                         (1.0, 0.0, 0.0, 0.0))
    n_blocks = N // NB
    mats = _dft_mats(ny, nx)
    vmem = pltpu.VMEM
    t_spec = pl.BlockSpec((1, NB, ny, nx), lambda b, s: (s, b, 0, 0),
                          memory_space=vmem)
    w0_spec = pl.BlockSpec((M, NB, ny, nx), lambda b, s: (0, b, 0, 0),
                           memory_space=vmem)
    h_spec = pl.BlockSpec((ny, nx), lambda b, s: (0, 0), memory_space=vmem)

    def m_spec(n):
        return pl.BlockSpec((n, n), lambda b, s: (0, 0), memory_space=vmem)

    inter_spec = pl.BlockSpec((1, M, NB, ny, nx),
                              lambda b, s: (s, 0, b, 0, 0),
                              memory_space=vmem)
    out_shapes = (
        jax.ShapeDtypeStruct((M, N, ny, nx), jnp.float32),
        jax.ShapeDtypeStruct((M, N, ny, nx), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, M, N, ny, nx), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, M, N, ny, nx), jnp.float32),
    )
    out_specs = (w0_spec, w0_spec, inter_spec, inter_spec)
    mat_specs = [m_spec(ny), m_spec(ny), m_spec(nx), m_spec(nx)] * 2
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n_blocks, n_steps),
        in_specs=[t_spec, t_spec, w0_spec, w0_spec, h_spec, h_spec]
                 + mat_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((M, NB, ny, nx), jnp.float32)] * 2,
        interpret=interpret,
    )(t_r, t_i, w_r, w_i, h_r, h_i, *mats)


def _call_bwd(t_r, t_i, inter_r, inter_i, g_r, g_i, h_r, h_i,
              interpret=False, bf16=False):
    with _dot_precision(bf16):
        return _call_bwd_inner(t_r, t_i, inter_r, inter_i, g_r, g_i,
                               h_r, h_i, interpret)


def _call_bwd_inner(t_r, t_i, inter_r, inter_i, g_r, g_i, h_r, h_i,
                    interpret=False):
    n_steps, N0, ny, nx = t_r.shape
    M = g_r.shape[0]
    NB = _pick_nb(M, N0, ny, nx)
    (t_r, t_i, g_r, g_i), N = _pad_batch((t_r, t_i, g_r, g_i), N0, NB,
                                         (1.0, 0.0, 0.0, 0.0))
    # inter comes back from the forward already padded when N0 % NB != 0.
    if inter_r.shape[-3] != N:
        (inter_r, inter_i), _ = _pad_batch((inter_r, inter_i),
                                           inter_r.shape[-3], NB, (0.0, 0.0))
    n_blocks = N // NB
    mats = _dft_mats(ny, nx)
    vmem = pltpu.VMEM
    # Reverse z order: grid step s maps to z-step n_steps-1-s.
    t_rev = pl.BlockSpec((1, NB, ny, nx),
                         lambda b, s: (n_steps - 1 - s, b, 0, 0),
                         memory_space=vmem)
    inter_rev = pl.BlockSpec((1, M, NB, ny, nx),
                             lambda b, s: (n_steps - 1 - s, 0, b, 0, 0),
                             memory_space=vmem)
    g_spec = pl.BlockSpec((M, NB, ny, nx), lambda b, s: (0, b, 0, 0),
                          memory_space=vmem)
    h_spec = pl.BlockSpec((ny, nx), lambda b, s: (0, 0), memory_space=vmem)

    def m_spec(n):
        return pl.BlockSpec((n, n), lambda b, s: (0, 0), memory_space=vmem)

    out_shapes = (
        jax.ShapeDtypeStruct((n_steps, N, ny, nx), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, N, ny, nx), jnp.float32),
        jax.ShapeDtypeStruct((M, N, ny, nx), jnp.float32),
        jax.ShapeDtypeStruct((M, N, ny, nx), jnp.float32),
    )
    out_specs = (t_rev, t_rev, g_spec, g_spec)
    # Plain transpose: H itself, not conj(H).
    hc_r, hc_i = h_r, h_i
    mat_specs = [m_spec(ny), m_spec(ny), m_spec(nx), m_spec(nx)] * 2
    return pl.pallas_call(
        _bwd_kernel,
        grid=(n_blocks, n_steps),
        in_specs=[t_rev, t_rev, inter_rev, inter_rev, g_spec, g_spec,
                  h_spec, h_spec] + mat_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((M, NB, ny, nx), jnp.float32)] * 2,
        interpret=interpret,
    )(t_r, t_i, inter_r, inter_i, g_r, g_i, hc_r, hc_i, *mats)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def multislice_fused(t, wave, kernel, interpret=False, bf16=False):
    """Fused multislice scan: ``w <- IFFT(FFT(w * t_s) H)`` for all but the
    last step, then the final modulation.

    Args:
      t: complex ``[n_steps, N, ny, nx]`` per-step slice transmissions
        (pre-binned).
      wave: complex ``[M, N, ny, nx]`` incident wave stack (M probe modes;
        t broadcasts over M).
      kernel: complex ``[ny, nx]`` per-step transfer function.
      bf16: run the DFT matmuls as single bf16 MXU passes (~1.3x faster,
        ~1% relative error per transform; the ``run_bfloat16`` mode)
        instead of multi-pass f32 (4.5e-7 mean error).

    Differentiable in ``t`` and ``wave`` (NOT in ``kernel`` — it is
    geometry).  Returns the exit wave ``[M, N, ny, nx]``.
    """
    out, _ = _multislice_fused_fwd(t, wave, kernel, interpret, bf16)
    return out


def _multislice_fused_fwd(t, wave, kernel, interpret, bf16=False):
    N = t.shape[1]
    o_r, o_i, inter_r, inter_i = _call_fwd(
        jnp.real(t), jnp.imag(t), jnp.real(wave), jnp.imag(wave),
        jnp.real(kernel), jnp.imag(kernel), interpret=interpret, bf16=bf16)
    out = (o_r[..., :N, :, :] + 1j * o_i[..., :N, :, :]).astype(jnp.complex64)
    return out, (t, inter_r, inter_i, kernel)


def _multislice_fused_bwd(interpret, bf16, res, g):
    t, inter_r, inter_i, kernel = res
    N = t.shape[1]
    gt_r, gt_i, gw_r, gw_i = _call_bwd(
        jnp.real(t), jnp.imag(t), inter_r, inter_i,
        jnp.real(g), jnp.imag(g), jnp.real(kernel), jnp.imag(kernel),
        interpret=interpret, bf16=bf16)
    gt = (gt_r[:, :N] + 1j * gt_i[:, :N]).astype(jnp.complex64)
    gw = (gw_r[:, :N] + 1j * gw_i[:, :N]).astype(jnp.complex64)
    return gt, gw, None


multislice_fused.defvjp(_multislice_fused_fwd, _multislice_fused_bwd)


def _final_ri(ay, ax):
    """Complex per-axis final-prop mats -> 4 f32 operand planes."""
    return [jnp.real(ay).astype(jnp.float32),
            jnp.imag(ay).astype(jnp.float32),
            jnp.real(ax).astype(jnp.float32),
            jnp.imag(ax).astype(jnp.float32)]


def _call_fwd_db(db, w_r, w_i, h_r, h_i, k1, s, interpret=False,
                 bf16=False, fay=None, fax=None):
    with _dot_precision(bf16):
        n_steps, _, N0, ny, nx = db.shape
        M = w_r.shape[0]
        NB = _pick_nb(M, N0, ny, nx)
        # db pads with 0 = identity modulation for delta_beta.
        (db, w_r, w_i), N = _pad_batch((db, w_r, w_i), N0, NB,
                                       (0.0, 0.0, 0.0))
        n_blocks = N // NB
        U = _pick_unroll(n_steps, M, NB, ny, nx, db.dtype.itemsize)
        py, px = _fold_prop_mats(h_r, h_i, ny, nx)
        fwd_mats = _split_prop_variants(py, px)
        final = fay is not None
        vmem = pltpu.VMEM
        db_spec = pl.BlockSpec((U, 2, NB, ny, nx),
                               lambda bk, st: (st, 0, bk, 0, 0),
                               memory_space=vmem)
        w0_spec = pl.BlockSpec((M, NB, ny, nx), lambda bk, st: (0, bk, 0, 0),
                               memory_space=vmem)

        def m_spec(n):
            return pl.BlockSpec((n, n), lambda bk, st: (0, 0),
                                memory_space=vmem)

        out_shapes = (
            jax.ShapeDtypeStruct((M, N, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((M, N, ny, nx), jnp.float32),
        )
        mat_specs = [m_spec(ny), m_spec(ny), m_spec(nx), m_spec(nx)]
        f_specs = mat_specs if final else []
        f_ops = _final_ri(fay, fax) if final else []
        out = pl.pallas_call(
            functools.partial(_fwd_db_kernel, k1=k1, s=s, final=final,
                              unroll=U),
            grid=(n_blocks, n_steps // U),
            in_specs=[db_spec, w0_spec, w0_spec] + mat_specs
                     + f_specs,
            out_specs=(w0_spec, w0_spec),
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((M, NB, ny, nx), jnp.float32)] * 2,
            compiler_params=_cparams(U),
            interpret=interpret,
        )(db, w_r, w_i, *fwd_mats, *f_ops)
        return out


def _call_bwd_db(db, out_r, out_i, g_r, g_i, h_r, h_i, k1, s,
                 interpret=False, bf16=False, fay=None, fax=None,
                 fayi=None, faxi=None):
    with _dot_precision(bf16):
        n_steps, _, N0, ny, nx = db.shape
        M = g_r.shape[0]
        NB = _pick_nb(M, N0, ny, nx)
        (db, out_r, out_i, g_r, g_i), N = _pad_batch(
            (db, out_r, out_i, g_r, g_i), N0, NB,
            (0.0, 0.0, 0.0, 0.0, 0.0))
        n_blocks = N // NB
        U = _pick_unroll(n_steps, M, NB, ny, nx, db.dtype.itemsize)
        n_cells = n_steps // U
        py, px = _fold_prop_mats(h_r, h_i, ny, nx)
        t_mats = _split_prop_variants(py, px, transpose=True)
        i_mats = _split_prop_variants(py, px, inverse=True)
        vmem = pltpu.VMEM
        db_rev = pl.BlockSpec((U, 2, NB, ny, nx),
                              lambda bk, st: (n_cells - 1 - st, 0, bk, 0, 0),
                              memory_space=vmem)
        w_spec = pl.BlockSpec((M, NB, ny, nx), lambda bk, st: (0, bk, 0, 0),
                              memory_space=vmem)

        def m_spec(n):
            return pl.BlockSpec((n, n), lambda bk, st: (0, 0),
                                memory_space=vmem)

        out_shapes = (
            jax.ShapeDtypeStruct((n_steps, 2, N, ny, nx), db.dtype),
            jax.ShapeDtypeStruct((M, N, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((M, N, ny, nx), jnp.float32),
        )
        final = fay is not None
        mat_specs = [m_spec(ny), m_spec(ny), m_spec(nx), m_spec(nx)] * 2
        f_specs = ([m_spec(ny), m_spec(ny), m_spec(nx), m_spec(nx)] * 2
                   if final else [])
        # Transpose for the incoming cotangent, exact inverse for the wave
        # reconstruction (the unnormalized Fraunhofer DFT is not unitary).
        f_ops = (_final_ri(fay.T, fax.T) + _final_ri(fayi, faxi)
                 if final else [])
        return pl.pallas_call(
            functools.partial(_bwd_db_kernel, k1=k1, s=s, final=final,
                              unroll=U),
            grid=(n_blocks, n_cells),
            in_specs=[db_rev, w_spec, w_spec, w_spec, w_spec]
                     + mat_specs + f_specs,
            out_specs=(db_rev, w_spec, w_spec),
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((M, NB, ny, nx), jnp.float32)] * 4,
            compiler_params=_cparams(U),
            interpret=interpret,
        )(db, out_r, out_i, g_r, g_i, *t_mats, *i_mats, *f_ops)


def multislice_db(delta, beta, wave, kernel, k1, s, interpret=False,
                  bf16=False, fay=None, fax=None, fayi=None, faxi=None):
    """Split-channel convenience wrapper over :func:`multislice_db_packed`
    (the production entry — callers that hold the ``[..., z, 2]`` patch
    stack should transpose it ONCE into the packed layout instead of
    paying two strided transposes; this wrapper stacks, so AD unstacks the
    packed cotangent back to (gd, gb) automatically)."""
    db = jnp.stack([delta, beta], 1)
    return multislice_db_packed(db, wave, kernel, k1, s, interpret,
                                bf16, fay, fax, fayi, faxi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def multislice_db_packed(db, wave, kernel, k1, s, interpret=False,
                         bf16=False, fay=None, fax=None, fayi=None,
                         faxi=None):
    """Modulator-fused multislice: per step ``t = exp(-k1*b - i*s*k1*d)``
    computed in-kernel, then ``w <- IFFT(FFT(w*t) H)``; the backward pass
    RECONSTRUCTS the forward wavefields by inverting the (unit-modulus)
    propagation instead of storing them — object channels stream as two
    f32 planes and nothing step-sized is ever written in the forward.

    Requires the delta_beta modulator and a pure-phase (paraxial Fresnel)
    transfer kernel; callers fall back to :func:`multislice_fused`
    otherwise.

    Args:
      db: f32/bf16 ``[n_steps, 2, N, ny, nx]`` packed object channels
        (slot 0 = delta, slot 1 = beta; pre-binned sums) — ONE fused
        transpose away from the ``[..., z, 2]`` patch-stack layout.
      wave: complex ``[M, N, ny, nx]``; kernel: complex ``[ny, nx]``.
      k1, s: modulation scale ``2*pi*dz_nm/lambda_nm`` and sign.

    Differentiable in db, wave (kernel is geometry).

    Accuracy bound: the wave reconstruction divides by the modulator,
    ``1/t = exp(+k1*beta)``, so f32 roundoff in the reconstructed fields
    amplifies by ``exp(max k1*beta_binned)`` per step relative to the
    stored-intermediates backward.  Validated to grad-rtol ~1e-4 up to
    ``k1*beta ~ 3`` per binned step (95% absorption/step — far beyond
    physical multislice regimes, where per-step absorption is <<1%); for
    pathological absorption keep :data:`..propagate.DB_STORED_MAX_BYTES`
    high enough that :func:`multislice_db_stored` is selected.

    ``fay``/``fax`` (with exact inverses ``fayi``/``faxi``): optional
    per-axis detector-propagation matrices folded into the LAST step —
    the kernel then returns the DETECTOR wave (see
    ``propagate.final_prop_mats``).  Geometry, not differentiated.
    """
    out, _ = _multislice_db_fwd(db, wave, kernel, k1, s, interpret,
                                bf16, fay, fax, fayi, faxi)
    return out


def _multislice_db_fwd(db, wave, kernel, k1, s, interpret,
                       bf16=False, fay=None, fax=None, fayi=None, faxi=None):
    N = db.shape[2]
    o_r, o_i = _call_fwd_db(db, jnp.real(wave), jnp.imag(wave),
                            jnp.real(kernel), jnp.imag(kernel), k1, s,
                            interpret=interpret, bf16=bf16, fay=fay, fax=fax)
    out = (o_r[:, :N] + 1j * o_i[:, :N]).astype(jnp.complex64)
    return out, (db, o_r, o_i, kernel, fay, fax, fayi, faxi)


def _multislice_db_bwd(k1, s, interpret, bf16, res, g):
    db, o_r, o_i, kernel, fay, fax, fayi, faxi = res
    N = db.shape[2]
    # o_r/o_i come back batch-padded when N % NB != 0 — the bwd re-pads its
    # own inputs identically, so slice to N first for a consistent shape.
    gdb, gw_r, gw_i = _call_bwd_db(
        db, o_r[:, :N], o_i[:, :N],
        jnp.real(g), jnp.imag(g), jnp.real(kernel), jnp.imag(kernel),
        k1, s, interpret=interpret, bf16=bf16, fay=fay, fax=fax,
        fayi=fayi, faxi=faxi)
    gw = (gw_r[:, :N] + 1j * gw_i[:, :N]).astype(jnp.complex64)
    return (gdb[:, :, :N], gw, None, None, None, None, None)


multislice_db_packed.defvjp(_multislice_db_fwd, _multislice_db_bwd)


def _call_fwd_db_st(db, w_r, w_i, h_r, h_i, k1, s, interpret=False,
                    bf16=False, fay=None, fax=None):
    with _dot_precision(bf16):
        n_steps, _, N0, ny, nx = db.shape
        M = w_r.shape[0]
        NB = _pick_nb(M, N0, ny, nx)
        (db, w_r, w_i), N = _pad_batch((db, w_r, w_i), N0, NB,
                                       (0.0, 0.0, 0.0))
        n_blocks = N // NB
        U = _pick_unroll(n_steps, M, NB, ny, nx, db.dtype.itemsize)
        py, px = _fold_prop_mats(h_r, h_i, ny, nx)
        fwd_mats = _split_prop_variants(py, px)
        vmem = pltpu.VMEM
        db_spec = pl.BlockSpec((U, 2, NB, ny, nx),
                               lambda bk, st: (st, 0, bk, 0, 0),
                               memory_space=vmem)
        w0_spec = pl.BlockSpec((M, NB, ny, nx), lambda bk, st: (0, bk, 0, 0),
                               memory_space=vmem)

        def m_spec(n):
            return pl.BlockSpec((n, n), lambda bk, st: (0, 0),
                                memory_space=vmem)

        inter_spec = pl.BlockSpec((U, M, NB, ny, nx),
                                  lambda bk, st: (st, 0, bk, 0, 0),
                                  memory_space=vmem)
        out_shapes = (
            jax.ShapeDtypeStruct((M, N, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((M, N, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, M, N, ny, nx), db.dtype),
            jax.ShapeDtypeStruct((n_steps, M, N, ny, nx), db.dtype),
        )
        final = fay is not None
        mat_specs = [m_spec(ny), m_spec(ny), m_spec(nx), m_spec(nx)]
        f_specs = mat_specs if final else []
        f_ops = _final_ri(fay, fax) if final else []
        return pl.pallas_call(
            functools.partial(_fwd_db_st_kernel, k1=k1, s=s, final=final,
                              unroll=U),
            grid=(n_blocks, n_steps // U),
            in_specs=[db_spec, w0_spec, w0_spec] + mat_specs
                     + f_specs,
            out_specs=(w0_spec, w0_spec, inter_spec, inter_spec),
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((M, NB, ny, nx), jnp.float32)] * 2,
            compiler_params=_cparams(U),
            interpret=interpret,
        )(db, w_r, w_i, *fwd_mats, *f_ops)


def _call_bwd_db_st(db, inter_r, inter_i, g_r, g_i, h_r, h_i, k1, s,
                    interpret=False, bf16=False, fay=None, fax=None):
    with _dot_precision(bf16):
        n_steps, _, N0, ny, nx = db.shape
        M = g_r.shape[0]
        NB = _pick_nb(M, N0, ny, nx)
        (db, g_r, g_i), N = _pad_batch((db, g_r, g_i), N0, NB,
                                       (0.0, 0.0, 0.0))
        if inter_r.shape[-3] != N:
            (inter_r, inter_i), _ = _pad_batch(
                (inter_r, inter_i), inter_r.shape[-3], NB, (0.0, 0.0))
        n_blocks = N // NB
        U = _pick_unroll(n_steps, M, NB, ny, nx, db.dtype.itemsize)
        n_cells = n_steps // U
        py, px = _fold_prop_mats(h_r, h_i, ny, nx)
        t_mats = _split_prop_variants(py, px, transpose=True)
        vmem = pltpu.VMEM
        db_rev = pl.BlockSpec((U, 2, NB, ny, nx),
                              lambda bk, st: (n_cells - 1 - st, 0, bk, 0, 0),
                              memory_space=vmem)
        inter_rev = pl.BlockSpec((U, M, NB, ny, nx),
                                 lambda bk, st: (n_cells - 1 - st, 0, bk,
                                                 0, 0),
                                 memory_space=vmem)
        w_spec = pl.BlockSpec((M, NB, ny, nx), lambda bk, st: (0, bk, 0, 0),
                              memory_space=vmem)

        def m_spec(n):
            return pl.BlockSpec((n, n), lambda bk, st: (0, 0),
                                memory_space=vmem)

        out_shapes = (
            jax.ShapeDtypeStruct((n_steps, 2, N, ny, nx), db.dtype),
            jax.ShapeDtypeStruct((M, N, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((M, N, ny, nx), jnp.float32),
        )
        final = fay is not None
        mat_specs = [m_spec(ny), m_spec(ny), m_spec(nx), m_spec(nx)]
        f_specs = mat_specs if final else []
        # Cotangent enters in detector space: transpose of the final prop.
        f_ops = _final_ri(fay.T, fax.T) if final else []
        return pl.pallas_call(
            functools.partial(_bwd_db_st_kernel, k1=k1, s=s, final=final,
                              unroll=U),
            grid=(n_blocks, n_cells),
            in_specs=[db_rev, inter_rev, inter_rev, w_spec, w_spec]
                     + mat_specs + f_specs,
            out_specs=(db_rev, w_spec, w_spec),
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((M, NB, ny, nx), jnp.float32)] * 2,
            compiler_params=_cparams(U),
            interpret=interpret,
        )(db, inter_r, inter_i, g_r, g_i, *t_mats, *f_ops)


def multislice_db_stored(delta, beta, wave, kernel, k1, s, interpret=False,
                         bf16=False, fay=None, fax=None, fayi=None,
                         faxi=None):
    """Split-channel convenience wrapper over
    :func:`multislice_db_stored_packed` (see :func:`multislice_db`)."""
    db = jnp.stack([delta, beta], 1)
    return multislice_db_stored_packed(db, wave, kernel, k1, s, interpret,
                                       bf16, fay, fax, fayi, faxi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def multislice_db_stored_packed(db, wave, kernel, k1, s, interpret=False,
                                bf16=False, fay=None, fax=None, fayi=None,
                                faxi=None):
    """Modulator-fused multislice with STORED intermediates: the object
    channels stream as one packed ``[n_steps, 2, N, ny, nx]`` plane pair
    (slot 0 = delta, slot 1 = beta) and the modulator (and its VJP)
    compute in-kernel, while the backward replays recorded wavefields with
    ONE propagation per step (the invertible variant pays two).  Fastest
    f32 kernel at flagship shapes; same interface as multislice_db_packed
    (``fayi``/``faxi`` are accepted for that symmetry but unused — the
    stored backward never reconstructs waves)."""
    out, _ = _multislice_db_st_fwd(db, wave, kernel, k1, s,
                                   interpret, bf16, fay, fax, fayi, faxi)
    return out


def _multislice_db_st_fwd(db, wave, kernel, k1, s, interpret,
                          bf16=False, fay=None, fax=None, fayi=None,
                          faxi=None):
    N = db.shape[2]
    o_r, o_i, inter_r, inter_i = _call_fwd_db_st(
        db, jnp.real(wave), jnp.imag(wave),
        jnp.real(kernel), jnp.imag(kernel), k1, s,
        interpret=interpret, bf16=bf16, fay=fay, fax=fax)
    out = (o_r[:, :N] + 1j * o_i[:, :N]).astype(jnp.complex64)
    return out, (db, inter_r, inter_i, kernel, fay, fax)


def _multislice_db_st_bwd(k1, s, interpret, bf16, res, g):
    db, inter_r, inter_i, kernel, fay, fax = res
    N = db.shape[2]
    gdb, gw_r, gw_i = _call_bwd_db_st(
        db, inter_r, inter_i,
        jnp.real(g), jnp.imag(g), jnp.real(kernel), jnp.imag(kernel),
        k1, s, interpret=interpret, bf16=bf16, fay=fay, fax=fax)
    gw = (gw_r[:, :N] + 1j * gw_i[:, :N]).astype(jnp.complex64)
    return (gdb[:, :, :N], gw, None, None, None, None, None)


multislice_db_stored_packed.defvjp(_multislice_db_st_fwd,
                                   _multislice_db_st_bwd)
