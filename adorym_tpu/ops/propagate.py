"""Wave-optics propagation: Fresnel kernels, multislice, Fraunhofer, CTF.

TPU-native redesign of the reference's hot compute loop
(``adorym/propagate.py``).  Key deltas from the reference:

  * native ``complex64`` waves instead of (real, imag) float pairs;
  * the z-slice loop is a ``jax.lax.scan`` — one traced step, compiled once,
    with the wave resident on-device (reference: a Python loop re-uploading
    the kernel every call, ``adorym/propagate.py:196-258``);
  * binning is a static reshape+reduce over the z axis instead of per-bin
    slicing (``adorym/propagate.py:207-249``);
  * kernels are computed inside the jitted function from static geometry —
    no host->device transfer per call.

Sign conventions follow the reference exactly
(``adorym/propagate.py:62-81``): ``sign_convention=1`` is the Goodman
``exp(ikz)`` convention with ``n = 1 - delta + i*beta``.

Units follow the reference: energies in eV, wavelengths/voxels in nm,
distances in nm unless the name says ``_cm``.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import PI, wavelength_nm
from .fourier import fft2, ifft2, fft2_and_shift, ifft2_and_shift

#: Fused delta_beta multislice variant switch: below this many bytes of
#: per-chunk forward intermediates, the STORED-intermediates backward
#: (1 propagation per step) is used; above it, the invertible backward
#: (reconstructs wavefields, zero step-sized storage).  ~2 GB measured as
#: the crossover on a 16 GB v5e — the point where the stored stack claims
#: ~1/8 of HBM and its pressure outweighs the invertible variant's extra
#: propagation — so the default (None) derives hbm/8 per device (a 95 GB
#: v5p keeps the faster stored variant up to ~12 GB of intermediates).
#: Set a number (tests do) to pin the crossover explicitly.
DB_STORED_MAX_BYTES = None


def _db_stored_max_bytes() -> float:
    if DB_STORED_MAX_BYTES is not None:
        return DB_STORED_MAX_BYTES
    from ..utils.profiling import hbm_limit_bytes
    return hbm_limit_bytes() / 8

#: Sparse multislice unrolls its per-slice loop up to this many slices
#: (the intended few-slice regime, where unrolling lets XLA fuse the
#: modulate into neighboring transforms); above it a lax.scan bounds the
#: compile time.
SPARSE_UNROLL_MAX = 16


# ---------------------------------------------------------------------------
# Frequency meshes and kernels
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _freq_mesh_np(voxel_nm: tuple, shape: tuple):
    """(u, v) spatial-frequency grids in cycles/nm, fftfreq-ordered.

    Matches ``gen_freq_mesh`` (``adorym/propagate.py:54-60``): ``u`` varies
    along axis 0 (y) scaled by 1/voxel_y, ``v`` along axis 1 (x).
    """
    u = (np.fft.fftfreq(shape[0]) / voxel_nm[0]).astype(np.float32)
    v = (np.fft.fftfreq(shape[1]) / voxel_nm[1]).astype(np.float32)
    uu = np.broadcast_to(u[:, None], (shape[0], shape[1]))
    vv = np.broadcast_to(v[None, :], (shape[0], shape[1]))
    return uu, vv


def gen_freq_mesh(voxel_nm, shape):
    """Device copies of the (u, v) frequency mesh."""
    uu, vv = _freq_mesh_np(tuple(float(v) for v in voxel_nm[:2]), tuple(shape[:2]))
    return jnp.asarray(uu), jnp.asarray(vv)


def fresnel_kernel(shape, voxel_nm, lmbda_nm, dist_nm, fresnel_approx=True,
                   sign_convention=1, dtype=jnp.complex64):
    """Unshifted Fresnel transfer-function kernel H(u, v).

    Matches ``get_kernel`` / ``get_kernel_wrapped``
    (``adorym/propagate.py:62-103``).  ``dist_nm`` may be a traced scalar
    (e.g. a refined free-space distance) — the kernel stays differentiable
    with respect to it, covering the reference's ``optimize_free_prop`` path.
    """
    u, v = gen_freq_mesh(voxel_nm, shape)
    quad = u * u + v * v
    if fresnel_approx:
        phase = -sign_convention * PI * lmbda_nm * dist_nm * quad
        return jnp.exp(1j * phase.astype(jnp.float32)).astype(dtype)
    # Full (non-paraxial) transfer function, evanescent modes masked out
    # (``adorym/propagate.py:76-80``).
    q = 1.0 - lmbda_nm ** 2 * quad
    mask = (q > 0).astype(jnp.float32)
    phase = sign_convention * 2.0 * PI * dist_nm / lmbda_nm * jnp.sqrt(jnp.clip(q, 0.0, None))
    return (jnp.exp(1j * phase.astype(jnp.float32)) * mask).astype(dtype)


def fresnel_kernel_ir(shape, voxel_nm, lmbda_nm, dist_nm, sign_convention=1,
                      dtype=jnp.complex64):
    """Impulse-response-method Fresnel kernel (``adorym/propagate.py:106-128``)."""
    size_nm = np.asarray(voxel_nm[:2]) * np.asarray(shape[:2])
    k = 2.0 * PI / lmbda_nm
    y = np.arange(shape[0], dtype=np.float64) * voxel_nm[0] - size_nm[0] / 2.0
    x = np.arange(shape[1], dtype=np.float64) * voxel_nm[1] - size_nm[1] / 2.0
    yy = y[:, None]
    xx = x[None, :]
    h = (np.exp(sign_convention * 1j * k * dist_nm) / (1j * lmbda_nm * dist_nm)
         * np.exp(sign_convention * 1j * k / (2.0 * dist_nm) * (xx ** 2 + yy ** 2)))
    return jnp.asarray(np.fft.fft2(h).astype(np.complex64)).astype(dtype)


def fresnel_propagate(wave, dist_nm, lmbda_nm, voxel_nm, kernel=None,
                      fresnel_approx=True, sign_convention=1):
    """Propagate a (batched) wave by ``dist_nm`` via the TF method
    (``adorym/propagate.py:537-553``)."""
    if kernel is None:
        kernel = fresnel_kernel(wave.shape[-2:], voxel_nm, lmbda_nm, dist_nm,
                                fresnel_approx=fresnel_approx,
                                sign_convention=sign_convention)
    return ifft2(fft2(wave) * kernel)


def final_prop_mats(shape, voxel_nm, lmbda_nm, free_prop_cm,
                    sign_convention=1, normalize_fft=False,
                    fresnel_approx=True):
    """Object-to-detector propagation as per-axis dense matrices.

    Returns ``(ay, ax, ay_inv, ax_inv)`` complex such that
    ``free_space_propagate(w) == ay @ w @ ax.T`` (with exact inverses for
    wave reconstruction), for folding into the fused Pallas multislice
    kernel's LAST step — the exit wave then never round-trips HBM and the
    separate XLA FFT dispatch disappears.  Returns ``None`` when the
    propagation is not expressible as a separable matrix pair (non-paraxial
    finite-distance kernels).

    * ``free_prop_cm='inf'``: Fraunhofer — fftshifted (I)FFT2
      (``free_space_propagate``); both axes are ``S @ F`` with ``S`` the
      fftshift permutation.  NOT unitary when unnormalized, so the exact
      inverse ``G @ S^T`` is returned rather than derived by conjugation.
    * finite distance + ``fresnel_approx``: the folded unitary TF pair
      (:func:`.pallas_multislice._fold_prop_mats`); inverse by conjugation.
    """
    import jax.numpy as _jnp
    ny, nx = int(shape[0]), int(shape[1])
    if isinstance(free_prop_cm, str) and free_prop_cm == 'inf':
        from .fourier import dft_matrix

        def _axis(n):
            shift_perm = np.fft.fftshift(np.eye(n, dtype=np.complex64),
                                         axes=0)
            f = dft_matrix(n)
            g = dft_matrix(n, inverse=True)
            if sign_convention == 1:
                a, ai = shift_perm @ f, g @ shift_perm.T
            else:
                a, ai = shift_perm @ g, f @ shift_perm.T
            if normalize_fft:          # 'ortho'
                r = np.sqrt(np.float32(n))
                if sign_convention == 1:
                    a, ai = a / r, ai * r
                else:
                    a, ai = a * r, ai / r
            return _jnp.asarray(a), _jnp.asarray(ai)

        ay, ayi = _axis(ny)
        ax, axi = _axis(nx)
        return ay, ax, ayi, axi
    if not fresnel_approx:
        return None
    # Per-axis folded TF pair ``P_ax = G diag(h_ax) F`` built in FLOAT64:
    # the Fresnel phase ``pi*lmbda*z*u^2`` reaches 1e3..1e6 rad at
    # detector distances, where f32 phase rounding is visible (3e-5..6e-2
    # rad) — f64 keeps the folded matrix exact to c64 storage.
    dist_nm = float(free_prop_cm) * 1e7

    def _axis_tf(n, voxel):
        u = np.fft.fftfreq(n) / voxel                       # f64
        h = np.exp(-1j * sign_convention * np.pi * lmbda_nm * dist_nm
                   * u * u)
        k = np.arange(n)
        f = np.exp(-2j * np.pi * np.outer(k, k) / n)        # complex128
        g = np.conj(f) / n
        a = (g * h[None, :]) @ f
        ai = (g * np.conj(h)[None, :]) @ f                  # |h| = 1
        return (_jnp.asarray(a.astype(np.complex64)),
                _jnp.asarray(ai.astype(np.complex64)))

    ay, ayi = _axis_tf(ny, float(voxel_nm[0]))
    ax, axi = _axis_tf(nx, float(voxel_nm[1]))
    return ay, ax, ayi, axi


def free_space_propagate(wave, free_prop_cm, lmbda_nm, voxel_nm,
                         sign_convention=1, normalize_fft=False,
                         fresnel_approx=True):
    """Object-to-detector propagation.

    ``free_prop_cm='inf'`` is the Fraunhofer far field: fftshifted FFT2
    (IFFT2 for the opposite sign convention), unnormalized unless
    ``normalize_fft`` (``adorym/propagate.py:263-280``).  A finite distance
    (possibly a traced, refinable scalar) uses the Fresnel TF method.
    """
    if free_prop_cm is None or (isinstance(free_prop_cm, (int, float)) and free_prop_cm == 0):
        return wave
    if isinstance(free_prop_cm, str) and free_prop_cm == 'inf':
        norm = 'ortho' if normalize_fft else None
        if sign_convention == 1:
            return fft2_and_shift(wave, norm=norm)
        return ifft2_and_shift(wave, norm=norm)
    dist_nm = jnp.asarray(free_prop_cm) * 1e7
    return fresnel_propagate(wave, dist_nm, lmbda_nm, voxel_nm,
                             fresnel_approx=fresnel_approx,
                             sign_convention=sign_convention)


# ---------------------------------------------------------------------------
# Slice modulation
# ---------------------------------------------------------------------------

def slice_modulator(delta, beta, k1, unknown_type='delta_beta',
                    sign_convention=1):
    """Complex transmission of one (possibly binned) slice.

    ``delta_beta``: ``t = exp(-k1*beta) * exp(-i*sign*k1*delta)``
    (``adorym/propagate.py:241``).  ``real_imag``: the two channels already
    are the real/imag parts of the transmission (``adorym/propagate.py:246``).
    """
    if unknown_type == 'delta_beta':
        mag = jnp.exp(-k1 * beta)
        phase = -sign_convention * k1 * delta
        return (mag * jnp.cos(phase) + 1j * (mag * jnp.sin(phase))).astype(jnp.complex64)
    elif unknown_type == 'real_imag':
        return (delta + 1j * beta).astype(jnp.complex64)
    raise ValueError("unknown_type must be 'delta_beta' or 'real_imag'")


def _pad_z_to_multiple(arr, binning, unknown_type):
    """Pad the leading z axis (at the far end) up to a multiple of
    ``binning`` with the reduction identity (0 for sums, 1 for products)."""
    nz = arr.shape[0]
    pad = -nz % binning
    if pad:
        pad_width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        cval = 0.0 if unknown_type == 'delta_beta' else 1.0
        arr = jnp.pad(arr, pad_width, constant_values=cval)
    return arr


def bin_z_sum(arr, binning, axis):
    """Zero-padded bin-sum along ``axis`` — the delta_beta binning
    semantics (far-end identity pad joins the short tail bin) for callers
    that hoist the reduction out of the propagator (the prebin path in
    ``recon.angle_step`` and ``ops/rotate.rotate_and_bin_z``)."""
    if binning == 1:
        return arr
    axis = axis % arr.ndim
    nz = arr.shape[axis]
    pad = -nz % binning
    if pad:
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, pad)
        arr = jnp.pad(arr, widths)
    shape = (arr.shape[:axis] + ((nz + pad) // binning, binning)
             + arr.shape[axis + 1:])
    return arr.reshape(shape).sum(axis=axis + 1)


def _bin_slices(arr, binning, unknown_type):
    """Reduce the leading z axis in bins of ``binning``.

    ``arr``: [nz, ...], pre-padded to a multiple of ``binning`` (the padded
    identities join the short tail bin, which in both propagation
    directions is the FAR-side bin and is never followed by an extra
    in-object propagation — reproducing the reference's short-bin
    semantics, ``adorym/propagate.py:207-257`` fwd / ``:381-383`` bwd).
    """
    if binning == 1:
        return arr
    n_steps = arr.shape[0] // binning
    arr = arr.reshape(n_steps, binning, *arr.shape[1:])
    if unknown_type == 'delta_beta':
        return jnp.sum(arr, axis=1)
    return jnp.prod(arr, axis=1)


# ---------------------------------------------------------------------------
# Multislice
# ---------------------------------------------------------------------------

def multislice_propagate(delta, beta, wave, energy_ev, psize_cm,
                         slice_spacing_cm=None, binning=1,
                         unknown_type='delta_beta', kernel=None,
                         fresnel_approx=True, sign_convention=1,
                         scale_ri_by_k=True, kappa=None, repeats=None,
                         backprop=False, return_intermediate=False,
                         fused='auto', prebinned=False, mxu_bf16=False,
                         final_prop=None, db_stack=None, db_zmajor=None):
    """Multislice (Fresnel beam) propagation through an object batch.

    TPU-native equivalent of ``multislice_propagate_batch``
    (``adorym/propagate.py:131-288``) and its mirror
    ``multislice_backpropagate_batch`` (:291, via ``backprop=True``).

    Args:
      delta, beta: float arrays ``[..., y, x, nz]`` — the two object
        channels (delta/beta of the refractive index, or real/imag of the
        transmission for ``unknown_type='real_imag'``).  Leading batch dims
        are shared with ``wave``.
      wave: complex array ``[..., y, x]`` — incident wave(s).
      energy_ev, psize_cm: beam energy and lateral voxel size.
      slice_spacing_cm: z slice spacing; defaults to ``psize_cm``
        (reference ``delta_cm`` kwarg, ``adorym/propagate.py:143-146``).
      binning: treat this many consecutive slices as one projected slice
        (sum of deltas/betas, product for real_imag).
      kernel: optional precomputed per-step transfer kernel.
      kappa: if given, ``beta = kappa * delta`` (single-material constraint,
        possibly a traced refinable scalar; ``adorym/propagate.py:223-225``).
      repeats: if given, ignore nz and apply slice 0 this many times
        (reference ``repeating_slice``).
      backprop: propagate in -z, consuming slices last-to-first with
        conjugate-phase modulation (``adorym/propagate.py:364,414``).
      return_intermediate: also return the wavefield entering every step,
        ``[n_steps, ..., y, x]`` (``adorym/propagate.py:209-211``).
      fused: 'auto' | True | False — use the fused Pallas MXU kernel
        (DFT-by-matmul, wave resident in VMEM) for the z scan.  'auto'
        enables it on TPU for 4D ``[modes, N, y, x]`` waves.
      final_prop: optional ``{'free_prop_cm': 'inf'|float|None,
        'normalize_fft': bool}`` — when given, the RETURNED wave includes
        the object-to-detector propagation (``free_space_propagate``
        semantics).  On the fused delta_beta Pallas path the propagation
        folds into the kernel's final step (:func:`final_prop_mats`) so the
        exit wave never visits HBM; every other path applies it via XLA
        here, keeping one call-site semantic.  Not compatible with
        ``backprop``.  Gradients do NOT flow into a traced finite distance
        through the folded path — callers refining ``free_prop_cm`` must
        not pass ``final_prop``.
      db_stack: optional ``[..., y, x, nz, 2]`` PACKED object channels
        (``delta = db_stack[..., 0]``, ``beta = db_stack[..., 1]`` — the
        patch-stack layout the driver extracts).  When the fused
        delta_beta Pallas path engages, the z-major re-layout then costs
        ONE fused transpose instead of two strided ones (and the gradient
        comes back through one packed transpose) — measured 2.4 ms fwd +
        2.7 ms bwd cheaper per flagship chunk.  Ignored (with zero cost:
        the packed transpose is dead-code-eliminated) on every other
        path; incompatible with ``kappa`` (beta is recomputed).
      prebinned: the z axis of ``delta``/``beta`` is ALREADY binned (each
        slice is the bin-sum of ``binning`` physical slices; requires
        delta_beta, nz multiple of binning at bin time).  ``binning``
        still sets the per-step propagation distance, but no further
        z reduction is applied.  Lets the driver hoist the bin reduction
        out of the per-minibatch work (one object-sized reduction per
        angle instead of one patch-stack reduction per gradient chunk).

    Returns:
      Exit wave ``[..., y, x]`` (and the intermediate stack if requested).
    """
    lmbda_nm = wavelength_nm(energy_ev)
    dz_cm = psize_cm if slice_spacing_cm is None else slice_spacing_cm
    voxel_nm = (psize_cm * 1e7, psize_cm * 1e7, dz_cm * 1e7)
    delta_nm = voxel_nm[2]
    k1 = 2.0 * PI * delta_nm / lmbda_nm if scale_ri_by_k else 1.0
    prop_sign = -1.0 if backprop else 1.0
    # Backpropagation modulates by exp(-i k n* z): the delta phase flips sign
    # (``adorym/propagate.py:414``), absorption does not.
    mod_sign = -sign_convention if backprop else sign_convention

    if kappa is not None:
        beta = delta * kappa
        db_stack = None    # beta recomputed: the packed stack is stale
        db_zmajor = None

    if final_prop is not None and backprop:
        raise ValueError('final_prop is a detector-side propagation; '
                         'meaningless under backprop')

    def _to_det(out):
        """Apply the requested detector propagation via XLA (the fallback
        for every path that did not fold it into the kernel)."""
        if final_prop is None:
            return out
        return free_space_propagate(
            out, final_prop['free_prop_cm'], lmbda_nm, voxel_nm,
            sign_convention=sign_convention,
            normalize_fft=final_prop.get('normalize_fft', False),
            fresnel_approx=fresnel_approx)

    if repeats is not None:
        t = slice_modulator(delta[..., 0], beta[..., 0], k1, unknown_type,
                            mod_sign)
        if kernel is None:
            kernel = fresnel_kernel(wave.shape[-2:], voxel_nm, lmbda_nm,
                                    prop_sign * delta_nm * binning,
                                    fresnel_approx=fresnel_approx,
                                    sign_convention=sign_convention)
        n_steps = -(-repeats // binning)
        if binning > 1:
            raise NotImplementedError('repeats with binning > 1')

        def body(i, wv):
            wv = wv * t
            return jax.lax.cond(i < n_steps - 1,
                                lambda w: ifft2(fft2(w) * kernel),
                                lambda w: w, wv)

        wave = jax.lax.fori_loop(0, n_steps, body, wave)
        return _to_det(wave)

    # Move z in front: [nz, ..., y, x].  Pad the far (z-max) end to a
    # multiple of ``binning`` BEFORE any reversal, so the identity padding
    # always joins the far-side bin — the short bin in both directions
    # (forward: last step, ``adorym/propagate.py:207-257``; backward: first
    # step, ``:381-383``).
    if prebinned:
        delta_z = jnp.moveaxis(delta, -1, 0)
        beta_z = jnp.moveaxis(beta, -1, 0)
        if backprop:
            delta_z = delta_z[::-1]
            beta_z = beta_z[::-1]
    else:
        delta_z = _pad_z_to_multiple(jnp.moveaxis(delta, -1, 0), binning,
                                     unknown_type)
        beta_z = _pad_z_to_multiple(jnp.moveaxis(beta, -1, 0), binning,
                                    unknown_type)
        if backprop:
            delta_z = delta_z[::-1]
            beta_z = beta_z[::-1]
        delta_z = _bin_slices(delta_z, binning, unknown_type)
        beta_z = _bin_slices(beta_z, binning, unknown_type)
    n_steps = delta_z.shape[0]

    # Packed z-major mirror of the exact same prep (both helpers operate on
    # axis 0; the channel axis rides along).  Consumed only by the fused
    # delta_beta kernels — dead-code-eliminated everywhere else, just as
    # the split transposes are dead when the packed path runs.
    db_z = None
    if db_zmajor is not None and unknown_type == 'delta_beta':
        # Already [zb, 2, ..., y, x] (the z-major extraction path): no
        # relayout at all — only the shared pad/reverse/bin prep.
        db_z = db_zmajor
        if not prebinned:
            db_z = _pad_z_to_multiple(db_z, binning, unknown_type)
        if backprop:
            db_z = db_z[::-1]
        if not prebinned:
            db_z = _bin_slices(db_z, binning, unknown_type)
    elif db_stack is not None and unknown_type == 'delta_beta':
        db_z = jnp.moveaxis(db_stack, (-2, -1), (0, 1))
        if not prebinned:
            db_z = _pad_z_to_multiple(db_z, binning, unknown_type)
        if backprop:
            db_z = db_z[::-1]
        if not prebinned:
            db_z = _bin_slices(db_z, binning, unknown_type)

    internal_kernel = kernel is None
    if kernel is None:
        kernel = fresnel_kernel(wave.shape[-2:], voxel_nm, lmbda_nm,
                                prop_sign * delta_nm * binning,
                                fresnel_approx=fresnel_approx,
                                sign_convention=sign_convention)

    if fused == 'auto':
        # At full f32 precision the DFT-by-matmul kernels only TIE (t_all
        # variant) or LOSE (multi-pass HIGHEST dots, 2-propagation
        # invertible backward) to XLA's FFT in the compiled angle program;
        # their win is the single-pass bf16 MXU mode (~1.35x, measured
        # db-bf16 5.9-6.6k vs xla 4.4-4.6k patterns/s interleaved at the
        # flagship).  Auto therefore selects Pallas only under
        # run_bfloat16; force with fused='on'.
        fused = (jax.default_backend() == 'tpu' and not return_intermediate
                 and wave.ndim == 4 and delta_z.ndim == 4 and mxu_bf16)
    fused = (fused and not return_intermediate and wave.ndim == 4
             and delta_z.ndim == 4)

    if (fused and n_steps > 1 and unknown_type == 'delta_beta'
            and fresnel_approx and internal_kernel):
        # Modulator-fused kernels: the object channels stream as two f32
        # planes and the modulator (and its VJP) compute on the VPU.
        # Stored-intermediates variant by default (1 propagation per
        # backward step); the invertible variant (reconstructs wavefields,
        # 2 propagations, but ZERO step-sized storage) takes over when the
        # intermediate stack would be large (>2 GB).
        from . import pallas_multislice as pm
        interpret = jax.default_backend() != 'tpu'
        inter_bytes = (n_steps * wave.size * 8)
        kern = (pm.multislice_db_packed
                if inter_bytes > _db_stored_max_bytes()
                else pm.multislice_db_stored_packed)
        # The object planes stream in their native dtype: bf16 under
        # run_bfloat16 (half the HBM bytes each way — the kernels upcast
        # on the VPU and emit gd/gb back in the same dtype, so no XLA-side
        # cast copies of the step-sized stacks).
        if db_z is None:
            if delta_z.dtype not in (jnp.float32, jnp.bfloat16):
                delta_z = delta_z.astype(jnp.float32)
                beta_z = beta_z.astype(jnp.float32)
            db_z = jnp.stack([delta_z, beta_z.astype(delta_z.dtype)], 1)
        elif db_z.dtype not in (jnp.float32, jnp.bfloat16):
            db_z = db_z.astype(jnp.float32)
        # Fold the detector propagation into the kernel's last step when
        # it is a separable matrix pair; otherwise fall back to XLA below.
        f_mats, folded = (None, None, None, None), False
        if final_prop is not None:
            fp = final_prop['free_prop_cm']
            if fp is None or (isinstance(fp, (int, float)) and fp == 0):
                folded = True            # identity free-space propagation
            elif not isinstance(fp, (int, float, np.floating, str)):
                pass                     # traced distance: XLA tail keeps AD
            else:
                mats = final_prop_mats(
                    wave.shape[-2:], voxel_nm, lmbda_nm, fp,
                    sign_convention=sign_convention,
                    normalize_fft=final_prop.get('normalize_fft', False),
                    fresnel_approx=fresnel_approx)
                if mats is not None:
                    f_mats, folded = mats, True
        out = kern(db_z,
                   wave.astype(jnp.complex64),
                   kernel.astype(jnp.complex64),
                   float(k1), float(mod_sign), interpret, mxu_bf16,
                   *f_mats)
        return out if folded else _to_det(out)

    t_all = slice_modulator(delta_z, beta_z, k1, unknown_type, mod_sign)

    if n_steps == 1:
        out = _to_det(wave * t_all[0])
        if return_intermediate:
            return out, wave[None]
        return out

    if fused:
        from .pallas_multislice import multislice_fused
        interpret = jax.default_backend() != 'tpu'
        return _to_det(multislice_fused(t_all.astype(jnp.complex64),
                                        wave.astype(jnp.complex64),
                                        kernel.astype(jnp.complex64),
                                        interpret, mxu_bf16))

    def step(wv, t):
        wv_in = wv
        wv = ifft2(fft2(wv * t) * kernel)
        return wv, (wv_in if return_intermediate else None)

    wave, inter = jax.lax.scan(step, wave, t_all[:-1])
    out = _to_det(wave * t_all[-1])
    if return_intermediate:
        inter = jnp.concatenate([inter, wave[None]], axis=0)
        return out, inter
    return out


def pure_projection_modulate(delta, beta, wave, energy_ev, psize_cm,
                             slice_spacing_cm=None, unknown_type='delta_beta',
                             sign_convention=1, scale_ri_by_k=True,
                             kappa=None, is_minus_logged=False,
                             return_sqrt=False, backprop=False):
    """Projection-approximation modulation (no intra-object diffraction).

    Mirrors the ``pure_projection`` branch of the reference propagator
    (``adorym/propagate.py:158-193``), including the minus-logged tomography
    interpretation where the summed beta is the (squared) image directly.
    """
    lmbda_nm = wavelength_nm(energy_ev)
    dz_cm = psize_cm if slice_spacing_cm is None else slice_spacing_cm
    k1 = 2.0 * PI * (dz_cm * 1e7) / lmbda_nm if scale_ri_by_k else 1.0
    mod_sign = -sign_convention if backprop else sign_convention
    if unknown_type == 'delta_beta':
        d = jnp.sum(delta, axis=-1)
        b = d * kappa if kappa is not None else jnp.sum(beta, axis=-1)
        if is_minus_logged:
            if return_sqrt:
                t = jnp.sqrt(b + 1e-10).astype(jnp.complex64)
            else:
                t = b.astype(jnp.complex64)
        else:
            t = slice_modulator(d, b, k1, 'delta_beta', mod_sign)
    elif unknown_type == 'real_imag':
        d = jnp.prod(delta, axis=-1)
        b = jnp.prod(beta, axis=-1)
        if is_minus_logged:
            val = -jnp.log(d * d + b * b)
            t = (jnp.sqrt(val + 1e-10) if return_sqrt else val).astype(jnp.complex64)
        else:
            t = (d + 1j * b).astype(jnp.complex64)
    else:
        raise ValueError("unknown_type must be 'delta_beta' or 'real_imag'")
    return wave * t


def sparse_multislice_propagate(delta, beta, wave, energy_ev, psize_cm,
                                slice_pos_cm_ls, unknown_type='delta_beta',
                                fresnel_approx=True, sign_convention=1,
                                scale_ri_by_k=True):
    """Multislice with a few slices at arbitrary (refinable) z positions.

    Mirrors ``sparse_multislice_propagate_batch``
    (``adorym/propagate.py:479-534``).  ``slice_pos_cm_ls`` may be a traced
    array — gradients flow into the slice positions, which is how the
    reference refines them.  Note: like the reference, ``k1`` uses the
    *lateral* voxel size as the thickness scale (``adorym/propagate.py:494,501``).
    """
    lmbda_nm = wavelength_nm(energy_ev)
    voxel_nm = (psize_cm * 1e7,) * 3
    k1 = 2.0 * PI * voxel_nm[2] / lmbda_nm if scale_ri_by_k else 1.0
    slice_pos_nm = jnp.asarray(slice_pos_cm_ls) * 1e7
    n_slices = delta.shape[-1]
    if n_slices <= SPARSE_UNROLL_MAX:
        # Few slices (the intended regime): unroll, letting XLA fuse the
        # modulate into the neighboring transforms.
        for i in range(n_slices):
            t = slice_modulator(delta[..., i], beta[..., i], k1,
                                unknown_type, sign_convention)
            wave = wave * t
            if i < n_slices - 1:
                dist_nm = slice_pos_nm[i + 1] - slice_pos_nm[i]
                wave = fresnel_propagate(wave, dist_nm, lmbda_nm, voxel_nm,
                                         fresnel_approx=fresnel_approx,
                                         sign_convention=sign_convention)
        return wave
    # Many slices: a lax.scan keeps the compiled program one step long
    # instead of unrolling n_slices FFT pairs (unbounded compile time).
    # The final step "propagates" distance 0 — an identity kernel — so
    # the scan body has no conditional.
    dists = jnp.concatenate([slice_pos_nm[1:] - slice_pos_nm[:-1],
                             jnp.zeros((1,), slice_pos_nm.dtype)])

    def step(wv, xs):
        d_i, b_i, dist_nm = xs
        t = slice_modulator(d_i, b_i, k1, unknown_type, sign_convention)
        wv = fresnel_propagate(wv * t, dist_nm, lmbda_nm, voxel_nm,
                               fresnel_approx=fresnel_approx,
                               sign_convention=sign_convention)
        return wv, None

    wave, _ = jax.lax.scan(step, wave, (jnp.moveaxis(delta, -1, 0),
                                        jnp.moveaxis(beta, -1, 0), dists))
    return wave


# ---------------------------------------------------------------------------
# Contrast transfer function (CTF) forward models
# ---------------------------------------------------------------------------

def ctf_intensity_spectrum(wave, dist_nm, lmbda_nm, voxel_nm,
                           sign_convention=1):
    """Fourier transform of the propagated intensity via
    ``F[I] = [Psi' H] * [Psi H']`` (``adorym/propagate.py:571-587``)."""
    shape = wave.shape[-2:]
    f = fft2(wave, norm='ortho')
    h = fresnel_kernel(shape, voxel_nm, lmbda_nm, dist_nm,
                       sign_convention=sign_convention)
    a1 = jnp.conj(f) * h
    a2 = f * jnp.conj(h)
    # convolution of a1 and a2 via ortho-normalized FFTs
    return ifft2(fft2(a1, norm='ortho') * fft2(a2, norm='ortho'), norm='ortho')


def pure_phase_ctf(delta_proj, beta_proj, dist_nm, lmbda_nm, voxel_nm,
                   kappa=50.0):
    """Pure-phase CTF forward model (``adorym/propagate.py:590-606``).

    Returns the predicted detected *magnitude* (imag part is zero by
    construction).  ``kappa`` may be traced (``ctf_lg_kappa`` refinement).
    """
    u, v = gen_freq_mesh(voxel_nm, delta_proj.shape[-2:])
    f = fft2(delta_proj.astype(jnp.complex64))
    xi = PI * lmbda_nm * dist_nm * (u * u + v * v)
    osc = 2.0 * (jnp.sin(xi) + jnp.cos(xi) / kappa)
    img = jnp.real(ifft2(osc * f)) + 1.0
    return jnp.sqrt(jnp.clip(img, 0.0, None)).astype(jnp.complex64)


def modulate_and_get_ctf(delta, beta, energy_ev, psize_cm, free_prop_cm,
                         kappa=50.0):
    """Project the object and apply the pure-phase CTF
    (``adorym/propagate.py:467-476``)."""
    lmbda_nm = wavelength_nm(energy_ev)
    voxel_nm = (psize_cm * 1e7,) * 3
    dist_nm = jnp.asarray(free_prop_cm) * 1e7
    d = jnp.sum(delta, axis=-1)
    return pure_phase_ctf(d, None, dist_nm, lmbda_nm, voxel_nm, kappa=kappa)
