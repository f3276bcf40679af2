"""Numerical parity against the actual reference implementation.

Runs the reference (PyTorch-CPU backend, mounted read-only at
/root/reference) and this framework on the SAME dataset with the SAME
initialization and optimizer settings, and compares loss trajectories —
the BASELINE.md target is agreement to ~1e-5.

Skipped when the reference mount is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason='reference not mounted')


def _import_reference():
    if 'dxchange' not in sys.modules:
        stub = types.ModuleType('dxchange')

        def _read_tiff(path, *a, **k):
            # Real read (the reference loads its finite-support mask
            # through dxchange); same frames-first layout as dxchange.
            from adorym_tpu.io.output import read_tiff
            return read_tiff(path)

        stub.read_tiff = _read_tiff
        stub.write_tiff = lambda *a, **k: None
        sys.modules['dxchange'] = stub
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from adorym.ptychography import reconstruct_ptychography as ref_recon
    return ref_recon


@pytest.fixture(autouse=True)
def _run_in_tmp(tmp_path, monkeypatch):
    """The reference writes rotation-lookup folders (``arrsize_*``) to
    CWD; keep them out of the repo root.  All paths in this module are
    absolute, so the chdir is inert otherwise."""
    monkeypatch.chdir(tmp_path)


@pytest.fixture(scope='module')
def parity_setup(tmp_path_factory):
    """Shared dataset + inits: 2D ptychography, 3x3 positions, one batch
    per epoch (no shuffle sensitivity), supplied probe, supplied object."""
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.simulate import simulate_to_file

    root = tmp_path_factory.mktemp('parity')
    n, pn = 32, 16
    rng = np.random.default_rng(42)
    from scipy.ndimage import gaussian_filter
    sm = gaussian_filter(rng.random((n, n, 1)), (3, 3, 0))
    sm = (sm - sm.min()) / max(np.ptp(sm), 1e-12)
    obj_true = np.stack([sm * 2e-3, sm * 5e-5], -1).astype(np.float32)

    probe_mag, probe_phase = np.ones((pn, pn)), np.zeros((pn, pn))
    y, x = np.mgrid[:pn, :pn] - (pn - 1) / 2
    probe_mag = np.exp(-(x ** 2 + y ** 2) / (2 * 4.0 ** 2))
    probe_phase = 0.3 * np.exp(-(x ** 2 + y ** 2) / (2 * 4.0 ** 2))
    probe = np.stack([probe_mag * np.cos(probe_phase),
                      probe_mag * np.sin(probe_phase)], -1
                     ).astype(np.float32)[None]

    xs = np.arange(0, n - pn + 1, 8)
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)

    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', two_d_mode=True),
        train=TrainConfig(minibatch_size=len(pos)))
    simulate_to_file(str(root / 'data.h5'), cfg, obj_true, probe, pos)

    obj0_delta = (rng.random((n, n, 1)) * 1e-4).astype(np.float64)
    obj0_beta = (rng.random((n, n, 1)) * 1e-6).astype(np.float64)
    return (root, n, pn, pos, probe_mag, probe_phase, obj0_delta, obj0_beta)


def run_reference(setup, n_epochs, lr, optimizer, extra=None, tag='',
                  probe_override=None):
    root, n, pn, pos, probe_mag, probe_phase, obj0_d, obj0_b = setup
    if probe_override is not None:
        probe_mag, probe_phase = probe_override
    ref_recon = _import_reference()
    out = f'ref_out_{optimizer}{tag}'
    ref_recon(
        fname='data.h5', save_path=str(root), output_folder=out,
        obj_size=(n, n, 1), two_d_mode=True,
        probe_pos=pos, energy_ev=5000.0, psize_cm=1e-7,
        free_prop_cm='inf', n_epochs=n_epochs,
        minibatch_size=len(pos), n_dp_batch=len(pos),
        optimizer=optimizer, learning_rate=lr,
        initial_guess=[obj0_d, obj0_b],
        probe_type='supplied', probe_initial=[probe_mag, probe_phase],
        alpha_d=None, alpha_b=None, gamma=0,
        use_checkpoint=False, store_checkpoint=False,
        save_intermediate=False, backend='pytorch', cpu_only=True,
        dynamic_rate=False,
        **(extra or {}),
    )
    csv = os.path.join(str(root), out, 'convergence', 'loss_rank_0.txt')
    rows = np.genfromtxt(csv, delimiter=',', names=True)
    return np.atleast_1d(rows['loss'])


def test_beamstop_parity(parity_setup):
    """Beamstop-masked loss (``adorym/forward_model.py:128-140``: pixels
    under the stop are excluded from the data term; the mask is
    binarized at 1e-5)."""
    root, n, pn, pos, probe_mag, probe_phase, obj0_d, obj0_b = parity_setup
    yy, xx = np.mgrid[:pn, :pn] - (pn - 1) / 2
    beamstop = (yy ** 2 + xx ** 2 > 3.0 ** 2).astype(np.float32)
    n_epochs, lr = 5, 1e-3
    ours = run_ours(parity_setup, n_epochs, lr, 'gd', beamstop=beamstop)
    ref = run_reference(parity_setup, n_epochs, lr, 'gd',
                        extra=dict(beamstop=beamstop), tag='_bs')
    assert len(ref) == n_epochs, ref
    # Measured residual max 7.4e-6 (the masked-pixel loss normalizes by
    # fewer terms, amplifying the f32 forward noise slightly); 2e-5
    # keeps ~3x headroom.
    np.testing.assert_allclose(ours, ref, rtol=2e-5)


def run_ours(setup, n_epochs, lr, optimizer, refine=None, beamstop=None,
             probe_override=None, n_probe_modes=1):
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.io.data import RawDataset
    from adorym_tpu.recon import Reconstructor
    root, n, pn, pos, probe_mag, probe_phase, obj0_d, obj0_b = setup
    if probe_override is not None:
        probe_mag, probe_phase = probe_override
    ds = RawDataset(str(root / 'data.h5'))
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', two_d_mode=True),
        train=TrainConfig(minibatch_size=len(pos), learning_rate=lr,
                          optimizer=optimizer, n_probe_modes=n_probe_modes),
        **({'refine': refine} if refine is not None else {}))
    obj0 = np.stack([obj0_d, obj0_b], -1).astype(np.float32)
    probe0 = np.stack([probe_mag * np.cos(probe_phase),
                       probe_mag * np.sin(probe_phase)], -1
                      ).astype(np.float32)
    if probe0.ndim == 3:
        probe0 = probe0[None]
    rec = Reconstructor(cfg, data=ds.all_magnitudes(), probe_pos=pos,
                        probe_init=probe0, obj_init=obj0,
                        beamstop=beamstop)
    losses = []
    for ep in range(n_epochs):
        # Reproduce a reference quirk for the comparison: the reference
        # resets its optimizer step counter at the top of EVERY epoch
        # (``adorym/ptychography.py:848`` uses starting_epoch, which never
        # advances), so Adam's bias correction restarts each epoch.  Our
        # default keeps the counter monotone (correct Adam); the reset is
        # emulated here only to validate numerical parity.
        rec.i_opt_batch = 0
        losses.append(rec.run_epoch(ep))
    return np.asarray(losses)


@pytest.mark.parametrize('optimizer,lr,rtol', [('gd', 1e-3, 1e-5),
                                               ('adam', 1e-4, 5e-5)])
def test_loss_curve_matches_reference(parity_setup, optimizer, lr, rtol):
    """BASELINE.md north star: loss curves matching the PyTorch backend
    to 1e-5.  Measured residual budget (PARITY.md 'Parity error budget'):
    the FIRST epoch differs by 1.9e-6 for BOTH optimizers — the pure
    f32 forward difference (torch pocketfft vs XLA FFT, reduction
    order) — and stays there under GD (linear in the gradient; max
    2.2e-6 over 5 epochs), so the GD row asserts the 1e-5 north star
    with >4x headroom.  Adam divides by sqrt(v)+eps with v itself
    noise-bearing early on, amplifying the same forward noise ~6x by
    epoch 4 (measured 1.2e-5) — irreducibly above 1e-5 for ANY f32
    implementation pair; its row pins 5e-5."""
    n_epochs = 5
    ours = run_ours(parity_setup, n_epochs, lr, optimizer)
    ref = run_reference(parity_setup, n_epochs, lr, optimizer)
    assert len(ref) == n_epochs, ref
    np.testing.assert_allclose(ours, ref, rtol=rtol)


def test_probe_optimization_parity(parity_setup):
    """Joint object + probe refinement against the live reference: the
    probe's default Adam at ``probe_learning_rate``
    (``adorym/optimizers.py:812-820``) updates every batch from the
    stacked real/imag gradients; its step counter is the same
    reset-per-epoch ``i_opt_batch`` the object uses
    (``optimizers.py:update_parameters`` ``i_full_angle``)."""
    from adorym_tpu.config import RefineConfig
    n_epochs, lr = 5, 1e-3
    ours = run_ours(parity_setup, n_epochs, lr, 'gd',
                    refine=RefineConfig(optimize_probe=True,
                                        probe_learning_rate=1e-4))
    ref = run_reference(parity_setup, n_epochs, lr, 'gd',
                        extra=dict(optimize_probe=True,
                                   probe_learning_rate=1e-4),
                        tag='_probe')
    assert len(ref) == n_epochs, ref
    # Measured residual max 2.5e-6: meets the 1e-5 north star.
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_probe_modes_parity(parity_setup):
    """Incoherent probe-mode sum (``n_probe_modes=2``): per-mode exit
    waves propagate independently and the detector magnitude is
    sqrt(sum_i |psi_i|^2) (``adorym/forward_model.py`` i_mode loop).
    Supplied 3D probe arrays pass through verbatim
    (``adorym/ptychography.py:630-633``)."""
    root, n, pn, pos, probe_mag, probe_phase, obj0_d, obj0_b = parity_setup
    y, x = np.mgrid[:pn, :pn] - (pn - 1) / 2
    mag2 = 0.4 * np.exp(-(x ** 2 + y ** 2) / (2 * 2.5 ** 2))
    ph2 = -0.2 * np.exp(-((x - 1) ** 2 + y ** 2) / (2 * 3.0 ** 2))
    mags = np.stack([probe_mag, mag2])
    phases = np.stack([probe_phase, ph2])
    n_epochs, lr = 5, 1e-3
    ours = run_ours(parity_setup, n_epochs, lr, 'gd',
                    probe_override=(mags, phases), n_probe_modes=2)
    ref = run_reference(parity_setup, n_epochs, lr, 'gd',
                        extra=dict(n_probe_modes=2), tag='_modes',
                        probe_override=(mags, phases))
    assert len(ref) == n_epochs, ref
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_position_refinement_parity(parity_setup):
    """Per-spot position refinement (``optimize_all_probe_pos``) against
    the live reference: probe_pos_correction [n_theta, n_pos, 2] updated
    by its default Adam with the position-drift mean subtraction
    (``adorym/optimizers.py:update_parameters`` probe_pos_correction
    branch)."""
    from adorym_tpu.config import RefineConfig
    n_epochs, lr = 5, 1e-3
    ours = run_ours(parity_setup, n_epochs, lr, 'gd',
                    refine=RefineConfig(optimize_all_probe_pos=True,
                                        all_probe_pos_learning_rate=1e-2))
    ref = run_reference(parity_setup, n_epochs, lr, 'gd',
                        extra=dict(optimize_all_probe_pos=True,
                                   all_probe_pos_learning_rate=1e-2),
                        tag='_pos')
    assert len(ref) == n_epochs, ref
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_prj_pos_offset_parity(parity_setup):
    """Per-angle projection (exit-wave) offset refinement
    (``optimize_prj_pos_offset``: the refined shift is applied to the
    exit wave in Fourier space, ``shift_exit_wave`` in
    ``adorym/propagate.py:multislice_propagate_batch``)."""
    from adorym_tpu.config import RefineConfig
    n_epochs, lr = 5, 1e-3
    ours = run_ours(parity_setup, n_epochs, lr, 'gd',
                    refine=RefineConfig(optimize_prj_pos_offset=True))
    ref = run_reference(parity_setup, n_epochs, lr, 'gd',
                        extra=dict(optimize_prj_pos_offset=True),
                        tag='_prjoff')
    assert len(ref) == n_epochs, ref
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_probe_defocus_parity(parity_setup, monkeypatch):
    """Probe defocus refinement (``optimize_probe_defocusing``): the
    scalar defocus propagates the probe by a TF kernel before the
    exit-wave product (``adorym/forward_model.py:249-253``), updated by
    its default Adam.

    The reference CRASHES here as shipped on the torch backend:
    ``get_kernel`` computes ``np.exp`` on the grad-requiring
    ``probe_defocus_mm`` tensor (``adorym/propagate.py:72``) — numpy
    conversion of a graph tensor raises.  Like the MultiDist-init
    parity row, the test patches the kernel to the torch equivalent of
    the same formula so the physics can be compared."""
    import torch as tc
    _import_reference()  # sys.path + dxchange stub before adorym imports
    import adorym.forward_model as ref_fm
    from adorym.propagate import gen_freq_mesh

    def get_kernel_torch(dist_nm, lmbda_nm, voxel_nm, grid_shape,
                         fresnel_approx=True, sign_convention=1):
        u, v = gen_freq_mesh(voxel_nm, grid_shape[0:2])
        if not isinstance(dist_nm, tc.Tensor):
            dist_nm = tc.tensor(float(dist_nm))
        quad = tc.tensor((u ** 2 + v ** 2))
        # exp(-i s pi lambda d q) with d differentiable
        phase = -sign_convention * np.pi * lmbda_nm * dist_nm * quad
        return tc.complex(tc.cos(phase), tc.sin(phase))

    monkeypatch.setattr(ref_fm, 'get_kernel', get_kernel_torch)
    from adorym_tpu.config import RefineConfig
    n_epochs, lr = 5, 1e-3
    ours = run_ours(parity_setup, n_epochs, lr, 'gd',
                    refine=RefineConfig(optimize_probe_defocusing=True,
                                        probe_defocusing_learning_rate=1e-4))
    ref = run_reference(parity_setup, n_epochs, lr, 'gd',
                        extra=dict(optimize_probe_defocusing=True,
                                   probe_defocusing_learning_rate=1e-4),
                        tag='_defoc')
    assert len(ref) == n_epochs, ref
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_probe_pos_offset_parity(parity_setup):
    """Per-angle global position offset (``optimize_probe_pos_offset``,
    ``adorym/forward_model.py`` probe_pos_offset branch shifts every
    spot of the angle by one refinable [n_theta, 2] vector, default
    Adam at 1e-2)."""
    from adorym_tpu.config import RefineConfig
    n_epochs, lr = 5, 1e-3
    ours = run_ours(parity_setup, n_epochs, lr, 'gd',
                    refine=RefineConfig(optimize_probe_pos_offset=True))
    ref = run_reference(parity_setup, n_epochs, lr, 'gd',
                        extra=dict(optimize_probe_pos_offset=True),
                        tag='_posoff')
    assert len(ref) == n_epochs, ref
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_3d_multislice_rotation_parity(tmp_path, monkeypatch):
    """Full 3D path — rotation + multislice + Fraunhofer — against the
    reference, multiple angles, one batch per angle.

    The reference's rotation reads float16 coordinate lookup tables from
    disk (``adorym/util.py:492-533``; its non-precalculated torch path
    crashes upstream), which bounds attainable agreement to ~1e-4."""
    monkeypatch.chdir(tmp_path)  # reference writes lookup tables to CWD
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.io.data import RawDataset
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate_to_file

    n, pn, n_theta = 16, 16, 3
    rng = np.random.default_rng(7)
    obj_true = np.stack([rng.random((n, n, n)) * 1e-3,
                         rng.random((n, n, n)) * 3e-5], -1).astype(np.float32)
    probe = np.stack([np.ones((pn, pn)), np.zeros((pn, pn))], -1
                     ).astype(np.float32)[None]
    pos = np.array([[0.0, 0.0]])
    theta_ls = np.linspace(0, np.pi, n_theta, endpoint=False)

    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                          energy_ev=800.0, psize_cm=0.67e-7,
                          free_prop_cm='inf'),
        train=TrainConfig(minibatch_size=1, learning_rate=1e-6,
                          optimizer='gd'))
    simulate_to_file(str(tmp_path / 'd3.h5'), cfg, obj_true, probe, pos,
                     theta_ls=theta_ls)

    obj0_d = (rng.random((n, n, n)) * 1e-4).astype(np.float64)
    obj0_b = (rng.random((n, n, n)) * 1e-6).astype(np.float64)

    ref_recon = _import_reference()
    ref_recon(
        fname='d3.h5', save_path=str(tmp_path), output_folder='ref3d',
        obj_size=(n, n, n), probe_pos=pos, theta_st=0, theta_end=np.pi,
        energy_ev=800.0, psize_cm=0.67e-7, free_prop_cm='inf',
        n_epochs=3, minibatch_size=1, n_dp_batch=1,
        optimizer='gd', learning_rate=1e-6, dynamic_rate=False,
        initial_guess=[obj0_d, obj0_b],
        probe_type='supplied',
        probe_initial=[np.ones((pn, pn)), np.zeros((pn, pn))],
        alpha_d=None, alpha_b=None, gamma=0,
        use_checkpoint=False, store_checkpoint=False,
        save_intermediate=False, backend='pytorch', cpu_only=True,
        precalculate_rotation_coords=True,
    )
    csv = os.path.join(str(tmp_path), 'ref3d', 'convergence',
                       'loss_rank_0.txt')
    rows = np.genfromtxt(csv, delimiter=',', names=True)
    ref_losses = np.atleast_1d(rows['loss'])

    ds = RawDataset(str(tmp_path / 'd3.h5'))
    obj0 = np.stack([obj0_d, obj0_b], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=ds.all_magnitudes(), probe_pos=pos,
                        probe_init=probe, obj_init=obj0, theta_ls=theta_ls)
    # Match the reference's angle ordering: it shuffles angles with
    # np.random.seed(i_epoch) (``adorym/ptychography.py:791-795``).
    def batches_like_reference(_):
        order = np.arange(n_theta)
        np.random.seed(rec._epoch_seed)
        np.random.shuffle(order)
        return [(int(t), np.array([0])) for t in order]

    rec.make_batches = batches_like_reference
    our_losses = []
    for ep in range(3):
        rec._epoch_seed = ep
        rec.run_epoch(ep, callback=lambda e, b, l: our_losses.append(l))
    np.testing.assert_allclose(np.asarray(our_losses), ref_losses,
                               rtol=5e-4)


def _patch_forwardmodel_init():
    """Reference bug: the driver passes run_bfloat16/run_float64 to every
    model (``adorym/ptychography.py:526-532``); MultiDistModel and
    SparseMultisliceModel forward their **kwargs to
    ``ForwardModel.__init__`` (``forward_model.py:813``, ``:593``) which
    doesn't accept them — both paths crash as shipped.  Patch the base
    init to tolerate the extras so the physics can be compared."""
    import adorym.forward_model as ref_fm
    if getattr(ref_fm.ForwardModel.__init__, '_patched', False):
        return
    orig_init = ref_fm.ForwardModel.__init__

    def patched(self, loss_function_type='lsq', distribution_mode=None,
                device=None, common_vars_dict=None,
                raw_data_type='magnitude', simulation_mode=False,
                **_ignored):
        orig_init(self, loss_function_type, distribution_mode, device,
                  common_vars_dict, raw_data_type, simulation_mode)
    patched._patched = True
    ref_fm.ForwardModel.__init__ = patched


def _patch_f32_rotation_tables(monkeypatch):
    """Regenerate the reference's rotation lookup tables at float32
    through its OWN coordinate math (it quantizes them to float16 on
    disk, ``adorym/util.py:515-516``, which bounds agreement to ~1e-3);
    see test_baseline1_64cube_parity for the rationale."""
    import adorym.ptychography as ref_pty
    import adorym.util as ref_util

    def save_lookup_f32(array_size, theta_ls_in, dest_folder=None,
                        override_backend=None):
        cn = ref_util.get_cooridnates_stack_for_rotation(array_size, axis=0)
        cn = ref_util.w.create_constant(cn, override_backend=override_backend)
        if dest_folder is None:
            dest_folder = 'arrsize_{}_{}_{}_ntheta_{}'.format(
                array_size[0], array_size[1], array_size[2],
                len(theta_ls_in))
        os.makedirs(dest_folder, exist_ok=True)
        th = ref_util.w.create_constant(theta_ls_in)
        for theta in th:
            co = ref_util.calculate_original_coordinates_for_rotation(
                array_size, cn, theta, override_backend=override_backend)
            ci = ref_util.calculate_original_coordinates_for_rotation(
                array_size, cn, -theta, override_backend=override_backend)
            np.save(os.path.join(dest_folder, '{:.5f}'.format(theta)),
                    ref_util.w.to_numpy(co).astype('float32'))
            np.save(os.path.join(dest_folder, '_{:.5f}'.format(theta)),
                    ref_util.w.to_numpy(ci).astype('float32'))

    monkeypatch.setattr(ref_pty, 'save_rotation_lookup', save_lookup_f32)


def test_perangle_rol_parity(tmp_path, monkeypatch):
    """The FLAGSHIP mode — ``update_scheme='per angle'`` +
    ``rotate_out_of_loop`` — against the actual reference
    (``adorym/ptychography.py:918-937`` pre-rotation, ``:1069-1078``
    interp gradient rotate-back at -theta, ``:1096`` per-angle update).

    One batch per angle: with several batches the reference re-rotates
    the whole accumulator after EVERY batch (its own TODO at
    ``adorym/ptychography.py:1077`` — earlier batches get rotated
    multiple times), so multi-batch trajectories diverge for a
    reference-bug reason.  Single-batch angles exercise everything the
    flagship path does (pre-rotation, gradient at theta, interp
    rotate-back, per-angle update) with the bug inert."""
    monkeypatch.chdir(tmp_path)  # reference writes lookup tables to CWD
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.io.data import RawDataset
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate_to_file

    n, pn, n_theta, n_epochs, lr = 16, 16, 3, 3, 1e-6
    rng = np.random.default_rng(11)
    obj_true = np.stack([rng.random((n, n, n)) * 1e-3,
                         rng.random((n, n, n)) * 3e-5], -1).astype(np.float32)
    probe = np.stack([np.ones((pn, pn)), np.zeros((pn, pn))], -1
                     ).astype(np.float32)[None]
    pos = np.array([[0.0, 0.0]])
    theta_ls = np.linspace(0, np.pi, n_theta, endpoint=False)

    geo = Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                   energy_ev=800.0, psize_cm=0.67e-7, free_prop_cm='inf')
    cfg_sim = ReconConfig(geometry=geo, train=TrainConfig(minibatch_size=1))
    simulate_to_file(str(tmp_path / 'rol.h5'), cfg_sim, obj_true, probe,
                     pos, theta_ls=theta_ls)

    obj0_d = (rng.random((n, n, n)) * 1e-4).astype(np.float64)
    obj0_b = (rng.random((n, n, n)) * 1e-6).astype(np.float64)

    ref_recon = _import_reference()
    _patch_f32_rotation_tables(monkeypatch)
    ref_recon(
        fname='rol.h5', save_path=str(tmp_path), output_folder='refrol',
        obj_size=(n, n, n), probe_pos=pos, theta_st=0, theta_end=np.pi,
        energy_ev=800.0, psize_cm=0.67e-7, free_prop_cm='inf',
        n_epochs=n_epochs, minibatch_size=1, n_dp_batch=1,
        optimizer='gd', learning_rate=lr, dynamic_rate=False,
        update_scheme='per angle', rotate_out_of_loop=True,
        initial_guess=[obj0_d, obj0_b],
        probe_type='supplied',
        probe_initial=[np.ones((pn, pn)), np.zeros((pn, pn))],
        alpha_d=None, alpha_b=None, gamma=0,
        use_checkpoint=False, store_checkpoint=False,
        save_intermediate=False, backend='pytorch', cpu_only=True,
        precalculate_rotation_coords=True,
    )
    csv = os.path.join(str(tmp_path), 'refrol', 'convergence',
                       'loss_rank_0.txt')
    ref_losses = np.atleast_1d(np.genfromtxt(csv, delimiter=',',
                                             names=True)['loss'])

    cfg = ReconConfig(
        geometry=geo,
        train=TrainConfig(minibatch_size=1, learning_rate=lr,
                          optimizer='gd', update_scheme='per angle',
                          rotate_out_of_loop=True))
    ds = RawDataset(str(tmp_path / 'rol.h5'))
    obj0 = np.stack([obj0_d, obj0_b], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=ds.all_magnitudes(), probe_pos=pos,
                        probe_init=probe, obj_init=obj0, theta_ls=theta_ls)

    def batches_like_reference(_):
        order = np.arange(n_theta)
        np.random.seed(rec._epoch_seed)
        np.random.shuffle(order)
        return [(int(t), np.array([0])) for t in order]

    rec.make_batches = batches_like_reference
    ours = []
    for ep in range(n_epochs):
        rec._epoch_seed = ep
        rec.run_epoch(ep, callback=lambda e, b, l: ours.append(l))
    assert len(ref_losses) == len(ours)
    np.testing.assert_allclose(np.asarray(ours), ref_losses, rtol=5e-4)


def test_perangle_accumulation_parity(tmp_path, monkeypatch):
    """Multi-batch per-angle gradient ACCUMULATION (without
    rotate_out_of_loop, where the reference is bug-free): two minibatches
    per angle accumulate (``adorym/ptychography.py:1066``
    ``gradient.arr += grads[0]``) and update once at the angle's last
    batch (``:1096``).  Pins this framework's accumulated-gradient
    scale (weighted per-batch means) against the reference's sum of
    per-batch mean gradients."""
    monkeypatch.chdir(tmp_path)
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.io.data import RawDataset
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate_to_file

    n, pn, n_theta, n_epochs, lr, mb = 16, 8, 3, 3, 1e-6, 2
    rng = np.random.default_rng(13)
    obj_true = np.stack([rng.random((n, n, n)) * 1e-3,
                         rng.random((n, n, n)) * 3e-5], -1).astype(np.float32)
    probe = np.stack([np.ones((pn, pn)), np.zeros((pn, pn))], -1
                     ).astype(np.float32)[None]
    # 4 positions = 2 batches of 2 per angle; in-order (the reference
    # shuffles only with randomize_probe_pos, default False).
    pos = np.array([[0.0, 0.0], [0.0, 8.0], [8.0, 0.0], [8.0, 8.0]],
                   dtype=float)
    theta_ls = np.linspace(0, np.pi, n_theta, endpoint=False)

    geo = Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                   energy_ev=800.0, psize_cm=0.67e-7, free_prop_cm='inf')
    cfg_sim = ReconConfig(geometry=geo, train=TrainConfig(minibatch_size=1))
    simulate_to_file(str(tmp_path / 'acc.h5'), cfg_sim, obj_true, probe,
                     pos, theta_ls=theta_ls)

    obj0_d = (rng.random((n, n, n)) * 1e-4).astype(np.float64)
    obj0_b = (rng.random((n, n, n)) * 1e-6).astype(np.float64)

    ref_recon = _import_reference()
    _patch_f32_rotation_tables(monkeypatch)
    ref_recon(
        fname='acc.h5', save_path=str(tmp_path), output_folder='refacc',
        obj_size=(n, n, n), probe_pos=pos, theta_st=0, theta_end=np.pi,
        energy_ev=800.0, psize_cm=0.67e-7, free_prop_cm='inf',
        n_epochs=n_epochs, minibatch_size=mb, n_dp_batch=1,
        optimizer='gd', learning_rate=lr, dynamic_rate=False,
        update_scheme='per angle',
        initial_guess=[obj0_d, obj0_b],
        probe_type='supplied',
        probe_initial=[np.ones((pn, pn)), np.zeros((pn, pn))],
        alpha_d=None, alpha_b=None, gamma=0,
        use_checkpoint=False, store_checkpoint=False,
        save_intermediate=False, backend='pytorch', cpu_only=True,
        precalculate_rotation_coords=True,
    )
    csv = os.path.join(str(tmp_path), 'refacc', 'convergence',
                       'loss_rank_0.txt')
    ref_losses = np.atleast_1d(np.genfromtxt(csv, delimiter=',',
                                             names=True)['loss'])

    cfg = ReconConfig(
        geometry=geo,
        train=TrainConfig(minibatch_size=mb, learning_rate=lr,
                          optimizer='gd', update_scheme='per angle'))
    ds = RawDataset(str(tmp_path / 'acc.h5'))
    obj0 = np.stack([obj0_d, obj0_b], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=ds.all_magnitudes(), probe_pos=pos,
                        probe_init=probe, obj_init=obj0, theta_ls=theta_ls)

    def batches_like_reference(_):
        order = np.arange(n_theta)
        np.random.seed(rec._epoch_seed)
        np.random.shuffle(order)
        return [(int(t), np.array([b * mb + i for i in range(mb)]))
                for t in order for b in range(len(pos) // mb)]

    rec.make_batches = batches_like_reference
    ours = []
    for ep in range(n_epochs):
        rec._epoch_seed = ep
        rec.run_epoch(ep, callback=lambda e, b, l: ours.append(l))
    # The reference logs a loss row only at each angle's LAST batch
    # (non-last batches ``continue`` before the CSV write,
    # ``adorym/ptychography.py:1096-1099``); this framework logs every
    # batch.  Compare at the reference's granularity.
    n_bpa = len(pos) // mb
    ours_last = np.asarray(ours).reshape(-1, n_bpa)[:, -1]
    assert len(ref_losses) == len(ours_last)
    np.testing.assert_allclose(ours_last, ref_losses, rtol=5e-4)


def test_fixed_tilt_parity(tmp_path, monkeypatch):
    """Fixed-tilt reconstruction (``initial_tilt`` with
    ``optimize_tilt=False``): the 3-axis sequential rotation replaces the
    plain view rotation (``adorym/forward_model.py:265-276``; the branch
    activates whenever ``initial_tilt is not None``).  Pins the per-axis
    rotation convention of ``ops/rotate.tilt_rotate`` against the
    reference's ``w.rotate`` chain on the live torch backend.

    Two scan positions force the reference onto PtychographyModel: its
    auto-selected SingleBatchFullfieldModel documents ``tilt_ls`` in the
    predict docstring but NEVER applies it (``adorym/forward_model.py:
    412-470`` has no tilt branch), so full-field tilt configs silently
    reconstruct untilted upstream — measured: identical losses with and
    without off-axis tilt components."""
    monkeypatch.chdir(tmp_path)
    from adorym_tpu.config import (Geometry, ReconConfig, RefineConfig,
                                   TrainConfig)
    from adorym_tpu.io.data import RawDataset
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate_to_file

    n, pn, n_theta, n_epochs, lr = 16, 8, 3, 3, 1e-6
    rng = np.random.default_rng(17)
    obj_true = np.stack([rng.random((n, n, n)) * 1e-3,
                         rng.random((n, n, n)) * 3e-5], -1).astype(np.float32)
    probe = np.stack([np.ones((pn, pn)), np.zeros((pn, pn))], -1
                     ).astype(np.float32)[None]
    pos = np.array([[0.0, 0.0], [8.0, 0.0]])
    theta_ls = np.linspace(0, np.pi, n_theta, endpoint=False)
    # Known per-angle tilts: view angles on axis 0 plus small off-axis
    # components on axes 1 and 2.
    tilt = np.stack([theta_ls + 0.02,
                     np.full(n_theta, 0.015),
                     np.full(n_theta, -0.01)]).astype(np.float64)

    geo = Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                   energy_ev=800.0, psize_cm=0.67e-7, free_prop_cm='inf')
    cfg_sim = ReconConfig(geometry=geo, train=TrainConfig(minibatch_size=1))
    simulate_to_file(str(tmp_path / 'tilt.h5'), cfg_sim, obj_true, probe,
                     pos, theta_ls=theta_ls)

    obj0_d = (rng.random((n, n, n)) * 1e-4).astype(np.float64)
    obj0_b = (rng.random((n, n, n)) * 1e-6).astype(np.float64)

    ref_recon = _import_reference()
    _patch_f32_rotation_tables(monkeypatch)
    ref_recon(
        fname='tilt.h5', save_path=str(tmp_path), output_folder='reftilt',
        obj_size=(n, n, n), probe_pos=pos, theta_st=0, theta_end=np.pi,
        energy_ev=800.0, psize_cm=0.67e-7, free_prop_cm='inf',
        n_epochs=n_epochs, minibatch_size=2, n_dp_batch=2,
        optimizer='gd', learning_rate=lr, dynamic_rate=False,
        initial_tilt=tilt,
        initial_guess=[obj0_d, obj0_b],
        probe_type='supplied',
        probe_initial=[np.ones((pn, pn)), np.zeros((pn, pn))],
        alpha_d=None, alpha_b=None, gamma=0,
        use_checkpoint=False, store_checkpoint=False,
        save_intermediate=False, backend='pytorch', cpu_only=True,
        precalculate_rotation_coords=True,
    )
    csv = os.path.join(str(tmp_path), 'reftilt', 'convergence',
                       'loss_rank_0.txt')
    ref_losses = np.atleast_1d(np.genfromtxt(csv, delimiter=',',
                                             names=True)['loss'])

    cfg = ReconConfig(
        geometry=geo,
        train=TrainConfig(minibatch_size=2, learning_rate=lr,
                          optimizer='gd'),
        refine=RefineConfig(fixed_tilt=True))
    ds = RawDataset(str(tmp_path / 'tilt.h5'))
    obj0 = np.stack([obj0_d, obj0_b], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=ds.all_magnitudes(), probe_pos=pos,
                        probe_init=probe, obj_init=obj0, theta_ls=theta_ls,
                        aux_init={'tilt_ls': tilt.astype(np.float32)})

    def batches_like_reference(_):
        order = np.arange(n_theta)
        np.random.seed(rec._epoch_seed)
        np.random.shuffle(order)
        return [(int(t), np.array([0, 1])) for t in order]

    rec.make_batches = batches_like_reference
    ours = []
    for ep in range(n_epochs):
        rec._epoch_seed = ep
        rec.run_epoch(ep, callback=lambda e, b, l: ours.append(l))
    assert len(ref_losses) == len(ours)
    np.testing.assert_allclose(np.asarray(ours), ref_losses, rtol=5e-4)


def test_tilt_refinement_parity(tmp_path, monkeypatch):
    """Refined tilt (``optimize_tilt``): gradients flow through the
    3-axis ``w.rotate`` chain into tilt_ls (initialized at the nominal
    view angles, ``adorym/ptychography.py:681-682``), default Adam at
    tilt_learning_rate.  Two positions force PtychographyModel (the
    full-field model ignores tilt — see test_fixed_tilt_parity)."""
    monkeypatch.chdir(tmp_path)
    from adorym_tpu.config import (Geometry, ReconConfig, RefineConfig,
                                   TrainConfig)
    from adorym_tpu.io.data import RawDataset
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate_to_file

    n, pn, n_theta, n_epochs, lr = 16, 8, 3, 3, 1e-6
    rng = np.random.default_rng(37)
    obj_true = np.stack([rng.random((n, n, n)) * 1e-3,
                         rng.random((n, n, n)) * 3e-5], -1).astype(np.float32)
    probe = np.stack([np.ones((pn, pn)), np.zeros((pn, pn))], -1
                     ).astype(np.float32)[None]
    pos = np.array([[0.0, 0.0], [8.0, 0.0]])
    theta_ls = np.linspace(0, np.pi, n_theta, endpoint=False)

    geo = Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                   energy_ev=800.0, psize_cm=0.67e-7, free_prop_cm='inf')
    cfg_sim = ReconConfig(geometry=geo, train=TrainConfig(minibatch_size=1))
    simulate_to_file(str(tmp_path / 'tr.h5'), cfg_sim, obj_true, probe,
                     pos, theta_ls=theta_ls)
    obj0_d = (rng.random((n, n, n)) * 1e-4).astype(np.float64)
    obj0_b = (rng.random((n, n, n)) * 1e-6).astype(np.float64)

    ref_recon = _import_reference()
    _patch_f32_rotation_tables(monkeypatch)
    ref_recon(
        fname='tr.h5', save_path=str(tmp_path), output_folder='reftr',
        obj_size=(n, n, n), probe_pos=pos, theta_st=0, theta_end=np.pi,
        energy_ev=800.0, psize_cm=0.67e-7, free_prop_cm='inf',
        n_epochs=n_epochs, minibatch_size=2, n_dp_batch=2,
        optimizer='gd', learning_rate=lr, dynamic_rate=False,
        optimize_tilt=True, tilt_learning_rate=1e-5,
        initial_guess=[obj0_d, obj0_b],
        probe_type='supplied',
        probe_initial=[np.ones((pn, pn)), np.zeros((pn, pn))],
        alpha_d=None, alpha_b=None, gamma=0,
        use_checkpoint=False, store_checkpoint=False,
        save_intermediate=False, backend='pytorch', cpu_only=True,
        precalculate_rotation_coords=True,
    )
    csv = os.path.join(str(tmp_path), 'reftr', 'convergence',
                       'loss_rank_0.txt')
    ref_losses = np.atleast_1d(np.genfromtxt(csv, delimiter=',',
                                             names=True)['loss'])

    cfg = ReconConfig(
        geometry=geo,
        train=TrainConfig(minibatch_size=2, learning_rate=lr,
                          optimizer='gd'),
        refine=RefineConfig(optimize_tilt=True, tilt_learning_rate=1e-5))
    ds = RawDataset(str(tmp_path / 'tr.h5'))
    obj0 = np.stack([obj0_d, obj0_b], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=ds.all_magnitudes(), probe_pos=pos,
                        probe_init=probe, obj_init=obj0, theta_ls=theta_ls)

    def batches_like_reference(_):
        order = np.arange(n_theta)
        np.random.seed(rec._epoch_seed)
        np.random.shuffle(order)
        return [(int(t), np.array([0, 1])) for t in order]

    rec.make_batches = batches_like_reference
    ours = []
    for ep in range(n_epochs):
        rec._epoch_seed = ep
        rec.i_opt_batch = 0
        rec.run_epoch(ep, callback=lambda e, b, l: ours.append(l))
    assert len(ref_losses) == len(ours)
    np.testing.assert_allclose(np.asarray(ours), ref_losses, rtol=5e-4)


def test_sparse_multislice_parity(tmp_path, monkeypatch):
    """SparseMultisliceModel against the live reference: slices at
    arbitrary ``slice_pos_cm_ls`` depths propagate with per-gap Fresnel
    kernels (``adorym/forward_model.py:589-707``,
    ``adorym/propagate.py sparse_multislice_propagate_batch``).

    16 slices so the rotation plane is CUBIC: the reference's
    precalculated rotation tables subtract the wrong axis's center from
    each in-plane coordinate (loop-variable leak in
    ``adorym/util.get_cooridnates_stack_for_rotation`` — ``coord -
    image_center[i]`` uses the OTHER axis's ``i``), so any nx != nz
    volume is sheared+clipped even at theta=0 (measured: x -> x+6.5,
    z -> z-6.5 for a (16,16,3) volume).  The two wrong centers cancel
    exactly when the in-plane axes have equal size."""
    monkeypatch.chdir(tmp_path)
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.io.data import RawDataset
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate_to_file

    n, pn, n_sl, n_epochs, lr = 16, 8, 16, 3, 1e-6
    # Irregular ascending depths (voxel units 0..45 at psize 1e-7)
    gaps = np.array([1, 2, 5, 1, 3, 8, 2, 1, 4, 6, 2, 3, 1, 5, 1], float)
    slice_pos_cm = tuple(np.concatenate([[0.0], np.cumsum(gaps)]) * 1e-7)
    rng = np.random.default_rng(23)
    obj_true = np.stack([rng.random((n, n, n_sl)) * 1e-3,
                         rng.random((n, n, n_sl)) * 3e-5],
                        -1).astype(np.float32)
    probe = np.stack([np.ones((pn, pn)), np.zeros((pn, pn))], -1
                     ).astype(np.float32)[None]
    pos = np.array([[0.0, 0.0], [0.0, 8.0], [8.0, 0.0], [8.0, 8.0]],
                   dtype=float)
    theta_ls = np.zeros(1)

    geo = Geometry(obj_size=(n, n, n_sl), probe_size=(pn, pn),
                   energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf',
                   slice_pos_cm_ls=slice_pos_cm)
    cfg_sim = ReconConfig(geometry=geo, train=TrainConfig(minibatch_size=1))
    simulate_to_file(str(tmp_path / 'sparse.h5'), cfg_sim, obj_true, probe,
                     pos, theta_ls=theta_ls)

    obj0_d = (rng.random((n, n, n_sl)) * 1e-4).astype(np.float64)
    obj0_b = (rng.random((n, n, n_sl)) * 1e-6).astype(np.float64)

    ref_recon = _import_reference()
    _patch_f32_rotation_tables(monkeypatch)
    _patch_forwardmodel_init()  # SparseMultisliceModel crashes as shipped
    ref_recon(
        fname='sparse.h5', save_path=str(tmp_path), output_folder='refsp',
        obj_size=(n, n, n_sl), probe_pos=pos, theta_st=0, theta_end=0,
        n_theta=1,
        energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf',
        slice_pos_cm_ls=np.asarray(slice_pos_cm),
        n_epochs=n_epochs, minibatch_size=len(pos), n_dp_batch=len(pos),
        optimizer='gd', learning_rate=lr, dynamic_rate=False,
        initial_guess=[obj0_d, obj0_b],
        probe_type='supplied',
        probe_initial=[np.ones((pn, pn)), np.zeros((pn, pn))],
        alpha_d=None, alpha_b=None, gamma=0,
        use_checkpoint=False, store_checkpoint=False,
        save_intermediate=False, backend='pytorch', cpu_only=True,
        precalculate_rotation_coords=True,
    )
    csv = os.path.join(str(tmp_path), 'refsp', 'convergence',
                       'loss_rank_0.txt')
    ref_losses = np.atleast_1d(np.genfromtxt(csv, delimiter=',',
                                             names=True)['loss'])

    cfg = ReconConfig(
        geometry=geo,
        train=TrainConfig(minibatch_size=len(pos), learning_rate=lr,
                          optimizer='gd'))
    ds = RawDataset(str(tmp_path / 'sparse.h5'))
    obj0 = np.stack([obj0_d, obj0_b], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=ds.all_magnitudes(), probe_pos=pos,
                        probe_init=probe, obj_init=obj0, theta_ls=theta_ls)
    ours = []
    for ep in range(n_epochs):
        rec.run_epoch(ep, callback=lambda e, b, l: ours.append(l))
    assert len(ref_losses) == len(ours)
    np.testing.assert_allclose(np.asarray(ours), ref_losses, rtol=1e-4)


def test_slice_pos_refinement_parity(tmp_path, monkeypatch):
    """Refinable slice positions in the sparse multislice model
    (``optimize_slice_pos``: gradients flow into the per-gap Fresnel
    distances; slice 0 anchored)."""
    monkeypatch.chdir(tmp_path)
    from adorym_tpu.config import (Geometry, ReconConfig, RefineConfig,
                                   TrainConfig)
    from adorym_tpu.io.data import RawDataset
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate_to_file

    n, pn, n_sl, n_epochs, lr = 16, 8, 16, 3, 1e-6
    gaps = np.array([1, 2, 5, 1, 3, 8, 2, 1, 4, 6, 2, 3, 1, 5, 1], float)
    slice_pos_cm = tuple(np.concatenate([[0.0], np.cumsum(gaps)]) * 1e-7)
    rng = np.random.default_rng(31)
    obj_true = np.stack([rng.random((n, n, n_sl)) * 1e-3,
                         rng.random((n, n, n_sl)) * 3e-5],
                        -1).astype(np.float32)
    probe = np.stack([np.ones((pn, pn)), np.zeros((pn, pn))], -1
                     ).astype(np.float32)[None]
    pos = np.array([[0.0, 0.0], [0.0, 8.0], [8.0, 0.0], [8.0, 8.0]],
                   dtype=float)
    theta_ls = np.zeros(1)

    geo = Geometry(obj_size=(n, n, n_sl), probe_size=(pn, pn),
                   energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf',
                   slice_pos_cm_ls=slice_pos_cm)
    cfg_sim = ReconConfig(geometry=geo, train=TrainConfig(minibatch_size=1))
    simulate_to_file(str(tmp_path / 'spr.h5'), cfg_sim, obj_true, probe,
                     pos, theta_ls=theta_ls)
    obj0_d = (rng.random((n, n, n_sl)) * 1e-4).astype(np.float64)
    obj0_b = (rng.random((n, n, n_sl)) * 1e-6).astype(np.float64)

    ref_recon = _import_reference()
    _patch_f32_rotation_tables(monkeypatch)
    _patch_forwardmodel_init()
    ref_recon(
        fname='spr.h5', save_path=str(tmp_path), output_folder='refspr',
        obj_size=(n, n, n_sl), probe_pos=pos, theta_st=0, theta_end=0,
        n_theta=1,
        energy_ev=5000.0, psize_cm=1e-7, free_prop_cm='inf',
        slice_pos_cm_ls=np.asarray(slice_pos_cm),
        optimize_slice_pos=True, slice_pos_learning_rate=1e-9,
        n_epochs=n_epochs, minibatch_size=len(pos), n_dp_batch=len(pos),
        optimizer='gd', learning_rate=lr, dynamic_rate=False,
        initial_guess=[obj0_d, obj0_b],
        probe_type='supplied',
        probe_initial=[np.ones((pn, pn)), np.zeros((pn, pn))],
        alpha_d=None, alpha_b=None, gamma=0,
        use_checkpoint=False, store_checkpoint=False,
        save_intermediate=False, backend='pytorch', cpu_only=True,
        precalculate_rotation_coords=True,
    )
    csv = os.path.join(str(tmp_path), 'refspr', 'convergence',
                       'loss_rank_0.txt')
    ref_losses = np.atleast_1d(np.genfromtxt(csv, delimiter=',',
                                             names=True)['loss'])

    cfg = ReconConfig(
        geometry=geo,
        train=TrainConfig(minibatch_size=len(pos), learning_rate=lr,
                          optimizer='gd'),
        refine=RefineConfig(optimize_slice_pos=True,
                            slice_pos_learning_rate=1e-9))
    ds = RawDataset(str(tmp_path / 'spr.h5'))
    obj0 = np.stack([obj0_d, obj0_b], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=ds.all_magnitudes(), probe_pos=pos,
                        probe_init=probe, obj_init=obj0, theta_ls=theta_ls)
    ours = []
    for ep in range(n_epochs):
        rec.i_opt_batch = 0
        rec.run_epoch(ep, callback=lambda e, b, l: ours.append(l))
    assert len(ref_losses) == len(ours)
    np.testing.assert_allclose(np.asarray(ours), ref_losses, rtol=1e-4)


@pytest.mark.parametrize('loss_type,extra_ref,extra_ours', [
    # Poisson NLL (``adorym/forward_model.py:94-102``)
    ('poisson', {}, {}),
    # lsq + reweighted-L1 regularizer (``adorym/regularizers.py:49-84``,
    # weight refresh ``adorym/ptychography.py:994-1000``)
    ('lsq', dict(alpha_d=5e-5, alpha_b=5e-6, reweighted_l1=True),
     dict(alpha_d=5e-5, alpha_b=5e-6, reweighted_l1=True)),
    # lsq + total variation (``adorym/regularizers.py`` TV on delta)
    ('lsq', dict(gamma=1e-6, alpha_d=None, alpha_b=None),
     dict(gamma=1e-6)),
])
def test_loss_parity_poisson_and_rwl1(parity_setup, loss_type, extra_ref,
                                      extra_ours):
    from adorym_tpu.config import (Geometry, LossConfig, ReconConfig,
                                   TrainConfig)
    from adorym_tpu.io.data import RawDataset
    from adorym_tpu.recon import Reconstructor
    root, n, pn, pos, probe_mag, probe_phase, obj0_d, obj0_b = parity_setup
    n_epochs, lr = 4, 1e-4

    ref_recon = _import_reference()
    out = f'ref_out_{loss_type}_{bool(extra_ref)}'
    ref_recon(
        fname='data.h5', save_path=str(root), output_folder=out,
        obj_size=(n, n, 1), two_d_mode=True,
        probe_pos=pos, energy_ev=5000.0, psize_cm=1e-7,
        free_prop_cm='inf', n_epochs=n_epochs,
        minibatch_size=len(pos), n_dp_batch=len(pos),
        optimizer='adam', learning_rate=lr,
        loss_function_type=loss_type, poisson_multiplier=1.0,
        initial_guess=[obj0_d, obj0_b],
        probe_type='supplied', probe_initial=[probe_mag, probe_phase],
        use_checkpoint=False, store_checkpoint=False,
        save_intermediate=False, backend='pytorch', cpu_only=True,
        dynamic_rate=False,
        **{'gamma': 0, **({'alpha_d': None, 'alpha_b': None}
                          if not extra_ref else extra_ref)})
    csv = os.path.join(str(root), out, 'convergence', 'loss_rank_0.txt')
    ref = np.atleast_1d(np.genfromtxt(csv, delimiter=',', names=True)['loss'])

    loss_cfg = LossConfig(loss_function_type=loss_type,
                          poisson_multiplier=1.0,
                          alpha_d=extra_ours.get('alpha_d', 0.0) or 0.0,
                          alpha_b=extra_ours.get('alpha_b', 0.0) or 0.0,
                          gamma=extra_ours.get('gamma', 0.0) or 0.0,
                          reweighted_l1=extra_ours.get('reweighted_l1', False))
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(pn, pn),
                          energy_ev=5000.0, psize_cm=1e-7,
                          free_prop_cm='inf', two_d_mode=True),
        loss=loss_cfg,
        train=TrainConfig(minibatch_size=len(pos), learning_rate=lr,
                          optimizer='adam'))
    ds = RawDataset(str(root / 'data.h5'))
    obj0 = np.stack([obj0_d, obj0_b], -1).astype(np.float32)
    probe0 = np.stack([probe_mag * np.cos(probe_phase),
                       probe_mag * np.sin(probe_phase)], -1
                      ).astype(np.float32)[None]
    rec = Reconstructor(cfg, data=ds.all_magnitudes(), probe_pos=pos,
                        probe_init=probe0, obj_init=obj0)
    ours = []
    for ep in range(n_epochs):
        rec.i_opt_batch = 0  # reference epoch-counter-reset quirk (see above)
        ours.append(rec.run_epoch(ep))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4)


def test_multidist_loss_parity(tmp_path):
    """MultiDistModel loss parity (``adorym/forward_model.py:809-1092``):
    4-distance near-field holography, plane probe, intensity data, no
    refinement — trajectories must agree like the ptychography rows."""
    from adorym_tpu.config import (Geometry, LossConfig, ReconConfig,
                                   TrainConfig)
    from adorym_tpu.models import multidist
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate
    from adorym_tpu.io.data import write_data_file
    from adorym_tpu.utils.initialize import initialize_probe

    n = 32
    dists = (0.05, 0.12, 0.3, 0.7)
    rng = np.random.default_rng(11)
    from scipy.ndimage import gaussian_filter
    ph = gaussian_filter(rng.normal(size=(n, n, 1)), (2, 2, 0))
    ph = ph / np.abs(ph).max() * 0.4
    obj_true = np.stack([np.cos(ph), np.sin(ph)], -1).astype(np.float32)

    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(n, n),
                          energy_ev=17500.0, psize_cm=1e-5,
                          free_prop_cm=dists, n_dists=4, two_d_mode=True,
                          safe_zone_width=0),
        loss=LossConfig(raw_data_type='intensity'),
        train=TrainConfig(minibatch_size=1, learning_rate=1e-3,
                          optimizer='adam', unknown_type='real_imag'))
    probe = initialize_probe((n, n), 'plane')
    pos = np.array([[0.0, 0.0]])
    data = simulate(cfg, obj_true, probe, pos, model=multidist)
    write_data_file(str(tmp_path / 'md.h5'), data ** 2, probe_pos=pos,
                    energy_ev=17500.0, psize_cm=1e-5, free_prop_cm=dists)

    obj0_r = np.ones((n, n, 1), np.float64)
    obj0_i = rng.normal(size=(n, n, 1)) * 0.01

    ref_recon = _import_reference()
    _patch_forwardmodel_init()
    ref_recon(
        fname='md.h5', save_path=str(tmp_path), output_folder='refmd',
        obj_size=(n, n, 1), two_d_mode=True, probe_pos=pos,
        energy_ev=17500.0, psize_cm=1e-5, free_prop_cm=list(dists),
        safe_zone_width=0,
        n_epochs=4, minibatch_size=1, n_dp_batch=1,
        optimizer='adam', learning_rate=1e-3,
        unknown_type='real_imag', raw_data_type='intensity',
        initial_guess=[obj0_r, obj0_i],
        probe_type='plane',
        alpha_d=None, alpha_b=None, gamma=0,
        use_checkpoint=False, store_checkpoint=False,
        save_intermediate=False, backend='pytorch', cpu_only=True,
        dynamic_rate=False)
    csv = os.path.join(str(tmp_path), 'refmd', 'convergence',
                       'loss_rank_0.txt')
    ref = np.atleast_1d(np.genfromtxt(csv, delimiter=',', names=True)['loss'])

    # The reference interprets a real_imag initial_guess as (MAGNITUDE,
    # PHASE) and converts (``adorym/util.py:123-124``); mirror that here.
    obj0 = np.stack([obj0_r * np.cos(obj0_i),
                     obj0_r * np.sin(obj0_i)], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=data ** 2, probe_pos=pos,
                        probe_init=probe, obj_init=obj0, model=multidist)
    ours = []
    for ep in range(4):
        rec.i_opt_batch = 0
        ours.append(rec.run_epoch(ep))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4)


def test_multidist_ctf_forward_parity(tmp_path):
    """``forward_algorithm='ctf'`` with refinable kappa against the live
    reference: the CTF forward replaces Fresnel modulation+propagation
    with the linearized contrast-transfer filter
    (``adorym/forward_model.py:1012`` ``modulate_and_get_ctf``), with
    ``ctf_lg_kappa`` updated by its default Adam."""
    from adorym_tpu.config import (Geometry, LossConfig, ReconConfig,
                                   RefineConfig, TrainConfig)
    from adorym_tpu.models import multidist
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate
    from adorym_tpu.io.data import write_data_file
    from adorym_tpu.utils.initialize import initialize_probe

    n = 32
    dists = (0.05, 0.12, 0.3, 0.7)
    rng = np.random.default_rng(29)
    from scipy.ndimage import gaussian_filter
    ph = gaussian_filter(rng.normal(size=(n, n, 1)), (2, 2, 0))
    ph = ph / np.abs(ph).max() * 0.4
    obj_true = np.stack([np.cos(ph), np.sin(ph)], -1).astype(np.float32)

    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(n, n),
                          energy_ev=17500.0, psize_cm=1e-5,
                          free_prop_cm=dists, n_dists=4, two_d_mode=True,
                          safe_zone_width=0),
        loss=LossConfig(raw_data_type='intensity'),
        train=TrainConfig(minibatch_size=1, learning_rate=1e-3,
                          optimizer='adam', unknown_type='real_imag',
                          forward_algorithm='ctf', ctf_kappa=10 ** 1.7),
        refine=RefineConfig(optimize_ctf_lg_kappa=True,
                            ctf_lg_kappa_learning_rate=1e-3))
    probe = initialize_probe((n, n), 'plane')
    pos = np.array([[0.0, 0.0]])
    data = simulate(cfg, obj_true, probe, pos, model=multidist)
    write_data_file(str(tmp_path / 'mdc.h5'), data ** 2, probe_pos=pos,
                    energy_ev=17500.0, psize_cm=1e-5, free_prop_cm=dists)

    obj0_r = np.ones((n, n, 1), np.float64)
    obj0_i = rng.normal(size=(n, n, 1)) * 0.01

    ref_recon = _import_reference()
    _patch_forwardmodel_init()
    ref_recon(
        fname='mdc.h5', save_path=str(tmp_path), output_folder='refmdc',
        obj_size=(n, n, 1), two_d_mode=True, probe_pos=pos,
        energy_ev=17500.0, psize_cm=1e-5, free_prop_cm=list(dists),
        safe_zone_width=0,
        forward_algorithm='ctf', ctf_lg_kappa=1.7,
        optimize_ctf_lg_kappa=True, ctf_lg_kappa_learning_rate=1e-3,
        n_epochs=4, minibatch_size=1, n_dp_batch=1,
        optimizer='adam', learning_rate=1e-3,
        unknown_type='real_imag', raw_data_type='intensity',
        initial_guess=[obj0_r, obj0_i],
        probe_type='plane',
        alpha_d=None, alpha_b=None, gamma=0,
        use_checkpoint=False, store_checkpoint=False,
        save_intermediate=False, backend='pytorch', cpu_only=True,
        dynamic_rate=False)
    csv = os.path.join(str(tmp_path), 'refmdc', 'convergence',
                       'loss_rank_0.txt')
    ref = np.atleast_1d(np.genfromtxt(csv, delimiter=',',
                                      names=True)['loss'])

    obj0 = np.stack([obj0_r * np.cos(obj0_i),
                     obj0_r * np.sin(obj0_i)], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=data ** 2, probe_pos=pos,
                        probe_init=probe, obj_init=obj0, model=multidist)
    ours = []
    for ep in range(4):
        rec.i_opt_batch = 0
        ours.append(rec.run_epoch(ep))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4)


def _multidist_fixture(tmp_path, seed=11):
    """Shared 4-distance holography dataset for multidist refinement
    rows (mirrors test_multidist_loss_parity's setup)."""
    from adorym_tpu.config import (Geometry, LossConfig, ReconConfig,
                                   TrainConfig)
    from adorym_tpu.models import multidist
    from adorym_tpu.simulate import simulate
    from adorym_tpu.io.data import write_data_file
    from adorym_tpu.utils.initialize import initialize_probe

    n = 32
    dists = (0.05, 0.12, 0.3, 0.7)
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    ph = gaussian_filter(rng.normal(size=(n, n, 1)), (2, 2, 0))
    ph = ph / np.abs(ph).max() * 0.4
    obj_true = np.stack([np.cos(ph), np.sin(ph)], -1).astype(np.float32)
    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, 1), probe_size=(n, n),
                          energy_ev=17500.0, psize_cm=1e-5,
                          free_prop_cm=dists, n_dists=4, two_d_mode=True,
                          safe_zone_width=0),
        loss=LossConfig(raw_data_type='intensity'),
        train=TrainConfig(minibatch_size=1, learning_rate=1e-3,
                          optimizer='adam', unknown_type='real_imag'))
    probe = initialize_probe((n, n), 'plane')
    pos = np.array([[0.0, 0.0]])
    data = simulate(cfg, obj_true, probe, pos, model=multidist)
    write_data_file(str(tmp_path / 'mdr.h5'), data ** 2, probe_pos=pos,
                    energy_ev=17500.0, psize_cm=1e-5, free_prop_cm=dists)
    obj0_r = np.ones((n, n, 1), np.float64)
    obj0_i = rng.normal(size=(n, n, 1)) * 0.01
    return n, dists, cfg, probe, pos, data, obj0_r, obj0_i


def _run_multidist_pair(tmp_path, ref_extra, our_refine, tag):
    """Run reference + ours on the multidist fixture with a refinement
    enabled; return (ref_losses, our_losses)."""
    from adorym_tpu.config import RefineConfig
    import dataclasses
    from adorym_tpu.models import multidist
    from adorym_tpu.recon import Reconstructor

    n, dists, cfg, probe, pos, data, obj0_r, obj0_i = _multidist_fixture(
        tmp_path)
    ref_recon = _import_reference()
    _patch_forwardmodel_init()
    ref_recon(
        fname='mdr.h5', save_path=str(tmp_path), output_folder=f'ref{tag}',
        obj_size=(n, n, 1), two_d_mode=True, probe_pos=pos,
        energy_ev=17500.0, psize_cm=1e-5, free_prop_cm=list(dists),
        safe_zone_width=0,
        n_epochs=4, minibatch_size=1, n_dp_batch=1,
        optimizer='adam', learning_rate=1e-3,
        unknown_type='real_imag', raw_data_type='intensity',
        initial_guess=[obj0_r, obj0_i],
        probe_type='plane',
        alpha_d=None, alpha_b=None, gamma=0,
        use_checkpoint=False, store_checkpoint=False,
        save_intermediate=False, backend='pytorch', cpu_only=True,
        dynamic_rate=False, **ref_extra)
    csv = os.path.join(str(tmp_path), f'ref{tag}', 'convergence',
                       'loss_rank_0.txt')
    ref = np.atleast_1d(np.genfromtxt(csv, delimiter=',',
                                      names=True)['loss'])
    cfg = dataclasses.replace(cfg, refine=RefineConfig(**our_refine))
    obj0 = np.stack([obj0_r * np.cos(obj0_i),
                     obj0_r * np.sin(obj0_i)], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=data ** 2, probe_pos=pos,
                        probe_init=probe, obj_init=obj0, model=multidist)
    ours = []
    for ep in range(4):
        rec.i_opt_batch = 0
        ours.append(rec.run_epoch(ep))
    return ref, np.asarray(ours)


def test_free_prop_refinement_parity(tmp_path):
    """Refinable propagation distances (``optimize_free_prop``,
    ``adorym/ptychography.py:722-723``): gradients flow into the
    per-distance Fresnel kernels, default Adam at 1e-2."""
    ref, ours = _run_multidist_pair(
        tmp_path,
        dict(optimize_free_prop=True, free_prop_learning_rate=1e-2),
        dict(optimize_free_prop=True, free_prop_learning_rate=1e-2),
        'fp')
    assert len(ref) == len(ours)
    np.testing.assert_allclose(ours, ref, rtol=5e-4)


def test_prj_affine_refinement_parity(tmp_path):
    """Refinable per-distance affines on the measured data
    (``optimize_prj_affine``; distance 0 pinned to identity)."""
    ref, ours = _run_multidist_pair(
        tmp_path,
        dict(optimize_prj_affine=True, prj_affine_learning_rate=1e-4),
        dict(optimize_prj_affine=True, prj_affine_learning_rate=1e-4),
        'aff')
    assert len(ref) == len(ours)
    np.testing.assert_allclose(ours, ref, rtol=5e-4)


def test_baseline1_64cube_parity(tmp_path, monkeypatch):
    """BASELINE #1 scale: the reference CI config — 64^3 adhesin multislice
    tomography with its real trimmings (plane probe, finite-support mask,
    reweighted L1 at alpha_d=1e-9*64^3) — loss curves match the actual
    reference (``/root/reference/tests/test_multislice_tomography_64.py:
    18-69``) at rtol 5e-4 (bounded by the reference's float16 rotation
    lookup tables)."""
    monkeypatch.chdir(tmp_path)  # reference writes lookup tables to CWD
    from adorym_tpu.config import (Geometry, LossConfig, ReconConfig,
                                   TrainConfig)
    from adorym_tpu.io.data import RawDataset
    from adorym_tpu.io.output import read_tiff
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate_to_file

    n = 64
    n_theta, n_epochs, lr = 6, 2, 1e-7
    alpha_d, alpha_b = 1e-9 * n ** 3, 1e-10 * n ** 3
    delta = np.load(f'{REFERENCE}/demos/adhesin/phantom/grid_delta.npy')
    beta = np.load(f'{REFERENCE}/demos/adhesin/phantom/grid_beta.npy')
    obj_true = np.stack([delta, beta], -1).astype(np.float32)
    mask_path = f'{REFERENCE}/demos/adhesin/fin_sup_mask/mask.tiff'
    mask_arr = read_tiff(mask_path)
    probe = np.stack([np.ones((n, n)), np.zeros((n, n))], -1
                     ).astype(np.float32)[None]
    pos = np.array([[0.0, 0.0]])
    theta_ls = np.linspace(0, 2 * np.pi, n_theta, endpoint=False)

    geo = Geometry(obj_size=(n, n, n), probe_size=(n, n),
                   energy_ev=800.0, psize_cm=0.67e-7, free_prop_cm=0.0)
    cfg_sim = ReconConfig(geometry=geo, train=TrainConfig(minibatch_size=1))
    simulate_to_file(str(tmp_path / 'd64.h5'), cfg_sim, obj_true, probe,
                     pos, theta_ls=theta_ls)

    rng = np.random.default_rng(3)
    obj0_d = (rng.random((n, n, n)) * 1e-4).astype(np.float64)
    obj0_b = (rng.random((n, n, n)) * 1e-6).astype(np.float64)

    ref_recon = _import_reference()
    # The reference quantizes its rotation lookup tables to float16 on
    # disk (``adorym/util.py:515-516``), a ~0.03 px coordinate error at 64
    # scale that bounds as-shipped agreement to ~1e-3 on this sharp
    # phantom (measured).  Regenerate the tables at float32 through the
    # reference's OWN coordinate math so the comparison isolates the
    # physics, not that storage cast.
    _patch_f32_rotation_tables(monkeypatch)
    ref_recon(
        fname='d64.h5', save_path=str(tmp_path), output_folder='ref64',
        obj_size=(n, n, n), probe_pos=pos, theta_st=0, theta_end=2 * np.pi,
        energy_ev=800.0, psize_cm=0.67e-7, free_prop_cm=0.0,
        n_epochs=n_epochs, minibatch_size=1, n_dp_batch=1, binning=1,
        optimizer='adam', learning_rate=lr, dynamic_rate=False,
        initial_guess=[obj0_d, obj0_b],
        probe_type='plane',
        alpha_d=alpha_d, alpha_b=alpha_b, reweighted_l1=True, gamma=0,
        finite_support_mask_path=mask_path,
        use_checkpoint=False, store_checkpoint=False,
        save_intermediate=False, backend='pytorch', cpu_only=True,
        precalculate_rotation_coords=True,
    )
    csv = os.path.join(str(tmp_path), 'ref64', 'convergence',
                       'loss_rank_0.txt')
    ref = np.atleast_1d(np.genfromtxt(csv, delimiter=',',
                                      names=True)['loss'])

    cfg = ReconConfig(
        geometry=geo,
        loss=LossConfig(alpha_d=alpha_d, alpha_b=alpha_b,
                        reweighted_l1=True),
        train=TrainConfig(minibatch_size=1, learning_rate=lr,
                          optimizer='adam'))
    ds = RawDataset(str(tmp_path / 'd64.h5'))
    obj0 = np.stack([obj0_d, obj0_b], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=ds.all_magnitudes(), probe_pos=pos,
                        probe_init=probe, obj_init=obj0, theta_ls=theta_ls,
                        # Raw mask array, used exactly as the reference
                        # does (elementwise against obj[..., c]).
                        finite_support_mask=mask_arr)

    def batches_like_reference(_):
        order = np.arange(n_theta)
        np.random.seed(rec._epoch_seed)
        np.random.shuffle(order)
        return [(int(t), np.array([0])) for t in order]

    rec.make_batches = batches_like_reference
    ours = []
    for ep in range(n_epochs):
        rec._epoch_seed = ep
        rec.i_opt_batch = 0  # reference epoch-counter-reset quirk
        rec.run_epoch(ep, callback=lambda e, b, l: ours.append(l))
    assert len(ref) == len(ours)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4)


def test_nearest_interpolation_parity(tmp_path, monkeypatch):
    """LIVE parity for ``interpolation='nearest'`` (the reference's
    alternative rotation resampling: torch grid_sample mode='nearest' /
    round-and-clip index select, ``adorym/util.py:568-583`` — round-half-
    even via torch.round, the same convention as ``jnp.round``; both
    reference code paths verified to match our rotation EXACTLY on f32
    coords).

    Two quirks shape this row: (1) the reference's ``interpolation``
    kwarg never reaches the IN-AD forward rotation —
    ``adorym/forward_model.py:268`` calls ``apply_rotation`` without it,
    so non-rol runs rotate bilinearly regardless (measured: 4e-2 loss
    divergence when asserting nearest against a non-rol reference run);
    parity is therefore asserted under ``rotate_out_of_loop=True``,
    where both the pre-rotation (``ptychography.py:938``) and the
    gradient rotate-back (``:1076``) honor nearest.  (2) The f16
    coordinate tables would make the DISCONTINUOUS rounding flip voxels,
    so the tables are regenerated at f32 through the reference's own
    math (``_patch_f32_rotation_tables``)."""
    monkeypatch.chdir(tmp_path)
    from adorym_tpu.config import Geometry, ReconConfig, TrainConfig
    from adorym_tpu.io.data import RawDataset
    from adorym_tpu.recon import Reconstructor
    from adorym_tpu.simulate import simulate_to_file

    ref_recon = _import_reference()
    _patch_f32_rotation_tables(monkeypatch)
    n, pn, n_theta = 16, 16, 3
    rng = np.random.default_rng(17)
    obj_true = np.stack([rng.random((n, n, n)) * 1e-3,
                         rng.random((n, n, n)) * 3e-5], -1).astype(np.float32)
    probe = np.stack([np.ones((pn, pn)), np.zeros((pn, pn))], -1
                     ).astype(np.float32)[None]
    pos = np.array([[0.0, 0.0]])
    theta_ls = np.linspace(0, np.pi, n_theta, endpoint=False)

    cfg = ReconConfig(
        geometry=Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                          energy_ev=800.0, psize_cm=0.67e-7,
                          free_prop_cm='inf'),
        train=TrainConfig(minibatch_size=1, learning_rate=1e-6,
                          optimizer='gd', interpolation='nearest',
                          update_scheme='per angle',
                          rotate_out_of_loop=True))
    simulate_to_file(str(tmp_path / 'dn.h5'), cfg, obj_true, probe, pos,
                     theta_ls=theta_ls)

    obj0_d = (rng.random((n, n, n)) * 1e-4).astype(np.float64)
    obj0_b = (rng.random((n, n, n)) * 1e-6).astype(np.float64)

    ref_recon(
        fname='dn.h5', save_path=str(tmp_path), output_folder='refnn',
        obj_size=(n, n, n), probe_pos=pos, theta_st=0, theta_end=np.pi,
        energy_ev=800.0, psize_cm=0.67e-7, free_prop_cm='inf',
        n_epochs=3, minibatch_size=1, n_dp_batch=1,
        optimizer='gd', learning_rate=1e-6, dynamic_rate=False,
        initial_guess=[obj0_d, obj0_b],
        probe_type='supplied',
        probe_initial=[np.ones((pn, pn)), np.zeros((pn, pn))],
        alpha_d=None, alpha_b=None, gamma=0,
        use_checkpoint=False, store_checkpoint=False,
        save_intermediate=False, backend='pytorch', cpu_only=True,
        precalculate_rotation_coords=True, interpolation='nearest',
        rotate_out_of_loop=True, update_scheme='per angle',
    )
    csv = os.path.join(str(tmp_path), 'refnn', 'convergence',
                       'loss_rank_0.txt')
    rows = np.genfromtxt(csv, delimiter=',', names=True)
    ref_losses = np.atleast_1d(rows['loss'])

    ds = RawDataset(str(tmp_path / 'dn.h5'))
    obj0 = np.stack([obj0_d, obj0_b], -1).astype(np.float32)
    rec = Reconstructor(cfg, data=ds.all_magnitudes(), probe_pos=pos,
                        probe_init=probe, obj_init=obj0, theta_ls=theta_ls)

    def batches_like_reference(_):
        order = np.arange(n_theta)
        np.random.seed(rec._epoch_seed)
        np.random.shuffle(order)
        return [(int(t), np.array([0])) for t in order]

    rec.make_batches = batches_like_reference
    our_losses = []
    for ep in range(3):
        rec._epoch_seed = ep
        rec.run_epoch(ep, callback=lambda e, b, l: our_losses.append(l))
    np.testing.assert_allclose(np.asarray(our_losses), ref_losses,
                               rtol=5e-4)
