"""The BASELINE-config demos run end-to-end (CI-size epoch counts) and
recover their phantoms.  Each demo self-simulates its dataset when absent."""

import importlib.util
import os

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
DEMOS = os.path.join(HERE, '..', 'demos')


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(DEMOS, name + '.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_siemens_star_demo(tmp_path):
    """BASELINE config #2: 5 probe modes, intensity data, probe opt +
    position refinement (reference demos/2d_ptychography_experimental_data)."""
    m = _load('2d_ptychography_experimental_data')
    m.DATA_DIR = str(tmp_path)
    m.DATA = str(tmp_path / 'data.h5')
    corr = m.main(n_epochs=30, output_folder='recon_ci')
    assert corr > 0.45, corr


def test_multidist_affine_demo(tmp_path):
    """BASELINE config #4: multi-distance holography with affine + free-prop
    refinement (reference demos/2d_multidist_holography_w_affine)."""
    m = _load('2d_multidist_holography_w_affine')
    m.DATA_DIR = str(tmp_path)
    m.DATA = str(tmp_path / 'data_nonoise.h5')
    corr = m.main(n_epochs=150, output_folder='recon_ci')
    assert corr > 0.6, corr


def test_probe_optimization_demo(tmp_path):
    """Reference demos/2d_ptychography_w_probe_optimization: ifft-probe
    retrieval + phase-only object + off-edge scan grid."""
    m = _load('2d_ptychography_w_probe_optimization')
    m.DATA_DIR = str(tmp_path)
    m.DATA = str(tmp_path / 'data.h5')
    corr, probe_corr = m.main(n_epochs=400, output_folder='recon_ci')
    assert corr > 0.9, corr
    assert probe_corr > 0.9, probe_corr


def test_multidist_position_correction_demo(tmp_path):
    """Reference demos/2d_multidist_holography_w_position_correction:
    per-distance registration-shift refinement on misregistered frames."""
    m = _load('2d_multidist_holography_w_position_correction')
    m.DATA_DIR = str(tmp_path)
    m.DATA = str(tmp_path / 'data_shift.h5')
    corr = m.main(n_epochs=150, output_folder='recon_ci')
    assert corr > 0.85, corr


def test_position_correction_demo(tmp_path):
    """BASELINE config #3 (already shipped in round 1): cameraman with
    probe-position-error refinement — keep it covered too."""
    m = _load('2d_ptychography_position_correction')
    m.DATA = str(tmp_path / 'data_cameraman_err.h5')
    # The demo's main() runs its own assertions via printed residuals; just
    # exercise it end-to-end with its self-simulated data.
    m.main()


def test_multislice_tomography_64_demo(tmp_path):
    """BASELINE config #1 (the reference CI test): 64^3 adhesin-style
    multislice tomography with reweighted L1, CI-size epoch count."""
    m = _load('multislice_tomography_64')
    corr = m.main(n_epochs=10, n_theta=12,
                  output_folder='recon_ci',
                  data=str(tmp_path / 'd64.h5'))
    # Measured 0.34 at this CI size (0.46 at the full 36 angles); the
    # reference-CI reweighted-L1 weight bounds late-epoch progress.
    assert corr > 0.25, corr


def test_multislice_ptycho_256_demo_scaled(tmp_path):
    """BASELINE config #5 (the flagship) at CI scale (scale 4 -> 64^3,
    24^2 probe): same code path — angle-fused per-angle updates,
    rotate_out_of_loop, binning, grid scan table."""
    m = _load('multislice_ptycho_256_theta')
    corr = m.main(n_theta=8, n_epochs=12, scale=4,
                  data=str(tmp_path / 'cone.h5'),
                  output_folder='recon_ci')
    # Measured 0.35 at this CI size with the flagship's lr (1e-7 —
    # deliberately unchanged; the point is the code path, loss decreases
    # monotonically throughout).
    assert corr > 0.3, corr
