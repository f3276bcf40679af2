#!/usr/bin/env python
"""256^3 cone multislice ptychotomography — the flagship config
(reference ``demos/multislice_ptycho_256_theta.py``: 500 angles, 23x23
positions/angle, 72^2 probe, Fraunhofer, binning 8).

Self-simulates a cone phantom at reduced angle count if no data file is
present (the full 500-angle set is large); pass --n-theta to scale.
Measured on a TPU v5e (30 angles, 5 epochs): epoch-mean loss
0.593 -> 0.392, ~31 s/epoch steady state of which ~10 s is the
per-epoch intermediate-TIFF device->host fetch on the remote tunnel
(pure compute runs ~4700-5300 patterns/s).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

N, PN, MB, BIN = 256, 72, 23, 8
HERE = os.path.dirname(os.path.abspath(__file__))


def cone_phantom(n=N):
    s = n / N
    zz, yy, xx = np.mgrid[:n, :n, :n].astype(np.float32)
    c = (n - 1) / 2
    r = np.sqrt((yy - c) ** 2 + (xx - c) ** 2)
    cone = ((r < (zz + 20 * s) * 0.3) & (zz > 30 * s)
            & (zz < 220 * s)).astype(np.float32)
    from scipy.ndimage import gaussian_filter
    cone = gaussian_filter(cone, max(1.0, 2 * s))
    return np.stack([cone * 1e-4, cone * 3e-6], -1).astype(np.float32)


def geometry(scale=1):
    """Flagship geometry, optionally shrunk by ``scale`` (CI runs the same
    code path — angle-fused per-angle updates, binning, grid scan — at
    scale 4 on the CPU mesh)."""
    n = N // scale
    pn = PN // scale if scale == 1 else 24
    grid = (n - pn) // 8 + 1
    xs = np.arange(grid) * 8 + (n - (grid - 1) * 8 - pn) // 2
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(float)
    return n, pn, grid, pos


def main(n_theta=20, n_epochs=2, data=None, scale=1,
         output_folder='recon_cone256'):
    from adorym_tpu import (Geometry, ReconConfig, TrainConfig,
                            reconstruct_ptychography, simulate_to_file)
    from adorym_tpu.utils.initialize import initialize_probe

    n, pn, grid, pos = geometry(scale)
    mb = grid  # one grid row per minibatch (the fast-path decomposition)
    binning = BIN if scale == 1 else 4
    data = data or os.path.join(HERE, 'cone_256', f'data_cone_{n}.h5')
    phantom = cone_phantom(n)
    sigma = 12 / scale
    if not os.path.exists(data):
        print('simulating dataset ...')
        cfg = ReconConfig(
            geometry=Geometry(obj_size=(n, n, n), probe_size=(pn, pn),
                              energy_ev=5000.0, psize_cm=1e-7,
                              free_prop_cm='inf', binning=binning),
            train=TrainConfig(minibatch_size=mb))
        probe = initialize_probe((pn, pn), 'gaussian', energy_ev=5000.0,
                                 psize_cm=1e-7, probe_mag_sigma=sigma,
                                 probe_phase_sigma=sigma,
                                 probe_phase_max=0.4)
        theta = np.linspace(0, 2 * np.pi, n_theta, endpoint=False)
        simulate_to_file(data, cfg, phantom, probe, pos,
                         theta_ls=theta, minibatch_size=mb * 4)

    results = reconstruct_ptychography(
        fname=os.path.basename(data),
        save_path=os.path.dirname(data),
        output_folder=output_folder,
        obj_size=(n, n, n),
        n_epochs=n_epochs,
        learning_rate=1e-7,
        energy_ev=5000.0, psize_cm=1e-7,
        minibatch_size=mb, binning=binning,
        free_prop_cm='inf',
        probe_type='gaussian', probe_mag_sigma=sigma,
        probe_phase_sigma=sigma, probe_phase_max=0.4,
        optimizer='adam',
        rotate_out_of_loop=True, update_scheme='per angle',
        use_checkpoint=False,
        # The reference's default cadence (10 batches) checkpoints every
        # angle here; a checkpoint moves ~0.5 GB device->host, which on a
        # remote-tunnel link (measured 14 MB/s D2H) dominates the epoch.
        n_batch_per_checkpoint=mb * 30,
    )
    print('loss history:', results['loss_history'])
    corr = np.corrcoef(results['obj'][..., 0].ravel(),
                       phantom[..., 0].ravel())[0, 1]
    print(f'phantom delta correlation: {corr:.4f}')
    return corr


if __name__ == '__main__':
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--n-theta', type=int, default=20)
    p.add_argument('--n-epochs', type=int, default=2)
    p.add_argument('--scale', type=int, default=1,
                   help='shrink the geometry by this factor (CI: 4)')
    p.add_argument('--data', default=None)
    args = p.parse_args()
    main(n_theta=args.n_theta, n_epochs=args.n_epochs, data=args.data,
         scale=args.scale)
