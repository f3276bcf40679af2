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


def cone_phantom():
    zz, yy, xx = np.mgrid[:N, :N, :N].astype(np.float32)
    c = (N - 1) / 2
    r = np.sqrt((yy - c) ** 2 + (xx - c) ** 2)
    cone = ((r < (zz + 20) * 0.3) & (zz > 30) & (zz < 220)).astype(np.float32)
    from scipy.ndimage import gaussian_filter
    cone = gaussian_filter(cone, 2)
    return np.stack([cone * 1e-4, cone * 3e-6], -1).astype(np.float32)


def positions():
    xs = np.arange(23) * 8 + 4
    yy, xx = np.meshgrid(xs, xs, indexing='ij')
    return np.stack([yy.ravel(), xx.ravel()], -1).astype(float)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--n-theta', type=int, default=20)
    p.add_argument('--n-epochs', type=int, default=2)
    p.add_argument('--data', default=os.path.join(HERE, 'cone_256',
                                                  'data_cone_256.h5'))
    args = p.parse_args()

    from adorym_tpu import (Geometry, ReconConfig, TrainConfig,
                            reconstruct_ptychography, simulate_to_file)
    from adorym_tpu.utils.initialize import initialize_probe

    if not os.path.exists(args.data):
        print('simulating dataset ...')
        cfg = ReconConfig(
            geometry=Geometry(obj_size=(N, N, N), probe_size=(PN, PN),
                              energy_ev=5000.0, psize_cm=1e-7,
                              free_prop_cm='inf', binning=BIN),
            train=TrainConfig(minibatch_size=MB))
        probe = initialize_probe((PN, PN), 'gaussian', energy_ev=5000.0,
                                 psize_cm=1e-7, probe_mag_sigma=12,
                                 probe_phase_sigma=12, probe_phase_max=0.4)
        theta = np.linspace(0, 2 * np.pi, args.n_theta, endpoint=False)
        simulate_to_file(args.data, cfg, cone_phantom(), probe, positions(),
                         theta_ls=theta, minibatch_size=MB * 4)

    results = reconstruct_ptychography(
        fname=os.path.basename(args.data),
        save_path=os.path.dirname(args.data),
        output_folder='recon_cone256',
        obj_size=(N, N, N),
        n_epochs=args.n_epochs,
        learning_rate=1e-7,
        energy_ev=5000.0, psize_cm=1e-7,
        minibatch_size=MB, binning=BIN,
        free_prop_cm='inf',
        probe_type='gaussian', probe_mag_sigma=12, probe_phase_sigma=12,
        probe_phase_max=0.4,
        optimizer='adam',
        rotate_out_of_loop=True, update_scheme='per angle',
        use_checkpoint=False,
        # The reference's default cadence (10 batches) checkpoints every
        # angle here; a checkpoint moves ~0.5 GB device->host, which on a
        # remote-tunnel link (measured 14 MB/s D2H) dominates the epoch.
        n_batch_per_checkpoint=23 * 30,
    )
    print('loss history:', results['loss_history'])


if __name__ == '__main__':
    main()
