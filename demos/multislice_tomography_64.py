#!/usr/bin/env python
"""64^3 full-field multislice tomography — the reference CI config
(``tests/test_multislice_tomography_64.py``): plane probe, free_prop_cm=0,
reweighted L1, finite support, Adam.

Self-simulates an adhesin-like blob phantom if the data file is absent.
Measured on the CPU mesh (36 angles, 10 epochs): phantom delta
correlation 0.46.  Note the reference CI config's reweighted-L1 weight
(alpha_d = 1e-9 * 64^3) dominates late-epoch dynamics — the TOTAL loss
can rise while the phantom correlation still improves.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

N = 64
HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, 'adhesin', 'data_adhesin_64_theta_36.h5')


def make_phantom():
    rng = np.random.default_rng(0)
    zz, yy, xx = np.mgrid[:N, :N, :N].astype(np.float32)
    vol = np.zeros((N, N, N), np.float32)
    for _ in range(6):
        c = rng.uniform(0.3 * N, 0.7 * N, 3)
        r = rng.uniform(0.06 * N, 0.16 * N)
        vol += np.exp(-(((zz - c[0]) ** 2 + (yy - c[1]) ** 2
                         + (xx - c[2]) ** 2) / (2 * r ** 2)))
    vol /= vol.max()
    return np.stack([vol * 1e-3, vol * 3e-5], -1).astype(np.float32)


def main(n_epochs=10, n_theta=36, output_folder='recon_tomo64', data=None):
    from adorym_tpu import (Geometry, ReconConfig, TrainConfig,
                            reconstruct_ptychography, simulate_to_file)
    from adorym_tpu.utils.initialize import initialize_probe

    data = data or DATA
    phantom = make_phantom()
    if not os.path.exists(data):
        print('simulating dataset ...')
        cfg = ReconConfig(
            geometry=Geometry(obj_size=(N, N, N), probe_size=(N, N),
                              energy_ev=800.0, psize_cm=0.67e-7,
                              free_prop_cm=None),
            train=TrainConfig(minibatch_size=1))
        probe = initialize_probe((N, N), 'plane')
        theta = np.linspace(0, 2 * np.pi, n_theta, endpoint=False)
        simulate_to_file(data, cfg, phantom, probe,
                         np.array([[0.0, 0.0]]), theta_ls=theta)

    results = reconstruct_ptychography(
        fname=os.path.basename(data),
        save_path=os.path.dirname(data),
        output_folder=output_folder,
        obj_size=(N, N, N),
        n_epochs=n_epochs,
        learning_rate=5e-6,
        alpha_d=1e-9 * N ** 3,
        alpha_b=1e-10 * N ** 3,
        reweighted_l1=True,
        energy_ev=800,
        psize_cm=0.67e-7,
        minibatch_size=1,
        free_prop_cm=0,
        probe_type='plane',
        probe_pos=[(0, 0)],
        optimizer='adam',
        use_checkpoint=False,
    )
    print('loss history:', results['loss_history'])
    corr = np.corrcoef(results['obj'][..., 0].ravel(),
                       phantom[..., 0].ravel())[0, 1]
    print(f'phantom delta correlation: {corr:.4f}')
    return corr


if __name__ == '__main__':
    main()
