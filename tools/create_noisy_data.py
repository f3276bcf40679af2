#!/usr/bin/env python
"""Add Poisson (shot) noise to a simulated dataset at a given photon budget.

Port of the reference ``tools/create_noisy_data.py``: the clean intensities
are scaled so that the specified number of photons hits each sample pixel,
Poisson-sampled, and scaled back.  Reports the mean SNR.

  python create_noisy_data.py data_nonoise.h5 --n_ph_per_px 1e2 \
      --raw_data_type intensity --mode fullfield
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def add_poisson_noise(data, n_ph_per_px=1e2, raw_data_type='intensity',
                      mode='fullfield', n_sample_pixel=None, seed=None):
    """Return (noisy data, mean SNR).  ``data``: [n_theta, n_images, y, x].

    mode='fullfield': each image sees ``n_ph_per_px * n_pixels`` photons.
    mode='ptycho': the photon budget is over the scanned area, split across
    diffraction spots (reference far-field branch).
    """
    rng = np.random.default_rng(seed)
    data = np.asarray(data)
    inten = np.abs(data) if raw_data_type == 'intensity' else np.abs(data) ** 2
    if n_sample_pixel is None:
        n_sample_pixel = data.shape[-2] * data.shape[-1]
    if mode == 'ptycho':
        n_ex = n_ph_per_px * n_sample_pixel / data.shape[1]
    else:
        n_ex = n_ph_per_px * n_sample_pixel
    out = np.empty_like(inten)
    snrs = []
    for i in range(data.shape[0]):
        for j in range(data.shape[1]):
            frame = inten[i, j]
            mult = n_ex / max(frame.sum(), 1e-12)
            noisy = rng.poisson(frame * mult) / mult
            noise = noisy - frame
            snrs.append(np.var(frame) / max(np.var(noise), 1e-30))
            out[i, j] = noisy
    if raw_data_type == 'magnitude':
        out = np.sqrt(out)
    return out.astype(data.dtype if data.dtype.kind == 'f' else np.float32), \
        float(np.mean(snrs))


def main(argv=None):
    import h5py
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('filename')
    p.add_argument('--n_ph_per_px', type=float, default=1e2)
    p.add_argument('--raw_data_type', default='intensity',
                   choices=['intensity', 'magnitude'])
    p.add_argument('--mode', default='fullfield',
                   choices=['fullfield', 'ptycho'])
    p.add_argument('--output', default=None)
    p.add_argument('--seed', type=int, default=None)
    args = p.parse_args(argv)

    out_path = args.output or '{}_n{:.1e}.h5'.format(
        os.path.splitext(args.filename)[0], args.n_ph_per_px)
    with h5py.File(args.filename, 'r') as src, \
            h5py.File(out_path, 'w') as dst:
        data = np.abs(src['exchange/data'][...])
        noisy, snr = add_poisson_noise(
            data, args.n_ph_per_px, args.raw_data_type, args.mode,
            seed=args.seed)
        dst.create_dataset('exchange/data', data=noisy)
        if 'metadata' in src:
            for k in src['metadata']:
                dst.create_dataset(f'metadata/{k}', data=src['metadata'][k][...])
    print(f'wrote {out_path}; mean SNR = {snr:.2f}')
    return out_path


if __name__ == '__main__':
    main()
