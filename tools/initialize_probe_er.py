#!/usr/bin/env python
"""Retrieve an initial probe from averaged far-field data by error reduction.

Port of the reference ``tools/initialize_probe_er.py``: averages the
diffraction patterns of one angle, then iterates Fienup error reduction
with a disk finite-support mask (magnitudes outside the support damped by
``beta``).  Writes probe magnitude/phase TIFFs usable as
``probe_type='supplied'`` input.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def retrieve_probe(mean_dp_mag, mask_radius, n_epochs=100, beta=0.8,
                   seed=0):
    """``mean_dp_mag``: [py, px] mean detected magnitude.  Returns the
    complex probe."""
    import jax
    import jax.numpy as jnp

    shape = mean_dp_mag.shape
    yy, xx = np.mgrid[:shape[0], :shape[1]]
    c = ((shape[0] - 1) / 2, (shape[1] - 1) / 2)
    mask = ((yy - c[0]) ** 2 + (xx - c[1]) ** 2
            <= mask_radius ** 2).astype(np.float32)
    beta_mask = mask + (-beta) * (1 - mask)

    rng = np.random.default_rng(seed)
    probe0 = (rng.normal(1, 0.1, shape)
              + np.exp(1j * rng.normal(0, 0.1, shape))) * mask

    @jax.jit
    def er_epoch(pr, pi, img, mask, beta_mask):
        probe = pr + 1j * pi
        F = jnp.fft.fftshift(jnp.fft.fft2(probe))
        mse = jnp.mean((jnp.abs(F) - img) ** 2)
        F = F / jnp.maximum(jnp.abs(F), 1e-12) * img
        f_jp = jnp.fft.ifft2(jnp.fft.ifftshift(F))
        probe = (1 - mask) * probe + beta_mask * f_jp
        return jnp.real(probe), jnp.imag(probe), mse

    pr = np.real(probe0).astype(np.float32)
    pi = np.imag(probe0).astype(np.float32)
    img = np.asarray(mean_dp_mag, np.float32)
    mse = None
    for _ in range(n_epochs):
        pr, pi, mse = er_epoch(pr, pi, img, mask, beta_mask)
    return np.asarray(pr) + 1j * np.asarray(pi), float(mse)


def main(argv=None):
    import h5py
    from adorym_tpu.io.output import write_tiff
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('fname', help='Adorym-layout HDF5')
    p.add_argument('--n_epochs', type=int, default=100)
    p.add_argument('--beta', type=float, default=0.8)
    p.add_argument('--mask_radius', type=int, default=64)
    p.add_argument('--normalize', action='store_true')
    p.add_argument('--raw_data_type', default='intensity')
    p.add_argument('--out_prefix', default='guessed_probe')
    args = p.parse_args(argv)
    with h5py.File(args.fname, 'r') as f:
        img = np.mean(np.abs(f['exchange/data'][0]), axis=0)
    if args.raw_data_type == 'intensity':
        img = np.sqrt(img)
    if args.normalize:
        img = img / np.sqrt(img.size)
    probe, mse = retrieve_probe(img, args.mask_radius, args.n_epochs,
                                args.beta)
    write_tiff(np.abs(probe), args.out_prefix + '_mag')
    write_tiff(np.angle(probe), args.out_prefix + '_phase')
    print(f'final MSE {mse:.4e}; wrote {args.out_prefix}_mag/phase.tiff')
    return probe


if __name__ == '__main__':
    main()
