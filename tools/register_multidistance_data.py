#!/usr/bin/env python
"""Register multi-distance hologram TIFFs against a reference distance.

Port of the reference ``tools/register_multidistance_data.py``: for each
angle, every distance's image is shifted onto the reference distance's
image using upsampled-DFT phase correlation (shifts measured at theta 0 and
reused, as upstream does).  Writes ``<dir>_registered/``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def register_folder(src_dir, prefix='data', i_ref=0, upsample=10):
    from adorym_tpu.io.data import parse_source_folder
    from adorym_tpu.io.output import read_tiff, write_tiff
    from adorym_tpu.metrics import register_translation
    from adorym_tpu.ops.fourier import fourier_shift

    import jax.numpy as jnp
    flist, n_theta, n_dists, shape = parse_source_folder(src_dir, prefix)
    out_dir = os.path.join(os.path.dirname(src_dir.rstrip('/')),
                           os.path.basename(src_dir.rstrip('/')) + '_registered')
    os.makedirs(out_dir, exist_ok=True)
    shifts = [np.zeros(2)] * n_dists
    for i_theta in range(n_theta):
        ref_img = np.squeeze(read_tiff(flist[i_theta * n_dists + i_ref]))
        for i_dist in range(n_dists):
            fname = flist[i_theta * n_dists + i_dist]
            img = np.squeeze(read_tiff(fname))
            if i_dist != i_ref:
                if i_theta == 0:
                    shifts[i_dist] = np.asarray(register_translation(
                        ref_img, img, upsample_factor=upsample))
                img = np.real(np.asarray(fourier_shift(
                    jnp.asarray(img, jnp.complex64),
                    jnp.asarray(shifts[i_dist], jnp.float32))))
            write_tiff(img, os.path.join(out_dir, os.path.basename(fname)))
    return out_dir, shifts


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('dir')
    p.add_argument('prefix', nargs='?', default='data')
    p.add_argument('--ref', type=int, default=0)
    args = p.parse_args(argv)
    out_dir, shifts = register_folder(args.dir, args.prefix, args.ref)
    print(f'wrote {out_dir}; shifts: {[list(np.round(s, 2)) for s in shifts]}')


if __name__ == '__main__':
    main()
