#!/usr/bin/env python
"""Create a finite-support mask TIFF (sphere or cylinder) for an object of
the given size (reference: ``tools/create_support_mask.py``)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--out', required=True)
    p.add_argument('--obj-size', nargs=3, type=int, required=True)
    p.add_argument('--shape', choices=['sphere', 'cylinder'],
                   default='sphere')
    p.add_argument('--radius', type=float, required=True)
    p.add_argument('--platform', choices=['tpu', 'cpu'], default=None,
                   help='force a JAX backend (cpu = run without the '
                        'accelerator, e.g. for data prep)')
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update('jax_platforms',
                          'axon' if args.platform == 'tpu' else 'cpu')

    from adorym_tpu.io.output import write_tiff
    from adorym_tpu.ops.image import generate_disk, generate_sphere

    Y, X, Z = args.obj_size
    if args.shape == 'sphere':
        mask = generate_sphere((Y, X, Z), args.radius, anti_aliasing=2)
    else:
        disk = generate_disk((Y, X), args.radius)
        mask = np.repeat(disk[:, :, None], Z, axis=2)
    mask = (mask > 0.5).astype(np.float32)
    # z-major stack for TIFF (matches the reference's mask.tiff convention)
    path = write_tiff(np.moveaxis(mask, -1, 0), args.out)
    print(f'wrote {path}: support fraction {mask.mean():.3f}')


if __name__ == '__main__':
    main()
