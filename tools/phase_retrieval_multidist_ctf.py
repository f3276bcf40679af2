#!/usr/bin/env python
"""Standalone multi-distance CTF phase retrieval from an Adorym-layout HDF5
(reference: ``tools/phase_retrieval_multidist_ctf.py`` ->
``multidistance_ctf_wrapped``)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('data_file')
    p.add_argument('--out', required=True)
    p.add_argument('--free-prop-cm', nargs='+', type=float, required=True)
    p.add_argument('--energy-ev', type=float)
    p.add_argument('--psize-cm', type=float)
    p.add_argument('--kappa', type=float, default=50.0)
    p.add_argument('--safe-zone-width', type=int, default=0)
    p.add_argument('--i-theta', type=int, default=0)
    p.add_argument('--platform', choices=['tpu', 'cpu'], default=None,
                   help='force a JAX backend (cpu = run without the '
                        'accelerator, e.g. for data prep)')
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update('jax_platforms',
                          'axon' if args.platform == 'tpu' else 'cpu')

    from adorym_tpu.conventional import multidistance_ctf
    from adorym_tpu.io.data import RawDataset
    from adorym_tpu.io.output import write_tiff

    ds = RawDataset(args.data_file)
    mags = ds.all_magnitudes()[args.i_theta]
    n_dists = len(args.free_prop_cm)
    assert mags.shape[0] % n_dists == 0
    # one block per distance (full-field layout)
    prj = mags[::mags.shape[0] // n_dists] ** 2
    phase = multidistance_ctf(prj, np.asarray(args.free_prop_cm),
                              ds.energy_ev(args.energy_ev),
                              ds.psize_cm(args.psize_cm),
                              kappa=args.kappa,
                              safe_zone_width=args.safe_zone_width)
    path = write_tiff(np.asarray(phase), args.out)
    print(f'wrote {path}')


if __name__ == '__main__':
    main()
