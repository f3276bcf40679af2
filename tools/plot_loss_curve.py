#!/usr/bin/env python
"""Plot (or print) the convergence curve from an output folder's loss CSVs
(reference: ``tools/plot_loss_curve.py`` + ``adorym/visualization.py``)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('output_folder')
    p.add_argument('--save', help='write a PNG instead of printing')
    p.add_argument('--platform', choices=['tpu', 'cpu'], default=None,
                   help='force a JAX backend (cpu = run without the '
                        'accelerator, e.g. for data prep)')
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update('jax_platforms',
                          'axon' if args.platform == 'tpu' else 'cpu')

    from adorym_tpu.io.output import parse_loss_data
    curve = parse_loss_data(args.output_folder)
    if args.save:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        plt.semilogy(curve)
        plt.xlabel('batch')
        plt.ylabel('loss')
        plt.savefig(args.save, dpi=120)
        print(f'wrote {args.save}')
    else:
        for i, v in enumerate(curve):
            print(i, v)


if __name__ == '__main__':
    main()
