#!/usr/bin/env python
"""Stitch per-rank object TIFFs (distributed-object z-slab outputs) into
full stacks.

Port of the reference ``tools/stitch_distributed_objects.py`` — this
framework writes single whole-object outputs, but reference runs in
``distribution_mode='distributed_object'`` leave ``*_rank_N`` slab files;
this tool concatenates them in rank order for migration.
"""

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def stitch(folder='.'):
    from adorym_tpu.io.output import read_tiff, write_tiff
    flist_raw = glob.glob(os.path.join(folder, '*.tif*'))
    names = (('delta', 'beta') if any('delta' in f or 'beta' in f
                                      for f in flist_raw)
             else ('mag', 'phase'))
    written = []
    for name in names:
        flist = [f for f in flist_raw if name in f and 'rank' in f]
        if not flist:
            continue
        ranks = [int(re.findall(r'\d+', os.path.basename(f))[-1])
                 for f in flist]
        stack = np.concatenate(
            [np.atleast_3d(read_tiff(f))
             for f in np.asarray(flist)[np.argsort(ranks)]], axis=0)
        written.append(write_tiff(
            stack, os.path.join(folder, f'{name}_stack')))
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('folder', nargs='?', default='.')
    args = p.parse_args(argv)
    out = stitch(args.folder)
    print('wrote:', out)


if __name__ == '__main__':
    main()
