#!/usr/bin/env python
"""Convert a CSV of complex values ``(re+imj)`` into magnitude/phase TIFFs.

Port of the reference ``tools/convert_csv_to_tiff.py`` (complex-number
text dumps, e.g. from beamline analysis notebooks).
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def convert(path):
    from adorym_tpu.io.output import write_tiff
    rows = []
    with open(path) as f:
        for line in f:
            vals = re.findall(
                r'(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)\s*([+-]\s*\d+(?:\.\d+)?'
                r'(?:[eE][+-]?\d+)?)j', line.replace(' ', ''))
            if not vals:
                continue
            rows.append(np.array([float(r) + 1j * float(i.replace(' ', ''))
                                  for r, i in vals]))
    arr = np.stack(rows)
    base = os.path.splitext(path)[0]
    return (write_tiff(np.abs(arr), base + '_mag'),
            write_tiff(np.angle(arr), base + '_phase'))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('filename')
    args = p.parse_args(argv)
    print('wrote:', convert(args.filename))


if __name__ == '__main__':
    main()
