#!/usr/bin/env python
"""Convert an APS 2-ID-D ptychography HDF5 into the Adorym data layout.

Port of the reference ``tools/convert_aps_2idd_to_adorym.py``: reads the
beamline file's ``dp`` (diffraction patterns), ``lambda`` (wavelength, m),
``dx`` (pixel size, m), ``ppX``/``ppY`` (probe positions, m) and writes
``exchange/data`` + ``metadata/*`` (positions converted to pixels, shifted
non-negative).  This makes the Siemens-star BASELINE config reproducible
from raw beamline data.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def convert(src_path, out_path, free_prop_cm=175.0, detector_psize_cm=75e-4):
    import h5py
    with h5py.File(src_path, 'r') as f_old, h5py.File(out_path, 'w') as f_new:
        dp = f_old['dp'][...]
        n_pos = dp.shape[0]
        f_new.create_dataset('exchange/data',
                             data=dp[None].astype(np.float32))
        lmbda_nm = float(np.ravel(f_old['lambda'][...])[0]) * 1e9
        energy_ev = 1240.0 / lmbda_nm
        f_new.create_dataset('metadata/energy_ev', data=energy_ev)
        psize_cm = float(np.ravel(f_old['dx'][...])[0]) * 1e2
        f_new.create_dataset('metadata/psize_cm', data=psize_cm)
        f_new.create_dataset('metadata/free_prop_cm', data=free_prop_cm)
        pos = np.stack([np.ravel(f_old['ppY'][...]),
                        np.ravel(f_old['ppX'][...])], axis=1) * 1e2 / psize_cm
        pos -= pos.min(axis=0)
        f_new.create_dataset('metadata/probe_pos_px', data=pos)
    return dict(n_pos=n_pos, energy_ev=energy_ev, psize_cm=psize_cm,
                probe_size=dp.shape[1:])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('filename')
    p.add_argument('--output', default='data.h5')
    p.add_argument('--free_prop_cm', type=float, default=175.0)
    p.add_argument('--detector_psize_cm', type=float, default=75e-4)
    args = p.parse_args(argv)
    info = convert(args.filename, args.output, args.free_prop_cm,
                   args.detector_psize_cm)
    print(f'wrote {args.output}: {info}')


if __name__ == '__main__':
    main()
