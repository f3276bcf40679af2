"""adorym_tpu — TPU-native automatic-differentiation imaging reconstruction.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Adorym
(mdw771/adorym): 2D/3D ptychography, full-field CDI, multi-distance
near-field holography, line-projection tomography, and multislice
ptychotomography, with joint refinement of probe, positions, tilts, and
propagation geometry — designed for SPMD execution over TPU device meshes.
"""

__version__ = '0.1.0'

from .config import (Geometry, IOConfig, LossConfig, ParallelConfig,
                     ReconConfig, RefineConfig, TrainConfig)  # noqa: F401
from .api import reconstruct_ptychography  # noqa: F401
from .models.regularizers import (CorrRegularizer, GradCorrRegularizer,  # noqa: F401
                                  L1Regularizer, ReweightedL1Regularizer,
                                  TVRegularizer)
from .recon import Reconstructor  # noqa: F401
from .simulate import simulate, simulate_to_file  # noqa: F401
