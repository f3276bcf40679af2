"""Typed configuration for reconstruction runs.

The reference's entire configuration surface is the ~120-kwarg signature of
``reconstruct_ptychography`` (``adorym/ptychography.py:54-174``) plus a
``locals()`` dict leaked into the forward models.  Here the same surface is
an explicit frozen dataclass; :func:`adorym_tpu.recon.reconstruct_ptychography`
maps the reference's kwarg names onto it for drop-in migration.

Everything in this file is *static* under jit — traced values (the object,
probe, refinable parameters, per-batch indices) live in pytrees instead.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple, Union


@dataclasses.dataclass(frozen=True)
class Geometry:
    """Beam/object geometry (reference kwargs: ``obj_size, energy_ev,
    psize_cm, free_prop_cm, binning, slice_pos_cm_ls`` ...)."""
    obj_size: Tuple[int, int, int]          # (y, x, z) voxels
    probe_size: Tuple[int, int]             # detector/probe pixels
    energy_ev: float = 5000.0
    psize_cm: float = 1e-7
    slice_spacing_cm: Optional[float] = None  # reference ``delta_cm``
    free_prop_cm: Union[str, float, Sequence[float], None] = 'inf'
    binning: int = 1
    fresnel_approx: bool = True
    sign_convention: int = 1
    two_d_mode: bool = False
    pure_projection: bool = False
    is_minus_logged: bool = False
    scale_ri_by_k: bool = True
    # Sparse multislice: explicit slice z positions (cm); None = regular grid.
    slice_pos_cm_ls: Optional[Tuple[float, ...]] = None
    # Multi-distance holography: number of propagation distances.
    n_dists: int = 1
    # Safe-zone width for near-field models (None = auto).
    safe_zone_width: Optional[int] = None

    @property
    def n_slices(self) -> int:
        return self.obj_size[2]


@dataclasses.dataclass(frozen=True)
class LossConfig:
    loss_function_type: str = 'lsq'         # 'lsq' | 'poisson'
    raw_data_type: str = 'magnitude'        # 'magnitude' | 'intensity'
    poisson_multiplier: float = 1.0
    normalize_fft: bool = False
    # Regularizer weights (0 disables), mirroring reference kwargs
    # ``alpha_d, alpha_b, gamma, reweighted_l1``:
    alpha_d: float = 0.0
    alpha_b: float = 0.0
    gamma: float = 0.0
    reweighted_l1: bool = False
    corr_reg: float = 0.0
    grad_corr_reg: float = 0.0


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    """Which auxiliary parameters are optimized, and their learning rates.

    One entry per refinable in the reference catalog (SURVEY §2.4;
    ``adorym/ptychography.py:144-155``).
    """
    optimize_probe: bool = False
    probe_learning_rate: float = 1e-3
    probe_optimizer: str = 'adam'
    probe_update_delay: int = 0             # global batches before updating
    probe_update_limit: Optional[int] = None
    optimize_probe_defocusing: bool = False
    probe_defocusing_learning_rate: float = 1e-5
    probe_defocusing_optimizer: str = 'adam'
    optimize_probe_pos_offset: bool = False
    probe_pos_offset_learning_rate: float = 1e-2
    probe_pos_offset_optimizer: str = 'adam'
    optimize_prj_pos_offset: bool = False
    prj_pos_offset_learning_rate: float = 1e-2
    prj_pos_offset_optimizer: str = 'adam'
    optimize_all_probe_pos: bool = False
    all_probe_pos_learning_rate: float = 1e-2
    all_probe_pos_optimizer: str = 'adam'
    optimize_slice_pos: bool = False
    slice_pos_learning_rate: float = 1e-4
    slice_pos_optimizer: str = 'adam'
    optimize_free_prop: bool = False
    free_prop_learning_rate: float = 1e-2
    free_prop_optimizer: str = 'adam'
    optimize_tilt: bool = False
    tilt_learning_rate: float = 1e-3
    tilt_optimizer: str = 'adam'
    # Reconstruct with KNOWN per-angle tilts without refining them: the
    # reference activates its 3-axis tilt-rotation branch whenever
    # ``initial_tilt is not None``, even with ``optimize_tilt=False``
    # (``adorym/forward_model.py:265-276``, init ``ptychography.py:681-682``).
    # Set by the api's ``initial_tilt`` kwarg; the tilt values live in the
    # ``tilt_ls`` param leaf (no optimizer spec -> never updated).
    fixed_tilt: bool = False
    optimize_prj_affine: bool = False
    prj_affine_learning_rate: float = 1e-3
    prj_affine_optimizer: str = 'adam'
    optimize_ctf_lg_kappa: bool = False
    ctf_lg_kappa_learning_rate: float = 1e-3
    ctf_lg_kappa_optimizer: str = 'adam'
    # Gate ALL auxiliary updates (everything but obj/probe) until this many
    # global batches have run (``adorym/optimizers.py:1037``).
    other_params_update_delay: int = 0

    @property
    def tilt_active(self) -> bool:
        """The 3-axis tilt rotation replaces the plain view rotation —
        tilt has precedence over ``rotate_out_of_loop``
        (``adorym/forward_model.py:265-276``)."""
        return self.optimize_tilt or self.fixed_tilt


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    n_epochs: Union[int, str] = 'auto'
    crit_conv_rate: float = 0.03
    max_nepochs: int = 200
    minibatch_size: int = 23
    # Shuffle scan positions within each angle (``adorym/ptychography.py:808``;
    # the reference processes spots sequentially unless set).
    randomize_probe_pos: bool = False
    learning_rate: float = 1e-5
    optimizer: str = 'adam'                  # adam | gd | momentum | cg | curveball
    optimize_object: bool = True
    update_scheme: str = 'immediate'         # 'immediate' | 'per angle'
    unknown_type: str = 'delta_beta'
    object_type: str = 'normal'              # normal | phase_only | absorption_only
    non_negativity: bool = False
    shrink_cycle: Optional[int] = None
    shrink_threshold: float = 1e-9
    multiscale_level: int = 1
    theta_downsample: Optional[int] = None
    n_batch_per_update: int = 1
    rotate_out_of_loop: bool = False
    n_probe_modes: int = 1
    shared_probe_among_angles: bool = True
    common_probe_pos: bool = True
    forward_algorithm: str = 'fresnel'       # 'fresnel' | 'ctf'
    ctf_kappa: float = 50.0
    # Precision: compute multislice in bf16 where safe (reference
    # ``run_bfloat16``, adorym/ptychography.py:166).
    run_bfloat16: bool = False
    # Fused Pallas multislice kernel: 'auto' (TPU only) | 'on' | 'off'.
    fused_multislice: str = 'auto'
    # Fold the object-to-detector (Fraunhofer / Fresnel TF) propagation
    # into the fused multislice kernel's final step, skipping the separate
    # XLA FFT dispatch and the exit wave's HBM round trip: 'auto' (fold
    # whenever eligible — plain delta_beta multislice, no prj-pos-offset
    # or free-prop refinement) | 'off'.  Math-identical to f32 roundoff
    # (DFT-by-matmul vs XLA FFT, like the kernel's inter-slice steps).
    fuse_farfield: str = 'auto'
    # Patch-granular gradient accumulation in the angle-fused step (auto-
    # enabled when the scan table is a constant-stride grid — see
    # ops/patches.detect_row_grid; this flag forces it for other tables,
    # where the fori-loop scatter usually loses to XLA's).
    patch_grad: bool = False
    # Hoist the ``binning`` z-reduction out of the per-chunk work: bin the
    # rotated object ONCE per angle, extract/scatter patches at binned
    # depth (8x less HBM traffic per gradient chunk at binning=8), expand
    # the accumulated gradient back to full depth before the rotate-back.
    # 'auto' (on when delta_beta + binning>1 + patch-granular step) | 'off'.
    prebin_z: str = 'auto'
    # Streaming rotation for the prebin path: fold the bin reduction /
    # expansion into the rotation gathers chunk-by-chunk so neither the
    # rotated full-res object nor the expanded full-res gradient
    # materialize (bit-exact; the difference between fitting and OOM for
    # the largest single-chip objects, but ~25% slower than the bulk
    # rotate at sizes that fit).  'auto' (on above ~1.5 GB/object) |
    # 'on' | 'off'.
    stream_rotation: str = 'auto'
    # How rotate_out_of_loop rotates the accumulated gradient back to the
    # 0-deg frame: False (default) interpolates at -theta exactly like the
    # reference (``adorym/ptychography.py:1069-1078`` rotates the gradient
    # array with reverse coordinates) — a bilinear GATHER, ~3x faster than
    # the scatter-heavy exact transpose; True uses the exact linear-map
    # transpose of the forward rotation.
    exact_grad_rotation: bool = False
    # How the IMMEDIATE scheme's band step rotates the per-batch gradient
    # band back to the 0-deg frame.  'exact' (default, reference-faithful:
    # the reference differentiates THROUGH the rotation, and AD's
    # transpose of the bilinear gather is an XLA scatter — measured
    # 16.45 ms of the 21.7 ms flagship step, the scheme's dominant cost,
    # tools/probe_imm.py) | 'interp': interpolate at -theta instead (the
    # SAME approximation the per-angle scheme's default rotate-back uses,
    # a fused gather reading the binned accumulator — cuts the step's
    # backward from ~16.5 to ~2 ms; 1105 -> 2996 patterns/s measured at
    # the flagship).  Accuracy: MEASURED phantom-recovery cost on the
    # ptychotomo quality drives — 32^3: corr 0.61 vs exact's 0.82;
    # 64^3: 0.83 vs 0.93 (loss floors 4-6x higher); 256^3
    # mid-convergence: 0.35 vs 0.42 at equal epochs — the interp
    # gradient costs convergence RATE at every scale tested, while
    # affording ~2.5x the epochs per unit wall-clock (an
    # epochs-vs-quality trade, not free speed; NOTES #15).  Opt-in
    # only; quality-check against 'exact' on your data before
    # production use.
    imm_grad_rotation: str = 'exact'
    # Z-major patch extraction for the delta_beta multislice patch path:
    # keep the per-angle extraction copy pre-transposed to [zb, 2, Yp, Xp]
    # so extracted chunks are born in the z-major layout BOTH kernel paths
    # want (the fused Pallas kernels consume it directly; XLA's fallback
    # cancels the adjacent transposes) — the per-chunk moveaxis prep
    # disappears.  Measured interleaved at the flagship chunk (round 4):
    # bf16 fwd+bwd 23.3 -> 20.9 ms (-10%), f32 59.3 -> 55.8 ms (-6%),
    # charging the once-per-angle object transpose fully to the variant.
    # At the EPOCH level the fused-angles scan already overlaps the chunk
    # grad with neighboring phases, so whole-epoch throughput TIES
    # (13.1-13.3k pps both, interleaved 4-epoch blocks) — the win is in
    # the standalone/chunk-bound regimes.  'auto' (on for TPU 3D
    # delta_beta multislice) | 'on' | 'off'.  Bit-identical trajectories
    # either way (pure relayout).
    zmajor_extract: str = 'auto'
    # Rotation resampling (reference kwarg ``interpolation``,
    # ``adorym/ptychography.py:72`` -> grid_sample mode
    # ``adorym/wrappers.py:1106``): 'bilinear' | 'nearest'.
    interpolation: str = 'bilinear'
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Mesh layout.  The reference's three ``distribution_mode`` branches
    collapse into one sharded implementation whose mesh shape is config
    (SURVEY §2.2)."""
    data_axis: int = 1      # number of devices sharding the scan-position batch
    object_axis: int = 1    # number of devices sharding the object's y extent
    axis_names: Tuple[str, str] = ('dp', 'op')
    # Explicit halo-exchange patch gather (parallel/halo.py) instead of
    # GSPMD auto-partitioning (which all-gathers the FULL object for the
    # patch gather, defeating op-sharding for exactly the objects that
    # need it).  'auto' (default): use whenever the geometry allows —
    # the padded object's y extent divides object_axis and the probe fits
    # one shard slab; True: require (warns + falls back if ineligible);
    # False: always GSPMD.
    use_halo_gather: Union[bool, str] = 'auto'
    # Out-of-core: keep the object's optimizer state (Adam moments,
    # momentum velocity, Curveball z — 1-2x the object size) in HOST memory
    # (pinned_host), streamed through HBM once per update inside the jitted
    # step.  The TPU-native replacement for the reference's 'shared_file'
    # mode keeping moments in parallel-HDF5 datasets
    # (``adorym/optimizers.py:96-113,339-363``): persistent HBM footprint
    # drops from ~(3-4)x to ~1x the object, raising the single-chip object
    # ceiling accordingly.
    offload_optimizer_state: bool = False
    # Stream the offloaded state through HBM in this many y-slabs so the
    # update's transient HBM is ~2 slabs instead of the full moments
    # (first-order object optimizers only; reference analog: file-slice-
    # strided moment updates, ``adorym/optimizers.py:339-363``).  1 streams
    # whole arrays.  Ignored when the object is sharded over 'op' (slab
    # slicing would fight the GSPMD partition).
    offload_slabs: int = 8
    # Beyond-HBM objects: keep the OBJECT ITSELF (not just its moments) in
    # pinned host memory as y-slabs, visiting HBM slab-at-a-time — per
    # angle, each slab streams in once for the fused rotate+bin (whose
    # result is 1/binning the size) and once for its update; the full-
    # resolution object never resides in HBM.  The last piece of the
    # reference's shared-file property (object+gradient+moments in HDF5,
    # bounded by disk not device memory, ``adorym/array_ops.py:62-73``).
    # Requires offload_optimizer_state + the angle-fused patch path with
    # prebin (delta_beta, binning>1, row-grid scan, per-angle updates,
    # rotate_out_of_loop, interp rotate-back, no regularizers/support
    # mask).  'auto' enables it when the object pair exceeds ~22% of HBM
    # (the measured device-resident fit boundary: 736^3 fits a v5e,
    # 768^3 OOMs)
    # and the run qualifies; True raises if the run does not qualify.
    offload_object: Union[bool, str] = False


@dataclasses.dataclass(frozen=True)
class IOConfig:
    fname: str = 'data.h5'
    save_path: str = '.'
    output_folder: str = 'recon'
    finite_support_mask_path: Optional[str] = None
    save_intermediate: bool = False
    save_intermediate_level: str = 'epoch'   # 'epoch' | 'batch'
    save_history: bool = False
    store_checkpoint: bool = True
    use_checkpoint: bool = True
    # Orbax/tensorstore checkpoints: per-device shard writes, no host
    # gather (io/checkpoint.py).  Default npz keeps single-file simplicity.
    use_orbax: bool = False
    force_to_use_checkpoint: bool = False
    n_batch_per_checkpoint: int = 10
    save_stdout: bool = False
    t_max_min: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class ReconConfig:
    geometry: Geometry
    loss: LossConfig = LossConfig()
    refine: RefineConfig = RefineConfig()
    train: TrainConfig = TrainConfig()
    parallel: ParallelConfig = ParallelConfig()
    io: IOConfig = IOConfig()

    def replace(self, **kw) -> 'ReconConfig':
        return dataclasses.replace(self, **kw)
