"""Observability: structured per-phase timers, throughput, device memory.

Replaces the reference's ad-hoc wall-clock prints (SURVEY §5: per-phase
timers at ``adorym/ptychography.py:943,988,1041,1052,1198``, throughput
"angles/sec" :1255, GPU memory probes ``adorym/wrappers.py:383-403``) with
a structured recorder plus first-class ``jax.profiler`` trace capture for
xprof.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class Timers:
    """Accumulating named wall-clock timers.

    NOTE: under async dispatch a phase timer measures enqueue time unless
    the phase ends with a host sync; the per-batch loss fetch in the driver
    provides that sync, so epoch-level numbers are accurate.
    """

    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def summary(self) -> str:
        parts = []
        for name in sorted(self.total):
            n = self.count[name]
            tot = self.total[name]
            parts.append(f'{name}: {tot:.3f}s ({n}x, {tot / n * 1e3:.1f}ms avg)')
        return '; '.join(parts)

    def reset(self):
        self.total.clear()
        self.count.clear()


#: Assumed per-device memory when the backend hides stats (v5e HBM) —
#: keeps CPU test runs and stats-less backends on the tuning this package
#: was measured with.
DEFAULT_HBM_BYTES = 16e9


def hbm_limit_bytes() -> float:
    """Per-device accelerator memory capacity in bytes, for sizing the
    driver's working-set heuristics (gradient-chunk fusing, data residency,
    rotation chunking).  Derived from ``memory_stats()['bytes_limit']`` so
    a v5p (95 GB) sizes ~6x larger than a v5e (16 GB); non-TPU backends
    and TPUs that don't expose stats use :data:`DEFAULT_HBM_BYTES`."""
    try:
        dev = jax.devices()[0]
        if dev.platform != 'tpu':
            return DEFAULT_HBM_BYTES
        limit = (dev.memory_stats() or {}).get('bytes_limit', 0)
        if limit > 0:
            return float(limit)
    except Exception:
        pass
    return DEFAULT_HBM_BYTES


def device_memory_stats() -> Optional[Dict[str, float]]:
    """Per-device HBM usage in MB (the reference's GPU memory probe
    analog).  Returns None when the backend doesn't expose stats."""
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        if not stats:
            return None
        return {'bytes_in_use_mb': stats.get('bytes_in_use', 0) / 2 ** 20,
                'peak_bytes_mb': stats.get('peak_bytes_in_use', 0) / 2 ** 20,
                'bytes_limit_mb': stats.get('bytes_limit', 0) / 2 ** 20}
    except Exception:
        return None


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace viewable in xprof/TensorBoard.

    The reference has no profiler integration (SURVEY §5); on TPU this is
    the difference between guessing and knowing.
    """
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def host_memory_rss_mb() -> Optional[float]:
    """Host RSS in MB (the reference's CPU memory probe,
    ``adorym/util.py:2214``); None when /proc is unavailable."""
    try:
        with open('/proc/self/statm') as f:
            pages = int(f.read().split()[1])
        import os
        return pages * os.sysconf('SC_PAGE_SIZE') / 2 ** 20
    except Exception:
        return None

def xla_reserve_bytes(hbm: Optional[float] = None) -> float:
    """HBM reserved for XLA program scratch (fusion temporaries, collective
    buffers, compiled-program workspace) when sizing the driver's working
    set.  Measured ~6 GB at flagship (256^3) shapes on a 16 GB v5e; the
    scratch tracks the PROGRAM's working set, not the device size, so it is
    capped at that measured value on larger devices (a 95 GB v5p keeps
    ~89 GB usable) and scales down proportionally on smaller ones.

    TODO(v5p): the cap has never met real v5p silicon — the program-scoped
    argument holds for the SAME flagship program, but v5p-scale runs will
    run bigger chunks/objects whose scratch grows with them.  Re-measure
    the actual reserve on first v5p access before trusting a 6 GB reserve
    under a ~30 GB working set (the mock asserts in
    tests/test_memory_heuristics.py pin today's formula, not silicon)."""
    hbm = hbm_limit_bytes() if hbm is None else hbm
    return min(6e9, 0.375 * hbm)


def data_headroom_bytes(hbm: Optional[float] = None) -> float:
    """Headroom kept free of measured-data residency decisions (loss
    buffers, staging, output transients).  1.5 GB measured adequate on the
    16 GB v5e (~9% of HBM); capped there on larger devices, proportional on
    smaller ones.  The transients it covers are O(minibatch), not
    O(device), so the cap is the right shape for v5p — but see the
    TODO(v5p) on :func:`xla_reserve_bytes`: validate on first real v5p
    run."""
    hbm = hbm_limit_bytes() if hbm is None else hbm
    return min(1.5e9, 0.09375 * hbm)


def obj_offload_auto_bytes(hbm: Optional[float] = None) -> float:
    """offload_object='auto' boundary: the device-resident path needs the
    object pair + 2 moment arrays + XLA scratch simultaneously, so the
    object fits while obj <= (hbm - reserve) / 3; a 5% safety margin keeps
    the boundary inside proven territory.  On the 15.75 GB v5e this lands
    at 3.1 GB, matching the measured fit boundary (736^3 = 3.2 GB trains
    with streaming rotation + offloaded moments; 768^3 = 3.6 GB OOMs by
    ~0.4 GB) — and unlike a flat fraction it scales with what actually
    fits: a 95 GB v5p keeps a 19 GB object device-resident (boundary
    ~28 GB) instead of streaming it through the host."""
    hbm = hbm_limit_bytes() if hbm is None else hbm
    return 0.95 * (hbm - xla_reserve_bytes(hbm)) / 3


def stream_rotation_auto_bytes(hbm: Optional[float] = None) -> float:
    """stream_rotation='auto' boundary: the bulk rotate's 4 corner-gather
    temporaries are each object-sized, so beyond ~1/10 of HBM per object
    the rotate alone claims ~40% of the device and squeezes the gradient
    chunk working set.  1.5 GB measured as the crossover on the 16 GB v5e
    (streaming is ~25% slower where both fit); scaled proportionally."""
    hbm = hbm_limit_bytes() if hbm is None else hbm
    return hbm * (1.5 / 16)
