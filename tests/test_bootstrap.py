"""Multi-PROCESS bootstrap (the reference's ``mpirun -n N`` analog,
``README.rst:107-111``): ``initialize_distributed`` + ``auto_mesh`` run in
two real OS processes coordinated by the JAX distributed runtime, with a
collective that mixes shards owned by different processes — the moral
equivalent of the reference's cross-rank ``comm.allreduce``
(``adorym/ptychography.py:1113-1114``) without needing an MPI stack.

The in-process tests elsewhere exercise the same mesh code on 8 virtual
devices of ONE process; this file is the only place the cross-process
(DCN-analog) path actually runs.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    pid = int(sys.argv[1]); port = sys.argv[2]
    from adorym_tpu.parallel.bootstrap import (initialize_distributed,
                                               auto_mesh)
    initialize_distributed(f'127.0.0.1:{port}', num_processes=2,
                           process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    mesh, pcfg = auto_mesh(object_axis=2)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    dp, op = pcfg.axis_names

    def f(x):
        return jax.lax.psum(jnp.sum(x), (dp, op))

    g = shard_map(f, mesh=mesh, in_specs=P(dp, op), out_specs=P())
    # Each process fills only ITS device shards (1+pid), so the global
    # psum (= 4*8*1 + 4*8*2 = 96) is only correct if the collective
    # crossed the process boundary.
    x = jax.make_array_from_callback(
        (8, 8), NamedSharding(mesh, P(dp, op)),
        lambda idx: np.ones((8, 8), np.float32)[idx] * (1 + pid))
    out = jax.jit(g)(x)
    print('PID%%d SUM %%.1f' %% (pid, float(out)), flush=True)
""") % {'repo': os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_bootstrap_psum(tmp_path):
    worker = tmp_path / 'worker.py'
    worker.write_text(_WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail('multi-process bootstrap timed out')
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out}'
        assert f'PID{i} SUM 96.0' in out, out
