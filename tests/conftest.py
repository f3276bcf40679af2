"""Test configuration: run JAX on 8 virtual CPU devices.

Multi-chip behavior (sharding, collectives) is exercised on a virtual CPU
mesh — the rebuild's answer to the reference's "pseudo-MPI" single-process
shim (``adorym/pseudo.py``), except the virtual mesh runs the *real*
multi-device code path.
"""

import os

# Must be set before JAX initializes its backends.
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The axon TPU plugin pins JAX_PLATFORMS=axon in the environment; tests run
# on the virtual CPU mesh regardless.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)
