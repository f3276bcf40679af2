"""Pallas patch scatter-add kernel (interpret mode; see module STATUS).

Standalone (outside tests/, no conftest): force the CPU backend before
touching JAX — the axon site hook would otherwise dial the TPU tunnel.
"""

import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp

import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pallas_scatter import (extract_patches_fused,
                                           scatter_patches_add_pallas)
from adorym_tpu.ops.patches import extract_patches, scatter_patches_add


def test_scatter_kernel_matches_xla():
    rng = np.random.default_rng(0)
    obj = jnp.asarray(rng.random((24, 24, 8, 2)).astype(np.float32))
    pos = jnp.asarray([[0, 0], [4, 4], [6, 2], [16, 15]])  # overlapping
    patches = jnp.asarray(rng.random((4, 8, 8, 8, 2)).astype(np.float32))
    out = scatter_patches_add_pallas(jnp.zeros_like(obj), patches, pos,
                                     interpret=True)
    ref = scatter_patches_add(jnp.zeros_like(obj), patches, pos)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fused_extract_vjp_matches():
    rng = np.random.default_rng(1)
    obj = jnp.asarray(rng.random((24, 24, 8, 2)).astype(np.float32))
    pos = jnp.asarray([[0, 0], [4, 4], [6, 2], [16, 15]])

    def f(o):
        return jnp.sum(jnp.sin(extract_patches_fused(o, pos, (8, 8), True)))

    def f_ref(o):
        return jnp.sum(jnp.sin(extract_patches(o, pos, (8, 8))))

    np.testing.assert_array_equal(np.asarray(jax.grad(f)(obj)),
                                  np.asarray(jax.grad(f_ref)(obj)))
