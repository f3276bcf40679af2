"""2D affine image warping with torch-``affine_grid`` semantics.

The reference routes per-distance registration of holograms through
``torch.nn.functional.affine_grid`` + ``grid_sample``
(``adorym/wrappers.py:1159-1176``): the ``[2, 3]`` matrix maps *output*
normalized coordinates (x, y in [-1, 1], align_corners=False) to *input*
normalized coordinates, sampling bilinearly with border padding.  This is a
faithful JAX implementation, differentiable in both image and matrix (the
matrix is a refinable parameter, ``prj_affine_ls``).
"""

from __future__ import annotations

import jax.numpy as jnp

from .rotate import _bilinear_gather_plane


def affine_transform_2d(imgs, mat):
    """Warp a stack ``[N, H, W]`` by one ``[2, 3]`` affine matrix.

    ``mat`` rows are (x_row, y_row) in torch order: x is the horizontal
    (W) axis.  align_corners=False normalization:
    ``x_norm = (2 j + 1)/W - 1``.
    """
    N, H, W = imgs.shape
    jj = (2.0 * jnp.arange(W, dtype=jnp.float32) + 1.0) / W - 1.0
    ii = (2.0 * jnp.arange(H, dtype=jnp.float32) + 1.0) / H - 1.0
    x_out = jnp.broadcast_to(jj[None, :], (H, W))
    y_out = jnp.broadcast_to(ii[:, None], (H, W))
    x_in = mat[0, 0] * x_out + mat[0, 1] * y_out + mat[0, 2]
    y_in = mat[1, 0] * x_out + mat[1, 1] * y_out + mat[1, 2]
    # Unnormalize back to pixel indices.
    c_col = ((x_in + 1.0) * W - 1.0) / 2.0
    c_row = ((y_in + 1.0) * H - 1.0) / 2.0
    return _bilinear_gather_plane(imgs, c_row, c_col, 1, 2)
