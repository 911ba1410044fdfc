"""Spatial grid pooling for MDNS clean-shot detection.

TPU-native replacement for the reference's `grid_sampling`
(`/root/reference/models/mpti.py:316-371`), which Python-loops over
n_x*n_y*n_z cells and appends a ragged list of per-cell mean features.
Here the cell count is static, every cell gets a slot, and occupancy is a
mask — one batched masked-mean instead of a host loop.

Reference semantics preserved:
  * the bounding box covers only the (masked) foreground points;
  * cell c along an axis spans [min + c*d, min + (c+1)*d] with *closed*
    bounds on both ends (mpti.py:355-360), so boundary points belong to
    multiple cells for the purpose of the cell mean;
  * empty cells produce no seed (here: ``seed_valid`` False).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def grid_seed_pool(
    xyz: Array,
    feat: Array,
    valid: Array,
    n_cells: tuple[int, int, int],
) -> tuple[Array, Array]:
    """Pool features into a fixed spatial grid over the valid points.

    Args:
      xyz: (N, 3) spatial coordinates.
      feat: (N, C) features to pool.
      valid: (N,) bool — which points participate (the fg mask).
      n_cells: static (n_x, n_y, n_z) grid resolution.
    Returns:
      seeds: (n_x*n_y*n_z, C) per-cell mean features (0 where invalid).
      seed_valid: (n_x*n_y*n_z,) bool — cell contains >=1 valid point.
    """
    n_x, n_y, n_z = n_cells
    xyz = xyz.astype(jnp.float32)
    big = jnp.asarray(3.4e38, jnp.float32)

    lo = jnp.min(jnp.where(valid[:, None], xyz, big), axis=0)    # (3,)
    hi = jnp.max(jnp.where(valid[:, None], xyz, -big), axis=0)   # (3,)
    counts = jnp.asarray([n_x, n_y, n_z], jnp.float32)
    d = (hi - lo) / counts                                       # strides (mpti.py:337-339)

    def axis_masks(axis: int, n: int) -> Array:
        """(n, N) closed-interval membership along one axis."""
        starts = lo[axis] + d[axis] * jnp.arange(n, dtype=jnp.float32)
        p = xyz[:, axis]
        return (p[None, :] >= starts[:, None]) & (p[None, :] <= (starts + d[axis])[:, None])

    mx = axis_masks(0, n_x)                                      # (n_x, N)
    my = axis_masks(1, n_y)
    mz = axis_masks(2, n_z)
    # (n_x, n_y, n_z, N) -> (cells, N); iteration order x->y->z matches the
    # reference's nested loops (mpti.py:354-368).
    cell = (mx[:, None, None, :] & my[None, :, None, :] & mz[None, None, :, :])
    cell = cell.reshape(n_x * n_y * n_z, -1) & valid[None, :]

    w = cell.astype(jnp.float32)                                 # (cells, N)
    sums = jnp.einsum("gn,nc->gc", w, feat.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    cnt = jnp.sum(w, axis=1)                                     # (cells,)
    seeds = sums / jnp.maximum(cnt, 1.0)[:, None]
    seed_valid = cnt > 0.0
    seeds = jnp.where(seed_valid[:, None], seeds, 0.0)
    return seeds.astype(feat.dtype), seed_valid
