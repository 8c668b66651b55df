"""2D occupancy grid as pure array ops.

Mirror of the reference's ``OccupandyGrid2D`` used for feature bucketing in
the detector and reprojector (reference:
src/svo_common/include/svo/common/occupancy_grid_2d.h:10-104). The grid is a
flat bool/int array of static size; marking and querying are scatters and
gathers, never loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_dims(img_w: int, img_h: int, cell_size: int) -> tuple[int, int]:
    n_cols = -(-img_w // cell_size)
    n_rows = -(-img_h // cell_size)
    return n_cols, n_rows


def cell_index(px: jax.Array, cell_size: int, n_cols: int) -> jax.Array:
    """Pixel coords [..., 2] → flat cell index."""
    cx = jnp.floor(px[..., 0] / cell_size).astype(jnp.int32)
    cy = jnp.floor(px[..., 1] / cell_size).astype(jnp.int32)
    return cy * n_cols + cx


def make_grid(img_w: int, img_h: int, cell_size: int) -> jax.Array:
    n_cols, n_rows = grid_dims(img_w, img_h, cell_size)
    return jnp.zeros((n_rows * n_cols,), bool)


def set_occupied(grid: jax.Array, px: jax.Array, mask: jax.Array,
                 cell_size: int, n_cols: int) -> jax.Array:
    idx = cell_index(px, cell_size, n_cols)
    widx = jnp.where(mask, idx, grid.shape[0])
    return grid.at[widx].set(True, mode="drop")


def is_occupied(grid: jax.Array, px: jax.Array, cell_size: int,
                n_cols: int) -> jax.Array:
    idx = jnp.clip(cell_index(px, cell_size, n_cols), 0, grid.shape[0] - 1)
    return grid[idx]
