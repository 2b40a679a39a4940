"""Maze-visitation density / coverage tracking.

Functional counterpart of the reference `DensityTracker`
(`/root/reference/ddiffpg/utils/common.py:239-304`): a [res, res] grid over
the maze; every explore step scatters the env batch's xy positions; the
coverage scalar is the fraction of free cells ever visited. Lives inside the
jitted train state (int32 grid + device scatter) instead of a host-side
torch matrix updated with a .cpu() copy per step.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def create_grid(maze_map, resolution: int):
    """Returns (grid [res, res] int32 with -1 walls, reset rowcol, free count)."""
    n = len(maze_map)
    assert resolution % n == 0
    scale = resolution // n
    grid = np.zeros((resolution, resolution), np.int32)
    reset = None
    for i in range(n):
        for j in range(len(maze_map[i])):
            c = maze_map[i][j]
            if c == 1:
                grid[i * scale:(i + 1) * scale, j * scale:(j + 1) * scale] = -1
            elif c == "r":
                reset = (i * scale + scale // 2, j * scale + scale // 2)
    num_free = int((grid == 0).sum())
    return grid, np.asarray(reset, np.int64), num_free


def update(grid, xy, maze_size_scaling: float, reset, maze_rows: int):
    """Scatter-add visits. xy [E, 2] world coords.

    Wall cells (init -1) are masked out of the add: a probe penetrating a
    wall must not be able to push a -1 cell past zero and count as a
    visited free cell (the reference shares this scatter, common.py:277-282,
    but MuJoCo keeps the ant out of walls so it never manifests there;
    without the mask coverage can exceed 1.0)."""
    res = grid.shape[0]
    idx = xy / maze_size_scaling * (res // maze_rows)
    ix = (-idx[:, 1] + reset[0]).astype(jnp.int32)
    iy = (idx[:, 0] + reset[1]).astype(jnp.int32)
    ix = jnp.clip(ix, 0, res - 1)
    iy = jnp.clip(iy, 0, res - 1)
    free = (grid[ix, iy] >= 0).astype(grid.dtype)
    return grid.at[ix, iy].add(free)


def coverage(grid, num_free: int):
    return (grid > 0).sum() / num_free
