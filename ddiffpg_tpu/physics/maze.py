"""Maze grid specs and scene compilation.

Grid layouts match the reference's single/multi-goal mazes
(`/root/reference/ddiffpg/env/d4rl/locomotion/maze_env.py:63-111`). Instead
of MJCF XML surgery (maze_env.py:269-288), wall cells compile directly to
static AABBs for the penalty-contact engine; coordinates are offset so the
robot reset cell ('r') is the world origin, exactly like the reference.
"""

from __future__ import annotations

import numpy as np

R, G = "r", "g"

MAZE_v1 = [[1, 1, 1, 1, 1],
           [1, 0, 0, 0, 1],
           [1, G, 1, R, 1],
           [1, 0, 0, 0, 1],
           [1, 1, 1, 1, 1]]

MAZE_v2 = [[1, 1, 1, 1, 1, 1, 1],
           [1, 0, 1, 1, 1, 0, 1],
           [1, 0, 1, 1, 1, 0, 1],
           [1, 0, 0, R, 0, G, 1],
           [1, 0, 1, 1, 1, 0, 1],
           [1, G, 1, 1, 1, 0, 1],
           [1, 1, 1, 1, 1, 1, 1]]

MAZE_v2_hard = [[1, 1, 1, 1, 1, 1, 1, 1, 1],
                [1, 0, 0, 0, G, 0, 0, 0, 1],
                [1, 0, 0, 0, 1, 0, 0, 0, 1],
                [1, 0, 0, 0, 0, 0, 0, 0, 1],
                [1, G, 1, 0, R, 0, 1, G, 1],
                [1, 0, 0, 0, 0, 0, 0, 0, 1],
                [1, 0, 0, 0, 1, 0, 0, 0, 1],
                [1, 0, 0, 0, G, 0, 0, 0, 1],
                [1, 1, 1, 1, 1, 1, 1, 1, 1]]

MAZE_v3 = [[1, 1, 1, 1, 1, 1, 1, 1, 1],
           [1, 0, 0, 0, 0, 0, 1, G, 1],
           [1, 0, 1, 1, 0, 0, 0, 0, 1],
           [1, 0, 0, 0, 0, 0, 1, 0, 1],
           [1, 0, 1, 0, R, 0, 0, 0, 1],
           [1, 0, 0, 0, 0, 0, 1, 0, 1],
           [1, 0, 1, 1, 0, 0, 1, 0, 1],
           [1, G, 0, 0, 0, 0, 0, 0, 1],
           [1, 1, 1, 1, 1, 1, 1, 1, 1]]

MAZE_v4 = [[1, 1, 1, 1, 1, 1, 1],
           [1, 0, 0, 0, 1, 0, 1],
           [1, G, 1, 0, 0, 0, 1],
           [1, 0, 0, 0, 1, R, 1],
           [1, G, 1, 0, 0, 0, 1],
           [1, 0, 0, 0, 1, 0, 1],
           [1, 1, 1, 1, 1, 1, 1]]

MAZE_v5 = [[1, 1, 1, 1, 1, 1, 1],
           [1, 0, 1, 0, 0, 0, 1],
           [1, 0, 0, 0, 1, 0, 1],
           [1, G, 1, 0, 0, R, 1],
           [1, 0, 0, 0, 1, 0, 1],
           [1, 0, 1, 0, 0, 0, 1],
           [1, 1, 1, 1, 1, 1, 1]]

MAZES = {"antmaze-v1": MAZE_v1, "antmaze-v2": MAZE_v2, "antmaze-v3": MAZE_v3,
         "antmaze-v4": MAZE_v4, "antmaze-v5": MAZE_v5,
         "antmaze-v2-hard": MAZE_v2_hard}

# fixed goal xy lists per maze (reference maze_env.py:372-385); the second
# element of each tuple is the sparse reward granted at that goal
GOALS = {
    "antmaze-v1": [((-8.0, 0.0), 10.0)],
    "antmaze-v2": [((-8.0, 8.0), 20.0), ((8.0, 0.0), 10.0)],
    "antmaze-v2-hard": [((-12.0, 0.0), 10.0), ((12.0, 0.0), 10.0),
                        ((0.0, 12.0), 10.0), ((0.0, -12.0), 10.0)],
    "antmaze-v3": [((-12.0, 12.0), 10.0), ((12.0, -12.0), 10.0)],
    "antmaze-v4": [((-16.0, 4.0), 10.0), ((-16.0, -4.0), 10.0)],
    "antmaze-v5": [((-16.0, 0.0), 10.0)],
}

EPISODE_LEN = {"antmaze-v1": 500, "antmaze-v2": 500,
               "antmaze-v3": 700, "antmaze-v4": 700}


def find_reset(maze_map):
    for i, row in enumerate(maze_map):
        for j, c in enumerate(row):
            if c == R:
                return i, j
    raise ValueError("no reset cell")


def compile_boxes(maze_map, size_scaling: float = 4.0, height: float = 0.5):
    """Wall cells -> AABBs [(min, max)], offset so 'r' is the origin."""
    ri, rj = find_reset(maze_map)
    tx, ty = rj * size_scaling, ri * size_scaling
    boxes = []
    half = 0.5 * size_scaling
    hz = height * size_scaling  # box full height = maze_height * scaling
    for i, row in enumerate(maze_map):
        for j, c in enumerate(row):
            if c == 1:
                cx = j * size_scaling - tx
                cy = i * size_scaling - ty
                boxes.append(((cx - half, cy - half, 0.0),
                              (cx + half, cy + half, hz)))
    return np.asarray(boxes, np.float32)


def free_cells(maze_map):
    """(row, col) of every non-wall cell — used by the coverage tracker."""
    return [(i, j) for i, row in enumerate(maze_map)
            for j, c in enumerate(row) if c != 1]
