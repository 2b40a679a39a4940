"""Channel-last batched engine vs the per-env reference engine."""

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu.physics import engine, engine_cl, maze
from ddiffpg_tpu.physics.ant import build_ant
from ddiffpg_tpu.physics.panda import build_panda_scene


def _rand_ant_states(m, B, seed=0):
    rng = np.random.RandomState(seed)
    qpos = np.tile(np.asarray(m.init_qpos)[None], (B, 1)).astype(np.float32)
    qpos[:, :2] += rng.uniform(-1, 1, (B, 2))
    qpos[:, 2] = rng.uniform(0.3, 0.8, B)
    qpos[:, 7:] += rng.uniform(-0.2, 0.2, (B, 8))
    qvel = rng.uniform(-1, 1, (B, m.nv)).astype(np.float32)
    ctrl = rng.uniform(-1, 1, (B, m.nu)).astype(np.float32)
    return jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)


def test_ant_step_parity():
    m = build_ant(static_boxes=maze.compile_boxes(maze.MAZE_v1),
                  dt=0.01, n_substeps=5)
    qp, qv, ct = _rand_ant_states(m, 6)
    ref = jax.vmap(lambda a, b, c: engine.step(m, a, b, c))(qp, qv, ct)
    got = engine_cl.step(m, qp, qv, ct)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=2e-4)


def test_panda_step_parity():
    m, meta = build_panda_scene("DrawerMulti", n_substeps=5)
    B = 4
    rng = np.random.RandomState(1)
    qpos = np.tile(np.asarray(m.init_qpos)[None], (B, 1)).astype(np.float32)
    qvel = (rng.uniform(-0.2, 0.2, (B, m.nv))).astype(np.float32)
    # servo targets near neutral
    ctrl = np.tile(np.concatenate(
        [meta["neutral"], [0.015, 0.015]])[None], (B, 1)).astype(np.float32)
    ctrl[:, :7] += rng.uniform(-0.05, 0.05, (B, 7))
    ref = jax.vmap(lambda a, b, c: engine.step(m, a, b, c))(
        jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
    got = engine_cl.step(m, jnp.asarray(qpos), jnp.asarray(qvel),
                         jnp.asarray(ctrl))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=5e-5)


def test_sdf_wall_blocks():
    """SDF contact path stops the ant at a wall like the box path."""
    sdf = maze.compile_sdf(maze.MAZE_v1)
    m = build_ant(dt=0.01, n_substeps=10, **sdf)
    B = 4
    qp = jnp.tile(jnp.asarray(m.init_qpos)[None], (B, 1))
    qp = qp.at[:, 0].set(-1.2)   # near the inner wall face at x = -2
    qv = jnp.zeros((B, m.nv)).at[:, 0].set(-3.0)
    for _ in range(10):
        qp, qv = engine_cl.step(m, qp, qv, jnp.zeros((B, 8)))
    assert bool(jnp.isfinite(qp).all())
    # torso sphere radius 0.25: center never crosses into the wall
    assert float(qp[:, 0].min()) > -2.2


def test_sdf_matches_box_distance():
    sdf = maze.compile_sdf(maze.MAZE_v1, cell=0.05)
    boxes = maze.compile_boxes(maze.MAZE_v1)
    rng = np.random.RandomState(2)
    # stay inside the SDF grid (the engine clips; this manual lookup doesn't)
    pts = np.stack([rng.uniform(-13, 5, 200), rng.uniform(-9, 9, 200)], -1)
    D = np.asarray(sdf["sdf_dist"])
    ox, oy = sdf["sdf_origin"]
    cell = sdf["sdf_cell"]
    for p in pts:
        # true signed distance to nearest box (2D)
        best = np.inf
        for (mn, mx) in boxes:
            d = np.maximum(mn[:2] - p, p - mx[:2])
            out = np.linalg.norm(np.maximum(d, 0))
            ins = min(np.max(d), 0.0)
            best = min(best, out + ins)
        gx, gy = (p[0] - ox) / cell, (p[1] - oy) / cell
        ix, iy = int(gx), int(gy)
        fx, fy = gx - ix, gy - iy
        approx = (D[ix, iy] * (1 - fx) * (1 - fy) + D[ix + 1, iy] * fx * (1 - fy)
                  + D[ix, iy + 1] * (1 - fx) * fy + D[ix + 1, iy + 1] * fx * fy)
        assert abs(approx - best) < 0.06, (p, approx, best)
