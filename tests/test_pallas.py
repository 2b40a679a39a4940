"""Pallas ant-substep kernel: interpret-mode parity with engine_cl."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from ddiffpg_tpu.physics import engine_cl, maze
from ddiffpg_tpu.physics import pallas_ant
from ddiffpg_tpu.physics.ant import build_ant


def test_interpret_parity_with_engine_cl():
    m = build_ant(static_boxes=maze.compile_boxes(maze.MAZE_v1),
                  dt=0.01, n_substeps=1)
    B = 128
    rng = np.random.RandomState(0)
    qpos = np.tile(m.init_qpos[None], (B, 1)).astype(np.float32)
    qpos[:, :2] += rng.uniform(-1, 1, (B, 2))
    qpos[:, 2] = rng.uniform(0.3, 0.8, B)
    qpos[:, 7:] += rng.uniform(-0.2, 0.2, (B, 8))
    qvel = rng.uniform(-1, 1, (B, 14)).astype(np.float32)
    ctrl = rng.uniform(-1, 1, (B, 8)).astype(np.float32)

    ref = engine_cl.step(m, jnp.asarray(qpos), jnp.asarray(qvel),
                         jnp.asarray(ctrl))
    with pltpu.force_tpu_interpret_mode():
        fn = pallas_ant.make_substep_kernel(m, tile=128)
        got = fn(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=5e-5)


def _removed_test_unsupported_topology():
    import pytest

    from ddiffpg_tpu.physics.panda import build_panda_scene

    m, _ = build_panda_scene("Reach")
    with pytest.raises(AssertionError):
        pallas_ant.make_substep_kernel(m)


def test_interpret_parity_panda():
    from ddiffpg_tpu.physics.panda import build_panda_scene

    m, meta = build_panda_scene("DrawerMulti", n_substeps=1)
    B = 128
    rng = np.random.RandomState(1)
    qpos = np.tile(np.asarray(m.init_qpos)[None], (B, 1)).astype(np.float32)
    qvel = rng.uniform(-0.2, 0.2, (B, m.nv)).astype(np.float32)
    ctrl = np.tile(np.concatenate(
        [meta["neutral"], [0.015, 0.015]])[None], (B, 1)).astype(np.float32)
    ctrl[:, :7] += rng.uniform(-0.05, 0.05, (B, 7))

    ref = engine_cl.step(m, jnp.asarray(qpos), jnp.asarray(qvel),
                         jnp.asarray(ctrl))
    with pltpu.force_tpu_interpret_mode():
        fn = pallas_ant.make_substep_kernel(m, tile=128)
        got = fn(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=2e-4)


def test_padded_batch_parity():
    """pallas_step_padded runs non-multiple batches (eval envs) through the
    SAME kernel as training batches: B=20 padded to one 128-lane tile must
    match engine_cl row-for-row, and the padding rows must not leak."""
    from ddiffpg_tpu.envs.base import pallas_step_padded

    m = build_ant(static_boxes=maze.compile_boxes(maze.MAZE_v1),
                  dt=0.01, n_substeps=1)
    B = 20
    rng = np.random.RandomState(3)
    qpos = np.tile(m.init_qpos[None], (B, 1)).astype(np.float32)
    qpos[:, :2] += rng.uniform(-1, 1, (B, 2))
    qpos[:, 2] = rng.uniform(0.3, 0.8, B)
    qvel = rng.uniform(-1, 1, (B, 14)).astype(np.float32)
    ctrl = rng.uniform(-1, 1, (B, 8)).astype(np.float32)

    ref = engine_cl.step(m, jnp.asarray(qpos), jnp.asarray(qvel),
                         jnp.asarray(ctrl))
    with pltpu.force_tpu_interpret_mode():
        fn = pallas_ant.make_substep_kernel(m, tile=128)
        got = pallas_step_padded(fn, 128, jnp.asarray(qpos),
                                 jnp.asarray(qvel), jnp.asarray(ctrl))
    assert got[0].shape == (B, m.nq) and got[1].shape == (B, m.nv)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=5e-5)
