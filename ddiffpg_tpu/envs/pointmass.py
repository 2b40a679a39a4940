"""2-D point-mass maze — fast debug env for integration tests.

Not in the reference; exists so the full agent stack can be exercised (and
shown to learn) in seconds. Same obs/reward/success conventions as AntMaze:
sparse +10 at a goal, episode ends on goal or timeout, info carries
success/time_outs. obs = [xy, velocity] (4-D), action = 2-D force in [-1,1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu.envs.base import EnvState
from ddiffpg_tpu.physics import maze


class PointMazeEnv:
    def __init__(self, name: str = "pointmaze-v1", max_episode_steps: int = 100,
                 dt: float = 0.1, size_scaling: float = 4.0,
                 reward_type: str = "sparse"):
        self.reward_type = reward_type
        maze_name = name.replace("pointmaze", "antmaze")
        self.maze_map = maze.MAZES[maze_name]
        self.boxes = maze.compile_boxes(self.maze_map, size_scaling)
        goals = maze.GOALS[maze_name]
        self.goal_xy = jnp.asarray([g[0] for g in goals])
        self.goal_reward = jnp.asarray([g[1] for g in goals])
        self.max_episode_steps = max_episode_steps
        self.dt = dt
        self.obs_dim = 4
        self.action_dim = 2
        self.name = name
        self.radius = 0.4

    def _obs(self, qpos, qvel):
        return jnp.concatenate([qpos, qvel])

    def reset(self, key):
        k, key = jax.random.split(key)
        qpos = jax.random.uniform(k, (2,), minval=-1.0, maxval=1.0)
        state = EnvState(qpos=qpos, qvel=jnp.zeros(2),
                         t=jnp.asarray(0, jnp.int32), key=key)
        return state, self._obs(state.qpos, state.qvel)

    def _collide(self, pos, vel):
        """Push the disc out of any wall box, zero normal velocity."""
        bmin = jnp.asarray(self.boxes[:, 0, :2])
        bmax = jnp.asarray(self.boxes[:, 1, :2])
        for _ in range(2):
            clamped = jnp.clip(pos[None], bmin, bmax)
            delta = pos[None] - clamped
            d = jnp.linalg.norm(delta, axis=-1)
            pen = jnp.maximum(self.radius - d, 0.0)
            n = delta / jnp.where(d > 1e-6, d, 1.0)[:, None]
            pos = pos + (pen[:, None] * n).sum(0)
            hit = pen > 0
            vn = (vel[None] * n).sum(-1)
            vel = vel - (jnp.where(hit & (vn < 0), vn, 0.0)[:, None] * n).sum(0)
        return pos, vel

    def step(self, state: EnvState, action):
        action = jnp.clip(action, -1.0, 1.0)
        vel = 0.95 * state.qvel + action * self.dt * 10.0
        vel = jnp.clip(vel, -4.0, 4.0)
        pos = state.qpos + vel * self.dt
        pos, vel = self._collide(pos, vel)

        d = jnp.linalg.norm(pos[None] - self.goal_xy, axis=-1)
        hit = d <= 0.5
        reached = hit.any()
        goal_id = jnp.where(reached, jnp.argmax(hit) + 1, 0).astype(jnp.int32)
        reward = jnp.where(reached, self.goal_reward[jnp.argmax(hit)], 0.0)
        if self.reward_type == "dense":
            reward = reward - 0.05 * d.min()

        t = state.t + 1
        truncated = t >= self.max_episode_steps
        done = reached | truncated
        obs = self._obs(pos, vel)

        k_reset, key = jax.random.split(state.key)
        rpos = jax.random.uniform(k_reset, (2,), minval=-1.0, maxval=1.0)
        reset_state = EnvState(qpos=rpos, qvel=jnp.zeros(2),
                               t=jnp.asarray(0, jnp.int32), key=key)
        new_state = jax.tree.map(
            lambda r, c: jnp.where(done, r, c), reset_state,
            EnvState(qpos=pos, qvel=vel, t=t, key=key))
        info = {"success": goal_id, "time_outs": truncated & ~reached}
        return new_state, obs, reward, done, info
