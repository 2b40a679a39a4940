"""AntMaze environments (antmaze-v1..v4).

Reference semantics (SURVEY.md §2; files cited inline):
  * obs = qpos[:15] ++ qvel[:14] (29-D, expose_all_qpos — ant.py:94-105)
  * sparse reward: +10 within 0.5 m of a goal, +20 for the (-8, 8) goal of
    v2 (goal_reaching_env.py:37-48)
  * episode terminates on goal reach (registrations set eval=True) and at
    max_episode_steps 500/700 (old__init__.py:28-98); `time_outs` reported
    separately so agents can XOR them out of `done` (common.py:188-196)
  * info['success'] = goal index + 1 (0 = none), every step
  * antmaze-v1 uses random_init: torso xy ~ U(-2, 2) (ant.py:124-140)
  * control dt 0.1 s (MuJoCo dt 0.02 x frame_skip 5 -> here dt x n_substeps)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu.envs.base import EnvState
from ddiffpg_tpu.physics import ant as ant_model
from ddiffpg_tpu.physics import engine, maze


class AntMazeEnv:
    def __init__(self, name: str = "antmaze-v1", reward_type: str = "sparse",
                 random_init: bool = False, maze_size_scaling: float = 4.0,
                 dt: float = 0.01, n_substeps: int = 10,
                 use_pallas: str | bool = "auto"):
        self.name = name
        self.maze_map = maze.MAZES[name]
        self.boxes = maze.compile_boxes(self.maze_map, maze_size_scaling)
        # boxes drive the per-env reference engine; the SDF drives the
        # batched channel-last engine (one bilinear lookup per probe)
        sdf = maze.compile_sdf(self.maze_map, maze_size_scaling)
        self.model = ant_model.build_ant(static_boxes=self.boxes, dt=dt,
                                         n_substeps=n_substeps, **sdf)
        goals = maze.GOALS[name]
        self.goal_xy = jnp.asarray([g[0] for g in goals])      # [G, 2]
        self.goal_reward = jnp.asarray([g[1] for g in goals])  # [G]
        self.num_goals = len(goals)
        self.max_episode_steps = maze.EPISODE_LEN.get(name, 500)
        self.random_init = random_init
        self.reward_type = reward_type
        self.obs_dim = 29
        self.action_dim = 8
        self.maze_size_scaling = maze_size_scaling
        # the fused Pallas substep kernel (physics/pallas_ant.py) is the
        # fastest path on TPU (~10x over the XLA channel-last engine);
        # Mosaic doesn't target CPU, so tests fall back automatically
        self._pallas_tile = 256
        self._pallas_step = None
        if use_pallas == "auto":
            use_pallas = jax.default_backend() not in ("cpu",)
        if use_pallas:
            from ddiffpg_tpu.physics import pallas_ant

            self._pallas_step = pallas_ant.make_substep_kernel(
                self.model, tile=self._pallas_tile)

    # -- single-env functional API (vmap over envs via VecEnv) --------------

    def _obs(self, qpos, qvel):
        return jnp.concatenate([qpos[:15], qvel[:14]])

    def _init_state(self, key):
        k_xy, key = jax.random.split(key)
        qpos = jnp.asarray(self.model.init_qpos)
        if self.random_init:
            xy = jax.random.uniform(k_xy, (2,), minval=-2.0, maxval=2.0)
            qpos = qpos.at[:2].set(xy)
        qvel = jnp.asarray(self.model.init_qvel)
        return EnvState(qpos=qpos, qvel=qvel, t=jnp.asarray(0, jnp.int32),
                        key=key)

    def reset(self, key):
        state = self._init_state(key)
        return state, self._obs(state.qpos, state.qvel)

    def check_goal(self, xy):
        """(reached, goal_id, reward) — goal_reaching_env.py:37-48; the
        dense variant returns -distance to the nearest goal
        (goal_reaching_env.py:28-35)."""
        d = jnp.linalg.norm(xy[None, :] - self.goal_xy, axis=-1)
        hit = d <= 0.5
        any_hit = hit.any()
        first = jnp.argmax(hit)
        goal_id = jnp.where(any_hit, first + 1, 0).astype(jnp.int32)
        if self.reward_type == "dense":
            reward = -d.min()
        else:
            reward = jnp.where(any_hit, self.goal_reward[first], 0.0)
        return any_hit, goal_id, reward

    def step(self, state: EnvState, action):
        qpos, qvel = engine.step(self.model, state.qpos, state.qvel, action)
        reached, goal_id, reward = self.check_goal(qpos[:2])

        t = state.t + 1
        truncated = t >= self.max_episode_steps
        terminated = reached
        # safety net: numerically-broken, escaped or wall-vaulting envs
        # terminate and reset. The ceiling sits at the wall top (2 m,
        # maze_height 0.5 x scaling 4): hopping out of the maze would
        # change the MDP, and the plain MuJoCo ant considers z > 1 dead
        # anyway (ant.py:84-86). Numerically-broken or escaped envs
        # reset (a tunneling event at clamp speed can otherwise leave the
        # world and eventually overflow; MuJoCo's plain ant uses an
        # aliveness envelope similarly, ant.py:84-86)
        bad = (~(jnp.isfinite(qpos).all() & jnp.isfinite(qvel).all())
               | (jnp.abs(qpos[:2]) > 60.0).any()
               | (qpos[2] < -0.5) | (qpos[2] > 2.0))
        done = terminated | truncated | bad

        obs = jnp.nan_to_num(self._obs(qpos, qvel), nan=0.0,
                             posinf=0.0, neginf=0.0)

        # auto-reset
        k_reset, key = jax.random.split(state.key)
        reset_state = self._init_state(k_reset)
        new_state = jax.tree.map(
            lambda r, c: jnp.where(done, r, c),
            reset_state,
            EnvState(qpos=qpos, qvel=qvel, t=t, key=key),
        )
        info = {
            "success": goal_id,
            "time_outs": truncated & ~terminated,
        }
        return new_state, obs, reward, done, info

    # -- batched fast path (channel-last engine; see physics/engine_cl.py) --

    def step_batched(self, state: EnvState, action):
        from ddiffpg_tpu.physics import engine_cl

        if self._pallas_step is not None:
            from ddiffpg_tpu.envs.base import pallas_step_padded
            qpos, qvel = pallas_step_padded(
                self._pallas_step, self._pallas_tile,
                state.qpos, state.qvel, action)
        else:
            qpos, qvel = engine_cl.step(self.model, state.qpos, state.qvel,
                                        action)
        d = jnp.linalg.norm(qpos[:, None, :2] - self.goal_xy[None], axis=-1)
        hit = d <= 0.5                                   # [B, G]
        reached = hit.any(axis=-1)
        first = jnp.argmax(hit, axis=-1)
        goal_id = jnp.where(reached, first + 1, 0).astype(jnp.int32)
        if self.reward_type == "dense":
            reward = -d.min(axis=-1)
        else:
            reward = jnp.where(reached, self.goal_reward[first], 0.0)

        t = state.t + 1
        truncated = t >= self.max_episode_steps
        bad = (~(jnp.isfinite(qpos).all(axis=-1)
                 & jnp.isfinite(qvel).all(axis=-1))
               | (jnp.abs(qpos[:, :2]) > 60.0).any(axis=-1)
               | (qpos[:, 2] < -0.5) | (qpos[:, 2] > 2.0))
        done = reached | truncated | bad
        obs = jnp.nan_to_num(
            jnp.concatenate([qpos[:, :15], qvel[:, :14]], axis=-1),
            nan=0.0, posinf=0.0, neginf=0.0)

        keys = jax.vmap(jax.random.split)(state.key)
        reset_state = jax.vmap(self._init_state)(keys[:, 0])
        cur = EnvState(qpos=qpos, qvel=qvel, t=t, key=keys[:, 1])
        new_state = jax.tree.map(
            lambda r, c: jnp.where(
                done.reshape((-1,) + (1,) * (c.ndim - 1)), r, c),
            reset_state, cur)
        info = {"success": goal_id, "time_outs": truncated & ~reached}
        return new_state, obs, reward, done, info
