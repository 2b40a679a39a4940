"""Panda manipulation environments: Reach, PegInsertion, DrawerMulti,
Cabinet.

Reference semantics (files under `/root/reference/ddiffpg/env/panda_gym/`):
  * obs = [ee pos (3), ee vel (3)] (+ fingers width when the gripper is
    free) ++ task obs (drawer joints / cabinet joint) — core.py:268-276,
    robots/panda.py:185-195; the dict obs' 'observation' entry is what the
    reference wrapper feeds the agent (wrappers/pybullet_wrapper.py)
  * actions: 'joints' -> delta q * 0.05 as PD position targets
    (panda.py:170-183); 'ee' -> EE displacement * 0.05 through IK
    (panda.py:148-168); optional last dim drives finger width (+- 0.2 max)
  * sparse reward 10 at success, 0 otherwise (dense: -distance);
    terminated = is_success; truncation at 100 steps (old__init__.py:115)
  * success criteria: Reach |ee - goal| < 0.1 (goal (-0.05, 0, 0.65)
    behind a cross obstacle); PegInsertion peg tip within 0.03 of either
    hole; DrawerMulti any drawer joint <= 0.03 (init 0.17); Cabinet door
    joint >= 0.4
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu.envs.base import EnvState
from ddiffpg_tpu.physics import engine
from ddiffpg_tpu.physics import panda as P


class PandaTaskEnv:
    def __init__(self, task: str = "Reach", reward_type: str = "sparse",
                 control_type: str = "joints", random_init_pos: bool = False,
                 max_episode_steps: int = 100, use_pallas: str | bool = "auto"):
        self.task = task
        self.reward_type = reward_type
        self.control_type = control_type
        self.random_init_pos = random_init_pos
        self.max_episode_steps = max_episode_steps
        self.model, self.meta = P.build_panda_scene(task)
        self.block_gripper = task == "Reach"
        self._pallas_tile = 256
        self._pallas_step = None
        if use_pallas == "auto":
            use_pallas = jax.default_backend() not in ("cpu",)
        if use_pallas:
            from ddiffpg_tpu.physics import pallas_ant

            self._pallas_step = pallas_ant.make_substep_kernel(
                self.model, tile=self._pallas_tile)

        n_task_obs = {"Reach": 0, "PegInsertion": 0, "DrawerMulti": 4,
                      "Cabinet": 1}[task]
        # 1-based goal ids emitted by _success_reward; used by the eval
        # loop's per-goal breakdown (multi-drawer / two-hole multimodality)
        self.num_goals = {"Reach": 1,
                          "PegInsertion": len(self.meta.get("goals", [0])),
                          "DrawerMulti": len(self.meta["task_qposadr"]),
                          "Cabinet": 1}[task]
        self.obs_dim = 6 + (0 if self.block_gripper else 1) + n_task_obs
        n_act = 3 if control_type == "ee" else 7
        self.action_dim = n_act + (0 if self.block_gripper else 1)

    # ------------------------------------------------------------------- obs

    def _ee_state(self, qpos, qvel):
        # f32 matmuls: FK/subspace einsums feed the success test, the
        # reward, AND the policy obs; at the TPU default (bf16 inputs) the
        # EE estimate picks up mm-to-cm error that train-time (256-env
        # pallas path) and eval-time never agreed on. Physics itself pins
        # f32 inside the engines; this pins the obs/reward side.
        with jax.default_matmul_precision("float32"):
            return self._ee_state_f32(qpos, qvel)

    def _ee_state_f32(self, qpos, qvel):
        body_pos, body_quat = engine.fk(self.model, qpos)
        p_ee = P.ee_position(self.model, self.meta, body_pos, body_quat)
        S = engine.dof_subspaces(self.model, body_pos, body_quat)
        u = engine.qvel_to_u(self.model, qvel, body_pos)
        V = engine.body_velocities(self.model, S, u)
        h = self.meta["hand_idx"]
        v_ee = V[h, 3:] + jnp.cross(V[h, :3], p_ee)
        return p_ee, v_ee, body_pos, body_quat

    def _obs_from(self, qpos, p_ee, v_ee):
        """Build the observation from a precomputed ee state, so one FK per
        step serves both the reward and the obs."""
        parts = [p_ee, v_ee]
        if not self.block_gripper:
            fq = qpos[jnp.asarray(self.meta["finger_qposadr"])]
            parts.append(fq.sum()[None])
        if self.task in ("DrawerMulti", "Cabinet"):
            parts.append(qpos[jnp.asarray(self.meta["task_qposadr"])])
        return jnp.concatenate(parts)

    def _obs(self, qpos, qvel):
        p_ee, v_ee, _, _ = self._ee_state(qpos, qvel)
        return self._obs_from(qpos, p_ee, v_ee)

    # ------------------------------------------------------------- reset

    def _init_state(self, key):
        k_noise, key = jax.random.split(key)
        qpos = jnp.asarray(self.model.init_qpos)
        if self.random_init_pos:
            adr = jnp.asarray(self.meta["arm_qposadr"])
            noise = jax.random.uniform(k_noise, (7,), minval=-0.1, maxval=0.1)
            qpos = qpos.at[adr].add(noise)
        qvel = jnp.asarray(self.model.init_qvel)
        return EnvState(qpos=qpos, qvel=qvel, t=jnp.asarray(0, jnp.int32),
                        key=key)

    def reset(self, key):
        st = self._init_state(key)
        return st, self._obs(st.qpos, st.qvel)

    # ------------------------------------------------------------- goals

    def _success_reward(self, qpos, p_ee):
        if self.task == "Reach":
            d = jnp.linalg.norm(p_ee - jnp.asarray(self.meta["goal"]))
            succ = d < self.meta["threshold"]
            goal_id = jnp.where(succ, 1, 0)
            dense = -d
        elif self.task == "PegInsertion":
            goals = jnp.asarray(self.meta["goals"])
            d = jnp.linalg.norm(p_ee[None] - goals, axis=-1)
            succ = (d < self.meta["threshold"]).any()
            goal_id = jnp.where(succ, jnp.argmin(d) + 1, 0)
            dense = -d.min()
        elif self.task == "DrawerMulti":
            j = qpos[jnp.asarray(self.meta["task_qposadr"])]
            succ = (j <= self.meta["goal"]).any()
            goal_id = jnp.where(succ, jnp.argmin(j) + 1, 0)
            dense = -j.min()
        else:  # Cabinet
            j = qpos[jnp.asarray(self.meta["task_qposadr"])][0]
            succ = j >= self.meta["goal"]
            goal_id = jnp.where(succ, 1, 0)
            dense = -jnp.abs(j - self.meta["goal"])
        reward = jnp.where(succ, 10.0, 0.0)
        if self.reward_type == "dense":
            reward = dense.astype(jnp.float32)
        return succ, goal_id.astype(jnp.int32), reward

    # ------------------------------------------------------------- stepping

    def _ctrl_from_action(self, qpos, action):
        """action in [-1,1] -> full servo target vector [nu]."""
        with jax.default_matmul_precision("float32"):  # ee-mode FK/DLS-IK
            return self._ctrl_from_action_f32(qpos, action)

    def _ctrl_from_action_f32(self, qpos, action):
        action = jnp.clip(action, -1.0, 1.0)
        adr = jnp.asarray(self.meta["arm_qposadr"])
        cur = qpos[adr]
        if self.control_type == "ee":
            _, _, body_pos, body_quat = self._ee_state(qpos,
                                                       jnp.zeros(self.model.nv))
            p_ee = P.ee_position(self.model, self.meta, body_pos, body_quat)
            target_p = p_ee + action[:3] * 0.05
            target_p = target_p.at[2].max(0.0)
            target_q = P.dls_ik(self.model, self.meta, qpos, target_p)
        else:
            target_q = cur + action[:7] * 0.05
        target_q = jnp.clip(target_q, jnp.asarray(P.JOINT_LIMIT_LO),
                            jnp.asarray(P.JOINT_LIMIT_HI))

        if self.block_gripper:
            width = 0.03
            finger_t = jnp.array([width / 2, width / 2])
        else:
            fq = qpos[jnp.asarray(self.meta["finger_qposadr"])]
            target_w = fq.sum() + action[-1] * 0.2
            finger_t = jnp.clip(jnp.stack([target_w / 2, target_w / 2]),
                                0.0, 0.04)
        # ctrl layout matches actuator order: 7 arm servos then 2 fingers
        return jnp.concatenate([target_q, finger_t])

    def step(self, state: EnvState, action):
        ctrl = self._ctrl_from_action(state.qpos, action)
        qpos, qvel = engine.step(self.model, state.qpos, state.qvel, ctrl)

        p_ee, v_ee, _, _ = self._ee_state(qpos, qvel)
        succ, goal_id, reward = self._success_reward(qpos, p_ee)

        t = state.t + 1
        truncated = t >= self.max_episode_steps
        done = succ | truncated
        obs = self._obs_from(qpos, p_ee, v_ee)

        k_reset, key = jax.random.split(state.key)
        reset_state = self._init_state(k_reset)
        new_state = jax.tree.map(
            lambda r, c: jnp.where(done, r, c), reset_state,
            EnvState(qpos=qpos, qvel=qvel, t=t, key=key))
        info = {"success": goal_id, "time_outs": truncated & ~succ}
        return new_state, obs, reward, done, info

    # -- batched fast path (channel-last engine) ----------------------------

    def step_batched(self, state: EnvState, action):
        from ddiffpg_tpu.physics import engine_cl

        ctrl = jax.vmap(self._ctrl_from_action)(state.qpos, action)
        if self._pallas_step is not None:
            from ddiffpg_tpu.envs.base import pallas_step_padded
            qpos, qvel = pallas_step_padded(
                self._pallas_step, self._pallas_tile,
                state.qpos, state.qvel, ctrl)
        else:
            qpos, qvel = engine_cl.step(self.model, state.qpos, state.qvel,
                                        ctrl)

        p_ee, v_ee, _, _ = jax.vmap(self._ee_state)(qpos, qvel)
        succ, goal_id, reward = jax.vmap(self._success_reward)(qpos, p_ee)

        t = state.t + 1
        truncated = t >= self.max_episode_steps
        done = succ | truncated
        obs = jax.vmap(self._obs_from)(qpos, p_ee, v_ee)

        keys = jax.vmap(jax.random.split)(state.key)
        reset_state = jax.vmap(self._init_state)(keys[:, 0])
        cur = EnvState(qpos=qpos, qvel=qvel, t=t, key=keys[:, 1])
        new_state = jax.tree.map(
            lambda r, c: jnp.where(
                done.reshape((-1,) + (1,) * (c.ndim - 1)), r, c),
            reset_state, cur)
        info = {"success": goal_id, "time_outs": truncated & ~succ}
        return new_state, obs, reward, done, info


def make_panda_env(name: str, **kwargs):
    """Parse reference env ids: Panda{Task}{Joints}{Dense}{Random}-v3."""
    base = name.replace("-v3", "")
    assert base.startswith("Panda")
    base = base[len("Panda"):]
    random_init = base.endswith("Random")
    if random_init:
        base = base[: -len("Random")]
    dense = base.endswith("Dense")
    if dense:
        base = base[: -len("Dense")]
    joints = base.endswith("Joints")
    if joints:
        base = base[: -len("Joints")]
    task = base
    kwargs.setdefault("control_type", "joints" if joints else "ee")
    kwargs.setdefault("reward_type", "dense" if dense else "sparse")
    kwargs.setdefault("random_init_pos", random_init)
    return PandaTaskEnv(task=task, **kwargs)
