"""Panda arm + manipulation task tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddiffpg_tpu.envs.panda import PandaTaskEnv, make_panda_env
from ddiffpg_tpu.physics import engine
from ddiffpg_tpu.physics import panda as P

KEY = jax.random.PRNGKey(0)


class TestKinematics:
    def test_fk_reachable_workspace(self):
        model, meta = P.build_panda_scene("Reach")
        qpos = jnp.asarray(model.init_qpos)
        bp, bq = engine.fk(model, qpos)
        p_ee = P.ee_position(model, meta, bp, bq)
        # EE within arm reach (~0.855 m) of the base
        d = np.linalg.norm(np.asarray(p_ee) - np.asarray(P.BASE_POS))
        assert 0.1 < d < 1.2
        assert float(p_ee[2]) > 0.0

    def test_jacobian_matches_finite_difference(self):
        model, meta = P.build_panda_scene("Reach")
        qpos = jnp.asarray(model.init_qpos)
        bp, bq = engine.fk(model, qpos)
        J, p0 = P.ee_jacobian(model, meta, bp, bq)
        adr = meta["arm_qposadr"]
        eps = 1e-4
        for k in range(7):
            qp = qpos.at[int(adr[k])].add(eps)
            bp2, bq2 = engine.fk(model, qp)
            p1 = P.ee_position(model, meta, bp2, bq2)
            fd = (p1 - p0) / eps
            np.testing.assert_allclose(np.asarray(J[:, k]), np.asarray(fd),
                                       atol=2e-3)

    def test_ik_converges(self):
        model, meta = P.build_panda_scene("Reach")
        qpos = jnp.asarray(model.init_qpos)
        bp, bq = engine.fk(model, qpos)
        p0 = P.ee_position(model, meta, bp, bq)
        target = p0 + jnp.array([0.04, 0.02, 0.03])
        q_arm = P.dls_ik(model, meta, qpos, target, iters=5)
        q_new = qpos.at[jnp.asarray(meta["arm_qposadr"])].set(q_arm)
        bp2, bq2 = engine.fk(model, q_new)
        p1 = P.ee_position(model, meta, bp2, bq2)
        assert float(jnp.linalg.norm(p1 - target)) < 0.01


class TestEnvs:
    @pytest.mark.parametrize("task,obs_dim,act_dim", [
        ("Reach", 6, 7), ("PegInsertion", 7, 8),
        ("DrawerMulti", 11, 8), ("Cabinet", 8, 8)])
    def test_spaces_and_step(self, task, obs_dim, act_dim):
        env = PandaTaskEnv(task=task, control_type="joints")
        assert env.obs_dim == obs_dim and env.action_dim == act_dim
        st, obs = env.reset(KEY)
        assert obs.shape == (obs_dim,)
        step = jax.jit(env.step)
        for _ in range(3):
            st, obs, r, d, info = step(st, jnp.zeros(act_dim))
        assert bool(jnp.isfinite(obs).all())
        assert float(r) == 0.0 and not bool(d)

    def test_pd_holds_pose(self):
        env = PandaTaskEnv(task="Reach", control_type="joints")
        st, obs0 = env.reset(KEY)
        step = jax.jit(env.step)
        st1 = st
        for _ in range(25):  # 1 second
            st1, obs, r, d, info = step(st1, jnp.zeros(env.action_dim))
        # gravity sag stays small under PD hold
        assert float(jnp.linalg.norm(obs[:3] - obs0[:3])) < 0.08

    def test_joints_move_ee(self):
        env = PandaTaskEnv(task="Reach", control_type="joints")
        st, obs0 = env.reset(KEY)
        step = jax.jit(env.step)
        a = jnp.zeros(env.action_dim).at[1].set(1.0)
        for _ in range(10):
            st, obs, r, d, info = step(st, a)
        assert float(jnp.linalg.norm(obs[:3] - obs0[:3])) > 0.05

    def test_ee_control_mode(self):
        env = PandaTaskEnv(task="Reach", control_type="ee")
        assert env.action_dim == 3
        st, obs0 = env.reset(KEY)
        step = jax.jit(env.step)
        a = jnp.array([1.0, 0.0, 0.0])  # push +x
        for _ in range(10):
            st, obs, r, d, info = step(st, a)
        assert float(obs[0] - obs0[0]) > 0.03

    def test_reach_success_at_goal(self):
        env = PandaTaskEnv(task="Reach", control_type="joints")
        st, obs = env.reset(KEY)
        # teleport arm so EE is at the goal: solve IK to the goal
        model, meta = env.model, env.meta
        q_arm = P.dls_ik(model, meta, st.qpos,
                         jnp.asarray(meta["goal"]), iters=30)
        qpos = st.qpos.at[jnp.asarray(meta["arm_qposadr"])].set(q_arm)
        bp, bq = engine.fk(model, qpos)
        d = float(jnp.linalg.norm(
            P.ee_position(model, meta, bp, bq) - jnp.asarray(meta["goal"])))
        if d < 0.09:  # IK reached the goal region
            st2 = st._replace(qpos=qpos)
            st3, obs, r, done, info = jax.jit(env.step)(
                st2, jnp.zeros(env.action_dim))
            assert float(r) == 10.0 and bool(done)
            assert int(info["success"]) == 1

    def test_drawer_push_success(self):
        env = PandaTaskEnv(task="DrawerMulti", control_type="joints")
        st, obs = env.reset(KEY)
        # force drawer 0 closed -> success on next step
        qpos = st.qpos.at[int(env.meta["task_qposadr"][0])].set(0.02)
        st2 = st._replace(qpos=qpos)
        st3, obs, r, done, info = jax.jit(env.step)(
            st2, jnp.zeros(env.action_dim))
        assert float(r) == 10.0 and bool(done)

    def test_cabinet_open_success(self):
        env = PandaTaskEnv(task="Cabinet", control_type="joints")
        st, obs = env.reset(KEY)
        qpos = st.qpos.at[int(env.meta["task_qposadr"][0])].set(0.5)
        st2 = st._replace(qpos=qpos)
        st3, obs, r, done, info = jax.jit(env.step)(
            st2, jnp.zeros(env.action_dim))
        assert float(r) == 10.0 and bool(done)

    def test_name_parsing(self):
        env = make_panda_env("PandaReachJoints-v3")
        assert env.task == "Reach" and env.control_type == "joints"
        env = make_panda_env("PandaDrawerMultiJointsDense-v3")
        assert env.task == "DrawerMulti" and env.reward_type == "dense"
        env = make_panda_env("PandaPegInsertionRandom-v3")
        assert env.task == "PegInsertion" and env.random_init_pos


class TestServoTracking:
    """Gravity-compensated stiff servos (engine.py:actuator_torques).

    PyBullet POSITION_CONTROL holds a target against gravity and covers a
    0.05-rad delta within one 0.04 s control step (force-limit slew).
    The pre-fix explicit PD (kp=400, no gravity comp) sagged under the
    shoulder gravity load — commanding +0.05 rad/step on joint 1 moved it
    -0.0007 rad/step, so delta-target actions (panda.py:179-182 semantics)
    never tracked and sparse-reward exploration was frozen in a ~6 cm EE
    box. Both assertions below fail on the pre-fix engine.
    """

    def test_delta_target_tracks_under_gravity(self):
        from ddiffpg_tpu.envs import make
        env = make("PandaReachJoints-v3", num_envs=2, use_pallas=False)
        st, obs = env.reset(KEY)
        adr = np.asarray(env.env.meta["arm_qposadr"])
        act = jnp.zeros((2, env.action_dim)).at[:, 1].set(1.0)

        def body(carry, _):
            st, obs = carry
            st, obs, *_ = env.step(st, act)
            return (st, obs), st.qpos
        (_, _), qs = jax.lax.scan(body, (st, obs), None, length=40)
        q1 = np.asarray(qs)[:, 0, :][:, adr][:, 1]
        per_step = np.diff(q1).mean()
        # commanded +0.05 rad/step; require >= 80% tracked (pre-fix: -1%)
        assert per_step > 0.04, per_step

    def test_hold_pose_against_gravity(self):
        from ddiffpg_tpu.envs import make
        env = make("PandaReachJoints-v3", num_envs=2, use_pallas=False)
        st, obs = env.reset(KEY)
        q0 = np.asarray(st.qpos[0])
        act = jnp.zeros((2, env.action_dim))

        def body(carry, _):
            st, obs = carry
            st, obs, *_ = env.step(st, act)
            return (st, obs), st.qpos
        (_, _), qs = jax.lax.scan(body, (st, obs), None, length=50)
        adr = np.asarray(env.env.meta["arm_qposadr"])
        drift = np.abs(np.asarray(qs)[-1, 0][adr] - q0[adr])
        # no sag: every arm joint stays near neutral under zero action
        assert drift.max() < 0.2, drift
