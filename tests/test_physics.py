"""Physics engine tests against analytic mechanics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddiffpg_tpu.physics import engine, maze
from ddiffpg_tpu.physics import types as T
from ddiffpg_tpu.physics.ant import build_ant
from ddiffpg_tpu.physics.builder import BodySpec, GeomSpec, JointSpec, build


def _free_sphere(z0=5.0, **kw):
    body = BodySpec("ball", "", joint=JointSpec(T.FREE),
                    geoms=[GeomSpec(T.SPHERE, (0.1,), density=1000.0)])
    init = np.zeros(7, np.float32)
    init[2] = z0
    init[3] = 1.0
    return build([body], [], init_qpos=init, **kw)


def _pendulum(damping=0.0, armature=0.0):
    # point-ish mass at the end of a 1 m massless-ish rod, hinge at origin
    body = BodySpec(
        "rod", "", pos=(0, 0, 2.0),
        joint=JointSpec(T.HINGE, axis=(0, 1, 0), damping=damping,
                        armature=armature),
        geoms=[GeomSpec(T.SPHERE, (0.05,), pos=(1.0, 0.0, 0.0),
                        density=1000.0)])
    return build([body], [("rod", 1.0)], dt=0.001, n_substeps=10)


class TestFreeFall:
    def test_ballistic(self):
        m = _free_sphere(z0=5.0, dt=0.01, n_substeps=10)
        qpos = jnp.asarray(m.init_qpos)
        qvel = jnp.asarray(m.init_qvel).at[0].set(1.0)  # vx = 1
        step = jax.jit(lambda qp, qv: engine.step(m, qp, qv, jnp.zeros(0)))
        for _ in range(5):  # 0.5 s
            qpos, qvel = step(qpos, qvel)
        t = 0.5
        np.testing.assert_allclose(qpos[2], 5.0 - 0.5 * 9.81 * t**2, atol=0.03)
        np.testing.assert_allclose(qpos[0], 1.0 * t, atol=1e-3)
        np.testing.assert_allclose(qvel[2], -9.81 * t, atol=0.02)

    def test_spin_preserved(self):
        m = _free_sphere(z0=50.0, dt=0.01, n_substeps=10)
        qpos = jnp.asarray(m.init_qpos)
        qvel = jnp.asarray(m.init_qvel).at[3:6].set(jnp.array([0.0, 0.0, 3.0]))
        step = jax.jit(lambda qp, qv: engine.step(m, qp, qv, jnp.zeros(0)))
        for _ in range(10):
            qpos, qvel = step(qpos, qvel)
        np.testing.assert_allclose(qvel[3:6], [0, 0, 3.0], atol=1e-4)


class TestPendulum:
    def test_energy_conservation(self):
        m = _pendulum()
        qpos = jnp.asarray(m.init_qpos).at[0].set(0.8)
        qvel = jnp.asarray(m.init_qvel)
        sphere_m = 1000.0 * 4 / 3 * np.pi * 0.05**3
        I_hinge = sphere_m * 1.0**2 + 2 / 5 * sphere_m * 0.05**2

        def energy(q, qd):
            # pivot at z=2, bob at distance 1; height = 2 - is wrong: bob at
            # (cos q, 0, 2 - ... rotation about +y axis: x' = cos(q)*1,
            # z' = 2 - sin(q)? axis y: rotating x toward -z for positive q
            x = np.cos(q)
            z = 2.0 - np.sin(q)
            return 0.5 * I_hinge * qd**2 + sphere_m * 9.81 * z

        e0 = energy(0.8, 0.0)
        step = jax.jit(lambda qp, qv: engine.step(m, qp, qv, jnp.zeros(1)))
        for _ in range(100):  # 1 s at dt=1e-3
            qpos, qvel = step(qpos, qvel)
        e1 = energy(float(qpos[0]), float(qvel[0]))
        assert abs(e1 - e0) / e0 < 0.02

    def test_small_oscillation_frequency(self):
        m = _pendulum()
        sphere_m = 1000.0 * 4 / 3 * np.pi * 0.05**3
        I_hinge = sphere_m * 1.0**2 + 2 / 5 * sphere_m * 0.05**2
        omega = np.sqrt(sphere_m * 9.81 * 1.0 / I_hinge)
        # equilibrium is q = pi/2 (bob hanging down); oscillate around it
        qpos = jnp.asarray(m.init_qpos).at[0].set(np.pi / 2 + 0.05)
        qvel = jnp.asarray(m.init_qvel)
        step = jax.jit(lambda qp, qv: engine.step(m, qp, qv, jnp.zeros(1)))
        angles = []
        for _ in range(400):  # 4 s
            qpos, qvel = step(qpos, qvel)
            angles.append(float(qpos[0]) - np.pi / 2)
        angles = np.array(angles)
        crossings = np.where(np.diff(np.sign(angles)) != 0)[0]
        half_period = np.diff(crossings).mean() * 0.01
        np.testing.assert_allclose(np.pi / half_period, omega, rtol=0.05)

    def test_gravity_torque_static(self):
        """At angle 0 (bob horizontal) the bias torque equals m g l."""
        m = _pendulum()
        qpos = jnp.asarray(m.init_qpos)
        qvel = jnp.asarray(m.init_qvel)
        body_pos, body_quat = engine.fk(m, qpos)
        S = engine.dof_subspaces(m, body_pos, body_quat)
        u = engine.qvel_to_u(m, qvel, body_pos)
        V = engine.body_velocities(m, S, u)
        I6 = engine.spatial_inertia(m, body_pos, body_quat)
        tau = engine.bias_forces(m, I6, S, V, u, jnp.zeros((m.nb, 6)))
        sphere_m = 1000.0 * 4 / 3 * np.pi * 0.05**3
        # positive rotation about +y lowers the bob -> gravity bias torque
        np.testing.assert_allclose(tau[0], -sphere_m * 9.81 * 1.0, rtol=1e-3)


class TestContacts:
    def test_sphere_rests_on_plane(self):
        m = _free_sphere(z0=0.3, dt=0.005, n_substeps=40)
        qpos, qvel = jnp.asarray(m.init_qpos), jnp.asarray(m.init_qvel)
        step = jax.jit(lambda qp, qv: engine.step(m, qp, qv, jnp.zeros(0)))
        for _ in range(10):  # 2 s
            qpos, qvel = step(qpos, qvel)
        # settled near z = r with small penetration
        assert 0.02 < float(qpos[2]) < 0.12
        assert abs(float(qvel[2])) < 0.05
        np.testing.assert_allclose(qpos[:2], 0.0, atol=1e-4)

    def test_wall_blocks(self):
        boxes = np.array([(((1.0, -5, 0.0)), ((2.0, 5, 3.0)))], np.float32)
        m = _free_sphere(z0=0.1, dt=0.005, n_substeps=40)
        m = type(m)(**{**m.__dict__, "static_box_min": boxes[:, 0],
                       "static_box_max": boxes[:, 1], "nsb": 1})
        qpos = jnp.asarray(m.init_qpos)
        qvel = jnp.asarray(m.init_qvel).at[0].set(4.0)  # slam into the wall
        step = jax.jit(lambda qp, qv: engine.step(m, qp, qv, jnp.zeros(0)))
        for _ in range(10):  # 2 s
            qpos, qvel = step(qpos, qvel)
        # pushed back out of the wall (center < face x=1), never tunneled
        assert float(qpos[0]) < 1.0


class TestAnt:
    def test_mass_properties(self):
        m = build_ant()
        assert m.nq == 15 and m.nv == 14 and m.nb == 9 and m.nu == 8
        # torso: sphere 0.327 kg + 4 aux capsules
        assert 0.3 < m.mass[0] < 0.6
        assert 0.8 < m.mass.sum() < 1.2

    def test_settles_upright(self):
        m = build_ant(dt=0.005, n_substeps=20)
        qpos, qvel = jnp.asarray(m.init_qpos), jnp.asarray(m.init_qvel)
        step = jax.jit(lambda qp, qv, c: engine.step(m, qp, qv, c))
        for _ in range(20):  # 2 s, zero action
            qpos, qvel = step(qpos, qvel, jnp.zeros(8))
        assert bool(jnp.all(jnp.isfinite(qpos))) and bool(jnp.all(jnp.isfinite(qvel)))
        assert 0.2 <= float(qpos[2]) <= 1.0          # alive band (ant.py:84-86)
        assert float(jnp.linalg.norm(qvel)) < 1.0    # roughly settled

    def test_actions_move_it(self):
        m = build_ant(dt=0.005, n_substeps=20)
        qpos, qvel = jnp.asarray(m.init_qpos), jnp.asarray(m.init_qvel)
        step = jax.jit(lambda qp, qv, c: engine.step(m, qp, qv, c))
        key = jax.random.PRNGKey(0)
        for i in range(30):
            key, k = jax.random.split(key)
            ctrl = jax.random.uniform(k, (8,), minval=-1, maxval=1)
            qpos, qvel = step(qpos, qvel, ctrl)
        assert bool(jnp.all(jnp.isfinite(qpos)))
        moved = float(jnp.linalg.norm(qpos[:2]))
        assert moved > 0.05  # random flailing displaces the torso

    def test_crba_spd(self):
        m = build_ant()
        key = jax.random.PRNGKey(1)
        qpos = jnp.asarray(m.init_qpos).at[7:].add(
            jax.random.uniform(key, (8,), minval=-0.3, maxval=0.3))
        body_pos, body_quat = engine.fk(m, qpos)
        S = engine.dof_subspaces(m, body_pos, body_quat)
        I6 = engine.spatial_inertia(m, body_pos, body_quat)
        M = np.asarray(engine.crba(m, I6, S))
        np.testing.assert_allclose(M, M.T, atol=1e-5)
        assert np.linalg.eigvalsh(M).min() > 0


class TestMaze:
    def test_boxes_v1(self):
        boxes = maze.compile_boxes(maze.MAZE_v1)
        assert boxes.shape[0] == 17  # 16 border + 1 inner wall
        # goal cell (-8, 0) must be free: no box contains it
        inside = ((boxes[:, 0, 0] < -8) & (-8 < boxes[:, 1, 0])
                  & (boxes[:, 0, 1] < 0) & (0 < boxes[:, 1, 1]))
        assert not inside.any()
        # origin (reset cell) free too
        inside0 = ((boxes[:, 0, 0] < 0) & (0 < boxes[:, 1, 0])
                   & (boxes[:, 0, 1] < 0) & (0 < boxes[:, 1, 1]))
        assert not inside0.any()

    def test_goals(self):
        assert maze.GOALS["antmaze-v2"][0] == ((-8.0, 8.0), 20.0)
        assert maze.EPISODE_LEN["antmaze-v3"] == 700


class TestVelocityClamps:
    def test_far_spin_translation_bounded(self):
        """Regression: a free body spinning at the angular clamp far from
        the origin must not translate at w*|pos| (the u-space clamp alone
        allowed vp = u_lin + w x pos to reach 100+ m/s and teleport
        through walls)."""
        m = _free_sphere(z0=0.5, dt=0.01, n_substeps=10)
        qpos = jnp.asarray(m.init_qpos).at[:2].set(jnp.array([10.0, -8.0]))
        qvel = jnp.zeros(6).at[3:6].set(m.max_qvel)   # spin at the clamp
        qp, qv = jax.jit(
            lambda a, b: engine.step(m, a, b, jnp.zeros(0)))(qpos, qvel)
        assert float(jnp.abs(qv).max()) <= m.max_qvel + 1e-4
        # one control step moves it at most max_qvel * dt * n_substeps
        assert float(jnp.abs(qp[:3] - qpos[:3]).max()) <= \
            m.max_qvel * m.dt * m.n_substeps + 1e-4

    def test_impact_dissipative(self):
        """Separation gate: a sphere dropped hard rebounds no faster than
        ~contact_maxrebound (the bare damped spring returned real energy
        on deep fast impacts)."""
        m = _free_sphere(z0=0.2, dt=0.002, n_substeps=5)
        qpos = jnp.asarray(m.init_qpos)
        qvel = jnp.zeros(6).at[2].set(-8.0)           # slam down at 8 m/s
        step = jax.jit(lambda a, b: engine.step(m, a, b, jnp.zeros(0)))
        max_up = 0.0
        for _ in range(100):                          # 1 s
            qpos, qvel = step(qpos, qvel)
            max_up = max(max_up, float(qvel[2]))
        assert max_up <= m.contact_maxrebound + 0.05

    def test_deep_fast_impact_no_catapult(self):
        """Impulse cap: at the ant's substep dt (0.01) a deep, fast
        penetration must not reverse into a super-rebound within one
        substep. The separation gate alone only sees the pre-substep
        velocity — without the cap, the stiff spring flipped v_n from
        -20 to +20 m/s in a single substep (observed in eval rollouts:
        torso z -0.19 -> +3.8 m, 82% of episodes killed by the z guard)."""
        m = _free_sphere(z0=0.5, dt=0.01, n_substeps=10)
        # already deeply penetrated (r=0.1, center almost at the floor)
        # and slamming down at the physical velocity clamp
        qpos = jnp.asarray(m.init_qpos).at[2].set(0.02)
        qvel = jnp.zeros(6).at[2].set(-20.0)
        step = jax.jit(lambda a, b: engine.step(m, a, b, jnp.zeros(0)))
        max_up = 0.0
        for _ in range(100):                          # 1 s
            qpos, qvel = step(qpos, qvel)
            max_up = max(max_up, float(qvel[2]))
        assert max_up <= m.contact_maxrebound + 0.05
        # and it must come to rest ON the floor, not below it
        assert 0.05 <= float(qpos[2]) <= 0.12


class TestFarFromOriginStability:
    """Regression for the round-3 residual launches: the spatial algebra
    formerly referenced the WORLD ORIGIN, so at r ~ 8 m the free-joint
    rows of M carry m*r^2 terms and the f32 Cholesky injects momentum
    (measured +13 kg m/s in ONE substep). The state below is captured
    from a real eval rollout (runs/antmaze_v1_r3c, env 15, t=298) that
    blew up from |vxy| 1.4 to 23 m/s within 11 control steps pre-fix.
    The robot-centered frame (engine.py:_substep) must keep it bounded."""

    QP = [-5.481694221496582, -2.5992870330810547, 0.500092625617981,
          0.9525787830352783, -0.08117830008268356, 0.044235583394765854,
          -0.2899087071418762, 0.5235987901687622, 0.5235987901687622,
          0.5235987901687622, -1.2217304706573486, 0.5235987901687622,
          -0.8046130537986755, 0.37590765953063965, 1.1036275625228882]
    QV = [-0.8750934600830078, -1.3466997146606445, 0.24976640939712524,
          -0.24573275446891785, -0.21751752495765686, -2.2186524868011475,
          0.0, 0.0, 0.0, 0.0, 0.0, 2.4140796661376953, 3.993561029434204,
          1.186004877090454]
    ACT = [
        [0.649415, 0.916664, 0.540672, -0.533983, -0.907600, -0.832537,
         -0.941184, 0.941556],
        [0.944287, 0.633580, 0.305590, 0.049132, -0.984640, -0.850554,
         -1.000000, 0.697050],
        [0.841326, 0.934823, 1.000000, 0.337045, -0.962951, -0.311659,
         -0.820242, 0.816920],
        [-0.956792, -0.991837, -0.058971, 0.331585, -0.968427, -0.201019,
         -0.753929, -0.319225],
        [-0.914876, -0.934188, -0.325873, -0.515632, -0.956973, -0.762846,
         0.824866, -0.819914],
        [-0.103351, -0.807767, -0.494838, 0.826497, 0.766533, 0.992542,
         0.859579, -0.794723],
        [0.948710, -0.962560, -0.658926, -0.405222, 1.000000, 0.859891,
         0.714431, 0.120559],
        [0.827656, 0.775441, 0.114986, -0.922026, 0.984370, 0.635575,
         0.908372, 0.858683],
        [0.990850, 0.958556, 0.785926, 0.865335, 0.989658, -0.592951,
         0.967026, 0.869396],
        [0.103378, 0.601040, 1.000000, -0.386693, 0.887465, -0.938120,
         -0.174436, -0.949629],
        [0.941373, 0.379627, 0.874113, -0.513002, -0.535004, -0.943248,
         -0.341342, 0.355413],
        [0.921831, 0.759122, -0.287065, 0.268935, -0.500123, -0.799875,
         0.955142, 0.926798],
        [0.678612, 0.722199, -0.205381, -0.952015, 0.244067, 0.474572,
         -0.883666, 1.000000],
        [-0.996598, -0.923599, -0.042245, -0.574357, -0.116409, 0.813202,
         0.668859, 1.000000]]

    def _replay(self, step_fn, qp, qv):
        peak = 0.0
        for ctrl in self.ACT:
            qp, qv = step_fn(qp, qv, jnp.asarray(ctrl))
            peak = max(peak, float(jnp.linalg.norm(qv[:2])))
        return peak, qp, qv

    def test_launch_state_replay_bounded(self):
        boxes = maze.compile_boxes(maze.MAZES["antmaze-v1"])
        m = build_ant(static_boxes=boxes, dt=0.01, n_substeps=10)
        step = jax.jit(lambda a, b, c: engine.step(m, a, b, c))
        peak, qp, qv = self._replay(step, jnp.asarray(self.QP),
                                    jnp.asarray(self.QV))
        # pre-fix: 23.2 m/s. Legitimate ant locomotion stays under ~4.
        assert peak < 5.0, f"launch regression: |vxy| peaked at {peak:.2f}"
        assert float(qp[2]) < 1.0

    def test_momentum_conservation_far_from_origin(self):
        """Per-substep momentum creation must stay at contact/limit-stop
        scale (pre-fix: +13 kg m/s in one substep at r=7.4 m)."""
        boxes = maze.compile_boxes(maze.MAZES["antmaze-v1"])
        m = build_ant(static_boxes=boxes, dt=0.01, n_substeps=10)
        from ddiffpg_tpu.physics import quat as Q
        mass = jnp.asarray(m.mass)

        def momentum(qp, qv):
            body_pos, body_quat = engine.fk(m, qp)
            p0 = body_pos.mean(axis=0)
            bp = body_pos - p0
            S = engine.dof_subspaces(m, bp, body_quat)
            u = engine.qvel_to_u(m, qv, bp)
            V = engine.body_velocities(m, S, u)
            R = Q.to_matrix(body_quat)
            c = bp + jnp.einsum("bij,bj->bi", R, jnp.asarray(m.com))
            v_com = V[:, 3:] + jnp.cross(V[:, :3], c)
            return (mass[:, None] * v_com).sum(0)

        qp, qv = jnp.asarray(self.QP), jnp.asarray(self.QV)
        sub = jax.jit(lambda a, b, c: engine.substep(m, a, b, c))
        worst = 0.0
        for ctrl in self.ACT:
            c = jnp.asarray(ctrl)
            for _ in range(m.n_substeps):
                p_before = momentum(qp, qv)
                qp, qv = sub(qp, qv, c)
                p_after = momentum(qp, qv)
                # generous bound: contact + actuator-via-friction + limit
                # stops can move a few N*dt = O(0.1) kg m/s per substep
                worst = max(worst, float(
                    jnp.linalg.norm(p_after - p_before)))
        assert worst < 1.0, f"momentum injection: {worst:.2f} kg m/s"


class TestWallContainment:
    def test_thrashing_ant_never_leaves_maze(self):
        """Regression for the wall-escape trajectories in the v2
        unsuccess-cluster plots (|xy| out to 25-35 m, pre-frame-fix
        physics): an ant thrashing at full alternating torque against the
        border wall for 6 s must stay inside the maze bounds (v2 outer
        wall: |x|,|y| <= 14 m; escapes mean tunneling or solver-injected
        momentum)."""
        from ddiffpg_tpu.physics import maze as maze_mod
        boxes = maze_mod.compile_boxes(maze_mod.MAZES["antmaze-v2"])
        m = build_ant(static_boxes=boxes, dt=0.01, n_substeps=10)
        qpos = jnp.asarray(m.init_qpos).at[:2].set(
            jnp.array([-9.5, 9.0]))            # top-left corner pocket
        qvel = jnp.asarray(m.init_qvel).at[0].set(-3.0)  # charging the wall
        step = jax.jit(lambda a, b, c: engine.step(m, a, b, c))
        key = jax.random.PRNGKey(0)
        for t in range(120):                   # 12 s of violent input
            key, k = jax.random.split(key)
            ctrl = jnp.sign(jax.random.normal(k, (8,)))   # bang-bang torque
            qpos, qvel = step(qpos, qvel, ctrl)
            xy = np.abs(np.asarray(qpos[:2]))
            assert (xy < 14.5).all(), f"escaped at t={t}: {qpos[:2]}"
        assert float(qpos[2]) > -0.5
