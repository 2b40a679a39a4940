"""7-DoF Franka Panda arm + task furniture, built on the articulated engine.

Replaces the PyBullet C++ stack of the reference
(`/root/reference/ddiffpg/env/panda_gym/`): URDF loading becomes a typed
chain spec with the standard Franka joint frames; PyBullet POSITION_CONTROL
with `joint_forces` (pybullet.py:368-383) becomes the engine's clamped PD
position servos; `calcInverseKinematics` (pybullet.py:385-403) becomes
damped-least-squares IK on the analytic positional Jacobian.

Scene layout follows the reference tasks: robot base at (-0.6, 0, 0), the
table top is the z=0 plane, task furniture is static AABBs plus 1-dof
dynamic boxes (drawer slides, cabinet door).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ddiffpg_tpu.physics import quat as Q
from ddiffpg_tpu.physics import types as T
from ddiffpg_tpu.physics.builder import BodySpec, GeomSpec, JointSpec, build

PI = np.pi

# Franka joint frames (xyz, rpy) in the parent link frame; all axes are the
# local +z (values from the standard franka_panda URDF used by panda-gym)
PANDA_JOINTS = [
    ((0.0, 0.0, 0.333), (0.0, 0.0, 0.0)),
    ((0.0, 0.0, 0.0), (-PI / 2, 0.0, 0.0)),
    ((0.0, -0.316, 0.0), (PI / 2, 0.0, 0.0)),
    ((0.0825, 0.0, 0.0), (PI / 2, 0.0, 0.0)),
    ((-0.0825, 0.384, 0.0), (-PI / 2, 0.0, 0.0)),
    ((0.0, 0.0, 0.0), (PI / 2, 0.0, 0.0)),
    ((0.088, 0.0, 0.0), (PI / 2, 0.0, 0.0)),
]
HAND_OFFSET = ((0.0, 0.0, 0.107), (0.0, 0.0, -PI / 4))
EE_OFFSET = np.array([0.0, 0.0, 0.1034])      # tcp in hand frame
PEG_TIP_OFFSET = np.array([0.0, 0.0, 0.19])   # peg tip below the hand

LINK_MASS = [4.97, 0.65, 3.23, 3.59, 1.23, 1.67, 0.74]
JOINT_FORCES = [87.0, 87.0, 87.0, 87.0, 12.0, 120.0, 120.0]
JOINT_LIMIT_LO = [-2.9671, -1.8326, -2.9671, -3.1416, -2.9671, -0.0873, -2.9671]
JOINT_LIMIT_HI = [2.9671, 1.8326, 2.9671, 0.0, 2.9671, 3.8223, 2.9671]
NEUTRAL = [0.0, -1.5, 0.0, -3.0, 0.0, 2.26, 0.79]           # reach neutral
NEUTRAL_PEG = [0.0, 0.41, 0.0, -1.85, 0.0, 2.26, 0.79]
NEUTRAL_CABINET = [-0.2, -0.5, 0.0, -2.6, 0.0, 2.2, 0.79]
FINGER_LIMIT = (0.0, 0.04)

BASE_POS = (-0.6, 0.0, 0.0)


def _rpy_quat(rpy):
    r, p, y = rpy
    qx = np.array([np.cos(r / 2), np.sin(r / 2), 0, 0])
    qy = np.array([np.cos(p / 2), 0, np.sin(p / 2), 0])
    qz = np.array([np.cos(y / 2), 0, 0, np.sin(y / 2)])

    def mul(a, b):
        w1, x1, y1, z1 = a
        w2, x2, y2, z2 = b
        return np.array([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])

    return tuple(mul(mul(qz, qy), qx))


def panda_bodies(neutral, has_peg=False, kp=20000.0, kd=300.0,
                 finger_force=170.0, block_gripper=False):
    # kp/kd: PyBullet's POSITION_CONTROL is a stiff velocity-level
    # constraint capped by maxForce (panda.py:51-52 joint_forces) — the
    # joint covers a 0.05-rad delta target within one 0.04 s control step
    # regardless of gravity. An explicit PD needs omega ~ 150 rad/s to
    # settle that fast; kp=2e4 saturates the per-joint force limit over
    # most of the travel (force-limit slew, exactly the PyBullet model)
    # and the limit + kd damping keep it stable at dt=0.002. kp=400 (old)
    # tracked only ~30% of each commanded delta and sagged under gravity
    # (see engine.py:actuator_torques).
    """Robot BodySpec chain + actuator list + init hinge angles."""
    bodies = [BodySpec("base", "", pos=BASE_POS,
                       joint=JointSpec(T.FIXED),
                       geoms=[GeomSpec(T.SPHERE, (0.06,), density=2000.0)])]
    parent = "base"
    actuators = []
    for i, (xyz, rpy) in enumerate(PANDA_JOINTS):
        name = f"link{i + 1}"
        bodies.append(BodySpec(
            name, parent, pos=xyz, quat=_rpy_quat(rpy),
            joint=JointSpec(T.HINGE, axis=(0, 0, 1), armature=0.15,
                            damping=2.0,
                            limit=(JOINT_LIMIT_LO[i], JOINT_LIMIT_HI[i])),
            mass=LINK_MASS[i], inertia_diag=(0.02, 0.02, 0.01),
            geoms=[]))
        actuators.append({"body": name, "kp": kp, "kd": kd,
                         "force": JOINT_FORCES[i]})
        parent = name

    hand_geoms = [GeomSpec(T.SPHERE, (0.035,), pos=(0, 0, 0.05),
                           density=1000.0, friction=1.0)]
    if has_peg:
        hand_geoms.append(GeomSpec.capsule_fromto(
            0.012, (0, 0, 0.08), tuple(PEG_TIP_OFFSET), density=500.0))
    bodies.append(BodySpec("hand", parent, pos=HAND_OFFSET[0],
                           quat=_rpy_quat(HAND_OFFSET[1]),
                           joint=JointSpec(T.FIXED), geoms=hand_geoms))
    for f, sign in (("finger1", 1.0), ("finger2", -1.0)):
        bodies.append(BodySpec(
            f, "hand", pos=(0, 0, 0.0584),
            joint=JointSpec(T.SLIDE, axis=(0, sign, 0), armature=0.02,
                            damping=5.0, limit=FINGER_LIMIT),
            mass=0.05, inertia_diag=(1e-4, 1e-4, 1e-4),
            geoms=[GeomSpec(T.SPHERE, (0.012,), pos=(0, sign * 0.01, 0.04),
                            density=1000.0, friction=1.0)]))
        actuators.append({"body": f, "kp": 200.0, "kd": 20.0,
                          "force": finger_force})
    return bodies, actuators


def build_panda_scene(task: str, dt=0.002, n_substeps=20):
    """Build the full Model for one of the four reference tasks. Returns
    (model, meta dict)."""
    meta = {"task": task}
    has_peg = task == "PegInsertion"
    if task == "Cabinet":
        neutral = NEUTRAL_CABINET
    elif has_peg:
        neutral = NEUTRAL_PEG
    else:
        neutral = NEUTRAL
    bodies, actuators = panda_bodies(neutral, has_peg=has_peg)
    static = []
    task_bodies = []

    if task == "Reach":
        # cross-shaped obstacle before the fixed goal (reach.py:40-53)
        for pos, ext in ((( -0.22, 0.0, 0.67), (0.02, 0.005, 0.2)),
                         ((-0.22, 0.0, 0.67), (0.02, 0.2, 0.005))):
            p, e = np.array(pos), np.array(ext)
            static.append((p - e, p + e))
        meta["goal"] = np.array([-0.05, 0.0, 0.65])
        meta["threshold"] = 0.1
    elif task == "PegInsertion":
        # two hole blocks on the table: plates with a 3 cm bore at the goal
        for hx, hy in ((0.05, 0.15), (0.05, -0.15)):
            for dx, dy, ex, ey in ((0.05, 0.0, 0.02, 0.07),
                                   (-0.05, 0.0, 0.02, 0.07),
                                   (0.0, 0.05, 0.03, 0.02),
                                   (0.0, -0.05, 0.03, 0.02)):
                c = np.array([hx + dx, hy + dy, 0.015])
                e = np.array([ex, ey, 0.015])
                static.append((c - e, c + e))
        meta["goals"] = np.array([[0.05, 0.15, 0.01], [0.05, -0.15, 0.01]])
        meta["threshold"] = 0.03
    elif task == "DrawerMulti":
        # four drawers, prismatic along -x (toward the robot); init open
        # at 0.17, success when any pushed to <= 0.03 (drawer_multi.py)
        z_off, x_d, y_off = 0.28, -0.35, 0.185
        poses = [(x_d, -y_off, 0.2 + z_off), (x_d, -y_off, 0.4 + z_off),
                 (x_d, y_off, 0.2 + z_off), (x_d, y_off, 0.4 + z_off)]
        for i, p in enumerate(poses):
            task_bodies.append(BodySpec(
                f"drawer_{i}", "", pos=p,
                joint=JointSpec(T.SLIDE, axis=(-1, 0, 0), damping=20.0,
                                armature=0.0, limit=(0.0, 0.25)),
                mass=1.0, inertia_diag=(0.01, 0.01, 0.01),
                geoms=[GeomSpec(T.BOX, (0.02, 0.08, 0.08), friction=0.8)]))
            # static shell behind each drawer
            c = np.array(p) + np.array([0.12, 0.0, 0.0])
            e = np.array([0.09, 0.1, 0.1])
            static.append((c - e, c + e))
        meta["drawer_init"] = 0.17
        meta["goal"] = 0.03
    elif task == "Cabinet":
        # single revolute door opening about a vertical hinge; success when
        # the joint angle >= 0.4 rad (cabinet.py)
        hinge_pos = (-0.22, 0.1 + 0.18, 0.53)
        task_bodies.append(BodySpec(
            "door", "", pos=hinge_pos,
            joint=JointSpec(T.HINGE, axis=(0, 0, 1), damping=4.0,
                            armature=0.0, limit=(0.0, 1.6)),
            mass=1.5, inertia_diag=(0.02, 0.02, 0.02),
            geoms=[GeomSpec(T.BOX, (0.02, 0.18, 0.15), pos=(0, -0.18, 0),
                            friction=0.8)]))
        # cabinet shell
        c = np.array([-0.22 - 0.15, 0.1, 0.53])
        e = np.array([0.12, 0.2, 0.18])
        static.append((c - e, c + e))
        meta["goal"] = 0.4
    else:
        raise ValueError(task)

    all_bodies = bodies + task_bodies
    model = build(all_bodies, actuators,
                  static_boxes=np.asarray(static, np.float32)
                  if static else None,
                  dt=dt, n_substeps=n_substeps,
                  contact_timeconst=0.02, contact_dampratio=1.0)

    # init qpos: arm at neutral, task joints at their init values
    init = np.array(model.init_qpos)
    name_order = [b.name for b in all_bodies]
    for i, b in enumerate(all_bodies):
        if b.name.startswith("link"):
            k = int(b.name[4:]) - 1
            init[model.jnt_qposadr[i]] = neutral[k]
        elif b.name.startswith("drawer"):
            init[model.jnt_qposadr[i]] = meta.get("drawer_init", 0.0)
    model = type(model)(**{**model.__dict__, "init_qpos": init.astype(np.float32)})

    meta["arm_body_idx"] = [name_order.index(f"link{i + 1}") for i in range(7)]
    meta["hand_idx"] = name_order.index("hand")
    meta["finger_idx"] = [name_order.index("finger1"),
                          name_order.index("finger2")]
    meta["task_body_idx"] = [name_order.index(b.name) for b in task_bodies]
    meta["neutral"] = np.asarray(neutral, np.float32)
    meta["arm_qposadr"] = np.asarray(
        [model.jnt_qposadr[name_order.index(f"link{i + 1}")]
         for i in range(7)])
    meta["arm_dofadr"] = np.asarray(
        [model.jnt_dofadr[name_order.index(f"link{i + 1}")]
         for i in range(7)])
    meta["finger_qposadr"] = np.asarray(
        [model.jnt_qposadr[i] for i in meta["finger_idx"]])
    meta["task_qposadr"] = np.asarray(
        [model.jnt_qposadr[i] for i in meta["task_body_idx"]], dtype=np.int64)
    meta["ee_offset"] = PEG_TIP_OFFSET if has_peg else EE_OFFSET
    return model, meta


def ee_position(model, meta, body_pos, body_quat):
    """World position of the end effector (tcp / peg tip)."""
    h = meta["hand_idx"]
    return body_pos[h] + Q.rotate(body_quat[h], jnp.asarray(meta["ee_offset"]))


def ee_jacobian(model, meta, body_pos, body_quat):
    """Positional Jacobian [3, 7] of the EE w.r.t. the 7 arm joints."""
    p_ee = ee_position(model, meta, body_pos, body_quat)
    cols = []
    for i, b in enumerate(meta["arm_body_idx"]):
        axis = Q.rotate(body_quat[b], jnp.asarray(model.jnt_axis[b]))
        anchor = body_pos[b]
        cols.append(jnp.cross(axis, p_ee - anchor))
    return jnp.stack(cols, axis=-1), p_ee


def dls_ik(model, meta, qpos, target, iters: int = 3, damping: float = 0.05):
    """Damped-least-squares IK for the EE position (engine counterpart of
    calcInverseKinematics, pybullet.py:385-403). Returns 7 target angles."""
    from ddiffpg_tpu.physics import engine

    q = qpos
    adr = jnp.asarray(meta["arm_qposadr"])
    for _ in range(iters):
        body_pos, body_quat = engine.fk(model, q)
        J, p = ee_jacobian(model, meta, body_pos, body_quat)
        err = target - p
        A = J @ J.T + damping**2 * jnp.eye(3)
        # closed-form 3x3 solve (XLA's library solve is slow on TPU for
        # batched tiny systems)
        c0 = jnp.cross(A[:, 1], A[:, 2])
        c1 = jnp.cross(A[:, 2], A[:, 0])
        c2 = jnp.cross(A[:, 0], A[:, 1])
        det = jnp.dot(A[:, 0], c0)
        x = jnp.stack([jnp.dot(c0, err), jnp.dot(c1, err),
                       jnp.dot(c2, err)]) / det
        dq = J.T @ x
        q = q.at[adr].add(jnp.clip(dq, -0.2, 0.2))
    return q[adr]
