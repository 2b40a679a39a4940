"""Articulated rigid-body dynamics in generalized coordinates, pure JAX.

Design notes (TPU-first):
  * All spatial (6D) quantities are expressed at the WORLD ORIGIN
    ([angular; linear-at-origin] motion vectors). In these coordinates
    composite inertias simply add, so CRBA needs no frame transforms, and
    every per-body op is a handful of 3-vector ops that XLA fuses cleanly
    when the whole `step` is vmapped over thousands of envs.
  * The kinematic tree is tiny (<= ~12 bodies) and static, so Python loops
    over bodies unroll at trace time; the env batch is the vector axis.
  * The root free joint's internal velocity coordinates are
    (v_origin, omega): with these, every dof subspace is fixed in the
    parent body, making the Coriolis term exactly v_parent x (S qdot).
    State.qvel stores the MuJoCo-like (v_body_origin, omega) and is
    converted at the boundary.
  * Contacts are penalty-based (spring-damper normal + smooth Coulomb
    friction), replacing MuJoCo's soft-constraint solver
    (low_gear_ant.xml solref=".02 1"); stiffness/damping live on Model.

Replaces: MuJoCo 2.1 C (`/root/reference/ddiffpg/env/d4rl/locomotion/ant.py:57,75`)
and PyBullet C++ stepping (`/root/reference/ddiffpg/env/panda_gym/pybullet.py:53-69`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu.physics import quat as Q
from ddiffpg_tpu.physics.types import BOX, CAPSULE, FIXED, FREE, HINGE, PLANE, SLIDE, SPHERE, Model


def _skew(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)


def cross_motion(v, m):
    """Spatial cross product v x m for motion vectors [w; v_o]."""
    w, vo = v[:3], v[3:]
    mw, mv = m[:3], m[3:]
    return jnp.concatenate([jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(vo, mw)])


def cross_force(v, f):
    """Spatial cross product v x* f for force vectors [n_o; f]."""
    w, vo = v[:3], v[3:]
    n, fl = f[:3], f[3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(vo, fl), jnp.cross(w, fl)])


# ----------------------------------------------------------------- kinematics

def fk(m: Model, qpos):
    """Forward kinematics. Returns world body positions [nb,3], quats [nb,4]."""
    pos, quat = [], []
    for i in range(m.nb):
        p = int(m.parent[i])
        if m.jnt_type[i] == FREE:
            pos.append(qpos[m.jnt_qposadr[i]: m.jnt_qposadr[i] + 3])
            quat.append(qpos[m.jnt_qposadr[i] + 3: m.jnt_qposadr[i] + 7])
            continue
        pp = pos[p] if p >= 0 else jnp.zeros(3)
        pq = quat[p] if p >= 0 else Q.identity()
        p0 = pp + Q.rotate(pq, jnp.asarray(m.body_pos[i]))
        q0 = Q.mul(pq, jnp.asarray(m.body_quat[i]))
        if m.jnt_type[i] == HINGE:
            ang = qpos[m.jnt_qposadr[i]]
            qj = Q.from_axis_angle(jnp.asarray(m.jnt_axis[i]), ang)
            qn = Q.mul(q0, qj)
            anchor = jnp.asarray(m.jnt_pos[i])
            pn = p0 + Q.rotate(q0, anchor) - Q.rotate(qn, anchor)
            pos.append(pn)
            quat.append(qn)
        elif m.jnt_type[i] == SLIDE:
            d = qpos[m.jnt_qposadr[i]]
            pos.append(p0 + Q.rotate(q0, jnp.asarray(m.jnt_axis[i])) * d)
            quat.append(q0)
        else:  # FIXED
            pos.append(p0)
            quat.append(q0)
    return jnp.stack(pos), jnp.stack(quat)


def dof_subspaces(m: Model, body_pos, body_quat):
    """Motion subspace S [nv, 6] for every dof, world-origin coordinates."""
    S = [None] * m.nv
    for i in range(m.nb):
        d = int(m.jnt_dofadr[i])
        if m.jnt_type[i] == FREE:
            for k in range(3):  # v_origin dofs
                e = jnp.zeros(3).at[k].set(1.0)
                S[d + k] = jnp.concatenate([jnp.zeros(3), e])
            for k in range(3):  # omega dofs (axis through origin)
                e = jnp.zeros(3).at[k].set(1.0)
                S[d + 3 + k] = jnp.concatenate([e, jnp.zeros(3)])
        elif m.jnt_type[i] == HINGE:
            w = Q.rotate(body_quat[i], jnp.asarray(m.jnt_axis[i]))
            a = body_pos[i] + Q.rotate(body_quat[i], jnp.asarray(m.jnt_pos[i]))
            S[d] = jnp.concatenate([w, jnp.cross(a, w)])
        elif m.jnt_type[i] == SLIDE:
            w = Q.rotate(body_quat[i], jnp.asarray(m.jnt_axis[i]))
            S[d] = jnp.concatenate([jnp.zeros(3), w])
    return jnp.stack(S)


def qvel_to_u(m: Model, qvel, body_pos):
    """MuJoCo-style free-joint velocities (v_p, omega) -> internal
    (v_origin, omega). Hinge/slide dofs pass through."""
    u = qvel
    for i in range(m.nb):
        if m.jnt_type[i] == FREE:
            d = int(m.jnt_dofadr[i])
            vp = qvel[d: d + 3]
            w = qvel[d + 3: d + 6]
            vo = vp - jnp.cross(w, body_pos[i])
            u = u.at[d: d + 3].set(vo)
    return u


def u_to_qvel(m: Model, u, body_pos):
    qvel = u
    for i in range(m.nb):
        if m.jnt_type[i] == FREE:
            d = int(m.jnt_dofadr[i])
            vo = u[d: d + 3]
            w = u[d + 3: d + 6]
            qvel = qvel.at[d: d + 3].set(vo + jnp.cross(w, body_pos[i]))
    return qvel


def body_velocities(m: Model, S, u):
    """Spatial velocity [nb, 6] of each body at the world origin."""
    V = []
    for i in range(m.nb):
        p = int(m.parent[i])
        v = V[p] if p >= 0 else jnp.zeros(6)
        d, nd = int(m.jnt_dofadr[i]), _ndof(m, i)
        for k in range(nd):
            v = v + S[d + k] * u[d + k]
        V.append(v)
    return jnp.stack(V)


def _ndof(m: Model, i: int) -> int:
    t = int(m.jnt_type[i])
    return 6 if t == FREE else (0 if t == FIXED else 1)


def _ancestors(m: Model, i: int):
    out = []
    while i >= 0:
        out.append(i)
        i = int(m.parent[i])
    return out


# ------------------------------------------------------------------ dynamics

def spatial_inertia(m: Model, body_pos, body_quat):
    """Per-body 6x6 spatial inertia about the world origin [nb, 6, 6]."""
    out = []
    for i in range(m.nb):
        R = Q.to_matrix(body_quat[i])
        c = body_pos[i] + R @ jnp.asarray(m.com[i])
        Ic = R @ jnp.asarray(m.inertia[i]) @ R.T
        mi = float(m.mass[i])
        cx = _skew(c)
        top_left = Ic - mi * (cx @ cx)
        top_right = mi * cx
        I6 = jnp.block([[top_left, top_right],
                        [-top_right, mi * jnp.eye(3)]])
        out.append(I6)
    return jnp.stack(out)


def crba(m: Model, I6, S):
    """Composite rigid-body algorithm -> mass matrix [nv, nv]."""
    Ic = [I6[i] for i in range(m.nb)]
    for i in range(m.nb - 1, -1, -1):
        p = int(m.parent[i])
        if p >= 0:
            Ic[p] = Ic[p] + Ic[i]
    M = jnp.zeros((m.nv, m.nv))
    for i in range(m.nb):
        d, nd = int(m.jnt_dofadr[i]), _ndof(m, i)
        for k in range(nd):
            F = Ic[i] @ S[d + k]
            for j in _ancestors(m, i):
                dj, ndj = int(m.jnt_dofadr[j]), _ndof(m, j)
                for l in range(ndj):
                    val = S[dj + l] @ F
                    M = M.at[d + k, dj + l].set(val)
                    M = M.at[dj + l, d + k].set(val)
    M = M + jnp.diag(jnp.asarray(m.dof_armature))
    return M


def bias_forces(m: Model, I6, S, V, u, f_ext):
    """RNEA with qacc = 0: returns tau_bias [nv] such that
    M qacc = tau_applied - tau_bias. Includes gravity, Coriolis/centrifugal
    and external spatial forces f_ext [nb, 6] (world-origin force vectors,
    applied TO each body; they reduce the bias)."""
    g = jnp.asarray(m.gravity)
    a0 = jnp.concatenate([jnp.zeros(3), -g])  # gravity as base acceleration
    A = []
    for i in range(m.nb):
        p = int(m.parent[i])
        a = A[p] if p >= 0 else a0
        v_parent = V[p] if p >= 0 else jnp.zeros(6)
        d, nd = int(m.jnt_dofadr[i]), _ndof(m, i)
        vJ = jnp.zeros(6)
        for k in range(nd):
            vJ = vJ + S[d + k] * u[d + k]
        A.append(a + cross_motion(v_parent, vJ))

    F = []
    for i in range(m.nb):
        f = I6[i] @ A[i] + cross_force(V[i], I6[i] @ V[i]) - f_ext[i]
        F.append(f)
    for i in range(m.nb - 1, -1, -1):
        p = int(m.parent[i])
        if p >= 0:
            F[p] = F[p] + F[i]

    tau = jnp.zeros(m.nv)
    for i in range(m.nb):
        d, nd = int(m.jnt_dofadr[i]), _ndof(m, i)
        for k in range(nd):
            tau = tau.at[d + k].set(S[d + k] @ F[i])
    return tau


def passive_torques(m: Model, qpos, u):
    """Joint damping + soft joint-limit torques on 1-dof joints."""
    tau = jnp.zeros(m.nv)
    damping = jnp.asarray(m.dof_damping)
    tau = tau - damping * u
    lo = jnp.asarray(m.dof_limit_lo)
    hi = jnp.asarray(m.dof_limit_hi)
    # map hinge/slide qpos onto dofs
    qd = jnp.zeros(m.nv)
    for i in range(m.nb):
        if m.jnt_type[i] in (HINGE, SLIDE):
            qd = qd.at[int(m.jnt_dofadr[i])].set(qpos[int(m.jnt_qposadr[i])])
    over = jnp.maximum(qd - hi, 0.0)
    under = jnp.maximum(lo - qd, 0.0)
    active = (over > 0) | (under > 0)
    tau = tau - m.limit_stiffness * (over - under)
    tau = tau - jnp.where(active, m.limit_damping * u, 0.0)
    return tau


# ------------------------------------------------------------------ contacts

def _geom_world(m: Model, body_pos, body_quat):
    gp, gq = [], []
    for gi in range(m.ng):
        b = int(m.geom_body[gi])
        p = body_pos[b] + Q.rotate(body_quat[b], jnp.asarray(m.geom_pos[gi]))
        q = Q.mul(body_quat[b], jnp.asarray(m.geom_quat[gi]))
        gp.append(p)
        gq.append(q)
    return jnp.stack(gp), jnp.stack(gq)


def _sphere_points(m: Model, gpos, gquat):
    """Contact probe spheres: sphere geoms give 1, capsules give their two
    end caps. Returns (points [npts,3], radii [npts], geom index [npts])."""
    pts, rads, gidx = [], [], []
    for gi in range(m.ng):
        t = int(m.geom_type[gi])
        if t == SPHERE:
            pts.append(gpos[gi])
            rads.append(float(m.geom_size[gi][0]))
            gidx.append(gi)
        elif t == CAPSULE:
            r, h = float(m.geom_size[gi][0]), float(m.geom_size[gi][1])
            axis = Q.rotate(gquat[gi], jnp.array([0.0, 0.0, 1.0]))
            pts.append(gpos[gi] + h * axis)
            pts.append(gpos[gi] - h * axis)
            rads.extend([r, r])
            gidx.extend([gi, gi])
    if not pts:
        return jnp.zeros((0, 3)), jnp.zeros((0,)), np.zeros((0,), np.int64)
    return jnp.stack(pts), jnp.asarray(rads), np.asarray(gidx)


def _point_box_distance(p, bmin, bmax):
    """Signed distance from point to AABB surface, with outward normal.
    Negative inside. Shapes: p [...,3], bmin/bmax [...,3]."""
    clamped = jnp.clip(p, bmin, bmax)
    delta = p - clamped
    d_out = jnp.linalg.norm(delta, axis=-1)
    outside = d_out > 1e-9
    n_out = delta / jnp.where(outside, d_out, 1.0)[..., None]
    # inside: distance to nearest face (negative), normal along that axis
    face_lo = p - bmin
    face_hi = bmax - p
    faces = jnp.concatenate([face_lo, face_hi], axis=-1)       # [...,6]
    k = jnp.argmin(faces, axis=-1)
    d_in = -jnp.min(faces, axis=-1)
    normals = jnp.concatenate([-jnp.eye(3), jnp.eye(3)], axis=0)  # [6,3]
    n_in = normals[k]
    dist = jnp.where(outside, d_out, d_in)
    normal = jnp.where(outside[..., None], n_out, n_in)
    return dist, normal


def contact_forces(m: Model, body_pos, body_quat, V):
    """Penalty contacts of all probe spheres vs ground plane + static AABBs.
    Returns per-body external spatial force [nb, 6] at the world origin."""
    gpos, gquat = _geom_world(m, body_pos, body_quat)
    pts, rads, gidx = _sphere_points(m, gpos, gquat)
    npts = pts.shape[0]
    if npts == 0:
        return jnp.zeros((m.nb, 6))
    body_of_pt = m.geom_body[gidx]                      # np [npts]
    fric = jnp.asarray(m.geom_friction)[gidx]           # [npts]
    # solref-style mass-scaled gains (see Model docstring)
    omega = 1.0 / m.contact_timeconst
    m_eff = jnp.asarray(m.mass)[body_of_pt]             # [npts]
    k_n = m_eff * omega**2
    c_n = 2.0 * m.contact_dampratio * m_eff * omega

    # velocity of each contact point: v = v_o + w x x
    Vp = V[body_of_pt]                                  # [npts, 6]
    v_pt = Vp[:, 3:] + jnp.cross(Vp[:, :3], pts)

    def force_from(dist, normal):
        pen = jnp.maximum(-dist, 0.0)
        v_n = (v_pt * normal).sum(-1)
        f_n = jnp.maximum(k_n * pen - c_n * v_n, 0.0)
        f_n = jnp.where(pen > 0, f_n, 0.0)
        v_t = v_pt - v_n[:, None] * normal
        vt_norm = jnp.sqrt((v_t**2).sum(-1) + m.friction_vel_tol**2 * 1e-4)
        scale = jnp.minimum(1.0, vt_norm / m.friction_vel_tol)
        f_t = -fric[:, None] * f_n[:, None] * (v_t / vt_norm[:, None]) * scale[:, None]
        return f_n[:, None] * normal + f_t

    # ground plane z=0
    dist_p = pts[:, 2] - rads
    n_p = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (npts, 3))
    f_plane = force_from(dist_p, n_p)                   # [npts, 3]
    total = f_plane

    # static boxes
    if m.nsb > 0:
        bmin = jnp.asarray(m.static_box_min)[None]      # [1, nsb, 3]
        bmax = jnp.asarray(m.static_box_max)[None]
        d_b, n_b = _point_box_distance(pts[:, None, :], bmin, bmax)
        d_b = d_b - rads[:, None]                       # [npts, nsb]
        pen = jnp.maximum(-d_b, 0.0)
        v_n = (v_pt[:, None, :] * n_b).sum(-1)
        f_n = jnp.maximum(k_n[:, None] * pen - c_n[:, None] * v_n, 0.0)
        f_n = jnp.where(pen > 0, f_n, 0.0)
        v_t = v_pt[:, None, :] - v_n[..., None] * n_b
        vt_norm = jnp.sqrt((v_t**2).sum(-1) + m.friction_vel_tol**2 * 1e-4)
        scale = jnp.minimum(1.0, vt_norm / m.friction_vel_tol)
        f_t = -fric[:, None, None] * f_n[..., None] * (v_t / vt_norm[..., None]) \
            * scale[..., None]
        total = total + (f_n[..., None] * n_b + f_t).sum(axis=1)

    # accumulate to bodies as world-origin spatial forces [n_o; f]
    torque = jnp.cross(pts, total)
    F = jnp.zeros((m.nb, 6))
    F = F.at[body_of_pt, :3].add(torque)
    F = F.at[body_of_pt, 3:].add(total)
    return F


# ---------------------------------------------------------------- integrator

def actuator_torques(m: Model, ctrl):
    tau = jnp.zeros(m.nv)
    ctrl = jnp.clip(ctrl, -1.0, 1.0)
    if m.nu:
        tau = tau.at[jnp.asarray(m.act_dof)].add(jnp.asarray(m.act_gear) * ctrl)
    return tau


def substep(m: Model, qpos, qvel, tau_act):
    # The dynamics' small matrices (mass matrix, spatial inertias) are far
    # too ill-conditioned for the TPU's default bf16 matmul passes — the
    # Cholesky factor goes NaN within a few steps. Physics always runs with
    # full f32 MXU passes; the NN training path keeps the fast default.
    with jax.default_matmul_precision("float32"):
        return _substep(m, qpos, qvel, tau_act)


def _substep(m: Model, qpos, qvel, tau_act):
    body_pos, body_quat = fk(m, qpos)
    S = dof_subspaces(m, body_pos, body_quat)
    u = qvel_to_u(m, qvel, body_pos)
    V = body_velocities(m, S, u)
    I6 = spatial_inertia(m, body_pos, body_quat)
    f_ext = contact_forces(m, body_pos, body_quat, V)
    tau_bias = bias_forces(m, I6, S, V, u, f_ext)
    tau = tau_act + passive_torques(m, qpos, u) - tau_bias
    M = crba(m, I6, S)
    udot = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(M), tau)

    u_new = u + m.dt * udot
    # semi-implicit: integrate positions with the new velocities
    qvel_new = u_to_qvel(m, u_new, body_pos)
    qpos_new = qpos
    for i in range(m.nb):
        qa, d = int(m.jnt_qposadr[i]), int(m.jnt_dofadr[i])
        if m.jnt_type[i] == FREE:
            vp = qvel_new[d: d + 3]
            w = qvel_new[d + 3: d + 6]
            qpos_new = qpos_new.at[qa: qa + 3].add(m.dt * vp)
            quat_new = Q.integrate(qpos[qa + 3: qa + 7], w, m.dt)
            qpos_new = qpos_new.at[qa + 3: qa + 7].set(quat_new)
        elif m.jnt_type[i] in (HINGE, SLIDE):
            qpos_new = qpos_new.at[qa].add(m.dt * qvel_new[d])
    return qpos_new, qvel_new


def step(m: Model, qpos, qvel, ctrl):
    """One control step = n_substeps physics substeps (single env)."""
    tau_act = actuator_torques(m, ctrl)

    def body(carry, _):
        qp, qv = carry
        qp, qv = substep(m, qp, qv, tau_act)
        return (qp, qv), None

    (qpos, qvel), _ = jax.lax.scan(body, (qpos, qvel), None, length=m.n_substeps)
    return qpos, qvel
