"""Articulated rigid-body dynamics in generalized coordinates, pure JAX.

Design notes (TPU-first):
  * All spatial (6D) quantities are expressed at a SINGLE SHARED REFERENCE
    POINT — the robot's body centroid, recomputed each substep (the
    world origin for frame-agnostic callers). Referencing at one shared
    point means composite inertias simply add; centering it on the robot
    keeps every intermediate at the robot's own scale, so the f32
    Cholesky stays well-conditioned anywhere in the world (at the world
    origin the free-joint rows of M grow like m*r^2 and the solve
    injects momentum at r ~ 8 m — measured, RESULTS.md round 3).
    Ancestor/subtree accumulations are plain matrix products with static
    0/1 masks — so CRBA, velocity and bias propagation are each a handful
    of batched einsums instead of per-body loops (XLA op-dispatch
    overhead dominates tiny tensors; the vectorized form cuts ~1000 HLO
    ops per substep to ~100).
  * Only forward kinematics walks the tree, grouped by (depth, joint type)
    so sibling bodies process as one batched op per level.
  * The root free joint's internal velocity coordinates are
    (v_origin, omega): with these, every dof subspace is fixed in the
    parent body, making the Coriolis term exactly v_parent x (S qdot).
    State.qvel stores the MuJoCo-like (v_body_origin, omega) and is
    converted at the boundary.
  * Contacts are penalty-based (spring-damper normal + smooth Coulomb
    friction) with solref-style mass-scaled gains, replacing MuJoCo's
    soft-constraint solver (low_gear_ant.xml solref=".02 1").
  * M x = b is solved by a fully-unrolled batched Cholesky:
    XLA's library Cholesky lowers to a loop-heavy custom call that costs
    ~20 ms per substep for [1024, 14, 14] on TPU (measured) vs ~us here.

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

_STRUCT_CACHE: dict = {}


def _structure(m: Model):
    """Static tree structure (numpy, trace-time): depth-grouped levels,
    subtree mask SUB[i,j] (j in subtree of i, incl. self), and the
    lower-triangular ancestor-dof mask."""
    key = id(m)
    if key in _STRUCT_CACHE:
        return _STRUCT_CACHE[key]
    nb, nv = m.nb, m.nv
    depth = np.zeros(nb, int)
    for i in range(nb):
        p = int(m.parent[i])
        depth[i] = 0 if p < 0 else depth[p] + 1
    levels = []
    for d in range(int(depth.max()) + 1):
        for jt in (FREE, HINGE, SLIDE, FIXED):
            ids = np.where((depth == d) & (m.jnt_type == jt))[0]
            if len(ids):
                levels.append((jt, ids))
    SUB = np.zeros((nb, nb), np.float32)
    for j in range(nb):
        i = j
        while i >= 0:
            SUB[i, j] = 1.0
            i = int(m.parent[i])
    anc = np.zeros((nv, nv), np.float32)
    for d in range(nv):
        bd = int(m.dof_body[d])
        for e in range(d + 1):
            if SUB[int(m.dof_body[e]), bd]:
                anc[d, e] = 1.0
    out = (depth, levels, SUB, anc)
    _STRUCT_CACHE[key] = out
    return out


def _skew(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)


def cross_motion(v, mvec):
    """Spatial cross v x m for motion vectors [..., 6] = [w; v_o]."""
    w, vo = v[..., :3], v[..., 3:]
    mw, mv = mvec[..., :3], mvec[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(vo, mw)], axis=-1)


def cross_force(v, f):
    """Spatial cross v x* f for force vectors [..., 6] = [n_o; f]."""
    w, vo = v[..., :3], v[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vo, fl), jnp.cross(w, fl)], axis=-1)


# ----------------------------------------------------------------- kinematics

def fk(m: Model, qpos):
    """Forward kinematics, level-batched. Returns world positions [nb, 3]
    and quaternions [nb, 4]."""
    _, levels, _, _ = _structure(m)
    pos = jnp.zeros((m.nb, 3))
    quat = jnp.zeros((m.nb, 4)).at[:, 0].set(1.0)
    for jt, ids in levels:
        qa = m.jnt_qposadr[ids]
        if jt == FREE:
            vals = qpos[qa[:, None] + np.arange(7)[None]]   # [g, 7]
            pos = pos.at[ids].set(vals[:, :3])
            quat = quat.at[ids].set(vals[:, 3:7])
            continue
        par = np.maximum(m.parent[ids], 0)
        is_root = (m.parent[ids] < 0)[:, None]
        pp = jnp.where(is_root, 0.0, pos[par])
        pq = jnp.where(is_root, jnp.array([1.0, 0.0, 0.0, 0.0]), quat[par])
        p0 = pp + Q.rotate(pq, jnp.asarray(m.body_pos[ids]))
        q0 = Q.mul(pq, jnp.asarray(m.body_quat[ids]))
        if jt == HINGE:
            ang = qpos[qa]
            qj = Q.from_axis_angle(jnp.asarray(m.jnt_axis[ids]), ang)
            qn = Q.mul(q0, qj)
            anchor = jnp.asarray(m.jnt_pos[ids])
            pn = p0 + Q.rotate(q0, anchor) - Q.rotate(qn, anchor)
        elif jt == SLIDE:
            qn = q0
            pn = p0 + Q.rotate(q0, jnp.asarray(m.jnt_axis[ids])) \
                * qpos[qa][:, None]
        else:  # FIXED
            qn, pn = q0, p0
        pos = pos.at[ids].set(pn)
        quat = quat.at[ids].set(qn)
    return pos, quat


def dof_subspaces(m: Model, body_pos, body_quat):
    """Motion subspaces S [nv, 6], world-origin coordinates, one batched op
    per joint kind."""
    # constant rows for free joints: dofs (v_origin x3, omega x3)
    base = np.zeros((m.nv, 6), np.float32)
    for i in range(m.nb):
        if m.jnt_type[i] == FREE:
            d = int(m.jnt_dofadr[i])
            base[d: d + 3, 3:] = np.eye(3)
            base[d + 3: d + 6, :3] = np.eye(3)
    S = jnp.asarray(base)

    hinge = np.where(m.jnt_type == HINGE)[0]
    if len(hinge):
        hd = m.jnt_dofadr[hinge]
        bq = body_quat[hinge]
        w = Q.rotate(bq, jnp.asarray(m.jnt_axis[hinge]))
        a = body_pos[hinge] + Q.rotate(bq, jnp.asarray(m.jnt_pos[hinge]))
        S = S.at[hd].set(jnp.concatenate([w, jnp.cross(a, w)], axis=-1))
    slide = np.where(m.jnt_type == SLIDE)[0]
    if len(slide):
        sd = m.jnt_dofadr[slide]
        w = Q.rotate(body_quat[slide], jnp.asarray(m.jnt_axis[slide]))
        S = S.at[sd].set(jnp.concatenate([jnp.zeros_like(w), w], axis=-1))
    return S


def qvel_to_u(m: Model, qvel, body_pos):
    """(v_p, omega) -> internal (v_origin, omega) for free joints."""
    u = qvel
    for i in range(m.nb):
        if m.jnt_type[i] == FREE:
            d = int(m.jnt_dofadr[i])
            vp, w = qvel[d: d + 3], qvel[d + 3: d + 6]
            u = u.at[d: d + 3].set(vp - jnp.cross(w, body_pos[i]))
    return u


def u_to_qvel(m: Model, u, body_pos):
    qvel = u
    for i in range(m.nb):
        if m.jnt_type[i] == FREE:
            d = int(m.jnt_dofadr[i])
            vo, w = u[d: d + 3], u[d + 3: d + 6]
            qvel = qvel.at[d: d + 3].set(vo + jnp.cross(w, body_pos[i]))
    return qvel


def _joint_vel(m: Model, S, u):
    """Per-body joint velocity contribution vJ [nb, 6] (segment-sum of
    S qdot over each body's dofs)."""
    return jax.ops.segment_sum(S * u[:, None], jnp.asarray(m.dof_body),
                               num_segments=m.nb)


def body_velocities(m: Model, S, u):
    """V[i] = sum of vJ over ancestors-or-self — one masked matmul."""
    _, _, SUB, _ = _structure(m)
    vJ = _joint_vel(m, S, u)
    return jnp.einsum("ji,jk->ik", jnp.asarray(SUB), vJ)


# ------------------------------------------------------------------ dynamics

def spatial_inertia(m: Model, body_pos, body_quat):
    """Per-body 6x6 spatial inertia about the world origin [nb, 6, 6]."""
    R = Q.to_matrix(body_quat)                                   # [nb, 3, 3]
    c = body_pos + jnp.einsum("bij,bj->bi", R, jnp.asarray(m.com))
    Ic = jnp.einsum("bij,bjk,blk->bil", R, jnp.asarray(m.inertia), R)
    mass = jnp.asarray(m.mass)[:, None, None]
    cx = _skew(c)
    tl = Ic - mass * (cx @ cx)
    tr = mass * cx
    eye = jnp.broadcast_to(jnp.eye(3), (m.nb, 3, 3))
    top = jnp.concatenate([tl, tr], axis=-1)
    bot = jnp.concatenate([-tr, mass * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)                  # [nb, 6, 6]


def crba(m: Model, I6, S):
    """Composite-rigid-body mass matrix as three einsums + a mask."""
    _, _, SUB, anc = _structure(m)
    Ic = jnp.einsum("ij,jkl->ikl", jnp.asarray(SUB), I6)         # composite
    F = jnp.einsum("dkl,dl->dk", Ic[jnp.asarray(m.dof_body)], S)  # [nv, 6]
    M_full = jnp.einsum("dk,ek->de", F, S)                       # F[d].S[e]
    Mv = M_full * jnp.asarray(anc)                               # lower tri
    M = Mv + Mv.T - jnp.diag(jnp.diag(Mv))
    return M + jnp.diag(jnp.asarray(m.dof_armature))


def bias_forces(m: Model, I6, S, V, u, f_ext):
    """RNEA with qacc = 0 (gravity + Coriolis - external), vectorized.
    Returns tau_bias [nv] such that M qacc = tau_applied - tau_bias."""
    _, _, SUB, _ = _structure(m)
    SUBj = jnp.asarray(SUB)
    g = jnp.asarray(m.gravity)
    a0 = jnp.concatenate([jnp.zeros(3), -g])

    vJ = _joint_vel(m, S, u)
    parent = np.maximum(m.parent, 0)
    Vp = jnp.where((m.parent < 0)[:, None], 0.0, V[parent])
    c = cross_motion(Vp, vJ)                                     # [nb, 6]
    A = a0[None] + jnp.einsum("ji,jk->ik", SUBj, c)

    IA = jnp.einsum("ikl,il->ik", I6, A)
    IV = jnp.einsum("ikl,il->ik", I6, V)
    f = IA + cross_force(V, IV) - f_ext
    F_sub = jnp.einsum("ij,jk->ik", SUBj, f)
    return jnp.einsum("dk,dk->d", S, F_sub[jnp.asarray(m.dof_body)])


def passive_torques(m: Model, qpos, u):
    """Joint damping + soft joint-limit torques on 1-dof joints."""
    tau = -jnp.asarray(m.dof_damping) * u
    one_dof = np.where((m.jnt_type == HINGE) | (m.jnt_type == SLIDE))[0]
    if len(one_dof):
        qa, da = m.jnt_qposadr[one_dof], m.jnt_dofadr[one_dof]
        qd = jnp.zeros(m.nv).at[da].set(qpos[qa])
    else:
        qd = jnp.zeros(m.nv)
    lo = jnp.asarray(m.dof_limit_lo)
    hi = jnp.asarray(m.dof_limit_hi)
    over = jnp.maximum(qd - hi, 0.0)
    under = jnp.maximum(lo - qd, 0.0)
    active = (over > 0) | (under > 0)
    tau = tau - m.limit_stiffness * (over - under)
    tau = tau - jnp.where(active, m.limit_damping * u, 0.0)
    return tau


# ------------------------------------------------------------------ contacts

def _geom_world(m: Model, body_pos, body_quat):
    gb = jnp.asarray(m.geom_body)
    p = body_pos[gb] + Q.rotate(body_quat[gb], jnp.asarray(m.geom_pos))
    q = Q.mul(body_quat[gb], jnp.asarray(m.geom_quat))
    return p, q


def _sphere_points(m: Model, gpos, gquat):
    """Contact probe spheres: sphere geoms give 1, capsules their two end
    caps. Static layout -> one gather + one batched rotate."""
    probes = []   # (geom index, end: -1/0/+1)
    for gi in range(m.ng):
        t = int(m.geom_type[gi])
        if t == SPHERE:
            probes.append((gi, 0.0))
        elif t == CAPSULE:
            probes.append((gi, 1.0))
            probes.append((gi, -1.0))
    if not probes:
        return (jnp.zeros((0, 3)), jnp.zeros((0,)),
                np.zeros((0,), np.int64))
    gidx = np.array([p[0] for p in probes])
    ends = jnp.asarray([p[1] for p in probes])[:, None]
    h = jnp.asarray(m.geom_size[gidx, 1])[:, None]
    axis = Q.rotate(gquat[gidx], jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0]), (len(probes), 3)))
    pts = gpos[gidx] + ends * h * axis
    rads = jnp.asarray(m.geom_size[gidx, 0])
    return pts, rads, gidx


def _point_box_distance(p, bmin, bmax):
    """Signed distance point->AABB surface with outward normal (negative
    inside)."""
    clamped = jnp.clip(p, bmin, bmax)
    delta = p - clamped
    d_out = jnp.linalg.norm(delta, axis=-1)
    outside = d_out > 1e-9
    n_out = delta / jnp.where(outside, d_out, 1.0)[..., None]
    face_lo = p - bmin
    face_hi = bmax - p
    faces = jnp.concatenate([face_lo, face_hi], axis=-1)
    k = jnp.argmin(faces, axis=-1)
    d_in = -jnp.min(faces, axis=-1)
    normals = jnp.concatenate([-jnp.eye(3), jnp.eye(3)], axis=0)
    n_in = normals[k]
    dist = jnp.where(outside, d_out, d_in)
    normal = jnp.where(outside[..., None], n_out, n_in)
    return dist, normal


def contact_forces(m: Model, body_pos, body_quat, V, p0=None):
    """Penalty contacts of all probe spheres vs ground plane + static
    AABBs. Returns per-body external spatial force [nb, 6].

    `p0` is the reference point of the spatial frame V lives in (the
    robot-centered frame _substep uses — see the conditioning note there).
    Geometry (floor/box tests) always runs on ABSOLUTE positions; all
    velocity and torque arms are taken about p0 so the returned spatial
    forces match V's frame. p0=None keeps the legacy world-origin frame."""
    if p0 is None:
        p0 = jnp.zeros(3)
    gpos, gquat = _geom_world(m, body_pos, body_quat)
    pts, rads, gidx = _sphere_points(m, gpos, gquat)
    npts = pts.shape[0]
    if npts == 0:
        return jnp.zeros((m.nb, 6))
    body_of_pt = m.geom_body[gidx]
    fric = jnp.asarray(m.geom_friction)[gidx]
    omega = 1.0 / m.contact_timeconst
    m_eff = jnp.asarray(m.mass)[body_of_pt]
    k_n = m_eff * omega**2
    c_n = 2.0 * m.contact_dampratio * m_eff * omega

    pts_r = pts - p0
    bp_r = body_pos - p0
    Vp = V[body_of_pt]
    v_pt = Vp[:, 3:] + jnp.cross(Vp[:, :3], pts_r)
    # body-frame-origin (~COM) linear velocity per probe: the impulse
    # budget below must meter on the BODY's motion, not the probe point's —
    # a spinning body has probes moving down while its COM moves up, and a
    # point-velocity budget lets rotation mint fresh "arrest" allowance
    # every substep (flywheel pumping -> monotone COM thrust -> catapult)
    v_bl = (V[:, 3:] + jnp.cross(V[:, :3], bp_r))[body_of_pt]

    def force_from(dist, normal):
        pen = jnp.maximum(-dist, 0.0)
        v_n = (v_pt * normal).sum(-1)
        f_n = jnp.maximum(k_n * pen - c_n * v_n, 0.0)
        f_n = jnp.where(pen > 0, f_n, 0.0)
        # separation gate: strictly dissipative impacts (types.py)
        f_n = f_n * jnp.clip(1.0 - v_n / m.contact_maxrebound, 0.0, 1.0)
        # impulse cap: the gate only sees the pre-substep velocity, so a
        # stiff spring at deep fast penetration can reverse v_n far past
        # maxrebound within ONE substep (a catapult). Bound the substep
        # impulse so the post-substep normal velocity stays <= maxrebound.
        f_n = jnp.minimum(f_n, jnp.maximum(
            m_eff * (m.contact_maxrebound - v_n) / m.dt, 0.0))
        v_t = v_pt - v_n[:, None] * normal
        vt_norm = jnp.sqrt((v_t**2).sum(-1) + m.friction_vel_tol**2 * 1e-4)
        scale = jnp.minimum(1.0, vt_norm / m.friction_vel_tol)
        f_t = -fric[:, None] * f_n[:, None] * (v_t / vt_norm[:, None]) \
            * scale[:, None]
        v_cn = (v_bl * normal).sum(-1)
        # +inf sentinel for non-contact probes: a 0 sentinel polluted the
        # per-body min and kept the support allowance fully open for bodies
        # whose every live contact was already separating (pump enabler)
        return (f_n[:, None] * normal + f_t, f_n,
                jnp.where(pen > 0, v_cn, jnp.inf))

    dist_p = pts[:, 2] - rads
    n_p = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (npts, 3))
    total, imp_pt, vmin_pt = force_from(dist_p, n_p)

    if m.nsb > 0:
        bmin = jnp.asarray(m.static_box_min)[None]
        bmax = jnp.asarray(m.static_box_max)[None]
        d_b, n_b = _point_box_distance(pts[:, None, :], bmin, bmax)
        d_b = d_b - rads[:, None]
        pen = jnp.maximum(-d_b, 0.0)
        v_n = (v_pt[:, None, :] * n_b).sum(-1)
        f_n = jnp.maximum(k_n[:, None] * pen - c_n[:, None] * v_n, 0.0)
        f_n = jnp.where(pen > 0, f_n, 0.0)
        # separation gate: strictly dissipative impacts (types.py)
        f_n = f_n * jnp.clip(1.0 - v_n / m.contact_maxrebound, 0.0, 1.0)
        # impulse cap (see force_from)
        f_n = jnp.minimum(f_n, jnp.maximum(
            m_eff[:, None] * (m.contact_maxrebound - v_n) / m.dt, 0.0))
        v_t = v_pt[:, None, :] - v_n[..., None] * n_b
        vt_norm = jnp.sqrt((v_t**2).sum(-1) + m.friction_vel_tol**2 * 1e-4)
        scale = jnp.minimum(1.0, vt_norm / m.friction_vel_tol)
        f_t = -fric[:, None, None] * f_n[..., None] * (v_t / vt_norm[..., None]) \
            * scale[..., None]
        total = total + (f_n[..., None] * n_b + f_t).sum(axis=1)
        imp_pt = imp_pt + f_n.sum(axis=1)
        v_cn = (v_bl[:, None, :] * n_b).sum(-1)
        vmin_pt = jnp.minimum(vmin_pt,
                              jnp.where(pen > 0, v_cn, jnp.inf).min(axis=1))

    # --- per-body world-contact impulse budget -----------------------------
    # The per-probe cap above bounds each probe's substep impulse, but a
    # body carries several probes (the torso has 9) and their CAPPED
    # impulses SUM: a torso slamming the floor at the -20 m/s clamp could
    # rebound at +20 (9 x budget) and fly over the maze walls, ending the
    # episode (z > 2 guard, envs/antmaze.py). Rescale every probe force on
    # a body so the body's total normal impulse stays within
    #   2*m_total*g (static support allowance, scale-free)
    #   + m_b * (maxrebound - min v_n) / dt (rebound allowance),
    # which keeps post-substep rebound O(maxrebound) while leaving
    # resting-contact support forces untouched. World contacts only —
    # dynamic-geom (furniture) pairs keep the per-probe cap so their
    # equal-and-opposite reactions stay consistent.
    # Round-3 revision of the allowance: the old form
    #   2*m_total*g + m_b*(maxrebound + max(-vmin, 0))/dt
    # let a body that was ALREADY separating (vmin >= 0) earn a fresh
    # +maxrebound of normal velocity every substep, and handed the full
    # 2*m_total*g static term to 1-kg leg bodies (~17 m/s of Dv per
    # substep) — together the pump behind the 0.65 -> 20 m/s single-step
    # launches seen in eval forensics. Now the support term FADES as the
    # body separates faster than maxrebound, and the rebound term is
    # (maxrebound - v_out)+, so total contact thrust can never push a
    # body past ~maxrebound outgoing. In stance (v ~ 0) the support
    # allowance is fully open, so standing/walking is untouched.
    m_total = float(np.asarray(m.mass).sum())
    g_mag = float(abs(m.gravity[2]))
    support_fade = jnp.clip(1.0 - vmin_pt / m.contact_maxrebound, 0.0, 1.0)
    allow = (2.0 * m_total * g_mag * support_fade
             + m_eff * jnp.maximum(m.contact_maxrebound - vmin_pt, 0.0)
             / m.dt)
    imp_body = jax.ops.segment_sum(imp_pt, body_of_pt, num_segments=m.nb)
    allow_body = jax.ops.segment_max(allow, body_of_pt, num_segments=m.nb)
    s_body = jnp.minimum(1.0, allow_body / jnp.maximum(imp_body, 1e-9))
    total = total * s_body[body_of_pt][:, None]

    # --- global vertical-thrust budget -------------------------------------
    # The per-body budget cannot see across normals: a body pressed into a
    # wall (approaching along the wall normal) keeps its allowance open
    # while its floor contacts thrust it upward, and four stance legs each
    # holding a 2*m_total*g support allowance can jointly push ~8 g through
    # the joints into the torso. Meter the SUM of upward (+z) world-contact
    # force across the whole robot against the COM vertical velocity:
    # support fades as the robot rises faster than maxrebound, arrest
    # allowance covers landings. COM vz then can't exceed ~maxrebound from
    # contact thrust, so wall-vaulting (z > 2 guard) is unreachable while
    # stance (vz ~ 0) keeps full 2*M*g support.
    vcom = V[:, 3:] + jnp.cross(V[:, :3], bp_r)              # [nb, 3]
    mass_v = jnp.asarray(m.mass)
    vz_com = (mass_v * vcom[:, 2]).sum() / m_total
    up_fade = jnp.clip(1.0 - vz_com / m.contact_maxrebound, 0.0, 1.0)
    allow_up = (2.0 * m_total * g_mag * up_fade
                + m_total * jnp.maximum(m.contact_maxrebound - vz_com, 0.0)
                / m.dt)
    f_up = jnp.maximum(total[:, 2], 0.0).sum()
    s_up = jnp.minimum(1.0, allow_up / jnp.maximum(f_up, 1e-9))
    total = total.at[:, 2].set(
        jnp.where(total[:, 2] > 0, total[:, 2] * s_up, total[:, 2]))

    # --- probe spheres vs dynamic BOX geoms (drawers, doors, furniture) ---
    F_other = jnp.zeros((m.nb, 6))
    dyn_boxes = [gi for gi in range(m.ng) if int(m.geom_type[gi]) == BOX]
    if dyn_boxes:
        for gi in dyn_boxes:
            b2 = int(m.geom_body[gi])
            bq, bp = gquat[gi], gpos[gi]
            # probe points in the box frame
            local = Q.inv_rotate(jnp.broadcast_to(bq, (npts, 4)), pts - bp)
            half = jnp.asarray(m.geom_size[gi])
            d, n_loc = _point_box_distance(local, -half, half)
            d = d - rads
            n_w = Q.rotate(jnp.broadcast_to(bq, (npts, 4)), n_loc)
            pen = jnp.maximum(-d, 0.0)
            # exclude probes that live on the same body as the box
            same = jnp.asarray(body_of_pt == b2)
            pen = jnp.where(same, 0.0, pen)
            v_box = V[b2, 3:] + jnp.cross(V[b2, :3], pts_r)
            v_rel = v_pt - v_box
            v_n = (v_rel * n_w).sum(-1)
            f_n = jnp.maximum(k_n * pen - c_n * v_n, 0.0)
            f_n = jnp.where(pen > 0, f_n, 0.0)
            # separation gate: strictly dissipative impacts (types.py)
            f_n = f_n * jnp.clip(1.0 - v_n / m.contact_maxrebound, 0.0, 1.0)
            # impulse cap (see force_from). The (.,0) clamp is load-bearing:
            # without it a probe separating faster than maxrebound with
            # pen == 0 turns the cap negative and min() injects a spurious
            # ATTRACTIVE force (measured: 9 N yanked on an untouched drawer
            # while the arm whipped past; engine_cl/pallas always clamped)
            f_n = jnp.minimum(f_n, jnp.maximum(
                m_eff * (m.contact_maxrebound - v_n) / m.dt, 0.0))
            v_t = v_rel - v_n[:, None] * n_w
            vt_norm = jnp.sqrt((v_t**2).sum(-1)
                               + m.friction_vel_tol**2 * 1e-4)
            scale = jnp.minimum(1.0, vt_norm / m.friction_vel_tol)
            f_t = -fric[:, None] * f_n[:, None] * (v_t / vt_norm[:, None]) \
                * scale[:, None]
            f_vec = f_n[:, None] * n_w + f_t               # on the probes
            total = total + f_vec
            # equal and opposite on the box's body
            F_other = F_other.at[b2, :3].add(-jnp.cross(pts_r, f_vec).sum(0))
            F_other = F_other.at[b2, 3:].add(-f_vec.sum(0))

    torque = jnp.cross(pts_r, total)
    F = F_other
    F = F.at[body_of_pt, :3].add(torque)
    F = F.at[body_of_pt, 3:].add(total)
    return F


# ------------------------------------------------------------- linear solver

def _chol_solve_envs_last(M, b):
    """Batched Cholesky solve in env-LAST layout: M [n, n, B], b [n, B].

    On TPU the minor-most axis maps to the 128 vector lanes; a [B, 14, 14]
    layout wastes 89% of every lane (and dominated the substep at ~19 ms,
    measured), while [*, *, B] keeps the lanes full. Fully unrolled
    right-looking column algorithm, elementwise ops only."""
    n = M.shape[0]
    eps = 1e-9
    A = M
    L = jnp.zeros_like(M)
    for j in range(n):
        d = jnp.sqrt(jnp.maximum(A[j, j], eps))            # [B]
        inv_d = 1.0 / d
        col = A[:, j] * inv_d[None, :]                     # [n, B]
        row_idx = jnp.arange(n)
        col = jnp.where((row_idx >= j)[:, None], col, 0.0)
        L = L.at[:, j].set(col)
        A = A - col[:, None, :] * col[None, :, :]          # trailing update

    y = b
    for j in range(n):
        yj = y[j] / L[j, j]                                # [B]
        upd = y - L[:, j] * yj[None, :]
        y = jnp.where((jnp.arange(n) == j)[:, None], yj[None, :],
                      jnp.where((jnp.arange(n) > j)[:, None], upd, y))

    x = y
    for j in range(n - 1, -1, -1):
        xj = x[j] / L[j, j]
        upd = x - L[j, :] * xj[None, :]
        x = jnp.where((jnp.arange(n) == j)[:, None], xj[None, :],
                      jnp.where((jnp.arange(n) < j)[:, None], upd, x))
    return x


@jax.custom_batching.custom_vmap
def chol_solve_small(M, b):
    """Solve M x = b for small SPD M (unbatched: [n, n], [n]).

    XLA's library Cholesky/LU lower to loop-heavy custom calls that are
    catastrophically slow for batched tiny matrices on TPU; and a naive
    vmap leaves the tiny n on the vector lanes. The custom vmap rule
    transposes the batch to the minor axis and runs the unrolled
    column-Cholesky there (see _chol_solve_envs_last)."""
    return _chol_solve_envs_last(M[:, :, None], b[:, None])[:, 0]


@chol_solve_small.def_vmap
def _chol_solve_vmap(axis_size, in_batched, M, b):
    M_batched, b_batched = in_batched
    if not M_batched:
        M = jnp.broadcast_to(M, (axis_size,) + M.shape)
    if not b_batched:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    out = _chol_solve_envs_last(jnp.moveaxis(M, 0, -1),
                                jnp.moveaxis(b, 0, -1))
    return jnp.moveaxis(out, -1, 0), True


# ---------------------------------------------------------------- integrator

def actuator_torques(m: Model, ctrl, qpos=None, u=None, tau_grav=None):
    """Actuator forces. Torque motors: gear * clip(ctrl, -1, 1). Position
    servos: clip(kp*(ctrl - q) - kd*qdot + tau_grav, +-force) — ctrl is the
    TARGET angle/position for servo actuators. tau_grav [nv] is the
    zero-velocity/no-contact bias torque: PyBullet's POSITION_CONTROL motor
    is a stiff velocity constraint that holds position against gravity
    regardless of load (pybullet.py:setJointMotorControlArray semantics);
    a plain explicit PD with kp*delta torque authority sags by
    tau_gravity/kp, which for delta-target control (panda.py:179-182,
    target = q + 0.05*action) exceeds the commanded delta on the
    gravity-loaded shoulder joints — the arm never tracks. Compensating
    gravity inside the force-limited servo restores tracking while keeping
    contact compliance (the comp term sees no contact forces)."""
    tau = jnp.zeros(m.nv)
    if not m.nu:
        return tau
    dof = jnp.asarray(m.act_dof)
    is_servo = jnp.asarray(m.act_type == 1)
    f_motor = jnp.asarray(m.act_gear) * jnp.clip(ctrl, -1.0, 1.0)
    if (m.act_type == 1).any():
        # q of each servo's joint (1-dof joints only)
        qadr = np.zeros(m.nu, np.int64)
        for k, d in enumerate(m.act_dof):
            b = int(m.dof_body[d])
            qadr[k] = m.jnt_qposadr[b]
        q = qpos[jnp.asarray(qadr)]
        qd = u[dof]
        f_servo = jnp.asarray(m.act_kp) * (ctrl - q) - jnp.asarray(m.act_kd) * qd
        if tau_grav is not None:
            f_servo = f_servo + tau_grav[dof]
        f_servo = jnp.clip(f_servo, -jnp.asarray(m.act_force),
                           jnp.asarray(m.act_force))
    else:
        f_servo = jnp.zeros(m.nu)
    f = jnp.where(is_servo, f_servo, f_motor)
    return tau.at[dof].add(f)


def substep(m: Model, qpos, qvel, ctrl):
    # The dynamics' small matrices are far too ill-conditioned for the
    # TPU's default bf16 matmul passes — the Cholesky goes NaN within a
    # few steps. Physics always runs full-f32; the NN path keeps the
    # fast default precision.
    with jax.default_matmul_precision("float32"):
        return _substep(m, qpos, qvel, ctrl)


def _substep(m: Model, qpos, qvel, ctrl):
    body_pos, body_quat = fk(m, qpos)
    # Spatial algebra in a ROBOT-CENTERED frame. At the world origin the
    # free-joint rows of M carry m*r^2 terms and the origin-referenced
    # velocities carry ~|w|*r-scale cancellations; in f32 at r ~ 8 m the
    # Cholesky solution error injects real momentum (measured: +13 kg m/s
    # in ONE substep at r = 7.4 m — the residual eval torso launches,
    # RESULTS.md round 3). Shifting the frame to the body centroid bounds
    # every intermediate by the robot's own scale and makes the dynamics
    # translation-invariant again; geometry stays absolute inside
    # contact_forces.
    p0 = body_pos.mean(axis=0)
    bp = body_pos - p0
    S = dof_subspaces(m, bp, body_quat)
    u = qvel_to_u(m, qvel, bp)
    V = body_velocities(m, S, u)
    I6 = spatial_inertia(m, bp, body_quat)
    f_ext = contact_forces(m, body_pos, body_quat, V, p0=p0)
    tau_bias = bias_forces(m, I6, S, V, u, f_ext)
    if (m.act_type == 1).any():
        # gravity compensation for position servos: bias at zero velocity
        # with no external forces = pure gravity load (see actuator_torques)
        tau_grav = bias_forces(m, I6, S, jnp.zeros_like(V),
                               jnp.zeros_like(u), jnp.zeros_like(f_ext))
    else:
        tau_grav = None
    tau_act = actuator_torques(m, ctrl, qpos, u, tau_grav)
    tau = tau_act + passive_torques(m, qpos, u) - tau_bias
    M = crba(m, I6, S)
    udot = chol_solve_small(M, tau)

    u_new = jnp.clip(u + m.dt * udot, -m.max_qvel, m.max_qvel)
    # semi-implicit: integrate positions with the new velocities.
    # u is referenced at the body centroid, so the u-space clamp is now a
    # near-physical bound; the qvel clamp still guards the w x (pos - p0)
    # lever arm of outlying bodies.
    qvel_new = jnp.clip(u_to_qvel(m, u_new, bp),
                        -m.max_qvel, m.max_qvel)
    qpos_new = qpos
    one_dof = np.where((m.jnt_type == HINGE) | (m.jnt_type == SLIDE))[0]
    if len(one_dof):
        qa, da = m.jnt_qposadr[one_dof], m.jnt_dofadr[one_dof]
        qpos_new = qpos_new.at[qa].add(m.dt * qvel_new[da])
        # inelastic limit stops: project back into range and zero the
        # outward velocity. The explicit limit SPRING alone is elastic — a
        # hinge slamming its stop at the qvel clamp (~11 rad/s on
        # armature 1 = ~50 J) rebounds with its full energy, and the
        # synchronized thrash flings the torso (MuJoCo's limit constraints
        # with solref '.02 1' are critically damped, i.e. ~inelastic —
        # this projection matches that). The spring still shapes the last
        # substep of approach; projection bounds its overshoot to one
        # substep of travel.
        lo_d = jnp.asarray(m.dof_limit_lo)[da]
        hi_d = jnp.asarray(m.dof_limit_hi)[da]
        qv = qpos_new[qa]
        qd = qvel_new[da]
        qd = jnp.where(qv < lo_d, jnp.maximum(qd, 0.0), qd)
        qd = jnp.where(qv > hi_d, jnp.minimum(qd, 0.0), qd)
        qpos_new = qpos_new.at[qa].set(jnp.clip(qv, lo_d, hi_d))
        qvel_new = qvel_new.at[da].set(qd)
    for i in range(m.nb):
        if m.jnt_type[i] == FREE:
            qa, d = int(m.jnt_qposadr[i]), int(m.jnt_dofadr[i])
            vp = qvel_new[d: d + 3]
            w = qvel_new[d + 3: d + 6]
            qpos_new = qpos_new.at[qa: qa + 3].add(m.dt * vp)
            quat_new = Q.integrate(qpos[qa + 3: qa + 7], w, m.dt)
            qpos_new = qpos_new.at[qa + 3: qa + 7].set(quat_new)
    return qpos_new, qvel_new


def step(m: Model, qpos, qvel, ctrl):
    """One control step = n_substeps physics substeps (single env). ctrl
    holds motor commands in [-1, 1] and/or servo target positions."""

    def body(carry, _):
        qp, qv = carry
        qp, qv = substep(m, qp, qv, ctrl)
        return (qp, qv), None

    (qpos, qvel), _ = jax.lax.scan(body, (qpos, qvel), None,
                                   length=m.n_substeps)
    return qpos, qvel
