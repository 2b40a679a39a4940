"""Batched articulated dynamics in env-LAST ("channel-last") layout.

Same math as engine.py, but every array carries the env batch on the
MINOR-most axis: body poses are [nb, 3, B], spatial quantities [*, 6, B],
the mass matrix [nv, nv, B]. Rationale (measured on TPU v5e): XLA freely
linearizes fused *elementwise* chains regardless of layout, but gathers,
scatters, reductions and dot_generals tile the minor dimensions onto the
(8 x 128) vector registers — with env-first [B, 9, 3] operands they pad
3 -> 128 lanes (~40x wasted bandwidth), while env-last keeps all 128 lanes
full of envs and turns the tree einsums into matmuls with a huge minor dim.
The vmap-of-single-env engine spent ~11.5 ms per substep at 4096 envs;
this layout is the production path (engine.py remains the semantic
reference and the two are cross-checked in tests).

API: step(model, qpos [B, nq], qvel [B, nv], ctrl [B, nu]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu.physics.engine import _chol_solve_envs_last, _structure
from ddiffpg_tpu.physics.types import BOX, CAPSULE, FIXED, FREE, HINGE, SLIDE, SPHERE, Model

# ---------------------------------------------------------- quat, env-last
# quaternions [*, 4, B], vectors [*, 3, B]


def _qmul(q1, q2):
    w1, x1, y1, z1 = q1[..., 0, :], q1[..., 1, :], q1[..., 2, :], q1[..., 3, :]
    w2, x2, y2, z2 = q2[..., 0, :], q2[..., 1, :], q2[..., 2, :], q2[..., 3, :]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-2)


def _cross(a, b):
    return jnp.cross(a, b, axis=-2)


def _qrot(q, v):
    qv = q[..., 1:, :]
    t = 2.0 * _cross(qv, v)
    return v + q[..., :1, :] * t + _cross(qv, t)


def _qconj(q):
    sign = jnp.array([1.0, -1.0, -1.0, -1.0]).reshape(
        (1,) * (q.ndim - 2) + (4, 1))
    return q * sign


def _qrot_inv(q, v):
    return _qrot(_qconj(q), v)


def _axis_angle(axis, ang):
    """axis: static [g, 3]; ang: [g, B] -> quat [g, 4, B]."""
    half = ang * 0.5
    s = jnp.sin(half)
    ax = jnp.asarray(axis)[..., None]                       # [g, 3, 1]
    return jnp.concatenate([jnp.cos(half)[:, None, :], ax * s[:, None, :]],
                           axis=-2)


def _qintegrate(q, w, dt):
    """q [4, B], w [3, B] world angular velocity."""
    angle = jnp.sqrt((w**2).sum(-2, keepdims=True))
    axis = w / jnp.where(angle > 1e-9, angle, 1.0)
    half = angle[0] * dt * 0.5
    dq = jnp.concatenate([jnp.cos(half)[None], axis * jnp.sin(half)[None]],
                         axis=-2)
    out = _qmul(dq, q)
    return out / jnp.sqrt((out**2).sum(-2, keepdims=True))


def _cross_motion(v, m):
    w, vo = v[..., :3, :], v[..., 3:, :]
    mw, mv = m[..., :3, :], m[..., 3:, :]
    return jnp.concatenate([_cross(w, mw), _cross(w, mv) + _cross(vo, mw)],
                           axis=-2)


def _cross_force(v, f):
    w, vo = v[..., :3, :], v[..., 3:, :]
    n, fl = f[..., :3, :], f[..., 3:, :]
    return jnp.concatenate([_cross(w, n) + _cross(vo, fl), _cross(w, fl)],
                           axis=-2)


def _skew(v):
    """v [..., 3, B] -> [..., 3, 3, B]."""
    x, y, z = v[..., 0, :], v[..., 1, :], v[..., 2, :]
    zero = jnp.zeros_like(x)
    rows = [jnp.stack([zero, -z, y], axis=-2),
            jnp.stack([z, zero, -x], axis=-2),
            jnp.stack([-y, x, zero], axis=-2)]
    return jnp.stack(rows, axis=-3)


def _to_matrix(q):
    """q [*, 4, B] -> R [*, 3, 3, B]."""
    w, x, y, z = q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
    r = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]
    return jnp.stack([jnp.stack(row, axis=-2) for row in r], axis=-3)


# ------------------------------------------------------------- kinematics

def fk(m: Model, qpos):
    """qpos [nq, B] -> (pos [nb, 3, B], quat [nb, 4, B])."""
    _, levels, _, _ = _structure(m)
    B = qpos.shape[-1]
    pos = jnp.zeros((m.nb, 3, B))
    quat = jnp.zeros((m.nb, 4, B)).at[:, 0].set(1.0)
    for jt, ids in levels:
        qa = m.jnt_qposadr[ids]
        if jt == FREE:
            vals = qpos[qa[:, None] + np.arange(7)[None]]   # [g, 7, B]
            pos = pos.at[ids].set(vals[:, :3])
            quat = quat.at[ids].set(vals[:, 3:7])
            continue
        par = np.maximum(m.parent[ids], 0)
        is_root = (m.parent[ids] < 0)[:, None, None]
        pp = jnp.where(is_root, 0.0, pos[par])
        ident = jnp.zeros((1, 4, 1)).at[:, 0].set(1.0)
        pq = jnp.where(is_root, ident, quat[par])
        bpos = jnp.asarray(m.body_pos[ids])[..., None]       # [g, 3, 1]
        bquat = jnp.asarray(m.body_quat[ids])[..., None]
        p0 = pp + _qrot(pq, jnp.broadcast_to(bpos, (len(ids), 3, B)))
        q0 = _qmul(pq, jnp.broadcast_to(bquat, (len(ids), 4, B)))
        if jt == HINGE:
            ang = qpos[qa]                                   # [g, B]
            qj = _axis_angle(m.jnt_axis[ids], ang)
            qn = _qmul(q0, qj)
            anchor = jnp.broadcast_to(
                jnp.asarray(m.jnt_pos[ids])[..., None], (len(ids), 3, B))
            pn = p0 + _qrot(q0, anchor) - _qrot(qn, anchor)
        elif jt == SLIDE:
            qn = q0
            ax = jnp.broadcast_to(
                jnp.asarray(m.jnt_axis[ids])[..., None], (len(ids), 3, B))
            pn = p0 + _qrot(q0, ax) * qpos[qa][:, None, :]
        else:
            qn, pn = q0, p0
        pos = pos.at[ids].set(pn)
        quat = quat.at[ids].set(qn)
    return pos, quat


def dof_subspaces(m: Model, body_pos, body_quat):
    B = body_pos.shape[-1]
    base = np.zeros((m.nv, 6), np.float32)
    for i in range(m.nb):
        if m.jnt_type[i] == FREE:
            d = int(m.jnt_dofadr[i])
            base[d: d + 3, 3:] = np.eye(3)
            base[d + 3: d + 6, :3] = np.eye(3)
    S = jnp.broadcast_to(jnp.asarray(base)[..., None], (m.nv, 6, B))

    for jt in (HINGE, SLIDE):
        ids = np.where(m.jnt_type == jt)[0]
        if not len(ids):
            continue
        da = m.jnt_dofadr[ids]
        bq = body_quat[ids]
        ax = jnp.broadcast_to(
            jnp.asarray(m.jnt_axis[ids])[..., None], (len(ids), 3, B))
        w = _qrot(bq, ax)
        if jt == HINGE:
            anchor = jnp.broadcast_to(
                jnp.asarray(m.jnt_pos[ids])[..., None], (len(ids), 3, B))
            a = body_pos[ids] + _qrot(bq, anchor)
            row = jnp.concatenate([w, _cross(a, w)], axis=-2)
        else:
            row = jnp.concatenate([jnp.zeros_like(w), w], axis=-2)
        S = S.at[da].set(row)
    return S


def qvel_to_u(m: Model, qvel, body_pos):
    u = qvel
    for i in range(m.nb):
        if m.jnt_type[i] == FREE:
            d = int(m.jnt_dofadr[i])
            vp, w = qvel[d: d + 3], qvel[d + 3: d + 6]
            u = u.at[d: d + 3].set(vp - _cross(w, body_pos[i]))
    return u


def u_to_qvel(m: Model, u, body_pos):
    qvel = u
    for i in range(m.nb):
        if m.jnt_type[i] == FREE:
            d = int(m.jnt_dofadr[i])
            vo, w = u[d: d + 3], u[d + 3: d + 6]
            qvel = qvel.at[d: d + 3].set(vo + _cross(w, body_pos[i]))
    return qvel


def _joint_vel(m: Model, S, u):
    return jax.ops.segment_sum(S * u[:, None, :], jnp.asarray(m.dof_body),
                               num_segments=m.nb)


def _down_tree(m: Model, x):
    """Ancestor prefix-sum: out[i] = sum over ancestors-or-self of x.
    Level-wise adds ([*, B] elementwise) instead of a dot_general with the
    SUB mask — TPU dot_generals with trailing batch dims get rewrapped in
    layout transposes that dominated the substep (measured via HLO)."""
    _, levels, _, _ = _structure(m)
    out = x
    for jt, ids in levels:
        par = m.parent[ids]
        if (par < 0).all():
            continue
        parc = np.maximum(par, 0)
        add = jnp.where((par < 0).reshape((-1,) + (1,) * (x.ndim - 1)),
                        0.0, out[parc])
        out = out.at[ids].add(add)
    return out


def _up_tree(m: Model, x):
    """Subtree suffix-sum: out[i] = sum over subtree(i) of x."""
    _, levels, _, _ = _structure(m)
    out = x
    for jt, ids in reversed(levels):
        par = m.parent[ids]
        ok = par >= 0
        if not ok.any():
            continue
        sel = ids[ok]
        out = out.at[np.asarray(par[ok])].add(out[sel])
    return out


def body_velocities(m: Model, S, u):
    return _down_tree(m, _joint_vel(m, S, u))


# --------------------------------------------------------------- dynamics

def spatial_inertia(m: Model, body_pos, body_quat):
    B = body_pos.shape[-1]
    R = _to_matrix(body_quat)                                # [nb, 3, 3, B]
    # (R @ com)_i = sum_j R[i, j] com[j]
    c = body_pos + (R * jnp.asarray(m.com)[:, None, :, None]).sum(axis=2)
    Ibody = jnp.asarray(m.inertia)                           # [nb, 3, 3]
    # Ic = R Ibody R^T, all contractions as broadcast-multiply-reduce
    RI = (R[:, :, :, None, :] * Ibody[:, None, :, :, None]).sum(axis=2)
    Ic = (RI[:, :, None, :, :] * R[:, None, :, :, :]).sum(axis=3)
    mass = jnp.asarray(m.mass)[:, None, None, None]
    cx = _skew(c)                                            # [nb, 3, 3, B]
    # cxcx[i,k] = sum_j cx[i,j] cx[j,k]
    cxcx = (cx[:, :, :, None, :] * cx[:, None, :, :, :]).sum(axis=2)
    tl = Ic - mass * cxcx
    tr = mass * cx
    eye = jnp.broadcast_to(jnp.eye(3)[None, :, :, None], (m.nb, 3, 3, B))
    top = jnp.concatenate([tl, tr], axis=2)
    bot = jnp.concatenate([-tr, mass * eye], axis=2)
    return jnp.concatenate([top, bot], axis=1)               # [nb, 6, 6, B]


def crba(m: Model, I6, S):
    _, _, _, anc = _structure(m)
    Ic = _up_tree(m, I6)                                     # composite
    Ic_d = Ic[jnp.asarray(m.dof_body)]                       # [nv, 6, 6, B]
    F = (Ic_d * S[:, None, :, :]).sum(axis=2)                # [nv, 6, B]
    M_full = (F[:, None] * S[None, :]).sum(axis=2)           # [nv, nv, B]
    Mv = M_full * jnp.asarray(anc)[..., None]
    diag = Mv * jnp.eye(m.nv)[..., None]
    M = Mv + jnp.swapaxes(Mv, 0, 1) - diag
    return M + (jnp.diag(jnp.asarray(m.dof_armature)))[..., None]


def bias_forces(m: Model, I6, S, V, u, f_ext):
    g = jnp.asarray(m.gravity)
    a0 = jnp.concatenate([jnp.zeros(3), -g])[:, None]        # [6, 1]

    vJ = _joint_vel(m, S, u)
    parent = np.maximum(m.parent, 0)
    Vp = jnp.where((m.parent < 0)[:, None, None], 0.0, V[parent])
    c = _cross_motion(Vp, vJ)
    A = a0[None] + _down_tree(m, c)

    IA = (I6 * A[:, None, :, :]).sum(axis=2)
    IV = (I6 * V[:, None, :, :]).sum(axis=2)
    f = IA + _cross_force(V, IV) - f_ext
    F_sub = _up_tree(m, f)
    return (S * F_sub[jnp.asarray(m.dof_body)]).sum(axis=1)


def passive_torques(m: Model, qpos, u):
    tau = -jnp.asarray(m.dof_damping)[:, None] * u
    one_dof = np.where((m.jnt_type == HINGE) | (m.jnt_type == SLIDE))[0]
    if len(one_dof):
        qa, da = m.jnt_qposadr[one_dof], m.jnt_dofadr[one_dof]
        qd = jnp.zeros_like(u).at[da].set(qpos[qa])
    else:
        qd = jnp.zeros_like(u)
    lo = jnp.asarray(m.dof_limit_lo)[:, None]
    hi = jnp.asarray(m.dof_limit_hi)[:, None]
    over = jnp.maximum(qd - hi, 0.0)
    under = jnp.maximum(lo - qd, 0.0)
    active = (over > 0) | (under > 0)
    tau = tau - m.limit_stiffness * (over - under)
    tau = tau - jnp.where(active, m.limit_damping * u, 0.0)
    return tau


# --------------------------------------------------------------- contacts

def _geom_world(m: Model, body_pos, body_quat):
    B = body_pos.shape[-1]
    gb = jnp.asarray(m.geom_body)
    gp = jnp.broadcast_to(jnp.asarray(m.geom_pos)[..., None], (m.ng, 3, B))
    gq = jnp.broadcast_to(jnp.asarray(m.geom_quat)[..., None], (m.ng, 4, B))
    p = body_pos[gb] + _qrot(body_quat[gb], gp)
    q = _qmul(body_quat[gb], gq)
    return p, q


def _probe_layout(m: Model):
    probes = []
    for gi in range(m.ng):
        t = int(m.geom_type[gi])
        if t == SPHERE:
            probes.append((gi, 0.0))
        elif t == CAPSULE:
            probes.append((gi, 1.0))
            probes.append((gi, -1.0))
    gidx = np.array([p[0] for p in probes], np.int64)
    ends = np.array([p[1] for p in probes], np.float32)
    return gidx, ends


def _point_box_distance(p, bmin, bmax):
    """p [..., 3, B]; bmin/bmax broadcastable [..., 3, 1]."""
    clamped = jnp.clip(p, bmin, bmax)
    delta = p - clamped
    d_out = jnp.sqrt((delta**2).sum(-2))
    outside = d_out > 1e-9
    n_out = delta / jnp.where(outside, d_out, 1.0)[..., None, :]
    faces = jnp.concatenate([p - bmin, bmax - p], axis=-2)   # [..., 6, B]
    k = jnp.argmin(faces, axis=-2)                           # [..., B]
    d_in = -jnp.min(faces, axis=-2)
    normals = jnp.concatenate([-jnp.eye(3), jnp.eye(3)], axis=0)  # [6, 3]
    n_in = jnp.moveaxis(normals[k], -1, -2)                  # [..., 3, B]
    dist = jnp.where(outside, d_out, d_in)
    normal = jnp.where(outside[..., None, :], n_out, n_in)
    return dist, normal


def contact_forces(m: Model, body_pos, body_quat, V, p0=None):
    # p0 [3, B]: reference point of V's spatial frame (robot centroid in
    # _substep — see engine.py:contact_forces). Geometry stays absolute;
    # velocity/torque arms are taken about p0.
    B = body_pos.shape[-1]
    if p0 is None:
        p0 = jnp.zeros((3, B))
    gpos, gquat = _geom_world(m, body_pos, body_quat)
    gidx, ends = _probe_layout(m)
    npts = len(gidx)
    if npts == 0:
        return jnp.zeros((m.nb, 6, B))
    zhat = jnp.zeros((npts, 3, 1)).at[:, 2].set(1.0)
    axis = _qrot(gquat[gidx], jnp.broadcast_to(zhat, (npts, 3, B)))
    h = jnp.asarray(m.geom_size[gidx, 1])[:, None, None]
    pts = gpos[gidx] + jnp.asarray(ends)[:, None, None] * h * axis
    rads = jnp.asarray(m.geom_size[gidx, 0])[:, None]        # [npts, 1]
    body_of_pt = m.geom_body[gidx]
    fric = jnp.asarray(m.geom_friction)[gidx][:, None]
    omega = 1.0 / m.contact_timeconst
    m_eff = jnp.asarray(m.mass)[body_of_pt][:, None]
    k_n = m_eff * omega**2
    c_n = 2.0 * m.contact_dampratio * m_eff * omega

    pts_r = pts - p0[None]
    bp_r = body_pos - p0[None]
    Vp = V[body_of_pt]                                       # [npts, 6, B]
    v_pt = Vp[:, 3:] + _cross(Vp[:, :3], pts_r)
    # body (~COM) linear velocity per probe: the impulse budget meters on
    # the BODY's motion, not the probe point's — a point-velocity budget
    # lets rotation mint fresh arrest allowance every substep (flywheel
    # pumping). See engine.py:contact_forces.
    v_bl = (V[:, 3:] + _cross(V[:, :3], bp_r))[body_of_pt]

    # plane z = 0
    dist_p = pts[:, 2] - rads                                # [npts, B]
    n_p = jnp.broadcast_to(zhat, (npts, 3, B))
    pen = jnp.maximum(-dist_p, 0.0)
    v_n = (v_pt * n_p).sum(-2)
    f_n = jnp.maximum(k_n * pen - c_n * v_n, 0.0)
    f_n = jnp.where(pen > 0, f_n, 0.0)
    # separation gate: strictly dissipative impacts (types.py)
    f_n = f_n * jnp.clip(1.0 - v_n / m.contact_maxrebound, 0.0, 1.0)
    # impulse cap: the gate only sees the pre-substep velocity; bound the
    # substep impulse so post-substep rebound stays <= maxrebound (no
    # single-substep catapult at deep fast penetration)
    f_n = jnp.minimum(f_n, jnp.maximum(
            m_eff * (m.contact_maxrebound - v_n) / m.dt, 0.0))
    v_t = v_pt - v_n[:, None, :] * n_p
    vt_norm = jnp.sqrt((v_t**2).sum(-2) + m.friction_vel_tol**2 * 1e-4)
    scale = jnp.minimum(1.0, vt_norm / m.friction_vel_tol)
    f_t = -fric * f_n * scale / vt_norm
    total = f_n[:, None, :] * n_p + f_t[:, None, :] * v_t
    imp_pt = f_n                                             # [npts, B]
    # +inf sentinel for non-contact probes (see engine.py:contact_forces)
    vmin_pt = jnp.where(pen > 0, v_bl[:, 2], jnp.inf)

    # static world: precomputed SDF (grid mazes) or explicit AABB tests
    if m.sdf_dist.size > 0:
        # bilinear sample of the 2-D wall SDF + gradient
        ox, oy = m.sdf_origin
        gx = (pts[:, 0] - ox) / m.sdf_cell                   # [npts, B]
        gy = (pts[:, 1] - oy) / m.sdf_cell
        nxg, nyg = m.sdf_dist.shape
        gx = jnp.clip(gx, 0.0, nxg - 1.001)
        gy = jnp.clip(gy, 0.0, nyg - 1.001)
        ix = jnp.floor(gx).astype(jnp.int32)
        iy = jnp.floor(gy).astype(jnp.int32)
        fx = (gx - ix)[..., None]
        fy = (gy - iy)[..., None]
        D = jnp.asarray(m.sdf_dist)
        G = jnp.asarray(m.sdf_grad)
        vals = jnp.stack([D[ix, iy], D[ix + 1, iy], D[ix, iy + 1],
                          D[ix + 1, iy + 1]], axis=-1)       # [npts, B, 4]
        w = jnp.stack([(1 - fx[..., 0]) * (1 - fy[..., 0]),
                       fx[..., 0] * (1 - fy[..., 0]),
                       (1 - fx[..., 0]) * fy[..., 0],
                       fx[..., 0] * fy[..., 0]], axis=-1)
        d_s = (vals * w).sum(-1) - rads                      # [npts, B]
        gvals = jnp.stack([G[ix, iy], G[ix + 1, iy], G[ix, iy + 1],
                           G[ix + 1, iy + 1]], axis=-2)      # [npts, B, 4, 2]
        n2 = (gvals * w[..., None]).sum(-2)                  # [npts, B, 2]
        n2 = n2 / jnp.maximum(
            jnp.sqrt((n2**2).sum(-1, keepdims=True)), 1e-6)
        n_s = jnp.concatenate(
            [jnp.moveaxis(n2, -1, 1), jnp.zeros((npts, 1, B))], axis=1)
        # only contacts below the wall top
        d_s = jnp.where(pts[:, 2] < m.sdf_zmax, d_s, 1e9)
        pen = jnp.maximum(-d_s, 0.0)
        v_n = (v_pt * n_s).sum(-2)
        f_n = jnp.maximum(k_n * pen - c_n * v_n, 0.0)
        f_n = jnp.where(pen > 0, f_n, 0.0)
        # separation gate: strictly dissipative impacts (types.py)
        f_n = f_n * jnp.clip(1.0 - v_n / m.contact_maxrebound, 0.0, 1.0)
        # impulse cap (see plane contact above)
        f_n = jnp.minimum(f_n, jnp.maximum(
            m_eff * (m.contact_maxrebound - v_n) / m.dt, 0.0))
        v_t = v_pt - v_n[:, None, :] * n_s
        vt_norm = jnp.sqrt((v_t**2).sum(-2) + m.friction_vel_tol**2 * 1e-4)
        scale = jnp.minimum(1.0, vt_norm / m.friction_vel_tol)
        f_t = -fric * f_n * scale / vt_norm
        total = total + f_n[:, None, :] * n_s + f_t[:, None, :] * v_t
        imp_pt = imp_pt + f_n
        v_cn = (v_bl * n_s).sum(-2)
        vmin_pt = jnp.minimum(vmin_pt, jnp.where(pen > 0, v_cn, jnp.inf))
    elif m.nsb > 0:
        bmin = jnp.asarray(m.static_box_min)[None, :, :, None]
        bmax = jnp.asarray(m.static_box_max)[None, :, :, None]
        d_b, n_b = _point_box_distance(pts[:, None], bmin, bmax)
        d_b = d_b - rads[:, None]                            # [npts, nsb, B]
        pen = jnp.maximum(-d_b, 0.0)
        v_n = (v_pt[:, None] * n_b).sum(-2)
        f_n = jnp.maximum(k_n[:, None] * pen - c_n[:, None] * v_n, 0.0)
        f_n = jnp.where(pen > 0, f_n, 0.0)
        # separation gate: strictly dissipative impacts (types.py)
        f_n = f_n * jnp.clip(1.0 - v_n / m.contact_maxrebound, 0.0, 1.0)
        # impulse cap (see plane contact above)
        f_n = jnp.minimum(f_n, jnp.maximum(
            m_eff[:, None] * (m.contact_maxrebound - v_n) / m.dt, 0.0))
        v_t = v_pt[:, None] - v_n[:, :, None, :] * n_b
        vt_norm = jnp.sqrt((v_t**2).sum(-2) + m.friction_vel_tol**2 * 1e-4)
        scale = jnp.minimum(1.0, vt_norm / m.friction_vel_tol)
        f_t = -fric[:, None] * f_n * scale / vt_norm
        total = total + (f_n[:, :, None, :] * n_b
                         + f_t[:, :, None, :] * v_t).sum(axis=1)
        imp_pt = imp_pt + f_n.sum(axis=1)
        v_cn = (v_bl[:, None] * n_b).sum(-2)
        vmin_pt = jnp.minimum(vmin_pt,
                              jnp.where(pen > 0, v_cn, jnp.inf).min(axis=1))

    # per-body world-contact impulse budget: several capped probes on one
    # body still SUM past the per-probe cap (the torso has 9 probes), so a
    # floor slam at the qvel clamp could rebound at +20 m/s and fly over
    # the maze walls. Rescale so each body's total normal impulse stays
    # within a static-support allowance (2*m_total*g) plus a rebound
    # allowance m_b*(maxrebound - min v_n)/dt. Semantics match
    # engine.py:contact_forces; world contacts only.
    # support allowance fades as the body separates faster than maxrebound
    # and the rebound term is (maxrebound - v_out)+ — a separating body can
    # no longer earn fresh thrust every substep (round-3 catapult fix;
    # rationale in engine.py:contact_forces)
    m_total = float(np.asarray(m.mass).sum())
    g_mag = float(abs(m.gravity[2]))
    support_fade = jnp.clip(1.0 - vmin_pt / m.contact_maxrebound, 0.0, 1.0)
    allow = (2.0 * m_total * g_mag * support_fade
             + m_eff * jnp.maximum(m.contact_maxrebound - vmin_pt, 0.0)
             / m.dt)
    imp_body = jax.ops.segment_sum(imp_pt, body_of_pt, num_segments=m.nb)
    allow_body = jax.ops.segment_max(allow, body_of_pt, num_segments=m.nb)
    s_body = jnp.minimum(1.0, allow_body / jnp.maximum(imp_body, 1e-9))
    total = total * s_body[body_of_pt][:, None, :]

    # global vertical-thrust budget: total upward (+z) contact force across
    # the robot vs its COM vertical velocity (cross-normal pump fix;
    # rationale in engine.py:contact_forces)
    vcom_z = (V[:, 5] + _cross(V[:, :3], bp_r)[:, 2])        # [nb, B]
    mass_v = jnp.asarray(m.mass)[:, None]
    vz_com = (mass_v * vcom_z).sum(0) / m_total              # [B]
    up_fade = jnp.clip(1.0 - vz_com / m.contact_maxrebound, 0.0, 1.0)
    allow_up = (2.0 * m_total * g_mag * up_fade
                + m_total * jnp.maximum(m.contact_maxrebound - vz_com, 0.0)
                / m.dt)
    f_up = jnp.maximum(total[:, 2], 0.0).sum(0)              # [B]
    s_up = jnp.minimum(1.0, allow_up / jnp.maximum(f_up, 1e-9))
    total = total.at[:, 2].set(
        jnp.where(total[:, 2] > 0, total[:, 2] * s_up[None], total[:, 2]))

    # dynamic box geoms (drawers / doors)
    F_other = jnp.zeros((m.nb, 6, B))
    for gi in [g for g in range(m.ng) if int(m.geom_type[g]) == BOX]:
        b2 = int(m.geom_body[gi])
        bq = jnp.broadcast_to(gquat[gi][None], (npts, 4, B))
        local = _qrot_inv(bq, pts - gpos[gi][None])
        half = jnp.asarray(m.geom_size[gi])[None, :, None]
        d, n_loc = _point_box_distance(local, -half, half)
        d = d - rads
        n_w = _qrot(bq, n_loc)
        pen = jnp.maximum(-d, 0.0)
        same = jnp.asarray(body_of_pt == b2)[:, None]
        pen = jnp.where(same, 0.0, pen)
        v_box = V[b2, 3:][None] + _cross(
            jnp.broadcast_to(V[b2, :3][None], (npts, 3, B)), pts_r)
        v_rel = v_pt - v_box
        v_n = (v_rel * n_w).sum(-2)
        f_n = jnp.maximum(k_n * pen - c_n * v_n, 0.0)
        f_n = jnp.where(pen > 0, f_n, 0.0)
        # separation gate: strictly dissipative impacts (types.py)
        f_n = f_n * jnp.clip(1.0 - v_n / m.contact_maxrebound, 0.0, 1.0)
        # impulse cap (see plane contact above)
        f_n = jnp.minimum(f_n, jnp.maximum(
            m_eff * (m.contact_maxrebound - v_n) / m.dt, 0.0))
        v_t = v_rel - v_n[:, None, :] * n_w
        vt_norm = jnp.sqrt((v_t**2).sum(-2) + m.friction_vel_tol**2 * 1e-4)
        scale = jnp.minimum(1.0, vt_norm / m.friction_vel_tol)
        f_t = -fric * f_n * scale / vt_norm
        f_vec = f_n[:, None, :] * n_w + f_t[:, None, :] * v_t
        total = total + f_vec
        F_other = F_other.at[b2, :3].add(-_cross(pts_r, f_vec).sum(0))
        F_other = F_other.at[b2, 3:].add(-f_vec.sum(0))

    torque = _cross(pts_r, total)
    F = F_other
    F = F.at[body_of_pt, :3].add(torque)
    F = F.at[body_of_pt, 3:].add(total)
    return F


# ------------------------------------------------------------- integrator

def actuator_torques(m: Model, ctrl, qpos, u, tau_grav=None):
    """ctrl [nu, B]. tau_grav [nv, B]: gravity compensation added inside
    the force-limited servo (semantics + rationale in
    engine.py:actuator_torques)."""
    B = ctrl.shape[-1]
    tau = jnp.zeros((m.nv, B))
    if not m.nu:
        return tau
    dof = jnp.asarray(m.act_dof)
    is_servo = jnp.asarray(m.act_type == 1)[:, None]
    f_motor = jnp.asarray(m.act_gear)[:, None] * jnp.clip(ctrl, -1.0, 1.0)
    if (m.act_type == 1).any():
        qadr = np.array([m.jnt_qposadr[int(m.dof_body[d])]
                         for d in m.act_dof])
        q = qpos[jnp.asarray(qadr)]
        qd = u[dof]
        f_servo = jnp.asarray(m.act_kp)[:, None] * (ctrl - q) \
            - jnp.asarray(m.act_kd)[:, None] * qd
        if tau_grav is not None:
            f_servo = f_servo + tau_grav[dof]
        lim = jnp.asarray(m.act_force)[:, None]
        f_servo = jnp.clip(f_servo, -lim, lim)
    else:
        f_servo = jnp.zeros_like(f_motor)
    f = jnp.where(is_servo, f_servo, f_motor)
    return tau.at[dof].add(f)


def _substep(m: Model, qpos, qvel, ctrl):
    body_pos, body_quat = fk(m, qpos)
    # spatial algebra in the robot-centered frame: f32 at the world origin
    # injects momentum far from the origin (rationale + measurement in
    # engine.py:_substep)
    p0 = body_pos.mean(axis=0)                               # [3, B]
    bp = body_pos - p0[None]
    S = dof_subspaces(m, bp, body_quat)
    u = qvel_to_u(m, qvel, bp)
    V = body_velocities(m, S, u)
    I6 = spatial_inertia(m, bp, body_quat)
    f_ext = contact_forces(m, body_pos, body_quat, V, p0=p0)
    tau_bias = bias_forces(m, I6, S, V, u, f_ext)
    if (m.act_type == 1).any():
        tau_grav = bias_forces(m, I6, S, jnp.zeros_like(V),
                               jnp.zeros_like(u), jnp.zeros_like(f_ext))
    else:
        tau_grav = None
    tau_act = actuator_torques(m, ctrl, qpos, u, tau_grav)
    tau = tau_act + passive_torques(m, qpos, u) - tau_bias
    M = crba(m, I6, S)
    udot = _chol_solve_envs_last(M, tau)

    u_new = jnp.clip(u + m.dt * udot, -m.max_qvel, m.max_qvel)
    # physical-velocity clamp still guards the w x (pos - p0) lever arm of
    # outlying bodies (see engine.py substep note)
    qvel_new = jnp.clip(u_to_qvel(m, u_new, bp),
                        -m.max_qvel, m.max_qvel)
    qpos_new = qpos
    one_dof = np.where((m.jnt_type == HINGE) | (m.jnt_type == SLIDE))[0]
    if len(one_dof):
        qa, da = m.jnt_qposadr[one_dof], m.jnt_dofadr[one_dof]
        qpos_new = qpos_new.at[qa].add(m.dt * qvel_new[da])
        # inelastic limit stops — projection + outward-velocity zeroing
        # (see engine.py:_substep; matches MuJoCo's ~critically-damped
        # limit constraints and stops limit-rebound torso flings)
        lo_d = jnp.asarray(m.dof_limit_lo)[da][:, None]
        hi_d = jnp.asarray(m.dof_limit_hi)[da][:, None]
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
            quat_new = _qintegrate(qpos[qa + 3: qa + 7], w, m.dt)
            qpos_new = qpos_new.at[qa + 3: qa + 7].set(quat_new)
    return qpos_new, qvel_new


def step(m: Model, qpos, qvel, ctrl):
    """Batched control step. qpos [B, nq], qvel [B, nv], ctrl [B, nu]."""
    qp = qpos.T
    qv = qvel.T
    ct = ctrl.T

    def body(carry, _):
        a, b = carry
        with jax.default_matmul_precision("float32"):
            a, b = _substep(m, a, b, ct)
        return (a, b), None

    (qp, qv), _ = jax.lax.scan(body, (qp, qv), None, length=m.n_substeps)
    return qp.T, qv.T
