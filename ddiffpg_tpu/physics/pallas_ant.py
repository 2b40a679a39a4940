"""Pallas TPU mega-kernel for the ant substep.

The XLA substep (engine_cl.py) lowers to ~500 kernels with HBM round trips
between them; here the ENTIRE substep — FK, motion subspaces, spatial
inertias, plane+box penalty contacts, RNEA bias, CRBA, the unrolled
Cholesky solve and the semi-implicit integration — is ONE Pallas kernel.
Every physical scalar is a (1, TILE) lane-vector of envs, so all 128 VPU
lanes stay full and nothing touches HBM until the state is written back.

Supported topology: one FREE root + any tree of HINGE bodies with the
joint anchored at the body origin (the ant; asserts below), probe-sphere
contacts vs the ground plane and the model's static AABBs. Semantics match
engine.py / engine_cl.py exactly and are cross-checked in tests.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ddiffpg_tpu.physics.types import CAPSULE, FREE, HINGE, SPHERE, Model

# ---------------------------------------------------------------------------
# tuple math on (1, T) lane vectors


def v3(x, y, z):
    return (x, y, z)


def vadd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def vsub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def vscale(a, s):
    return tuple(x * s for x in a)


def vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vcross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def qmul(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return (w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2)


def qrot(q, v):
    qv = (q[1], q[2], q[3])
    t = vscale(vcross(qv, v), 2.0)
    return vadd(vadd(v, vscale(t, q[0])), vcross(qv, t))


def qaxis_angle(axis: Sequence[float], ang):
    half = ang * 0.5
    s = jnp.sin(half)
    return (jnp.cos(half), axis[0] * s, axis[1] * s, axis[2] * s)


def qmat(q):
    """3x3 rotation as nested tuples of lane vectors."""
    w, x, y, z = q
    return ((1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
            (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
            (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)))


def m3vec(R, v):
    return tuple(R[i][0] * v[0] + R[i][1] * v[1] + R[i][2] * v[2]
                 for i in range(3))


def m3mul(A, B):
    return tuple(tuple(sum(A[i][k] * B[k][j] for k in range(3))
                       for j in range(3)) for i in range(3))


def m3mulT(A, B):
    """A @ B^T."""
    return tuple(tuple(sum(A[i][k] * B[j][k] for k in range(3))
                       for j in range(3)) for i in range(3))


def sv6(ang, lin):
    """Spatial vector = (angular 3-tuple, linear 3-tuple)."""
    return (ang, lin)


def sv_add(a, b):
    return (vadd(a[0], b[0]), vadd(a[1], b[1]))


def sv_scale(a, s):
    return (vscale(a[0], s), vscale(a[1], s))


def cross_motion(v, m):
    w, vo = v
    mw, mv = m
    return (vcross(w, mw), vadd(vcross(w, mv), vcross(vo, mw)))


def cross_force(v, f):
    w, vo = v
    n, fl = f
    return (vadd(vcross(w, n), vcross(vo, fl)), vcross(w, fl))


# ---------------------------------------------------------------------------


def _check_supported(m: Model):
    from ddiffpg_tpu.physics.types import SLIDE as _SL

    for i in range(m.nb):
        t = int(m.jnt_type[i])
        assert t in (FREE, HINGE, _SL, 3), "unknown joint type"
        if t == FREE:
            assert int(m.parent[i]) < 0, "FREE joints only at roots"
    assert np.allclose(m.jnt_pos, 0.0), "joints must anchor at body origin"


def make_substep_kernel(m: Model, tile: int = 256, n_substeps=None):
    """Returns f(qpos [B, nq], qvel [B, nv], ctrl [B, nu]) -> (qpos, qvel)
    running `n_substeps` (default model) substeps in one pallas kernel."""
    _check_supported(m)
    nb, nv, nq, nu = m.nb, m.nv, m.nq, m.nu
    n_sub = n_substeps if n_substeps is not None else m.n_substeps
    dt = float(m.dt)
    parent = [int(p) for p in m.parent]
    jtype = [int(t) for t in m.jnt_type]
    axes = [tuple(float(x) for x in m.jnt_axis[i]) for i in range(nb)]
    body_pos = [tuple(float(x) for x in m.body_pos[i]) for i in range(nb)]
    body_quat = [tuple(float(x) for x in m.body_quat[i]) for i in range(nb)]
    ident_quat = [abs(q[0] - 1.0) < 1e-12 and abs(q[1]) + abs(q[2])
                  + abs(q[3]) < 1e-12 for q in body_quat]
    mass = [float(x) for x in m.mass]
    com = [tuple(float(x) for x in m.com[i]) for i in range(nb)]
    inertia = [[[float(m.inertia[i][r][c]) for c in range(3)]
                for r in range(3)] for i in range(nb)]
    dofadr = [int(x) for x in m.jnt_dofadr]
    qposadr = [int(x) for x in m.jnt_qposadr]
    damping = [float(x) for x in m.dof_damping]
    armature = [float(x) for x in m.dof_armature]
    lim_lo = [float(x) for x in m.dof_limit_lo]
    lim_hi = [float(x) for x in m.dof_limit_hi]
    act_dof = [int(x) for x in m.act_dof]
    act_gear = [float(x) for x in m.act_gear]
    act_type = [int(x) for x in m.act_type]
    act_kp = [float(x) for x in m.act_kp]
    act_kd = [float(x) for x in m.act_kd]
    act_force = [float(x) for x in m.act_force]
    act_qadr = [int(m.jnt_qposadr[int(m.dof_body[d])]) for d in m.act_dof]
    # dynamic BOX geoms (drawers / doors): (body, local pos, local quat,
    # half extents, friction)
    dyn_boxes = []
    for gi in range(m.ng):
        if int(m.geom_type[gi]) == 2:  # BOX
            dyn_boxes.append((
                int(m.geom_body[gi]),
                tuple(float(x) for x in m.geom_pos[gi]),
                tuple(float(x) for x in m.geom_quat[gi]),
                tuple(float(x) for x in m.geom_size[gi]),
                float(m.geom_friction[gi])))
    gravity = tuple(float(g) for g in m.gravity)
    omega_c = 1.0 / float(m.contact_timeconst)
    zeta = float(m.contact_dampratio)
    inv_vreb = 1.0 / float(m.contact_maxrebound)
    vtol = float(m.friction_vel_tol)
    lim_k = float(m.limit_stiffness)
    lim_c = float(m.limit_damping)

    # probe spheres (static layout)
    probes = []  # (body, local offset tuple, radius, friction)
    for gi in range(m.ng):
        b = int(m.geom_body[gi])
        t = int(m.geom_type[gi])
        gp = tuple(float(x) for x in m.geom_pos[gi])
        gq = np.asarray(m.geom_quat[gi], np.float64)
        r = float(m.geom_size[gi][0])
        fr = float(m.geom_friction[gi])
        if t == SPHERE:
            probes.append((b, gp, r, fr))
        elif t == CAPSULE:
            h = float(m.geom_size[gi][1])
            # capsule axis = geom +z in body frame
            w, x, y, z = gq
            zax = (2 * (x * z + w * y), 2 * (y * z - w * x),
                   1 - 2 * (x * x + y * y))
            for sgn in (1.0, -1.0):
                off = tuple(gp[k] + sgn * h * zax[k] for k in range(3))
                probes.append((b, off, r, fr))
    boxes = [(tuple(float(x) for x in m.static_box_min[i]),
              tuple(float(x) for x in m.static_box_max[i]))
             for i in range(m.nsb)]

    SLIDE_T = 2
    FIXED_T = 3
    frees = [i for i in range(nb) if jtype[i] == FREE]
    one_dof = [i for i in range(nb) if jtype[i] in (HINGE, SLIDE_T)]


    # per-probe constants travel as a kernel input (pallas forbids captured
    # non-scalar constants): columns = radius, friction, k_n, c_n
    probe_const_np = np.zeros((len(probes), 4), np.float32)
    for k, (b, off, r, fr) in enumerate(probes):
        me = mass[b]
        probe_const_np[k] = (r, fr, me * omega_c * omega_c,
                             2.0 * zeta * me * omega_c)

    def substep_math(q, qd, ctrl_rows, probe_consts):
        """q: list of nq (1,T) rows; qd: list of nv rows. Returns new lists."""
        T = q[0].shape[-1]
        zero = jnp.zeros_like(q[0])

        # ---------------- FK (FREE roots, HINGE, SLIDE, FIXED)
        pos = [None] * nb
        quat = [None] * nb
        for i in range(nb):
            t = jtype[i]
            qa = qposadr[i]
            if t == FREE:
                pos[i] = (q[qa], q[qa + 1], q[qa + 2])
                quat[i] = (q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6])
                continue
            p = parent[i]
            if p >= 0:
                p0 = vadd(pos[p], qrot(quat[p], body_pos[i]))
                q0 = quat[p] if ident_quat[i] else qmul(quat[p], body_quat[i])
            else:
                p0 = tuple(zero + body_pos[i][k] for k in range(3))
                q0 = tuple(zero + body_quat[i][k] for k in range(4))
            if t == HINGE:
                qj = qaxis_angle(axes[i], q[qa])
                quat[i] = qmul(q0, qj)
                pos[i] = p0
            elif t == SLIDE_T:
                ax_w = qrot(q0, axes[i])
                pos[i] = vadd(p0, vscale(ax_w, q[qa]))
                quat[i] = q0
            else:  # FIXED
                pos[i] = p0
                quat[i] = q0

        # robot-centered spatial frame: world-origin f32 algebra injects
        # momentum far from the origin (m*r^2 rows in M + |w|*r-scale
        # cancellations; measured +13 kg m/s in one substep at r=7.4 m —
        # see engine.py:_substep). All spatial quantities below reference
        # the body centroid; geometry stays absolute.
        inv_nb = 1.0 / nb
        p0 = tuple(sum(pos[i][k] for i in range(nb)) * inv_nb
                   for k in range(3))
        posr = [vsub(pos[i], p0) for i in range(nb)]

        # ---------------- motion subspaces (robot-centered coords)
        S = [None] * nv
        for i in frees:
            d = dofadr[i]
            for k in range(3):      # translation: [0; e_k]
                e = [zero, zero, zero]
                e[k] = zero + 1.0
                S[d + k] = (tuple([zero] * 3), tuple(e))
            for k in range(3):      # rotation about origin: [e_k; 0]
                e = [zero, zero, zero]
                e[k] = zero + 1.0
                S[d + 3 + k] = (tuple(e), tuple([zero] * 3))
        for i in one_dof:
            w = qrot(quat[i], axes[i])
            if jtype[i] == HINGE:
                S[dofadr[i]] = (w, vcross(posr[i], w))
            else:
                S[dofadr[i]] = (tuple([zero] * 3), w)

        # ---------------- qvel -> u (free joints: (v_origin, omega))
        u = list(qd)
        for i in frees:
            d = dofadr[i]
            wroot = (qd[d + 3], qd[d + 4], qd[d + 5])
            vo = vsub((qd[d], qd[d + 1], qd[d + 2]),
                      vcross(wroot, posr[i]))
            u[d], u[d + 1], u[d + 2] = vo

        # ---------------- body spatial velocities
        V = [None] * nb
        for i in range(nb):
            p = parent[i]
            base = V[p] if p >= 0 else ((zero, zero, zero),
                                        (zero, zero, zero))
            if jtype[i] == FREE:
                d = dofadr[i]
                V[i] = ((u[d + 3], u[d + 4], u[d + 5]),
                        (u[d], u[d + 1], u[d + 2]))
            elif jtype[i] in (HINGE, SLIDE_T):
                V[i] = sv_add(base, sv_scale(S[dofadr[i]], u[dofadr[i]]))
            else:
                V[i] = base

        # ---------------- spatial inertias about the world origin
        I6 = [None] * nb            # 6x6 nested lists of lane vectors
        cw = [None] * nb
        for i in range(nb):
            R = qmat(quat[i])
            c = vadd(posr[i], m3vec(R, com[i]))
            cw[i] = c
            RI = m3mul(R, inertia[i])
            Ic = m3mulT(RI, R)      # R I R^T
            mi = mass[i]
            cx = ((zero, -c[2], c[1]), (c[2], zero, -c[0]),
                  (-c[1], c[0], zero))
            cxcx = m3mul(cx, cx)
            blk = [[None] * 6 for _ in range(6)]
            for r in range(3):
                for cc in range(3):
                    blk[r][cc] = Ic[r][cc] - mi * cxcx[r][cc]
                    blk[r][3 + cc] = mi * cx[r][cc]
                    blk[3 + r][cc] = -mi * cx[r][cc]
                    blk[3 + r][3 + cc] = (zero + mi) if r == cc else zero
            I6[i] = blk

        def I6vec(blk, sv):
            a = list(sv[0]) + list(sv[1])
            out = [sum(blk[r][c] * a[c] for c in range(6)) for r in range(6)]
            return ((out[0], out[1], out[2]), (out[3], out[4], out[5]))

        # ---------------- contacts: probes vs plane + static boxes
        f_ext = [((zero, zero, zero), (zero, zero, zero)) for _ in range(nb)]
        npts = len(probes)
        px = jnp.concatenate([
            vadd(pos[b], qrot(quat[b], off))[0] for b, off, r, fr in probes])
        py = jnp.concatenate([
            vadd(pos[b], qrot(quat[b], off))[1] for b, off, r, fr in probes])
        pz = jnp.concatenate([
            vadd(pos[b], qrot(quat[b], off))[2] for b, off, r, fr in probes])
        # probe velocities v = V.lin + w x p
        vx_l, vy_l, vz_l = [], [], []
        vbx_l, vby_l, vbz_l = [], [], []
        for b, off, r, fr in probes:
            w, vo_b = V[b]
            pw_r = vadd(posr[b], qrot(quat[b], off))
            vv = vadd(vo_b, vcross(w, pw_r))
            vx_l.append(vv[0])
            vy_l.append(vv[1])
            vz_l.append(vv[2])
            # body (~COM) velocity: the impulse budget meters on the
            # body's motion, not the probe point's (see
            # engine.py:contact_forces — flywheel pumping)
            vb = vadd(vo_b, vcross(w, posr[b]))
            vbx_l.append(vb[0])
            vby_l.append(vb[1])
            vbz_l.append(vb[2])
        vx = jnp.concatenate(vx_l)
        vy = jnp.concatenate(vy_l)
        vz = jnp.concatenate(vz_l)
        vbx = jnp.concatenate(vbx_l)
        vby = jnp.concatenate(vby_l)
        vbz = jnp.concatenate(vbz_l)
        pxr = px - p0[0]
        pyr = py - p0[1]
        pzr = pz - p0[2]
        rad, fric, k_n, c_n = probe_consts
        # impulse cap scale: m_eff/dt = k_n/(omega^2 dt) — the gate only
        # sees the pre-substep velocity; bound the substep impulse so the
        # post-substep rebound stays <= maxrebound (no catapults)
        cap_k = k_n * (1.0 / (omega_c * omega_c * dt))
        vreb = 1.0 / inv_vreb

        def contact_force(dist, nx, ny, nz):
            pen = jnp.maximum(-dist, 0.0)
            v_n = vx * nx + vy * ny + vz * nz
            f_n = jnp.maximum(k_n * pen - c_n * v_n, 0.0)
            f_n = jnp.where(pen > 0, f_n, 0.0)
            # separation gate: strictly dissipative impacts (types.py)
            f_n = f_n * jnp.clip(1.0 - v_n * inv_vreb, 0.0, 1.0)
            f_n = jnp.minimum(f_n, jnp.maximum(cap_k * (vreb - v_n), 0.0))  # impulse cap
            tx = vx - v_n * nx
            ty = vy - v_n * ny
            tz = vz - v_n * nz
            vt = jnp.sqrt(tx * tx + ty * ty + tz * tz + vtol * vtol * 1e-4)
            scale = jnp.minimum(1.0, vt / vtol)
            ft = -fric * f_n * scale / vt
            v_cn = vbx * nx + vby * ny + vbz * nz
            # large sentinel (not 0) for non-contact probes so a body whose
            # live contacts are all separating sees its allowance fade
            # (see engine.py:contact_forces, round-3 catapult fix)
            return (f_n * nx + ft * tx, f_n * ny + ft * ty,
                    f_n * nz + ft * tz, f_n, jnp.where(pen > 0, v_cn, 1e9))

        fx, fy, fz, imp_pt, vmin_pt = contact_force(pz - rad, 0.0, 0.0, 1.0)
        for (bmin, bmax) in boxes:
            cx_ = jnp.clip(px, bmin[0], bmax[0])
            cy_ = jnp.clip(py, bmin[1], bmax[1])
            cz_ = jnp.clip(pz, bmin[2], bmax[2])
            dx = px - cx_
            dy = py - cy_
            dz = pz - cz_
            d_out = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            outside = d_out > 1e-9
            inv = 1.0 / jnp.where(outside, d_out, 1.0)
            # inside: nearest face
            fl = [px - bmin[0], bmax[0] - px, py - bmin[1], bmax[1] - py,
                  pz - bmin[2], bmax[2] - pz]
            d_in = fl[0]
            for f_ in fl[1:]:
                d_in = jnp.minimum(d_in, f_)
            nrm = [(-1.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, -1.0, 0.0),
                   (0.0, 1.0, 0.0), (0.0, 0.0, -1.0), (0.0, 0.0, 1.0)]
            nxi = jnp.zeros_like(px)
            nyi = jnp.zeros_like(px)
            nzi = jnp.zeros_like(px)
            chosen = jnp.zeros_like(px, dtype=jnp.bool_)
            for f_, (a1, a2, a3) in zip(fl, nrm):
                hit = (f_ <= d_in) & (~chosen)
                nxi = jnp.where(hit, a1, nxi)
                nyi = jnp.where(hit, a2, nyi)
                nzi = jnp.where(hit, a3, nzi)
                chosen = chosen | hit
            nx = jnp.where(outside, dx * inv, nxi)
            ny = jnp.where(outside, dy * inv, nyi)
            nz = jnp.where(outside, dz * inv, nzi)
            dist = jnp.where(outside, d_out, -d_in) - rad
            gx, gy, gz, g_fn, g_vn = contact_force(dist, nx, ny, nz)
            fx = fx + gx
            fy = fy + gy
            fz = fz + gz
            imp_pt = imp_pt + g_fn
            vmin_pt = jnp.minimum(vmin_pt, g_vn)

        # per-body world-contact impulse budget (semantics match
        # engine.py:contact_forces): several capped probes on one body sum
        # past the per-probe cap (the torso carries 9) — rescale so each
        # body's total normal impulse stays within a static-support
        # allowance 2*m_total*g plus a rebound allowance
        # m_b*(maxrebound - min v_n)/dt. World contacts only.
        m_total = float(sum(mass))
        support_F = 2.0 * m_total * abs(gravity[2])
        body_rows = {}
        for k, (b, _, _, _) in enumerate(probes):
            body_rows.setdefault(b, []).append(k)
        s_rows = [None] * npts
        for b, rows in body_rows.items():
            imp_b = imp_pt[rows[0]:rows[0] + 1]
            vmin_b = vmin_pt[rows[0]:rows[0] + 1]
            for r in rows[1:]:
                imp_b = imp_b + imp_pt[r:r + 1]
                vmin_b = jnp.minimum(vmin_b, vmin_pt[r:r + 1])
            # support fades as the body separates faster than maxrebound;
            # rebound allowance is (maxrebound - v_out)+ so a separating
            # body cannot earn fresh thrust every substep (round-3 fix,
            # rationale in engine.py:contact_forces)
            fade_b = jnp.clip(1.0 - vmin_b * inv_vreb, 0.0, 1.0)
            allow_b = support_F * fade_b + mass[b] * jnp.maximum(
                vreb - vmin_b, 0.0) / dt
            s_b = jnp.minimum(1.0, allow_b / jnp.maximum(imp_b, 1e-9))
            for r in rows:
                s_rows[r] = s_b
        s_pt = jnp.concatenate(s_rows)
        fx = fx * s_pt
        fy = fy * s_pt
        fz = fz * s_pt

        # global vertical-thrust budget: the per-body budget can't see
        # across normals (floor + wall contacts on one body keep each
        # other's allowance open) and stance legs each hold a 2*m_total*g
        # allowance — meter the SUM of upward force across the robot
        # against the COM vertical velocity (see engine.py:contact_forces)
        vz_com = None
        for b in range(nb):
            w_b, vo_b = V[b]
            vb_z = vadd(vo_b, vcross(w_b, posr[b]))[2]
            vz_com = vb_z * mass[b] if vz_com is None \
                else vz_com + vb_z * mass[b]
        vz_com = vz_com * (1.0 / m_total)
        up_fade = jnp.clip(1.0 - vz_com * inv_vreb, 0.0, 1.0)
        allow_up = support_F * up_fade + m_total * jnp.maximum(
            vreb - vz_com, 0.0) / dt
        f_up = jnp.maximum(fz, 0.0).sum(axis=0, keepdims=True)
        s_up = jnp.minimum(1.0, allow_up / jnp.maximum(f_up, 1e-9))
        fz = jnp.where(fz > 0, fz * s_up, fz)

        # ---- dynamic BOX geoms (drawers / doors): per-probe OBB test in
        # the box's local frame; equal-and-opposite reaction on the box
        for (b2, gp2, gq2, half, bfric) in dyn_boxes:
            bq = quat[b2] if all(abs(x) < 1e-12 for x in gq2[1:]) \
                else qmul(quat[b2], gq2)
            bp = vadd(pos[b2], qrot(quat[b2], gp2))
            # probes -> box frame (conjugate rotate)
            relx, rely, relz = px - bp[0], py - bp[1], pz - bp[2]
            cbq = (bq[0], -bq[1], -bq[2], -bq[3])
            lx, ly, lz = qrot(cbq, (relx, rely, relz))
            cx_ = jnp.clip(lx, -half[0], half[0])
            cy_ = jnp.clip(ly, -half[1], half[1])
            cz_ = jnp.clip(lz, -half[2], half[2])
            dx, dy, dz = lx - cx_, ly - cy_, lz - cz_
            d_out = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            outside = d_out > 1e-9
            inv = 1.0 / jnp.where(outside, d_out, 1.0)
            fl = [lx + half[0], half[0] - lx, ly + half[1], half[1] - ly,
                  lz + half[2], half[2] - lz]
            d_in = fl[0]
            for f_ in fl[1:]:
                d_in = jnp.minimum(d_in, f_)
            nrm = [(-1.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, -1.0, 0.0),
                   (0.0, 1.0, 0.0), (0.0, 0.0, -1.0), (0.0, 0.0, 1.0)]
            nxi = jnp.zeros_like(px)
            nyi = jnp.zeros_like(px)
            nzi = jnp.zeros_like(px)
            chosen = jnp.zeros_like(px, dtype=jnp.bool_)
            for f_, (a1, a2, a3) in zip(fl, nrm):
                hit = (f_ <= d_in) & (~chosen)
                nxi = jnp.where(hit, a1, nxi)
                nyi = jnp.where(hit, a2, nyi)
                nzi = jnp.where(hit, a3, nzi)
                chosen = chosen | hit
            nlx = jnp.where(outside, dx * inv, nxi)
            nly = jnp.where(outside, dy * inv, nyi)
            nlz = jnp.where(outside, dz * inv, nzi)
            nx, ny, nz = qrot(bq, (nlx, nly, nlz))
            dist = jnp.where(outside, d_out, -d_in) - rad
            # relative velocity: probe minus box-point velocity
            wb, vob = V[b2]
            vbx = vob[0] + wb[1] * pzr - wb[2] * pyr
            vby = vob[1] + wb[2] * pxr - wb[0] * pzr
            vbz = vob[2] + wb[0] * pyr - wb[1] * pxr
            rvx, rvy, rvz = vx - vbx, vy - vby, vz - vbz
            pen = jnp.maximum(-dist, 0.0)
            v_n = rvx * nx + rvy * ny + rvz * nz
            f_n = jnp.maximum(k_n * pen - c_n * v_n, 0.0)
            f_n = jnp.where(pen > 0, f_n, 0.0)
            # separation gate: strictly dissipative impacts (types.py)
            f_n = f_n * jnp.clip(1.0 - v_n * inv_vreb, 0.0, 1.0)
            f_n = jnp.minimum(f_n, jnp.maximum(cap_k * (vreb - v_n), 0.0))  # impulse cap
            tx = rvx - v_n * nx
            ty = rvy - v_n * ny
            tz = rvz - v_n * nz
            vt = jnp.sqrt(tx * tx + ty * ty + tz * tz + vtol * vtol * 1e-4)
            scale = jnp.minimum(1.0, vt / vtol)
            ft = -fric * f_n * scale / vt
            gx = f_n * nx + ft * tx
            gy = f_n * ny + ft * ty
            gz = f_n * nz + ft * tz
            # zero out probes living on the box's own body (in-kernel iota
            # mask; materialized constants can't be captured by pallas)
            own = [k for k, (pb, _, _, _) in enumerate(probes) if pb == b2]
            if own:
                rowid = jax.lax.broadcasted_iota(
                    jnp.int32, (len(probes), 1), 0)
                keep = jnp.ones((len(probes), 1), jnp.float32)
                for k in own:
                    keep = keep * (rowid != k).astype(jnp.float32)
                gx = gx * keep
                gy = gy * keep
                gz = gz * keep
            fx = fx + gx
            fy = fy + gy
            fz = fz + gz
            # reaction on the box body (sum over probes)
            n_ox = (pyr * gz - pzr * gy).sum(axis=0, keepdims=True)
            n_oy = (pzr * gx - pxr * gz).sum(axis=0, keepdims=True)
            n_oz = (pxr * gy - pyr * gx).sum(axis=0, keepdims=True)
            fsx = gx.sum(axis=0, keepdims=True)
            fsy = gy.sum(axis=0, keepdims=True)
            fsz = gz.sum(axis=0, keepdims=True)
            f_ext[b2] = sv_add(f_ext[b2], ((zero - n_ox, zero - n_oy,
                                            zero - n_oz),
                                           (zero - fsx, zero - fsy,
                                            zero - fsz)))

        # accumulate probe forces to bodies as [n_o; f] about p0
        row = 0
        for b, off, r, fr in probes:
            f = (fx[row:row + 1], fy[row:row + 1], fz[row:row + 1])
            p = (pxr[row:row + 1], pyr[row:row + 1], pzr[row:row + 1])
            n_o = vcross(p, f)
            f_ext[b] = sv_add(f_ext[b], (n_o, f))
            row += 1

        # ---------------- bias forces (RNEA, qacc = 0)
        a0 = ((zero, zero, zero),
              (zero - gravity[0], zero - gravity[1], zero - gravity[2]))
        A = [None] * nb
        for i in range(nb):
            p = parent[i]
            if p < 0 or jtype[i] == FREE:
                A[i] = a0
            elif jtype[i] in (HINGE, SLIDE_T):
                vJ = sv_scale(S[dofadr[i]], u[dofadr[i]])
                A[i] = sv_add(A[p], cross_motion(V[p], vJ))
            else:  # FIXED
                A[i] = A[p]
        fb = [None] * nb
        for i in range(nb):
            IA = I6vec(I6[i], A[i])
            IV = I6vec(I6[i], V[i])
            net = sv_add(IA, cross_force(V[i], IV))
            fb[i] = (vsub(net[0], f_ext[i][0]), vsub(net[1], f_ext[i][1]))
        for i in range(nb - 1, 0, -1):
            if parent[i] >= 0:
                fb[parent[i]] = sv_add(fb[parent[i]], fb[i])
        ndofs = {FREE: 6, HINGE: 1, SLIDE_T: 1, FIXED_T: 0}
        tau_bias = [None] * nv
        for i in range(nb):
            d0 = dofadr[i]
            for k in range(ndofs[jtype[i]]):
                sv = S[d0 + k]
                tau_bias[d0 + k] = (vdot(sv[0], fb[i][0])
                                    + vdot(sv[1], fb[i][1]))

        # ---------------- CRBA mass matrix (composite inertias)
        Ic = [[[x for x in r] for r in I6[i]] for i in range(nb)]
        for i in range(nb - 1, 0, -1):
            p = parent[i]
            if p < 0:
                continue
            for r in range(6):
                for c in range(6):
                    Ic[p][r][c] = Ic[p][r][c] + Ic[i][r][c]

        dof_body = [int(x) for x in m.dof_body]
        F6 = [None] * nv
        for d in range(nv):
            F6[d] = I6vec(Ic[dof_body[d]], S[d])
        # ancestors of each dof (static)
        anc = []
        for d in range(nv):
            path = set()
            bi = dof_body[d]
            while bi >= 0:
                path.add(bi)
                bi = parent[bi]
            anc.append([e for e in range(d + 1) if dof_body[e] in path])
        M = [[None] * nv for _ in range(nv)]
        for d in range(nv):
            for e in anc[d]:
                val = vdot(S[e][0], F6[d][0]) + vdot(S[e][1], F6[d][1])
                if d == e:
                    val = val + armature[d]
                M[d][e] = val
                M[e][d] = val
        for d in range(nv):
            for e in range(nv):
                if M[d][e] is None:
                    M[d][e] = zero

        # ---------------- gravity compensation for servos (engine.py
        # rationale: zero-velocity/no-contact RNEA; with u = 0 every body
        # acceleration is a0, so the pass is just subtree sums of I6*a0)
        if 1 in act_type:
            fg = [I6vec(I6[i], a0) for i in range(nb)]
            for i in range(nb - 1, 0, -1):
                if parent[i] >= 0:
                    fg[parent[i]] = sv_add(fg[parent[i]], fg[i])
            tau_grav = [None] * nv
            for i in range(nb):
                d0 = dofadr[i]
                for k in range(ndofs[jtype[i]]):
                    sv = S[d0 + k]
                    tau_grav[d0 + k] = (vdot(sv[0], fg[i][0])
                                        + vdot(sv[1], fg[i][1]))

        # ---------------- applied + passive torques
        tau = [zero - damping[d] * u[d] for d in range(nv)]
        for a_i, d in enumerate(act_dof):
            if act_type[a_i] == 1:       # position servo (PD, force-limited)
                f = act_kp[a_i] * (ctrl_rows[a_i] - q[act_qadr[a_i]]) \
                    - act_kd[a_i] * u[d] + tau_grav[d]
                tau[d] = tau[d] + jnp.clip(f, -act_force[a_i], act_force[a_i])
            else:                        # direct torque motor
                cc = jnp.clip(ctrl_rows[a_i], -1.0, 1.0)
                tau[d] = tau[d] + act_gear[a_i] * cc
        for i in one_dof:
            d = dofadr[i]
            if not np.isfinite(lim_lo[d]) and not np.isfinite(lim_hi[d]):
                continue
            qi = q[qposadr[i]]
            over = jnp.maximum(qi - lim_hi[d], 0.0)
            under = jnp.maximum(lim_lo[d] - qi, 0.0)
            active = (over > 0) | (under > 0)
            tau[d] = tau[d] - lim_k * (over - under) \
                - jnp.where(active, lim_c * u[d], 0.0)
        rhs = [tau[d] - tau_bias[d] for d in range(nv)]

        # ---------------- unrolled Cholesky solve
        L = [[None] * nv for _ in range(nv)]
        Awork = [[M[r][c] for c in range(nv)] for r in range(nv)]
        for j in range(nv):
            dj = jnp.sqrt(jnp.maximum(Awork[j][j], 1e-9))
            inv_dj = 1.0 / dj
            for i2 in range(j, nv):
                L[i2][j] = Awork[i2][j] * inv_dj
            for i2 in range(j + 1, nv):
                for k2 in range(j + 1, i2 + 1):
                    Awork[i2][k2] = Awork[i2][k2] - L[i2][j] * L[k2][j]
        y = [None] * nv
        for i2 in range(nv):
            acc = rhs[i2]
            for k2 in range(i2):
                acc = acc - L[i2][k2] * y[k2]
            y[i2] = acc / L[i2][i2]
        ud = [None] * nv
        for i2 in range(nv - 1, -1, -1):
            acc = y[i2]
            for k2 in range(i2 + 1, nv):
                acc = acc - L[k2][i2] * ud[k2]
            ud[i2] = acc / L[i2][i2]

        # ---------------- integrate (semi-implicit, hard velocity clamp)
        vmax = float(m.max_qvel)
        u_new = [jnp.clip(u[d] + dt * ud[d], -vmax, vmax) for d in range(nv)]
        qd_new = list(u_new)
        q_new = list(q)
        for i in frees:
            d, qa = dofadr[i], qposadr[i]
            w_new = (u_new[d + 3], u_new[d + 4], u_new[d + 5])
            vp_new = vadd((u_new[d], u_new[d + 1], u_new[d + 2]),
                          vcross(w_new, posr[i]))
            # physical-velocity clamp: vp = u_lin + w x pos is unbounded
            # in u-space far from the origin (see engine.py substep note)
            vp_new = tuple(jnp.clip(vp_new[k], -vmax, vmax)
                           for k in range(3))
            qd_new[d], qd_new[d + 1], qd_new[d + 2] = vp_new
            q_new[qa] = q[qa] + dt * vp_new[0]
            q_new[qa + 1] = q[qa + 1] + dt * vp_new[1]
            q_new[qa + 2] = q[qa + 2] + dt * vp_new[2]
            # quaternion integrate with world omega
            angle = jnp.sqrt(w_new[0]**2 + w_new[1]**2 + w_new[2]**2)
            safe = jnp.where(angle > 1e-9, angle, 1.0)
            ax = (w_new[0] / safe, w_new[1] / safe, w_new[2] / safe)
            half = angle * dt * 0.5
            dq = (jnp.cos(half), ax[0] * jnp.sin(half),
                  ax[1] * jnp.sin(half), ax[2] * jnp.sin(half))
            qn = qmul(dq, (q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6]))
            norm = jnp.sqrt(qn[0]**2 + qn[1]**2 + qn[2]**2 + qn[3]**2)
            for k in range(4):
                q_new[qa + 3 + k] = qn[k] / norm
        for i in one_dof:
            qa_, d_ = qposadr[i], dofadr[i]
            q_new[qa_] = q[qa_] + dt * qd_new[d_]
            # inelastic limit stops — projection + outward-velocity zeroing
            # (see engine.py:_substep; stops limit-rebound torso flings)
            lo_i, hi_i = lim_lo[d_], lim_hi[d_]
            if np.isfinite(lo_i) or np.isfinite(hi_i):
                qv_ = q_new[qa_]
                qdv = qd_new[d_]
                qdv = jnp.where(qv_ < lo_i, jnp.maximum(qdv, 0.0), qdv)
                qdv = jnp.where(qv_ > hi_i, jnp.minimum(qdv, 0.0), qdv)
                q_new[qa_] = jnp.clip(qv_, lo_i, hi_i)
                qd_new[d_] = qdv
        return q_new, qd_new

    npr = len(probes)

    def kernel(qpos_ref, qvel_ref, ctrl_ref, pconst_ref, qpos_out, qvel_out):
        q = [qpos_ref[i:i + 1, :] for i in range(nq)]
        qd = [qvel_ref[i:i + 1, :] for i in range(nv)]
        ctrl_rows = [ctrl_ref[i:i + 1, :] for i in range(nu)]
        probe_consts = tuple(pconst_ref[:, k:k + 1] for k in range(4))
        for _ in range(n_sub):
            q, qd = substep_math(q, qd, ctrl_rows, probe_consts)
        for i in range(nq):
            qpos_out[i:i + 1, :] = q[i]
        for i in range(nv):
            qvel_out[i:i + 1, :] = qd[i]

    @jax.jit
    def step_fn(qpos, qvel, ctrl):
        B = qpos.shape[0]
        assert B % tile == 0, f"batch {B} must be divisible by tile {tile}"
        grid = (B // tile,)
        qp, qv = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nq, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nv, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nu, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, 4), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nq, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nv, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nq, qpos.shape[0]), jnp.float32),
                jax.ShapeDtypeStruct((nv, qpos.shape[0]), jnp.float32),
            ],
        )(qpos.T, qvel.T, ctrl.T, jnp.asarray(probe_const_np))
        return qp.T, qv.T

    return step_fn
