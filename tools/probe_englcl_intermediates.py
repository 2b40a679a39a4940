#!/usr/bin/env python
"""engine_cl substep intermediate digests — cross-backend divergence bisect.

Context (RESULTS.md "f32-highest parity probe"): engine_cl-on-TPU diverges
from engine_cl-on-CPU by 3.4e-2 in qpos_mean_abs within the FIRST control
step (10 substeps), bit-stable across default vs highest matmul precision —
so the cause is a systematic lowering difference in one op, not a bf16
matmul leak and not noise amplification. This probe runs the SAME 10
substeps (PandaReach reset pose, fixed ctrl pattern) on whatever backend it
is launched on and prints one JSON row per substep with digests of every
module-level intermediate of engine_cl._substep (fk, S, u, V, I6, f_ext,
tau_bias, tau_act, M, udot, qpos', qvel'). Diffing the CPU and TPU outputs
identifies the first intermediate that splits beyond float32 noise.

Usage:
    python tools/probe_englcl_intermediates.py device=cpu > /tmp/icpu.jsonl
    python tools/probe_englcl_intermediates.py device=tpu > /tmp/itpu.jsonl
    python tools/probe_englcl_intermediates.py diff /tmp/icpu.jsonl /tmp/itpu.jsonl
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

B = 256  # same batch as the lockstep parity probe


def digest(x):
    import jax.numpy as jnp
    x = x.astype(jnp.float32)
    return jnp.stack([jnp.abs(x).mean(), x.ravel()[0], x.ravel()[1],
                      x.ravel()[-1]])


def run(device):
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ddiffpg_tpu.physics import engine_cl as E
    from ddiffpg_tpu.physics import panda as P

    m, meta = P.build_panda_scene("Reach")
    backend = jax.default_backend()

    # deterministic state: init pose + small per-env perturbation so servo
    # torques, limits and (potential) contacts are all exercised; env-LAST
    # layout exactly as engine_cl.step's body sees it.
    nq, nv, nu = m.nq, m.nv, m.nu
    qp = jnp.tile(jnp.asarray(m.init_qpos, jnp.float32)[:, None], (1, B))
    qp = qp + 0.01 * jnp.sin(jnp.arange(nq, dtype=jnp.float32)[:, None]
                             * (1.0 + jnp.arange(B, dtype=jnp.float32)[None]))
    qv = 0.05 * jnp.cos(jnp.arange(nv, dtype=jnp.float32)[:, None]
                        * (2.0 + jnp.arange(B, dtype=jnp.float32)[None]))
    ct = 0.3 * jnp.sin(1.0 + jnp.arange(nu, dtype=jnp.float32)[:, None]
                       + 0.1 * jnp.arange(B, dtype=jnp.float32)[None])

    def one_substep_with_intermediates(qpos, qvel, ctrl):
        # mirror of engine_cl._substep with every intermediate captured,
        # under the same f32 matmul pin as engine_cl.step's scan body
        with jax.default_matmul_precision("float32"):
            out = {}
            body_pos, body_quat = E.fk(m, qpos)
            out["fk_pos"] = digest(body_pos)
            out["fk_quat"] = digest(body_quat)
            p0 = body_pos.mean(axis=0)
            bp = body_pos - p0[None]
            S = E.dof_subspaces(m, bp, body_quat)
            out["S"] = digest(S)
            u = E.qvel_to_u(m, qvel, bp)
            out["u"] = digest(u)
            V = E.body_velocities(m, S, u)
            out["V"] = digest(V)
            I6 = E.spatial_inertia(m, bp, body_quat)
            out["I6"] = digest(I6)
            f_ext = E.contact_forces(m, body_pos, body_quat, V, p0=p0)
            out["f_ext"] = digest(f_ext)
            tau_bias = E.bias_forces(m, I6, S, V, u, f_ext)
            out["tau_bias"] = digest(tau_bias)
            if (m.act_type == 1).any():
                tau_grav = E.bias_forces(m, I6, S, jnp.zeros_like(V),
                                         jnp.zeros_like(u),
                                         jnp.zeros_like(f_ext))
                out["tau_grav"] = digest(tau_grav)
            else:
                tau_grav = None
            tau_act = E.actuator_torques(m, ctrl, qpos, u, tau_grav)
            out["tau_act"] = digest(tau_act)
            # Discriminators for the bf16 one-hot gather-rewrite
            # hypothesis (RESULTS.md session-4 entry): the same servo
            # math computed (a) via static slices — no gather HLO for
            # the backend to rewrite — and (b) via the original
            # fancy-index gathers. act_dof is the identity for panda,
            # so the final scatter is separable and f_servo compares
            # row-for-row with tau_act.
            if (m.act_type == 1).any():
                kp = jnp.asarray(m.act_kp)[:, None]
                kd = jnp.asarray(m.act_kd)[:, None]
                lim = jnp.asarray(m.act_force)[:, None]
                qadr_l = [int(m.jnt_qposadr[int(m.dof_body[d])])
                          for d in m.act_dof]
                dof_l = [int(d) for d in m.act_dof]
                q_s = jnp.stack([qpos[i] for i in qadr_l])
                u_s = jnp.stack([u[i] for i in dof_l])
                tg_s = jnp.stack([tau_grav[i] for i in dof_l])
                out["f_servo_slices"] = digest(
                    jnp.clip(kp * (ctrl - q_s) - kd * u_s + tg_s,
                             -lim, lim))
                q_g = qpos[jnp.asarray(qadr_l)]
                u_g = u[jnp.asarray(dof_l)]
                tg_g = tau_grav[jnp.asarray(dof_l)]
                out["f_servo_gather"] = digest(
                    jnp.clip(kp * (ctrl - q_g) - kd * u_g + tg_g,
                             -lim, lim))
            tau = tau_act + E.passive_torques(m, qpos, u) - tau_bias
            out["tau"] = digest(tau)
            M = E.crba(m, I6, S)
            out["M"] = digest(M)
            udot = E._chol_solve_envs_last(M, tau)
            out["udot"] = digest(udot)
            qpos_new, qvel_new = E._substep(m, qpos, qvel, ctrl)
            out["qpos_new"] = digest(qpos_new)
            out["qvel_new"] = digest(qvel_new)
        return qpos_new, qvel_new, out

    f = jax.jit(one_substep_with_intermediates)
    for k in range(10):
        qp, qv, out = f(qp, qv, ct)
        row = {"substep": k, "backend": backend}
        for name, d in out.items():
            row[name] = [float(x) for x in d]
        print(json.dumps(row), flush=True)


def diff(a_path, b_path, tol=2e-5):
    rows_a = [json.loads(l) for l in open(a_path)]
    rows_b = [json.loads(l) for l in open(b_path)]
    order = ["fk_pos", "fk_quat", "S", "u", "V", "I6", "f_ext", "tau_bias",
             "tau_grav", "tau_act", "f_servo_slices", "f_servo_gather",
             "tau", "M", "udot", "qpos_new", "qvel_new"]
    for ra, rb in zip(rows_a, rows_b):
        assert ra["substep"] == rb["substep"]
        for name in order:
            if name not in ra:
                continue
            da, db = ra[name], rb[name]
            rel = max(abs(x - y) / (abs(x) + 1e-12)
                      for x, y in zip(da, db))
            if rel > tol:
                print(f"substep {ra['substep']}: FIRST DIVERGENCE at "
                      f"{name}: rel {rel:.3e}  {da} vs {db}")
                return
        print(f"substep {ra['substep']}: all intermediates within "
              f"{tol:.0e}")
    print("no divergence found at tol", tol)


def main(argv):
    if argv and argv[0] == "diff":
        diff(argv[1], argv[2])
        return
    kw = dict(a.split("=", 1) for a in argv)
    run(kw.get("device", "cpu"))


if __name__ == "__main__":
    main(sys.argv[1:])
