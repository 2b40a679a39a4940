"""Panda batched step path parity with the vmapped per-env step."""

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu.envs.panda import PandaTaskEnv


def test_step_batched_matches_vmap():
    env = PandaTaskEnv(task="Reach", control_type="joints")
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    st, obs = jax.vmap(env.reset)(keys)
    act = jax.random.uniform(jax.random.PRNGKey(1), (B, env.action_dim),
                             minval=-1, maxval=1)
    st_v, obs_v, r_v, d_v, i_v = jax.vmap(env.step)(st, act)
    st_b, obs_b, r_b, d_b, i_b = env.step_batched(st, act)
    np.testing.assert_allclose(np.asarray(obs_b), np.asarray(obs_v),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(r_b), np.asarray(r_v), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(d_b), np.asarray(d_v))
    np.testing.assert_allclose(np.asarray(st_b.qpos), np.asarray(st_v.qpos),
                               atol=3e-5)


def test_step_batched_matches_vmap_drawer():
    """DrawerMulti adds task obs (4 drawer joints) and per-drawer success
    ids; the batched fast path must agree with vmapped per-env stepping
    before a training run leans on it (the round-3 train/eval integrator
    split started as exactly this kind of untested-path divergence)."""
    env = PandaTaskEnv(task="DrawerMulti", control_type="joints")
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    st, obs = jax.vmap(env.reset)(keys)
    # drive one env's drawer near the close threshold so the success
    # branch is exercised on both paths
    jadr = int(env.meta["task_qposadr"][0])
    st = st._replace(qpos=st.qpos.at[0, jadr].set(0.031))
    act = jax.random.uniform(jax.random.PRNGKey(3), (B, env.action_dim),
                             minval=-1, maxval=1)
    st_v, obs_v, r_v, d_v, i_v = jax.vmap(env.step)(st, act)
    st_b, obs_b, r_b, d_b, i_b = env.step_batched(st, act)
    np.testing.assert_allclose(np.asarray(obs_b), np.asarray(obs_v),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(r_b), np.asarray(r_v), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(d_b), np.asarray(d_v))
    np.testing.assert_array_equal(np.asarray(i_b["success"]),
                                  np.asarray(i_v["success"]))
    np.testing.assert_allclose(np.asarray(st_b.qpos), np.asarray(st_v.qpos),
                               atol=3e-5)
