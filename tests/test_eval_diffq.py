"""Eval rollout metrics + DiffQ agent smoke test."""

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu.agents import make_agent
from ddiffpg_tpu.agents.evaluation import eval_rollout
from ddiffpg_tpu.envs import make
from tests.test_agents import small_cfg


def test_eval_rollout_counts_episodes():
    env = make("pointmaze-v1", num_envs=4)

    # a do-nothing policy: all episodes end at the 100-step timeout
    metrics, xy = eval_rollout(env, lambda k, o: jnp.zeros((4, 2)),
                               jax.random.PRNGKey(0))
    assert int(metrics["eval/episodes"]) == 4
    assert float(metrics["eval/episode_length"]) == 100.0
    assert xy.shape == (100, 4, 2)


def test_diffq_agent_smoke():
    cfg = small_cfg("diffq")
    env = make(cfg.env.name, num_envs=cfg.num_envs)
    agent = make_agent("DiffQ", env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    ts = agent.warmup(ts)
    ts, logs = agent.train_iter(ts)
    assert np.isfinite(float(logs["train/critic_loss"]))
    assert np.isfinite(float(logs["train/actor_loss"]))
    a = agent.eval_actor(ts.actor_params, jax.random.PRNGKey(1),
                         jnp.zeros((4, env.obs_dim)))
    assert a.shape == (4, env.action_dim)
    assert float(jnp.abs(a).max()) <= 1.0


def test_eval_fn_compiles_once_across_train_states():
    """eval_rollout's actor_fn is a STATIC jit argument: the agent's bound
    eval_fn hashes equal across accesses, so repeated evals with changing
    params reuse one compiled rollout program. (A fresh closure per eval —
    the old eval_policy(ts) pattern — retraces the 500-step program every
    eval, which costs minutes per eval through a remote-compile tunnel.)"""
    cfg = small_cfg("ddiffpg")
    env = make(cfg.env.name, num_envs=cfg.num_envs)
    agent = make_agent("DDiffPG", env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))

    assert agent.eval_fn == agent.eval_fn          # bound-method stability
    eval_env = make(cfg.env.name, num_envs=4)

    n0 = eval_rollout._cache_size()
    m1, _ = eval_rollout(eval_env, agent.eval_fn, jax.random.PRNGKey(1),
                         agent.eval_args(ts))
    n1 = eval_rollout._cache_size()
    # perturb params (a different train state) and eval again
    ts2 = ts._replace(actor_params=jax.tree.map(
        lambda x: x + 1e-3, ts.actor_params))
    m2, _ = eval_rollout(eval_env, agent.eval_fn, jax.random.PRNGKey(2),
                         agent.eval_args(ts2))
    n2 = eval_rollout._cache_size()
    assert n1 == n0 + 1 and n2 == n1               # no retrace on call 2
    assert np.isfinite(float(m1["eval/return"]))
    assert np.isfinite(float(m2["eval/return"]))


def test_eval_rollout_per_goal_panda_drawer():
    """Multi-goal panda tasks get a per-goal eval breakdown (env.num_goals
    drives the metric keys, matching antmaze's goal_xy-based path)."""
    env = make("PandaDrawerMultiJoints-v3", num_envs=2,
               max_episode_steps=3, use_pallas=False)
    assert env.env.num_goals == 4
    metrics, _ = eval_rollout(env, lambda k, o: jnp.zeros((2, 8)),
                              jax.random.PRNGKey(0))
    for g in range(1, 5):
        assert f"eval/success_goal{g}" in metrics
    # do-nothing policy: drawers stay shut, no successes anywhere
    assert sum(float(metrics[f"eval/success_goal{g}"])
               for g in range(1, 5)) == 0.0


def test_eval_rollout_single_goal_no_breakdown():
    env = make("PandaReachJoints-v3", num_envs=2,
               max_episode_steps=3, use_pallas=False)
    assert env.env.num_goals == 1
    metrics, _ = eval_rollout(env, lambda k, o: jnp.zeros((2, 7)),
                              jax.random.PRNGKey(0))
    assert not any(k.startswith("eval/success_goal") for k in metrics)
