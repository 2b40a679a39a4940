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
