"""Agent integration smoke tests on the point-mass maze (fast on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddiffpg_tpu import config as C
from ddiffpg_tpu.agents import make_agent
from ddiffpg_tpu.agents.evaluation import eval_rollout
from ddiffpg_tpu.envs import make


def small_cfg(algo: str, **over):
    cfg = C.Config(algo=C.algo_preset(algo))
    base = {
        "num_envs": 8, "eval_num_envs": 4, "max_step": 10_000,
        "env.name": "pointmaze-v1", "env.resolution": 255,
        "algo.batch_size": 64, "algo.warm_up": 30,
        "algo.update_times": 2, "algo.tracker_len": 16,
        "diffusion.update_times": 3, "diffusion.diffusion_iter": 3,
        "intrinsic.L": 4,
    }
    if algo.lower() == "ddiffpg":
        base["algo.memory_size"] = 32
    else:
        base["algo.memory_size"] = 2000
    base.update(over)
    return cfg.override(**base)


@pytest.mark.parametrize("algo", ["td3", "sac", "dipo"])
def test_baseline_agents_smoke(algo):
    cfg = small_cfg(algo)
    env = make(cfg.env.name, num_envs=cfg.num_envs)
    agent = make_agent(cfg.algo.name, env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    ts = agent.warmup(ts)
    for _ in range(2):
        ts, logs = agent.train_iter(ts)
    assert np.isfinite(float(logs["train/critic_loss"]))
    assert np.isfinite(float(logs["train/actor_loss"]))
    core = ts.core if hasattr(ts, "core") else ts
    assert int(core.replay.size) > 0
    assert bool(jnp.isfinite(core.obs).all())

    # eval rollout works
    eval_env = make(cfg.env.name, num_envs=cfg.eval_num_envs)
    params = core.actor_params
    metrics, xy = eval_rollout(
        eval_env, lambda k, o: agent.eval_actor(params, k, o),
        jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["eval/return"]))


@pytest.mark.parametrize("algo", ["td3", "sac", "dipo", "ddiffpg"])
def test_agents_obs_norm(algo):
    """obs_norm=True trains finitely for every agent and the eval policy
    normalizes through eval_policy (reference ac_base.py:55-58 wires an
    obs RMS for all agents; round-1 had it only in TD3)."""
    cfg = small_cfg(algo, **{"algo.obs_norm": True})
    env = make(cfg.env.name, num_envs=cfg.num_envs)
    agent = make_agent(cfg.algo.name, env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    ts = agent.warmup(ts)
    if algo == "ddiffpg":
        ts = agent.update_cluster(ts)
    for _ in range(2):
        ts, logs = agent.train_iter(ts)
    assert np.isfinite(float(logs["train/critic_loss"]))
    assert np.isfinite(float(logs["train/actor_loss"]))

    core = ts.core if hasattr(ts, "core") else ts
    assert core.obs_rms is not None
    # the rms saw real data: count grew and mean moved off zero
    assert float(core.obs_rms.count) > 1.0
    assert float(jnp.abs(core.obs_rms.mean).max()) > 0.0

    eval_env = make(cfg.env.name, num_envs=4)
    metrics, _ = eval_rollout(eval_env, agent.eval_policy(ts),
                              jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["eval/return"]))


def test_ddiffpg_full_cycle():
    cfg = small_cfg("ddiffpg")
    env = make(cfg.env.name, num_envs=cfg.num_envs)
    agent = make_agent("DDiffPG", env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    ts = agent.warmup(ts)
    # warmup produced some finished episodes (pointmaze max len 100 > 30
    # steps, but some envs hit goals randomly... ensure at least temp data)
    assert int(ts.replay.tmp_len.sum()) > 0 or int(
        (ts.replay.length > 0).sum()) > 0

    ts = agent.update_cluster(ts)
    G1 = agent.num_groups
    assert G1 >= 1

    for _ in range(2):
        ts, logs = agent.train_iter(ts)
    assert np.isfinite(float(logs["train/critic_loss"]))
    assert np.isfinite(float(logs["train/actor_loss"]))
    assert np.isfinite(float(logs["train/mean_intrinsic"]))

    # run enough env steps for several episodes to finish, then recluster
    # again (exercises the scheduler)
    for _ in range(15):
        ts, _ = agent.train_iter(ts)
    ts = agent.update_cluster(ts)
    assert agent.num_groups >= 1
    ts, logs = agent.train_iter(ts)
    assert np.isfinite(float(logs["train/critic_loss"]))

    # eval with zero embedding
    eval_env = make(cfg.env.name, num_envs=4)
    metrics, _ = eval_rollout(
        eval_env, lambda k, o: agent.eval_actor(ts.actor_params, k, o),
        jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["eval/return"]))


def test_ddiffpg_dense_support_splits_explore_group():
    """Dense envs map the MODE critics' C51 support below zero
    (config.preprocess), but the EXPLORE critic trains on intrinsic-only
    nonnegative returns and must keep its own [0, 5] support — sharing
    [-50, 0] collapses every explore target onto the 0-atom and blinds
    exploration (RESULTS.md, panda dense r5: 1.48M steps, 0 successes,
    critic_loss 0.18 -> 2e-7). This exercises the per-group z-atoms path
    end-to-end on a dense-style config."""
    cfg = small_cfg("ddiffpg", **{"algo.v_min": -50.0, "algo.v_max": 0.0})
    assert cfg.algo.v_min_explore == 0.0 and cfg.algo.v_max_explore == 5.0
    env = make(cfg.env.name, num_envs=cfg.num_envs)
    agent = make_agent("DDiffPG", env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    ts = agent.warmup(ts)
    ts = agent.update_cluster(ts)
    for _ in range(3):
        ts, logs = agent.train_iter(ts)
    assert np.isfinite(float(logs["train/critic_loss"]))
    assert np.isfinite(float(logs["train/actor_loss"]))
    # the explore critic's targets live on [0, 5]: with NovelD rewards > 0
    # the projected target mass cannot all sit on the support minimum, so
    # its BCE loss against fresh softmax heads stays well off zero
    assert float(logs["train/critic_loss"]) > 1e-6
    # DISCRIMINATING assertion (advisor r4): decode the explore row on its
    # own atoms. Under the regression (explore shares the dense mode
    # support [-50, 0]) every decodable expectation is <= 0 by construction;
    # with the per-group support the intrinsic-only targets on [0, 5] keep
    # the decoded Q strictly positive from the first update.
    assert float(logs["train/q_explore"]) > 0.0
    assert np.isfinite(float(logs["train/critic_loss_explore"]))


def test_td3_learns_pointmaze_dense():
    """Sanity: TD3 improves dense-reward return on the point maze within a
    few hundred iterations (sparse antmaze learning is covered by the
    long-running training harness, not unit tests)."""
    cfg = small_cfg(
        "td3", **{"num_envs": 32, "algo.batch_size": 128,
                  "algo.warm_up": 100, "algo.update_times": 4,
                  "algo.num_atoms": 11, "algo.horizon_len": 4,
                  "algo.v_min": -10.0, "algo.v_max": 10.0})
    env = make(cfg.env.name, num_envs=cfg.num_envs, reward_type="dense")
    agent = make_agent("TD3", env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    ts = agent.warmup(ts)
    rets = []
    for i in range(120):
        ts, logs = agent.train_iter(ts)
        rets.append(float(logs["train/return"]))
    assert np.isfinite(rets[-1])
    early = np.mean(rets[10:30])
    late = np.mean(rets[-20:])
    assert late > early + 0.5, f"no learning signal: {early:.2f} -> {late:.2f}"
