"""Data-parallel shard_map tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddiffpg_tpu import config as C
from ddiffpg_tpu.parallel.dp import DPAgentDDiffPG, state_specs
from ddiffpg_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _cfg(nd):
    cfg = C.Config(algo=C.algo_preset("ddiffpg"))
    return cfg.override(**{
        "num_envs": 2 * nd, "eval_num_envs": nd,
        "env.name": "pointmaze-v1", "env.resolution": 255,
        "algo.memory_size": 8 * nd, "algo.batch_size": 8 * nd,
        "algo.warm_up": 4, "algo.update_times": 1,
        "algo.tracker_len": 8, "diffusion.update_times": 2,
        "diffusion.diffusion_iter": 2, "intrinsic.L": 2,
    })


def test_dp_full_train_step():
    mesh = make_mesh(8)
    agent = DPAgentDDiffPG(_cfg(8), mesh)
    ts = agent.init(jax.random.PRNGKey(0))

    # layout sanity: env arrays global = nd * local
    assert ts.obs.shape[0] == 16
    assert ts.replay.obs.shape[0] == 64        # 8 slots per device
    assert ts.replay.next_id.shape == (8,)     # per-device counters

    ts = agent.warmup(ts)
    ts, logs = agent.train_iter(ts)
    jax.block_until_ready(ts)
    assert np.isfinite(float(logs["train/critic_loss"]))
    assert np.isfinite(float(logs["train/actor_loss"]))

    # params must remain replicated after the pmean-ed update
    leaf = jax.tree.leaves(ts.actor_params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_allclose(s, shards[0], atol=1e-6)


def test_dp_deterministic_across_runs():
    """SURVEY §4 distributed item: the sharded program is deterministic —
    two runs from the same seed produce identical params (explicit PRNG
    key threading + per-device folding, no wall-clock or host state)."""
    mesh = make_mesh(8)

    def run():
        agent = DPAgentDDiffPG(_cfg(8), mesh)
        ts = agent.init(jax.random.PRNGKey(3))
        ts = agent.warmup(ts)
        ts, _ = agent.train_iter(ts)
        jax.block_until_ready(ts)
        return ts

    a, b = run(), run()
    for x, y in zip(jax.tree.leaves(a.actor_params),
                    jax.tree.leaves(b.actor_params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(a.critics), jax.tree.leaves(b.critics)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _assert_replicated(tree, atol=1e-6):
    for leaf in jax.tree.leaves(tree):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_allclose(s, shards[0], atol=atol)


def test_dp_recluster_eval_trajectory():
    """A short DP *training trajectory* with several reclusters: exercises
    parallel/dp.py update_cluster (pulls the GLOBAL replay to the host,
    pushes group masks / scheduler plans / evictions back into the sharded
    tables), training at the new group count, and eval under DP.

    Invariance contract (pinned here on purpose): a 1-device and an
    N-device run are NOT bitwise identical BY DESIGN — every shard folds
    its device index into the PRNG key (dp.py:97-98) and samples batches
    from its local replay shard. What IS invariant:
      * params / optimizer states / embeddings stay replicated across
        shards after every update AND after every recluster;
      * the same mesh size + seed reproduce identical results
        (test_dp_deterministic_across_runs).
    """
    from ddiffpg_tpu.agents.evaluation import eval_rollout
    from ddiffpg_tpu.envs import make as make_env

    mesh = make_mesh(8)
    agent = DPAgentDDiffPG(_cfg(8), mesh,
                           env_kwargs={"max_episode_steps": 20})
    ts = agent.init(jax.random.PRNGKey(0))
    ts = agent.warmup(ts)

    groups_seen = []
    for _ in range(3):
        for _ in range(12):          # 20-step episodes -> several finish
            ts, _ = agent.train_iter(ts)
        ts = agent.update_cluster(ts)
        groups_seen.append(agent.agent.num_groups)
        ts, logs = agent.train_iter(ts)   # train at the (possibly) new G
        assert np.isfinite(float(logs["train/critic_loss"]))
        assert np.isfinite(float(logs["train/actor_loss"]))
        _assert_replicated(ts.actor_params)
        _assert_replicated(ts.critics)
        _assert_replicated(ts.embeddings)
    assert all(g >= 1 for g in groups_seen)

    # eval under DP: the replicated actor drives a fresh eval env
    eval_env = make_env("pointmaze-v1", num_envs=8, max_episode_steps=20)
    metrics, _ = eval_rollout(eval_env, agent.eval_policy(ts),
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["eval/return"]))
    assert np.isfinite(float(metrics["eval/success_rate"]))


def test_specs_cover_state():
    mesh = make_mesh(8)
    agent = DPAgentDDiffPG(_cfg(8), mesh)
    ts = agent.init(jax.random.PRNGKey(1))
    specs = state_specs(ts, "data")
    flat_s = jax.tree.leaves(specs)
    flat_t = jax.tree.leaves(ts)
    assert len(flat_s) == len(flat_t)
