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


def test_specs_cover_state():
    mesh = make_mesh(8)
    agent = DPAgentDDiffPG(_cfg(8), mesh)
    ts = agent.init(jax.random.PRNGKey(1))
    specs = state_specs(ts, "data")
    flat_s = jax.tree.leaves(specs)
    flat_t = jax.tree.leaves(ts)
    assert len(flat_s) == len(flat_t)
