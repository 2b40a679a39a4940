"""DDiffPG-specific semantic tests: explore-ratio schedule, recluster
plumbing, embedding conditioning."""

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu.agents import make_agent
from ddiffpg_tpu.envs import make
from tests.test_agents import small_cfg


def _agent(**over):
    cfg = small_cfg("ddiffpg", **over)
    env = make(cfg.env.name, num_envs=cfg.num_envs)
    return make_agent("DDiffPG", env, cfg), cfg


class TestExpP:
    def test_prop_schedule(self):
        agent, cfg = _agent()
        # prop: p = 1 - explore_n / batch_size (ddiffpg.py:129-130)
        agent.num_groups = 1
        assert agent.get_exp_p(0) == 1 - (cfg.algo.batch_size // 1) \
            / cfg.algo.batch_size == 0.0
        agent.num_groups = 4
        p = agent.get_exp_p(0)
        assert abs(p - (1 - (cfg.algo.batch_size // 4)
                        / cfg.algo.batch_size)) < 1e-6

    def test_stop_ratio_forces_one(self):
        agent, cfg = _agent()
        agent.num_groups = 2
        steps = int(cfg.algo.exp.stop_ratio * cfg.max_step) + 1
        assert agent.get_exp_p(steps) == 1.0

    def test_fixed(self):
        agent, cfg = _agent(**{"algo.exp.type": "fixed"})
        agent.num_groups = 4
        p = agent.get_exp_p(0)
        assert p <= cfg.algo.exp.fix_ratio + 1e-9

    def test_hold_until_goals(self):
        agent, cfg = _agent(**{"algo.exp.hold_until_goals": 2})
        agent.num_groups = 2
        agent.num_clusters = 1
        steps = int(cfg.algo.exp.stop_ratio * cfg.max_step) + 1
        # only one distinct goal has successes -> p stays at the prop value
        agent.last_goal_counts = {2: 40}
        p_sched = 1 - (cfg.algo.batch_size // 2 + cfg.algo.batch_size % 2) \
            / cfg.algo.batch_size
        assert abs(agent.get_exp_p(steps) - p_sched) < 1e-6
        # both goals reached -> the stop_ratio override applies again
        agent.last_goal_counts = {1: 3, 2: 40}
        assert agent.get_exp_p(steps) == 1.0


class TestRecluster:
    def test_embeddings_persist_for_stable_clusters(self):
        agent, cfg = _agent()
        ts = agent.init(jax.random.PRNGKey(0))
        ts = agent.warmup(ts)
        # run enough steps for multiple episodes to finish
        for _ in range(12):
            ts, _ = agent.train_iter(ts)
        ts = agent.update_cluster(ts)
        if agent.num_clusters == 0:
            return  # nothing succeeded in this short run; nothing to check
        emb_before = np.asarray(ts.embeddings)
        G1 = agent.num_groups
        # recluster again immediately: clusters identical -> critics and
        # embeddings inherited, no fresh optimizers for existing rows
        ts = agent.update_cluster(ts)
        assert agent.num_groups == G1
        np.testing.assert_allclose(np.asarray(ts.embeddings)[:G1],
                                   emb_before[:G1], atol=1e-6)

    def test_group_mask_row0_tracks_valid(self):
        agent, cfg = _agent()
        ts = agent.init(jax.random.PRNGKey(0))
        ts = agent.warmup(ts)
        for _ in range(12):
            ts, _ = agent.train_iter(ts)
        ts = agent.update_cluster(ts)
        gm = np.asarray(ts.replay.group_mask)
        valid = np.asarray(ts.replay.length) > 0
        # row 0 ("all trajectories") == surviving valid slots
        assert (gm[0] <= valid).all()
        # every mode-group member is also in a valid slot
        for g in range(1, agent.num_groups):
            assert (gm[g] <= valid).all()


def test_eval_actor_uses_zero_embedding():
    agent, cfg = _agent()
    ts = agent.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((4, agent.obs_dim))
    a1 = agent.eval_actor(ts.actor_params, jax.random.PRNGKey(1), obs)
    assert a1.shape == (4, agent.action_dim)
    assert float(jnp.abs(a1).max()) <= 1.0
