"""Config tree, checkpointing, density tracking, eval rollout."""

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu import config as C
from ddiffpg_tpu.utils import checkpoint as ckpt
from ddiffpg_tpu.utils import density


class TestConfig:
    def test_presets(self):
        cfg = C.Config(algo=C.algo_preset("td3"))
        assert cfg.algo.name == "TD3" and cfg.algo.memory_size == 1_000_000
        assert cfg.algo.warm_up == 32
        sac = C.algo_preset("sac")
        assert sac.cri_class == "DoubleQ"
        dd = C.algo_preset("ddiffpg")
        assert dd.memory_size == 2000 and dd.warm_up == 500

    def test_preprocess_overrides(self):
        cfg = C.Config().override(**{"env.name": "antmaze-v1"})
        cfg = C.preprocess(cfg)
        assert cfg.env.resolution == 255 and cfg.env.random_init
        assert cfg.max_step == 3_000_000
        assert cfg.algo.cluster_threshold == 50.0
        cfg3 = C.preprocess(C.Config().override(**{"env.name": "antmaze-v3"}))
        assert cfg3.max_step == 4_000_000
        assert cfg3.algo.cluster_threshold == 70.0
        panda = C.preprocess(C.Config().override(
            **{"env.name": "PandaReachJoints-v3"}))
        assert panda.algo.use_downsampling

    def test_cli_overrides(self):
        cfg = C.Config().override_strings(
            ["num_envs=128", "algo.tau=0.1", "algo.cluster_threshold=null",
             "env.name=antmaze-v2"])
        assert cfg.num_envs == 128 and cfg.algo.tau == 0.1
        assert cfg.algo.cluster_threshold is None
        assert cfg.env.name == "antmaze-v2"

    def test_unknown_key_raises(self):
        import pytest

        with pytest.raises(KeyError):
            C.Config().override(**{"algo.nonsense": 1})


class TestCheckpoint:
    def test_full_state_roundtrip(self, tmp_path):
        state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
                 "step": jnp.asarray(7, jnp.int32),
                 "key": jax.random.PRNGKey(3)}
        p = tmp_path / "ckpt.pkl"
        ckpt.save(p, state, {"num_groups": 4})
        restored, meta = ckpt.load(p, state)
        assert meta["num_groups"] == 4
        np.testing.assert_allclose(restored["params"]["w"],
                                   state["params"]["w"])
        assert int(restored["step"]) == 7

    def test_pre_frontier_checkpoint_migrates(self, tmp_path):
        """A checkpoint written before the replay grew frontier/tmp_frontier
        fields must load with those fields fresh-initialized (the round-4
        drawer resume depends on this)."""
        from collections import namedtuple
        Rep = namedtuple("Rep", "length frontier tmp_len tmp_frontier")
        St = namedtuple("St", "replay step")
        new = St(replay=Rep(length=jnp.ones(4, jnp.int32),
                            frontier=jnp.zeros(4),
                            tmp_len=jnp.zeros(2, jnp.int32),
                            tmp_frontier=jnp.zeros(2)),
                 step=jnp.asarray(0, jnp.int32))
        OldRep = namedtuple("Rep", "length tmp_len")
        old = St(replay=OldRep(length=jnp.full(4, 9, jnp.int32),
                               tmp_len=jnp.full(2, 3, jnp.int32)),
                 step=jnp.asarray(11, jnp.int32))
        p = tmp_path / "old.pkl"
        ckpt.save(p, old, {})
        restored, _ = ckpt.load(p, new)
        np.testing.assert_array_equal(restored.replay.length, 9)
        np.testing.assert_array_equal(restored.replay.tmp_len, 3)
        np.testing.assert_array_equal(restored.replay.frontier, 0.0)
        np.testing.assert_array_equal(restored.replay.tmp_frontier, 0.0)
        assert int(restored.step) == 11

    def test_reshaped_frontier_checkpoint_migrates(self, tmp_path):
        """A checkpoint saved with the pre-goal-directed [S] frontier must
        load into the [S, NG] store with those fields fresh-initialized
        while everything else restores (9c0b9ea shape migration)."""
        from collections import namedtuple
        Rep = namedtuple("Rep", "length frontier tmp_len tmp_frontier")
        St = namedtuple("St", "replay step")
        new = St(replay=Rep(length=jnp.ones(4, jnp.int32),
                            frontier=jnp.full((4, 2), 1e9),
                            tmp_len=jnp.zeros(2, jnp.int32),
                            tmp_frontier=jnp.full((2, 2), 1e9)),
                 step=jnp.asarray(0, jnp.int32))
        old = St(replay=Rep(length=jnp.full(4, 9, jnp.int32),
                            frontier=jnp.full(4, 7.0),
                            tmp_len=jnp.full(2, 3, jnp.int32),
                            tmp_frontier=jnp.full(2, 5.0)),
                 step=jnp.asarray(11, jnp.int32))
        p = tmp_path / "old_shape.pkl"
        ckpt.save(p, old, {})
        restored, _ = ckpt.load(p, new)
        np.testing.assert_array_equal(restored.replay.length, 9)
        np.testing.assert_array_equal(restored.replay.tmp_len, 3)
        assert restored.replay.frontier.shape == (4, 2)
        np.testing.assert_array_equal(restored.replay.frontier, 1e9)
        np.testing.assert_array_equal(restored.replay.tmp_frontier, 1e9)
        assert int(restored.step) == 11

    def test_weights_bundle(self, tmp_path):
        p = tmp_path / "model.pkl"
        ckpt.save_model(p, {"w": np.ones(3)}, [{"q": np.zeros(2)}],
                        embeddings=np.ones((3, 5)))
        blob = ckpt.load_model(p)
        assert blob["embeddings"].shape == (3, 5)
        np.testing.assert_allclose(blob["critics"][0]["q"], 0.0)


class TestDensity:
    def test_grid_and_coverage(self):
        from ddiffpg_tpu.physics.maze import MAZE_v1

        grid, reset, num_free = density.create_grid(MAZE_v1, 255)
        assert grid.shape == (255, 255)
        # 8 free cells of 51x51 each
        assert num_free == 8 * 51 * 51
        g = jnp.asarray(grid)
        g = density.update(g, jnp.zeros((4, 2)), 4.0, jnp.asarray(reset), 5)
        cov = float(density.coverage(g, num_free))
        assert 0 < cov < 1e-3  # a single visited cell

    def test_visit_far_cell(self):
        from ddiffpg_tpu.physics.maze import MAZE_v1

        grid, reset, num_free = density.create_grid(MAZE_v1, 255)
        g = jnp.asarray(grid)
        # goal cell at (-8, 0) must map inside the grid, on a free cell
        g2 = density.update(g, jnp.asarray([[-8.0, 0.0]]), 4.0,
                            jnp.asarray(reset), 5)
        assert int((g2 > 0).sum()) == 1
        changed = np.argwhere(np.asarray(g2 > 0))
        assert np.asarray(grid)[changed[0][0], changed[0][1]] == 0

    def test_wall_visits_never_count(self):
        """Regression: probe penetration can report positions inside walls;
        repeated hits on a -1 wall cell must not push it past 0 and count
        as a visited free cell (shipped runs logged coverage 1.025)."""
        from ddiffpg_tpu.physics.maze import MAZE_v1

        grid, reset, num_free = density.create_grid(MAZE_v1, 255)
        g = jnp.asarray(grid)
        wall_xy = jnp.asarray([[0.0, 8.0]] * 5)   # center-top wall block
        assert np.asarray(grid)[
            int(reset[0] - 2 * 51), int(reset[1])] == -1
        for _ in range(3):
            g = density.update(g, wall_xy, 4.0, jnp.asarray(reset), 5)
        assert int((g > 0).sum()) == 0
        # visit every cell (free + wall) many times: coverage stays <= 1
        ys, xs = np.meshgrid(np.linspace(-10, 10, 120),
                             np.linspace(-10, 10, 120))
        all_xy = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1))
        for _ in range(2):
            g = density.update(g, all_xy, 4.0, jnp.asarray(reset), 5)
        assert float(density.coverage(g, num_free)) <= 1.0 + 1e-9


class TestDenseReward:
    def test_antmaze_dense_reward_is_neg_distance(self):
        """reward_type is a real argument now (was silently ignored):
        dense = -distance to the nearest goal, goal_reaching_env.py:28-35."""
        import jax
        from ddiffpg_tpu.envs.antmaze import AntMazeEnv

        env = AntMazeEnv("antmaze-v1", reward_type="dense", use_pallas=False)
        st, obs = env.reset(jax.random.PRNGKey(0))
        st2, obs2, r, done, info = env.step(st, jnp.zeros(8))
        d = np.linalg.norm(
            np.asarray(st2.qpos[:2])[None] - np.asarray(env.goal_xy),
            axis=-1).min()
        np.testing.assert_allclose(float(r), -d, rtol=1e-5)

        sparse = AntMazeEnv("antmaze-v1", use_pallas=False)
        st, _ = sparse.reset(jax.random.PRNGKey(0))
        _, _, r0, _, _ = sparse.step(st, jnp.zeros(8))
        assert float(r0) == 0.0

    def test_preprocess_dense_value_support(self):
        """Regression: the sparse C51 support [0,5] makes any negative-
        reward task unlearnable (every projected target clips onto the
        0-atom; observed as a 400k-step dead-critic Panda run)."""
        from ddiffpg_tpu import config as C

        cfg = C.Config(algo=C.algo_preset("td3"))
        cfg = cfg.override(**{"env.name": "PandaReachJointsDense-v3"})
        cfg = C.preprocess(cfg, if_ddiffpg=False)
        assert cfg.algo.v_min < -10.0 and cfg.algo.v_max == 0.0

        cfg = C.Config(algo=C.algo_preset("td3"))
        cfg = cfg.override(**{"env.name": "antmaze-v1",
                              "env.reward_type": "dense"})
        cfg = C.preprocess(cfg, if_ddiffpg=False)
        assert cfg.algo.v_min <= -1000.0 and cfg.algo.v_max == 0.0

        # sparse presets untouched
        cfg = C.preprocess(C.Config(algo=C.algo_preset("ddiffpg")))
        assert (cfg.algo.v_min, cfg.algo.v_max) == (0.0, 5.0)
