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
