"""DiffQ: the reference's baseline-diffusion actor path, made functional.

The reference gates `algo.name == "DiffQ"` onto its self-contained
`Diffusion` model (vp beta schedule) in `algo/ac_base.py:34-40` but ships
no AgentDiffQ; here the path is a working DIPO variant whose actor is the
baseline `Diffusion` (models/baseline_diffusion.py) instead of the main
DDPM policy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ddiffpg_tpu.agents.dipo import AgentDIPO
from ddiffpg_tpu.models.baseline_diffusion import Diffusion


class AgentDiffQ(AgentDIPO):
    name = "DiffQ"

    def __init__(self, env, cfg):
        super().__init__(env, cfg)
        self.actor = Diffusion(action_dim=env.action_dim,
                               n_timesteps=cfg.diffusion.diffusion_iter,
                               beta_schedule="vp")

    def _init_actor_params(self, key, dummy_obs):
        return self.actor.init(key, jnp.zeros((1, self.action_dim)),
                               jnp.zeros((1,)), dummy_obs)

    def _actor_act(self, params, key, obs):
        return self.actor.apply(params, obs, key, method=Diffusion.sample)

    def _actor_loss(self, params, key, obs, actions):
        return self.actor.apply(params, key, obs, actions,
                                method=Diffusion.loss)
