"""DIPO baseline: diffusion-policy actor trained by action gradient.

Reference: `/root/reference/ddiffpg/algo/dipo.py`. Differences from TD3:
the actor is the K-step DDPM policy; each update improves the sampled
target actions by `diffusion.update_times` Adam ascent steps on Q and
distills them into the actor with the epsilon-MSE loss, writing the
improved actions back into the replay's target-action column
(dipo.py:162-171, simple_replay.py:93-95).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ddiffpg_tpu.agents import base
from ddiffpg_tpu.agents.td3 import AgentTD3
from ddiffpg_tpu.models.diffusion import DiffusionPolicy
from ddiffpg_tpu.models.mlp import DistributionalDoubleQ
from ddiffpg_tpu.replay import flat


class AgentDIPO(AgentTD3):
    name = "DIPO"

    def __init__(self, env, cfg):
        self._diffusion_cfg = cfg.diffusion
        super().__init__(env, cfg)
        self.actor = DiffusionPolicy(
            action_dim=env.action_dim,
            diffusion_iter=cfg.diffusion.diffusion_iter)

    def _init_actor_params(self, key, dummy_obs):
        return self.actor.init(key, jnp.zeros((1, self.action_dim)),
                               jnp.zeros((1,)), dummy_obs)

    def _actor_act(self, params, key, obs):
        return self.actor.apply(params, key, obs, method=DiffusionPolicy.act)

    def _actor_loss(self, params, key, obs, actions):
        return self.actor.apply(params, key, obs, actions,
                                method=DiffusionPolicy.loss)

    def _update_once(self, ts, key):
        k_samp, k_cri, k_act, k_loss = jax.random.split(key, 4)
        batch, idx = flat.sample(ts.replay, k_samp, self.cfg.algo.batch_size)
        obs, action, target_action, reward, next_obs, done = batch

        ts, c_loss, c_gnorm, r_int = self._critic_update(ts, k_cri, batch)

        # the reference normalizes obs/next_obs once after the intrinsic
        # reward (dipo.py:144-146); everything downstream — RND update,
        # action gradient, actor distillation — sees normalized obs
        # (identity when obs_norm is off)
        n_obs = self._norm_obs(ts, obs)
        n_next = self._norm_obs(ts, next_obs)
        if self.cfg.intrinsic.type == "noveld":
            intr, d_loss, d_gnorm = self.intrinsic.update(
                ts.intrinsic, jnp.concatenate([n_obs, n_next]))
        else:
            intr, d_loss, d_gnorm = self.intrinsic.update(ts.intrinsic, n_obs)
        ts = ts._replace(intrinsic=intr)

        # action gradient on the stored target actions (dipo.py:246-261)
        q_min = lambda o, a: self.critic.apply(
            ts.critic_params, o, a, method=DistributionalDoubleQ.q_min)
        new_action = base.action_gradient(
            q_min, n_obs, target_action,
            n_steps=self._diffusion_cfg.update_times,
            lr=self._diffusion_cfg.action_lr,
            max_grad_norm=self.cfg.algo.max_grad_norm)
        replay = flat.update_target_action(ts.replay, idx, new_action)
        ts = ts._replace(replay=replay)

        # distill into the diffusion actor (epsilon-MSE)
        def loss_fn(params):
            return self._actor_loss(params, k_loss, n_obs, new_action)

        a_loss, grads = jax.value_and_grad(loss_fn)(ts.actor_params)
        params, opt, a_gnorm = base.apply_update(
            self.actor_tx, ts.actor_params, ts.actor_opt, grads)
        ts = ts._replace(actor_params=params, actor_opt=opt)

        ts = ts._replace(
            critic_target=base.soft_update(ts.critic_target, ts.critic_params,
                                           self.cfg.algo.tau))
        if not self.cfg.algo.no_tgt_actor:
            ts = ts._replace(actor_target=base.soft_update(
                ts.actor_target, ts.actor_params, self.cfg.algo.tau))
        else:
            ts = ts._replace(actor_target=ts.actor_params)

        logs = {"train/critic_loss": c_loss, "train/actor_loss": a_loss,
                "train/critic_grad": c_gnorm, "train/actor_grad": a_gnorm,
                "train/dynamic_loss": d_loss, "train/dynamic_grad": d_gnorm,
                "train/mean_action": jnp.abs(new_action).mean(),
                "train/mean_intrinsic": r_int.mean()}
        return ts, logs
