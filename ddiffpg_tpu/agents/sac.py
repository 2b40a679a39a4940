"""SAC baseline with auto-tuned alpha and (non-distributional) DoubleQ.

Reference: `/root/reference/ddiffpg/algo/sac.py`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ddiffpg_tpu.agents import base
from ddiffpg_tpu.agents.td3 import AgentTD3, TD3State
from ddiffpg_tpu.models.mlp import DoubleQ, TanhDiagGaussianMLPPolicy


class SACState(NamedTuple):
    core: TD3State
    log_alpha: jnp.ndarray
    alpha_opt: Any


class AgentSAC(AgentTD3):
    name = "SAC"

    def __init__(self, env, cfg):
        super().__init__(env, cfg)
        self.actor = TanhDiagGaussianMLPPolicy(env.action_dim)
        self.critic = DoubleQ()
        self.alpha_tx = optax.adamw(cfg.algo.alpha_lr)
        self.target_entropy = -float(env.action_dim)

    def init(self, key) -> SACState:
        core = super().init(key)
        log_alpha = jnp.zeros(())
        return SACState(core=core, log_alpha=log_alpha,
                        alpha_opt=self.alpha_tx.init(log_alpha))

    def _alpha(self, ts: SACState):
        if self.cfg.algo.alpha is not None:
            return jnp.asarray(self.cfg.algo.alpha)
        return jnp.exp(ts.log_alpha)

    def _actor_act(self, params, key, obs):
        mu, log_std = self.actor.apply(params, obs)
        a, _ = TanhDiagGaussianMLPPolicy.sample_logprob(key, mu, log_std)
        return a

    def _policy_action(self, ts, key, obs):
        # SAC explores with its own stochasticity (sac.py:57-61)
        return self._actor_act(ts.actor_params, key, self._norm_obs(ts, obs))

    # full state plumbing: SACState wraps the TD3State core
    def _env_step(self, ts: SACState, random: bool):
        return ts._replace(core=super()._env_step(ts.core, random))

    def warmup(self, ts: SACState):
        return self._explore_jit(ts, None, int(self.cfg.algo.warm_up))

    def _update_once(self, ts: SACState, key):
        from ddiffpg_tpu.replay import flat

        core = ts.core
        k_samp, k_next, k_pi, k_alpha = jax.random.split(key, 4)
        batch, _ = flat.sample(core.replay, k_samp, self.cfg.algo.batch_size)
        obs, action, _, reward, next_obs, done = batch

        r_int, intrinsic = self.intrinsic.compute_reward(
            core.intrinsic, obs, next_obs)
        reward = reward + r_int
        core = core._replace(intrinsic=intrinsic)
        # reference normalizes after the intrinsic reward (sac.py:115-117)
        obs = self._norm_obs(core, obs)
        next_obs = self._norm_obs(core, next_obs)

        alpha = self._alpha(ts)
        gamma_n = self.cfg.algo.gamma ** self.cfg.algo.nstep

        mu_n, ls_n = self.actor.apply(core.actor_params, next_obs)
        next_a, next_lp = TanhDiagGaussianMLPPolicy.sample_logprob(
            k_next, mu_n, ls_n)
        q1_t, q2_t = self.critic.apply(core.critic_target, next_obs, next_a)
        target_q = reward + (1 - done) * gamma_n * (
            jnp.minimum(q1_t, q2_t) - alpha * next_lp)
        target_q = jax.lax.stop_gradient(target_q)

        def critic_loss_fn(params):
            q1, q2 = self.critic.apply(params, obs, action)
            return jnp.mean((q1 - target_q) ** 2) + jnp.mean((q2 - target_q) ** 2)

        c_loss, grads = jax.value_and_grad(critic_loss_fn)(core.critic_params)
        cparams, copt, c_gnorm = base.apply_update(
            self.critic_tx, core.critic_params, core.critic_opt, grads)
        core = core._replace(critic_params=cparams, critic_opt=copt)

        if self.cfg.intrinsic.type == "noveld":
            intr, d_loss, d_gnorm = self.intrinsic.update(
                core.intrinsic, jnp.concatenate([obs, next_obs]))
        else:
            intr, d_loss, d_gnorm = self.intrinsic.update(core.intrinsic, obs)
        core = core._replace(intrinsic=intr)

        def actor_loss_fn(params):
            mu, ls = self.actor.apply(params, obs)
            a, lp = TanhDiagGaussianMLPPolicy.sample_logprob(k_pi, mu, ls)
            q1, q2 = self.critic.apply(core.critic_params, obs, a)
            q = jnp.minimum(q1, q2)
            return (alpha * lp - q).mean(), lp

        (a_loss, lp), grads = jax.value_and_grad(actor_loss_fn, has_aux=True)(
            core.actor_params)
        aparams, aopt, a_gnorm = base.apply_update(
            self.actor_tx, core.actor_params, core.actor_opt, grads)
        core = core._replace(actor_params=aparams, actor_opt=aopt)

        # auto-alpha (sac.py:165-167)
        log_alpha, alpha_opt = ts.log_alpha, ts.alpha_opt
        if self.cfg.algo.alpha is None:
            tgt = jax.lax.stop_gradient(-lp - self.target_entropy)

            def alpha_loss_fn(la):
                return (jnp.exp(la) * tgt).mean()

            _, ga = jax.value_and_grad(alpha_loss_fn)(log_alpha)
            upd, alpha_opt = self.alpha_tx.update(ga, alpha_opt, log_alpha)
            log_alpha = optax.apply_updates(log_alpha, upd)

        core = core._replace(
            critic_target=base.soft_update(core.critic_target,
                                           core.critic_params,
                                           self.cfg.algo.tau))
        if not self.cfg.algo.no_tgt_actor:
            core = core._replace(actor_target=base.soft_update(
                core.actor_target, core.actor_params, self.cfg.algo.tau))
        else:
            core = core._replace(actor_target=core.actor_params)

        logs = {"train/critic_loss": c_loss, "train/actor_loss": a_loss,
                "train/critic_grad": c_gnorm, "train/actor_grad": a_gnorm,
                "train/dynamic_loss": d_loss, "train/dynamic_grad": d_gnorm,
                "train/alpha": jnp.exp(log_alpha),
                "train/mean_intrinsic": r_int.mean()}
        return ts._replace(core=core, log_alpha=log_alpha,
                           alpha_opt=alpha_opt), logs

    def _train_iter_impl(self, ts: SACState):
        for _ in range(self.cfg.algo.horizon_len):
            ts = self._env_step(ts, random=False)

        def body(carry, key):
            carry, logs = self._update_once(carry, key)
            return carry, logs

        key, *keys = jax.random.split(ts.core.key,
                                      self.cfg.algo.update_times + 1)
        ts = ts._replace(core=ts.core._replace(key=key))
        ts, logs = jax.lax.scan(body, ts, jnp.stack(keys))
        logs = jax.tree.map(jnp.mean, logs)
        logs["train/return"] = ts.core.stats.return_tracker.mean()
        logs["train/episode_length"] = ts.core.stats.step_tracker.mean()
        return ts, logs
