"""TD3 baseline with C51 distributional double critic + intrinsic reward.

Reference: `/root/reference/ddiffpg/algo/td3.py`. One training iteration
(horizon_len env steps + update_times gradient steps) is a single jitted
program with donated state.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ddiffpg_tpu.agents import base
from ddiffpg_tpu.intrinsic import IntrinsicModule, IntrinsicState
from ddiffpg_tpu.models.mlp import DistributionalDoubleQ, TanhMLPPolicy
from ddiffpg_tpu.ops import nstep as nstep_ops
from ddiffpg_tpu.ops import running_stats as rs
from ddiffpg_tpu.replay import flat


class TD3State(NamedTuple):
    actor_params: Any
    actor_target: Any
    actor_opt: Any
    critic_params: Any
    critic_target: Any
    critic_opt: Any
    intrinsic: IntrinsicState
    replay: flat.FlatReplay
    nstep: nstep_ops.NStepState
    env_state: Any
    obs: jnp.ndarray
    stats: base.EpisodeStats
    key: jax.Array
    global_step: jnp.ndarray
    obs_rms: Any = None          # RunningMeanStd when cfg.algo.obs_norm


def _pos_dim(env_name: str) -> int:
    return 2 if ("antmaze" in env_name or "pointmaze" in env_name) else 3


class AgentTD3:
    name = "TD3"

    def __init__(self, env, cfg):
        self.env = env
        self.cfg = cfg
        a = cfg.algo
        self.obs_dim = env.obs_dim
        self.action_dim = env.action_dim
        self.actor = TanhMLPPolicy(self.action_dim)
        self.critic = DistributionalDoubleQ(
            v_min=a.v_min, v_max=a.v_max, num_atoms=a.num_atoms)
        self.actor_tx = base.make_optimizer(a.actor_lr, a.max_grad_norm)
        self.critic_tx = base.make_optimizer(a.critic_lr, a.max_grad_norm)
        self.intrinsic = IntrinsicModule(
            self.obs_dim, kind=cfg.intrinsic.type,
            pos_dim=_pos_dim(cfg.env.name), normalize=cfg.intrinsic.normalize,
            pos_enc=cfg.intrinsic.pos_enc, L=cfg.intrinsic.L,
            warm_up=cfg.intrinsic.warm_up, scale=cfg.intrinsic.scale,
            depth_scale=cfg.intrinsic.depth_scale)
        self._train_iter = jax.jit(self._train_iter_impl, donate_argnums=0)
        self._explore_jit = jax.jit(
            partial(self._explore_steps, random=True), donate_argnums=0,
            static_argnums=2)

    # -- init ----------------------------------------------------------------

    def _init_actor_params(self, key, dummy_obs):
        return self.actor.init(key, dummy_obs)

    def init(self, key) -> TD3State:
        k_actor, k_critic, k_int, k_env, key = jax.random.split(key, 5)
        dummy_obs = jnp.zeros((1, self.obs_dim))
        dummy_act = jnp.zeros((1, self.action_dim))
        actor_params = self._init_actor_params(k_actor, dummy_obs)
        critic_params = self.critic.init(k_critic, dummy_obs, dummy_act)
        env_state, obs = self.env.reset(k_env)
        return TD3State(
            actor_params=actor_params,
            actor_target=jax.tree.map(jnp.copy, actor_params),
            actor_opt=self.actor_tx.init(actor_params),
            critic_params=critic_params,
            critic_target=jax.tree.map(jnp.copy, critic_params),
            critic_opt=self.critic_tx.init(critic_params),
            intrinsic=self.intrinsic.init(k_int),
            replay=flat.FlatReplay.create(int(self.cfg.algo.memory_size),
                                          self.obs_dim, self.action_dim),
            nstep=nstep_ops.NStepState.create(
                self.env.num_envs, self.cfg.algo.nstep, self.obs_dim,
                self.action_dim),
            env_state=env_state, obs=obs,
            stats=base.EpisodeStats.create(self.env.num_envs,
                                           self.cfg.algo.tracker_len),
            key=key, global_step=jnp.asarray(0, jnp.int32),
            obs_rms=(rs.RunningMeanStd.create((self.obs_dim,))
                     if self.cfg.algo.obs_norm else None),
        )

    # -- acting --------------------------------------------------------------

    def _actor_act(self, params, key, obs):
        del key
        return self.actor.apply(params, obs)

    def _norm_obs(self, ts, obs):
        if self.cfg.algo.obs_norm and ts.obs_rms is not None:
            from ddiffpg_tpu.ops import running_stats as rs

            return rs.normalize(ts.obs_rms, obs)
        return obs

    def _policy_action(self, ts, key, obs):
        it = ts.global_step / max(self.env.num_envs, 1)
        return base.explore_action(
            key, lambda k, o: self._actor_act(ts.actor_params, k, o),
            self._norm_obs(ts, obs), self.cfg.algo.noise,
            noise_val=base.noise_std(self.cfg.algo.noise, it))

    # -- exploration ---------------------------------------------------------

    def _env_step(self, ts: TD3State, random: bool):
        key, k_act, k_rand = jax.random.split(ts.key, 3)
        if self.cfg.algo.obs_norm and ts.obs_rms is not None:
            ts = ts._replace(obs_rms=base.update_rms(ts.obs_rms, ts.obs))
        if random:
            action = jax.random.uniform(
                k_rand, (self.env.num_envs, self.action_dim),
                minval=-1.0, maxval=1.0)
        else:
            action = self._policy_action(ts, k_act, ts.obs)

        env_state, next_obs, reward, done, info = self.env.step(
            ts.env_state, action)
        stats = base.update_stats(ts.stats, reward, done)
        if self.cfg.algo.handle_timeout:
            done_b = jnp.logical_xor(done.astype(bool), info["time_outs"])
        else:
            done_b = done.astype(bool)
        r_scaled = reward * self.cfg.algo.reward_scale

        ns, (o0, a0, r_f, nobs_f, dn_f, valid) = nstep_ops.push(
            ts.nstep, ts.obs, action, r_scaled[:, None], done_b[:, None],
            next_obs, self.cfg.algo.gamma)
        added = flat.add(ts.replay, o0, a0, r_f[:, 0], nobs_f, dn_f[:, 0])
        replay = added._replace(
            ptr=jnp.where(valid, added.ptr, ts.replay.ptr),
            size=jnp.where(valid, added.size, ts.replay.size))

        return ts._replace(
            env_state=env_state, obs=next_obs, nstep=ns, replay=replay,
            stats=stats, key=key,
            global_step=ts.global_step + self.env.num_envs)

    def _explore_steps(self, ts, _key_unused, timesteps: int, random: bool):
        for _ in range(timesteps):
            ts = self._env_step(ts, random)
        return ts

    def warmup(self, ts: TD3State) -> TD3State:
        return self._explore_jit(ts, None, int(self.cfg.algo.warm_up))

    # -- updates -------------------------------------------------------------

    def _critic_update(self, ts, key, batch):
        obs, action, _, reward, next_obs, done = batch
        k_int, k_tgt = jax.random.split(key)
        r_int, intrinsic = self.intrinsic.compute_reward(
            ts.intrinsic, obs, next_obs)
        reward = reward + r_int
        # reference normalizes AFTER the intrinsic reward (td3.py:136-141)
        obs = self._norm_obs(ts, obs)
        next_obs = self._norm_obs(ts, next_obs)

        next_actions = base.tgt_policy_action(
            k_tgt, lambda k, o: self._actor_act(ts.actor_target, k, o),
            next_obs, self.cfg.algo.noise)
        a = self.cfg.algo.gamma ** self.cfg.algo.nstep
        loss_fn = base.distributional_critic_loss(
            lambda p, o, ac: self.critic.apply(p, o, ac),
            ts.critic_params, ts.critic_target, self.critic.z_atoms,
            obs, action, reward, next_obs, next_actions, done,
            a, self.cfg.algo.v_min, self.cfg.algo.v_max,
            self.cfg.algo.num_atoms)
        loss, grads = jax.value_and_grad(loss_fn)(ts.critic_params)
        params, opt, gnorm = base.apply_update(
            self.critic_tx, ts.critic_params, ts.critic_opt, grads)
        ts = ts._replace(critic_params=params, critic_opt=opt,
                         intrinsic=intrinsic)
        return ts, loss, gnorm, r_int

    def _actor_update(self, ts, key, obs):
        obs = self._norm_obs(ts, obs)

        def loss_fn(params):
            action = self._actor_act(params, key, obs)
            q = self.critic.apply(ts.critic_params, obs, action,
                                  method=DistributionalDoubleQ.q_min)
            return -q.mean(), jnp.abs(action).mean()

        (loss, mean_a), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.actor_params)
        params, opt, gnorm = base.apply_update(
            self.actor_tx, ts.actor_params, ts.actor_opt, grads)
        return ts._replace(actor_params=params, actor_opt=opt), loss, gnorm, mean_a

    def _update_once(self, ts: TD3State, key):
        k_samp, k_cri, k_act, k_rnd = jax.random.split(key, 4)
        batch, _ = flat.sample(ts.replay, k_samp, self.cfg.algo.batch_size)
        ts, c_loss, c_gnorm, r_int = self._critic_update(ts, k_cri, batch)

        obs, _, _, _, next_obs, _ = batch
        # the reference trains the RND nets on normalized obs when obs_norm
        # is on (the normalize happens before intrinsic.update, td3/sac.py)
        n_obs = self._norm_obs(ts, obs)
        n_next = self._norm_obs(ts, next_obs)
        if self.cfg.intrinsic.type == "noveld":
            intr, d_loss, d_gnorm = self.intrinsic.update(
                ts.intrinsic, jnp.concatenate([n_obs, n_next]))
        else:
            intr, d_loss, d_gnorm = self.intrinsic.update(ts.intrinsic, n_obs)
        ts = ts._replace(intrinsic=intr)

        ts, a_loss, a_gnorm, mean_a = self._actor_update(ts, k_act, obs)

        ts = ts._replace(
            critic_target=base.soft_update(ts.critic_target, ts.critic_params,
                                           self.cfg.algo.tau))
        if not self.cfg.algo.no_tgt_actor:
            ts = ts._replace(
                actor_target=base.soft_update(ts.actor_target,
                                              ts.actor_params,
                                              self.cfg.algo.tau))
        else:
            ts = ts._replace(actor_target=ts.actor_params)
        logs = {"train/critic_loss": c_loss, "train/actor_loss": a_loss,
                "train/critic_grad": c_gnorm, "train/actor_grad": a_gnorm,
                "train/dynamic_loss": d_loss, "train/dynamic_grad": d_gnorm,
                "train/mean_action": mean_a,
                "train/mean_intrinsic": r_int.mean()}
        return ts, logs

    def _train_iter_impl(self, ts: TD3State):
        for _ in range(self.cfg.algo.horizon_len):
            ts = self._env_step(ts, random=False)

        def body(carry, key):
            carry, logs = self._update_once(carry, key)
            return carry, logs

        key, *keys = jax.random.split(ts.key, self.cfg.algo.update_times + 1)
        ts = ts._replace(key=key)
        ts, logs = jax.lax.scan(body, ts, jnp.stack(keys))
        logs = jax.tree.map(jnp.mean, logs)
        logs["train/return"] = ts.stats.return_tracker.mean()
        logs["train/episode_length"] = ts.stats.step_tracker.mean()
        return ts, logs

    def train_iter(self, ts: TD3State, steps: int | None = None):
        del steps  # cadence is state-free for the baselines
        return self._train_iter(ts)

    # -- evaluation ----------------------------------------------------------

    def eval_keys(self):
        return {}

    def eval_actor(self, params, key, obs):
        """Deterministic-policy eval action (no exploration noise)."""
        return self._actor_act(params, key, obs)

    def eval_policy(self, ts):
        """(key, obs) -> action closure over the full train state; applies
        obs normalization when enabled (reference eval path normalizes:
        scripts/ddiffpg_main.py:84-86). Fresh identity per call — prefer
        eval_rollout(env, agent.eval_fn, key, agent.eval_args(ts))."""
        core = getattr(ts, "core", ts)
        return lambda key, obs: self.eval_actor(
            core.actor_params, key, self._norm_obs(core, obs))

    def eval_fn(self, args, key, obs):
        """Stable eval actor (see AgentDDiffPG.eval_fn); subclasses reuse it
        through their `_actor_act` override."""
        params, rms = args
        if rms is not None:
            from ddiffpg_tpu.ops import running_stats as rs

            obs = rs.normalize(rms, obs)
        return self._actor_act(params, key, obs)

    def eval_args(self, ts):
        core = getattr(ts, "core", ts)
        rms = core.obs_rms if self.cfg.algo.obs_norm else None
        return (core.actor_params, rms)
