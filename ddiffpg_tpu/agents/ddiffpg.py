"""AgentDDiffPG — multimodal diffusion policy gradient on TPU.

Reference: `/root/reference/ddiffpg/algo/ddiffpg.py`. Architecture notes:

  * Critics for all groups (explore + up to `max_modes` behavior modes)
    live as ONE stacked parameter pytree with a leading [G_max] axis; an
    update touches row i via indexed gather/scatter, and recluster events
    apply the Q-scheduler plan as a single gather + masked optimizer reset
    (vs. the reference's Python lists of deep-copied torch modules).
  * One training iteration (explore step(s) + update_times update passes
    over all groups) is a single jitted, donated-state XLA program,
    specialized on the current group count (recompiles at most
    `max_modes` times per run, when the cluster count changes).
  * Trajectory clustering runs host-side at eval cadence (modes/cluster.py)
    with the DTW distances computed by the on-device wavefront kernel.
  * The critic consumes RAW observations; only the actor is conditioned on
    (obs ++ embedding) — matching ddiffpg.py:239-265 where `update_critic`
    gets raw obs and the embedding only enters through the target-policy
    actions and the actor distillation batch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu.agents import base
from ddiffpg_tpu.intrinsic import IntrinsicModule, IntrinsicState
from ddiffpg_tpu.models.diffusion import DiffusionPolicy
from ddiffpg_tpu.models.mlp import DistributionalDoubleQ
from ddiffpg_tpu.modes.cluster import ClusterManager
from ddiffpg_tpu.ops import noise as noise_ops
from ddiffpg_tpu.ops import running_stats as rs
from ddiffpg_tpu.ops.embedding import add_embedding, append_embedding
from ddiffpg_tpu.replay import episodic as ep
from ddiffpg_tpu.utils import density


class DDiffPGState(NamedTuple):
    actor_params: Any
    actor_opt: Any
    critics: Any            # stacked [G_max, ...] pytrees
    critic_targets: Any
    critic_opts: Any
    embeddings: jnp.ndarray  # [G_max, E]; row 0 = explore embedding
    intrinsic: IntrinsicState
    replay: ep.EpisodicReplay
    env_state: Any
    obs: jnp.ndarray
    stats: base.EpisodeStats
    key: jax.Array
    global_step: jnp.ndarray
    density_grid: jnp.ndarray
    obs_rms: Any = None          # RunningMeanStd when cfg.algo.obs_norm


def _pos_dim(env_name: str) -> int:
    return 2 if ("antmaze" in env_name or "pointmaze" in env_name) else 3


class AgentDDiffPG:
    name = "DDiffPG"

    def __init__(self, env, cfg):
        self.env = env
        self.cfg = cfg
        a = cfg.algo
        self.obs_dim = env.obs_dim
        self.action_dim = env.action_dim
        self.embed_dim = a.embedding_dim
        self.G_max = a.max_modes + 1

        self.actor = DiffusionPolicy(
            action_dim=self.action_dim,
            diffusion_iter=cfg.diffusion.diffusion_iter)
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

        self.cluster_manager = ClusterManager(
            capacity=int(a.memory_size), max_modes=a.max_modes,
            threshold=a.cluster_threshold,
            use_downsampling=a.use_downsampling,
            traj_dim=_pos_dim(cfg.env.name), seed=cfg.seed,
            split_by_goal=a.split_by_goal)
        self.num_groups = 1              # host-side static group count
        self.num_clusters = 0
        self.last_goal_counts = {}       # goal id -> replay success-traj count
        self.last_plot = None
        self.last_unsuccess_plot = None

        # density / coverage tracking (antmaze only)
        if "antmaze" in cfg.env.name or "pointmaze" in cfg.env.name:
            from ddiffpg_tpu.physics import maze as maze_mod

            maze_name = cfg.env.name.replace("pointmaze", "antmaze")
            self._maze_map = maze_mod.MAZES[maze_name]
            grid, reset, self._num_free = density.create_grid(
                self._maze_map, cfg.env.resolution)
            # leading size-1 axis so the grid shards per-device under DP
            self._density_grid0 = jnp.asarray(grid)[None]
            self._density_reset = jnp.asarray(reset)
        else:
            self._maze_map = None
            self._density_grid0 = jnp.zeros((1, 1, 1), jnp.int32)
            self._density_reset = jnp.zeros((2,), jnp.int32)
            self._num_free = 1

        # frontier anchors: envs with positional goals score exploration
        # failures by closest approach PER GOAL (replay/episodic.py
        # frontier_scores); others fall back to a single -||pos|| pseudo
        # anchor (old depth semantics)
        inner = getattr(env, "env", env)
        gxy = getattr(inner, "goal_xy", None)
        self._goal_xy = None if gxy is None else jnp.asarray(gxy)
        self._frontier_goals = (1 if self._goal_xy is None
                                else int(self._goal_xy.shape[0]))

        if a.obs_norm:
            import warnings

            warnings.warn(
                "algo.obs_norm=true with DDiffPG: acting/eval use normalized"
                " obs but critic/actor updates train on RAW obs (faithful to"
                " the reference, see _norm_obs) — a train/act distribution"
                " mismatch that can silently degrade learning.")

        self._iter_cache = {}
        self._warmup_jit = jax.jit(self._warmup_impl, donate_argnums=0,
                                   static_argnums=1)

    # ------------------------------------------------------------------ init

    def init(self, key) -> DDiffPGState:
        k_actor, k_critic, k_int, k_env, k_emb, key = jax.random.split(key, 6)
        a = self.cfg.algo
        dummy_obs = jnp.zeros((1, self.obs_dim))
        dummy_emb_obs = jnp.zeros((1, self.obs_dim + self.embed_dim))
        dummy_act = jnp.zeros((1, self.action_dim))

        actor_params = self.actor.init(
            k_actor, dummy_act, jnp.zeros((1,)), dummy_emb_obs)
        critic0 = self.critic.init(k_critic, dummy_obs, dummy_act)
        # stacked critics: all rows start as copies of the explore critic
        stack = lambda p: jax.tree.map(
            lambda x: jnp.broadcast_to(x, (self.G_max,) + x.shape).copy(), p)
        critics = stack(critic0)
        critic_opts = jax.vmap(self.critic_tx.init)(critics)

        env_state, obs = self.env.reset(k_env)
        embeddings = jax.random.normal(k_emb, (self.G_max, self.embed_dim))

        return DDiffPGState(
            actor_params=actor_params,
            actor_opt=self.actor_tx.init(actor_params),
            critics=critics,
            critic_targets=jax.tree.map(jnp.copy, critics),
            critic_opts=critic_opts,
            embeddings=embeddings,
            intrinsic=self.intrinsic.init(k_int),
            # slot allocation parks non-finishing envs on distinct slots, so
            # the store needs >= 2 * num_envs slots (reference design point:
            # 2000 trajectories at 256 envs, ddiffpg_algo.yaml:7)
            replay=ep.EpisodicReplay.create(
                max(int(a.memory_size), 2 * self.env.num_envs),
                self.env.max_episode_length,
                self.env.num_envs, self.obs_dim, self.action_dim, self.G_max,
                num_goals=self._frontier_goals),
            env_state=env_state, obs=obs,
            stats=base.EpisodeStats.create(self.env.num_envs, a.tracker_len),
            key=key, global_step=jnp.asarray(0, jnp.int32),
            density_grid=self._density_grid0,
            obs_rms=(rs.RunningMeanStd.create((self.obs_dim,))
                     if a.obs_norm else None),
        )

    # ----------------------------------------------------------- exploration

    def _norm_obs(self, ts, obs):
        """obs normalization for the ACTING path only. The reference
        normalizes inside get_actions (ddiffpg.py:83-84) and updates the rms
        during explore (ddiffpg.py:157) but its update_net trains critics on
        raw obs — we match that. (The reference's own obs_norm branch would
        crash for DDiffPG: it normalizes the embedded obs against an
        obs_dim-shaped rms; here the raw obs is normalized BEFORE the
        embedding is appended.)"""
        if self.cfg.algo.obs_norm and ts.obs_rms is not None:
            return rs.normalize(ts.obs_rms, obs)
        return obs

    def _embed_for_explore(self, key, obs, ts, p):
        a = self.cfg.algo
        if a.exp.mode_embedding and a.use_embedding:
            modes = ts.embeddings[1:]
            num_modes = max(self.num_groups - 1, 0)
        else:
            modes, num_modes = None, 0
        return add_embedding(key, self._norm_obs(ts, obs), ts.embeddings[0],
                             p, modes, num_modes)

    def _env_step(self, ts: DDiffPGState, p, random: bool):
        key, k_emb, k_act, k_noise, k_rand = jax.random.split(ts.key, 5)
        if self.cfg.algo.obs_norm and ts.obs_rms is not None:
            ts = ts._replace(obs_rms=base.update_rms(ts.obs_rms, ts.obs))
        if random:
            action = jax.random.uniform(
                k_rand, (self.env.num_envs, self.action_dim),
                minval=-1.0, maxval=1.0)
        else:
            emb_obs = self._embed_for_explore(k_emb, ts.obs, ts, p)
            action = self.actor.apply(ts.actor_params, k_act, emb_obs,
                                      method=DiffusionPolicy.act)
            nz = self.cfg.algo.noise
            if nz.type == "mixed":
                action = noise_ops.add_mixed_normal_noise(
                    k_noise, action, std_min=nz.std_min, std_max=nz.std_max,
                    out_bounds=(-1, 1))
            else:
                action = noise_ops.add_normal_noise(
                    k_noise, action, nz.std_max, out_bounds=(-1, 1))

        env_state, next_obs, reward, done, info = self.env.step(
            ts.env_state, action)
        stats = base.update_stats(ts.stats, reward, done)
        if self.cfg.algo.handle_timeout:
            done_b = jnp.logical_xor(done.astype(bool), info["time_outs"])
        else:
            done_b = done.astype(bool)

        grid = ts.density_grid
        if self._maze_map is not None:
            grid = grid.at[0].set(density.update(
                grid[0], ts.obs[:, :2], 4.0, self._density_reset,
                len(self._maze_map)))

        if self._goal_xy is not None:
            goal_dist = jnp.linalg.norm(
                next_obs[:, None, :2] - self._goal_xy[None], axis=-1)
        else:
            goal_dist = -jnp.linalg.norm(
                next_obs[:, :_pos_dim(self.cfg.env.name)], axis=-1,
                keepdims=True)
        replay = ep.add(ts.replay, ts.obs, action,
                        reward * self.cfg.algo.reward_scale, next_obs,
                        done_b, done.astype(bool), info["success"],
                        goal_dist=goal_dist,
                        frontier_keep=self.cfg.algo.frontier_keep)

        return ts._replace(
            env_state=env_state, obs=next_obs, replay=replay, stats=stats,
            key=key, global_step=ts.global_step + self.env.num_envs,
            density_grid=grid)

    def _warmup_impl(self, ts, timesteps: int):
        def body(carry, _):
            return self._env_step(carry, 0.0, random=True), None

        ts, _ = jax.lax.scan(body, ts, None, length=timesteps)
        return ts

    def warmup(self, ts: DDiffPGState) -> DDiffPGState:
        return self._warmup_jit(ts, int(self.cfg.algo.warm_up))

    # --------------------------------------------------------------- updates

    def _ref_group_sizes(self, G: int):
        """The REFERENCE's per-group batch split (diffusion_replay.py:259-264):
        batch_size // G per group with the division remainder going to the
        explore group. Used only to reproduce the reference's explore-ratio
        schedule in get_exp_p. The update itself (_update_once) uses a uniform
        batch_size // G for every group so the per-group critic update and
        action gradient stay a single vmap over a [G, b, ...] stack — at most
        G-1 (< max_modes) of the 4096 samples differ from the reference split,
        and keeping the stack uniform avoids a second XLA program instance for
        the explore row (big-program recompiles cost minutes on this target)."""
        B = self.cfg.algo.batch_size
        sizes = [B // G] * G
        sizes[0] += B % G
        return sizes

    def _row(self, tree, i):
        return jax.tree.map(lambda x: x[i], tree)

    def _set_row(self, tree, i, row):
        return jax.tree.map(lambda x, r: x.at[i].set(r), tree, row)

    def _update_once(self, ts: DDiffPGState, key, G: int):
        """One update pass: per-group C51 critic updates + action-gradient
        improvement VMAPPED over the group axis (the reference loops modes
        in Python, algo/ddiffpg.py:231-285), then mode-conditioned actor
        distillation and the RND update. Group batch sizes are uniform
        batch_size // G (the reference gives the division remainder to the
        explore group — at most G-1 extra samples)."""
        a = self.cfg.algo
        b = a.batch_size // G
        A = self.action_dim
        keys = jax.random.split(key, G + 4)
        g_keys, k_tgt, k_emb2, k_loss = keys[:G], keys[G], keys[G + 1], keys[G + 2]

        # --- sample every group; stack to [G, b, ...] -----------------------
        gbs = [ep.sample_group(ts.replay, g_keys[i], i, b, mix_temp=(i == 0),
                               success_frac=a.success_bias,
                               frontier_frac=a.frontier_frac,
                               frontier_keep=a.frontier_keep,
                               frontier_frac_near=a.frontier_frac_near,
                               frontier_near_dist=a.frontier_near_dist)
               for i in range(G)]
        gb = jax.tree.map(lambda *xs: jnp.stack(xs), *gbs)

        flat = lambda x: x.reshape((G * b,) + x.shape[2:])
        r_int, intr = self.intrinsic.compute_reward(
            ts.intrinsic, flat(gb.obs), flat(gb.next_obs))
        ts = ts._replace(intrinsic=intr)
        r_int_g = r_int.reshape(G, b, 1)
        is_explore = (jnp.arange(G) == 0)[:, None, None]
        # explore group trains on intrinsic-only reward (ddiffpg.py:239-246)
        reward = jnp.where(is_explore, r_int_g, gb.reward + r_int_g)

        # --- per-group conditioning embeddings ------------------------------
        if a.use_embedding:
            emb_g = ts.embeddings[:G]
        else:
            emb_g = jnp.zeros((G, self.embed_dim)).at[0].set(ts.embeddings[0])
        explore_flag = jnp.arange(G) == 0

        def embed_group(key_i, obs_i, emb_i, is_exp):
            # mode groups use add_embedding's default p=0.5: a random half
            # of the rows gets the zero embedding (torch_util.py:17-43)
            mask = jax.random.permutation(key_i, jnp.arange(b) < (b // 2))
            rows = jnp.broadcast_to(emb_i, (b, self.embed_dim))
            rows = jnp.where((mask & ~is_exp)[:, None], 0.0, rows)
            return jnp.concatenate([obs_i, rows], axis=-1)

        # two independent random subsets for state / next-state, matching
        # the reference's two separate add_embedding draws (ddiffpg.py:252-253)
        drop_keys = jax.random.split(k_emb2, 2 * G)
        emb_state = jax.vmap(embed_group)(drop_keys[:G], gb.obs, emb_g,
                                          explore_flag)
        emb_next = jax.vmap(embed_group)(drop_keys[G:], gb.next_obs, emb_g,
                                         explore_flag)

        # --- target-policy actions on all groups in one actor call ----------
        next_actions = base.tgt_policy_action(
            k_tgt,
            lambda k, o: self.actor.apply(ts.actor_params, k, o,
                                          method=DiffusionPolicy.act),
            emb_next.reshape(G * b, -1), a.noise).reshape(G, b, A)

        # --- vmapped critic update over the group axis ----------------------
        rows = lambda t: jax.tree.map(lambda x: x[:G], t)
        crit, crit_t, crit_o = (rows(ts.critics), rows(ts.critic_targets),
                                rows(ts.critic_opts))

        # Per-group C51 support: the explore critic's returns are
        # intrinsic-only (nonnegative), so it keeps v_{min,max}_explore even
        # when a dense env maps the MODE critics' support below zero —
        # sharing [-50, 0] collapsed every explore target onto the 0-atom
        # and blinded exploration (RESULTS.md, panda dense r5). The heads
        # are softmax over atoms, so params are support-agnostic and only
        # the projection / expectation need the per-group atoms.
        vmin_g = jnp.full((G,), a.v_min).at[0].set(a.v_min_explore)
        vmax_g = jnp.full((G,), a.v_max).at[0].set(a.v_max_explore)
        unit = jnp.linspace(0.0, 1.0, a.num_atoms)
        z_g = vmin_g[:, None] + (vmax_g - vmin_g)[:, None] * unit[None, :]

        def one_group(cp, ct, co, z, vmin, vmax, obs, act, rew, nobs, nact,
                      done):
            loss_fn = base.distributional_critic_loss(
                lambda p, o, ac: self.critic.apply(p, o, ac),
                cp, ct, z, obs, act, rew, nobs, nact,
                done, a.gamma ** a.nstep, vmin, vmax, a.num_atoms)
            loss, grads = jax.value_and_grad(loss_fn)(cp)
            cp2, co2, gn = base.apply_update(self.critic_tx, cp, co, grads)
            ct2 = base.soft_update(ct, cp2, a.tau)
            return cp2, ct2, co2, loss, gn

        crit, crit_t, crit_o, c_loss, c_gn = jax.vmap(one_group)(
            crit, crit_t, crit_o, z_g, vmin_g, vmax_g, gb.obs, gb.action,
            reward, gb.next_obs, next_actions, gb.done)
        wr = lambda full, new: jax.tree.map(
            lambda x, n: x.at[:G].set(n), full, new)
        ts = ts._replace(critics=wr(ts.critics, crit),
                         critic_targets=wr(ts.critic_targets, crit_t),
                         critic_opts=wr(ts.critic_opts, crit_o))

        # --- action gradient (vmapped) + one scatter writeback --------------
        def ag(cp, z, obs, tact):
            def q_min(o, ac):
                q1, q2 = self.critic.apply(cp, o, ac)
                return jnp.minimum((q1 * z).sum(-1), (q2 * z).sum(-1))
            return base.action_gradient(
                q_min, obs, tact, n_steps=self.cfg.diffusion.update_times,
                lr=self.cfg.diffusion.action_lr, max_grad_norm=a.max_grad_norm)

        new_action = jax.vmap(ag)(crit, z_g, gb.obs, gb.target_action)  # [G, b, A]
        g_idx = jnp.repeat(jnp.arange(G), b)
        slots = gb.slot.reshape(-1)
        steps = gb.step.reshape(-1)
        cur = ts.replay.target_action[g_idx, slots, steps]
        vals = jnp.where(gb.from_buffer.reshape(-1, 1),
                         new_action.reshape(-1, A), cur)
        replay = ts.replay._replace(
            target_action=ts.replay.target_action.at[g_idx, slots,
                                                     steps].set(vals))
        ts = ts._replace(replay=replay)

        # --- actor distillation over all groups -----------------------------
        states = emb_state.reshape(G * b, -1)
        tgt_actions = new_action.reshape(G * b, A)

        def actor_loss_fn(params):
            return self.actor.apply(params, k_loss, states, tgt_actions,
                                    method=DiffusionPolicy.loss)

        a_loss, grads = jax.value_and_grad(actor_loss_fn)(ts.actor_params)
        aparams, aopt, a_gnorm = base.apply_update(
            self.actor_tx, ts.actor_params, ts.actor_opt, grads)
        ts = ts._replace(actor_params=aparams, actor_opt=aopt)

        # --- RND update ------------------------------------------------------
        obs_cat = flat(gb.obs)
        next_cat = flat(gb.next_obs)
        if self.cfg.intrinsic.type == "noveld":
            intr, d_loss, d_gnorm = self.intrinsic.update(
                ts.intrinsic, jnp.concatenate([obs_cat, next_cat]))
        else:
            intr, d_loss, d_gnorm = self.intrinsic.update(ts.intrinsic,
                                                          obs_cat)
        ts = ts._replace(intrinsic=intr)

        # Explore-row decoded Q on ITS OWN atoms (z_g[0]): discriminates the
        # dense-support collapse — under a shared [-50, 0] support this reads
        # <= 0 by construction, while intrinsic-only targets on [0, 5] keep
        # it positive (regression: tests/test_agents.py dense-support test).
        q1e, q2e = self.critic.apply(
            jax.tree.map(lambda x: x[0], crit), gb.obs[0], gb.action[0])
        q_explore = jnp.minimum((q1e * z_g[0]).sum(-1),
                                (q2e * z_g[0]).sum(-1)).mean()

        logs = {
            "train/critic_loss": c_loss.mean(),
            "train/critic_loss_explore": c_loss[0],
            "train/q_explore": q_explore,
            "train/critic_grad": c_gn.mean(),
            "train/actor_loss": a_loss,
            "train/actor_grad": a_gnorm,
            "train/dynamic_loss": d_loss,
            "train/dynamic_grad": d_gnorm,
            "train/mean_action": jnp.abs(tgt_actions).mean(),
            "train/mean_intrinsic": r_int.mean(),
        }
        return ts, logs

    def _train_iter_impl(self, ts: DDiffPGState, p, G: int):
        for _ in range(self.cfg.algo.horizon_len):
            ts = self._env_step(ts, p, random=False)

        def body(carry, key):
            carry, logs = self._update_once(carry, key, G)
            return carry, logs

        key, *keys = jax.random.split(ts.key, self.cfg.algo.update_times + 1)
        ts = ts._replace(key=key)
        ts, logs = jax.lax.scan(body, ts, jnp.stack(keys))
        logs = jax.tree.map(jnp.mean, logs)
        logs["train/return"] = ts.stats.return_tracker.mean()
        logs["train/episode_length"] = ts.stats.step_tracker.mean()
        logs["train/p"] = jnp.asarray(p)
        # G is a static trace constant, but logging it per-row makes group
        # growth visible in metrics.jsonl (its absence blinded the v3/panda
        # run forensics to WHEN the first success cluster formed)
        logs["train/num_groups"] = jnp.asarray(float(G))
        # closest approach to an unreached goal — the explore frontier's
        # progress bar (falls toward 0 as exploration nears the goal;
        # FRONTIER_INF while nothing is recorded)
        logs["train/frontier_dist"] = ep.frontier_dist(ts.replay)
        if self._maze_map is not None:
            # under DP the per-shard grids are pmean-ed: counts become
            # fractional but (>0) still marks any-shard visitation
            g = base.maybe_pmean(ts.density_grid.astype(jnp.float32))
            logs["train/state_coverage"] = density.coverage(
                g[0], self._num_free)
        return ts, logs

    def train_iter(self, ts: DDiffPGState, steps: int | None = None):
        """One jitted train iteration. Pass the host-tracked `steps` counter
        when available: reading `int(ts.global_step)` forces a blocking
        device fetch of the previous iteration's donated state every iter."""
        G = self.num_groups
        if G not in self._iter_cache:
            self._iter_cache[G] = jax.jit(
                partial(self._train_iter_impl, G=G), donate_argnums=0)
        p = self.get_exp_p(int(ts.global_step) if steps is None else steps)
        return self._iter_cache[G](ts, p)

    # ------------------------------------------------------- explore ratio p

    def get_exp_p(self, steps: int) -> float:
        """Reference get_exp_p (ddiffpg.py:112-137)."""
        a = self.cfg.algo
        G = self.num_groups
        explore_n = self._ref_group_sizes(G)[0]
        if a.exp.type == "fixed":
            p = min(a.exp.fix_ratio, 1 - explore_n / a.batch_size)
        elif a.exp.type == "prop":
            p = 1 - explore_n / a.batch_size
        elif a.exp.type == "linear":
            if self.num_clusters == 0:
                p = 0.0
            else:
                if not hasattr(self, "_lin_start"):
                    self._lin_start = steps
                    self._lin_total = max(
                        (a.exp.stop_ratio * self.cfg.max_step - steps)
                        // self.cfg.num_envs, 1)
                it = (steps - self._lin_start) / max(self.cfg.num_envs, 1)
                p = min(it / self._lin_total, 1.0)
        else:
            raise NotImplementedError(a.exp.type)
        if steps >= a.exp.stop_ratio * self.cfg.max_step:
            held = a.exp.hold_until_mode and self.num_clusters == 0
            # multi-goal hold: keep the schedule's mixed explore/exploit p
            # (never force 1.0) until successes exist at enough DISTINCT
            # goals — goal counts refresh host-side at every recluster
            if a.exp.hold_until_goals > 0 and \
                    len(self.last_goal_counts) < a.exp.hold_until_goals:
                held = True
            if not held:
                p = 1.0
        return float(p)

    # ------------------------------------------------------------- recluster

    def update_cluster(self, ts: DDiffPGState) -> DDiffPGState:
        """Host-side: pull trajectory metadata, recluster, apply the plan."""
        traj_id = np.asarray(ts.replay.traj_id)
        length = np.asarray(ts.replay.length)
        success = np.asarray(ts.replay.success)
        pos_dim = self.cluster_manager.traj_dim
        tracks = np.asarray(ts.replay.obs[:, :, :pos_dim])

        keep = self.cfg.algo.frontier_keep
        protect = (np.where(np.asarray(ep.frontier_mask(ts.replay, keep)))[0]
                   if keep > 0 else None)
        res = self.cluster_manager.recluster(traj_id, length, success, tracks,
                                             protect_slots=protect)
        plan = res.plan
        self.num_groups = res.num_groups
        self.num_clusters = res.num_groups - 1
        self.last_goal_counts = res.goal_counts
        self.last_plot = (res.plot_success, res.plot_clusters, res.Z)
        self.last_unsuccess_plot = (
            (res.plot_unsuccess, res.plot_unsuccess_clusters)
            if res.plot_unsuccess else None)

        replay = ts.replay
        # evict slots
        if len(res.evict_slots):
            sl = jnp.asarray(res.evict_slots)
            replay = replay._replace(
                length=replay.length.at[sl].set(0),
                traj_id=replay.traj_id.at[sl].set(-1),
            )
        # group membership + target-action inheritance
        replay = ep.set_groups(replay, jnp.asarray(res.group_mask),
                               jnp.asarray(plan.parent_row))

        # critic rows: gather parents, reset optimizers where fresh.
        # Dense-env caveat: fresh mode rows default to copying the explore
        # row (src_row 0), whose softmax mass is calibrated to the explore
        # support [v_min_explore, v_max_explore]; reinterpreted on the mode
        # support (e.g. [-50, 0]) that init is affinely shifted. Transient by
        # design — the optimizer is reset and the BCE target retrains the
        # head — so we accept it rather than re-project distributions here.
        src = jnp.asarray(plan.src_row)
        gather = lambda t: jax.tree.map(lambda x: x[src], t)
        critics = gather(ts.critics)
        targets = gather(ts.critic_targets)
        opts_gathered = gather(ts.critic_opts)
        fresh_opts = jax.vmap(self.critic_tx.init)(critics)
        fmask = jnp.asarray(plan.fresh_opt)

        def mix(f, g):
            m = fmask.reshape((-1,) + (1,) * (g.ndim - 1)) if g.ndim else fmask
            return jnp.where(m, f, g)

        opts = jax.tree.map(mix, fresh_opts, opts_gathered)

        # embeddings: inherit or fresh random
        key = jax.random.fold_in(ts.key, int(ts.global_step))
        fresh_emb = jax.random.normal(key, ts.embeddings.shape)
        esrc = jnp.asarray(plan.embedding_src)
        inherited = ts.embeddings[jnp.clip(esrc, 0, self.G_max - 1)]
        embeddings = jnp.where((esrc >= 0)[:, None], inherited, fresh_emb)

        return ts._replace(replay=replay, critics=critics,
                           critic_targets=targets, critic_opts=opts,
                           embeddings=embeddings)

    # ------------------------------------------------------------ evaluation

    def eval_actor(self, params, key, obs):
        """Eval policy: zero embedding (ddiffpg_main.py:87-89)."""
        emb_obs = append_embedding(obs, jnp.zeros(self.embed_dim))
        return self.actor.apply(params, key, emb_obs,
                                method=DiffusionPolicy.act)

    def eval_policy(self, ts):
        """(key, obs) -> action closure; normalizes obs when obs_norm.

        NOTE: the returned lambda has a fresh identity every call — using it
        as eval_rollout's static actor_fn retraces the rollout per eval.
        Prefer eval_rollout(env, agent.eval_fn, key, agent.eval_args(ts))."""
        return lambda key, obs: self.eval_actor(
            ts.actor_params, key, self._norm_obs(ts, obs))

    def eval_fn(self, args, key, obs):
        """Stable eval actor for eval_rollout: bound methods hash equal
        across accesses, so the rollout program compiles once per agent."""
        params, rms = args
        if rms is not None:
            obs = rs.normalize(rms, obs)
        emb_obs = append_embedding(obs, jnp.zeros(self.embed_dim))
        return self.actor.apply(params, key, emb_obs,
                                method=DiffusionPolicy.act)

    def eval_args(self, ts):
        """Dynamic pytree consumed by eval_fn (params + optional obs rms)."""
        return (ts.actor_params,
                ts.obs_rms if self.cfg.algo.obs_norm else None)
