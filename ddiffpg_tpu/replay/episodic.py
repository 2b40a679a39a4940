"""Slot-based episodic trajectory store — the DDiffPG replay.

TPU-native redesign of `DiffusionGoalBuffer` + `DiffusionReplayBuffer`
(`/root/reference/ddiffpg/replay/diffusion_replay.py`,
`simple_replay.py:98-200`). The reference grows flat tensors with torch.cat
and keeps Python trajectory lists; here everything is fixed-shape:

  * S trajectory slots x (L+1) timesteps. obs[s, t] holds the t-th obs, so
    next_obs of transition t is obs[s, t+1] (the TRUE terminal obs is kept,
    unlike the reference which stores the auto-reset obs).
  * per-slot metadata: length, success goal id, monotonically increasing
    traj id, valid flag. Slot allocation = first free slot, else oldest id
    (the reference instead evicts at recluster; host-side recluster refreshes
    the group tables either way).
  * group_mask [G_max, S]: host-computed cluster membership (group 0 =
    everything/explore; group i = cluster_i U unsuccess_cluster_i)
    refreshed at recluster cadence.
  * target_action [G_max, S, L, A]: the per-mode improved-action table
    (reference buf_target_action), remapped on recluster with parent
    indices (update_target_action_dim semantics, simple_replay.py:186-196).
  * sampling is uniform over the transitions of a group, mixing in-flight
    (temp) per-env partial trajectories for group 0 exactly like
    add_temp_data (diffusion_replay.py:282-322): each draw routes to the
    temp store with probability temp_size / (temp_size + group_size).

The per-env Python loop of add_to_buffer (diffusion_replay.py:59-71 — the
reference's main CPU bottleneck) becomes a vectorized scatter keyed by
per-env step counters, fully inside jit.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class EpisodicReplay(NamedTuple):
    # finished-trajectory slots
    obs: jnp.ndarray            # [S, L+1, D]
    action: jnp.ndarray         # [S, L, A]
    reward: jnp.ndarray         # [S, L]
    done: jnp.ndarray           # [S, L] bool  (true termination, XOR timeout)
    length: jnp.ndarray         # [S] int32 (0 = empty)
    success: jnp.ndarray        # [S] int32 goal id (0 = failure)
    traj_id: jnp.ndarray        # [S] int32 (-1 = empty)
    # [S, NG] f32 closest approach to each goal over the episode (lower =
    # deeper toward that goal; FRONTIER_INF = never recorded). Envs without
    # positional goal anchors use NG=1 with a -||pos|| pseudo-distance, which
    # reduces to the old depth-based frontier.
    frontier: jnp.ndarray
    next_id: jnp.ndarray        # [1] int32 (shape-1 so it shards per-device)
    # per-group machinery
    group_mask: jnp.ndarray     # [G, S] bool
    target_action: jnp.ndarray  # [G, S, L, A]
    # in-flight per-env episodes
    tmp_obs: jnp.ndarray        # [E, L+1, D]
    tmp_action: jnp.ndarray     # [E, L, A]
    tmp_reward: jnp.ndarray     # [E, L]
    tmp_done: jnp.ndarray       # [E, L] bool
    tmp_len: jnp.ndarray        # [E] int32 (steps already stored)
    tmp_frontier: jnp.ndarray   # [E, NG] f32 running per-goal min dist

    @staticmethod
    def create(capacity: int, max_len: int, num_envs: int, obs_dim: int,
               action_dim: int, max_groups: int,
               num_goals: int = 1) -> "EpisodicReplay":
        S, L, E, G = capacity, max_len, num_envs, max_groups
        NG = num_goals
        return EpisodicReplay(
            obs=jnp.zeros((S, L + 1, obs_dim)),
            action=jnp.zeros((S, L, action_dim)),
            reward=jnp.zeros((S, L)),
            done=jnp.zeros((S, L), bool),
            length=jnp.zeros((S,), jnp.int32),
            success=jnp.zeros((S,), jnp.int32),
            traj_id=jnp.full((S,), -1, jnp.int32),
            # dtype pinned: a bare python-float fill makes these leaves
            # weak_type, and the first train_iter returns tmp_frontier
            # strong-typed -> the ENTIRE train program recompiles on call 2
            # (the r04 "train-iter 19-122x" bench regression: each extra
            # compile is 400-530 s remote on TPU).
            frontier=jnp.full((S, NG), FRONTIER_INF, jnp.float32),
            next_id=jnp.zeros((1,), jnp.int32),
            group_mask=jnp.zeros((G, S), bool).at[0].set(True),
            target_action=jnp.zeros((G, S, L, action_dim)),
            tmp_obs=jnp.zeros((E, L + 1, obs_dim)),
            tmp_action=jnp.zeros((E, L, action_dim)),
            tmp_reward=jnp.zeros((E, L)),
            tmp_done=jnp.zeros((E, L), bool),
            tmp_len=jnp.zeros((E,), jnp.int32),
            tmp_frontier=jnp.full((E, NG), FRONTIER_INF, jnp.float32),
        )

    @property
    def capacity(self):
        return self.obs.shape[0]

    @property
    def max_len(self):
        return self.action.shape[1]

    @property
    def num_groups(self):
        return self.group_mask.shape[0]


# "never recorded" sentinel for per-goal closest-approach distances
FRONTIER_INF = 1.0e9


def _unreached_goals(buf: EpisodicReplay) -> jnp.ndarray:
    """[NG] bool: goals with no success trajectory on record.

    Falls back to all-True when every goal is reached (late-run frontier
    mining stays harmless) and for NG==1 (single-anchor / pseudo-depth
    envs, where success ids need not align with the anchor)."""
    ng = buf.frontier.shape[1]
    if ng == 1:
        return jnp.ones((1,), bool)
    valid = buf.traj_id >= 0
    reached = jax.vmap(
        lambda g: (valid & (buf.success == g + 1)).any())(jnp.arange(ng))
    un = ~reached
    return jnp.where(un.any(), un, jnp.ones_like(un))


def frontier_scores(buf: EpisodicReplay) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """([S] f32 score, [S] bool candidates). Score = -closest approach to
    the nearest UNREACHED goal (higher = better frontier data). The
    unreached set is recomputed from the buffer every call, so scores never
    go stale as goals get solved — the flaw that let antmaze-v2's solved
    right corridor crowd a ||pos||-depth frontier (RESULTS.md, v2 r5)."""
    cand = (buf.traj_id >= 0) & (buf.success == 0) & \
        (buf.frontier.min(-1) < FRONTIER_INF / 2)
    un = _unreached_goals(buf)
    d = jnp.where(un[None, :], buf.frontier, jnp.inf).min(-1)   # [S]
    score = jnp.where(cand & jnp.isfinite(d), -d, -jnp.inf)
    return score, cand & jnp.isfinite(d)


def frontier_mask(buf: EpisodicReplay, keep: int) -> jnp.ndarray:
    """[S] bool: the `keep` valid UNSUCCESSFUL trajectories that came
    closest to a still-unreached goal (ties may admit a few extra).
    Empty when keep=0."""
    if keep <= 0:
        return jnp.zeros((buf.capacity,), bool)
    score, cand = frontier_scores(buf)
    kth = jnp.sort(score)[::-1][min(keep, buf.capacity) - 1]
    return cand & (score >= kth)


def frontier_dist(buf: EpisodicReplay) -> jnp.ndarray:
    """Scalar: closest any stored failure has come to an unreached goal
    (the explore frontier's progress bar; FRONTIER_INF when no record)."""
    score, cand = frontier_scores(buf)
    return jnp.where(cand.any(), -score.max(), FRONTIER_INF)


def add(buf: EpisodicReplay, obs, action, reward, next_obs, done_bootstrap,
        episode_end, success, goal_dist=None,
        frontier_keep: int = 0) -> EpisodicReplay:
    """Record one vector-env transition; flush finished episodes to slots.

    obs/next_obs [E, D], action [E, A], reward [E], done_bootstrap [E]
    (true termination for TD bootstrapping), episode_end [E] (terminated or
    truncated -> flush), success [E] int32 goal id at this step.

    goal_dist [E, NG] (optional): per-env distance from next_obs to each
    goal anchor; its episode MIN per goal is stored as the trajectory's
    frontier record (envs without anchors pass -||pos|| as [E, 1]).
    frontier_keep > 0 protects the K failures closest to an unreached goal
    from age eviction (see AlgoConfig.frontier_keep).
    """
    E = obs.shape[0]
    t = buf.tmp_len                                   # [E] current step index
    env_idx = jnp.arange(E)

    tmp_obs = buf.tmp_obs.at[env_idx, t].set(obs)
    tmp_obs = tmp_obs.at[env_idx, t + 1].set(next_obs)
    tmp_action = buf.tmp_action.at[env_idx, t].set(action)
    tmp_reward = buf.tmp_reward.at[env_idx, t].set(reward)
    tmp_done = buf.tmp_done.at[env_idx, t].set(done_bootstrap.astype(bool))
    tmp_frontier = buf.tmp_frontier
    if goal_dist is not None:
        tmp_frontier = jnp.minimum(tmp_frontier, goal_dist)
    new_len = t + 1

    # ---- flush finished envs into trajectory slots -------------------------
    finishing = episode_end.astype(bool)
    n_fin = finishing.sum()

    # slot choice: free slots first (traj_id == -1), then oldest FAILED
    # trajectories, then oldest successes. Protecting successes from age
    # eviction matches the reference, which only appends between reclusters
    # and prunes successes exclusively via the per-cluster balanced eviction
    # (diffusion_replay.py:125-158) — age-evicting them here silently killed
    # rare goal modes (antmaze-v2 far goal, RESULTS.md) before a recluster
    # could ever claim them. The +2^28 offset keeps successes ordered among
    # themselves by age (traj ids stay far below 2^28 on any real run).
    # Finishing envs claim pool[0:n_fin]; non-finishing envs are parked on
    # DISTINCT later pool slots where they no-op (write their current
    # content back), so the scatter below never has duplicate indices.
    assert buf.capacity >= 2 * E, "episodic capacity must be >= 2 * num_envs"
    protect = (buf.traj_id >= 0) & (buf.success > 0)
    # the K frontier failures are MORE precious than bulk successes: they
    # are the only data the explore critic has about unreached goals, and
    # an exploit-heavy phase floods the buffer with near-identical
    # successes (antmaze-v2 r6: goal2 banks one every ~50 steps, squeezing
    # unprotected failures below 2E and churning the oldest protected slots
    # — which were the goal1 frontier records). Rank them strictly above,
    # so success flooding evicts old successes before any frontier member.
    # Protection stays an ordering preference, not absolute — the pool
    # below still takes the 2E lowest keys, so a buffer of all-protected
    # slots evicts its oldest lower-tier members rather than deadlocking.
    fmask = (frontier_mask(buf, frontier_keep) if frontier_keep > 0
             else jnp.zeros((buf.capacity,), bool))
    sort_key = jnp.where(buf.traj_id < 0, jnp.int32(-2**30),
                         buf.traj_id
                         + jnp.where(protect, jnp.int32(2**28), 0)
                         + jnp.where(fmask, jnp.int32(2**29), 0))
    pool = jnp.argsort(sort_key)[: 2 * E]              # [2E] candidate slots
    rank_f = jnp.cumsum(finishing) - 1                 # rank among finishers
    rank_nf = jnp.cumsum(~finishing) - 1
    slot = jnp.where(finishing, pool[jnp.clip(rank_f, 0, E - 1)],
                     pool[E + jnp.clip(rank_nf, 0, E - 1)])
    write = finishing

    def scatter_rows(dst, src):
        # dst [S, ...], src [E, ...]; rows where write=False keep dst content
        cur = dst[slot]
        val = jnp.where(write.reshape((-1,) + (1,) * (src.ndim - 1)), src, cur)
        return dst.at[slot].set(val)

    new_ids = jnp.where(write, buf.next_id[0] + rank_f, buf.traj_id[slot])

    obs_s = scatter_rows(buf.obs, tmp_obs)
    act_s = scatter_rows(buf.action, tmp_action)
    rew_s = scatter_rows(buf.reward, tmp_reward)
    don_s = scatter_rows(buf.done, tmp_done)
    len_s = scatter_rows(buf.length, new_len)
    suc_s = scatter_rows(buf.success, success.astype(jnp.int32))
    tid_s = scatter_rows(buf.traj_id, new_ids)
    fro_s = scatter_rows(buf.frontier, tmp_frontier)

    # group 0 ("all trajectories") immediately includes fresh slots; other
    # groups drop any slot that was overwritten
    overwritten = jnp.zeros((buf.capacity,), bool).at[slot].set(write)
    gmask = buf.group_mask & ~overwritten[None, :]
    gmask = gmask.at[0].set(gmask[0] | overwritten)

    # fresh trajectories start with target_action = raw actions in EVERY
    # group row (reference: buf_target_action initialized to actions)
    ta = buf.target_action
    cur_ta = ta[:, slot]                               # [G, E, L, A]
    val_ta = jnp.where(write[None, :, None, None], tmp_action[None], cur_ta)
    ta = ta.at[:, slot].set(val_ta)

    # reset finished envs' temp rows
    zero = lambda x: jnp.where(
        finishing.reshape((-1,) + (1,) * (x.ndim - 1)), jnp.zeros_like(x), x)
    return buf._replace(
        obs=obs_s, action=act_s, reward=rew_s, done=don_s, length=len_s,
        success=suc_s, traj_id=tid_s, frontier=fro_s,
        next_id=buf.next_id + n_fin,
        group_mask=gmask, target_action=ta,
        tmp_obs=zero(tmp_obs), tmp_action=zero(tmp_action),
        tmp_reward=zero(tmp_reward), tmp_done=zero(tmp_done),
        tmp_len=jnp.where(finishing, 0, new_len),
        tmp_frontier=jnp.where(finishing[:, None], FRONTIER_INF,
                               tmp_frontier),
    )


class GroupBatch(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    target_action: jnp.ndarray
    reward: jnp.ndarray
    next_obs: jnp.ndarray
    done: jnp.ndarray
    slot: jnp.ndarray       # [b] trajectory slot of each sample
    step: jnp.ndarray       # [b]
    from_buffer: jnp.ndarray  # [b] bool (False -> in-flight temp sample)


def sample_group(buf: EpisodicReplay, key, group: int, batch: int,
                 mix_temp: bool, success_frac: float = 0.0,
                 frontier_frac: float = 0.0,
                 frontier_keep: int = 0,
                 frontier_frac_near: float = 0.0,
                 frontier_near_dist: float = 0.0) -> GroupBatch:
    """Uniform sample over the group's transitions (+ temp pool if group 0).

    success_frac > 0 (mode groups only) is a DEVIATION from the reference,
    which samples uniformly over cluster_i U unsuccess_cluster_i
    (diffusion_replay.py:254-272): that fraction of the batch is drawn
    from the group's SUCCESS trajectories only. Rationale (RESULTS.md, v2
    far-mode forensics): a rare mode's union batch is dominated by its
    assigned failures, so with a near-inert action-gradient operator the
    actor distills the stall rather than the climb. Falls back to the
    union when the group has no success transitions yet.

    frontier_frac > 0 (explore group only) is the failure-side twin: that
    fraction of the batch is drawn from the `frontier_keep` deepest failed
    trajectories, so the explore critic actually trains on frontier data
    (uniformly it is <1% of the buffer — RESULTS.md v2 seed-42 forensics).
    Falls back to uniform while no frontier trajectories exist.

    frontier_frac_near/frontier_near_dist: when the frontier's best failure
    is within `frontier_near_dist` of an unreached goal, the frontier share
    escalates to `frontier_frac_near`. Rationale (RESULTS.md, v2 r6/r7):
    exploration held a 0.73 m goal-doorstep failure for 165k steps without
    converting it at share 0.25 — when the data is that close, commit the
    explore batch to it. Shape-static: the escalation only moves a traced
    row cutoff, so no recompile when it triggers.
    """
    mask = buf.group_mask[group] & (buf.length > 0)
    lens = jnp.where(mask, buf.length, 0)              # [S]
    cum = jnp.cumsum(lens)
    total_buf = cum[-1]
    total_tmp = buf.tmp_len.sum() if mix_temp else jnp.asarray(0, jnp.int32)
    total = jnp.maximum(total_buf + total_tmp, 1)

    key, k_bias, k_front = jax.random.split(key, 3)
    u = jax.random.randint(key, (batch,), 0, total)
    from_buffer = u < jnp.maximum(total_buf, 1)
    # guard against an entirely-empty buffer: route to temp if buffer empty
    from_buffer = from_buffer & (total_buf > 0)

    # buffer route: invert cumulative lengths
    ub = jnp.clip(u, 0, jnp.maximum(total_buf - 1, 0))
    slot = jnp.searchsorted(cum, ub, side="right").astype(jnp.int32)
    slot = jnp.clip(slot, 0, buf.capacity - 1)
    prev = jnp.where(slot > 0, cum[slot - 1], 0)
    step = (ub - prev).astype(jnp.int32)
    step = jnp.clip(step, 0, buf.max_len - 1)

    if success_frac > 0.0 and group > 0:
        k_rows = int(round(batch * success_frac))
        mask_s = mask & (buf.success > 0)
        lens_s = jnp.where(mask_s, buf.length, 0)
        cum_s = jnp.cumsum(lens_s)
        total_s = cum_s[-1]
        us = jax.random.randint(k_bias, (batch,), 0, jnp.maximum(total_s, 1))
        slot_s = jnp.searchsorted(cum_s, us, side="right").astype(jnp.int32)
        slot_s = jnp.clip(slot_s, 0, buf.capacity - 1)
        prev_s = jnp.where(slot_s > 0, cum_s[slot_s - 1], 0)
        step_s = jnp.clip((us - prev_s).astype(jnp.int32), 0,
                          buf.max_len - 1)
        use_s = (jnp.arange(batch) < k_rows) & (total_s > 0)
        slot = jnp.where(use_s, slot_s, slot)
        step = jnp.where(use_s, step_s, step)
        from_buffer = from_buffer | use_s

    frontier_on = frontier_frac > 0.0 or (
        frontier_frac_near > 0.0 and frontier_near_dist > 0.0)
    if frontier_on and group == 0:
        k_rows = int(round(batch * frontier_frac))
        mask_f = mask & frontier_mask(buf, frontier_keep)
        lens_f = jnp.where(mask_f, buf.length, 0)
        cum_f = jnp.cumsum(lens_f)
        total_f = cum_f[-1]
        uf = jax.random.randint(k_front, (batch,), 0,
                                jnp.maximum(total_f, 1))
        slot_f = jnp.searchsorted(cum_f, uf, side="right").astype(jnp.int32)
        slot_f = jnp.clip(slot_f, 0, buf.capacity - 1)
        prev_f = jnp.where(slot_f > 0, cum_f[slot_f - 1], 0)
        step_f = jnp.clip((uf - prev_f).astype(jnp.int32), 0,
                          buf.max_len - 1)
        # tail rows, so they never collide with a success_frac head segment
        cut = jnp.asarray(batch - k_rows, jnp.int32)
        if frontier_near_dist > 0.0 and frontier_frac_near > frontier_frac:
            k_hi = min(int(round(batch * frontier_frac_near)), batch)
            near = frontier_dist(buf) < frontier_near_dist
            cut = jnp.where(near, batch - k_hi, cut)
        use_f = (jnp.arange(batch) >= cut) & (total_f > 0)
        slot = jnp.where(use_f, slot_f, slot)
        step = jnp.where(use_f, step_f, step)
        from_buffer = from_buffer | use_f

    # temp route
    tcum = jnp.cumsum(buf.tmp_len)
    ut = jnp.clip(u - total_buf, 0, jnp.maximum(total_tmp - 1, 0))
    tenv = jnp.searchsorted(tcum, ut, side="right").astype(jnp.int32)
    tenv = jnp.clip(tenv, 0, buf.tmp_len.shape[0] - 1)
    tprev = jnp.where(tenv > 0, tcum[tenv - 1], 0)
    tstep = jnp.clip((ut - tprev).astype(jnp.int32), 0, buf.max_len - 1)

    def pick(buf_arr, tmp_arr, s_idx, t_idx):
        a = buf_arr[slot, s_idx]
        b = tmp_arr[tenv, t_idx]
        return jnp.where(from_buffer.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)

    obs = pick(buf.obs, buf.tmp_obs, step, tstep)
    nobs = pick(buf.obs, buf.tmp_obs, step + 1, tstep + 1)
    act = pick(buf.action, buf.tmp_action, step, tstep)
    rew = pick(buf.reward, buf.tmp_reward, step, tstep)[:, None]
    don = pick(buf.done, buf.tmp_done, step, tstep).astype(jnp.float32)[:, None]
    tact = jnp.where(from_buffer[:, None],
                     buf.target_action[group, slot, step],
                     buf.tmp_action[tenv, tstep])
    return GroupBatch(obs=obs, action=act, target_action=tact, reward=rew,
                      next_obs=nobs, done=don, slot=slot, step=step,
                      from_buffer=from_buffer)


def write_target_actions(buf: EpisodicReplay, group: int, gb: GroupBatch,
                         new_action) -> EpisodicReplay:
    """Scatter improved actions back into the group's target-action row
    (reference update_target_action, simple_replay.py:198-200); temp-routed
    samples are skipped."""
    cur = buf.target_action[group, gb.slot, gb.step]
    val = jnp.where(gb.from_buffer[:, None], new_action, cur)
    ta = buf.target_action.at[group, gb.slot, gb.step].set(val)
    return buf._replace(target_action=ta)


def set_groups(buf: EpisodicReplay, group_mask, parent_idx) -> EpisodicReplay:
    """Host recluster result -> device tables.

    group_mask: [G, S] bool (row 0 = all valid trajectories).
    parent_idx: [G] int32; for each NEW group row, which OLD target-action
    row to inherit (0 = explore row, -1 = reset to raw actions) — the
    semantics of update_target_action_dim (simple_replay.py:186-196).
    Row 0 always inherits old row 0.
    """
    src = jnp.clip(parent_idx, 0, buf.num_groups - 1)
    inherited = buf.target_action[src]                       # [G, S, L, A]
    raw = jnp.broadcast_to(buf.action[None], inherited.shape)
    ta = jnp.where((parent_idx < 0)[:, None, None, None], raw, inherited)
    return buf._replace(group_mask=group_mask.astype(bool), target_action=ta)
