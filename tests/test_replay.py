"""Replay buffer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu.replay import flat
from ddiffpg_tpu.replay import episodic as ep

KEY = jax.random.PRNGKey(0)


class TestFlat:
    def test_wraparound(self):
        buf = flat.FlatReplay.create(10, 3, 2)
        obs = jnp.arange(8, dtype=jnp.float32)[:, None].repeat(3, 1)
        act = jnp.zeros((8, 2))
        rew = jnp.ones((8,))
        don = jnp.zeros((8,), bool)
        buf = flat.add(buf, obs, act, rew, obs, don)
        assert int(buf.size) == 8 and int(buf.ptr) == 8
        buf = flat.add(buf, obs + 100, act, rew, obs, don)
        assert int(buf.size) == 10 and int(buf.ptr) == 6
        # rows 8,9 hold first two of second batch; rows 0..5 the rest
        np.testing.assert_allclose(buf.obs[8, 0], 100.0)
        np.testing.assert_allclose(buf.obs[5, 0], 107.0)
        np.testing.assert_allclose(buf.obs[6, 0], 6.0)

    def test_sample_and_writeback(self):
        buf = flat.FlatReplay.create(100, 3, 2)
        obs = jax.random.normal(KEY, (50, 3))
        act = jax.random.normal(KEY, (50, 2))
        buf = flat.add(buf, obs, act, jnp.zeros(50), obs, jnp.zeros(50, bool))
        (o, a, ta, r, no, d), idx = flat.sample(buf, KEY, 16)
        assert o.shape == (16, 3) and int(idx.max()) < 50
        np.testing.assert_allclose(np.asarray(a), np.asarray(ta))  # ta init = a
        buf = flat.update_target_action(buf, idx, jnp.ones((16, 2)) * 7)
        np.testing.assert_allclose(buf.target_action[idx], 7.0)


def _mk(capacity=16, L=5, E=4, D=3, A=2, G=3):
    return ep.EpisodicReplay.create(capacity, L, E, D, A, G)


def _roll(buf, steps, done_at, E=4, D=3, A=2, succ_val=2, depth=None,
          frontier_keep=0):
    """Run `steps` adds; envs in done_at (dict step->list of envs) finish.
    depth: optional per-env depth values passed through to ep.add."""
    for t in range(steps):
        obs = jnp.full((E, D), float(t))
        nobs = jnp.full((E, D), float(t + 1))
        act = jnp.full((E, A), float(t))
        rew = jnp.full((E,), float(t))
        endl = done_at.get(t, [])
        end = jnp.asarray([e in endl for e in range(E)])
        succ = jnp.where(end, succ_val, 0)
        # legacy "depth" convention (higher = deeper) maps onto the
        # goal-directed store as a single -depth pseudo-anchor
        d = None if depth is None else \
            -jnp.asarray(depth, jnp.float32)[:, None]
        buf = ep.add(buf, obs, act, rew, nobs, end, end, succ,
                     goal_dist=d, frontier_keep=frontier_keep)
    return buf


class TestEpisodic:
    def test_flush_on_done(self):
        buf = _mk()
        buf = _roll(buf, 3, {2: [1, 3]})
        # two trajectories stored, length 3
        stored = np.where(np.asarray(buf.length) > 0)[0]
        assert len(stored) == 2
        np.testing.assert_array_equal(np.asarray(buf.length)[stored], [3, 3])
        assert set(np.asarray(buf.traj_id)[stored].tolist()) == {0, 1}
        np.testing.assert_array_equal(np.asarray(buf.success)[stored], [2, 2])
        # temp counters: finished envs reset, others at 3
        np.testing.assert_array_equal(np.asarray(buf.tmp_len), [3, 0, 3, 0])
        # obs sequence intact: obs[slot, t] = t, terminal obs = 3
        s = stored[0]
        np.testing.assert_allclose(np.asarray(buf.obs)[s, :4, 0], [0, 1, 2, 3])
        # group 0 contains the new slots
        assert bool(np.asarray(buf.group_mask)[0][stored].all())

    def test_sample_group0_mixes_temp(self):
        buf = _mk()
        buf = _roll(buf, 3, {1: [0]})
        gb = ep.sample_group(buf, KEY, 0, 64, mix_temp=True)
        frac_buf = float(gb.from_buffer.mean())
        # 2 stored transitions vs 3*3+1 temp -> buffer fraction ~2/12
        assert 0.02 < frac_buf < 0.45
        assert bool(jnp.all(jnp.isfinite(gb.obs)))
        # next_obs = obs + 1 everywhere (by construction)
        np.testing.assert_allclose(np.asarray(gb.next_obs - gb.obs), 1.0)

    def test_target_action_roundtrip(self):
        buf = _mk()
        buf = _roll(buf, 4, {2: [0, 1, 2, 3]})
        gb = ep.sample_group(buf, KEY, 1, 8, mix_temp=False)
        # group 1 empty -> give it all slots first
        gm = np.array(buf.group_mask)
        gm[1] = np.asarray(buf.length) > 0
        buf = buf._replace(group_mask=jnp.asarray(gm))
        gb = ep.sample_group(buf, jax.random.PRNGKey(1), 1, 8, mix_temp=False)
        assert bool(gb.from_buffer.all())
        new_a = jnp.full((8, 2), 9.0)
        buf = ep.write_target_actions(buf, 1, gb, new_a)
        got = buf.target_action[1, gb.slot, gb.step]
        np.testing.assert_allclose(np.asarray(got), 9.0)
        # other group rows untouched
        got0 = buf.target_action[0, gb.slot, gb.step]
        assert not np.allclose(np.asarray(got0), 9.0)

    def test_set_groups_parent_remap(self):
        buf = _mk()
        buf = _roll(buf, 4, {2: [0, 1, 2, 3]})
        # write distinctive values into group-0 row
        gm0 = buf.group_mask
        ta = buf.target_action.at[0].set(5.0)
        buf = buf._replace(target_action=ta)
        S = buf.capacity
        new_mask = jnp.zeros((3, S), bool).at[0].set(buf.length > 0)
        new_mask = new_mask.at[1].set(buf.length > 0)
        parent = jnp.asarray([0, 0, -1])  # grp1 inherits explore, grp2 raw
        buf = ep.set_groups(buf, new_mask, parent)
        np.testing.assert_allclose(np.asarray(buf.target_action[1]), 5.0)
        # grp2 = raw actions: stored action value at step t is t (len 3)
        stored = np.where(np.asarray(buf.length) > 0)[0]
        np.testing.assert_allclose(
            np.asarray(buf.target_action[2, stored[0], :3, 0]), [0, 1, 2])

    def test_eviction_oldest(self):
        buf = _mk(capacity=8, E=4)
        # fill all 8 slots (2 rounds of 4 finishing), then 4 more
        buf = _roll(buf, 2, {0: [0, 1, 2, 3], 1: [0, 1, 2, 3]})
        assert int((buf.length > 0).sum()) == 8
        first_ids = np.sort(np.asarray(buf.traj_id))
        buf = _roll(buf, 1, {0: [0, 1, 2, 3]})
        ids = np.sort(np.asarray(buf.traj_id))
        # oldest 4 (ids 0..3) evicted, 8..11 added
        assert ids.min() == 4 and ids.max() == 11

    def test_eviction_protects_successes(self):
        """Regression (antmaze-v2 far-goal forensics, RESULTS.md): rare
        SUCCESS trajectories must not age out before failures — the
        reference only prunes successes via the recluster balanced
        eviction, never by arrival order."""
        buf = _mk(capacity=8, E=4)
        # round 1: 4 OLD successes (ids 0..3)
        buf = _roll(buf, 1, {0: [0, 1, 2, 3]}, succ_val=1)
        # round 2: 4 newer failures (ids 4..7) -> buffer full
        buf = _roll(buf, 1, {0: [0, 1, 2, 3]}, succ_val=0)
        assert int((buf.length > 0).sum()) == 8
        # round 3: 4 more failures (ids 8..11) must evict the FAILURES
        # (ids 4..7), keeping the older successes (ids 0..3)
        buf = _roll(buf, 1, {0: [0, 1, 2, 3]}, succ_val=0)
        ids = set(np.asarray(buf.traj_id).tolist())
        assert {0, 1, 2, 3} <= ids, ids
        assert ids & {4, 5, 6, 7} == set(), ids
        succ = np.asarray(buf.success)
        tid = np.asarray(buf.traj_id)
        assert all(succ[tid == i] == 1 for i in range(4))

    def test_eviction_success_oldest_when_all_success(self):
        """When every stored trajectory is a success, eviction falls back
        to oldest-first among successes."""
        buf = _mk(capacity=8, E=4)
        buf = _roll(buf, 2, {0: [0, 1, 2, 3], 1: [0, 1, 2, 3]}, succ_val=2)
        buf = _roll(buf, 1, {0: [0, 1, 2, 3]}, succ_val=2)
        ids = np.sort(np.asarray(buf.traj_id))
        assert ids.min() == 4 and ids.max() == 11


class TestSuccessBias:
    def test_success_frac_prefers_success_slots(self):
        buf = _mk(capacity=16)
        # 2 success trajectories (ids 0,1) then 2 failures (succ_val=0)
        buf = _roll(buf, 3, {2: [1, 3]}, succ_val=2)
        buf = _roll(buf, 3, {2: [0, 2]}, succ_val=0)
        # put all stored slots into group 1
        gm = np.array(buf.group_mask)
        gm[1] = np.asarray(buf.length) > 0
        buf = buf._replace(group_mask=jnp.asarray(gm))
        succ_slots = set(np.where(np.asarray(buf.success) > 0)[0].tolist())
        assert len(succ_slots) == 2

        gb = ep.sample_group(buf, KEY, 1, 256, mix_temp=False,
                             success_frac=0.5)
        in_succ = np.isin(np.asarray(gb.slot), list(succ_slots))
        # first half forced to success slots; second half uniform over the
        # union (2 of 4 trajs are successes -> ~50%)
        assert in_succ[:128].all()
        assert 0.25 < in_succ[128:].mean() < 0.75
        assert bool(gb.from_buffer.all())

    def test_success_frac_empty_pool_falls_back(self):
        buf = _mk(capacity=16)
        buf = _roll(buf, 3, {2: [0, 1]}, succ_val=0)   # failures only
        gm = np.array(buf.group_mask)
        gm[1] = np.asarray(buf.length) > 0
        buf = buf._replace(group_mask=jnp.asarray(gm))
        gb = ep.sample_group(buf, KEY, 1, 64, mix_temp=False,
                             success_frac=0.5)
        # no success transitions: all rows route through the union sample
        assert bool(jnp.all(jnp.isfinite(gb.obs)))
        assert set(np.asarray(gb.slot).tolist()) <= set(
            np.where(np.asarray(buf.length) > 0)[0].tolist())


class TestFrontier:
    def test_frontier_score_tracked_and_reset(self):
        buf = _mk()
        # env depths constant per env: [1, 7, 3, 2]; env 1 finishes at t=2
        buf = _roll(buf, 3, {2: [1]}, succ_val=0, depth=[1.0, 7.0, 3.0, 2.0])
        stored = np.where(np.asarray(buf.length) > 0)[0]
        assert len(stored) == 1
        np.testing.assert_allclose(np.asarray(buf.frontier)[stored],
                                   [[-7.0]])
        # finished env's running min reset, others still carry theirs
        np.testing.assert_allclose(
            np.asarray(buf.tmp_frontier),
            [[-1.0], [ep.FRONTIER_INF], [-3.0], [-2.0]])

    def test_frontier_mask_topk_failures_only(self):
        buf = _mk(capacity=16)
        # 4 failures with depths 1,7,3,2 (each env finishes once)
        buf = _roll(buf, 1, {0: [0, 1, 2, 3]}, succ_val=0,
                    depth=[1.0, 7.0, 3.0, 2.0])
        # 1 success with huge depth must NOT enter the frontier set
        buf = _roll(buf, 1, {0: [0]}, succ_val=1, depth=[9.0, 0, 0, 0])
        m = np.asarray(ep.frontier_mask(buf, 2))
        picked = np.asarray(buf.frontier)[m][:, 0]
        assert sorted(picked.tolist()) == [-7.0, -3.0]
        assert np.asarray(buf.success)[m].max() == 0

    def test_eviction_protects_frontier(self):
        buf = _mk(capacity=8, E=4)
        # round 1: 4 OLD failures, env depths 9,8,0,0 -> two deep ones
        buf = _roll(buf, 1, {0: [0, 1, 2, 3]}, succ_val=0,
                    depth=[9.0, 8.0, 0.0, 0.0], frontier_keep=2)
        deep_ids = {0, 1}
        # round 2: 4 newer shallow failures -> buffer full
        buf = _roll(buf, 1, {0: [0, 1, 2, 3]}, succ_val=0,
                    depth=[0.0] * 4, frontier_keep=2)
        # round 3: 4 more shallow failures must evict the SHALLOW old ones
        buf = _roll(buf, 1, {0: [0, 1, 2, 3]}, succ_val=0,
                    depth=[0.0] * 4, frontier_keep=2)
        ids = set(np.asarray(buf.traj_id).tolist())
        assert deep_ids <= ids, ids
        # the two shallow round-1 trajs (ids 2,3) are gone
        assert ids & {2, 3} == set(), ids

    def test_frontier_frac_biases_group0(self):
        buf = _mk(capacity=16)
        # 2 deep failures then 2 shallow failures
        buf = _roll(buf, 3, {2: [1, 3]}, succ_val=0,
                    depth=[0.0, 5.0, 0.0, 5.0])
        buf = _roll(buf, 3, {2: [0, 2]}, succ_val=0,
                    depth=[0.1, 0.0, 0.1, 0.0])
        deep_slots = set(
            np.where(np.asarray(buf.frontier)[:, 0] <= -5.0)[0].tolist())
        assert len(deep_slots) == 2
        gb = ep.sample_group(buf, KEY, 0, 256, mix_temp=False,
                             frontier_frac=0.5, frontier_keep=2)
        in_deep = np.isin(np.asarray(gb.slot), list(deep_slots))
        # tail half forced to frontier slots; head half uniform
        assert in_deep[128:].all()
        assert 0.25 < in_deep[:128].mean() < 0.75

    def test_frontier_frac_empty_pool_falls_back(self):
        buf = _mk(capacity=16)
        buf = _roll(buf, 3, {2: [0, 1]}, succ_val=0)   # no depth tracked
        gb = ep.sample_group(buf, KEY, 0, 64, mix_temp=False,
                             frontier_frac=0.5, frontier_keep=4)
        assert bool(jnp.all(jnp.isfinite(gb.obs)))
        assert set(np.asarray(gb.slot).tolist()) <= set(
            np.where(np.asarray(buf.length) > 0)[0].tolist())


class TestGoalDirectedFrontier:
    """The round-4 antmaze-v2 lesson (RESULTS.md): a ||pos||-depth frontier
    saturates on the solved corridor. The frontier must rank failures by
    closest approach to UNREACHED goals, recomputed as goals get solved."""

    def _fill(self, succ_goal2=True):
        E = 4
        buf = ep.EpisodicReplay.create(16, 5, E, 3, 2, 3, num_goals=2)
        obs = jnp.zeros((E, 3))
        act = jnp.zeros((E, 2))
        rew = jnp.zeros((E,))
        end = jnp.ones((E,), bool)
        # env0: deep toward goal2 (dist 1.0) but far from goal1 (12)
        # env1: modest progress toward goal1 (dist 6), far from goal2 (10)
        # env2: best goal1 approach (dist 4), far from goal2 (11)
        # env3: a SUCCESS at goal2 (dist 0), establishing goal2 as reached
        gd = jnp.asarray([[12.0, 1.0], [6.0, 10.0],
                          [4.0, 11.0], [13.0, 0.0]])
        succ = jnp.asarray([0, 0, 0, 2 if succ_goal2 else 0], jnp.int32)
        return ep.add(buf, obs, act, rew, obs, end, end, succ, goal_dist=gd,
                      frontier_keep=2)

    def test_mask_targets_unreached_goal(self):
        buf = self._fill(succ_goal2=True)
        m = np.asarray(ep.frontier_mask(buf, 2))
        picked = np.asarray(buf.frontier)[m]
        # goal2 is reached -> ranking is by goal1 distance: envs 2 (4m)
        # and 1 (6m) win; the goal2-hugging failure (env0) is OUT even
        # though its closest approach anywhere (1.0) beats both
        assert sorted(picked[:, 0].tolist()) == [4.0, 6.0]
        assert float(ep.frontier_dist(buf)) == 4.0

    def test_mask_spans_all_goals_before_any_success(self):
        buf = self._fill(succ_goal2=False)
        m = np.asarray(ep.frontier_mask(buf, 2))
        picked = np.asarray(buf.frontier)[m]
        # nothing reached -> min over both goals: env0 (1.0) and env3 (0.0)
        assert sorted(picked.min(-1).tolist()) == [0.0, 1.0]
        assert float(ep.frontier_dist(buf)) == 0.0

    def test_frontier_frac_near_escalates_share(self):
        """Doorstep escalation (RESULTS.md v2 r6/r7): within
        frontier_near_dist of an unreached goal the explore batch's
        frontier share jumps to frontier_frac_near — via a traced row
        cutoff, so both regimes run in the same compiled program."""
        buf = self._fill(succ_goal2=True)           # frontier_dist == 4.0
        fslots = set(np.where(
            np.isin(np.asarray(buf.frontier)[:, 0], [4.0, 6.0]))[0].tolist())
        kw = dict(mix_temp=False, frontier_frac=0.25, frontier_keep=2,
                  frontier_frac_near=0.75)
        # frontier 4.0 m NOT within 2.0 -> base share: tail quarter forced
        gb = ep.sample_group(buf, KEY, 0, 256, frontier_near_dist=2.0, **kw)
        in_f = np.isin(np.asarray(gb.slot), list(fslots))
        assert in_f[192:].all()
        assert not in_f[64:192].all()               # head stays uniform
        # frontier 4.0 m within 5.0 -> escalated: tail three quarters forced
        gb = ep.sample_group(buf, KEY, 0, 256, frontier_near_dist=5.0, **kw)
        in_f = np.isin(np.asarray(gb.slot), list(fslots))
        assert in_f[64:].all()

    def test_frontier_outranks_success_flooding(self):
        """Exploit phases flood the buffer with successes; the frontier
        failures must outrank OLD successes in eviction order or the only
        unreached-goal data churns away (antmaze-v2 r6 wobble)."""
        E = 4
        buf = ep.EpisodicReplay.create(8, 5, E, 3, 2, 3, num_goals=1)
        obs = jnp.zeros((E, 3)); act = jnp.zeros((E, 2))
        rew = jnp.zeros((E,)); end = jnp.ones((E,), bool)
        # round 1: env0 = the frontier failure (closest approach 2.0),
        # envs 1-3 = successes
        gd = jnp.asarray([[2.0], [50.0], [50.0], [50.0]])
        succ = jnp.asarray([0, 1, 1, 1], jnp.int32)
        buf = ep.add(buf, obs, act, rew, obs, end, end, succ, goal_dist=gd,
                     frontier_keep=1)
        # rounds 2-3: 8 more successes -> way past capacity
        gd2 = jnp.full((E, 1), 50.0)
        succ2 = jnp.ones((E,), jnp.int32)
        for _ in range(2):
            buf = ep.add(buf, obs, act, rew, obs, end, end, succ2,
                         goal_dist=gd2, frontier_keep=1)
        m = np.asarray(ep.frontier_mask(buf, 1))
        assert m.sum() == 1
        assert float(np.asarray(buf.frontier)[m][0, 0]) == 2.0
        # the frontier failure (traj id 0, the OLDEST slot) survived
        assert 0 in set(np.asarray(buf.traj_id).tolist())
        assert float(ep.frontier_dist(buf)) == 2.0
