"""DTW kernel, linkage, and Q-scheduler tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu.modes.linkage import fcluster_distance, linkage_average
from ddiffpg_tpu.modes.q_scheduler import QScheduler
from ddiffpg_tpu.ops.dtw import dtw_batch, dtw_numpy


class TestDTW:
    def test_matches_numpy_dp(self):
        rng = np.random.RandomState(0)
        L = 24
        A = rng.randn(4, L, 2).astype(np.float32)
        B = rng.randn(4, L, 2).astype(np.float32)
        la = np.array([24, 10, 17, 3], np.int32)
        lb = np.array([24, 20, 5, 3], np.int32)
        got = np.asarray(dtw_batch(jnp.asarray(A), jnp.asarray(B),
                                   jnp.asarray(la), jnp.asarray(lb)))
        for k in range(4):
            want = dtw_numpy(A[k, :la[k]].astype(np.float64),
                             B[k, :lb[k]].astype(np.float64))
            np.testing.assert_allclose(got[k], want, rtol=1e-4)

    def test_identical_zero(self):
        x = np.random.RandomState(1).randn(1, 16, 2).astype(np.float32)
        d = dtw_batch(jnp.asarray(x), jnp.asarray(x),
                      jnp.asarray([16]), jnp.asarray([16]))
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-3)


class TestLinkage:
    def test_matches_scipy_heights(self):
        from scipy.cluster.hierarchy import linkage as scipy_linkage
        from scipy.spatial.distance import squareform

        rng = np.random.RandomState(2)
        pts = rng.randn(40, 2)
        D = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        Z_got = linkage_average(D)
        Z_want = scipy_linkage(squareform(D), method="average")
        np.testing.assert_allclose(Z_got[:, 2], Z_want[:, 2], rtol=1e-8)
        np.testing.assert_allclose(Z_got[:, 3], Z_want[:, 3])

    def test_fcluster_matches_scipy(self):
        from scipy.cluster.hierarchy import fcluster, linkage as scipy_linkage
        from scipy.spatial.distance import squareform

        rng = np.random.RandomState(3)
        # two well-separated blobs + noise
        pts = np.concatenate([rng.randn(15, 2), rng.randn(15, 2) + 8])
        D = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        Z = linkage_average(D)
        for thr in (2.0, 5.0, 0.7 * Z[:, 2].max()):
            got = fcluster_distance(Z, len(pts), thr)
            want = fcluster(scipy_linkage(squareform(D), method="average"),
                            t=thr, criterion="distance")
            # same partition up to label permutation
            gmap = {}
            ok = True
            for g, w in zip(got, want):
                if g in gmap:
                    ok &= gmap[g] == w
                gmap[g] = w
            assert ok and len(set(got)) == len(set(want))


class TestQScheduler:
    def test_first_cluster_fresh(self):
        s = QScheduler(max_groups=11)
        plan = s.update_cluster([[1, 2], [3, 4]])
        assert plan.num_groups == 3
        assert plan.src_row[1] == 0 and plan.src_row[2] == 0
        assert plan.fresh_opt[1] and plan.fresh_opt[2]
        assert plan.embedding_src[1] == -1

    def test_inheritance_and_clone(self):
        s = QScheduler(max_groups=11)
        s.update_cluster([[1, 2, 3], [10, 11, 12]])
        # cluster 0 splits into two; both overlap old cluster 1 (=row 1)
        plan = s.update_cluster([[1, 2], [3], [10, 11, 12]])
        # row1: first claim of old row1 -> inherited (no fresh opt)
        assert plan.src_row[1] == 1 and not plan.fresh_opt[1]
        assert plan.embedding_src[1] == 1
        # row2: duplicate claim -> clone with fresh opt, fresh embedding
        # (overlap 1 < overlap 2 of the first claimant)
        assert plan.src_row[2] == 1 and plan.fresh_opt[2]
        assert plan.embedding_src[2] == -1
        # row3: old row2 inherited
        assert plan.src_row[3] == 2 and not plan.fresh_opt[3]

    def test_no_overlap_clones_explore(self):
        s = QScheduler(max_groups=11)
        s.update_cluster([[1, 2]])
        plan = s.update_cluster([[99, 100]])
        assert plan.src_row[1] == 0 and plan.fresh_opt[1]
        assert plan.parent_row[1] == 0


class TestClusterCache:
    def _recluster(self, cm, ids):
        """Run a recluster over 6 slots carrying the given traj ids."""
        rng = np.random.RandomState(int(ids[0]) + 1)
        S, L = 8, 12
        traj_id = np.full(S, -1, np.int64)
        traj_id[: len(ids)] = ids
        length = np.zeros(S, np.int64)
        length[: len(ids)] = L
        success = np.zeros(S, np.int64)
        success[: len(ids)] = 1
        tracks = np.zeros((S, L, 2), np.float32)
        # two well-separated bundles so clustering is non-degenerate
        for k in range(len(ids)):
            base = 0.0 if k % 2 == 0 else 50.0
            tracks[k] = base + np.cumsum(rng.randn(L, 2), 0)
        return cm.recluster(traj_id, length, success, tracks)

    def test_cache_pruned_to_live_ids(self):
        """Regression: traj ids are monotonic, so cache entries keyed by
        retired ids are dead weight — over a 5M-step run the unpruned cache
        leaks millions of entries (reference diffusion_replay.py:194-211
        has the same leak)."""
        from ddiffpg_tpu.modes.cluster import ClusterManager

        cm = ClusterManager(capacity=64, max_modes=4, threshold=25.0)
        sizes = []
        for gen in range(4):
            ids = np.arange(6) + gen * 6      # all-new ids every recluster
            self._recluster(cm, ids)
            live = set(ids)
            for a, b in cm.cache:
                assert a in live and b in live, (a, b, gen)
            sizes.append(len(cm.cache))
        # bounded: each generation holds at most all-pairs over 6 live ids
        # (x2 for symmetric keys), never the cumulative history
        assert max(sizes) <= 6 * 5 * 2


class TestSplitByGoal:
    """algo.split_by_goal: goal-stratified clustering (antmaze-v2 fix)."""

    def _setup(self, n_goal2=4, n_goal1=2, threshold=1e6, max_modes=4,
               split=True):
        from ddiffpg_tpu.modes.cluster import ClusterManager

        rng = np.random.RandomState(0)
        S, L = 12, 16
        n = n_goal2 + n_goal1
        traj_id = np.full(S, -1, np.int64)
        traj_id[:n] = np.arange(n)
        length = np.zeros(S, np.int64)
        length[:n] = L
        success = np.zeros(S, np.int64)
        success[:n_goal2] = 2
        success[n_goal2:n] = 1
        tracks = np.zeros((S, L, 2), np.float32)
        for k in range(n):
            base = 0.0 if k < n_goal2 else 50.0
            tracks[k] = base + 0.1 * np.cumsum(rng.randn(L, 2), 0)
        cm = ClusterManager(capacity=64, max_modes=max_modes,
                            threshold=threshold, split_by_goal=split)
        return cm, cm.recluster(traj_id, length, success, tracks), success

    def test_goals_never_share_a_cluster(self):
        # threshold huge: a global cut would merge everything into ONE
        # cluster; split_by_goal must still keep goal1 and goal2 apart
        cm, res, success = self._setup(threshold=1e6, split=True)
        assert len(res.clusters) == 2
        for cl in res.clusters:
            goals = {success[tid] for tid in cl}  # traj_id == slot here
            assert len(goals) == 1, res.clusters

    def test_global_merge_without_split(self):
        _, res, _ = self._setup(threshold=1e6, split=False)
        assert len(res.clusters) == 1

    def test_collapse_keeps_one_cluster_per_goal(self):
        # threshold tiny: every trajectory its own cluster (6 > max_modes=3)
        # -> with split_by_goal the collapse keeps one cluster PER GOAL
        cm, res, success = self._setup(threshold=1e-6, max_modes=3,
                                       split=True)
        assert len(res.clusters) == 2
        sizes = sorted(len(cl) for cl in res.clusters)
        assert sizes == [2, 4]
        for cl in res.clusters:
            assert len({success[tid] for tid in cl}) == 1

    def test_collapse_all_without_split(self):
        _, res, _ = self._setup(threshold=1e-6, max_modes=3, split=False)
        assert len(res.clusters) == 1


class TestReclusterFrontierProtection:
    def test_unsuccess_cap_spares_protected_slots(self):
        """Regression (antmaze-v2 r6/r7 fdist wobble, RESULTS.md): the
        recluster's random unsuccess-cap eviction must not drop the
        frontier keep-set — it was deterministically destroying the
        closest-to-unreached-goal failures that add()-side protection
        had carefully kept."""
        from ddiffpg_tpu.modes.cluster import ClusterManager

        rng = np.random.RandomState(1)
        S, L = 24, 16
        n_succ, n_fail = 2, 20
        n = n_succ + n_fail
        traj_id = np.full(S, -1, np.int64)
        traj_id[:n] = np.arange(n)
        length = np.zeros(S, np.int64)
        length[:n] = L
        success = np.zeros(S, np.int64)
        success[:n_succ] = 1
        tracks = np.zeros((S, L, 2), np.float32)
        for k in range(n):
            tracks[k] = 0.1 * np.cumsum(rng.randn(L, 2), 0)
        # capacity chosen so cap_u = 12 // 2 = 6 << 20 failures -> heavy
        # random eviction pressure on the unsuccess set
        cm = ClusterManager(capacity=12, max_modes=4, threshold=1e6)
        protected = [5, 9, 13]          # failure slots
        res = cm.recluster(traj_id, length, success, tracks,
                           protect_slots=protected)
        assert len(res.evict_slots) > 0          # pressure was real
        assert not set(protected) & set(res.evict_slots.tolist())
        # protected slots stay in group 0 (the explore group's mask)
        assert res.group_mask[0][protected].all()
