"""Host-side clustering orchestrator (runs at eval cadence, off hot path).

Mirrors `DiffusionGoalBuffer.update_cluster / cluster / unsuccess_cluster`
(`/root/reference/ddiffpg/replay/diffusion_replay.py:116-247,334-381`):

  1. pairwise DTW over successful trajectories' xy tracks (distances cached
     across reclusters by trajectory-id pair, diffusion_replay.py:194-211;
     the DTW itself runs batched on device — ops/dtw.py);
  2. average-linkage clustering cut at `threshold` or 0.7*max height;
     more than `max_modes` clusters collapse to a single cluster
     (diffusion_replay.py:120-123);
  3. per-cluster balanced eviction to capacity // (2 * n_clusters);
  4. unsuccessful trajectories assigned to the nearest cluster by mean DTW
     to <=3 sampled members, then likewise evicted.

Outputs a device-ready plan: group membership masks, slots to free, and the
Q-scheduler plan for the stacked critics.
"""

from __future__ import annotations

import random as pyrandom
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ddiffpg_tpu.modes.linkage import fcluster_distance, linkage_average
from ddiffpg_tpu.modes.q_scheduler import QScheduler, SchedulerPlan


@dataclass
class ClusterResult:
    num_groups: int
    goal_counts: Dict[int, int]     # replay success-traj count per goal id
    group_mask: np.ndarray          # [G_max, S] bool
    evict_slots: np.ndarray         # [n] slot indices to free
    plan: SchedulerPlan
    clusters: List[List[int]]       # success traj ids per cluster
    unsuccess_clusters: List[List[int]]
    Z: Optional[np.ndarray]         # linkage matrix for dendrograms
    plot_success: list              # xy arrays of success trajs
    plot_clusters: list             # per-cluster indices into plot_success
    plot_unsuccess: list            # xy arrays of unsuccessful trajs
    plot_unsuccess_clusters: list   # per-cluster indices into plot_unsuccess


class ClusterManager:
    def __init__(self, capacity: int, max_modes: int = 10,
                 threshold: Optional[float] = None,
                 use_downsampling: bool = False, traj_dim: int = 2,
                 seed: int = 0, dtw_max_len: int = 512,
                 split_by_goal: bool = False):
        self.capacity = capacity
        self.max_modes = max_modes
        self.threshold = threshold
        self.use_downsampling = use_downsampling
        self.traj_dim = traj_dim
        self.dtw_max_len = dtw_max_len
        # Opt-in deviation from the reference's pure-DTW clustering
        # (diffusion_replay.py:116-123): never place successes that reached
        # DIFFERENT goals in the same cluster, and never collapse across
        # goals. On multi-goal mazes the dominant goal's trajectory mass
        # otherwise absorbs or evicts the rare goal's mode (antmaze-v2
        # forensics, RESULTS.md: goal1 cluster gone by 3.58M steps).
        self.split_by_goal = split_by_goal
        self.cache: Dict[Tuple[int, int], float] = {}
        self.scheduler = QScheduler(max_groups=max_modes + 1)
        self.rng = pyrandom.Random(seed)

    # -- distance machinery --------------------------------------------------

    def _tracks(self, ids, tracks, lengths, target_len=None):
        out = []
        for i in ids:
            tr = tracks[i][: lengths[i]]
            if target_len is not None:
                idx = np.linspace(0, len(tr) - 1, int(target_len)).astype(int)
                tr = tr[idx]
            elif len(tr) > self.dtw_max_len:
                idx = np.linspace(0, len(tr) - 1, self.dtw_max_len).astype(int)
                tr = tr[idx]
            out.append(np.asarray(tr, np.float64))
        return out

    # pairs per device launch. A full-capacity recluster computes
    # ~new_trajs x capacity fresh pairs (~10^5); at 256-pair chunks that is
    # hundreds of dispatches, and on a remote-tunnel backend the ~100 ms
    # launch latency dominates the recluster (~75 s/recluster measured).
    # 2048-pair chunks cut it ~8x at one extra one-time compile per length
    # bucket; the wavefront state is O(chunk x L) so memory stays small.
    DTW_CHUNK = 2048

    def _dtw_many(self, pairs, tr_a, tr_b):
        """Compute DTW for a list of (key, a_idx, b_idx) via the device
        kernel in fixed-shape, length-bucketed chunks ([DTW_CHUNK, L, D],
        L in {64,128,256,512}) so at most a handful of kernel shapes ever
        compile — pair counts vary at every recluster and
        shape-polymorphic calls would recompile the wavefront scan each
        time (minutes on a remote-compile backend)."""
        if not pairs:
            return
        D = tr_a[next(iter(tr_a))].shape[-1] if isinstance(tr_a, dict) \
            else tr_a[0].shape[-1]
        C = self.DTW_CHUNK
        # bucket by length so short trajectories don't pay the full-length
        # wavefront (bounded set of shapes -> bounded compiles)
        buckets = {}
        for p in pairs:
            ln = max(len(tr_a[p[1]]), len(tr_b[p[2]]), 2)
            L = 64
            while L < ln:
                L *= 2
            L = min(L, self.dtw_max_len)
            buckets.setdefault(L, []).append(p)
        for L, bpairs in buckets.items():
            self._dtw_bucket(bpairs, tr_a, tr_b, L, D, C)

    def _dtw_bucket(self, pairs, tr_a, tr_b, L, D, C):
        import jax.numpy as jnp

        from ddiffpg_tpu.ops.dtw import dtw_batch_gather

        # pad each REFERENCED trajectory ONCE into a device-resident stack
        # and ship only index vectors per chunk: pairs materialized on the
        # host are ~8 KB each (two padded tracks), and through a remote
        # device tunnel the transfer — GBs for a full distance-matrix
        # rebuild — dominates recluster time. Stacks are rounded up to
        # multiples of 256 rows so the jitted gather kernel sees a bounded
        # set of shapes (shape-polymorphic calls recompile for minutes on
        # a remote-compile backend).
        def stack(side, tr):
            ids = sorted({p[side] for p in pairs})
            pos = {i: n for n, i in enumerate(ids)}
            # TWO fixed row counts per L bucket (256 for small calls,
            # replay capacity rounded up to 256 for full rebuilds) so the
            # gather kernel compiles for a bounded shape set — variable
            # multiples of 256 would give dozens of distinct shapes over a
            # run, each a minutes-long remote compile landing mid-training.
            # A single capacity-sized shape is worse: the stacks are
            # uploaded per CALL, and small calls (unsuccess assignment,
            # a handful of pairs) would ship capacity*L*D*4B (~17 MB at
            # 2048x512x2) through the remote tunnel every time.
            if len(ids) <= 256:
                n_pad = 256
            else:
                n_pad = max(-(-self.capacity // 256) * 256,
                            -(-len(ids) // 256) * 256)
            S = np.zeros((n_pad, L, D), np.float32)
            ln = np.ones(n_pad, np.int32)
            for i in ids:
                t = tr[i]
                S[pos[i], : len(t)] = t
                ln[pos[i]] = len(t)
            return jnp.asarray(S), jnp.asarray(ln), pos

        Sa, la_u, pos_a = stack(1, tr_a)
        Sb, lb_u, pos_b = stack(2, tr_b)
        ia_all = np.fromiter((pos_a[p[1]] for p in pairs), np.int32,
                             len(pairs))
        ib_all = np.fromiter((pos_b[p[2]] for p in pairs), np.int32,
                             len(pairs))

        # dispatch a BOUNDED window of chunks ahead so device launches
        # overlap host work without queueing unbounded device memory
        WINDOW = 8

        def resolve(chunk, dev):
            d = np.asarray(dev)
            for k, (key, _, _) in enumerate(chunk):
                self.cache[key] = float(d[k])
                self.cache[(key[1], key[0])] = float(d[k])

        pending = []
        for c0 in range(0, len(pairs), C):
            chunk = pairs[c0: c0 + C]
            ia = np.zeros(C, np.int32)
            ib = np.zeros(C, np.int32)
            ia[: len(chunk)] = ia_all[c0: c0 + C]
            ib[: len(chunk)] = ib_all[c0: c0 + C]
            pending.append((chunk, dtw_batch_gather(
                Sa, Sb, la_u, lb_u, jnp.asarray(ia), jnp.asarray(ib))))
            if len(pending) >= WINDOW:
                resolve(*pending.pop(0))
        for chunk, dev in pending:
            resolve(chunk, dev)

    # -- main entry ----------------------------------------------------------

    def recluster(self, traj_id, length, success, tracks,
                  protect_slots=None) -> ClusterResult:
        """traj_id [S] (-1 empty), length [S], success [S] (goal id),
        tracks [S, L+1, traj_dim] xy(z) channels of the stored obs.

        protect_slots: optional iterable of slot indices the balanced
        evictions must not drop (the frontier keep-set — the recluster's
        RANDOM unsuccess-cap sampling was deterministically destroying the
        closest-to-goal1 failures on antmaze-v2, RESULTS.md r6/r7 wobble).
        """
        S = len(traj_id)
        G = self.max_modes + 1
        protect = set(int(s) for s in protect_slots) \
            if protect_slots is not None else set()
        valid = (traj_id >= 0) & (length > 0)
        succ_slots = np.where(valid & (success > 0))[0]
        fail_slots = np.where(valid & (success == 0))[0]
        sid = {s: int(traj_id[s]) for s in np.where(valid)[0]}

        target_len = None
        if self.use_downsampling and len(succ_slots):
            target_len = max(2, int(np.mean(length[succ_slots])))
        tr = {int(s): t for s, t in zip(
            np.where(valid)[0],
            self._tracks(np.where(valid)[0], tracks, length, target_len))}

        # ---- pairwise DTW on successes, cached by id pair ------------------
        n = len(succ_slots)
        clusters_slots: List[List[int]] = []
        Z = None
        plot_success, plot_clusters = [], []
        if n > 1:
            pairs = []
            for a in range(n):
                for b in range(a + 1, n):
                    key = (sid[succ_slots[a]], sid[succ_slots[b]])
                    if key not in self.cache:
                        pairs.append((key, int(succ_slots[a]),
                                      int(succ_slots[b])))
            self._dtw_many(pairs, tr, tr)
            D = np.zeros((n, n))
            for a in range(n):
                for b in range(a + 1, n):
                    d = self.cache[(sid[succ_slots[a]], sid[succ_slots[b]])]
                    D[a, b] = D[b, a] = d
            Z = linkage_average(D)
            thr = self.threshold if self.threshold is not None else \
                0.7 * Z[:, 2].max()
            if self.split_by_goal:
                # cluster WITHIN each reached-goal id; Z stays the global
                # linkage (dendrogram plot only)
                goal_of = np.asarray([success[s] for s in succ_slots])
                labels = np.zeros(n, int)
                base = 0
                for g in np.unique(goal_of):
                    idx = np.where(goal_of == g)[0]
                    if len(idx) == 1:
                        labels[idx] = base + 1
                        base += 1
                        continue
                    Zg = linkage_average(D[np.ix_(idx, idx)])
                    thr_g = self.threshold if self.threshold is not None \
                        else 0.7 * max(Zg[:, 2].max(), 1e-9)
                    lg = fcluster_distance(Zg, len(idx), thr_g)
                    labels[idx] = lg + base
                    base += int(lg.max())
            else:
                labels = fcluster_distance(Z, n, thr)
            for c in range(1, labels.max() + 1):
                members = [int(succ_slots[k]) for k in np.where(labels == c)[0]]
                clusters_slots.append(members)
                plot_clusters.append(list(np.where(labels == c)[0]))
            plot_success = [tr[int(s)] for s in succ_slots]
        elif n == 1:
            clusters_slots = [[int(succ_slots[0])]]
            plot_success = [tr[int(succ_slots[0])]]
            plot_clusters = [[0]]

        # collapse when too fragmented (diffusion_replay.py:120-123);
        # with split_by_goal, collapse to ONE cluster PER GOAL first so a
        # rare goal's mode survives fragmentation of the dominant goal
        if len(clusters_slots) > self.max_modes:
            pos = {int(s): k for k, s in enumerate(succ_slots)}
            merged = None
            if self.split_by_goal:
                by_goal: Dict[int, List[int]] = {}
                for cl in clusters_slots:
                    by_goal.setdefault(int(success[cl[0]]), []).extend(cl)
                if len(by_goal) <= self.max_modes:
                    merged = [sorted(v) for _, v in sorted(by_goal.items())]
            if merged is None:
                merged = [sorted(s for cl in clusters_slots for s in cl)]
            clusters_slots = merged
            plot_clusters = [[pos[s] for s in cl] for cl in clusters_slots]

        # scheduler matching runs on PRE-eviction id sets
        clusters_ids = [[sid[s] for s in cl] for cl in clusters_slots]
        plan = self.scheduler.update_cluster(clusters_ids)

        # ---- balanced eviction ---------------------------------------------
        evict: List[int] = []
        if clusters_slots:
            cap = self.capacity // (2 * len(clusters_slots))
            for cl in clusters_slots:
                if len(cl) > cap:
                    droppable = [s for s in cl if s not in protect]
                    drop = self.rng.sample(
                        droppable, min(len(cl) - cap, len(droppable)))
                    for s in drop:
                        cl.remove(s)
                    evict.extend(drop)

        # ---- unsuccessful-trajectory assignment -----------------------------
        # sample cluster members for every (fail, cluster) pair FIRST, then
        # batch all uncached DTW needs into ONE device dispatch — per-pair
        # dispatches re-upload the gather stacks each call, and through a
        # remote device tunnel that transfer (not the DP kernel) dominates
        # recluster wall-clock
        unsuccess_slots: List[List[int]] = [[] for _ in clusters_slots]
        samples: Dict[Tuple[int, int], List[int]] = {}
        need, seen = [], set()
        for s in fail_slots:
            for c, cl in enumerate(clusters_slots):
                sample = self.rng.sample(cl, min(3, len(cl))) if cl else []
                samples[(int(s), c)] = sample
                for member in sample:
                    key = (sid[member], sid[int(s)])
                    if key not in self.cache and key not in seen:
                        seen.add(key)
                        need.append((key, member, int(s)))
        self._dtw_many(need, tr, tr)
        for s in fail_slots:
            best_d, best_c = None, None
            for c in range(len(clusters_slots)):
                sample = samples[(int(s), c)]
                if not sample:
                    continue
                dm = np.mean([self.cache[(sid[m], sid[int(s)])]
                              for m in sample])
                if best_d is None or dm < best_d:
                    best_d, best_c = dm, c
            if best_c is not None:
                unsuccess_slots[best_c].append(int(s))

        if clusters_slots:
            cap_u = self.capacity // (2 * len(clusters_slots))
        else:
            unsuccess_slots = [list(fail_slots)]
            cap_u = self.capacity
        for cl in unsuccess_slots:
            if len(cl) > cap_u:
                droppable = [s for s in cl if s not in protect]
                drop = self.rng.sample(
                    droppable, min(len(cl) - cap_u, len(droppable)))
                for s in drop:
                    cl.remove(s)
                evict.extend(drop)

        # ---- group masks ----------------------------------------------------
        group_mask = np.zeros((G, S), bool)
        keep = valid.copy()
        if evict:
            keep[np.asarray(evict, int)] = False
        group_mask[0] = keep
        for i, cl in enumerate(clusters_slots):
            for s in cl:
                group_mask[i + 1, s] = True
            if i < len(unsuccess_slots) and clusters_slots:
                for s in unsuccess_slots[i]:
                    group_mask[i + 1, s] = True

        # xy tracks + per-cluster index lists for the unsuccess-cluster plot
        # (reference: diffusion_replay.py keeps `unsuccess_plot`, rendered at
        # eval_freq*5 in ddiffpg_main.py:119-124)
        fail_list = [int(s) for s in fail_slots]
        fail_pos = {s: k for k, s in enumerate(fail_list)}
        plot_unsuccess = [tr[s] for s in fail_list]
        plot_unsuccess_clusters = [
            [fail_pos[s] for s in cl] for cl in unsuccess_slots]

        # prune the DTW cache: traj ids are monotonically increasing, so an
        # evicted id can never be referenced again — without this the cache
        # leaks ~one entry pair per retired trajectory for the whole run
        # (the reference's `self.map` leaks the same way,
        # diffusion_replay.py:194-211)
        live = {sid[s] for s in np.where(valid)[0]}
        for s in evict:
            live.discard(sid[s])
        self.cache = {k: v for k, v in self.cache.items()
                      if k[0] in live and k[1] in live}

        goal_ids, goal_n = np.unique(
            np.asarray([success[s] for s in succ_slots], int),
            return_counts=True) if len(succ_slots) else ([], [])
        return ClusterResult(
            num_groups=plan.num_groups,
            goal_counts={int(g): int(c) for g, c in zip(goal_ids, goal_n)},
            group_mask=group_mask,
            evict_slots=np.asarray(sorted(evict), np.int64), plan=plan,
            clusters=clusters_ids,
            unsuccess_clusters=[[sid[s] for s in cl] for cl in unsuccess_slots],
            Z=Z, plot_success=plot_success, plot_clusters=plot_clusters,
            plot_unsuccess=plot_unsuccess,
            plot_unsuccess_clusters=plot_unsuccess_clusters)
