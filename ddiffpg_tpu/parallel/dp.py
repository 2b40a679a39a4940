"""shard_map data parallelism for the DDiffPG trainer.

Layout (PartitionSpec over the 1-D `data` mesh axis):
  * params / optimizer states / embeddings / intrinsic / PRNG key — replicated
  * env batch (env_state, obs, per-env temp episodes, episode stats) —
    sharded on the env axis
  * episodic replay slots + per-group target-action tables — sharded on the
    slot axis (each device owns its own trajectories and samples locally)
  * gradients — `pmean` across shards inside every optimizer update
    (agents/base.py data_parallel hook), so the param update is identical on
    all devices and the replicated layout is preserved.

Host-side clustering sees the GLOBAL replay (pulled once per recluster);
group masks and scheduler plans are pushed back sharded.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ddiffpg_tpu.agents import base
from ddiffpg_tpu.agents.ddiffpg import AgentDDiffPG


def _leaf_spec(path, axis="data"):
    names = [getattr(p, "name", str(p)) for p in path]
    top = names[0] if names else ""
    if top in ("env_state", "obs", "stats", "density_grid"):
        return P(axis)
    if top == "replay":
        field = names[1] if len(names) > 1 else ""
        if field in ("group_mask", "target_action"):
            return P(None, axis)
        return P(axis)
    return P()


def state_specs(ts, axis="data"):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _leaf_spec(path, axis), ts)


class DPAgentDDiffPG:
    """Data-parallel DDiffPG: same algorithm, env batch + replay sharded."""

    def __init__(self, cfg, mesh: Mesh, env_kwargs=None):
        from ddiffpg_tpu.envs import make

        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        nd = mesh.devices.size
        self.nd = nd
        a = cfg.algo
        assert cfg.num_envs % nd == 0, "num_envs must divide the mesh"
        assert int(a.memory_size) % nd == 0
        assert a.batch_size % nd == 0
        local = cfg.override(**{
            "num_envs": cfg.num_envs // nd,
            "algo.memory_size": int(a.memory_size) // nd,
            "algo.batch_size": a.batch_size // nd,
        })
        env = make(cfg.env.name, num_envs=local.num_envs, **(env_kwargs or {}))
        self.agent = AgentDDiffPG(env, local)
        # clustering operates on the global replay
        self.agent.cluster_manager.capacity = int(a.memory_size)
        self.cfg = cfg
        self._iter_cache = {}

    # ------------------------------------------------------------------ init

    def init(self, key):
        locals_ = [self.agent.init(k) for k in jax.random.split(key, self.nd)]
        specs = state_specs(locals_[0], self.axis)

        def combine(spec, *leaves):
            if spec == P():
                return leaves[0]
            axis0 = list(spec).index(self.axis)
            return jnp.concatenate(leaves, axis=axis0)

        global_state = jax.tree.map(combine, specs, *locals_)
        shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), specs)
        return jax.device_put(global_state, shardings)

    # ----------------------------------------------------------- train step

    def _impl(self, ts, p, G):
        axis = self.axis
        orig_key = ts.key
        ts = ts._replace(key=jax.random.fold_in(
            orig_key, jax.lax.axis_index(axis)))
        with base.data_parallel(axis):
            ts, logs = self.agent._train_iter_impl(ts, p, G)
        logs = jax.lax.pmean(logs, axis)
        # restore a replicated, advanced PRNG key
        ts = ts._replace(key=jax.random.split(orig_key, 1)[0])
        return ts, logs

    def train_iter(self, ts, steps: int | None = None):
        G = self.agent.num_groups
        if G not in self._iter_cache:
            specs = state_specs(ts, self.axis)
            from jax import shard_map

            fn = shard_map(
                partial(self._impl, G=G), mesh=self.mesh,
                in_specs=(specs, P()), out_specs=(specs, P()),
                check_vma=False)
            self._iter_cache[G] = jax.jit(fn, donate_argnums=0)
        p = self.agent.get_exp_p(
            int(np.asarray(ts.global_step)) if steps is None else steps)
        return self._iter_cache[G](ts, jnp.asarray(p))

    def warmup(self, ts):
        specs = state_specs(ts, self.axis)
        from jax import shard_map

        def impl(ts):
            axis = self.axis
            orig_key = ts.key
            ts = ts._replace(key=jax.random.fold_in(
                orig_key, jax.lax.axis_index(axis)))
            ts = self.agent._warmup_impl(ts, int(self.cfg.algo.warm_up))
            return ts._replace(key=jax.random.split(orig_key, 1)[0])

        fn = shard_map(impl, mesh=self.mesh, in_specs=(specs,),
                       out_specs=specs, check_vma=False)
        return jax.jit(fn, donate_argnums=0)(ts)

    # --------------------------------------------------- recluster / eval

    def update_cluster(self, ts):
        ts = self.agent.update_cluster(ts)
        # keep group count visible
        self.num_groups = self.agent.num_groups
        return ts

    @property
    def num_clusters(self):
        return self.agent.num_clusters

    def eval_actor(self, params, key, obs):
        return self.agent.eval_actor(params, key, obs)

    def eval_policy(self, ts):
        return self.agent.eval_policy(ts)

    @property
    def eval_fn(self):
        return self.agent.eval_fn

    def eval_args(self, ts):
        return self.agent.eval_args(ts)
