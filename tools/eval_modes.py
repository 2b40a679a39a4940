#!/usr/bin/env python
"""Per-mode conditioning forensics for a DDiffPG checkpoint (CPU-only).

Answers "is the distillation or the target-action quality the problem?":

  1. Eval success per conditioning: zero embedding (the reference's eval
     policy, ddiffpg_main.py:87-89), the explore embedding, and each mode
     embedding row.
  2. Per-group action quality on replayed mode transitions: mean Q_g of
     (a) the behavior action stored in replay, (b) the improved target
     action, (c) the actor's action conditioned on the mode embedding,
     (d) the actor's action with the zero embedding. If (b) >> (c) the
     actor lags distillation; if (b) ~ (a) the action gradient is weak.

Usage:
    python tools/eval_modes.py runs/<run>/ckpt_<N>.pkl [env=antmaze-v1]
        [num_envs=256] [eval_envs=40] [episodes=1]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(argv):
    from ddiffpg_tpu import config as C
    from ddiffpg_tpu.agents import make_agent
    from ddiffpg_tpu.agents.evaluation import eval_rollout
    from ddiffpg_tpu.envs import make
    from ddiffpg_tpu.models.diffusion import DiffusionPolicy
    from ddiffpg_tpu.models.mlp import DistributionalDoubleQ
    from ddiffpg_tpu.ops.embedding import append_embedding
    from ddiffpg_tpu.utils import checkpoint as ckpt

    path = argv[0]
    kw = dict(a.split("=", 1) for a in argv[1:])
    env_name = kw.get("env", "antmaze-v1")
    num_envs = int(kw.get("num_envs", 256))
    eval_envs = int(kw.get("eval_envs", 40))

    cfg = C.Config(algo=C.algo_preset("ddiffpg"))
    cfg = cfg.override_strings([f"env.name={env_name}"])
    cfg = C.preprocess(cfg, if_ddiffpg=True)
    cfg = cfg.override_strings([f"num_envs={num_envs}"])

    env_kw = {"random_init": True} if "antmaze" in env_name else {}
    env = make(env_name, num_envs=num_envs, **env_kw)
    agent = make_agent(cfg.algo.name, env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    ts, meta = ckpt.load(path, ts)
    G = int(meta.get("num_groups", 1))
    print(f"loaded {path}: num_groups={G} "
          f"global_step={int(ts.global_step)}")

    eval_env = make(env_name, num_envs=eval_envs, use_pallas=False, **env_kw)
    E = agent.embed_dim

    def actor_with(emb):
        def fn(k, obs):
            return agent.actor.apply(
                ts.actor_params, k, append_embedding(obs, emb),
                method=DiffusionPolicy.act)
        return fn

    def actor_with_noise(emb):
        # the TRAINING action path (ddiffpg.py:_env_step): actor + mixed
        # exploration noise — isolates whether train-time success is
        # noise-carried rather than policy-carried
        from ddiffpg_tpu.ops import noise as noise_ops

        base_fn = actor_with(emb)

        def fn(k, obs):
            ka, kn = jax.random.split(k)
            act = base_fn(ka, obs)
            return noise_ops.add_mixed_normal_noise(
                kn, act, std_min=cfg.algo.noise.std_min,
                std_max=cfg.algo.noise.std_max, out_bounds=(-1, 1))
        return fn

    conds = [("zero", jnp.zeros(E)), ("explore", ts.embeddings[0])]
    conds += [(f"mode{i}", ts.embeddings[i]) for i in range(1, G)]
    key = jax.random.PRNGKey(int(kw.get("seed", 11)))
    for name, emb in conds:
        key, k = jax.random.split(key)
        m, _ = eval_rollout(eval_env, actor_with(emb), k)
        print(f"  eval[{name:8s}]: success={float(m['eval/success_rate']):.3f} "
              f"return={float(m['eval/return']):.2f} "
              f"len={float(m['eval/episode_length']):.0f} "
              f"episodes={int(m['eval/episodes'])}")
    for name, emb in conds[:2]:
        key, k = jax.random.split(key)
        m, _ = eval_rollout(eval_env, actor_with_noise(emb), k)
        print(f"  eval[{name + '+nz':8s}]: "
              f"success={float(m['eval/success_rate']):.3f} "
              f"return={float(m['eval/return']):.2f} "
              f"len={float(m['eval/episode_length']):.0f} "
              f"episodes={int(m['eval/episodes'])}")

    # --------------------------- per-group action quality on replay batches
    from ddiffpg_tpu.replay import episodic as ep

    def q_of(g, obs, act):
        # group 0 (explore) trains on its own support (v_{min,max}_explore,
        # agents/ddiffpg.py _update_once z_g) — decode it with those atoms,
        # not the mode support, or dense envs report affinely shifted Q.
        a_cfg = agent.cfg.algo
        vmin = a_cfg.v_min_explore if g == 0 else a_cfg.v_min
        vmax = a_cfg.v_max_explore if g == 0 else a_cfg.v_max
        z = jnp.linspace(vmin, vmax, a_cfg.num_atoms)
        cp = jax.tree.map(lambda x: x[g], ts.critics)
        q1, q2 = agent.critic.apply(cp, obs, act)
        return float(jnp.minimum((q1 * z).sum(-1), (q2 * z).sum(-1)).mean())

    b = 512
    print(f"per-group Q_g comparison on {b} replayed transitions:")
    for g in range(G):
        key, ks, ka, kz = jax.random.split(key, 4)
        gb = ep.sample_group(ts.replay, ks, g, b, mix_temp=False)
        ob = gb.obs
        emb = ts.embeddings[g] if g > 0 else ts.embeddings[0]
        act_mode = agent.actor.apply(
            ts.actor_params, ka, append_embedding(ob, emb),
            method=DiffusionPolicy.act)
        act_zero = agent.actor.apply(
            ts.actor_params, kz, append_embedding(ob, jnp.zeros(E)),
            method=DiffusionPolicy.act)
        n_real = int(np.asarray(gb.from_buffer).sum())
        print(f"  g={g}: Q(behavior)={q_of(g, ob, gb.action):7.3f} "
              f"Q(target_act)={q_of(g, ob, gb.target_action):7.3f} "
              f"Q(actor|emb)={q_of(g, ob, act_mode):7.3f} "
              f"Q(actor|0)={q_of(g, ob, act_zero):7.3f} "
              f"|tgt-beh|={float(jnp.abs(gb.target_action - gb.action).mean()):.3f} "
              f"real={n_real}/{b}")


if __name__ == "__main__":
    main(sys.argv[1:])
