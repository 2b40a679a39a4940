"""Jitted evaluation rollouts (reference eval loop, ddiffpg_main.py:69-105)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(0, 1))
def eval_rollout(env, actor_fn, key, actor_args=None):
    """Run one full episode-length rollout on the eval vector env.

    actor_fn(key, obs) -> action (already deterministic / no exploration
    noise). Returns metrics dict + xy trajectory [T, E, 2].

    `actor_fn` is a STATIC argument: pass a stable callable (e.g. the
    agent's bound `eval_fn` method, which hashes equal across calls) and
    thread the train-state-dependent parameters through `actor_args`
    (a dynamic pytree, signature actor_fn(actor_args, key, obs)).
    Passing a fresh closure every call retraces the whole rollout
    program each eval — minutes per eval on a remote-compile target.
    """
    k_reset, key = jax.random.split(key)
    env_state, obs = env.reset(k_reset)
    E = env.num_envs
    # multi-goal envs (antmaze v2+, DrawerMulti, PegInsertion) report WHICH
    # goal in info["success"] (1-based id, goal_reaching_env.py:37-48);
    # log a per-goal breakdown so multimodal consolidation is visible in
    # metrics, not just plots
    inner = getattr(env, "env", env)
    n_goals = getattr(inner, "num_goals",
                      len(getattr(inner, "goal_xy", [0])))

    def body(carry, k):
        env_state, obs, cur_ret, cur_len, acc = carry
        action = (actor_fn(k, obs) if actor_args is None
                  else actor_fn(actor_args, k, obs))
        env_state, next_obs, reward, done, info = env.step(env_state, action)
        cur_ret = cur_ret + reward
        cur_len = cur_len + 1.0
        d = done.astype(bool)
        gid = info["success"]
        acc = {
            "ret_sum": acc["ret_sum"] + jnp.where(d, cur_ret, 0.0).sum(),
            "len_sum": acc["len_sum"] + jnp.where(d, cur_len, 0.0).sum(),
            "episodes": acc["episodes"] + d.sum(),
            "successes": acc["successes"] + (gid > 0).sum(),
            "per_goal": acc["per_goal"] + (
                gid[:, None] == jnp.arange(1, n_goals + 1)[None]).sum(0),
        }
        cur_ret = jnp.where(d, 0.0, cur_ret)
        cur_len = jnp.where(d, 0.0, cur_len)
        return (env_state, next_obs, cur_ret, cur_len, acc), obs[:, :2]

    acc0 = {"ret_sum": 0.0, "len_sum": 0.0,
            "episodes": jnp.asarray(0, jnp.int32),
            "successes": jnp.asarray(0, jnp.int32),
            "per_goal": jnp.zeros(n_goals, jnp.int32)}
    keys = jax.random.split(key, env.max_episode_length)
    (_, _, _, _, acc), xy = jax.lax.scan(
        body, (env_state, obs, jnp.zeros(E), jnp.zeros(E), acc0), keys)
    n = jnp.maximum(acc["episodes"], 1)
    metrics = {
        "eval/return": acc["ret_sum"] / n,
        "eval/episode_length": acc["len_sum"] / n,
        "eval/success_rate": acc["successes"] / jnp.maximum(
            acc["episodes"] + (acc["episodes"] == 0), 1),
        "eval/episodes": acc["episodes"],
    }
    if n_goals > 1:
        for g in range(n_goals):
            metrics[f"eval/success_goal{g + 1}"] = acc["per_goal"][g] / n
    return metrics, xy
