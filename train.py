#!/usr/bin/env python
"""Training entry point — DDiffPG and the DIPO/TD3/SAC baselines.

Covers both reference scripts (`/root/reference/scripts/ddiffpg_main.py`,
`baselines_main.py`). Usage:

    python train.py algo=ddiffpg env.name=antmaze-v1 num_envs=256
    python train.py algo=td3 env.name=antmaze-v1
    python train.py algo=ddiffpg env.name=pointmaze-v1 num_envs=64 \
        max_step=200000            # fast debug config

Dotted key=value pairs override the typed config (ddiffpg_tpu/config.py).
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import numpy as np


def parse_args(argv):
    algo = "ddiffpg"
    resume = None
    overrides = []
    for a in argv:
        if a.startswith("algo="):
            algo = a.split("=", 1)[1]
        elif a.startswith("resume="):
            resume = a.split("=", 1)[1]
        else:
            overrides.append(a)
    return algo, resume, overrides


def main(argv=None):
    from ddiffpg_tpu import config as C
    from ddiffpg_tpu.agents import make_agent
    from ddiffpg_tpu.agents.evaluation import eval_rollout
    from ddiffpg_tpu.envs import make
    from ddiffpg_tpu.utils import checkpoint as ckpt
    from ddiffpg_tpu.utils.logger import Logger

    algo, resume, overrides = parse_args(
        argv if argv is not None else sys.argv[1:])
    cfg = C.Config(algo=C.algo_preset(algo))
    cfg = cfg.override_strings(overrides)
    if cfg.device != "auto":
        # must update the config (this machine's sitecustomize overrides
        # the JAX_PLATFORMS environment variable at interpreter start)
        jax.config.update("jax_platforms",
                          "cpu" if cfg.device == "cpu" else cfg.device)
    cfg = C.preprocess(cfg, if_ddiffpg=(algo.lower() == "ddiffpg"))
    cfg = cfg.override_strings(overrides)   # CLI wins over per-env presets

    from ddiffpg_tpu.utils import compile_cache
    compile_cache.enable()

    logger = Logger(cfg.logdir, cfg.run_name, cfg.use_wandb,
                    dataclasses.asdict(cfg))
    logger.console(f"algo={cfg.algo.name} env={cfg.env.name} "
                   f"num_envs={cfg.num_envs} max_step={cfg.max_step} "
                   f"devices={jax.devices()}")

    env_kw = {}
    if "antmaze" in cfg.env.name:
        env_kw = dict(reward_type=cfg.env.reward_type,
                      random_init=cfg.env.random_init)
    elif cfg.env.name.startswith("Panda"):
        # reference main passes control_type='joints' (ddiffpg_main.py:42)
        env_kw = dict(control_type=cfg.env.control_type)
    env = make(cfg.env.name, num_envs=cfg.num_envs, **env_kw)
    eval_env = make(cfg.env.name, num_envs=cfg.eval_num_envs, **env_kw)

    # clean exit on Ctrl-C (reference capture_keyboard_interrupt,
    # utils/common.py:178-186); SIGUSR1 requests a FULL checkpoint at the
    # next loop top, SIGTERM requests full-checkpoint-then-exit — so an
    # external supervisor can always stop a run without losing the replay
    # state that periodic light checkpoints skip.
    import signal

    requests = {"full_ckpt": False, "stop": False}

    def _sigint(sig, frame):
        logger.console("interrupted — exiting")
        sys.exit(0)

    def _sigusr1(sig, frame):
        requests["full_ckpt"] = True

    def _sigterm(sig, frame):
        requests["full_ckpt"] = True
        requests["stop"] = True

    signal.signal(signal.SIGINT, _sigint)
    signal.signal(signal.SIGUSR1, _sigusr1)
    signal.signal(signal.SIGTERM, _sigterm)

    agent = make_agent(cfg.algo.name, env, cfg)
    key = jax.random.PRNGKey(cfg.seed)
    ts = agent.init(key)

    need_warmup = True
    if resume:
        ts, meta = ckpt.load(resume, ts)
        if meta.get("light"):
            # light checkpoint: weights/opts/rms restored, replay fresh —
            # refill the buffer and rebuild clusters from new data (the
            # reference's weights-only resume behaves the same way). Host
            # scalars in meta are independent of the skipped replay, so
            # restore them: without lin_start/lin_total the linear
            # explore-ratio schedule re-anchors at the resumed step and
            # diverges from the original run.
            if meta.get("last_cluster") is not None and hasattr(
                    agent, "cluster_manager"):
                agent.cluster_manager.scheduler.last_cluster = \
                    meta["last_cluster"]
            if meta.get("lin_start") is not None:
                agent._lin_start = meta["lin_start"]
                agent._lin_total = meta["lin_total"]
            logger.console(f"resumed (light) from {resume}: replay is "
                           f"fresh, rewarming + reclustering")
        else:
            need_warmup = False
            # sanitize the restored density grid: checkpoints written before
            # the wall-cell scatter fix carry wall cells pushed past 0 (the
            # coverage-1.025 bug) — re-stamp walls so coverage is truthful
            if hasattr(ts, "density_grid") and hasattr(
                    agent, "_density_grid0"):
                import jax.numpy as jnp

                wall = agent._density_grid0 < 0
                ts = ts._replace(density_grid=jnp.where(
                    wall, agent._density_grid0, ts.density_grid))
            if hasattr(agent, "num_groups"):
                agent.num_groups = int(meta.get("num_groups", 1))
                agent.num_clusters = agent.num_groups - 1
            if meta.get("last_cluster") is not None and hasattr(
                    agent, "cluster_manager"):
                agent.cluster_manager.scheduler.last_cluster = \
                    meta["last_cluster"]
            if meta.get("lin_start") is not None:
                agent._lin_start = meta["lin_start"]
                agent._lin_total = meta["lin_total"]
            logger.console(f"resumed from {resume} "
                           f"(num_groups={meta.get('num_groups')})")
    if need_warmup:
        logger.console(f"warmup: {cfg.algo.warm_up} random steps x "
                       f"{cfg.num_envs} envs")
        t0 = time.time()
        ts = agent.warmup(ts)
        jax.block_until_ready(ts)
        logger.console(f"warmup done in {time.time() - t0:.1f}s")

    is_ddiffpg = cfg.algo.name == "DDiffPG"
    if is_ddiffpg and need_warmup:
        ts = agent.update_cluster(ts)
        logger.console(f"initial clusters: {agent.num_clusters}")

    eval_key = jax.random.PRNGKey(cfg.seed + 1)
    global_steps = int(ts.global_step) if not hasattr(ts, "core") \
        else int(ts.core.global_step)
    iter_t = 0
    steps_per_iter = cfg.algo.horizon_len * cfg.num_envs
    t_start = time.time()
    t_last, s_last = t_start, global_steps

    def _full_meta():
        meta = {"num_groups": getattr(agent, "num_groups", 1)}
        if is_ddiffpg:
            meta["last_cluster"] = \
                agent.cluster_manager.scheduler.last_cluster
            if hasattr(agent, "_lin_start"):
                meta["lin_start"] = agent._lin_start
                meta["lin_total"] = agent._lin_total
        return meta

    while global_steps < cfg.max_step:
        if cfg.max_time and time.time() - t_start > cfg.max_time:
            logger.console(f"max_time {cfg.max_time}s reached — stopping")
            break
        if requests["full_ckpt"]:
            requests["full_ckpt"] = False
            path = logger.dir / f"ckpt_{global_steps}_full.pkl"
            ckpt.save(path, ts, _full_meta())
            logger.console(f"signal: full checkpoint -> {path}")
        if requests["stop"]:
            logger.console("SIGTERM: stopping after full checkpoint")
            break
        if iter_t % cfg.eval_freq == 0:
            if is_ddiffpg and iter_t > 0:
                ts = agent.update_cluster(ts)
                gc = getattr(agent, "last_goal_counts", {})
                logger.console(
                    f"recluster -> {agent.num_clusters} modes"
                    + (f" (success trajs per goal: {gc})" if gc else ""))
                # per-goal replay composition into the metrics stream: the
                # far-goal forensics (RESULTS.md) needed these counts and
                # only had console lines to scrape
                logger.log({f"replay/goal{g}_successes": float(n)
                            for g, n in gc.items()}
                           | {"replay/num_modes": float(agent.num_clusters)},
                           global_steps)

            eval_key, k = jax.random.split(eval_key)
            # stable bound eval_fn + dynamic args: the rollout program
            # compiles ONCE per run (a fresh closure would retrace per eval)
            metrics, xy = eval_rollout(eval_env, agent.eval_fn, k,
                                       agent.eval_args(ts))
            metrics = {k2: float(v)
                       for k2, v in jax.device_get(metrics).items()}
            logger.log(metrics, global_steps)
            logger.console(
                f"iter {iter_t} steps {global_steps}: "
                f"eval return {metrics['eval/return']:.2f} "
                f"success {metrics['eval/success_rate']:.2f} "
                f"len {metrics['eval/episode_length']:.0f}")

            if "maze" in cfg.env.name:
                from ddiffpg_tpu.utils import plotting

                try:
                    maze_name = cfg.env.name.replace("pointmaze", "antmaze")
                    from ddiffpg_tpu.physics.maze import MAZES

                    mm = MAZES[maze_name]
                    img = plotting.plot_traj(mm, np.asarray(xy).reshape(-1, 2))
                    logger.log_image("eval/map", img, global_steps)
                    # cluster map / dendrogram / exploration heatmap at the
                    # reference's eval_freq*5 cadence (ddiffpg_main.py:111-133)
                    if (is_ddiffpg and iter_t % (cfg.eval_freq * 5) == 0
                            and agent.last_plot is not None):
                        trajs, clusters, Z = agent.last_plot
                        if trajs:
                            cimg = plotting.plot_cluster(mm, trajs, clusters)
                            logger.log_image("cluster", cimg, global_steps)
                        if Z is not None and len(Z):
                            himg = plotting.plot_hierarchy(Z)
                            logger.log_image("hierarchy", himg, global_steps)
                        # unsuccessful trajectories colored by their assigned
                        # mode (ddiffpg_main.py:119-124)
                        if agent.last_unsuccess_plot is not None:
                            utrajs, uclusters = agent.last_unsuccess_plot
                            uimg = plotting.plot_cluster(mm, utrajs, uclusters)
                            logger.log_image("unsuccess_cluster", uimg,
                                             global_steps)
                        hm = plotting.plot_heatmap(
                            np.asarray(ts.density_grid[0]))
                        logger.log_image("exploration_map", hm, global_steps)
                except Exception as e:
                    logger.console(f"plotting failed: {e}")

            if iter_t % (cfg.eval_freq * cfg.ckpt_freq_mult) == 0 and iter_t:
                skip = () if cfg.ckpt_full else ("replay", "core.replay")
                ckpt.save(logger.dir / f"ckpt_{global_steps}.pkl", ts,
                          _full_meta(), skip=skip)

        if iter_t == 20 and cfg.profile:
            from jax import profiler as _profiler

            _profiler.start_trace(str(logger.dir / "profile"))
        ts, logs = agent.train_iter(ts, steps=global_steps)
        if iter_t == 22 and cfg.profile:
            from jax import profiler as _profiler

            jax.block_until_ready(ts)
            _profiler.stop_trace()
            logger.console(f"profiler trace -> {logger.dir}/profile")
        global_steps += steps_per_iter
        iter_t += 1

        if iter_t % cfg.log_freq == 0:
            # one bulk fetch instead of a device round trip per scalar
            logs = {k2: float(v) for k2, v in jax.device_get(logs).items()}
            logs["global_steps"] = global_steps
            if time.time() - t_last > 30:
                sps = (global_steps - s_last) / (time.time() - t_last)
                logs["train/env_steps_per_sec"] = sps
                logger.console(
                    f"iter {iter_t} steps {global_steps} "
                    f"({sps:,.0f} steps/s) return "
                    f"{logs.get('train/return', float('nan')):.2f}")
                t_last, s_last = time.time(), global_steps
            logger.log(logs, global_steps)

    ckpt.save(logger.dir / "ckpt_final.pkl", ts, _full_meta())
    logger.console("done")
    return ts


if __name__ == "__main__":
    main()
