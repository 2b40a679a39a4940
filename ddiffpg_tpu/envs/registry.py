"""Env registry — the counterpart of the reference's gym registrations
(`/root/reference/ddiffpg/old__init__.py:28-132`)."""

from __future__ import annotations

from ddiffpg_tpu.envs.base import VecEnv


def make(name: str, num_envs: int = 1, **kwargs) -> VecEnv:
    if name.startswith("antmaze"):
        from ddiffpg_tpu.envs.antmaze import AntMazeEnv
        env = AntMazeEnv(name=name, **kwargs)
    elif name.startswith("pointmaze"):
        from ddiffpg_tpu.envs.pointmass import PointMazeEnv
        env = PointMazeEnv(name=name, **kwargs)
    elif name.startswith("Panda"):
        from ddiffpg_tpu.envs.panda import make_panda_env
        env = make_panda_env(name, **kwargs)
    else:
        raise ValueError(f"unknown env {name!r}")
    return VecEnv(env, num_envs)
