"""ddiffpg_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of DDiffPG.

A from-scratch framework with the capabilities of the reference PyTorch
implementation of DDiffPG ("Learning Multimodal Behaviors from Scratch with
Diffusion Policy Gradient"): a DDPM diffusion-policy actor, per-mode
distributional double-Q critics, trajectory clustering into behavior modes,
DIPO-style action-gradient improvement, NovelD intrinsic exploration, and
TD3/SAC/DIPO baselines — all running as one jitted XLA program per training
iteration, with a from-scratch rigid-body physics engine replacing
MuJoCo/PyBullet (vmapped over thousands of envs on device).

Layer map (mirrors reference layers, see SURVEY.md §1):
  physics/   — rigid-body engine (replaces MuJoCo C / PyBullet C++)
  envs/      — AntMaze v1..v4, Panda manipulation, point-mass debug env
  models/    — diffusion policy, critics, RND, Gaussian policies
  ops/       — DDPM tables, C51 projection, DTW, n-step, noise, schedules
  replay/    — HBM-resident flat + episodic trajectory replay
  modes/     — DTW clustering + per-mode critic lifecycle (Q scheduler)
  agents/    — DDiffPG, DIPO, TD3, SAC
  parallel/  — device mesh + sharding helpers (data-parallel over ICI)
  utils/     — logging, checkpointing, plotting, density tracking
"""

from pathlib import Path

__version__ = "0.1.0"

LIB_PATH = Path(__file__).resolve().parent
