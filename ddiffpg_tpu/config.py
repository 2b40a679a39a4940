"""Typed configuration tree.

Mirrors the semantics of the reference Hydra tree
(`/root/reference/ddiffpg/cfg/default.yaml`, `cfg/algo/*.yaml`) as plain
dataclasses with YAML + dotted CLI overrides and an explicit `preprocess`
pass replacing the reference's hidden post-pass mutations
(`/root/reference/ddiffpg/utils/common.py:36-62`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional


def _replace_nested(obj, dotted: str, value):
    """Set `a.b.c` on nested dataclasses, returning a new instance."""
    head, _, rest = dotted.partition(".")
    if not hasattr(obj, head):
        raise KeyError(f"unknown config field: {head!r} on {type(obj).__name__}")
    if rest:
        child = _replace_nested(getattr(obj, head), rest, value)
        return dataclasses.replace(obj, **{head: child})
    cur = getattr(obj, head)
    if cur is not None and not isinstance(cur, (dict, list)) and value is not None:
        value = type(cur)(value) if not isinstance(value, type(cur)) else value
    return dataclasses.replace(obj, **{head: value})


@dataclass(frozen=True)
class NoiseConfig:
    # reference: cfg/algo/ddiffpg_algo.yaml `noise:` block
    type: str = "mixed"          # 'fixed' | 'mixed'
    decay: Optional[str] = None  # None | 'exp' | 'linear'
    exp_decay_rate: float = 0.99
    lin_decay_iters: int = 10000
    std_max: float = 0.6
    std_min: float = 0.05
    tgt_pol_std: float = 0.8
    tgt_pol_noise_bound: float = 0.2


@dataclass(frozen=True)
class ExpConfig:
    # exploration<->exploitation mixing (reference `exp:` block)
    type: str = "prop"           # 'prop' | 'fixed' | 'linear'
    fix_ratio: float = 0.5
    stop_ratio: float = 0.7
    mode_embedding: bool = False
    # Opt-in deviation from the reference schedule: while NO success mode
    # exists yet, keep p = 0 (act with the explore embedding) even past
    # stop_ratio * max_step. The reference forces p = 1.0 there
    # (ddiffpg.py:135-137) — acting with the zero embedding, a context the
    # actor has never been trained on when there are no modes, which freezes
    # exploration (measured: antmaze-v3 coverage plateaued at 0.43 the moment
    # the override hit at 2.8M steps while still climbing +0.05/300k).
    hold_until_mode: bool = False
    # Opt-in deviation for MULTI-goal tasks: don't force p = 1.0 at
    # stop_ratio until the replay holds >= 1 success trajectory at this many
    # DISTINCT goals. The reference schedule is goal-blind — on antmaze-v2 it
    # shuts exploration at stop_ratio*max_step even when only the near goal
    # has ever been reached, which froze coverage at 0.47 and produced three
    # far-goal-0.00 negatives (RESULTS.md). 0 = off (reference behavior).
    hold_until_goals: int = 0


@dataclass(frozen=True)
class AlgoConfig:
    name: str = "DDiffPG"
    horizon_len: int = 1
    memory_size: int = 2000      # DDiffPG: #trajectories; baselines: #transitions
    batch_size: int = 4096
    nstep: int = 1
    tau: float = 0.05
    gamma: float = 0.99
    warm_up: int = 500
    act_class: str = "TanhMLPPolicy"
    cri_class: str = "DistributionalDoubleQ"
    update_times: int = 8
    no_tgt_actor: bool = True
    actor_lr: float = 3e-4
    critic_lr: float = 5e-4
    alpha_lr: float = 5e-3       # SAC auto-alpha
    alpha: Optional[float] = None
    max_grad_norm: Optional[float] = 1.0
    tracker_len: int = 500
    obs_norm: bool = False
    handle_timeout: bool = True
    reward_scale: float = 1.0
    # C51
    v_min: float = 0.0
    v_max: float = 5.0
    # C51 support for the EXPLORE group's critic only. Its returns are
    # intrinsic-only (NovelD, nonnegative) regardless of the env's reward
    # type, so it must NOT inherit a dense-reward support like [-50, 0]:
    # every projected target would collapse onto the 0-atom and exploration
    # goes blind — measured on panda dense r5 (RESULTS.md): critic_loss
    # 0.18 -> 2e-7 with 0 successes in 1.48M steps, while the sparse twin
    # (same seed, same exploration path) found the goal at 1.18M.
    v_min_explore: float = 0.0
    v_max_explore: float = 5.0
    num_atoms: int = 51
    # clustering / modes
    cluster_threshold: Optional[float] = None
    # success_bias > 0 deviates from the reference's uniform
    # cluster+unsuccess sampling: that fraction of each MODE group's
    # batch is drawn from its success trajectories only (see
    # replay/episodic.py:sample_group and RESULTS.md v2 forensics)
    success_bias: float = 0.0
    # split_by_goal=true deviates from the reference's pure-DTW clustering:
    # successes that reached different goal ids never share a cluster and
    # the >max_modes collapse keeps one cluster per goal (modes/cluster.py)
    split_by_goal: bool = False
    # frontier_keep > 0 deviates from the reference's pure age eviction of
    # failures: the K unsuccessful trajectories that came CLOSEST to a
    # still-unreached goal (per-goal closest approach, recomputed as goals
    # get solved — replay/episodic.py frontier_scores; envs without goal
    # anchors fall back to max ||pos|| depth) are protected from age
    # eviction alongside successes, and become the target set for
    # frontier_frac. Rationale (RESULTS.md, v2 seed-42 + v2 r5 forensics):
    # corridor ventures were 0.2% of the buffer and aged out before the
    # explore critic could learn from them, and a direction-blind depth
    # score then saturated on the solved corridor's deep dead-end.
    frontier_keep: int = 0
    # frontier_frac > 0: that fraction of the EXPLORE group's batch is
    # drawn from the protected frontier trajectories only (mirrors
    # success_bias, which serves the mode groups).
    frontier_frac: float = 0.0
    # Doorstep escalation (RESULTS.md, v2 r6/r7): when the frontier's best
    # failure sits within frontier_near_dist of an unreached goal, the
    # explore batch's frontier share escalates from frontier_frac to
    # frontier_frac_near (a traced row-cutoff move — no recompile). r6 held
    # a 0.73 m doorstep failure for 165k steps without converting it at
    # share 0.25; this lever commits the explore group when conversion is
    # one nudge away. Both default off.
    frontier_frac_near: float = 0.0
    frontier_near_dist: float = 0.0
    use_downsampling: bool = False
    use_embedding: bool = False
    embedding_dim: int = 5
    max_modes: int = 10          # reference caps clusters at 10 (diffusion_replay.py:120-123)
    noise: NoiseConfig = field(default_factory=NoiseConfig)
    exp: ExpConfig = field(default_factory=ExpConfig)


@dataclass(frozen=True)
class DiffusionConfig:
    # reference cfg/default.yaml `diffusion:` block
    diffusion_iter: int = 5
    action_lr: float = 0.03
    update_times: int = 20


@dataclass(frozen=True)
class IntrinsicConfig:
    # reference cfg/default.yaml `intrinsic:` block
    type: str = "noveld"         # 'noveld' | 'rnd'
    scale: float = 0.01          # reference hardcodes 0.01 (ddiffpg.py NovelD)
    # opt-in deviation: NovelD bonus x (1 + depth_scale * ||pos||) — keeps
    # exploration pressure on deep maze corridors (see intrinsic.py)
    depth_scale: float = 0.0
    normalize: bool = False
    pos_enc: bool = True
    L: int = 10
    warm_up: int = 1000


@dataclass(frozen=True)
class EnvConfig:
    name: str = "antmaze-v1"
    reward_type: str = "sparse"
    random_init: bool = False
    resolution: int = 255        # density-tracker grid resolution
    control_type: str = "joints"  # panda: 'ee' | 'joints'


@dataclass(frozen=True)
class Config:
    num_envs: int = 256
    eval_num_envs: int = 20
    seed: int = 42
    log_freq: int = 2
    eval_freq: int = 100
    max_step: int = 4_000_000
    # wall-clock budget in seconds, 0 = unlimited (cfg/default.yaml:16 declares
    # max_time but the reference scripts never consume it; here it is enforced)
    max_time: float = 0.0
    algo: AlgoConfig = field(default_factory=AlgoConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    intrinsic: IntrinsicConfig = field(default_factory=IntrinsicConfig)
    env: EnvConfig = field(default_factory=EnvConfig)
    # logging / checkpointing
    logdir: str = "runs"
    run_name: Optional[str] = None
    use_wandb: bool = False
    ckpt_freq_mult: int = 5      # checkpoint every eval_freq * this
    # full-state periodic checkpoints (replay included). Default off: the
    # replay tables are hundreds of MB and pulling them through a remote
    # device tunnel stalls training for minutes per save; light checkpoints
    # carry params/opts/embeddings/rms/PRNG (>= the reference's weights-only
    # artifacts). The end-of-run checkpoint is always full.
    ckpt_full: bool = False
    profile: bool = False        # capture a jax.profiler trace of iters 20-22
    device: str = "auto"         # 'auto' | 'cpu' | 'tpu' (forces jax platform)
    # numerics
    param_dtype: str = "float32"

    def override(self, **dotted: Any) -> "Config":
        cfg = self
        for k, v in dotted.items():
            cfg = _replace_nested(cfg, k, v)
        return cfg

    def override_strings(self, pairs) -> "Config":
        """Apply `key.path=value` CLI-style overrides with literal parsing."""
        import ast

        cfg = self
        for pair in pairs:
            k, _, v = pair.partition("=")
            try:
                val = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                val = None if v in ("null", "None") else v
            cfg = _replace_nested(cfg, k, val)
        return cfg


# Per-algorithm presets mirroring cfg/algo/*.yaml
def algo_preset(name: str) -> AlgoConfig:
    name = name.upper().replace("AGENT", "")
    if name == "DDIFFPG":
        return AlgoConfig()
    if name == "DIPO":
        return AlgoConfig(name="DIPO", memory_size=1_000_000, warm_up=32)
    if name == "DIFFQ":
        return AlgoConfig(name="DiffQ", memory_size=1_000_000, warm_up=32)
    if name == "TD3":
        return AlgoConfig(name="TD3", memory_size=1_000_000, warm_up=32)
    if name == "SAC":
        return AlgoConfig(
            name="SAC", memory_size=1_000_000, warm_up=32,
            act_class="TanhDiagGaussianMLPPolicy", cri_class="DoubleQ",
        )
    raise ValueError(f"unknown algo {name!r}")


def preprocess(cfg: Config, if_ddiffpg: bool = True) -> Config:
    """Per-env overrides, same table as reference utils/common.py:36-62."""
    name = cfg.env.name
    if name == "antmaze-v1":
        cfg = cfg.override(**{"env.resolution": 255, "env.random_init": True,
                              "max_step": 3_000_000})
        if if_ddiffpg:
            cfg = cfg.override(**{"algo.cluster_threshold": 50.0})
    elif name == "antmaze-v2":
        cfg = cfg.override(**{"env.resolution": 357, "max_step": 3_000_000})
        if if_ddiffpg:
            cfg = cfg.override(**{"algo.cluster_threshold": 70.0})
    elif name == "antmaze-v3":
        cfg = cfg.override(**{"env.resolution": 459, "max_step": 4_000_000})
        if if_ddiffpg:
            cfg = cfg.override(**{"algo.cluster_threshold": 70.0})
    elif name == "antmaze-v4":
        cfg = cfg.override(**{"env.resolution": 357, "max_step": 5_000_000})
        if if_ddiffpg:
            cfg = cfg.override(**{"algo.cluster_threshold": 50.0})
    else:
        cfg = cfg.override(**{"algo.use_downsampling": True,
                              "max_step": 3_000_000})

    # Dense-reward value support. The sparse presets pin the C51 support at
    # [0, 5] (cfg/algo/*.yaml:36-37) — with a dense reward (<= 0 by
    # construction: -distance) every projected target collapses onto the
    # 0-atom, Q is constant and the actor gradient is ~0 from step 0
    # (observed: 400k-step Panda run with critic_loss ~2e-7). The reference
    # never adjusts this either; here the support follows the reward type.
    # CLI overrides still win (train.py re-applies them after preprocess).
    dense = ("Dense" in name) or (("maze" in name)
                                  and cfg.env.reward_type == "dense")
    if dense:
        if name.startswith("Panda"):
            # -|ee-goal| per step, |.| <~ 0.5 m, 100 steps -> V in [-50, 0]
            cfg = cfg.override(**{"algo.v_min": -50.0, "algo.v_max": 0.0})
        else:
            # -d per step, d <~ 25 m, effective horizon 1/(1-gamma) = 100
            cfg = cfg.override(**{"algo.v_min": -2500.0, "algo.v_max": 0.0})

    if if_ddiffpg and cfg.algo.frontier_keep <= 0 and (
            cfg.algo.frontier_frac > 0
            or cfg.algo.frontier_frac_near > 0):
        # The frontier batch share samples only from the protected keep-set;
        # with frontier_keep=0 that set is empty and the levers no-op.
        import warnings
        warnings.warn(
            "algo.frontier_frac/frontier_frac_near set with "
            "algo.frontier_keep=0: the frontier keep-set is empty, so the "
            "frontier batch share silently no-ops. Set frontier_keep > 0.",
            stacklevel=2)

    if if_ddiffpg and cfg.algo.obs_norm:
        # Faithful to the reference: DDiffPG acts/evals on normalized obs but
        # trains critics/actor on RAW obs (reference never normalizes the
        # update batch). Flag the train/act distribution mismatch loudly.
        import warnings
        warnings.warn(
            "algo.obs_norm=true with DDiffPG: actions/eval use normalized "
            "observations but updates train on raw observations (reference "
            "semantics). Learning may silently degrade.", stacklevel=2)
    return cfg


def load_yaml(path: str) -> Config:
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    def flatten(d, prefix=""):
        out = {}
        for k, v in d.items():
            kk = f"{prefix}{k}"
            if isinstance(v, dict):
                out.update(flatten(v, kk + "."))
            else:
                out[kk] = v
        return out

    cfg = Config()
    algo_name = raw.get("algo", {}).get("name")
    if algo_name:
        cfg = dataclasses.replace(cfg, algo=algo_preset(algo_name))
    for k, v in flatten(raw).items():
        cfg = _replace_nested(cfg, k, v)
    return cfg
