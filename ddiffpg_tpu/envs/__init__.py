"""On-device environments (functional, vmap-friendly).

Replaces the reference's L1/L2 layers (gym envs + subprocess vectorization +
torch tensor bridge, SURVEY.md §1): `reset`/`step` are pure functions over an
EnvState pytree, vmapped over the env batch axis and scanned over time inside
the jitted trainer — no host<->device transfer per step.
"""

from ddiffpg_tpu.envs.registry import make  # noqa: F401
