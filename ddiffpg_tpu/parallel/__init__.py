"""Device-mesh data parallelism over ICI.

The reference is strictly single-process single-GPU (SURVEY.md §2.3 — no
torch.distributed anywhere); this package adds first-class DP: env batch,
episodic replay and exploration statistics are sharded along a `data` mesh
axis with `shard_map`, parameters are replicated, and gradients are
`pmean`-ed across shards before the optimizer step. Multi-host runs use the
same program via jax.distributed.initialize.
"""

from ddiffpg_tpu.parallel.mesh import make_mesh  # noqa: F401
