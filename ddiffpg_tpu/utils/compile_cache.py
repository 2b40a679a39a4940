"""Persistent XLA compilation cache.

The big training programs compile in 400-1200 s on the remote-compile TPU
backend (BENCH_r03 measured compile_s=1232 for the antmaze collect program),
and every fresh process — each queued training run, every bench invocation —
paid it again. JAX's persistent compilation cache stores the serialized
executable keyed by the computation fingerprint, so the second process that
builds the same program loads it in seconds.

Call `enable()` once per entry point (train.py, bench.py, tools/*) before
the first jit dispatch. Safe to call multiple times; silently a no-op if the
backend does not support executable serialization.
"""

from __future__ import annotations

import os
from pathlib import Path

DEFAULT_DIR = Path(__file__).resolve().parent.parent.parent / ".jax_cache"


def enable(cache_dir: str | os.PathLike | None = None) -> None:
    import jax

    d = Path(cache_dir) if cache_dir else DEFAULT_DIR
    try:
        d.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(d))
        # cache everything that took meaningful compile time; the default
        # (1 s / small-entry skip) would drop the many ~30 s mid-size
        # programs (eval rollout, recluster DTW buckets) that dominate a
        # queued run's startup after the one big train program
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:                                   # pragma: no cover
        pass  # unsupported backend/flag set — compile times stay as-is
