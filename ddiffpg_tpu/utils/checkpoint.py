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


def _strip(state, skip):
    """Blank out named (possibly dotted, e.g. 'core.replay') NamedTuple
    fields; missing fields are ignored."""
    for k in skip:
        head, _, rest = k.partition(".")
        if not hasattr(state, head):
            continue
        if rest:
            state = state._replace(
                **{head: _strip(getattr(state, head), [rest])})
        else:
            state = state._replace(**{head: None})
    return state


def _graft(state, example, skip):
    """Put `example`'s values back into fields blanked by _strip."""
    for k in skip:
        head, _, rest = k.partition(".")
        if not hasattr(state, head):
            continue
        if rest:
            state = state._replace(**{head: _graft(
                getattr(state, head), getattr(example, head), [rest])})
        else:
            state = state._replace(**{head: getattr(example, head)})
    return state


def save(path, state, host_meta: dict | None = None, skip: tuple = ()):
    """skip: top-level (or dotted) state fields to EXCLUDE — used for the
    periodic light checkpoints, where pulling the multi-hundred-MB replay
    through the device tunnel would stall training for minutes. A light
    checkpoint resumes with those fields freshly initialized (the
    reference's own periodic saves are weights-only, model_util.py:23-35);
    the end-of-run checkpoint is always full."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if skip:
        state = _strip(state, skip)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np_leaves = [np.asarray(x) for x in leaves]
    # atomic write: a killed process must not leave a truncated checkpoint
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        meta = dict(host_meta or {})
        if skip:
            meta["light"] = True
        pickle.dump({"leaves": np_leaves, "treedef_str": str(treedef),
                     "host_meta": meta, "skip": list(skip)}, f,
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


# Leaf names (last path component) that newer code added to the train-state
# pytree (or reshaped: the frontier store went [S] -> [S, NG] when it
# became goal-directed). A checkpoint written before such a field existed
# is migrated on load by keeping example_state's fresh (zero-init) value
# for it; one saved with a DIFFERENT SHAPE for it is migrated the same way.
_MIGRATED_FIELDS = ("frontier", "tmp_frontier")


def load(path, example_state):
    """Restore into the structure of `example_state` (shapes must match).
    Fields skipped at save time keep `example_state`'s (fresh) values.
    Checkpoints from before a _MIGRATED_FIELDS addition load with those
    fields fresh-initialized."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    skip = blob.get("skip", [])
    example = _strip(example_state, skip) if skip else example_state
    flat, treedef = jax.tree_util.tree_flatten(example)
    leaves = [np.asarray(x) for x in blob["leaves"]]
    if len(leaves) < len(flat):
        with_path, _ = jax.tree_util.tree_flatten_with_path(example)
        migrated, out, it = 0, [], iter(leaves)
        for p, cur in with_path:
            name = getattr(p[-1], "name", None)
            if name in _MIGRATED_FIELDS and \
                    len(leaves) + migrated < len(flat):
                out.append(np.asarray(cur))      # fresh value for new field
                migrated += 1
            else:
                out.append(next(it))
        leaves = out
    if len(leaves) == len(flat):
        # reshaped migrated fields (e.g. pre-goal-directed [S] frontier)
        # keep example_state's fresh value instead of the stale blob leaf
        with_path, _ = jax.tree_util.tree_flatten_with_path(example)
        for i, ((p, cur), old) in enumerate(zip(with_path, leaves)):
            name = getattr(p[-1], "name", None)
            if name in _MIGRATED_FIELDS and \
                    np.shape(old) != np.shape(cur):
                leaves[i] = np.asarray(cur)
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    if skip:
        state = _graft(state, example_state, skip)
    return jax.tree.map(lambda x: jax.numpy.asarray(x), state), blob["host_meta"]
