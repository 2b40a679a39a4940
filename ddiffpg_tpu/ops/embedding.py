"""Mode-embedding mixing — the exploration<->exploitation mechanism.

Functional, static-shape counterpart of `add_embedding`
(`/root/reference/ddiffpg/utils/torch_util.py:17-43`):

* a fraction `p` of the env batch ("the first s = int(N*p) rows" when mode
  embeddings exist, a random subset otherwise) acts in *exploit* mode —
  conditioned on per-mode embeddings (or the zero embedding);
* the remaining rows act in *explore* mode — conditioned on the explore
  embedding.

Modes are carried as a fixed-size `[K_max, E]` table plus a traced
`num_modes` count so cluster changes never retrigger compilation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def generate_embedding(key, dim: int) -> jnp.ndarray:
    """Random N(0,1) mode id (torch_util.py:14-15)."""
    return jax.random.normal(key, (dim,))


def add_embedding(key, state: jnp.ndarray, embedding: jnp.ndarray,
                  p, modes: jnp.ndarray | None = None,
                  num_modes=0) -> jnp.ndarray:
    """Concat [state, per-row embedding].

    state: [N, D]; embedding: [E] (explore embedding); p in [0, 1];
    modes: [K_max, E] table (rows >= num_modes ignored); num_modes may be a
    traced int32 scalar.
    """
    N = state.shape[0]
    E = embedding.shape[-1]
    s = jnp.floor(N * jnp.asarray(p, jnp.float32)).astype(jnp.int32)
    base_emb = jnp.broadcast_to(embedding, (N, E)).astype(state.dtype)
    rows = jnp.arange(N)

    if modes is None:
        modes = jnp.zeros((1, E), state.dtype)
        num_modes = 0
    num_modes = jnp.asarray(num_modes, jnp.int32)

    def with_modes(_):
        m = jnp.maximum(num_modes, 1)
        base = s // m
        rem = s % m
        # sizes = [base + rem, base, base, ...] as in the reference
        idx = jnp.where(rows < base + rem, 0, (rows - rem) // jnp.maximum(base, 1))
        idx = jnp.clip(idx, 0, m - 1)
        mode_emb = modes[idx]
        return jnp.where((rows < s)[:, None], mode_emb, base_emb)

    def without_modes(_):
        # random subset of size s gets the ZERO embedding
        zero_mask = jax.random.permutation(key, rows < s)
        return jnp.where(zero_mask[:, None], jnp.zeros_like(base_emb), base_emb)

    new_emb = jax.lax.cond(num_modes > 0, with_modes, without_modes, None)
    return jnp.concatenate([state, new_emb], axis=-1)


def append_embedding(state: jnp.ndarray, embedding: jnp.ndarray) -> jnp.ndarray:
    """add_embedding with p=0: every row gets `embedding` (used in updates)."""
    N = state.shape[0]
    emb = jnp.broadcast_to(embedding, (N, embedding.shape[-1])).astype(state.dtype)
    return jnp.concatenate([state, emb], axis=-1)
