"""Dynamic-time-warping distance as an on-device wavefront scan.

Replaces the dtaidistance C kernel used for trajectory-mode clustering
(`/root/reference/ddiffpg/replay/diffusion_replay.py:206,359`,
`dtw_ndim.distance(use_c=True)`): cell cost is squared Euclidean distance
between trajectory points; the DP accumulates along the optimal warping
path and the distance is the square root of the terminal cell.

The DP recurrence is serialized along anti-diagonals (all cells of one
diagonal are independent), so the whole N1 x N2 table is a `lax.scan` over
2L-1 steps of vectorized [L] updates — and a batch of pairs is one `vmap`.
Variable lengths are handled with masks on a padded [L, L] table.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.float32(3.4e38)


def dtw_pair(a, b, len_a, len_b):
    """DTW distance between a[:len_a] and b[:len_b]. a, b: [L, D]."""
    L = a.shape[0]
    i_idx = jnp.arange(L)

    # b_pad[L + j] = b[j]; diagonal gather c[i] = b[d - i]
    b_pad = jnp.concatenate(
        [jnp.zeros((L + 1,) + b.shape[1:], b.dtype), b,
         jnp.zeros((L,) + b.shape[1:], b.dtype)], axis=0)

    target_d = len_a + len_b - 2

    def step(carry, d):
        dm1, dm2, acc = carry          # D on diagonals d-1, d-2: [L]
        j = d - i_idx                  # column per row
        valid = (i_idx < len_a) & (j >= 0) & (j < len_b)
        bs = jax.lax.dynamic_slice_in_dim(b_pad, d + 2, L)[::-1]  # bs[i]=b[d-i]
        cost = ((a - bs) ** 2).sum(-1)

        up = dm1                                   # D[i-1, j] -> dm1[i-1]
        up = jnp.concatenate([jnp.full((1,), _INF), up[:-1]])
        left = dm1                                 # D[i, j-1] -> dm1[i]
        diag = jnp.concatenate([jnp.full((1,), _INF), dm2[:-1]])  # D[i-1,j-1]
        best = jnp.minimum(jnp.minimum(up, left), diag)
        best = jnp.where((i_idx == 0) & (j == 0), 0.0, best)
        cur = jnp.where(valid, cost + best, _INF)

        acc = jnp.where(d == target_d, cur[jnp.clip(len_a - 1, 0, L - 1)], acc)
        return (cur, dm1, acc), None

    init = (jnp.full((L,), _INF), jnp.full((L,), _INF), _INF)
    (dm1, dm2, acc), _ = jax.lax.scan(step, init, jnp.arange(2 * L - 1))
    return jnp.sqrt(acc)


@partial(jax.jit, static_argnums=())
def dtw_batch(a, b, len_a, len_b):
    """Batched DTW: a, b [P, L, D]; len_a, len_b [P] -> [P] distances."""
    return jax.vmap(dtw_pair)(a, b, len_a, len_b)


@partial(jax.jit, static_argnums=())
def dtw_batch_gather(stack_a, stack_b, la_u, lb_u, ia, ib):
    """Batched DTW with ON-DEVICE pair assembly.

    stack_a/stack_b [N, L, D] hold each unique trajectory once; a chunk of
    pairs is just index vectors ia, ib [P]. Per-pair host->device transfer
    drops from ~8 KB (two padded tracks) to 8 bytes — through a remote
    device tunnel the transfer, not the DP kernel, dominates recluster
    time (a full distance-matrix rebuild moves GBs when pairs are shipped
    materialized)."""
    return jax.vmap(dtw_pair)(stack_a[ia], stack_b[ib], la_u[ia], lb_u[ib])


def dtw_numpy(a, b):
    """O(L^2) reference DP in numpy (tests / host fallback)."""
    import numpy as np

    n, m = len(a), len(b)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = ((a[i - 1] - b[j - 1]) ** 2).sum()
            D[i, j] = c + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    return float(np.sqrt(D[n, m]))
