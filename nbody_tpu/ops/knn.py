"""Fixed-degree k-nearest-neighbor search — the TPU-native replacement for
``torch_cluster.knn_graph`` (used at reference ``datautils.py:36`` and
``gnn.py:13``).

TPU has no dynamic shapes, so instead of a COO ``edge_index`` with a
data-dependent edge count we return a dense ``(N, k)`` neighbor-index array
plus a ``(N, k)`` validity mask. Downstream message passing becomes a regular
gather + masked reduction — no scatter at all (see SURVEY.md §2.9a).

Semantics parity with ``knn_graph(pos, k, loop=False)``:
- self edges excluded (``loop=False``) unless ``include_self``;
- when a snapshot has fewer than ``k`` other valid particles, the surplus
  slots are marked invalid (PyG simply emits fewer edges).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Plain Python float: creating a jax array at import time would force
# backend initialisation on `import nbody_tpu`.
_INF = float(jnp.finfo(jnp.float32).max)


def _pairwise_d2(pos):
    diff = pos[None, :, :] - pos[:, None, :]
    return jnp.sum(diff * diff, axis=-1)


def knn_neighbors(
    pos: jax.Array,
    k: int,
    mask: Optional[jax.Array] = None,
    include_self: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """k nearest neighbors of every particle (dense O(N^2) + ``lax.top_k``).

    :param pos: (N, 3) positions.
    :param k: neighbor count (static).
    :param mask: optional (N,) validity for padded slots.
    :param include_self: count the particle itself as its nearest neighbor
        (PyG ``loop=True``).
    :return: (idx, valid) — (N, k) int32 neighbor indices and (N, k) bool
        validity. Invalid slots point at index 0; always apply the mask.
    """
    n = pos.shape[0]
    k = min(k, n)
    d2 = _pairwise_d2(pos)
    eye = jnp.eye(n, dtype=bool)
    if not include_self:
        d2 = jnp.where(eye, _INF, d2)
    if mask is not None:
        m = mask.astype(bool)
        d2 = jnp.where(m[None, :], d2, _INF)  # never select padded cols
    neg_d2, idx = jax.lax.top_k(-d2, k)
    valid = neg_d2 > -_INF
    if mask is not None:
        valid = valid & mask.astype(bool)[:, None]  # padded rows have no nbrs
    idx = jnp.where(valid, idx, 0)
    return idx.astype(jnp.int32), valid


def batched_knn_neighbors(pos, k, mask=None, include_self=False):
    """vmap of :func:`knn_neighbors` over a leading batch axis.

    Replaces PyG's batch-vector trick (``knn_graph(..., batch=batch)``,
    reference ``gnn.py:13``): each snapshot in the (B, N, 3) batch gets an
    independent neighbor graph.
    """
    fn = lambda p, m: knn_neighbors(p, k, mask=m, include_self=include_self)
    if mask is None:
        return jax.vmap(lambda p: fn(p, None))(pos)
    return jax.vmap(fn)(pos, mask)
