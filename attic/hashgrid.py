"""Hash-grid spatial neighbor search — the large-N replacement for the
O(N^2) candidate generation in ``ops/knn.py``/``ops/radius.py`` (SURVEY.md §7
hard part (a): grid-hash bucketing under static shapes).

TPU-native design (no dynamic shapes, no scatter):

1. every particle's cell coordinate is hashed into a table of H buckets
   (H = next power of two >= 2N, so collisions are rare);
2. particles are *sorted* by bucket id — each bucket becomes a contiguous run;
3. a query gathers up to ``cell_capacity`` candidates from each of its 27
   neighboring cells by binary-searching the run start (``searchsorted``) and
   reading a fixed-size window — a regular gather, not a scatter;
4. exact distances filter the candidates; ``top_k`` keeps the k nearest.

Approximation surface (all checked in tests/test_hashgrid.py):
- runs longer than ``cell_capacity`` are truncated (choose the cell size so
  expected occupancy << capacity);
- hash collisions merge two far-apart cells into one run: harmless for
  correctness (distance-filtered) but they consume candidate slots;
- duplicate runs (two of the 27 offsets hashing to the same bucket) are
  masked at the cell level so no neighbor appears twice.

For radius queries with ``cell_size == radius`` the 27-cell stencil covers
the ball exactly, so results match the brute-force search whenever no run
overflows.

WHEN TO USE (measured, v5e): the hash grid wins for *quasi-uniform* particle
densities (the fluid/point-cloud regime continuous convolutions come from).
On strongly clustered galaxy profiles a uniform grid is the wrong structure —
dense-core cells overflow any fixed capacity while outskirt cells run empty
(kNN recall 0.45 at 100k bodies, 2.7 s vs 0.53 s for the exact streamed
top_k in ``ops/knn.py``, which therefore stays the default everywhere).
Adaptive (tree) candidate generation is future work.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_INF = float(jnp.finfo(jnp.float32).max)
_P1, _P2, _P3 = 73856093, 19349663, 83492791  # classic spatial-hash primes


def _next_pow2(x: int) -> int:
    return 1 << max(1, (x - 1)).bit_length()


def _cell_hash(cell: jax.Array, h_size: int) -> jax.Array:
    """Hash int32 cell coords (..., 3) into [0, h_size) (h_size: power of 2)."""
    c = cell.astype(jnp.uint32)
    h = (c[..., 0] * _P1) ^ (c[..., 1] * _P2) ^ (c[..., 2] * _P3)
    return (h & (h_size - 1)).astype(jnp.int32)


# The 27-cell neighborhood stencil, shaped (27, 3).
_OFFSETS = jnp.asarray(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    jnp.int32,
)


@partial(
    jax.jit,
    static_argnames=("k", "cell_capacity", "include_self", "query_chunk"),
)
def hash_grid_neighbors(
    pos: jax.Array,
    k: int,
    cell_size: float,
    mask: Optional[jax.Array] = None,
    include_self: bool = False,
    cell_capacity: int = 16,
    query_chunk: int = 4096,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """k nearest candidates from the 27-cell hash-grid stencil.

    :param pos: (N, 3) positions.
    :param k: neighbors to keep (static).
    :param cell_size: grid pitch. For radius search pass the radius; for kNN
        pick ~ (k / density)^(1/3) so the stencil holds >= k candidates.
    :param cell_capacity: candidates gathered per stencil cell (static).
    :return: (idx, valid, d2) — (N, k) neighbor indices, validity, and exact
        squared distances of the selected candidates.
    """
    n = pos.shape[0]
    h_size = _next_pow2(2 * n)
    inv_h = 1.0 / cell_size

    valid_pt = (
        jnp.ones((n,), bool) if mask is None else mask.astype(bool)
    )
    cell = jnp.floor(pos * inv_h).astype(jnp.int32)  # (N, 3)
    cid = _cell_hash(cell, h_size)
    cid = jnp.where(valid_pt, cid, h_size)  # park padded points past the end

    order = jnp.argsort(cid)
    sorted_cid = cid[order]  # (N,) ascending
    c_cap = cell_capacity

    def query_block(start_row: jax.Array):
        rows = start_row + jnp.arange(query_chunk)
        rows_c = jnp.minimum(rows, n - 1)
        q_pos = pos[rows_c]  # (Q, 3)
        q_cell = cell[rows_c]  # (Q, 3)

        tgt = q_cell[:, None, :] + _OFFSETS[None, :, :]  # (Q, 27, 3)
        tgt_h = _cell_hash(tgt, h_size)  # (Q, 27)
        # Cell-level dedup: drop an offset whose bucket equals an earlier one.
        dup = (tgt_h[:, :, None] == tgt_h[:, None, :]) & (
            jnp.arange(27)[None, :, None] > jnp.arange(27)[None, None, :]
        )
        cell_ok = ~jnp.any(dup, axis=2)  # (Q, 27)

        starts = jnp.searchsorted(sorted_cid, tgt_h, side="left")  # (Q, 27)
        slots = starts[:, :, None] + jnp.arange(c_cap)[None, None, :]
        slots_c = jnp.minimum(slots, n - 1)  # (Q, 27, C)
        cand_run = sorted_cid[slots_c] == tgt_h[:, :, None]  # still in-run?
        cand_idx = order[slots_c]  # (Q, 27, C)

        cand_valid = cand_run & cell_ok[:, :, None] & (slots < n)
        cand_idx = cand_idx.reshape(query_chunk, 27 * c_cap)
        cand_valid = cand_valid.reshape(query_chunk, 27 * c_cap)
        cand_valid = cand_valid & valid_pt[cand_idx]
        if not include_self:
            cand_valid = cand_valid & (cand_idx != rows_c[:, None])

        diff = pos[cand_idx] - q_pos[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(cand_valid, d2, _INF)
        neg, sel = jax.lax.top_k(-d2, k)
        idx = jnp.take_along_axis(cand_idx, sel, axis=1)
        d2_sel = -neg
        ok = d2_sel < _INF
        return (
            jnp.where(ok, idx, 0).astype(jnp.int32),
            ok,
            jnp.where(ok, d2_sel, jnp.inf),
        )

    n_chunks = -(-n // query_chunk)
    starts = jnp.arange(n_chunks) * query_chunk
    idx, ok, d2 = jax.lax.map(query_block, starts)
    idx = idx.reshape(n_chunks * query_chunk, k)[:n]
    ok = ok.reshape(n_chunks * query_chunk, k)[:n]
    d2 = d2.reshape(n_chunks * query_chunk, k)[:n]
    if mask is not None:
        row_ok = mask.astype(bool)[:, None]
        ok = ok & row_ok
        idx = jnp.where(ok, idx, 0)
    return idx, ok, d2


def hash_grid_radius_neighbors(
    pos: jax.Array,
    radius: float,
    k_max: int = 32,
    mask: Optional[jax.Array] = None,
    include_self: bool = True,
    cell_capacity: int = 16,
    query_chunk: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Fixed-radius search via the hash grid (cell_size = radius, so the
    27-cell stencil covers the ball exactly). Same (idx, valid) contract as
    ``ops.radius.radius_neighbors``."""
    idx, ok, d2 = hash_grid_neighbors(
        pos,
        k_max,
        cell_size=float(radius),
        mask=mask,
        include_self=include_self,
        cell_capacity=cell_capacity,
        query_chunk=query_chunk,
    )
    ok = ok & (d2 < float(radius) ** 2)
    return jnp.where(ok, idx, 0), ok
