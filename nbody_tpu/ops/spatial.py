"""Space-filling-curve kNN — the production large-N neighbor search
(SURVEY.md §7 hard part (a); the role of ``torch_cluster.knn_graph`` at
reference ``datautils.py:36`` / ``contconv.py:225`` at 100k-body scale).

The exact streamed search (``ops/knn.py``) is O(N^2) distances: ~0.53 s for
kNN(10) at 100k bodies — slower than the direct-sum force kernel itself, so
surrogates had no large-N reason to exist. The grid-hash (``ops/hashgrid.py``)
needs quasi-uniform density and fails on clustered galaxy profiles.

This module is the adaptive replacement: sort particles along Morton
(Z-order) curves and take each particle's candidates from a window of its
sorted neighborhood. Because the curve is hierarchical, the window adapts to
*local* density automatically — in a dense cluster the window spans a tiny
region, in the sparse rim a wide one — exactly what a fixed-cell hash grid
cannot do. Design choices, each validated by a measured recall sweep on the
actual galaxy IC distributions (``experiments/knn_recall.py``):

- **Isotropic quantisation** (one scale for all axes). Per-axis scaling
  stretches a thin disk's z-axis ~20x and destroys physical locality along
  the curve — measured recall collapsed from 0.96 to 0.39 on disks.
- **Shifted + rotated curve copies** (Connor & Kumar-style). A single curve
  misses neighbors across cell-boundary discontinuities; axis-permuted
  interleavings share the same discontinuity planes and gain little
  (+0.05). Translated copies move the cell boundaries; 45-degree-rotated
  copies move the *directions* of the boundary planes. Two shifts + two
  rotations measured 0.999 (disk) / 0.992 (spiral) recall at k=10, W=96.
- **Windows wrap modulo N** so every node appears at most once per curve,
  which bounds duplicates to ``n_copies`` and makes a ``n_copies * k``
  pre-selection provably sufficient before dedup.

Everything is static-shape, O(N·W) memory, one argsort per copy per call —
jittable, vmappable, and cheap enough to rebuild per rollout step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_INF = float(jnp.finfo(jnp.float32).max)
_N_BITS = 10  # 1024^3 virtual grid; 3*10 bits fit an int32 Morton key
_MAX_Q = 2**_N_BITS - 1

_SQ2 = 2.0**-0.5
# (rotation, shift) per curve copy: identity / shifted / rotated-about-z /
# rotated-about-y, shifts chosen irrational-ish so boundaries never realign.
_COPIES = (
    (None, 0.0),
    (None, 0.41),
    (((_SQ2, -_SQ2, 0.0), (_SQ2, _SQ2, 0.0), (0.0, 0.0, 1.0)), 0.17),
    (((_SQ2, 0.0, -_SQ2), (0.0, 1.0, 0.0), (_SQ2, 0.0, _SQ2)), 0.59),
)


def _part1by2(x: jax.Array) -> jax.Array:
    """Spread the low 10 bits of ``x`` out to every 3rd bit (int32-safe)."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_keys(
    pos: jax.Array,
    mask: Optional[jax.Array] = None,
    shift: float = 0.0,
    rot=None,
) -> jax.Array:
    """(N,) int32 Z-order keys of (N, 3) positions, quantised isotropically
    (shared scale = the largest axis span of the masked bounding box) to a
    1024^3 grid. ``shift`` translates the grid by that fraction of the box;
    ``rot`` optionally pre-rotates positions (3x3 row-major tuple). Masked
    rows get INT32_MAX keys so they sort to the end."""
    if rot is not None:
        pos = pos @ jnp.asarray(rot, pos.dtype).T
    if mask is not None:
        m = mask.astype(bool)[:, None]
        lo = jnp.min(jnp.where(m, pos, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(m, pos, -jnp.inf), axis=0)
    else:
        lo = jnp.min(pos, axis=0)
        hi = jnp.max(pos, axis=0)
    span = jnp.maximum(jnp.max(hi - lo), 1e-30)
    q = jnp.clip(
        (pos - lo) * (_MAX_Q / span) + shift * _MAX_Q, 0, _MAX_Q
    ).astype(jnp.int32)
    key = (
        _part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1) | (_part1by2(q[:, 2]) << 2)
    )
    if mask is not None:
        key = jnp.where(mask.astype(bool), key, jnp.int32(0x7FFFFFFF))
    return key


def _candidates(pos, mask, window, n_copies):
    """(N, C) candidate indices: union of sorted-order windows over the
    shifted/rotated Morton curves (C = n_copies * (2*window + 1)).

    Windows wrap modulo N (not clip): wrapping keeps every node appearing at
    most once per curve, which the dedup slack in :func:`knn_morton` relies
    on — clipping would pile duplicates onto the array ends. When the window
    already covers the whole array this degenerates to the dense candidate
    set."""
    n = pos.shape[0]
    if 2 * window + 1 >= n:
        return jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (n, n))
    offs = jnp.arange(-window, window + 1)
    cands = []
    for rot, shift in _COPIES[:n_copies]:
        keys = morton_keys(pos, mask, shift=shift, rot=rot)
        perm = jnp.argsort(keys)  # sorted order -> node id
        rank = jnp.zeros((n,), jnp.int32).at[perm].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        cand_ranks = (rank[:, None] + offs[None, :]) % n
        cands.append(perm[cand_ranks].astype(jnp.int32))
    return jnp.concatenate(cands, axis=1)


def knn_morton(
    pos: jax.Array,
    k: int,
    mask: Optional[jax.Array] = None,
    include_self: bool = False,
    window: int = 96,
    n_copies: int = 4,
    chunk_size: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate (measured >=0.99-recall on galaxy profiles) k nearest
    neighbors in O(N·W).

    Same contract as :func:`nbody_tpu.ops.knn.knn_neighbors`: returns
    ``(idx, valid)`` dense (N, k) neighbor indices + validity.

    :param window: half-width of the sorted-order candidate window per curve.
        Scale it with k (W=96 measured 0.99 recall at k=10; use ~2.5x more
        for k=50).
    :param n_copies: how many curve copies to union (<= 4: identity, shifted,
        two rotated — see ``_COPIES``).
    :param chunk_size: query rows refined per sequential step (memory bound).
    """
    n = pos.shape[0]
    k = min(k, n)
    n_copies = min(n_copies, len(_COPIES))
    cands = _candidates(pos, mask, window, n_copies)  # (N, C)
    c = cands.shape[1]
    # Each unique node appears at most n_copies times among the candidates
    # (mod-wrap windows), so the top (n_copies * k) by distance contain >= k
    # unique neighbors.
    kk = min(n_copies * k, c)

    col_mask = mask.astype(bool) if mask is not None else None

    def refine(rows, row_cands):
        """rows (chunk,) query ids; row_cands (chunk, C) candidate ids."""
        cpos = pos[row_cands]  # (chunk, C, 3)
        d = cpos - pos[rows][:, None, :]
        d2 = jnp.sum(d * d, axis=-1)
        bad = jnp.zeros(d2.shape, bool)
        if not include_self:
            bad |= row_cands == rows[:, None]
        if col_mask is not None:
            bad |= ~col_mask[row_cands]
        d2 = jnp.where(bad, _INF, d2)

        neg, sel = jax.lax.top_k(-d2, kk)
        sel_idx = jnp.take_along_axis(row_cands, sel, axis=1)
        sel_d2 = -neg
        # dedup: sort the kk survivors by node id, kill adjacent repeats
        order = jnp.argsort(sel_idx, axis=1)
        si = jnp.take_along_axis(sel_idx, order, axis=1)
        sd = jnp.take_along_axis(sel_d2, order, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((si.shape[0], 1), bool), si[:, 1:] == si[:, :-1]],
            axis=1,
        )
        sd = jnp.where(dup, _INF, sd)
        negf, fsel = jax.lax.top_k(-sd, k)
        idx = jnp.take_along_axis(si, fsel, axis=1)
        valid = negf > -_INF
        return jnp.where(valid, idx, 0).astype(jnp.int32), valid

    if n <= chunk_size:
        idx, valid = refine(jnp.arange(n, dtype=jnp.int32), cands)
    else:
        n_rows = -(-n // chunk_size) * chunk_size
        rows_p = jnp.minimum(jnp.arange(n_rows, dtype=jnp.int32), n - 1)
        cands_p = jnp.concatenate(
            [cands, jnp.broadcast_to(cands[-1:], (n_rows - n, c))], axis=0
        )
        idx, valid = jax.lax.map(
            lambda t: refine(*t),
            (
                rows_p.reshape(-1, chunk_size),
                cands_p.reshape(-1, chunk_size, c),
            ),
        )
        idx = idx.reshape(n_rows, k)[:n]
        valid = valid.reshape(n_rows, k)[:n]

    if mask is not None:
        valid = valid & mask.astype(bool)[:, None]
        idx = jnp.where(valid, idx, 0)
    return idx, valid


def batched_knn_morton(
    pos, k, mask=None, include_self=False, window=96, n_copies=4
):
    """vmap of :func:`knn_morton` over a leading batch axis."""
    fn = lambda p, m: knn_morton(
        p, k, mask=m, include_self=include_self, window=window,
        n_copies=n_copies,
    )
    if mask is None:
        return jax.vmap(lambda p: fn(p, None))(pos)
    return jax.vmap(fn)(pos, mask)
