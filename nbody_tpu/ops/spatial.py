"""Space-filling-curve kNN — the production large-N neighbor search
(SURVEY.md §7 hard part (a); the role of ``torch_cluster.knn_graph`` at
reference ``datautils.py:36`` / ``contconv.py:225`` at 100k-body scale).

The exact streamed search (``ops/knn.py``) is O(N^2) distances: ~1 s for
kNN(10) at 100k bodies on a v5e chip — slower than the direct-sum force
kernel itself, so surrogates had no large-N reason to exist. The grid-hash
(retired to ``attic/hashgrid.py`` with its measurements) needs
quasi-uniform density and fails on clustered galaxy profiles.

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
  copies move the *directions* of the boundary planes.
- **Blocked sliding windows in sorted order.** Everything TPU-hostile is
  designed out: there are NO random gathers anywhere. Positions are carried
  through the sort as extra ``lax.sort`` operands (a (N,3) row gather by a
  permutation measured ~450 ms at 100k — the sort itself is ~20x cheaper);
  candidate windows are *contiguous slices* of the sorted array processed in
  blocks of B rows, so candidate distances are one (B, B+2W) norm-expansion
  MXU matmul per block; per-block selection is a k-pass min-extraction
  (lax.top_k lowers to a full bitonic row sort on TPU — measured 2x slower);
  results return to original row order with a single scatter (OOB rows
  dropped). A block row sees candidates spanning its whole block, so the
  effective window is W..W+B per side, wider than the nominal W.

Everything is static-shape, O(N·(B+2W)) work, one payload sort per copy per
call — jittable, vmappable, and cheap enough to rebuild per rollout step.

Two select/merge backends (``impl=``):

- ``"xla"``: ``lax.map`` over blocks. Portable, but the map is a scan —
  blocks run *sequentially* and the search is latency-bound at mid N.
- ``"pallas"``: ONE batched payload sort over all curve copies plus two
  Pallas grid kernels (windowed select over grid (copy, block) with the
  left/center/right neighbor blocks as pipelined block inputs; cross-copy
  dedup merge over row chunks). Candidate ids come from one-hot lane
  reductions — no gathers in either kernel. Measured ~1.8x the XLA path at
  20k bodies and ~1.4x at 100k (chained-scan timing on a v5e chip).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float(jnp.finfo(jnp.float32).max)
_BIG = 1e15  # sentinel coordinate for padded/masked rows (d2 ~ 1e30 < _INF)
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


def _select_k(d2: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Per-row k smallest of d2 (B, C) -> (sel (B, k) col indices, d2 (B, k)).

    k-pass min-extraction: each pass takes the row minimum and masks its
    column. ~2x faster than ``lax.top_k`` on TPU for k<=16 (top_k lowers to
    a full bitonic row sort); falls back to top_k for large k."""
    if k > 16:
        neg, sel = jax.lax.top_k(-d2, k)
        return sel, -neg
    cols = jnp.arange(d2.shape[1])[None, :]
    sels, vals = [], []
    for _ in range(k):
        am = jnp.argmin(d2, axis=1)
        vals.append(jnp.min(d2, axis=1))
        sels.append(am.astype(jnp.int32))
        d2 = jnp.where(cols == am[:, None], _INF, d2)
    return jnp.stack(sels, axis=1), jnp.stack(vals, axis=1)


def _copy_pass(pos, gid, k, block, window, rot, shift, include_self, mask):
    """One curve copy: payload-sort into curve order, blocked sliding-window
    distances + selection, results keyed by original row ids.

    :return: (qg (nb*B,), idx (nb*B, k) global ids, d2 (nb*B, k)) — rows in
        sorted order; ``qg`` maps each row back to its original id (pad rows
        carry qg = n, one past the valid range, for scatter-drop)."""
    n = pos.shape[0]
    b, w = block, window
    keys = morton_keys(pos, mask, shift=shift, rot=rot)
    if mask is not None:  # masked rows: sentinel coords, never neighbors
        pos = jnp.where(mask.astype(bool)[:, None], pos, _BIG)
    _, sx, sy, sz, sg = jax.lax.sort(
        (keys, pos[:, 0], pos[:, 1], pos[:, 2], gid), num_keys=1
    )
    spos = jnp.stack([sx, sy, sz], axis=1)

    nb = -(-n // b)
    spos_p = jnp.pad(spos, ((0, nb * b - n), (0, 0)), constant_values=_BIG)
    sg_p = jnp.pad(sg, (0, nb * b - n), constant_values=n)
    padded = jnp.pad(spos_p, ((w, w), (0, 0)), constant_values=_BIG)
    padded_g = jnp.pad(sg_p, (w, w), constant_values=n)

    iw = jnp.arange(b)[:, None]
    cols = jnp.arange(b + 2 * w)[None, :]

    def blk(i):
        q = jax.lax.dynamic_slice(spos_p, (i * b, 0), (b, 3))
        qg = jax.lax.dynamic_slice(sg_p, (i * b,), (b,))
        c = jax.lax.dynamic_slice(padded, (i * b, 0), (b + 2 * w, 3))
        cg = jax.lax.dynamic_slice(padded_g, (i * b,), (b + 2 * w,))
        d2 = (
            jnp.sum(q * q, axis=1)[:, None]
            + jnp.sum(c * c, axis=1)[None, :]
            - 2.0 * jnp.matmul(q, c.T, precision=jax.lax.Precision.HIGHEST)
        )
        bad = d2 >= 1e29  # sentinel pads / masked rows
        if not include_self:
            bad |= cols == iw + w  # row j's own column is j + w
        d2 = jnp.where(bad, _INF, jnp.maximum(d2, 0.0))
        sel, sd2 = _select_k(d2, k)
        gidx = cg[sel]  # (b, k) gather from a tiny (b+2w,) vector
        return qg, gidx, sd2

    qg, gidx, sd2 = jax.lax.map(blk, jnp.arange(nb))
    return qg.reshape(-1), gidx.reshape(-1, k), sd2.reshape(-1, k)


def _merge_dedup(cand, d2, k, chunk=512):
    """Merge copies' candidates (N, C) -> unique k nearest per row.

    k-pass extraction with *id masking*: each pass takes the row-min distance
    and masks every slot holding the same candidate id, which performs the
    cross-copy dedup for free. Chunked via lax.map — ops on (N, small) shapes
    are pathologically slow on TPU compared to (chunk, small) blocks."""
    n, c = cand.shape
    nch = -(-n // chunk)
    cand_p = jnp.pad(cand, ((0, nch * chunk - n), (0, 0)), constant_values=-1)
    d2_p = jnp.pad(d2, ((0, nch * chunk - n), (0, 0)), constant_values=_INF)

    def mrg(i):
        cc = jax.lax.dynamic_slice(cand_p, (i * chunk, 0), (chunk, c))
        dd = jax.lax.dynamic_slice(d2_p, (i * chunk, 0), (chunk, c))
        ids, vals = [], []
        for _ in range(k):
            am = jnp.argmin(dd, axis=1)
            mn = jnp.min(dd, axis=1)
            picked = jnp.take_along_axis(cc, am[:, None], axis=1)  # (chunk, 1)
            ids.append(picked[:, 0])
            vals.append(mn)
            dd = jnp.where(cc == picked, _INF, dd)  # masks ALL duplicates
        return jnp.stack(ids, axis=1), jnp.stack(vals, axis=1)

    idx, val = jax.lax.map(mrg, jnp.arange(nch))
    return idx.reshape(-1, k)[:n], val.reshape(-1, k)[:n]


# ---------------------------------------------------------------------------
# Pallas-fused select path (impl="pallas")
#
# The XLA path above processes blocks *sequentially* (``lax.map`` is a scan)
# and pays per-step dispatch for tiny (block, width) shapes — at 20k bodies
# the whole search is latency-bound, not compute-bound. Here the blocked
# window select and the cross-copy merge run as Pallas grid kernels: Mosaic
# pipelines the per-block DMAs against compute, all copies share ONE batched
# payload sort and ONE kernel launch (grid = (n_copies, n_blocks)), and the
# candidate ids come out of one-hot lane reductions — no gathers anywhere,
# matching the design rule of the XLA path.
#
# The window here is structural: each grid step sees its own block plus the
# left and right neighbor blocks (three pipelined block inputs), so every row
# has between B and 2B candidates per side (nominal window == block >= 128,
# wider than the XLA default W=64..96 — recall can only improve).
# ---------------------------------------------------------------------------


def _pack_d2_cols(d2, cols, ncols):
    """Pack (d2, col) into one f32 key: bitcast the non-negative f32
    distance, clear the low ``nbits`` mantissa bits, OR in the column
    index, and bitcast BACK to f32 — bit order equals numeric order for
    non-negative floats, so f32 min reductions still work and stay on the
    fast VPU path (an int32-keyed variant measured SLOWER than the f32
    baseline: int lane reductions lose to f32). ONE packed min per
    extraction pass then yields min, argmin, and — because the key is
    UNIQUE per column — a single-column hit mask, replacing the
    3-reduction min/argmin/first-tie dance of a plain f32 pass. Measured
    at 100k bodies on v5e (B=256, C=4, warm): radius build k=32
    125 -> 47 ms, kNN build k=10 50.5 -> 27 ms. Truncating <= 11 mantissa
    bits perturbs the selection ordering only among candidates within
    ~2^-12 relative distance; the recall bar (tests) is unaffected and
    exact distances are recomputed by the radius caller anyway."""
    nbits = max(int(ncols - 1).bit_length(), 1)
    assert ncols <= 2048, "packed selection supports <= 2048 candidates"
    # Clamp away zero/denormal distances: their packed keys would be
    # denormals themselves, and flush-to-zero erases the column bits (all
    # d2=0 keys then compare equal -> multi-column hits -> garbage ids).
    # 2^-100 keeps ordering (any real distance dwarfs it) and lets exact
    # ties (self edges) break uniquely by column.
    d2 = jnp.maximum(d2, 2.0 ** -100)
    bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
    packed = (bits & ~((1 << nbits) - 1)) | cols
    return jax.lax.bitcast_convert_type(packed, jnp.float32), nbits


def _unpack_d2(packed, nbits):
    """Strip the column bits back out of a (stack of) packed f32 keys."""
    bits = jax.lax.bitcast_convert_type(packed, jnp.int32)
    return jax.lax.bitcast_convert_type(
        bits & ~((1 << nbits) - 1), jnp.float32
    )


def _select_kernel(k, include_self, q_ref, cl_ref, cc_ref, cr_ref,
                   gl_ref, gc_ref, gr_ref, ids_ref, d2_ref):
    """One (copy, block) grid step: distances of a (b, 3) query block against
    its (3, 3b) candidate window, k packed-min extraction passes, candidate
    ids via one-hot lane reductions (TPU-safe: no gather)."""
    b = q_ref.shape[1]
    cand = jnp.concatenate([cl_ref[0], cc_ref[0], cr_ref[0]], axis=1)  # (3,3b)
    gid = jnp.concatenate([gl_ref[0], gc_ref[0], gr_ref[0]], axis=1)  # (1,3b)
    q = q_ref[0]  # (b, 3)
    xi, yi, zi = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    dx = cand[0:1, :] - xi
    dy = cand[1:2, :] - yi
    dz = cand[2:3, :] - zi
    d2 = dx * dx + dy * dy + dz * dz  # (b, 3b)

    rows = jax.lax.broadcasted_iota(jnp.int32, (b, 3 * b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, 3 * b), 1)
    bad = d2 >= 1e29  # _BIG sentinel pads / masked rows
    if not include_self:
        # query row r is sorted row i*b + r == candidate column b + r
        bad |= cols == rows + b
    d2 = jnp.where(bad, _INF, jnp.maximum(d2, 0.0))
    packed, nbits = _pack_d2_cols(d2, cols, 3 * b)
    # _INF unpacks to ~f32max > 1e29, so extracted bad slots still fail the
    # caller's `d2 < 1e29` validity filter.

    g_bcast = jnp.broadcast_to(gid, (b, 3 * b))
    ids, vals = [], []
    for _ in range(k):
        mn = jnp.min(packed, axis=1, keepdims=True)  # (b, 1)
        hit = packed == mn  # exactly one column: keys are unique
        ids.append(jnp.sum(jnp.where(hit, g_bcast, 0), axis=1))
        vals.append(mn[:, 0])
        packed = jnp.where(hit, _INF, packed)
    ids_ref[0] = jnp.stack(ids, axis=1)
    # one vectorized column-bit strip for all k extracted values
    d2_ref[0] = _unpack_d2(jnp.stack(vals, axis=1), nbits)


def _merge_kernel(k, cand_ref, d2_ref, ids_ref, val_ref):
    """One row-chunk of the cross-copy merge: k packed-min extraction passes
    with *id masking* (every slot holding the picked id is masked,
    deduplicating across copies for free — same semantics as
    ``_merge_dedup``). Duplicate slots of one id carry the same truncated
    distance, so packing keeps dedup exact."""
    cc = cand_ref[:]  # (r, c4) int32
    dd = d2_ref[:]  # (r, c4) f32
    r, c4 = cc.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, c4), 1)
    packed, nbits = _pack_d2_cols(jnp.maximum(dd, 0.0), cols, c4)
    ids, vals = [], []
    for _ in range(k):
        mn = jnp.min(packed, axis=1, keepdims=True)
        # Unique hit while candidates remain; once a row is exhausted every
        # slot equals _INF and `pid` sums garbage — but the value is then
        # >= 1e29, failing the `d2 < 1e29` validity filter downstream.
        hit = packed == mn
        pid = jnp.sum(jnp.where(hit, cc, 0), axis=1)  # (r,)
        ids.append(pid)
        vals.append(mn[:, 0])
        packed = jnp.where(cc == pid[:, None], _INF, packed)
    ids_ref[:] = jnp.stack(ids, axis=1)
    val_ref[:] = _unpack_d2(jnp.stack(vals, axis=1), nbits)


def _copy_passes_pallas(pos, k, block, n_copies, include_self, mask, interpret):
    """All curve copies at once: one batched payload sort (C leading axis,
    ``lax.sort`` along the last), one Pallas launch over grid (C, n_blocks).

    :return: (qg (C, npad), ids (C, npad, k), d2 (C, npad, k)) in each copy's
        sorted order; ``qg`` maps rows back to original ids (pads carry n).
    """
    n = pos.shape[0]
    b = block
    nb = -(-n // b)
    npad = nb * b

    keys = jnp.stack(
        [morton_keys(pos, mask, shift=s, rot=r) for r, s in _COPIES[:n_copies]]
    )  # (C, N)
    posm = (
        jnp.where(mask.astype(bool)[:, None], pos, _BIG)
        if mask is not None else pos
    )
    gid = jnp.arange(n, dtype=jnp.int32)
    bc = lambda v: jnp.broadcast_to(v, keys.shape)
    _, sx, sy, sz, sg = jax.lax.sort(
        (keys, bc(posm[:, 0]), bc(posm[:, 1]), bc(posm[:, 2]), bc(gid)),
        num_keys=1,
    )

    q = jnp.pad(
        jnp.stack([sx, sy, sz], axis=2),  # (C, N, 3)
        ((0, 0), (0, npad - n), (0, 0)), constant_values=_BIG,
    )
    candT = jnp.pad(
        jnp.stack([sx, sy, sz], axis=1),  # (C, 3, N)
        ((0, 0), (0, 0), (b, b + npad - n)), constant_values=_BIG,
    )
    cgT = jnp.pad(
        sg, ((0, 0), (b, b + npad - n)), constant_values=n
    )[:, None, :]  # (C, 1, L)
    qg = jnp.pad(sg, ((0, 0), (0, npad - n)), constant_values=n)

    ids, d2 = pl.pallas_call(
        partial(_select_kernel, k, include_self),
        grid=(n_copies, nb),
        in_specs=[
            pl.BlockSpec((1, b, 3), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, b), lambda c, i: (c, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, b), lambda c, i: (c, 0, i + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, b), lambda c, i: (c, 0, i + 2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b), lambda c, i: (c, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b), lambda c, i: (c, 0, i + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b), lambda c, i: (c, 0, i + 2),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, k), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, k), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_copies, npad, k), jnp.int32),
            jax.ShapeDtypeStruct((n_copies, npad, k), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_copies * npad * 3 * b * (8 + 5 * k),
            bytes_accessed=n_copies * (npad * 16 * 3 + npad * k * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, candT, candT, candT, cgT, cgT, cgT)
    return qg, ids, d2


def _merge_pallas(cand, d2, k, interpret, chunk=512):
    """Pallas twin of :func:`_merge_dedup` — parallel grid over row chunks."""
    n, c4 = cand.shape
    nch = -(-n // chunk)
    cand_p = jnp.pad(cand, ((0, nch * chunk - n), (0, 0)), constant_values=-1)
    d2_p = jnp.pad(d2, ((0, nch * chunk - n), (0, 0)), constant_values=_INF)
    idx, val = pl.pallas_call(
        partial(_merge_kernel, k),
        grid=(nch,),
        in_specs=[
            pl.BlockSpec((chunk, c4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, c4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nch * chunk, k), jnp.int32),
            jax.ShapeDtypeStruct((nch * chunk, k), jnp.float32),
        ),
        interpret=interpret,
    )(cand_p, d2_p)
    return idx[:n], val[:n]


def knn_morton(
    pos: jax.Array,
    k: int,
    mask: Optional[jax.Array] = None,
    include_self: bool = False,
    window: int = 64,
    block: int = 256,
    n_copies: int = 4,
    impl: str = "xla",
) -> Tuple[jax.Array, jax.Array]:
    """Approximate (measured >=0.99-recall on galaxy profiles) k nearest
    neighbors in O(N·(B+2W)).

    Same contract as :func:`nbody_tpu.ops.knn.knn_neighbors`: returns
    ``(idx, valid)`` dense (N, k) neighbor indices + validity.

    :param window: nominal half-window (a block row actually sees W..W+B
        candidates per side). Defaults measured >=0.996 recall at k=10 on
        disk/spiral profiles; scale up with k.
    :param block: rows per blocked-distance step (MXU tile height).
    :param n_copies: how many curve copies to union (<= 4: identity, shifted,
        two rotated — see ``_COPIES``).
    :param impl: "xla" (lax.map sequential blocks — the portable default),
        "pallas" (fused grid kernels, the fast path on real TPU hardware) or
        "pallas_interpret" (same kernels on the CPU interpreter, for tests).
        The pallas path's window is structural (== block, see module notes);
        ``window`` is ignored there.
    """
    n = pos.shape[0]
    k = min(k, n)
    n_copies = min(n_copies, len(_COPIES))
    if impl in ("pallas", "pallas_interpret") and window != 64:
        import warnings

        warnings.warn(
            "knn_morton(impl='pallas') has a structural window (== block); "
            f"the window={window} argument is ignored — tune `block` instead",
            stacklevel=2,
        )
    if impl in ("pallas", "pallas_interpret") and 3 * block > 2048:
        # the packed-min extraction ORs the candidate column into the low
        # mantissa bits of the f32 distance key (_pack_d2_cols) — 11 bits
        raise ValueError(
            f"knn_morton(impl='pallas') supports block <= 682 (each select "
            f"row scans 3*block packed candidates, max 2048); got "
            f"block={block}. Use impl='xla' for larger blocks."
        )

    if n <= max(2 * window + 1, 2 * block):
        # Small-N degenerate case: one dense block covers everything.
        d = pos[None, :, :] - pos[:, None, :]
        d2 = jnp.sum(d * d, axis=-1)
        bad = jnp.zeros(d2.shape, bool)
        if not include_self:
            bad |= jnp.eye(n, dtype=bool)
        if mask is not None:
            m = mask.astype(bool)
            bad |= ~m[None, :]
        d2 = jnp.where(bad, _INF, d2)
        sel, sd2 = _select_k(d2, k)
        valid = sd2 < 1e29
        if mask is not None:
            valid = valid & mask.astype(bool)[:, None]
        return jnp.where(valid, sel, 0).astype(jnp.int32), valid

    idx_bufs, d2_bufs = [], []
    if impl in ("pallas", "pallas_interpret"):
        qgs, idss, d2s = _copy_passes_pallas(
            pos, k, block, n_copies, include_self, mask,
            interpret=impl == "pallas_interpret",
        )
        for c in range(n_copies):
            idx_bufs.append(
                jnp.full((n, k), -1, jnp.int32)
                .at[qgs[c]].set(idss[c], mode="drop")
            )
            d2_bufs.append(
                jnp.full((n, k), _INF, jnp.float32)
                .at[qgs[c]].set(d2s[c], mode="drop")
            )
        idx, d2 = _merge_pallas(
            jnp.concatenate(idx_bufs, axis=1),
            jnp.concatenate(d2_bufs, axis=1),
            k, interpret=impl == "pallas_interpret",
        )
    else:
        gid = jnp.arange(n, dtype=jnp.int32)
        for rot, shift in _COPIES[:n_copies]:
            qg, gidx, sd2 = _copy_pass(
                pos, gid, k, block, window, rot, shift, include_self, mask
            )
            # Scatter back to original row order; pad rows (qg == n) drop. One
            # whole-row scatter per copy — scattering into a column slice of a
            # shared wide buffer measured ~470 ms at 20k (vs ~3 ms per-row).
            idx_bufs.append(
                jnp.full((n, k), -1, jnp.int32).at[qg].set(gidx, mode="drop")
            )
            d2_bufs.append(
                jnp.full((n, k), _INF, jnp.float32).at[qg].set(sd2, mode="drop")
            )
        idx, d2 = _merge_dedup(
            jnp.concatenate(idx_bufs, axis=1),
            jnp.concatenate(d2_bufs, axis=1), k
        )
    valid = d2 < 1e29
    if mask is not None:
        valid = valid & mask.astype(bool)[:, None]
    idx = jnp.where(valid, idx, 0)
    return jnp.clip(idx, 0, n - 1).astype(jnp.int32), valid


def batched_knn_morton(
    pos, k, mask=None, include_self=False, window=64, block=256, n_copies=4,
    impl="xla",
):
    """vmap of :func:`knn_morton` over a leading batch axis."""
    fn = lambda p, m: knn_morton(
        p, k, mask=m, include_self=include_self, window=window, block=block,
        n_copies=n_copies, impl=impl,
    )
    if mask is None:
        return jax.vmap(lambda p: fn(p, None))(pos)
    return jax.vmap(fn)(pos, mask)
