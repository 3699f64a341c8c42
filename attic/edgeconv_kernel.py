"""Windowed fused EdgeConv message kernel — RETIRED (round 5).

RETIREMENT RECORD — the kernel lost its decisive A/B at every scale it was
built for, run on an otherwise-idle v5e chip:

- 1M bodies, k=8, refresh=8 GNN rollout (``results/large_scale/
  crossover_window.json``): standard fused path 453.8 ms/step; windowed
  f32 645.4 ms/step (1.42x WORSE); windowed bf16 468.2 ms/step (still
  3% worse, at ~1e-3 gather rounding). Zero fallback-budget overflow, so
  the loss is structural, not a mis-tuned budget.
- 500k end-to-end (round 4): 231 vs 194 ms/step — also a loss.
- Root cause (round-4 ablations + ``gather_microbench.json``): the premise
  overestimated XLA's row-gather cost — measured 9 ns/row at 1M on an idle
  chip (72 ms for 8M rows), not the ~40 ns/row the treeforce (N, 3)
  permutation measurement suggested; meanwhile the kernel pays a ~28 ms
  synchronous per-tile DMA/grid floor (1953 tiles x ~14 us), the one-hot
  build (E x W compares), and per-refresh plan/sort overheads. After the
  Precision.HIGHEST exactness fix the f32 gather's margin over XLA nearly
  vanished (65.8 vs 70.7 ms at 500k) and the end-to-end overheads decide.

What remains correct and potentially reusable: the factored one-hot MXU
gather pattern (exact under Precision.HIGHEST; Mosaic lowering rules in the
design notes below), the window/fallback edge-split planner, and the
measured Mosaic constraints (no lane-crossing shape casts, 128-aligned
manual-DMA lane dims, f32 default matmul rounds rhs to bf16 on v5e).

Original design rationale follows.

----

Windowed fused EdgeConv message kernel — the TPU-native fix for the
per-edge neighbor gather that dominates the GNN surrogate forward at 1M
bodies.

Why a kernel: the fused EdgeConv forward (``models/gnn.py:77-93``) reduced
the per-edge work to ONE (N, k, d) gather — ``v[idx]`` — plus elementwise
tanh and a masked reduction. On TPU that row gather is ISSUE-RATE bound,
not bandwidth bound: XLA lowers it to per-row dynamic slices (~40 ns/row;
the repo first measured the pathology in ``ops/treeforce.py``: a (N, 3)
permutation gather costs ~20 ms at 500k rows where the equivalent payload
sort costs ~1 ms). At 1M bodies / k=8 the two message passes gather 16M
rows — ~0.5 s of the measured 521 ms forward (decomposition:
``results/large_scale/crossover_r4.json``, refresh-1 vs refresh-8 rows).

The fix exploits the Morton structure the graphs already have: the kNN
search (``ops/spatial.py``) selects every candidate from a ±(block+window)
rank window around the query in SOME copy's Morton order, so in sorted
space almost all edges are near-diagonal. The kernel processes receiver
tiles of T rows; each tile's neighbor rows live in a [tile − H, tile + T
+ H) window that is DMA'd ONCE into VMEM (block-granular — no per-row
issue cost), and the within-window gather runs on the MXU as a factored
one-hot contraction:

    r            = idx − tile_start + H           (local row, < W = T+2H)
    oh_l (E,128) = onehot(r mod 128)              (VPU iota compare)
    t1 (E,S,d)   = oh_l · window (S,128,d)        (MXU: contract the lane
                                                   axis; S = W/128 superrows)
    g  (E,d)     = Σ_s onehot(r div 128)[e,s] t1[e,s,:]   (VPU select)
    out tile     = Σ_k mask · tanh(u_i + g)       (VPU)

so the only per-edge "gather" is a one-hot matmul — MXU work, issue-free.
Out-of-window edges (a copy-0 window misses the edges other curve copies
contributed — measured 17.8% beyond 256 ranks at 1M, fat-tailed to 490k)
are handled EXACTLY by the driver through a per-refresh compacted edge
list (``plan_windowed_gather``): graphs are rebuilt every ``graph_refresh``
steps, so the plan is amortised across all the gathers in between while
values change every pass.

The kernel computes tanh(u_e + g_e) with the edge bias already folded into
``u`` by the caller (u' = u − b1 in the fused-EdgeConv algebra) and returns
the masked SUM over k; mean normalisation and the d2 output layer stay in
XLA (node-sized, fusion-friendly).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _windowed_kernel(u_ref, idx_ref, mask_ref, vpad_hbm, out_ref, scr_ref,
                     sem, *, tile, half, k, mxu_dtype):
    """One receiver tile: DMA the (S, 128, d) neighbor window, gather rows
    via the factored one-hot MXU contraction, tanh + masked-sum over k."""
    t = pl.program_id(0)
    w = tile + 2 * half
    s_blocks = w // _LANES
    # window rows [t*tile, t*tile + W) of the (N + 2*half, d) padded table
    cp = pltpu.make_async_copy(
        vpad_hbm.at[pl.ds(t * tile, w)], scr_ref, sem)
    cp.start()

    idx = idx_ref[...]  # (T, k) global sorted-space rows
    r = idx - t * tile + half  # local window row
    mask = mask_ref[...] & (r >= 0) & (r < w)
    r = jnp.clip(r, 0, w - 1)

    # one-hot built per 128-row superrow and contracted immediately — the
    # (T, k) -> (T*k,) edge flatten is done only on rank-3 arrays with the
    # lane dim unchanged (layout-preserving; Mosaic rejects lane-crossing
    # shape casts like (T, k) -> (1, T*k))
    r3 = r[:, :, None]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, k, _LANES), 2)

    cp.wait()
    d = scr_ref.shape[-1]
    g = jnp.zeros((tile * k, d), jnp.float32)
    for s in range(s_blocks):
        oh = (r3 - s * _LANES == lane).astype(mxu_dtype)  # (T, k, 128)
        g = g + jax.lax.dot_general(
            oh.reshape(tile * k, _LANES),
            scr_ref[s * _LANES:(s + 1) * _LANES, :].astype(mxu_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # v5e's default f32 matmul rounds the rhs to bf16 (measured
            # 4e-2 abs error on unit-scale sums); HIGHEST (6-pass) makes
            # the one-hot gather exact. bf16 mode keeps the fast path.
            precision=(jax.lax.Precision.HIGHEST
                       if mxu_dtype == jnp.float32 else None))

    u = u_ref[...]  # (T, d), bias already folded in
    msg = jnp.tanh(u[:, None, :] + g.reshape(tile, k, d))
    # f32 multiply, not where(bool[..., None], ...): Mosaic only supports
    # minor-dim insertion on 32-bit types
    msg = msg * mask.astype(jnp.float32)[:, :, None]
    out_ref[...] = jnp.sum(msg, axis=1)


@partial(jax.jit, static_argnames=("tile", "half", "interpret", "mxu_dtype"))
def windowed_tanh_sum(u, vpad, idx, mask, *, tile=256, half=384,
                      interpret=False, mxu_dtype=jnp.float32):
    """Masked Σ_k tanh(u[i] + v[idx[i, k]]) with the neighbor gather done
    in-window on the MXU.

    :param u: (N, d) receiver-side term (fold the edge bias in before
        calling: ``u' = u − b1``). N must be a multiple of ``tile``.
    :param vpad: (N + 2·half, d) neighbor table padded with ``half`` zero
        rows at each end, rows in the SAME sorted space as ``idx``.
    :param idx: (N, k) int32 — sorted-space neighbor rows (NOT offset by
        the pad; the kernel adds ``half``).
    :param mask: (N, k) bool — which edges this kernel owns; out-of-window
        edges MUST be pre-masked (they are also masked defensively inside).
    :return: (N, d) f32 masked sums.
    """
    n, d = u.shape
    k = idx.shape[1]
    w = tile + 2 * half
    if n % tile:
        raise ValueError(f"N={n} must be a multiple of tile={tile}")
    if tile % _LANES or half % _LANES:
        raise ValueError("tile and half must be multiples of 128")
    if vpad.shape[0] != n + 2 * half:
        raise ValueError(f"vpad must have N+2*half={n + 2 * half} rows, "
                         f"got {vpad.shape[0]}")
    if d % _LANES:
        # manual HBM->VMEM DMA slices must be lane-tile (128) aligned;
        # pad the feature dim and slice the result back
        dp = _LANES - d % _LANES
        out = windowed_tanh_sum(
            jnp.pad(u, ((0, 0), (0, dp))),
            jnp.pad(vpad, ((0, 0), (0, dp))), idx, mask, tile=tile,
            half=half, interpret=interpret, mxu_dtype=mxu_dtype)
        return out[:, :d]

    grid = n // tile
    return pl.pallas_call(
        partial(_windowed_kernel, tile=tile, half=half, k=k,
                mxu_dtype=mxu_dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile, k), lambda i: (i, 0)),
            pl.BlockSpec((tile, k), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((w, d), vpad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(u, idx.astype(jnp.int32), mask, vpad)


class WindowPlan(NamedTuple):
    """Per-refresh routing of edges between the window kernel and the
    exact XLA fallback. Graphs are static between refreshes, so this is
    computed once per ``graph_refresh`` steps and reused for every gather
    (2 message passes × refresh steps share one plan)."""

    in_mask: jax.Array   # (N, k) bool — edges the kernel owns
    fb_src: jax.Array    # (B,) int32 — fallback source rows (0 if slot unused)
    fb_dst: jax.Array    # (B,) int32 — fallback receiver rows (N if unused)
    fb_valid: jax.Array  # (B,) bool
    overflow: jax.Array  # () int32 — fallback edges beyond the budget
    # (kernel edges are never dropped; overflow > 0 means `budget` slots
    # were too few and the result is missing edges — callers must check)


@partial(jax.jit, static_argnames=("tile", "half", "budget"))
def plan_windowed_gather(idx, valid, *, tile=256, half=384, budget=None):
    """Split the (N, k) edge set: in-window edges go to the kernel, the
    rest are compacted (via one argsort of the edge mask — paid once per
    graph refresh, not per gather) into a static-budget fallback list.

    :param budget: static fallback capacity; default N·k // 4 (the measured
        out-of-window fraction at 1M with 4-copy Morton graphs is ~18% at
        half=384).
    """
    n, k = idx.shape
    if budget is None:
        budget = (n * k) // 4
    if n % tile:  # pad receivers to a whole tile (slots invalid)
        pad = tile - n % tile
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, pad), (0, 0)))
        n += pad
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0)
    tstart = (rows // tile) * tile
    r = idx - tstart + half
    in_win = (r >= 0) & (r < tile + 2 * half)
    in_mask = valid & in_win
    fb_mask = valid & ~in_win

    flat_fb = fb_mask.reshape(-1)
    # stable argsort: fallback edges first, in edge order
    order = jnp.argsort(~flat_fb, stable=True)[:budget]
    taken = flat_fb[order]
    fb_src = jnp.where(taken, idx.reshape(-1)[order], 0).astype(jnp.int32)
    fb_dst = jnp.where(taken, (order // k).astype(jnp.int32), n)
    overflow = jnp.sum(flat_fb) - jnp.sum(taken)
    return WindowPlan(in_mask, fb_src, fb_dst, taken, overflow)


def edge_message_sum(u, v, idx, plan: WindowPlan, *, tile=256, half=384,
                     interpret=False, mxu_dtype=jnp.float32):
    """Full masked Σ_k tanh(u[i] + v[idx[i,k]]) over ALL valid edges:
    window kernel for ``plan.in_mask`` edges + exact XLA path for the
    compacted fallback list (gather + sorted segment-sum over ~18% of
    edges instead of 100%).

    ``u`` must already carry the folded bias (u' = u − b1); rows of
    ``u``/``v``/``idx`` are in sorted (Morton) space. N may be any size —
    receiver rows are padded to a whole tile internally (``plan`` must have
    been built with the same tile/half so its in_mask shape matches).
    Returns (N, d) f32.
    """
    n, d = u.shape
    np_ = plan.in_mask.shape[0]
    if np_ != n:
        u = jnp.pad(u, ((0, np_ - n), (0, 0)))
        idx = jnp.pad(idx, ((0, np_ - n), (0, 0)))
        v = jnp.pad(v, ((0, np_ - n), (0, 0)))
    vpad = jnp.pad(v, ((half, half), (0, 0)))
    out = windowed_tanh_sum(u, vpad, idx, plan.in_mask, tile=tile,
                            half=half, interpret=interpret,
                            mxu_dtype=mxu_dtype)
    # fallback: B-row gather (B ≪ N·k) + scatter-add by receiver
    vf = v[plan.fb_src]
    tf = jnp.tanh(u[jnp.clip(plan.fb_dst, 0, np_ - 1)] + vf)
    tf = jnp.where(plan.fb_valid[:, None], tf, 0.0)
    # the stable argsort in plan_windowed_gather keeps fallback edges in
    # row-major (receiver-sorted) order — the sorted scatter path applies
    fb = jax.ops.segment_sum(tf, plan.fb_dst, num_segments=np_ + 1,
                             indices_are_sorted=True)[:np_]
    return (out + fb)[:n]
