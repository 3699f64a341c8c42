"""Fused Pallas continuous-convolution collect kernel — the TPU-native hot
path for the ContConv surrogate's per-edge work (reference
``/root/reference/contconv.py:80-98``: trilinear filter lookup x poly6
window x scatter-aggregate).

Why a kernel: the XLA collect-then-matmul layer (``models/contconv.py``)
materialises a per-edge one-hot row over the D^3 filter cells — a
(B, N, k, D^3) HBM intermediate plus the (B, N, D^3, ci) corner-bin tensor
``g``. At 100k bodies / reference config (D=6, dim=128) those are
multi-gigabyte buffers and the layer runs HBM-bound (452 ms/step measured,
``results/large_scale/contconv_large.json``). This kernel keeps everything
on-chip, and factorizes the trilinear weight over the cell axes so that
no (T, k, D^3) cube is ever built (v4; the v2 kernel built exactly that
cube with VPU select-chains, ablated at ~16 ms of its 28 ms at 100k/D=6):

    per (xy-chunk j, node tile i):
      wxy (T, k, C2)    = win * tent(gx - x(l)) * tent(gy - y(l))   (VPU,
                          C2 <= D^2 lanes — 36 at D=6, not 216)
      fz  (T, k, D*ci)  = tent(gz - zi) (x) featj                   (VPU,
                          z-axis lerp folded into the features; the
                          (T,k,D,ci)->(T,k,D*ci) merge is 128-lane-aligned
                          because ci is lane-padded)
      g   (T, C2, D*ci) = batched-contract_k(wxy, fz)               (MXU)
      part (T, co)      = g.reshape(T, C2*D*ci) @ F_j               (MXU)

``tent(u) = max(0, 1 - |u|)`` IS the per-axis lerp weight for grid coords
clamped to [0, D-1] (the exact convention of ``ops/interpolate.py:29``) —
3 VPU ops replace the corner compare/select chains.

The grid is (n2, nt) with the node tile innermost, so each filter chunk
F_j (the largest operand: D^3*ci*co floats, rows ordered (x, y, z, ci) —
exactly ``filters.reshape(D^3*ci, co)``) is DMA'd from HBM once per outer
step; partial outputs land in an (n2, M, co) buffer summed by XLA
afterwards (n2 is 1 in production configs — the 64 MB raised VMEM cap fits
the whole D=6/dim=128 bank).

Measured on v5e at 100k bodies (k=32, ci=co=128, f32): D=6 27.7 ms (v2)
-> 22.8 (v3: one-hot via a constant {0,1} MXU expansion) -> 19.3 (v4);
D=4 19.9 -> 14.5. The v2 ablation that drove this: one-hot build+stream
16.7 ms, +k-contract 21.8, +final matmul 28.0 — the (T, k, D^3) VPU
select-chain build dominated everything, so v4 removes that cube rather
than tuning it. Passing bf16 feat_j measured SLOWER (22.7 at D=6: the
extra elementwise relayouts outweigh the halved stream), so the model
keeps f32 inputs. Tile 64/128/256 within noise; chunking only matters
for filter banks past the VMEM budget. Compiled-TPU parity vs the XLA
layer at 20k bodies: rel l2 4.1e-3 (both paths' MXU inputs are
bf16-rounded in different orders; each sits ~3.7e-3 from a forced-f32
trace).

The kernel is inference-only (no VJP is defined): training runs the XLA
layer, rollouts run this one. Equality vs the XLA layer is pinned by
``tests/test_models.py::test_contconv_fused_kernel_matches_xla``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _collect_kernel(gx_ref, gy_ref, gz_ref, win_ref, featj_ref, f_ref,
                    out_ref, *, d, c2):
    t, k = win_ref.shape
    l0 = pl.program_id(0) * c2  # first xy-lane of this chunk

    # Tent formulation of the per-axis lerp weights: for grid coords
    # clamped to [0, d-1] (exactly what ops/interpolate.py:29 does on the
    # XLA path), the linear-interpolation weight of integer cell x at
    # coordinate g is max(0, 1 - |g - x|).
    def tent(u):
        return jnp.maximum(0.0, 1.0 - jnp.abs(u))

    gx = jnp.clip(gx_ref[...], 0.0, float(d - 1))  # (T, k)
    gy = jnp.clip(gy_ref[...], 0.0, float(d - 1))
    gz = jnp.clip(gz_ref[...], 0.0, float(d - 1))
    win = win_ref[...]

    # per-edge bilinear weights on the chunk's xy lanes: lane l = x*d + y
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c2), 2) + l0
    lx = (lane2 // d).astype(jnp.float32)
    ly = (lane2 - (lane2 // d) * d).astype(jnp.float32)
    wxy = (win[:, :, None] * tent(gx[:, :, None] - lx)
           * tent(gy[:, :, None] - ly))  # (T, k, c2)

    # z-axis lerp folded into the features: fz[t, k, z*ci + c] — built
    # rank-3 (lane-tiled concat + a lane-indexed tent) because Mosaic
    # rejects the rank-4 (T,k,d,1)x(T,k,1,ci) broadcast shape casts
    featj = featj_ref[...]  # (T, k, ci), f32 or bf16
    ci = featj.shape[-1]
    mxu_t = featj.dtype  # bf16 feat_j => bf16 MXU operands throughout
    featd = jnp.concatenate([featj] * d, axis=-1)  # (T, k, d*ci)
    zl = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d * ci), 2) // ci
    fz = featd * tent(gz[:, :, None] - zl.astype(jnp.float32)).astype(mxu_t)

    g = jax.lax.dot_general(  # (T, c2, d*ci): contract k, batch T
        wxy.astype(mxu_t), fz, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = jnp.dot(  # (T, co)
        g.reshape(t, c2 * d * ci).astype(mxu_t), f_ref[0],
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("d", "tile", "chunk", "interpret"))
def contconv_collect(
    gx: jax.Array,
    gy: jax.Array,
    gz: jax.Array,
    window: jax.Array,
    feat_j: jax.Array,
    filters: jax.Array,
    *,
    d: int,
    tile: int = 64,
    chunk: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused collect: ``out_m = sum_k window[m,k] * feat_j[m,k] @ T(g[.,m,k])``
    where ``T`` is the trilinear interpolation of the filter bank at the
    edge's grid coordinates (the window/validity/radius cutoff is folded
    into ``window`` — zero entries kill padded edges entirely).

    :param gx/gy/gz: (M, k) per-edge grid-space coordinate planes in
        [0, d-1] — separate args (not one (M, k, 3) array) so each plane
        fuses into its producer instead of forcing a minor-dim-3
        transpose/relayout in HBM.
    :param window: (M, k) float32 edge weights.
    :param feat_j: (M, k, ci) gathered neighbor features. Passing bf16
        switches every MXU operand (weights, features, filter bank) to
        bf16 — halves the dominant HBM stream; output stays f32
        (f32-accumulated). The XLA layer's MXU inputs are bf16-rounded by
        default anyway (measured ~3.7e-3 relative on both paths).
    :param filters: (d*d*d, ci, co) flat filter bank (cast to feat_j's
        dtype).
    :param d: filter grid resolution (static, >= 2).
    :param chunk: xy-lane chunk size (cells are processed in blocks of
        ``chunk * d``); None auto-sizes to a single pass unless the filter
        chunk would blow the VMEM budget.
    :return: (M, co) aggregated output (sum over neighbors; mean handled
        by the caller).
    """
    assert d >= 2, "kernel assumes d >= 2 (use the XLA path for d < 2)"
    m, k = window.shape
    z, ci, co = filters.shape
    d2 = d * d
    assert z == d * d * d

    # Mosaic's minor-dims shape casts ((T,k,d,ci)->(T,k,d*ci) and
    # (T,c2,d*ci)->(T,c2*d*ci)) require the collapsed minor dims to
    # preserve the 128-lane layout: ci=64 fails infer-vector-layout on real
    # hardware (interpret mode hides it). Pad ci up to the lane width —
    # zero feature columns hit zero filter rows, so the result is exact.
    # Production configs (ci=dim=128) skip this.
    if ci % 128:
        cip = -(-ci // 128) * 128
        feat_j = jnp.pad(feat_j, ((0, 0), (0, 0), (0, cip - ci)))
        filters = jnp.pad(filters, ((0, 0), (0, cip - ci), (0, 0)))
        ci = cip

    mp = -(-m // tile) * tile
    if mp != m:
        pad = mp - m
        gx = jnp.pad(gx, ((0, pad), (0, 0)))
        gy = jnp.pad(gy, ((0, pad), (0, 0)))
        gz = jnp.pad(gz, ((0, pad), (0, 0)))
        window = jnp.pad(window, ((0, pad), (0, 0)))
        feat_j = jnp.pad(feat_j, ((0, pad), (0, 0), (0, 0)))
    nt = mp // tile

    if chunk is None:
        # single pass unless the double-buffered filter chunk would blow
        # the VMEM budget (~32 MB of the 64 MB cap below)
        chunk = d2
        while chunk > 8 and 2 * chunk * d * ci * co * 4 > 32 * 1024 * 1024:
            chunk = -(-chunk // 2)
    chunk = min(chunk, d2)
    d2p = -(-d2 // chunk) * chunk
    n2 = d2p // chunk
    # filter rows are (x, y, z, ci)-ordered; chunking over xy keeps each
    # chunk a contiguous row block of d*ci rows per cell-plane
    f_flat = jnp.pad(
        filters.astype(feat_j.dtype).reshape(d2, d * ci, co),
        ((0, d2p - d2), (0, 0), (0, 0)),
    ).reshape(n2, chunk * d * ci, co)

    out = pl.pallas_call(
        partial(_collect_kernel, d=d, c2=chunk),
        grid=(n2, nt),
        in_specs=[
            pl.BlockSpec((tile, k), lambda j, i: (i, 0)),
            pl.BlockSpec((tile, k), lambda j, i: (i, 0)),
            pl.BlockSpec((tile, k), lambda j, i: (i, 0)),
            pl.BlockSpec((tile, k), lambda j, i: (i, 0)),
            pl.BlockSpec((tile, k, ci), lambda j, i: (i, 0, 0)),
            pl.BlockSpec((1, chunk * d * ci, co), lambda j, i: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, co), lambda j, i: (j, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n2, mp, co), jnp.float32),
        # the batched contract + reshape push the Mosaic stack past the
        # default 16 MB scoped-vmem limit at ci=co=128; v5e has far more
        # physical VMEM, so raise the cap instead of shrinking tiles
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(gx, gy, gz, window, feat_j, f_flat)
    return jnp.sum(out, axis=0)[:m] if n2 > 1 else out[0, :m]
