"""Fused Pallas continuous-convolution collect kernel — the TPU-native hot
path for the ContConv surrogate's per-edge work (reference
``/root/reference/contconv.py:80-98``: trilinear filter lookup x poly6
window x scatter-aggregate).

Why a kernel: the XLA collect-then-matmul layer (``models/contconv.py``)
materialises a per-edge one-hot row over the D^3 filter cells — a
(B, N, k, D^3) HBM intermediate plus the (B, N, D^3, ci) corner-bin tensor
``g``. At 100k bodies / reference config (D=6, dim=128) those are
multi-gigabyte buffers and the layer runs HBM-bound (452 ms/step measured,
``results/large_scale/contconv_large.json``). This kernel streams node
tiles through VMEM and keeps both intermediates on-chip:

    per (z-chunk j, node tile i):
      oh   (T, k, Zc)  = sum_c [corner_cell - j*Zc == iota] * w_c * window
      g    (T, Zc, ci) = batched-contract_k(oh, feat_j)          (MXU)
      part (T, co)     = g.reshape(T, Zc*ci) @ F_j               (MXU)

The grid is (nz, nt) with the node tile innermost, so each filter chunk
F_j (the largest operand: D^3*ci*co floats) is DMA'd from HBM once per
outer step instead of once per node tile; partial outputs land in an
(nz, M, co) buffer summed by XLA afterwards (nz is small — cheaper and
race-free vs in-place accumulation across non-consecutive grid revisits).

Chunk policy (measured on v5e, 50k bodies, d=6/dim=128 layer): the cost is
dominated by per-z-pass work — the (T, k, Zc) one-hot build and the input
streaming — NOT by the MXU contractions (ablation: one-hot+streaming
19.6 ms, both matmuls ~6 ms, bf16 inputs change nothing), so FEWER passes
win almost linearly: zc=32 measured 109.6 ms, 64 -> 67.9, 112 -> 40.1,
224 (single pass) -> 25.5 ms. The default zc=None therefore auto-sizes to
one pass whenever the filter chunk fits the VMEM budget (v5e has 128 MB;
the 16 MB default scoped limit is raised via CompilerParams), falling
back to halving for very large banks.

Corner index/weight math (trilinear lerp over the (D, D, D) grid,
``ops/interpolate.py``) is recomputed per chunk in-register from the
(3, M, k) grid coordinates — 8 VPU fmas per edge beat re-reading a
(M, k, 8)-pair of corner arrays from HBM nz times.

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


def _collect_kernel(g3_ref, win_ref, featj_ref, f_ref, out_ref, *, d, zc):
    t, k = win_ref.shape
    z0 = pl.program_id(0) * zc

    gx, gy, gz = g3_ref[0], g3_ref[1], g3_ref[2]  # (T, k) grid coords
    win = win_ref[...]

    def corner(g):
        c0 = jnp.clip(jnp.floor(g), 0.0, float(d - 2))
        return c0.astype(jnp.int32), g - c0

    x0, fx = corner(gx)
    y0, fy = corner(gy)
    zc0, fz = corner(gz)

    # Separable one-hot build: the trilinear weight factorizes as
    # wx(xi)*wy(yi)*wz(zi) over the cell's axis coordinates, so ONE pass of
    # per-axis selector products over (T, k, Zc) replaces the original
    # eight corner where-add passes. Measured 27.8 -> 22.5 ms at the 50k
    # layer-1 config (same-session v5e) — less than the 8-pass arithmetic
    # suggests because the build shares time with featj streaming. Cells
    # past d^3 (zc padding) decompose to xi >= d, matching no selector
    # -> exact zeros.
    cell = jax.lax.broadcasted_iota(jnp.int32, (t, k, zc), 2) + z0
    xi = cell // (d * d)
    rem = cell - xi * (d * d)
    yi = rem // d
    zi3 = rem - yi * d

    def sel(ax, c0, f):
        c0 = c0[:, :, None]
        f = f[:, :, None]
        return jnp.where(ax == c0, 1.0 - f, 0.0) + jnp.where(
            ax == c0 + 1, f, 0.0)

    oh = (win[:, :, None] * sel(xi, x0, fx) * sel(yi, y0, fy)
          * sel(zi3, zc0, fz))

    featj = featj_ref[...]  # (T, k, ci)
    ci = featj.shape[-1]
    g = jax.lax.dot_general(  # (T, Zc, ci): contract k, batch T
        oh, featj, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = jnp.dot(  # (T, co)
        g.reshape(t, zc * ci), f_ref[0],
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("d", "tile", "zc", "interpret"))
def contconv_collect(
    gcoords: jax.Array,
    window: jax.Array,
    feat_j: jax.Array,
    filters: jax.Array,
    *,
    d: int,
    tile: int = 64,
    zc: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused collect: ``out_m = sum_k window[m,k] * feat_j[m,k] @ T(g[.,m,k])``
    where ``T`` is the trilinear interpolation of the filter bank at the
    edge's grid coordinates (the window/validity/radius cutoff is folded
    into ``window`` — zero entries kill padded edges entirely).

    :param gcoords: (3, M, k) per-edge grid-space coordinates in [0, d-1]
        (the x/y/z planes split over the leading axis for clean (T, k)
        VMEM slices).
    :param window: (M, k) float32 edge weights.
    :param feat_j: (M, k, ci) gathered neighbor features.
    :param filters: (d*d*d, ci, co) flat filter bank.
    :param d: filter grid resolution (static, >= 2).
    :return: (M, co) aggregated output (sum over neighbors; mean handled
        by the caller).
    """
    assert d >= 2, "kernel assumes d >= 2 (use the XLA path for d < 2)"
    m, k = window.shape
    z, ci, co = filters.shape
    assert z == d * d * d

    # Mosaic's (T, Zc, ci) -> (T, Zc*ci) shape cast requires the collapsed
    # minor dims to preserve the 128-lane layout: ci=64 fails
    # infer-vector-layout on real hardware (interpret mode hides it). Pad
    # ci up to the lane width — zero feature columns hit zero filter rows,
    # so the result is exact. Production configs (ci=dim=128) skip this.
    if ci % 128:
        cip = -(-ci // 128) * 128
        feat_j = jnp.pad(feat_j, ((0, 0), (0, 0), (0, cip - ci)))
        filters = jnp.pad(filters, ((0, 0), (0, cip - ci), (0, 0)))
        ci = cip

    mp = -(-m // tile) * tile
    if mp != m:
        pad = mp - m
        gcoords = jnp.pad(gcoords, ((0, 0), (0, pad), (0, 0)))
        window = jnp.pad(window, ((0, pad), (0, 0)))
        feat_j = jnp.pad(feat_j, ((0, pad), (0, 0), (0, 0)))
    nt = mp // tile

    if zc is None:
        # single pass unless the double-buffered filter chunk would blow
        # the VMEM budget (~32 MB of the 64 MB cap below)
        zc = -(-z // 8) * 8
        while zc > 32 and 2 * zc * ci * co * 4 > 32 * 1024 * 1024:
            zc = -(-zc // 16) * 8
    zc = min(zc, -(-z // 8) * 8)
    zp = -(-z // zc) * zc
    nz = zp // zc
    f_flat = jnp.pad(filters, ((0, zp - z), (0, 0), (0, 0))).reshape(
        nz, zc * ci, co
    )

    out = pl.pallas_call(
        partial(_collect_kernel, d=d, zc=zc),
        grid=(nz, nt),
        in_specs=[
            pl.BlockSpec((3, tile, k), lambda j, i: (0, i, 0)),
            pl.BlockSpec((tile, k), lambda j, i: (i, 0)),
            pl.BlockSpec((tile, k, ci), lambda j, i: (i, 0, 0)),
            pl.BlockSpec((1, zc * ci, co), lambda j, i: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, co), lambda j, i: (j, i, 0)),
        out_shape=jax.ShapeDtypeStruct((nz, mp, co), jnp.float32),
        # the batched contract + reshape push the Mosaic stack past the
        # default 16 MB scoped-vmem limit at ci=co=128; v5e has far more
        # physical VMEM, so raise the cap instead of shrinking tiles
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(gcoords, window, feat_j, f_flat)
    return jnp.sum(out, axis=0)[:m] if nz > 1 else out[0, :m]
