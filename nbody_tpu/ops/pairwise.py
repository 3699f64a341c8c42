"""Pallas tiled all-pairs gravity kernel — the TPU-native replacement for the
reference's broadcasted O(N^2) torch evaluation
(``/root/reference/src/galaxify/simulation.py:80-88``).

The reference materialises the full (N, N, 3) displacement tensor in device
memory every step. Here the interaction matrix only ever exists as
(TILE_I, TILE_J) blocks in VMEM: the grid walks j-tiles innermost and
accumulates partial accelerations into an output block that stays resident in
VMEM across the j sweep. Per-coordinate broadcasts (TI,1)-(1,TJ) keep the
arithmetic exact (no |a|^2+|b|^2-2ab cancellation) and entirely on the VPU.

The kernel is *rectangular*: it computes forces exerted by a source set J on
a target set I. The self-interaction needs no mask: a coincident pair's
force is w * dx == w * 0 == 0 exactly (``_D2_FLOOR`` keeps w finite even at
softening 0), so the same kernel serves both the single-device full product
and each step of the multi-device ring (``nbody_tpu.parallel.ring``), where
I and J are different shards of the global particle array. The energy kernel
DOES mask its diagonal (PE would double-count it); the force entry point's
``diag_delta`` parameter is deprecated and ignored (passing it warns — it
cannot exclude a non-coincident pair).

The kernel is VPU-compute-bound (one rsqrt per pair). Measured tile sweep at
N=102400 (v5e, forced-readback timing), after the diagonal-mask removal:
(256,1024) 0.162 Tpairs/s | (1024,1024) 0.171 | (1024,2048) VMEM OOM
(scoped 24M > 16M). (Pre-removal: 0.130 / 0.139.) Defaults stay
(256,1024): within 6% of the best and far from the VMEM ceiling for every
shape.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Floor keeps rsqrt(d2)^3 finite for coincident slots when softening == 0:
# it must be >= ~1e-25 or inv^3 overflows float32 (1e-30 -> 1e15^3 = inf,
# and inf * 0 displacement = NaN). Matters for callers that disable the
# diagonal mask and rely on the zero displacement to cancel self-pairs
# (ops/treeforce.py's near pass). Real coincident distinct pairs with
# softening == 0 are singular in the reference too — the floor turns that
# into a huge-but-finite force.
_D2_FLOOR = 1e-18


def _force_kernel(fscal_ref, delta_ref, pos_i_ref, posT_j_ref, massT_j_ref, acc_ref):
    """One (i, j) tile of the interaction sum.

    fscal_ref:   SMEM (2,) float32 = [g_const, softening]
    delta_ref:   SMEM (1,) int32   = global_col_base - global_row_base
                 (a global self-pair row_g == col_g satisfies
                  row_l - col_l == col_base - row_base)
    pos_i_ref:   VMEM (TI, 3)   target-tile positions (sublane-major)
    posT_j_ref:  VMEM (3, TJ)   source-tile positions, transposed (lane-major)
    massT_j_ref: VMEM (1, TJ)   source-tile masses (already validity-masked)
    acc_ref:     VMEM (TI, 3)   accumulated over the j grid dimension
    """
    j = pl.program_id(1)

    g = fscal_ref[0]
    eps = fscal_ref[1]
    del delta_ref  # see the no-mask note below

    xi = pos_i_ref[:, 0:1]  # (TI, 1)
    yi = pos_i_ref[:, 1:2]
    zi = pos_i_ref[:, 2:3]
    xj = posT_j_ref[0:1, :]  # (1, TJ)
    yj = posT_j_ref[1:2, :]
    zj = posT_j_ref[2:3, :]

    dx = xj - xi  # (TI, TJ) = r_j - r_i, matching simulation.py:80
    dy = yj - yi
    dz = zj - zi
    d2 = dx * dx + dy * dy + dz * dz + eps * eps
    inv = jax.lax.rsqrt(jnp.maximum(d2, _D2_FLOOR))
    w = inv * inv * inv * massT_j_ref[0:1, :]  # (TI, TJ)

    # NO self-interaction mask: the reference zeroes the diagonal weight
    # (simulation.py:85), but the self-pair's force contribution is
    # w * dx == w * 0 == 0 identically — _D2_FLOOR keeps w finite even at
    # softening 0, so the product is an exact zero either way (the
    # treeforce near pass has always relied on this cancellation via
    # diag_delta > every local offset). Dropping the two per-pair iotas +
    # compare + select measured +23% kernel throughput at N=102400
    # (0.139 -> 0.171 Tpairs/s at tiles (1024,1024); defaults 0.130 ->
    # 0.162); delta stays in the signature so callers and the energy
    # kernel keep one ABI.

    # Reduce over the j lane axis per coordinate. (An MXU contraction
    # w @ [pos_j | 1] was tried here; it loses ~1e-4 relative accuracy to
    # catastrophic cancellation of the absolute-position sums and won no
    # measurable time — the kernel is rsqrt/VPU-bound.)
    ax = jnp.sum(w * dx, axis=1, keepdims=True)  # (TI, 1)
    ay = jnp.sum(w * dy, axis=1, keepdims=True)
    az = jnp.sum(w * dz, axis=1, keepdims=True)
    partial_acc = g * jnp.concatenate([ax, ay, az], axis=1)  # (TI, 3)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] = acc_ref[:] + partial_acc


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _energy_kernel(masked, fscal_ref, pos_i_ref, posT_j_ref, mass_i_ref,
                   massT_j_ref, u_ref):
    """One (i, j) tile of the pairwise potential energy
    U = -G sum_{i<j} m_i m_j / (d_ij + eps)  (simulation.py:104-113).
    With ``masked`` the strict-upper-triangle mask runs on *global* indices
    so each unordered pair is counted exactly once across the whole grid;
    unmasked, the tile sums ALL (i, j) pairs — the rectangular cross-set
    kernel of :func:`pallas_cross_potential` (targets and sources disjoint,
    so no pair can repeat)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    ti = pos_i_ref.shape[0]
    tj = posT_j_ref.shape[1]
    eps = fscal_ref[1]

    xi = pos_i_ref[:, 0:1]
    yi = pos_i_ref[:, 1:2]
    zi = pos_i_ref[:, 2:3]
    dx = posT_j_ref[0:1, :] - xi
    dy = posT_j_ref[1:2, :] - yi
    dz = posT_j_ref[2:3, :] - zi
    # floor avoids 0/0 NaNs for coincident zero-mass padding when eps == 0
    dist = jnp.maximum(jnp.sqrt(dx * dx + dy * dy + dz * dz) + eps, 1e-30)

    mm = mass_i_ref[:, 0:1] * massT_j_ref[0:1, :]  # (TI, TJ)
    pair = -mm / dist
    if masked:
        row_g = i * ti + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
        col_g = j * tj + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
        pair = jnp.where(row_g < col_g, pair, 0.0)
    partial = jnp.sum(pair)

    @pl.when((i == 0) & (j == 0))
    def _():
        u_ref[0, 0] = jnp.float32(0)

    u_ref[0, 0] = u_ref[0, 0] + partial


@partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def pallas_potential_energy(
    pos: jax.Array,
    mass: jax.Array,
    g_const,
    softening,
    mask: Optional[jax.Array] = None,
    tile_i: int = 512,
    tile_j: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Total pairwise PE via the tiled kernel — numerically equivalent to
    ``core.forces.potential_energy`` with O(N) memory (the dense path
    materialises an (N, N) matrix; the chunked path streams (chunk, N)
    blocks through XLA — this keeps everything in VMEM tiles)."""
    n = pos.shape[0]
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    if mask is not None:
        mass = mass * mask.astype(jnp.float32)  # zero-mass slots: no pairs

    tj = min(tile_j, _round_up(n, 128))
    ti = min(tile_i, tj)
    if tj % ti:
        ti = 128
    n_pad = _round_up(n, tj)
    pos_p = jnp.pad(pos, ((0, n_pad - n), (0, 0)))
    mass_p = jnp.pad(mass, (0, n_pad - n))
    grid = (n_pad // ti, n_pad // tj)

    fscal = jnp.stack(
        [jnp.asarray(g_const, jnp.float32), jnp.asarray(softening, jnp.float32)]
    )
    u = pl.pallas_call(
        partial(_energy_kernel, True),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ti, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * n_pad * n_pad,
            bytes_accessed=n_pad * 16 * grid[0],
            transcendentals=n_pad * n_pad,
        ),
        interpret=interpret,
    )(fscal, pos_p, pos_p.T, mass_p[:, None], mass_p[None, :])
    return jnp.asarray(g_const, jnp.float32) * u[0, 0]


@partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def pallas_partial_accelerations(
    pos_i: jax.Array,
    pos_j: jax.Array,
    mass_j: jax.Array,
    g_const,
    softening,
    diag_delta=None,
    tile_i: int = 256,
    tile_j: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Accelerations exerted on targets ``pos_i`` by sources
    ``(pos_j, mass_j)``. A coincident self-pair contributes an exact zero
    (w * dx == 0 — see the module docstring), so no diagonal mask exists;
    shapes must already be lane-aligned-friendly and this low-level entry
    point does NO padding (see :func:`pallas_accelerations`).

    :param diag_delta: DEPRECATED, ignored. The force kernel has no
        diagonal mask (a coincident self-pair cancels exactly), so this
        parameter cannot exclude a pair whose displacement is nonzero —
        passing any value warns. It survives only so legacy callers fail
        soft rather than hard; it will be removed.
    """
    if diag_delta is not None:
        import warnings

        warnings.warn(
            "pallas_partial_accelerations(diag_delta=...) is deprecated "
            "and IGNORED: the force kernel has no diagonal mask (a "
            "coincident self-pair cancels to exact zero) and cannot "
            "exclude a non-coincident pair.",
            DeprecationWarning,
            stacklevel=2,
        )
    ni, nj = pos_i.shape[0], pos_j.shape[0]
    ti = min(tile_i, _round_up(ni, 8))
    tj = min(tile_j, _round_up(nj, 128))
    ni_pad = _round_up(ni, ti)
    nj_pad = _round_up(nj, tj)
    if ni_pad != ni:
        pos_i = jnp.pad(pos_i, ((0, ni_pad - ni), (0, 0)))
    if nj_pad != nj:
        # zero-mass padding sources exert no force; padded col local indices
        # can collide with diag_delta but that only masks a zero-mass pair
        pos_j = jnp.pad(pos_j, ((0, nj_pad - nj), (0, 0)))
        mass_j = jnp.pad(mass_j, (0, nj_pad - nj))
    grid = (ni_pad // ti, nj_pad // tj)

    fscal = jnp.stack(
        [jnp.asarray(g_const, jnp.float32), jnp.asarray(softening, jnp.float32)]
    )
    # kernel ABI keeps the SMEM delta slot (shared with the PE kernel,
    # which does mask its diagonal); the force kernel ignores it
    delta = jnp.zeros((1,), jnp.int32)

    return pl.pallas_call(
        _force_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ti, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ni_pad, 3), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=15 * ni_pad * nj_pad,
            bytes_accessed=nj_pad * 16 * grid[0] + ni_pad * 12,
            transcendentals=ni_pad * nj_pad,  # rsqrt
        ),
        interpret=interpret,
    )(fscal, delta, pos_i, pos_j.T, mass_j[None, :])[:ni]


@partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def pallas_accelerations(
    pos: jax.Array,
    mass: jax.Array,
    g_const,
    softening,
    mask: Optional[jax.Array] = None,
    tile_i: int = 256,
    tile_j: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Softened direct-sum accelerations via the tiled Pallas kernel.

    Numerically equivalent to ``nbody_tpu.core.forces.pairwise_accelerations``
    (tested against it); O(N^2) compute with O(N) memory.

    :param pos: (N, 3) float32 positions.
    :param mass: (N,) float32 masses.
    :param mask: optional (N,) validity mask — folded into the masses, so
        padded slots exert no force; their output rows are zeroed.
    :return: (N, 3) float32 accelerations.
    """
    n = pos.shape[0]
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    if mask is not None:
        mass = mass * mask.astype(jnp.float32)

    tj = min(tile_j, _round_up(n, 128))
    ti = min(tile_i, tj)
    if tj % ti:
        ti = 128  # always divides tj (a multiple of 128)
    n_pad = _round_up(n, tj)

    pos_p = jnp.pad(pos, ((0, n_pad - n), (0, 0)))
    mass_p = jnp.pad(mass, (0, n_pad - n))  # zero mass => no force

    acc = pallas_partial_accelerations(
        pos_p,
        pos_p,
        mass_p,
        g_const,
        softening,
        tile_i=ti,
        tile_j=tj,
        interpret=interpret,
    )
    acc = acc[:n]
    if mask is not None:
        acc = acc * mask[:n, None].astype(acc.dtype)
    return acc


@partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def pallas_cross_potential(
    pos_i: jax.Array,
    mass_i: jax.Array,
    pos_j: jax.Array,
    mass_j: jax.Array,
    g_const,
    softening,
    tile_i: int = 512,
    tile_j: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """PE of every (i, j) pair between two DISJOINT particle sets,
    U = -G sum_{i in I, j in J} m_i m_j / (d_ij + eps) — the rectangular,
    unmasked twin of :func:`pallas_potential_energy`.

    Exists for chunked exact-energy audits at scales where the full
    triangular kernel is one multi-minute device execution (5e13 pairs at
    10M bodies — the tunneled worker crashes beyond ~60-90 s): split the
    particles into C chunks, sum ``pallas_potential_energy`` over the C
    diagonal chunks plus this kernel over the C(C-1)/2 unordered chunk
    pairs — every unordered particle pair is counted exactly once and each
    execution stays at ~seconds. The sets MUST be disjoint (a shared
    particle would self-pair at distance 0, contributing -G m^2/eps).
    """
    ni, nj = pos_i.shape[0], pos_j.shape[0]
    pos_i = jnp.asarray(pos_i, jnp.float32)
    pos_j = jnp.asarray(pos_j, jnp.float32)
    mass_i = jnp.asarray(mass_i, jnp.float32)
    mass_j = jnp.asarray(mass_j, jnp.float32)

    ti = min(tile_i, _round_up(ni, 8))
    tj = min(tile_j, _round_up(nj, 128))
    ni_pad = _round_up(ni, ti)
    nj_pad = _round_up(nj, tj)
    if ni_pad != ni:
        pos_i = jnp.pad(pos_i, ((0, ni_pad - ni), (0, 0)))
        mass_i = jnp.pad(mass_i, (0, ni_pad - ni))  # zero mass: no pairs
    if nj_pad != nj:
        pos_j = jnp.pad(pos_j, ((0, nj_pad - nj), (0, 0)))
        mass_j = jnp.pad(mass_j, (0, nj_pad - nj))
    grid = (ni_pad // ti, nj_pad // tj)

    fscal = jnp.stack(
        [jnp.asarray(g_const, jnp.float32),
         jnp.asarray(softening, jnp.float32)]
    )
    u = pl.pallas_call(
        partial(_energy_kernel, False),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ti, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * ni_pad * nj_pad,
            bytes_accessed=nj_pad * 16 * grid[0] + ni_pad * 16,
            transcendentals=ni_pad * nj_pad,
        ),
        interpret=interpret,
    )(fscal, pos_i, pos_j.T, mass_i[:, None], mass_j[None, :])
    return jnp.asarray(g_const, jnp.float32) * u[0, 0]


def chunked_potential_energy(pos, mass, g_const, softening, chunk: int,
                             interpret: bool = False) -> float:
    """Exact total pairwise PE as a float, computed in C diagonal +
    C(C-1)/2 cross kernel launches of ~``chunk`` rows each (block-triangle
    decomposition; see :func:`pallas_cross_potential`). Host-side f64
    accumulation of the per-launch f32 partials. For N where one
    triangular launch exceeds the device's safe single-execution time."""
    n = pos.shape[0]
    nc = -(-n // chunk)
    bounds = [(k * chunk, min((k + 1) * chunk, n)) for k in range(nc)]
    total = 0.0
    for a, (lo, hi) in enumerate(bounds):
        total += float(pallas_potential_energy(
            pos[lo:hi], mass[lo:hi], g_const, softening,
            interpret=interpret))
        for lo2, hi2 in bounds[a + 1:]:
            total += float(pallas_cross_potential(
                pos[lo:hi], mass[lo:hi], pos[lo2:hi2], mass[lo2:hi2],
                g_const, softening, interpret=interpret))
    return total
