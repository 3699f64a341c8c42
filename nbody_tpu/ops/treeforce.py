"""Block-multipole approximate gravity ("Barnes-Hut-lite") — beyond-parity
large-N classical forces.

The reference's only classical engine is the dense O(N^2) direct sum
(``/root/reference/src/galaxify/simulation.py:80-88``), which caps ground
truth at ~10^4 bodies. This backend reuses the Morton-curve machinery of
``ops/spatial.py`` to build a two-level approximation that is TPU-shaped end
to end (static shapes, contiguous slices, norm-expansion MXU matmuls, no
tree pointers):

1. sort particles into Morton order and cut the sorted array into ``nb``
   contiguous blocks of ``B`` rows — equal-*count* Z-order blocks are
   spatially compact and automatically shrink in dense regions, so they
   double as the nodes of a one-level adaptive tree;
2. every block keeps an exact softened interaction with its ``M = n_near``
   nearest blocks (by center-of-mass distance, self always included —
   distance 0), computed with the same norm-expansion + matmul contraction
   as ``core.forces.pairwise_accelerations``;
3. every other block contributes through its multipole moments about the
   COM — monopole + traceless quadrupole (the dipole vanishes about the
   COM):

       a = G [ -M r / s^3  +  Q r / s^5  -  (5/2) (r^T Q r) r / s^7 ],
       Q_ab = sum_k m_k (3 d_ka d_kb - |d_k|^2 delta_ab),
       s^2 = r^2 + eps^2  (softened radii; r = particle - COM)

   evaluated over *all* blocks in one pass, then the near set's multipole
   contribution is subtracted exactly (no double counting).

Cost: O(N · (M·B + N/B)) instead of O(N^2). Accuracy is set by the
effective opening angle: raising ``n_near`` monotonically approaches the
exact force (at ``M >= nb`` the far set is empty and the result IS the
direct sum); the quadrupole term buys ~(block extent / distance) over a
monopole-only far field.

The partition (sort permutation + near sets) may be *stale*: forces are
always evaluated with fresh positions/moments under the stored assignment,
so a partition refreshed every R steps (like the surrogate's
``graph_refresh``) amortises the sort without changing what is computed —
only how well the blocks still hug the particles.

Self-interactions need no masking: the softened force kernel
``(r_j - r_i) / (|r_j - r_i|^2 + eps^2)^{3/2}`` vanishes at r_j = r_i.
Momentum is not exactly conserved across the exact/multipole seam (the
COM-top-M near relation is mostly but not perfectly symmetric) — the same
tradeoff every one-sided treecode makes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.ops.spatial import morton_keys, _select_k

_HI = jax.lax.Precision.HIGHEST
_ADJ = 4  # structural near-window half-width (see build_bh_partition)
# Floor under the softened squared distance. At softening == 0 a self-pair
# (or a particle sitting on a block's COM) hits d2 == 0; the floor must
# keep every radial power finite in float32 — the quadrupole term uses
# inv^7, so the floor must satisfy floor^-3.5 < f32 max with real margin
# (1e-10 gives inv7 ~ 1e35, ~3000x below f32 max; 1e-11 left only ~7%).
# The zero displacement then cancels the (huge but finite) coefficients
# exactly. No effect at production softening (eps^2 = 2.5e-3 >> floor).
_D2_FLOOR = 1e-10
assert _D2_FLOOR ** -3.5 < 3.4e38 / 100, "inv^7 must stay finite in f32"


class BHPartition(NamedTuple):
    """Morton partition of the particle set.

    :param sorted_gid: (nb*B,) int32 — original row id of each sorted slot;
        pad slots carry ``n`` (one past the valid range) and sit at the END
        of slot space.
    :param near: (nb, M) int32 — block ids of each block's exact set.
    :param inv_rank: (n,) int32 — sorted slot of each original row (the
        inverse permutation). Lets fresh state be brought into sorted order
        by a payload *sort* instead of a row gather — a (N, 3) gather by
        permutation is a measured TPU pathology (~20 ms at 500k; the sort
        is ~1 ms).
    """

    sorted_gid: jax.Array
    near: jax.Array
    inv_rank: jax.Array

    @property
    def n_blocks(self) -> int:
        return self.near.shape[0]


def _gather_sorted(pos, mass, partition):
    """Fresh positions/masses in sorted-slot order; pad slots (end of slot
    space) get zero mass. Implemented as one payload sort keyed on the
    stored inverse ranks (see :class:`BHPartition`)."""
    n = pos.shape[0]
    n_slots = partition.sorted_gid.shape[0]
    _, sx, sy, sz, sm = jax.lax.sort(
        (partition.inv_rank, pos[:, 0], pos[:, 1], pos[:, 2], mass),
        num_keys=1,
    )
    spos = jnp.stack([sx, sy, sz], axis=1)
    spos = jnp.pad(spos, ((0, n_slots - n), (0, 0)))
    sm = jnp.pad(sm, (0, n_slots - n))
    return spos, sm


def _unsort_acc(acc, sorted_gid, n):
    """Sorted-slot accelerations back to original row order via one payload
    sort keyed on the original ids (pad slots carry ``n`` and sort last)."""
    _, ax, ay, az = jax.lax.sort(
        (sorted_gid, acc[:, 0], acc[:, 1], acc[:, 2]), num_keys=1
    )
    return jnp.stack([ax, ay, az], axis=1)[:n]


def _block_moments(spos, smass, nb, block):
    """Per-block mass, COM and traceless quadrupole (pads are inert)."""
    bp = spos.reshape(nb, block, 3)
    bm = smass.reshape(nb, block)
    msum = jnp.sum(bm, axis=1)
    com = jnp.sum(bm[..., None] * bp, axis=1) / jnp.maximum(
        msum, 1e-30
    )[..., None]
    d = bp - com[:, None, :]  # (nb, B, 3)
    outer = jnp.einsum("nba,nbc->nac", bm[..., None] * d, d)  # sum m d d^T
    tr = jnp.trace(outer, axis1=1, axis2=2)
    quad = 3.0 * outer - tr[:, None, None] * jnp.eye(3, dtype=spos.dtype)
    return bp, bm, msum, com, quad


@partial(jax.jit, static_argnames=("n_near", "block"))
def build_bh_partition(
    pos: jax.Array, mass: jax.Array, n_near: int = 16, block: int = 256
) -> BHPartition:
    """Sort into Morton order and pick every block's ``n_near`` *worst
    separated* blocks (self always included — separation 0).

    Selection uses the treecode opening criterion, not raw COM distance:
    blocks are ranked by d^2 / (rad_i + rad_j)^2, the squared inverse
    opening angle, where ``rad`` is the block's bounding radius about its
    COM. Equal-count Morton blocks in a galaxy's sparse rim are spatially
    huge — by COM distance they look "far" while their surfaces overlap the
    receiver, which is exactly where a multipole expansion diverges.
    O(N log N) sort + O(nb^2) block pass."""
    n = pos.shape[0]
    nb = -(-n // block)
    n_near = min(n_near, nb)
    keys = morton_keys(pos)
    gid = jnp.arange(n, dtype=jnp.int32)
    # one payload sort carries ids AND positions/masses into curve order
    # (no permutation gathers anywhere — see BHPartition.inv_rank)
    _, sg, sx, sy, sz, smass = jax.lax.sort(
        (keys, gid, pos[:, 0], pos[:, 1], pos[:, 2], mass), num_keys=1
    )
    sg_p = jnp.pad(sg, (0, nb * block - n), constant_values=n)
    _, inv_rank = jax.lax.sort((sg, gid), num_keys=1)

    spos = jnp.pad(jnp.stack([sx, sy, sz], axis=1),
                   ((0, nb * block - n), (0, 0)))
    sm = jnp.pad(smass, (0, nb * block - n))
    bp, bm, _, com, _ = _block_moments(spos, sm, nb, block)
    d = bp - com[:, None, :]
    d2m = jnp.sum(d * d, axis=-1)
    rad = jnp.sqrt(jnp.max(jnp.where(bm > 0, d2m, 0.0), axis=1))  # (nb,)
    d2 = (
        jnp.sum(com * com, axis=1)[:, None]
        + jnp.sum(com * com, axis=1)[None, :]
        - 2.0 * jnp.matmul(com, com.T, precision=_HI)
    )
    sep2 = jnp.maximum(d2, 0.0) / jnp.maximum(
        (rad[:, None] + rad[None, :]) ** 2, 1e-30
    )
    # Straggler guard: a block that spans a Morton-curve jump has members
    # far from its own COM, so *its members'* spatial neighbors are not
    # captured by any block-level criterion — but Morton locality puts them
    # in curve-adjacent blocks. Force the +-_ADJ structural window into the
    # near set (sep -1 sorts ahead of every real pair), criterion fills the
    # remaining slots. No duplicates: forcing replaces, not appends.
    ii = jnp.arange(nb)
    adj = jnp.abs(ii[:, None] - ii[None, :]) <= min(_ADJ, (n_near - 1) // 2)
    sep2 = jnp.where(adj, -1.0, sep2)
    sel, _ = _select_k(sep2, n_near)
    return BHPartition(sorted_gid=sg_p, near=sel, inv_rank=inv_rank)


def _multipole_acc(q, com, msum, quad, g, eps2):
    """Softened monopole+quadrupole pull of blocks on rows ``q``.

    :param q: (P, 3); :param com: (K, 3); :param msum: (K,);
    :param quad: (K, 3, 3) traceless quadrupoles.
    :return: (P, 3). Materialises (P, K, 3) — callers chunk P.
    """
    r = q[:, None, :] - com[None, :, :]  # (P, K, 3)
    s2 = jnp.sum(r * r, axis=-1) + eps2  # (P, K)
    inv = jax.lax.rsqrt(jnp.maximum(s2, _D2_FLOOR))
    inv2 = inv * inv
    inv3 = inv * inv2
    inv5 = inv3 * inv2
    inv7 = inv5 * inv2
    # HIGHEST precision: this term must cancel exactly against the near
    # set's contribution computed elsewhere (kernel or einsum); TPU default
    # precision would round Q·r to bf16 and leave a large-term residual
    qr = jnp.einsum("pkd,kde->pke", r, quad, precision=_HI)  # (P, K, 3)
    rqr = jnp.sum(qr * r, axis=-1)  # (P, K)
    acc = (
        -(msum[None, :] * inv3)[..., None] * r
        + inv5[..., None] * qr
        - (2.5 * rqr * inv7)[..., None] * r
    )
    return g * jnp.sum(acc, axis=1)


def _multipole_kernel(scal_ref, q_ref, blkT_ref, acc_ref):
    """One (i, k) tile of the monopole+quadrupole far field.

    scal_ref:  SMEM (2,) float32 = [g_const, eps^2]
    q_ref:     VMEM (TI, 3)  receiver positions
    blkT_ref:  VMEM (10, TK) block data, lane-major rows:
               [com_x, com_y, com_z, msum, Qxx, Qyy, Qzz, Qxy, Qxz, Qyz]
               (zero-msum/zero-Q padding contributes nothing)
    acc_ref:   VMEM (TI, 3)  accumulated over the k grid dimension
    """
    k = pl.program_id(1)
    g = scal_ref[0]
    eps2 = scal_ref[1]

    rx = q_ref[:, 0:1] - blkT_ref[0:1, :]  # (TI, TK) r = q - com
    ry = q_ref[:, 1:2] - blkT_ref[1:2, :]
    rz = q_ref[:, 2:3] - blkT_ref[2:3, :]
    m = blkT_ref[3:4, :]
    qxx, qyy, qzz = blkT_ref[4:5, :], blkT_ref[5:6, :], blkT_ref[6:7, :]
    qxy, qxz, qyz = blkT_ref[7:8, :], blkT_ref[8:9, :], blkT_ref[9:10, :]

    s2 = rx * rx + ry * ry + rz * rz + eps2
    inv = jax.lax.rsqrt(jnp.maximum(s2, _D2_FLOOR))
    inv2 = inv * inv
    inv3 = inv * inv2
    inv5 = inv3 * inv2
    inv7 = inv5 * inv2

    qr_x = qxx * rx + qxy * ry + qxz * rz
    qr_y = qxy * rx + qyy * ry + qyz * rz
    qr_z = qxz * rx + qyz * ry + qzz * rz
    rqr = qr_x * rx + qr_y * ry + qr_z * rz

    cr = -m * inv3 - 2.5 * rqr * inv7  # radial coefficient
    ax = jnp.sum(cr * rx + inv5 * qr_x, axis=1, keepdims=True)
    ay = jnp.sum(cr * ry + inv5 * qr_y, axis=1, keepdims=True)
    az = jnp.sum(cr * rz + inv5 * qr_z, axis=1, keepdims=True)
    part = g * jnp.concatenate([ax, ay, az], axis=1)  # (TI, 3)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] = acc_ref[:] + part


@partial(jax.jit, static_argnames=("tile_i", "tile_k", "interpret"))
def pallas_multipole_acc(q, com, msum, quad, g, eps2, tile_i: int = 256,
                         tile_k: int = 512, interpret: bool = False):
    """Softened monopole+quadrupole pull of all (com, msum, quad) blocks on
    rows ``q`` — the Pallas twin of :func:`_multipole_acc` (streamed (TI,TK)
    tiles; no (P, K, 3) HBM intermediates).

    :param q: (P, 3); :param com: (K, 3); :param msum: (K,);
    :param quad: (K, 3, 3) symmetric traceless quadrupoles.
    :return: (P, 3).
    """
    from nbody_tpu.ops.pairwise import _round_up

    p_, k_ = q.shape[0], com.shape[0]
    ti = min(tile_i, _round_up(p_, 8))
    tk = min(tile_k, _round_up(k_, 128))
    p_pad = -(-p_ // ti) * ti
    k_pad = -(-k_ // tk) * tk
    if p_pad != p_:
        q = jnp.pad(q, ((0, p_pad - p_), (0, 0)))
    blkT = jnp.stack([
        com[:, 0], com[:, 1], com[:, 2], msum,
        quad[:, 0, 0], quad[:, 1, 1], quad[:, 2, 2],
        quad[:, 0, 1], quad[:, 0, 2], quad[:, 1, 2],
    ])  # (10, K)
    if k_pad != k_:
        blkT = jnp.pad(blkT, ((0, 0), (0, k_pad - k_)))
    scal = jnp.stack([jnp.asarray(g, jnp.float32),
                      jnp.asarray(eps2, jnp.float32)])
    out = pl.pallas_call(
        _multipole_kernel,
        grid=(p_pad // ti, k_pad // tk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ti, 3), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10, tk), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, 3), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, 3), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=45 * p_pad * k_pad,
            bytes_accessed=k_pad * 40 * (p_pad // ti) + p_pad * 12,
            transcendentals=p_pad * k_pad,
        ),
        interpret=interpret,
    )(scal, q, blkT)
    return out[:p_]


@partial(jax.jit,
         static_argnames=("n_near", "block", "i_chunk", "near_impl"))
def bh_accelerations(
    pos: jax.Array,
    mass: jax.Array,
    g_const: float,
    softening: float,
    partition: Optional[BHPartition] = None,
    n_near: int = 16,
    block: int = 256,
    i_chunk: int = 8,
    near_impl: str = "auto",
) -> jax.Array:
    """Approximate softened gravitational accelerations, O(N·(M·B + N/B)).

    :param partition: reusable (possibly stale) :class:`BHPartition`; built
        fresh from ``pos`` when None. Moments/distances always use fresh
        positions.
    :param i_chunk: receiver blocks per ``lax.map`` step (memory knob: the
        (i_chunk·B, M·B) distance tile is the peak intermediate).
    :param near_impl: exact near-pass backend — "pallas" (the tiled VPU
        force kernel of ``ops/pairwise.py`` vmapped over receiver blocks;
        the K=3/N=3 norm-expansion einsums of the XLA path are the measured
        bottleneck at 100k), "xla", "pallas_interpret" (kernel-on-CPU
        testing), or "auto" (pallas on TPU, xla elsewhere).
    :return: (N, 3) accelerations.
    """
    if near_impl == "auto":
        near_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    n = pos.shape[0]
    if partition is None:
        partition = build_bh_partition(pos, mass, n_near=n_near, block=block)
    nb = partition.near.shape[0]

    spos, sm = _gather_sorted(pos, mass, partition)
    acc = bh_sorted_range_acc(
        spos, sm, partition.near, g_const, softening, jnp.int32(0), nb,
        i_chunk=i_chunk, near_impl=near_impl,
    )
    # back to original row order; pad slots (gid == n) sort last and drop
    return _unsort_acc(acc, partition.sorted_gid, n)


@partial(jax.jit,
         static_argnames=("nbl", "i_chunk", "near_impl"))
def bh_sorted_range_acc(
    spos: jax.Array,
    sm: jax.Array,
    near: jax.Array,
    g_const,
    softening,
    blk0,
    nbl: int,
    i_chunk: int = 8,
    near_impl: str = "xla",
) -> jax.Array:
    """Accelerations for the ``nbl`` receiver blocks starting at traced
    block index ``blk0``, in sorted order — the shardable core of
    :func:`bh_accelerations` (``parallel.bh`` splits receiver blocks across
    the mesh; every device runs this on the gathered sorted arrays).

    :param spos/sm: (nb*B,) sorted positions/masses (zero-mass pads ok).
    :param near: (nb, M) near sets for ALL blocks.
    :return: (nbl*B, 3) accelerations of the receiver range.
    """
    nb, m = near.shape
    b = spos.shape[0] // nb
    g = jnp.asarray(g_const, spos.dtype)
    eps2 = jnp.asarray(softening, spos.dtype) ** 2
    blk_pos, blk_m, msum, com, quad = _block_moments(spos, sm, nb, b)

    def rng(x):
        return jax.lax.dynamic_slice_in_dim(x, blk0, nbl, axis=0)

    q_blocks = rng(blk_pos)  # (nbl, B, 3) receiver rows
    near_r = rng(near)  # (nbl, M)

    nc = -(-nbl // i_chunk)
    pad = nc * i_chunk - nbl

    def pad0(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    # candidate data is gathered per chunk inside the lax.map below — the
    # full (nbl, M*B, .) gather would dwarf the documented (i_chunk*B, M*B)
    # peak intermediate (~200 MB at 1M bodies)
    q_c = pad0(q_blocks).reshape(nc, i_chunk * b, 3)
    near_c = pad0(near_r).reshape(nc, i_chunk, m)

    use_pallas = near_impl in ("pallas", "pallas_interpret")
    interpret = near_impl == "pallas_interpret"
    if use_pallas:
        # far field for the whole receiver range in one streamed kernel
        # launch (no (P, K, 3) intermediates), outside the chunked near loop
        far_all = pallas_multipole_acc(
            q_blocks.reshape(nbl * b, 3), com, msum, quad, g, eps2,
            interpret=interpret,
        ).reshape(nbl, b, 3)
        far_all = jnp.pad(far_all, ((0, pad), (0, 0), (0, 0))).reshape(
            nc, i_chunk * b, 3)

    def chunk_fn(args):
        if use_pallas:
            q_flat, nearc, far = args
        else:
            q_flat, nearc = args
            # far field: ALL blocks' multipoles on this chunk's particles
            far = _multipole_acc(q_flat, com, msum, quad, g, eps2)
        c = blk_pos[nearc].reshape(i_chunk, m * b, 3)
        w_m = blk_m[nearc].reshape(i_chunk, m * b)
        ncom = com[nearc]  # (i_chunk, M, 3)
        nmsum = msum[nearc]  # (i_chunk, M)
        nquad = quad[nearc]  # (i_chunk, M, 3, 3)

        # near field: exact pairs minus the near blocks' multipoles
        q = q_flat.reshape(i_chunk, b, 3)
        if use_pallas:
            from nbody_tpu.ops.pairwise import pallas_partial_accelerations

            # self-pairs need no masking (zero displacement => zero force):
            # diag_delta beyond every local row-col offset disables the mask
            a_exact = jax.vmap(
                lambda qb, cb, mb: pallas_partial_accelerations(
                    qb, cb, mb, g, jnp.sqrt(eps2),
                    diag_delta=m * b + b + 1,
                    interpret=interpret,
                )
            )(q, c, w_m)
        else:
            d2 = (
                jnp.sum(q * q, axis=-1)[..., None]
                + jnp.sum(c * c, axis=-1)[:, None, :]
                - 2.0 * jnp.einsum("ibd,icd->ibc", q, c, precision=_HI)
            )
            inv = jax.lax.rsqrt(
                jnp.maximum(jnp.maximum(d2, 0.0) + eps2, _D2_FLOOR))
            w = w_m[:, None, :] * (inv * inv * inv)  # (i_chunk, B, M*B)
            a_exact = g * (
                jnp.einsum("ibc,icd->ibd", w, c, precision=_HI)
                - q * jnp.sum(w, axis=-1, keepdims=True)
            )

        ncom_g = ncom
        nquad_g = nquad
        if use_pallas:
            # same kernel as the far pass: the near blocks' multipoles then
            # cancel against their far-pass contribution at rounding level
            a_nm = jax.vmap(
                lambda qb, cb, mb, Qb: pallas_multipole_acc(
                    qb, cb, mb, Qb, g, eps2, interpret=interpret)
            )(q, ncom_g, nmsum, nquad_g)
        else:
            # same arithmetic as the far pass (_multipole_acc) so the near
            # blocks' contributions cancel at rounding level
            a_nm = jax.vmap(
                lambda qb, cb, mb, Qb: _multipole_acc(qb, cb, mb, Qb, g, eps2)
            )(q, ncom_g, nmsum, nquad_g)
        return (far.reshape(i_chunk, b, 3) + a_exact - a_nm).reshape(
            i_chunk * b, 3
        )

    xs = (q_c, near_c)
    if use_pallas:
        xs = xs + (far_all,)
    return jax.lax.map(chunk_fn, xs).reshape(
        nc * i_chunk * b, 3)[: nbl * b]
