"""Direct-sum gravitational forces and energies (dense XLA reference path).

Physics semantics match the reference engine
(``/root/reference/src/galaxify/simulation.py:71-115``):

    a_i = G * sum_{j != i} m_j * (r_j - r_i) / (|r_j - r_i|^2 + eps^2)^(3/2)
    K   = sum_i 1/2 m_i |v_i|^2
    U   = -G * sum_{i<j} m_i m_j / (|r_i - r_j| + eps)

This module is the *dense* O(N^2) path used for tests and small N; the hot
path for large N is the Pallas tiled kernel in ``nbody_tpu.ops.pairwise`` and
the multi-device ring in ``nbody_tpu.parallel.ring`` — all three agree
numerically (see tests/test_forces.py).

The contraction sum_j W_ij (r_j - r_i) is expressed as
``W @ pos - pos * rowsum(W)`` so XLA runs it on the MXU instead of reducing a
materialised (N, N, 3) tensor.

All functions take an optional validity ``mask`` so padded particle slots
(TPU static shapes) contribute nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _pairwise_d2(pos):
    """(N, N) squared distances via exact displacement differences.

    Exact subtraction (no |a|^2+|b|^2-2ab cancellation) to match the
    reference's broadcasted-diff numerics (``simulation.py:80-82``).
    """
    diff = pos[None, :, :] - pos[:, None, :]
    return jnp.sum(diff * diff, axis=-1)


def _interaction_weights(pos, mass, softening, mask=None):
    """(N, N) matrix W_ij = m_j / (|r_j - r_i|^2 + eps^2)^{3/2}, zero diagonal.

    Uses rsqrt^3 instead of pow(-1.5) (cheaper on the VPU).
    """
    n = pos.shape[0]
    d2 = _pairwise_d2(pos) + jnp.asarray(softening, pos.dtype) ** 2
    inv_d = jax.lax.rsqrt(d2)
    inv_d3 = inv_d * inv_d * inv_d
    eye = jnp.eye(n, dtype=bool)
    w = jnp.where(eye, 0.0, inv_d3) * mass[None, :]
    if mask is not None:
        w = w * mask[None, :].astype(w.dtype)
    return w


def pairwise_accelerations(pos, mass, g_const, softening, mask=None):
    """Softened direct-sum gravitational accelerations (reference
    ``simulation.py:71-89``), O(N^2), MXU contraction.

    :param pos: (N, 3) positions.
    :param mass: (N,) masses.
    :param mask: optional (N,) bool/0-1 validity for padded slots.
    :return: (N, 3) accelerations.
    """
    w = _interaction_weights(pos, mass, softening, mask)
    acc = jnp.asarray(g_const, pos.dtype) * (
        jnp.matmul(w, pos, precision=_HI)
        - pos * jnp.sum(w, axis=1, keepdims=True)
    )
    if mask is not None:
        acc = acc * mask[:, None].astype(acc.dtype)
    return acc


def kinetic_energy(vel, mass, mask=None):
    """Total kinetic energy sum(1/2 m |v|^2) (reference ``simulation.py:100-101``)."""
    k = 0.5 * mass * jnp.sum(vel * vel, axis=-1)
    if mask is not None:
        k = k * mask.astype(k.dtype)
    return jnp.sum(k)


# Above this size the dense (N, N) energy matrix stops fitting; stream row
# chunks instead (exact, O(chunk * N) memory).
_ENERGY_CHUNK_THRESHOLD = 4096
_ENERGY_CHUNK = 1024


def potential_energy(pos, mass, g_const, softening, mask=None, chunk_size=None):
    """Total pairwise potential energy (reference ``simulation.py:104-113``):

        U = -G * sum_{i<j} m_i m_j / (|r_i - r_j| + eps)

    Note the reference softens PE by *adding eps to the distance* (not in
    quadrature); we reproduce that choice exactly. Large N automatically
    streams row chunks so the (N, N) pair matrix is never materialised.
    """
    n = pos.shape[0]
    if chunk_size is None:
        chunk_size = n if n <= _ENERGY_CHUNK_THRESHOLD else _ENERGY_CHUNK
    if chunk_size < n:
        return _potential_energy_chunked(
            pos, mass, g_const, softening, mask, chunk_size
        )
    dist = jnp.sqrt(_pairwise_d2(pos)) + jnp.asarray(softening, pos.dtype)
    mm = mass[:, None] * mass[None, :]
    if mask is not None:
        m01 = mask.astype(pos.dtype)
        mm = mm * m01[:, None] * m01[None, :]
    # strict upper triangle == each unordered pair once (simulation.py:113)
    iu = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    pair = jnp.where(iu, -mm / dist, 0.0)
    return jnp.asarray(g_const, pos.dtype) * jnp.sum(pair)


def _potential_energy_chunked(pos, mass, g_const, softening, mask, chunk_size):
    """Row-chunk streamed PE: each chunk contributes its strict-upper-triangle
    pairs against the full particle set (global column > global row)."""
    n = pos.shape[0]
    n_pad = -(-n // chunk_size) * chunk_size
    posp = jnp.pad(pos, ((0, n_pad - n), (0, 0)))
    massp = jnp.pad(mass, (0, n_pad - n))
    if mask is not None:
        massp = massp * jnp.pad(mask.astype(mass.dtype), (0, n_pad - n))
    eps = jnp.asarray(softening, pos.dtype)
    cols = jnp.arange(n)

    def one_chunk(start):
        rows = start + jnp.arange(chunk_size)
        pr = jax.lax.dynamic_slice(posp, (start, 0), (chunk_size, 3))
        mr = jax.lax.dynamic_slice(massp, (start,), (chunk_size,))
        sqr = jnp.sum(pr * pr, axis=-1)
        sq = jnp.sum(pos * pos, axis=-1)
        d2 = (
            sqr[:, None]
            + sq[None, :]
            - 2.0 * jnp.matmul(pr, pos.T, precision=_HI)
        )
        dist = jnp.sqrt(jnp.maximum(d2, 0.0)) + eps
        mm = mr[:, None] * (massp[:n])[None, :]
        upper = cols[None, :] > rows[:, None]
        return jnp.sum(jnp.where(upper, -mm / dist, 0.0))

    starts = jnp.arange(n_pad // chunk_size) * chunk_size
    partials = jax.lax.map(one_chunk, starts)
    return jnp.asarray(g_const, pos.dtype) * jnp.sum(partials)


def energies(pos, vel, mass, g_const, softening, mask=None):
    """(U, K) tuple, matching ``BaseSimulator.compute_energies``."""
    return (
        potential_energy(pos, mass, g_const, softening, mask),
        kinetic_energy(vel, mass, mask),
    )
