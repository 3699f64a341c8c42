"""Shared model plumbing for dense (B, N, k) neighbor representations."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_neighbors(h: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather per-neighbor features: (B, N, d), (B, N, k) -> (B, N, k, d).

    The dense replacement for PyG's ``x[col]`` edge gather (reference
    ``gnn.py`` EdgeConv internals, ``contconv.py:84,92``).
    """
    return jax.vmap(lambda hb, ib: hb[ib])(h, idx)


def select_input_features(x: jax.Array, input_dim: int) -> jax.Array:
    """Reference input slicing (``gnn.py:131-134``, ``contconv.py:219-222``):
    node features are x = [pos(3) | vel(3) | mass(1)]; when the model is
    configured with input_dim == 4 it uses only [pos | mass]."""
    if input_dim == 4:
        return jnp.concatenate([x[..., :3], x[..., 6:]], axis=-1)
    return x


def masked_mse(pred: jax.Array, target: jax.Array, node_mask=None):
    """Mean squared error over valid nodes x output dims — matches
    ``F.mse_loss(pred, y, reduction='mean')`` on an unpadded graph batch."""
    se = (pred - target) ** 2
    if node_mask is None:
        return jnp.mean(se)
    m = node_mask.astype(pred.dtype)[..., None]
    return jnp.sum(se * m) / (jnp.sum(m) * se.shape[-1])


def scaled_rmse_and_mse(pred, target, scale_factor, node_mask=None):
    """The reference's training objective (``gnn.py:150-161``,
    ``contconv.py:236-240``):

        loss = sqrt(mse(pred * s, y * s)) = s * sqrt(mse(pred, y))
        mse  = mse(pred, y)
    """
    mse = masked_mse(pred, target, node_mask)
    loss = jnp.asarray(scale_factor, pred.dtype) * jnp.sqrt(mse)
    return loss, mse
