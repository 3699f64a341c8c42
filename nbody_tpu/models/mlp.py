"""Shared MLP block mirroring torch-geometric's ``MLP``: per hidden layer
Linear -> norm -> act -> dropout, plain final layer (PyG ``plain_last=True``
default), tanh activation.

The reference instantiates it twice with different norms: the GNN encoder
passes ``norm=None`` (``gnn.py:56-63``) while the ContConv encoder keeps PyG's
``batch_norm`` default (``contconv.py:135-141``) — both are supported here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def torch_linear_init():
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — PyTorch ``nn.Linear`` default,
    so training dynamics track the reference."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class Dense(nn.Dense):
    """``nn.Dense`` with PyTorch-style default initialisation."""

    kernel_init: nn.initializers.Initializer = torch_linear_init()


class MLP(nn.Module):
    """features = hidden dims + output dim; input dim inferred.

    When ``norm == 'batch_norm'`` the module uses a ``batch_stats`` collection
    (mutable during training) like any flax BatchNorm model.
    """

    features: Sequence[int]
    dropout: float = 0.0
    norm: Optional[str] = None  # None | "batch_norm"
    plain_last: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = Dense(f)(x)
            if not (self.plain_last and i == n - 1):
                if self.norm == "batch_norm":
                    # BatchNorm over all leading axes (nodes), like PyG's
                    # per-feature BatchNorm1d on the flattened node batch.
                    x = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9, epsilon=1e-5
                    )(x)
                x = jnp.tanh(x)
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class OutputHead(nn.Module):
    """The reference's decoder head (``gnn.py:105-114``,
    ``contconv.py:207-216``): plain Linear when no hiddens, otherwise
    Linear/Tanh sandwiches with a plain final Linear (no norm, no dropout).

    ``zero_init`` zero-initialises the final Linear so the model starts at
    pred = 0. The targets (accelerations ~1e-7) are ~5 orders of magnitude
    below a torch-init network's output scale; the reference spends its first
    ~12 epochs collapsing that gap, which can drive BatchNorm biases into
    tanh saturation (observed as a constant-predictor collapse). Divergence
    from the reference's init, strictly better conditioning.
    """

    hiddens: Optional[Sequence[int]]
    output_dim: int
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        if self.hiddens:
            for f in self.hiddens:
                x = jnp.tanh(Dense(f)(x))
        if self.zero_init:
            return nn.Dense(
                self.output_dim, kernel_init=nn.initializers.zeros
            )(x)
        return Dense(self.output_dim)(x)
