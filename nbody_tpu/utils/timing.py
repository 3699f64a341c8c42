"""Honest device timing.

The reference wraps hot sections in ``time.time()`` pairs
(``simulation.py:127-129``, ``gnn.py:196-198``, ``trainer.py:238-241``) —
valid on synchronous CPU torch. Under JAX's async dispatch a timer must end
with a *completed readback*: on tunneled backends (axon) even
``block_until_ready`` returns at dispatch-accept, under-reporting by orders
of magnitude. These helpers always close the timing region with a scalar
device_get.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

_sum = jax.jit(lambda t: jnp.sum(t))


def fetch_scalar(x) -> float:
    """Force completion of ``x`` via an on-device reduce + scalar readback."""
    return float(jax.device_get(_sum(x)))


def device_time(fn: Callable[[], object]) -> Tuple[object, float]:
    """Run ``fn`` and return (result, seconds) with a completion-honest timer.

    The first pytree leaf of the result is reduced and fetched inside the
    timed region.
    """
    t0 = time.perf_counter()
    out = fn()
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        fetch_scalar(leaves[0])
    return out, time.perf_counter() - t0
