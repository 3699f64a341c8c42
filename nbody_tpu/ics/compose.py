"""System composition: merge several generated galaxies into one simulation
(e.g. collisions). The reference exposes the building blocks for this —
``generate_disk``'s ``offset``/``initial_vel`` parameters (galaxies.py:79-80,
187-190) — but no combinator; this is the missing piece."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compose(
    *systems: Tuple[jax.Array, jax.Array, jax.Array]
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Concatenate (positions, velocities, masses) triples into one system.

    Example — two-disk collision:

        a = generate_disk(k1, 5000, offset=(-10, 0, 0), initial_vel=(0.001, 0, 0))
        b = generate_disk(k2, 5000, offset=(10, 0, 0), initial_vel=(-0.001, 0, 0))
        pos, vel, mass = compose(a, b)
    """
    if not systems:
        raise ValueError("compose() needs at least one system")
    pos = jnp.concatenate([s[0] for s in systems], axis=0)
    vel = jnp.concatenate([s[1] for s in systems], axis=0)
    mass = jnp.concatenate([s[2] for s in systems], axis=0)
    return pos, vel, mass
