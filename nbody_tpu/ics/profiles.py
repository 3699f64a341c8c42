"""Radial mass-density profiles (reference ``src/galaxify/galaxies.py:11-51``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def spherical_hernquist_distribution(
    r, r0: float = 1.0, total_mass: float = 1.0, avoid_distance_zero: bool = True
):
    """Hernquist density profile (reference ``galaxies.py:11-51``):

        rho(r) = (total_mass / 2 pi) * r0 / (r * (r0 + r)^3)

    :param r: radial distance(s).
    :param avoid_distance_zero: replace r == 0 with float32 eps (the
        reference's guard at ``galaxies.py:44-45``).
    """
    r = jnp.asarray(r)
    if avoid_distance_zero:
        r = jnp.where(r == 0, jnp.asarray(np.finfo(np.float32).eps, r.dtype), r)
    return (total_mass / (2 * jnp.pi)) * (r0 / (r * (r0 + r) ** 3))
