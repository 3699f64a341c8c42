"""Spiral-galaxy initial conditions (reference ``src/galaxify/galaxies.py:195-296``),
fully vectorized (the reference loops body-by-body, ``galaxies.py:245-294``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_bodies",))
def generate_spiral(
    key: jax.Array,
    n_bodies: int,
    total_mass: float = 1.0,
    radial_scale: float = 3.0,
    height_scale: float = 0.3,
    g_const: float = 4.5e-6,
    black_hole_mass: float = 0.01,
    n_arms: int = 2,
    pitch_angle: float = -jnp.pi / 6,
    arm_strength: float = 0.3,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Spiral galaxy with a central black hole (reference ``generate_spiral``).

    - radii ~ Gamma(shape=2, scale=radial_scale)            (galaxies.py:255)
    - arm perturbation phi + A sin(n (phi - ln(r/Rd)/tan p)) (galaxies.py:258-267)
    - gaussian z                                            (galaxies.py:272)
    - v_circ from the exponential-disk enclosed mass
      M (1 - e^{-r/Rd}(1 + r/Rd))                           (galaxies.py:278-282)
    - dispersions (0.1, 0.07, 0.05) * v_circ                 (galaxies.py:283-289)
    - uniform star masses                                    (galaxies.py:241-242)

    :return: (positions (N,3), velocities (N,3), masses (N,)) float32.
    """
    k_r, k_phi, k_z, k_vr, k_vphi, k_vz = jax.random.split(key, 6)
    is_star = jnp.arange(n_bodies) != 0  # body 0 = black hole (galaxies.py:227-228)

    # Masses: BH fraction, remainder uniform over stars (galaxies.py:238-242).
    mass_bh = total_mass * black_hole_mass
    star_mass = (total_mass - mass_bh) / jnp.maximum(n_bodies - 1, 1)
    masses = jnp.where(is_star, star_mass, mass_bh).astype(jnp.float32)

    r = jax.random.gamma(k_r, 2.0, (n_bodies,), jnp.float32) * radial_scale
    phi = jax.random.uniform(k_phi, (n_bodies,), jnp.float32, 0.0, 2 * jnp.pi)
    safe_r = jnp.maximum(r, jnp.finfo(jnp.float32).tiny)
    phi_spiral = jnp.where(
        r > 0,
        phi
        + arm_strength
        * jnp.sin(
            n_arms * (phi - jnp.log(safe_r / radial_scale) / jnp.tan(pitch_angle))
        ),
        phi,
    )

    z = jax.random.normal(k_z, (n_bodies,), jnp.float32) * height_scale
    positions = jnp.stack(
        [r * jnp.cos(phi_spiral), r * jnp.sin(phi_spiral), z], axis=1
    )
    positions = jnp.where(is_star[:, None], positions, 0.0)

    # Exponential-disk enclosed mass -> circular velocity (galaxies.py:278-282)
    m_enc = total_mass * (1.0 - jnp.exp(-r / radial_scale) * (1.0 + r / radial_scale))
    v_circ = jnp.where(r < 1e-8, 0.0, jnp.sqrt(g_const * m_enc / safe_r))

    v_R = jax.random.normal(k_vr, (n_bodies,), jnp.float32) * (0.1 * v_circ)
    v_phi = v_circ + jax.random.normal(k_vphi, (n_bodies,), jnp.float32) * (
        0.07 * v_circ
    )
    v_z = jax.random.normal(k_vz, (n_bodies,), jnp.float32) * (0.05 * v_circ)

    velocities = jnp.stack(
        [
            v_R * jnp.cos(phi_spiral) - v_phi * jnp.sin(phi_spiral),
            v_R * jnp.sin(phi_spiral) + v_phi * jnp.cos(phi_spiral),
            v_z,
        ],
        axis=1,
    )
    velocities = jnp.where(is_star[:, None], velocities, 0.0)
    return positions, velocities, masses
