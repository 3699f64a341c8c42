"""Whole-trajectory simulation under ``jax.lax.scan`` — the TPU answer to the
reference's per-step Python loop (``/root/reference/src/galaxify/simulation.py:117-146``).

The reference crosses the host/device boundary every step (state snapshot
``.clone().cpu()`` at ``simulation.py:137-139``, ``.item()`` energy readbacks
at ``simulation.py:101,113``). Here the entire rollout — integration, force
evaluation, energy diagnostics — is one compiled XLA program; the trajectory
arrays come back to the host once at the end.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from nbody_tpu.core import forces
from nbody_tpu.core.integrators import INTEGRATORS


@dataclasses.dataclass(frozen=True)
class SimulationConfig:
    """Static simulation parameters (hashable: usable as a jit static arg).

    Mirrors ``BaseSimulator.__init__`` (reference ``simulation.py:21-56``)
    minus the device plumbing — JAX owns placement.
    """

    g_const: float = 1.0
    softening: float = 0.1
    dt: float = 0.01
    integrator: str = "leapfrog"  # "leapfrog" | "euler"  (simulation.py:153-187)
    calc_energy: bool = True
    force_backend: str = "auto"  # "dense"|"pallas"|"bh"|"bh2"|"bh3"|"auto"
    # "bh" knobs (ops/treeforce.py): exact near-set size, Morton block rows,
    # and how often the partition (sort + near sets) is rebuilt — forces are
    # always computed from fresh positions, a stale partition only degrades
    # which blocks are treated exactly (the surrogate's graph_refresh
    # economics applied to the classical engine).
    bh_near: int = 32
    bh_block: int = 256
    bh_refresh: int = 1
    # "bh2" adds a coarse far level (ops/treeforce.py two-level engine):
    # superblocks of bh_coarse fine blocks; bh_rc refined superblocks per
    # receiver group. Drops the O(N * nb) far term by ~bh_coarse at 1M+.
    bh_coarse: int = 16
    bh_rc: int = 32
    # "bh3" sub-refines the near pass (ops/treeforce.py Verlet-list engine):
    # each near block's rows split into sub-blocks of bh_sub_block rows;
    # bh_n_sub of them are evaluated exactly per receiver block, the rest
    # through their own quadrupoles. Cuts the dominant M*B near pairs to
    # K*Bs at the same error knob.
    bh_sub_block: int = 32
    bh_n_sub: int = 24

    def __post_init__(self):
        if self.integrator not in INTEGRATORS:
            raise ValueError(f"unknown integrator {self.integrator!r}")
        if self.force_backend not in ("dense", "pallas", "bh", "bh2",
                                      "bh3", "auto"):
            raise ValueError(f"unknown force backend {self.force_backend!r}")


class Trajectory(NamedTuple):
    """Stacked per-step post-update states — the ``list[SimulationState]`` of
    the reference (``simulation.py:8-18``) as a struct-of-arrays pytree."""

    positions: jax.Array  # (steps, N, 3)
    velocities: jax.Array  # (steps, N, 3)
    accelerations: jax.Array  # (steps, N, 3)
    u_energy: Optional[jax.Array]  # (steps,) or None
    k_energy: Optional[jax.Array]  # (steps,) or None


# Below this particle count the dense XLA path wins (kernel launch overheads);
# above it the Pallas tiled kernel avoids the O(N^2) HBM intermediate.
_PALLAS_AUTO_THRESHOLD = 2048


def make_acc_fn(
    mass: jax.Array,
    config: SimulationConfig,
    mask: Optional[jax.Array] = None,
    n: Optional[int] = None,
) -> Callable[[jax.Array], jax.Array]:
    """Bind masses/constants into a ``pos -> acc`` closure, choosing the
    force backend (dense XLA vs Pallas tiled kernel)."""
    backend = config.force_backend
    if backend == "auto":
        n_eff = n if n is not None else mass.shape[-1]
        on_tpu = jax.default_backend() == "tpu"
        backend = "pallas" if (on_tpu and n_eff >= _PALLAS_AUTO_THRESHOLD) else "dense"

    if backend == "pallas":
        from nbody_tpu.ops.pairwise import pallas_accelerations

        return lambda pos: pallas_accelerations(
            pos, mass, config.g_const, config.softening, mask=mask
        )
    if backend in ("bh", "bh2", "bh3"):
        if mask is not None:
            raise ValueError(f"force_backend={backend!r} does not support masks")
        if backend == "bh3":
            from nbody_tpu.ops.treeforce import bh3_accelerations

            return lambda pos: bh3_accelerations(
                pos, mass, config.g_const, config.softening,
                n_near=config.bh_near, block=config.bh_block,
                coarse=config.bh_coarse, rc=config.bh_rc,
                sub_block=config.bh_sub_block, n_sub=config.bh_n_sub,
            )
        if backend == "bh2":
            from nbody_tpu.ops.treeforce import bh2_accelerations

            return lambda pos: bh2_accelerations(
                pos, mass, config.g_const, config.softening,
                n_near=config.bh_near, block=config.bh_block,
                coarse=config.bh_coarse, rc=config.bh_rc,
            )
        from nbody_tpu.ops.treeforce import bh_accelerations

        return lambda pos: bh_accelerations(
            pos, mass, config.g_const, config.softening,
            n_near=config.bh_near, block=config.bh_block,
        )
    return lambda pos: forces.pairwise_accelerations(
        pos, mass, config.g_const, config.softening, mask=mask
    )


def _resolve_backend(config: SimulationConfig, n: int) -> str:
    if config.force_backend != "auto":
        return config.force_backend
    on_tpu = jax.default_backend() == "tpu"
    return "pallas" if (on_tpu and n >= _PALLAS_AUTO_THRESHOLD) else "dense"


def make_energy_fn(mass, config: SimulationConfig, mask=None, n=None):
    """(pos, vel) -> (U, K); uses the Pallas PE kernel on the same backend
    decision as the forces (dense/chunked XLA otherwise). Energies are always
    exact — the "bh" force backend has no approximate-energy counterpart, so
    it maps to the exact kernel of its platform."""
    backend = _resolve_backend(config, n if n is not None else mass.shape[-1])
    if backend in ("bh", "bh2", "bh3"):
        backend = "pallas" if jax.default_backend() == "tpu" else "dense"
    if backend == "pallas":
        from nbody_tpu.ops.pairwise import pallas_potential_energy

        def fn(pos, vel):
            u = pallas_potential_energy(
                pos, mass, config.g_const, config.softening, mask=mask
            )
            return u, forces.kinetic_energy(vel, mass, mask)

        return fn
    return lambda pos, vel: forces.energies(
        pos, vel, mass, config.g_const, config.softening, mask=mask
    )


@partial(jax.jit, static_argnames=("steps", "config"))
def simulate(
    pos: jax.Array,
    vel: jax.Array,
    mass: jax.Array,
    steps: int,
    config: SimulationConfig,
    mask: Optional[jax.Array] = None,
) -> Trajectory:
    """Run ``steps`` integration steps and return the stacked trajectory.

    Equivalent to ``BaseSimulator.run(steps)`` (reference
    ``simulation.py:117-146``): the ctor's initial force evaluation
    (``simulation.py:69``) seeds the carry, then each step applies the
    integrator and (optionally) the O(N^2) energy diagnostics.

    :param pos: (N, 3) float32 initial positions.
    :param vel: (N, 3) float32 initial velocities.
    :param mass: (N,) float32 masses.
    :param mask: optional (N,) validity mask for padded slots.
    """
    pos = jnp.asarray(pos, jnp.float32)
    vel = jnp.asarray(vel, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)

    acc_fn = make_acc_fn(mass, config, mask=mask, n=pos.shape[0])
    energy_fn = make_energy_fn(mass, config, mask=mask, n=pos.shape[0])
    step_fn = INTEGRATORS[config.integrator]
    dt = jnp.float32(config.dt)

    def outputs(p, v, a):
        if config.calc_energy:
            u, k = energy_fn(p, v)
        else:
            u = k = jnp.float32(0)
        return (p, v, a, u, k)

    backend = _resolve_backend(config, pos.shape[0])
    if backend in ("bh", "bh2", "bh3") and config.bh_refresh > 1:
        # carry the Morton partition; rebuild it every bh_refresh steps
        if backend == "bh3":
            from nbody_tpu.ops.treeforce import (
                bh3_accelerations as _bh_acc,
                build_bh3_partition)

            def build(p):
                return build_bh3_partition(
                    p, mass, n_near=config.bh_near, block=config.bh_block,
                    coarse=config.bh_coarse, rc=config.bh_rc,
                    sub_block=config.bh_sub_block, n_sub=config.bh_n_sub)
        elif backend == "bh2":
            from nbody_tpu.ops.treeforce import (
                bh2_accelerations as _bh_acc,
                build_bh2_partition)

            def build(p):
                return build_bh2_partition(
                    p, mass, n_near=config.bh_near, block=config.bh_block,
                    coarse=config.bh_coarse, rc=config.bh_rc)
        else:
            from nbody_tpu.ops.treeforce import (
                bh_accelerations as _bh_acc,
                build_bh_partition)

            def build(p):
                return build_bh_partition(
                    p, mass, n_near=config.bh_near, block=config.bh_block)

        def body(carry, i):
            p, v, a, part = carry
            # i > 0: part0 was just built from these exact positions, so a
            # rebuild at the first step would be a wasted sort + near pass
            part = jax.lax.cond(
                (i % config.bh_refresh == 0) & (i > 0),
                build, lambda _: part, p)
            bh_fn = lambda q: _bh_acc(  # noqa: E731
                q, mass, config.g_const, config.softening, partition=part)
            p, v, a = step_fn(p, v, a, bh_fn, dt)
            return (p, v, a, part), outputs(p, v, a)

        part0 = build(pos)
        acc0 = _bh_acc(
            pos, mass, config.g_const, config.softening, partition=part0)
        _, (ps, vs, accs, us, ks) = jax.lax.scan(
            body, (pos, vel, acc0, part0), jnp.arange(steps))
    else:
        def body(carry, _):
            p, v, a = carry
            p, v, a = step_fn(p, v, a, acc_fn, dt)
            return (p, v, a), outputs(p, v, a)

        acc0 = acc_fn(pos)
        _, (ps, vs, accs, us, ks) = jax.lax.scan(
            body, (pos, vel, acc0), None, length=steps
        )
    if not config.calc_energy:
        us = ks = None
    return Trajectory(ps, vs, accs, us, ks)
