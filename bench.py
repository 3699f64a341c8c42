#!/usr/bin/env python3
"""Headline benchmark: 10k-body direct-sum leapfrog rollout throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (CPU, single device) measures ~2.9 ms/step at 500
bodies (BASELINE.md, figures/stepwise_time.png). Direct summation scales
O(N^2), so its derived 10k-body throughput is
    500 / 2.9e-3 * (500/10000)^2 * (10000/500) = 10000 / (2.9e-3 * 400)
    ~= 8.62e3 particle-steps/sec.
``vs_baseline`` is our measured particle-steps/sec over that number.
"""

import json
import time

import jax

N_BODIES = 10_000
STEPS = 200
BASELINE_PSTEPS = 500 / 2.9e-3 / (N_BODIES / 500)  # O(N^2)-scaled CPU reference


def main():
    from nbody_tpu.core.simulate import SimulationConfig, simulate
    from nbody_tpu.ics import generate_spiral
    from nbody_tpu.utils.compile_cache import enable_persistent_cache
    from nbody_tpu.utils.timing import fetch_scalar as _sync

    enable_persistent_cache()

    key = jax.random.PRNGKey(0)
    pos, vel, mass = generate_spiral(key, N_BODIES)
    cfg = SimulationConfig(
        g_const=4.5e-6,
        softening=0.05,
        dt=1e-4,
        integrator="leapfrog",
        calc_energy=False,
        force_backend="auto",
    )

    # compile + warm (first compile of the scanned Pallas rollout is slow)
    _sync(simulate(pos, vel, mass, STEPS, cfg).positions)

    t0 = time.perf_counter()
    traj = simulate(pos, vel, mass, STEPS, cfg)
    _sync(traj.positions)
    elapsed = time.perf_counter() - t0

    psteps = N_BODIES * STEPS / elapsed
    print(
        json.dumps(
            {
                "metric": f"direct-sum leapfrog rollout throughput ({N_BODIES} bodies, {STEPS} steps)",
                "value": round(psteps, 1),
                "unit": "particle-steps/sec",
                "vs_baseline": round(psteps / BASELINE_PSTEPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
