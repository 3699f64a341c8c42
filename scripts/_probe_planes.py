"""Smoke: compiled plane-layout multipole kernels on the real TPU.

Checks the rewritten (3, P)/(K, 10) kernels compile under Mosaic and match
the XLA reference arithmetic at bh2-realistic shapes, and times a full bh2
force eval at 200k to compare against the known-good 31.4 ms @200k tier.
"""
import time

import jax
import jax.numpy as jnp

from nbody_tpu.utils.compile_cache import enable_persistent_cache
from nbody_tpu.utils.timing import fetch_scalar

enable_persistent_cache()

from nbody_tpu.ics import generate_spiral
from nbody_tpu.ops.treeforce import (
    _multipole_acc, pallas_multipole_acc, pallas_grouped_multipole_acc,
    _blkT, bh2_accelerations, build_bh2_partition)

key = jax.random.PRNGKey(0)
P, K, G = 4096, 512, 4
q = jax.random.normal(key, (P, 3))
com = jax.random.normal(jax.random.PRNGKey(1), (K, 3))
msum = jax.random.uniform(jax.random.PRNGKey(2), (K,))
quad = jax.random.normal(jax.random.PRNGKey(3), (K, 3, 3))
quad = quad + jnp.swapaxes(quad, -1, -2)
quad = quad - (jnp.trace(quad, axis1=-2, axis2=-1) / 3.0)[..., None, None] * jnp.eye(3)

ref = jax.jit(_multipole_acc)(q, com, msum, quad, 4.5e-6, 2.5e-3)
got = pallas_multipole_acc(q, com, msum, quad, 4.5e-6, 2.5e-3)
err = float(jax.device_get(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-30)))
print(f"flat kernel rel err vs XLA: {err:.3e}", flush=True)
assert err < 2e-4, err

qg = q.reshape(G, P // G, 3)
blkTg = jnp.broadcast_to(_blkT(com, msum, quad)[None], (G, 10, K))
refg = jax.vmap(lambda qb: jax.jit(_multipole_acc)(qb, com, msum, quad, 4.5e-6, 2.5e-3))(qg)
gotg = pallas_grouped_multipole_acc(qg, blkTg, 4.5e-6, 2.5e-3)
errg = float(jax.device_get(jnp.max(jnp.abs(gotg - refg)) / (jnp.max(jnp.abs(refg)) + 1e-30)))
print(f"grouped kernel rel err vs XLA: {errg:.3e}", flush=True)
assert errg < 2e-4, errg

# full bh2 eval at 200k — end-to-end through both rewritten kernels
n = 200_000
pos, vel, mass = generate_spiral(jax.random.PRNGKey(7), n)
part = build_bh2_partition(pos, mass, n_near=32, block=128, coarse=16, rc=48)
f = jax.jit(lambda p: bh2_accelerations(
    p, mass, 4.5e-6, 0.05, partition=part, n_near=32, block=128,
    coarse=16, rc=48))
fetch_scalar(f(pos))
t0 = time.perf_counter()
outs = [f(pos) for _ in range(20)]
fetch_scalar(outs[-1])
dt = (time.perf_counter() - t0) / 20
print(f"bh2 reused 200k: {dt*1e3:.1f} ms", flush=True)
print("PROBE OK", flush=True)
