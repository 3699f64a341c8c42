"""Scatter-add (gather VJP) vs presorted segment-sum on TPU — decides
whether a segment-sum custom VJP for the surrogate neighbor gathers is
worth building. All inputs are created INSIDE jit (eager ops on the
tunneled backend stage GB-scale host buffers per RPC); timings use the
async-dispatch chain + forced scalar readback."""
import time

import jax
import jax.numpy as jnp

from nbody_tpu.utils.timing import fetch_scalar

n, k, ci = 100_000, 32, 128


@jax.jit
def make():
    feat = jax.random.normal(jax.random.PRNGKey(0), (n, ci))
    idx = jax.random.randint(jax.random.PRNGKey(1), (n, k), 0, n)
    cot = jax.random.normal(jax.random.PRNGKey(2), (n, k, ci))
    order = jnp.argsort(idx.reshape(-1))
    return feat, idx, cot, order


feat, idx, cot, order = make()
fetch_scalar(feat)
print("inputs ok", flush=True)


def chain(name, fn, *args, reps=10):
    fetch_scalar(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    fetch_scalar(outs[-1])
    print(f"{name:44s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms",
          flush=True)


g = jax.jit(lambda f, i, c: jnp.sum(jnp.take(f, i, axis=0) * c))
chain("gather fwd+sum", g, feat, idx, cot)

gb = jax.jit(jax.grad(lambda f, i, c: jnp.sum(jnp.take(f, i, axis=0) * c)))
chain("gather VJP (scatter-add)", gb, feat, idx, cot)


@jax.jit
def seg_grad(c, i, o):
    ct = c.reshape(n * k, ci)[o]
    return jax.ops.segment_sum(ct, i.reshape(-1)[o], num_segments=n)


chain("segment-sum grad (presorted order)", seg_grad, cot, idx, order)
print("done", flush=True)
