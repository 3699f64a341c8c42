import time
import jax, jax.numpy as jnp
print("start", flush=True)
n, k, ci = 100_000, 32, 128
feat = jax.random.normal(jax.random.PRNGKey(0), (n, ci))
feat.block_until_ready(); print("feat ok", flush=True)
idx = jax.random.randint(jax.random.PRNGKey(1), (n, k), 0, n)
cot = jax.random.normal(jax.random.PRNGKey(2), (n, k, ci))
cot.block_until_ready(); print("inputs ok", flush=True)
g = jax.jit(lambda f: jnp.sum(jnp.take(f, idx, axis=0) * cot))
out = g(feat); out.block_until_ready(); print("gather fwd compiled", flush=True)
gb = jax.jit(jax.grad(lambda f: jnp.sum(jnp.take(f, idx, axis=0) * cot)))
out = gb(feat); out.block_until_ready(); print("gather VJP compiled", flush=True)
def timeit(name, fn, *args, reps=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1000:8.2f} ms", flush=True)
timeit("gather fwd+sum", g, feat)
timeit("gather VJP (scatter-add)", gb, feat)
flat = idx.reshape(-1)
order = jnp.argsort(flat)
def seg_grad(f):
    ct = cot.reshape(n * k, ci)[order]
    return jax.ops.segment_sum(ct, flat[order], num_segments=n)
sg = jax.jit(seg_grad)
out = sg(feat); out.block_until_ready(); print("segsum compiled", flush=True)
timeit("segment-sum (presorted)", sg, feat)
