#!/bin/bash
# TPU queue 14 (round 4 continuation) — runs AFTER queue13 (pass queue13's
# pid as $1 to wait for it): the windowed-EdgeConv-kernel benchmarks that
# need the free chip, then the 1M crossover refresh with the new rows.
#   1. 1M surrogate A/B: standard vs Morton-window kernel rollout
#      (f32 + bf16 MXU gather), refresh 8 — the measurement that decides
#      whether the kernel becomes the default large-N rollout path.
#   2. gather/sort microbenchmarks at 1M (documented design numbers).
cd /root/repo
exec > /tmp/tpu_queue14.log 2>&1
set -x
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

echo "=== queue14 start $(date) ==="

echo "--- job 1: 1M windowed-kernel crossover rows ---"
timeout 3000 python -m nbody_tpu.experiments.crossover \
    --n-bodies 1000000 --steps 10 --neighbors 8 --graph-refresh 8 \
    --knn-impl pallas --windowed --only surrogate \
    --out results/large_scale/crossover_window.json
echo "exit=$?"

echo "--- job 2: gather-rate microbench at 1M ---"
timeout 900 python - <<'PYEOF'
import jax, jax.numpy as jnp, json
from nbody_tpu.utils.compile_cache import enable_persistent_cache
from nbody_tpu.utils.timing import device_time
enable_persistent_cache()
key = jax.random.PRNGKey(0)
out = {}
for n in (250_000, 1_000_000):
    k, d = 8, 64
    mk = jax.jit(lambda key: (jax.random.normal(key, (n, d)),
                              jax.random.randint(key, (n, k), 0, n)))
    v, idx = mk(key)
    g = jax.jit(lambda v, idx: v[idx])
    o = g(v, idx); device_time(lambda: o)
    _, el = device_time(lambda: g(v, idx))
    out[f"xla_gather_{n}"] = el * 1e3
    print(n, "gather ms:", el * 1e3, flush=True)
with open("results/large_scale/gather_microbench.json", "w") as f:
    json.dump(out, f, indent=1)
PYEOF
echo "exit=$?"

echo "=== queue14 done $(date) ==="
