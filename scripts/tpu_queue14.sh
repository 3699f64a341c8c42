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

echo "--- job 3: profile the 1M surrogate forward (where do 521 ms go?) ---"
timeout 1500 python - <<'PYEOF'
import glob, gzip, json, os
import jax, jax.numpy as jnp
from collections import defaultdict
from nbody_tpu.ics import generate_spiral
from nbody_tpu.models import GraphModel
from nbody_tpu.train.graphs import build_graph
from nbody_tpu.utils.compile_cache import enable_persistent_cache
from nbody_tpu.utils.timing import device_time
enable_persistent_cache()
n = 1_000_000
pos, vel, mass = generate_spiral(jax.random.PRNGKey(0), n)
model = GraphModel(input_dim=4, gnn_dim=64, message_passing_steps=2,
                  aggr="mean", neighbors=8, scale_factor=1e6,
                  knn_method="morton", knn_impl="pallas",
                  fused_edgeconv=True)
x = jnp.concatenate([pos, vel, mass[:, None]], -1)[None]
idx, valid = build_graph(model.graph_spec, x[..., :3])
variables = jax.jit(model.init)(jax.random.PRNGKey(1), x, idx, valid)
fwd = jax.jit(lambda x, idx, valid: model.apply(variables, x, idx, valid,
                                                train=False))
out = fwd(x, idx, valid); device_time(lambda: out)
_, el = device_time(lambda: fwd(x, idx, valid))
print("1M fwd ms:", el * 1e3, flush=True)
tdir = "/tmp/prof_1m"
with jax.profiler.trace(tdir):
    o = fwd(x, idx, valid)
    float(jax.device_get(jnp.sum(o)))
tot = defaultdict(float)
for f in glob.glob(tdir + "/**/*.trace.json.gz", recursive=True):
    ev = json.load(gzip.open(f))["traceEvents"]
    for e in ev:
        if e.get("ph") == "X" and not e.get("name", "$").startswith("$"):
            tot[e["name"]] += e.get("dur", 0)
top = sorted(tot.items(), key=lambda kv: -kv[1])[:25]
res = {"fwd_ms": el * 1e3,
       "top_ops_us": [{"name": k[:120], "us": v} for k, v in top]}
with open("results/large_scale/profile_1m_fwd.json", "w") as fo:
    json.dump(res, fo, indent=1)
print(json.dumps(res["top_ops_us"][:10], indent=1), flush=True)
PYEOF
echo "exit=$?"

echo "=== queue14 done $(date) ==="
