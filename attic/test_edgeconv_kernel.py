"""Parity tests for the windowed EdgeConv message kernel (interpret mode
on CPU; the real-TPU compile is exercised by the rollout benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.ops.edgeconv_kernel import (
    edge_message_sum,
    plan_windowed_gather,
    windowed_tanh_sum,
)

TILE, HALF = 256, 128


def _ref(u, v, idx, valid):
    msg = jnp.tanh(u[:, None, :] + v[idx])
    return jnp.sum(jnp.where(valid[:, :, None], msg, 0.0), axis=1)


def _graph(key, n, k, spread, d=64):
    ku, kv, ki, km = jax.random.split(key, 4)
    u = jax.random.normal(ku, (n, d))
    v = jax.random.normal(kv, (n, d))
    rows = jnp.arange(n)[:, None]
    off = jax.random.randint(ki, (n, k), -spread, spread + 1)
    idx = jnp.clip(rows + off, 0, n - 1).astype(jnp.int32)
    valid = jax.random.bernoulli(km, 0.9, (n, k))
    return u, v, idx, valid


def test_windowed_kernel_matches_reference_in_window():
    n, k = 512, 8
    u, v, idx, valid = _graph(jax.random.PRNGKey(0), n, k, spread=HALF - 1)
    plan = plan_windowed_gather(idx, valid, tile=TILE, half=HALF)
    # near-diagonal graph: every valid edge is kernel-owned
    assert int(plan.overflow) == 0
    assert bool(jnp.all(plan.in_mask == valid))
    vpad = jnp.pad(v, ((HALF, HALF), (0, 0)))
    out = windowed_tanh_sum(u, vpad, idx, plan.in_mask, tile=TILE,
                            half=HALF, interpret=True)
    np.testing.assert_allclose(out, _ref(u, v, idx, valid), rtol=2e-6,
                               atol=2e-6)


def test_edge_message_sum_with_fallback_edges():
    n, k = 512, 8
    key = jax.random.PRNGKey(1)
    u, v, idx, valid = _graph(key, n, k, spread=HALF - 1)
    # rewire 20% of edges to arbitrary far rows (the 4-copy union tail)
    kf, kw = jax.random.split(key)
    far = jax.random.randint(kf, (n, k), 0, n).astype(jnp.int32)
    take_far = jax.random.bernoulli(kw, 0.2, (n, k))
    idx = jnp.where(take_far, far, idx)

    plan = plan_windowed_gather(idx, valid, tile=TILE, half=HALF)
    assert int(plan.overflow) == 0
    assert int(jnp.sum(plan.fb_valid)) > 0  # fallback actually exercised
    out = edge_message_sum(u, v, idx, plan, tile=TILE, half=HALF,
                           interpret=True)
    np.testing.assert_allclose(out, _ref(u, v, idx, valid), rtol=2e-6,
                               atol=2e-6)


def test_plan_budget_overflow_is_reported():
    n, k = 512, 8
    _, _, idx, valid = _graph(jax.random.PRNGKey(2), n, k, spread=HALF - 1)
    far = (jnp.arange(n)[:, None] + n // 2) % n  # everything far
    idx = jnp.broadcast_to(far, (n, k)).astype(jnp.int32)
    plan = plan_windowed_gather(idx, jnp.ones_like(valid), tile=TILE,
                                half=HALF, budget=64)
    assert int(plan.overflow) > 0


def test_zero_valid_rows_and_bound_indices():
    n, k, d = 512, 4, 64
    u = jnp.ones((n, d))
    v = jnp.full((n, d), 0.5)
    idx = jnp.zeros((n, k), jnp.int32).at[n - 1].set(n - 1)
    valid = jnp.zeros((n, k), bool).at[0].set(True).at[n - 1].set(True)
    plan = plan_windowed_gather(idx, valid, tile=TILE, half=HALF)
    out = edge_message_sum(u, v, idx, plan, tile=TILE, half=HALF,
                           interpret=True)
    ref = _ref(u, v, idx, valid)
    np.testing.assert_allclose(out, ref, rtol=2e-6, atol=2e-6)
    assert float(jnp.abs(out[1:-1]).max()) == 0.0


def test_windowed_rollout_matches_standard():
    """End-to-end: the Morton-window rollout path returns the same
    trajectory as the plain fused forward (both orders of summation are
    float-exact only to rounding)."""
    from nbody_tpu.ics import generate_spiral
    from nbody_tpu.models import GraphModel
    from nbody_tpu.train.graphs import build_graph
    from nbody_tpu.train.rollout import autoregressive_rollout

    n, steps = 600, 5  # odd N exercises the tile padding
    pos, vel, mass = generate_spiral(jax.random.PRNGKey(0), n)
    model = GraphModel(input_dim=4, gnn_dim=16, message_passing_steps=2,
                      aggr="mean", neighbors=4, scale_factor=1e6,
                      knn_method="morton", fused_edgeconv=True)
    x = jnp.concatenate([pos, vel, mass[:, None]], -1)[None]
    idx, valid = build_graph(model.graph_spec, x[..., :3])
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x, idx, valid)

    ref = autoregressive_rollout(model, variables, pos, vel, mass, steps,
                                 1e-4, graph_refresh=2)
    win = autoregressive_rollout(model, variables, pos, vel, mass, steps,
                                 1e-4, graph_refresh=2, windowed=True,
                                 window_half=128, window_interpret=True)
    for a, b in zip(ref, win):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # the ACCELERATIONS are the discriminating signal: position deltas over
    # a few dt=1e-4 steps are ~1e-14 and would hide forward-pass errors
    # (this is how the real-TPU bf16-rounding flaw initially slipped past —
    # positions matched to 1e-10 while gathered messages were off by 1e-2)
    ra, wa = np.asarray(ref[2]), np.asarray(win[2])
    denom = np.abs(ra).max() + 1e-30
    assert np.abs(ra - wa).max() / denom < 1e-5, (
        np.abs(ra - wa).max() / denom)


def test_rollout_overflow_returned_as_data():
    """The over-budget dropped-edge count comes back as a traced output
    (``return_overflow=True``) rather than a ``jax.debug.print`` host
    callback — the production axon PJRT backend rejects host send/recv
    callbacks, which crashed the round-4 windowed 1M rollout."""
    from nbody_tpu.ics import generate_spiral
    from nbody_tpu.models import GraphModel
    from nbody_tpu.train.graphs import build_graph
    from nbody_tpu.train.rollout import autoregressive_rollout

    n, steps = 600, 4
    pos, vel, mass = generate_spiral(jax.random.PRNGKey(0), n)
    model = GraphModel(input_dim=4, gnn_dim=16, message_passing_steps=2,
                       aggr="mean", neighbors=4, scale_factor=1e6,
                       knn_method="morton", fused_edgeconv=True)
    x = jnp.concatenate([pos, vel, mass[:, None]], -1)[None]
    idx, valid = build_graph(model.graph_spec, x[..., :3])
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x, idx, valid)

    # ample budget: no drops, overflow == 0, trajectory unchanged
    out = autoregressive_rollout(model, variables, pos, vel, mass, steps,
                                 1e-4, graph_refresh=2, windowed=True,
                                 window_half=128, window_interpret=True,
                                 return_overflow=True)
    assert len(out) == 4 and int(out[3]) == 0
    ref = autoregressive_rollout(model, variables, pos, vel, mass, steps,
                                 1e-4, graph_refresh=2, windowed=True,
                                 window_half=128, window_interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]))

    # starved fallback budget: a uniform cloud has Morton teleports across
    # octant boundaries (~70 out-of-window edges at n=600/k=4/half=128 —
    # the spiral is too Morton-local to produce any), so a budget below
    # that must surface a positive drop count
    posu = jax.random.uniform(jax.random.PRNGKey(3), (n, 3))
    velu = jnp.zeros_like(posu)
    out2 = autoregressive_rollout(model, variables, posu, velu, mass, steps,
                                  1e-4, graph_refresh=2, windowed=True,
                                  window_half=128, window_budget=16,
                                  window_interpret=True,
                                  return_overflow=True)
    assert int(out2[3]) > 0

    # non-windowed rollouts report a zero overflow
    out3 = autoregressive_rollout(model, variables, pos, vel, mass, steps,
                                  1e-4, graph_refresh=2,
                                  return_overflow=True)
    assert len(out3) == 4 and int(out3[3]) == 0
