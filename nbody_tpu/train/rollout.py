"""Fully on-chip autoregressive rollout — the flagship eval capability
(reference ``trainer.py:217-226`` step + ``trainer.py:228-344`` rollout loop).

The reference pays two host/device crossings per step (graph build + .item()
readbacks, trainer.py:275-312). Here the entire sim_steps rollout is one
``lax.scan``: the learned force replaces gravity inside the same KDK update,
neighbor lists are rebuilt from predicted positions on device each step, and
the full (steps, N, 3) trajectories come back to the host once.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from nbody_tpu.train.graphs import build_graph


@partial(jax.jit, static_argnames=("model",))
def predict_accelerations(model, variables, pos, vel, mass):
    """Single-snapshot surrogate force — the reference's ``model.predict``
    (gnn.py:205-215 / contconv.py:261-271): build the model's neighbor graph
    from positions on device, run the forward pass.

    :param pos/vel: (N, 3); :param mass: (N,).
    :return: (N, 3) predicted accelerations.
    """
    x = jnp.concatenate([pos, vel, mass[:, None]], axis=-1)[None]
    idx, valid = build_graph(model.graph_spec, x[..., :3])
    return model.apply(variables, x, idx, valid, train=False)[0]


@partial(jax.jit, static_argnames=("model", "steps", "graph_spec",
                                   "graph_refresh", "windowed",
                                   "window_half", "window_budget",
                                   "window_bf16", "window_interpret",
                                   "return_overflow"))
def autoregressive_rollout(
    model,
    variables: Any,
    pos0: jax.Array,
    vel0: jax.Array,
    mass: jax.Array,
    steps: int,
    dt: float,
    graph_spec=None,
    graph_refresh: int = 1,
    windowed: bool = False,
    window_half: int = 384,
    window_budget=None,
    window_bf16: bool = False,
    window_interpret: bool = False,
    return_overflow: bool = False,
) -> Tuple[jax.Array, ...]:
    """Roll a single scene forward with the surrogate force model.

    Semantics of ``Trainer.step`` (trainer.py:217-226): half-kick with the
    previous acceleration, drift, predict a(t+dt) from the drifted positions
    and half-kicked velocities, half-kick again. The initial acceleration is
    predicted from the ground-truth step-0 state (trainer.py:238-241).

    NOTE a deliberate divergence: the reference's rollout builds its kNN
    graphs with ``transform_to_graph``'s default k=50 (gnn.py:11,205) even
    when the model was trained with k=10 — we default to the model's own
    ``graph_spec`` (override via ``graph_spec`` for the reference quirk).

    :param graph_spec: hashable ((kind, tuple(kwargs.items()))) override;
        None uses ``model.graph_spec``.
    :param graph_refresh: rebuild the neighbor graph every this many steps
        and reuse the cached indices in between — the Verlet-neighbor-list
        trick from classical MD, amortising the search cost at large N.
        kNN(10) turnover per dt=1e-4 leapfrog step is tiny, so small values
        (4-10) are physically safe; the default 1 keeps exact per-step
        rebuild parity with the reference (contconv.py:225, gnn.py:13).
    :param windowed: run the EdgeConv gathers through the Morton-window
        Pallas kernel (``ops/edgeconv_kernel.py``; GraphModel only). The
        state is payload-sorted into Morton order ONCE up front so graph
        indices are near-diagonal, each refresh also recomputes the
        kernel/fallback edge routing plan, and the recorded trajectory is
        unsorted back to the caller's row order at the end. Same function
        as the fused forward (float-rounding-level differences only).
        Long rollouts slowly drift from the initial Morton order, growing
        the fallback share — ``window_budget`` (default 25% of edges) must
        absorb it; over-budget edges are DROPPED. The worst per-refresh
        drop count is a traced scalar returned via ``return_overflow``
        (a host callback like ``jax.debug.print`` is NOT usable here: the
        production axon PJRT backend rejects host send/recv callbacks).
    :param window_half: window half-width in sorted rows (multiple of 128).
    :param window_bf16: run the one-hot gather contraction on the MXU in
        bf16 (~4x the f32 MXU rate; v rounds to bf16 — ~1e-3 relative).
    :param return_overflow: append a scalar int32 to the outputs — the MAX
        over-budget fallback-edge drop count across all graph builds (always
        0 when not windowed). Callers that enable the windowed kernel should
        check it: nonzero means dropped edges corrupted the physics and
        ``window_budget`` must be raised.
    :return: (pos, vel, acc) each (steps, N, 3); row 0 is the initial state
        with the predicted initial acceleration. Plus the overflow scalar
        if ``return_overflow``.
    """
    spec = model.graph_spec if graph_spec is None else (
        (graph_spec[0], dict(graph_spec[1]))
    )

    if windowed:
        from nbody_tpu.ops.edgeconv_kernel import plan_windowed_gather
        from nbody_tpu.ops.spatial import morton_keys

        n = pos0.shape[0]
        keys = morton_keys(pos0)
        _, px, py, pz, vx, vy, vz, mass, ids = jax.lax.sort(
            (keys, pos0[:, 0], pos0[:, 1], pos0[:, 2],
             vel0[:, 0], vel0[:, 1], vel0[:, 2], mass,
             jnp.arange(n, dtype=jnp.int32)),
            num_keys=1,
        )
        pos0 = jnp.stack([px, py, pz], axis=1)
        vel0 = jnp.stack([vx, vy, vz], axis=1)
        window_args = (256, window_half, window_interpret,
                       jnp.bfloat16 if window_bf16 else jnp.float32)
    mass_col = mass[:, None]

    def build(pos):
        """-> (idx, valid-or-(valid, plan), overflow scalar)."""
        idx, valid = build_graph(spec, pos[None])
        if not windowed:
            return idx, valid, jnp.int32(0)
        plan = plan_windowed_gather(idx[0], valid[0], tile=256,
                                    half=window_half, budget=window_budget)
        # the kernel contract says over-budget fallback edges are DROPPED
        # (edgeconv_kernel.WindowPlan); thread the count out as data so the
        # caller can surface it — device-side printing is impossible on the
        # production backend (axon_pjrt: host send/recv callbacks are
        # UNIMPLEMENTED, the round-4 windowed-rollout crash).
        return idx, (valid, plan), plan.overflow

    def forward(pos, vel, idx, valid):
        x = jnp.concatenate([pos, vel, mass_col], axis=-1)[None]
        if windowed:
            valid, plan = valid
            return model.apply(variables, x, idx, valid, train=False,
                               window_plan=plan,
                               window_args=window_args)[0]
        return model.apply(variables, x, idx, valid, train=False)[0]

    def predict(pos, vel):
        idx, valid, ovf = build(pos)
        return forward(pos, vel, idx, valid), ovf

    acc0, ovf0 = predict(pos0, vel0)

    def step_with(carry, idx, valid, rebuild):
        pos, vel, acc = carry
        v_half = vel + 0.5 * dt * acc
        pos_n = pos + dt * v_half
        ovf = jnp.int32(0)
        if rebuild:
            acc_n, ovf = predict(pos_n, v_half)
        else:
            acc_n = forward(pos_n, v_half, idx, valid)
        vel_n = v_half + 0.5 * dt * acc_n
        return (pos_n, vel_n, acc_n), ovf

    if graph_refresh <= 1:
        def body(carry, _):
            state, ovf = carry
            state, o = step_with(state, None, None, True)
            return (state, jnp.maximum(ovf, o)), state

        (_, overflow), (ps, vs, accs) = jax.lax.scan(
            body, ((pos0, vel0, acc0), ovf0), None, length=steps - 1
        )
    else:
        r = graph_refresh
        n_seg = -(-(steps - 1) // r)
        pad = n_seg * r - (steps - 1)

        def segment(carry, _):
            # one graph build per segment, r (possibly padded) steps reuse it
            state, ovf = carry
            idx, valid, o = build(state[0])

            def inner(c, _):
                c, _ = step_with(c, idx, valid, False)
                return c, c

            state, outs = jax.lax.scan(inner, state, None, length=r)
            return (state, jnp.maximum(ovf, o)), outs

        (_, overflow), segs = jax.lax.scan(
            segment, ((pos0, vel0, acc0), ovf0), None, length=n_seg
        )
        ps, vs, accs = (
            s.reshape((n_seg * r,) + s.shape[2:])[: steps - 1] for s in segs
        )

    ps = jnp.concatenate([pos0[None], ps], axis=0)
    vs = jnp.concatenate([vel0[None], vs], axis=0)
    accs = jnp.concatenate([acc0[None], accs], axis=0)
    if windowed:
        # back to the caller's row order: ONE big-row gather for the whole
        # trajectory (issue cost is per row, amortised over steps x 3 cols)
        perm = jnp.argsort(ids)
        ps = jnp.take(ps, perm, axis=1)
        vs = jnp.take(vs, perm, axis=1)
        accs = jnp.take(accs, perm, axis=1)
    if return_overflow:
        return ps, vs, accs, overflow
    return ps, vs, accs
