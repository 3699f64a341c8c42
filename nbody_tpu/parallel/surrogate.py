"""Particle-sharded surrogate forward — scaling the GNN force model across
the device mesh (SURVEY.md §2.9b / §5.7: the particle axis is this domain's
sequence axis; ``parallel/ring.py`` shards the O(N^2) direct force the same
way).

Decomposition: shard the N particles over the mesh axis. Node state is small
(positions 12 B/node, features ~30 B/node, hidden 256 B/node), so each layer
all_gathers the *inputs* it must read over ICI and computes only its own
shard's outputs:

    x_full   = all_gather(x_shard)                 # (N, 7)   ~3 MB @ 100k
    idx      = kNN(queries = shard, candidates = x_full)      # (Nl, k)
    per EdgeConv layer:
        h_full  = all_gather(h_shard)              # (N, d)   ~26 MB @ 100k
        h_shard = aggr_j MLP([h_i || h_j - h_i])   # only local rows
    head(LayerNorm([enc_shard || h_shard]))        # local rows

This reproduces ``models.gnn.GraphModel.__call__`` exactly (a CPU-mesh test
asserts equality with the single-device forward); the layer math is applied
manually from the model's own parameter tree because flax's compact modules
can't be re-entered per-shard. Any change to ``GraphModel`` must be mirrored
here — the equality test is the guard.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nbody_tpu.models.common import select_input_features
from nbody_tpu.ops.knn import knn_query
from nbody_tpu.ops.segment import masked_aggregate


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _mlp_encoder(params, x):
    """models.mlp.MLP with norm=None, plain_last=True (gnn.py:56-65)."""
    layers = sorted(params.keys(), key=lambda s: int(s.split("_")[1]))
    for i, name in enumerate(layers):
        x = _dense(params[name], x)
        if i < len(layers) - 1:
            x = jnp.tanh(x)
    return x


def _output_head(params, x):
    """models.mlp.OutputHead: tanh sandwiches + plain final Linear."""
    layers = sorted(params.keys(), key=lambda s: int(s.split("_")[1]))
    for name in layers[:-1]:
        x = jnp.tanh(_dense(params[name], x))
    return _dense(params[layers[-1]], x)


def _layer_norm(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def sharded_predict(model, variables, pos, vel, mass, mesh: Mesh,
                    axis: str = "particles"):
    """Surrogate acceleration prediction with the particle axis sharded over
    ``mesh``'s ``axis`` — the multi-device counterpart of
    ``train.rollout.predict_accelerations``.

    :param model: a ``GraphModel`` (``aggr``, ``neighbors``,
        ``message_passing_steps``, ``input_dim`` are read from it).
    :param variables: its parameter tree ({"params": ...}).
    :param pos/vel: (N, 3); :param mass: (N,). N must divide the axis size.
    :return: (N, 3) accelerations, sharded over ``axis``.
    """
    params = variables["params"]
    n = pos.shape[0]
    n_dev = mesh.shape[axis]
    assert n % n_dev == 0, f"N={n} must divide the {axis!r} axis ({n_dev})"
    shard = n // n_dev
    k = model.neighbors

    def fwd(pos_l, vel_l, mass_l):
        me = jax.lax.axis_index(axis)
        x_l = jnp.concatenate([pos_l, vel_l, mass_l[:, None]], axis=-1)
        x_full = jax.lax.all_gather(x_l, axis, tiled=True)  # (N, 7)

        idx, valid = knn_query(
            pos_l, x_full[:, :3], k, q_offset=me * shard, include_self=False
        )

        h_full = select_input_features(x_full, model.input_dim)
        h_l = select_input_features(x_l, model.input_dim)
        if model.node_encoder_dims:
            h_full = _mlp_encoder(params["MLP_0"], h_full)
            h_l = jax.lax.dynamic_slice_in_dim(h_full, me * shard, shard)
        enc_l = h_l

        for li in range(model.message_passing_steps):
            p = params[f"EdgeConv_{li}"]
            h_j = h_full[idx]  # (shard, k, d) gather from the gathered array
            msg = jnp.concatenate(
                [
                    jnp.broadcast_to(h_l[:, None, :], h_j.shape),
                    h_j - h_l[:, None, :],
                ],
                axis=-1,
            )
            e = _dense(p["Dense_1"], jnp.tanh(_dense(p["Dense_0"], msg)))
            h_l = masked_aggregate(e, valid, model.aggr, axis=1)
            if li < model.message_passing_steps - 1:
                h_full = jax.lax.all_gather(h_l, axis, tiled=True)

        out = _layer_norm(
            params["LayerNorm_0"], jnp.concatenate([enc_l, h_l], axis=-1)
        )
        return _output_head(params["OutputHead_0"], out)

    spec = P(axis)
    fn = jax.jit(
        jax.shard_map(
            fwd, mesh=mesh,
            in_specs=(spec, spec, spec), out_specs=spec,
        )
    )
    sharding = NamedSharding(mesh, spec)
    return fn(
        jax.device_put(pos, sharding),
        jax.device_put(vel, sharding),
        jax.device_put(mass, sharding),
    )


def sharded_rollout(model, variables, pos0, vel0, mass, steps: int, dt: float,
                    mesh: Mesh, axis: str = "particles"):
    """Particle-sharded autoregressive leapfrog rollout (KDK with the learned
    force, semantics of ``train.rollout.autoregressive_rollout``): the whole
    trajectory stays sharded; one ``lax.scan`` per call.

    :return: (pos, vel, acc) each (steps, N, 3), row 0 = seed state with its
        predicted acceleration.
    """
    params = variables["params"]
    n = pos0.shape[0]
    n_dev = mesh.shape[axis]
    assert n % n_dev == 0
    shard = n // n_dev
    k = model.neighbors

    def predict_local(pos_l, vel_l, mass_l):
        me = jax.lax.axis_index(axis)
        x_l = jnp.concatenate([pos_l, vel_l, mass_l[:, None]], axis=-1)
        x_full = jax.lax.all_gather(x_l, axis, tiled=True)
        idx, valid = knn_query(
            pos_l, x_full[:, :3], k, q_offset=me * shard, include_self=False
        )
        h_full = select_input_features(x_full, model.input_dim)
        h_l = select_input_features(x_l, model.input_dim)
        if model.node_encoder_dims:
            h_full = _mlp_encoder(params["MLP_0"], h_full)
            h_l = jax.lax.dynamic_slice_in_dim(h_full, me * shard, shard)
        enc_l = h_l
        for li in range(model.message_passing_steps):
            p = params[f"EdgeConv_{li}"]
            h_j = h_full[idx]
            msg = jnp.concatenate(
                [jnp.broadcast_to(h_l[:, None, :], h_j.shape),
                 h_j - h_l[:, None, :]], axis=-1,
            )
            e = _dense(p["Dense_1"], jnp.tanh(_dense(p["Dense_0"], msg)))
            h_l = masked_aggregate(e, valid, model.aggr, axis=1)
            if li < model.message_passing_steps - 1:
                h_full = jax.lax.all_gather(h_l, axis, tiled=True)
        out = _layer_norm(
            params["LayerNorm_0"], jnp.concatenate([enc_l, h_l], axis=-1)
        )
        return _output_head(params["OutputHead_0"], out)

    def body(pos_l, vel_l, mass_l):
        acc0 = predict_local(pos_l, vel_l, mass_l)

        def step(carry, _):
            p, v, a = carry
            v_half = v + 0.5 * dt * a
            p_n = p + dt * v_half
            a_n = predict_local(p_n, v_half, mass_l)
            v_n = v_half + 0.5 * dt * a_n
            return (p_n, v_n, a_n), (p_n, v_n, a_n)

        _, (ps, vs, accs) = jax.lax.scan(
            step, (pos_l, vel_l, acc0), None, length=steps - 1
        )
        ps = jnp.concatenate([pos_l[None], ps], axis=0)
        vs = jnp.concatenate([vel_l[None], vs], axis=0)
        accs = jnp.concatenate([acc0[None], accs], axis=0)
        return ps, vs, accs

    spec_in = P(axis)
    spec_out = P(None, axis)
    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec_in, spec_in, spec_in),
            out_specs=(spec_out, spec_out, spec_out),
        )
    )
    sharding = NamedSharding(mesh, spec_in)
    return fn(
        jax.device_put(pos0, sharding),
        jax.device_put(vel0, sharding),
        jax.device_put(mass, sharding),
    )
