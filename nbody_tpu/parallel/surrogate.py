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


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nbody_tpu.models.common import select_input_features
from nbody_tpu.ops.knn import knn_query
from nbody_tpu.ops.segment import masked_aggregate
from nbody_tpu.train.graphs import build_graph


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _shard_knn(model, pos_l, pos_full, me, shard):
    """Per-shard neighbor lists against the gathered positions.

    Two regimes, chosen by the model's own ``graph_spec``:
    - morton: run the O(N·W) curve search *replicated* on the gathered
      positions (same spec as the single-device forward, so the graph is
      bit-identical) and slice this shard's rows. Replicated O(N·W) beats the
      per-shard O(N^2/P) distance matrix from ~(P·W·copies) bodies up —
      ~3e8 vs 1.25e9 ops at 100k on 8 devices.
    - exact (default): asymmetric per-shard query, O(N^2/P) per device.
    """
    kind, kw = model.graph_spec
    if kind == "knn" and kw.get("method") == "morton":
        idx_f, valid_f = build_graph(model.graph_spec, pos_full[None])
        idx = jax.lax.dynamic_slice_in_dim(idx_f[0], me * shard, shard)
        valid = jax.lax.dynamic_slice_in_dim(valid_f[0], me * shard, shard)
        return idx, valid
    return knn_query(
        pos_l, pos_full, model.neighbors, q_offset=me * shard,
        include_self=False,
    )


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


def _apply_output_scale(model, out):
    """Mirror GraphModel/ContinuousConvModel's trailing output_scale
    division (gnn.py:179-180, contconv.py:306-307) — with output_scale=1e6
    (the large-N training recipe) the net emits scaled targets and apply()
    stays physical; the sharded forwards must divide identically."""
    if model.output_scale != 1.0:
        out = out / jnp.asarray(model.output_scale, out.dtype)
    return out


def _layer_norm(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]



def _gnn_forward_local(model, params, pos_l, vel_l, mass_l, axis, shard):
    """One shard's rows of the GraphModel forward (the body shared by
    predict / rollout / training-grad): all_gather inputs, compute local
    outputs. Mirrors ``models.gnn.GraphModel.__call__`` — the CPU-mesh
    equality tests are the guard."""
    me = jax.lax.axis_index(axis)
    x_l = jnp.concatenate([pos_l, vel_l, mass_l[:, None]], axis=-1)
    x_full = jax.lax.all_gather(x_l, axis, tiled=True)  # (N, 7)

    idx, valid = _shard_knn(model, pos_l, x_full[:, :3], me, shard)

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
    out = _output_head(params["OutputHead_0"], out)
    return _apply_output_scale(model, out)


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

    def fwd(pos_l, vel_l, mass_l):
        return _gnn_forward_local(model, params, pos_l, vel_l, mass_l,
                                  axis, shard)

    spec = P(axis)
    fn = jax.jit(
        jax.shard_map(
            fwd, mesh=mesh,
            in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,  # Pallas morton path runs replicated inside
        )
    )
    sharding = NamedSharding(mesh, spec)
    return fn(
        jax.device_put(pos, sharding),
        jax.device_put(vel, sharding),
        jax.device_put(mass, sharding),
    )


def _mlp_encoder_bn(params, bstats, x, eps=1e-5):
    """models.mlp.MLP with norm='batch_norm' in eval mode (running stats) —
    the ContConv encoder (contconv.py:135-141)."""
    dense_names = sorted(
        (k for k in params if k.startswith("Dense_")),
        key=lambda s: int(s.split("_")[1]),
    )
    for i, name in enumerate(dense_names):
        x = _dense(params[name], x)
        if i < len(dense_names) - 1:  # plain_last
            bn_p = params[f"MaskedBatchNorm_{i}"]
            bn_s = bstats[f"MaskedBatchNorm_{i}"]
            x = (x - bn_s["mean"]) * jax.lax.rsqrt(bn_s["var"] + eps)
            x = x * bn_p["scale"] + bn_p["bias"]
            x = jnp.tanh(x)
    return x



def _contconv_conv_layer(model, p, pos_l, pos_full, feat_full, idx, valid,
                         d, radius):
    """One shard's rows of one ContinuousConv layer (XLA collect path) —
    shared by the sharded predict and rollout forwards."""
    from nbody_tpu.models.contconv import ball_to_cube
    from nbody_tpu.ops.interpolate import trilinear_corners

    shard, k_max = idx.shape
    pos_j = pos_full[idx]  # (shard, k, 3)
    r = pos_j - pos_l[:, None, :]
    dist2 = jnp.sum(r * r, axis=-1)
    r2 = jnp.asarray(radius, dist2.dtype) ** 2
    in_radius = (dist2 < r2) & valid
    window = jnp.where(in_radius, (1.0 - dist2 / r2) ** 3, 0.0)
    mapped = ball_to_cube(r)
    grid_coords = (mapped + 1.0) * ((d - 1) / 2.0)
    cidx, cw = trilinear_corners(grid_coords.reshape(-1, 3), d)
    cidx = cidx.reshape(shard, k_max, 8)
    cw = cw.reshape(shard, k_max, 8)
    feat_j = feat_full[idx]
    wf = feat_j * window[..., None]
    cells = jnp.arange(d * d * d)
    oh = jnp.zeros((shard, k_max, d * d * d), feat_j.dtype)
    for c in range(8):
        oh = oh + (cidx[..., c, None] == cells) * cw[..., c, None]
    g = jnp.einsum("nkz,nki->nzi", oh, wf)
    ci = p["filters"].shape[3]
    out = jnp.einsum(
        "nzi,zio->no", g, p["filters"].reshape(d * d * d, ci, -1)
    )
    if model.agg == "mean":
        cnt = jnp.sum(in_radius.astype(out.dtype), axis=-1, keepdims=True)
        out = out / jnp.maximum(cnt, 1.0)
    return out


def _contconv_forward_local(model, params, bstats, pos_l, vel_l, mass_l,
                            axis, shard):
    """One shard's rows of the ContinuousConvModel forward (eval mode):
    radius graph per query shard against the all-gathered positions, each
    conv layer all_gathers its input features. Mirrors
    ``models.contconv.ContinuousConvModel.__call__``; the CPU-mesh
    equality test is the guard."""
    resolutions = model._resolutions()
    me = jax.lax.axis_index(axis)
    x_l = jnp.concatenate([pos_l, vel_l, mass_l[:, None]], axis=-1)
    x_full = jax.lax.all_gather(x_l, axis, tiled=True)
    pos_full = x_full[:, :3]
    k_max = min(model.radius_kmax, pos_full.shape[0])

    kind, kw = model.graph_spec
    if kw.get("method") == "morton":
        # replicated O(N·W) radius search (cutoff applied inside),
        # sliced to this shard — same spec as the single-device forward
        idx_f, valid_f = build_graph(model.graph_spec, pos_full[None])
        idx = jax.lax.dynamic_slice_in_dim(idx_f[0], me * shard, shard)
        valid = jax.lax.dynamic_slice_in_dim(valid_f[0], me * shard, shard)
    else:
        idx, valid = knn_query(
            pos_l, pos_full, k_max, q_offset=me * shard,
            include_self=model.self_loops,
        )
        d2_sel = jnp.sum(
            (pos_full[idx] - pos_l[:, None, :]) ** 2, axis=-1
        )
        valid = valid & (d2_sel < jnp.asarray(model.radius) ** 2)
        idx = jnp.where(valid, idx, 0)

    h_full = select_input_features(x_full, model.in_channels)
    if model.encoder_hiddens:
        h_full = _mlp_encoder_bn(params["MLP_0"], bstats["MLP_0"], h_full)
    h_l = jax.lax.dynamic_slice_in_dim(h_full, me * shard, shard)
    enc_l = h_l

    for li in range(model.continuous_conv_layers):
        p = params[f"ContinuousConv_{li}"]
        h_l = jnp.tanh(
            _contconv_conv_layer(model, p, pos_l, pos_full, h_full, idx,
                                 valid, resolutions[li], model.radius)
        )
        if li < model.continuous_conv_layers - 1:
            h_full = jax.lax.all_gather(h_l, axis, tiled=True)

    out = _layer_norm(
        params["LayerNorm_0"], jnp.concatenate([enc_l, h_l], axis=-1)
    )
    out = _output_head(params["OutputHead_0"], out)
    return _apply_output_scale(model, out)


def sharded_contconv_predict(model, variables, pos, vel, mass, mesh: Mesh,
                             axis: str = "particles"):
    """Particle-sharded ContinuousConvModel prediction (eval mode): the
    radius graph is built per query shard against the all-gathered positions
    and each conv layer all_gathers its input features — the contconv
    counterpart of :func:`sharded_predict`. Mirrors
    ``models.contconv.ContinuousConvModel.__call__``; the CPU-mesh equality
    test is the guard."""
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    n = pos.shape[0]
    n_dev = mesh.shape[axis]
    assert n % n_dev == 0
    shard = n // n_dev

    def fwd(pos_l, vel_l, mass_l):
        return _contconv_forward_local(model, params, bstats, pos_l, vel_l,
                                       mass_l, axis, shard)

    spec = P(axis)
    fn = jax.jit(
        jax.shard_map(fwd, mesh=mesh, in_specs=(spec, spec, spec),
                      out_specs=spec, check_vma=False)
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

    def predict_local(pos_l, vel_l, mass_l):
        return _gnn_forward_local(model, params, pos_l, vel_l, mass_l,
                                  axis, shard)

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
            check_vma=False,  # Pallas morton path runs replicated inside
        )
    )
    sharding = NamedSharding(mesh, spec_in)
    return fn(
        jax.device_put(pos0, sharding),
        jax.device_put(vel0, sharding),
        jax.device_put(mass, sharding),
    )


def sharded_loss_and_grad(model, variables, pos, vel, mass, y, mesh: Mesh,
                          axis: str = "particles"):
    """Particle-sharded training-step core: the reference's scaled-RMSE
    loss (gnn.py:150-161) and its parameter gradients with the N axis
    sharded over ``mesh`` — ``jax.grad`` straight THROUGH the sharded
    forward. The all_gathers differentiate into collectives automatically
    and each shard's parameter-gradient contribution is psum'd, so the
    result equals the single-device gradient (CPU-mesh test:
    tests/test_sharded_surrogate.py). Combined with BH ground-truth
    datagen this is the path to training at N where a single chip's
    (N, k, d) activations don't fit.

    :param y: (N, 3) target accelerations, sharded like ``pos``.
    :return: (loss, grads) — loss a replicated scalar, grads a params-tree
        of replicated full gradients.
    """
    params = variables["params"]
    n = pos.shape[0]
    n_dev = mesh.shape[axis]
    assert n % n_dev == 0, f"N={n} must divide the {axis!r} axis ({n_dev})"
    shard = n // n_dev
    scale = jnp.float32(model.scale_factor)

    def local_sse(p, pos_l, vel_l, mass_l, y_l):
        pred_l = _gnn_forward_local(model, p, pos_l, vel_l, mass_l, axis,
                                    shard)
        return jnp.sum((scale * (pred_l - y_l)) ** 2)

    def step(p, pos_l, vel_l, mass_l, y_l):
        # Differentiate the LOCAL sum of squares only — no psum inside the
        # AD path (psum transposes to psum under shard_map, which would
        # scale every cotangent by n_dev). The all_gathers inside the
        # forward transpose to reduce-scatters as usual. Then reduce the
        # partials and apply the sqrt chain rule explicitly:
        #   L = sqrt(S / (3n)),  dL/dp = psum(dS_local/dp) / (2 * 3n * L)
        sse_l, g_l = jax.value_and_grad(local_sse)(
            p, pos_l, vel_l, mass_l, y_l)
        total = jax.lax.psum(sse_l, axis)
        loss = jnp.sqrt(total / (n * 3))
        coef = 0.5 / jnp.maximum(loss * (n * 3), 1e-30)
        g = jax.tree_util.tree_map(
            lambda t: jax.lax.psum(t, axis) * coef, g_l)
        return loss, g

    spec = P(axis)
    fn = jax.jit(
        jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(), spec, spec, spec, spec),
            out_specs=(P(), P()),
            check_vma=False,  # Pallas morton path runs replicated inside
        )
    )
    sharding = NamedSharding(mesh, spec)
    return fn(
        params,
        jax.device_put(pos, sharding),
        jax.device_put(vel, sharding),
        jax.device_put(mass, sharding),
        jax.device_put(y, sharding),
    )


def sharded_contconv_rollout(model, variables, pos0, vel0, mass, steps: int,
                             dt: float, mesh: Mesh,
                             axis: str = "particles"):
    """Particle-sharded autoregressive rollout with the ContConv surrogate
    force — the contconv twin of :func:`sharded_rollout` (same KDK
    semantics; radius graphs rebuilt from predicted positions on device
    every step).

    :return: (pos, vel, acc) each (steps, N, 3), row 0 = seed state.
    """
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    n = pos0.shape[0]
    n_dev = mesh.shape[axis]
    assert n % n_dev == 0
    shard = n // n_dev

    def predict_local(pos_l, vel_l, mass_l):
        return _contconv_forward_local(model, params, bstats, pos_l, vel_l,
                                       mass_l, axis, shard)

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
            check_vma=False,
        )
    )
    sharding = NamedSharding(mesh, spec_in)
    return fn(
        jax.device_put(pos0, sharding),
        jax.device_put(vel0, sharding),
        jax.device_put(mass, sharding),
    )
