"""Morton-curve kNN (``ops/spatial.py``) — correctness + recall on the actual
clustered galaxy IC distributions (the case that kills the fixed-cell hash
grid, ``ops/hashgrid.py:27-33``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.ics import generate_disk, generate_spiral
from nbody_tpu.ops.knn import knn_neighbors
from nbody_tpu.ops.spatial import batched_knn_morton, knn_morton, morton_keys


def _recall(idx_a, valid_a, idx_b, valid_b):
    """Fraction of exact neighbor slots (b) recovered by (a)."""
    hits = tot = 0
    for i in range(idx_b.shape[0]):
        exact = set(np.asarray(idx_b[i][valid_b[i]]).tolist())
        got = set(np.asarray(idx_a[i][valid_a[i]]).tolist())
        hits += len(exact & got)
        tot += len(exact)
    return hits / max(tot, 1)


def test_morton_keys_basics():
    """Identical points share keys; the far bbox corner of a cubic box has
    all 30 bits set; masked rows sort last."""
    pos = jnp.asarray([[0.0, 0, 0], [0, 0, 0], [1, 1, 1], [0.5, 0.5, 0.5]])
    keys = morton_keys(pos)
    assert int(keys[0]) == int(keys[1])
    assert int(keys[2]) == (2**30 - 1)
    mask = jnp.asarray([True, True, True, False])
    keys_m = morton_keys(pos, mask=mask)
    assert int(keys_m[3]) == 0x7FFFFFFF

    # shifted / rotated copies produce different orderings
    k0 = morton_keys(pos)
    ks = morton_keys(pos, shift=0.41)
    assert not np.array_equal(np.asarray(k0), np.asarray(ks))


def test_morton_keys_isotropic_quantisation():
    """One scale for all axes: a thin slab must quantise z to few distinct
    values instead of stretching it to the full 10 bits (per-axis scaling
    measured recall 0.39 on disks vs 0.96 isotropic)."""
    # bbox spans 20 in x/y but only 0.1 in z; the isotropic cell size is
    # 20/1023 ~ 0.0196, so a 0.01 z-separation is sub-cell (same key) —
    # per-axis scaling would put ~100 cells between the two points.
    pos = jnp.asarray(
        [[0.0, 0.0, 0.0], [0.0, 0.0, 0.01], [20.0, 20.0, 0.1]]
    )
    keys = morton_keys(pos)
    assert int(keys[0]) == int(keys[1])


def test_knn_morton_exact_when_window_covers_all():
    """With a window spanning the whole array the result must equal the
    exact kNN (same contract as ops/knn.py)."""
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (100, 3))
    idx_e, valid_e = knn_neighbors(pos, 5)
    idx_m, valid_m = knn_morton(pos, 5, window=100)
    assert _recall(idx_m, valid_m, idx_e, valid_e) == 1.0
    np.testing.assert_array_equal(np.asarray(valid_m), np.asarray(valid_e))


@pytest.mark.parametrize("maker", [generate_disk, generate_spiral])
def test_knn_morton_recall_on_galaxy_profiles(maker):
    """>=0.99 recall at k=10 with defaults on clustered profiles — the
    production large-N requirement (VERDICT round 1, item 1)."""
    pos, _, _ = maker(jax.random.PRNGKey(1), 4000)
    idx_e, valid_e = knn_neighbors(pos, 10)
    idx_m, valid_m = knn_morton(pos, 10)
    r = _recall(idx_m, valid_m, idx_e, valid_e)
    assert r >= 0.99, f"recall {r:.4f} < 0.99"


def test_knn_morton_block_size_recall():
    """Both block sizes must recover (nearly) the exact graph on the blocked
    path (block shapes change the effective window, not correctness)."""
    pos = jax.random.normal(jax.random.PRNGKey(2), (1500, 3))
    idx_e, valid_e = knn_neighbors(pos, 6)
    for block in (128, 256):
        idx_m, valid_m = knn_morton(pos, 6, window=32, block=block)
        assert _recall(idx_m, valid_m, idx_e, valid_e) >= 0.98


def test_knn_morton_mask_and_self():
    """Masked-out rows are never selected and have no neighbors; include_self
    puts each node first in its own list (d=0) — on the dense small-N path
    AND the blocked path."""
    # dense small-N path
    pos = jax.random.normal(jax.random.PRNGKey(3), (50, 3))
    mask = jnp.arange(50) < 40
    idx, valid = knn_morton(pos, 4, mask=mask)
    assert not np.any(np.asarray(idx[np.asarray(valid)]) >= 40)
    assert not np.asarray(valid[40:]).any()
    idx_s, valid_s = knn_morton(pos, 4, include_self=True)
    np.testing.assert_array_equal(np.asarray(idx_s[:, 0]), np.arange(50))

    # blocked path (n > max(2W+1, 2B))
    pos = jax.random.normal(jax.random.PRNGKey(7), (900, 3))
    mask = jnp.arange(900) < 800
    idx, valid = knn_morton(pos, 4, mask=mask, window=16, block=128)
    assert not np.any(np.asarray(idx[np.asarray(valid)]) >= 800)
    assert not np.asarray(valid[800:]).any()
    idx_s, valid_s = knn_morton(pos, 4, include_self=True, window=16, block=128)
    np.testing.assert_array_equal(np.asarray(idx_s[:, 0]), np.arange(900))
    assert np.asarray(valid_s).all()


def test_knn_morton_no_duplicate_neighbors():
    """The multi-curve union must dedup: no node id may appear twice in one
    row's valid slots."""
    pos, _, _ = generate_disk(jax.random.PRNGKey(4), 500)
    idx, valid = knn_morton(pos, 10, window=16)
    for i in range(500):
        ids = np.asarray(idx[i][valid[i]])
        assert len(ids) == len(set(ids.tolist()))


def test_batched_knn_morton():
    pos = jax.random.normal(jax.random.PRNGKey(5), (3, 60, 3))
    idx, valid = batched_knn_morton(pos, 5, window=12)
    assert idx.shape == (3, 60, 5)
    idx0, valid0 = knn_morton(pos[0], 5, window=12)
    np.testing.assert_array_equal(np.asarray(idx[0]), np.asarray(idx0))


@pytest.mark.parametrize("maker", [generate_disk, generate_spiral])
def test_knn_morton_pallas_recall(maker):
    """The fused-Pallas select/merge path (interpret mode on CPU) must hit the
    same >=0.99 production recall bar as the XLA path; its structural window
    (== block per side) is wider than the XLA default, so recall can only
    improve."""
    pos, _, _ = maker(jax.random.PRNGKey(11), 3000)
    idx_e, valid_e = knn_neighbors(pos, 10)
    idx_p, valid_p = knn_morton(pos, 10, block=128, impl="pallas_interpret")
    r = _recall(idx_p, valid_p, idx_e, valid_e)
    assert r >= 0.99, f"pallas recall {r:.4f} < 0.99"


def test_knn_morton_pallas_mask_self_dedup():
    """Pallas path: masked rows never selected / have no neighbors;
    include_self puts each node first; the cross-copy merge dedups."""
    pos = jax.random.normal(jax.random.PRNGKey(12), (900, 3))
    mask = jnp.arange(900) < 800
    idx, valid = knn_morton(pos, 4, mask=mask, block=128,
                            impl="pallas_interpret")
    assert not np.any(np.asarray(idx[np.asarray(valid)]) >= 800)
    assert not np.asarray(valid[800:]).any()

    idx_s, valid_s = knn_morton(pos, 4, include_self=True, block=128,
                                impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(idx_s[:, 0]), np.arange(900))
    assert np.asarray(valid_s).all()

    idx_d, valid_d = knn_morton(pos, 10, block=128, impl="pallas_interpret")
    for i in range(0, 900, 37):
        ids = np.asarray(idx_d[i][valid_d[i]])
        assert len(ids) == len(set(ids.tolist()))


def test_knn_morton_pallas_batched_and_spec():
    """vmap over scenes + graph_spec/build_graph plumbing of impl."""
    from nbody_tpu.models import GraphModel
    from nbody_tpu.train.graphs import build_graph

    pos = jax.random.normal(jax.random.PRNGKey(13), (2, 700, 3))
    idx, valid = batched_knn_morton(pos, 5, block=128,
                                    impl="pallas_interpret")
    idx0, valid0 = knn_morton(pos[0], 5, block=128, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(idx[0]), np.asarray(idx0))

    m = GraphModel(neighbors=10, knn_method="morton", knn_impl="pallas")
    kind, kw = m.graph_spec
    assert kw["impl"] == "pallas"
    idx_b, valid_b = build_graph(
        ("knn", {"k": 5, "method": "morton", "block": 128,
                 "impl": "pallas_interpret"}), pos
    )
    np.testing.assert_array_equal(np.asarray(idx_b), np.asarray(idx))


def test_build_graph_morton_dispatch():
    from nbody_tpu.train.graphs import build_graph

    pos = jax.random.normal(jax.random.PRNGKey(6), (2, 40, 3))
    idx, valid = build_graph(
        ("knn", {"k": 4, "method": "morton", "window": 40}), pos
    )
    idx_e, valid_e = build_graph(("knn", {"k": 4}), pos)
    assert _recall(idx[0], valid[0], idx_e[0], valid_e[0]) == 1.0


def test_graph_model_morton_spec():
    from nbody_tpu.models import GraphModel

    m = GraphModel(neighbors=10, knn_method="morton", knn_window=48)
    kind, kw = m.graph_spec
    assert kind == "knn" and kw["method"] == "morton" and kw["window"] == 48
