"""Hash-grid neighbor search vs brute force (SURVEY.md §7 hard part (a))."""

import jax.numpy as jnp
import numpy as np

from attic.hashgrid import hash_grid_neighbors, hash_grid_radius_neighbors
from nbody_tpu.ops.knn import knn_neighbors
from nbody_tpu.ops.radius import radius_neighbors


def _uniform(n, seed=0, scale=4.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-scale, scale, (n, 3)).astype(np.float32))


def test_radius_matches_bruteforce_uniform():
    pos = _uniform(400)
    r = 0.9
    idx_b, ok_b = radius_neighbors(pos, r, k_max=64, include_self=True)
    idx_h, ok_h = hash_grid_radius_neighbors(
        pos, r, k_max=64, include_self=True, cell_capacity=32, query_chunk=128
    )
    for i in range(400):
        want = set(np.asarray(idx_b)[i][np.asarray(ok_b)[i]].tolist())
        got = set(np.asarray(idx_h)[i][np.asarray(ok_h)[i]].tolist())
        assert got == want, f"row {i}: {got ^ want}"


def test_knn_high_recall_uniform():
    pos = _uniform(600, seed=1)
    k = 8
    # density ~ 600/8^3 => ~1.2 bodies per unit cell at cell_size 1.1
    idx_h, ok_h, _ = hash_grid_neighbors(
        pos, k, cell_size=1.1, cell_capacity=24, query_chunk=256
    )
    idx_e, ok_e = knn_neighbors(pos, k)
    hits = total = 0
    for i in range(600):
        want = set(np.asarray(idx_e)[i][np.asarray(ok_e)[i]].tolist())
        got = set(np.asarray(idx_h)[i][np.asarray(ok_h)[i]].tolist())
        hits += len(got & want)
        total += len(want)
    assert hits / total > 0.97, hits / total


def test_no_duplicate_neighbors():
    pos = _uniform(300, seed=2, scale=1.5)
    idx, ok, _ = hash_grid_neighbors(pos, 12, cell_size=0.8,
                                     cell_capacity=32, query_chunk=128)
    idx, ok = np.asarray(idx), np.asarray(ok)
    for i in range(300):
        sel = idx[i][ok[i]]
        assert len(sel) == len(set(sel.tolist())), f"dup in row {i}"
        assert i not in sel  # include_self=False default


def test_mask_excludes_padding():
    pos = _uniform(200, seed=3)
    mask = jnp.arange(200) < 150
    idx, ok = hash_grid_radius_neighbors(
        pos, 1.0, k_max=32, mask=mask, cell_capacity=32, query_chunk=64
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert not ok[150:].any()
    assert np.all(idx[ok] < 150)
    # parity with brute force on the masked set
    idx_b, ok_b = radius_neighbors(pos, 1.0, k_max=32, mask=mask)
    for i in range(150):
        assert set(idx[i][ok[i]].tolist()) == set(
            np.asarray(idx_b)[i][np.asarray(ok_b)[i]].tolist()
        )


def test_overflow_truncates_but_stays_valid():
    """All points in one cell: capacity truncation loses neighbors but never
    fabricates invalid ones."""
    rng = np.random.default_rng(4)
    pos = jnp.asarray(rng.uniform(0, 0.05, (100, 3)).astype(np.float32))
    idx, ok = hash_grid_radius_neighbors(
        pos, 1.0, k_max=32, include_self=False, cell_capacity=8
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    d2 = ((np.asarray(pos)[None] - np.asarray(pos)[:, None]) ** 2).sum(-1)
    for i in range(100):
        sel = idx[i][ok[i]]
        assert np.all(d2[i, sel] < 1.0)
        assert i not in sel
