"""Streaming index updates (add_points / remove_points) — new capability
over the reference's immutable save_t."""

import jax.numpy as jnp
import numpy as np
import pytest

import approximatenn_tpu as ann


@pytest.fixture(scope="module")
def base():
    rng = np.random.default_rng(5)
    X = jnp.asarray(rng.standard_normal((2000, 16)).astype(np.float32))
    index, _, _ = ann.build(X, 5, tries=4, seed=1, store_points=True)
    return X, index, rng


def test_add_points_found_by_search(base):
    X, index, rng = base
    Y = jnp.asarray(rng.standard_normal((20, 16)).astype(np.float32))
    # new points sit exactly at the queries -> must be the top hit
    idx2 = index.add_points(Y)
    assert idx2.n == index.n + 20
    ids, dists = ann.search(idx2, queries=Y)
    top = np.asarray(ids[:, 0])
    want = index.n + np.arange(20)
    assert (top == want).mean() > 0.9, top  # hashed bucket must contain self
    assert np.allclose(np.asarray(dists[:, 0])[top == want], 0.0, atol=1e-5)


def test_add_points_graph_rows_exact(base):
    X, index, rng = base
    Y = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    idx2 = index.add_points(Y)
    allp = jnp.concatenate([X, Y])
    gnew = np.asarray(idx2.graph[index.n :])
    for i in range(8):
        d2 = ((np.asarray(allp) - np.asarray(Y[i])) ** 2).sum(1)
        d2[index.n + i] = np.inf  # self
        want = set(np.argsort(d2)[:5].tolist())
        assert set(gnew[i].tolist()) == want


def test_add_then_remove(base):
    X, index, rng = base
    Y = jnp.asarray(rng.standard_normal((10, 16)).astype(np.float32))
    idx2 = index.add_points(Y)
    dead = list(range(index.n, index.n + 10))
    idx3 = idx2.remove_points(jnp.asarray(dead))
    ids, _ = ann.search(idx3, queries=Y)
    assert not (set(np.asarray(ids).ravel().tolist()) & set(dead))


def test_remove_excludes_from_results(base):
    X, index, _ = base
    q = X[:16]
    ids0, _ = ann.search(index, X, q)
    victims = np.unique(np.asarray(ids0[:, 0]))
    idx2 = index.remove_points(jnp.asarray(victims))
    ids1, _ = ann.search(idx2, X, q)
    assert not (set(np.asarray(ids1).ravel().tolist()) & set(victims.tolist()))
    # sentinel never exceeds n
    assert np.asarray(ids1).max() <= index.n


def test_add_points_original_index_untouched(base):
    X, index, rng = base
    tables_before = np.asarray(index.tables).copy()
    Y = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    index.add_points(Y)
    np.testing.assert_array_equal(tables_before, np.asarray(index.tables))


def test_add_points_requires_points():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((500, 8)).astype(np.float32))
    index, _, _ = ann.build(X, 5, tries=3, seed=0)  # no stored points
    with pytest.raises(ValueError):
        index.add_points(X[:2])
    idx2 = index.add_points(X[:2] + 100.0, points=X)
    assert idx2.n == 502
