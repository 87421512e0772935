"""Serving facade: engine auto-selection and dispatch."""

import jax.numpy as jnp
import numpy as np
import pytest

import approximatenn_tpu as ann
from approximatenn_tpu.engine.serving import Server


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.standard_normal((3000, 16)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))
    return X, Y


def test_auto_picks_exact_below_threshold(data):
    X, Y = data
    srv = Server.build(X, k=5)
    assert srv.mode == "exact"
    ids, dd = srv.search(Y)
    ti, td = ann.brute_force_knn(X, Y, 5)
    np.testing.assert_array_equal(
        np.sort(np.asarray(ids), 1), np.sort(np.asarray(ti), 1)
    )
    assert srv.describe()["recall"] == 1.0


def test_exact_bf16_storage(data):
    """storage_dtype=bf16 halves the served corpus and doubles the exact
    engine's auto threshold; results match the oracle on the rounded
    values (the exact kernel streams bf16 as stored, no f32 copy)."""
    X, Y = data
    srv = Server.build(X, k=5, storage_dtype=jnp.bfloat16)
    assert srv.mode == "exact"
    assert srv.points.dtype == jnp.bfloat16
    assert srv.describe()["storage_dtype"] == "bfloat16"
    ids, _ = srv.search(Y)
    ti, _ = ann.brute_force_knn(X.astype(jnp.bfloat16).astype(jnp.float32),
                                Y, 5)
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 5
        for a, b in zip(np.asarray(ids), np.asarray(ti))
    ])
    assert overlap > 0.9, overlap
    # the doubled threshold: 3000 points, bf16 -> exact even when the f32
    # threshold would force hash
    srv2 = Server.build(X, k=5, storage_dtype=jnp.bfloat16,
                        exact_max_n=3000)
    assert srv2.mode == "exact"
    srv3 = Server.build(X, k=5, exact_max_n=1000, tries=4, seed=2)
    assert srv3.mode == "hash"


def test_exact_int8_storage(data):
    """storage_dtype=int8 quantizes the corpus (scale kept on the server,
    forwarded to the exact engine) for 4x the f32 auto threshold; results
    match the oracle on the quantization grid."""
    X, Y = data
    srv = Server.build(X, k=5, storage_dtype=jnp.int8)
    assert srv.mode == "exact"
    assert srv.points.dtype == jnp.int8
    assert srv.describe()["storage_dtype"] == "int8"
    assert "scale" in srv._search_kw
    ids, dd = srv.search(Y)
    s = float(srv._search_kw["scale"])
    Xd = jnp.asarray(np.asarray(srv.points, np.float32) * s)
    Yd = jnp.asarray(np.clip(np.round(np.asarray(Y) / s), -127, 127) * s)
    ti, td = ann.brute_force_knn(Xd, Yd, 5)
    np.testing.assert_array_equal(
        np.sort(np.asarray(ids), 1), np.sort(np.asarray(ti), 1)
    )
    # and near the full-precision oracle
    tf, _ = ann.brute_force_knn(X, Y, 5)
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 5
        for a, b in zip(np.asarray(ids), np.asarray(tf))
    ])
    assert overlap > 0.9, overlap
    # 4x threshold: n=3000 stays exact at exact_max_n=750
    assert Server.build(X, k=5, storage_dtype=jnp.int8).mode == "exact"
    # int8 is exact-only: forcing hash mode must refuse loudly
    with pytest.raises(ValueError, match="exact"):
        Server.build(X, k=5, storage_dtype=jnp.int8, mode="hash")


def test_exact_int8_angular(data):
    """Angular + int8: normalize BEFORE quantizing; queries stay float
    into the engine (it quantizes them itself)."""
    X, Y = data
    srv = Server.build(X, k=5, metric="angular", storage_dtype=jnp.int8)
    assert srv.points.dtype == jnp.int8
    ids, _ = srv.search(Y)
    from approximatenn_tpu.data.preprocess import prepare_points

    Xn, Yn = prepare_points(X, "angular"), prepare_points(Y, "angular")
    ti, _ = ann.brute_force_knn(Xn, Yn, 5)
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 5
        for a, b in zip(np.asarray(ids), np.asarray(ti))
    ])
    assert overlap > 0.9, overlap


def test_auto_picks_hash_above_threshold(data):
    X, Y = data
    srv = Server.build(X, k=5, exact_max_n=1000, tries=4, seed=2)
    assert srv.mode == "hash"
    ids, _ = srv.search(Y)
    assert np.asarray(ids).shape == (32, 5)
    d = srv.describe()
    assert d["layout"] == "table" and d["index_mb"] > 0


def test_hash_packed_layout(data):
    X, Y = data
    srv = Server.build(X, k=5, mode="hash", layout="packed", tries=4, seed=2)
    assert srv.packed is not None
    ids, _ = srv.search(Y)
    ti, _ = ann.brute_force_knn(X, Y, 5)
    hits = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(ids), np.asarray(ti))
    )
    assert hits / (32 * 5) > 0.5


def test_fused_min_batch_scale_aware():
    """Packed-serving routing threshold tracks corpus size (round-3 10M
    A/B: fused wins at every batch at 10M, while at 1M it loses below
    ~512 — XLA's per-row gather degrades with source size)."""
    from approximatenn_tpu.engine.serving import (
        FUSED_MIN_BATCH,
        fused_min_batch,
    )

    assert fused_min_batch(10_000) == FUSED_MIN_BATCH == 512
    assert fused_min_batch(1_000_000) == 512
    assert fused_min_batch(2_000_000) == 256
    assert fused_min_batch(4_000_000) == 128
    assert fused_min_batch(8_000_000) == 0  # measured: always fused
    assert fused_min_batch(10_000_000) == 0
    # monotone non-increasing in n
    vals = [fused_min_batch(n) for n in
            (10**5, 10**6, 2 * 10**6, 5 * 10**6, 10**7, 10**8)]
    assert vals == sorted(vals, reverse=True)


@pytest.mark.slow
def test_packed_routing_fused_kwargs(data):
    """Fused-only kwargs pin the fused path (interpret mode exercises the
    identical kernel on CPU); plain calls on CPU stay on search_packed."""
    X, Y = data
    srv = Server.build(X, k=5, mode="hash", layout="packed", tries=4, seed=2)
    ids_x, _ = srv.search(Y)  # CPU -> search_packed
    ids_f, _ = srv.search(Y, interpret=True)  # fused kw -> fused kernel
    ti, _ = ann.brute_force_knn(X, Y, 5)
    for ids in (ids_x, ids_f):
        hits = sum(
            len(set(a.tolist()) & set(b.tolist()))
            for a, b in zip(np.asarray(ids), np.asarray(ti))
        )
        assert hits / (32 * 5) > 0.5


def test_exact_angular(data):
    X, Y = data
    srv = Server.build(X, k=5, mode="exact", metric="angular")
    ids, _ = srv.search(Y)
    Xn = np.asarray(X) / np.linalg.norm(np.asarray(X), axis=1, keepdims=True)
    Yn = np.asarray(Y) / np.linalg.norm(np.asarray(Y), axis=1, keepdims=True)
    true_ids = np.argsort(
        ((Yn[:, None, :] - Xn[None, :, :]) ** 2).sum(-1), axis=1
    )[:, :5]
    np.testing.assert_array_equal(
        np.sort(np.asarray(ids), 1), np.sort(true_ids, 1)
    )


def test_rejects_unknown_mode(data):
    X, _ = data
    with pytest.raises(ValueError):
        Server.build(X, k=5, mode="banana")


def test_int8_auto_resolves_exact_above_threshold(data):
    """auto must never error on a quantized corpus: it has no hash path,
    so auto resolves to exact even past exact_max_n."""
    X, _ = data
    srv = Server.build(X, k=5, storage_dtype=jnp.int8, exact_max_n=100)
    assert srv.mode == "exact"
