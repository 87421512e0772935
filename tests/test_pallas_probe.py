"""Fused probe-window kernel (ops/pallas_probe) vs a jnp oracle.

Runs the identical kernel in interpret mode on CPU (as test_pallas.py does
for the exact kernel); the oracle gathers the same CSR windows with plain
jnp indexing and reduces with the library's dedup/top-k ops.
"""

import jax.numpy as jnp
import numpy as np
import pytest

# big-shape virtual-mesh / interpret-mode kernel gates: the bulk of the
# suite's wall clock.  Inner loop: -m 'not slow'.
pytestmark = pytest.mark.slow

import approximatenn_tpu as ann
from approximatenn_tpu.engine.search import search_packed_fused
from approximatenn_tpu.ops.pallas_probe import probe_topk_pallas


@pytest.fixture(scope="module")
def setup(request):
    rng = np.random.default_rng(99)
    X = jnp.asarray(rng.standard_normal((3000, 32)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((37, 32)).astype(np.float32))
    index, _, _ = ann.build(X, 8, tries=4, seed=11, store_points=True)
    pv = index.packed(super_width=2)
    return X, Y, index, pv


def _oracle_positions(pv, queries, starts, window, k):
    """Same candidate semantics as the kernel, via plain jnp gathers."""
    n, tries = pv.n, pv.tries
    n_pad = pv.n_rows * pv.super_width
    d = pv.lane_dim  # zero/inf pad lanes are distance-neutral vs 0-pad queries
    pts = pv.point_rows.reshape(tries, n_pad, d)
    queries = jnp.pad(queries, [(0, 0), (0, d - queries.shape[1])])
    m, _, P = starts.shape
    win_ix = starts[..., None] + jnp.arange(window)  # (m, tries, P, window)
    out_p, out_d = [], []
    for t in range(tries):
        pos = win_ix[:, t].reshape(m, P * window)  # within-table slots
        cand = pts[t][pos]  # (m, L, d)
        dd = jnp.sum((cand - queries[:, None, :]) ** 2, -1)
        dd = jnp.where(pos < n, dd, jnp.inf)
        from approximatenn_tpu.ops.topk import dedup_topk

        tp, td = dedup_topk(pos.astype(jnp.int32), dd, k, n)
        out_p.append(tp)
        out_d.append(td)
    return jnp.stack(out_p, 1), jnp.stack(out_d, 1)


def test_kernel_matches_oracle(setup):
    X, Y, index, pv = setup
    from approximatenn_tpu.ops.hash import pack_signs, probe_codes

    n_pad = pv.n_rows * pv.super_width
    window = 24
    m = Y.shape[0]
    yc = Y - pv.row_means
    proj = yc @ pv.bases.reshape(pv.tries * pv.d_short, pv.d).T
    codes = pack_signs(proj.reshape(m, pv.tries, pv.d_short))
    probes = probe_codes(codes, pv.d_short)
    table_idx = jnp.arange(pv.tries, dtype=jnp.int32)[None, :, None]
    starts = jnp.minimum(pv.starts[table_idx, probes], n_pad - window)

    pts_flat = pv.point_rows.reshape(pv.tries * n_pad, pv.lane_dim)
    Yp = jnp.pad(Y, [(0, 0), (0, pv.lane_dim - pv.d)])
    pos, dd = probe_topk_pallas(
        pts_flat, Yp, starts, k=pv.k, n=pv.n, n_pad=n_pad, window=window,
        query_block=16, interpret=True,
    )
    # the kernel widens each window to its 8-aligned superset (HBM DMA
    # rows must start 8-aligned); feed the oracle the same windows
    win_al = min(-(-(window + 7) // 8) * 8, n_pad)
    starts_al = jnp.clip(starts // 8, 0, (n_pad - win_al) // 8) * 8
    opos, odd = _oracle_positions(pv, Y, starts_al, win_al, pv.k)
    # same positions (ties can reorder equal distances; compare sets+dists)
    np.testing.assert_allclose(
        np.sort(np.asarray(dd), -1), np.sort(np.asarray(odd), -1),
        rtol=1e-5, atol=1e-5,
    )
    got = np.sort(np.where(np.isinf(np.asarray(dd)), pv.n, np.asarray(pos)), -1)
    want = np.sort(np.where(np.isinf(np.asarray(odd)), pv.n, np.asarray(opos)), -1)
    np.testing.assert_array_equal(got, want)


def test_kernel_wave_and_alignment_envelope(setup):
    """Compile-envelope regressions (round 2): many probes force multiple
    DMA waves (P > _DMA_INFLIGHT_MAX / bq) and a non-8-multiple
    query_block must shrink to an (8,128)-tileable tile, not ship as-is.
    Interpret mode exercises the wave indexing; the real-TPU compile side
    is covered by scripts/dbg_probe_compile.py (512 in-flight DMAs and
    bq=12 both fail Mosaic outright)."""
    X, Y, index, pv = setup
    rng = np.random.default_rng(5)
    n_pad = pv.n_rows * pv.super_width
    window = 16
    P = 60  # bq=8, P_wave=48 -> two waves
    m = Y.shape[0]
    starts = jnp.asarray(
        rng.integers(0, max(1, (n_pad - window) // 8), (m, pv.tries, P)) * 8,
        jnp.int32,
    )
    pts_flat = pv.point_rows.reshape(pv.tries * n_pad, pv.lane_dim)
    Yp = jnp.pad(Y, [(0, 0), (0, pv.lane_dim - pv.d)])
    pos, dd = probe_topk_pallas(
        pts_flat, Yp, starts, k=pv.k, n=pv.n, n_pad=n_pad, window=window,
        query_block=12, interpret=True,  # 12 must internally become 8
    )
    # the kernel always widens to window+7 rounded up to 8 (covers the
    # floor-to-8 of unaligned starts); these starts are pre-aligned, so
    # the extra tail slots are real candidates the oracle must also read
    win_al = min(-(-(window + 7) // 8) * 8, n_pad)
    starts_al = jnp.clip(starts, 0, n_pad - win_al)
    opos, odd = _oracle_positions(pv, Y, starts_al, win_al, pv.k)
    np.testing.assert_allclose(
        np.sort(np.asarray(dd), -1), np.sort(np.asarray(odd), -1),
        rtol=1e-5, atol=1e-5,
    )
    got = np.sort(np.where(np.isinf(np.asarray(dd)), pv.n, np.asarray(pos)), -1)
    want = np.sort(np.where(np.isinf(np.asarray(odd)), pv.n, np.asarray(opos)), -1)
    np.testing.assert_array_equal(got, want)


def test_query_block_ceiling_and_pos_mode(setup):
    """query_block is capped at the measured compile-safe ceiling
    (_BQ_MAX=32: bq=64 fails Mosaic real-TPU compiles at small L), and
    results are invariant to the query tile; pos_mode rejects unknown
    values ("stub" is measurement-only, scripts/exp_probe_attrib.py)."""
    X, Y, index, pv = setup
    rng = np.random.default_rng(7)
    n_pad = pv.n_rows * pv.super_width
    window, P = 16, 4
    m = Y.shape[0]
    starts = jnp.asarray(
        rng.integers(0, max(1, n_pad - 2 * window), (m, pv.tries, P)),
        jnp.int32,
    )
    pts_flat = pv.point_rows.reshape(pv.tries * n_pad, pv.lane_dim)
    Yp = jnp.pad(Y, [(0, 0), (0, pv.lane_dim - pv.d)])
    kw = dict(k=pv.k, n=pv.n, n_pad=n_pad, window=window, interpret=True)
    p16, d16 = probe_topk_pallas(pts_flat, Yp, starts, query_block=16, **kw)
    p64, d64 = probe_topk_pallas(pts_flat, Yp, starts, query_block=64, **kw)
    np.testing.assert_array_equal(np.asarray(p16), np.asarray(p64))
    np.testing.assert_array_equal(np.asarray(d16), np.asarray(d64))
    with pytest.raises(ValueError, match="pos_mode"):
        probe_topk_pallas(pts_flat, Yp, starts, pos_mode="bogus", **kw)


def test_fused_end_to_end_recall(setup):
    X, Y, index, pv = setup
    ids_f, dd_f = search_packed_fused(pv, queries=Y, interpret=True)
    assert ids_f.shape == (37, 8)
    tq, _ = ann.brute_force_knn(X, Y, 8)
    tq, got = np.asarray(tq), np.asarray(ids_f)
    recall = np.mean([
        len(set(got[i]) & set(tq[i])) / 8 for i in range(got.shape[0])
    ])
    # candidate semantics ~= packed path; must be in the same quality band
    ids_p, _ = ann.search_packed(pv, queries=Y)
    ref = np.asarray(ids_p)
    recall_p = np.mean([
        len(set(ref[i]) & set(tq[i])) / 8 for i in range(ref.shape[0])
    ])
    assert recall >= recall_p - 0.05, (recall, recall_p)
    # distances are true squared L2 on raw coords for returned ids
    fin = got < X.shape[0]
    d2 = np.asarray(
        jnp.sum((X[np.where(fin, got, 0)] - np.asarray(Y)[:, None, :]) ** 2, -1)
    )
    np.testing.assert_allclose(
        np.where(fin, d2, 0), np.where(fin, np.asarray(dd_f), 0),
        rtol=1e-4, atol=1e-4,
    )


def test_fused_window_override(setup):
    X, Y, index, pv = setup
    ids_small, _ = search_packed_fused(pv, queries=Y, window=4, interpret=True)
    ids_big, _ = search_packed_fused(pv, queries=Y, window=64, interpret=True)
    tq, _ = ann.brute_force_knn(X, Y, 8)
    tq = np.asarray(tq)

    def rec(ids):
        g = np.asarray(ids)
        return np.mean([len(set(g[i]) & set(tq[i])) / 8 for i in range(len(g))])

    assert rec(ids_big) >= rec(ids_small)  # window is the depth/recall knob


def test_fused_rerank_width(setup):
    """rerank_width widens the kernel's per-table top-k and the merged
    pool (same lever as search(rerank_width=...)); recall must be
    monotone-ish and output contract unchanged."""
    X, Y, index, pv = setup
    tq, _ = ann.brute_force_knn(X, Y, 8)
    tq = np.asarray(tq)

    def rec(ids):
        g = np.asarray(ids)
        return np.mean([len(set(g[i]) & set(tq[i])) / 8 for i in range(len(g))])

    ids0, dd0 = search_packed_fused(pv, queries=Y, interpret=True)
    ids_w, dd_w = search_packed_fused(pv, queries=Y, interpret=True,
                                      rerank_width=24)
    assert ids_w.shape == ids0.shape == (37, 8)
    d = np.asarray(dd_w)
    fin = np.isfinite(d)
    assert (np.diff(np.where(fin, d, np.inf), axis=1) >= -1e-6)[fin[:, 1:]].all()
    assert rec(ids_w) >= rec(ids0) - 1e-9  # wider pool never hurts here


def test_packed_rerank_width(setup):
    X, Y, index, pv = setup
    tq, _ = ann.brute_force_knn(X, Y, 8)
    tq = np.asarray(tq)

    def rec(ids):
        g = np.asarray(ids)
        return np.mean([len(set(g[i]) & set(tq[i])) / 8 for i in range(len(g))])

    ids0, _ = ann.search_packed(pv, queries=Y)
    ids_w, _ = ann.search_packed(pv, queries=Y, rerank_width=24)
    assert ids_w.shape == ids0.shape
    assert rec(ids_w) >= rec(ids0) - 1e-9


def test_fused_int8_tier(setup):
    """int8-quantized rows through the fused kernel (interpret mode):
    recall stays in the float band (the post-kernel re-score fixes the
    ~7-bit candidate ranking) and returned distances are TRUE squared L2
    against the float corpus."""
    X, Y, index, pv = setup
    pq = index.packed(super_width=2, dtype=jnp.int8)
    assert pq.point_rows.dtype == jnp.int8
    assert (pq.n_rows * pq.super_width) % 32 == 0
    ids_q, dd_q = search_packed_fused(pq, queries=Y, interpret=True)
    ids_f, _ = search_packed_fused(pv, queries=Y, interpret=True)
    tq, _ = ann.brute_force_knn(X, Y, 8)
    tq = np.asarray(tq)

    def rec(ids):
        g = np.asarray(ids)
        return np.mean([len(set(g[i]) & set(tq[i])) / 8 for i in range(len(g))])

    assert rec(ids_q) >= rec(ids_f) - 0.05, (rec(ids_q), rec(ids_f))
    got = np.asarray(ids_q)
    fin = got < X.shape[0]
    d2 = np.asarray(
        jnp.sum((X[np.where(fin, got, 0)] - np.asarray(Y)[:, None, :]) ** 2, -1)
    )
    np.testing.assert_allclose(
        np.where(fin, d2, 0), np.where(fin, np.asarray(dd_q), 0),
        rtol=1e-4, atol=1e-4,
    )
