"""Tests for the fused exact-kNN Pallas kernel (interpret mode on CPU —
the identical kernel code compiles for TPU; SURVEY.md §4's fake-backend
pattern applied to a kernel)."""

import numpy as np
import jax.numpy as jnp
import pytest

from approximatenn_tpu.ops.distance import brute_force_knn, brute_force_knn_self
from approximatenn_tpu.ops.pallas_exact import (
    exact_knn_pallas,
    exact_knn_self_pallas,
    exact_search,
    quantize_corpus,
)


class TestExactKNNPallas:
    def test_matches_oracle(self, rng):
        p = jnp.asarray(rng.standard_normal((700, 33)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((57, 33)).astype(np.float32))
        ia, da = exact_knn_pallas(p, q, 7, tile=256, query_block=16, interpret=True)
        ib, db = brute_force_knn(p, q, 7)
        np.testing.assert_array_equal(
            np.sort(np.asarray(ia), 1), np.sort(np.asarray(ib), 1)
        )
        np.testing.assert_allclose(np.asarray(da), np.asarray(db), rtol=1e-4, atol=1e-4)

    def test_bf16_compute_near_exact(self, rng):
        p = jnp.asarray(rng.standard_normal((600, 32)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((40, 32)).astype(np.float32))
        ia, da = exact_knn_pallas(
            p, q, 10, tile=256, query_block=16, interpret=True,
            compute_dtype=jnp.bfloat16,
        )
        ib, _ = brute_force_knn(p, q, 10)
        # bf16 factors round the dots; neighbor sets stay near-identical
        overlap = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(np.asarray(ia), np.asarray(ib))
        ])
        assert overlap > 0.9, overlap
        assert np.all(np.diff(np.asarray(da), axis=1) >= -1e-3)

    def test_bf16_stored_corpus(self, rng):
        """A bf16-stored corpus is streamed at storage width (cdt defaults
        to the storage dtype; no f32 copy) and the result matches the
        oracle evaluated on the same bf16-rounded values."""
        pf = rng.standard_normal((500, 32)).astype(np.float32)
        p = jnp.asarray(pf).astype(jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((40, 32)).astype(np.float32))
        ia, da = exact_knn_pallas(p, q, 10, tile=256, query_block=16,
                                  interpret=True)
        ib, db = brute_force_knn(p.astype(jnp.float32), q, 10)
        overlap = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(np.asarray(ia), np.asarray(ib))
        ])
        assert overlap > 0.9, overlap
        assert np.asarray(da).dtype == np.float32
        np.testing.assert_allclose(
            np.asarray(da)[:, 0], np.asarray(db)[:, 0], rtol=3e-2, atol=3e-2
        )

    def test_split3_matches_f64_oracle(self, rng):
        """The 3-pass split-factor f32 tier (round-4): neighbor ranking
        equals the float64 oracle's at this dynamic range — true-exact
        semantics at ~half HIGHEST's MXU cost on real TPU.  (Interpret
        mode validates the split/recombine arithmetic; the perf claim is
        gated on hardware, tests/test_tpu_smoke.py.)"""
        pf = rng.standard_normal((800, 48)).astype(np.float32)
        qf = rng.standard_normal((40, 48)).astype(np.float32)
        ia, da = exact_knn_pallas(
            jnp.asarray(pf), jnp.asarray(qf), 10, tile=256, query_block=16,
            interpret=True, matmul_precision="split3",
        )
        d64 = ((qf[:, None, :].astype(np.float64)
                - pf[None, :, :].astype(np.float64)) ** 2).sum(-1)
        t64 = np.argsort(d64, 1)[:, :10]
        ia = np.asarray(ia)
        overlap = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(ia, t64)
        ])
        assert overlap == 1.0, overlap
        np.testing.assert_allclose(
            np.asarray(da), np.sort(d64, 1)[:, :10], rtol=1e-4, atol=1e-4
        )

    def test_twophase_merge_matches_reference_semantics(self, rng):
        """The experimental two-phase merge (emit per-segment minima,
        XLA phase-2 top-k) matches a numpy emulation of the SAME
        semantics exactly — validating the emit/merge plumbing; its
        fidelity-vs-exact tradeoff is measured on hardware
        (scripts/exp_twophase.py)."""
        n, d, m, k, tile, seg = 4096, 32, 24, 5, 512, 64
        pf = rng.standard_normal((n, d)).astype(np.float32)
        qf = rng.standard_normal((m, d)).astype(np.float32)
        ia, da = exact_knn_pallas(
            jnp.asarray(pf), jnp.asarray(qf), k, tile=tile,
            query_block=8, interpret=True, merge="twophase",
            twophase_seg=seg,
        )
        # numpy emulation: per-segment minima then top-k of those
        d2 = ((qf[:, None, :] - pf[None, :, :]) ** 2).sum(-1)  # (m, n)
        segd = d2.reshape(m, n // seg, seg)
        nd = segd.min(-1)
        ni = segd.argmin(-1) + np.arange(n // seg)[None, :] * seg
        order = np.argsort(nd, 1, kind="stable")[:, :k]
        want_i = np.take_along_axis(ni, order, 1)
        want_d = np.take_along_axis(nd, order, 1)
        np.testing.assert_array_equal(np.asarray(ia), want_i)
        np.testing.assert_allclose(np.asarray(da), want_d, rtol=1e-4,
                                   atol=1e-4)

    @pytest.mark.parametrize("dt", ["f32", "bf16", "int8"])
    def test_twophase_exact_engine_matches_oracle(self, rng, dt):
        """The EXACT two-phase engine (emit + top-segment DMA rescan):
        id sets equal the brute-force oracle in every storage tier,
        including n that straddles segment and alignment boundaries
        (clamped windows + XLA tail merge)."""
        from approximatenn_tpu.ops.pallas_exact import exact_knn_twophase

        n, d, m, k, seg = 4099, 32, 30, 8, 64
        Xf = rng.standard_normal((n, d)).astype(np.float32)
        Y = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
        sc = None
        if dt == "f32":
            X = jnp.asarray(Xf)
            oracle_p, oracle_q = X, Y
        elif dt == "bf16":
            X = jnp.asarray(Xf).astype(jnp.bfloat16)
            oracle_p = X.astype(jnp.float32)
            oracle_q = Y.astype(jnp.bfloat16).astype(jnp.float32)
        else:
            X, sc = quantize_corpus(jnp.asarray(Xf))
            oracle_p = X.astype(jnp.float32) * sc
            oracle_q = jnp.clip(jnp.round(Y / sc), -127, 127) * sc
        ia, da = exact_knn_twophase(X, Y, k, seg=seg, scale=sc,
                                    interpret=True)
        ib, db = brute_force_knn(oracle_p, oracle_q, k)
        np.testing.assert_array_equal(
            np.sort(np.asarray(ia), 1), np.sort(np.asarray(ib), 1)
        )
        assert (np.diff(np.asarray(da), axis=1) >= -1e-5).all()

    @pytest.mark.slow
    def test_twophase_bigk_matches_oracle(self, rng, monkeypatch):
        """k > 128 rides the emit-all rescan (round-5, VERDICT item 5):
        phase-2 selection and the final top-k run in XLA (lax.top_k past
        128), positions made unique by disjoint original-segment
        masking.  Id sets equal brute force, including an odd n with
        clamped windows + tail merge and multi-launch window chunking.
        The per-launch window cap is shrunk so interpret-mode tracing of
        the unrolled DMA waves stays fast (the production 128-window
        launch compiles on real TPU — the ``exact_bigk_256`` smoke
        gate)."""
        import approximatenn_tpu.ops.pallas_exact as px

        monkeypatch.setattr(px, "_RESCAN_MAX_P", 16)
        n, d, m, k, seg = 3001, 17, 9, 150, 16
        X = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        Y = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
        ia, da = px.exact_knn_twophase(X, Y, k, seg=seg, interpret=True)
        ib, _ = brute_force_knn(X, Y, k)
        np.testing.assert_array_equal(
            np.sort(np.asarray(ia), 1), np.sort(np.asarray(ib), 1)
        )
        assert (np.diff(np.asarray(da), axis=1) >= -1e-5).all()

    def test_exact_search_routes_bigk_interpretable(self, rng):
        """exact_search documents the k > 128 envelope; off-TPU it stays
        on the XLA oracle (identical results either way)."""
        from approximatenn_tpu.ops.pallas_exact import exact_search

        X = jnp.asarray(rng.standard_normal((2000, 12)).astype(np.float32))
        Y = jnp.asarray(rng.standard_normal((7, 12)).astype(np.float32))
        ia, _ = exact_search(X, Y, 140)
        ib, _ = brute_force_knn(X, Y, 140)
        np.testing.assert_array_equal(
            np.sort(np.asarray(ia), 1), np.sort(np.asarray(ib), 1)
        )

    def test_rejects_unknown_precision(self, rng):
        p = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
        with pytest.raises(ValueError, match="matmul_precision"):
            exact_knn_pallas(p, p[:4], 3, interpret=True,
                             matmul_precision="high")

    def test_ascending_order(self, rng):
        p = jnp.asarray(rng.standard_normal((300, 8)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((9, 8)).astype(np.float32))
        _, da = exact_knn_pallas(p, q, 6, tile=128, query_block=8, interpret=True)
        da = np.asarray(da)
        assert (np.diff(da, axis=1) >= 0).all()

    def test_self_exclusion(self, rng):
        p = jnp.asarray(rng.standard_normal((200, 6)).astype(np.float32))
        ia, _ = exact_knn_self_pallas(p, 4, tile=64, query_block=32, interpret=True)
        ia = np.asarray(ia)
        assert not any(i in ia[i] for i in range(200))
        ib, _ = brute_force_knn_self(p, 4)
        np.testing.assert_array_equal(np.sort(ia, 1), np.sort(np.asarray(ib), 1))

    def test_uneven_tile_and_block(self, rng):
        # n not a multiple of tile, m not a multiple of query_block
        p = jnp.asarray(rng.standard_normal((333, 12)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((41, 12)).astype(np.float32))
        ia, _ = exact_knn_pallas(p, q, 5, tile=128, query_block=16, interpret=True)
        ib, _ = brute_force_knn(p, q, 5)
        np.testing.assert_array_equal(
            np.sort(np.asarray(ia), 1), np.sort(np.asarray(ib), 1)
        )

    def test_no_pad_path(self, rng):
        """When the tile divides n the rank kernel compiles without its
        padding-row select (has_pad=False); that specialization must
        still match the oracle exactly, including with exclusions.
        (Auto tiles stay power-of-2 — snapping them to divisors of n
        measured slower at 10M, see the negative result in
        exact_knn_pallas — so this path triggers when n is itself a
        power-of-2 multiple, e.g. 2^20 corpora.)"""
        # tile divides n -> has_pad False inside the kernel
        p = jnp.asarray(rng.standard_normal((768, 16)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((33, 16)).astype(np.float32))
        ia, da = exact_knn_pallas(p, q, 6, tile=256, query_block=16,
                                  interpret=True)
        ib, db = brute_force_knn(p, q, 6)
        np.testing.assert_array_equal(
            np.sort(np.asarray(ia), 1), np.sort(np.asarray(ib), 1)
        )
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   rtol=1e-4, atol=1e-4)
        ia2, _ = exact_knn_pallas(p, p[:32], 6, tile=256, query_block=16,
                                  interpret=True,
                                  exclude=jnp.arange(32, dtype=jnp.int32))
        assert not any(ia2[i, 0] == i for i in range(32))

    def test_k_exceeds_n_pads_with_sentinel(self, rng):
        p = jnp.asarray(rng.standard_normal((5, 4)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32))
        ia, da = exact_knn_pallas(p, q, 8, tile=8, query_block=8, interpret=True)
        ia, da = np.asarray(ia), np.asarray(da)
        assert (ia[:, 5:] == 5).all() and np.isinf(da[:, 5:]).all()

    def test_rejects_large_k(self, rng):
        p = jnp.asarray(rng.standard_normal((10, 4)).astype(np.float32))
        with pytest.raises(ValueError, match="k <= 128"):
            exact_knn_pallas(p, p, 129, interpret=True)

    def test_int8_stored_corpus_matches_quantized_oracle(self, rng):
        """int8 tier: the kernel ranks in the quantized domain with int32
        dots — its neighbor sets must EQUAL the oracle's over the same
        dequantized grid values (both arithmetics are exact there), and
        returned distances are the oracle's (scale^2-rescaled) ones."""
        pf = rng.standard_normal((500, 32)).astype(np.float32)
        q = jnp.asarray(rng.standard_normal((40, 32)).astype(np.float32))
        pq, scale = quantize_corpus(pf)
        assert pq.dtype == jnp.int8
        ia, da = exact_knn_pallas(pq, q, 10, tile=256, query_block=16,
                                  interpret=True, scale=scale)
        # oracle on the identical quantized grid (values and queries)
        s = float(scale)
        pd = np.asarray(pq, np.float32) * s
        qd = np.clip(np.round(np.asarray(q) / s), -127, 127) * s
        ib, db = brute_force_knn(jnp.asarray(pd), jnp.asarray(qd), 10)
        np.testing.assert_array_equal(
            np.sort(np.asarray(ia), 1), np.sort(np.asarray(ib), 1)
        )
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   rtol=1e-4, atol=1e-5)

    def test_int8_recall_vs_full_precision(self, rng):
        """Quantization at d=32 keeps neighbor sets near-identical to the
        full-precision oracle (the tier's quality gate)."""
        pf = rng.standard_normal((600, 32)).astype(np.float32)
        q = jnp.asarray(rng.standard_normal((40, 32)).astype(np.float32))
        pq, scale = quantize_corpus(pf)
        ia, _ = exact_knn_pallas(pq, q, 10, tile=256, query_block=16,
                                 interpret=True, scale=scale)
        ib, _ = brute_force_knn(jnp.asarray(pf), q, 10)
        overlap = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(np.asarray(ia), np.asarray(ib))
        ])
        assert overlap > 0.9, overlap

    def test_int8_requires_scale(self, rng):
        pq, _ = quantize_corpus(rng.standard_normal((64, 8)).astype(np.float32))
        with pytest.raises(ValueError, match="scale"):
            exact_knn_pallas(pq, jnp.zeros((4, 8), jnp.float32), 3,
                             interpret=True)
        with pytest.raises(ValueError, match="scale"):
            # CPU oracle routing checks it too
            exact_search(pq, jnp.zeros((4, 8), jnp.float32), 3)


class TestExactKNNStreaming:
    """The streaming kernel (grid = query blocks; corpus tiles hand-DMA'd
    with double buffering — `_stream_kernel`) must match the oracle in
    every regime the block-pipelined kernel covers.  Interpret mode does
    NOT validate the Mosaic offset-divisibility rules (CLAUDE.md rule 14)
    — scripts/bench_exact_stream.py is the real-TPU gate."""

    def test_matches_oracle_unaligned_n(self, rng):
        # n = 700 pads to 768 rows (128-multiple); 3 tiles, overlapping tail
        p = jnp.asarray(rng.standard_normal((700, 33)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((57, 33)).astype(np.float32))
        ia, da = exact_knn_pallas(p, q, 7, tile=256, query_block=16,
                                  interpret=True, stream=True)
        ib, db = brute_force_knn(p, q, 7)
        np.testing.assert_array_equal(
            np.sort(np.asarray(ia), 1), np.sort(np.asarray(ib), 1)
        )
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   rtol=1e-4, atol=1e-4)

    def test_matches_oracle_aligned_n(self, rng):
        # n a 128-multiple, tile NOT dividing n: 768 = 3 x 256; tile 512
        # makes the last tile start at 256 and overlap [256, 512)
        p = jnp.asarray(rng.standard_normal((768, 16)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((33, 16)).astype(np.float32))
        ia, _ = exact_knn_pallas(p, q, 5, tile=512, query_block=16,
                                 interpret=True, stream=True)
        ib, _ = brute_force_knn(p, q, 5)
        np.testing.assert_array_equal(
            np.sort(np.asarray(ia), 1), np.sort(np.asarray(ib), 1)
        )

    def test_self_exclusion(self, rng):
        p = jnp.asarray(rng.standard_normal((300, 6)).astype(np.float32))
        ia, _ = exact_knn_self_pallas(p, 4, tile=128, query_block=32,
                                      interpret=True, stream=True)
        ia = np.asarray(ia)
        assert not any(i in ia[i] for i in range(300))
        ib, _ = brute_force_knn_self(p, 4)
        np.testing.assert_array_equal(np.sort(ia, 1), np.sort(np.asarray(ib), 1))

    def test_bf16_stored_corpus(self, rng):
        pf = rng.standard_normal((500, 32)).astype(np.float32)
        p = jnp.asarray(pf).astype(jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((24, 32)).astype(np.float32))
        ia, _ = exact_knn_pallas(p, q, 10, tile=128, query_block=8,
                                 interpret=True, stream=True)
        ib, _ = brute_force_knn(p.astype(jnp.float32), q, 10)
        overlap = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(np.asarray(ia), np.asarray(ib))
        ])
        assert overlap > 0.9, overlap

    def test_int8_matches_quantized_oracle(self, rng):
        pf = rng.standard_normal((500, 32)).astype(np.float32)
        q = jnp.asarray(rng.standard_normal((24, 32)).astype(np.float32))
        pq, scale = quantize_corpus(pf)
        ia, da = exact_knn_pallas(pq, q, 10, tile=128, query_block=8,
                                  interpret=True, scale=scale, stream=True)
        s = float(scale)
        pd = np.asarray(pq, np.float32) * s
        qd = np.clip(np.round(np.asarray(q) / s), -127, 127) * s
        ib, db = brute_force_knn(jnp.asarray(pd), jnp.asarray(qd), 10)
        np.testing.assert_array_equal(
            np.sort(np.asarray(ia), 1), np.sort(np.asarray(ib), 1)
        )
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   rtol=1e-4, atol=1e-5)

    def test_stream_matches_grid_kernel(self, rng):
        """Same inputs through both kernels: identical neighbor ids; the
        distances agree to ~1 ulp (the streaming kernel folds the point
        norm into the score as ``qn - (2*dots - pn)`` — a different
        association than the grid kernel's ``qn + pn - 2*dots``)."""
        p = jnp.asarray(rng.standard_normal((640, 12)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((19, 12)).astype(np.float32))
        ia, da = exact_knn_pallas(p, q, 6, tile=128, query_block=8,
                                  interpret=True, stream=True)
        ib, db = exact_knn_pallas(p, q, 6, tile=128, query_block=8,
                                  interpret=True, stream=False)
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   rtol=1e-5, atol=1e-5)


def test_quantize_corpus_chunked_matches_one_shot(rng, monkeypatch):
    """The fenced chunked quantizer (corpora past ~1 GB — the 24-32M tier
    the one-shot eager chain OOMs at) is bit-identical to the one-shot."""
    import approximatenn_tpu.ops.pallas_exact as pe

    X = rng.standard_normal((1000, 16)).astype(np.float32)
    q1, s1 = pe.quantize_corpus(X)
    monkeypatch.setattr(pe, "_QUANT_CHUNKED_MIN_BYTES", 0)
    q2, s2 = pe.quantize_corpus(X, chunk_rows=137)
    assert float(s1) == float(s2)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
