"""CLI harness tests (gates 1-3 of SURVEY.md §4, driven programmatically)."""

import numpy as np
import pytest

from approximatenn_tpu.harness import compare_results, test_correctness, time_results
from approximatenn_tpu.harness.compare_results import diffcount, ulp_units
from approximatenn_tpu.harness.scoring import Score, score_guesses, true_ranks


class TestScoring:
    def test_true_ranks_self_mode(self, rng):
        X = rng.standard_normal((20, 4)).astype(np.float32)
        inv = true_ranks(X, None)
        # self is pushed to worst rank
        assert all(inv[i, i] == 19 for i in range(20))

    def test_perfect_guess_scores_zero_excess(self, rng):
        X = rng.standard_normal((50, 8)).astype(np.float32)
        dd = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(dd, np.inf)
        guess = np.argsort(dd, 1)[:, :5]
        s = score_guesses(X, None, guess, 5)
        assert s.mean_excess_rank == pytest.approx(0.0)
        assert s.prob_correct == 1.0

    def test_sentinel_guess_scored_worst(self, rng):
        X = rng.standard_normal((10, 4)).astype(np.float32)
        guess = np.full((10, 3), 10)  # all sentinels
        s = score_guesses(X, None, guess, 3)
        assert s.prob_correct == 0.0


class TestCompareHelpers:
    def test_ulp_units_zero_for_identical(self):
        a = np.array([1.0, -2.5, 0.0], np.float32)
        assert ulp_units(a, a.copy()) == 0.0

    def test_ulp_units_counts_large_gaps(self):
        a = np.array([1.0], np.float32)
        b = np.array([1.001], np.float32)
        assert ulp_units(a, b) > 0

    def test_ulp_units_sign_crossing_monotonic(self):
        a = np.array([-1e-30], np.float32)
        b = np.array([1e-30], np.float32)
        assert ulp_units(a, b) < ulp_units(np.float32([-1.0]), np.float32([1.0]))

    def test_diffcount(self):
        assert diffcount(np.array([1, 2, 3]), np.array([1, 9, 3])) == 1


class TestCLIs:
    def test_test_correctness_index_mode(self, capsys):
        rc = test_correctness.main(
            ["-n", "200", "-k", "5", "-d", "16", "-o", "2", "--seed", "0", "-c"]
        )
        out = capsys.readouterr().out
        assert rc == 0 and "Prob correct" in out
        prob = float(out.split("Prob correct: ")[1].split(".\n")[0])
        assert prob > 0.8

    def test_test_correctness_query_mode(self, capsys):
        rc = test_correctness.main(
            ["-n", "200", "-k", "5", "-d", "16", "-o", "2", "-z", "--seed", "0", "-c"]
        )
        assert rc == 0 and "query" in capsys.readouterr().out

    def test_time_results_modes(self, capsys):
        rc = time_results.main(
            ["-n", "128", "-k", "4", "-d", "8", "-o", "2", "--seed", "0", "-c"]
        )
        assert rc == 0 and "Average time for comp" in capsys.readouterr().out
        rc = time_results.main(
            ["-n", "128", "-k", "4", "-d", "8", "-o", "2", "-y", "16", "--seed", "0", "-c"]
        )
        assert rc == 0 and "query" in capsys.readouterr().out

    def test_compare_results_parity(self, capsys):
        """Backend parity gate (role of compare_results.c): identical keys
        => identical graphs.  On the CPU-only test rig this degenerates to
        CPU-vs-CPU, which must be exactly zero diff; on TPU rigs it
        exercises true cross-backend parity."""
        rc = compare_results.main(
            ["-n", "200", "-k", "5", "-d", "16", "-o", "2", "--seed", "0"]
        )
        out = capsys.readouterr().out
        assert rc == 0
        # one row per graph_mode: the hash pipeline (divergence-prone path
        # the gate exists for) and the exact-graph path
        rows = out.split("graph diff count: ")[1:]
        assert len(rows) == 2 and "[graph_mode=hash]" in out
        for row in rows:
            assert float(row.split(" ")[0]) == 0.0

    def test_compare_results_query_mode(self, capsys):
        rc = compare_results.main(
            ["-n", "200", "-k", "5", "-d", "16", "-o", "2", "-z", "--seed", "0"]
        )
        out = capsys.readouterr().out
        assert rc == 0
        qdiff = float(out.split("query diff count: ")[1].split(" ")[0])
        assert qdiff == 0.0
