#!/usr/bin/env python
"""Recall decay vs insert fraction for streaming add_points, with and
without reverse-edge repair (round-4 VERDICT item 8).

Protocol: clustered 100k x 128 corpus; build on the first (1-f)*n rows,
insert the rest via add_points (repair on / off), serve 1000 queries
drawn near the FULL corpus (so a fraction of queries' true neighbors are
inserted points), score recall@10 vs brute force over the full corpus.
The full-rebuild index on all n rows is the ceiling.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_insert_decay.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import approximatenn_tpu as ann
from approximatenn_tpu.harness.scoring import recall_at_k
from approximatenn_tpu.utils.profiling import fence

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

rng = np.random.default_rng(11)
n, d, k = 100_000, 128, 10
n_clusters = 1000
centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 3
cid = rng.integers(0, n_clusters, n)
X = (centers[cid] + rng.standard_normal((n, d))).astype(np.float32)
# shuffle so the insert tail is distributionally identical to the base
perm = rng.permutation(n)
X = X[perm]
qi = rng.integers(0, n, 1000)
Y = (X[qi] + 0.1 * rng.standard_normal((1000, d))).astype(np.float32)
Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
fence([Xd, Yd])
true_ids, _ = ann.exact_search(Xd, Yd, k)
true_ids = np.asarray(true_ids)


def serve_recall(idx, pts):
    ids, _ = ann.search(idx, pts, Yd)
    return recall_at_k(true_ids, np.asarray(ids), k)


t0 = time.perf_counter()
full_idx, _, _ = ann.build(Xd, k, tries=6, seed=3, capacity="auto",
                           store_points=True)
fence([full_idx.graph])
print(f"full rebuild: recall {serve_recall(full_idx, Xd):.4f} "
      f"(build {time.perf_counter() - t0:.0f} s)", flush=True)
del full_idx

# streaming pattern: inserts arrive in 5k batches (one add_points call
# each) — also keeps the repair pass O(affected x batch) per call
CHUNK = 5000
for frac in (0.05, 0.1, 0.2, 0.4):
    n0 = n - int(n * frac) // CHUNK * CHUNK
    base, _, _ = ann.build(Xd[:n0], k, tries=6, seed=3, capacity="auto",
                           store_points=True)
    fence([base.graph])
    for repair in (False, True):
        t0 = time.perf_counter()
        idx = base
        for lo in range(n0, n, CHUNK):
            idx = idx.add_points(Xd[lo: lo + CHUNK],
                                 repair_reverse_edges=repair)
        fence([idx.graph])
        rec = serve_recall(idx, None)
        print(f"frac={frac:.2f} repair={repair!s:5s} recall {rec:.4f} "
              f"(adds {time.perf_counter() - t0:.1f} s)", flush=True)
        del idx
    del base
print("done", flush=True)
