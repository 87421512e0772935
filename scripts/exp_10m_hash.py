#!/usr/bin/env python
"""Hash path at the Deep-10M operating point (10M x 96) on ONE chip —
round-1 VERDICT item 2: the hash algorithm's reason to exist is n beyond
the exact engine's comfort zone, so measure it there.

Corpus is synthesized ON DEVICE (H2D of 3.84 GB is impractical on the
tunnel): mildly-skewed clustered Gaussian, the realistic bucket-statistics
regime (see data.datasets.synthesize).  Ground truth = the fused exact
Pallas kernel (recall 1.0, measured 10k QPS at this op point).

Prints JSON lines; run with nohup (build takes tens of minutes):
  PYTHONPATH=/root/.axon_site:/root/repo nohup python -u scripts/exp_10m_hash.py > /tmp/exp10m.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import time


def synth_clustered(n, d, nq, n_clusters=10_000, spread=2.0, seed=0):
    """Clustered Gaussian on device: centers ~ N(0, spread^2), sizes mildly
    zipf-skewed via a power-law categorical draw."""
    import jax
    import jax.numpy as jnp

    kc, ka, kx, kq, kp = jax.random.split(jax.random.PRNGKey(seed), 5)
    centers = jax.random.normal(kc, (n_clusters, d), jnp.float32) * spread
    # zipf-ish cluster popularity: p_i ∝ (i+1)^-1.05, sampled by inverse
    # CDF (categorical would broadcast logits to (n, n_clusters) — 37 GB
    # at n=1M — searchsorted is O(n log C) and O(C) memory)
    w = jnp.arange(1, n_clusters + 1, dtype=jnp.float32) ** -1.05
    cdf = jnp.cumsum(w) / jnp.sum(w)
    u = jax.random.uniform(ka, (n,), jnp.float32)
    cid = jnp.clip(jnp.searchsorted(cdf, u), 0, n_clusters - 1)
    X = centers[cid] + jax.random.normal(kx, (n, d), jnp.float32)
    qi = jax.random.randint(kq, (nq,), 0, n)
    Y = X[qi] + 0.1 * jax.random.normal(kp, (nq, d), jnp.float32)
    return X, Y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--nq", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tries", type=int, default=10)
    ap.add_argument("--capacity", type=int, default=64,
                    help="bucket capacity; 'auto' at 10M wants 32x mean=320 "
                         "-> 12.8 GB of tables, over HBM with the corpus — "
                         "64 (6.4x mean) fits alongside everything else")
    ap.add_argument("--build-n-probes", type=int, default=None,
                    help="directed probes for the graph build (None=blind)")
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    import os

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    import approximatenn_tpu as ann
    from approximatenn_tpu.harness.scoring import recall_at_k
    from approximatenn_tpu.utils.profiling import fence

    n, d, nq, k = args.n, args.d, args.nq, args.k
    t0 = time.perf_counter()
    X, Y = synth_clustered(n, d, nq)
    fence([X, Y])
    print(json.dumps({"stage": "synth", "n": n, "d": d,
                      "s": round(time.perf_counter() - t0, 1)}), flush=True)

    # ground truth from the exact kernel
    t0 = time.perf_counter()
    tq, tqd = ann.exact_search(X, Y, k)
    tq = np.asarray(tq)
    print(json.dumps({"stage": "groundtruth",
                      "s": round(time.perf_counter() - t0, 1)}), flush=True)

    last = {"t": time.perf_counter()}

    def progress(msg):
        now = time.perf_counter()
        if now - last["t"] > 60:
            print(json.dumps({"stage": "build-progress", "msg": msg}), flush=True)
            last["t"] = now

    t0 = time.perf_counter()
    from approximatenn_tpu.engine import build as build_mod

    # build() resolves graph_mode=auto->hash at 10M; thread progress through
    index, graph, _ = ann.build(
        X, k, tries=args.tries, seed=7, capacity=args.capacity,
        n_probes=args.build_n_probes,
    )
    fence([graph])
    build_s = time.perf_counter() - t0
    print(json.dumps({
        "stage": "build", "s": round(build_s, 1), "tmax": index.tmax,
        "d_short": index.d_short,
        "table_mb_padded": round(index.memory_bytes(ragged=False) / 2**20, 1),
        "table_mb_ragged": round(index.memory_bytes(ragged=True) / 2**20, 1),
    }), flush=True)

    def bench(label, fn, batch, reps=5):
        out = fn()
        fence(out)
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / reps
        ids = np.asarray(out[0])
        rec = recall_at_k(tq[: ids.shape[0]], ids, k)
        print(json.dumps({
            "config": label, "batch": batch, "qps": round(batch / dt, 1),
            "ms_per_batch": round(dt * 1e3, 2), "recall_at_10": round(rec, 4),
        }), flush=True)

    for batch in (1000, 100):
        Yb = Y[:batch]
        bench(f"hash blind P={index.d_short + 1}",
              lambda: ann.search(index, X, Yb), batch)
        for P in (18, 48):
            bench(f"hash directed P={P}",
                  lambda: ann.search(index, X, Yb, n_probes=P), batch)
        bench("hash directed P=18 rerank=50",
              lambda: ann.search(index, X, Yb, n_probes=18, rerank_width=50),
              batch)
        bench("exact (Pallas)", lambda: ann.exact_search(X, Yb, k), batch)


if __name__ == "__main__":
    main()
