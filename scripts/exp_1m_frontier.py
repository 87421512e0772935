#!/usr/bin/env python
"""Close the last recall gap on the 1M ladder (round-1 VERDICT item 10):
exact rerank of a widened candidate pool via search(rerank_width=...) —
the candidates' true distances are already computed, so widening the
per-table pool before the merge buys recall at ~(width/k)x supercharge
cost and zero extra bucket reads.  Target: >= 0.98 recall@10 at > 1k QPS
on the SIFT-1M stand-in.

  PYTHONPATH=/root/.axon_site:/root/repo nohup python -u scripts/exp_1m_frontier.py > /tmp/front1m.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tries", type=int, default=10)
    ap.add_argument("--capacity", type=int, default=245)
    ap.add_argument("--build-n-probes", type=int, default=24)
    ap.add_argument("--batch", type=int, default=1000)
    args = ap.parse_args()

    import os

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import numpy as np

    import approximatenn_tpu as ann
    from approximatenn_tpu.data import datasets
    from approximatenn_tpu.harness.scoring import recall_at_k
    from approximatenn_tpu.utils.profiling import fence

    k = args.k
    ds = datasets.load("sift-1m")  # deterministic stand-in (seed pinned)
    import jax.numpy as jnp

    X = jnp.asarray(ds.base)
    Y = jnp.asarray(ds.queries[: args.batch])
    fence([X, Y])
    tq, _ = ann.exact_search(X, Y, k)
    tq = np.asarray(tq)
    print(json.dumps({"stage": "gt done"}), flush=True)

    t0 = time.perf_counter()
    index, graph, _ = ann.build(X, k, tries=args.tries, seed=7,
                                capacity=args.capacity,
                                n_probes=args.build_n_probes)
    fence([graph])
    print(json.dumps({"stage": "build",
                      "s": round(time.perf_counter() - t0, 1),
                      "tmax": index.tmax}), flush=True)

    def bench(label, fn, reps=5):
        try:
            out = fn()
            fence(out)
        except Exception as e:
            print(json.dumps({"config": label, "error": repr(e)[:200]}),
                  flush=True)
            return
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / reps
        rec = recall_at_k(tq, np.asarray(out[0]), k)
        print(json.dumps({
            "config": label, "qps": round(args.batch / dt, 1),
            "ms_per_batch": round(dt * 1e3, 2),
            "recall_at_10": round(rec, 4),
        }), flush=True)

    for P in (18, 48):
        for width in (None, 30, 50, 100):
            for rounds in (1, 2):
                if width is None and rounds == 2:
                    continue  # round-1 already measured plain P sweeps
                bench(
                    f"directed P={P} rerank={width or k} rounds={rounds}",
                    lambda P=P, width=width, rounds=rounds: ann.search(
                        index, X, Y, n_probes=P, rerank_width=width,
                        supercharge_rounds=rounds),
                )


if __name__ == "__main__":
    main()
