#!/usr/bin/env python
"""Exact serving on a bf16-stored corpus — the exact engine's scale axis.

exact_knn_pallas streams a bf16 corpus at storage width (no f32 copy,
f32 accumulation; ops/pallas_exact.py), halving both HBM residency and
the point-stream bytes.  This measures QPS + recall-vs-f32-oracle at the
Deep-10M operating point and at 16M x 96 — past the f32 engine's
corpus-fits-in-HBM bound (~8M x 128), on ONE chip.

  PYTHONPATH=/root/.axon_site:/root/repo nohup python -u \
    scripts/bench_exact_bf16.py > /tmp/exact_bf16.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[10_000_000, 16_000_000])
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--nq", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
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

    from exp_10m_hash import synth_clustered

    d, nq, k = args.d, args.nq, args.k
    for n in args.n:
        X, Y = synth_clustered(n, d, nq)
        fence([X, Y])
        # f32 ground truth for the recall-vs-full-precision gate (the f32
        # corpus coexists with the bf16 copy during the cast, then frees)
        tq, _ = ann.exact_search(X, Y, k)
        tq = np.asarray(tq)
        Xb = X.astype(jnp.bfloat16)
        fence([Xb])
        del X
        out = ann.exact_search(Xb, Y, k)
        fence(out)
        t0 = time.perf_counter()
        outs = [ann.exact_search(Xb, Y, k) for _ in range(args.reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / args.reps
        rec = round(recall_at_k(tq, np.asarray(out[0]), k), 4)
        print(json.dumps({
            "engine": "exact-bf16", "n": n, "d": d,
            "qps": round(nq / dt, 1), "ms_per_batch": round(dt * 1e3, 2),
            "recall_at_10_vs_f32": rec,
            "corpus_gb": round(n * d * 2 / 2**30, 2),
        }), flush=True)
        del Xb, Y, out, outs


if __name__ == "__main__":
    main()
