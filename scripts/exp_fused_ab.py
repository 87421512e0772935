#!/usr/bin/env python
"""A/B the fused probe-window Pallas kernel (search_packed_fused) against
the XLA paths (search / search_packed) — round-1 VERDICT item 3.

Acceptance rule: the fused path must beat the incumbent serving QPS at
equal recall, else the gather wall stands and we document why.  The
interesting regimes (docs/ARCHITECTURE.md): large corpora and small
batches, where exhaustive MXU scan pays its full corpus read per batch
while probing reads sublinearly.

Run 1M (fits f32 packed, tries=10):
  PYTHONPATH=/root/.axon_site:/root/repo nohup python -u scripts/exp_fused_ab.py --n 1000000 > /tmp/ab1m.log 2>&1 &
Run 10M (bf16 packed, tries=4 to fit HBM):
  ... --n 10000000 --tries 4 --packed-dtype bf16 --capacity 48
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--nq", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tries", type=int, default=10)
    ap.add_argument("--capacity", default="auto")
    ap.add_argument("--packed-dtype", default=None,
                    choices=[None, "f32", "bf16", "int8"])
    ap.add_argument("--super-width", type=int, default=2)
    ap.add_argument("--query-block", type=int, nargs="+", default=[16])
    ap.add_argument("--batches", type=int, nargs="+", default=[1000, 100])
    ap.add_argument("--windows", type=int, nargs="+", default=[32, 64, 96])
    ap.add_argument("--n-probes", type=int, nargs="+", default=[18])
    ap.add_argument("--supercharge-rounds", type=int, default=1)
    ap.add_argument("--skip-xla", action="store_true",
                    help="skip the packed-xla rows (fused-only sweeps)")
    ap.add_argument("--rerank", type=int, nargs="*", default=[30, 50],
                    help="rerank_width values to bench on the fused path "
                         "(widest window)")
    ap.add_argument("--free-corpus", action="store_true",
                    help="stage the corpus to the packed dtype and free the "
                         "f32 copy before packing (10M: f32 corpus + packed "
                         "buffer exceed HBM together); searches + the exact "
                         "bench then run on the staged-dtype corpus")
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

    from exp_10m_hash import synth_clustered  # same corpus generator

    n, d, nq, k = args.n, args.d, args.nq, args.k
    cap = args.capacity if args.capacity == "auto" else int(args.capacity)
    pdt = {None: None, "f32": jnp.float32, "bf16": jnp.bfloat16,
           "int8": jnp.int8}[args.packed_dtype]

    print(json.dumps({"args": vars(args)}), flush=True)
    X, Y = synth_clustered(n, d, nq)
    fence([X, Y])
    tq, _ = ann.exact_search(X, Y, k)
    tq = np.asarray(tq)
    print(json.dumps({"stage": "gt done", "n": n, "d": d}), flush=True)

    t0 = time.perf_counter()
    index, graph, gd = ann.build(X, k, tries=args.tries, seed=7, capacity=cap,
                                 n_probes=args.n_probes[0])
    fence([graph])
    del gd, graph  # free gdists (n x k f32, 0.4 GB at 10M); graph lives on index
    print(json.dumps({"stage": "build", "s": round(time.perf_counter() - t0, 1),
                      "tmax": index.tmax, "graph_mode": "auto"}), flush=True)
    if args.free_corpus:
        from approximatenn_tpu.index import stage_points

        # packed-serving-only flow: the padded tables (1.2 GB at
        # 10M/tries=6) are never read again — reclaim the HBM before the
        # multi-GB pack (the table-path rows are skipped below anyway)
        index = index.drop_tables()

        # f32 corpus + packed buffer exceed HBM together at 10M: stage to
        # the storage dtype, free the f32 corpus, pack from the staging
        # buffer, and keep the staging buffer as the view's own corpus
        # (store_points=True) — supercharge/rerank run against it directly
        # int8 cannot be staged directly (quantization needs the float
        # values for codes + scale): stage to bf16, quantize at pack time
        stage_dt = jnp.bfloat16 if pdt == jnp.int8 else pdt
        Xs = stage_points(X, stage_dt)
        fence([Xs])
        del X
        pv = index.packed(Xs, super_width=args.super_width, staged=True,
                          store_points=True,
                          dtype=jnp.int8 if pdt == jnp.int8 else None)
        fence([pv.point_rows])
        del Xs
        X = None  # packed paths serve from pv.points; table/exact skipped
    else:
        pv = index.packed(X, super_width=args.super_width, dtype=pdt,
                          store_points=True)  # a reference, not a copy
    fence([pv.point_rows])
    print(json.dumps({"stage": "packed",
                      "packed_gb": round(pv.memory_bytes() / 2**30, 2),
                      "index_mb": round(index.memory_bytes() / 2**20, 1)}),
          flush=True)

    def bench(label, fn, batch):
        # time-targeted rep count: each measurement round pays one ~28 ms
        # fence RTT (scripts/exp_1m_drift.py), so queue ~1 s of work per
        # round (overhead < 3%).  Slow configs keep few queued programs,
        # which also bounds enqueue-time workspace stacking (rule 16).
        try:
            out = fn()
            fence(out)
        except Exception as e:
            print(json.dumps({"config": label, "batch": batch,
                              "error": repr(e)[:200]}), flush=True)
            return
        t0 = time.perf_counter()
        outs = [fn() for _ in range(3)]
        fence(outs)
        dt = (time.perf_counter() - t0) / 3
        reps = max(3, min(200, int(round(1.0 / dt))))
        best = dt
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(reps)]
            fence(outs)
            best = min(best, (time.perf_counter() - t0) / reps)
        ids = np.asarray(out[0])
        rec = recall_at_k(tq[: ids.shape[0]], ids, k)
        print(json.dumps({
            "config": label, "batch": batch, "qps": round(batch / best, 1),
            "ms_per_batch": round(best * 1e3, 2),
            "recall_at_10": round(rec, 4), "reps": reps,
        }), flush=True)

    sr = args.supercharge_rounds
    for batch in args.batches:
        Yb = Y[:batch]
        for P in args.n_probes:
            if X is not None:
                bench(f"table directed P={P}",
                      lambda P=P: ann.search(index, X, Yb, n_probes=P), batch)
            for w in args.windows:
                if not args.skip_xla:
                    bench(f"packed-xla w={w} P={P}",
                          lambda w=w, P=P: ann.search_packed(
                              pv.with_window(w), Yb, n_probes=P), batch)
                for bq in args.query_block:
                    bench(f"FUSED w={w} P={P} bq={bq} sr={sr}",
                          lambda w=w, bq=bq, P=P: ann.search_packed_fused(
                              pv, Yb, n_probes=P, window=w, query_block=bq,
                              supercharge_rounds=sr), batch)
            for rw in args.rerank:
                bench(f"FUSED w={args.windows[-1]} P={P} rerank={rw} sr={sr}",
                      lambda rw=rw, P=P: ann.search_packed_fused(
                          pv, Yb, n_probes=P, window=args.windows[-1],
                          query_block=args.query_block[0], rerank_width=rw,
                          supercharge_rounds=sr),
                      batch)
        if not args.free_corpus:
            # exact_search upcasts the corpus to f32 — skipped in the
            # staged-bf16 regime (10M exact f32 is measured separately:
            # BASELINE.md, 10,014 QPS)
            bench("exact (Pallas)", lambda: ann.exact_search(X, Yb, k), batch)


if __name__ == "__main__":
    main()
