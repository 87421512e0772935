#!/usr/bin/env python
"""Auto-tuner at the Deep-10M operating point (10M x 96, one chip).

The regime the tuner exists for: the exact engine serves recall 1.0 at
~17.6k QPS here, the fused int8 packed path up to ~53k at partial recall
(BASELINE.md) — so the cheapest config meeting the target depends on the
target, and tune() should find the crossover automatically.

  PYTHONPATH=/root/.axon_site:/root/repo nohup python -u \
      scripts/exp_10m_tune.py > /tmp/exp10m_tune.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exp_10m_hash import synth_clustered  # noqa: E402  (scripts/ sibling)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--nq", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tries", type=int, default=6)
    ap.add_argument("--capacity", type=int, default=64)
    ap.add_argument("--target", type=float, default=0.6)
    ap.add_argument("--measure-all", action="store_true")
    ap.add_argument("--packed-dtype", default="int8",
                    choices=["int8", "bfloat16", "float32"])
    ap.add_argument("--exact-tiers", nargs="+", default=["f32"],
                    help="exact-engine storage tiers to trial (f32/bf16/"
                         "int8); HBM budget: each tier holds its corpus "
                         "copy (+ rescan staging) for the whole tune")
    ap.add_argument("--window-grid", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--sequential-tiers", action="store_true",
                    help="trial exact tiers one at a time (build, "
                    "measure, free) so f32+bf16+int8 fit HBM together "
                    "in one report (round-5, tune(sequential_tiers=True))")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    import approximatenn_tpu as ann
    from approximatenn_tpu.utils.profiling import fence

    t0 = time.perf_counter()
    X, Y = synth_clustered(args.n, args.d, args.nq)
    fence([X, Y])
    print(json.dumps({"stage": "synth",
                      "s": round(time.perf_counter() - t0, 1)}), flush=True)

    pdt = None if args.packed_dtype == "float32" else jnp.dtype(args.packed_dtype)
    t0 = time.perf_counter()
    rep = ann.tune(
        X, args.k, queries=Y, target_recall=args.target,
        tries=args.tries, capacity=args.capacity,
        probe_grid=(None, 18, 48), window_grid=tuple(args.window_grid),
        rerank_grid=(None, 50), packed_dtype=pdt,
        exact_tiers=tuple(None if t == "f32" else t
                          for t in args.exact_tiers),
        measure_all=args.measure_all,
        sequential_tiers=args.sequential_tiers, verbose=True,
    )
    print(json.dumps({"stage": "tune",
                      "s": round(time.perf_counter() - t0, 1)}), flush=True)
    print(json.dumps(rep.as_dict()), flush=True)


if __name__ == "__main__":
    main()
