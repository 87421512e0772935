#!/usr/bin/env python
"""Round-4 extras: (1) 32M int8 exact — rank vs two-phase; (2) the exact
graph build at 1M — graph_precision highest vs split3 wall-clock.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_r4_extras.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from approximatenn_tpu.ops.pallas_exact import (  # noqa: E402
    exact_knn_pallas,
    exact_knn_twophase,
    stage_rescan_corpus,
)
from approximatenn_tpu.utils.profiling import fence  # noqa: E402
from bench_exact_int8 import synth_clustered_int8  # noqa: E402


def timeit(name, fn, reps=10, rounds=2):
    out = fn()
    fence([out])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:44s} {best * 1e3:9.2f} ms  {1000.0 / best:9.0f} QPS",
          flush=True)
    return best


def agreement(a, b, k):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.mean([
        len(set(x.tolist()) & set(y.tolist())) / len(x)
        for x, y in zip(a, b)
    ]))


# ---------------- (2) first: exact graph build, 1M, precision A/B ----
from approximatenn_tpu.engine.build import exact_graph_chunked  # noqa: E402

n1, d1 = 1_000_000, 128
kp, kq = jax.random.split(jax.random.PRNGKey(0))
X1 = jax.random.normal(kp, (n1, d1), jnp.float32)
fence([X1])
print("== 1M exact graph build (self-search kernel time) ==", flush=True)
res = {}
for prec in ("highest", "split3"):
    g, _ = exact_graph_chunked(X1, 10, matmul_precision=prec)  # compile
    fence([g])
    t0 = time.perf_counter()
    g, _ = exact_graph_chunked(X1, 10, matmul_precision=prec)
    fence([g])
    dt = time.perf_counter() - t0
    res[prec] = (dt, g)
    print(f"  graph_precision={prec}: {dt:.1f} s", flush=True)
ag = agreement(res["highest"][1][:20000], res["split3"][1][:20000], 10)
print(f"  edge agreement split3 vs highest (20k rows): {ag:.5f}",
      flush=True)
del X1, res, g

# ---------------- (1) 32M int8: rank vs two-phase --------------------
n, d, m, k = 32_000_000, 96, 1000, 10
Xq, scale, Y = synth_clustered_int8(n, d, m)
fence([Xq, Y])
print("== 32M x 96 int8 ==", flush=True)
ir, _ = exact_knn_pallas(Xq, Y, k, scale=scale)
fence([ir])
timeit("32M int8 rank (production)",
       lambda: exact_knn_pallas(Xq, Y, k, scale=scale))
Xr = stage_rescan_corpus(Xq)
fence([Xr])
ie, _ = exact_knn_twophase(Xq, Y, k, scale=scale, rescan_corpus=Xr)
fence([ie])
print(f"32M int8 twophase agreement vs rank: {agreement(ir, ie, k):.5f}",
      flush=True)
timeit("32M int8 TWOPHASE-exact",
       lambda: exact_knn_twophase(Xq, Y, k, scale=scale, rescan_corpus=Xr))
print("done", flush=True)
