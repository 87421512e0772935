#!/usr/bin/env python
"""Round-5 VERDICT item 2: make the 10M x 96 f32 frontier SERVABLE.

The round-4 Server staged a duplicate lane-padded rescan copy (4.77 GB at
10M x 96 f32) capped at 4 GiB, so production routing silently fell back
to the rank kernel at the published best operating point.  Round-5
stores ONE lane-padded corpus (5.12 GB total) serving both the emit
stream and the rescan.  This script answers, on hardware:

  1. does emitting over the padded (d=128) corpus cost more than d=96?
     (hypothesis: ~no — the MXU computes on 128-lane tiles either way;
     only HBM stream bytes grow 33%, and the emit phase is MXU-bound at
     split3)
  2. does Server.search now reach ~15.1k QPS (the round-4 directly-
     measured split3+two-phase number) through production routing?

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_r5_padded.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from approximatenn_tpu.engine.serving import Server
from approximatenn_tpu.ops.pallas_exact import (
    exact_knn_pallas,
    exact_knn_twophase,
    stage_rescan_corpus,
)
from approximatenn_tpu.utils.profiling import fence

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timeit(name, fn, reps=10, rounds=3):
    out = fn()
    fence([out])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:52s} {best * 1e3:9.2f} ms  {1000.0 / best:9.0f} QPS",
          flush=True)
    return best


def agreement(a, b, k):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.mean([
        len(set(x.tolist()) & set(y.tolist())) / k for x, y in zip(a, b)
    ]))


m, k = 1000, 10
n, d = 10_000_000, 96
kp, kq = jax.random.split(jax.random.PRNGKey(1))
X = jax.random.normal(kp, (n, d), jnp.float32)
Y = jax.random.normal(kq, (m, d), jnp.float32)
fence([X, Y])
print(f"== 10M x 96 f32, m={m}, k={k} ==", flush=True)

# A: rank kernel on the unpadded corpus (round-4 production fallback)
ir, _ = exact_knn_pallas(X, Y, k, matmul_precision="split3")
fence([ir])
timeit("A rank split3 (unpadded, r4 production route)",
       lambda: exact_knn_pallas(X, Y, k, matmul_precision="split3"))

# B: round-4 two-phase with the SEPARATE staging copy (3.84 + 4.77 GB)
Xr = stage_rescan_corpus(X)
fence([Xr])
ib, _ = exact_knn_twophase(X, Y, k, matmul_precision="split3",
                           rescan_corpus=Xr)
fence([ib])
print(f"  B agreement vs rank: {agreement(ir, ib, k):.5f}", flush=True)
timeit("B twophase split3 (separate 4.77GB staging, r4)",
       lambda: exact_knn_twophase(X, Y, k, matmul_precision="split3",
                                  rescan_corpus=Xr))
del Xr

# C/D: ONE padded corpus through the production Server (round 5)
srv = Server.build(X, k, mode="exact")
del X
fence([srv.points])
print(f"  Server describe: {srv.describe()}", flush=True)
ic, _ = srv.search(Y, matmul_precision="split3")
fence([ic])
print(f"  C agreement vs rank: {agreement(ir, ic, k):.5f}", flush=True)
timeit("C Server.search twophase split3 (ONE padded corpus)",
       lambda: srv.search(Y, matmul_precision="split3"))
timeit("C2 Server.search twophase HIGHEST",
       lambda: srv.search(Y))
# rank fallback on the padded corpus: what no_twophase costs post-pad
ieschk, _ = srv.search(Y, no_twophase=True, matmul_precision="split3")
fence([ieschk])
print(f"  D agreement vs rank: {agreement(ir, ieschk, k):.5f}", flush=True)
timeit("D Server.search rank split3 (padded corpus, escape)",
       lambda: srv.search(Y, no_twophase=True, matmul_precision="split3"))
print("done", flush=True)
