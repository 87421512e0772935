#!/usr/bin/env python
"""Round-5 VERDICT item 5: the k > 128 exact envelope via the two-phase
shape (emit-all rescan + XLA selection), measured at 1M x 128 f32.

Round-4 baseline (the `lax.top_k`-over-n fallback, /tmp/r4_largek.log):
k=256 -> 1.3k QPS, k=512 -> 0.7k, k=1000 -> 1.1k.  Target: >= 10x at
k=256/512.  Correctness gated against the XLA brute-force oracle on a
100-query slice, and phase consistency vs the k=128 kernel prefix.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_r5_bigk.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from approximatenn_tpu.ops.distance import brute_force_knn
from approximatenn_tpu.ops.pallas_exact import exact_search
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


def recall(a, b, k):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.mean([
        len(set(x.tolist()) & set(y.tolist())) / k for x, y in zip(a, b)
    ]))


m = 1000
n, d = 1_000_000, 128
kp, kq = jax.random.split(jax.random.PRNGKey(0))
X = jax.random.normal(kp, (n, d), jnp.float32)
Y = jax.random.normal(kq, (m, d), jnp.float32)
fence([X, Y])
print(f"== 1M x 128 f32, m={m} ==", flush=True)
for k in (256, 512, 1000):
    ids, dd = exact_search(X, Y[:100], k)
    fence([ids])
    ti, _ = brute_force_knn(X, Y[:100], k)
    r = recall(np.asarray(ti), np.asarray(ids), k)
    print(f"  k={k}: recall vs oracle on 100q = {r:.5f}", flush=True)
    timeit(f"1M f32 twophase-bigk k={k} (HIGHEST)",
           lambda kk=k: exact_search(X, Y, kk))
    timeit(f"1M f32 twophase-bigk k={k} (split3)",
           lambda kk=k: exact_search(X, Y, kk,
                                     matmul_precision="split3"))
# bf16 tier: storage-width stream, same shape
Xb = X.astype(jnp.bfloat16)
del X
fence([Xb])
for k in (256, 512):
    timeit(f"1M bf16 twophase-bigk k={k}",
           lambda kk=k: exact_search(Xb, Y, kk))
print("done", flush=True)
