#!/usr/bin/env python
"""Measure the k > 128 exact envelope (round-4 VERDICT item 9).

The fused Pallas kernel supports k <= 128 (unrolled selection);
``exact_search`` silently degrades to the XLA brute-force path past
that.  This measures that path at serving scale — 1M x 128, m=1000 —
at k = 100 (kernel), 128 (kernel), 256 and 1000 (XLA fallback, now via
the lax.top_k branch of topk_iter), so the envelope statement in the
docstrings carries numbers.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_large_k.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from approximatenn_tpu.ops.distance import brute_force_knn
from approximatenn_tpu.ops.pallas_exact import exact_knn_pallas, exact_search
from approximatenn_tpu.utils.profiling import fence

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timeit(name, fn, reps=20, rounds=2):
    out = fn()
    fence([out])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:40s} {best * 1e3:9.2f} ms  {1000.0 / best:9.0f} QPS",
          flush=True)
    return best


n, d, m = 1_000_000, 128, 1000
kp, kq = jax.random.split(jax.random.PRNGKey(0))
X = jax.random.normal(kp, (n, d), jnp.float32)
Y = jax.random.normal(kq, (m, d), jnp.float32)
fence([X, Y])

# correctness first: fallback k=256 ids contain the kernel's top-128
i128, _ = exact_knn_pallas(X, Y, 128)
fence([i128])
i256, _ = exact_search(X, Y, 256)  # routes to XLA fallback
fence([i256])
a, b = np.asarray(i128), np.asarray(i256)
cover = np.mean([len(set(x) & set(y[:128])) / 128 for x, y in
                 zip(a, b)])
print(f"k=256 fallback covers kernel top-128: {cover:.4f}", flush=True)

for k in (100, 128):
    timeit(f"1M k={k} Pallas kernel",
           lambda k=k: exact_knn_pallas(X, Y, k))
for k in (256, 512, 1000):
    timeit(f"1M k={k} XLA fallback (top_k)",
           lambda k=k: brute_force_knn(X, Y, k), reps=10)
print("done", flush=True)
