"""Why does bench.py's exact-1M stat run 11.3 ms/batch when the isolated
merge A/B (scripts/exp_merge_ab.py) measures 7.16 ms for the same call?

Hypotheses, toggled in one process on the real TPU, in this order:
  A. clean state, 20 reps, direct exact_knn_pallas      (merge_ab shape)
  B. clean state, 5 reps, ann.exact_search wrapper      (bench shape)
  C. same as B but 20 reps                              (reps effect)
  D. after allocating a ~3 GB dummy resident buffer     (residency)
  E. after building the 20k hash index like bench does  (bench residency)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_1m_drift.py
"""
import time

import jax
import jax.numpy as jnp

import approximatenn_tpu as ann
from approximatenn_tpu.ops.pallas_exact import exact_knn_pallas
from approximatenn_tpu.utils.profiling import fence

m, k, d, n = 1000, 10, 128, 1_000_000

kp, kq = jax.random.split(jax.random.PRNGKey(0))
X = jax.random.normal(kp, (n, d), jnp.float32)
Y = jax.random.normal(kq, (m, d), jnp.float32)
fence([X, Y])


def timeit(name, fn, reps, rounds=1):
    out = fn()
    fence([out])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:44s} {best * 1e3:8.3f} ms  {1000.0 / best:9.0f} QPS",
          flush=True)
    return best


timeit("A direct kernel, 20 reps", lambda: exact_knn_pallas(X, Y, k), 20)
timeit("B wrapper, 5 reps x2 rounds",
       lambda: ann.exact_search(X, Y, k), 5, rounds=2)
timeit("C wrapper, 20 reps", lambda: ann.exact_search(X, Y, k), 20)

dummy = jnp.zeros((3 * 1024**3 // 4,), jnp.float32)
fence([dummy])
timeit("D wrapper, 20 reps, 3GB resident",
       lambda: ann.exact_search(X, Y, k), 20)
del dummy

pts20 = jax.random.normal(jax.random.PRNGKey(7), (20_000, d), jnp.float32)
idx, _, _ = ann.build(pts20, k, tries=10, seed=0, store_points=True)
fence([idx.tables])
timeit("E wrapper, 20 reps, 20k index resident",
       lambda: ann.exact_search(X, Y, k), 20)
