"""Rep-count sweep for the 20k exact headline: does the ~28 ms per-round
fence RTT (scripts/exp_1m_drift.py) still distort 20-rep rounds at 20k,
and is there a per-call dispatch floor that more reps cannot amortize?

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_20k_reps.py
"""
import time

import jax
import jax.numpy as jnp

import approximatenn_tpu as ann
from approximatenn_tpu.utils.profiling import fence

m, k, d, n = 1000, 10, 128, 20_000

kp, kq = jax.random.split(jax.random.PRNGKey(0))
X = jax.random.normal(kp, (n, d), jnp.float32)
Y = jax.random.normal(kq, (m, d), jnp.float32)
fence([X, Y])

out = ann.exact_search(X, Y, k)
fence([out])

for reps in (20, 50, 100, 200, 400):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [ann.exact_search(X, Y, k) for _ in range(reps)]
        fence(outs)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"reps={reps:4d}  {best * 1e3:8.3f} ms/batch  "
          f"{1000.0 / best:9.0f} QPS", flush=True)
