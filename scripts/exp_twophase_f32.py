#!/usr/bin/env python
"""Two-phase exact engine on the f32 tiers (highest / split3) at 10M,
plus 1M routing data for every tier — complements scripts/exp_twophase.py
(which covered bf16/int8 at 10M).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_twophase_f32.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from approximatenn_tpu.ops.pallas_exact import (
    exact_knn_pallas,
    exact_knn_twophase,
    stage_rescan_corpus,
)
from approximatenn_tpu.utils.profiling import fence

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timeit(name, fn, reps=10, rounds=2):
    out = fn()
    fence([out])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:48s} {best * 1e3:9.2f} ms  {1000.0 / best:9.0f} QPS",
          flush=True)
    return best


def agreement(a, b, k):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.mean([
        len(set(x.tolist()) & set(y.tolist())) / k for x, y in zip(a, b)
    ]))


m, k = 1000, 10

# ---------------- 1M x 128 (d % 128 == 0: no staging copy needed) ----
n1, d1 = 1_000_000, 128
kp, kq = jax.random.split(jax.random.PRNGKey(0))
X1 = jax.random.normal(kp, (n1, d1), jnp.float32)
Y1 = jax.random.normal(kq, (m, d1), jnp.float32)
fence([X1, Y1])
print("== 1M x 128 ==", flush=True)
for prec in ("highest", "split3"):
    ir, _ = exact_knn_pallas(X1, Y1, k, matmul_precision=prec)
    fence([ir])
    ie, _ = exact_knn_twophase(X1, Y1, k, matmul_precision=prec)
    fence([ie])
    print(f"  f32-{prec}: twophase agreement vs rank = "
          f"{agreement(ir, ie, k):.5f}", flush=True)
    timeit(f"1M f32-{prec} rank",
           lambda p=prec: exact_knn_pallas(X1, Y1, k, matmul_precision=p),
           reps=30)
    timeit(f"1M f32-{prec} TWOPHASE-exact",
           lambda p=prec: exact_knn_twophase(X1, Y1, k,
                                             matmul_precision=p),
           reps=30)
X1b = X1.astype(jnp.bfloat16)
fence([X1b])
ir, _ = exact_knn_pallas(X1b, Y1, k)
ie, _ = exact_knn_twophase(X1b, Y1, k)
fence([ie])
print(f"  bf16: twophase agreement vs rank = {agreement(ir, ie, k):.5f}",
      flush=True)
timeit("1M bf16 rank", lambda: exact_knn_pallas(X1b, Y1, k), reps=30)
timeit("1M bf16 TWOPHASE-exact",
       lambda: exact_knn_twophase(X1b, Y1, k), reps=30)
del X1, Y1, X1b

# ---------------- 10M x 96 f32 --------------------------------------
n2, d2 = 10_000_000, 96
kp, kq = jax.random.split(jax.random.PRNGKey(1))
X2 = jax.random.normal(kp, (n2, d2), jnp.float32)
Y2 = jax.random.normal(kq, (m, d2), jnp.float32)
fence([X2, Y2])
Xr = stage_rescan_corpus(X2)
fence([Xr])
print("== 10M x 96 f32 ==", flush=True)
for prec in ("highest", "split3"):
    ir, _ = exact_knn_pallas(X2, Y2, k, matmul_precision=prec)
    fence([ir])
    ie, _ = exact_knn_twophase(X2, Y2, k, matmul_precision=prec,
                               rescan_corpus=Xr)
    fence([ie])
    print(f"  f32-{prec}: twophase agreement vs rank = "
          f"{agreement(ir, ie, k):.5f}", flush=True)
    timeit(f"10M f32-{prec} rank",
           lambda p=prec: exact_knn_pallas(X2, Y2, k, matmul_precision=p))
    timeit(f"10M f32-{prec} TWOPHASE-exact",
           lambda p=prec: exact_knn_twophase(X2, Y2, k, matmul_precision=p,
                                             rescan_corpus=Xr))
print("done", flush=True)
