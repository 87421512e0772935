#!/usr/bin/env python
"""Round-5 VERDICT item 7: attack the two-phase fixed cost at 1M.

At 1M the rescan's fixed cost inverts the two-phase win (bf16 7.1 ms vs
the rank kernel's 6.6 — round 4), putting the crossover at 2M.  This
script attributes the 1M loss and sweeps the one exposed lever — the
segment length — at 1M and 2M:

- smaller seg => fewer rescanned rows per window ((k+2) x seg total) and
  a cheaper final selection, but more emitted segment minima (n/seg) for
  phase 2's top-k, and the same DMA *count*;
- larger seg => cheaper phase 2, more rescan bytes.

Also isolates the emit-only cost (phases 1-2, `merge="twophase"`) so
the rescan's share is explicit per seg.  Verdict recorded in
BASELINE.md; if some seg beats the rank kernel at 1M, TWOPHASE_MIN_N
drops.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_r5_tpcost.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from approximatenn_tpu.ops.pallas_exact import (
    exact_knn_pallas,
    exact_knn_twophase,
)
from approximatenn_tpu.utils.profiling import fence

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timeit(name, fn, reps=30, rounds=3):
    out = fn()
    fence([out])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:52s} {best * 1e3:9.3f} ms  {1000.0 / best:9.0f} QPS",
          flush=True)
    return best


def agreement(a, b, k):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.mean([
        len(set(x.tolist()) & set(y.tolist())) / k for x, y in zip(a, b)
    ]))


m, k = 1000, 10
for n in (1_000_000, 2_000_000):
    print(f"== {n} x 128 bf16, m={m}, k={k} ==", flush=True)
    kp, kq = jax.random.split(jax.random.PRNGKey(0))
    X = jax.random.normal(kp, (n, 128), jnp.float32).astype(jnp.bfloat16)
    Y = jax.random.normal(kq, (m, 128), jnp.float32)
    fence([X, Y])
    ir, _ = exact_knn_pallas(X, Y, k)
    fence([ir])
    timeit(f"{n//10**6}M bf16 rank", lambda: exact_knn_pallas(X, Y, k))
    for seg in (128, 256, 512, 1024):
        # emit-only: phases 1-2 at this segment grid (P=k winners)
        timeit(
            f"{n//10**6}M bf16 emit-only seg={seg}",
            lambda s=seg: exact_knn_pallas(X, Y, k, merge="twophase",
                                           twophase_seg=s),
        )
        it_, _ = exact_knn_twophase(X, Y, k, seg=seg)
        fence([it_])
        ag = agreement(ir, it_, k)
        timeit(f"{n//10**6}M bf16 TWOPHASE seg={seg} (agree {ag:.4f})",
               lambda s=seg: exact_knn_twophase(X, Y, k, seg=s))
    del X, Y
print("done", flush=True)
