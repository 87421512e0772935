#!/usr/bin/env python
"""A/B the TWO-PHASE merge (emit per-segment minima, merge in XLA)
against the production rank-select merge at 10M — round-4 VERDICT item 4
(the one structural shape never tried in-kernel).

Measures, per storage tier (bf16 / int8): batch time + id agreement vs
the rank kernel (target: bf16 <= ~32 ms = 1.4x the 10.2 us/step floor at
2,444 steps; agreement 1.0 would require the rescan phase — the measured
collision rate tells us whether it is worth building).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_twophase.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from approximatenn_tpu.ops.pallas_exact import exact_knn_pallas, quantize_corpus
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
    print(f"{name:44s} {best * 1e3:9.2f} ms  {1000.0 / best:9.0f} QPS",
          flush=True)
    return best


def agreement(a, b, k):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.mean([
        len(set(x.tolist()) & set(y.tolist())) / k for x, y in zip(a, b)
    ]))


n, d, m, k = 10_000_000, 96, 1000, 10
kp, kq = jax.random.split(jax.random.PRNGKey(1))
X = jax.random.normal(kp, (n, d), jnp.float32)
Y = jax.random.normal(kq, (m, d), jnp.float32)
fence([X, Y])

for tier in ("bf16", "int8"):
    if tier == "bf16":
        Xt, sc = X.astype(jnp.bfloat16), None
    else:
        Xt, sc = quantize_corpus(X)
    fence([Xt])
    ir, _ = exact_knn_pallas(Xt, Y, k, scale=sc)
    fence([ir])
    for seg in (512, 1024, 2048):
        it, _ = exact_knn_pallas(Xt, Y, k, scale=sc, merge="twophase",
                                 twophase_seg=seg)
        fence([it])
        ag = agreement(ir, it, k)
        print(f"{tier} seg={seg}: id agreement vs rank = {ag:.5f} "
              f"(expected miss ~{45.0 * seg / n:.5f})", flush=True)
        timeit(f"10M {tier} TWOPHASE seg={seg}",
               lambda s=seg: exact_knn_pallas(Xt, Y, k, scale=sc,
                                              merge="twophase",
                                              twophase_seg=s))
    timeit(f"10M {tier} rank (production)",
           lambda: exact_knn_pallas(Xt, Y, k, scale=sc))
    # EXACT two-phase: emit + top-(k+2)-segment DMA rescan; the rescan
    # buffer (lane-padded to 128) is staged ONCE, as a server would
    from approximatenn_tpu.ops.pallas_exact import (
        exact_knn_twophase,
        stage_rescan_corpus,
    )

    Xr = stage_rescan_corpus(Xt)
    fence([Xr])
    for seg in (512, 1024):
        ie, _ = exact_knn_twophase(Xt, Y, k, seg=seg, scale=sc,
                                   rescan_corpus=Xr)
        fence([ie])
        ag = agreement(ir, ie, k)
        print(f"{tier} EXACT twophase seg={seg}: id agreement vs rank = "
              f"{ag:.5f}", flush=True)
        timeit(f"10M {tier} EXACT TWOPHASE seg={seg}",
               lambda s=seg: exact_knn_twophase(Xt, Y, k, seg=s, scale=sc,
                                                rescan_corpus=Xr))
    del Xr
    del Xt
    fence([X])
print("done", flush=True)
