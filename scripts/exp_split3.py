#!/usr/bin/env python
"""Measure the split3 (3-pass bf16 split-factor) f32 exact tier vs
HIGHEST (6-pass) and DEFAULT (1-pass) — round-4 VERDICT item 3.

Gates: recall vs a float64 oracle at 20k (full oracle) and 1M (margin
oracle: f64 re-rank of the HIGHEST top-64 — the true f64 top-10 lies in
the f32-HIGHEST top-64 with overwhelming margin, as f32 rounding is
~1e-5 relative while rank-10..64 distance gaps are ~1e-2).  Timing at
20k / 1M / 10M, deep-pipelined.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_split3.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from approximatenn_tpu.ops.pallas_exact import exact_knn_pallas
from approximatenn_tpu.utils.profiling import fence

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

PRECS = ("highest", "split3", "default")


def timeit(name, fn, reps=50, rounds=3):
    out = fn()
    fence([out])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:32s} {best * 1e3:9.3f} ms  {1000.0 / best:10.0f} QPS",
          flush=True)
    return best


def recall_vs(ids, truth, k):
    ids, truth = np.asarray(ids)[:, :k], np.asarray(truth)[:, :k]
    return float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k
        for a, b in zip(ids, truth)
    ]))


# ---------------- 20k x 128: full f64 oracle -------------------------
rng = np.random.default_rng(12345)
n, d, m, k = 20_000, 128, 1000, 10
Xh = rng.standard_normal((n, d)).astype(np.float32)
Yh = rng.standard_normal((m, d)).astype(np.float32)
X, Y = jnp.asarray(Xh), jnp.asarray(Yh)
fence([X, Y])
# GEMM form in f64 (the broadcast-diff form materializes a 20 GB temp)
X64, Y64 = Xh.astype(np.float64), Yh.astype(np.float64)
d64 = ((Y64 * Y64).sum(1)[:, None] + (X64 * X64).sum(1)[None, :]
       - 2.0 * (Y64 @ X64.T))
t64 = np.argsort(d64, 1)[:, :k]
del X64, Y64, d64
print(f"== 20k x {d} ==", flush=True)
for prec in PRECS:
    ids, _ = exact_knn_pallas(X, Y, k, matmul_precision=prec)
    fence([ids])
    print(f"  {prec}: recall vs f64 = {recall_vs(ids, t64, k):.4f}",
          flush=True)
for prec in PRECS:
    timeit(f"20k {prec}", lambda p=prec: exact_knn_pallas(
        X, Y, k, matmul_precision=p), reps=200)

# ---------------- 1M x 128: margin f64 oracle ------------------------
n1 = 1_000_000
kp, kq = jax.random.split(jax.random.PRNGKey(0))
X1 = jax.random.normal(kp, (n1, d), jnp.float32)
Y1 = jax.random.normal(kq, (m, d), jnp.float32)
fence([X1, Y1])
print(f"== 1M x {d} ==", flush=True)
wide, _ = exact_knn_pallas(X1, Y1, 64, matmul_precision="highest")
fence([wide])
wide_h = np.asarray(wide)
X1h_rows = np.asarray(jnp.take(X1, jnp.asarray(wide_h.reshape(-1)), axis=0)
                      ).reshape(m, 64, d).astype(np.float64)
Y1h = np.asarray(Y1).astype(np.float64)
d64m = ((Y1h[:, None, :] - X1h_rows) ** 2).sum(-1)  # (m, 64)
t64m = np.take_along_axis(wide_h, np.argsort(d64m, 1)[:, :k], axis=1)
for prec in PRECS:
    ids, _ = exact_knn_pallas(X1, Y1, k, matmul_precision=prec)
    fence([ids])
    print(f"  {prec}: recall vs f64-margin = {recall_vs(ids, t64m, k):.4f}",
          flush=True)
for prec in PRECS:
    timeit(f"1M {prec}", lambda p=prec: exact_knn_pallas(
        X1, Y1, k, matmul_precision=p), reps=50)
del X1, Y1, wide

# ---------------- 10M x 96: timing + agreement vs HIGHEST ------------
n2, d2_ = 10_000_000, 96
kp, kq = jax.random.split(jax.random.PRNGKey(1))
X2 = jax.random.normal(kp, (n2, d2_), jnp.float32)
Y2 = jax.random.normal(kq, (m, d2_), jnp.float32)
fence([X2, Y2])
print(f"== 10M x {d2_} ==", flush=True)
ih, _ = exact_knn_pallas(X2, Y2, k, matmul_precision="highest")
fence([ih])
for prec in ("split3", "default"):
    ids, _ = exact_knn_pallas(X2, Y2, k, matmul_precision=prec)
    fence([ids])
    print(f"  {prec}: id agreement vs HIGHEST = "
          f"{recall_vs(ids, ih, k):.4f}", flush=True)
for prec in PRECS:
    timeit(f"10M {prec}", lambda p=prec: exact_knn_pallas(
        X2, Y2, k, matmul_precision=p), reps=10, rounds=2)
print("done", flush=True)
