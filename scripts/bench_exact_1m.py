#!/usr/bin/env python
"""Exact-search throughput at 1M points: f32 vs bf16 compute, Pallas vs XLA.

The gather wall (docs/ARCHITECTURE.md) implies MXU brute force beats the
hash path far past 1M points on a single chip; this measures it.  Points
are synthesized ON DEVICE (H2D of 512 MB takes minutes on the tunnel).
"""

from __future__ import annotations

import time


def main():
    import jax
    import jax.numpy as jnp

    from approximatenn_tpu.ops.pallas_exact import exact_knn_pallas
    from approximatenn_tpu.ops.distance import brute_force_knn
    from approximatenn_tpu.utils.profiling import fence

    n, d, m, k = 1_000_000, 128, 1000, 10
    key = jax.random.PRNGKey(0)
    kp, kq = jax.random.split(key)
    X = jax.random.normal(kp, (n, d), jnp.float32)
    Y = jax.random.normal(kq, (m, d), jnp.float32)
    fence([X, Y])
    print(f"n={n} d={d} m={m} k={k}", flush=True)

    def timeit(name, fn, reps=5):
        out = fn()
        fence(out)
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:28s} {dt*1e3:9.2f} ms  {m/dt:10.0f} QPS", flush=True)
        return out, dt

    (if32, _), t_f32 = timeit(
        "pallas f32", lambda: exact_knn_pallas(X, Y, k)
    )
    (ibf, _), t_bf = timeit(
        "pallas bf16", lambda: exact_knn_pallas(X, Y, k, compute_dtype=jnp.bfloat16)
    )
    (ix, _), t_x = timeit(
        "xla brute", lambda: brute_force_knn(X, Y, k), reps=2
    )

    import numpy as np

    a, b = np.asarray(if32), np.asarray(ibf)
    c = np.asarray(ix)
    ov_bf = np.mean([len(set(r) & set(s)) / k for r, s in zip(a.tolist(), b.tolist())])
    ov_x = np.mean([len(set(r) & set(s)) / k for r, s in zip(a.tolist(), c.tolist())])
    print(f"bf16-vs-f32 neighbor overlap: {ov_bf:.4f}", flush=True)
    print(f"pallas-vs-xla overlap:        {ov_x:.4f}", flush=True)


if __name__ == "__main__":
    main()
