#!/usr/bin/env python
"""Microbench: what does TPU row-gather cost actually scale with?

Isolates the (B, L) row gather that dominates hash-path queries:
per-row vs per-byte cost, index locality, fusion with the distance
computation, and a Pallas DMA alternative is evaluated separately.
Every timed fn is ONE jitted dispatch (no lax.map) to keep the ~3.5 ms
dispatch overhead constant across variants.
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from approximatenn_tpu.utils.profiling import fence

    n, d, m, L = 20_000, 128, 1000, 2880
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    X16 = X[:, :16]
    X1 = X[:, 0]
    Xh = X.astype(jnp.bfloat16)
    cand = jnp.asarray(rng.integers(0, n, size=(m, L)).astype(np.int32))
    cand_sorted = jnp.sort(cand, axis=-1)
    Y = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))

    def timeit(name, fn, *a, reps=10):
        out = fn(*a)
        fence(out)
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / reps
        rows = m * L
        print(f"{name:26s} {dt*1e3:9.3f} ms   {dt/rows*1e9:7.2f} ns/row")
        return out

    @jax.jit
    def g512(c):
        return jnp.sum(X[c], axis=(1, 2))

    @jax.jit
    def g512h(c):
        return jnp.sum(Xh[c].astype(jnp.float32), axis=(1, 2))

    @jax.jit
    def g64(c):
        return jnp.sum(X16[c], axis=(1, 2))

    @jax.jit
    def g4(c):
        return jnp.sum(X1[c], axis=1)

    @jax.jit
    def dist_fused(q, c):
        pc = X[c]
        diff = q[:, None, :] - pc
        return jnp.sum(diff * diff, axis=-1)

    @jax.jit
    def dist_dot_nogather(q):
        # all-pairs matmul reference point (no gather at all): (m,d)@(d,n)
        return q @ X.T

    timeit("gather 512B rows", g512, cand)
    timeit("gather 512B sorted idx", g512, cand_sorted)
    timeit("gather 256B (bf16)", g512h, cand)
    timeit("gather 64B rows", g64, cand)
    timeit("gather 4B rows", g4, cand)
    timeit("gather+dist fused", dist_fused, Y, cand)
    timeit("matmul all-pairs (no gather)", dist_dot_nogather, Y)

    # smaller L sweep: does time scale with rows?
    for Ls in (720, 1440):
        c2 = cand[:, :Ls]

        @jax.jit
        def gs(c):
            return jnp.sum(X[c], axis=(1, 2))

        out = gs(c2)
        fence(out)
        t0 = time.perf_counter()
        outs = [gs(c2) for _ in range(10)]
        fence(outs)
        dt = (time.perf_counter() - t0) / 10
        print(f"gather 512B L={Ls:5d}        {dt*1e3:9.3f} ms   {dt/(m*Ls)*1e9:7.2f} ns/row")


if __name__ == "__main__":
    main()
