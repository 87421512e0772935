#!/usr/bin/env python
"""Microbench 5: gather rate vs source FOOTPRINT at 1M-scale, on-device
synthesis (exp_gather4 stalled on H2D).  If a bf16 copy of the corpus
(half the footprint) gathers ~2x faster, the hash path's candidate
scoring should run on a bf16 shadow of the points at large n."""

from __future__ import annotations

import time


def main():
    import jax
    import jax.numpy as jnp

    from approximatenn_tpu.utils.profiling import fence

    rows_total = 1_440_000  # 1000 q x 1440 rows

    def timeit(fn, *a, reps=10):
        out = fn(*a)
        fence(out)
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(reps)]
        fence(outs)
        return (time.perf_counter() - t0) / reps

    key = jax.random.PRNGKey(0)
    print("case                        src_MB      ms    ns/row", flush=True)
    cases = [
        ("f32 1M x 128", 1_000_000, 128, jnp.float32),
        ("bf16 1M x 128", 1_000_000, 128, jnp.bfloat16),
        ("f32 500k x 128", 500_000, 128, jnp.float32),
        ("f32 250k x 128", 250_000, 128, jnp.float32),
        ("int8 1M x 128", 1_000_000, 128, jnp.int8),
    ]
    for name, n_src, w, dt in cases:
        k1, k2, key = jax.random.split(key, 3)
        if dt == jnp.int8:
            src = jax.random.randint(k1, (n_src, w), -127, 127, jnp.int8)
        else:
            src = jax.random.normal(k1, (n_src, w), jnp.float32).astype(dt)
        idx = jax.random.randint(
            k2, (1000, rows_total // 1000), 0, n_src, jnp.int32
        )
        fence([src, idx])

        @jax.jit
        def g(s, c):
            # src passed as an ARGUMENT: a jit closure constant would be
            # embedded into the compile request (512 MB body -> HTTP 413)
            return jnp.sum(s[c].astype(jnp.float32), axis=(1, 2))

        t = timeit(g, src, idx)
        mb = n_src * w * jnp.dtype(dt).itemsize / 1e6
        print(f"{name:26s} {mb:7.0f} {t*1e3:8.3f} {t/rows_total*1e9:8.2f}",
              flush=True)


if __name__ == "__main__":
    main()
