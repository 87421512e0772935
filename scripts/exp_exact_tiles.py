#!/usr/bin/env python
"""Tile/block sweep for the exact kernel at 1M with a raised scoped-vmem
limit (XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536): fewer, fatter
grid steps to beat the ~30 us/step overhead that dominates at 1M."""

from __future__ import annotations

import time


def main():
    import jax
    import jax.numpy as jnp

    from approximatenn_tpu.ops.pallas_exact import exact_knn_pallas
    from approximatenn_tpu.utils.profiling import fence

    n, d, m, k = 1_000_000, 128, 1000, 10
    kp, kq = jax.random.split(jax.random.PRNGKey(0))
    X = jax.random.normal(kp, (n, d), jnp.float32)
    Y = jax.random.normal(kq, (m, d), jnp.float32)
    fence([X, Y])

    def timeit(name, fn, reps=5):
        try:
            out = fn()
            fence(out)
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} FAIL {str(e).splitlines()[0][:80]}", flush=True)
            return
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:34s} {dt*1e3:9.2f} ms  {m/dt:10.0f} QPS", flush=True)

    for bq, tile in ((256, 16384), (512, 8192), (256, 32768), (512, 16384)):
        for cdt, nm in ((None, "f32"), (jnp.bfloat16, "bf16")):
            timeit(
                f"bq={bq} tile={tile} {nm}",
                lambda bq=bq, tile=tile, cdt=cdt: exact_knn_pallas(
                    X, Y, k, tile=tile, query_block=bq, compute_dtype=cdt
                ),
            )


if __name__ == "__main__":
    main()
