#!/usr/bin/env python
"""Microbench 3: gather rate vs row width and element dtype.

exp_gather2 found the XLA row gather is bandwidth-bound (~170 GB/s) at row
widths 512 B-1 KB and *degrades* for wider rows.  This narrows the sweep
(32-512 f32) and measures int8/bf16 rows at constant LOGICAL candidate
count — if GB/s holds across dtypes, compressed candidate storage (SQ8)
converts the fixed byte budget into 4x more candidates per second.
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from approximatenn_tpu.utils.profiling import fence

    rng = np.random.default_rng(0)

    def timeit(fn, *a, reps=10):
        out = fn(*a)
        fence(out)
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(reps)]
        fence(outs)
        return (time.perf_counter() - t0) / reps

    total_f32 = 184_320_000  # 1000 q x 1440 cand x 128 d (737 MB f32)
    print("dtype  width  rows_gathered      ms    ns/row   GB/s  cand-eq/s")
    for dtype, dname in ((np.float32, "f32"), (np.float16, "bf16"), (np.int8, "int8")):
        for w in (32, 64, 128, 256, 512):
            itemsize = np.dtype(dtype).itemsize
            rows_total = total_f32 // w
            rpq = rows_total // 1000
            n_rows_src = 40_960
            if dtype == np.int8:
                src_np = rng.integers(-127, 127, size=(n_rows_src, w), dtype=np.int8)
                src = jnp.asarray(src_np)
            elif dtype == np.float16:
                src = jnp.asarray(
                    rng.standard_normal((n_rows_src, w)).astype(np.float32)
                ).astype(jnp.bfloat16)
            else:
                src = jnp.asarray(rng.standard_normal((n_rows_src, w)).astype(dtype))
            idx = jnp.asarray(
                rng.integers(0, n_rows_src, size=(1000, rpq)).astype(np.int32)
            )

            @jax.jit
            def g(c, src=src):
                return jnp.sum(src[c].astype(jnp.float32), axis=(1, 2))

            dt = timeit(g, idx)
            nbytes = rows_total * w * itemsize
            print(
                f"{dname:5s} {w:6d} {1000*rpq:13d} {dt*1e3:8.3f} "
                f"{dt/(1000*rpq)*1e9:8.2f} {nbytes/dt/1e9:6.1f} "
                f"{rows_total*w/128/dt/1e6:8.1f}M"
            )


if __name__ == "__main__":
    main()
