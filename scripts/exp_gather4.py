#!/usr/bin/env python
"""Microbench 4: gather rate vs SOURCE array size (and slot alignment).

The real query path shows per-row gather costs that exp_gather3's small
sources never predicted: the padded-table path (51 MB source) runs at
~2.5 ns/row while the packed path (544 MB source) runs at ~18 ns/row at
similar row widths.  Hypothesis: XLA's gather rate depends on the source
working-set size, not just row width.  Sweeps source size at constant
gathered volume and row width (128 f32 = 512 B), plus a 136-lane
(unaligned-slot) variant at one size.
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

    rows_total = 1_440_000  # 1000 q x 1440 rows
    print("width  src_rows  src_MB      ms    ns/row   GB/s")
    for w, n_src in (
        (128, 20_000),
        (128, 100_000),
        (128, 400_000),
        (128, 1_000_000),
        (128, 2_000_000),
        (136, 1_000_000),
        (256, 1_000_000),
        (272, 500_000),
    ):
        src = jnp.asarray(rng.standard_normal((n_src, w)).astype(np.float32))
        rpq = rows_total // 1000
        idx = jnp.asarray(rng.integers(0, n_src, size=(1000, rpq)).astype(np.int32))

        @jax.jit
        def g(c, src=src):
            return jnp.sum(src[c], axis=(1, 2))

        dt = timeit(g, idx)
        nbytes = rows_total * w * 4
        print(
            f"{w:5d} {n_src:9d} {n_src*w*4/1e6:7.0f} {dt*1e3:8.3f} "
            f"{dt/rows_total*1e9:8.2f} {nbytes/dt/1e9:6.1f}"
        )

    # sorted (locality-friendly) indices at the biggest size: does access
    # order matter, or only the footprint?
    n_src, w = 1_000_000, 128
    src = jnp.asarray(rng.standard_normal((n_src, w)).astype(np.float32))
    idx = np.sort(rng.integers(0, n_src, size=(1000, rows_total // 1000))).astype(np.int32)
    idx = jnp.asarray(idx)

    @jax.jit
    def g2(c):
        return jnp.sum(src[c], axis=(1, 2))

    dt = timeit(g2, idx)
    print(f"sorted-rows 1M src:          {dt*1e3:8.3f} {dt/rows_total*1e9:8.2f}")


if __name__ == "__main__":
    main()
