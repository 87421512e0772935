#!/usr/bin/env python
"""Microbench 2: wide-row gather — amortizing the per-row gather cost.

exp_gather.py showed row gather costs ~3 ns/row FLAT from 64 B to 512 B
rows: cost is per-row, not per-byte.  So gathering bucket TILES as single
wide rows (cap*d floats each) should cut the row count ~24x and approach
streaming bandwidth.  This measures the gather-cost-vs-row-width curve at
constant total volume, then the real multiprobe pattern end to end.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from approximatenn_tpu.utils.profiling import fence

    rng = np.random.default_rng(0)
    total_f32 = 368_640_000  # = 1000 q x 2880 cand x 128 d (1.47 GB)

    def timeit(name, fn, *a, reps=10):
        out = fn(*a)
        fence(out)
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / reps
        return dt

    # --- width sweep at constant volume ---
    print("width(f32)  rows_gathered      ms    ns/row   GB/s")
    for w in (128, 256, 512, 1024, 3072, 8192):
        rows_total = total_f32 // w
        n_rows_src = 20_480
        src = jnp.asarray(rng.standard_normal((n_rows_src, w)).astype(np.float32))
        # keep the index tensor 2D (1000, rows/query) like the real pattern
        rpq = rows_total // 1000
        idx = jnp.asarray(rng.integers(0, n_rows_src, size=(1000, rpq)).astype(np.int32))

        @jax.jit
        def g(c):
            return jnp.sum(src[c], axis=(1, 2))

        dt = timeit(f"w{w}", g, idx)
        print(f"{w:10d} {1000*rpq:12d} {dt*1e3:9.3f} {dt/(1000*rpq)*1e9:8.2f} "
              f"{total_f32*4/dt/1e9:7.1f}")

    # --- the real multiprobe pattern, tile-row form ---
    import approximatenn_tpu as ann
    from approximatenn_tpu.ops.hash import pack_signs, probe_codes
    from approximatenn_tpu.ops.topk import dedup_topk

    n, d, k, tries, m = 20_000, 128, 10, 10, 1000
    X = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    index, _, _ = ann.build(X, k, tries=tries, seed=7)
    ds, cap = index.d_short, index.tmax
    nb = 1 << ds
    P = ds + 1
    print(f"\nreal pattern: cap={cap} P={P} tiles/query={tries*P} "
          f"tile={cap*d*4/1024:.0f} KB")

    safe_tables = jnp.where(index.tables < n, index.tables, 0)
    packed = X[safe_tables]  # (T, nb, cap, d)
    packed = jnp.where((index.tables < n)[..., None], packed, jnp.inf)
    packed_rows = packed.reshape(tries * nb, cap * d)  # wide rows
    tables_flat = index.tables.reshape(tries * nb, cap)
    fence(packed_rows)
    print(f"packed_rows {packed_rows.shape} {packed_rows.nbytes/1e6:.0f} MB")

    toff = (jnp.arange(tries, dtype=jnp.int32) * nb)[None, :, None]

    @jax.jit
    def codes_of(q):
        yc = q - index.row_means
        proj = (yc @ index.bases.reshape(tries * ds, d).T).reshape(-1, tries, ds)
        return pack_signs(proj)

    codes = codes_of(Y)
    fence(codes)

    @jax.jit
    def tile_gather_only(cb):
        probes = probe_codes(cb, ds) + toff  # (m, T, P) flat row ids
        pr = probes.reshape(cb.shape[0], -1)  # (m, T*P)
        pc = packed_rows[pr]  # (m, T*P, cap*d)
        return jnp.sum(pc, axis=(1, 2))

    dt = timeit("tile-gather", tile_gather_only, codes)
    print(f"tile-gather(+inf pads)      {dt*1e3:9.3f} ms")

    @jax.jit
    def tile_search(qb, cb):
        probes = probe_codes(cb, ds) + toff
        pr = probes.reshape(qb.shape[0], -1)
        ids = tables_flat[pr].reshape(qb.shape[0], -1)  # (m, L)
        pc = packed_rows[pr].reshape(qb.shape[0], -1, d)  # (m, L, d)
        diff = qb[:, None, :] - pc
        dd = jnp.sum(diff * diff, axis=-1)
        dd = jnp.where(ids < n, dd, jnp.inf)
        return dedup_topk(ids, dd, k, n)

    dt = timeit("tile-search", tile_search, Y, codes)
    print(f"tile gather+dist+topk       {dt*1e3:9.3f} ms  "
          f"({m/dt:.0f} QPS-equiv, no supercharge)")

    # correctness vs the row-gather form
    from approximatenn_tpu.ops.distance import candidate_dists

    @jax.jit
    def row_search(qb, cb):
        probes = probe_codes(cb, ds)
        tidx = jnp.arange(tries, dtype=jnp.int32)[None, :, None]
        cand = index.tables[tidx, probes].reshape(qb.shape[0], -1)
        dd = candidate_dists(qb, X, cand)
        return dedup_topk(cand, dd, k, n)

    dt = timeit("row-search", row_search, Y, codes)
    print(f"row gather+dist+topk        {dt*1e3:9.3f} ms")
    ti, td = tile_search(Y, codes)
    ri, rd = row_search(Y, codes)
    print("ids equal:", bool(jnp.all(ti == ri)),
          " dists close:", bool(jnp.allclose(jnp.where(jnp.isinf(td), 0, td),
                                             jnp.where(jnp.isinf(rd), 0, rd),
                                             rtol=1e-5)))


if __name__ == "__main__":
    main()
