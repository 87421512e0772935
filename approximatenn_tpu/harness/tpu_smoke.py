"""Real-TPU smoke gate (round-4 VERDICT item 5).

The CPU suite runs every Pallas kernel in interpret mode, which by
CLAUDE.md rule 14 CANNOT catch Mosaic compile failures (tile-divisibility
proofs, in-flight DMA-count limits — both classes were discovered only by
real-TPU compiles).  This module is the ~2-minute hardware gate that can:
it compiles and runs every production kernel path near its measured Mosaic
envelope and checks ids against the XLA oracle, then runs one
TPU-vs-CPU parity config with an enforced acceptance band (the role of
``/root/reference/compare_results.c`` as a *gate*, not a tool).

Run it as THE ONLY TPU process (CLAUDE.md rule 2):

    PYTHONPATH=/root/.axon_site:/root/repo \
        python -m approximatenn_tpu.harness.tpu_smoke

or through pytest (subprocess-wrapped, opt-in): ``pytest -m tpu tests/``.
Exit code 0 = all gates pass; 1 = a gate failed; 3 = no TPU attached.
Prints one JSON line per gate plus a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _log(rec: dict) -> None:
    print(json.dumps(rec), flush=True)


def main(argv=None) -> int:
    import jax

    # persistent cache: repeated gate runs skip XLA/Mosaic recompiles
    # (threshold 0.0 — see CLAUDE.md rule 19)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon"):
        _log({"gate": "attach", "ok": False,
              "error": f"no TPU attached (platform={dev.platform})"})
        return 3

    import numpy as np
    import jax.numpy as jnp

    from ..ops.distance import brute_force_knn
    from ..ops.pallas_exact import exact_knn_pallas, quantize_corpus
    from ..utils.profiling import fence
    from .scoring import recall_at_k

    failures = []

    def gate(name, ok, **info):
        _log({"gate": name, "ok": bool(ok), **info})
        if not ok:
            failures.append(name)

    t_all = time.perf_counter()
    rng = np.random.default_rng(0)
    n, d, m, k = 20_000, 128, 1000, 10
    X = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    t_ids, _ = brute_force_knn(X, Y, k)  # XLA oracle at HIGHEST
    t_ids = np.asarray(t_ids)

    # --- exact kernel: every precision tier compiles + matches oracle ---
    for prec, floor in (("highest", 1.0), ("split3", 1.0),
                        ("default", 0.985)):
        try:
            t0 = time.perf_counter()
            ids, dd = exact_knn_pallas(X, Y, k, matmul_precision=prec)
            fence([ids])
            rec = recall_at_k(t_ids, np.asarray(ids), k)
            gate(f"exact_{prec}", rec >= floor, recall=round(rec, 5),
                 floor=floor, secs=round(time.perf_counter() - t0, 2))
        except Exception as e:  # Mosaic compile failures land here
            gate(f"exact_{prec}", False, error=repr(e)[:300])

    # --- storage tiers (different Mosaic tiling configs compile) ---
    try:
        ids_b, _ = exact_knn_pallas(X.astype(jnp.bfloat16), Y, k)
        fence([ids_b])
        rec = recall_at_k(t_ids, np.asarray(ids_b), k)
        gate("exact_bf16_stored", rec >= 0.97, recall=round(rec, 5))
    except Exception as e:
        gate("exact_bf16_stored", False, error=repr(e)[:300])
    try:
        Xq, scale = quantize_corpus(X)
        ids_q, _ = exact_knn_pallas(Xq, Y, k, scale=scale)
        fence([ids_q])
        rec = recall_at_k(t_ids, np.asarray(ids_q), k)
        gate("exact_int8", rec >= 0.90, recall=round(rec, 5))
    except Exception as e:
        gate("exact_int8", False, error=repr(e)[:300])

    # --- two-phase exact engine (emit + DMA rescan kernels) ------------
    try:
        from ..ops.pallas_exact import exact_knn_twophase

        t0 = time.perf_counter()
        ids_t, _ = exact_knn_twophase(X, Y, k)
        fence([ids_t])
        rec = recall_at_k(t_ids, np.asarray(ids_t), k)
        gate("exact_twophase", rec >= 1.0, recall=round(rec, 5),
             secs=round(time.perf_counter() - t0, 2))
    except Exception as e:
        gate("exact_twophase", False, error=repr(e)[:300])

    # --- two-phase at moderate k (round-5; the round-4 advisor's
    # VMEM-scaling class: a fixed seg=512 rescan failed Mosaic compile
    # past k ~ 22 — the auto-fit must keep this compiling) -------------
    try:
        t0 = time.perf_counter()
        t64, _ = brute_force_knn(X, Y[:100], 64)
        ids_t, _ = exact_knn_twophase(X, Y[:100], 64)
        fence([ids_t])
        rec = recall_at_k(np.asarray(t64), np.asarray(ids_t), 64)
        gate("exact_twophase_k64", rec >= 1.0, recall=round(rec, 5),
             secs=round(time.perf_counter() - t0, 2))
    except Exception as e:
        gate("exact_twophase_k64", False, error=repr(e)[:300])

    # --- k > 128 exact envelope (round-5: emit-all rescan + XLA top-k) -
    try:
        from ..ops.pallas_exact import exact_search

        t0 = time.perf_counter()
        t256, _ = brute_force_knn(X, Y[:100], 256)
        ids_g, _ = exact_search(X, Y[:100], 256)
        fence([ids_g])
        rec = recall_at_k(np.asarray(t256), np.asarray(ids_g), 256)
        gate("exact_bigk_256", rec >= 1.0, recall=round(rec, 5),
             secs=round(time.perf_counter() - t0, 2))
    except Exception as e:
        gate("exact_bigk_256", False, error=repr(e)[:300])

    # --- Server two-phase route on a lane-padded corpus (round-5: the
    # d % 128 != 0 production path — ONE padded buffer serves emit AND
    # rescan; routing must report and run twophase) ---------------------
    try:
        from ..engine.serving import Server

        t0 = time.perf_counter()
        X96 = X[:, :96]
        srv = Server.build(X96, k, mode="exact", twophase_min_n=10_000)
        eng = srv.describe()["exact_engine"]
        ids_s, _ = srv.search(Y[:200, :96])
        fence([ids_s])
        t96, _ = brute_force_knn(X96, Y[:200, :96], k)
        rec = recall_at_k(np.asarray(t96), np.asarray(ids_s), k)
        gate("server_twophase_padded", rec >= 1.0 and eng == "twophase",
             recall=round(rec, 5), engine=eng,
             secs=round(time.perf_counter() - t0, 2))
    except Exception as e:
        gate("server_twophase_padded", False, error=repr(e)[:300])

    # --- fused probe kernel near the Mosaic envelope -------------------
    # window=256 / P=48 / rerank=50 / bq=32 is the measured compile
    # boundary (BASELINE.md 1M high-recall section: rerank=100 at this
    # window FAILS remote compile) — the exact region a regression in
    # DMA-wave sizing would break first.  int8 rows compile through a
    # different Mosaic config ((32,128) tiling) and are gated separately.
    try:
        from .. import build
        from ..engine.search import search_packed, search_packed_fused

        t0 = time.perf_counter()
        idx, _, _ = build(X, k, tries=4, seed=3, capacity=64)
        for dtype, name in ((None, "probe_fused_envelope"),
                            (jnp.int8, "probe_fused_int8")):
            pk = idx.packed(X, window=256, dtype=dtype)
            fi, fdd = search_packed_fused(
                pk, X, Y, n_probes=48, window=256, query_block=32,
                rerank_width=50,
            )
            fence([fi])
            xi, _ = search_packed(pk, X, Y, n_probes=48, rerank_width=50)
            rec_f = recall_at_k(t_ids, np.asarray(fi), k)
            rec_x = recall_at_k(t_ids, np.asarray(xi), k)
            # exact-window candidates vs super-row spillover: close bands
            gate(name, rec_f >= rec_x - 0.05,
                 recall_fused=round(rec_f, 4), recall_xla=round(rec_x, 4),
                 secs=round(time.perf_counter() - t0, 2))
            t0 = time.perf_counter()
    except Exception as e:
        gate("probe_fused_envelope", False, error=repr(e)[:300])

    # --- ShardedServer on a 1-chip mesh (round-5): shard_map wrapping
    # the Pallas engines on REAL hardware — the CPU-mesh tests run them
    # in interpret mode, so this is the only gate on the combination ---
    try:
        from ..parallel.serving import ShardedServer
        from ..parallel.sharded import make_mesh

        t0 = time.perf_counter()
        mesh1 = make_mesh(1)
        ssrv = ShardedServer.build(X, k, mesh=mesh1, mode="exact",
                                   twophase_min_n=10_000)
        sids, _ = ssrv.search(Y[:200])
        fence([sids])
        rec = recall_at_k(t_ids[:200], np.asarray(sids), k)
        eng = ssrv.describe()["exact_engine"]
        gate("sharded_server_1chip", rec >= 1.0 and eng == "twophase",
             recall=round(rec, 5), engine=eng,
             secs=round(time.perf_counter() - t0, 2))
    except Exception as e:
        gate("sharded_server_1chip", False, error=repr(e)[:300])

    # --- TPU-vs-CPU parity with the enforced band ----------------------
    # (compare_results exits 2 past --max-diff-frac; the round-3 recorded
    # band at the gate config is ZERO diffs — see baselines/parity_tpu
    # .json — so any nonzero graph diff fraction is a regression)
    try:
        from .compare_results import main as cmp_main

        t0 = time.perf_counter()
        rc = cmp_main(["-n", "2000", "-d", "64", "-k", "10", "-t", "4",
                       "-o", "1", "--seed", "11",
                       "--max-diff-frac", "0.0005"])
        gate("parity_band", rc == 0, rc=rc,
             secs=round(time.perf_counter() - t0, 2))
    except Exception as e:
        gate("parity_band", False, error=repr(e)[:300])

    _log({"gate": "summary", "ok": not failures, "failed": failures,
          "total_secs": round(time.perf_counter() - t_all, 1),
          "device": str(dev)})
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
