#!/usr/bin/env python
"""Exact serving on an int8-quantized corpus — the exact engine's widest
scale axis.

exact_knn_pallas streams an int8 corpus at storage width on the MXU's
native int8 path (int32 dots, quantized-domain distances rescaled by
scale^2; ops/pallas_exact.py).  1/4 the f32 bytes: 32M x 96 fits one
16 GB chip.  Measures QPS at Deep-10M (with recall vs the f32 oracle —
the f32 corpus still fits there) and QPS at 24M/32M x 96 (generated
chunk-wise; the f32 corpus never exists, so the quality gate is the 10M
point).

  PYTHONPATH=/root/.axon_site:/root/repo nohup python -u \
    scripts/bench_exact_int8.py > /tmp/exact_int8.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import time


def synth_clustered_int8(n, d, nq, scale_margin=1.15, chunk=4_000_000,
                         seed=0):
    """Chunked device-side synth straight into an int8 buffer: the f32
    corpus never materializes (32M x 96 f32 is 12.3 GB; plus the gather
    + noise transients of the one-shot generator it would OOM the chip).
    The quantization scale is fixed from chunk 0's max|x| x margin —
    later chunks clip at +-127 like any out-of-grid value would."""
    import jax
    import jax.numpy as jnp

    from approximatenn_tpu.utils.profiling import fence

    from exp_10m_hash import synth_clustered

    parts, scale = [], None
    qY = None
    done = 0
    ci = 0
    while done < n:
        m = min(chunk, n - done)
        # chunk 0 also yields the queries (perturbed corpus points)
        Xc, Yc = synth_clustered(m, d, nq, seed=seed + ci)
        if scale is None:
            scale = float(jnp.max(jnp.abs(Xc))) * scale_margin / 127.0
            qY = Yc
        q = jnp.clip(jnp.round(Xc / scale), -127, 127).astype(jnp.int8)
        fence([q])
        del Xc, Yc
        parts.append(q)
        done += m
        ci += 1
    Xq = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    fence([Xq])
    return Xq, jnp.asarray(scale, jnp.float32), qY


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+",
                    default=[10_000_000, 24_000_000, 32_000_000])
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--nq", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--gt-max-n", type=int, default=10_000_000,
                    help="compute the f32 oracle (and recall) up to this n")
    args = ap.parse_args()

    import os

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    import approximatenn_tpu as ann
    from approximatenn_tpu.harness.scoring import recall_at_k
    from approximatenn_tpu.utils.profiling import fence

    from exp_10m_hash import synth_clustered

    d, nq, k = args.d, args.nq, args.k
    for n in args.n:
        rec = None
        if n <= args.gt_max_n:
            X, Y = synth_clustered(n, d, nq)
            fence([X, Y])
            tq, _ = ann.exact_search(X, Y, k)
            tq = np.asarray(tq)
            Xq, scale = ann.quantize_corpus(X)
            fence([Xq])
            del X
        else:
            tq = None
            Xq, scale, Y = synth_clustered_int8(n, d, nq)
        out = ann.exact_search(Xq, Y, k, scale=scale)
        fence(out)
        t0 = time.perf_counter()
        outs = [ann.exact_search(Xq, Y, k, scale=scale)
                for _ in range(args.reps)]
        fence(outs)
        dt = (time.perf_counter() - t0) / args.reps
        if tq is not None:
            rec = round(recall_at_k(tq, np.asarray(out[0]), k), 4)
        print(json.dumps({
            "engine": "exact-int8", "n": n, "d": d,
            "qps": round(nq / dt, 1), "ms_per_batch": round(dt * 1e3, 2),
            "recall_at_10_vs_f32": rec,
            "corpus_gb": round(n * d / 2**30, 2),
        }), flush=True)
        del Xq, Y, out, outs


if __name__ == "__main__":
    main()
