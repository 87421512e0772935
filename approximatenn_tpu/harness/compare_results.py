"""Backend-parity harness (role of ``/root/reference/compare_results.c``).

The reference gates its GPU backend against the single-threaded C backend by
re-seeding libc ``random()`` identically before each run
(``compare_results.c:122-130``) and counting output differences (graph ids
exact; floats in 1024-ULP units, ``:152-171``).  Here determinism comes for
free: the same ``jax.random`` key drives both runs, the accelerator (TPU)
and the CPU platform — one algorithm definition, two lowering targets
(SURVEY.md §1).

Precomp mode: per repetition, draw a fresh seed, build on both backends,
report mean graph-id mismatches and float-field ULP diffs.
Query mode (``-z``): one shared index built on the accelerator, then per
repetition query both backends and count id mismatches.

Run: ``python -m approximatenn_tpu.harness.compare_results [-n ...]``
"""

from __future__ import annotations

import sys
import time

import numpy as np

from .common import gen_gaussian, make_parser, np_dtype


def ulp_units(a: np.ndarray, b: np.ndarray, unit: int = 1024) -> float:
    """Float difference in `unit` ULPs (reference: '1024 ulp = 1 diff',
    ``compare_results.c:17,152-163``), via the monotonic int mapping."""
    def key(x):
        bits = np.asarray(x, np.float32).view(np.int32).astype(np.int64)
        mag = bits & 0x7FFFFFFF
        return np.where(bits < 0, -mag, mag)  # monotonic in float order

    return float(np.sum(np.abs(key(a) - key(b)) // unit))


def diffcount(a: np.ndarray, b: np.ndarray) -> int:
    """Exact mismatch count of id arrays (``compare_results.c:20-25``)."""
    return int(np.sum(np.asarray(a) != np.asarray(b)))


def main(argv=None) -> int:
    p = make_parser("compare_results", __doc__.splitlines()[0])
    args = p.parse_args(argv)
    if args.z and args.ycnt is None:
        args.ycnt = 50

    import jax

    import approximatenn_tpu as ann

    cpu = jax.devices("cpu")[0]
    try:
        acc = jax.devices()[0]
    except RuntimeError:
        acc = cpu
    if acc == cpu:
        print("note: no accelerator found; comparing CPU vs CPU")

    rng = np.random.default_rng(args.seed if args.seed is not None else time.time_ns())
    dt = np_dtype(args.dtype)
    kw = dict(
        tries=args.tries, rots_before=args.rots_before,
        rot_len_before=args.rot_len_before, rots_after=args.rots_after,
        rot_len_after=args.rot_len_after,
    )

    if args.ycnt:
        points = gen_gaussian(rng, args.n, args.d, dt)
        key = jax.random.key(int(rng.integers(2**63)))
        idx_a, _, _ = ann.build(jax.device_put(points, acc), args.k,
                                key=jax.device_put(key, acc), **kw)
        idx_c = jax.device_put(idx_a, cpu)
        pa, pc = jax.device_put(points, acc), jax.device_put(points, cpu)
        total = 0
        for i in range(args.average_over):
            y = gen_gaussian(rng, args.ycnt, args.d, dt)
            ia, _ = ann.search(idx_a, pa, jax.device_put(y, acc))
            ic, _ = ann.search(idx_c, pc, jax.device_put(y, cpu))
            # compare as id-sets per row: sort ordering of equal distances
            # may legitimately differ between backends (SURVEY.md §7)
            total += diffcount(np.sort(np.asarray(ia), 1), np.sort(np.asarray(ic), 1))
            if args.verbose:
                print(i + 1, end=" ", flush=True)
        if args.verbose:
            print()
        print(f"Average query diff count: {total / args.average_over:g} "
              f"(of {args.ycnt * args.k} ids)")
    else:
        # the hash pipeline is the divergence-prone path this gate exists
        # for (graph_mode="auto" resolves to "exact" at harness sizes,
        # which would compare two exhaustive searches); gate BOTH modes.
        totals = {"hash": [0, 0.0], "exact": [0, 0.0]}
        for i in range(args.average_over):
            points = gen_gaussian(rng, args.n, args.d, dt)
            key = jax.random.key(int(rng.integers(2**63)))
            for mode, (gt_, ft_) in totals.items():
                ia, ga, da = ann.build(jax.device_put(points, acc), args.k,
                                       key=jax.device_put(key, acc),
                                       graph_mode=mode, **kw)
                ic, gc, dc = ann.build(jax.device_put(points, cpu), args.k,
                                       key=jax.device_put(key, cpu),
                                       graph_mode=mode, **kw)
                gt_ += diffcount(np.sort(np.asarray(ga), 1),
                                 np.sort(np.asarray(gc), 1))
                ft_ += ulp_units(np.asarray(ia.row_means), np.asarray(ic.row_means))
                ft_ += ulp_units(np.asarray(ia.bases), np.asarray(ic.bases))
                # sort BEFORE masking so the finite mask is aligned with
                # the elements it selects (±inf sorts to the row tail on
                # both operands; mismatched inf counts show up as graph
                # id diffs, not float diffs)
                da_ = np.sort(np.asarray(da), 1)
                dc_ = np.sort(np.asarray(dc), 1)
                fin = np.isfinite(da_) & np.isfinite(dc_)
                ft_ += ulp_units(da_[fin], dc_[fin])
                totals[mode] = [gt_, ft_]
            if args.verbose:
                print(i + 1, end=" ", flush=True)
        if args.verbose:
            print()
        for mode, (gt_, ft_) in totals.items():
            print(
                f"[graph_mode={mode}] Average graph diff count: "
                f"{gt_ / args.average_over:g} (of {args.n * args.k} ids); "
                f"float diff (1024-ULP units): {ft_ / args.average_over:g}"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
