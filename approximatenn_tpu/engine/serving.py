"""Serving facade: pick the best engine for a corpus automatically.

Role in the reference: none — its only serving surface is ``query``
(``/root/reference/ann.h:61-62``) over the one algorithm it has.  On TPU
the measured landscape is richer (BASELINE.md):

- **exact** — the fused Pallas MXU kernel (`ops/pallas_exact`): truly
  exact (full-precision f32 matmuls, recall 1.0 vs a float64 oracle) at
  ~1.3M QPS (20k pts) to 83k QPS (1M pts) on one v5e chip; bf16/int8
  storage tiers double/quadruple capacity at ~0.99/0.95 fidelity.
  Because XLA's candidate gather tops out near ~250M rows/s while the
  MXU scans ~50M points/ms, exhaustive search beats the TABLE-layout
  hash path far past 1M points per chip ("the gather wall",
  docs/ARCHITECTURE.md) — though with the exact-graph build the fused
  packed hash path now out-serves exact at 10M (BASELINE.md round 3).
- **hash** — the reference's algorithm (`build`/`search`): sub-linear
  candidate work; pays off when n outgrows the per-chip flops budget, for
  latency-critical small batches, or when sharded far past single-chip
  scale.  ``layout="packed"`` serves through the bucket-CSR view
  (`search_packed`): no overflow drops, superset candidates, `window`
  depth knob.

``Server`` wraps the choice; ``mode="auto"`` picks exact below
``exact_max_n`` points (default 8M per chip — corpus-fits-in-HBM is the
practical bound, see ``EXACT_MAX_N_DEFAULT``) and hash beyond.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

# Below this corpus size the exact MXU path beats the hash path outright on
# a single TPU chip (measured: 25x at 1M, and 10k QPS recall 1.0 at 10M —
# the crossover sits past HBM-resident scales for d ~ 100-1000; the
# practical bound is corpus-fits-in-HBM, ~8M x 128 f32 per 16 GB chip).
EXACT_MAX_N_DEFAULT = 8_000_000

# At and above this corpus size the exact mode serves through the
# two-phase engine (emit per-segment minima + top-segment DMA rescan,
# ops/pallas_exact.exact_knn_twophase).  Round-4 measured the crossover
# at 2M with a FIXED seg=512; the round-5 sqrt-scaled auto segment
# (seg ~ sqrt(n)/8, /tmp/r5_tpcost*.log 2026-08-21) moved it: two-phase
# wins 1.40x at 1M bf16 (4.77 vs 6.69 ms), 1.10x at 1M f32-split3,
# 1.05-1.08x at 500k, and parity-to-1.08x at 250k — so the route opens
# at 500k.  At 10M (served from the ONE lane-padded corpus) the win is
# 1.42x bf16 (25.8 vs 36.5 ms) and 1.44x f32-split3 through Server
# (52.6 ms / 19.0k QPS — the round-5 servable frontier).
# At 32M the verdict is DATA-dependent: two-phase is constant-cost
# (99.5 ms int8) while the rank kernel swings 79-119 ms with how often
# its merge fires (queries-near-points vs iid).  Two-phase stays the
# route (worst-case-optimal, jitter-free); workloads living in the
# clustered best case pass no_twophase=True per call.
TWOPHASE_MIN_N = 500_000

# Packed-serving engine routing.  HISTORY: the round-2 kernel lost to
# the XLA gather below batch ~512 at 1M (fixed grid-step costs), so
# rounds 2-4 interpolated a batch threshold inversely with n.  Round-5
# re-measured the full (n, batch) grid with the CURRENT kernel (bq=32
# default + the round 2-4 step-cost work): the fused DMA path now wins
# at EVERY point — 100k/1M/2M x batch {4..1000}: 1.1x at batch=4, 1.4x
# at 16, 1.7-2.1x at 32-64, 2.9-4.9x at >= 128 (/tmp/r5_{tiny,100k,1m,
# 2m}_ab.log, 2026-08-21; 10M was already always-fused in round 3).
# The crossover is extinct; the default threshold is 0 (always fused on
# accelerators).  FUSED_MIN_BATCH stays as the injectable override's
# historical anchor for callers that want to force the XLA path on
# workloads resembling the old regime.
FUSED_MIN_BATCH = 0


def fused_min_batch(n: int) -> int:
    """Minimum batch size at which packed serving routes to the fused
    kernel for an n-point view: 0 at every n — the round-5 re-measure
    found the fused kernel faster at every (n, batch) down to batch=4
    (see the routing note above).  Kept as a function (and as Server's
    ``fused_min_batch`` override knob) so a future regime shift is a
    one-line, test-covered change."""
    return FUSED_MIN_BATCH


def packed_route(n: int, batch: int, on_accelerator: bool,
                 min_batch: int | None = None) -> str:
    """The engine a plain packed `Server.search` call routes to —
    "fused" or "xla" — for an n-point view serving `batch` queries.
    ONE definition shared by the router and by the tuner's recorded
    trial labels (engine/tuning.py), so the label in a TuneReport can
    never diverge from what actually ran.  (Explicit pins — fused-only
    kwargs, interpret=True, xla-only kwargs — override this default in
    Server.search.)  ``min_batch`` overrides the measured
    ``fused_min_batch(n)`` threshold (Server's injectable routing knob,
    round-5 — makes the route testable at small n)."""
    thr = fused_min_batch(n) if min_batch is None else min_batch
    return "fused" if on_accelerator and batch >= thr else "xla"


# keyword arguments exact_knn_twophase accepts; anything else pinned on
# the server or passed per call (tile, query_block, stream, merge,
# compute_dtype, ...) is a rank-kernel knob and pins the rank path —
# forwarding it to the two-phase engine would TypeError (round-4 advisor)
_TWOPHASE_KW = frozenset(
    {"seg", "pad_segments", "scale", "interpret", "rescan",
     "matmul_precision"}
)
# two-phase-only knobs stripped before a rank-path dispatch (a caller may
# pass them alongside no_twophase, or routing may decline the engine)
_TWOPHASE_ONLY_KW = ("seg", "pad_segments", "rescan")


@dataclass
class Server:
    """One-stop serving handle over a point corpus.

    >>> srv = Server.build(points, k=10)          # picks engine by size
    >>> ids, dists = srv.search(queries)
    >>> srv.mode, srv.describe()

    ``mode``: "exact", "hash", or "auto" (default).  Hash-specific build
    options pass through ``**build_kw`` (tries, capacity, seed, n_probes,
    layout="table"|"packed", window, ...).
    """

    points: Any
    k: int
    mode: str
    metric: str = "l2"
    index: Any = None  # ANNIndex when mode == "hash"
    packed: Any = None  # PackedIndex when layout == "packed"
    n_probes: int | None = None
    _search_kw: dict = field(default_factory=dict)
    # the two-phase exact engine's rescan corpus.  Round-5: when d is not
    # a 128-multiple this IS ``points`` — the corpus is stored
    # lane-padded ONCE (zero lanes add 0 to every norm and dot, so both
    # the emit stream and the rank fallback are distance-identical) —
    # instead of corpus + a duplicate padded copy.  33% extra HBM at
    # d=96 rather than 133%, which is what makes the 10M x 96 f32
    # frontier servable through Server (round-4 VERDICT item 2).
    _rescan: Any = None
    _twophase: bool = False
    # logical feature dim (points.shape[1] may be lane-padded); 0 = no pad
    d_logical: int = 0
    # injectable routing thresholds (round-4 VERDICT item 3: the router
    # must be testable); None = the measured module-level defaults
    _twophase_min_n: int | None = None
    _fused_min_batch: int | None = None

    @classmethod
    def build(
        cls,
        points,
        k: int,
        *,
        mode: str = "auto",
        metric: str = "l2",
        exact_max_n: int | None = None,
        layout: str = "table",
        window: int | None = None,
        n_probes: int | None = None,
        storage_dtype=None,
        packed_dtype=None,
        twophase_min_n: int | None = None,
        twophase_pad_budget_bytes: int = 12 << 30,
        fused_min_batch: int | None = None,
        **build_kw,
    ) -> "Server":
        """``storage_dtype=jnp.bfloat16`` stores the corpus at half width:
        the exact engine streams it as stored (no f32 copy, factors
        bf16-rounded, f32 accumulation — near-identical neighbor sets,
        tests/test_pallas.py) and its corpus-fits-in-HBM bound doubles, so
        ``mode="auto"`` keeps recall ~1.0 serving to ~16M x 128 per chip.
        ``storage_dtype=jnp.int8`` quantizes symmetrically (scale kept on
        the server; exact-mode only) for 1/4 the f32 bytes — ~32M x 128
        per chip on the MXU's native int8 path."""
        points = jnp.asarray(points)
        scale = None
        quantized = (storage_dtype is not None
                     and jnp.dtype(storage_dtype) == jnp.int8)
        if metric != "l2" and quantized:
            # normalize BEFORE quantizing (the int8 grid must cover the
            # unit sphere, not the raw magnitudes)
            from ..data.preprocess import prepare_points

            points = prepare_points(points, metric)
        if quantized:
            from ..ops.pallas_exact import quantize_corpus

            points, scale = quantize_corpus(points)
        elif storage_dtype is not None:
            points = points.astype(storage_dtype)
        n = points.shape[0]
        if exact_max_n is None:
            exact_max_n = EXACT_MAX_N_DEFAULT
            itemsize = jnp.dtype(points.dtype).itemsize
            if itemsize <= 2:
                exact_max_n *= 2
            if itemsize == 1:
                exact_max_n *= 2  # int8: 4x the f32 bound in total
        if mode == "auto":
            # a quantized corpus has no hash path (the build needs floats):
            # auto always resolves it to exact rather than erroring.
            # k > 128 also resolves exact when the two-phase big-k
            # envelope applies (round 5 — emit-all rescan; the hash
            # path's k-width graph build is the worse large-k engine)
            mode = ("exact" if quantized
                    or (n <= exact_max_n
                        and (k <= 128 or n >= 8 * (k + 2)))
                    else "hash")
        if mode not in ("exact", "hash"):
            raise ValueError(f"unknown mode {mode!r}")
        if quantized and mode != "exact":
            raise ValueError(
                "storage_dtype=int8 serves the exact engine only (the "
                "hash build needs the float corpus); pass mode='exact' "
                "or quantize via index.packed(dtype=jnp.int8) instead"
            )
        srv = cls(points=points, k=k, mode=mode, metric=metric,
                  n_probes=n_probes, d_logical=int(points.shape[1]),
                  _twophase_min_n=twophase_min_n,
                  _fused_min_batch=fused_min_batch)
        if scale is not None:
            srv._search_kw["scale"] = scale
        if metric != "l2" and not quantized:
            from ..data.preprocess import prepare_points

            srv.points = prepare_points(points, metric)
        tp_min = TWOPHASE_MIN_N if twophase_min_n is None else twophase_min_n
        if (mode == "exact" and n >= tp_min and k + 2 <= 128
                and jnp.dtype(points.dtype).itemsize <= 4):
            # large-corpus exact serving rides the two-phase engine
            # (emit + DMA rescan — measured 1.09-1.30x the rank kernel
            # at 10M, id-identical).  A non-128-multiple d lane-pads the
            # corpus ONCE and the padded buffer serves BOTH the emit
            # stream and the rescan (zero lanes are distance-neutral),
            # so there is no duplicate staging copy: 10M x 96 f32 costs
            # 5.12 GB total instead of 3.84 + 4.77 — the published
            # split3+two-phase 15.1k-QPS frontier is reachable through
            # production routing (round-4 VERDICT item 2).  The budget
            # below is an HBM sanity bound on the PADDED corpus, not a
            # staging-copy cap.
            from ..ops.pallas_exact import stage_rescan_corpus

            d_pad = -(-points.shape[1] // 128) * 128
            padded_bytes = n * d_pad * jnp.dtype(points.dtype).itemsize
            if (d_pad == points.shape[1]  # no pad, no new memory at all
                    or padded_bytes <= twophase_pad_budget_bytes):
                try:
                    srv.points = stage_rescan_corpus(srv.points)
                    srv._rescan = srv.points
                    srv._twophase = True
                except Exception:
                    srv._twophase = False
        if mode == "hash":
            from .build import build

            srv.index, _, _ = build(
                points, k, metric=metric, store_points=True, **build_kw
            )
            if layout == "packed":
                # packed_dtype: storage width of the packed rows (bf16
                # halves them, int8 quarters + quantized ranking with
                # float re-score — see ANNIndex.packed)
                srv.packed = srv.index.packed(window=window,
                                              dtype=packed_dtype)
        return srv

    def _route_twophase(self, k: int, no_twophase: bool = False,
                        skw: dict | None = None) -> bool:
        """Whether an exact-mode search with these knobs rides the
        two-phase engine.  ONE predicate shared by ``search`` and
        ``describe``/the tuner's trial labels, so the reported engine can
        never diverge from what actually runs (round-4 advisor): staged at
        build + k fits the rescan selection + not escaped + accelerator-
        resident (or interpret=True, which runs the identical kernels off
        TPU — how the CPU-mesh tests exercise every branch) + no
        rank-kernel-only knobs pinned."""
        skw = {} if skw is None else skw
        if not (self._twophase and k + 2 <= 128 and not no_twophase):
            return False
        if not (set(skw) <= _TWOPHASE_KW):
            return False
        if skw.get("interpret"):
            return True
        return all(d_.platform != "cpu" for d_ in self.points.devices())

    def search(self, queries, k: int | None = None, **kw):
        """k approximate (hash) or exact nearest neighbors per query row.
        Returns (ids, squared distances) with the library's standard
        sentinel conventions."""
        k = self.k if k is None else k
        if self.mode == "exact":
            from ..ops.pallas_exact import exact_search

            if self.metric != "l2":
                from ..data.preprocess import prepare_points

                # int8 storage: queries stay float (the kernel quantizes
                # them itself with the stored scale)
                qdt = (jnp.float32 if self.points.dtype == jnp.int8
                       else self.points.dtype)
                queries = prepare_points(
                    jnp.asarray(queries, qdt), self.metric
                )
            queries = jnp.asarray(queries)
            qpad = self.points.shape[1] - queries.shape[1]
            if qpad > 0:
                # lane-padded corpus (see build): zero query lanes keep
                # every distance identical on both exact engines
                queries = jnp.pad(queries, [(0, 0), (0, qpad)])
            skw = {**self._search_kw, **kw}
            # pop UNCONDITIONALLY: the knob must not leak into either
            # engine's kwargs whichever way routing goes (round-4 advisor)
            no_tp = bool(skw.pop("no_twophase", False))
            if self._route_twophase(k, no_tp, skw):
                from ..ops.pallas_exact import exact_knn_twophase

                skw.setdefault("scale", None)
                return exact_knn_twophase(
                    self.points, queries.astype(jnp.float32), k,
                    rescan_corpus=self._rescan, **skw,
                )
            for kw_tp in _TWOPHASE_ONLY_KW:
                skw.pop(kw_tp, None)
            # the Server made the routing decision — keep exact_search's
            # own crossover route from re-making it
            return exact_search(self.points, queries, k,
                                no_twophase=True, **skw)
        kw = {**self._search_kw, **kw}  # pinned knobs (e.g. tuned rerank)
        kw.setdefault("n_probes", self.n_probes)
        if self.packed is not None:
            queries = jnp.asarray(queries)
            # route by batch size (measured crossover, see FUSED_MIN_BATCH)
            # unless a path-specific kwarg (with an actual value — callers
            # forwarding optional knobs pass None) pins the path
            given = {k2 for k2, v in kw.items() if v is not None}
            window = kw.pop("window", None)  # both paths honor it
            xla_only = {"budget_bytes", "block_rows"} & given
            on_tpu = all(
                dev.platform != "cpu"
                for dev in self.packed.point_rows.devices()
            )
            # interpret=True deliberately runs the fused kernel off-TPU
            # (tests); query_block is fused-only and meaningless off-TPU
            interp = bool(kw.get("interpret"))
            pin_fused = interp or (on_tpu and "query_block" in given)
            if "query_block" in given and not on_tpu and not interp:
                raise ValueError(
                    "query_block is a fused-kernel knob; off-TPU pass "
                    "interpret=True or drop it"
                )
            use_fused = pin_fused or (
                not xla_only
                and packed_route(self.packed.n, queries.shape[0],
                                 on_tpu, self._fused_min_batch) == "fused"
            )
            if use_fused:
                from .search import search_packed_fused

                return search_packed_fused(self.packed, queries=queries,
                                           window=window, **kw)
            from .search import search_packed

            kw.pop("query_block", None)  # fused-only, None/absent here
            kw.pop("interpret", None)
            pv = (self.packed if window is None
                  else self.packed.with_window(window))
            return search_packed(pv, queries=queries, **kw)
        from .search import search

        return search(self.index, queries=queries, **kw)

    def add_points(self, new_points) -> "Server":
        """Append rows with ids n..n+m-1, in place (returns self).

        Exact mode (round-5 — the append previously forced manual
        re-staging): rows are metric-prepared, tier-converted with the
        SERVER'S existing quantization scale (int8 values outside the
        original grid clip — re-quantize via a rebuild if the data
        distribution moved), lane-padded to the stored width, and
        concatenated; the two-phase rescan keeps serving from the same
        (grown) buffer.  Hash mode delegates to
        :meth:`~..index.ANNIndex.add_points` (frozen transforms,
        bucket append, reverse-edge repair) and re-packs the packed
        view at its current window/width."""
        new_points = jnp.asarray(new_points)
        if self.mode == "exact":
            if self.metric != "l2":
                from ..data.preprocess import prepare_points

                new_points = prepare_points(
                    new_points.astype(jnp.float32), self.metric
                )
            if self.points.dtype == jnp.int8:
                scale = self._search_kw["scale"]
                new_points = jnp.clip(
                    jnp.round(new_points.astype(jnp.float32) / scale),
                    -127, 127,
                ).astype(jnp.int8)
            else:
                new_points = new_points.astype(self.points.dtype)
            qpad = self.points.shape[1] - new_points.shape[1]
            if qpad > 0:
                new_points = jnp.pad(new_points, [(0, 0), (0, qpad)])
            self.points = jnp.concatenate([self.points, new_points])
            if self._twophase:
                self._rescan = self.points
            return self
        self.index = self.index.add_points(new_points)
        if self.packed is not None:
            self.packed = self.index.packed(
                window=self.packed.window,
                dtype=self.packed.point_rows.dtype,
            )
        return self

    def remove_points(self, ids) -> "Server":
        """Remove rows by id, in place (returns self).

        Exact mode: the corpus is compacted (one gather copy; remaining
        rows KEEP their original relative order but ids above removed
        rows shift down — the exact engine has no tombstones, its ids
        are row positions).  Hash mode delegates to the index's
        tombstoning ``remove_points`` (ids stay stable) and re-packs."""
        import numpy as np

        if self.mode == "exact":
            # host-side unique: duplicate ids would make the static
            # nonzero size overcount and silently duplicate row 0
            uids = np.unique(np.asarray(ids).astype(np.int64))
            n = self.points.shape[0]
            keep = jnp.ones((n,), bool).at[jnp.asarray(uids)].set(False)
            (kept,) = jnp.nonzero(keep, size=int(n - len(uids)))
            self.points = jnp.take(self.points, kept, axis=0)
            if self._twophase:
                self._rescan = self.points
            return self
        self.index = self.index.remove_points(ids)
        if self.packed is not None:
            self.packed = self.index.packed(
                window=self.packed.window,
                dtype=self.packed.point_rows.dtype,
            )
        return self

    def describe(self) -> dict:
        d = {
            "mode": self.mode,
            "n": int(self.points.shape[0]),
            # the LOGICAL feature dim (the stored corpus may be
            # lane-padded for the two-phase rescan; see build)
            "d": int(self.d_logical or self.points.shape[1]),
            "k": self.k,
            "metric": self.metric,
            # recall vs the TRUE neighbors: 1.0 only for full-precision
            # exact; a rounded/quantized stored corpus is exact over the
            # grid values, not the originals (measured ~0.93-0.97 for int8
            # vs the f32 oracle, BASELINE.md) — report None rather than a
            # number this handle cannot know
            "recall": (1.0 if self.mode == "exact"
                       and jnp.dtype(self.points.dtype).itemsize >= 4
                       else None),
            "storage_dtype": str(jnp.dtype(self.points.dtype)),
        }
        if self.mode == "exact":
            # the engine a plain search(queries) would ACTUALLY route to
            # on the corpus's current placement (shared predicate — a
            # CPU-resident 2M+ corpus correctly reports "rank")
            d["exact_engine"] = ("twophase"
                                 if self._route_twophase(self.k)
                                 else "rank")
        if self.index is not None:
            d["layout"] = "packed" if self.packed is not None else "table"
            d["index_mb"] = round(
                (self.packed or self.index).memory_bytes() / 2**20, 1
            )
        return d
