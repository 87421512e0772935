"""The ANN index structure — the TPU-native ``save_t``.

Mirrors ``save_t`` (``/root/reference/ann.h:8-12``) as a pytree of on-device
arrays so it can be jitted over, donated, and sharded:

    reference field          -> here
    ------------------------------------------------------------------
    tries, n, k, d_short,
    d_long                   -> static metadata (pytree aux data)
    row_means (d)            -> row_means (d,)
    bases (tries*ds*d)       -> bases (tries, d_short, d)
    which_par[i] (ragged,
      2^ds x par_maxes[i])   -> tables (tries, 2^d_short, tmax), common
                                tmax = max_i par_maxes[i]; counts keeps the
                                true per-bucket occupancy so the ragged form
                                (and true index memory) is recoverable
    par_maxes (tries)        -> derivable: counts.max(axis=1)
    graph (n, k)             -> graph (n, k) int32

Unlike the reference (in-memory only, ``ann.h`` has no serialization), the
index can be saved/loaded — a new capability, via ``.npz``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ANNIndex:
    # array leaves
    row_means: Any  # (d,) ftype
    bases: Any  # (tries, d_short, d) ftype
    tables: Any  # (tries, 2^d_short, tmax) int32, sentinel = n
    counts: Any  # (tries, 2^d_short) int32 true occupancy
    graph: Any  # (n, k) int32, sentinel = n
    # static metadata
    n: int = dataclasses.field(metadata=dict(static=True))
    k: int = dataclasses.field(metadata=dict(static=True))
    d: int = dataclasses.field(metadata=dict(static=True))
    d_short: int = dataclasses.field(metadata=dict(static=True))
    tries: int = dataclasses.field(metadata=dict(static=True))
    tmax: int = dataclasses.field(metadata=dict(static=True))
    # optional stored (preprocessed) point matrix: the reference never keeps
    # vectors in save_t (callers re-pass them, ann.h:61-62); storing them is
    # a new serving convenience and is REQUIRED for metric="angular", where
    # search must run against the normalized copy.
    points: Any = None  # (n, d) ftype or None
    metric: str = dataclasses.field(default="l2", metadata=dict(static=True))

    @property
    def n_buckets(self) -> int:
        return 1 << self.d_short

    def with_depth(self, depth: int) -> "ANNIndex":
        """A view of this index whose bucket reads stop at ``depth`` slots.

        At query time the candidate gather reads ``P * tmax`` rows per
        table whether the buckets are full or not; on skewed corpora most
        of that is sentinel padding (e.g. capacity 245 vs mean occupancy
        7.6 at 1M points = ~97% waste).  Slicing the tables once yields a
        shallower index that searches proportionally faster at some recall
        cost — the cheap side of the capacity/recall knob, without a
        rebuild.  The slice materializes one new tables array; build once,
        reuse across searches.
        """
        if depth >= self.tmax:
            return self
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        return dataclasses.replace(
            self, tables=self.tables[:, :, :depth], tmax=depth
        )

    def par_maxes(self) -> np.ndarray:
        """Per-table max occupancy (reference ``save->par_maxes``,
        ``ann.h:10``), capped by the table capacity actually stored."""
        return np.minimum(np.asarray(self.counts).max(axis=1), self.tmax)

    def memory_bytes(self, ragged: bool = True) -> int:
        """Index memory. ragged=True prices tables at the reference's ragged
        layout (sum over tables of 2^d_short * par_maxes[i] ids) for
        equal-memory comparisons; ragged=False prices the padded on-device
        layout actually held in HBM."""
        f = np.dtype(np.asarray(self.row_means).dtype).itemsize
        base = self.row_means.size * f + self.bases.size * f + self.graph.size * 4
        if ragged:
            tables = int(self.par_maxes().sum()) * self.n_buckets * 4
        else:
            tables = self.tables.size * 4
        pts = 0 if self.points is None else self.points.size * f
        return int(base + tables + pts)

    def save(self, path: str) -> None:
        arrays = dict(
            row_means=np.asarray(self.row_means),
            bases=np.asarray(self.bases),
            tables=np.asarray(self.tables),
            counts=np.asarray(self.counts),
            graph=np.asarray(self.graph),
            meta=np.array([self.n, self.k, self.d, self.d_short, self.tries, self.tmax]),
            metric=np.array(self.metric),
        )
        if self.points is not None:
            arrays["points"] = np.asarray(self.points)
        np.savez_compressed(path, **arrays)

    @classmethod
    def load(cls, path: str) -> "ANNIndex":
        z = np.load(path)
        n, k, d, d_short, tries, tmax = (int(v) for v in z["meta"])
        return cls(
            row_means=jnp.asarray(z["row_means"]),
            bases=jnp.asarray(z["bases"]),
            tables=jnp.asarray(z["tables"]),
            counts=jnp.asarray(z["counts"]),
            graph=jnp.asarray(z["graph"]),
            n=n, k=k, d=d, d_short=d_short, tries=tries, tmax=tmax,
            points=jnp.asarray(z["points"]) if "points" in z else None,
            metric=str(z["metric"]) if "metric" in z else "l2",
        )
