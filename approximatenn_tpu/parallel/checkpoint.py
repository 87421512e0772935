"""Sharded-index checkpointing.

The reference's only persistence is the in-memory ``save_t`` (``ann.h:8-12``
— no serialization exists).  Single-device indexes serialize via
``ANNIndex.save/load`` (npz).  This module persists a distributed
:class:`~.sharded.ShardedIndex`: array leaves via Orbax (which handles
multi-host sharded arrays natively) when available, npz otherwise
(single-host only); static metadata via JSON; restore re-applies the
row-sharding layout that ``build_sharded`` produces on a caller-provided
mesh, so an index built on one topology can be served from a compatible
one (same shard count).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharded import AXIS, ShardedIndex

_ARRAY_FIELDS = ("row_means", "bases", "tables", "counts", "graph")
_SHARDED_FIELDS = {"tables", "counts", "graph"}  # leading shard axis
_META_FIELDS = (
    "n", "n_local", "k", "d", "d_short", "tries", "tmax", "n_shards",
)


def _specs():
    return {
        f: P(AXIS, *([None] * r))
        for f, r in (("tables", 3), ("counts", 2), ("graph", 2))
    } | {"row_means": P(), "bases": P()}


def save_sharded_index(sidx: ShardedIndex, path: str | Path) -> None:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    meta = {f: getattr(sidx, f) for f in _META_FIELDS}
    arrays = {f: getattr(sidx, f) for f in _ARRAY_FIELDS}
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save((path / "arrays").absolute(), arrays, force=True)
        ckptr.wait_until_finished()
        meta["format"] = "orbax"
    except ImportError:
        if jax.process_count() > 1:
            raise RuntimeError("multi-host checkpointing requires orbax")
        np.savez(
            path / "arrays.npz", **{f: np.asarray(v) for f, v in arrays.items()}
        )
        meta["format"] = "npz"
    (path / "meta.json").write_text(json.dumps(meta))


def load_sharded_index(path: str | Path, mesh: Mesh) -> ShardedIndex:
    path = Path(path)
    meta = json.loads((path / "meta.json").read_text())
    s = mesh.shape[AXIS]
    if s != meta["n_shards"]:
        raise ValueError(
            f"mesh has {s} shards but index was built with {meta['n_shards']}"
        )
    specs = _specs()
    if meta["format"] == "orbax":
        import orbax.checkpoint as ocp

        # restore directly into the target shardings
        shapes = _abstract_shapes(meta)
        target = {
            f: jax.ShapeDtypeStruct(
                shapes[f][0], shapes[f][1], sharding=NamedSharding(mesh, specs[f])
            )
            for f in _ARRAY_FIELDS
        }
        ckptr = ocp.StandardCheckpointer()
        arrays = ckptr.restore(
            (path / "arrays").absolute(), target
        )
    else:
        z = np.load(path / "arrays.npz")
        arrays = {
            f: jax.device_put(z[f], NamedSharding(mesh, specs[f]))
            for f in _ARRAY_FIELDS
        }
    kw = {f: meta[f] for f in _META_FIELDS}
    return ShardedIndex(**arrays, **kw)


def _abstract_shapes(meta):
    import jax.numpy as jnp

    s, tries, ds, tmax = (
        meta["n_shards"], meta["tries"], meta["d_short"], meta["tmax"],
    )
    nb = 1 << ds
    f = jnp.float32
    return {
        "row_means": ((meta["d"],), f),
        "bases": ((tries, ds, meta["d"]), f),
        "tables": ((s, tries, nb, tmax), jnp.int32),
        "counts": ((s, tries, nb), jnp.int32),
        "graph": ((s, meta["n_local"], meta["k"]), jnp.int32),
    }
