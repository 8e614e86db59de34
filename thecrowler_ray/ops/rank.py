"""Distributed dense rank (zip-with-index) over an ordered Dataset.

Ray Data has no global-index operator; this implements one with public APIs
and **no driver materialization of rows**: pull the block refs + per-block
row counts of a (sorted) materialized dataset, compute prefix offsets on the
driver (counts only — O(#blocks)), then add ``rank = offset + arange(n)`` to
each block in a remote task and rebuild the dataset with
``from_arrow_refs``.

Used by the crawl driver to assign the dense wave ordinal after
``sort(...).limit(...)`` (ENGINE_SPEC.md step 8) — the one place BFS
semantics genuinely need a total order. Cost: one tiny metadata pass plus
one embarrassingly parallel map; no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote
def _add_rank(block: pa.Table, offset: int, col: str) -> pa.Table:
    return block.append_column(
        col, pa.array(offset + np.arange(len(block), dtype=np.int64))
    )


def with_dense_rank(ds: "ray.data.Dataset", col: str = "rank") -> "ray.data.Dataset":
    """Append a dense 0..n-1 ``col`` following the dataset's block order.
    The input should already be materialized and ordered (e.g. by
    ``sort().limit().materialize()`` under ``preserve_order=True``)."""
    bundles = list(ds.iter_internal_ref_bundles())
    refs: list = []
    counts: list[int] = []
    for b in bundles:
        for block_ref, meta in zip(b.block_refs, b.metadata):
            refs.append(block_ref)
            counts.append(meta.num_rows)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) if counts else []
    new_refs = [
        _add_rank.remote(ref, int(off), col) for ref, off in zip(refs, offsets)
    ]
    if not new_refs:
        return ds
    return ray.data.from_arrow_refs(new_refs)
