"""Reciprocal Rank Fusion (RRF) — rank-list combination for hybrid
retrieval (BM25 ⊕ embedding ⊕ any other run).

RRF (Cormack, Clarke & Buettcher 2009 — public method) fuses ranked
lists without score calibration: each run contributes
``1 / (k + rank)`` per document; the fused order is by the sum. The
standard hybrid-search combiner (lexical + vector runs).

**Integer fixed-point**: contributions are ``scale // (k + rank)`` —
pure int64 floor division, so fused scores are order-free sums DuckDB
reproduces exactly (``scale = 10^6`` distinguishes ranks up to ~10^3 per
run, ample for top-k lists).

Scale shape: the input is a Dataset of ``(group..., doc, rank)`` rows —
one row per (query, run, retrieved doc). Fusion is one map (the integer
contribution) + one ``groupby(group, doc)`` over slim int rows; the
scale dimension is the number of queries × k, never the corpus.
``add_rank`` converts a sorted-and-limited top-k run (bounded rows by
construction) into explicit 1-based ranks via a single-block index —
documented as bounded by the run's own k.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def add_rank(run_ds, order_cols: list[str], descending: list[bool],
             *, rank_col: str = "rank"):
    """Attach 1-based ranks to an already-limited top-k run by sorting
    within one coalesced block on ``order_cols`` (row order through
    ``repartition`` is not a Ray contract, so the rank order is
    re-established explicitly). Valid only because a top-k run is
    bounded by its own k — never call on an unbounded dataset."""
    ds = run_ds.repartition(1)

    def index(batch: pa.Table) -> pa.Table:
        keys = []
        for c, d in zip(reversed(order_cols), reversed(descending)):
            v = batch[c].to_numpy(zero_copy_only=False)
            keys.append(-v if d else v)
        order = np.lexsort(keys)
        return batch.take(pa.array(order)).append_column(
            rank_col,
            pa.array(np.arange(1, batch.num_rows + 1, dtype=np.int64)))

    return ds.map_batches(index, batch_format="pyarrow", batch_size=None)


def rrf_fuse(runs_ds, *, id_col: str = "doc_id",
             rank_col: str = "rank",
             group_cols: tuple = (),
             k_const: int = 60, scale: int = 10**6):
    """Dataset of per-run rows ``(group..., id, rank)`` → fused Dataset
    ``(group..., id, rrf_q6, n_runs, best_rank)`` where ``rrf_q6`` is
    the integer-exact RRF sum, ``n_runs`` how many lists retrieved the
    doc, ``best_rank`` its best per-run rank."""
    from ray.data.aggregate import Count, Min, Sum

    def contrib(batch: pa.Table) -> pa.Table:
        r = batch[rank_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if (r < 1).any():
            raise ValueError("rrf_fuse: ranks must be 1-based")
        cols = {c: batch[c] for c in (*group_cols, id_col)}
        cols["c"] = pa.array(scale // (k_const + r))
        cols["r"] = pa.array(r)
        return pa.table(cols)

    return (runs_ds.map_batches(contrib, batch_format="pyarrow")
            .groupby([*group_cols, id_col])
            .aggregate(Sum("c", alias_name="rrf_q6"),
                       Count(alias_name="n_runs"),
                       Min("r", alias_name="best_rank")))
