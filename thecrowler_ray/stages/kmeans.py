"""Distributed Lloyd k-means (Lloyd 1982) over an embedding column —
the clustering primitive behind corpus bucketing, diversity-aware
sampling quotas, and SemDeDup-style per-cluster near-dup sweeps
(Abbas et al. 2023 run exactly this: k-means then within-cluster
cosine pruning). The existing IVF path (``stages/similarity.py``)
trains on a bounded driver sample; THIS is the full-data trainer —
every iteration is one streaming pass over all vectors.

**Integer fixed-point, the ``stages/centroid.py`` contract**: vectors
quantize once to ``xq = floor(x·10^4 + 0.5)`` (int64); a centroid
component is ``cq = (Σ xq · 10^4) // count`` — TRUNCATING division
(numpy trunc-div via sign trick matches DuckDB ``//``); distances are
``Σ_dims (xq·10^4 − cq)²`` in int64; assignment is argmin by
(dist ASC, cluster ASC). Every iteration is therefore bit-replayable
in SQL with chained CTEs. (Headroom: |x| ≤ 10², dims ≤ 10³ keep the
distance < 2^63.)

Distribution shape (zero shuffles per iteration):

- init: cluster c's centroid is the vector of the c-th smallest vec_id
  (deterministic; per-batch partial-head k then a ≤ k·blocks driver
  merge — no sort of the full table);
- assign+update in ONE ``map_batches`` pass: each batch scatters its
  vectors' xq sums into a (k × dims) int64 partial + a k-vector of
  counts; the driver folds the tiny partials (k·dims ints each) and
  re-broadcasts the k×dims centroid matrix via ``ray.put``. Empty
  clusters keep their previous centroid.

At 10^9 vectors the per-iteration traffic is blocks × k × dims ints —
KB-scale — and the vectors themselves never move.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

SCALE = 10**4


def _quantize(mat: np.ndarray) -> np.ndarray:
    return np.floor(mat.astype(np.float64) * SCALE + 0.5).astype(np.int64)


def _trunc_div(a: np.ndarray, b) -> np.ndarray:
    """Truncating integer division (toward zero) — DuckDB ``//``
    semantics; numpy's ``//`` floors."""
    q = np.abs(a) // np.abs(b)
    return np.where(np.sign(a) * np.sign(b) < 0, -q, q)


def kmeans_assign(
    ds,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 3,
) -> "ray.data.Dataset":
    """Dataset with int64 ``id_col`` + list<float> ``vec_col`` →
    Dataset (vec_id, cluster, dist_q): the final Lloyd assignment after
    ``iterations`` rounds from the deterministic k-smallest-id init."""
    slim = ds.select_columns([id_col, vec_col]).materialize()

    # --- init: embeddings of the k smallest ids (partial-head merge)
    def head_k(batch: pa.Table) -> pa.Table:
        df = batch.select([id_col, vec_col]).to_pandas()
        return pa.Table.from_pandas(
            df.nsmallest(k, id_col), preserve_index=False)

    from ..ops.gutil import collect_tables

    parts = [t.to_pandas() for t in
             collect_tables(slim.map_batches(head_k,
                                             batch_format="pyarrow"))]
    cand = (pd.concat(parts, ignore_index=True)
            .nsmallest(k, id_col).sort_values(id_col)
            if parts else pd.DataFrame(columns=[id_col, vec_col]))
    if len(cand) == 0:
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "dist_q": pa.array([], pa.int64())}))
    cents = _quantize(np.stack(cand[vec_col].to_numpy())) * SCALE
    kk, dims = cents.shape  # kk ≤ k when the table is tiny

    def batch_xq(batch: pa.Table) -> np.ndarray:
        mat = np.stack(batch[vec_col].to_pandas().to_numpy())
        return _quantize(mat)

    def assign(xq: np.ndarray, c: np.ndarray) -> np.ndarray:
        # (n, kk) int64 distance matrix; argmin ties → lowest cluster
        # (np.argmin returns the first minimum — cluster ASC). Chunk
        # rows so the intermediate stays small.
        d = ((xq[:, None, :] * SCALE - c[None, :, :]) ** 2).sum(axis=2)
        return d

    # --- Lloyd rounds: one streaming pass each, KB partials
    for _ in range(iterations):
        ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            xq = batch_xq(batch)
            d = assign(xq, c)
            a = d.argmin(axis=1)
            sums = np.zeros((len(c), xq.shape[1]), dtype=np.int64)
            np.add.at(sums, a, xq)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(len(c), dtype=np.int64)),
                "cnt": pa.array(counts),
                "sums": pa.array(list(sums)),
            })

        tot_sum = np.zeros((kk, dims), dtype=np.int64)
        tot_cnt = np.zeros(kk, dtype=np.int64)
        for b in collect_tables(slim.map_batches(
            partial, batch_format="pyarrow"
        )):
            # iter_batches may coalesce several partial tables into one
            # batch, so cluster ids repeat — np.add.at, never
            # fancy-index += (which silently drops duplicates)
            cl = b["cluster"].to_numpy(zero_copy_only=False)
            np.add.at(tot_cnt, cl,
                      b["cnt"].to_numpy(zero_copy_only=False))
            np.add.at(tot_sum, cl,
                      np.stack(b["sums"].to_pandas().to_numpy()))
        new = cents.copy()
        nz = tot_cnt > 0
        new[nz] = _trunc_div(tot_sum[nz] * SCALE,
                             tot_cnt[nz][:, None])
        cents = new

    # --- final assignment
    ref = ray.put(cents)

    def final(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        xq = batch_xq(batch)
        d = assign(xq, c)
        a = d.argmin(axis=1)
        return pa.table({
            "vec_id": batch[id_col],
            "cluster": pa.array(a.astype(np.int64)),
            "dist_q": pa.array(d[np.arange(len(a)), a]),
        })

    return slim.map_batches(final, batch_format="pyarrow")
