"""Distributed deterministic sampling: bottom-k (hash-order) sample.

A uniform sample that is *stable* across runs, partitionings and cluster
sizes: keep the k rows whose md5-high-64 key hash is smallest (the classic
bottom-k / KMV construction). Properties that matter at 100 TB:

- per-batch partial bottom-k (no shuffle), driver merge of k-row partials —
  the same streaming-top-k shape as ``stages/similarity._PartialTopK``;
- mergeable and idempotent: union of partial samples → bottom-k of the
  union, so incremental/resumed runs agree with one-shot runs;
- deterministic → SQL-checkable: the oracle is literally
  ``ORDER BY md5(key) LIMIT k``;
- the k-th smallest hash doubles as a KMV cardinality estimator
  (``kmv_estimate``): n ≈ (k-1) / h_(k) with hashes scaled to (0,1).

The reference has no sampling operator (its pipelines are exhaustive); a
training-data engine needs one for eval splits and cheap corpus statistics.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _key_hash64(values) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.md5(str(v).encode("utf-8")).digest()[:8], "big"
        )
    return out


class _PartialBottomK:
    """map_batches fn: batch → its k smallest-hash rows (+ hash column)."""

    def __init__(self, key_col: str, k: int):
        self.key_col = key_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = _key_hash64(batch[self.key_col].to_pylist())
        k = min(self.k, len(h))
        idx = np.argpartition(h, k - 1)[:k] if k < len(h) else np.arange(len(h))
        keep = np.sort(idx)
        out = batch.take(pa.array(keep))
        return out.append_column("sample_hash", pa.array(h[keep]))


def bottom_k_sample(ds, key_col: str, k: int) -> pd.DataFrame:
    """Dataset → the k rows with globally smallest md5(key) hashes, sorted
    by hash. Only k rows per batch reach the driver."""
    parts = ds.map_batches(
        _PartialBottomK, fn_constructor_args=(key_col, k),
        batch_format="pyarrow", concurrency=2,
    ).to_pandas()
    parts["sample_hash"] = parts["sample_hash"].astype(np.uint64)
    out = parts.nsmallest(k, "sample_hash", keep="all").sort_values(
        "sample_hash", kind="mergesort"
    )
    return out.head(k).reset_index(drop=True)


def kmv_estimate(sample: pd.DataFrame, k: int) -> float:
    """KMV distinct-count estimate from a bottom-k sample over DISTINCT
    keys: n ≈ (k-1) / h_(k) with h scaled into (0,1)."""
    if len(sample) < k:
        return float(len(sample))  # saw everything
    hk = float(sample["sample_hash"].iloc[k - 1]) / float(2**64)
    return (k - 1) / hk


def _aes_keys_q6(ids, weights: np.ndarray) -> np.ndarray:
    """A-ES sampling keys, fixed-point: floor((ln(u)/w) * 1e6) as int64
    with u = (md5-high-53-bits(id) + 1) / 2^53 ∈ (0, 1]. Matches the SQL
    twin's expression exactly (same double tree, same libm ln)."""
    h = _key_hash64(ids)
    u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
    return np.floor((np.log(u) / weights) * 1e6).astype(np.int64)


class _PartialWeightedTopK:
    """map_batches fn: batch → its k largest-key rows (A-ES partial)."""

    def __init__(self, key_col: str, weight_col: str, k: int):
        self.key_col = key_col
        self.weight_col = weight_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch[self.weight_col].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        pos = w > 0  # zero/negative weights are never sampled
        batch = batch.filter(pa.array(pos))
        if batch.num_rows == 0:
            return batch.append_column(
                "sample_key_q6", pa.array([], pa.int64())
            )
        keys = _aes_keys_q6(batch[self.key_col].to_pylist(), w[pos])
        out = batch.append_column("sample_key_q6", pa.array(keys))
        if out.num_rows > self.k:
            # same comparator as the global merge (key DESC, id ASC) so
            # boundary ties resolve identically in partial and global
            order = pa.compute.sort_indices(
                out,
                sort_keys=[("sample_key_q6", "descending"),
                           (self.key_col, "ascending")],
            )
            out = out.take(order.slice(0, self.k))
        return out


def weighted_sample(ds, key_col: str, weight_col: str, k: int
                    ) -> pd.DataFrame:
    """Weighted sample without replacement (Efraimidis & Spirakis 2006
    A-ES, public algorithm): keep the k rows with the largest
    ``ln(u)/w`` keys, u a deterministic hash-uniform of the row key —
    inclusion probability rises with weight, yet the sample is a pure
    function of (ids, weights): stable across runs, partitionings and
    cluster sizes, and mergeable (top-k of unions == union of partial
    top-ks). Only k rows per batch reach the driver. Ties break by the
    fixed-point key then row order from the deterministic global sort
    downstream (callers sort by (sample_key_q6 DESC, key ASC))."""
    parts = ds.map_batches(
        _PartialWeightedTopK, fn_constructor_args=(key_col, weight_col, k),
        batch_format="pyarrow", concurrency=2,
    ).to_pandas()
    out = parts.sort_values(
        ["sample_key_q6", key_col], ascending=[False, True],
        kind="mergesort",
    ).head(k).reset_index(drop=True)
    out["sample_key_q6"] = out["sample_key_q6"].astype("int64")
    return out
