"""Shared graph-op helpers: vectorized dense re-keying.

Replaces the per-edge ``dict.map`` re-key (a Python-object hash per
endpoint — the hot spot in the broadcast graph paths at 10^6+ edges)
with ``np.searchsorted`` over the sorted node-id array: O(log n)
branch-free per endpoint, no ``to_pylist`` materialization, and the
broadcast payload is one int64 array instead of a Python dict."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def dense_rekey(edges, sorted_nodes: np.ndarray,
                out_cols: tuple[str, str] = ("s", "d"),
                in_cols: tuple[str, str] = ("src", "dst")):
    """Edge Dataset (``in_cols``) → Dataset with both endpoints replaced
    by their index in ``sorted_nodes`` (which MUST be sorted and cover
    every endpoint). One streaming map; the node array ships once via
    the object store."""
    ref = ray.put(np.ascontiguousarray(sorted_nodes, dtype=np.int64))
    a, b = out_cols
    ia, ib = in_cols

    def rekey(batch: pa.Table) -> pa.Table:
        nodes = ray.get(ref)
        src = batch[ia].to_numpy(zero_copy_only=False)
        dst = batch[ib].to_numpy(zero_copy_only=False)
        return pa.table({
            a: pa.array(np.searchsorted(nodes, src).astype(np.int32)),
            b: pa.array(np.searchsorted(nodes, dst).astype(np.int32)),
        })

    return edges.map_batches(rekey, batch_format="pyarrow",
                             batch_size=None).materialize()


def sorted_node_array(nodes_ds) -> np.ndarray:
    """Node Dataset (node) → sorted int64 id array on the driver
    (broadcast-path use only — caller enforces the size threshold)."""
    parts = [t["node"].to_numpy(zero_copy_only=False)
             for t in collect_tables(nodes_ds)]
    if not parts:
        return np.array([], dtype=np.int64)
    return np.sort(np.concatenate(parts).astype(np.int64))


def collect_tables(ds) -> "list[pa.Table]":
    """Driver-side collect of a SMALL Dataset as raw Arrow blocks.

    ``iter_batches`` spins up the streaming executor + prefetch
    machinery and pays a multi-second fixed cost per consumption in
    this Ray version; for the KB-scale partials the iterative graph
    ops fold every round, ``materialize() → to_arrow_refs() →
    ray.get`` is ~25× cheaper and returns the same tables. Callers
    guarantee the dataset is small (bounded partials, not data)."""
    tabs = ray.get(ds.materialize().to_arrow_refs())
    out = []
    for t in tabs:
        if not isinstance(t, pa.Table):  # pandas-block datasets
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows:
            out.append(t)
    return out


def int_lut(map_ds, key: str, val: str):
    """Small (key, val) int Dataset → (sorted_keys, vals) int64 arrays
    on the driver, for broadcast LUT lookups via ``np.searchsorted``
    (callers enforce the broadcast↔join size threshold)."""
    ks, vs = [], []
    for t in collect_tables(map_ds):
        ks.append(t[key].to_numpy(zero_copy_only=False).astype(np.int64))
        vs.append(t[val].to_numpy(zero_copy_only=False).astype(np.int64))
    if not ks:
        e = np.array([], dtype=np.int64)
        return e, e
    k = np.concatenate(ks)
    v = np.concatenate(vs)
    order = np.argsort(k)
    return k[order], v[order]


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _hash_col(col) -> np.ndarray:
    kv = col.to_numpy(zero_copy_only=False)
    if kv.dtype.kind in "iu":
        return (kv.astype(np.uint64) * _GOLD) >> np.uint64(33)
    import pandas as pd

    return pd.util.hash_array(
        np.asarray(col.to_pylist(), dtype=object)).astype(np.uint64)


def append_key_shard(t: pa.Table, key, n: int,
                     col: str = "_kshard") -> pa.Table:
    """Append an int32 uniform hash-shard column over ``key`` (one
    column name or a list — composite keys mix per-column hashes)."""
    if isinstance(key, (list, tuple)):
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for k in key:
            h = (h * _GOLD) ^ _hash_col(t[k])
    else:
        h = _hash_col(t[key])
    return t.append_column(
        col, pa.array((h % np.uint64(n)).astype(np.int32)))


def default_n_shards(mult: int = 2) -> int:
    return max(16, int(ray.cluster_resources().get("CPU", 8)) * mult)


def group_by_key_shards(ds, key, fn, *, n_shards: int | None = None):
    """``groupby(hash-shard of key)`` replacing ``groupby(key)`` for
    per-key UDFs that already vectorize ACROSS keys (pandas
    ``groupby(key)`` internals): one ``map_groups`` call per SHARD
    instead of one scheduler round-trip per key (150k tiny groups ≈
    200 s measured, stages/basket.py). ``fn`` takes the shard's rows as
    a pandas DataFrame (every key fully co-located) and returns a
    DataFrame; blocks entering and leaving the exchange are Arrow (the
    pandas-block groupby tax is ~25x). String keys hash via pandas'
    stable hash; int keys via the golden-ratio mix. ``key`` may be a
    list of columns — composite keys hash their joined string form."""
    import pandas as pd

    n = n_shards or max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)

    def add_shard(t: pa.Table) -> pa.Table:
        return append_key_shard(t, key, n)

    def run_shard(g: pd.DataFrame) -> pa.Table:
        out = fn(g.drop(columns=["_kshard"]))
        return pa.Table.from_pandas(out, preserve_index=False)

    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("_kshard")
            .map_groups(run_shard, batch_format="pandas"))
