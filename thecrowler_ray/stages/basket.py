"""Market-basket pair mining (frequent itemsets at size 2) — support
counts for item pairs co-occurring in a basket: co-ordered parts,
co-cited links, keywords co-occurring in a page. The canonical
association-mining primitive (Agrawal & Srikant 1994's Apriori at
k = 2, which is the only level that survives web scale without
candidate pruning).

Semantics (pinned by the self-join twin): items dedupe within a
basket; a pair is the unordered (x < y) combination; support = number
of baskets containing both; output the top-k by
(support DESC, x ASC, y ASC).

Scale note: pair explosion is quadratic in basket SIZE, not corpus
size — per-basket cost caps at |basket|²/2 inside the one
``groupby(basket)``; the pair stream then collapses through a slim
(x, y) count groupby. Skewed giant baskets want a basket-size cap
upstream (same reasoning as the O(√E) wedge bound in
``ops/triangles.py``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _pair_explode(b: np.ndarray, v: np.ndarray):
    """(basket, item) rows SORTED by (b, v) with per-basket-distinct
    items → all unordered in-basket pairs (x < y), fully vectorized —
    no per-basket Python/pandas call (that idiom costs one scheduler
    round-trip per basket: 150k baskets ≈ 200 s; this is one numpy
    pass per SHARD)."""
    n = len(b)
    if n == 0:
        e = np.array([], dtype=np.int64)
        return e, e
    starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
    ends = np.r_[starts[1:], n]
    run_end = np.repeat(ends, ends - starts)       # end of own run
    pos = np.arange(n)
    reps = run_end - pos - 1                        # pairs led by pos
    total = int(reps.sum())
    if total == 0:
        e = np.array([], dtype=np.int64)
        return e, e
    x = np.repeat(v, reps)
    out_start = np.cumsum(reps) - reps
    y_idx = (np.arange(total) - np.repeat(out_start, reps)
             + np.repeat(pos + 1, reps))
    return x, v[y_idx]


def _dedup_sorted(b: np.ndarray, v: np.ndarray):
    """Sort rows by (b, v) and drop duplicate (b, v) pairs."""
    order = np.lexsort((v, b))
    b, v = b[order], v[order]
    keep = np.r_[True, (b[1:] != b[:-1]) | (v[1:] != v[:-1])]
    return b[keep], v[keep]


def _with_shard(ds, basket: str, item: str, n_shards: int):
    import pyarrow as pa

    def add(batch: pa.Table) -> pa.Table:
        bk = batch[basket].to_numpy(zero_copy_only=False).astype(
            np.uint64)
        sh = ((bk * _GOLDEN) >> np.uint64(33)) % np.uint64(n_shards)
        return pa.table({
            basket: batch[basket], item: batch[item],
            "shard": pa.array(sh.astype(np.int64))})

    return ds.map_batches(add, batch_format="pyarrow")


def _n_shards() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(16, cpus * 4)


def cooccur_pair_counts(
    ds,
    *,
    basket: str,
    item: str,
    n_shards: int | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (x, y, c): per-shard-combined support partials for
    every unordered in-basket item pair (callers groupby-sum). ONE
    basket-hash-shard groupby; each shard's pair explosion is one
    vectorized numpy pass."""
    n_shards = n_shards or _n_shards()

    import pyarrow as pa

    def shard_pairs(g: pa.Table) -> pa.Table:
        # arrow in, arrow out: Ray's sort/aggregate over pandas blocks
        # is ~25x slower (measured: 229 s vs 8.7 s for the downstream
        # 1.2M-row groupby at sf0.1) — keep the hot path Arrow
        b = g[basket].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g[item].to_numpy(zero_copy_only=False).astype(np.int64)
        b, v = _dedup_sorted(b, v)
        x, y = _pair_explode(b, v)
        if len(x) == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        u, cnt = np.unique(np.stack([x, y], axis=1), axis=0,
                           return_counts=True)
        return pa.table({"x": pa.array(u[:, 0]),
                         "y": pa.array(u[:, 1]),
                         "c": pa.array(cnt.astype(np.int64))})

    return (_with_shard(ds.select_columns([basket, item]), basket,
                        item, n_shards)
            .groupby("shard")
            .map_groups(shard_pairs, batch_format="pyarrow"))


def cooccur_edges(
    ds,
    *,
    basket: str,
    item: str,
    out_cols: tuple[str, str] = ("x", "y"),
    n_shards: int | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (x, y): shard-distinct unordered co-occurrence pairs
    (the edge-list form — callers dedupe globally; the graph ops'
    canonicalization does that anyway)."""
    import pyarrow as pa

    a, b_ = out_cols
    pc_ds = cooccur_pair_counts(ds, basket=basket, item=item,
                                n_shards=n_shards)
    return pc_ds.map_batches(
        lambda t: pa.table({a: t["x"], b_: t["y"]}),
        batch_format="pyarrow")


def pair_support(
    ds,
    *,
    basket: str,
    item: str,
    k: int = 100,
    packed: bool = True,
) -> "ray.data.Dataset":
    """Dataset with int64 ``basket``/``item`` → Dataset (x, y, support)
    — the k most-supported unordered item pairs.

    ``packed=True`` (default) runs the global count groupby on ONE
    int64 key (x << 32 | y) instead of the (x, y) pair — Ray's
    sort-based aggregate on a single int column is markedly faster
    than the two-column key and the exchange ships one column, not
    two. Packing requires the smaller pair member in [0, 2^31) (it
    rides the signed high 32 bits) and the larger in [0, 2^32);
    out-of-range ids RAISE with instructions (no silent wraparound) —
    pass ``packed=False`` for the two-column groupby then. The plan is
    lazy, so the range check must live in-task; auto-fallback would
    need an extra eager max() scan over the input."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    partials = cooccur_pair_counts(ds, basket=basket, item=item)

    if not packed:
        return (partials
                .groupby(["x", "y"]).aggregate(Sum("c",
                                                   alias_name="support"))
                .sort(["support", "x", "y"],
                      descending=[True, False, False])
                .limit(k))

    def pack(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        # x rides the HIGH 32 bits of a SIGNED int64, so x must stay
        # below 2^31 (x in [2^31, 2^32) would shift into the sign bit
        # and wrap negative); y only needs to fit the low 32 bits
        if len(x) and (int(x.max()) >= 1 << 31 or int(y.max()) >= 1 << 32
                       or int(x.min()) < 0 or int(y.min()) < 0):
            raise ValueError(
                "pair_support(packed=True) needs x ids in [0, 2^31) and "
                "y ids in [0, 2^32); got out-of-range ids - call with "
                "packed=False")
        return pa.table({"xy": pa.array((x << np.int64(32)) | y),
                         "c": t["c"]})

    def unpack(t: pa.Table) -> pa.Table:
        xy = t["xy"].to_numpy(zero_copy_only=False)
        return pa.table({"x": pa.array(xy >> np.int64(32)),
                         "y": pa.array(xy & np.int64(0xFFFFFFFF)),
                         "support": t["support"]})

    return (partials.map_batches(pack, batch_format="pyarrow")
            .groupby("xy").aggregate(Sum("c", alias_name="support"))
            .map_batches(unpack, batch_format="pyarrow")
            .sort(["support", "x", "y"],
                  descending=[True, False, False])
            .limit(k))
