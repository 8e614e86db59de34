"""Deterministic global shuffle + split assignment for training data.

A training run needs (a) a reproducible global permutation of the corpus
(epoch shuffles that are stable across restarts and verifiable) and (b) a
stable train/val/test assignment that never leaks rows between splits as
the corpus grows. Both are salted-hash constructions — the same
"md5 as a portable total order" trick the engine already uses for
stratified sampling and mixture allocation, so DuckDB can replay every
byte of it.

Position assignment is the two-level scan from ``ops/prefix.py``
specialised to a *uniform* key: the shuffle key is the first 60 bits of
``md5(seed:id)``, so equal-width key ranges are balanced buckets by
construction (no min/max pass, no skew) —

1. a per-batch combiner reduces each batch to ≤``n_buckets``
   ``(bucket, count)`` rows; one KB-scale ``groupby`` lands bucket totals
   on the driver, which scans them into exclusive offsets;
2. one ``groupby(bucket)`` shuffle co-locates each key range;
   the in-group sort by ``(md5_hex, id)`` (hex order == numeric order for
   equal-length lowercase hex) adds ``offset + arange``.

Rows-moved: the table once (inherent to any global permutation) plus KB
of bucket totals. ``n_buckets`` is the scale knob — size so
rows / n_buckets fits a worker.

Split assignment is stateless per row: ``md5(seed-split:id) mod 100``
against cumulative percentage thresholds, so membership is a pure
function of (seed, id) — growing the corpus never reshuffles existing
rows' splits (the property hash-splits are chosen for in the public
data-pipeline literature).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

_KEY_BITS = 60  # 15 hex digits → fits int64


def _shuffle_hex(ids: list, seed: str) -> list[str]:
    return [
        hashlib.md5(f"{seed}:{i}".encode()).hexdigest() for i in ids
    ]


def _split_pct(ids: list, seed: str) -> np.ndarray:
    return np.asarray(
        [
            int(hashlib.md5(f"{seed}-split:{i}".encode()).hexdigest()[:8], 16)
            % 100
            for i in ids
        ],
        dtype=np.int64,
    )


def global_shuffle_split(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    seed: str = "s0",
    n_buckets: int = 64,
    splits: tuple[tuple[str, int], ...] = (
        ("train", 80),
        ("val", 10),
        ("test", 10),
    ),
) -> "ray.data.Dataset":
    """→ the input columns + (shuffle_key, pos, split): a reproducible
    global permutation position and a stable hash split per row. Extra
    input columns ride through the one placement groupby (callers pass
    slim rows — never the text). ``id_col`` must be unique (it is the
    tie-break and the hash input)."""
    if sum(p for _, p in splits) != 100:
        raise ValueError("split percentages must sum to 100")
    width = ((1 << _KEY_BITS) + n_buckets - 1) // n_buckets

    def bucket_counts(t: pa.Table) -> pa.Table:
        hx = _shuffle_hex(t[id_col].to_pylist(), seed)
        b = np.asarray([int(h[:15], 16) // width for h in hx], dtype=np.int64)
        vals, cnts = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(vals),
                         "n": pa.array(cnts.astype(np.int64))})

    totals = (
        ds.map_batches(bucket_counts, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n"))
        .take_all()
    )
    offsets = np.zeros(n_buckets, dtype=np.int64)
    for row in totals:
        offsets[row["bucket"]] = row["sum(n)"]
    offsets = np.concatenate([[0], np.cumsum(offsets)[:-1]])

    # cumulative split thresholds: pct < t1 → s1, < t2 → s2, ...
    names = [s for s, _ in splits]
    bounds = np.cumsum([p for _, p in splits])

    def attach(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        hx = _shuffle_hex(ids, seed)
        b = np.asarray([int(h[:15], 16) // width for h in hx], dtype=np.int64)
        pct = _split_pct(ids, seed)
        codes = np.searchsorted(bounds, pct, side="right")
        split = [names[c] for c in codes]
        # carry every input column through the placement
        return (t.append_column("shuffle_key", pa.array(hx, pa.string()))
                .append_column("__bucket", pa.array(b))
                .append_column("split", pa.array(split, pa.string())))

    def rank_group(g: pa.Table) -> pa.Table:
        # id_col may be a string column — pc.sort_indices handles any type
        idx = pc.sort_indices(
            g, sort_keys=[("shuffle_key", "ascending"),
                          (id_col, "ascending")])
        g = g.take(idx)
        base = int(offsets[int(g["__bucket"][0].as_py())])
        g = g.drop_columns(["__bucket"])
        return g.append_column(
            "pos", pa.array(np.arange(base, base + g.num_rows,
                                      dtype=np.int64)))

    return (
        ds.map_batches(attach, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(rank_group, batch_format="pyarrow")
    )
