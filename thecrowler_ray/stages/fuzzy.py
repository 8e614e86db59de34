"""Edit-distance near-duplicate pairs with prefix blocking — the
record-linkage / fuzzy-matching primitive (Levenshtein 1966; blocking
per the standard Fellegi-Sunter practice): catches near-dups that
differ by a few CHARACTER edits, which the token-level MinHash /
SimHash family is blind to (a one-character typo changes whole
shingles).

Semantics (pinned by the ``levenshtein()`` twin):

- compare key = the first ``prefix_len`` chars of the lowercased text.
- candidate pairs share the first ``block_len`` chars of that key
  (prefix blocking — the documented recall tradeoff: an edit inside
  the block prefix hides the pair; standard practice, stated, and the
  twin blocks identically so the pair SET matches exactly).
- keep pairs with full Levenshtein distance ≤ ``max_dist`` over the
  compare keys; output (doc_a, doc_b, dist), doc_a < doc_b, sorted
  (dist, doc_a, doc_b).
- blocks larger than ``max_block`` are LOGGED and skipped (quadratic
  fan-out guard — boilerplate prefixes).

Distribution: texts reduce to ≤ prefix_len-char keys in the first map
(heavy text never shuffles); blocks land on hash shards (one
``groupby`` of slim rows, no per-block scheduler round-trip); the
in-shard DP is banded O(L·max_dist) per pair with early abandon.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def levenshtein_banded(a: str, b: str, max_dist: int) -> int:
    """Banded Levenshtein with early abandon: returns the exact
    distance if ≤ max_dist, else max_dist + 1."""
    la, lb = len(a), len(b)
    if abs(la - lb) > max_dist:
        return max_dist + 1
    if la == 0:
        return lb
    if lb == 0:
        return la
    big = max_dist + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        lo = max(1, i - max_dist)
        hi = min(lb, i + max_dist)
        cur = [big] * (lb + 1)
        cur[0] = i if i <= max_dist else big
        ca = a[i - 1]
        row_min = cur[0] if lo == 1 else big
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if v > big:
                v = big
            cur[j] = v
            if v < row_min:
                row_min = v
        if row_min > max_dist:
            return big
        prev = cur
    return prev[lb] if prev[lb] <= max_dist else big


def edit_distance_pairs(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 60,
    block_len: int = 8,
    max_dist: int = 5,
    max_block: int = 500,
    n_shards: int | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (doc_a, doc_b, dist): blocked near-dup pairs with
    Levenshtein ≤ max_dist over lowercased ``prefix_len``-char keys."""
    if n_shards is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        n_shards = max(16, cpus * 4)

    import hashlib

    def keys(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        out_i, out_t, out_s = [], [], []
        for did, text in zip(ids, batch[text_col].to_pylist()):
            t = (text or "").lower()[:prefix_len]
            blk = t[:block_len]
            # md5, not hash(): Python string hashes are salted PER
            # PROCESS — a salted shard key would split one block
            # across shards in different workers and silently drop
            # pairs
            h = int(hashlib.md5(blk.encode()).hexdigest()[:16], 16)
            out_i.append(did)
            out_t.append(t)
            out_s.append(int(((np.uint64(h) * _GOLDEN)
                              >> np.uint64(33))
                             % np.uint64(n_shards)))
        return pa.table({
            id_col: pa.array(out_i, pa.int64()),
            "t": pa.array(out_t, pa.string()),
            "shard": pa.array(out_s, pa.int64())})

    def shard_pairs(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        df["blk"] = df["t"].str[:block_len]
        a_out, b_out, d_out = [], [], []
        for blk, gd in df.groupby("blk"):
            if len(gd) < 2:
                continue
            if len(gd) > max_block:
                print(f"edit_distance_pairs: block {blk!r} skipped "
                      f"({len(gd)} docs > {max_block}) — boilerplate "
                      "prefix")
                continue
            rows = sorted(zip(gd[id_col].astype(int), gd["t"]))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    d = levenshtein_banded(rows[i][1], rows[j][1],
                                           max_dist)
                    if d <= max_dist:
                        a_out.append(rows[i][0])
                        b_out.append(rows[j][0])
                        d_out.append(d)
        return pa.table({
            "doc_a": pa.array(a_out, pa.int64()),
            "doc_b": pa.array(b_out, pa.int64()),
            "dist": pa.array(d_out, pa.int64())})

    return (ds.select_columns([id_col, text_col])
            .map_batches(keys, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(shard_pairs, batch_format="pyarrow")
            .sort(["dist", "doc_a", "doc_b"]))
