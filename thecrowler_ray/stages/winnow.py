"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm, public method) and the shared-fingerprint pair matrix.

The guarantee the other dedup operators don't give: any shared
substring of at least ``w + k − 1`` tokens between two documents is
DETECTED (some fingerprint of it is selected in both), while only
~``2/(w+1)`` of all k-gram hashes are kept — position-aware local
plagiarism/quotation detection, vs MinHash's global set resemblance.

Semantics (pinned by the twin): token k-grams (the ``q_dup_ngrams``
tokenization: lowercase whitespace split) are hashed to the FIRST 16
hex chars of md5 of the space-joined gram — a fixed-width lowercase
hex STRING, so string order == uint64 order on both sides. Every
window of ``w`` consecutive gram hashes selects its minimum; ties
select the RIGHTMOST minimal position (the paper's simple winnowing —
no cross-window state, so it is a pure per-window function SQL can
replay). A doc's fingerprint set is the DISTINCT selected (pos, hash)
pairs. Docs shorter than k tokens have one padded gram (the MinHash
padding convention) and fingerprint it.

Distribution: fingerprints are computed per doc inside one
``map_batches`` (heavy text read once, never shuffled); the pair
matrix groups slim (hash, doc, pos-count) rows by hash — hash groups
are natural-collision-sized. A ``max_docs_per_hash`` cap drops
boilerplate fingerprints shared by more docs than the cap (quadratic
pair fan-out; standard MOSS practice — capped hashes are LOGGED).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _doc_fingerprints(text: str | None, k: int, w: int):
    """→ sorted distinct (pos, hash16) selected by simple winnowing."""
    toks = (text or "").lower().split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    grams = [" ".join(toks[i:i + k])
             for i in range(len(toks) - k + 1)]
    # numpy min-reduce needs ints: hex16 <-> uint64 is order-preserving
    h = np.array([int(hashlib.md5(g.encode()).hexdigest()[:16], 16)
                  for g in grams], dtype=np.uint64)
    n = len(h)
    if n <= w:
        m = h.min()
        pos = int(np.max(np.nonzero(h == m)[0]))
        return [(pos, format(int(m), "016x"))]
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    mins = win.min(axis=1)
    # rightmost minimal position inside each window
    rev_eq = win[:, ::-1] == mins[:, None]
    right = (w - 1) - rev_eq.argmax(axis=1)
    pos = np.arange(n - w + 1) + right
    sel = sorted({(int(p), format(int(h[p]), "016x")) for p in pos})
    return sel


class WinnowStage:
    """map_batches: (id, text) → exploded (id, pos, fp) fingerprint
    rows. Stateless besides the (k, w) config — a plain callable."""

    def __init__(self, *, k: int = 5, w: int = 4,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.k, self.w = k, w
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, poss, fps = [], [], []
        for did, text in zip(batch[self.id_col].to_pylist(),
                             batch[self.text_col].to_pylist()):
            for p, f in _doc_fingerprints(text, self.k, self.w):
                ids.append(did)
                poss.append(p)
                fps.append(f)
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "pos": pa.array(poss, pa.int64()),
            "fp": pa.array(fps, pa.string())})


def winnow_fingerprints(ds, *, k: int = 5, w: int = 4,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> "ray.data.Dataset":
    """→ Dataset (id, pos, fp): each doc's winnowing fingerprints."""
    return ds.select_columns([id_col, text_col]).map_batches(
        WinnowStage(k=k, w=w, id_col=id_col, text_col=text_col),
        batch_format="pyarrow")


def winnow_pairs(
    ds,
    *,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_docs_per_hash: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """→ Dataset (doc_a, doc_b, shared): pairs sharing ≥ ``min_shared``
    DISTINCT fingerprint hashes, ordered (shared DESC, doc_a, doc_b).
    Only slim (fp, doc) rows shuffle — one groupby(fp) for the pair
    explosion, one groupby(pair) count."""
    from ray.data.aggregate import Sum

    def distinct_per_doc(batch: pa.Table) -> pa.Table:
        # per-doc DISTINCT hash set straight off the text — each doc is
        # processed exactly once, so no cross-batch dup risk
        ids, fps = [], []
        for did, text in zip(batch[id_col].to_pylist(),
                             batch[text_col].to_pylist()):
            for f in sorted({f for _, f in
                             _doc_fingerprints(text, k, w)}):
                ids.append(did)
                fps.append(f)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "fp": pa.array(fps, pa.string())})

    slim = ds.select_columns([id_col, text_col]).map_batches(
        distinct_per_doc, batch_format="pyarrow")

    def _empty_pairs() -> pa.Table:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})

    import ray as _ray

    n_shards = max(16, int(_ray.cluster_resources().get("CPU", 8)) * 4)

    def add_shard(batch: pa.Table) -> pa.Table:
        fps = batch["fp"].to_pylist()
        sh = np.fromiter(
            ((int(v[:8], 16) * 0x9E3779B9) % n_shards for v in fps),
            dtype=np.int64, count=len(fps))
        return batch.append_column("shard", pa.array(sh))

    def shard_pairs(g: pa.Table) -> pa.Table:
        # one vectorized run-length pair explosion per SHARD of
        # fingerprint hashes — one map_groups call per fp is a scheduler
        # round-trip per natural collision group (the stages/basket.py
        # measurement: 150k tiny groups ≈ 200 s); arrow in/out (pandas
        # blocks tax the downstream pair groupby ~25x)
        import pandas as pd

        from .basket import _dedup_sorted, _pair_explode

        codes = pd.factorize(pd.Series(g["fp"].to_pylist()))[0]
        doc = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b, v = _dedup_sorted(codes.astype(np.int64), doc)
        if len(b) == 0:
            return _empty_pairs()
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        ends = np.r_[starts[1:], len(b)]
        sizes = ends - starts
        big = sizes > max_docs_per_hash
        if big.any():
            print(f"winnow_pairs: {int(big.sum())} boilerplate "
                  f"fingerprints capped (> {max_docs_per_hash} docs) "
                  "— their pairs are dropped")
            keep = ~np.repeat(big, sizes)
            b, v = b[keep], v[keep]
        x, y = _pair_explode(b, v)
        if len(x) == 0:
            return _empty_pairs()
        u, cnt = np.unique(np.stack([x, y], axis=1), axis=0,
                           return_counts=True)
        return pa.table({"doc_a": pa.array(u[:, 0]),
                         "doc_b": pa.array(u[:, 1]),
                         "c": pa.array(cnt.astype(np.int64))})

    return (slim.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(shard_pairs, batch_format="pyarrow")
            .groupby(["doc_a", "doc_b"])
            .aggregate(Sum("c", alias_name="shared"))
            .filter(lambda r: r["shared"] >= min_shared)
            .sort(["shared", "doc_a", "doc_b"],
                  descending=[True, False, False]))
