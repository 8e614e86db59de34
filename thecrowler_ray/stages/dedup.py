"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference deduplicates page content by SHA-256 (WebObjects,
``pkg/crawler/crawler.go:1504-1543``) and URLs by normalized key; a 100 TB
training-data pipeline also needs near-dup families. All operators follow
the same scalable shape:

    map_batches (vectorized signature computation, no shuffle)
      → explode to (bucket_key, doc) rows
      → groupby(bucket_key)  ← the ONLY all-to-all, on small signature rows
      → per-group verification / representative selection

Signatures are computed once per doc; the heavy text never enters the
shuffle. Buckets are uniform hashes (no hot keys by construction).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# exact dedup (hash-partition + per-group first — SURVEY.md §2.7)
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, text_col: str = "text", out: str = "content_hash") -> pa.Table:
    texts = batch[text_col].to_pylist()
    hashes = [hashlib.sha256((t or "").encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column(out, pa.array(hashes, pa.string()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the smallest-id row per identical content hash (first-win like
    the reference's WebObjects upsert). → Dataset with ``content_hash``.

    Groups by hash SHARD, not by hash — one ``map_groups`` call per
    distinct hash costs a scheduler round-trip per unique doc (the
    stages/basket.py measurement: 150k groups ≈ 200 s); per shard the
    first-win is one vectorized sort + boundary mask."""
    import ray

    hashed = ds.map_batches(
        lambda t: add_content_hash(t, text_col), batch_format="pyarrow"
    )
    n_shards = max(16, int(ray.cluster_resources().get("CPU", 8)) * 4)

    def add_shard(batch: pa.Table) -> pa.Table:
        h = batch["content_hash"].to_pylist()
        sh = np.fromiter(
            ((int(v[:8], 16) * 0x9E3779B9) % n_shards for v in h),
            dtype=np.int64, count=len(h))
        return batch.append_column("hshard", pa.array(sh))

    def keep_first(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["content_hash", id_col],
                                       kind="mergesort")
        first = df["content_hash"].ne(df["content_hash"].shift())
        out = df[first].drop(columns=["hshard"])
        return pa.Table.from_pandas(out, preserve_index=False)

    return (hashed.map_batches(add_shard, batch_format="pyarrow")
            .groupby("hshard")
            .map_groups(keep_first, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# MinHash + LSH  (shingle → minhash → band → bucket groupby)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHashSignatures:
    """map_batches stage: text → H-perm MinHash signature (list<int64>).

    Word k-shingles hashed with md5-low-64; permutations are universal
    hashes a*x+b mod p (fixed seed → deterministic across runs/processes).
    """

    def __init__(self, num_perm: int = 128, shingle_k: int = 3, seed: int = 7,
                 text_col: str = "text"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col

    _TOKEN_P = np.uint64(1099511628211)  # FNV-ish multiplier

    def _shingles(self, text: str) -> np.ndarray:
        """Vectorized k-shingle hashes: per-token FNV-1a (cached per call),
        then a polynomial rolling combine over the k-window — no per-shingle
        md5 (≈10× faster; hash family change only affects which buckets
        collide, not semantics)."""
        toks = (text or "").lower().split()
        if len(toks) < self.k:
            toks = toks + [""] * (self.k - len(toks))
        # per-token 64-bit hashes (python hash is salted → use FNV-1a)
        cache: dict[str, int] = {}
        th = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            v = cache.get(t)
            if v is None:
                h = 0xCBF29CE484222325
                for b in t.encode("utf-8"):
                    h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                v = h
                cache[t] = v
            th[i] = v
        n = max(1, len(toks) - self.k + 1)
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(self.k):
            acc = acc * self._TOKEN_P + th[j : j + n]
        return (np.unique(acc) >> np.uint64(3)).astype(np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sh = self._shingles(text)
        # (H, S) universal hash then min over shingles — vectorized
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            self.signature(t).astype(np.int64).tolist()
            for t in batch[self.text_col].to_pylist()
        ]
        return batch.append_column("minhash", pa.array(sigs, pa.list_(pa.int64())))


_SHARD_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _shard_of(bucket_hash: np.ndarray, band: np.ndarray, num_shards: int) -> np.ndarray:
    """Uniform shard id from (bucket hash, band): multiply-mix then modulo.

    Sharding decorrelates the shuffle key from the raw bucket hash so each
    ``map_groups`` group holds ~``rows/num_shards`` rows regardless of bucket
    population — the scale knob: set ``num_shards`` ≈ 4× cluster cores at
    100 TB so no single task ever holds more than one shard of band rows.
    """
    mixed = (bucket_hash.astype(np.uint64) + np.uint64(0x51ED2701) * band.astype(np.uint64)) * _SHARD_MIX
    return ((mixed >> np.uint64(33)) % np.uint64(num_shards)).astype(np.int32)


def _hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount(a XOR b) over int64/uint64 arrays."""
    x = np.ascontiguousarray(a.astype(np.uint64) ^ b.astype(np.uint64))
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.unpackbits(x.view(np.uint8)).reshape(len(x), 64).sum(axis=1).astype(np.int64)


def _shard_bucket_pairs(g: pd.DataFrame, bucket_cols: list[str], id_col: str,
                        sim_col: str | None = None,
                        max_hamming: int | None = None,
                        max_bucket_rows: int | None = None) -> pd.DataFrame:
    """All (doc_a < doc_b) pairs sharing a bucket, within ONE hash shard.

    Only buckets with ≥2 rows are visited (duplicated-mask prefilter), so the
    Python loop runs over collision buckets only — rare by construction. When
    ``sim_col`` is given the 8-byte simhash rides along in the band rows and
    hamming is verified in-group (no driver-side lookup table — the round-1
    design built a doc_id→simhash dict from two full ``to_pandas()`` passes,
    which cannot exist at 10^10 docs).

    ``max_bucket_rows`` guards the degenerate corpus where one bucket holds
    a huge identical-content cluster (pair output is inherently O(c²) there
    — run exact dedup FIRST; that is the pipeline order the brief's dedup
    family implies). None = exact, the default for the oracle-checked
    queries."""
    id_dtype = g[id_col].dtype
    empty_cols = {"doc_a": pd.Series([], dtype=id_dtype),
                  "doc_b": pd.Series([], dtype=id_dtype)}
    if max_hamming is not None:
        empty_cols["hamming"] = pd.Series([], dtype=np.int64)
    dup = g[g.duplicated(subset=bucket_cols, keep=False)]
    if not len(dup):
        return pd.DataFrame(empty_cols)
    a_parts, b_parts, sa_parts, sb_parts = [], [], [], []
    for _, bucket in dup.groupby(bucket_cols, sort=False):
        if max_bucket_rows is not None and len(bucket) > max_bucket_rows:
            import warnings

            warnings.warn(
                f"pair-gen bucket truncated at {max_bucket_rows} rows "
                "(exact-dedup identical content first)", stacklevel=1
            )
            bucket = bucket.iloc[:max_bucket_rows]
        if sim_col is None:
            ids = np.unique(bucket[id_col].to_numpy())
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            a_parts.append(ids[ia])
            b_parts.append(ids[ib])
        else:
            b = bucket.drop_duplicates(subset=[id_col]).sort_values(id_col)
            if len(b) < 2:
                continue
            ids = b[id_col].to_numpy()
            sims = b[sim_col].to_numpy()
            ia, ib = np.triu_indices(len(ids), k=1)
            a_parts.append(ids[ia])
            b_parts.append(ids[ib])
            sa_parts.append(sims[ia])
            sb_parts.append(sims[ib])
    if not a_parts:
        return pd.DataFrame(empty_cols)
    out = pd.DataFrame({"doc_a": np.concatenate(a_parts),
                        "doc_b": np.concatenate(b_parts)})
    if sim_col is not None and max_hamming is not None:
        out["hamming"] = _hamming64(np.concatenate(sa_parts),
                                    np.concatenate(sb_parts))
        out = out[out.hamming <= max_hamming]
    # within-shard dedup (same pair can collide in several buckets of the
    # shard) shrinks the cross-band dedup shuffle
    return out.drop_duplicates(subset=["doc_a", "doc_b"]).reset_index(drop=True)


def _dedup_pairs_sharded(pairs, *, num_shards: int = 64,
                         hamming: bool = False,
                         pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
                         agg: dict | None = None):
    """Cross-band pair dedup via hash-sharded vectorized pandas reduce.

    A naive ``groupby(["doc_a","doc_b"]).aggregate(...)`` pays per-distinct-
    group overhead in Ray's sort-based aggregation (~0.3 ms/group — 30 s for
    90 k pairs measured at sf0.1); sharding by a row hash keeps the shuffle
    (num_shards uniform partitions) but reduces each shard with ONE pandas
    groupby/drop_duplicates call. ``agg`` maps value columns to 'min'/'max'
    reducers (e.g. {'hamming': 'min'} or {'cosine': 'max'})."""
    a_col, b_col = pair_cols
    if agg is None and hamming:
        agg = {"hamming": "min"}

    # pandas logic inside the UDFs, Arrow blocks OUT at both shuffle
    # boundaries: the groupby sorts whatever block type the upstream map
    # emitted, and pandas blocks there pay the measured ~25x exchange tax
    def add_shard(df: pd.DataFrame) -> pa.Table:
        h = pd.util.hash_pandas_object(df[[a_col, b_col]], index=False)
        df["pair_shard"] = (h % num_shards).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def reduce_shard(g: pd.DataFrame) -> pa.Table:
        if agg:
            out = g.groupby([a_col, b_col], as_index=False, sort=False).agg(agg)
        else:
            out = g.drop_duplicates(subset=[a_col, b_col])[[a_col, b_col]]
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        pairs.map_batches(add_shard, batch_format="pandas")
        .groupby("pair_shard")
        .map_groups(reduce_shard, batch_format="pandas")
    )


def lsh_band_rows(batch: pa.Table, bands: int = 32, id_col: str = "doc_id",
                  num_shards: int = 64) -> pa.Table:
    """Explode signatures to (shard, band, band_hash, doc_id) rows for the
    sharded bucket groupby — fully vectorized: the (N, perms) signature matrix
    reshapes to (N, bands, rows_per_band) and each band hashes with one
    polynomial matmul (no per-row Python)."""
    ids_arr = batch[id_col]
    sig_list = batch["minhash"]
    if isinstance(sig_list, pa.ChunkedArray):
        sig_list = sig_list.combine_chunks()
    n = len(batch)
    if n == 0:
        return pa.table(
            {"shard": pa.array([], pa.int32()),
             "band": pa.array([], pa.int32()),
             "band_hash": pa.array([], pa.int64()),
             id_col: pa.array([], ids_arr.type)}
        )
    flat = sig_list.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    perms = len(flat) // n
    rows = perms // bands
    mat = flat.reshape(n, bands, rows)
    P = np.uint64(1099511628211)
    weights = P ** np.arange(rows - 1, -1, -1, dtype=np.uint64)
    hashes = (mat * weights).sum(axis=2) >> np.uint64(1)  # (N, bands), wraps mod 2^64
    band_idx = np.tile(np.arange(bands, dtype=np.int32), n)
    id_idx = np.repeat(np.arange(n, dtype=np.int64), bands)
    flat_hashes = hashes.reshape(-1)
    return pa.table(
        {
            "shard": pa.array(_shard_of(flat_hashes, band_idx, num_shards)),
            "band": pa.array(band_idx, pa.int32()),
            "band_hash": pa.array(flat_hashes.astype(np.int64)),
            id_col: ids_arr.take(pa.array(id_idx)),
        }
    )


def minhash_candidate_pairs(ds, *, num_perm=128, bands=32, shingle_k=3,
                            id_col="doc_id", text_col="text", num_shards=64,
                            max_bucket_rows=None):
    """documents → candidate near-dup pairs (doc_a < doc_b) from shared LSH
    buckets, deduplicated across bands.

    The pair-generation groupby key is a uniform hash SHARD of
    (band, band_hash) — never the band alone: grouping by band caps
    parallelism at ``bands`` and puts one row per document into a single
    group (group size O(N) — a guaranteed OOM at corpus scale). Shards are
    uniform by construction; per-shard work is the collision buckets only."""
    sigs = ds.map_batches(
        MinHashSignatures(num_perm=num_perm, shingle_k=shingle_k,
                          text_col=text_col),
        batch_format="pyarrow",
    )
    band_rows = sigs.select_columns([id_col, "minhash"]).map_batches(
        lambda t: lsh_band_rows(t, bands, id_col, num_shards),
        batch_format="pyarrow",
    )

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _shard_bucket_pairs(g, ["band", "band_hash"], id_col,
                                   max_bucket_rows=max_bucket_rows)

    pairs = band_rows.groupby("shard").map_groups(shard_pairs, batch_format="pandas")
    return _dedup_pairs_sharded(pairs, num_shards=num_shards)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((np.asarray(sig_a) == np.asarray(sig_b)).mean())


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (exact, within candidate pairs)
# ---------------------------------------------------------------------------


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    def sh(t):
        toks = (t or "").lower().split()
        return {" ".join(toks[i : i + k]) for i in range(max(1, len(toks) - k + 1))}

    A, B = sh(text_a), sh(text_b)
    if not A and not B:
        return 1.0
    return len(A & B) / max(1, len(A | B))


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_shards: int | None = None,
) -> "ray.data.Dataset":
    """Exact k-word-shingle Jaccard for every CONSECUTIVE id pair
    (id, id+1) present on both sides — the distributed form of
    :func:`ngram_jaccard` (identical shingle semantics:
    ``max(1, n_words − k + 1)`` windows, so every doc owns ≥1
    shingle and short/empty docs keep the scalar function's edge
    behavior). → (doc_a, doc_b, inter, uni) int64, sorted by doc_a.

    Shape: one ``map_batches`` turns text into slim (pair, side,
    tok-hash) int64 rows — each doc's set feeds pair ``id`` as the
    LEFT side and pair ``id − 1`` as the RIGHT side; ONE uniform
    pair-hash shard groupby co-locates each pair; per shard a lexsort
    duplicate-count merge yields |A∩B| while the side counts yield
    |A| and |B| directly — no sizes join, no second text read, and
    the text itself never enters an exchange. Pairs missing either
    side (corpus boundaries, id gaps) drop inside the shard.
    Token identity is the 63-bit md5 hash (the ppjoin convention)."""
    from ..ops.gutil import group_by_key_shards
    from .ppjoin import _tok_hash

    def shingle_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t[text_col].to_pylist()
        pair_parts, side_parts, tok_parts = [], [], []
        for did, text in zip(ids, texts):
            ws = (text or "").lower().split()
            hh = _tok_hash(sorted(
                {" ".join(ws[i:i + k])
                 for i in range(max(1, len(ws) - k + 1))}))
            m = len(hh)
            pair_parts.append(np.concatenate(
                [np.full(m, did), np.full(m, did - 1)]))
            side_parts.append(np.concatenate(
                [np.zeros(m, np.int8), np.ones(m, np.int8)]))
            tok_parts.append(np.concatenate([hh, hh]))
        if not pair_parts:
            return pa.table({"pair": pa.array([], pa.int64()),
                             "side": pa.array([], pa.int8()),
                             "tok": pa.array([], pa.int64())})
        return pa.table({
            "pair": pa.array(np.concatenate(pair_parts)),
            "side": pa.array(np.concatenate(side_parts)),
            "tok": pa.array(np.concatenate(tok_parts)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        pair = g["pair"].to_numpy()
        side = g["side"].to_numpy()
        tok = g["tok"].to_numpy()
        order = np.lexsort((side, tok, pair))
        p, t_, s = pair[order], tok[order], side[order]
        upair, idx = np.unique(p, return_inverse=True)
        nl = np.bincount(idx[s == 0], minlength=len(upair))
        nr = np.bincount(idx[s == 1], minlength=len(upair))
        # each (pair, tok, side) is unique, so an adjacent (pair, tok)
        # repeat means the token sits on BOTH sides
        dup = (p[1:] == p[:-1]) & (t_[1:] == t_[:-1])
        inter = np.bincount(idx[:-1][dup], minlength=len(upair))
        valid = (nl > 0) & (nr > 0)
        return pd.DataFrame({
            "doc_a": upair[valid],
            "doc_b": upair[valid] + 1,
            "inter": inter[valid].astype(np.int64),
            "uni": (nl + nr - inter)[valid].astype(np.int64),
        })

    rows = ds.map_batches(shingle_rows, batch_format="pyarrow")
    return group_by_key_shards(rows, "pair", merge,
                               n_shards=n_shards).sort("doc_a")


# ---------------------------------------------------------------------------
# SimHash near-dup (hamming ≤ d via band rotation)
# ---------------------------------------------------------------------------


def simhash_band_rows(batch: pa.Table, bands: int = 4, id_col: str = "doc_id",
                      sim_col: str = "simhash", num_shards: int = 64) -> pa.Table:
    """Split each 64-bit simhash into ``bands`` segments; docs within
    hamming distance < bands share at least one exact segment (pigeonhole).
    The full simhash (8 bytes) rides along so hamming verification happens
    inside the bucket group — no global lookup structure anywhere."""
    ids_arr = batch[id_col]
    sim_raw = batch[sim_col]
    if isinstance(sim_raw, pa.ChunkedArray):
        sim_raw = sim_raw.combine_chunks()
    n = len(batch)
    if n == 0:
        return pa.table(
            {"shard": pa.array([], pa.int32()),
             "band": pa.array([], pa.int32()),
             "segment": pa.array([], pa.int64()),
             id_col: pa.array([], ids_arr.type),
             sim_col: pa.array([], pa.int64())}
        )
    sims = sim_raw.to_numpy(zero_copy_only=False).astype(np.int64).astype(np.uint64)
    seg = 64 // bands
    seg_mask = np.uint64((1 << seg) - 1)
    shifts = (np.arange(bands, dtype=np.uint64) * np.uint64(seg))
    segments = ((sims[:, None] >> shifts[None, :]) & seg_mask)  # (N, bands)
    band_idx = np.tile(np.arange(bands, dtype=np.int32), n)
    flat_seg = segments.reshape(-1)
    id_idx = np.repeat(np.arange(n, dtype=np.int64), bands)
    return pa.table(
        {
            "shard": pa.array(_shard_of(flat_seg, band_idx, num_shards)),
            "band": pa.array(band_idx, pa.int32()),
            "segment": pa.array(flat_seg.astype(np.int64)),
            id_col: ids_arr.take(pa.array(id_idx)),
            sim_col: pa.array(sims[id_idx].astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def _group_cosine_pairs(g: pd.DataFrame, threshold: float, id_col: str,
                        emb_col: str) -> pd.DataFrame:
    emb = np.stack(g[emb_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = emb / norms
    sims = unit @ unit.T
    ids = g[id_col].to_numpy()
    ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
    lo = np.minimum(ids[ia], ids[ib])
    hi = np.maximum(ids[ia], ids[ib])
    return pd.DataFrame({"vec_a": lo, "vec_b": hi, "cosine": sims[ia, ib]})


def lsh_tables_for(threshold: float, n_planes: int,
                   target_recall: float = 0.9) -> int:
    """Number of hyperplane-LSH tables needed for ``target_recall`` at
    cosine ``threshold`` with ``n_planes``-bit buckets (Charikar 2002:
    per-plane collision prob p = 1 − θ/π; recall = 1 − (1 − p^P)^T)."""
    import math

    p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    p_bucket = p ** n_planes
    if p_bucket >= 1.0:
        return 1
    if p_bucket < 1e-12:  # log1p(-p_bucket) underflows to 0 → T unbounded
        raise ValueError(
            f"cosine threshold {threshold} is too low for {n_planes}-plane "
            "LSH buckets (collision probability ~ 0); lower n_planes or use "
            "a bucket_col / brute-force path"
        )
    return max(1, math.ceil(math.log(1.0 - target_recall)
                            / math.log(1.0 - p_bucket)))


def embedding_neardup_pairs(ds, threshold: float = 0.95, id_col: str = "vec_id",
                            emb_col: str = "embedding",
                            bucket_col: str | None = None,
                            n_tables: int | None = None, n_planes: int = 16,
                            num_shards: int = 64,
                            max_bucket_rows: int = 10_000):
    """Pairs with cosine ≥ threshold.

    ``bucket_col`` given: within-bucket brute force (numpy matmul per
    group) — for pre-partitioned data (label, host, …).

    ``bucket_col=None``: banded multi-table random-hyperplane LSH — the
    scale path. Each of ``n_tables`` tables hashes ``n_planes`` projection
    signs into a bucket id (2^n_planes buckets per table; size n_planes ~
    log2(N/target_bucket) so buckets stay small at 10^10 vectors), rows
    carry the embedding so cosine verifies in-group, and pair generation
    groups by a uniform hash shard of (table, bucket) — the same
    scale-safe shape as the MinHash/SimHash pipelines; recall comes from
    the table count, not from giant buckets. Buckets over
    ``max_bucket_rows`` are truncated with a warning (tune n_planes up
    instead of paying O(rows²)). ``n_tables=None`` derives the table count
    from the threshold via :func:`lsh_tables_for` (90 % recall target) —
    hyperplane LSH is a NEAR-dup method: low thresholds (< ~0.8) need
    exponentially many tables and should use brute force or IVF instead."""
    if bucket_col is not None:
        from ..ops.gutil import group_by_key_shards

        def shard_cosine(g: pd.DataFrame) -> pd.DataFrame:
            # per-bucket matmuls run in-worker over the shard's buckets —
            # one map_groups call per bucket is a scheduler round-trip
            # per partition value (label/host cardinality at web scale)
            outs = [_group_cosine_pairs(sub, threshold, id_col, emb_col)
                    for _, sub in g.groupby(bucket_col, sort=False)]
            if not outs:
                return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                     "vec_b": pd.Series([], dtype="int64"),
                                     "cosine": pd.Series([], dtype="float64")})
            return pd.concat(outs, ignore_index=True)

        return group_by_key_shards(ds, bucket_col, shard_cosine)
    if n_tables is None:
        n_tables = lsh_tables_for(threshold, n_planes)

    def add_tables(t: pa.Table) -> pa.Table:
        emb = np.asarray(t[emb_col].to_pylist(), dtype=np.float32)
        n = len(t)
        if n == 0 or emb.size == 0:
            return pa.table(
                {"shard": pa.array([], pa.int32()),
                 "lsh_table": pa.array([], pa.int32()),
                 "bucket": pa.array([], pa.int64()),
                 id_col: pa.array([], t[id_col].type),
                 emb_col: pa.array([], t[emb_col].type)}
            )
        dim = emb.shape[1]
        # per-table plane sets from one deterministic stream
        planes = np.random.default_rng(11).normal(
            size=(n_tables, dim, n_planes)
        ).astype(np.float32)
        pows = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
        table_idx = np.repeat(np.arange(n_tables, dtype=np.int32), n)
        buckets = np.concatenate(
            [((emb @ planes[ti] > 0).astype(np.int64) @ pows)
             for ti in range(n_tables)]
        )
        row_idx = np.tile(np.arange(n, dtype=np.int64), n_tables)
        ids_arr = t[id_col]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        emb_arr = t[emb_col]
        if isinstance(emb_arr, pa.ChunkedArray):
            emb_arr = emb_arr.combine_chunks()
        take = pa.array(row_idx)
        return pa.table(
            {
                "shard": pa.array(
                    _shard_of(buckets.astype(np.uint64), table_idx, num_shards)
                ),
                "lsh_table": pa.array(table_idx, pa.int32()),
                "bucket": pa.array(buckets, pa.int64()),
                id_col: ids_arr.take(take),
                emb_col: emb_arr.take(take),
            }
        )

    rows = ds.map_batches(add_tables, batch_format="pyarrow")

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        parts = []
        dup = g[g.duplicated(subset=["lsh_table", "bucket"], keep=False)]
        for _, bucket in dup.groupby(["lsh_table", "bucket"], sort=False):
            b = bucket.drop_duplicates(subset=[id_col])
            if len(b) < 2:
                continue
            if len(b) > max_bucket_rows:
                import warnings

                warnings.warn(
                    f"LSH bucket truncated at {max_bucket_rows} rows "
                    "(raise n_planes for this cardinality)", stacklevel=1
                )
                b = b.iloc[:max_bucket_rows]
            parts.append(_group_cosine_pairs(b, threshold, id_col, emb_col))
        if not parts:
            return pd.DataFrame(
                {"vec_a": pd.Series([], dtype=g[id_col].dtype),
                 "vec_b": pd.Series([], dtype=g[id_col].dtype),
                 "cosine": pd.Series([], dtype=np.float64)}
            )
        return pd.concat(parts).drop_duplicates(subset=["vec_a", "vec_b"])

    pairs = rows.groupby("shard").map_groups(shard_pairs, batch_format="pandas")
    return _dedup_pairs_sharded(
        pairs, num_shards=num_shards, pair_cols=("vec_a", "vec_b"),
        agg={"cosine": "max"},
    )


def simhash_candidate_pairs(ds, *, bands: int = 4, max_hamming: int | None = None,
                            id_col: str = "doc_id", text_col: str = "text",
                            num_shards: int = 64,
                            max_bucket_rows: int | None = None):
    """SimHash near-dup pairs: 64-bit simhash per doc → band segments →
    shared-segment candidates (pigeonhole guarantees recall for hamming <
    bands) → exact hamming verification in-group. Same scalable shape as the
    MinHash pipeline: ONE pass over the documents, band rows carry the 8-byte
    simhash, pair generation groups by a uniform hash shard of
    (band, segment) — never by band (bands=4 would cap parallelism at 4 and
    put the whole corpus in each group)."""
    from .text_analysis import simhash_stage

    sims = ds.map_batches(simhash_stage, batch_format="pandas")
    band_rows = sims.select_columns([id_col, "simhash"]).map_batches(
        lambda t: simhash_band_rows(t, bands, id_col, num_shards=num_shards),
        batch_format="pyarrow",
    )

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _shard_bucket_pairs(
            g, ["band", "segment"], id_col, sim_col="simhash",
            max_hamming=max_hamming, max_bucket_rows=max_bucket_rows,
        )

    pairs = band_rows.groupby("shard").map_groups(shard_pairs, batch_format="pandas")
    return _dedup_pairs_sharded(pairs, num_shards=num_shards,
                                hamming=max_hamming is not None)


# ---------------------------------------------------------------------------
# exact-substring dedup: duplicated word-n-gram detection
# (the "dedup across documents at the substring level" op from the public
# training-data-dedup literature; the reference's own dedup planes are
# whole-content SHA-256 (crawler.go:1504-1543) — this extends the family)
# ---------------------------------------------------------------------------


def _fnv_token_hashes(toks: list[str], cache: dict) -> np.ndarray:
    th = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        v = cache.get(t)
        if v is None:
            h = 0xCBF29CE484222325
            for b in t.encode("utf-8"):
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            v = h
            cache[t] = v
        th[i] = v
    return th


_NGRAM_P = np.uint64(1099511628211)


def ngram_hash_rows(batch: pa.Table, n: int = 5, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """text rows → one row per word n-gram occurrence:
    (id, pos, h) with h = polynomial roll (mod 2^64) of per-token FNV-1a
    hashes over the n-window — the same vectorized construction as the
    MinHash shingles, but keeping positions and emitting nothing for docs
    shorter than n tokens. Rows are 20 B; the heavy text never leaves this
    stage."""
    ids_out, pos_out, h_out = [], [], []
    cache: dict[str, int] = {}
    for doc_id, text in zip(batch[id_col].to_pylist(),
                            batch[text_col].to_pylist()):
        toks = (text or "").lower().split()
        if len(toks) < n:
            continue
        th = _fnv_token_hashes(toks, cache)
        m = len(toks) - n + 1
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(n):
            acc = acc * _NGRAM_P + th[j : j + m]
        ids_out.append(np.full(m, doc_id))
        pos_out.append(np.arange(m, dtype=np.int32))
        h_out.append(acc)
    if not ids_out:
        return pa.table({id_col: pa.array([], batch[id_col].type),
                         "pos": pa.array([], pa.int32()),
                         "h": pa.array([], pa.uint64())})
    return pa.table({
        id_col: pa.array(np.concatenate(ids_out), batch[id_col].type),
        "pos": pa.array(np.concatenate(pos_out), pa.int32()),
        "h": pa.array(np.concatenate(h_out), pa.uint64()),
    })


def duplicate_ngram_stats(ds, n: int = 5, num_shards: int = 64,
                          id_col: str = "doc_id", text_col: str = "text",
                          min_docs: int = 2):
    """Per-document duplicated-substring report: for every doc containing a
    word n-gram that also appears in ≥``min_docs``-1 other docs, emit
    (id, dup_ngrams, dup_tokens) where dup_tokens is the size of the union
    of the duplicated n-gram windows (the token count an exact-substring
    dedup pass would cut).

    Scale shape: two uniform hash-shard exchanges on 20 B rows (never by
    raw ngram hash — Ray's sort aggregation pays per-distinct-group; one
    shard = one vectorized pandas reduce), mirroring the near-dup pair
    pipeline. ``num_shards`` is the scale knob (≈4× cluster cores)."""
    rows = ds.map_batches(
        lambda t: ngram_hash_rows(t, n, id_col, text_col),
        batch_format="pyarrow",
    )

    def add_shard(t: pa.Table) -> pa.Table:
        # arrow in/out: this stage feeds the shard groupby exchange
        h = t["h"].to_numpy(zero_copy_only=False).astype(
            np.uint64, copy=False)
        return t.append_column(
            "shard", pa.array((((h * _SHARD_MIX) >> np.uint64(33))
                               % np.uint64(num_shards)).astype(np.int32)))

    def dup_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        nun = g.groupby("h", sort=False)[id_col].nunique()
        dup_h = nun.index[nun >= min_docs]
        hit = g[g["h"].isin(dup_h)]
        return hit[[id_col, "pos"]]

    hits = (
        rows.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(dup_in_shard, batch_format="pandas")
    )

    def add_doc_shard(df: pd.DataFrame) -> pa.Table:
        # arrow out: feeds the doc-shard groupby exchange
        key = pd.util.hash_array(df[id_col].to_numpy()).astype(np.uint64)
        df["dshard"] = (key % np.uint64(num_shards)).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def coverage(g: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_ngrams, out_tokens = [], [], []
        for doc_id, grp in g.groupby(id_col, sort=False):
            p = np.sort(grp["pos"].to_numpy())
            # union of [p, p+n) via running max of window ends
            ends = np.maximum.accumulate(p + n)
            starts_new = np.empty(len(p), dtype=bool)
            starts_new[0] = True
            starts_new[1:] = p[1:] >= ends[:-1]
            seg_start = p[starts_new]
            seg_end = np.append(ends[np.nonzero(starts_new)[0][1:] - 1],
                                ends[-1])
            out_ids.append(doc_id)
            out_ngrams.append(len(p))
            out_tokens.append(int((seg_end - seg_start).sum()))
        return pd.DataFrame({id_col: out_ids, "dup_ngrams": out_ngrams,
                             "dup_tokens": out_tokens})

    return (
        hits.map_batches(add_doc_shard, batch_format="pandas")
        .groupby("dshard")
        .map_groups(coverage, batch_format="pandas")
    )


def cut_duplicate_spans(text: str, positions: list[int], n: int) -> str:
    """Remove the duplicated n-gram windows from one document's text
    (the removal half of exact-substring dedup), keeping tokens outside
    the union of [p, p+n) windows. Per-row transform for a map_batches
    cleanup stage once stats identify the spans."""
    toks = text.split()
    drop = np.zeros(len(toks), dtype=bool)
    for p in positions:
        drop[p : p + n] = True
    return " ".join(t for t, d in zip(toks, drop) if not d)


# ---------------------------------------------------------------------------
# corpus-level exact-substring dedup (cut pass)
# ---------------------------------------------------------------------------


def _cut_positions_batch(ids, texts, pos_of, n):
    """Vectorized cut for one batch: drop the union of [p, p+n) token
    windows per doc (delta-array + cumsum mask — O(tokens), no per-window
    loop). Docs absent from ``pos_of`` pass through with their original
    whitespace; affected docs are re-joined with single spaces (the same
    contract as ``cut_duplicate_spans``)."""
    clean, ntok, removed = [], [], []
    for doc_id, text in zip(ids, texts):
        toks = (text or "").split()
        pos = pos_of(doc_id)
        if isinstance(pos, str):
            pos = np.fromiter(map(int, pos.split(",")), dtype=np.int64) \
                if pos else None
        if pos is None or len(pos) == 0:
            clean.append(text or "")
            ntok.append(len(toks))
            removed.append(0)
            continue
        L = len(toks)
        delta = np.zeros(L + 1, dtype=np.int32)
        p = np.asarray(pos, dtype=np.int64)
        np.add.at(delta, np.minimum(p, L), 1)
        np.add.at(delta, np.minimum(p + n, L), -1)
        drop = np.cumsum(delta[:L]) > 0
        kept = [t for t, d in zip(toks, drop) if not d]
        clean.append(" ".join(kept))
        ntok.append(L)
        removed.append(int(drop.sum()))
    return clean, ntok, removed


def exact_substring_dedup(ds, n: int = 5, num_shards: int = 64,
                          id_col: str = "doc_id", text_col: str = "text",
                          min_docs: int = 2,
                          broadcast_doc_limit: int = 500_000,
                          num_partitions: int | None = None):
    """Corpus-level exact-substring deduplication — the *cut* half of the
    duplicated-window analysis (`duplicate_ngram_stats` is the report
    half): every word n-gram window that also occurs in ≥ ``min_docs``-1
    other documents is removed from every document containing it,
    returning (id, clean_text, n_tokens, removed_tokens) for ALL input
    docs (unaffected docs pass through verbatim). The shape follows
    Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better"), with hashed windows standing in for the suffix array.

    Scale shape: hit-finding is two uniform 20 B-row hash-shard
    exchanges (never keyed by raw n-gram hash — one shard = one
    vectorized reduce); duplicate positions then fold to ONE slim row per
    affected doc (a positions list bounded by that doc's own token
    count), which re-joins the text either via a broadcast dict (affected
    docs ≤ ``broadcast_doc_limit``) or a native hash ``Dataset.join`` on
    the id. The heavy text crosses the wire at most once (through the
    join) and never enters the shard exchanges.

    Reference: the crawler dedups whole pages by SHA-256
    (``pkg/crawler/crawler.go:1504-1543``); sub-document dedup is the
    training-data extension of the same plane.
    """
    import ray

    rows = ds.map_batches(
        lambda t: ngram_hash_rows(t, n, id_col, text_col),
        batch_format="pyarrow",
    )

    def add_shard(t: pa.Table) -> pa.Table:
        # arrow in/out: this stage feeds the shard groupby exchange
        h = t["h"].to_numpy(zero_copy_only=False).astype(
            np.uint64, copy=False)
        return t.append_column(
            "shard", pa.array((((h * _SHARD_MIX) >> np.uint64(33))
                               % np.uint64(num_shards)).astype(np.int32)))

    def dup_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        nun = g.groupby("h", sort=False)[id_col].nunique()
        dup_h = nun.index[nun >= min_docs]
        hit = g[g["h"].isin(dup_h)]
        return hit[[id_col, "pos"]]

    hits = (
        rows.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(dup_in_shard, batch_format="pandas")
    )

    def add_doc_shard(df: pd.DataFrame) -> pa.Table:
        # arrow out: feeds the doc-shard groupby exchange
        key = pd.util.hash_array(df[id_col].to_numpy()).astype(np.uint64)
        df["dshard"] = (key % np.uint64(num_shards)).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold_positions(g: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_pos = [], []
        for doc_id, grp in g.groupby(id_col, sort=False):
            out_ids.append(doc_id)
            # comma-joined string, not a list column: numpy lists become
            # Ray tensor-extension columns, which Dataset.join rejects as
            # a non-key payload — and the string is just as slim
            p = np.unique(grp["pos"].to_numpy())
            out_pos.append(",".join(map(str, p)))
        return pd.DataFrame({id_col: out_ids, "dup_pos": out_pos})

    pos_ds = (
        hits.map_batches(add_doc_shard, batch_format="pandas")
        .groupby("dshard")
        .map_groups(fold_positions, batch_format="pandas")
    ).materialize()

    n_affected = pos_ds.count()

    def out_table(batch: pa.Table, clean, ntok, removed) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            "clean_text": pa.array(clean, pa.string()),
            "n_tokens": pa.array(ntok, pa.int64()),
            "removed_tokens": pa.array(removed, pa.int64()),
        })

    if n_affected == 0 or n_affected <= broadcast_doc_limit:
        if n_affected == 0:
            lut: dict = {}
        else:
            pdf = pos_ds.to_pandas()
            lut = {i: p for i, p in zip(pdf[id_col], pdf["dup_pos"])}
        lut_ref = ray.put(lut)

        def cut_broadcast(batch: pa.Table) -> pa.Table:
            table = ray.get(lut_ref)
            ids = batch[id_col].to_pylist()
            clean, ntok, removed = _cut_positions_batch(
                ids, batch[text_col].to_pylist(), table.get, n)
            return out_table(batch, clean, ntok, removed)

        return ds.map_batches(cut_broadcast, batch_format="pyarrow")

    # join path: text meets its positions list exactly once
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = num_partitions or max(2, min(64, cpus // 2))
    joined = ds.join(pos_ds, join_type="left_outer",
                     num_partitions=nparts, on=(id_col,))

    def cut_joined(batch: pa.Table) -> pa.Table:
        pos_list = batch["dup_pos"].to_pylist()
        clean, ntok, removed = _cut_positions_batch(
            list(range(len(pos_list))), batch[text_col].to_pylist(),
            lambda i: pos_list[i], n)
        return out_table(batch, clean, ntok, removed)

    return joined.map_batches(cut_joined, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# corpus-GLOBAL line dedup (C4-style: keep the first occurrence of every
# fixed-width line across the WHOLE corpus, not just within a document)
# ---------------------------------------------------------------------------

_GLD_MAXL = 1 << 20          # max lines per doc (rank encoding bound)
_GLD_MAXDOC = 1 << 43        # max doc id  (rank = doc_id * MAXL + line_no)


def _line_rank_rows(batch: pa.Table, id_col: str, text_col: str,
                    line_words: int) -> pa.Table:
    """Slim (line_md5, rank) rows for one batch — the ONLY thing that
    shuffles. rank = doc_id * 2^20 + line_no orders occurrences by
    (doc_id, line_no) lexicographically under int64 min (both factors
    bounds-checked; widen to string keys past 2^43 docs)."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    hs: list[str] = []
    rk: list[int] = []
    for doc_id, x in zip(ids, texts):
        words = x.split(" ") if x else []
        nl = (len(words) + line_words - 1) // line_words
        if nl >= _GLD_MAXL or not (0 <= doc_id < _GLD_MAXDOC):
            raise ValueError(
                f"global_line_dedup rank bounds exceeded: doc_id={doc_id} "
                f"n_lines={nl} (widen the rank encoding)")
        base = int(doc_id) * _GLD_MAXL
        for i in range(nl):
            ln = " ".join(words[i * line_words:(i + 1) * line_words])
            hs.append(hashlib.md5(ln.encode("utf-8")).hexdigest())
            rk.append(base + i)
    return pa.table({"line_md5": pa.array(hs, pa.string()),
                     "rank": pa.array(rk, pa.int64())})


def _gld_finalize(ids, texts, kept_of, line_words):
    """Per-batch finalize: recompute lines locally (text never shuffled on
    the broadcast path), keep the globally-first occurrences, report
    counts + md5 of the kept text in line order."""
    n_lines_l, n_kept_l, md5_l = [], [], []
    for doc_id, x in zip(ids, texts):
        words = x.split(" ") if x else []
        lines = [" ".join(words[i:i + line_words])
                 for i in range(0, len(words), line_words)]
        kept = kept_of(doc_id)
        if kept is None:
            kept_lines = []
        else:
            kept_lines = [lines[i] for i in kept if i < len(lines)]
        n_lines_l.append(len(lines))
        n_kept_l.append(len(kept_lines))
        md5_l.append(hashlib.md5(
            "\n".join(kept_lines).encode("utf-8")).hexdigest())
    return n_lines_l, n_kept_l, md5_l


def global_line_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                      line_words: int = 6,
                      broadcast_threshold: int = 2_000_000,
                      num_partitions: int | None = None):
    """Corpus-global line-level dedup (the C4 recipe, Raffel et al. 2020
    §2.2 — public method: "we discarded all but one of any three-sentence
    span occurring more than once in the data set", here at fixed
    ``line_words``-word line granularity): every distinct line is kept
    exactly once corpus-wide, at its first occurrence in (doc_id, line_no)
    order; later occurrences are cut. Returns per-doc
    ``(doc_id, n_lines, n_kept, dup_line_ratio, kept_md5)``.

    Scale shape: one pass emits slim (line_md5, rank) rows (16 B hash +
    8 B rank — the text itself NEVER shuffles); one uniform
    ``groupby(line_md5).min(rank)`` picks winners; the kept (doc, line_no)
    sets come back either as a broadcast LUT (≤ ``broadcast_threshold``
    distinct lines) or via a per-doc ``groupby`` + native left join
    (above it, the ``q_nation_revenue`` switch pattern). The reference has
    no corpus-dedup plane (its dedup is whole-page SHA-256,
    ``pkg/crawler/crawler.go:1504-1543``); this is a training-data
    operator this engine adds."""
    import ray

    rows = ds.map_batches(
        lambda t: _line_rank_rows(t, id_col, text_col, line_words),
        batch_format="pyarrow",
    )
    winners = rows.groupby("line_md5").min("rank").materialize()
    n_winners = winners.count()

    if n_winners <= broadcast_threshold:
        # broadcast path: kept sets are slim ints — pull columnar, split
        # into per-doc sorted line_no arrays, ship once via ray.put
        parts = []
        for b in winners.iter_batches(batch_format="pyarrow"):
            parts.append(np.asarray(b["min(rank)"], dtype=np.int64))
        ranks = (np.sort(np.concatenate(parts))
                 if parts else np.empty(0, np.int64))
        doc_ids, line_nos = np.divmod(ranks, _GLD_MAXL)
        cut = np.nonzero(np.diff(doc_ids))[0] + 1
        lut = {int(d[0]): ln for d, ln in
               zip(np.split(doc_ids, cut), np.split(line_nos, cut))
               if len(d)}
        lut_ref = ray.put(lut)

        def finalize_broadcast(batch: pa.Table) -> pa.Table:
            table = ray.get(lut_ref)
            ids = batch[id_col].to_pylist()
            nl, nk, md = _gld_finalize(
                ids, batch[text_col].to_pylist(), table.get, line_words)
            return pa.table({
                id_col: batch[id_col],
                "n_lines": pa.array(nl, pa.int64()),
                "n_kept": pa.array(nk, pa.int64()),
                "dup_line_ratio": pa.array(
                    [round((a - b) / max(a, 1), 6) for a, b in zip(nl, nk)],
                    pa.float64()),
                "kept_md5": pa.array(md, pa.string()),
            })

        return ds.map_batches(finalize_broadcast, batch_format="pyarrow")

    # join path: decode winners → per-doc kept csv → left join with docs
    def decode(t: pa.Table) -> pa.Table:
        r = np.asarray(t["min(rank)"], dtype=np.int64)
        d, ln = np.divmod(r, _GLD_MAXL)
        return pa.table({id_col: pa.array(d, pa.int64()),
                         "line_no": pa.array(ln, pa.int64())})

    def collect_shard(g: pd.DataFrame) -> pd.DataFrame:
        # one sort vectorizes the per-doc ascending line order across
        # every doc in the shard; the csv join runs in-worker per doc
        # (no scheduler round-trip per document)
        g = g.sort_values([id_col, "line_no"], kind="mergesort")
        return (g.groupby(id_col, as_index=False)
                .agg(kept_csv=("line_no",
                               lambda s: ",".join(map(str, s)))))

    from ..ops.gutil import group_by_key_shards

    kept_ds = group_by_key_shards(
        winners.map_batches(decode, batch_format="pyarrow"),
        id_col, collect_shard)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = num_partitions or max(2, min(64, cpus // 2))
    joined = ds.join(kept_ds, join_type="left_outer",
                     num_partitions=nparts, on=(id_col,))

    def finalize_joined(batch: pa.Table) -> pa.Table:
        csvs = batch["kept_csv"].to_pylist()
        kept_arrays = [
            (np.fromiter(map(int, c.split(",")), dtype=np.int64)
             if c else np.empty(0, np.int64)) if c is not None else None
            for c in csvs
        ]
        ids = list(range(len(csvs)))
        nl, nk, md = _gld_finalize(
            ids, batch[text_col].to_pylist(),
            lambda i: kept_arrays[i], line_words)
        return pa.table({
            id_col: batch[id_col],
            "n_lines": pa.array(nl, pa.int64()),
            "n_kept": pa.array(nk, pa.int64()),
            "dup_line_ratio": pa.array(
                [round((a - b) / max(a, 1), 6) for a, b in zip(nl, nk)],
                pa.float64()),
            "kept_md5": pa.array(md, pa.string()),
        })

    return joined.map_batches(finalize_joined, batch_format="pyarrow")
