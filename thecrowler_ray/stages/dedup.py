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
    the reference's WebObjects upsert). → Dataset with ``content_hash``."""
    hashed = ds.map_batches(
        lambda t: add_content_hash(t, text_col), batch_format="pyarrow"
    )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(1)

    return hashed.groupby("content_hash").map_groups(keep_first, batch_format="pandas")


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


def lsh_band_rows(batch: pa.Table, bands: int = 32, id_col: str = "doc_id") -> pa.Table:
    """Explode signatures to (band, band_hash, doc_id) rows for the bucket
    groupby — fully vectorized: the (N, perms) signature matrix reshapes to
    (N, bands, rows_per_band) and each band hashes with one polynomial
    matmul (no per-row Python)."""
    ids_arr = batch[id_col]
    sig_list = batch["minhash"]
    if isinstance(sig_list, pa.ChunkedArray):
        sig_list = sig_list.combine_chunks()
    n = len(batch)
    if n == 0:
        return pa.table(
            {"band": pa.array([], pa.int32()),
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
    return pa.table(
        {
            "band": pa.array(band_idx, pa.int32()),
            "band_hash": pa.array(hashes.reshape(-1).astype(np.int64)),
            id_col: ids_arr.take(pa.array(id_idx)),
        }
    )


def minhash_candidate_pairs(ds, *, num_perm=128, bands=32, shingle_k=3,
                            id_col="doc_id", text_col="text"):
    """documents → candidate near-dup pairs (doc_a < doc_b) from shared LSH
    buckets, deduplicated across bands."""
    sigs = ds.map_batches(
        MinHashSignatures(num_perm=num_perm, shingle_k=shingle_k,
                          text_col=text_col),
        batch_format="pyarrow",
    )
    band_rows = sigs.select_columns([id_col, "minhash"]).map_batches(
        lambda t: lsh_band_rows(t, bands, id_col), batch_format="pyarrow"
    )

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """All candidate pairs of ONE band (32 groups total — per-group
        overhead amortized; the per-bucket pairing is vectorized pandas)."""
        out_a, out_b = [], []
        # only buckets with ≥2 docs produce pairs
        counts = g["band_hash"].value_counts()
        hot = counts[counts > 1].index
        sub = g[g["band_hash"].isin(hot)]
        for _, bucket in sub.groupby("band_hash", sort=False):
            ids = sorted(bucket[id_col].unique())
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    out_a.append(a)
                    out_b.append(b)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b}).drop_duplicates()

    pairs = band_rows.groupby("band").map_groups(band_pairs, batch_format="pandas")
    # cross-band dedup: aggregate (cheap count) instead of per-pair map_groups
    from ray.data.aggregate import Count

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="_nbands")
    ).drop_columns(["_nbands"])


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


# ---------------------------------------------------------------------------
# SimHash near-dup (hamming ≤ d via band rotation)
# ---------------------------------------------------------------------------


def simhash_band_rows(batch: pa.Table, bands: int = 4, id_col: str = "doc_id",
                      sim_col: str = "simhash") -> pa.Table:
    """Split each 64-bit simhash into ``bands`` segments; docs within
    hamming distance < bands share at least one exact segment (pigeonhole)."""
    ids = batch[id_col].to_pylist()
    sims = np.asarray(batch[sim_col].to_pylist(), dtype=np.int64).astype(np.uint64)
    seg = 64 // bands
    out_band, out_seg, out_id = [], [], []
    for b in range(bands):
        vals = (sims >> np.uint64(b * seg)) & np.uint64((1 << seg) - 1)
        out_band.extend([b] * len(ids))
        out_seg.extend(vals.astype(np.int64).tolist())
        out_id.extend(ids)
    return pa.table(
        {
            "band": pa.array(out_band, pa.int32()),
            "segment": pa.array(out_seg, pa.int64()),
            id_col: pa.array(out_id, batch[id_col].type),
        }
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(ds, threshold: float = 0.95, id_col: str = "vec_id",
                            emb_col: str = "embedding", bucket_col: str | None = None):
    """Pairs with cosine ≥ threshold. Within-bucket brute force (numpy
    matmul per group); ``bucket_col=None`` buckets by LSH random projections
    (the scale path — no O(N²) across buckets)."""
    if bucket_col is None:
        rng = np.random.default_rng(11)
        planes = None

        def add_bucket(t: pa.Table) -> pa.Table:
            nonlocal planes
            emb = np.asarray(t[emb_col].to_pylist(), dtype=np.float32)
            if planes is None:
                planes = np.random.default_rng(11).normal(size=(emb.shape[1], 8)).astype(np.float32)
            bits = (emb @ planes > 0).astype(np.int64)
            bucket = bits @ (1 << np.arange(8, dtype=np.int64))
            return t.append_column("nd_bucket", pa.array(bucket, pa.int64()))

        ds = ds.map_batches(add_bucket, batch_format="pyarrow")
        bucket_col = "nd_bucket"

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
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

    return ds.groupby(bucket_col).map_groups(group_pairs, batch_format="pandas")


def simhash_candidate_pairs(ds, *, bands: int = 4, max_hamming: int | None = None,
                            id_col: str = "doc_id", text_col: str = "text"):
    """SimHash near-dup pairs: 64-bit simhash per doc → band segments →
    shared-segment candidates (pigeonhole guarantees recall for hamming <
    bands) → optional exact hamming verification. Same scalable shape as
    the MinHash pipeline."""
    from .text_analysis import simhash_stage

    sims = ds.map_batches(simhash_stage, batch_format="pandas")
    band_rows = sims.map_batches(
        lambda t: simhash_band_rows(t, bands, id_col), batch_format="pyarrow"
    )

    sim_lookup_ref = None
    if max_hamming is not None:
        lookup = dict(
            zip(
                sims.select_columns([id_col, "simhash"]).to_pandas()[id_col],
                sims.select_columns([id_col, "simhash"]).to_pandas()["simhash"],
            )
        )
        import ray as _ray

        sim_lookup_ref = _ray.put(lookup)

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        counts = g["segment"].value_counts()
        hot = counts[counts > 1].index
        for _, bucket in g[g["segment"].isin(hot)].groupby("segment", sort=False):
            ids = sorted(bucket[id_col].unique())
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    out_a.append(a)
                    out_b.append(b)
        df = pd.DataFrame({"doc_a": out_a, "doc_b": out_b}).drop_duplicates()
        if sim_lookup_ref is not None and len(df):
            import ray as _ray

            lk = _ray.get(sim_lookup_ref)
            ham = [
                bin((int(lk[a]) & 0xFFFFFFFFFFFFFFFF)
                    ^ (int(lk[b]) & 0xFFFFFFFFFFFFFFFF)).count("1")
                for a, b in zip(df.doc_a, df.doc_b)
            ]
            df = df.assign(hamming=ham)
            df = df[df.hamming <= max_hamming]
        return df

    pairs = band_rows.groupby("band").map_groups(band_pairs, batch_format="pandas")
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Min as _Min

    if max_hamming is not None:
        return pairs.groupby(["doc_a", "doc_b"]).aggregate(
            _Min("hamming", alias_name="hamming")
        )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        _Count(alias_name="_nbands")
    ).drop_columns(["_nbands"])
