"""DSIR-style hashed n-gram importance weighting + resampling.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169, public method): score every raw document by how much
its hashed n-gram feature distribution looks like a *target* corpus
versus the raw corpus, then keep the highest-scoring documents. The
reference engine has no analog (its dedup planes are whole-content
hashes, crawler.go:1504-1543); this is one of the training-data
operators this engine adds as first-class citizens.

Pipeline shape (two streaming passes, no driver materialization of text):

1. **Count pass** — ``map_batches`` computes per-batch bucket-count
   partials (numpy ``bincount`` over FNV-hashed word uni+bigrams,
   ``n_buckets`` fixed and small) for the target subset and the whole
   corpus, emitting only nonzero ``(bucket, t, r)`` rows; one tiny
   ``groupby("bucket")`` sum (≤ ``n_buckets`` groups) lands the two
   count vectors on the driver — KB-scale traffic regardless of corpus
   size, the same mergeable-partial shape as ``stages/sketch.py``.
2. **Score pass** — the count LUT is broadcast once (``ray.put``, read
   in every actor's ``__init__``) and a second ``map_batches`` emits
   per-doc sufficient statistics. Heavy text never shuffles.

Scoring is **integer-exact** so the DuckDB oracle reproduces it
bit-for-bit: with per-doc gram-occurrence hits ``t_hits = Σ_g t[bucket(g)]``
and ``r_hits = Σ_g r[bucket(g)]``,

    score = t_hits * R_total - r_hits * T_total

is sign-equivalent to comparing the doc's mean target-bucket frequency
against its mean raw-bucket frequency (cross-multiplied to avoid
division). The float log-likelihood-ratio weight of the paper
(``Σ_g log(p_t(g)/p_r(g))`` with add-1 smoothing) is exposed separately
for the pytest path — float logs can't be hash-compared bit-exactly
across engines.

Magnitude bound: ``score`` fits int64 while
``max_doc_hits × total_grams < 2^63`` — at petabyte scale shard the
corpus or promote to float for ranking; documented, not silent.

Hashing matches the MinHash/exact-substring family (``stages/dedup.py``):
lowercase, split on whitespace, per-token FNV-1a over UTF-8 bytes,
bigram = ``(h0 * P + h1) mod 2^64`` with the same polynomial multiplier,
bucket = ``h mod n_buckets``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .dedup import _fnv_token_hashes

_P = np.uint64(1099511628211)


def _gram_buckets(text: str, n_buckets: int, cache: dict) -> np.ndarray:
    """Word uni+bigram FNV buckets for one document (occurrences, not
    distinct — both sides of the oracle count occurrences)."""
    toks = (text or "").lower().split()
    if not toks:
        return np.empty(0, dtype=np.int64)
    th = _fnv_token_hashes(toks, cache)
    uni = th
    if len(th) >= 2:
        bi = th[:-1] * _P + th[1:]
        grams = np.concatenate([uni, bi])
    else:
        grams = uni
    return (grams % np.uint64(n_buckets)).astype(np.int64)


def bucket_counts(
    ds: "ray.data.Dataset",
    *,
    n_buckets: int = 2048,
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
) -> tuple[np.ndarray, np.ndarray]:
    """Streaming count pass → (target_counts, raw_counts) int64 vectors."""

    def partial(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        texts = batch[text_col].to_pylist()
        is_t = np.asarray(
            pa.compute.equal(batch[target_col], target_value).to_numpy(
                zero_copy_only=False
            )
        )
        t_vec = np.zeros(n_buckets, dtype=np.int64)
        r_vec = np.zeros(n_buckets, dtype=np.int64)
        t_parts, r_parts = [], []
        for text, tgt in zip(texts, is_t):
            bk = _gram_buckets(text, n_buckets, cache)
            r_parts.append(bk)
            if tgt:
                t_parts.append(bk)
        if r_parts:
            r_vec += np.bincount(
                np.concatenate(r_parts), minlength=n_buckets
            ).astype(np.int64)
        if t_parts:
            t_vec += np.bincount(
                np.concatenate(t_parts), minlength=n_buckets
            ).astype(np.int64)
        nz = np.nonzero(r_vec)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "t": pa.array(t_vec[nz], pa.int64()),
                "r": pa.array(r_vec[nz], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("t"), Sum("r"))
        .take_all()
    )
    t_vec = np.zeros(n_buckets, dtype=np.int64)
    r_vec = np.zeros(n_buckets, dtype=np.int64)
    for row in rows:
        t_vec[row["bucket"]] = row["sum(t)"]
        r_vec[row["bucket"]] = row["sum(r)"]
    return t_vec, r_vec


class _DsirScoreStage:
    """Actor-pool score pass: LUT fetched once per actor."""

    def __init__(self, lut_ref, n_buckets: int, id_col: str, text_col: str):
        self.t_vec, self.r_vec, self.t_total, self.r_total = ray.get(lut_ref)
        self.n_buckets = n_buckets
        self.id_col = id_col
        self.text_col = text_col
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_n, out_t, out_r = [], [], [], []
        for doc_id, text in zip(ids, texts):
            bk = _gram_buckets(text, self.n_buckets, self.cache)
            if len(bk) == 0:
                continue
            out_id.append(doc_id)
            out_n.append(len(bk))
            out_t.append(int(self.t_vec[bk].sum()))
            out_r.append(int(self.r_vec[bk].sum()))
        n = np.asarray(out_n, dtype=np.int64)
        t_hits = np.asarray(out_t, dtype=np.int64)
        r_hits = np.asarray(out_r, dtype=np.int64)
        score = t_hits * self.r_total - r_hits * self.t_total
        return pa.table(
            {
                self.id_col: pa.array(out_id, batch[self.id_col].type),
                "n_grams": pa.array(n, pa.int64()),
                "t_hits": pa.array(t_hits, pa.int64()),
                "r_hits": pa.array(r_hits, pa.int64()),
                "score": pa.array(score, pa.int64()),
            }
        )


def dsir_scores(
    ds: "ray.data.Dataset",
    *,
    n_buckets: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Per-document DSIR sufficient statistics + integer score."""
    t_vec, r_vec = bucket_counts(
        ds,
        n_buckets=n_buckets,
        text_col=text_col,
        target_col=target_col,
        target_value=target_value,
    )
    lut_ref = ray.put((t_vec, r_vec, int(t_vec.sum()), int(r_vec.sum())))
    return ds.map_batches(
        _DsirScoreStage,
        fn_constructor_args=(lut_ref, n_buckets, id_col, text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def dsir_select(
    ds: "ray.data.Dataset",
    *,
    k: int,
    n_buckets: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
) -> "ray.data.Dataset":
    """Top-``k`` documents by (score DESC, id ASC) — the resampling step.

    Per-batch partial head(k) bounds the sort input to
    O(k × batches) rows (the ``search_pages`` combiner shape); the final
    total order is a tiny ``sort + limit``.
    """
    import pandas as pd

    scored = dsir_scores(
        ds,
        n_buckets=n_buckets,
        id_col=id_col,
        text_col=text_col,
        target_col=target_col,
        target_value=target_value,
    )

    def partial_head(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        out = df.sort_values(
            ["score", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)
        # arrow out: this partial head feeds the global sort exchange
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        scored.map_batches(partial_head, batch_format="pandas")
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
    )


def dsir_log_weights(
    t_vec: np.ndarray, r_vec: np.ndarray, bk: np.ndarray, alpha: float = 1.0
) -> float:
    """The paper's float log-likelihood-ratio weight for one document's
    gram buckets — pytest-path reference, not oracle-compared (float logs
    aren't bit-portable across engines)."""
    n_b = len(t_vec)
    t_total = t_vec.sum() + alpha * n_b
    r_total = r_vec.sum() + alpha * n_b
    pt = (t_vec[bk] + alpha) / t_total
    pr = (r_vec[bk] + alpha) / r_total
    return float(np.log(pt).sum() - np.log(pr).sum())
