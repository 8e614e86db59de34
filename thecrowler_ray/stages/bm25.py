"""BM25 ranked retrieval over a document column (Robertson/Spärck Jones,
public Okapi BM25 formula).

The reference ranks search hits with an FTS-style keyword score
(``services/api/search_engine.go:30-267`` — occurrence counts + field
hits; see ``pipelines/search_api.py`` for that surface). BM25 is the
standard upgrade a training-data curation pipeline needs for
retrieval-based selection (e.g. fetching in-domain documents for a
target task, the retrieval half of DSIR-style selection) — added here
as a first-class operator.

Pipeline shape (text is read once; only slim integer rows shuffle):

1. **Count pass** — ``map_batches`` tokenizes each doc once and emits a
   slim row ``(doc_id, dl, tf_0..tf_{T-1}, hit_0..hit_{T-1})`` — doc
   length plus per-query-term frequencies. Materialized once: this is
   the only intermediate, O(docs × terms) ints.
2. **Stats** — ``N`` (doc count), ``total_dl`` and per-term document
   frequencies come off the slim table as one tiny ``aggregate`` (T+1
   sums); the driver sees T+2 numbers, never rows.
3. **Score pass** — a second ``map_batches`` over the slim table
   computes the fixed-point BM25 contribution per (doc, term) and sums;
   per-batch partial top-k bounds the final sort input
   (``search_pages`` combiner shape), then a global sort + limit.

**Fixed-point determinism** (same contract as ``stages/ngram_lm.py``):
each (doc, term) contribution is
``floor(((idf * num) / den) * 10000 + 0.5)`` as int64 with
``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the Lucene variant of
the Robertson idf — non-negative even when ``df > N/2``, which the raw
Okapi form is not; on a small-vocabulary corpus where every query term
is in most documents the raw form would rank fewest-hits first),
``num = tf * (k1 + 1)`` and
``den = tf + k1*(1 - b) + k1*b*((dl*N)/total_dl)``
— every input an exact integer (``dl*N`` stays in int64), the double
expression tree written identically in numpy and the DuckDB twin, and
the per-doc sum an order-free int64. ``dl/avgdl`` is expanded to
``(dl*N)/total_dl`` so no intermediate average is rounded differently
on the two sides.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def _tokens(text: str | None) -> list[str]:
    """Tokenization shared with the ngram-LM / DSIR family: lowercase,
    whitespace split (== DuckDB ``string_split_regex(lower(text),
    '\\s+')`` with empties filtered, on the ASCII corpus)."""
    return (text or "").lower().split()


def bm25_term_counts(
    ds: "ray.data.Dataset",
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Count pass → slim Dataset ``(id, dl, tf_i, hit_i)`` — one row per
    input doc (docs with no query-term hits still contribute dl to the
    corpus stats). Heavy text never leaves this stage."""
    term_list = list(terms)

    def count(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = len(texts)
        dl = np.empty(n, dtype=np.int64)
        tf = np.zeros((len(term_list), n), dtype=np.int64)
        for i, text in enumerate(texts):
            toks = _tokens(text)
            dl[i] = len(toks)
            if toks:
                c = Counter(toks)
                for j, t in enumerate(term_list):
                    tf[j, i] = c.get(t, 0)
        cols: dict = {id_col: batch[id_col], "dl": pa.array(dl)}
        for j in range(len(term_list)):
            cols[f"tf_{j}"] = pa.array(tf[j])
            cols[f"hit_{j}"] = pa.array((tf[j] > 0).astype(np.int64))
        return pa.table(cols)

    return ds.map_batches(count, batch_format="pyarrow")


class _Bm25ScoreBatch:
    """Score + per-batch partial top-k over the slim count rows."""

    def __init__(self, id_col: str, n_terms: int, idf: np.ndarray,
                 n_docs: int, total_dl: int, k1: float, b: float,
                 scale: int, k: int):
        self.id_col = id_col
        self.n_terms = n_terms
        self.idf = idf
        self.n_docs = n_docs
        self.total_dl = total_dl
        self.k1 = k1
        self.b = b
        self.scale = scale
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        # (dl*N)/total_dl in int64 then one double divide — matches the
        # SQL twin's CAST(dl*N AS DOUBLE)/CAST(total_dl AS DOUBLE)
        norm = (dl * self.n_docs).astype(np.float64) / float(self.total_dl)
        score = np.zeros(len(dl), dtype=np.int64)
        hits = np.zeros(len(dl), dtype=np.int64)
        for j in range(self.n_terms):
            tf = batch[f"tf_{j}"].to_numpy(zero_copy_only=False).astype(
                np.int64
            ).astype(np.float64)
            num = tf * (self.k1 + 1.0)
            den = tf + self.k1 * (1.0 - self.b) + self.k1 * self.b * norm
            contrib = np.floor(
                ((self.idf[j] * num) / den) * self.scale + 0.5
            ).astype(np.int64)
            m = tf > 0
            score += np.where(m, contrib, 0)
            hits += m.astype(np.int64)
        keep = hits > 0
        t = pa.table(
            {
                self.id_col: batch[self.id_col].filter(pa.array(keep)),
                "n_terms_hit": pa.array(hits[keep]),
                "score_q4": pa.array(score[keep]),
            }
        )
        if t.num_rows > self.k:  # partial head: bound the global sort
            order = pa.compute.sort_indices(
                t,
                sort_keys=[("score_q4", "descending"),
                           (self.id_col, "ascending")],
            )
            t = t.take(order.slice(0, self.k))
        return t


def bm25_topk(
    ds: "ray.data.Dataset",
    terms: list[str],
    *,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    scale: int = 10_000,
) -> "ray.data.Dataset":
    """Top-``k`` documents by BM25 over ``terms`` → Dataset
    ``(id, n_terms_hit, score_q4)``, ``score_q4`` the fixed-point (1e-4)
    BM25 score, ordered by (score_q4 DESC, id ASC). Docs matching no
    term emit no row."""
    if not terms:
        raise ValueError("bm25_topk: empty term list")
    slim = bm25_term_counts(
        ds, terms, id_col=id_col, text_col=text_col
    ).materialize()  # slim ints only — read twice (stats + score)

    from ray.data.aggregate import Count, Sum

    aggs = [Count(alias_name="n_docs"), Sum("dl", alias_name="total_dl")]
    aggs += [
        Sum(f"hit_{j}", alias_name=f"df_{j}") for j in range(len(terms))
    ]
    stats = slim.aggregate(*aggs)  # T+2 scalars to the driver
    n_docs = int(stats["n_docs"])
    total_dl = int(stats["total_dl"] or 0)
    if total_dl == 0:
        raise ValueError("bm25_topk: corpus has no tokens")
    df = np.array(
        [int(stats[f"df_{j}"] or 0) for j in range(len(terms))],
        dtype=np.int64,
    )
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return (
        slim.map_batches(
            _Bm25ScoreBatch(
                id_col, len(terms), idf, n_docs, total_dl, k1, b, scale, k
            ),
            batch_format="pyarrow",
        )
        .sort(["score_q4", id_col], descending=[True, False])
        .limit(k)
    )
