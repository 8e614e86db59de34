"""Search API over the indexed crawl output (reference §3.2 ``services/api``).

The reference's search service tokenizes a dorking query and runs SQL over
SearchIndex / Keywords / MetaTags (``services/api/search_engine.go:30-267``,
``search_pages`` plpgsql). Here the same surface runs over the parquet
tables produced by :mod:`thecrowler_ray.pipelines.index`:

- dork → predicate via :mod:`thecrowler_ray.search`
- candidate pages from ``search_index`` (title/summary contains) plus
  keyword-index hits (exact keyword terms)
- rank by FTS-style score (keyword occurrences + title/summary term hits),
  deterministic tie-break by doc_id; top-k.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from ..search import EXACT_FIELDS, parse


def search_pages(index_dir: str, dork: str, k: int = 10) -> pd.DataFrame:
    """→ DataFrame (doc_id, url, title, score) — the API's result shape."""
    query = parse(dork)
    terms = [
        t.value.lower()
        for g in query.groups
        for t in g
        if t.field_name not in EXACT_FIELDS
    ]
    exact = {
        t.field_name: t.value
        for g in query.groups
        for t in g
        if t.field_name in EXACT_FIELDS
    }
    si = ray.data.read_parquet(
        f"{index_dir}/search_index",
        columns=["doc_id", "url", "title", "summary", "lang"],
    )
    kw_index = ray.data.read_parquet(
        f"{index_dir}/keyword_index", columns=["doc_id", "keyword", "occurrences"]
    )

    # keyword hits: exact term matches in the keyword index → per-doc score
    term_set = set(terms)

    def kw_score(batch: pd.DataFrame) -> pd.DataFrame:
        hit = batch[batch["keyword"].isin(term_set)]
        if hit.empty:
            return pd.DataFrame({"doc_id": [], "kw_score": []})
        return (
            hit.groupby("doc_id")["occurrences"].sum().reset_index()
            .rename(columns={"occurrences": "kw_score"})
        )

    if terms:
        kw_df = kw_index.map_batches(kw_score, batch_format="pandas").to_pandas()
        kw_scores = (
            kw_df.groupby("doc_id")["kw_score"].sum()
            if "doc_id" in kw_df.columns and len(kw_df)
            else pd.Series(dtype="float64")
        )
    else:
        kw_scores = pd.Series(dtype="float64")

    # broadcast the keyword-hit scores once (bounded by term selectivity:
    # only docs containing a query term appear), score + per-batch partial
    # top-k inside map_batches, tiny driver merge — the search index itself
    # (every page ever crawled) is streamed, never materialized
    kw_ref = ray.put(dict(kw_scores))
    out_cols = ["doc_id", "url", "title", "score"]

    def page_topk(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        score = pd.Series(0, index=batch.index, dtype="int64")
        for term in terms:
            score = score + batch["title"].str.lower().str.count(term, flags=0)
            score = score + batch["summary"].str.lower().str.count(term, flags=0)
        kw = ray.get(kw_ref)
        batch["score"] = score + batch["doc_id"].map(kw).fillna(0)
        for f, v in exact.items():
            if f in batch.columns:
                batch = batch[batch[f].astype(str) == v]
        if terms:
            batch = batch[batch["score"] > 0]
        return (
            batch.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k)[out_cols]
        )

    partials = si.map_batches(page_topk, batch_format="pandas").to_pandas()
    if partials.empty or "doc_id" not in partials.columns:
        return pd.DataFrame(columns=out_cols)
    return (
        partials.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
