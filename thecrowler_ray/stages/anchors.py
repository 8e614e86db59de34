"""Anchor-text aggregation over a page corpus.

The classic web-corpus signal (anchor text describes the *target* page
— used by search indexing since Brin & Page 1998 and by modern corpus
curation as a quality/topic label for URLs the crawler hasn't fetched).
The reference extracts links per page (``pkg/crawler/keywords.go`` link
scoring; mirrored link extraction in ``htmlx.py`` M6); this aggregates
the *incoming* anchor text per target across the whole corpus.

Shape: one ``map_batches`` parse pass explodes (target, term) rows from
each page's ``<a>`` inner text (the raw parser's links — the URL
validity filter belongs to the frontier, not to anchor statistics),
then ONE ``groupby(target).map_groups`` computes per-target stats
in-group — groups are per-URL incoming anchors, bounded in practice by
in-degree (a true mega-hub group is still just counted strings; skew
hurts only if a single URL's anchors exceed a worker's heap, the same
assumption the reference's per-page processing makes).

Heavy HTML never shuffles — only slim (target, term) string rows.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..htmlx import parse_html


def explode_anchor_terms(pages, *, html_col: str = "html"):
    """pages (…, html) → rows (target, term): one row per whitespace
    token of each link's anchor text (empty anchors contribute the
    empty-marker term ``''`` exactly once so link counts stay exact)."""

    def explode(batch: pa.Table) -> pa.Table:
        targets: list[str] = []
        terms: list[str] = []
        for html in batch[html_col].to_pylist():
            page = parse_html(html or "")
            for ln in page.links:
                toks = (ln.get("anchor") or "").split()
                if not toks:
                    toks = [""]
                for t in toks:
                    targets.append(ln["href"])
                    terms.append(t)
        return pa.table(
            {
                "target": pa.array(targets, pa.string()),
                "term": pa.array(terms, pa.string()),
            }
        )

    return pages.map_batches(explode, batch_format="pyarrow")


def anchor_text_table(pages, *, html_col: str = "html"):
    """→ Dataset (target, n_terms, n_unique_terms, top_term, top_cnt):
    incoming anchor-term statistics per target URL; ``top_term`` breaks
    count ties lexicographically."""
    rows = explode_anchor_terms(pages, html_col=html_col)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across every target in the shard: (target, term)
        # counts, then two chained STABLE sorts so the first row per
        # target is (max count, lexicographically smallest term) — the
        # same tie-break as a per-target sort_index + stable count sort
        counts = (g.groupby(["target", "term"], as_index=False)
                  .size().rename(columns={"size": "cnt"}))
        counts = counts.sort_values(["target", "term"], kind="mergesort")
        counts = counts.sort_values(["target", "cnt"],
                                    ascending=[True, False],
                                    kind="mergesort")
        top = counts.drop_duplicates(subset=["target"], keep="first")
        n_terms = (g.groupby("target", as_index=False)
                   .agg(n_terms=("term", "size")))
        n_uniq = (counts.groupby("target", as_index=False)
                  .agg(n_unique_terms=("term", "size")))
        out = (n_terms.merge(n_uniq, on="target")
               .merge(top.rename(columns={"term": "top_term",
                                          "cnt": "top_cnt"}),
                      on="target"))
        out["n_terms"] = out["n_terms"].astype("int64")
        out["n_unique_terms"] = out["n_unique_terms"].astype("int64")
        out["top_cnt"] = out["top_cnt"].astype("int64")
        return out[["target", "n_terms", "n_unique_terms", "top_term",
                    "top_cnt"]]

    from ..ops.gutil import group_by_key_shards

    return group_by_key_shards(rows, "target", per_shard)
