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

    def per_target(g: pd.DataFrame) -> pd.DataFrame:
        counts = g.groupby("term", sort=True)["term"].count()
        top = counts.sort_index().sort_values(
            ascending=False, kind="mergesort"
        )
        return pd.DataFrame(
            {
                "target": [g["target"].iloc[0]],
                "n_terms": pd.array([len(g)], dtype="int64"),
                "n_unique_terms": pd.array([len(counts)], dtype="int64"),
                "top_term": [top.index[0]],
                "top_cnt": pd.array([int(top.iloc[0])], dtype="int64"),
            }
        )

    return rows.groupby("target").map_groups(
        per_target, batch_format="pandas"
    )
