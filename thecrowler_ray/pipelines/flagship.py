"""Flagship pipelines for the driver contract.

- ``doc_spans_pipeline``: documents table → interleaved span table
  (``doc_id``, ``spans list<struct<kind,text,media_ref,offset>>`` — exactly
  the BASELINE.json input_hint shape) + text-analysis columns. This is the
  "indexing" half of the reference (extract → keywords → index,
  ``pkg/crawler/crawler.go:943-1063``) applied to a plain-text corpus.
- ``q_crawl``: a deterministic end-to-end BFS crawl on the synthetic web
  (the discovery half). Rows-only correctness check; the pytest suite pins
  it against the Python oracle.
"""

from __future__ import annotations

import glob
import shutil

import pyarrow as pa
import ray.data

from ..keywords import extract_keywords
from ..pipelines.crawl import CrawlRun, EngineConfig
from ..sources.synthweb import CorpusConfig, seed_urls
from ..stages.fetch import SPAN_TYPE
from ..stages.text_analysis import quality_stage, token_count_stage


def _spanify(batch: pa.Table) -> pa.Table:
    """text → ordered spans: body_text, then keyword spans (first-seen
    order, reference M8 semantics)."""
    texts = batch["text"].to_pylist()
    langs = (
        batch["lang"].to_pylist()
        if "lang" in batch.column_names
        else [""] * len(texts)
    )
    spans_col = []
    for text, lang in zip(texts, langs):
        spans = [{"kind": "body_text", "text": text or "", "media_ref": ""}]
        for kw in extract_keywords(text or "", [], lang or ""):
            spans.append({"kind": "keyword", "text": kw, "media_ref": ""})
        for i, s in enumerate(spans):
            s["offset"] = i
        spans_col.append(spans)
    return batch.append_column("spans", pa.array(spans_col, SPAN_TYPE))


def doc_spans_pipeline(sf_dir: str):
    """documents → spans + token counts + quality, streamed end-to-end."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    with_spans = ds.map_batches(_spanify, batch_format="pyarrow")
    analyzed = with_spans.map_batches(
        token_count_stage, batch_format="pandas"
    ).map_batches(quality_stage, batch_format="pandas")
    return analyzed.select_columns(
        ["doc_id", "lang", "spans", "ws_tokens", "quality_score"]
    )


def q_crawl(sf_dir: str):
    """End-to-end BFS crawl over the deterministic synthetic web.
    ``sf_dir`` only selects the output scratch dir (input is the pure
    function-of-seed corpus, per BASELINE.json's crawl tier)."""
    cfg = CorpusConfig(seed=42, n_hosts=12, base_pages=40)
    seeds = seed_urls(cfg, 8)
    out_dir = "/tmp/crowler_ray/q_crawl"
    shutil.rmtree(out_dir, ignore_errors=True)
    run = CrawlRun(
        cfg,
        seeds,
        EngineConfig(
            max_links=300,
            max_waves=8,
            out_dir=out_dir,
            n_seen_shards=4,
            n_pol_shards=4,
            fetch_concurrency=2,
        ),
    )
    run.run()
    files = sorted(glob.glob(f"{out_dir}/wave=*/pages/*.parquet"))
    ds = ray.data.read_parquet(
        files,
        columns=["doc_id", "url", "host", "depth", "ord", "title", "lang",
                 "spans", "links"],
    )

    def lengths(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = t.drop_columns(["spans", "links"])
        out = out.append_column(
            "n_spans", pc.cast(pc.list_value_length(t["spans"]), pa.int64())
        )
        return out.append_column(
            "n_links", pc.cast(pc.list_value_length(t["links"]), pa.int64())
        )

    # derived per-row invariants (span/link cardinality) let the DuckDB
    # twin recompute them from the engine's own written parquet — the
    # driver's hash check then validates both the scalar crawl output
    # (url/depth/ord ordering) and the nested payload consistency
    return ds.map_batches(lengths, batch_format="pyarrow")


def q_action_rules(sf_dir: str):
    """Crawl with the standard action ruleset over an action-gated corpus
    (M17 as data effects: DOM click → data-href, type + submit → form
    action + query). Rows-only; the engine-vs-oracle equality test pins the
    full path. ``via_action`` marks URLs only reachable through a form
    submission."""
    from ..actions import standard_action_rules

    cfg = CorpusConfig(seed=7, n_hosts=10, base_pages=40, action_frac=0.35)
    out_dir = "/tmp/crowler_ray/q_action_rules"
    shutil.rmtree(out_dir, ignore_errors=True)
    run = CrawlRun(
        cfg,
        seed_urls(cfg, 6),
        EngineConfig(
            max_links=400, max_waves=8, out_dir=out_dir,
            n_seen_shards=4, n_pol_shards=4, fetch_concurrency=2,
            action_rules=standard_action_rules(),
        ),
    )
    run.run()
    files = sorted(glob.glob(f"{out_dir}/wave=*/pages/*.parquet"))
    ds = ray.data.read_parquet(
        files, columns=["doc_id", "url", "host", "depth", "ord"]
    )
    return ds.map_batches(
        lambda df: df.assign(via_action=df["url"].str.contains("?q=", regex=False)),
        batch_format="pandas",
    )


def q_doc_spans_summary(sf_dir: str):
    """Per-doc summary derived from the REAL nested ``doc_spans_pipeline``
    output (not a parallel scalar path): span cardinality via
    ``list_value_length`` on the nested column + the analysis columns. The
    DuckDB twin recomputes n_spans as 1 + per-doc keyword count and
    ws_tokens from the raw text, so the oracle checks the nested flagship
    output end-to-end. (n_spans is taken right after the span stage — the
    nested column can't round-trip the pandas analysis stages.)"""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(_spanify, batch_format="pyarrow")

    def span_len(t: pa.Table) -> pa.Table:
        return t.drop_columns(["spans"]).append_column(
            "n_spans", pc.cast(pc.list_value_length(t["spans"]), pa.int64())
        )

    analyzed = ds.map_batches(span_len, batch_format="pyarrow").map_batches(
        token_count_stage, batch_format="pandas"
    )
    return analyzed.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "n_spans": t["n_spans"],
                "ws_tokens": pc.cast(t["ws_tokens"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_crawl_index(sf_dir: str):
    """The full reference pipeline end-to-end: crawl the synthetic web, then
    run the indexing fan-out (search_index, web_objects dedup, keyword and
    meta dictionaries+indexes). Returns the keyword dictionary (rows-only;
    table consistency is asserted in tests)."""
    import os

    from .index import build_keywords

    crawl_out = "/tmp/crowler_ray/q_crawl_index"
    shutil.rmtree(crawl_out, ignore_errors=True)
    cfg = CorpusConfig(seed=42, n_hosts=10, base_pages=40)
    run = CrawlRun(
        cfg,
        seed_urls(cfg, 6),
        EngineConfig(
            max_links=250, max_waves=8, out_dir=crawl_out,
            n_seen_shards=4, n_pol_shards=4, fetch_concurrency=2,
        ),
    )
    run.run()
    pages = sorted(glob.glob(f"{crawl_out}/wave=*/pages/*.parquet"))
    kw_dict, _ = build_keywords(pages)
    return kw_dict
