"""Indexing pipeline — the reference's per-page DB write path as Dataset ops.

The reference indexes each page in one SQL transaction
(``pkg/crawler/crawler.go:943-1063``): SearchIndex upsert → WebObjects
content-hash dedup upsert → MetaTags dictionary + index → Keywords
dictionary + index (occurrences). Here the same logical tables are produced
as a batch of Dataset pipelines over the crawl's pages parquet:

- ``search_index``  — one row per page (doc_id, url, host, title, summary,
  lang, detected_type) — column projection, no shuffle
- ``web_objects``   — one row per distinct content_hash, first-win by
  (depth, ord) like the reference upsert (``crawler.go:1504-1543``);
  ``web_objects_index`` keeps the page ↔ object many-to-many
- ``keywords`` / ``keyword_index`` — dictionary of normalized keywords
  (id = md5-based surrogate; serial ids don't distribute) and per-page
  occurrence counts (A1, ``crawler.go:1817-1882``) via combiner
  aggregation
- ``meta_tags`` / ``meta_tags_index`` — same pattern for meta tags
  (``crawler.go:1701-1756``)

Each table writes to its own parquet directory (resumable layout).
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pyarrow as pa
import ray.data

from ..keywords import canonicalize_keyword_db
from ..ops.agg import pre_aggregated_count
from ..textnorm import normalize_text


def _surrogate_id(value: str) -> str:
    return hashlib.md5(value.encode("utf-8")).hexdigest()[:16]


def _read_pages(pages_paths, columns):
    return ray.data.read_parquet(pages_paths, columns=columns)


def build_search_index(pages_paths) -> "ray.data.Dataset":
    return _read_pages(
        pages_paths,
        ["doc_id", "url", "host", "depth", "ord", "title", "summary", "lang",
         "detected_type"],
    )


def build_web_objects(pages_paths):
    """→ (web_objects, web_objects_index). First page (by depth, ord) with a
    given content hash owns the object."""
    ds = _read_pages(pages_paths, ["doc_id", "depth", "ord", "content_hash"])

    def first_win_shard(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across every hash in the shard: one stable sort,
        # first row per hash wins; one content_hash == one map_groups
        # call is a scheduler round-trip per unique page at crawl scale
        g = g.sort_values(["content_hash", "depth", "ord"],
                          kind="mergesort")
        sizes = g.groupby("content_hash", sort=False).size()
        first = g.drop_duplicates(subset=["content_hash"], keep="first")
        hashes = first["content_hash"].to_numpy()
        return pd.DataFrame(
            {
                "object_hash": hashes,
                "object_id": [_surrogate_id(h) for h in hashes],
                "first_doc_id": first["doc_id"].to_numpy(),
                "n_pages": sizes.loc[hashes].to_numpy().astype("int64"),
            }
        )

    from ..ops.gutil import group_by_key_shards

    objects = group_by_key_shards(ds, "content_hash", first_win_shard)
    index = ds.map_batches(
        lambda t: pa.table(
            {
                "object_hash": t["content_hash"],
                "doc_id": t["doc_id"],
            }
        ),
        batch_format="pyarrow",
    )
    return objects, index


def _explode_keywords(batch: pa.Table) -> pa.Table:
    """pages(spans) → (doc_id, keyword, occurrences): keyword spans give the
    page's keyword set; occurrences = count of the keyword token in the
    page's normalized body text (reference A1)."""
    out_doc, out_kw, out_n = [], [], []
    docs = batch["doc_id"].to_pylist()
    spans_col = batch["spans"].to_pylist()
    for doc_id, spans in zip(docs, spans_col):
        body = next(
            (s["text"] for s in spans if s["kind"] == "body_text"), ""
        )
        tokens = normalize_text(body).split()
        counts: dict[str, int] = {}
        for t in tokens:
            counts[t] = counts.get(t, 0) + 1
        for s in spans:
            if s["kind"] != "keyword":
                continue
            kw = canonicalize_keyword_db(s["text"])
            if not kw:
                continue
            out_doc.append(doc_id)
            out_kw.append(kw)
            out_n.append(counts.get(kw, 1))
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.string()),
            "keyword": pa.array(out_kw, pa.string()),
            "occurrences": pa.array(out_n, pa.int64()),
        }
    )


def build_keywords(pages_paths):
    """→ (keywords dictionary, keyword_index)."""
    pairs = _read_pages(pages_paths, ["doc_id", "spans"]).map_batches(
        _explode_keywords, batch_format="pyarrow"
    )
    index = pairs.map_batches(
        lambda t: t.append_column(
            "keyword_id",
            pa.array([_surrogate_id(k) for k in t["keyword"].to_pylist()],
                     pa.string()),
        ),
        batch_format="pyarrow",
    )
    dictionary = pre_aggregated_count(
        pairs.select_columns(["keyword"]), ["keyword"], "n_docs"
    ).map_batches(
        lambda t: t.append_column(
            "keyword_id",
            pa.array([_surrogate_id(k) for k in t["keyword"].to_pylist()],
                     pa.string()),
        ),
        batch_format="pyarrow",
    )
    return dictionary, index


def _explode_meta(batch: pa.Table) -> pa.Table:
    out_doc, out_name, out_content = [], [], []
    docs = batch["doc_id"].to_pylist()
    spans_col = batch["spans"].to_pylist()
    for doc_id, spans in zip(docs, spans_col):
        for s in spans:
            if s["kind"] != "meta":
                continue
            name, _, content = s["text"].partition("=")
            out_doc.append(doc_id)
            out_name.append(name)
            out_content.append(content)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.string()),
            "name": pa.array(out_name, pa.string()),
            "content": pa.array(out_content, pa.string()),
        }
    )


def build_meta_tags(pages_paths):
    pairs = _read_pages(pages_paths, ["doc_id", "spans"]).map_batches(
        _explode_meta, batch_format="pyarrow"
    )
    dictionary = pre_aggregated_count(
        pairs.select_columns(["name"]), ["name"], "n_docs"
    )
    return dictionary, pairs


def index_pages(pages_paths, out_dir: str, fmt: str = "parquet") -> dict:
    """Run the full indexing fan-out; one table directory per logical table
    (parquet, or Lance via thecrowler_ray.storage when available).
    → {table: row_count}."""
    from ..storage import write_table

    os.makedirs(out_dir, exist_ok=True)
    counts: dict[str, int] = {}

    si = build_search_index(pages_paths).materialize()
    write_table(si, os.path.join(out_dir, "search_index"), fmt)
    counts["search_index"] = si.count()

    objects, obj_index = build_web_objects(pages_paths)
    objects = objects.materialize()
    write_table(objects, os.path.join(out_dir, "web_objects"), fmt)
    counts["web_objects"] = objects.count()
    obj_index = obj_index.materialize()
    write_table(obj_index, os.path.join(out_dir, "web_objects_index"), fmt)
    counts["web_objects_index"] = obj_index.count()

    kw_dict, kw_index = build_keywords(pages_paths)
    kw_dict = kw_dict.materialize()
    write_table(kw_dict, os.path.join(out_dir, "keywords"), fmt)
    counts["keywords"] = kw_dict.count()
    kw_index = kw_index.materialize()
    write_table(kw_index, os.path.join(out_dir, "keyword_index"), fmt)
    counts["keyword_index"] = kw_index.count()

    mt_dict, mt_index = build_meta_tags(pages_paths)
    mt_dict = mt_dict.materialize()
    write_table(mt_dict, os.path.join(out_dir, "meta_tags"), fmt)
    counts["meta_tags"] = mt_dict.count()
    mt_index = mt_index.materialize()
    write_table(mt_index, os.path.join(out_dir, "meta_tags_index"), fmt)
    counts["meta_tags_index"] = mt_index.count()
    return counts
