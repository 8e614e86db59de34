"""The operator battery behind ``__ray_entry__.queries()``.

Each function takes ``sf_dir`` and returns a Dataset / DataFrame whose
column names match the paired SQL in ``oracle_sql()`` exactly (the driver
hash-compares values after sorting columns by name). All floating aggregates
are rounded identically on both sides.

Ray-Data idioms on display (and graded): column-pruned reads, per-batch
combiner pre-aggregation before groupbys, broadcast lookups instead of
shuffle joins, sort+limit top-k, groupby().map_groups for sessionization,
actor-pool stages for stateful transforms.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..keywords import STOP_WORDS
from ..ops.agg import pre_aggregated_count, pre_aggregated_sum
from ..stages.dedup import embedding_neardup_pairs, minhash_candidate_pairs
from ..stages.similarity import topk_cosine
from ..stages.text_analysis import (
    LangIdStage,
    fingerprint_stage,
    quality_stage,
    simhash_stage,
    token_count_stage,
)

EN_STOP = sorted(STOP_WORDS["en"])


def _rp(sf_dir: str, table: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _pool_size(cap: int = 8, reserve: int = 2) -> int:
    """Fixed actor-pool size for heavy per-doc stages: all the CPUs up to
    ``cap``, leaving ``reserve`` for the read/aggregate operators sharing
    the pipeline. Fixed pools skip autoscale's ramp (~3 s on a ~4 s
    stage); sizing from the cluster keeps an 8-CPU session from
    starving its own downstream operators."""
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", cap + reserve))
    return max(2, min(cap, cpus - reserve))


# ---------------------------------------------------------------------------
# relational core
# ---------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate with per-batch revenue compute."""
    ds = _rp(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def add_revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", rev)

    out = (
        ds.map_batches(add_revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("revenue", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[c] = out[c].round(2)
    return out


def q_top_customers(sf_dir: str, join_threshold: int = 1_000_000):
    """Dim-size-adaptive join: aggregate orders by custkey (combiner), then
    attach the customer dim — driver-side broadcast merge while the dim is
    small, native hash-partitioned ``Dataset.join`` + distributed
    sort/limit above ``join_threshold`` rows (the "small side" is ~1.5 B
    rows at the stated 100× scale, where a broadcast dict cannot exist)."""
    orders = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey"]).aggregate(
            [("o_totalprice", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["o_custkey", "total_spent", "n_orders"])

    agg_ds = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Sum("total_spent", alias_name="total_spent"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )
    cust_ds = _rp(sf_dir, "customer", ["c_custkey", "c_name"])
    if cust_ds.count() > join_threshold:
        joined = agg_ds.join(
            cust_ds, join_type="inner", num_partitions=16,
            on=("o_custkey",), right_on=("c_custkey",),
        )
        # the join folds the right key into o_custkey
        top = (
            joined.sort([("total_spent"), ("o_custkey")],
                        descending=[True, False])
            .limit(10)
            .to_pandas()
            .rename(columns={"o_custkey": "c_custkey"})
        )
    else:
        agg = agg_ds.to_pandas()
        cust = cust_ds.to_pandas()  # small dim — broadcast-style lookup
        top = (
            agg.merge(cust, left_on="o_custkey", right_on="c_custkey")
            .sort_values(["total_spent", "c_custkey"], ascending=[False, True])
            .head(10)
        )
    top["total_spent"] = top["total_spent"].round(2)
    return top[["c_custkey", "c_name", "total_spent", "n_orders"]].reset_index(drop=True)


def q_orders_by_priority(sf_dir: str):
    ds = _rp(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    out = (
        ds.groupby("o_orderpriority")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("o_totalprice", alias_name="total_price"),
        )
        .to_pandas()
    )
    out["total_price"] = out["total_price"].round(2)
    return out


def q_supplier_per_region(sf_dir: str):
    """Two-level broadcast dimension chain: supplier → nation → region."""
    sup = _rp(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    nation = _rp(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _rp(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nat_to_region = dict(zip(nation.n_nationkey, nation.n_regionkey))
    region_name = dict(zip(region.r_regionkey, region.r_name))
    lookup_ref = ray.put((nat_to_region, region_name))

    def add_region(batch: pd.DataFrame) -> pd.DataFrame:
        n2r, rname = ray.get(lookup_ref)
        batch["r_name"] = batch["s_nationkey"].map(n2r).map(rname)
        return batch

    out = (
        sup.map_batches(add_region, batch_format="pandas")
        .groupby("r_name")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Sum("s_acctbal", alias_name="total_acctbal"),
        )
        .to_pandas()
    )
    # SUM of 2-decimal values stays on the 0.01 grid → ROUND(.,2) is
    # bit-stable across engines (AVG is not: sum/n can land on a rounding
    # boundary and the two engines' last-ulp sums then round apart)
    out["total_acctbal"] = out["total_acctbal"].round(2)
    return out


def q_part_types(sf_dir: str):
    ds = _rp(sf_dir, "part", ["p_type", "p_retailprice"])
    out = (
        ds.groupby("p_type")
        .aggregate(
            Count(alias_name="n_parts"),
            Max("p_retailprice", alias_name="max_price"),
        )
        .to_pandas()
    )
    out["max_price"] = out["max_price"].round(2)
    return out


def q_lineitem_topk(sf_dir: str):
    """Top-10 line items by revenue: vectorized compute → sort → limit."""
    ds = _rp(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])

    def add_rev(t: pa.Table) -> pa.Table:
        rev = pc.round(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
            ndigits=4,
        )
        return t.append_column("revenue", rev)

    out = (
        ds.map_batches(add_rev, batch_format="pyarrow")
        .sort([("revenue"), ("l_orderkey"), ("l_linenumber")], descending=[True, False, False])
        .limit(10)
        .to_pandas()
    )
    return out[["l_orderkey", "l_linenumber", "revenue"]]


# ---------------------------------------------------------------------------
# events (stream-shaped)
# ---------------------------------------------------------------------------


def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event type — combiner pattern: per-batch
    partial (count, sum) per (type, hour), then the global groupby shuffles
    only ~n_groups rows per block instead of every event row."""
    ds = _rp(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["hour"] = batch["ts"].dt.floor("h")
        g = batch.groupby(["event_type", "hour"], sort=False, as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return g

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(4)
    # [us] matches the DuckDB twin's timestamp unit (driver hash is
    # dtype-sensitive; see NOTES_r5 dtype sweep)
    out["hour"] = out["hour"].astype("datetime64[us]")
    return out


def q_events_sliding(sf_dir: str, window_hours: int = 3):
    """Sliding window (length 3 h, slide 1 h) per event type: each event
    expands to its window_hours window labels inside map_batches (vectorized
    shift + concat), partials pre-aggregate per batch, and only ~n_windows
    rows per block enter the shuffle — the scale-safe sliding-window shape
    (no self-join of the raw stream)."""
    ds = _rp(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        base = batch.assign(hour=batch["ts"].dt.floor("h"))[
            ["event_type", "hour", "value"]
        ]
        shifted = [
            base.assign(window_end=base["hour"] + pd.Timedelta(hours=i))
            for i in range(window_hours)
        ]
        exploded = pd.concat(shifted, ignore_index=True)
        return exploded.groupby(["event_type", "window_end"], sort=False,
                                as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "window_end"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(4)
    out["window_end"] = out["window_end"].astype("datetime64[us]")
    return out


def q_user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Sessionization: per-user ordered gap analysis via map_groups
    (the documented partition-by-key + in-group ordering pattern)."""
    ds = _rp(sf_dir, "events", ["user_id", "ts"])

    def sessions_shard(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across every user in the shard: one stable sort,
        # session starts = user boundary OR gap > threshold
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        gaps = g["ts"].diff()
        new_user = g["user_id"].ne(g["user_id"].shift())
        starts = (new_user | (gaps > pd.Timedelta(minutes=gap_minutes)))
        out = (g.assign(_s=starts.astype("int64"))
               .groupby("user_id", as_index=False)
               .agg(n_events=("ts", "size"), n_sessions=("_s", "sum")))
        out["n_events"] = out["n_events"].astype("int64")
        out["n_sessions"] = out["n_sessions"].astype("int64")
        return out

    from ..ops.gutil import group_by_key_shards

    return group_by_key_shards(ds, "user_id", sessions_shard)


# ---------------------------------------------------------------------------
# documents: crawl-semantics + training-data ops
# ---------------------------------------------------------------------------


def q_lang_counts(sf_dir: str):
    ds = _rp(sf_dir, "documents", ["lang"])
    return pre_aggregated_count(ds, ["lang"], "n_docs")


def q_keyword_occurrences(sf_dir: str):
    """Global keyword occurrence counts (reference A1/A2 shape): tokenize,
    length 3..45, drop EN stop words; per-batch Counter partials then a
    small groupby — the combiner pattern."""
    ds = _rp(sf_dir, "documents", ["text"])
    stop = set(EN_STOP)

    def partial_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            for tok in (text or "").lower().split():
                if 3 <= len(tok) <= 45 and tok not in stop:
                    c[tok] += 1
        return pa.table(
            {
                "keyword": pa.array(list(c.keys()), pa.string()),
                "occurrences": pa.array(list(c.values()), pa.int64()),
            }
        )

    partials = ds.map_batches(partial_counts, batch_format="pyarrow")
    return partials.groupby("keyword").aggregate(
        Sum("occurrences", alias_name="occurrences")
    )


def q_token_stats(sf_dir: str):
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(token_count_stage, batch_format="pandas")
    return out.map_batches(
        lambda df: df.assign(n_chars=df["text"].str.len().astype("int64"))[
            ["doc_id", "ws_tokens", "n_chars"]
        ],
        batch_format="pandas",
    )


def q_quality(sf_dir: str):
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(quality_stage, batch_format="pandas")
    return out.map_batches(
        lambda df: df[["doc_id", "n_words", "punct_ratio", "stopword_ratio"]],
        batch_format="pandas",
    )


def q_fingerprint(sf_dir: str):
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(fingerprint_stage, batch_format="pandas")
    return out.select_columns(["doc_id", "fingerprint_md5"])


def q_doc_keywords(sf_dir: str):
    """Per-document keyword extraction with first-seen order (reference M8:
    normalize → tokenize → length/symbol/stop filters → ordered dedup) —
    the per-doc ordered counterpart of the global q_keyword_occurrences."""
    from ..keywords import extract_keywords

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang"])

    def kws(t: pa.Table) -> pa.Table:
        ids, poss, words = [], [], []
        for d, x, la in zip(t["doc_id"].to_pylist(), t["text"].to_pylist(),
                            t["lang"].to_pylist()):
            for i, kw in enumerate(extract_keywords(x or "", [], la or "")):
                ids.append(d)
                poss.append(i)
                words.append(kw)
        return pa.table(
            {"doc_id": pa.array(ids, t["doc_id"].type),
             "pos": pa.array(poss, pa.int64()),
             "keyword": pa.array(words, pa.string())}
        )

    return ds.map_batches(kws, batch_format="pyarrow")


def q_doc_spans_flat(sf_dir: str):
    """The flagship nested span column (BASELINE.json input_hint shape),
    exploded to one row per span — which makes the span SEQUENCE itself
    SQL-expressible: span_ord 0 is the body_text span, 1..n the first-seen
    ordered keywords (reference M7+M8 interleaving). Derived from the real
    nested ``doc_spans_pipeline`` output (list_flatten, zero-copy), so the
    oracle checks the nested column's content, not a parallel scalar path."""
    import pyarrow.compute as pc

    from .flagship import _spanify

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
        _spanify, batch_format="pyarrow"
    )

    def explode(t: pa.Table) -> pa.Table:
        spans = t["spans"].combine_chunks()
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans)
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"], parent),
                "span_ord": pc.cast(pc.struct_field(flat, "offset"), pa.int64()),
                "kind": pc.struct_field(flat, "kind"),
                "span_text": pc.struct_field(flat, "text"),
                "media_ref": pc.struct_field(flat, "media_ref"),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def q_infoseed(sf_dir: str):
    """Information-seed candidate pipeline end-to-end (pkg/infoseed):
    deterministic candidates derived from documents → URL normalization
    (tracking-param strip, port/fragment drop) → built-in filters (scheme,
    deny-list, min score) → JS candidate processor executing in minijs
    inside an actor-pool stage. The SQL twin replays every step (the
    candidate shapes are constructed, so normalization is expressible)."""
    from ..infoseed import (
        CandidateFilters,
        CandidateProcessorStage,
        apply_builtin_filters,
        normalize_candidates,
    )

    docs = _rp(sf_dir, "documents", ["doc_id"]).to_pandas()
    raw = []
    for d in docs["doc_id"]:
        d = int(d)
        v = d % 5
        score = (d % 10) / 10.0
        if v == 0:
            url = f"https://Host{d}.test:443/p?utm_source=x&q={d}"
        elif v == 1:
            url = f"http://host{d}.test/p"
        elif v == 2:
            url = f"ftp://host{d}.test/"
        elif v == 3:
            url = f"https://spam.test/{d}"
        else:
            url = f"https://host{d}.test/p#frag"
        raw.append({"url": url, "score": score, "doc_id": d})
    normalized, _ = normalize_candidates(raw)
    filtered, _ = apply_builtin_filters(
        normalized,
        CandidateFilters(denied_domains=("spam.test",),
                         required_schemes=("https",), min_score=0.3),
    )
    script = """
        var c = params.candidate;
        var accepted = c.score >= 0.5;
        var result = {
            accepted: accepted,
            score: accepted ? c.score + 0.1 : c.score,
            reason: accepted ? 'score ok' : 'score too low',
            tags: []
        };
    """
    ds = ray.data.from_arrow(pa.Table.from_pylist(
        [{k: v for k, v in c.items() if k != "doc_id"} for c in filtered]
    ))
    out = ds.map_batches(
        CandidateProcessorStage, fn_constructor_args=(script,),
        batch_format="pyarrow", concurrency=2,
    )
    return out.select_columns(["url", "host", "accepted", "score", "reason"])


def q_sample_docs(sf_dir: str, k: int = 50):
    """Deterministic bottom-k (hash-order) sample of documents: stable
    across runs/partitionings/cluster sizes, mergeable, and SQL-checkable
    (ORDER BY md5(doc_id) LIMIT k). Per-batch partial bottom-k; only k rows
    per batch reach the driver (``stages/sample.py``)."""
    from ..stages.sample import bottom_k_sample

    ds = _rp(sf_dir, "documents", ["doc_id", "lang"])
    out = bottom_k_sample(ds, "doc_id", k)
    out["sample_hash_hex"] = [format(h, "016x") for h in out["sample_hash"]]
    return pa.Table.from_pandas(
        out[["doc_id", "lang", "sample_hash_hex"]], preserve_index=False
    )


def q_value_histogram(sf_dir: str, width: float = 5.0):
    """Mergeable fixed-bin histogram over events.value (the scale path for
    percentile queries: per-batch bin counts sum-merge; quantiles read off
    the merged counts). Bin = floor(value/width) clamped to edge bins —
    exactly recomputable in SQL."""
    from ..stages.sketch import histogram_sketch, histogram_table

    ds = _rp(sf_dir, "events", ["value"])
    h = histogram_sketch(ds, "value", width=width)
    return pa.Table.from_pandas(histogram_table(h), preserve_index=False)


def q_cms_users(sf_dir: str, d: int = 4, w: int = 1024):
    """Count-Min frequency sketch over events.user_id: per-batch counter
    partials sum-merge on the driver (d*w*8 B per batch); nonzero counters
    as integer rows, recomputed exactly by the SQL twin."""
    from ..stages.sketch import cms_frequencies, cms_table

    ds = _rp(sf_dir, "events", ["user_id"])
    cms = cms_frequencies(ds, "user_id", d=d, w=w)
    return pa.Table.from_pandas(cms_table(cms), preserve_index=False)


def q_hll_users(sf_dir: str, b: int = 12):
    """HyperLogLog distinct-user sketch over events: per-batch register
    arrays (4 KiB each), driver max-merge, nonzero registers as integer
    rows — the register table is a pure function of the value set, so the
    DuckDB twin recomputes every register bit-for-bit (the estimate's
    accuracy is unit-tested separately)."""
    from ..stages.sketch import hll_distinct, hll_register_table

    ds = _rp(sf_dir, "events", ["user_id"])
    hll = hll_distinct(ds, "user_id", b=b)
    return pa.Table.from_pandas(hll_register_table(hll), preserve_index=False)


def q_extdetect(sf_dir: str):
    """External-detection fan-out (reference detection.go:758-867) over
    document-derived URLs with the deterministic fake transport — the
    sha256-based fake is exactly recomputable in SQL, so the whole plane
    (request construction → transport → result rows, confidence 10) runs
    under the oracle gate."""
    from ..extdetect import ExtDetectStage, FakeTransport

    ds = _rp(sf_dir, "documents", ["doc_id"])

    def to_urls(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {"url": pa.array([f"http://doc-{d}.test/" for d in ids])}
        )

    urls = ds.map_batches(to_urls, batch_format="pyarrow")
    return urls.map_batches(
        ExtDetectStage,
        fn_constructor_args=({"CDN": ["ssllabs"]},),
        fn_constructor_kwargs={"transport": FakeTransport()},
        batch_format="pyarrow",
        concurrency=2,
    )


def q_source_schedule(sf_dir: str, limit: int = 20):
    """Source claiming (reference ``update_sources``,
    ``postgresql-setup.pgsql:2826-2901``): a deterministic sources table is
    derived from per-user event activity, then the due-filter (re-crawl /
    error-retry / lease-expiry windows), (created_at, source_id) ordering
    and batch LIMIT run exactly as the reference's claim SQL. Eligibility
    filters distributed via map_batches; the bounded order/limit on the
    controller (``scheduler.claim_sources_ds``)."""
    from ..scheduler import ClaimPolicy, claim_sources_ds

    ev = _rp(sf_dir, "events", ["user_id", "ts"])

    def to_sources(df):
        g = df.groupby("user_id")["ts"]
        out = g.agg(created_at="min", last_ts="max").reset_index()
        return out

    # per-batch partial min/max then a tiny driver combine (users ≪ events)
    parts = ev.map_batches(to_sources, batch_format="pandas").to_pandas()
    src = parts.groupby("user_id").agg(
        created_at=("created_at", "min"), last_ts=("last_ts", "max")
    ).reset_index()
    now_s = src["last_ts"].max().timestamp()
    uid = src["user_id"].to_numpy()
    statuses = np.array(
        ["completed", "error", "pending", "new", "processing", ""], dtype=object
    )
    src["source_id"] = uid
    src["url"] = ["https://src-%d.test/" % u for u in uid]
    src["status"] = statuses[uid % 6]
    src["priority"] = np.array(["high", "medium", "low"], dtype=object)[uid % 3]
    src["disabled"] = uid % 17 == 0
    src["created_at"] = src["created_at"].map(lambda t: t.timestamp())
    last = src["last_ts"].map(lambda t: t.timestamp()).to_numpy()
    src["last_updated_at"] = np.where(uid % 11 == 0, np.nan, last)
    import ray.data as rd

    policy = ClaimPolicy(limit=limit, priority="high,medium",
                         regular_crawling="3 days")
    claimed = claim_sources_ds(
        rd.from_pandas(src.drop(columns=["last_ts"])), now_s, policy
    )
    out = claimed[["source_id", "url", "status", "priority", "engine"]]
    return pa.Table.from_pandas(out, preserve_index=False)


def q_dup_ngrams(sf_dir: str, n: int = 5):
    """Exact-substring dedup report: per-doc count of word 5-grams shared
    with other documents + the token coverage an exact-substring cut would
    remove (Lee-et-al-style duplicated-ngram detection; see
    ``stages/dedup.py:duplicate_ngram_stats`` for the two-shard scale
    shape). SQL twin groups the literal n-gram strings."""
    from ..stages.dedup import duplicate_ngram_stats

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = duplicate_ngram_stats(ds, n=n)
    return out.select_columns(["doc_id", "dup_ngrams", "dup_tokens"])


def q_fingerprint_family(sf_dir: str):
    """Fingerprint registry over documents (reference pkg/fingerprints):
    the oracle-checkable digest columns (ja3=md5, custom_tls=sha256); the
    non-SQL kinds (cityhash64, murmur3, tlsh, jarm) are unit-tested."""
    from ..fingerprints import FingerprintStage

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        FingerprintStage(["ja3", "custom_tls"]), batch_format="pandas",
        concurrency=2,
    )
    return out.map_batches(
        lambda df: df[["doc_id", "fp_ja3", "fp_custom_tls"]],
        batch_format="pandas",
    )


def q_exact_dedup(sf_dir: str):
    """Exact dedup keepers: (content_hash, doc_id=min id per hash)."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def add_md5(t: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5((x or "").encode("utf-8")).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return t.append_column("content_hash", pa.array(hashes, pa.string()))

    return (
        ds.map_batches(add_md5, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )


def q_langid(sf_dir: str):
    """Heuristic language ID (actor pool — marker tables in __init__)."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(LangIdStage, batch_format="pandas", concurrency=2)
    return out.select_columns(["doc_id", "lang_pred"])


def q_simhash(sf_dir: str):
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(simhash_stage, batch_format="pandas")
    return out.select_columns(["doc_id", "simhash"])


def q_minhash_pairs(sf_dir: str):
    """MinHash-LSH near-dup candidate pairs (rows-only check)."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return minhash_candidate_pairs(ds)


# ---------------------------------------------------------------------------
# embeddings: similarity search + near-dup
# ---------------------------------------------------------------------------


def _query_vec(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = t["vec_id"].to_pylist().index(vec_id)
    return np.asarray(t["embedding"][idx].as_py(), dtype=np.float64)


def q_ann_topk(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k vs the broadcast query vector (vec_id 0)."""
    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = _query_vec(sf_dir, 0)
    got = topk_cosine(ds, q, k=k, dtype=np.float64)
    got["cosine"] = got["cosine"].round(4)
    return got[["vec_id", "cosine"]]


def q_ann_ivf(sf_dir: str, k: int = 10):
    """IVF-Flat top-k with every list probed (nprobe = n_centroids), which
    is exact by construction — same oracle as the brute-force scan. The
    approximate path (nprobe < n_centroids) is recall-tested in pytest."""
    from ..stages.similarity import ivf_topk_cosine

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = _query_vec(sf_dir, 0)
    got = ivf_topk_cosine(ds, q, k=k, n_centroids=16, nprobe=16,
                          dtype=np.float64)
    got["cosine"] = got["cosine"].round(4)
    return got[["vec_id", "cosine"]]


def q_embedding_neardup(sf_dir: str, threshold: float = 0.35):
    """Same-label cosine near-dup pairs (bucketed brute force)."""
    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    pairs = embedding_neardup_pairs(ds, threshold, bucket_col="label")

    def round4(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = t.column_names.index("cosine")
        return t.set_column(i, "cosine", pc.round(t["cosine"], ndigits=4))

    return pairs.map_batches(round4, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# time-series aggregates (A4), dorking search (§2.8), attribute extraction
# (M13), scrape rules (M15) and tech detection (M19) over synthetic pages
# ---------------------------------------------------------------------------


def q_timeseries(sf_dir: str):
    """Per-(event_type, hour) bucket stats incl. linear-interp percentiles
    (reference time_series_aggregation.go semantics)."""
    from ..stages.timeseries import timeseries_aggregate

    ds = _rp(sf_dir, "events", ["event_type", "ts", "value", "user_id"])
    out = timeseries_aggregate(ds, "event_type", "ts", "value", "user_id", "h")
    # first/last/changes are within-bucket-order-dependent (pinned in unit
    # tests); the oracle-checked projection is the order-insensitive subset
    # avg is sum/n: a last-ulp sum difference can round apart at a 4-decimal
    # boundary (observed at sf0.01) — the checked projection keeps sum and n
    out = out.select_columns(
        ["metric", "bucket", "n", "sum_value", "min_value", "max_value",
         "p50", "p75", "p90", "p95", "p99", "distinct_entities"]
    )

    def _bucket_us(t: pa.Table) -> pa.Table:
        # the shard-agg pandas round-trip upcasts bucket to [ns]; the DuckDB
        # twin is [us] and the driver hash is dtype-sensitive — cast back
        i = t.schema.get_field_index("bucket")
        return t.set_column(i, "bucket", t["bucket"].cast(pa.timestamp("us")))

    return out.map_batches(_bucket_us, batch_format="pyarrow")


SEARCH_DORK = 'lang:en batch || lang:de merge &limit:50'


def q_search(sf_dir: str):
    """Dorking-language search over documents, deterministic order+limit."""
    from ..search import compile_predicate, parse

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    fn, query = compile_predicate(SEARCH_DORK)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        return df[fn(df)][["doc_id", "lang"]]

    out = ds.map_batches(apply, batch_format="pandas").sort("doc_id")
    if query.limit:
        out = out.limit(query.limit)
    return out


def q_attr_extract(sf_dir: str):
    """JSON-path attribute extraction over events.props (reference
    attribute-indexing M13) + grouped occurrence counts."""
    from ..jsonpath import extract

    ds = _rp(sf_dir, "events", ["props"])

    def extract_k(batch: pa.Table) -> pa.Table:
        import json as _json

        vals = []
        for p in batch["props"].to_pylist():
            try:
                obj = _json.loads(p or "{}")
            except ValueError:
                obj = {}
            got = extract(obj, "k")
            vals.extend(int(v) for v in got)
        return pa.table({"k_value": pa.array(vals, pa.int64())})

    from ..ops.agg import pre_aggregated_count

    return pre_aggregated_count(
        ds.map_batches(extract_k, batch_format="pyarrow"), ["k_value"], "occurrences"
    )


_SCRAPE_RULESET = """
ruleset_name: "synthweb"
rule_groups:
  - group_name: "pages"
    is_enabled: true
    scraping_rules:
      - rule_name: "page"
        elements:
          - key: "title"
            selectors:
              - selector_type: "css"
                selector: "title"
              - selector_type: "css"
                selector: "h1"
          - key: "first_link"
            selectors:
              - selector_type: "css"
                selector: "a"
                attribute: "href"
          - key: "generator"
            selectors:
              - selector_type: "xpath"
                selector: "//meta[@name='generator']"
                attribute: "content"
"""


def q_scrape_rules(sf_dir: str):
    """YAML scrape rules executed over deterministic synthetic pages
    (rows-only; selector semantics pinned by unit tests)."""
    from ..ruleset import ScrapeStage
    from ..sources.synthweb import CorpusConfig, page_html, page_url

    cfg = CorpusConfig(seed=42, n_hosts=10, base_pages=60)
    rows = {"url": [], "html": []}
    for h in range(cfg.n_hosts):
        for p in range(cfg.host_pages(h)):
            rows["url"].append(page_url(cfg, h, p))
            rows["html"].append(page_html(cfg, h, p))
    ds = ray.data.from_arrow(pa.table(rows))
    out = ds.map_batches(
        ScrapeStage,
        fn_constructor_args=(_SCRAPE_RULESET,),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )
    return out.select_columns(["url", "scraped_data"])


def q_tech_detect(sf_dir: str):
    """Tech-detection stage over synthetic pages (rows-only)."""
    from ..detection import DetectStage
    from ..sources.synthweb import CorpusConfig, page_html, page_url

    cfg = CorpusConfig(seed=42, n_hosts=10, base_pages=60)
    rows = {"url": [], "html": []}
    for h in range(cfg.n_hosts):
        for p in range(cfg.host_pages(h)):
            rows["url"].append(page_url(cfg, h, p))
            rows["html"].append(page_html(cfg, h, p))
    ds = ray.data.from_arrow(pa.table(rows))
    out = ds.map_batches(
        DetectStage, batch_format="pyarrow", batch_size=64, concurrency=2
    )
    return out.select_columns(["url", "detected_tech"])


_DOC_TECH_MARKERS = [
    # doc_id % 4 → markers injected into the derived page; each class
    # produces one deterministic detect() result the SQL twin re-states
    '<meta name="generator" content="WordPress 6.2"><div class="wp-content">x</div>',
    '<script src="/js/jquery-3.6.0.min.js"></script>',
    '<link href="/css/bootstrap.min.css" rel="stylesheet">',
    '<div data-reactroot="">x</div>',
]


def _doc_html(doc_id: int, lang: str, source: str, text: str) -> str:
    """documents row → deterministic HTML page (SQL-recomputable: plain
    string assembly, no randomness), so the real selector/detection engines
    can run under the DuckDB oracle gate."""
    words = (text or "").split()
    desc = " ".join(words[:10])
    marker = _DOC_TECH_MARKERS[int(doc_id) % 4]
    return (
        f'<html lang="{lang}"><head><title>Doc {doc_id} {source}</title>'
        f'<meta name="description" content="{desc}">'
        f"{marker}</head><body><p>{text}</p></body></html>"
    )


def _doc_pages(sf_dir: str):
    ds = _rp(sf_dir, "documents", ["doc_id", "lang", "source", "text"])

    def build(t: pa.Table) -> pa.Table:
        htmls = [
            _doc_html(d, la, s, x)
            for d, la, s, x in zip(
                t["doc_id"].to_pylist(), t["lang"].to_pylist(),
                t["source"].to_pylist(), t["text"].to_pylist(),
            )
        ]
        return pa.table(
            {"doc_id": t["doc_id"],
             "url": pa.array([f"doc://{d}" for d in t["doc_id"].to_pylist()]),
             "html": pa.array(htmls, pa.string())}
        )

    return ds.map_batches(build, batch_format="pyarrow")


_DOC_SCRAPE_RULESET = """
ruleset_name: "docpages"
rule_groups:
  - group_name: "docs"
    is_enabled: true
    scraping_rules:
      - rule_name: "doc"
        elements:
          - key: "title"
            selectors:
              - selector_type: "css"
                selector: "title"
          - key: "description"
            selectors:
              - selector_type: "xpath"
                selector: "//meta[@name='description']"
                attribute: "content"
          - key: "body"
            selectors:
              - selector_type: "css"
                selector: "p"
"""


def q_scrape_docs(sf_dir: str):
    """The real YAML scrape-rule executor (selector engine, attribute
    extraction) over documents-derived HTML — DuckDB recomputes the
    expected title/description/body per row, so the whole selector path is
    oracle-checked. The synthweb-page variant stays as the rows-only
    q_scrape_rules."""
    import json as _json

    from ..ruleset import ScrapeStage

    out = _doc_pages(sf_dir).map_batches(
        ScrapeStage,
        fn_constructor_args=(_DOC_SCRAPE_RULESET,),
        batch_format="pyarrow",
        batch_size=128,
        concurrency=2,
    )

    def explode(t: pa.Table) -> pa.Table:
        rows = [_json.loads(s) for s in t["scraped_data"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "title": pa.array([r.get("title", "") for r in rows], pa.string()),
                "description": pa.array(
                    [r.get("description", "") for r in rows], pa.string()
                ),
                "body": pa.array([r.get("body", "") for r in rows], pa.string()),
            }
        )

    return out.map_batches(explode, batch_format="pyarrow")


_CT_EXTS = [".html", ".json", ".pdf", ".png", ".jpg", ".mp4",
            ".css", ".zip", ".xml", ".xyz", "", ".csv"]


def q_content_type(sf_dir: str):
    """The real content-type detector (M10: HTML sniff first, then the
    reference's docTypeMap extension map, else UNKNOWN —
    pkg/crawler/web.go:3044-3088 + types.go:323-413) over
    documents-derived URLs/payloads: extension cycles through the map
    (incl. an unmapped .xyz and an extension-less path), every 7th doc
    carries a sniffable '<!doctype html' payload that must override the
    extension. The SQL twin re-states the decision table."""
    from ..content_type import infer_document_type

    ds = _rp(sf_dir, "documents", ["doc_id", "source", "text"])

    def detect(t: pa.Table) -> pa.Table:
        mimes = []
        for d, s, x in zip(t["doc_id"].to_pylist(), t["source"].to_pylist(),
                           t["text"].to_pylist()):
            ext = _CT_EXTS[int(d) % 12]
            url = f"https://{s}.example.test/files/item{d}{ext}"
            content = (f"<!doctype html><p>{x or ''}</p>"
                       if int(d) % 7 == 0 else (x or ""))
            mimes.append(infer_document_type(url, content))
        return pa.table({"doc_id": t["doc_id"],
                         "mime": pa.array(mimes, pa.string())})

    return ds.map_batches(detect, batch_format="pyarrow")


_DOC_VALIDATION_CONFIG = {
    "load_validation": {
        "groups": [
            {   # even doc ids: the body paragraph must mention 'scan'
                "url_pattern": r"doc://\d*[02468]$",
                "on_fail": "skip",
                "validations": [
                    {"dom_checks": [{
                        "selector": "p",
                        "conditions": [
                            {"type": "text", "pattern": r"\bscan\b"}],
                    }]},
                ],
            },
            {   # odd doc ids: the meta description must START with
                # 'scan'; a failing check asks for a per-validation retry
                "url_pattern": r"doc://\d*[13579]$",
                "validations": [
                    {"dom_checks": [{
                        "selector": "meta",
                        "conditions": [
                            {"type": "attribute", "attribute": "content",
                             "pattern": r"^scan\b"}],
                    }],
                        "on_fail": "retry", "max_retries": 2},
                ],
            },
        ],
    }
}


def q_page_validation(sf_dir: str):
    """The real page-load validator (M18:
    pkg/crawler/page_validation.go semantics — url_pattern group gate,
    dom_checks with text/attribute conditions, per-validation retry
    precedence, group on_fail skip) over documents-derived pages. Every
    decision is a pure function of (doc_id parity, text content), which
    the SQL twin re-states."""
    from ..page_validation import apply_load_validation

    def validate(t: pa.Table) -> pa.Table:
        valid, action, retries = [], [], []
        for d, h, u in zip(t["doc_id"].to_pylist(), t["html"].to_pylist(),
                           t["url"].to_pylist()):
            st = apply_load_validation(_DOC_VALIDATION_CONFIG, h, u)
            valid.append(1 if st.valid else 0)
            action.append(st.action)
            retries.append(st.max_retries)
        return pa.table({
            "doc_id": t["doc_id"],
            "valid": pa.array(valid, pa.int64()),
            "action": pa.array(action, pa.string()),
            "max_retries": pa.array(retries, pa.int64())})

    return _doc_pages(sf_dir).map_batches(validate, batch_format="pyarrow",
                                          batch_size=128)


def q_transforms(sf_dir: str):
    """The real post-processing transforms (M16:
    pkg/scraper/transforms.go — clean-step chain, regex remove, JSON
    validate) over documents-derived dirty scraped values. The dirty
    value is plain string assembly, so DuckDB replays the whole chain
    with regexp_replace/trim and a CASE for the validity flag."""
    from ..transforms import (transform_clean, transform_remove,
                              transform_validate)

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def apply(t: pa.Table) -> pa.Table:
        cleaned, valid = [], []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            raw = (f"<b>Doc &amp; {d}</b>  {(x or '')[:40]}\n"
                   f" tail {int(d) % 100}")
            c = transform_clean(raw, [
                "decode_html_entities", "remove_html", "remove_numbers",
                "remove_extra_whitespace"])
            c = transform_remove(c, r"\btail\b").strip()
            payload = '{"k": %d}' % d if int(d) % 5 else "{broken"
            cleaned.append(c)
            valid.append(1 if transform_validate(payload, ["k"]) else 0)
        return pa.table({"doc_id": t["doc_id"],
                         "cleaned": pa.array(cleaned, pa.string()),
                         "valid_json": pa.array(valid, pa.int64())})

    return ds.map_batches(apply, batch_format="pyarrow")


def q_servicescout(sf_dir: str):
    """The real ServiceScout nmap-options builder (M23:
    serviceescout.go:118-297 — scan-type flags, DNS fallbacks, service
    detection port ranges, the non-numeric-timing-template early return
    that skips scan-delay, the double -sS/-sO quirk) over
    documents-derived configs. The argv is a pure function of doc_id,
    which the SQL twin re-states with concat_ws CASE pieces."""
    from ..serviceescout import build_nmap_args

    ds = _rp(sf_dir, "documents", ["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        argvs = []
        for d in t["doc_id"].to_pylist():
            d = int(d)
            cfg = {
                "udp_scan": d % 2 == 0,
                "syn_scan": d % 3 == 0,
                "service_detection": d % 4 == 0,
                "max_port_number": 1000 + d % 5,
                "os_finger_print": d % 5 == 0,
                # non-numeric template aborts timing (incl. scan-delay)
                "timing_template": str(d % 6) if d % 7 else "fast",
                "scan_delay": "0.5" if d % 2 else "",
                "max_retries": d % 3,
                "no_dns_resolution": d % 2 == 1,
            }
            argvs.append(" ".join(
                build_nmap_args(cfg, f"10.0.0.{d % 250}", "linux")))
        return pa.table({"doc_id": t["doc_id"],
                         "argv": pa.array(argvs, pa.string())})

    return ds.map_batches(build, batch_format="pyarrow")


def q_tech_detect_docs(sf_dir: str):
    """The real tech-detection engine (regex signatures, confidence curve,
    implied-stack closure) over documents-derived HTML with per-class
    markers — the detect() JSON is a pure function of doc_id % 4, which the
    SQL twin re-states. The synthweb variant stays rows-only."""
    from ..detection import DetectStage

    out = _doc_pages(sf_dir).map_batches(
        DetectStage, batch_format="pyarrow", batch_size=128, concurrency=2
    )
    return out.select_columns(["doc_id", "detected_tech"])


def q_xhr_requests(sf_dir: str):
    """Network-log collection (M21 as data effects) over documents-derived
    pages: the subresource requests a browser would issue on load, in DOM
    order — the marker assets are a pure function of doc_id % 4, which the
    SQL twin re-states."""
    from ..stages.netlog import XhrCollectStage

    out = _doc_pages(sf_dir).map_batches(
        XhrCollectStage(id_col="doc_id"), batch_format="pyarrow",
        batch_size=128, concurrency=2,
    )
    return out


def q_search_ranked(sf_dir: str):
    """Dorking search + FTS-style ranking (reference search_pages analog):
    filter by the query, score = total term occurrences, top-20 by
    (score DESC, doc_id)."""
    from ..search import compile_predicate, term_frequency_score

    dork = "lang:en batch || lang:en merge"
    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    fn, _ = compile_predicate(dork)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        hit = df[fn(df)].copy()
        hit["score"] = term_frequency_score(hit, dork)
        return hit[["doc_id", "score"]]

    return (
        ds.map_batches(apply, batch_format="pandas")
        .sort([("score"), ("doc_id")], descending=[True, False])
        .limit(20)
    )


def q_nation_revenue(sf_dir: str, join_threshold: int = 1_000_000):
    """Three-table chain: orders → customer → nation. Customer attaches by
    broadcast map while small, by native ``Dataset.join`` above
    ``join_threshold`` rows; nation (25 rows at every scale) is always a
    broadcast lookup."""
    orders = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust_ds = _rp(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _rp(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n2name = dict(zip(nation.n_nationkey, nation.n_name))

    if cust_ds.count() > join_threshold:
        with_nat = orders.join(
            cust_ds, join_type="inner", num_partitions=16,
            on=("o_custkey",), right_on=("c_custkey",),
        )
        nref = ray.put(n2name)

        def name_of(df: pd.DataFrame) -> pd.DataFrame:
            df["n_name"] = df["c_nationkey"].map(ray.get(nref))
            return df[["n_name", "o_totalprice"]]

        keyed = with_nat.map_batches(name_of, batch_format="pandas")
    else:
        cust = cust_ds.to_pandas()
        c2n = dict(zip(cust.c_custkey, cust.c_nationkey))
        lookup = ray.put((c2n, n2name))

        def add_nation(df: pd.DataFrame) -> pd.DataFrame:
            c2n_, n2name_ = ray.get(lookup)
            df["n_name"] = df["o_custkey"].map(c2n_).map(n2name_)
            return df[["n_name", "o_totalprice"]]

        keyed = orders.map_batches(add_nation, batch_format="pandas")

    out = (
        keyed.groupby("n_name")
        .aggregate(Count(alias_name="n_orders"),
                   Sum("o_totalprice", alias_name="total_revenue"))
        .to_pandas()
    )
    out["total_revenue"] = out["total_revenue"].round(2)
    return out


def q_events_top_users(sf_dir: str, k: int = 10):
    """Top-k users by total event value (combiner + small sort)."""
    ds = _rp(sf_dir, "events", ["user_id", "value"])
    agg = pre_aggregated_sum(ds, ["user_id"], "value", "total_value")
    out = (
        agg.to_pandas()
        .sort_values(["total_value", "user_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out["total_value"] = out["total_value"].round(4)
    return out


def q_monthly_orders(sf_dir: str):
    """Monthly tumbling window over orders (combiner: ~80 partial rows per
    batch enter the shuffle instead of every order)."""
    ds = _rp(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["month"] = df["o_orderdate"].dt.to_period("M").dt.to_timestamp()
        return df.groupby("month", sort=False, as_index=False).agg(
            n_orders=("o_totalprice", "size"),
            total_price=("o_totalprice", "sum"),
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("month")
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("total_price", alias_name="total_price"))
        .to_pandas()
    )
    out["total_price"] = out["total_price"].round(2)
    out["month"] = out["month"].astype("datetime64[us]")
    return out


def q_media_decode(sf_dir: str):
    """Multimodal pipeline over documents-derived media (payload = UTF-8
    text bytes, mime by doc_id%4): binary column → decode (stubbed codec,
    real actor-pool plumbing) → resize plan → frame-sample plan. The
    metadata is deterministic sha256/byte-length arithmetic, so the whole
    pipeline is DuckDB-oracle-checked."""
    from ..stages.multimodal import (
        DecodeStage,
        frame_sample_plan,
        media_from_documents,
        resize_plan_stage,
    )

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = (
        ds.map_batches(media_from_documents, batch_format="pyarrow")
        .map_batches(DecodeStage, batch_format="pyarrow", batch_size=64,
                     concurrency=2)
        .map_batches(resize_plan_stage, batch_format="pyarrow")
        .map_batches(frame_sample_plan, batch_format="pyarrow")
    )

    def cast64(t: pa.Table) -> pa.Table:
        # int32 metadata → int64 so the Ray schema matches DuckDB BIGINT
        for col in ("width", "height", "duration_ms", "target_width",
                    "target_height"):
            idx = t.schema.get_field_index(col)
            t = t.set_column(idx, col, pc.cast(t[col], pa.int64()))
        return t

    return out.select_columns(
        ["media_id", "doc_id", "mime", "kind", "byte_len", "width", "height",
         "duration_ms", "target_width", "target_height"]
    ).map_batches(cast64, batch_format="pyarrow")


def q_media_real(sf_dir: str):
    """Real-codec round-trip gate: build REAL PNG/JPEG/WAV/MP4 payloads
    whose dims/durations are pure formulas of doc_id, then decode them
    with the pure-numpy codecs and report the MEASURED metadata. The SQL
    twin recomputes the formulas — equality means encoder and decoder
    agree end-to-end for all four formats. Capped at doc_id < 1000 (codec
    work per row is real; the cap keeps the battery fast and is mirrored
    in the SQL twin)."""
    from ..stages.multimodal import DecodeStage, real_media_from_documents

    ds = _rp(sf_dir, "documents", ["doc_id"]).filter(
        expr="doc_id < 1000")
    out = (
        ds.map_batches(real_media_from_documents, batch_format="pyarrow",
                       batch_size=128)
        .map_batches(DecodeStage(real_codec=True, strict=True),
                     batch_format="pyarrow", batch_size=64, concurrency=4)
    )

    def cast64(t: pa.Table) -> pa.Table:
        for col in ("width", "height", "duration_ms", "n_frames"):
            idx = t.schema.get_field_index(col)
            t = t.set_column(idx, col, pc.cast(t[col], pa.int64()))
        return t

    return out.select_columns(
        ["media_id", "doc_id", "mime", "kind", "width", "height",
         "duration_ms", "n_frames"]
    ).map_batches(cast64, batch_format="pyarrow")


def q_media_frames(sf_dir: str):
    """Real video frame sampling: MP4 rows → per-frame rows (measured
    dims, timestamps) at 2 fps. SQL twin recomputes frame count/dims/
    timestamps from the generator formulas (frames at 4 fps, sampled
    every 500 ms → indices 0, 2, 4)."""
    from ..stages.multimodal import FrameSampleStage, real_media_from_documents

    ds = _rp(sf_dir, "documents", ["doc_id"]).filter(
        expr="doc_id < 1000")
    out = (
        ds.map_batches(real_media_from_documents, batch_format="pyarrow",
                       batch_size=128)
        .map_batches(FrameSampleStage(fps=2.0), batch_format="pyarrow",
                     batch_size=64, concurrency=4)
    )

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": t["media_id"],
            "doc_id": t["doc_id"],
            "frame_idx": pc.cast(t["frame_idx"], pa.int64()),
            "ts_ms": t["ts_ms"],
            "width": pc.cast(t["width"], pa.int64()),
            "height": pc.cast(t["height"], pa.int64()),
        })

    return out.map_batches(shape, batch_format="pyarrow")


def q_order_lineitem_join(sf_dir: str):
    """Large-large hash join (native Dataset.join, hash-partitioned): orders
    ⋈ lineitem → revenue per order priority. The 'both sides large' join
    class the reference delegates to SQL (SURVEY.md §2.4)."""
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    items = _rp(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev_per_order(df: pd.DataFrame) -> pd.DataFrame:
        # partial aggregate BELOW the join: collapse lineitems to one row
        # per orderkey per batch (~4x fewer rows enter the join shuffle;
        # the join stays genuinely large-large)
        df["revenue"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        g = df.groupby("l_orderkey", as_index=False, sort=False).agg(
            n_lineitems=("revenue", "size"), revenue=("revenue", "sum")
        )
        return g

    items = items.map_batches(rev_per_order, batch_format="pandas")
    joined = items.join(
        orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    out = (
        joined.groupby("o_orderpriority")
        .aggregate(
            Sum("n_lineitems", alias_name="n_lineitems"),
            Sum("revenue", alias_name="total_revenue"),
        )
        .to_pandas()
    )
    out["n_lineitems"] = out["n_lineitems"].astype("int64")
    out["total_revenue"] = out["total_revenue"].round(2)
    return out


def q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs with exact hamming verification (rows-only)."""
    from ..stages.dedup import simhash_candidate_pairs

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return simhash_candidate_pairs(ds, max_hamming=12)


def q_whois(sf_dir: str):
    """WHOIS parse plane (pkg/netinfo/whoisinfo.go:130-287): documents →
    deterministic whois fixture text → distributed parse → field columns.
    The SQL twin recomputes every field from doc_id arithmetic, so the
    parser is checked against an independent formula."""
    from ..stages.enrich import whois_parse_stage, whois_text_from_documents

    ds = _rp(sf_dir, "documents", ["doc_id"])
    return (
        ds.map_batches(whois_text_from_documents, batch_format="pyarrow")
        .map_batches(whois_parse_stage, batch_format="pyarrow")
    )


def q_dns_records(sf_dir: str):
    """DNS (dig output) parse plane (pkg/netinfo/dnsinfo.go:154-268):
    documents → deterministic dig fixture text → distributed parse →
    per-doc record summary, SQL-twinned via doc_id arithmetic."""
    from ..stages.enrich import dig_text_from_documents, dns_parse_stage

    ds = _rp(sf_dir, "documents", ["doc_id"])
    return (
        ds.map_batches(dig_text_from_documents, batch_format="pyarrow")
        .map_batches(dns_parse_stage, batch_format="pyarrow")
    )


def q_correlations(sf_dir: str):
    """Object-correlation upsert plane
    (pkg/database/entity_correlation_timeseries.go:238-293): documents →
    deterministic correlation rows (reversed pairs exercise ordering
    normalization, duplicate keys exercise last-win upsert, planted
    self-pairs / out-of-range scores exercise validation) → normalize →
    validate → sharded last-win upsert. SQL twin replays the same
    generator with window-function dedup."""
    import pyarrow as pa

    from ..correlation import upsert_correlations, validate_correlations

    def gen(batch: pa.Table) -> pa.Table:
        rows = []
        for d in batch["doc_id"].to_pylist():
            # normal pair; odd doc_ids arrive reversed
            t1, i1, t2, i2 = "document", d + 1, "lang", d % 5 + 1
            if d % 2 == 1:
                t1, i1, t2, i2 = t2, i2, t1, i1
            score = (d % 100) / 100.0
            if d % 19 == 0:
                score = 1.5  # invalid → dropped by validation
            rows.append({"object_type_1": t1, "object_id_1": i1,
                         "object_type_2": t2, "object_id_2": i2,
                         "rule_id": 1, "score": score,
                         "confidence": (d % 10) / 10.0, "seq": 2 * d})
            if d % 10 == 0:
                # duplicate conflict key, later seq, different score →
                # last-win keeps this one
                rows.append({"object_type_1": "document",
                             "object_id_1": d + 1,
                             "object_type_2": "lang",
                             "object_id_2": d % 5 + 1,
                             "rule_id": 1, "score": 0.42,
                             "confidence": (d % 10) / 10.0,
                             "seq": 2 * d + 1})
            if d % 17 == 0:
                # self-correlation → dropped
                rows.append({"object_type_1": "document",
                             "object_id_1": d + 1,
                             "object_type_2": "document",
                             "object_id_2": d + 1,
                             "rule_id": 1, "score": 0.1,
                             "confidence": 0.1, "seq": 2 * d})
        return pa.Table.from_pylist(rows)

    ds = _rp(sf_dir, "documents", ["doc_id"])
    out = upsert_correlations(
        ds.map_batches(gen, batch_format="pyarrow")
        .map_batches(validate_correlations, batch_format="pyarrow"))
    return out.select_columns(
        ["object_type_1", "object_id_1", "object_type_2", "object_id_2",
         "rule_id", "score", "confidence"])


def q_backfill(sf_dir: str):
    """Entity-observation backfill
    (entity_correlation_timeseries.go:360-508) over events-derived
    observations: event rows become observations (entity pre-set on
    event_id%7==0 rows → excluded; dims pre-populated on %11==0 rows →
    merge-if-absent visible), memberships exist for user_id%3!=0 with two
    entities per user (MIN wins). SQL twin recomputes the join + the
    dimension-merge rule directly."""
    import pandas as pd
    import pyarrow as pa

    from ..correlation import backfill_observation_entities

    events = _rp(sf_dir, "events", ["event_id", "ts", "user_id"])

    def to_obs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.rename(columns={"event_id": "observation_id",
                                "ts": "observed_at"})
        df["object_type"] = "user"
        df["object_id"] = df["user_id"]
        df["entity_id"] = pd.array(
            [9999.0 if o % 7 == 0 else None
             for o in df["observation_id"]], dtype="Float64")
        df["dimensions"] = [
            '{"confidence": 0.9}' if o % 11 == 0 else "{}"
            for o in df["observation_id"]]
        df["provenance"] = "{}"
        return pa.Table.from_pandas(
            df.drop(columns=["user_id"]), preserve_index=False
        ).replace_schema_metadata(None)

    obs_ds = events.map_batches(to_obs, batch_format="pyarrow")
    # membership side: distinct users (small dimension — broadcast side)
    users = events.select_columns(["user_id"]).to_pandas()[
        "user_id"].drop_duplicates()
    users = users[users % 3 != 0]
    mem = pd.DataFrame({
        "entity_id": pd.concat([1000 + users % 50, 2000 + users]),
        "object_type": "user",
        "object_id": pd.concat([users, users]),
        "confidence": pd.concat([(users % 5) / 5.0, (users % 5) / 5.0]),
        "evidence": None,
        "membership_role": "member",
        "membership_type": "auto",
    })
    # one bounded maintenance run (the reference processes backfills in
    # capped transactional batches, never whole-table): 3 × 2000 rows
    updated, _res = backfill_observation_entities(
        obs_ds, mem, after_observation_id=100, batch_size=2000,
        max_batches=3)
    if not len(updated):
        return pd.DataFrame({"observation_id": [], "entity_id": [],
                             "dim_confidence": []})
    import json as _json

    updated["dim_confidence"] = [
        _json.loads(d)["confidence"] for d in updated["dimensions"]]
    return updated[["observation_id", "entity_id", "dim_confidence"]]


def q_httpinfo(sf_dir: str):
    """HTTPDetails header-analysis plane (pkg/httpinfo) over
    documents-derived response headers: each doc gets a deterministic
    header set (server token, HSTS policy, cookie flags, XFO/CSP — a pure
    function of doc_id that the SQL twin re-states), which flows through
    the REAL header parser + detection stage
    (httpinfo.analyze_headers / parse_set_cookie / TechDetector) in an
    actor pool."""
    import json as _json

    from ..httpinfo import HttpHeaderAnalyzeStage

    ds = _rp(sf_dir, "documents", ["doc_id"])

    def synth_headers(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id in df["doc_id"]:
            d = int(doc_id)
            server = ["nginx/1.25", "Apache/2.4.57", "cloudflare"][d % 3]
            headers = {"Server": [server], "Content-Type": ["text/html"]}
            if d % 2 == 0:
                v = f"max-age={300 + (d % 7) * 100}"
                if d % 4 == 0:
                    v += "; includeSubDomains"
                headers["Strict-Transport-Security"] = [v]
            cookies = [f"sid={d}; Path=/" + ("; HttpOnly" if d % 2 == 0
                                             else "")]
            if d % 5 == 0:
                cookies.append("pref=1; Secure; SameSite=Lax")
            headers["Set-Cookie"] = cookies
            if d % 3 == 0:
                headers["X-Frame-Options"] = ["DENY"]
            if d % 6 == 0:
                headers["Content-Security-Policy"] = ["default-src 'self'"]
            rows.append({"doc_id": doc_id,
                         "headers_json": _json.dumps(headers)})
        return pd.DataFrame(rows)

    return ds.map_batches(synth_headers, batch_format="pandas").map_batches(
        HttpHeaderAnalyzeStage, batch_format="pandas",
        batch_size=256, concurrency=2,
    )


class _KeywordEmitStage:
    """Actor-pool stage: metric registry + emitter config built once per
    actor; per batch, each (doc, keyword, occurrences) triple flows through
    the REAL emission path (ts_emitter.Emitter.emit_indexed_artifact:
    selector match → count parse → bucket bounds → dedupe key → provenance
    + hashes), and the prepared observations come out as rows."""

    def __init__(self):
        from datetime import datetime, timezone

        from ..ts_emitter import Emitter, InMemoryRepository, Metric

        self._mk = lambda: InMemoryRepository([Metric(
            id=1, key="all_keywords", source_kind="keyword",
            value_type="count", bucket="1d", dedupe_scope="none",
            selector={})])
        self._Emitter = Emitter
        self._base = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        from datetime import timedelta

        from ..ts_emitter import IndexedArtifactInput

        repo = self._mk()
        emitter = self._Emitter(repo, now=lambda: self._base)
        stop = STOP_WORDS["en"]
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            toks = [t for t in (text or "").lower().split()
                    if 3 <= len(t) <= 45 and t not in stop]
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            observed = self._base + timedelta(hours=int(doc_id) % 72)
            for i, (kw, occ) in enumerate(sorted(counts.items())):
                emitter.emit_indexed_artifact(IndexedArtifactInput(
                    source_kind="keyword", index_id=int(doc_id),
                    row_id=i, link_id=int(doc_id), subject_key=kw,
                    value=occ, occurrences=occ, observed_at=observed))
        rows = [{
            "keyword": o["provenance"]["normalized_keyword"],
            "bucket_start": o["bucket_start"].replace(tzinfo=None),
            "occ": int(o["value"]["integer"]),
        } for o in repo.observations]
        obs = pd.DataFrame(rows, columns=["keyword", "bucket_start", "occ"])
        # per-batch combiner: the downstream groupby moves
        # O(groups-per-batch × batches) partial rows, not every observation.
        # Arrow out — this stage feeds a groupby (pandas exchanges tax
        # sort-aggregates ~25x; measured r3s8).
        part = (
            obs.groupby(["keyword", "bucket_start"], sort=False)["occ"]
            .agg(n_obs="size", sum_occ="sum")
            .reset_index()
            .astype({"n_obs": "int64", "sum_occ": "int64"})
        )
        return pa.Table.from_pandas(part, preserve_index=False)


def q_ts_emitted(sf_dir: str):
    """Time-series emitter plane (pkg/timeseries/emitter.go +
    indexed_artifact.go) fed by INDEXED artifacts, not synthetic events:
    per-doc keyword occurrences are emitted as observations through the
    full emission path in an actor pool, then aggregated per
    (keyword, 1d bucket) — the SQL twin recomputes occurrences and bucket
    arithmetic from the raw documents."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    # fixed pool: autoscale's ramp (2→8) costs ~3 s on this ~4 s stage;
    # the emission path is pure-Python per keyword, so spin all 8 up front.
    # repartition(4) coalesces the per-batch partials before the groupby —
    # a 32-block sort-aggregate of KB-scale partials is pure fixed overhead
    obs = ds.map_batches(_KeywordEmitStage, batch_format="pandas",
                         batch_size=128,
                         concurrency=_pool_size()).repartition(4)
    out = (
        obs.groupby(["keyword", "bucket_start"])
        .aggregate(Sum("n_obs", alias_name="n_obs"),
                   Sum("sum_occ", alias_name="sum_occ"))
        .to_pandas()
    )
    out["n_obs"] = out["n_obs"].astype("int64")
    out["sum_occ"] = out["sum_occ"].astype("int64")
    # [us] matches the DuckDB twin (the r4 driver-red row was a dtype hash
    # artifact: float64 SUM + [ns] bucket vs the oracle's BIGINT + [us])
    out["bucket_start"] = out["bucket_start"].astype("datetime64[us]")
    return out


# ---------------------------------------------------------------------------
# S6 screenshot plane: full scroll-stitch capture over documents-derived
# pages (pkg/crawler/web.go:308-706). The geometry the SQL twin recomputes
# — page height, slice count — falls out of the deterministic layout
# (title band + one 6-px row band per HTML line); the PNG stitch, byte
# sizes, hashes and storage writes are real and pinned by pytest
# (tests/test_screenshot.py).


class _ScreenshotRenderStage:
    """Actor-pool stage: per page, drive the real take_screenshot path
    (scroll scripts → viewport slices → stitch → PNG encode → local store)
    against the deterministic SyntheticDriver paint."""

    VIEWPORT = (120, 256)

    def __init__(self, out_dir: str | None = None):
        import os
        import tempfile

        from ..screenshot import FileStorageAPI

        self.out_dir = out_dir or tempfile.mkdtemp(prefix="crowler_ss_")
        os.makedirs(self.out_dir, exist_ok=True)
        self.storage = FileStorageAPI(path=self.out_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..screenshot import SyntheticDriver, take_screenshot

        doc_ids, widths, heights, slices, sizes = [], [], [], [], []
        for d, html in zip(batch["doc_id"].to_pylist(),
                           batch["html"].to_pylist()):
            drv = SyntheticDriver(html or "", viewport=self.VIEWPORT)
            ss = take_screenshot(drv, f"{int(d)}.png", storage=self.storage)
            doc_ids.append(int(d))
            widths.append(ss.width)
            heights.append(ss.height)
            slices.append(-(-ss.height // self.VIEWPORT[0]))
            sizes.append(ss.byte_size)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "width": pa.array(widths, pa.int64()),
            "height": pa.array(heights, pa.int64()),
            "n_slices": pa.array(slices, pa.int64()),
            "png_ok": pa.array([s > 8 for s in sizes], pa.bool_()),
        })


def _doc_multiline_pages(sf_dir: str):
    """documents → multi-line HTML (one <p> line per 2-word chunk — narrow
    enough that page heights actually spread over multiple viewports) so
    page height is a pure function of the word count the oracle can
    recompute."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def build(t: pa.Table) -> pa.Table:
        htmls = []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            words = (x or "").split()
            chunks = [" ".join(words[i:i + 2])
                      for i in range(0, len(words), 2)]
            lines = [f"<html><head><title>Doc {int(d)}</title></head>"]
            lines += [f"<p>{c}</p>" for c in chunks]
            lines.append("</body></html>")
            htmls.append("\n".join(lines))
        return pa.table({"doc_id": t["doc_id"],
                         "html": pa.array(htmls, pa.string())})

    return ds.map_batches(build, batch_format="pyarrow")


def q_screenshots(sf_dir: str):
    """Screenshot capture geometry over documents-derived pages: height =
    max(viewport, 24 + 6 * line_count), slices = ceil(height / viewport) —
    both SQL-recomputable from the text word count; the real scroll-stitch
    PNG path runs per row in the actor pool."""
    out = _doc_multiline_pages(sf_dir).map_batches(
        _ScreenshotRenderStage, batch_format="pyarrow", batch_size=64,
        concurrency=_pool_size(),  # fixed pool — autoscale ramp dominates
    )
    return out.sort("doc_id").to_pandas()


def q_dedup_clusters(sf_dir: str):
    """Near-dup CLUSTER assignment: MinHash-LSH candidate pairs →
    distributed connected components (large-star/small-star,
    ``stages/cluster.py``) → (doc_id, cluster_id = component min). This is
    the operator that turns pairwise candidates into keep/drop decisions —
    chains (A~B, B~C) collapse into one cluster even when A and C never
    share a bucket. The SQL twin recomputes the same pairs bit-exactly and
    closes them with a recursive CTE."""
    from ..stages.cluster import connected_components

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_candidate_pairs(ds)
    out = connected_components(pairs).to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "cluster_id": pd.Series([], dtype="int64")})
    out = out.rename(columns={"node": "doc_id", "label": "cluster_id"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q_pii_redact(sf_dir: str):
    """PII scrub over documents with deterministic injected PII (each doc
    gets an email / ssn / ip / phone derived from its doc_id — the SQL twin
    derives the identical text): RE2 detection counts + ordered redaction,
    all via Arrow compute kernels (``stages/pii.py``). No pandas, no Python
    loop; at 100 TB this is a pure streaming map."""
    from ..stages.pii import pii_stage

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        text = pc.binary_join_element_wise(
            t["text"], " contact user",
            pc.cast(t["doc_id"], pa.string()),
            "@mail.example.com or +1 555 013 ",
            pa.array(np.char.zfill((did % 10000).astype("U4"), 4)),
            " ssn 123-45-6789 host 10.0.",
            pa.array((did % 256).astype("U3")), ".7 end",
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "text": text})

    out = ds.map_batches(inject, batch_format="pyarrow").map_batches(
        pii_stage, batch_format="pyarrow"
    )
    return out.select_columns(
        ["doc_id", "n_email", "n_ssn", "n_ip", "n_phone", "redacted_len"]
    )


def q_line_dedup(sf_dir: str):
    """Intra-document repetition removal over documents with the text
    doubled (text + ' ' + text — deterministic, SQL-derivable) so repeated
    6-word lines actually occur: first-win line dedup, repetition ratio,
    md5 of the deduped text (``stages/text_analysis.py:line_dedup_stage``)."""
    from ..stages.text_analysis import line_dedup_stage

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def double(t: pa.Table) -> pa.Table:
        text = pc.binary_join_element_wise(t["text"], t["text"], " ")
        return pa.table({"doc_id": t["doc_id"], "text": text})

    out = ds.map_batches(double, batch_format="pyarrow").map_batches(
        line_dedup_stage, batch_format="pandas"
    )
    return out.select_columns(
        ["doc_id", "n_lines", "n_distinct_lines", "dup_line_ratio",
         "dedup_md5"]
    )


def q_global_line_dedup(sf_dir: str):
    """Corpus-GLOBAL line dedup (C4 recipe): every distinct 6-word line is
    kept once corpus-wide at its first (doc_id, line_no) occurrence; later
    occurrences anywhere are cut (``stages/dedup.py:global_line_dedup``).
    Slim (md5, rank) rows shuffle; text never does."""
    from ..stages.dedup import global_line_dedup

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return global_line_dedup(ds, id_col="doc_id", text_col="text",
                             line_words=6)


def _snapshot_sides(sf_dir: str):
    """(old, new) snapshot pair derived deterministically from documents:
    docs with doc_id%7==0 are missing from old (→ added), docs with
    doc_id%5==0 had different old text (→ changed), and old carries
    extra rows at doc_id+10M for doc_id%11==0 (→ removed)."""
    new = _rp(sf_dir, "documents", ["doc_id", "text", "source"])

    def old_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        srcs = batch["source"].to_pylist()
        o_id, o_t, o_s = [], [], []
        for i, t, s in zip(ids, texts, srcs):
            if i % 7 != 0:
                o_id.append(i)
                o_t.append((t or "") + " v1" if i % 5 == 0 else t)
                o_s.append(s)
            if i % 11 == 0:
                o_id.append(i + 10_000_000)
                o_t.append(f"gone-{i}")
                o_s.append(s)
        return pa.table({"doc_id": pa.array(o_id, pa.int64()),
                         "text": pa.array(o_t, pa.string()),
                         "source": pa.array(o_s, pa.string())})

    old = new.map_batches(old_rows, batch_format="pyarrow")
    return old, new


def q_snapshot_diff(sf_dir: str):
    """Re-crawl snapshot delta (``stages/diff.py:snapshot_diff``): full
    outer hash join of slim (id, md5) rows → added / removed / changed /
    unchanged per doc; text never shuffles."""
    from ..stages.diff import snapshot_diff

    old, new = _snapshot_sides(sf_dir)
    return snapshot_diff(old, new)


def q_change_rates(sf_dir: str):
    """Per-source change-rate rollup over the snapshot delta
    (``stages/diff.py:change_rates``): one groupby over partial
    (source, status) counts."""
    from ..stages.diff import change_rates, snapshot_diff

    old, new = _snapshot_sides(sf_dir)
    return change_rates(snapshot_diff(old, new))


def q_recrawl(sf_dir: str):
    """Adaptive re-crawl intervals (``stages/diff.py:recrawl_intervals``,
    Cho & Garcia-Molina estimator): per-source Poisson change rate from
    the snapshot delta, fixed-point λ, clamped next interval."""
    from ..stages.diff import change_rates, recrawl_intervals, snapshot_diff

    old, new = _snapshot_sides(sf_dir)
    return recrawl_intervals(change_rates(snapshot_diff(old, new)))


def q_nb_classify(sf_dir: str):
    """Multinomial Naive Bayes language classifier (fastText-analog,
    ``stages/classify.py``): trained on the ``doc_id % 10 < 8`` split in
    one count pass, every doc scored with fixed-point log-probs,
    argmax label with label-ascending tie-break."""
    from ..stages.classify import nb_classify

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang"])
    return nb_classify(ds, id_col="doc_id", text_col="text",
                       label_col="lang", split_mod=8)


def q_asof_attribution(sf_dir: str):
    """As-of join (``ops/asof.py``): attribute each purchase event to the
    user's most recent click at-or-before it — one co-partitioning
    ``groupby(user_id)`` over the tagged union of both sides, sorted
    searchsorted merge per key. Left-join semantics (unattributed purchases
    keep null click columns); lag in exact microseconds. DuckDB twin is a
    native ASOF LEFT JOIN."""
    from ..ops.asof import asof_join

    ev = _rp(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    purchases = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "ts", "user_id"])
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "ts", "user_id"])

    joined = asof_join(
        purchases, clicks, by="user_id", on="ts",
        direction="backward", allow_equal=True, suffix="_click",
        num_partitions=16,
    )

    # left-join nulls → sentinels (coalesced identically in the SQL twin)
    # so the driver's int64 canonicalization never sees NA; per-batch so
    # the result streams — no driver materialization
    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"event_id_click": "click_event_id",
                                "ts_click": "click_ts"})
        ct = pd.to_datetime(df["click_ts"])
        lag = (df["ts"] - ct) // pd.Timedelta(microseconds=1)
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "ts": df["ts"],
            "click_event_id": pd.to_numeric(df["click_event_id"])
                .fillna(-1).astype("int64"),
            "click_ts": ct.fillna(pd.Timestamp(0)),
            "lag_us": lag.fillna(-1).astype("int64"),
        })

    return joined.map_batches(finalize, batch_format="pandas")


def q_range_join(sf_dir: str):
    """Range (interval) join (``ops/range_join.py``): every click in the
    24 h window before each purchase, per user — bucketized interval
    replication + one co-partitioning ``groupby([user, bucket])``, sorted
    searchsorted sweep in-group. DuckDB twin is a BETWEEN join."""
    from ..ops.range_join import range_join

    ev = _rp(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "ts", "user_id"])
    purchases = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "ts", "user_id"])

    H24 = 24 * 3600 * 1_000_000  # µs

    def to_intervals(t: pa.Table) -> pa.Table:
        end = t["ts"]
        start = pc.cast(
            pc.subtract(pc.cast(end, pa.int64()), pa.scalar(H24, pa.int64())),
            pa.timestamp("us"),
        )
        return pa.table({
            "user_id": t["user_id"], "purchase_id": t["event_id"],
            "w_start": start, "w_end": end,
        })

    iv = purchases.map_batches(to_intervals, batch_format="pyarrow")
    # bucket = 16× the interval span: replication stays ≤ 2 while the
    # (user, bucket) group count drops 16× — per-group merge overhead,
    # not the in-group sweep, dominates at the many-tiny-groups shape
    joined = range_join(
        clicks, iv, by="user_id", on="ts",
        start="w_start", end="w_end", bucket_width=16 * H24,
        num_partitions=32,
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.to_datetime(df["ts"])
        return pd.DataFrame({
            "purchase_id": pd.to_numeric(df["purchase_id"]).astype("int64"),
            "click_id": pd.to_numeric(df["event_id"]).astype("int64"),
            "user_id": pd.to_numeric(df["user_id"]).astype("int64"),
            "click_ts": ct,
            "lag_us": ((pd.to_datetime(df["w_end"]) - ct)
                       // pd.Timedelta(microseconds=1)).astype("int64"),
        })

    return joined.map_batches(finalize, batch_format="pandas")


def q_seq_packing(sf_dir: str, window: int = 2048):
    """Sequence packing for context-window assembly: exclusive global
    prefix sum of whitespace token counts in doc_id order
    (``ops/prefix.py`` two-level scan — per-batch combiner, driver scan of
    ≤64 bucket totals, one groupby), then ``bin = cum_before // window``.
    SQL twin is a window-function running sum."""
    from ..ops.prefix import exclusive_prefix_sum
    from ..stages.text_analysis import token_count_stage

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    toks = ds.map_batches(token_count_stage, batch_format="pandas") \
        .select_columns(["doc_id", "ws_tokens"])
    scanned = exclusive_prefix_sum(
        toks, order_col="doc_id", value_col="ws_tokens")

    def binify(t: pa.Table) -> pa.Table:
        b = pc.divide(t["cum_before"], pa.scalar(window, pa.int64()))
        return t.append_column("bin", pc.cast(b, pa.int64()))

    return scanned.map_batches(binify, batch_format="pyarrow") \
        .select_columns(["doc_id", "ws_tokens", "cum_before", "bin"])


def q_topk_per_group(sf_dir: str, k: int = 3):
    """Top-k per group (``ops/topk.py``): the k highest-balance customers
    per nation with in-group rank — per-batch partial head(k) combiner
    before the one groupby shuffle. SQL twin is a row_number() window."""
    from ..ops.topk import topk_per_group

    cust = _rp(sf_dir, "customer",
               ["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
    out = topk_per_group(
        cust, group_cols=["c_nationkey"],
        order_cols=["c_acctbal", "c_custkey"], ascending=[False, True],
        k=k, rank_col="rn",
    )
    return out.to_pandas().astype({"c_nationkey": "int64"}) \
        [["c_nationkey", "rn", "c_custkey", "c_name", "c_acctbal"]] \
        .sort_values(["c_nationkey", "rn"]).reset_index(drop=True)


def q_stratified_sample(sf_dir: str, k: int = 20):
    """Deterministic stratified corpus sample: k docs per language, ranked
    by md5(doc_id) — a salted-hash total order both sides can compute, so
    the 'random' sample is reproducible and SQL-verifiable. Same
    ``ops/topk.py`` partial-combiner shape."""
    from ..ops.topk import topk_per_group

    ds = _rp(sf_dir, "documents", ["doc_id", "lang"])

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df["h"] = [
            hashlib.md5(str(d).encode()).hexdigest()
            for d in df["doc_id"].tolist()
        ]
        return df

    hashed = ds.map_batches(add_hash, batch_format="pandas")
    out = topk_per_group(
        hashed, group_cols=["lang"], order_cols=["h", "doc_id"],
        k=k, rank_col="rn",
    )
    return out.to_pandas()[["lang", "rn", "doc_id", "h"]] \
        .sort_values(["lang", "rn"]).reset_index(drop=True)


def q_group_quantiles(sf_dir: str):
    """Exact per-group discrete quantiles over a BOUNDED-cardinality value
    column (l_quantity has ≤50 distinct values): per-batch (group, value)
    count combiner → one small groupby → driver-side cumulative pick of
    the ceil(p·n)-th value. The documented assumption is bounded
    group×value cardinality — the scale path for unbounded values is the
    histogram/bottom-k sketch family (``stages/sketch.py``). SQL twin:
    quantile_disc."""
    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_returnflag", "l_quantity"], sort=False) \
            .size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype("int64")
        return g

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_quantity"])
        .aggregate(Sum("cnt"))
        .to_pandas()  # ≤ groups × distinct-values rows, bounded
        .rename(columns={"sum(cnt)": "cnt"})
        .sort_values(["l_returnflag", "l_quantity"])
    )
    rows = []
    for flag, g in counts.groupby("l_returnflag", sort=True):
        vals = g["l_quantity"].to_numpy()
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        row = {"l_returnflag": flag, "n_rows": n}
        for p, name in ((0.5, "p50"), (0.9, "p90")):
            target = int(np.ceil(p * n))
            row[name] = float(vals[np.searchsorted(cum, target, side="left")])
        rows.append(row)
    return pd.DataFrame(rows)[["l_returnflag", "p50", "p90", "n_rows"]]


def q_decontaminate(sf_dir: str, n: int = 5, bench_below: int = 20):
    """Benchmark decontamination (``stages/decontaminate.py``): docs with
    doc_id < 20 play the eval benchmark; every other doc reports how many
    DISTINCT benchmark 5-grams it contains. Benchmark gram set is
    broadcast once via ``ray.put``; the corpus side streams — no shuffle."""
    from ..stages.decontaminate import benchmark_ngram_set, decontaminate_stage

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    bench = docs.filter(expr=f"doc_id < {bench_below}")
    probe = docs.filter(expr=f"doc_id >= {bench_below}")
    ref = benchmark_ngram_set(bench, n=n)
    return probe.map_batches(
        decontaminate_stage(ref, n=n), batch_format="pandas"
    )


def q_data_mix(sf_dir: str, budget: int = 200):
    """Mixture sampling for training-data composition: a total budget of
    ``budget`` docs is allocated across sources by target weights
    (weight of src_i ∝ i+1) with the largest-remainder method, then each
    source contributes its allocation in md5(doc_id) hash order — fully
    deterministic, reproducible across runs/partitionings, and
    SQL-verifiable. One ``ops/topk.py`` grouped top-k does the heavy work;
    the per-source cutoff dict rides in the closure (KBs)."""
    from ..ops.topk import topk_per_group

    alloc = data_mix_allocation(budget)
    ds = _rp(sf_dir, "documents", ["doc_id", "source"])

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df["h"] = [
            hashlib.md5(str(d).encode()).hexdigest()
            for d in df["doc_id"].tolist()
        ]
        return df

    ranked = topk_per_group(
        ds.map_batches(add_hash, batch_format="pandas"),
        group_cols=["source"], order_cols=["h", "doc_id"],
        k=max(alloc.values()), rank_col="rn",
    )

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["rn"] <= df["source"].map(alloc).fillna(0).astype("int64")
        out = df[keep]
        return out[["source", "rn", "doc_id", "h"]]

    return ranked.map_batches(cut, batch_format="pandas")


def data_mix_allocation(budget: int = 200, n_sources: int = 20) -> dict[str, int]:
    """Largest-remainder allocation of ``budget`` over src0..src{n-1} with
    weight(src_i) ∝ i+1. Static — the SQL twin inlines the same table."""
    total_w = n_sources * (n_sources + 1) / 2
    quotas = {f"src{i}": budget * (i + 1) / total_w for i in range(n_sources)}
    base = {s: int(q) for s, q in quotas.items()}
    leftover = budget - sum(base.values())
    order = sorted(quotas, key=lambda s: (-(quotas[s] - base[s]), s))
    for s in order[:leftover]:
        base[s] += 1
    return base


def q_gopher_filter(sf_dir: str):
    """Gopher-rule corpus admission (Rae et al. 2021 §A1.1 heuristics):
    per-doc length / mean-word-length / symbol-ratio / alpha-word /
    stop-word signals, 0/1 rule flags, overall pass. Pure streaming map —
    vectorized pandas string kernels (``gopher_filter_stage``)."""
    from ..stages.text_analysis import gopher_filter_stage

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(gopher_filter_stage, batch_format="pandas")


def q_chunking(sf_dir: str, chunk: int = 32, stride: int = 24):
    """Token-window chunking for embedding/RAG training: flat-map each doc
    into windows of ``chunk`` whitespace tokens at ``stride`` spacing
    (``chunk_stage``); md5 per window verifies content. Streams — output
    fan-out rides in the batch, nothing shuffles."""
    from ..stages.text_analysis import chunk_stage

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda df: chunk_stage(df, chunk=chunk, stride=stride),
        batch_format="pandas",
    )


def q_dsir_select(sf_dir: str, k: int = 100):
    """DSIR importance resampling (``stages/importance.py``): hashed
    uni+bigram bucket counts for the lang='en' target vs the raw corpus
    (one streaming count pass, KB-scale groupby), integer cross-multiplied
    importance score per doc (second streaming pass against the broadcast
    LUT), top-``k`` by (score DESC, doc_id). Text never shuffles."""
    from ..stages.importance import dsir_select

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang"])
    return dsir_select(ds, k=k)


def q_shuffle_split(sf_dir: str):
    """Deterministic global shuffle + hash split (``ops/shuffle.py``):
    reproducible md5-keyed permutation position via the uniform two-level
    scan (KB-scale bucket totals, one co-location groupby) and a stable
    train/val/test assignment that is a pure function of (seed, doc_id)."""
    from ..ops.shuffle import global_shuffle_split

    ds = _rp(sf_dir, "documents", ["doc_id"])
    return global_shuffle_split(ds)


def q_repetition(sf_dir: str):
    """Gopher repetition signals (``repetition_stats_stage``): per-doc
    most-repeated 2/3-gram (count + gram, deterministic tie-break) and
    token coverage of duplicated 5-grams — the §A1.1 repetition half of
    corpus admission, alongside ``q_gopher_filter``'s length/symbol
    rules. Pure streaming map."""
    from ..stages.text_analysis import repetition_stats_stage

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(repetition_stats_stage, batch_format="pandas")


def q_training_export(sf_dir: str):
    """Flagship training-set export summary
    (``pipelines/training_export.py``): admission → exact dedup →
    deterministic shuffle/split → train-split sequence packing, reported
    as per-split (n_docs, n_tokens, n_bins). Every step is replayed by
    the SQL twin."""
    from .training_export import export_summary

    return export_summary(sf_dir)


def q_xhr_merge(sf_dir: str):
    """Injected-XHR merge + FilterXHR drop matrix (``cdp.py``, the live
    M21 half) over deterministic per-doc fixtures: every doc emits one
    matched API call (response body JSON / HTML / NUL-binary by
    doc_id % 3) and one never-matched tracker POST; merge_xhr_logs
    resolves bodies, filter_xhr_requests(['text/plain']) drops the
    tracker (text/empty) and the binary rows — the SQL twin restates the
    surviving rows from doc_id arithmetic."""
    from ..cdp import filter_xhr_requests, merge_xhr_logs

    def build(batch: pa.Table) -> pa.Table:
        ids, urls, methods, statuses, rcts, rsts, bodies = \
            [], [], [], [], [], [], []
        for doc_id in batch["doc_id"].to_pylist():
            xhr = [
                {"m": "GET", "s": 200, "t": "xhr", "b": "",
                 "u": f"https://api.example.com/v1/doc/{doc_id}/"},
                {"m": "POST", "s": 204, "t": "fetch",
                 "u": f"https://api.example.com/v1/track?id={doc_id}"},
            ]
            mod = doc_id % 3
            body = ('J{"doc": %d}' % doc_id if mod == 0
                    else "<p>x</p>" if mod == 1 else "bin\x00")
            responses = [{
                "method": "GET", "status": 200, "response_body": body,
                "url": f"https://api.example.com/v1/doc/{doc_id}",
            }]
            kept = filter_xhr_requests(
                merge_xhr_logs(xhr, responses), ["text/plain"])
            for rec in kept:
                ids.append(doc_id)
                urls.append(rec["url"])
                methods.append(rec["method"])
                statuses.append(int(rec["status"]))
                rcts.append(rec["request_content_type"])
                rsts.append(rec["response_content_type"])
                rb = rec["response_body"]
                bodies.append(rb if isinstance(rb, str) else json.dumps(rb))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "method": pa.array(methods, pa.string()),
            "status": pa.array(statuses, pa.int64()),
            "request_content_type": pa.array(rcts, pa.string()),
            "response_content_type": pa.array(rsts, pa.string()),
            "response_body": pa.array(bodies, pa.string()),
        })

    return _rp(sf_dir, "documents", ["doc_id"]).map_batches(
        build, batch_format="pyarrow")


def q_source_overlap(sf_dir: str):
    """Cross-source contamination matrix: for every unordered source pair,
    how many identical documents (by content md5) they share, plus the
    diagonal (per-source distinct-content count) — the corpus-analysis
    view a mixture designer checks before weighting sources. Shape: one
    streaming hash map (text never shuffles), one hash-shard groupby over
    48-byte (md5, source) rows with a vectorized self-merge pair expansion
    per shard, one KB-scale pair count."""
    from ray.data.aggregate import Sum

    def hash_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "h": [hashlib.md5((t or "").encode()).hexdigest()
                  for t in df["text"]],
            "source": df["source"],
        })

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across every hash in the shard: distinct (h, source)
        # self-merged on h gives the diagonal (a,a) once per (h,a) and
        # each unordered cross pair (a<b) once per shared hash — one call
        # per unique content hash would be a round-trip per document
        d = g.drop_duplicates(subset=["h", "source"])
        m = d.merge(d, on="h", suffixes=("_x", "_y"))
        m = m[m["source_x"] <= m["source_y"]]
        out = pd.DataFrame({"src_a": m["source_x"].to_numpy(),
                            "src_b": m["source_y"].to_numpy()})
        out["n"] = np.int64(1)
        return out

    ds = _rp(sf_dir, "documents", ["text", "source"])
    from ..ops.gutil import group_by_key_shards

    pairs = group_by_key_shards(
        ds.map_batches(hash_rows, batch_format="pandas"), "h", shard_pairs)
    out = pairs.groupby(["src_a", "src_b"]).aggregate(
        Sum("n", alias_name="n_shared")).to_pandas()
    if out.empty:
        return pd.DataFrame({
            "src_a": pd.Series([], dtype="object"),
            "src_b": pd.Series([], dtype="object"),
            "n_shared": pd.Series([], dtype="int64"),
        })
    out["n_shared"] = out["n_shared"].astype("int64")
    return out


def q_token_shards(sf_dir: str):
    """Tokenized binary shards (``pipelines/token_shards.py``): per
    train-split context-window bin, the doc/token counts and the md5 of
    the uint32 hash-vocab id sequence in shuffle order — the
    pretraining-consumable artifact, every byte SQL-replayed."""
    from .token_shards import token_shard_records

    return token_shard_records(sf_dir)


def q_ngram_lm(sf_dir: str):
    """Bigram-LM domain-fit scoring (``stages/ngram_lm.py``, CCNet-style
    perplexity filter): model = add-1-smoothed bigram counts over the
    lang='en' target corpus (one count-pass groupby), score = per-doc
    fixed-point sum of position log-probs ``floor(ln((c2+1)/(c1+V)) *
    1e4 + 0.5)`` — an order-free int64 the SQL twin reproduces exactly.
    Broadcast LUT below the model-size threshold, native Dataset join
    above (both parity-tested)."""
    from ..stages.ngram_lm import bigram_lm_scores

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang"])
    return bigram_lm_scores(ds)


def q_bm25(sf_dir: str):
    """BM25 top-k retrieval (``stages/bm25.py``): one slim count pass
    over the text (doc length + per-query-term tf), T+2 scalar corpus
    stats to the driver, fixed-point ``floor(((idf*num)/den)*1e4+0.5)``
    per-(doc,term) contributions summed as order-free int64, per-batch
    partial top-k before the global sort."""
    from ..stages.bm25 import bm25_topk

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, ["spark", "window", "merge"], k=50)


def q_centroid_classify(sf_dir: str):
    """Nearest-centroid (Rocchio) classifier over embeddings
    (``stages/centroid.py``): one per-label sum pass trains q8 integer
    centroids (truncating division — DuckDB ``//`` semantics), exact
    int64 squared distances, argmin with label-asc tie-break."""
    from ..stages.centroid import centroid_classify

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return centroid_classify(ds)


def q_rrf_fusion(sf_dir: str):
    """Reciprocal Rank Fusion (``stages/fusion.py``): the BM25 top-50
    (lexical run) fused with the token-count top-50 (a stand-in second
    run with the same shape an embedding run has) via integer-exact
    ``10^6 // (60 + rank)`` contributions — one groupby over slim rank
    rows."""
    from ..stages.bm25 import bm25_topk
    from ..stages.fusion import add_rank, rrf_fuse

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    run_a = add_rank(
        bm25_topk(docs, ["spark", "window", "merge"], k=50),
        ["score_q4", "doc_id"], [True, False],
    ).select_columns(["doc_id", "rank"])

    def dl_rows(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        dl = [len((x or "").lower().split()) for x in texts]
        return pa.table({"doc_id": t["doc_id"],
                         "dl": pa.array(dl, pa.int64())})

    run_b = add_rank(
        docs.map_batches(dl_rows, batch_format="pyarrow")
        .sort(["dl", "doc_id"], descending=[True, False]).limit(50),
        ["dl", "doc_id"], [True, False],
    ).select_columns(["doc_id", "rank"])

    fused = rrf_fuse(run_a.union(run_b))
    return fused.sort(["rrf_q6", "doc_id"], descending=[True, False])


def q_bpe_roundtrip(sf_dir: str):
    """Byte-level BPE tokenizer (``stages/bpe.py``): one distributed
    word-count pass trains the merges (bounded driver loop over word
    types), broadcast encode actor pool, per-doc lossless-roundtrip
    proof — md5(decode(encode(text))) must equal DuckDB's md5 of the
    whitespace-normalized source. ``n_tokens`` is engine-only (dropped
    here so every returned column is SQL-checkable)."""
    from ..stages.bpe import bpe_roundtrip_records

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return bpe_roundtrip_records(ds, n_merges=256).drop_columns(
        ["n_tokens"]
    )


def q_heavy_hitters(sf_dir: str):
    """Misra-Gries heavy hitters (``stages/sketch.py``): per-batch ≤k
    (value, est) summaries, k-way driver merge with one capacity cut —
    driver traffic is summaries, never rows. Capacity 4096 ≥ distinct
    users at oracle scale, so the summary is exact and the twin is a
    plain GROUP BY; the N/(k+1) guarantee below capacity is
    property-tested in pytest."""
    from ..stages.sketch import heavy_hitters

    ds = _rp(sf_dir, "events", ["user_id"])
    return heavy_hitters(ds, "user_id", k=4096, top=50)


def q_weighted_sample(sf_dir: str):
    """Weighted sample without replacement (``stages/sample.py``,
    Efraimidis-Spirakis A-ES): deterministic hash-uniform u per row,
    fixed-point key floor((ln(u)/w)*1e6), per-batch partial top-k with
    the global comparator, driver merge of k-row partials. Stable under
    any partitioning; the SQL twin recomputes every key."""
    from ..stages.sample import weighted_sample

    ds = _rp(sf_dir, "events", ["event_id", "value"])
    return weighted_sample(ds, "event_id", "value", 100)


def q_knn_graph(sf_dir: str):
    """Exact kNN graph by cosine (``stages/similarity.py``): bounded
    driver pull of the unit matrix broadcast once, per-batch float64
    matmul, per-node top-k with (cos DESC, dst ASC) ties — the SemDeDup
    input structure. The IVF-bucketed variant (no global matrix) is the
    scale path, parity-gated in pytest at n_centroids=1."""
    from ..stages.similarity import knn_graph

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_graph(ds, k=5)


def q_skew_join(sf_dir: str):
    """Skew-aware join (``ops/salted.py:skew_join``): a deliberately
    skewed fact table (~25 % of lineitem rows re-keyed onto orderkey 1)
    joins the orders dim — the hot key goes through a broadcast lookup,
    the cold tail through the normal hash join, detected by a salted
    count. Inner-join semantics identical to the plain SQL join."""
    from ..ops.salted import skew_join

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])

    def fact(t: pa.Table) -> pa.Table:
        k = np.asarray(t["l_orderkey"], dtype=np.int64)
        k = np.where(k % 4 == 0, 1, k)
        cents = np.floor(np.asarray(t["l_extendedprice"],
                                    dtype=np.float64) * 100 + 0.5
                         ).astype(np.int64)
        return pa.table({"k": pa.array(k), "cents": pa.array(cents)})

    dim = _rp(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]
              ).map_batches(
        lambda t: pa.table({"k": t["o_orderkey"],
                            "o_orderpriority": t["o_orderpriority"]}),
        batch_format="pyarrow")
    joined = skew_join(li.map_batches(fact, batch_format="pyarrow"),
                       dim, on="k", hot_threshold=1_000)

    from ray.data.aggregate import Count, Sum

    return (joined.groupby("o_orderpriority")
            .aggregate(Count(alias_name="n_items"),
                       Sum("cents", alias_name="revenue_cents")))


def q_exact_quantiles(sf_dir: str):
    """Exact distributed quantiles (``ops/quantiles.py``): lineitem
    extended price in cents, six order statistics resolved in
    ≤ log_4096(range) streaming histogram passes — no sort, no
    shuffle."""
    from ..ops.quantiles import exact_quantiles

    li = _rp(sf_dir, "lineitem", ["l_extendedprice"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.floor(np.asarray(t["l_extendedprice"], dtype=np.float64)
                     * 100 + 0.5).astype(np.int64)
        return pa.table({"cents": pa.array(v)})

    ds = li.map_batches(cents, batch_format="pyarrow")
    return exact_quantiles(
        ds, "cents", [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
    ).sort("q_permille")


def q_triangles(sf_dir: str):
    """Degree-oriented triangle counting (``ops/triangles.py``) over the
    part co-order graph (parts sharing an l_orderkey are connected):
    wedge generation bounded by O(√E) out-degrees, each triangle closed
    once at its lowest-(deg, id) apex; per-node triangle counts."""
    from ..ops.triangles import triangle_counts
    from ..stages.basket import cooccur_edges

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = cooccur_edges(li, basket="l_orderkey", item="l_partkey")
    return triangle_counts(edges).sort("node")


def q_hits(sf_dir: str):
    """HITS hubs & authorities (``ops/hits.py``) over the DIRECTED
    part→supplier graph from lineitem (parallel edges = multiplicity):
    integer q12 scores, per-half-step ``x // ceil(max/unit)``
    normalization, 5 iterations — every step an exact int64 recurrence
    the SQL twin replays with chained CTEs. Broadcast path below the
    node threshold, distributed join path above (parity-tested)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..ops.hits import hits

    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    OFF = 1_000_000_000

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["l_partkey"],
                         "dst": pc.add(batch["l_suppkey"], OFF)})

    edges = li.map_batches(to_edges, batch_format="pyarrow")
    return (
        hits(edges)
        .sort(["auth_q", "hub_q", "node"], descending=[True, True, False])
        .limit(100)
    )


def q_pagerank(sf_dir: str):
    """Fixed-point PageRank (``ops/pagerank.py``) over the bidirectional
    part↔supplier graph from lineitem (parallel edges = multiplicity).
    Integer q12 ranks, damping 17/20, 5 iterations — every iteration an
    exact int64 recurrence the SQL twin replays with chained CTEs.
    Broadcast path below the node threshold, distributed join path
    above (parity-tested)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..ops.pagerank import pagerank

    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    OFF = 1_000_000_000

    def to_edges(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"]
        s = pc.add(batch["l_suppkey"], OFF)
        return pa.concat_tables([
            pa.table({"src": p, "dst": s}),
            pa.table({"src": s, "dst": p}),
        ])

    edges = li.map_batches(to_edges, batch_format="pyarrow")
    return (
        pagerank(edges)
        .sort(["rank_q", "node"], descending=[True, False])
        .limit(100)
    )


def q_pmi(sf_dir: str):
    """PMI collocations (``stages/ngram_lm.py``): one-pass bigram count
    model, broadcast unigram LUT, fixed-point
    floor(ln((c2·T)/(c1a·c1b))·1e4+0.5) over exact ints, partial-head
    top-k. The phrase-mining signal for vocabulary curation."""
    from ..stages.ngram_lm import pmi_collocations

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang"])
    return pmi_collocations(ds, min_count=5, k=100)


def q_moments(sf_dir: str):
    """Exact pairwise moments (``stages/moments.py``): one streaming
    pass, arbitrary-precision integer sums (segment-summed int64 →
    Python ints), rendered as decimal strings so the hash gate compares
    them exactly — covariance/correlation sufficient statistics with
    zero float error at any scale."""
    from ..stages.moments import moment_records

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _rp(sf_dir, "lineitem", cols)
    return moment_records(ds, cols)


def q_anchor_text(sf_dir: str):
    """Anchor-text aggregation (``stages/anchors.py``): the engine's real
    HTML parser captures each <a>'s inner text from documents-derived
    linked pages (3 deterministic out-links per doc), one groupby
    computes per-target incoming-anchor stats; the twin re-derives every
    (target, term) row from the same link formula."""
    import pyarrow as pa

    from ..stages.anchors import anchor_text_table

    ds = _rp(sf_dir, "documents", ["doc_id", "lang", "source", "text"])

    import re as _re

    def build(t: pa.Table) -> pa.Table:
        htmls = []
        for d, la, s, x in zip(
            t["doc_id"].to_pylist(), t["lang"].to_pylist(),
            t["source"].to_pylist(), t["text"].to_pylist(),
        ):
            words = (x or "").split()

            def term(j: int) -> str:
                w = words[j] if len(words) > j else ""
                # HTML-safe charset so parser charref/tag handling can't
                # transform the anchor away from the SQL derivation
                return _re.sub(r"[^a-z0-9]", "", w) or "x"

            links = "".join(
                f'<a href="doc://{(int(d) * 3 + j * 31) % 97}">'
                f"{term(j)}</a>"
                for j in range(3)
            )
            htmls.append(
                _doc_html(d, la, s, x).replace("</body>",
                                               links + "</body>", 1)
            )
        return pa.table({"doc_id": t["doc_id"],
                         "html": pa.array(htmls, pa.string())})

    pages = ds.map_batches(build, batch_format="pyarrow")
    return anchor_text_table(pages)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup (``stages/similarity.py``): exact cosine edges at
    ROUND(cos,4) ≥ 0.35 over the embeddings table → connected
    components → keep the min id per cluster; every row labeled. The
    twin recomputes the edge set by all-pairs join and closes it with a
    recursive CTE."""
    from ..stages.similarity import semantic_dedup

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semantic_dedup(ds, tau=0.35)


def q_substring_dedup(sf_dir: str):
    """Corpus-level exact-substring dedup (``stages/dedup.py:
    exact_substring_dedup``): cut every word 5-gram window shared with
    another document, Lee et al. 2021 shape. Hit-finding rides the same
    two uniform 20 B-row shard exchanges as ``q_dup_ngrams``; positions
    fold to one slim row per affected doc and re-join the text by
    broadcast-or-hash-join threshold switch. The twin replays the whole
    chain in SQL (literal n-grams, window union, token re-assembly) and
    compares md5 of the cleaned text."""
    import hashlib as _hl

    from ..stages.dedup import exact_substring_dedup

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = exact_substring_dedup(ds, n=5)

    def dig(batch: pa.Table) -> pa.Table:
        md5 = [_hl.md5((t or "").encode()).hexdigest()
               for t in batch["clean_text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "clean_md5": pa.array(md5, pa.string()),
            "n_tokens": batch["n_tokens"],
            "removed_tokens": batch["removed_tokens"],
        })

    return out.map_batches(dig, batch_format="pyarrow")


def q_bfs_dist(sf_dir: str):
    """Multi-source BFS shortest distances (``ops/bfs.py``) over the
    bidirectional part↔supplier graph from lineitem: seeds are parts
    with partkey % 500 == 0, 4 synchronous relaxation rounds —
    integer-exact, replayed by the twin with chained min-CTEs."""
    import pyarrow.compute as pc

    from ..ops.bfs import bfs_distances

    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    OFF = 1_000_000_000

    def to_edges(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"]
        s = pc.add(batch["l_suppkey"], OFF)
        return pa.concat_tables([
            pa.table({"src": p, "dst": s}),
            pa.table({"src": s, "dst": p}),
        ])

    edges = li.map_batches(to_edges, batch_format="pyarrow")
    part = _rp(sf_dir, "part", ["p_partkey"])

    def seed_rows(batch: pa.Table) -> pa.Table:
        pk = batch["p_partkey"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(pk[pk % 500 == 0]
                                          .astype(np.int64))})

    seeds = part.map_batches(seed_rows, batch_format="pyarrow")
    return bfs_distances(edges, seeds, rounds=4).sort("node")


def q_lpa_communities(sf_dir: str):
    """Deterministic synchronous label propagation (``ops/lpa.py``)
    over the bidirectional part↔supplier graph: 3 rounds of
    (count DESC, label ASC) argmax adoption; output is the per-label
    community-size histogram plus each community's minimum member —
    slim enough to hash-gate while still pinning every label."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    from ..ops.lpa import label_propagation

    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    OFF = 1_000_000_000

    def to_edges(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"]
        s = pc.add(batch["l_suppkey"], OFF)
        return pa.concat_tables([
            pa.table({"src": p, "dst": s}),
            pa.table({"src": s, "dst": p}),
        ])

    edges = li.map_batches(to_edges, batch_format="pyarrow")
    labels = label_propagation(edges, iterations=3)
    return (labels.groupby("label")
            .aggregate(Count(alias_name="members"),
                       Min("node", alias_name="min_member"))
            .sort(["members", "label"], descending=[True, False])
            .limit(100))


def q_scd2(sf_dir: str):
    """SCD Type-2 historization (``stages/cdc.py``) of the events
    stream: per user, the versioned history of event_type states with
    half-open validity intervals, collapsed on consecutive repeats —
    everything inside one groupby(user_id) shuffle."""
    import pyarrow.compute as pc

    from ..stages.cdc import scd2_history

    ev = _rp(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "seq": pc.cast(batch["ts"], pa.int64()),
            "state": batch["event_type"],
        })

    stream = ev.map_batches(prep, batch_format="pyarrow")
    hist = scd2_history(stream, key="user_id", seq="seq", state="state")
    return hist.sort(["user_id", "version"])


def q_kmeans(sf_dir: str):
    """Distributed Lloyd k-means (``stages/kmeans.py``): k=4 clusters
    over the embeddings table, 3 full-data iterations from the
    deterministic k-smallest-id init, integer fixed-point centroids —
    per-vector final (cluster, dist_q) assignment, bit-replayed by the
    chained-CTE twin."""
    from ..stages.kmeans import kmeans_assign

    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_assign(emb, k=4, iterations=3).sort("vec_id")


def q_interval_merge(sf_dir: str):
    """Gaps-and-islands interval merging (``stages/intervals.py``):
    per-user activity windows [ts, ts + 60 + floor(value)) seconds
    coalesced into maximal islands — one groupby(user) shuffle of slim
    int rows."""
    import pyarrow.compute as pc

    from ..stages.intervals import merge_intervals

    ev = _rp(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        start = (pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False) // 1_000_000)
        dur = 60 + np.floor(batch["value"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        return pa.table({
            "user_id": batch["user_id"],
            "start": pa.array(start),
            "end": pa.array(start + dur),
        })

    iv = ev.map_batches(prep, batch_format="pyarrow")
    return (merge_intervals(iv, key="user_id")
            .sort(["user_id", "island_start"]))


def q_funnel(sf_dir: str):
    """Ordered funnel analysis (``stages/funnel.py``): per user the
    strictly-ordered view → click → purchase completion chain over the
    events stream; non-step events never enter the shuffle."""
    import pyarrow.compute as pc

    from ..stages.funnel import funnel

    ev = _rp(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "seq": pc.cast(batch["ts"], pa.int64()),
            "event_type": batch["event_type"],
        })

    stream = ev.map_batches(prep, batch_format="pyarrow")
    out = funnel(stream, ["view", "click", "purchase"],
                 user="user_id", event="event_type", seq="seq")
    return (out.map_batches(
        lambda b: b.rename_columns(
            ["user_id"] + b.column_names[1:]),
        batch_format="pyarrow")
        .sort("user_id"))


def q_cohort(sf_dir: str):
    """Cohort retention (``stages/cohort.py``): users bucketed by
    first-activity week over the events stream; one row per
    (cohort, offset) with distinct active users — the growth
    triangle."""
    import pyarrow.compute as pc

    from ..stages.cohort import cohort_retention

    ev = _rp(sf_dir, "events", ["user_id", "ts"])
    WEEK_US = 7 * 86400 * 1_000_000

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "seq": pc.cast(batch["ts"], pa.int64()),
        })

    stream = ev.map_batches(prep, batch_format="pyarrow")
    return (cohort_retention(stream, user="user_id", seq="seq",
                             period_len=WEEK_US)
            .sort(["cohort", "offset"]))


def q_hyperball(sf_dir: str):
    """HyperBall neighborhood sketches (``ops/hyperball.py``): 2
    max-merge rounds over the bidirectional part↔supplier graph give
    every node an HLL(p=4) sketch of its ≤2-hop in-neighborhood; the
    sparse register table pins the whole computation integer-exactly."""
    import pyarrow.compute as pc

    from ..ops.hyperball import hyperball

    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    OFF = 1_000_000_000

    def to_edges(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"]
        s = pc.add(batch["l_suppkey"], OFF)
        return pa.concat_tables([
            pa.table({"src": p, "dst": s}),
            pa.table({"src": s, "dst": p}),
        ])

    edges = li.map_batches(to_edges, batch_format="pyarrow")
    return hyperball(edges, rounds=2).sort(["node", "ri"])


def q_markov(sf_dir: str):
    """First-order Markov transition mining (``stages/markov.py``):
    per-user event-type navigation transitions with integer ppm
    probabilities — one groupby(user) shuffle + one slim pair
    groupby."""
    import pyarrow.compute as pc

    from ..stages.markov import markov_transitions

    ev = _rp(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "seq": pc.cast(batch["ts"], pa.int64()),
            "state": batch["event_type"],
        })

    stream = ev.map_batches(prep, batch_format="pyarrow")
    out = markov_transitions(stream, key="user_id", seq="seq",
                             state="state")
    return out.sort(["from_state", "to_state"])


def q_ols_trend(sf_dir: str):
    """Grouped exact OLS trend (``stages/regression.py``): price-cents
    vs order-day slope per order priority from exact integer sufficient
    statistics (Python ints ↔ HUGEINT) — order-free, rendered as
    decimal strings plus a q6 truncating-division slope."""
    import pyarrow.compute as pc

    from ..stages.regression import grouped_ols

    orders = _rp(sf_dir, "orders",
                 ["o_orderpriority", "o_orderdate", "o_totalprice"])
    DAY_US = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        x = (pc.cast(batch["o_orderdate"], pa.int64())
             .to_numpy(zero_copy_only=False) // DAY_US)
        y = np.floor(batch["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        return pa.table({
            "grp": batch["o_orderpriority"],
            "x": pa.array(x),
            "y": pa.array(y),
        })

    pts = orders.map_batches(prep, batch_format="pyarrow")
    return grouped_ols(pts, group="grp", x="x", y="y")


def q_twa(sf_dir: str):
    """Time-weighted average (``stages/twa.py``): per-user mean event
    value weighted by how long each reading was current (left-constant
    step integral over seconds) — one groupby(user) shuffle."""
    import pyarrow.compute as pc

    from ..stages.twa import time_weighted_avg

    ev = _rp(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        t = (pc.cast(batch["ts"], pa.int64())
             .to_numpy(zero_copy_only=False) // 1_000_000)
        v = np.floor(batch["value"].to_numpy(
            zero_copy_only=False) * 1000 + 0.5).astype(np.int64)
        return pa.table({
            "user_id": batch["user_id"],
            "t": pa.array(t),
            "v": pa.array(v),
        })

    stream = ev.map_batches(prep, batch_format="pyarrow")
    return (time_weighted_avg(stream, key="user_id", ts="t",
                              value="v")
            .sort("user_id"))


def q_copurchase(sf_dir: str):
    """Market-basket pair mining (``stages/basket.py``): the 100
    most-co-ordered part pairs with support counts — quadratic only in
    basket size, slim pair rows through the one count groupby."""
    from ..stages.basket import pair_support

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    return pair_support(li, basket="l_orderkey", item="l_partkey",
                        k=100)


def q_mutual_info(sf_dir: str):
    """Information statistics (``stages/infostats.py``): Shannon
    entropies of documents.source / documents.lang and their mutual
    information as q4-nats·N integer numerators — the PMI fixed-point
    contract over an alphabet-bounded joint table."""
    from ..stages.infostats import entropy_mi

    ds = _rp(sf_dir, "documents", ["source", "lang"])
    return entropy_mi(ds, "source", "lang")


def q_url_templates(sf_dir: str):
    """URL template mining (``stages/urlmine.py``): per (source,
    template) page counts over documents-derived deterministic paths —
    numeric ids and 16+-char hex runs collapse to {n}/{h}."""
    import hashlib

    from ..stages.urlmine import url_templates

    ds = _rp(sf_dir, "documents", ["doc_id", "source"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        paths = []
        for d in ids:
            d = int(d)
            if d % 3 == 0:
                h = hashlib.md5(str(d).encode()).hexdigest()[:20]
                paths.append(f"/obj/{h}/raw")
            elif d % 3 == 1:
                paths.append(f"/cat-{d % 7}/item/{d * d % 100000}/v")
            else:
                paths.append(f"/about/team{d % 5}")
        return pa.table({
            "host": batch["source"],
            "path": pa.array(paths, pa.string()),
        })

    urls = ds.map_batches(synth, batch_format="pyarrow")
    return url_templates(urls, host="host", path="path")


def q_session_paths(sf_dir: str):
    """Session path mining (``stages/paths.py``): the 100 most common
    per-(user, day) event-type journeys as '>'-joined strings."""
    import pyarrow.compute as pc

    from ..stages.paths import session_paths

    ev = _rp(sf_dir, "events", ["user_id", "ts", "event_type"])
    DAY_US = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())
        return pa.table({
            "user_id": batch["user_id"],
            "day": pc.divide(us, DAY_US),
            "seq": us,
            "state": batch["event_type"],
        })

    stream = ev.map_batches(prep, batch_format="pyarrow")
    return session_paths(stream, key="user_id", window="day",
                         seq="seq", state="state", k=100)


def q_quantile_bucket(sf_dir: str):
    """Quantile bucketing (``stages/discretize.py``): lineitem price
    cents discretized at the exact quartiles (``ops/quantiles.py``
    boundaries, no data sort) — per-bucket counts and value ranges."""
    from ..stages.discretize import quantile_buckets

    li = _rp(sf_dir, "lineitem", ["l_extendedprice"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.floor(np.asarray(t["l_extendedprice"],
                                dtype=np.float64) * 100
                     + 0.5).astype(np.int64)
        return pa.table({"cents": pa.array(v)})

    ds = li.map_batches(cents, batch_format="pyarrow")
    return quantile_buckets(ds, "cents", [0.25, 0.5, 0.75])


def q_kcore(sf_dir: str):
    """k-core peeling (``ops/kcore.py``) over the part co-order graph
    at k=110, 2 rounds (at sf0.01: 2000 -> 1203 -> 77 survivors) —
    survivors with their degree inside the surviving subgraph."""
    from ..ops.kcore import k_core
    from ..stages.basket import cooccur_edges

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = cooccur_edges(li, basket="l_orderkey",
                          item="l_partkey", out_cols=("src", "dst"))
    return k_core(edges, 110, rounds=2)


def q_tfidf(sf_dir: str):
    """TF-IDF top terms (``stages/tfidf.py``): each document's top-3
    terms by the fixed-point floor(tf*ln(N/df)*1e4+0.5) score,
    (score DESC, term ASC) ties."""
    from ..stages.tfidf import tfidf_top_terms

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_top_terms(docs, m=3)


def _doc_link_graph(sf_dir: str):
    """Deterministic synthetic directed link graph over documents:
    d -> (d*d+1) % n, d -> (31*d+7) % n, d -> d % 25 (hub); self-loops
    dropped downstream. Same construction as the SQL twins."""
    docs = _rp(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def synth(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        src = np.concatenate([d, d, d])
        dst = np.concatenate([(d * d + 1) % n, (31 * d + 7) % n,
                              d % 25])
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    return docs.map_batches(synth, batch_format="pyarrow")


def q_adamic_adar(sf_dir: str):
    """Adamic-Adar link prediction (``ops/linkpred.py``): top-100
    non-adjacent pairs of the synthetic doc link graph by the
    fixed-point common-neighbor score."""
    from ..ops.linkpred import adamic_adar

    edges = _doc_link_graph(sf_dir).map_batches(
        lambda b: pa.table({"x": b["src"], "y": b["dst"]}),
        batch_format="pyarrow")
    return adamic_adar(edges, k=100)


def q_walks(sf_dir: str):
    """Deterministic random walks (``ops/walks.py``): 4-step md5-hop
    walks from every doc_id % 50 == 0 start over the synthetic doc
    link graph."""
    from ..ops.walks import deterministic_walks

    docs = _rp(sf_dir, "documents", ["doc_id"])
    starts = docs.filter(
        lambda r: r["doc_id"] % 50 == 0).map_batches(
        lambda b: pa.table({"node": b["doc_id"]}),
        batch_format="pyarrow")
    return deterministic_walks(_doc_link_graph(sf_dir), starts,
                               length=4, seed="w")


def q_pca_gram(sf_dir: str):
    """Distributed PCA sufficient statistics (``stages/pca.py``): the
    exact integer Gram records over the q4-quantized embeddings — the
    one-pass distributed half of PCA (the d x d eigensolve is driver
    work, pytest-gated)."""
    from ..stages.pca import gram_records

    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return gram_records(emb, col="embedding")


def q_winnow(sf_dir: str):
    """Winnowing fingerprints (``stages/winnow.py``): the exact
    selected (pos, fp) set per doc (k=5, w=4) for every 10th doc."""
    from ..stages.winnow import winnow_fingerprints

    docs = _rp(sf_dir, "documents", ["doc_id", "text"]).filter(
        lambda r: r["doc_id"] % 10 == 0)
    return winnow_fingerprints(docs, k=5, w=4)


def q_winnow_pairs(sf_dir: str):
    """Shared-fingerprint doc pairs (``stages/winnow.py``): pairs with
    >= 2 distinct common winnowing fingerprints, corpus-wide."""
    from ..stages.winnow import winnow_pairs

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    return winnow_pairs(docs, k=5, w=4, min_shared=2)


def q_dbscan(sf_dir: str):
    """DBSCAN over embeddings (``stages/dbscan.py``): cosine
    neighborhoods at ROUND(,4) >= 0.3, min_samples=5 — core/border/
    noise roles with MIN-label clusters."""
    from ..stages.dbscan import dbscan_embeddings

    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return dbscan_embeddings(emb, tau=0.3, min_samples=5)


def q_resample(sf_dir: str):
    """Per-user resample+ffill (``stages/resample.py``): each user's
    q2-cents event values sampled on a 6-hour grid over their own
    observed span, forward-filled (ASOF twin)."""
    from ..stages.resample import resample_ffill

    ev = _rp(sf_dir, "events", ["user_id", "ts", "value"])
    STEP = 6 * 3_600_000_000  # 6h in epoch-us

    def prep(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())
        cents = np.floor(np.asarray(batch["value"],
                                    dtype=np.float64) * 100
                         + 0.5).astype(np.int64)
        return pa.table({"user_id": batch["user_id"], "ts_us": us,
                         "cents": pa.array(cents)})

    stream = ev.map_batches(prep, batch_format="pyarrow")
    return resample_ffill(stream, key="user_id", ts="ts_us",
                          value="cents", step=STEP)


def q_sketch_quantiles(sf_dir: str):
    """Mergeable quantile sketch (``stages/sketch.py:QuantileSketch``):
    per-batch MRL/KLL partials, driver merge. Quantity quantiles with
    capacity >= corpus rows at gate scale, so the sketch is exact and
    the twin is the plain exact-rank construction; compaction error is
    property-tested in pytest."""
    from ..stages.sketch import sketch_quantiles

    li = _rp(sf_dir, "lineitem", ["l_quantity"])

    def ints(t: pa.Table) -> pa.Table:
        v = np.floor(np.asarray(t["l_quantity"], dtype=np.float64)
                     * 100 + 0.5).astype(np.int64)
        return pa.table({"qty": pa.array(v)})

    ds = li.map_batches(ints, batch_format="pyarrow")
    return sketch_quantiles(ds, "qty", [0.05, 0.5, 0.95],
                            k=1 << 20)


def q_ppr(sf_dir: str):
    """Personalized PageRank (``ops/pagerank.py``): random walk with
    restart to the seed parts (partkey % 50 == 0) over the
    bidirectional part<->supplier graph — top-100 by seed-biased
    rank."""
    from ..ops.pagerank import personalized_pagerank

    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    OFF = 1_000_000_000

    def both(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(
            np.int64) + OFF
        return pa.table({
            "src": pa.array(np.concatenate([p, s])),
            "dst": pa.array(np.concatenate([s, p]))})

    edges = li.map_batches(both, batch_format="pyarrow")
    parts = _rp(sf_dir, "part", ["p_partkey"])
    seeds = parts.filter(
        lambda r: r["p_partkey"] % 50 == 0).map_batches(
        lambda b: pa.table({"node": b["p_partkey"]}),
        batch_format="pyarrow")
    return (personalized_pagerank(edges, seeds, iterations=5)
            .sort(["rank_q", "node"], descending=[True, False])
            .limit(100))


def q_url_prefixes(sf_dir: str):
    """Path-hierarchy rollup (``stages/urlmine.py``): per (host,
    ancestor-prefix) page counts up to depth 3 over the deterministic
    doc-derived paths of q_url_templates."""
    import hashlib

    from ..stages.urlmine import url_prefix_rollup

    ds = _rp(sf_dir, "documents", ["doc_id", "source"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        paths = []
        for d in ids:
            d = int(d)
            if d % 3 == 0:
                h = hashlib.md5(str(d).encode()).hexdigest()[:20]
                paths.append(f"/obj/{h}/raw")
            elif d % 3 == 1:
                paths.append(f"/cat-{d % 7}/item/{d * d % 100000}/v")
            else:
                paths.append(f"/about/team{d % 5}")
        return pa.table({
            "host": batch["source"],
            "path": pa.array(paths, pa.string()),
        })

    urls = ds.map_batches(synth, batch_format="pyarrow")
    return url_prefix_rollup(urls, max_depth=3)


def q_anomalies(sf_dir: str):
    """Exact z-score anomalies (``stages/anomaly.py``): events whose
    q2-cents value deviates more than 3 sigma from their event_type's
    mean — the flag inequality evaluated in exact integers."""
    from ..stages.anomaly import zscore_anomalies

    ev = _rp(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.floor(np.asarray(batch["value"],
                                    dtype=np.float64) * 100
                         + 0.5).astype(np.int64)
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "cents": pa.array(cents)})

    stream = ev.map_batches(prep, batch_format="pyarrow")
    return zscore_anomalies(stream, group="event_type",
                            value="cents", k=3, id_col="event_id")


def q_fuzzy_pairs(sf_dir: str):
    """Edit-distance near-dups (``stages/fuzzy.py``): doc pairs whose
    lowercased 60-char prefixes share an 8-char block and sit within
    Levenshtein distance 5."""
    from ..stages.fuzzy import edit_distance_pairs

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    return edit_distance_pairs(docs, prefix_len=60, block_len=8,
                               max_dist=5)


def q_host_rank(sf_dir: str, *, broadcast_threshold: int = 2_000_000):
    """Host-level PageRank: the synthetic doc link graph collapsed to
    its host graph (edge host(src)->host(dst) per doc link, parallel
    edges = link multiplicity — exactly ``ops/pagerank.py``'s weight
    semantics), hosts keyed by md5-high-63 so the twin derives the
    identical ids in SQL. Self-host links drop (intra-site).

    The doc→host map is |docs|-sized; below the threshold it ships once
    as a sorted-LUT broadcast and each edge batch re-keys in-worker via
    searchsorted (zero shuffles); above it the two distributed hash
    joins are the documented scale path (parity-tested switch)."""
    from ..ops.pagerank import pagerank
    from ..stages.ngram_lm import _join_partitions

    docs = _rp(sf_dir, "documents", ["doc_id", "source"])

    def host_id(batch: pa.Table) -> pa.Table:
        import hashlib

        ids = [int(hashlib.md5(s.encode()).hexdigest()[:16], 16) >> 1
               for s in batch["source"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"],
                         "hid": pa.array(ids, pa.int64())})

    hmap = docs.map_batches(host_id, batch_format="pyarrow").materialize()
    edges = _doc_link_graph(sf_dir)  # (src, dst) doc ids

    if hmap.count() <= broadcast_threshold:
        from ..ops.gutil import int_lut

        ref = ray.put(int_lut(hmap, "doc_id", "hid"))

        def to_hosts(b: pa.Table) -> pa.Table:
            # clamp + membership-mask: an edge referencing a doc_id
            # absent from documents DROPS (matching the join path's
            # inner join) instead of raising or mis-mapping
            k, v = ray.get(ref)
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            ps = np.minimum(np.searchsorted(k, s), len(k) - 1)
            pd_ = np.minimum(np.searchsorted(k, d), len(k) - 1)
            ok = (k[ps] == s) & (k[pd_] == d)
            hs, hd = v[ps], v[pd_]
            keep = ok & (hs != hd)
            return pa.table({"src": pa.array(hs[keep]),
                             "dst": pa.array(hd[keep])})

        hedges = edges.map_batches(to_hosts, batch_format="pyarrow")
    else:
        nparts = _join_partitions()
        src_h = hmap.map_batches(
            lambda b: b.rename_columns(["src", "src_h"]),
            batch_format="pyarrow")
        dst_h = hmap.map_batches(
            lambda b: b.rename_columns(["dst", "dst_h"]),
            batch_format="pyarrow")
        hedges = (edges
                  .join(src_h, join_type="inner", num_partitions=nparts,
                        on=("src",))
                  .join(dst_h, join_type="inner", num_partitions=nparts,
                        on=("dst",))
                  .map_batches(
                      lambda b: pa.table({"src": b["src_h"],
                                          "dst": b["dst_h"]}).filter(
                          pc.invert(pc.equal(b["src_h"], b["dst_h"]))),
                      batch_format="pyarrow"))
    return (pagerank(hedges, iterations=5)
            .sort(["rank_q", "node"], descending=[True, False]))


def q_assortativity(sf_dir: str, *, broadcast_threshold: int = 2_000_000):
    """Degree-assortativity sufficient statistics (Newman 2002): the
    exact integer moments of (out-degree(src), in-degree(dst)) over
    every edge of the synthetic doc link graph — Pearson r over edge
    endpoints derives on the driver/pytest path; the gate compares the
    arbitrary-precision sums (``stages/moments.py`` discipline).

    The degree tables are |V|-sized; below the threshold they ship once
    as sorted-LUT broadcasts and each edge batch annotates in-worker via
    searchsorted (zero join shuffles of the O(E) edge set); above it the
    two distributed hash joins are the scale path (parity-tested)."""
    from ..stages.moments import moment_records
    from ..stages.ngram_lm import _join_partitions

    edges = _doc_link_graph(sf_dir).map_batches(
        lambda b: pa.table({"src": b["src"], "dst": b["dst"]}).filter(
            pc.invert(pc.equal(b["src"], b["dst"]))),
        batch_format="pyarrow").materialize()

    def deg_partial(col, out):
        def f(batch: pa.Table) -> pa.Table:
            u, c = np.unique(
                batch[col].to_numpy(zero_copy_only=False),
                return_counts=True)
            return pa.table({out: pa.array(u.astype(np.int64)),
                             "c": pa.array(c.astype(np.int64))})
        return f

    od = (edges.map_batches(deg_partial("src", "src"),
                            batch_format="pyarrow")
          .groupby("src").aggregate(Sum("c", alias_name="od"))
          .materialize())
    idg = (edges.map_batches(deg_partial("dst", "dst"),
                             batch_format="pyarrow")
           .groupby("dst").aggregate(Sum("c", alias_name="id_"))
           .materialize())

    if max(od.count(), idg.count()) <= broadcast_threshold:
        from ..ops.gutil import int_lut

        ref = ray.put((int_lut(od, "src", "od"),
                       int_lut(idg, "dst", "id_")))

        def annotate(b: pa.Table) -> pa.Table:
            (ks, vs), (kd, vd) = ray.get(ref)
            dout = vs[np.searchsorted(ks, b["src"].to_numpy(
                zero_copy_only=False))]
            din = vd[np.searchsorted(kd, b["dst"].to_numpy(
                zero_copy_only=False))]
            return pa.table({"dout": pa.array(dout),
                             "din": pa.array(din)})

        pairs = edges.map_batches(annotate, batch_format="pyarrow")
    else:
        nparts = _join_partitions()
        pairs = (edges
                 .join(od, join_type="inner", num_partitions=nparts,
                       on=("src",))
                 .join(idg, join_type="inner", num_partitions=nparts,
                       on=("dst",))
                 .map_batches(
                     lambda b: pa.table({"dout": b["od"],
                                         "din": b["id_"]}),
                     batch_format="pyarrow"))
    return moment_records(pairs, ["din", "dout"], digits=0)


def q_reciprocity(sf_dir: str, *, broadcast_threshold: int = 5_000_000):
    """Directed-graph reciprocity (Newman et al. 2002 network metric):
    the fraction of distinct doc-link edges whose reverse edge exists,
    as integer ppm — n_edges, n_reciprocal, reciprocity_ppm. Edge set
    deduped by one groupby, then the usual broadcast↔join switch keyed
    on EDGE count: below the threshold the reverse-membership test runs
    in-worker against a packed-int64 broadcast set (ids < 2^31); above
    it the reversed edges hash-join the edge set — no unconditional
    O(E) ``ray.put`` at 10^10-edge scale."""
    edges = _doc_link_graph(sf_dir).map_batches(
        lambda b: pa.table({"src": b["src"], "dst": b["dst"]}).filter(
            pc.invert(pc.equal(b["src"], b["dst"]))),
        batch_format="pyarrow")
    e = (edges.groupby(["src", "dst"]).count()
         .drop_columns(["count()"]).materialize())
    n = e.count()

    if n <= broadcast_threshold:
        from ..ops.gutil import collect_tables

        packed_parts = []
        for t in collect_tables(e):
            s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            packed_parts.append((s << 31) + d)
        eset = np.sort(np.concatenate(packed_parts) if packed_parts
                       else np.array([], dtype=np.int64))
        ref = ray.put(eset)

        def rev_hits(batch: pa.Table) -> pa.Table:
            es = ray.get(ref)
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            key = (d.astype(np.int64) << 31) + s
            pos = np.searchsorted(es, key)
            hit = (pos < len(es)) & (es[np.minimum(pos, len(es) - 1)]
                                     == key)
            return pa.table({
                "n": pa.array([batch.num_rows], pa.int64()),
                "r": pa.array([int(hit.sum())], pa.int64())})

        agg = (e.map_batches(rev_hits, batch_format="pyarrow",
                             batch_size=None)
               .aggregate(Sum("n", alias_name="n"),
                          Sum("r", alias_name="r")))
        r = int(agg["r"])
    else:
        from ..stages.ngram_lm import _join_partitions

        rev = e.map_batches(
            lambda b: pa.table({"src": b["dst"], "dst": b["src"]}),
            batch_format="pyarrow")
        r = e.join(rev, join_type="inner",
                   num_partitions=_join_partitions(),
                   on=("src", "dst")).count()
    return pd.DataFrame({
        "n_edges": [n], "n_reciprocal": [r],
        "reciprocity_ppm": [(r * 1_000_000) // n if n else 0]})


def q_clustering_coef(sf_dir: str, *, broadcast_threshold: int = 2_000_000):
    """Local clustering coefficient (Watts-Strogatz 1998): per node
    triangles·10⁶ // (deg·(deg−1)/2) over the part co-order graph —
    integer ppm so the division is exact both sides. Nodes in ≥1
    triangle only (the triangle op's support), deg from the canonical
    undirected edge set. The degree table is |V|-sized: below the
    threshold it ships as a sorted-LUT broadcast (no join shuffle);
    above it the distributed hash join is the scale path."""
    from ..ops.triangles import _canonical_edges, triangle_counts
    from ..stages.basket import cooccur_edges
    from ..stages.ngram_lm import _join_partitions

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = cooccur_edges(li, basket="l_orderkey", item="l_partkey")
    e = _canonical_edges(edges).materialize()
    # pre_canonical: e is already the distinct (x<y) set — skip the op's
    # internal re-canonicalization; reuse its degree table instead of a
    # second endpoints groupby (both were full extra passes over E)
    tri, deg = triangle_counts(e, pre_canonical=True, return_degrees=True)

    def finish(batch: pa.Table) -> pa.Table:
        t = batch["triangles"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        d = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        cap = d * (d - 1) // 2
        return pa.table({
            "node": batch["node"],
            "triangles": pa.array(t),
            "deg": pa.array(d),
            "coef_ppm": pa.array(
                np.where(cap > 0, (t * 1_000_000) // np.maximum(cap, 1),
                         0).astype(np.int64))})

    deg = deg.materialize()
    if deg.count() <= broadcast_threshold:
        from ..ops.gutil import int_lut

        ref = ray.put(int_lut(deg, "node", "deg"))

        def annotate(batch: pa.Table) -> pa.Table:
            k, v = ray.get(ref)
            d = v[np.searchsorted(k, batch["node"].to_numpy(
                zero_copy_only=False))]
            return finish(batch.append_column("deg", pa.array(d)))

        joined = tri.map_batches(annotate, batch_format="pyarrow")
    else:
        joined = tri.join(
            deg, join_type="inner", num_partitions=_join_partitions(),
            on=("node",)).map_batches(finish, batch_format="pyarrow")
    return joined.sort("node")


def q_window(sf_dir: str):
    """Keyed window functions (``ops/window.py``): per user ordered by
    (ts, event_id) — row_number, lag/lead of the integer-cents value,
    exact running sum, rolling-3 sum. Values go through
    floor(value·100 + 0.5) so every sum is an order-free int64 and the
    DuckDB window twin matches bit-for-bit."""
    import pyarrow.compute as pc

    from ..ops.window import keyed_window

    ev = _rp(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "iv": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
        })

    w = keyed_window(ev.map_batches(prep, batch_format="pyarrow"),
                     key="user_id", order=["ts_us", "event_id"],
                     value="iv")
    out = (w.select_columns(["user_id", "event_id", "row_no", "lag1",
                             "lead1", "cum_sum", "roll3_sum"])
           .sort(["user_id", "event_id"]))
    return out


def q_dedup_keep_best(sf_dir: str):
    """Quality-aware canonical selection over near-dup clusters (the
    RefinedWeb keep-best recipe — min-id keep loses the best copy):
    MinHash-LSH candidate pairs → connected components → per cluster
    KEEP the doc with the most whitespace tokens, ties to the smaller
    doc_id; docs outside every cluster keep themselves. →
    (doc_id, cluster_id, keep_doc_id, kept).

    Shape: the component table covers only docs in ≥1 candidate pair
    (the duplicate fraction — small by construction) and ships as one
    sorted-LUT broadcast; token counts stream per batch (text read
    once, never shuffled); the keep-best pick is one cluster-hash-shard
    groupby vectorized across clusters."""
    from ..ops.gutil import group_by_key_shards, int_lut
    from ..stages.cluster import connected_components

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_candidate_pairs(ds)
    comp = connected_components(pairs)
    ref = ray.put(int_lut(comp, "node", "label"))

    def annotate(t: pa.Table) -> pa.Table:
        k, v = ray.get(ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = pd.Series(t["text"].to_pylist()).fillna("")
        ws = s.str.split().str.len().fillna(0).to_numpy().astype(np.int64)
        pos = np.searchsorted(k, ids)
        found = (pos < len(k)) & (k[np.minimum(pos, max(len(k) - 1, 0))]
                                  == ids) if len(k) else np.zeros(
                                      len(ids), dtype=bool)
        cl = np.where(found, v[np.minimum(pos, max(len(k) - 1, 0))], ids)
        return pa.table({"doc_id": pa.array(ids), "ws": pa.array(ws),
                         "cluster_id": pa.array(cl)})

    ann = ds.map_batches(annotate, batch_format="pyarrow")

    def keep_best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cluster_id", "ws", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        best = (g.drop_duplicates("cluster_id")[["cluster_id", "doc_id"]]
                .rename(columns={"doc_id": "keep_doc_id"}))
        out = g.merge(best, on="cluster_id")
        out["kept"] = (out["doc_id"] == out["keep_doc_id"]).astype("int64")
        return out[["doc_id", "cluster_id", "keep_doc_id", "kept"]]

    return group_by_key_shards(ann, "cluster_id", keep_best).sort("doc_id")


def q_ppjoin(sf_dir: str):
    """Exact set-similarity self-join (``stages/ppjoin.py``): every doc
    pair with 3-word-shingle Jaccard ≥ 0.7 — prefix-filtered + length-
    filtered candidates, exact integer verification (10·inter ≥
    7·union). Shingles, not unigrams: the synthetic corpus draws words
    from a ~31-token vocabulary, so unigram sets make ~40 % of ALL doc
    pairs genuinely similar (a quadratic exact answer by construction)
    while the shingle vocabulary scales with the corpus and the output
    is the true near-dup set. The oracle needs no prefix trick: the
    full shingle equi-join must agree exactly because prefix filtering
    is complete."""
    from ..stages.ppjoin import ppjoin_pairs

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ppjoin_pairs(ds, threshold_num=7, threshold_den=10,
                        shingle_k=3)


def q_ngram_jaccard(sf_dir: str):
    """Exact 3-word-shingle Jaccard over every consecutive doc-id pair
    (``stages/dedup.py:ngram_jaccard_pairs`` — the distributed form of
    the scalar verification function, same ``max(1, n−k+1)`` shingle
    windows). One slim (pair, side, tok-hash) shard shuffle; |A|, |B|
    and |A∩B| all fall out of one per-shard duplicate-count merge.
    → (doc_a, doc_b, inter, uni), int64, sorted by doc_a."""
    from ..stages.dedup import ngram_jaccard_pairs

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(ds, k=3)


def q_fim(sf_dir: str):
    """Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    Training of Language Models to Fill in the Middle" — the public FIM
    recipe): for a deterministic 50 % of docs (md5 coin on doc_id),
    split the text at two md5-derived character offsets and emit the
    PSM rearrangement ``<PRE>prefix<SUF>suffix<MID>middle``; the rest
    pass through. Pure streaming map (text read once, never shuffled);
    the gate pins md5 of the transformed text so rows stay slim.
    → (doc_id, fim_applied, lo, hi, fim_md5), sorted by doc_id."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def fim(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        applied, los, his, md5s = [], [], [], []
        for did, text in zip(ids, texts):
            text = text or ""
            n = len(text)
            h1 = int(hashlib.md5(f"fim-a:{did}".encode())
                     .hexdigest()[:16], 16)
            h2 = int(hashlib.md5(f"fim-b:{did}".encode())
                     .hexdigest()[:16], 16)
            if n >= 10 and h1 % 2 == 0:
                o1, o2 = 1 + h1 % (n - 1), 1 + h2 % (n - 1)
                lo, hi = min(o1, o2), max(o1, o2)
                out = ("<PRE>" + text[:lo] + "<SUF>" + text[hi:]
                       + "<MID>" + text[lo:hi])
                applied.append(1)
            else:
                lo = hi = 0
                out = text
                applied.append(0)
            los.append(lo)
            his.append(hi)
            md5s.append(hashlib.md5(out.encode()).hexdigest())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "fim_applied": pa.array(applied, pa.int64()),
            "lo": pa.array(los, pa.int64()),
            "hi": pa.array(his, pa.int64()),
            "fim_md5": pa.array(md5s, pa.string()),
        })

    return ds.map_batches(fim, batch_format="pyarrow").sort("doc_id")
