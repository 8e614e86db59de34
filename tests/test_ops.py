"""Training-data operator tests (dedup, similarity, text analysis, media)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from thecrowler_ray.ops.agg import pre_aggregated_count, pre_aggregated_sum
from thecrowler_ray.stages.dedup import (
    MinHashSignatures,
    embedding_neardup_pairs,
    estimate_jaccard,
    exact_dedup,
    minhash_candidate_pairs,
    ngram_jaccard,
)
from thecrowler_ray.stages.multimodal import (
    DecodeStage,
    frame_sample_plan,
    resize_plan_stage,
    synth_media_table,
)
from thecrowler_ray.stages.similarity import lsh_topk_cosine, topk_cosine
from thecrowler_ray.stages.text_analysis import (
    fingerprint_stage,
    quality_stage,
    simhash64,
    simhash_stage,
    token_count_stage,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup():
    docs = pa.table(
        {
            "doc_id": [3, 1, 2, 4, 5],
            "text": ["same text", "same text", "unique a", "unique b", "same text"],
        }
    )
    out = exact_dedup(ray.data.from_arrow(docs)).to_pandas().sort_values("doc_id")
    assert sorted(out.doc_id) == [1, 2, 4]  # min id wins per hash


@pytest.mark.usefixtures("ray_session")
def test_minhash_similarity_detects_near_dups():
    words = [f"tok{i}" for i in range(200)]
    base = " ".join(words)
    w2 = list(words)
    w2[100] = "changed"
    near = " ".join(w2)
    other = " ".join(f"other{i}" for i in range(200))
    docs = pa.table({"doc_id": [1, 2, 3], "text": [base, near, other]})
    pairs = minhash_candidate_pairs(ray.data.from_arrow(docs)).to_pandas()
    assert (1, 2) in set(zip(pairs.doc_a, pairs.doc_b))
    assert (1, 3) not in set(zip(pairs.doc_a, pairs.doc_b))
    m = MinHashSignatures()
    est = estimate_jaccard(m.signature(base), m.signature(near))
    exact = ngram_jaccard(base, near)
    assert abs(est - exact) < 0.2
    assert ngram_jaccard(base, base) == 1.0


def test_simhash_properties():
    a = simhash64("the quick brown fox".split())
    b = simhash64("the quick brown fox".split())
    c = simhash64("totally different words here".split())
    assert a == b
    ham = bin(a ^ c).count("1")
    assert ham > 4
    assert simhash64([]) == 0


@pytest.mark.usefixtures("ray_session")
def test_topk_cosine_matches_numpy():
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack(ds.to_pandas()["embedding"].to_numpy())
    ids = ds.to_pandas()["vec_id"].to_numpy()
    q = emb[0]
    got = topk_cosine(ds, q, k=5)
    unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = unit @ (q / np.linalg.norm(q))
    expect = ids[np.argsort(-sims)[:5]]
    assert list(got[got.query_id == 0].vec_id) == list(expect)
    assert got.cosine.iloc[0] == pytest.approx(1.0, abs=1e-5)


@pytest.mark.usefixtures("ray_session")
def test_lsh_topk_recalls_top1():
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack(ds.to_pandas()["embedding"].to_numpy())
    q = emb[7]
    approx = lsh_topk_cosine(ds, q, k=5, dim=emb.shape[1])
    assert 7 in set(approx.vec_id)  # the vector itself must be found


@pytest.mark.usefixtures("ray_session")
def test_embedding_neardup_pairs():
    emb = np.random.default_rng(3).normal(size=(20, 16)).astype(np.float32)
    emb[5] = emb[4] * 1.001  # a near-duplicate pair
    t = pa.table({"vec_id": list(range(20)),
                  "embedding": [e.tolist() for e in emb]})
    pairs = embedding_neardup_pairs(
        ray.data.from_arrow(t), threshold=0.99
    ).to_pandas()
    assert (4, 5) in set(zip(pairs.vec_a, pairs.vec_b))


def test_text_analysis_stages():
    df = pd.DataFrame({"text": ["The quick brown fox, jumps!", "", "word " * 50]})
    out = token_count_stage(df.copy())
    assert out.ws_tokens.tolist() == [5, 0, 50]
    q = quality_stage(df.copy())
    assert q.n_words.tolist()[0] == 5
    assert 0 <= q.quality_score.iloc[0] <= 1
    f = fingerprint_stage(df.copy())
    assert f.fingerprint_md5.iloc[0] != f.fingerprint_md5.iloc[1]
    # fingerprint is whitespace-insensitive
    g = fingerprint_stage(pd.DataFrame({"text": ["the  quick\tbrown Fox"]}))
    h = fingerprint_stage(pd.DataFrame({"text": ["the quick brown fox"]}))
    assert g.fingerprint_md5.iloc[0] == h.fingerprint_md5.iloc[0]
    s = simhash_stage(df.copy())
    assert s.simhash.dtype == np.int64


@pytest.mark.usefixtures("ray_session")
def test_agg_helpers_match_pandas():
    ds = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                               columns=["l_returnflag", "l_quantity"])
    got = pre_aggregated_count(ds, ["l_returnflag"], "cnt").to_pandas()
    pdf = ds.to_pandas()
    expect = pdf.groupby("l_returnflag").size()
    for _, r in got.iterrows():
        assert r.cnt == expect[r.l_returnflag]
    got2 = pre_aggregated_sum(ds, ["l_returnflag"], "l_quantity", "sq").to_pandas()
    expect2 = pdf.groupby("l_returnflag").l_quantity.sum()
    for _, r in got2.iterrows():
        assert r.sq == pytest.approx(expect2[r.l_returnflag])


@pytest.mark.usefixtures("ray_session")
def test_multimodal_decode_pipeline():
    media = synth_media_table(40)
    ds = ray.data.from_arrow(media)
    decoded = ds.map_batches(
        DecodeStage, batch_format="pyarrow", batch_size=8, concurrency=2
    )
    planned = decoded.map_batches(
        resize_plan_stage, batch_format="pyarrow"
    ).map_batches(frame_sample_plan, batch_format="pyarrow")
    out = planned.to_pandas()
    assert len(out) == 40
    img = out[out.kind == "image"]
    assert (img.target_width <= 512).all() and (img.target_width > 0).all()
    vid = out[out.kind == "video"]
    assert all(len(f) > 0 for f in vid[vid.duration_ms > 1000].frame_ts_ms)
    assert (out[out.kind == "audio"].width == 0).all()
    # feature vectors are unit-norm 16-dim
    feats = np.stack(out.feature.to_numpy())
    assert feats.shape[1] == 16
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-5)
    # strict real-codec mode: JPEG now HAS a codec (codecs_jpeg), so a
    # truncated payload is a decode error, not a missing-codec error
    jpeg = pa.table(
        {
            "media_id": ["j1"],
            "doc_id": ["d1"],
            "mime": ["image/jpeg"],
            "payload": [b"\xff\xd8\xff\xe0 fake"],
        }
    )
    with pytest.raises(ValueError):
        DecodeStage(real_codec=True, strict=True)(jpeg)
    # non-strict mode degrades the corrupt row to the byte-derived fake
    row = DecodeStage(real_codec=True, strict=False)(jpeg)
    assert row.num_rows == 1
    # formats with no codec in this container still raise NotImplementedError
    webp = pa.table(
        {
            "media_id": ["w1"],
            "doc_id": ["d1"],
            "mime": ["image/webp"],
            "payload": [b"RIFF0000WEBP"],
        }
    )
    with pytest.raises(NotImplementedError):
        DecodeStage(real_codec=True, strict=True)(webp)


@pytest.mark.usefixtures("ray_session")
def test_duplicate_ngram_stats():
    """Exact-substring dedup: cross-doc duplicated 3-grams found, window
    union counted, within-doc-only repeats ignored, short docs skipped."""
    from thecrowler_ray.stages.dedup import (
        cut_duplicate_spans,
        duplicate_ngram_stats,
        ngram_hash_rows,
    )

    shared = "alpha beta gamma delta"  # 2 shared 3-grams, union 4 tokens
    docs = pa.table(
        {
            "doc_id": ["a", "b", "c", "d", "e"],
            "text": [
                f"{shared} one two three",
                f"zero {shared} nine",
                "only here words that repeat repeat repeat repeat repeat",
                "unrelated totally different tokens everywhere now",
                "tiny doc",  # < n tokens → no ngrams
            ],
        }
    )
    ds = ray.data.from_arrow(docs)
    out = (
        duplicate_ngram_stats(ds, n=3, num_shards=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert set(out.index) == {"a", "b"}
    # both docs share exactly the 2 rolling 3-grams of the 4-token phrase
    assert (out.dup_ngrams == 2).all()
    assert (out.dup_tokens == 4).all()

    # removal half: cutting the duplicated windows removes those 4 tokens
    assert (
        cut_duplicate_spans(f"{shared} one two three", [0, 1], 3)
        == "one two three"
    )

    # short docs emit zero rows at the hash stage
    rows = ngram_hash_rows(docs.slice(4, 1), n=3)
    assert rows.num_rows == 0


def test_simhash_candidate_pairs():
    from thecrowler_ray.stages.dedup import simhash_candidate_pairs

    words = [f"tok{i}" for i in range(150)]
    base = " ".join(words)
    w2 = list(words)
    w2[10] = "changed"
    near = " ".join(w2)
    other = " ".join(f"zzz{i}" for i in range(150))
    docs = pa.table({"doc_id": [1, 2, 3], "text": [base, near, other]})
    pairs = simhash_candidate_pairs(
        ray.data.from_arrow(docs), max_hamming=8
    ).to_pandas()
    assert (1, 2) in set(zip(pairs.doc_a, pairs.doc_b))
    assert (1, 3) not in set(zip(pairs.doc_a, pairs.doc_b))
    assert (pairs.hamming <= 8).all()


@pytest.mark.usefixtures("ray_session")
def test_rows_only_queries_deterministic():
    """Rows-only driver queries must be bit-deterministic across runs (the
    driver may compare across rounds)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sf = "/root/testdata/sf0.001"

    def canon(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        cols = [c for c in sorted(df.columns) if df[c].dtype != object or
                isinstance(df[c].iloc[0] if len(df) else "", (str, int, float))]
        df = df[cols]
        return df.sort_values(cols, kind="mergesort").reset_index(drop=True)

    # the queries that remain rows-only in oracle_sql() must at least be
    # bit-deterministic (q_minhash_pairs/q_simhash graduated to oracles but
    # stay here as regression canaries)
    for name in ("q_crawl", "q_action_rules", "q_scrape_docs",
                 "q_minhash_pairs", "q_simhash"):
        a = canon(qs[name](sf))
        b = canon(qs[name](sf))
        pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_embedding_lsh_neardup_planted_recall():
    """Banded multi-table hyperplane LSH (scale path, bucket_col=None):
    auto-tuned table count reaches >=90% recall on planted cos>=0.95
    near-dups with exact in-group verification (no false positives)."""
    from thecrowler_ray.stages.dedup import embedding_neardup_pairs, lsh_tables_for

    assert lsh_tables_for(1.0, 16) == 1
    with pytest.raises(ValueError):
        lsh_tables_for(-0.99, 64)

    rng = np.random.default_rng(5)
    base = rng.normal(size=(1500, 64)).astype(np.float32)
    dups, truth = [], set()
    for i in range(50):
        v = base[i]
        noisy = v + 0.08 * rng.normal(size=64).astype(np.float32) * np.linalg.norm(v) / 8
        cos = float(v @ noisy / (np.linalg.norm(v) * np.linalg.norm(noisy)))
        if cos >= 0.95:
            dups.append(noisy)
            truth.add((i, 1500 + len(dups) - 1))
    emb = np.vstack([base] + [d[None] for d in dups])
    t = pa.table({
        "vec_id": np.arange(len(emb)),
        "embedding": [list(map(float, e)) for e in emb],
    })
    got = embedding_neardup_pairs(
        ray.data.from_arrow(t), threshold=0.95
    ).to_pandas()
    gset = set(zip(got.vec_a, got.vec_b)) if len(got) else set()
    assert len(gset & truth) >= 0.9 * len(truth)
    # every reported pair genuinely passes the threshold (in-group verify)
    unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    for a, b in gset:
        assert float(unit[a] @ unit[b]) >= 0.95 - 1e-9


@pytest.mark.usefixtures("ray_session")
def test_dim_join_threshold_paths_equal():
    """The native-join path (forced via join_threshold=0) must produce the
    same result as the broadcast path — the scale switch is invisible."""
    from thecrowler_ray.pipelines.queries import q_nation_revenue, q_top_customers

    sf = "/root/testdata/sf0.001"
    for fn, sort_cols in ((q_top_customers, ["c_custkey"]),
                          (q_nation_revenue, ["n_name"])):
        a = fn(sf)
        b = fn(sf, join_threshold=0)
        a = a.sort_values(sort_cols).reset_index(drop=True)
        b = b.sort_values(sort_cols).reset_index(drop=True)[a.columns]
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_ivf_topk_recall_vs_exact():
    """IVF-Flat approximate top-k: with enough probes the result equals the
    exact scan; with nprobe = n_centroids it MUST equal it (all lists
    scanned)."""
    from thecrowler_ray.stages.similarity import ivf_topk_cosine, topk_cosine

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack(ds.to_pandas()["embedding"].to_numpy())
    q = emb[0]
    exact = topk_cosine(ds, q, k=10)
    full = ivf_topk_cosine(ds, q, k=10, n_centroids=16, nprobe=16)
    assert list(full.vec_id) == list(exact.vec_id)
    approx = ivf_topk_cosine(ds, q, k=10, n_centroids=16, nprobe=6)
    # the query vector itself lives in a probed list (it defines them)
    assert approx.vec_id.iloc[0] == exact.vec_id.iloc[0]
    recall = len(set(approx.vec_id) & set(exact.vec_id)) / 10
    assert recall >= 0.5, recall


@pytest.mark.usefixtures("ray_session")
def test_screenshot_stage_stores_files(tmp_path):
    """S6 storage plumbing: deterministic per-url file names, real writes,
    (path, size, hash) records; payload is the documented codec fake."""
    from thecrowler_ray.stages.multimodal import ScreenshotStage

    out = str(tmp_path / "shots")
    ds = ray.data.from_arrow(pa.table({
        "url": ["http://a.test/1", "http://b.test/2"],
        "html": ["<p>alpha</p>", "<p>beta page</p>"],
    }))
    got = ds.map_batches(
        ScreenshotStage, fn_constructor_args=(out,),
        batch_format="pyarrow", concurrency=1,
    ).to_pandas().sort_values("url").reset_index(drop=True)
    import hashlib
    import os

    assert len(got) == 2
    for _, r in got.iterrows():
        assert os.path.exists(r.screenshot_path)
        payload = open(r.screenshot_path, "rb").read()
        assert payload.startswith(b"\x89PNG")
        assert len(payload) == r.byte_len
        assert hashlib.sha256(payload).hexdigest() == r.sha256
    # deterministic: same url -> same file name
    assert got.screenshot_path[0].endswith(
        hashlib.sha1(b"http://a.test/1").hexdigest() + ".png"
    )


def test_hll_sketch_accuracy_and_merge():
    """HLL estimate within the expected error band (~1.04/sqrt(m) ≈ 1.6%
    at b=12); order-independent max-merge equals single-pass."""
    import numpy as np

    from thecrowler_ray.stages.sketch import HyperLogLog, _hash64

    values = [f"user-{i}" for i in range(50_000)]
    one = HyperLogLog(12)
    one.add_values(values)
    est = one.estimate()
    assert abs(est - 50_000) / 50_000 < 0.05, est

    # merged partials == single pass, regardless of split and order
    parts = [HyperLogLog(12) for _ in range(4)]
    for i, v in enumerate(values):
        parts[i % 4].add_values([v])
    merged = parts[3].merge(parts[1]).merge(parts[0]).merge(parts[2])
    np.testing.assert_array_equal(merged.registers, one.registers)

    # duplicates do not move the registers
    dup = HyperLogLog(12)
    dup.add_values(values + values[:1000])
    np.testing.assert_array_equal(dup.registers, one.registers)

    # small-cardinality linear-counting regime is exact-ish
    small = HyperLogLog(12)
    small.add_values([f"s{i}" for i in range(100)])
    assert abs(small.estimate() - 100) < 8

    # hash matches the SQL construction (md5 high 64 of the string form)
    import hashlib

    h = _hash64(["42"])
    assert h[0] == int(hashlib.md5(b"42").hexdigest()[:16], 16)


@pytest.mark.usefixtures("ray_session")
def test_hll_distinct_dataset():
    from thecrowler_ray.stages.sketch import HyperLogLog, hll_distinct

    tbl = pa.table({"u": [f"u{i % 700}" for i in range(5000)]})
    ds = ray.data.from_arrow(tbl).repartition(6)
    hll = hll_distinct(ds, "u", b=12)
    ref = HyperLogLog(12)
    ref.add_values([f"u{i}" for i in range(700)])
    np.testing.assert_array_equal(hll.registers, ref.registers)
    assert abs(hll.estimate() - 700) / 700 < 0.05


@pytest.mark.usefixtures("ray_session")
def test_bottom_k_sample_stable_and_kmv():
    """Bottom-k sample is identical across partitionings (stable,
    mergeable) and its k-th hash gives a sane KMV cardinality estimate."""
    from thecrowler_ray.stages.sample import bottom_k_sample, kmv_estimate

    tbl = pa.table({"key": [f"k{i}" for i in range(4000)]})
    a = bottom_k_sample(ray.data.from_arrow(tbl).repartition(3), "key", 64)
    b = bottom_k_sample(ray.data.from_arrow(tbl).repartition(11), "key", 64)
    assert list(a.key) == list(b.key)
    assert len(a) == 64
    assert list(a.sample_hash) == sorted(a.sample_hash)
    est = kmv_estimate(a, 64)
    assert abs(est - 4000) / 4000 < 0.35  # k=64 → ~12% stderr
    # fewer rows than k → exact
    small = bottom_k_sample(ray.data.from_arrow(tbl.slice(0, 10)), "key", 64)
    assert kmv_estimate(small, 64) == 10


@pytest.mark.usefixtures("ray_session")
def test_cms_sketch_query_and_merge():
    """CMS point queries upper-bound true counts (and are exact when no
    collision); merged partials equal one-pass counters."""
    from thecrowler_ray.stages.sketch import CountMinSketch, cms_frequencies

    values = ["a"] * 100 + ["b"] * 10 + [f"x{i}" for i in range(50)]
    one = CountMinSketch(4, 256)
    one.add_values(values)
    assert one.query("a") >= 100 and one.query("b") >= 10
    assert one.query("a") <= 160  # collisions bounded by n/w per row

    tbl = pa.table({"u": values})
    merged = cms_frequencies(ray.data.from_arrow(tbl).repartition(5), "u",
                             d=4, w=256)
    np.testing.assert_array_equal(merged.counts, one.counts)
    assert merged.query("a") == one.query("a")


@pytest.mark.usefixtures("ray_session")
def test_fixed_bin_histogram_quantiles_and_merge():
    from thecrowler_ray.stages.sketch import (
        FixedBinHistogram,
        histogram_sketch,
    )

    vals = np.arange(1000, dtype=np.float64)  # 0..999
    one = FixedBinHistogram(width=10.0)
    one.add_values(vals)
    # quantile error bounded by one bin width
    assert abs(one.quantile(0.5) - 500) <= 10
    assert abs(one.quantile(0.99) - 990) <= 10
    assert one.quantile(0.0) <= 10

    # distributed merge equals one pass
    tbl = pa.table({"v": vals})
    merged = histogram_sketch(ray.data.from_arrow(tbl).repartition(7),
                              "v", width=10.0)
    np.testing.assert_array_equal(merged.counts, one.counts)

    # outliers clamp into edge bins instead of growing the array
    edge = FixedBinHistogram(width=1.0, lo_bin=-4, hi_bin=4)
    edge.add_values([-1e9, 1e9, 0.5])
    assert edge.counts[0] == 1 and edge.counts[-1] == 1


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_pairs_matches_scalar():
    # the distributed consecutive-pair op must agree with the scalar
    # verification function on every pair, including short/empty docs
    # and id gaps (pair (6,7) missing its left side must not appear)
    from thecrowler_ray.stages.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 30)))
             for _ in range(8)]
    texts[2] = ""            # empty -> one '' shingle
    texts[3] = "one two"     # <3 words -> one 2-word shingle
    ids = [0, 1, 2, 3, 4, 5, 7, 8]  # gap at 6
    docs = pa.table({"doc_id": ids, "text": texts})
    got = (ngram_jaccard_pairs(ray.data.from_arrow(docs), k=3)
           .to_pandas().reset_index(drop=True))
    by_id = dict(zip(ids, texts))
    want = []
    for a in ids:
        if a + 1 not in by_id:
            continue
        def sh(t):
            toks = t.lower().split()
            return {" ".join(toks[i:i + 3])
                    for i in range(max(1, len(toks) - 2))}
        A, B = sh(by_id[a]), sh(by_id[a + 1])
        want.append((a, a + 1, len(A & B), len(A | B)))
    exp = pd.DataFrame(want, columns=["doc_a", "doc_b", "inter", "uni"])
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"))
