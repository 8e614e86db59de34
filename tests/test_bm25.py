"""BM25 ranking (stages/bm25.py) vs a pure-Python oracle."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from thecrowler_ray.stages.bm25 import bm25_topk

DOCS = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "spark window merge spark spark",
            "window window merge table scan",
            "the quick brown fox",
            "spark",
            "",
        ],
    }
)

TERMS = ["spark", "window"]


def brute_force(docs, terms, k1=1.2, b=0.75, scale=10_000):
    toks = {r.doc_id: (r.text or "").lower().split()
            for r in docs.itertuples()}
    n = len(toks)
    total_dl = sum(len(t) for t in toks.values())
    rows = []
    for doc_id, tk in toks.items():
        score, hits = 0, 0
        for term in terms:
            tf = tk.count(term)
            if tf == 0:
                continue
            df = sum(term in set(t) for t in toks.values())
            idf = np.log(
                1.0 + np.float64(n - df + 0.5) / np.float64(df + 0.5)
            )
            norm = np.float64(len(tk) * n) / np.float64(total_dl)
            num = np.float64(tf) * (1.2 + 1.0)
            den = np.float64(tf) + 1.2 * (1.0 - 0.75) + 1.2 * 0.75 * norm
            score += int(math.floor(((idf * num) / den) * scale + 0.5))
            hits += 1
        if hits:
            rows.append((doc_id, hits, score))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_terms_hit", "score_q4"]
    )


def test_matches_brute_force(ray_session):
    got = bm25_topk(rd.from_pandas(DOCS), TERMS).to_pandas()
    want = brute_force(DOCS, TERMS)
    pd.testing.assert_frame_equal(
        got.astype({"n_terms_hit": "int64", "score_q4": "int64"}),
        want.astype({"n_terms_hit": "int64", "score_q4": "int64"}),
    )
    # docs 2 (no hits) and 4 (empty) emit no row
    assert set(got["doc_id"]) == {0, 1, 3}


def test_ranking_intuition(ray_session):
    got = bm25_topk(rd.from_pandas(DOCS), TERMS).to_pandas()
    # doc 0 has 3× spark + rare term mass; it must outrank doc 3 (1× spark)
    ids = got["doc_id"].tolist()
    assert ids.index(0) < ids.index(3)


def test_topk_truncation_and_ties(ray_session):
    # 30 identical docs: ordering must fall back to doc_id ASC, k bounds rows
    docs = pd.DataFrame(
        {"doc_id": list(range(30)), "text": ["spark alpha"] * 30}
    )
    got = bm25_topk(rd.from_pandas(docs), ["spark"], k=7).to_pandas()
    assert got["doc_id"].tolist() == list(range(7))
    assert got["score_q4"].nunique() == 1


def test_empty_terms_raises(ray_session):
    with pytest.raises(ValueError):
        bm25_topk(rd.from_pandas(DOCS), [])


def test_property_random_corpora(ray_session):
    """Engine == brute force on randomized corpora (vocab, lengths,
    duplicate docs, empty docs) — seeds fixed for reproducibility."""
    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(5):
        n = int(rng.integers(5, 40))
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "text": [
                    " ".join(rng.choice(vocab,
                                        size=int(rng.integers(0, 25))))
                    for _ in range(n)
                ],
            }
        )
        terms = list(rng.choice(vocab, size=3, replace=False))
        got = bm25_topk(rd.from_pandas(docs).repartition(3), terms,
                        k=15).to_pandas()
        want = brute_force(docs, terms).head(15)
        pd.testing.assert_frame_equal(
            got.astype(want.dtypes.to_dict()).reset_index(drop=True),
            want.reset_index(drop=True),
        )
