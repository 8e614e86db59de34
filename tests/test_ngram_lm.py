"""Bigram-LM scoring (stages/ngram_lm.py) vs a brute-force reference,
plus broadcast-vs-join path parity and the CCNet-style selection."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from thecrowler_ray.stages.ngram_lm import (
    bigram_lm_scores,
    bigram_lm_select,
    bigram_model_counts,
)

DOCS = pd.DataFrame(
    {
        "doc_id": ["d0", "d1", "d2", "d3", "d4", "d5"],
        "text": [
            "the cat sat on the mat",
            "the cat ran",
            "der hund lief schnell weg heute",
            "the cat sat on the mat again and again",
            "one",  # single token → no bigrams → no row
            "",  # empty → no row
        ],
        "lang": ["en", "en", "de", "en", "en", "en"],
    }
)


def brute_force(docs: pd.DataFrame, target="en", scale=10_000):
    """Pure-Python oracle: add-1 smoothed bigram model over target docs."""
    c1: dict = {}
    c2: dict = {}
    for _, r in docs[docs["lang"] == target].iterrows():
        toks = (r["text"] or "").lower().split()
        for t in toks:
            c1[t] = c1.get(t, 0) + 1
        for a, b in zip(toks[:-1], toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    v = len(c1)
    rows = []
    for _, r in docs.iterrows():
        toks = (r["text"] or "").lower().split()
        if len(toks) < 2:
            continue
        lp, oov = 0, 0
        for a, b in zip(toks[:-1], toks[1:]):
            hit2 = c2.get((a, b), 0)
            hit1 = c1.get(a, 0)
            lp += math.floor(
                np.log(np.float64(hit2 + 1) / np.float64(hit1 + v)) * scale
                + 0.5
            )
            oov += hit2 == 0
        rows.append((r["doc_id"], len(toks) - 1, oov, lp))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_bigrams", "oov_bigrams", "logprob_q4"]
    ).sort_values("doc_id").reset_index(drop=True)


def _got(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_scores_match_brute_force(ray_session):
    got = _got(bigram_lm_scores(rd.from_pandas(DOCS)))
    want = brute_force(DOCS)
    pd.testing.assert_frame_equal(
        got.astype({"n_bigrams": "int64", "oov_bigrams": "int64",
                    "logprob_q4": "int64"}),
        want.astype({"n_bigrams": "int64", "oov_bigrams": "int64",
                     "logprob_q4": "int64"}),
    )
    # docs with <2 tokens emit no row
    assert set(got["doc_id"]) == {"d0", "d1", "d2", "d3"}


def test_join_path_parity(ray_session):
    """broadcast_threshold=0 forces the distributed-join path; results
    must be identical to the broadcast path."""
    a = _got(bigram_lm_scores(rd.from_pandas(DOCS)))
    b = _got(bigram_lm_scores(rd.from_pandas(DOCS), broadcast_threshold=0))
    pd.testing.assert_frame_equal(
        a, b[a.columns].astype(a.dtypes.to_dict())
    )


def test_model_counts(ray_session):
    model = bigram_model_counts(rd.from_pandas(DOCS)).to_pandas()
    uni = model[model["kind"] == 0].set_index("w0")["c"].to_dict()
    # 'the' appears 2+1+2 times in en docs ('der hund...' is de)
    assert uni["the"] == 5
    assert "der" not in uni
    bi = model[model["kind"] == 1]
    assert (
        bi[(bi["w0"] == "the") & (bi["w1"] == "cat")]["c"].iloc[0] == 3
    )


def test_fit_ordering_and_select(ray_session):
    """In-domain en docs must fit the en model better (higher mean
    log-prob == lower perplexity) than the German doc."""
    got = _got(bigram_lm_scores(rd.from_pandas(DOCS)))
    fit = (got["logprob_q4"] / got["n_bigrams"]).to_numpy()
    by_id = dict(zip(got["doc_id"], fit))
    assert by_id["d0"] > by_id["d2"]
    assert by_id["d2"] == min(by_id.values())
    # the German doc is all-OOV under the en model
    oov = dict(zip(got["doc_id"], got["oov_bigrams"]))
    assert oov["d2"] == got.set_index("doc_id").loc["d2", "n_bigrams"]

    sel = bigram_lm_select(rd.from_pandas(DOCS), k=3).to_pandas()
    assert len(sel) == 3
    assert "d2" not in set(sel["doc_id"])


def test_no_target_rows_raises(ray_session):
    docs = DOCS.assign(lang="fr")
    with pytest.raises(ValueError):
        bigram_lm_scores(rd.from_pandas(docs), target_value="en")


def test_pmi_collocations(ray_session):
    """PMI vs a brute-force recompute over a corpus with one engineered
    strong collocation ('new york' always adjacent, its parts rare
    elsewhere)."""
    import math

    from thecrowler_ray.stages.ngram_lm import pmi_collocations

    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": (["new york city hall"] * 5
                     + ["the cat the dog the cat"] * 3),
            "lang": ["en"] * 8,
        }
    )
    got = pmi_collocations(
        rd.from_pandas(docs), min_count=2, k=10
    ).to_pandas()

    # brute force
    from collections import Counter
    uni, bi = Counter(), Counter()
    total = 0
    for t in docs["text"]:
        toks = t.split()
        uni.update(toks)
        bi.update(zip(toks[:-1], toks[1:]))
        total += len(toks) - 1
    rows = []
    for (a, b), c2 in bi.items():
        if c2 < 2:
            continue
        pmi = math.floor(
            np.log(np.float64(c2 * total) / np.float64(uni[a] * uni[b]))
            * 10_000 + 0.5)
        rows.append((a, b, c2, int(pmi)))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = pd.DataFrame(rows[:10],
                        columns=["w0", "w1", "c2", "pmi_q4"])
    pd.testing.assert_frame_equal(
        got.astype({"c2": "int64", "pmi_q4": "int64"}).reset_index(
            drop=True), want)
    # the three perfect collocations (always-adjacent, equal counts) tie
    # at the top, alphabetical by w0; 'the cat' (repeated context) ranks
    # below them
    top3 = set(zip(got["w0"].head(3), got["w1"].head(3)))
    assert top3 == {("new", "york"), ("york", "city"), ("city", "hall")}
    assert got.iloc[0]["pmi_q4"] > got.iloc[3]["pmi_q4"]


def test_property_random_corpora(ray_session):
    """Engine == brute force across randomized corpora and both
    execution paths."""
    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(20)]
    for trial in range(4):
        n = int(rng.integers(4, 25))
        docs = pd.DataFrame(
            {
                "doc_id": [f"d{i}" for i in range(n)],
                "text": [
                    " ".join(rng.choice(vocab,
                                        size=int(rng.integers(0, 15))))
                    for _ in range(n)
                ],
                "lang": rng.choice(["en", "de"], size=n, p=[0.7, 0.3]),
            }
        )
        if not (docs["lang"] == "en").any():
            docs.loc[0, "lang"] = "en"
        if not docs.loc[docs["lang"] == "en", "text"].str.len().sum():
            docs.loc[docs["lang"] == "en", "text"] = "t0 t1"
        want = brute_force(docs)
        threshold = 0 if trial % 2 else 2_000_000  # alternate paths
        got = _got(bigram_lm_scores(rd.from_pandas(docs).repartition(2),
                                    broadcast_threshold=threshold))
        pd.testing.assert_frame_equal(
            got.astype(want.dtypes.to_dict()), want
        )
