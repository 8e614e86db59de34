"""DSIR importance resampling (stages/importance.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from thecrowler_ray.stages.importance import (
    _gram_buckets,
    bucket_counts,
    dsir_log_weights,
    dsir_scores,
    dsir_select,
)


def _brute_buckets(text: str, n_buckets: int) -> list[int]:
    """Independent scalar reference: FNV-1a tokens, uni+bigram roll."""
    toks = (text or "").lower().split()
    hs = []
    for t in toks:
        h = 0xCBF29CE484222325
        for b in t.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        hs.append(h)
    grams = list(hs)
    for a, b in zip(hs, hs[1:]):
        grams.append((a * 1099511628211 + b) & 0xFFFFFFFFFFFFFFFF)
    return [g % n_buckets for g in grams]


def test_gram_buckets_match_scalar_reference():
    texts = ["The quick Brown fox", "a", "", "x y x y x", None]
    for t in texts:
        got = _gram_buckets(t, 512, {}).tolist()
        assert got == _brute_buckets(t, 512)


def test_dsir_scores_and_selection(ray_session):
    rng = np.random.default_rng(11)
    vocab_en = ["alpha", "beta", "gamma", "delta"]
    vocab_de = ["eins", "zwei", "drei", "vier"]
    rows = []
    for i in range(60):
        lang = "en" if i % 3 == 0 else "de"
        vocab = vocab_en if lang == "en" else vocab_de
        rows.append(
            {
                "doc_id": i,
                "lang": lang,
                "text": " ".join(rng.choice(vocab, size=12)),
            }
        )
    # one raw doc written in the target vocabulary: must outscore raw docs
    rows.append({"doc_id": 999, "lang": "de", "text": " ".join(vocab_en * 3)})
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df)

    B = 256
    t_vec, r_vec = bucket_counts(ds, n_buckets=B)
    # brute-force the count vectors
    bt = np.zeros(B, dtype=np.int64)
    br = np.zeros(B, dtype=np.int64)
    for _, row in df.iterrows():
        bk = _brute_buckets(row["text"], B)
        for b in bk:
            br[b] += 1
            if row["lang"] == "en":
                bt[b] += 1
    assert (t_vec == bt).all() and (r_vec == br).all()

    scored = dsir_scores(ds, n_buckets=B).to_pandas().set_index("doc_id")
    T, R = int(bt.sum()), int(br.sum())
    for doc_id in (0, 1, 999):
        bk = _brute_buckets(df.loc[df.doc_id == doc_id, "text"].iloc[0], B)
        t_hits = int(bt[bk].sum())
        r_hits = int(br[bk].sum())
        assert scored.loc[doc_id, "t_hits"] == t_hits
        assert scored.loc[doc_id, "r_hits"] == r_hits
        assert scored.loc[doc_id, "score"] == t_hits * R - r_hits * T

    # selection: every selected score >= every rejected score, ties by id
    sel = dsir_select(ds, k=10, n_buckets=B).to_pandas()
    assert len(sel) == 10
    rest = scored.drop(index=sel["doc_id"])
    assert sel["score"].min() >= rest["score"].max() or rest.empty
    # the en-vocab impostor must outscore every pure-de doc: importance
    # weighting ranks by content, not by the label used for the target
    de_pure = df[(df.lang == "de") & (df.doc_id != 999)]["doc_id"]
    assert (
        scored.loc[999, "score"] > scored.loc[de_pure, "score"].max()
    )
    # target-vocabulary docs dominate the selection
    en_like = set(df[df.lang == "en"]["doc_id"]) | {999}
    assert sum(d in en_like for d in sel["doc_id"]) >= 8


def test_dsir_empty_and_degenerate_docs(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "lang": ["en", "de", "en"],
            "text": ["", "solo", "two words"],
        }
    )
    ds = ray.data.from_pandas(df)
    out = dsir_scores(ds, n_buckets=64).to_pandas()
    # empty doc emits nothing; 1-token doc has 1 gram; 2-token doc has 3
    assert set(out["doc_id"]) == {2, 3}
    assert out.set_index("doc_id").loc[2, "n_grams"] == 1
    assert out.set_index("doc_id").loc[3, "n_grams"] == 3


def test_dsir_log_weights_monotone_with_score():
    B = 64
    t_vec = np.zeros(B, dtype=np.int64)
    r_vec = np.zeros(B, dtype=np.int64)
    t_vec[:8] = 50
    r_vec[:8] = 60
    r_vec[8:16] = 100
    target_like = np.arange(8)
    raw_like = np.arange(8, 16)
    w_hi = dsir_log_weights(t_vec, r_vec, target_like)
    w_lo = dsir_log_weights(t_vec, r_vec, raw_like)
    assert w_hi > w_lo
    # numpy reference for the smoothed LLR
    alpha, n_b = 1.0, B
    pt = (t_vec[target_like] + alpha) / (t_vec.sum() + alpha * n_b)
    pr = (r_vec[target_like] + alpha) / (r_vec.sum() + alpha * n_b)
    assert w_hi == pytest.approx(float(np.log(pt / pr).sum()))
