"""Naive Bayes classifier (stages/classify.py): broadcast/join path
parity, fixed-point semantics vs a hand-rolled oracle, edge shapes."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
import ray.data

from thecrowler_ray.stages.classify import nb_classify


def _docs(seed=0, n=60, vocab=12, langs=("de", "en", "fr")):
    """Per-lang skewed vocab so the classifier has real signal."""
    rng = np.random.default_rng(seed)
    rows = []
    for d in range(n):
        lang = langs[d % len(langs)]
        off = langs.index(lang) * 4
        nw = int(rng.integers(3, 18))
        words = [f"w{(int(v) + off) % vocab}"
                 for v in rng.integers(0, 6, nw)]
        rows.append((d, " ".join(words), lang))
    rows.append((n, "", langs[0]))          # empty doc → prior-only score
    rows.append((n + 1, "w0 w0 w0", langs[1]))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


def _oracle(df, split_mod=8, scale=10_000):
    train = df[df.doc_id % 10 < split_mod]
    nd, counts, tl = {}, {}, {}
    for _, r in train.iterrows():
        nd[r.lang] = nd.get(r.lang, 0) + 1
        for t in r.text.lower().split():
            counts[(r.lang, t)] = counts.get((r.lang, t), 0) + 1
            tl[r.lang] = tl.get(r.lang, 0) + 1
    v = len({t for (_, t) in counts})
    labels = sorted(nd)
    n_total = sum(nd.values())

    def term(num, den):
        return math.floor(math.log(num / den) * scale + 0.5)

    out = {}
    for _, r in df.iterrows():
        toks = r.text.lower().split()
        best_lab, best_s = None, None
        for lab in labels:
            s = term(nd[lab], n_total)
            den = tl.get(lab, 0) + v
            for t in toks:
                s += term(counts.get((lab, t), 0) + 1, den)
            if best_s is None or s > best_s:
                best_lab, best_s = lab, s
        out[r.doc_id] = (best_lab, best_s, len(toks))
    return out


@pytest.mark.parametrize("threshold", [2_000_000, 0])
def test_nb_classify_paths_vs_oracle(ray_session, threshold):
    df = _docs()
    oracle = _oracle(df)
    out = nb_classify(
        ray.data.from_pandas(df), broadcast_threshold=threshold
    ).to_pandas().set_index("doc_id")
    assert len(out) == len(df)
    for doc_id, (lab, s, nt) in oracle.items():
        r = out.loc[doc_id]
        assert r["pred_lang"] == lab, doc_id
        assert int(r["score_q4"]) == s, doc_id
        assert int(r["n_tokens"]) == nt
        assert int(r["is_train"]) == (1 if doc_id % 10 < 8 else 0)
        true = df.set_index("doc_id").loc[doc_id, "lang"]
        assert int(r["correct"]) == (1 if lab == true else 0)


def test_nb_classify_learns_signal(ray_session):
    """Held-out accuracy beats the majority-class floor on skewed vocab."""
    df = _docs(seed=3, n=120)
    out = nb_classify(ray.data.from_pandas(df)).to_pandas()
    test = out[out.is_train == 0]
    assert len(test) > 10
    assert test["correct"].mean() > 0.5


def test_nb_classify_empty_train_raises(ray_session):
    df = _docs().assign(doc_id=lambda d: d.doc_id * 10 + 9)  # all test
    with pytest.raises(ValueError, match="empty train"):
        nb_classify(ray.data.from_pandas(df))
