"""Gopher admission rules + token-window chunking (text_analysis)."""

from __future__ import annotations

import hashlib

import pandas as pd

from thecrowler_ray.stages.text_analysis import chunk_stage, gopher_filter_stage


def test_gopher_rules():
    good = " ".join(
        ["the", "be", "to", "of", "and"] * 4 + ["words", "here", "now"] * 12
    )  # 56 words, all alpha, stop-rich
    bad_symbols = " ".join(["x#y"] * 60)
    cjk = " ".join(["你好"] * 60)  # no [a-z] → rule_alpha = 0
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "text": [good, bad_symbols, cjk, None]})
    out = gopher_filter_stage(df).set_index("doc_id")
    assert out.loc[1, "gopher_pass"] == 1
    assert out.loc[2, "rule_sym"] == 0 and out.loc[2, "gopher_pass"] == 0
    assert out.loc[3, "rule_alpha"] == 0
    assert out.loc[4, "n_words"] == 0 and out.loc[4, "gopher_pass"] == 0


def test_chunk_stage_window_math():
    words = ["w%d" % i for i in range(99)]
    df = pd.DataFrame({"doc_id": [1], "text": [" ".join(words)]})
    out = chunk_stage(df, chunk=32, stride=24)
    # 1 + ceil((99-32)/24) = 4 windows; last covers 72..99
    assert out["start_tok"].tolist() == [0, 24, 48, 72]
    assert out["n_toks"].tolist() == [32, 32, 32, 27]
    assert out.loc[3, "chunk_md5"] == hashlib.md5(
        " ".join(words[72:]).encode()).hexdigest()


def test_chunk_stage_short_and_empty():
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["only three words", "", None]})
    out = chunk_stage(df, chunk=32, stride=24)
    assert len(out) == 3  # one (possibly empty) window per doc
    assert out["n_toks"].tolist() == [3, 0, 0]
    assert out.loc[1, "chunk_md5"] == hashlib.md5(b"").hexdigest()


def test_chunk_stage_exact_boundary():
    # n == chunk → exactly one window (the first window reaches the end)
    df = pd.DataFrame({"doc_id": [1], "text": [" ".join(["a"] * 32)]})
    out = chunk_stage(df, chunk=32, stride=24)
    assert out["start_tok"].tolist() == [0]
    # n == chunk + 1 → a second, 1-token window at the stride
    df = pd.DataFrame({"doc_id": [1], "text": [" ".join(["a"] * 33)]})
    out = chunk_stage(df, chunk=32, stride=24)
    assert out["start_tok"].tolist() == [0, 24]
    assert out["n_toks"].tolist() == [32, 9]


def test_repetition_stats():
    from thecrowler_ray.stages.text_analysis import repetition_stats_stage

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            # "a b" ×3 (overlapping "b a" ×2); dup 5-grams cover all 6 toks
            "a b a b a b",
            "all words unique here now",   # no repeats, 5 toks, no dup5
            "x",                            # single token
            None,
        ],
    })
    out = repetition_stats_stage(df).set_index("doc_id")
    assert out.loc[1, "top2"] == "a b" and out.loc[1, "top2_occ"] == 3
    assert out.loc[1, "top3"] == "a b a" and out.loc[1, "top3_occ"] == 2
    # 5-grams: "a b a b a" (pos 0) and "b a b a b" (pos 1) each occur once
    # → no duplicated 5-gram
    assert out.loc[1, "dup5_tokens"] == 0
    assert out.loc[1, "total_chars"] == 11
    assert out.loc[2, "top2_occ"] == 1 and out.loc[2, "dup5_tokens"] == 0
    # tie at occ=1 → lexicographically smallest 2-gram
    assert out.loc[2, "top2"] == "all words"
    assert out.loc[3, "top2"] == "" and out.loc[3, "top2_occ"] == 0
    assert out.loc[4, "n_toks"] == 0 and out.loc[4, "total_chars"] == 0


def test_repetition_dup5_coverage_union():
    from thecrowler_ray.stages.text_analysis import repetition_stats_stage

    # "p q r s t" appears twice with a gap → 10 covered positions;
    # overlapping duplicated windows must not double-count
    toks = ["p", "q", "r", "s", "t", "gap1", "gap2",
            "p", "q", "r", "s", "t"]
    df = pd.DataFrame({"doc_id": [1], "text": [" ".join(toks)]})
    out = repetition_stats_stage(df)
    assert int(out.loc[0, "dup5_tokens"]) == 10
