"""Exact-substring dedup (stages/dedup.py:exact_substring_dedup): the cut
half of the Lee-et-al.-2021-style duplicated-window pass. Python oracle =
the per-row cut_duplicate_spans helper over literal n-gram groups."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from thecrowler_ray.stages.dedup import (
    cut_duplicate_spans,
    exact_substring_dedup,
)


def _py_oracle(docs: dict, n: int, min_docs: int = 2) -> dict:
    """Literal n-gram duplicate detection + cut, pure Python."""
    grams = {}
    for doc_id, text in docs.items():
        toks = text.lower().split()
        for p in range(len(toks) - n + 1):
            grams.setdefault(tuple(toks[p : p + n]), set()).add(doc_id)
    dup = {g for g, ids in grams.items() if len(ids) >= min_docs}
    out = {}
    for doc_id, text in docs.items():
        toks = text.lower().split()
        pos = [p for p in range(len(toks) - n + 1)
               if tuple(toks[p : p + n]) in dup]
        if pos:
            out[doc_id] = cut_duplicate_spans(text, pos, n)
        else:
            out[doc_id] = text
    return out


def _run(docs: dict, n: int = 3, **kw) -> pd.DataFrame:
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(docs.keys()),
        "text": list(docs.values()),
    }))
    return (
        exact_substring_dedup(ds, n=n, **kw)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )


def test_shared_window_cut_both_sides(ray_session):
    docs = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "prefix words alpha beta gamma tail",
        3: "nothing shared here at all today",
    }
    out = _run(docs, n=3)
    want = _py_oracle(docs, 3)
    for i in docs:
        assert out.loc[i, "clean_text"] == want[i], i
    # doc 3 untouched, original whitespace kept
    assert out.loc[3, "removed_tokens"] == 0
    assert out.loc[3, "clean_text"] == docs[3]
    assert out.loc[1, "removed_tokens"] > 0
    assert (out["n_tokens"] == [6, 6, 6]).all()


def test_fully_duplicated_doc_empties(ray_session):
    docs = {1: "a b c d", 2: "a b c d"}
    out = _run(docs, n=4)
    assert (out["clean_text"] == ["", ""]).all()
    assert (out["removed_tokens"] == [4, 4]).all()


def test_short_docs_pass_through(ray_session):
    docs = {1: "one two", 2: "one two", 3: ""}
    out = _run(docs, n=5)
    assert list(out["clean_text"]) == ["one two", "one two", ""]
    assert (out["removed_tokens"] == 0).all()


def test_overlapping_windows_union(ray_session):
    # shared 6-gram → two overlapping 5-gram windows in each doc; the
    # union is 6 tokens, not 10
    shared = "u v w x y z"
    docs = {1: f"{shared} A1 B1", 2: f"C2 {shared} D2"}
    out = _run(docs, n=5)
    assert out.loc[1, "removed_tokens"] == 6
    assert out.loc[1, "clean_text"] == "A1 B1"
    assert out.loc[2, "clean_text"] == "C2 D2"


def test_case_insensitive_match_cuts_original_case(ray_session):
    docs = {1: "Foo Bar Baz tail1", 2: "foo bar baz tail2"}
    out = _run(docs, n=3)
    assert out.loc[1, "clean_text"] == "tail1"
    assert out.loc[2, "clean_text"] == "tail2"


def test_min_docs_threshold(ray_session):
    docs = {1: "p q r s", 2: "p q r t", 3: "p q r u"}
    # the 3-gram "p q r" is in all three docs
    out3 = _run(docs, n=3, min_docs=3)
    assert (out3["removed_tokens"] == 3).all()
    out4 = _run(docs, n=3, min_docs=4)
    assert (out4["removed_tokens"] == 0).all()


def test_broadcast_vs_join_path_parity(ray_session):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    docs = {}
    for i in range(60):
        toks = list(rng.choice(vocab, size=rng.integers(4, 30)))
        docs[i] = " ".join(toks)
    # plant duplicated runs
    run = "dup1 dup2 dup3 dup4 dup5 dup6"
    for i in (3, 17, 42):
        docs[i] = docs[i] + " " + run
    a = _run(docs, n=4, broadcast_doc_limit=1_000_000)
    b = _run(docs, n=4, broadcast_doc_limit=0)  # force the join path
    pd.testing.assert_frame_equal(a, b[a.columns])
    want = _py_oracle(docs, 4)
    for i in docs:
        assert a.loc[i, "clean_text"] == want[i], i


def test_randomized_vs_python_oracle(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(12)]  # small vocab → many collisions
    docs = {i: " ".join(rng.choice(vocab, size=rng.integers(0, 25)))
            for i in range(80)}
    out = _run(docs, n=3)
    want = _py_oracle(docs, 3)
    for i in docs:
        assert out.loc[i, "clean_text"] == want[i], i
