"""Deterministic global shuffle + hash split (ops/shuffle.py)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
import ray.data

from thecrowler_ray.ops.shuffle import global_shuffle_split


def _run(ids, **kw):
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids}))
    return global_shuffle_split(ds, **kw).to_pandas()


def test_positions_are_a_permutation_in_key_order(ray_session):
    ids = list(range(200))
    out = _run(ids, n_buckets=8).sort_values("pos")
    assert out["pos"].tolist() == list(range(200))
    # global order is exactly (md5 hex, id)
    want = sorted(
        ids, key=lambda i: (hashlib.md5(f"s0:{i}".encode()).hexdigest(), i)
    )
    assert out["doc_id"].tolist() == want


def test_split_stable_under_corpus_growth(ray_session):
    small = _run(list(range(100))).set_index("doc_id")["split"]
    big = _run(list(range(300))).set_index("doc_id")["split"]
    # adding rows never reassigns existing rows' splits
    assert (big.loc[small.index] == small).all()
    frac = (big == "train").mean()
    assert 0.7 < frac < 0.9


def test_seed_changes_permutation_not_validity(ray_session):
    a = _run(list(range(150)), seed="s0").sort_values("doc_id")
    b = _run(list(range(150)), seed="other").sort_values("doc_id")
    assert a["pos"].tolist() != b["pos"].tolist()
    assert sorted(b["pos"]) == list(range(150))


def test_bad_split_percentages_rejected(ray_session):
    with pytest.raises(ValueError):
        _run([1, 2, 3], splits=(("train", 50), ("val", 10)))
