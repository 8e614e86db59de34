"""Nearest-centroid classifier (stages/centroid.py): hand-rolled
integer oracle, separable-cluster accuracy, trunc-division semantics."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from thecrowler_ray.stages.centroid import (
    Q1,
    Q2,
    _trunc_div,
    centroid_classify,
)


def _vectors(seed=0, n=80, dims=6, n_labels=3, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 0.3, (n_labels, dims))
    rows = []
    for i in range(n):
        lab = int(rng.integers(0, n_labels))
        v = centers[lab] + rng.normal(0, spread, dims)
        rows.append((i, v.astype(np.float32), lab))
    return rows


def _oracle(rows, split_mod=8):
    q = lambda v: np.floor(np.asarray(v, dtype=np.float64) * Q1
                           + 0.5).astype(np.int64)
    sums, ns = {}, {}
    for i, v, lab in rows:
        if i % 10 < split_mod:
            sums[lab] = sums.get(lab, 0) + q(v)
            ns[lab] = ns.get(lab, 0) + 1
    labels = sorted(sums)
    cent = {l: _trunc_div(sums[l] * Q2, ns[l]) for l in labels}
    out = {}
    for i, v, lab in rows:
        x = q(v) * Q2
        best, bd = None, None
        for l in labels:
            d = int(((x - cent[l]) ** 2).sum())
            if bd is None or d < bd:
                best, bd = l, d
        out[i] = (best, bd)
    return out


def test_centroid_matches_oracle(ray_session):
    rows = _vectors()
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": [r[0] for r in rows],
        "embedding": [r[1] for r in rows],
        "label": [r[2] for r in rows],
    }))
    out = centroid_classify(ds).to_pandas().set_index("vec_id")
    oracle = _oracle(rows)
    for i, (lab, d) in oracle.items():
        assert int(out.loc[i, "pred_label"]) == lab, i
        assert int(out.loc[i, "dist_q"]) == d, i
    # well-separated clusters → near-perfect held-out accuracy
    test = out[out.is_train == 0]
    assert test["correct"].mean() > 0.9


def test_trunc_div_matches_duckdb_semantics():
    import duckdb

    a = np.array([-7, 7, -10, 9, 0, -1], dtype=np.int64)
    got = _trunc_div(a, 2)
    want = [duckdb.sql(f"SELECT {int(v)} // 2").fetchone()[0] for v in a]
    assert got.tolist() == want


def test_empty_train_raises(ray_session):
    rows = _vectors(n=10)
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": [r[0] * 10 + 9 for r in rows],  # all test split
        "embedding": [r[1] for r in rows],
        "label": [r[2] for r in rows],
    }))
    with pytest.raises(ValueError, match="empty train"):
        centroid_classify(ds)
