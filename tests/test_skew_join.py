"""Skew join (ops/salted.py:skew_join): parity with a plain join under
hot keys, the no-hot fast path, and the hot-x-hot refusal."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from thecrowler_ray.ops.salted import skew_join


def _tables(hot_rows=500, seed=0):
    rng = np.random.default_rng(seed)
    cold_keys = rng.integers(2, 50, 300)
    left = pd.DataFrame({
        "k": np.concatenate([np.full(hot_rows, 1), cold_keys]),
        "v": np.arange(hot_rows + 300),
    }).astype("int64")
    right = pd.DataFrame({
        "k": np.arange(1, 45), "name": [f"n{i}" for i in range(1, 45)],
    }).astype({"k": "int64"})
    return left, right


def _oracle(left, right):
    m = left.merge(right, on="k")
    return sorted(map(tuple, m[["k", "v", "name"]].to_numpy()))


def test_skew_join_parity_with_plain_join(ray_session):
    left, right = _tables()
    out = skew_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", hot_threshold=100).to_pandas()
    assert sorted(map(tuple, out[["k", "v", "name"]].to_numpy())) == \
        _oracle(left, right)
    # the hot key's rows all survived through the broadcast path
    assert (out["k"] == 1).sum() == 500


def test_skew_join_no_hot_keys_falls_back(ray_session):
    left, right = _tables(hot_rows=5)
    out = skew_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", hot_threshold=1_000).to_pandas()
    assert sorted(map(tuple, out[["k", "v", "name"]].to_numpy())) == \
        _oracle(left, right)


def test_skew_join_rejects_hot_many_to_many(ray_session):
    left = pd.DataFrame({"k": np.full(200, 1), "v": np.arange(200)}
                        ).astype("int64")
    right = pd.DataFrame({"k": np.full(20_001, 1),
                          "name": ["x"] * 20_001}).astype({"k": "int64"})
    with pytest.raises(Exception, match="many-to-many"):
        skew_join(rd.from_pandas(left), rd.from_pandas(right),
                  on="k", hot_threshold=100)


def test_skew_join_unmatched_hot_left_rows_drop(ray_session):
    # inner-join semantics: hot rows with no right match disappear
    left = pd.DataFrame({"k": np.full(300, 99), "v": np.arange(300)}
                        ).astype("int64")
    right = pd.DataFrame({"k": [1], "name": ["n1"]}).astype({"k": "int64"})
    out = skew_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", hot_threshold=100)
    assert out.count() == 0
