"""Round-3 custom operators: range join (ops/range_join.py), distributed
exclusive prefix sum (ops/prefix.py), per-group top-k (ops/topk.py).

Each is pinned to a brute-force pandas/numpy oracle under randomized
inputs, plus the degenerate shapes (empty sides, key-only-on-one-side,
intervals spanning many buckets, duplicate timestamps)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from thecrowler_ray.ops.prefix import exclusive_prefix_sum
from thecrowler_ray.ops.range_join import range_join
from thecrowler_ray.ops.topk import topk_per_group


def _brute_range(probe, iv):
    m = probe.merge(iv, on="k")
    m = m[(m["t"] >= m["s"]) & (m["t"] <= m["e"])]
    return m.sort_values(["iv_id", "p_id"]).reset_index(drop=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("width", [7, 50, 1000])
def test_range_join_matches_bruteforce(ray_session, seed, width):
    rng = np.random.default_rng(seed)
    probe = pd.DataFrame({
        "k": rng.integers(0, 6, 200),
        "t": rng.integers(0, 500, 200).astype("int64"),
        "p_id": np.arange(200, dtype="int64"),
    })
    s = rng.integers(0, 480, 60).astype("int64")
    iv = pd.DataFrame({
        "k": rng.integers(0, 8, 60),  # some interval-only keys
        "s": s,
        "e": s + rng.integers(0, 90, 60).astype("int64"),
        "iv_id": np.arange(60, dtype="int64"),
    })
    got = range_join(
        ray.data.from_pandas(probe), ray.data.from_pandas(iv),
        by="k", on="t", start="s", end="e", bucket_width=width,
    ).to_pandas()
    exp = _brute_range(probe, iv)
    assert len(got) == len(exp)
    got = got.astype({c: "int64" for c in ("k", "t", "p_id", "iv_id")})
    got = got.sort_values(["iv_id", "p_id"]).reset_index(drop=True)
    for c in ("k", "t", "p_id", "iv_id"):
        assert got[c].tolist() == exp[c].tolist(), c


def test_range_join_empty_and_no_match(ray_session):
    probe = pd.DataFrame({"k": [1, 2], "t": np.array([5, 6], "int64"),
                          "p_id": np.array([0, 1], "int64")})
    iv = pd.DataFrame({"k": [1], "s": np.array([10], "int64"),
                       "e": np.array([20], "int64"),
                       "iv_id": np.array([0], "int64")})
    out = range_join(ray.data.from_pandas(probe), ray.data.from_pandas(iv),
                     by="k", on="t", start="s", end="e", bucket_width=4)
    assert out.count() == 0


def test_range_join_collision_suffix(ray_session):
    probe = pd.DataFrame({"k": [1], "t": np.array([5], "int64"),
                          "v": [10]})
    iv = pd.DataFrame({"k": [1], "s": np.array([0], "int64"),
                       "e": np.array([9], "int64"), "v": [99]})
    out = range_join(ray.data.from_pandas(probe), ray.data.from_pandas(iv),
                     by="k", on="t", start="s", end="e", bucket_width=100,
                     suffix="_iv").to_pandas()
    assert list(out.columns) == ["k", "t", "v", "s", "e", "v_iv"]
    assert out.loc[0, "v"] == 10 and out.loc[0, "v_iv"] == 99


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("n_buckets", [1, 7, 64])
def test_exclusive_prefix_sum(ray_session, seed, n_buckets):
    rng = np.random.default_rng(seed)
    n = 300
    keys = rng.permutation(np.arange(1000, 1000 + n)).astype("int64")
    vals = rng.integers(0, 50, n).astype("int64")
    df = pd.DataFrame({"id": keys, "v": vals})
    got = exclusive_prefix_sum(
        ray.data.from_pandas(df), order_col="id", value_col="v",
        n_buckets=n_buckets,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    srt = df.sort_values("id").reset_index(drop=True)
    exp = np.concatenate(([0], np.cumsum(srt["v"].to_numpy())[:-1]))
    assert got["cum_before"].to_numpy().tolist() == exp.tolist()
    assert got["v"].tolist() == srt["v"].tolist()


def test_topk_per_group_matches_pandas(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.integers(0, 9, 400),
        "x": rng.integers(0, 40, 400).astype("int64"),  # forced ties
        "uid": np.arange(400, dtype="int64"),
    })
    got = topk_per_group(
        ray.data.from_pandas(df), group_cols=["g"],
        order_cols=["x", "uid"], ascending=[False, True], k=5,
        rank_col="rn",
    ).to_pandas().sort_values(["g", "rn"]).reset_index(drop=True)
    exp = (
        df.sort_values(["x", "uid"], ascending=[False, True])
        .groupby("g", sort=False).head(5)
        .assign(rn=lambda d: d.groupby("g").cumcount() + 1)
        .sort_values(["g", "rn"]).reset_index(drop=True)
    )
    assert got["uid"].tolist() == exp["uid"].tolist()
    assert got["rn"].tolist() == exp["rn"].tolist()


def test_topk_k_larger_than_group(ray_session):
    df = pd.DataFrame({"g": [1, 1, 2], "x": np.array([3, 1, 9], "int64")})
    got = topk_per_group(
        ray.data.from_pandas(df), group_cols=["g"], order_cols=["x"],
        k=10, rank_col="rn",
    ).to_pandas().sort_values(["g", "rn"])
    assert got["x"].tolist() == [1, 3, 9]
