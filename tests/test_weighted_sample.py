"""Weighted A-ES sampling (stages/sample.py): determinism across
partitionings, weight-proportional inclusion, zero-weight exclusion."""

import numpy as np
import pandas as pd
import ray.data as rd

from thecrowler_ray.stages.sample import _aes_keys_q6, weighted_sample


def _df(n=2000, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "w": np.where(rng.random(n) < 0.1, 10.0, 1.0),
        }
    )


def test_deterministic_across_partitionings(ray_session):
    df = _df()
    a = weighted_sample(rd.from_pandas(df).repartition(2), "id", "w", 100)
    b = weighted_sample(rd.from_pandas(df).repartition(13), "id", "w", 100)
    pd.testing.assert_frame_equal(a, b)


def test_brute_force_parity(ray_session):
    df = _df(n=500)
    got = weighted_sample(rd.from_pandas(df), "id", "w", 50)
    keys = _aes_keys_q6(df["id"].tolist(), df["w"].to_numpy())
    order = sorted(zip(-keys, df["id"]))[:50]
    assert got["id"].tolist() == [i for _, i in order]


def test_weight_proportional_inclusion(ray_session):
    # 10% of rows carry weight 10 → they should dominate the sample
    df = _df(n=5000, seed=9)
    got = weighted_sample(rd.from_pandas(df), "id", "w", 300)
    heavy = set(df.loc[df["w"] == 10.0, "id"])
    frac_heavy = sum(i in heavy for i in got["id"]) / len(got)
    # heavy rows are ~10% of the population but weight 10×: expect far
    # more than their population share in the sample
    assert frac_heavy > 0.35


def test_zero_and_negative_weights_excluded(ray_session):
    df = pd.DataFrame(
        {"id": [1, 2, 3, 4], "w": [0.0, -5.0, 1.0, 2.0]}
    )
    got = weighted_sample(rd.from_pandas(df), "id", "w", 10)
    assert set(got["id"]) == {3, 4}
