"""Exact z-score anomaly flagging (stages/anomaly.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from thecrowler_ray.stages.anomaly import zscore_anomalies


def _run(rows, k=3):
    ds = rd.from_pandas(pd.DataFrame(
        rows, columns=["id", "g", "v"]))
    got = zscore_anomalies(ds, group="g", value="v", k=k,
                           id_col="id").to_pandas()
    return [] if len(got) == 0 else [int(i) for i in got["id"]]


def _brute(rows, k=3):
    df = pd.DataFrame(rows, columns=["id", "g", "v"])
    out = []
    for g, gd in df.groupby("g"):
        x = gd["v"].to_numpy(np.int64)
        n, s, q = len(x), int(x.sum()), int((x.astype(object) ** 2).sum())
        for i, xv in zip(gd["id"], x):
            if (n * int(xv) - s) ** 2 > k * k * (n * q - s * s):
                out.append(int(i))
    return sorted(out)


class TestAnomalies:
    def test_obvious_outlier(self, ray_session):
        rows = [(i, "a", 100) for i in range(20)] + [(99, "a", 10_000)]
        assert _run(rows) == [99]

    def test_zero_variance_never_flags(self, ray_session):
        rows = [(i, "a", 42) for i in range(10)]
        assert _run(rows) == []

    def test_single_row_group(self, ray_session):
        assert _run([(1, "solo", 123456)]) == []

    def test_matches_brute_random(self, ray_session):
        rng = np.random.RandomState(17)
        rows = [(i, f"g{int(rng.randint(0, 4))}",
                 int(rng.randint(0, 1000)
                     + (50_000 if rng.rand() < 0.02 else 0)))
                for i in range(500)]
        for k in (2, 3):
            assert _run(rows, k) == _brute(rows, k), k

    def test_boundary_is_strict(self, ray_session):
        # symmetric pair {0, 2}: each point sits at exactly 1 sigma;
        # with k=1 the test is strict (>) so nothing flags
        rows = [(1, "a", 0), (2, "a", 2)]
        assert _run(rows, k=1) == []
