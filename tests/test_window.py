"""Keyed window functions (ops/window.py): brute-force per-key oracle
over randomized input, edge semantics (singleton keys, -1 defaults),
rolling frame bounds."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from thecrowler_ray.ops.window import keyed_window


@pytest.mark.usefixtures("ray_session")
def test_window_matches_bruteforce():
    rng = np.random.RandomState(7)
    n = 500
    df = pd.DataFrame({
        "k": rng.randint(0, 20, n).astype("int64"),
        "o": rng.permutation(n).astype("int64"),
        "v": rng.randint(-50, 50, n).astype("int64"),
    })
    got = (keyed_window(rd.from_pandas(df), key="k", order=["o"],
                        value="v", rolling=3)
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    exp = df.sort_values(["k", "o"]).reset_index(drop=True)
    g = exp.groupby("k", sort=False)["v"]
    exp["row_no"] = (g.cumcount() + 1).astype("int64")
    exp["lag1"] = g.shift(1).fillna(-1).astype("int64")
    exp["lead1"] = g.shift(-1).fillna(-1).astype("int64")
    exp["cum_sum"] = g.cumsum().astype("int64")
    exp["roll3_sum"] = (g.rolling(3, min_periods=1).sum()
                        .reset_index(drop=True).to_numpy().astype("int64"))
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


@pytest.mark.usefixtures("ray_session")
def test_window_singleton_keys_and_frame():
    df = pd.DataFrame({"k": [1, 2, 2, 2, 2], "o": [0, 3, 1, 2, 0],
                       "v": [10, 1, 2, 3, 4]})
    df = df.astype("int64")
    got = (keyed_window(rd.from_pandas(df), key="k", order=["o"],
                        value="v", rolling=2)
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    # key 1: single row — lag/lead default, frame = itself
    r = got[got.k == 1].iloc[0]
    assert (r.row_no, r.lag1, r.lead1, r.cum_sum, r.roll2_sum) == (1, -1, -1, 10, 10)
    # key 2 ordered by o: v = 4,2,3,1
    k2 = got[got.k == 2]
    assert k2.row_no.tolist() == [1, 2, 3, 4]
    assert k2.lag1.tolist() == [-1, 4, 2, 3]
    assert k2.lead1.tolist() == [2, 3, 1, -1]
    assert k2.cum_sum.tolist() == [4, 6, 9, 10]
    assert k2.roll2_sum.tolist() == [4, 6, 5, 4]
