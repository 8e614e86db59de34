"""Per-key resample + forward-fill (stages/resample.py): brute-force
oracle over hand-built irregular series."""

import numpy as np
import pandas as pd
import ray.data as rd

from thecrowler_ray.stages.resample import resample_ffill


def _brute(rows, step):
    obs = {}
    for k, t, v in rows:
        key = (k, t)
        obs[key] = min(obs.get(key, v), v)  # tie -> MIN
    by_key = {}
    for (k, t), v in sorted(obs.items()):
        by_key.setdefault(k, []).append((t, v))
    out = []
    for k in sorted(by_key):
        series = by_key[k]
        lo = (series[0][0] // step) * step
        hi = (series[-1][0] // step) * step
        for t in range(lo, hi + 1, step):
            cand = [v for (tt, v) in series if tt <= t]
            if cand:
                # last at-or-before
                last = max((tt for tt, _ in series if tt <= t))
                out.append((k, t, dict(series)[last]))
    return out


def _run(rows, step):
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["k", "t", "v"]))
    got = resample_ffill(ds, key="k", ts="t", value="v",
                         step=step).to_pandas()
    if len(got) == 0:  # empty Datasets drop their schema
        return []
    got = got.sort_values(["k", "t"]).reset_index(drop=True)
    return [tuple(int(x) for x in r) for r in got.itertuples(index=False)]


class TestResample:
    def test_basic_ffill(self, ray_session):
        rows = [(1, 10, 100), (1, 25, 200), (1, 47, 300)]
        # step 10: grid 10,20,30,40 -> 100,100,200,200
        assert _run(rows, 10) == [(1, 10, 100), (1, 20, 100),
                                  (1, 30, 200), (1, 40, 200)]

    def test_first_point_dropped_when_unfilled(self, ray_session):
        rows = [(1, 15, 7)]
        # lo = 10 < 15: grid point 10 has no obs -> dropped; hi = 10
        assert _run(rows, 10) == []

    def test_tie_collapses_to_min(self, ray_session):
        rows = [(1, 10, 9), (1, 10, 3), (1, 20, 5)]
        assert _run(rows, 10) == [(1, 10, 3), (1, 20, 5)]

    def test_matches_brute_random(self, ray_session):
        rng = np.random.RandomState(3)
        rows = [(int(rng.randint(0, 5)), int(rng.randint(0, 300)),
                 int(rng.randint(0, 50))) for _ in range(150)]
        assert _run(rows, 25) == _brute(rows, 25)

    def test_sparse_key_grid_is_local(self, ray_session):
        rows = [(1, 0, 1), (1, 1000, 2), (2, 500, 3)]
        got = _run(rows, 100)
        k2 = [r for r in got if r[0] == 2]
        assert k2 == [(2, 500, 3)]  # key 2's grid covers only its span
        assert len([r for r in got if r[0] == 1]) == 11
