"""Analytics operators: interval merge (stages/intervals.py), funnel
(stages/funnel.py), cohort retention (stages/cohort.py)."""

import pandas as pd
import pytest
import ray.data as rd

from thecrowler_ray.stages.cohort import cohort_retention
from thecrowler_ray.stages.funnel import funnel
from thecrowler_ray.stages.intervals import merge_intervals


class TestIntervalMerge:
    def test_semantics(self, ray_session):
        iv = pd.DataFrame({
            "k": [1, 1, 1, 1, 2, 2],
            "start": [0, 5, 10, 30, 100, 300],
            "end": [6, 8, 20, 40, 200, 400],
        })
        got = (merge_intervals(rd.from_pandas(iv), key="k")
               .to_pandas().sort_values(["k", "island_start"])
               .reset_index(drop=True))
        # key 1: [0,6)+[5,8) overlap; [10,20) TOUCHES nothing ([8<10])
        # wait: 10 > 8 -> new island; [30,40) new island
        k1 = got[got["k"] == 1]
        assert list(k1["island_start"]) == [0, 10, 30]
        assert list(k1["island_end"]) == [8, 20, 40]
        assert list(k1["n_intervals"]) == [2, 1, 1]
        assert list(k1["covered"]) == [8, 10, 10]
        assert len(got[got["k"] == 2]) == 2

    def test_touching_merges(self, ray_session):
        iv = pd.DataFrame({"k": [1, 1], "start": [0, 5],
                           "end": [5, 9]})
        got = merge_intervals(rd.from_pandas(iv), key="k").to_pandas()
        assert len(got) == 1
        assert int(got["island_end"].iloc[0]) == 9

    def test_contained_interval(self, ray_session):
        # [0,100) swallows [10,20); [50,60) also inside — prev running
        # max must be a cummax, not just the previous row's end
        iv = pd.DataFrame({"k": [1, 1, 1, 1],
                           "start": [0, 10, 50, 150],
                           "end": [100, 20, 60, 160]})
        got = (merge_intervals(rd.from_pandas(iv), key="k")
               .to_pandas().sort_values("island_start"))
        assert list(got["island_start"]) == [0, 150]
        assert list(got["n_intervals"]) == [3, 1]


class TestFunnel:
    def _stream(self, rows):
        return rd.from_pandas(pd.DataFrame(
            rows, columns=["user_id", "seq", "event_type"]))

    def test_strict_order(self, ray_session):
        rows = [
            (1, 10, "a"), (1, 20, "b"), (1, 30, "c"),   # full funnel
            (2, 10, "b"), (2, 20, "a"), (2, 30, "b"),   # b-after-a ok
            (3, 10, "a"), (3, 10, "b"),                  # tie: NOT after
            (4, 10, "b"), (4, 20, "c"),                  # no step 1
        ]
        got = (funnel(self._stream(rows), ["a", "b", "c"],
                      user="user_id", event="event_type", seq="seq")
               .to_pandas().set_index("user"))
        assert int(got.loc[1, "steps_completed"]) == 3
        assert list(got.loc[1, ["t_1", "t_2", "t_3"]]) == [10, 20, 30]
        assert int(got.loc[2, "steps_completed"]) == 2
        assert list(got.loc[2, ["t_1", "t_2"]]) == [20, 30]
        # user 3: b at the same seq as a does not count (strictly after)
        assert int(got.loc[3, "steps_completed"]) == 1
        assert int(got.loc[3, "t_2"]) == -1
        assert int(got.loc[4, "steps_completed"]) == 0

    def test_non_step_events_dropped(self, ray_session):
        rows = [(1, 10, "x"), (1, 20, "a"), (2, 5, "zz")]
        got = (funnel(self._stream(rows), ["a", "b"],
                      user="user_id", event="event_type", seq="seq")
               .to_pandas())
        # user 2 has no step events at all -> absent from the output
        assert set(got["user"]) == {1}

    def test_empty_steps_raise(self, ray_session):
        with pytest.raises(ValueError):
            funnel(self._stream([(1, 1, "a")]), [],
                   user="user_id", event="event_type", seq="seq")


class TestCohort:
    def test_triangle(self, ray_session):
        rows = pd.DataFrame({
            "user_id": [1, 1, 1, 2, 2, 3],
            "seq": [0, 10, 25, 10, 25, 25],
        })
        got = (cohort_retention(rd.from_pandas(rows), user="user_id",
                                seq="seq", period_len=10)
               .to_pandas().sort_values(["cohort", "offset"])
               .reset_index(drop=True))
        # periods: u1 {0,1,2}, u2 {1,2}, u3 {2}
        want = pd.DataFrame({
            "cohort": [0, 0, 0, 1, 1, 2],
            "offset": [0, 1, 2, 0, 1, 0],
            "n_users": [1, 1, 1, 1, 1, 1],
        })
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64"))

    def test_path_parity(self, ray_session):
        rows = pd.DataFrame({
            "user_id": [7, 7, 8, 9, 9, 9],
            "seq": [3, 33, 13, 5, 15, 45],
        })
        a = (cohort_retention(rd.from_pandas(rows), user="user_id",
                              seq="seq", period_len=10,
                              broadcast_threshold=10**6)
             .to_pandas().sort_values(["cohort", "offset"])
             .reset_index(drop=True))
        b = (cohort_retention(rd.from_pandas(rows), user="user_id",
                              seq="seq", period_len=10,
                              broadcast_threshold=0)
             .to_pandas().sort_values(["cohort", "offset"])
             .reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


class TestMarkov:
    def test_semantics(self, ray_session):
        from thecrowler_ray.stages.markov import markov_transitions

        rows = pd.DataFrame({
            "k": [1, 1, 1, 1, 2, 2, 2],
            "seq": [1, 2, 3, 4, 1, 1, 2],
            "state": ["a", "b", "a", "b", "z", "b", "a"],
        })
        got = (markov_transitions(rd.from_pandas(rows), key="k",
                                  seq="seq", state="state")
               .to_pandas()
               .sort_values(["from_state", "to_state"])
               .reset_index(drop=True))
        # user 1: a->b, b->a, a->b; user 2: tie at seq 1 collapses to
        # MIN('z','b')='b', so b->a
        want = {("a", "b"): 2, ("b", "a"): 2}
        assert {(f, t): n for f, t, n in
                zip(got["from_state"], got["to_state"],
                    got["n"])} == want
        # p_ppm: a always goes to b (10^6); b always to a
        assert set(got["p_ppm"]) == {1000000}

    def test_ppm_split(self, ray_session):
        from thecrowler_ray.stages.markov import markov_transitions

        rows = pd.DataFrame({
            "k": [1] * 4,
            "seq": [1, 2, 3, 4],
            "state": ["a", "b", "a", "c"],
        })
        got = (markov_transitions(rd.from_pandas(rows), key="k",
                                  seq="seq", state="state")
               .to_pandas().set_index(["from_state", "to_state"]))
        # from a: one ->b, one ->c: 500000 each
        assert int(got.loc[("a", "b"), "p_ppm"]) == 500000
        assert int(got.loc[("a", "c"), "p_ppm"]) == 500000


class TestGroupedOLS:
    def test_exact_line(self, ray_session):
        import numpy as np

        from thecrowler_ray.stages.regression import grouped_ols

        # y = 3x + 7 exactly: slope_q6 == 3_000_000, residual-free
        x = np.arange(10, dtype=np.int64)
        rows = pd.DataFrame({"grp": ["g"] * 10, "x": x, "y": 3 * x + 7})
        got = grouped_ols(rd.from_pandas(rows), group="grp", x="x",
                          y="y")
        assert int(got["slope_q6"].iloc[0]) == 3_000_000
        n, sx, sy = 10, int(x.sum()), int((3 * x + 7).sum())
        sxy = int((x * (3 * x + 7)).sum())
        sxx = int((x * x).sum())
        assert got["slope_num"].iloc[0] == str(n * sxy - sx * sy)
        assert got["slope_den"].iloc[0] == str(n * sxx - sx * sx)

    def test_degenerate_constant_x(self, ray_session):
        from thecrowler_ray.stages.regression import grouped_ols

        rows = pd.DataFrame({"grp": ["g"] * 3, "x": [5, 5, 5],
                             "y": [1, 2, 3]})
        got = grouped_ols(rd.from_pandas(rows), group="grp", x="x",
                          y="y")
        assert got["slope_num"].iloc[0] == "0"
        assert int(got["slope_q6"].iloc[0]) == 0

    def test_matches_polyfit(self, ray_session):
        import numpy as np

        from thecrowler_ray.stages.regression import grouped_ols

        rng = np.random.default_rng(11)
        x = rng.integers(0, 1000, 200).astype(np.int64)
        y = (2 * x + rng.integers(-50, 50, 200)).astype(np.int64)
        rows = pd.DataFrame({"grp": ["g"] * 200, "x": x, "y": y})
        got = grouped_ols(rd.from_pandas(rows), group="grp", x="x",
                          y="y")
        want = np.polyfit(x.astype(float), y.astype(float), 1)[0]
        assert abs(int(got["slope_q6"].iloc[0]) / 1e6 - want) < 1e-4


class TestTWA:
    def test_step_integral(self, ray_session):
        from thecrowler_ray.stages.twa import time_weighted_avg

        # value 10 held for 5s, then 20 held for 5s: TWA = 15
        rows = pd.DataFrame({"k": [1, 1, 1],
                             "t": [0, 5, 10],
                             "v": [10, 20, 99]})
        got = time_weighted_avg(rd.from_pandas(rows), key="k", ts="t",
                                value="v").to_pandas()
        assert int(got["integral"].iloc[0]) == 10 * 5 + 20 * 5
        assert int(got["weight"].iloc[0]) == 10
        assert int(got["twa_ppm"].iloc[0]) == 15_000_000

    def test_single_sample(self, ray_session):
        from thecrowler_ray.stages.twa import time_weighted_avg

        rows = pd.DataFrame({"k": [1], "t": [100], "v": [7]})
        got = time_weighted_avg(rd.from_pandas(rows), key="k", ts="t",
                                value="v").to_pandas()
        assert int(got["twa_ppm"].iloc[0]) == 7_000_000
        assert int(got["weight"].iloc[0]) == 0


class TestBasket:
    def test_support(self, ray_session):
        from thecrowler_ray.stages.basket import pair_support

        rows = pd.DataFrame({
            "b": [1, 1, 1, 2, 2, 3, 3, 3],
            "i": [10, 20, 30, 10, 20, 10, 20, 20],
        })
        got = (pair_support(rd.from_pandas(rows), basket="b",
                            item="i", k=10)
               .to_pandas())
        sup = {(x, y): s for x, y, s in
               zip(got["x"], got["y"], got["support"])}
        # (10,20) in baskets 1,2,3 (basket 3's duplicate 20 dedupes)
        assert sup[(10, 20)] == 3
        assert sup[(10, 30)] == 1
        assert sup[(20, 30)] == 1
        # ordering: support desc then x asc
        assert list(got.iloc[0][["x", "y"]]) == [10, 20]

    def test_k_truncation(self, ray_session):
        from thecrowler_ray.stages.basket import pair_support

        rows = pd.DataFrame({"b": [1] * 5, "i": [1, 2, 3, 4, 5]})
        got = pair_support(rd.from_pandas(rows), basket="b",
                           item="i", k=3).to_pandas()
        assert len(got) == 3

    def test_packed_unpacked_parity(self, ray_session):
        # the packed int64-key groupby (default) and the two-column
        # fallback must agree bit-for-bit
        import numpy as np

        from thecrowler_ray.stages.basket import pair_support

        rng = np.random.default_rng(7)
        rows = pd.DataFrame({
            "b": rng.integers(0, 40, 300),
            "i": rng.integers(0, 25, 300),
        })
        a = (pair_support(rd.from_pandas(rows), basket="b", item="i",
                          k=1000).to_pandas().reset_index(drop=True))
        b = (pair_support(rd.from_pandas(rows), basket="b", item="i",
                          k=1000, packed=False)
             .to_pandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_packed_overflow_raises(self, ray_session):
        # item ids beyond 2^32 must raise loudly, never wrap silently
        import pytest as _pytest

        from thecrowler_ray.stages.basket import pair_support

        rows = pd.DataFrame({"b": [1, 1], "i": [1, 1 << 33]})
        with _pytest.raises(Exception, match="packed=False"):
            pair_support(rd.from_pandas(rows), basket="b",
                         item="i").to_pandas()
        # the [2^31, 2^32) window: fits 32 bits but would shift into
        # the int64 sign bit as the HIGH member — must also raise
        rows31 = pd.DataFrame({"b": [1, 1], "i": [3_000_000_000,
                                                  3_000_000_001]})
        with _pytest.raises(Exception, match="packed=False"):
            pair_support(rd.from_pandas(rows31), basket="b",
                         item="i").to_pandas()
        # but the same window is FINE as the low (y) member
        rows_ok = pd.DataFrame({"b": [1, 1], "i": [7, 3_000_000_000]})
        ok = pair_support(rd.from_pandas(rows_ok), basket="b",
                          item="i").to_pandas()
        assert (int(ok["x"].iloc[0]), int(ok["y"].iloc[0])) == \
            (7, 3_000_000_000)
        # and the escape hatch works on the out-of-range input
        got = pair_support(rd.from_pandas(rows), basket="b", item="i",
                           packed=False).to_pandas()
        assert int(got["support"].iloc[0]) == 1


class TestInfoStats:
    def test_independent_columns_zero_mi(self, ray_session):
        import itertools

        from thecrowler_ray.stages.infostats import entropy_mi

        # perfectly independent uniform 2x2 grid, 25 of each cell
        cells = list(itertools.product(["a", "b"], ["u", "v"]))
        rows = pd.DataFrame(
            [c for c in cells for _ in range(25)],
            columns=["x", "y"])
        got = entropy_mi(rd.from_pandas(rows), "x", "y")
        assert int(got["mi_q4n"].iloc[0]) == 0
        # H(X) = ln 2 per row: n * floor(ln(2)*1e4+0.5) = 100 * 6931
        assert int(got["h_x_q4n"].iloc[0]) == 100 * 6931

    def test_identical_columns_mi_equals_h(self, ray_session):
        from thecrowler_ray.stages.infostats import entropy_mi

        rows = pd.DataFrame({"x": ["a", "b", "c", "a"] * 10})
        rows["y"] = rows["x"]
        got = entropy_mi(rd.from_pandas(rows), "x", "y")
        assert (int(got["mi_q4n"].iloc[0])
                == int(got["h_x_q4n"].iloc[0])
                == int(got["h_y_q4n"].iloc[0]))
        assert int(got["mi_q4n"].iloc[0]) > 0

    def test_empty(self, ray_session):
        import pyarrow as pa

        from thecrowler_ray.stages.infostats import entropy_mi

        t = pa.table({"x": pa.array([], pa.string()),
                      "y": pa.array([], pa.string())})
        got = entropy_mi(rd.from_arrow(t), "x", "y")
        assert int(got["n"].iloc[0]) == 0


@pytest.mark.usefixtures("ray_session")
def test_funnel_int64_precision_beyond_2_53():
    # epoch-nanosecond-scale seqs: adjacent values differ by 1 at
    # magnitudes where float64 rounds them together — the chain must
    # stay exact-integer (r4 advice finding)
    import ray.data as rd

    base = 2**60 + 12345  # far beyond float64's 2^53 integer range
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "event_type": ["view", "click", "buy", "view", "click"],
        # user 1: strictly increasing by 1 at 2^60 scale
        # user 2: click at EXACTLY the view time (strictness must reject)
        "seq": [base, base + 1, base + 2, base + 10, base + 10],
    })
    out = funnel(rd.from_pandas(df), ["view", "click", "buy"]).to_pandas()
    out = out.sort_values("user").reset_index(drop=True)
    assert out.loc[0, "steps_completed"] == 3
    assert int(out.loc[0, "t_1"]) == base
    assert int(out.loc[0, "t_2"]) == base + 1
    assert int(out.loc[0, "t_3"]) == base + 2
    assert out.loc[1, "steps_completed"] == 1
    assert int(out.loc[1, "t_2"]) == -1
