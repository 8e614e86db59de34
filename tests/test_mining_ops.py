"""Mining operators: URL templates (stages/urlmine.py), session paths
(stages/paths.py), quantile bucketing (stages/discretize.py) —
brute-force oracles over small hand-built inputs."""

import numpy as np
import pytest
import pandas as pd
import pyarrow as pa
import ray.data as rd

from thecrowler_ray.stages.discretize import quantile_buckets
from thecrowler_ray.stages.paths import session_paths
from thecrowler_ray.stages.urlmine import template_of, url_templates


class TestUrlTemplates:
    def test_template_normalization(self, ray_session):
        s = pd.Series([
            "/item/123/view",
            "/obj/0123456789abcdef0123/raw",     # 20 hex chars -> {h}
            "/obj/0123456789abcde/raw",          # 15 hex -> digit runs
            "/cat-3/item/99/v",
            "/about/team",
        ])
        got = list(template_of(s))
        assert got == [
            "/item/{n}/view",
            "/obj/{h}/raw",
            # 15-char run is below the hex threshold: digit runs only
            "/obj/{n}abcde/raw",
            "/cat-{n}/item/{n}/v",
            "/about/team",
        ]

    def test_counts_and_order(self, ray_session):
        df = pd.DataFrame({
            "host": ["a", "a", "a", "b", "b"],
            "path": ["/p/1", "/p/22", "/q/3", "/p/4", "/x"],
        })
        got = url_templates(rd.from_pandas(df)).to_pandas()
        # host a: /p/{n} x2 then /q/{n} x1; host b: /p/{n}, /x
        assert list(got["host"]) == ["a", "a", "b", "b"]
        assert list(got["template"]) == ["/p/{n}", "/q/{n}",
                                         "/p/{n}", "/x"]
        assert list(got["n_pages"]) == [2, 1, 1, 1]


class TestSessionPaths:
    def _ds(self, rows):
        return rd.from_pandas(pd.DataFrame(
            rows, columns=["k", "w", "seq", "state"]))

    def test_ordered_join_and_topk(self, ray_session):
        rows = [
            (1, 0, 10, "a"), (1, 0, 20, "b"), (1, 0, 30, "c"),
            (2, 0, 5, "a"), (2, 0, 6, "b"), (2, 0, 7, "c"),
            (3, 0, 1, "x"),
            (1, 1, 50, "x"),                      # same key, new window
        ]
        got = session_paths(self._ds(rows), key="k", window="w",
                            seq="seq", state="state").to_pandas()
        assert list(got["path"]) == ["a>b>c", "x"]
        assert list(got["n"]) == [2, 2]

    def test_tie_collapses_to_min_state(self, ray_session):
        rows = [(1, 0, 10, "b"), (1, 0, 10, "a"), (1, 0, 20, "z")]
        got = session_paths(self._ds(rows), key="k", window="w",
                            seq="seq", state="state").to_pandas()
        assert list(got["path"]) == ["a>z"]

    def test_k_limit(self, ray_session):
        rows = [(u, 0, 1, f"s{u}") for u in range(10)]
        got = session_paths(self._ds(rows), key="k", window="w",
                            seq="seq", state="state", k=3).to_pandas()
        assert len(got) == 3
        # all-tied counts break by path ASC
        assert list(got["path"]) == ["s0", "s1", "s2"]


class TestQuantileBuckets:
    def test_quartiles_uniform(self, ray_session):
        vals = np.arange(101, dtype=np.int64)  # 0..100
        ds = rd.from_arrow(pa.table({"v": pa.array(vals)}))
        got = quantile_buckets(ds, "v", [0.25, 0.5, 0.75]).to_pandas()
        # boundaries at ranks 25/50/75 -> values 25/50/75;
        # bucket(v) = #{b <= v}
        assert list(got["bucket"]) == [0, 1, 2, 3]
        assert list(got["n_rows"]) == [25, 25, 25, 26]
        assert list(got["lo"]) == [0, 25, 50, 75]
        assert list(got["hi"]) == [24, 49, 74, 100]

    def test_heavy_ties(self, ray_session):
        vals = np.array([5] * 10 + [9], dtype=np.int64)
        ds = rd.from_arrow(pa.table({"v": pa.array(vals)}))
        got = quantile_buckets(ds, "v", [0.5]).to_pandas()
        # median boundary = 5; every 5 goes to bucket 1 (b <= v)
        assert list(got["bucket"]) == [1]
        assert list(got["n_rows"]) == [11]

    def test_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(7)
        vals = rng.randint(0, 50, size=500).astype(np.int64)
        ds = rd.from_arrow(pa.table({"v": pa.array(vals)}))
        qs = [0.25, 0.5, 0.75]
        got = quantile_buckets(ds, "v", qs).to_pandas()
        sv = np.sort(vals)
        bounds = np.sort(np.array(
            [sv[int(np.floor(q * (len(sv) - 1)))] for q in qs]))
        want_bucket = np.searchsorted(bounds, vals, side="right")
        exp = (pd.DataFrame({"bucket": want_bucket, "v": vals})
               .groupby("bucket")
               .agg(n_rows=("v", "size"), lo=("v", "min"),
                    hi=("v", "max"))
               .reset_index())
        pd.testing.assert_frame_equal(
            got.astype("int64"), exp.astype("int64"))

    def test_empty_input(self, ray_session):
        ds = rd.from_arrow(pa.table({"v": pa.array([], pa.int64())}))
        got = quantile_buckets(ds, "v", [0.5]).to_pandas()
        assert len(got) == 0


class TestPrefixRollup:
    def test_semantics(self, ray_session):
        from thecrowler_ray.stages.urlmine import url_prefix_rollup
        df = pd.DataFrame({
            "host": ["a", "a", "a", "b"],
            "path": ["/x/y/z/w", "/x/q", "/x//y", "/solo"],
        })
        got = url_prefix_rollup(rd.from_pandas(df),
                                max_depth=3).to_pandas()
        rows = {(r.host, r.prefix, r.depth): r.n_pages
                for r in got.itertuples(index=False)}
        # /x//y: empty segment skipped -> /x then /x/y
        assert rows[("a", "/x", 1)] == 3
        assert rows[("a", "/x/y", 2)] == 2
        assert rows[("a", "/x/y/z", 3)] == 1
        assert ("a", "/x/y/z/w", 4) not in rows  # depth capped
        assert rows[("a", "/x/q", 2)] == 1
        assert rows[("b", "/solo", 1)] == 1

    def test_order(self, ray_session):
        from thecrowler_ray.stages.urlmine import url_prefix_rollup
        df = pd.DataFrame({
            "host": ["a"] * 3,
            "path": ["/p/1", "/p/2", "/q/1"],
        })
        got = url_prefix_rollup(rd.from_pandas(df),
                                max_depth=2).to_pandas()
        # depth-major, then count DESC, then prefix ASC
        assert list(got["prefix"]) == ["/p", "/q", "/p/1", "/p/2",
                                       "/q/1"]


class TestPairExplode:
    def test_property_random(self, ray_session):
        from thecrowler_ray.stages.basket import (
            _dedup_sorted,
            _pair_explode,
        )
        rng = np.random.RandomState(7)
        for trial in range(25):
            n = int(rng.randint(0, 60))
            b = rng.randint(0, 8, size=n).astype(np.int64)
            v = rng.randint(0, 10, size=n).astype(np.int64)
            bs, vs = _dedup_sorted(b, v)
            x, y = _pair_explode(bs, vs)
            got = sorted(zip(x.tolist(), y.tolist()))
            want = []
            for bk in np.unique(b):
                items = sorted(set(v[b == bk].tolist()))
                for i in range(len(items)):
                    for j in range(i + 1, len(items)):
                        want.append((items[i], items[j]))
            assert got == sorted(want), trial


@pytest.mark.usefixtures("ray_session")
def test_fim_transform_layout():
    """PSM layout: prefix+middle+suffix reassemble the original text;
    the coin and offsets are pure functions of doc_id."""
    import hashlib

    from thecrowler_ray.pipelines.queries import q_fim

    out = q_fim("/root/testdata/sf0.001").to_pandas()
    import pyarrow.parquet as pq
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    merged = out.merge(docs, on="doc_id")
    assert set(merged.fim_applied.unique()) == {0, 1}
    applied = merged[merged.fim_applied == 1]
    assert len(applied) > 0
    for r in applied.head(25).itertuples():
        text = r.text or ""
        rebuilt = ("<PRE>" + text[:r.lo] + "<SUF>" + text[r.hi:]
                   + "<MID>" + text[r.lo:r.hi])
        assert hashlib.md5(rebuilt.encode()).hexdigest() == r.fim_md5
        assert 1 <= r.lo <= r.hi <= len(text)
    skipped = merged[merged.fim_applied == 0]
    for r in skipped.head(5).itertuples():
        assert (r.lo, r.hi) == (0, 0)
        assert hashlib.md5((r.text or "").encode()).hexdigest() == r.fim_md5
    # determinism: same input → same output
    again = q_fim("/root/testdata/sf0.001").to_pandas()
    pd.testing.assert_frame_equal(out, again)
