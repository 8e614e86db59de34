"""Edit-distance near-dup pairs (stages/fuzzy.py): banded Levenshtein
correctness + blocking semantics."""

import numpy as np
import pandas as pd
import ray.data as rd

from thecrowler_ray.stages.fuzzy import (
    edit_distance_pairs,
    levenshtein_banded,
)


def _lev_ref(a, b):
    la, lb = len(a), len(b)
    d = np.zeros((la + 1, lb + 1), dtype=int)
    d[:, 0] = np.arange(la + 1)
    d[0, :] = np.arange(lb + 1)
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return int(d[la, lb])


class TestBandedLevenshtein:
    def test_known(self, ray_session):
        assert levenshtein_banded("kitten", "sitting", 10) == 3
        assert levenshtein_banded("", "abc", 5) == 3
        assert levenshtein_banded("abc", "abc", 0) == 0

    def test_early_abandon(self, ray_session):
        assert levenshtein_banded("aaaa", "zzzz", 2) == 3  # max+1

    def test_matches_reference_random(self, ray_session):
        rng = np.random.RandomState(5)
        alpha = "abcde"
        for _ in range(80):
            a = "".join(rng.choice(list(alpha),
                                   size=rng.randint(0, 15)))
            b = "".join(rng.choice(list(alpha),
                                   size=rng.randint(0, 15)))
            ref = _lev_ref(a, b)
            for m in (1, 3, 20):
                got = levenshtein_banded(a, b, m)
                assert got == (ref if ref <= m else m + 1), (a, b, m)


class TestPairs:
    def _run(self, docs, **kw):
        ds = rd.from_pandas(pd.DataFrame(
            docs, columns=["doc_id", "text"]))
        got = edit_distance_pairs(ds, **kw).to_pandas()
        if len(got) == 0:
            return []
        return [tuple(int(x) for x in r)
                for r in got.itertuples(index=False)]

    def test_near_dup_found(self, ray_session):
        docs = [(1, "the quick brown fox jumps"),
                (2, "the quick brown fax jumps"),   # 1 edit
                (3, "completely different text here")]
        got = self._run(docs, prefix_len=30, block_len=8, max_dist=3)
        assert got == [(1, 2, 1)]

    def test_blocking_hides_prefix_edits(self, ray_session):
        # the documented recall tradeoff: an edit INSIDE the block
        # prefix separates the pair
        docs = [(1, "Xhe quick brown fox"),
                (2, "the quick brown fox")]
        got = self._run(docs, prefix_len=30, block_len=8, max_dist=3)
        assert got == []

    def test_block_cap_skips_boilerplate(self, ray_session):
        docs = [(i, "same same same") for i in range(10)]
        got = self._run(docs, prefix_len=30, block_len=8, max_dist=3,
                        max_block=5)
        assert got == []

    def test_partitioning_invariance(self, ray_session):
        rng = np.random.RandomState(9)
        base = "common prefix here "
        docs = [(i, base + "".join(rng.choice(list("ab"), size=6)))
                for i in range(40)]
        ds = rd.from_pandas(pd.DataFrame(
            docs, columns=["doc_id", "text"]))
        a = edit_distance_pairs(ds, max_dist=4).to_pandas()
        b = edit_distance_pairs(ds.repartition(7),
                                max_dist=4).to_pandas()
        pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                      b.reset_index(drop=True))
        assert len(a) > 0
