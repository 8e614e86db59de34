"""k-core peeling (ops/kcore.py) and TF-IDF top terms (stages/tfidf.py):
brute-force oracles + broadcast/join path parity."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from thecrowler_ray.ops.kcore import k_core
from thecrowler_ray.stages.tfidf import tfidf_top_terms


def _edges_ds(edges):
    return rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))


def _kcore_brute(edges, k, rounds):
    """Reference peel: canonical undirected, `rounds` rounds, report
    survivors with degree in the surviving subgraph."""
    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    alive = {n for uv in e for n in uv}

    def degs(alive_set):
        d = {n: 0 for n in alive_set}
        for a, b in e:
            if a in alive_set and b in alive_set:
                d[a] += 1
                d[b] += 1
        return d

    for _ in range(rounds):
        d = degs(alive)
        nxt = {n for n in alive if d[n] >= k}
        if nxt == alive:
            break
        alive = nxt
    d = degs(alive)
    return {n: d[n] for n in sorted(alive)}


class TestKCore:
    EDGES = [
        # a 4-clique (1,2,3,4) with pendant chains hanging off it
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6),           # chain peels at k>=2
        (7, 1), (7, 2),           # degree-2 node on the clique
        (8, 8),                   # self-loop (dropped)
        (2, 1), (3, 1),           # parallel / reversed dups (collapse)
        (10, 11),                 # far island
    ]

    def _run(self, edges, k, rounds, **kw):
        got = k_core(_edges_ds(edges), k, rounds=rounds, **kw).to_pandas()
        if len(got) == 0:  # empty Datasets drop their schema
            return {}
        return dict(zip(got["node"].astype(int),
                        got["degree"].astype(int)))

    def test_matches_brute(self, ray_session):
        for k in (1, 2, 3):
            for rounds in (1, 2, 4):
                assert self._run(self.EDGES, k, rounds) == \
                    _kcore_brute(self.EDGES, k, rounds), (k, rounds)

    def test_three_core_is_clique(self, ray_session):
        got = self._run(self.EDGES, 3, rounds=4)
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_path_parity_random(self, ray_session):
        rng = np.random.RandomState(11)
        edges = [tuple(x) for x in
                 rng.randint(0, 40, size=(300, 2)).tolist()]
        for k in (2, 4):
            bc = self._run(edges, k, 3)
            jn = self._run(edges, k, 3, broadcast_threshold=0,
                           small_set_threshold=0)
            jn_small = self._run(edges, k, 3, broadcast_threshold=0,
                                 small_set_threshold=10**9)
            assert bc == _kcore_brute(edges, k, 3)
            assert jn == bc
            assert jn_small == bc

    def test_everything_peels(self, ray_session):
        assert self._run([(1, 2), (2, 3)], 5, 3) == {}

    def test_empty_after_selfloops(self, ray_session):
        assert self._run([(1, 1), (2, 2)], 1, 2) == {}


def _tfidf_brute(docs, m):
    tf = {}
    for did, text in docs:
        c = {}
        for t in (text or "").lower().split():
            c[t] = c.get(t, 0) + 1
        tf[did] = c
    n = len(docs)
    df = {}
    for c in tf.values():
        for t in c:
            df[t] = df.get(t, 0) + 1
    rows = []
    for did in sorted(tf):
        scored = sorted(
            ((math.floor(f * math.log(n / df[t]) * 10000 + 0.5), t, f)
             for t, f in tf[did].items()),
            key=lambda x: (-x[0], x[1]))
        for r, (s, t, f) in enumerate(scored[:m], 1):
            rows.append((did, t, f, df[t], s, r))
    return rows


class TestTfidf:
    DOCS = [
        (1, "spark merge window merge"),
        (2, "spark spark quantum"),
        (3, "window quantum flux flux flux"),
        (4, ""),                      # empty doc still counts toward N
        (5, "spark window quantum flux merge"),
    ]

    def _ds(self, docs):
        return rd.from_pandas(pd.DataFrame(
            docs, columns=["doc_id", "text"]))

    def test_matches_brute(self, ray_session):
        got = tfidf_top_terms(self._ds(self.DOCS), m=2).to_pandas()
        rows = [tuple(r) for r in got.itertuples(index=False)]
        assert rows == _tfidf_brute(self.DOCS, 2)

    def test_rank_ties_break_by_term(self, ray_session):
        docs = [(1, "bb aa"), (2, "zz")]
        got = tfidf_top_terms(self._ds(docs), m=2).to_pandas()
        d1 = got[got["doc_id"] == 1]
        # equal tf (1) and equal df (1) -> equal score; term ASC wins
        assert list(d1["term"]) == ["aa", "bb"]
        assert list(d1["rank"]) == [1, 2]

    def test_ubiquitous_term_scores_zero(self, ray_session):
        docs = [(1, "the cat"), (2, "the dog"), (3, "the")]
        got = tfidf_top_terms(self._ds(docs), m=3).to_pandas()
        the_rows = got[got["term"] == "the"]
        assert (the_rows["score_q4"] == 0).all()
        assert (the_rows["df"] == 3).all()

    def test_path_parity(self, ray_session):
        bc = tfidf_top_terms(self._ds(self.DOCS), m=3).to_pandas()
        jn = tfidf_top_terms(self._ds(self.DOCS), m=3,
                             broadcast_threshold=0).to_pandas()
        pd.testing.assert_frame_equal(
            bc.reset_index(drop=True), jn.reset_index(drop=True))

    def test_all_empty_docs(self, ray_session):
        got = tfidf_top_terms(
            self._ds([(1, ""), (2, None)]), m=3).to_pandas()
        assert len(got) == 0
