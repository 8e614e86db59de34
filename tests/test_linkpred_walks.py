"""Adamic-Adar link prediction (ops/linkpred.py) and deterministic
random walks (ops/walks.py): brute-force oracles + path parity."""

import hashlib
import math

import numpy as np
import pandas as pd
import ray.data as rd

from thecrowler_ray.ops.linkpred import adamic_adar
from thecrowler_ray.ops.walks import deterministic_walks


def _aa_brute(edges, k):
    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nbrs = {}
    for a, b in e:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    scores = {}
    for w, ns in nbrs.items():
        if len(ns) < 2:
            continue
        c = math.floor(1_000_000 / math.log(len(ns)) + 0.5)
        ns = sorted(ns)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                key = (ns[i], ns[j])
                s = scores.setdefault(key, [0, 0])
                s[0] += 1
                s[1] += c
    rows = [(u, v, n, s) for (u, v), (n, s) in scores.items()
            if (u, v) not in e]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:k]


class TestAdamicAdar:
    EDGES = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5),
             (6, 1), (6, 2), (7, 7), (3, 1)]

    def _ds(self, edges):
        return rd.from_pandas(pd.DataFrame(edges, columns=["x", "y"]))

    def _run(self, edges, **kw):
        got = adamic_adar(self._ds(edges), **kw).to_pandas()
        if len(got) == 0:
            return []
        return [tuple(int(x) for x in r)
                for r in got.itertuples(index=False)]

    def test_matches_brute(self, ray_session):
        assert self._run(self.EDGES, k=50) == _aa_brute(self.EDGES, 50)

    def test_adjacent_pairs_excluded(self, ray_session):
        got = self._run(self.EDGES, k=50)
        e = {(min(a, b), max(a, b)) for a, b in self.EDGES if a != b}
        assert all((u, v) not in e for u, v, _, _ in got)

    def test_path_parity_random(self, ray_session):
        rng = np.random.RandomState(3)
        edges = [tuple(x) for x in
                 rng.randint(0, 30, size=(120, 2)).tolist()]
        bc = self._run(edges, k=40)
        jn = self._run(edges, k=40, broadcast_threshold=0)
        assert bc == _aa_brute(edges, 40)
        assert jn == bc

    def test_apex_cap_drops_hub_wedges(self, ray_session):
        # star through node 0 (deg 5) + a small triangle
        edges = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12),
                                                 (10, 12)]
        capped = self._run(edges, k=50, max_apex_degree=4)
        brute_without_hub = _aa_brute(
            [(10, 11), (11, 12), (10, 12)], 50)
        assert capped == brute_without_hub

    def test_no_candidates(self, ray_session):
        # single edge: no node has 2 neighbors
        assert self._run([(1, 2)], k=10) == []


def _walks_brute(edges, starts, length, seed):
    e = {(a, b) for a, b in edges if a != b}
    adj = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
    rows = []
    for w in sorted(set(starts)):
        cur = w
        rows.append((w, 0, w))
        for t in range(1, length + 1):
            ns = adj.get(cur)
            if not ns:
                break
            cur = min(ns, key=lambda nb: hashlib.md5(
                f"{seed}:{w}:{t}:{nb}".encode()).hexdigest())
            rows.append((w, t, cur))
    return rows


class TestWalks:
    EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (4, 4),
             (2, 1), (5, 6)]  # 6 is a dead end; (4,4) self-loop drops

    def _ds(self, edges):
        return rd.from_pandas(pd.DataFrame(
            edges, columns=["src", "dst"]))

    def _run(self, edges, starts, length=4, **kw):
        got = deterministic_walks(self._ds(edges), starts,
                                  length=length, seed="w",
                                  **kw).to_pandas()
        if len(got) == 0:
            return []
        return [tuple(int(x) for x in r)
                for r in got.itertuples(index=False)]

    def test_matches_brute(self, ray_session):
        starts = [1, 5, 9]  # 9 has no out-edges: step-0 row only
        assert self._run(self.EDGES, starts) == \
            _walks_brute(self.EDGES, starts, 4, "w")

    def test_dead_end_stops_walk(self, ray_session):
        rows = self._run(self.EDGES, [5], length=6)
        assert rows == [(5, 0, 5), (5, 1, 6)]

    def test_path_parity(self, ray_session):
        rng = np.random.RandomState(5)
        edges = [tuple(x) for x in
                 rng.randint(0, 25, size=(80, 2)).tolist()]
        starts = [0, 3, 7, 24]
        bc = self._run(edges, starts, length=5)
        jn = self._run(edges, starts, length=5, broadcast_threshold=0)
        assert bc == _walks_brute(edges, starts, 5, "w")
        assert jn == bc

    def test_deterministic_across_runs(self, ray_session):
        a = self._run(self.EDGES, [1, 2, 3])
        b = self._run(self.EDGES, [1, 2, 3])
        assert a == b
