"""Session-7 operators: BFS distances (ops/bfs.py), label propagation
(ops/lpa.py), SCD2 historization (stages/cdc.py), distributed Lloyd
k-means (stages/kmeans.py) — brute-force oracles + broadcast/join path
parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from thecrowler_ray.ops.bfs import bfs_distances
from thecrowler_ray.ops.lpa import label_propagation
from thecrowler_ray.stages.cdc import scd2_history
from thecrowler_ray.stages.kmeans import SCALE, _trunc_div, kmeans_assign

EDGES = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),
         (1, 3), (10, 11), (11, 10), (2, 1)]


def _edges_ds(edges):
    return rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))


def _bfs_brute(edges, seeds, rounds):
    nodes = sorted({n for e in edges for n in e} | set(seeds))
    dist = {n: (0 if n in seeds else None) for n in nodes}
    for _ in range(rounds):
        nxt = dict(dist)
        for s, d in edges:
            if dist[s] is not None:
                c = dist[s] + 1
                if nxt[d] is None or c < nxt[d]:
                    nxt[d] = c
        dist = nxt
    return {n: (-1 if v is None else v) for n, v in dist.items()}


def _lpa_brute(edges, iterations):
    nodes = sorted({n for e in edges for n in e})
    lab = {n: n for n in nodes}
    for _ in range(iterations):
        cnt = {}
        for s, d in edges:
            cnt.setdefault(d, {})
            cnt[d][lab[s]] = cnt[d].get(lab[s], 0) + 1
        nxt = dict(lab)
        for n, c in cnt.items():
            nxt[n] = min(c, key=lambda L: (-c[L], L))
        lab = nxt
    return lab


class TestBFS:
    def test_brute_force(self, ray_session):
        got = bfs_distances(_edges_ds(EDGES), [1, 99],
                            rounds=3).to_pandas()
        want = _bfs_brute(EDGES, {1, 99}, 3)
        assert dict(zip(got["node"], got["dist"])) == want
        # 99 is a seed absent from the edge list: present at dist 0
        assert want[99] == 0
        # node 7 is 6 hops from seed 1 -> unreached within 3 rounds
        assert want[7] == -1

    def test_path_parity(self, ray_session):
        a = (bfs_distances(_edges_ds(EDGES), [1], rounds=4,
                           broadcast_threshold=10**6)
             .to_pandas().sort_values("node").reset_index(drop=True))
        b = (bfs_distances(_edges_ds(EDGES), [1], rounds=4,
                           broadcast_threshold=0)
             .to_pandas().sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_fixed_point_early_stop_is_identity(self, ray_session):
        # rounds far beyond the diameter: same answer as exact rounds
        small = [(1, 2), (2, 3)]
        a = bfs_distances(_edges_ds(small), [1], rounds=2).to_pandas()
        b = bfs_distances(_edges_ds(small), [1], rounds=50).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("node").reset_index(drop=True),
            b.sort_values("node").reset_index(drop=True))


class TestLPA:
    def test_brute_force(self, ray_session):
        got = label_propagation(_edges_ds(EDGES),
                                iterations=3).to_pandas()
        want = _lpa_brute(EDGES, 3)
        assert dict(zip(got["node"], got["label"])) == want

    def test_two_cliques_converge(self, ray_session):
        # two disjoint triangles (both directions): every member ends
        # with the clique's minimum id
        tri = lambda a, b, c: [(a, b), (b, a), (b, c), (c, b),
                               (a, c), (c, a)]
        edges = tri(1, 2, 3) + tri(10, 11, 12)
        got = label_propagation(_edges_ds(edges),
                                iterations=4).to_pandas()
        labs = dict(zip(got["node"], got["label"]))
        assert labs == _lpa_brute(edges, 4)
        assert len({labs[1], labs[2], labs[3]}) == 1
        assert len({labs[10], labs[11], labs[12]}) == 1

    def test_path_parity(self, ray_session):
        a = (label_propagation(_edges_ds(EDGES), iterations=3,
                               broadcast_threshold=10**6)
             .to_pandas().sort_values("node").reset_index(drop=True))
        b = (label_propagation(_edges_ds(EDGES), iterations=3,
                               broadcast_threshold=0)
             .to_pandas().sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_id_bound_guard(self, ray_session):
        with pytest.raises(Exception):
            label_propagation(
                _edges_ds([(1, 2**40)]), iterations=1
            ).to_pandas()


class TestSCD2:
    def test_semantics(self, ray_session):
        rows = pd.DataFrame({
            "k": [1, 1, 1, 1, 1, 2, 2, 2],
            "seq": [10, 20, 20, 30, 40, 5, 6, 7],
            "state": ["a", "b", "z", "b", "c", "x", "x", "y"],
        })
        got = (scd2_history(rd.from_pandas(rows), key="k", seq="seq",
                            state="state")
               .to_pandas().sort_values(["k", "version"])
               .reset_index(drop=True))
        # key 1: tie at seq 20 -> MIN('b','z')='b'; seq 30 'b' repeats
        # the previous state -> collapsed; history a(10-20) b(20-40)
        # c(40-)
        k1 = got[got["k"] == 1]
        assert list(k1["state"]) == ["a", "b", "c"]
        assert list(k1["valid_from"]) == [10, 20, 40]
        assert list(k1["valid_to"]) == [20, 40, -1]
        assert list(k1["is_current"]) == [0, 0, 1]
        assert list(k1["version"]) == [1, 2, 3]
        k2 = got[got["k"] == 2]
        assert list(k2["state"]) == ["x", "y"]
        assert list(k2["valid_to"]) == [7, -1]

    def test_single_row_key(self, ray_session):
        rows = pd.DataFrame({"k": [9], "seq": [1], "state": ["s"]})
        got = scd2_history(rd.from_pandas(rows), key="k", seq="seq",
                           state="state").to_pandas()
        assert len(got) == 1
        assert int(got["is_current"].iloc[0]) == 1
        assert int(got["valid_to"].iloc[0]) == -1


class TestKMeans:
    def _brute(self, ids, X, k, iterations):
        order = np.argsort(ids)
        Xs = X[order]
        cents = np.floor(Xs[:k].astype(np.float64) * SCALE
                         + 0.5).astype(np.int64) * SCALE
        Xq = np.floor(X.astype(np.float64) * SCALE
                      + 0.5).astype(np.int64)
        for _ in range(iterations):
            d = ((Xq[:, None, :] * SCALE
                  - cents[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            new = cents.copy()
            for c in range(len(cents)):
                m = a == c
                if m.any():
                    new[c] = _trunc_div(Xq[m].sum(axis=0) * SCALE,
                                        np.int64(m.sum()))
            cents = new
        d = ((Xq[:, None, :] * SCALE
              - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        return a, d[np.arange(len(a)), a]

    def test_brute_force(self, ray_session):
        rng = np.random.default_rng(7)
        X = np.concatenate([
            rng.normal(-1, 0.1, (30, 8)),
            rng.normal(1, 0.1, (30, 8)),
        ]).astype(np.float32)
        ids = np.arange(60, dtype=np.int64)
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(X.astype(np.float32))),
        }))
        got = (kmeans_assign(ds, k=3, iterations=2)
               .to_pandas().sort_values("vec_id"))
        a, dist = self._brute(ids, X, 3, 2)
        assert (got["cluster"].to_numpy() == a).all()
        assert (got["dist_q"].to_numpy() == dist).all()

    def test_partitioning_invariance(self, ray_session):
        rng = np.random.default_rng(3)
        X = rng.normal(0, 1, (40, 4)).astype(np.float32)
        ids = np.arange(40, dtype=np.int64)
        t = pa.table({"vec_id": pa.array(ids),
                      "embedding": pa.array(list(X))})
        a = (kmeans_assign(rd.from_arrow(t), k=4, iterations=3)
             .to_pandas().sort_values("vec_id").reset_index(drop=True))
        b = (kmeans_assign(rd.from_arrow(t).repartition(7), k=4,
                           iterations=3)
             .to_pandas().sort_values("vec_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_empty(self, ray_session):
        t = pa.table({"vec_id": pa.array([], pa.int64()),
                      "embedding": pa.array([], pa.list_(pa.float32()))})
        got = kmeans_assign(rd.from_arrow(t), k=2,
                            iterations=1).to_pandas()
        assert len(got) == 0


class TestHyperBall:
    @staticmethod
    def _brute(edges, rounds):
        import hashlib

        from thecrowler_ray.ops.hyperball import N_REG, RHO_CAP

        nodes = sorted({n for e in edges for n in e})

        def own(v):
            h = int.from_bytes(
                hashlib.md5(str(v).encode()).digest()[:8], "big")
            s = format(h, "064b")
            ri = int(s[:4], 2)
            payload = s[4:]
            rv = payload.find("1") + 1 if "1" in payload else RHO_CAP
            return ri, rv

        regs = {}
        for v in nodes:
            ri, rv = own(v)
            r = [0] * N_REG
            r[ri] = rv
            regs[v] = r
        for _ in range(rounds):
            nxt = {v: list(r) for v, r in regs.items()}
            for s, d in edges:
                for i in range(N_REG):
                    nxt[d][i] = max(nxt[d][i], regs[s][i])
            regs = nxt
        return {(v, i): r[i] for v, r in regs.items()
                for i in range(N_REG) if r[i]}

    def test_brute_force(self, ray_session):
        from thecrowler_ray.ops.hyperball import hyperball

        got = hyperball(_edges_ds(EDGES), rounds=2).to_pandas()
        want = self._brute(EDGES, 2)
        assert {(n, i): v for n, i, v in
                zip(got["node"], got["ri"], got["rv"])} == want

    def test_path_parity(self, ray_session):
        from thecrowler_ray.ops.hyperball import hyperball

        a = (hyperball(_edges_ds(EDGES), rounds=2,
                       broadcast_threshold=10**6)
             .to_pandas().sort_values(["node", "ri"])
             .reset_index(drop=True))
        b = (hyperball(_edges_ds(EDGES), rounds=2,
                       broadcast_threshold=0)
             .to_pandas().sort_values(["node", "ri"])
             .reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_estimate_tracks_ball_size(self, ray_session):
        # a 30-node star: hub's 1-hop in-ball = 31 nodes, leaves' = 2;
        # the p=4 estimate is coarse but must separate the two scales
        from thecrowler_ray.ops.hyperball import (
            estimate_sizes,
            hyperball,
        )

        edges = [(i, 999) for i in range(1, 31)] \
            + [(999, i) for i in range(1, 31)]
        regs = hyperball(_edges_ds(edges), rounds=1)
        est = estimate_sizes(regs).to_pandas().set_index("node")
        assert est.loc[999, "est"] > 12
        assert est.loc[5, "est"] < est.loc[999, "est"]
