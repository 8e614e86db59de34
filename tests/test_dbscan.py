"""DBSCAN over embeddings (stages/dbscan.py): brute-force oracle with
the pinned semantics (round-4 cosine, MIN-label clusters, MIN border
attachment)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from thecrowler_ray.stages.dbscan import dbscan_embeddings


def _ds(x: np.ndarray):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in x],
                              pa.list_(pa.float32()))}))


def _brute(x: np.ndarray, tau: float, min_samples: int):
    xd = x.astype(np.float64)
    unit = xd / np.linalg.norm(xd, axis=1, keepdims=True)
    sims = np.round(unit @ unit.T, 4)
    n = len(x)
    nbrs = [set(np.nonzero((sims[i] >= tau))[0]) - {i}
            for i in range(n)]
    core = {i for i in range(n) if len(nbrs[i]) >= min_samples}
    # components over core-core edges, min-label
    label = {c: c for c in core}
    changed = True
    while changed:
        changed = False
        for c in core:
            for d in nbrs[c] & core:
                m = min(label[c], label[d])
                if label[c] != m or label[d] != m:
                    label[c] = label[d] = m
                    changed = True
    out = {}
    for i in range(n):
        if i in core:
            out[i] = (label[i], "core")
        else:
            adj_cores = nbrs[i] & core
            if adj_cores:
                out[i] = (min(label[c] for c in adj_cores), "border")
            else:
                out[i] = (-1, "noise")
    return out


def _clusters(x, tau, ms, ray_session=None):
    got = dbscan_embeddings(_ds(x), tau=tau,
                            min_samples=ms).to_pandas()
    return {int(r.vec_id): (int(r.cluster_id), r.role)
            for r in got.itertuples(index=False)}


class TestDbscan:
    def test_engineered_shape(self, ray_session):
        rng = np.random.RandomState(5)
        # two dense blobs + far-out noise
        a = rng.randn(10, 8) * 0.01 + np.r_[[1.0] + [0.0] * 7]
        b = rng.randn(10, 8) * 0.01 + np.r_[[0.0] * 7 + [1.0]]
        noise = np.eye(8)[2:6] * 7.0 + rng.randn(4, 8)
        x = np.vstack([a, b, noise]).astype(np.float32)
        got = _clusters(x, 0.9, 3)
        assert got == _brute(x, 0.9, 3)
        roles = {}
        for i, (cl, role) in got.items():
            roles.setdefault(role, []).append(i)
        assert set(roles["core"]) >= set(range(20))
        # the two blobs get distinct min-id labels 0 and 10
        assert {got[i][0] for i in range(10)} == {0}
        assert {got[i][0] for i in range(10, 20)} == {10}

    def test_matches_brute_random(self, ray_session):
        rng = np.random.RandomState(13)
        x = rng.randn(60, 6).astype(np.float32)
        for tau, ms in ((0.5, 3), (0.7, 2), (0.3, 8)):
            assert _clusters(x, tau, ms) == _brute(x, tau, ms), (tau,
                                                                 ms)

    def test_all_noise(self, ray_session):
        x = np.eye(6, dtype=np.float32) * 5  # mutually orthogonal
        got = _clusters(x, 0.5, 1)
        assert all(v == (-1, "noise") for v in got.values())

    def test_min_border_attachment_pin(self, ray_session):
        # the documented pin: a border point adjacent to cores of two
        # different clusters takes the MIN label
        rng = np.random.RandomState(21)
        x = rng.randn(40, 5).astype(np.float32)
        got = _clusters(x, 0.4, 6)
        assert got == _brute(x, 0.4, 6)
