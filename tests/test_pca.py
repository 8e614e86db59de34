"""Distributed PCA (stages/pca.py): exact Gram statistics, component
determinism, planted-component recovery, projection parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from thecrowler_ray.stages.pca import (
    gram_records,
    pca_components,
    pca_project,
)


def _ds(x: np.ndarray):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in x],
                              pa.list_(pa.float32()))}))


def _gram_brute(x: np.ndarray) -> pd.DataFrame:
    q = np.floor(x.astype(np.float64) * 10_000 + 0.5).astype(object)
    n, d = q.shape
    rows = []
    for i in range(d):
        for j in range(i, d):
            rows.append({
                "i": i, "j": j, "n": n,
                "sum_i": str(int(sum(q[:, i]))),
                "sum_j": str(int(sum(q[:, j]))),
                "sum_ij": str(int(sum(q[:, i] * q[:, j])))})
    return pd.DataFrame(rows)


class TestGram:
    def test_matches_brute(self, ray_session):
        rng = np.random.RandomState(2)
        x = rng.randn(37, 5).astype(np.float32)
        got = gram_records(_ds(x))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), _gram_brute(x))

    def test_partitioning_invariant(self, ray_session):
        rng = np.random.RandomState(4)
        x = rng.randn(50, 3).astype(np.float32)
        a = gram_records(_ds(x))
        b = gram_records(_ds(x).repartition(7))
        pd.testing.assert_frame_equal(a, b)


class TestComponents:
    def test_planted_component_recovered(self, ray_session):
        rng = np.random.RandomState(7)
        direction = np.array([3.0, 4.0, 0.0]) / 5.0
        t = rng.randn(400)
        x = (np.outer(t * 10.0, direction)
             + rng.randn(400, 3) * 0.01).astype(np.float32)
        vals, comps = pca_components(_ds(x), k=2)
        assert vals[0] > 50 * vals[1]
        assert np.abs(comps[0] @ direction) > 0.999
        # deterministic sign: largest-|entry| coordinate positive
        assert comps[0][np.argmax(np.abs(comps[0]))] > 0

    def test_orthonormal(self, ray_session):
        rng = np.random.RandomState(9)
        x = rng.randn(80, 4).astype(np.float32)
        _, comps = pca_components(_ds(x), k=3)
        np.testing.assert_allclose(comps @ comps.T, np.eye(3),
                                   atol=1e-9)

    def test_empty_raises(self, ray_session):
        with pytest.raises(ValueError):
            pca_components(_ds(np.zeros((0, 3), dtype=np.float32)),
                           k=1)


class TestProject:
    def test_matches_local_projection(self, ray_session):
        rng = np.random.RandomState(11)
        x = rng.randn(60, 4).astype(np.float32)
        ds = _ds(x)
        got = (pca_project(ds, k=2).to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
        _, comps = pca_components(ds, k=2)
        xq = x.astype(np.float64)
        local = (xq - xq.mean(axis=0)) @ comps.T
        # identical eigvecs; mean differs only by the q4 quantization
        np.testing.assert_allclose(
            got[["pc_0", "pc_1"]].to_numpy(), local, atol=1e-3)

    def test_variance_ordering(self, ray_session):
        rng = np.random.RandomState(13)
        x = (rng.randn(300, 3) * np.array([10.0, 1.0, 0.1])).astype(
            np.float32)
        got = pca_project(_ds(x), k=3).to_pandas()
        v = got[["pc_0", "pc_1", "pc_2"]].var().to_numpy()
        assert v[0] > v[1] > v[2]
