"""Distributed PCA over an embedding column (Pearson 1901 / standard
one-pass sufficient-statistics formulation — public textbook method).

The training-data uses: whitening before ANN / SemDeDup, dimensionality
reduction for cheap near-dup passes, and per-corpus drift monitoring
(eigenspectrum change between crawls).

Split of labor (and of verification):

- **Distributed part — exact, oracle-gated**: ONE streaming pass
  accumulates the Gram sufficient statistics ``(n, Σx_i, Σx_i·x_j)``
  over fixed-point-quantized values as arbitrary-precision integers
  (the ``stages/moments.py`` discipline: int64 matmul per batch —
  |xq| ≤ 10⁴ ⇒ products ≤ 10⁸, safe for any batch size — folded into
  Python ints on the driver; decimal-string render vs DuckDB HUGEINT).
  Driver traffic: d(d+1)/2 rows per batch, never data.
- **Driver part — float, pytest-gated**: the d×d covariance eigensolve
  (``np.linalg.eigh``) is O(d³) on a TINY matrix; eigenvectors are
  sign-normalized (largest-|entry| coordinate made positive, ties to
  the lowest index) so components are deterministic.
- **Projection — distributed map**: components broadcast once; each
  batch is one float64 matmul. Verified in pytest (planted-component
  recovery, variance ordering, orthogonality), not SQL — floats.

Quantization contract: ``q(v) = floor(CAST(v AS DOUBLE)·10⁴ + 0.5)``
— the embeddings column is float32; both sides widen to double FIRST
(the ``stages/centroid.py`` pin).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

DIGITS = 4


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """list<float> column → (n, d) float64 (float32 widened first)."""
    arrs = batch[col].to_pylist()
    return np.asarray(arrs, dtype=np.float64)


def gram_records(
    ds: "ray.data.Dataset",
    *,
    col: str = "embedding",
) -> pd.DataFrame:
    """→ one row per dim pair (i ≤ j): (i, j, n, sum_i, sum_j, sum_ij)
    with exact decimal-string sums over q4-quantized values."""

    def partial(batch: pa.Table) -> pa.Table:
        x = _batch_matrix(batch, col)
        q = np.floor(x * (10.0 ** DIGITS) + 0.5).astype(np.int64)
        n, d = q.shape
        s = q.sum(axis=0)                      # Σ per dim (int64 safe)
        g = q.T @ q                            # d×d int64 (see module doc)
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "n": pa.array(np.full(len(iu), n, np.int64)),
            "sum_i": pa.array([str(int(v)) for v in s[iu]],
                              pa.string()),
            "sum_j": pa.array([str(int(v)) for v in s[ju]],
                              pa.string()),
            "sum_ij": pa.array([str(int(v)) for v in g[iu, ju]],
                               pa.string()),
        })

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None).to_pandas()
    if len(parts) == 0:  # empty Datasets drop their schema
        return pd.DataFrame(
            columns=["i", "j", "n", "sum_i", "sum_j", "sum_ij"])
    rows = []
    for (i, j), g in parts.groupby(["i", "j"], sort=True):
        rows.append({
            "i": int(i), "j": int(j), "n": int(g["n"].sum()),
            "sum_i": str(sum(int(v) for v in g["sum_i"])),
            "sum_j": str(sum(int(v) for v in g["sum_j"])),
            "sum_ij": str(sum(int(v) for v in g["sum_ij"])),
        })
    return pd.DataFrame(
        rows, columns=["i", "j", "n", "sum_i", "sum_j", "sum_ij"])


def _mean_cov(rec: pd.DataFrame) -> tuple[int, np.ndarray, np.ndarray]:
    if len(rec) == 0:
        raise ValueError("pca: empty dataset")
    d = int(rec["j"].max()) + 1
    n = int(rec["n"].iloc[0])
    scale = 10.0 ** DIGITS
    s1 = np.zeros(d)
    for r in rec.itertuples(index=False):
        s1[r.i] = int(r.sum_i)
    mean = s1 / n / scale
    cov = np.zeros((d, d))
    for r in rec.itertuples(index=False):
        c = (int(r.sum_ij) / n / scale / scale
             - mean[r.i] * mean[r.j])
        cov[r.i, r.j] = c
        cov[r.j, r.i] = c
    return n, mean, cov


def pca_components(
    ds: "ray.data.Dataset" = None,
    *,
    col: str = "embedding",
    k: int = 2,
    rec: pd.DataFrame | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """→ (eigvals desc (k,), components (k, d)) of the sample
    covariance, from the exact Gram statistics (``rec`` reuses a
    precomputed ``gram_records`` frame). Deterministic sign: each
    component's largest-|entry| coordinate (lowest index on ties) is
    positive."""
    if rec is None:
        rec = gram_records(ds, col=col)
    _, _, cov = _mean_cov(rec)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order].T  # (k, d)
    for row in vecs:
        m = np.argmax(np.abs(np.round(row, 12)))
        if row[m] < 0:
            row *= -1
    return vals, vecs


def pca_project(
    ds: "ray.data.Dataset",
    *,
    col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 2,
) -> "ray.data.Dataset":
    """Project every row onto the top-k principal axes (centered) →
    Dataset (id, pc_0..pc_{k-1} float64). Components broadcast once."""
    rec = gram_records(ds, col=col)
    _, mean, _ = _mean_cov(rec)
    _, comps = pca_components(col=col, k=k, rec=rec)
    ref = ray.put((mean, comps))

    def project(batch: pa.Table) -> pa.Table:
        mu, w = ray.get(ref)
        x = _batch_matrix(batch, col)
        p = (x - mu) @ w.T
        cols = {id_col: batch[id_col]}
        for c in range(p.shape[1]):
            cols[f"pc_{c}"] = pa.array(p[:, c])
        return pa.table(cols)

    return ds.select_columns([id_col, col]).map_batches(
        project, batch_format="pyarrow")
