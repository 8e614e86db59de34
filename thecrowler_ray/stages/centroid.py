"""Nearest-centroid (Rocchio) classifier over an embedding column.

The embedding-plane sibling of the token-space Naive Bayes
(``stages/classify.py``): train = one pass of per-label vector sums
(the only shuffle, over slim per-batch partial sums — L×D ints), score
= squared L2 distance to each label's QUANTIZED centroid, argmin with
label-ascending tie-break. Rocchio/nearest-centroid is the classic
cheap embedding classifier (Manning, Raghavan & Schütze, IIR §14.2 —
public method).

**Integer-exact contract**: embeddings quantize to q4 ints
(``floor(e·10^4 + 0.5)``); each centroid dimension is the TRUNCATING
division ``(Σx_q4 · 10^4) div n`` (toward zero — DuckDB's integer ``//``
truncates, numpy floors, so the engine mirrors trunc explicitly),
giving a q8 integer centroid; distances are
``Σ_dims (x_q4·10^4 − c_q8)²`` — pure int64 (headroom: dims ·
(2·max|e|·10^8)² must stay < 2^63; 64 dims of |e| ≤ 3 clears it by
10×; reduce the quantization for exotic ranges). Distances to a FIXED
quantized centroid are comparable across labels — no per-label n in
the units (dividing first is what keeps the cross-label argmin exact
without HUGEINT cross-multiplication).

Scoring broadcasts the L×D centroid matrix (tiny at any corpus scale —
its size is labels × dims, not rows) — no join path needed, unlike the
token-space classifier whose model grows with vocabulary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

Q1 = 10_000  # embedding quantization (q4)
Q2 = 10_000  # centroid division scale (q4 → q8)


def _quantize(mat: np.ndarray) -> np.ndarray:
    return np.floor(mat * Q1 + 0.5).astype(np.int64)


def _trunc_div(a: np.ndarray, b: int) -> np.ndarray:
    """Truncating integer division (toward zero) — DuckDB's ``//``."""
    q = np.abs(a) // b
    return np.where(a < 0, -q, q)


def centroid_classify(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    split_mod: int = 8,
) -> "ray.data.Dataset":
    """Train per-label centroids on the ``id % 10 < split_mod`` split,
    classify every vector → Dataset
    ``(id, pred_label, dist_q, is_train, correct)``."""
    def partial_sums(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        labels = np.asarray(batch[label_col], dtype=np.int64)
        mat = _quantize(np.stack(batch[vec_col].to_pylist()).astype(
            np.float64))
        train = ids % 10 < split_mod
        out_l, out_n, out_s = [], [], []
        for lab in np.unique(labels[train]):
            sel = train & (labels == lab)
            out_l.append(int(lab))
            out_n.append(int(sel.sum()))
            out_s.append(mat[sel].sum(axis=0))
        if not out_l:
            return pa.table({
                "label": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.list_(pa.int64())),
            })
        return pa.table({
            "label": pa.array(out_l, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
            "s": pa.array([list(map(int, v)) for v in out_s],
                          pa.list_(pa.int64())),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = np.sum(np.stack(g["s"].to_numpy()), axis=0)
        return pd.DataFrame({
            "label": [int(g["label"].iloc[0])],
            "n": [int(g["n"].sum())],
            "s": [list(map(int, s))],
        })

    model = (ds.map_batches(partial_sums, batch_format="pyarrow")
             .groupby("label").map_groups(merge, batch_format="pandas")
             .materialize())
    if model.count() == 0:
        raise ValueError("centroid_classify: empty train split")

    labels, cents = [], []
    for b in model.iter_batches(batch_format="pyarrow"):
        for lab, n, s in zip(b["label"].to_pylist(), b["n"].to_pylist(),
                             b["s"].to_pylist()):
            labels.append(lab)
            cents.append(_trunc_div(np.asarray(s, dtype=np.int64) * Q2, n))
    order = np.argsort(labels)
    labels = np.asarray(labels, dtype=np.int64)[order]
    cent = np.stack(cents)[order]          # (L, D) q8 ints
    cent_ref = ray.put((labels, cent))

    class _Score:
        def __init__(self):
            self.labels, self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col], dtype=np.int64)
            true = np.asarray(batch[label_col], dtype=np.int64)
            x = _quantize(np.stack(batch[vec_col].to_pylist()).astype(
                np.float64)) * Q2      # q8 to match the centroids
            # (N, L): exact int64 squared distances
            d = ((x[:, None, :] - self.cent[None, :, :]) ** 2).sum(axis=2)
            j = np.argmin(d, axis=1)   # first min = label-asc tie-break
            pred = self.labels[j]
            return pa.table({
                id_col: batch[id_col],
                "pred_label": pa.array(pred, pa.int64()),
                "dist_q": pa.array(d[np.arange(len(ids)), j], pa.int64()),
                "is_train": pa.array(
                    (ids % 10 < split_mod).astype(np.int64)),
                "correct": pa.array((pred == true).astype(np.int64)),
            })

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return ds.map_batches(_Score, batch_format="pyarrow",
                          concurrency=max(2, min(4, cpus - 2)))
