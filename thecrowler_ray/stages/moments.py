"""Exact pairwise moments (covariance / correlation inputs) in one
streaming pass.

Numeric-profiling operator for corpus statistics at scale: for every
column pair it accumulates the exact integer moments
``(n, Σx, Σy, Σxy, Σx², Σy²)`` over fixed-point-quantized values — the
sufficient statistics for mean / variance / covariance / Pearson r —
as **arbitrary-precision integers**, so results are exact, order-free,
and mergeable across any partitioning (the same reason the engine's
sketches are mergeable, but with zero approximation).

Overflow discipline: per batch, int64 products are segment-summed with
``np.add.reduceat`` over bounded windows (window · max-product < 2⁶³),
then the window sums are folded into Python ints (unbounded). The SQL
twin uses HUGEINT (int128) and both sides render the sums as decimal
strings — no float ever enters the statistics, so the driver hash-gate
compares them exactly. The float Pearson r is derived on the pytest
path (vs ``np.corrcoef``).

Quantization: ``q(v) = floor(v · 10^d + 0.5)`` (d decimal places) —
the same double expression evaluated by numpy and DuckDB on the same
parquet doubles, hence identical ints.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SEG = 4096  # segment length: SEG * (1e7)^2 < 2^63 even for q2 prices


def _quantize(v: np.ndarray, digits: int) -> np.ndarray:
    return np.floor(v.astype(np.float64) * (10.0 ** digits) + 0.5).astype(
        np.int64
    )


def _exact_sum(prod: np.ndarray) -> int:
    """Exact Python-int sum of an int64 array via bounded segment sums."""
    if len(prod) == 0:
        return 0
    bounds = np.arange(0, len(prod), _SEG)
    segs = np.add.reduceat(prod, bounds)
    return sum(int(s) for s in segs)


def moment_records(
    ds: "ray.data.Dataset",
    cols: list[str],
    *,
    digits: int = 2,
) -> pd.DataFrame:
    """→ one row per unordered column pair (cx ≤ cy, including cx == cy
    for variances): (cx, cy, n, sum_x, sum_y, sum_xy, sum_xx, sum_yy)
    with every sum an exact decimal string. Driver traffic: one
    stats-dict per batch (KB), never rows."""
    pairs = [
        (a, b) for i, a in enumerate(sorted(cols))
        for b in sorted(cols)[i:]
    ]

    def partial(batch: pa.Table) -> pa.Table:
        q = {
            c: _quantize(
                batch[c].to_numpy(zero_copy_only=False), digits
            )
            for c in cols
        }
        n = batch.num_rows
        out_rows = []
        for a, b in pairs:
            out_rows.append(
                (
                    a,
                    b,
                    n,
                    str(_exact_sum(q[a])),
                    str(_exact_sum(q[b])),
                    str(_exact_sum(q[a] * q[b])),
                    str(_exact_sum(q[a] * q[a])),
                    str(_exact_sum(q[b] * q[b])),
                )
            )
        arr = list(zip(*out_rows))
        return pa.table(
            {
                "cx": pa.array(arr[0], pa.string()),
                "cy": pa.array(arr[1], pa.string()),
                "n": pa.array(arr[2], pa.int64()),
                "sum_x": pa.array(arr[3], pa.string()),
                "sum_y": pa.array(arr[4], pa.string()),
                "sum_xy": pa.array(arr[5], pa.string()),
                "sum_xx": pa.array(arr[6], pa.string()),
                "sum_yy": pa.array(arr[7], pa.string()),
            }
        )

    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()

    rows = []
    for (a, b), g in parts.groupby(["cx", "cy"], sort=True):
        rows.append(
            {
                "cx": a,
                "cy": b,
                "n": int(g["n"].sum()),
                **{
                    k: str(sum(int(v) for v in g[k]))
                    for k in ("sum_x", "sum_y", "sum_xy", "sum_xx",
                              "sum_yy")
                },
            }
        )
    return pd.DataFrame(
        rows,
        columns=["cx", "cy", "n", "sum_x", "sum_y", "sum_xy", "sum_xx",
                 "sum_yy"],
    )


def pearson_from_moments(row) -> float:
    """Derived float statistic (pytest path): exact integer moments →
    Pearson r."""
    n = int(row["n"])
    sx, sy = int(row["sum_x"]), int(row["sum_y"])
    sxy = int(row["sum_xy"])
    sxx, syy = int(row["sum_xx"]), int(row["sum_yy"])
    num = n * sxy - sx * sy
    den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    if den2 <= 0:
        return float("nan")
    # exact-int ratio materialized as float only at the very end
    return num / (den2 ** 0.5)
