"""Information-theoretic column statistics — Shannon entropy per
column and mutual information between two categorical columns — the
profiling signals behind feature selection, mixture diagnostics
("how informative is `source` about `lang`?"), and skew detection
(low-entropy keys shuffle badly; the crawl engine's hot-host salting
wants exactly this number).

Fixed-point contract (the ``stages/ngram_lm.py`` PMI idiom): every
logarithm enters as ``floor(ln(num/den) · 10^4 + 0.5)`` over EXACT
integer num/den (float only inside the ln of a rational both sides
compute identically), and the aggregate is an order-free int64 sum of
``count · log-term`` products — bit-replayable in SQL.

    H(X)    = Σ_x  c_x · L(N / c_x)          (in q4 nats · N)
    MI(X;Y) = Σ_xy c_xy · L(c_xy · N / (c_x · c_y))

Both report the RAW integer numerators (``h_q4_xn``: q4-nats scaled by
N) so no division ambiguity enters the gate; the float per-row value
is numerator / (N · 10^4).

Distribution: ONE pass builds the joint (x, y) counts (per-batch
pandas combine, groupby sum); marginals derive from the joint table —
never a second scan. Driver holds only the marginal dicts (bounded by
the category alphabets, documented).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

SCALE = 10**4


def _log_q4(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    return np.floor(np.log(num.astype(np.float64)
                           / den.astype(np.float64))
                    * SCALE + 0.5).astype(np.int64)


def joint_counts(ds, x: str, y: str) -> "ray.data.Dataset":
    """(x, y, c) — the joint contingency table in one pass."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([x, y]).to_pandas()
        out = (df.groupby([x, y], as_index=False).size()
               .rename(columns={"size": "c"}))
        out["c"] = out["c"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([x, y]).aggregate(Sum("c", alias_name="c"))
            .materialize())


def entropy_mi(ds, x: str, y: str) -> pd.DataFrame:
    """→ one-row DataFrame (n, h_x_q4n, h_y_q4n, mi_q4n): Shannon
    entropies of the two columns and their mutual information, as raw
    q4-nats·N integer numerators (divide by n·10^4 for nats)."""
    joint = joint_counts(ds, x, y)

    mx: dict = {}
    my: dict = {}
    n = 0
    jrows: list[tuple] = []
    # the joint table is alphabet² rows — driver-bounded by design
    from ..ops.gutil import collect_tables

    for b in collect_tables(joint):
        for xv, yv, c in zip(b[x].to_pylist(), b[y].to_pylist(),
                             b["c"].to_pylist()):
            mx[xv] = mx.get(xv, 0) + c
            my[yv] = my.get(yv, 0) + c
            n += c
            jrows.append((xv, yv, c))
    if n == 0:
        return pd.DataFrame([{"n": np.int64(0), "h_x_q4n": np.int64(0),
                              "h_y_q4n": np.int64(0),
                              "mi_q4n": np.int64(0)}])

    def h(marg: dict) -> int:
        c = np.fromiter(marg.values(), dtype=np.int64)
        return int((c * _log_q4(np.full(len(c), n, dtype=np.int64),
                                c)).sum())

    cxy = np.fromiter((r[2] for r in jrows), dtype=np.int64)
    cx = np.fromiter((mx[r[0]] for r in jrows), dtype=np.int64)
    cy = np.fromiter((my[r[1]] for r in jrows), dtype=np.int64)
    mi = int((cxy * _log_q4(cxy * n, cx * cy)).sum())
    return pd.DataFrame([{
        "n": np.int64(n),
        "h_x_q4n": np.int64(h(mx)),
        "h_y_q4n": np.int64(h(my)),
        "mi_q4n": np.int64(mi),
    }])
