"""Exact distributed quantiles by iterative histogram refinement
(distributed selection — Blum et al. selection generalized to the
streaming-histogram form used by every external-memory median
algorithm; public folklore method).

Sketches (``stages/sketch.py``) give approximate quantiles in one pass;
this gives EXACT order statistics in ≤ ceil(log_B(range)) streaming
passes with O(Q·B) driver state — no sort, no shuffle, ever. Each pass
is one ``map_batches`` over the (materialized, slim) int column
emitting per-quantile bucket-count partials; the driver narrows each
target rank's [lo, hi] interval to the bucket containing it. With
B = 4096 an int64 range resolves in ≤ 6 passes; value-dense columns
resolve in 2-3.

Rank semantics: quantile q over n rows selects the 0-based index
``floor(q · (n − 1))`` of the ascending sort (the "lower" method) —
pinned against a ROW_NUMBER SQL twin, no interpolation ambiguity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min


def exact_quantiles(ds, col: str, qs: list[float], *,
                    n_buckets: int = 4096) -> "ray.data.Dataset":
    """Dataset with int64 ``col`` → Dataset ``(q_permille, n, value)``:
    the exact value at 0-based rank floor(q·(n−1)) per requested
    quantile. ``qs`` as fractions; reported as integer permille to keep
    the output schema float-free."""
    slim = ds.select_columns([col]).materialize()

    stats = slim.aggregate(
        Count(alias_name="n"),
        Min(col, alias_name="lo"),
        Max(col, alias_name="hi"),
    )
    n = int(stats["n"])
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "q_permille": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "value": pa.array([], pa.int64())}))
    glo, ghi = int(stats["lo"]), int(stats["hi"])

    # per-quantile state: [lo, hi] interval and the remaining rank r
    # within elements of that interval
    state = []
    for q in qs:
        k = int(np.floor(q * (n - 1)))
        if not 0 <= k < n:
            raise ValueError(f"exact_quantiles: q={q} out of range")
        state.append({"q": q, "lo": glo, "hi": ghi, "r": k, "done": False})

    while any(not s["done"] for s in state):
        active = [i for i, s in enumerate(state) if not s["done"]]
        for i in active:
            s = state[i]
            if s["lo"] == s["hi"]:
                s["done"] = True
        active = [i for i, s in enumerate(state) if not s["done"]]
        if not active:
            break
        widths = {}
        for i in active:
            s = state[i]
            span = s["hi"] - s["lo"] + 1
            widths[i] = max((span + n_buckets - 1) // n_buckets, 1)
        spec_ref = ray.put([(i, state[i]["lo"], state[i]["hi"], widths[i])
                            for i in active])

        def partial(batch: pa.Table) -> pa.Table:
            spec = ray.get(spec_ref)
            x = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            out_i, out_b, out_c = [], [], []
            for qi, lo, hi, w in spec:
                m = x[(x >= lo) & (x <= hi)]
                if len(m) == 0:
                    continue
                b = (m - lo) // w
                cnt = np.bincount(b)
                nz = np.nonzero(cnt)[0]
                out_i.extend([qi] * len(nz))
                out_b.extend(nz.tolist())
                out_c.extend(cnt[nz].tolist())
            return pa.table({
                "qi": pa.array(out_i, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "c": pa.array(out_c, pa.int64()),
            })

        from .gutil import collect_tables

        hist = {i: np.zeros(n_buckets, dtype=np.int64) for i in active}
        for bt in collect_tables(slim.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        )):
            qi = bt["qi"].to_numpy(zero_copy_only=False)
            bb = bt["b"].to_numpy(zero_copy_only=False)
            cc = bt["c"].to_numpy(zero_copy_only=False)
            for i in active:
                sel = qi == i
                if sel.any():
                    np.add.at(hist[i], bb[sel], cc[sel])

        for i in active:
            s = state[i]
            w = widths[i]
            cum = np.cumsum(hist[i])
            j = int(np.searchsorted(cum, s["r"] + 1))
            before = int(cum[j - 1]) if j > 0 else 0
            s["r"] -= before
            s["lo"] = s["lo"] + j * w
            s["hi"] = min(s["lo"] + w - 1, s["hi"])
            if s["lo"] == s["hi"]:
                s["done"] = True

    return ray.data.from_arrow(pa.table({
        "q_permille": pa.array(
            [int(round(s["q"] * 1000)) for s in state], pa.int64()),
        "n": pa.array([n] * len(state), pa.int64()),
        "value": pa.array([s["lo"] for s in state], pa.int64()),
    }))
