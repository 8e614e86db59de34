"""Per-group top-k with a per-batch partial combiner.

Global top-k already exists (``sort + limit`` / ``_PartialBottomK`` in
``stages/sample.py``); this is the grouped form a training-data pipeline
uses for stratified selection ("best k documents per language", "top k
clicks per user"). The shuffle-reduction idea mirrors the engine's other
combiners (``ops/agg.py``): each input batch is first reduced to at most
``k`` rows PER GROUP KEY PRESENT IN THE BATCH, so the one ``groupby``
shuffle moves O(k × groups-per-batch × batches) rows instead of the whole
table; the final per-group head(k) runs in ``map_groups`` over those
survivors. Ties are broken by the trailing ``order_cols`` — pass a unique
column last for fully deterministic output.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def topk_per_group(
    ds: "ray.data.Dataset",
    *,
    group_cols: list[str],
    order_cols: list[str],
    k: int,
    ascending: list[bool] | bool = True,
    rank_col: str | None = None,
) -> "ray.data.Dataset":
    """Keep the first ``k`` rows of every group under the total order
    ``order_cols``/``ascending``. With ``rank_col``, emit the 1-based
    in-group rank as an extra int64 column."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(order_cols, ascending=ascending, kind="mergesort")
            .groupby(group_cols, sort=False)
            .head(k)
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(
            order_cols, ascending=ascending, kind="mergesort"
        ).head(k)
        if rank_col is not None:
            out = out.assign(
                **{rank_col: pd.RangeIndex(1, len(out) + 1).astype("int64")}
            )
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_cols)
        .map_groups(final, batch_format="pandas")
    )
