"""Entity-correlation plane (reference
``pkg/database/entity_correlation_timeseries.go``).

The reference persists correlation results into Postgres/MySQL —
normalized ordered object pairs with rule/score/confidence
(``UpsertObjectCorrelation``, entity_correlation_timeseries.go:247-293),
entity memberships, derived time-series *observations* for each persisted
row (:330), and a resumable backfill job that attaches entity ids to
historical observations through the membership table (:360-508). Here the
same semantics are Ray-Data-native — tables are datasets, the upsert is a
sharded last-win reduce, the backfill is a broadcast-join batch pass:

- :func:`normalize_correlation_order` — vectorized pair ordering
  (normalizeCorrelationOrder, :238-243: swap when type1>type2 or equal
  types with id1>id2).
- :func:`validate_correlations` — the upsert's precondition battery
  (:247-263): identities + rule required, score/confidence within [0,1]
  (validateUnitInterval, :69-74), objects distinct *after* normalization.
  As a batch operator it filters invalid rows instead of erroring the
  whole transaction, and reports per-reason counts.
- :func:`upsert_correlations` — last-win by the 5-column conflict key
  (the ON CONFLICT DO UPDATE), expressed as ONE all-to-all on a uniform
  hash shard of the key (the dedup.py exchange pattern — group
  cardinality is the shard count × ~rows/shard, never one group per
  distinct key, so 10^10 correlations still parallelize).
- :func:`correlation_observations` / :func:`membership_observations` —
  the derived observation events with the reference's identity strings,
  fields, and provenance (:294-356).
- :func:`backfill_observation_entities` — BackfillObservationEntities
  (:360-508): clamp batch_size to [1,10000]→500 default and max_batches
  to [1,1000]; scan observations with NULL entity in id order above the
  checkpoint; attach the MIN entity_id membership for (object_type,
  object_id); merge confidence/role/type into dimensions only when
  absent; append an ``entity_membership_backfill`` provenance entry;
  report scanned/updated/batches/done/next_observation_id and the
  affected observed-at range. The membership side is broadcast via
  ``ray.put`` (reference scale: memberships ≪ observations).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

_KEY_COLS = ["object_type_1", "object_id_1", "object_type_2",
             "object_id_2", "rule_id"]


def normalize_correlation_order(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    swap = (df["object_type_1"] > df["object_type_2"]) | (
        (df["object_type_1"] == df["object_type_2"])
        & (df["object_id_1"] > df["object_id_2"]))
    for a, b in (("object_type_1", "object_type_2"),
                 ("object_id_1", "object_id_2")):
        av, bv = df[a].copy(), df[b].copy()
        df.loc[swap, a] = bv[swap]
        df.loc[swap, b] = av[swap]
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def validate_correlations(batch: pa.Table) -> pa.Table:
    """Normalize, then filter to rows the reference's upsert would
    accept (it errors the transaction per record; a batch operator
    drops the offenders instead)."""
    df = normalize_correlation_order(batch).to_pandas()
    ok = (
        (df["rule_id"] != 0)
        & (df["object_id_1"] != 0) & (df["object_id_2"] != 0)
        & (df["object_type_1"] != "") & (df["object_type_2"] != "")
    )
    for col in ("score", "confidence"):
        if col in df.columns:
            v = df[col]
            ok &= v.isna() | ((v >= 0.0) & (v <= 1.0))
    ok &= ~((df["object_type_1"] == df["object_type_2"])
            & (df["object_id_1"] == df["object_id_2"]))
    return pa.Table.from_pandas(df[ok], preserve_index=False).replace_schema_metadata(None)


def _key_shard(df: pd.DataFrame, num_shards: int) -> pd.Series:
    key = (df["object_type_1"].astype(str) + "\x1f"
           + df["object_id_1"].astype(str) + "\x1f"
           + df["object_type_2"].astype(str) + "\x1f"
           + df["object_id_2"].astype(str) + "\x1f"
           + df["rule_id"].astype(str))
    return pd.util.hash_array(key.to_numpy(dtype=object)) % num_shards


def upsert_correlations(ds, seq_col: str = "seq", num_shards: int = 64):
    """Last-win per conflict key (ON CONFLICT ... DO UPDATE SET
    entity_id/score/confidence = excluded): ``seq_col`` is arrival order;
    highest seq wins. One uniform-shard exchange, vectorized reduce."""
    def add_shard(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["shard"] = _key_shard(df, num_shards).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(seq_col, kind="mergesort")
        return g.drop_duplicates(_KEY_COLS, keep="last").drop(
            columns=["shard"])

    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(reduce_shard, batch_format="pandas"))


# -- observation emission ----------------------------------------------------

def correlation_observations(batch: pa.Table) -> pa.Table:
    """Two observation events per persisted correlation
    (emitObjectCorrelationObservationsTx, :310-329): source kinds
    ``object_correlation``/``correlation_rule``, the shared identity
    ``correlation:{t1}:{id1}:{t2}:{id2}:{rule}``, JSON fields, and the
    per-kind provenance."""
    df = batch.to_pandas()
    rows = []
    for r in df.itertuples(index=False):
        identity = (f"correlation:{r.object_type_1}:{r.object_id_1}:"
                    f"{r.object_type_2}:{r.object_id_2}:{r.rule_id}")
        fields = {"rule_id": int(r.rule_id),
                  "object_type_1": r.object_type_1,
                  "object_id_1": int(r.object_id_1),
                  "object_type_2": r.object_type_2,
                  "object_id_2": int(r.object_id_2)}
        for opt in ("score", "confidence", "entity_id"):
            v = getattr(r, opt, None)
            if v is not None and not pd.isna(v):
                fields[opt] = float(v) if opt != "entity_id" else int(v)
        base = {"identity": identity,
                "fields": json.dumps(fields, sort_keys=True)}
        rows.append({**base, "source_kind": "object_correlation",
                     "event": "persisted",
                     "provenance": json.dumps(
                         {"persistence": "object_correlation",
                          "related_object": {
                              "object_type": r.object_type_2,
                              "object_id": int(r.object_id_2)}},
                         sort_keys=True)})
        rows.append({**base, "source_kind": "correlation_rule",
                     "event": "correlation_result",
                     "provenance": json.dumps(
                         {"persistence": "correlation_rule_result",
                          "rule_id": int(r.rule_id)}, sort_keys=True)})
    return pa.Table.from_pylist(rows) if rows else pa.table({
        "identity": pa.array([], pa.string()),
        "fields": pa.array([], pa.string()),
        "source_kind": pa.array([], pa.string()),
        "event": pa.array([], pa.string()),
        "provenance": pa.array([], pa.string()),
    })


def membership_observations(batch: pa.Table) -> pa.Table:
    """One ``entity_membership``/"persisted" event per membership
    (emitEntityMembershipObservationsTx, :294-309), identity
    ``membership:{entity}:{object_type}:{object_id}``."""
    df = batch.to_pandas()
    rows = []
    for r in df.itertuples(index=False):
        fields = {"entity_id": int(r.entity_id),
                  "object_type": r.object_type,
                  "object_id": int(r.object_id),
                  "membership_role": getattr(r, "membership_role", ""),
                  "membership_type": getattr(r, "membership_type", "")}
        conf = getattr(r, "confidence", None)
        if conf is not None and not pd.isna(conf):
            fields["confidence"] = float(conf)
        provenance = {"persistence": "entity_membership"}
        evidence = getattr(r, "evidence", None)
        if evidence:
            try:
                provenance["membership_evidence"] = json.loads(evidence)
            except (TypeError, ValueError):
                pass
        rows.append({
            "source_kind": "entity_membership", "event": "persisted",
            "identity": (f"membership:{int(r.entity_id)}:"
                         f"{r.object_type}:{int(r.object_id)}"),
            "fields": json.dumps(fields, sort_keys=True),
            "provenance": json.dumps(provenance, sort_keys=True),
        })
    return pa.Table.from_pylist(rows)


# -- resumable backfill ------------------------------------------------------

def _merge_obs_row(r, m) -> dict:
    """The reference's per-row UPDATE body (dims merge-if-absent +
    provenance append, entity_correlation_timeseries.go:446-495).
    ``m`` exposes ``entity_id, confidence, evidence, membership_role,
    membership_type`` as attributes."""
    dims = json.loads(r.dimensions) if r.dimensions else {}
    conf = getattr(m, "confidence", None)
    if "confidence" not in dims and conf is not None and not pd.isna(conf):
        dims["confidence"] = float(conf)
    for dim_key in ("membership_role", "membership_type"):
        v = getattr(m, dim_key, None)
        if dim_key not in dims and v:
            dims[dim_key] = v
    prov = json.loads(r.provenance) if r.provenance else {}
    entry = {"entity_id": int(m.entity_id), "object_membership": True}
    if conf is not None and not pd.isna(conf):
        entry["confidence"] = float(conf)
    evidence = getattr(m, "evidence", None)
    if evidence:
        try:
            entry["evidence"] = json.loads(evidence)
        except (TypeError, ValueError):
            pass
    existing = prov.get("entity_membership_backfill")
    prov["entity_membership_backfill"] = (
        existing + [entry] if isinstance(existing, list)
        else ([existing, entry] if existing else [entry]))
    return {
        "observation_id": int(r.observation_id),
        "observed_at": r.observed_at,
        "entity_id": int(m.entity_id),
        "dimensions": json.dumps(dims, sort_keys=True),
        "provenance": json.dumps(prov, sort_keys=True),
    }


def _updates_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows) if rows else pa.table({
        "observation_id": pa.array([], pa.int64()),
        "observed_at": pa.array([], pa.timestamp("us")),
        "entity_id": pa.array([], pa.int64()),
        "dimensions": pa.array([], pa.string()),
        "provenance": pa.array([], pa.string()),
    })


_MEM_COLS = ("entity_id", "confidence", "evidence", "membership_role",
             "membership_type")


def backfill_observation_entities(observations_ds, memberships_ds,
                                  after_observation_id: int = 0,
                                  batch_size: int = 500,
                                  max_batches: int = 1,
                                  join_threshold: int = 100_000):
    """Returns ``(updated_rows_df, result)`` where ``result`` mirrors
    EntityObservationBackfillResult. Observation columns:
    ``observation_id, observed_at, object_type, object_id, entity_id,
    dimensions, provenance``; membership columns: ``entity_id,
    object_type, object_id, confidence, evidence, membership_role,
    membership_type``.

    The reference's correlated MIN-entity-per-object subquery runs over
    *all* memberships, so that side is not small at scale: below
    ``join_threshold`` rows it is reduced on the driver and broadcast
    (``ray.put`` once); above it both the MIN reduce and the
    observation⋈membership match stay distributed (groupby + native
    ``Dataset.join`` on ``(object_type, object_id)``) — the driver never
    materializes the membership table."""
    batch_size = 500 if batch_size <= 0 else min(batch_size, 10000)
    max_batches = 1 if max_batches <= 0 else min(max_batches, 1000)
    limit = batch_size * max_batches

    mem_is_ds = not isinstance(memberships_ds, pd.DataFrame)
    n_mem = memberships_ds.count() if mem_is_ds else len(memberships_ds)

    if n_mem > join_threshold:
        import ray.data as rd
        import types

        mem_ds = memberships_ds if mem_is_ds \
            else rd.from_pandas(memberships_ds)

        def first_min_shard(g: pd.DataFrame) -> pd.DataFrame:
            # vectorized across every (object_type, object_id) in the
            # shard — one map_groups call per membership object is a
            # scheduler round-trip per entity at scale
            g = g.sort_values(["object_type", "object_id", "entity_id"],
                              kind="mergesort")
            return g.drop_duplicates(
                subset=["object_type", "object_id"], keep="first")

        def rename_cast(t: pa.Table) -> pa.Table:
            t = t.rename_columns(
                [f"m_{c}" if c in _MEM_COLS else c for c in t.column_names])
            # all-null columns infer Arrow `null`, which the hash join
            # rejects as a non-key field — carry them as string
            for i, f in enumerate(t.schema):
                if pa.types.is_null(f.type):
                    t = t.set_column(
                        i, pa.field(f.name, pa.string()),
                        t.column(i).cast(pa.string()))
            return t

        from .ops.gutil import group_by_key_shards

        mem_min = group_by_key_shards(
            mem_ds, ["object_type", "object_id"], first_min_shard
        ).map_batches(rename_cast, batch_format="pyarrow")

        def cand_filter(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            mask = (df["entity_id"].isna()
                    & (df["observation_id"] > after_observation_id))
            return pa.Table.from_pandas(df[mask], preserve_index=False)

        def merge_joined(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            rows = [
                _merge_obs_row(r, types.SimpleNamespace(
                    entity_id=r.m_entity_id, confidence=r.m_confidence,
                    evidence=r.m_evidence,
                    membership_role=r.m_membership_role,
                    membership_type=r.m_membership_type))
                for r in df.itertuples(index=False)
            ]
            return _updates_table(rows)

        updated = (
            observations_ds
            .map_batches(cand_filter, batch_format="pyarrow")
            .join(mem_min, join_type="inner", num_partitions=16,
                  on=("object_type", "object_id"))
            .sort("observation_id")
            .limit(limit)
            .map_batches(merge_joined, batch_format="pyarrow")
            .to_pandas()
        )
    else:
        # MIN(entity_id) membership per object (the correlated subquery),
        # reduced on the driver while small and broadcast once
        mdf = memberships_ds.to_pandas() if mem_is_ds else memberships_ds
        mdf = (mdf.sort_values("entity_id", kind="mergesort")
               .drop_duplicates(["object_type", "object_id"], keep="first"))
        lookup = {(r.object_type, int(r.object_id)): r
                  for r in mdf.itertuples(index=False)}
        lookup_ref = ray.put(lookup)

        def candidates(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            look = ray.get(lookup_ref)
            mask = (df["entity_id"].isna()
                    & (df["observation_id"] > after_observation_id))
            df = df[mask]
            hit = [(t, int(i)) in look
                   for t, i in zip(df["object_type"], df["object_id"])]
            return pa.Table.from_pandas(df[np.array(hit, dtype=bool)]
                                        if len(df) else df,
                                        preserve_index=False)

        def merge_updates(batch: pa.Table) -> pa.Table:
            look = ray.get(lookup_ref)
            df = batch.to_pandas()
            rows = [
                _merge_obs_row(r, look[(r.object_type, int(r.object_id))])
                for r in df.itertuples(index=False)
            ]
            return _updates_table(rows)

        updated = (observations_ds
                   .map_batches(candidates, batch_format="pyarrow")
                   .sort("observation_id")
                   .limit(limit)
                   .map_batches(merge_updates, batch_format="pyarrow")
                   .to_pandas())

    # counters replay the reference's chunk loop arithmetically: k full
    # chunks then a short/empty one (unless the limit itself was hit)
    n = len(updated)
    result = {"scanned": n, "updated": n,
              "next_observation_id": (int(updated["observation_id"].max())
                                      if n else after_observation_id),
              "done": n < limit,
              "batches": (max_batches if n >= limit
                          else n // batch_size + 1),
              "affected_start": updated["observed_at"].min() if n else None,
              "affected_end": updated["observed_at"].max() if n else None}
    if n:
        updated = updated.sort_values("observation_id").reset_index(drop=True)
    return updated, result
