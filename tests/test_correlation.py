"""Entity-correlation plane tests
(pkg/database/entity_correlation_timeseries.go): pair-order
normalization, upsert validation, last-win conflict resolution,
observation emission shapes, and the resumable backfill's clamp /
checkpoint / dimension-merge semantics."""

import json

import pandas as pd
import pyarrow as pa
import pytest

from thecrowler_ray.correlation import (
    backfill_observation_entities,
    correlation_observations,
    membership_observations,
    normalize_correlation_order,
    upsert_correlations,
    validate_correlations,
)


def _corr(t1, i1, t2, i2, rule=1, score=0.5, conf=0.5, seq=0):
    return {"object_type_1": t1, "object_id_1": i1, "object_type_2": t2,
            "object_id_2": i2, "rule_id": rule, "score": score,
            "confidence": conf, "seq": seq}


def test_normalize_order():
    t = pa.Table.from_pylist([
        _corr("lang", 3, "document", 7),    # type order swaps
        _corr("document", 9, "document", 2),  # same type, id order swaps
        _corr("document", 1, "lang", 2),    # already ordered
    ])
    df = normalize_correlation_order(t).to_pandas()
    assert df.iloc[0][["object_type_1", "object_id_1",
                       "object_type_2", "object_id_2"]].tolist() == \
        ["document", 7, "lang", 3]
    assert df.iloc[1][["object_id_1", "object_id_2"]].tolist() == [2, 9]
    assert df.iloc[2][["object_type_1", "object_id_1"]].tolist() == \
        ["document", 1]


def test_validate_drops_reference_rejections():
    t = pa.Table.from_pylist([
        _corr("document", 1, "lang", 2),              # ok
        _corr("document", 0, "lang", 2),              # zero id
        _corr("document", 1, "lang", 2, rule=0),      # zero rule
        _corr("", 1, "lang", 2),                      # empty type
        _corr("document", 1, "lang", 2, score=1.5),   # score out of [0,1]
        _corr("document", 1, "lang", 2, conf=-0.1),   # confidence < 0
        _corr("document", 3, "document", 3),          # self after normalize
        _corr("lang", 2, "document", 1),              # dup of row0 reversed
    ])
    df = validate_correlations(t).to_pandas()
    assert len(df) == 2  # row0 + the reversed twin (dedup is upsert's job)
    assert (df["object_type_1"] == "document").all()


@pytest.mark.usefixtures("ray_session")
def test_upsert_last_win():
    import ray.data

    rows = [
        _corr("document", 1, "lang", 2, score=0.1, seq=1),
        _corr("lang", 2, "document", 1, score=0.9, seq=5),  # same key, later
        _corr("document", 2, "lang", 2, score=0.3, seq=2),
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).map_batches(
        validate_correlations, batch_format="pyarrow")
    out = upsert_correlations(ds).to_pandas().sort_values(
        "object_id_1").reset_index(drop=True)
    assert len(out) == 2
    assert out.loc[0, "score"] == 0.9  # seq=5 won
    assert out.loc[1, "score"] == 0.3


def test_observation_shapes():
    t = pa.Table.from_pylist([_corr("document", 1, "lang", 2, score=0.7)])
    obs = correlation_observations(t).to_pylist()
    assert [o["source_kind"] for o in obs] == \
        ["object_correlation", "correlation_rule"]
    assert all(o["identity"] == "correlation:document:1:lang:2:1"
               for o in obs)
    fields = json.loads(obs[0]["fields"])
    assert fields["score"] == 0.7 and fields["object_id_2"] == 2
    assert json.loads(obs[1]["provenance"])["persistence"] == \
        "correlation_rule_result"

    m = pa.Table.from_pylist([{
        "entity_id": 9, "object_type": "document", "object_id": 4,
        "confidence": 0.8, "evidence": '{"src": "rule"}',
        "membership_role": "member", "membership_type": "auto"}])
    mo = membership_observations(m).to_pylist()[0]
    assert mo["identity"] == "membership:9:document:4"
    assert json.loads(mo["provenance"])["membership_evidence"] == \
        {"src": "rule"}


@pytest.mark.usefixtures("ray_session")
def test_backfill_checkpoint_and_merge():
    import ray.data

    obs = pd.DataFrame({
        "observation_id": [1, 2, 3, 4, 5],
        "observed_at": pd.to_datetime(
            ["2026-01-01", "2026-01-02", "2026-01-03", "2026-01-04",
             "2026-01-05"]),
        "object_type": ["document"] * 4 + ["orphan"],
        "object_id": [10, 11, 10, 12, 99],
        "entity_id": [None, 7.0, None, None, None],  # 2 already set
        "dimensions": ['{"confidence": 0.99}', "{}", "{}", "{}", "{}"],
        "provenance": ["{}", "{}", "{}",
                       '{"entity_membership_backfill": [{"old": true}]}',
                       "{}"],
    })
    mem = pd.DataFrame({
        "entity_id": [5, 3, 8],  # MIN entity per object wins → 3 for #10
        "object_type": ["document", "document", "document"],
        "object_id": [10, 10, 12],
        "confidence": [0.6, 0.4, None],
        "evidence": ['{"why": "x"}', None, None],
        "membership_role": ["member", "owner", ""],
        "membership_type": ["auto", "auto", ""],
    })
    ods = ray.data.from_pandas(obs)
    updated, res = backfill_observation_entities(ods, mem, batch_size=2,
                                                 max_batches=5)
    # candidates: ids 1,3 (document:10) and 4 (document:12); orphan has no
    # membership; id 2 already has an entity
    assert res["scanned"] == 3 and res["updated"] == 3
    assert res["done"] is True
    assert res["next_observation_id"] == 4
    assert res["batches"] == 2
    assert str(res["affected_start"]).startswith("2026-01-01")
    assert str(res["affected_end"]).startswith("2026-01-04")
    u = updated.set_index("observation_id")
    # MIN(entity_id)=3 membership chosen, its role/type merged into dims —
    # but existing dimension keys are NOT overwritten
    assert u.loc[1, "entity_id"] == 3
    d1 = json.loads(u.loc[1, "dimensions"])
    assert d1["confidence"] == 0.99  # pre-existing value kept
    assert d1["membership_role"] == "owner"
    d3 = json.loads(u.loc[3, "dimensions"])
    assert d3["confidence"] == 0.4  # merged from the winning membership
    # provenance entry appended, existing list preserved
    p4 = json.loads(u.loc[4, "provenance"])["entity_membership_backfill"]
    assert p4[0] == {"old": True} and p4[1]["entity_id"] == 8
    assert "confidence" not in p4[1]  # NaN confidence not recorded

    # resume from the checkpoint: nothing left
    _updated2, res2 = backfill_observation_entities(
        ods, mem, after_observation_id=res["next_observation_id"])
    assert res2["scanned"] == 0 and res2["done"] is True

    # clamps (the reference bounds)
    _u3, res3 = backfill_observation_entities(ods, mem, batch_size=-5,
                                              max_batches=0)
    assert res3["batches"] == 1 and res3["scanned"] == 3


@pytest.mark.usefixtures("ray_session")
def test_backfill_join_path_equals_broadcast_path():
    """Above join_threshold the membership side must stay distributed
    (groupby MIN-reduce + native Dataset.join) — same rows and counters
    as the broadcast path, with no driver materialization of memberships."""
    import numpy as np
    import ray.data

    rng = np.random.default_rng(11)
    n = 400
    obs = pd.DataFrame({
        "observation_id": np.arange(1, n + 1),
        "observed_at": pd.to_datetime("2026-02-01")
        + pd.to_timedelta(np.arange(n), unit="h"),
        "object_type": ["user"] * n,
        "object_id": rng.integers(0, 60, n),
        "entity_id": [7.0 if i % 9 == 0 else None for i in range(n)],
        "dimensions": ['{"confidence": 0.5}' if i % 13 == 0 else "{}"
                       for i in range(n)],
        "provenance": ["{}"] * n,
    })
    users = np.arange(0, 60)
    users = users[users % 4 != 0]  # some objects have no membership
    mem = pd.DataFrame({
        "entity_id": np.concatenate([100 + users % 7, 500 + users]),
        "object_type": "user",
        "object_id": np.concatenate([users, users]),
        "confidence": np.concatenate([users % 3 / 3.0, users % 3 / 3.0]),
        "evidence": None,
        "membership_role": "member",
        "membership_type": "auto",
    })
    ods = ray.data.from_pandas(obs)
    u_b, res_b = backfill_observation_entities(
        ods, mem, batch_size=100, max_batches=5, join_threshold=10**9)
    u_j, res_j = backfill_observation_entities(
        ods, ray.data.from_pandas(mem), batch_size=100, max_batches=5,
        join_threshold=0)
    assert res_b == res_j
    pd.testing.assert_frame_equal(
        u_b.reset_index(drop=True), u_j.reset_index(drop=True))
    assert len(u_b) > 0
