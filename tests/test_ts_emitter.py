"""Time-series emitter (reference pkg/timeseries/emitter.go +
indexed_artifact.go + database/time_series_hash.go) — ports of the
reference's emitter_test.go cases: value-type parsing, scope/dimension/
privacy/change tracking, dedupe + failure policies, selector mismatch,
keyword generic/exact/rule emission, bucket bounds."""

import json
from datetime import datetime, timedelta, timezone

import pytest

from thecrowler_ray.ts_emitter import (
    Emitter,
    IndexedArtifactInput,
    InMemoryRepository,
    Metric,
    ObjectAttributeInput,
    bucket_bounds,
    lookup_path,
    parse_go_duration,
    parse_value,
)

NOW = datetime(2026, 6, 6, 12, 0, 0, tzinfo=timezone.utc)


def test_value_types():
    # emitter_test.go:61-88
    assert parse_value("count", "ignored") == {"integer": 1}
    assert parse_value("integer", "42") == {"integer": 42}
    assert parse_value("decimal", "4.25") == {"numeric": 4.25}
    assert parse_value("boolean", "true") == {"boolean": True}
    assert parse_value("string", "hello") == {"text": "hello"}
    assert json.loads(parse_value("json", '{"b":2,"a":1}')["json"]) == \
        {"a": 1, "b": 2}
    assert parse_value("duration", "1500ms") == {"numeric": 1.5}
    ts = parse_value("timestamp", "2026-06-06T12:30:00Z")["timestamp"]
    assert ts.year == 2026
    assert parse_go_duration("1h30m") == 5400.0
    assert parse_value("duration", "2.5") == {"numeric": 2.5}  # float fallback


def test_scopes_dimensions_privacy_and_change():
    # emitter_test.go:90-133
    metric = Metric(
        id=9, key="latency", source_kind="object_attribute",
        object_type="webobject", value_type="duration", bucket="1h",
        dedupe_scope="object", failure_policy="log_skip",
        selector={"attribute_key": "latency", "path": "value",
                  "transformations": ["trim"]},
        dimensions=[
            {"key": "region", "selector": {"path": "region"}},
            {"key": "status", "selector": {"from": "sibling",
                                           "attribute_key": "status"}},
            {"key": "kind", "selector": {"from": "metric",
                                         "path": "object_type"}},
            {"key": "fixed", "selector": {"constant": "secret-123"}},
        ])
    repo = InMemoryRepository([metric])
    scope = {"source_id": 3, "information_seed_id": 4,
             "source_information_seed_id": 5, "index_id": 6,
             "object_type": "webobject", "object_id": 7, "entity_id": 8}
    emitter = Emitter(
        repo, scopes=lambda inp: [dict(scope)],
        privacy={"store_value_text": True, "max_value_length": 2048,
                 "redact_patterns": [r"secret-[0-9]+"]},
        cardinality={"max_dimensions": 10},
        now=lambda: NOW)
    inp = ObjectAttributeInput(
        object_type="webobject", object_id=7, attribute_key="latency",
        raw_value='{"value":"1500ms"}', normalized_value='{"value":"1500ms"}',
        object_details={"region": "west"},
        sibling_attributes={"status": "ok"}, observed_at=NOW)
    emitter.emit_object_attribute(inp)
    assert len(repo.observations) == 1
    first = repo.observations[0]
    assert first["value"]["numeric"] == 1.5
    assert first["scope"]["source_id"] == 3 and first["scope"]["entity_id"] == 8
    assert first["dimensions"] == {"fixed": "[REDACTED]", "region": "west",
                                   "status": "ok", "kind": "webobject"}
    assert first["change_type"] == "new" and first["is_changed"]
    assert first["bucket_start"] == NOW and \
        first["bucket_end"] == NOW + timedelta(hours=1)

    inp.observed_at = NOW + timedelta(hours=1)
    emitter.emit_object_attribute(inp)
    second = repo.observations[1]
    assert second["change_type"] == "unchanged" and not second["is_changed"]
    assert second["previous_value_hash"]

    inp.raw_value = inp.normalized_value = '{"value":"2s"}'
    inp.observed_at = NOW + timedelta(hours=2)
    emitter.emit_object_attribute(inp)
    third = repo.observations[2]
    assert third["change_type"] == "changed" and third["is_changed"]
    assert third["change_delta_numeric"] == pytest.approx(0.5)


def test_direct_source_dedupe_and_policies():
    # emitter_test.go:135-167
    metric = Metric(
        id=1, key="name", source_kind="object_attribute",
        object_type="webobject", value_type="string", bucket="none",
        dedupe_scope="object", selector={"attribute_key": "name"},
        hash_only=True)
    repo = InMemoryRepository([metric])
    logged = []
    emitter = Emitter(
        repo, scopes=lambda inp: [{"source_id": 2, "index_id": 3,
                                   "object_type": "webobject",
                                   "object_id": 4}],
        privacy={"max_value_length": 100},
        cardinality={"max_dimensions": 2},
        now=lambda: NOW, logger=logged.append)
    inp = ObjectAttributeInput(object_type="webobject", object_id=4,
                               attribute_key="name", raw_value="Alice",
                               normalized_value="Alice", observed_at=NOW)
    emitter.emit_object_attribute(inp)
    emitter.emit_object_attribute(inp)
    assert len(repo.observations) == 1  # dedupe-key uniqueness
    obs = repo.observations[0]
    assert obs["value"] == {} and obs["value_hash"]  # hash-only drops value

    # default policy (log_skip) survives a repository failure
    repo.insert_observation = lambda o: (_ for _ in ()).throw(
        RuntimeError("write failed"))
    emitter.emit_object_attribute(ObjectAttributeInput(
        object_type="webobject", object_id=4, attribute_key="name",
        raw_value="Bob", normalized_value="Bob",
        observed_at=NOW + timedelta(hours=1)))
    assert logged  # safe failure logged

    # fail_indexing propagates
    metric.failure_policy = "fail_indexing"
    with pytest.raises(RuntimeError, match="write failed"):
        emitter.emit_object_attribute(ObjectAttributeInput(
            object_type="webobject", object_id=4, attribute_key="name",
            raw_value="Carol", normalized_value="Carol",
            observed_at=NOW + timedelta(hours=2)))


def test_selector_mismatch_does_not_emit():
    # emitter_test.go:169-186
    metric = Metric(id=1, key="x", source_kind="object_attribute",
                    object_type="webobject", value_type="integer",
                    selector={"attribute_key": "other"})
    repo = InMemoryRepository([metric])
    Emitter(repo, now=lambda: NOW).emit_object_attribute(
        ObjectAttributeInput(object_type="webobject", object_id=1,
                             attribute_key="value", normalized_value="1"))
    assert repo.observations == []


def test_keyword_generic_exact_and_rule():
    # emitter_test.go:189-228
    metrics = [
        Metric(id=1, key="all_keywords", source_kind="keyword",
               value_type="count", dedupe_scope="object", selector={}),
        Metric(id=2, key="exact_keyword", source_kind="keyword",
               value_type="integer", dedupe_scope="object",
               selector={"keyword": "crowler"}),
        Metric(id=3, key="rule_keyword", source_kind="keyword",
               value_type="integer", dedupe_scope="object",
               selector={"rule": {"prefix": "crow"}}),
    ]
    repo = InMemoryRepository(metrics)
    scope = {"source_id": 3, "information_seed_id": 4,
             "source_information_seed_id": 5, "index_id": 6, "entity_id": 7}
    emitter = Emitter(repo, artifact_scopes=lambda inp: [dict(scope)],
                      cardinality={"max_dimensions": 10}, now=lambda: NOW)
    emitter.emit_indexed_artifact(IndexedArtifactInput(
        source_kind="keyword", index_id=6, row_id=11, link_id=12,
        subject_key="crowler", value=9, occurrences=9,
        observed_at=NOW + timedelta(hours=2)))
    assert len(repo.observations) == 3  # generic + exact + rule
    for obs in repo.observations:
        assert obs["value"]["integer"] == 9  # stored occurrences emitted
        assert obs["scope"]["subject_type"] == "keyword"
        assert obs["scope"]["subject_id"] == 11
        assert obs["scope"]["subject_text"] == "crowler"
        assert obs["scope"]["source_id"] == 3 and obs["scope"]["entity_id"] == 7
        p = obs["provenance"]
        assert p["normalized_keyword"] == "crowler"
        assert p["parser"] and p["keyword_index_id"] == 12

    # non-matching keyword only hits the generic metric
    emitter.emit_indexed_artifact(IndexedArtifactInput(
        source_kind="keyword", index_id=6, row_id=13, link_id=14,
        subject_key="other", value=2, occurrences=2,
        observed_at=NOW + timedelta(hours=3)))
    assert len(repo.observations) == 4


def test_bucket_bounds():
    # time_series_hash.go:216-250 incl. Monday-start weeks + calendar months
    at = datetime(2026, 6, 6, 14, 37, 42, tzinfo=timezone.utc)  # a Saturday
    assert bucket_bounds(at, "1m")[0] == at.replace(second=0)
    s5, e5 = bucket_bounds(at, "5m")
    assert s5.minute == 35 and (e5 - s5) == timedelta(minutes=5)
    s15, _ = bucket_bounds(at, "15m")
    assert s15.minute == 30
    sh, eh = bucket_bounds(at, "1h")
    assert sh.minute == 0 and eh - sh == timedelta(hours=1)
    sd, _ = bucket_bounds(at, "1d")
    assert sd.hour == 0
    sw, ew = bucket_bounds(at, "1w")
    assert sw.weekday() == 0 and sw == datetime(2026, 6, 1,
                                                tzinfo=timezone.utc)
    sm, em = bucket_bounds(at, "1mo")
    assert sm == datetime(2026, 6, 1, tzinfo=timezone.utc)
    assert em == datetime(2026, 7, 1, tzinfo=timezone.utc)
    sn, en = bucket_bounds(at, "none")
    assert sn == en == at
    with pytest.raises(ValueError):
        bucket_bounds(at, "2h")


def test_lookup_path_wildcards_and_fold():
    root = {"Items": [{"v": 1}, {"v": 2}, {"w": 3}], "Meta": {"Region": "eu"}}
    assert lookup_path(root, "items[*].v") == ([1, 2], True)
    assert lookup_path(root, "items[1].v") == (2, True)
    assert lookup_path(root, "meta.region") == ("eu", True)  # case-folded
    assert lookup_path(root, "$.meta.region") == ("eu", True)
    assert lookup_path(root, "missing.x")[1] is False
