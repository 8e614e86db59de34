"""Time-series observation emitter (reference ``pkg/timeseries/emitter.go``,
``indexed_artifact.go`` + ``pkg/database/time_series_hash.go``).

From-scratch reimplementation of the emission semantics (no code reuse):

- ``parse_value``            — emitter.go:370-430 (count/integer/decimal/
                               duration with Go-style "1500ms" parsing/
                               boolean/string/json/timestamp)
- ``lookup_path``            — emitter.go:593-690 (dotted path, ``[*]``
                               wildcards, ``[i]`` indices, case-folded map
                               keys)
- ``apply_transformations``  — emitter.go:695-755 (trim/lowercase/uppercase/
                               length/first/sha256/milliseconds_to_seconds)
- hashes                     — time_series_hash.go:52-110 (length-framed
                               sha256 over "len:part|" segments; subject /
                               dimension / value / provenance hashes)
- ``bucket_bounds``          — time_series_hash.go:216-250 (1m/5m/15m/1h/1d/
                               1w Monday-start/1mo calendar/none)
- ``dedupe_key``             — time_series_hash.go:175-200 (none requires a
                               nonce; source takes ownership prefix; object
                               takes the full scope; global none)
- ``prepare_observation``    — time_series_hash.go:252-305 (max-dimensions
                               reject, redact patterns, rune truncation,
                               hash-only / store-value-text)
- ``apply_change``           — emitter.go:479-508 (new / unchanged / changed
                               / reappeared + numeric delta)
- ``Emitter.emit_object_attribute``  — emitter.go:73-208
- ``Emitter.emit_indexed_artifact``  — indexed_artifact.go:52-225 (keyword /
                               metatag subject matching: exact, rule, regex
                               with the (?i) default; count parse rules;
                               keyword/metatag provenance fields)

Known deviation: canonical JSON uses Python ``json.dumps(sort_keys=True)``
which does not HTML-escape ``<>&`` the way Go's ``json.Marshal`` does; hash
values differ from the reference for payloads containing those characters.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

__all__ = [
    "Metric", "ObjectAttributeInput", "IndexedArtifactInput",
    "InMemoryRepository", "Emitter",
    "parse_value", "parse_go_duration", "parse_timestamp", "lookup_path",
    "apply_transformations", "bucket_bounds", "dedupe_key",
    "prepare_observation", "apply_change",
    "normalize_subject", "canonical_json", "ts_sha256",
    "subject_hash", "dimension_hash", "value_hash", "provenance_hash",
]


# -- canonicalization + hashes ------------------------------------------------

def normalize_subject(subject: str) -> str:
    """NormalizeTimeSeriesSubject: trim, collapse unicode whitespace to one
    ASCII space, lowercase."""
    return " ".join(subject.split()).lower()


def canonical_json(value) -> str:
    if isinstance(value, (bytes, bytearray)):
        value = json.loads(value.decode("utf-8")) if value else None
    return json.dumps(value, sort_keys=True, separators=(",", ":"),
                      ensure_ascii=False)


def ts_sha256(*parts: str) -> str:
    """timeSeriesSHA256: length-framed "len:part|" segments."""
    h = hashlib.sha256()
    for part in parts:
        h.update(f"{len(part)}:{part}|".encode("utf-8"))
    return h.hexdigest()


def _opt_str(value: str) -> str:
    return "present:" + value if value else "absent"


def _opt_num(value) -> str:
    return "absent" if value is None else f"present:{int(value)}"


def _opt_time(value) -> str:
    if value is None:
        return "absent"
    return "present:" + _rfc3339(value)


def _rfc3339(dt: datetime) -> str:
    dt = dt.astimezone(timezone.utc)
    if dt.microsecond:
        return dt.strftime("%Y-%m-%dT%H:%M:%S.%f").rstrip("0") + "Z"
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def subject_hash(subject: str) -> str:
    return ts_sha256("subject", _opt_str(normalize_subject(subject)))


def dimension_hash(dimensions) -> str:
    if dimensions is None:
        return ts_sha256("dimensions", "absent")
    return ts_sha256("dimensions", "present:" + canonical_json(dimensions))


def _go_float(v: float) -> str:
    """Go %g formatting for the value-hash representation."""
    s = repr(float(v))
    if s.endswith(".0"):
        s = s[:-2]
    return s


def value_hash(value_type: str, value: dict) -> str:
    if value_type in ("integer", "count"):
        rep = _opt_num(value.get("integer"))
    elif value_type in ("decimal", "duration"):
        n = value.get("numeric")
        rep = "absent" if n is None else "present:" + _go_float(n)
    elif value_type == "boolean":
        b = value.get("boolean")
        rep = "absent" if b is None else f"present:{str(bool(b)).lower()}"
    elif value_type == "string":
        t = value.get("text")
        rep = "absent" if t is None else "present:" + t
    elif value_type == "json":
        j = value.get("json")
        rep = "absent" if not j else "present:" + canonical_json(
            json.loads(j) if isinstance(j, str) else j)
    elif value_type == "timestamp":
        ts = value.get("timestamp")
        if ts is None:
            raise ValueError(f"unsupported time-series value type {value_type}")
        rep = "present:" + _rfc3339(ts)
    else:
        raise ValueError(f"unsupported time-series value type {value_type}")
    return ts_sha256("value", value_type, rep)


def provenance_hash(provenance) -> str:
    if not provenance:
        return ts_sha256("provenance", "absent")
    return ts_sha256("provenance", "present:" + canonical_json(provenance))


# -- value parsing -------------------------------------------------------------

_GO_DUR_RE = re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)")
_GO_DUR_UNITS = {"ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3,
                 "s": 1.0, "m": 60.0, "h": 3600.0}


def parse_go_duration(text: str) -> float:
    """Go time.ParseDuration subset → seconds ("1500ms" → 1.5, "1h30m")."""
    t = text.strip()
    neg = t.startswith("-")
    t = t.lstrip("+-")
    pos = 0
    total = 0.0
    for m in _GO_DUR_RE.finditer(t):
        if m.start() != pos:
            raise ValueError(f"invalid duration {text!r}")
        total += float(m.group(1)) * _GO_DUR_UNITS[m.group(2)]
        pos = m.end()
    if pos != len(t) or pos == 0:
        raise ValueError(f"invalid duration {text!r}")
    return -total if neg else total


def parse_timestamp(value) -> datetime:
    """emitter.go:578-592: RFC3339(.nano) / "Y-m-d H:M:S[±tz]" / unix
    seconds-or-millis."""
    text = str(value).strip()
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f%z", "%Y-%m-%dT%H:%M:%S%z",
                "%Y-%m-%d %H:%M:%S%z", "%Y-%m-%d %H:%M:%S"):
        try:
            parsed = datetime.strptime(text.replace("Z", "+00:00")
                                       if "Z" in text else text, fmt)
            if parsed.tzinfo is None:
                parsed = parsed.replace(tzinfo=timezone.utc)
            return parsed.astimezone(timezone.utc)
        except ValueError:
            continue
    try:
        unix = int(text)
    except ValueError:
        raise ValueError(f"parse timestamp {text!r}") from None
    if unix > 9_999_999_999:
        unix //= 1000
    return datetime.fromtimestamp(unix, tz=timezone.utc)


def parse_value(value_type: str, value) -> dict:
    """emitter.go parseValue: → {"integer"|"numeric"|"boolean"|"text"|
    "json"|"timestamp": ...}."""
    text = str(value).strip()
    if value_type == "count":
        return {"integer": 1}
    if value_type == "integer":
        return {"integer": int(text)}
    if value_type in ("decimal", "duration"):
        if value_type == "duration":
            try:
                return {"numeric": parse_go_duration(text)}
            except ValueError:
                pass
        return {"numeric": float(text)}
    if value_type == "boolean":
        low = text.lower()
        if low in ("1", "t", "true"):
            return {"boolean": True}
        if low in ("0", "f", "false"):
            return {"boolean": False}
        raise ValueError(f"parse boolean {text!r}")
    if value_type == "string":
        return {"text": str(value)}
    if value_type == "json":
        if isinstance(value, str):
            json.loads(value)  # must be valid
            return {"json": value}
        return {"json": canonical_json(value)}
    if value_type == "timestamp":
        return {"timestamp": parse_timestamp(value)}
    raise ValueError(f"unsupported value type {value_type!r}")


def parse_indexed_artifact_value(value_type: str, value) -> dict:
    """indexed_artifact.go:227-243: count over artifacts = len() of
    collections/strings, pass-through integers, else 1."""
    if value_type != "count":
        return parse_value(value_type, value)
    if value is None:
        return parse_value("integer", 0)
    if isinstance(value, (list, tuple, dict, str)):
        return parse_value("integer", len(value))
    try:
        return parse_value("integer", int(str(value).strip()))
    except ValueError:
        return parse_value("integer", 1)


# -- path lookup + transformations ---------------------------------------------

def _map_fold(d: dict, key: str):
    if key in d:
        return d[key], True
    for k, v in d.items():
        if k.lower() == key.lower():
            return v, True
    return None, False


def _parse_part(part: str):
    if part in ("[*]", "*"):
        return "", True, 0, False
    open_ = part.find("[")
    if open_ < 0 or not part.endswith("]"):
        return "", False, 0, False
    key = part[:open_]
    inside = part[open_ + 1:-1]
    if inside == "*":
        return key, True, 0, False
    try:
        return key, False, int(inside), True
    except ValueError:
        return key, False, 0, False


def lookup_path(root, path: str):
    parts = path.removeprefix("$").removeprefix(".").split(".")
    return _lookup_parts(root, parts)


def _lookup_parts(current, parts):
    if not parts:
        return current, True
    part = parts[0]
    if part == "":
        return _lookup_parts(current, parts[1:])
    key, wildcard, index, has_index = _parse_part(part)
    if key:
        if not isinstance(current, dict):
            return None, False
        current, ok = _map_fold(current, key)
        if not ok:
            return None, False
    if wildcard:
        if not isinstance(current, list):
            return None, False
        selected = []
        for v in current:
            resolved, matched = _lookup_parts(v, parts[1:])
            if not matched:
                continue
            if isinstance(resolved, list):
                selected.extend(resolved)
            else:
                selected.append(resolved)
        return selected, True
    if has_index:
        if not isinstance(current, list) or not (0 <= index < len(current)):
            return None, False
        current = current[index]
    elif not key:
        if isinstance(current, dict):
            current, ok = _map_fold(current, part)
            if not ok:
                return None, False
        elif isinstance(current, list):
            try:
                i = int(part)
            except ValueError:
                return None, False
            if not (0 <= i < len(current)):
                return None, False
            current = current[i]
        else:
            return None, False
    return _lookup_parts(current, parts[1:])


def apply_transformations(value, transformations):
    result = value
    for t in transformations or ():
        t = t.strip().lower()
        if t in ("", "identity"):
            continue
        if t == "trim":
            result = str(result).strip()
        elif t == "lowercase":
            result = str(result).lower()
        elif t == "uppercase":
            result = str(result).upper()
        elif t in ("length", "count"):
            result = len(result) if isinstance(result, (list, dict)) \
                else len(str(result))
        elif t == "first":
            if isinstance(result, list):
                if not result:
                    return None
                result = result[0]
        elif t in ("sha256", "hash"):
            result = ts_sha256(
                "subject", _opt_str(normalize_subject(canonical_json(result))))
        elif t == "milliseconds_to_seconds":
            result = float(str(result)) / 1000
        else:
            raise ValueError(f"unsupported transformation {t!r}")
    return result


# -- buckets, dedupe, preparation, change --------------------------------------

def bucket_bounds(at: datetime, bucket: str) -> tuple[datetime, datetime]:
    at = at.astimezone(timezone.utc)
    if bucket == "1m":
        start = at.replace(second=0, microsecond=0)
        return start, start + timedelta(minutes=1)
    if bucket in ("5m", "15m"):
        n = int(bucket[:-1])
        start = at.replace(minute=(at.minute // n) * n, second=0,
                           microsecond=0)
        return start, start + timedelta(minutes=n)
    if bucket == "1h":
        start = at.replace(minute=0, second=0, microsecond=0)
        return start, start + timedelta(hours=1)
    if bucket == "1d":
        start = at.replace(hour=0, minute=0, second=0, microsecond=0)
        return start, start + timedelta(days=1)
    if bucket == "1w":  # Monday 00:00 UTC
        day = at.replace(hour=0, minute=0, second=0, microsecond=0)
        start = day - timedelta(days=day.weekday())
        return start, start + timedelta(days=7)
    if bucket in ("1mo", "month"):
        start = at.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        nxt = (start.replace(year=start.year + 1, month=1) if start.month == 12
               else start.replace(month=start.month + 1))
        return start, nxt
    if bucket == "none":
        return at, at
    raise ValueError(f"unsupported time-series bucket {bucket!r}")


_SCOPE_FIELDS = [
    ("seed", "information_seed_id", _opt_num),
    ("candidate", "information_seed_candidate_id", _opt_num),
    ("source", "source_id", _opt_num),
    ("source_seed", "source_information_seed_id", _opt_num),
    ("index", "index_id", _opt_num),
    ("entity", "entity_id", _opt_num),
    ("subject_type", "subject_type", _opt_str),
    ("subject_id", "subject_id", _opt_num),
    ("object_type", "object_type", _opt_str),
    ("object_id", "object_id", _opt_num),
    ("rule", "correlation_rule_id", _opt_num),
    ("correlation_type_1", "correlation_object_type_1", _opt_str),
    ("correlation_id_1", "correlation_object_id_1", _opt_num),
    ("correlation_type_2", "correlation_object_type_2", _opt_str),
    ("correlation_id_2", "correlation_object_id_2", _opt_num),
]


def _scope_parts(scope: dict) -> list[str]:
    return [f"{label}={conv(scope.get(key))}"
            for label, key, conv in _SCOPE_FIELDS]


def dedupe_key(scope_kind: str, metric_id: int, observation: dict,
               nonce: str = "") -> str:
    parts = [
        "dedupe_scope=" + scope_kind,
        f"metric={metric_id}",
        "observed_at=" + _rfc3339(observation["observed_at"]),
        "effective_at=" + _opt_time(observation.get("effective_at")),
        "value_hash=" + observation["value_hash"],
        "dimension_hash=" + dimension_hash(observation.get("dimensions")),
    ]
    scope_parts = _scope_parts(observation.get("scope", {}))
    if scope_kind == "none":
        if not nonce:
            raise ValueError("dedupe scope 'none' requires a nonce")
        parts.append("nonce=" + nonce)
    elif scope_kind == "source":
        parts.extend(scope_parts[0:5])
    elif scope_kind == "object":
        parts.extend(scope_parts)
    elif scope_kind == "global":
        pass
    else:
        raise ValueError(f"unsupported dedupe scope {scope_kind!r}")
    return ts_sha256(*parts)


def prepare_observation(observation: dict, value_type: str,
                        policy: dict) -> dict:
    """→ {"observation", "redacted", "truncated", "hashed_only"}."""
    result = {"observation": observation, "redacted": False,
              "truncated": False, "hashed_only": False}
    dims = observation.get("dimensions") or {}
    max_dims = policy.get("max_dimensions", 0)
    if max_dims and len(dims) > max_dims:
        raise ValueError(
            f"value rejected: dimensions {len(dims)} exceed limit {max_dims}")
    value = dict(observation.get("value", {}))
    if value.get("text") is not None:
        text = value["text"]
        for pattern in policy.get("redact_patterns", ()) or ():
            replaced = re.sub(pattern, "[REDACTED]", text)
            if replaced != text:
                result["redacted"] = True
                text = replaced
        max_len = policy.get("max_value_length", 0)
        if max_len and len(text) > max_len:
            text = text[:max_len]
            result["truncated"] = True
        value["text"] = text
    observation["value"] = value
    observation["value_hash"] = value_hash(value_type, value)
    if policy.get("hash_only"):
        observation["value"] = {}
        result["hashed_only"] = True
    elif not policy.get("store_value_text"):
        observation["value"].pop("text", None)
    return result


def apply_change(observation: dict, previous: dict | None,
                 at: datetime) -> None:
    if previous is None:
        observation["is_changed"] = True
        observation["change_type"] = "new"
        observation["change_detected_at"] = at
        return
    observation["previous_value_hash"] = previous["value_hash"]
    observation["is_changed"] = previous["value_hash"] != observation["value_hash"]
    if previous.get("deleted_at") is not None:
        observation["change_type"] = "reappeared"
        observation["is_changed"] = True
    elif observation["is_changed"]:
        observation["change_type"] = "changed"
    else:
        observation["change_type"] = "unchanged"
    if observation["is_changed"]:
        observation["change_detected_at"] = at
    pn = previous.get("value", {}).get("numeric")
    on = observation.get("value", {}).get("numeric")
    if pn is not None and on is not None:
        observation["change_delta_numeric"] = on - pn


# -- metric + inputs + repository -----------------------------------------------

@dataclass
class Metric:
    id: int
    key: str
    source_kind: str            # object_attribute | keyword | metatag | ...
    value_type: str             # count|integer|decimal|duration|boolean|...
    object_type: str = ""
    bucket: str = "none"
    time_basis: str = "observed_at"
    dedupe_scope: str = "object"
    failure_policy: str = ""
    selector: dict = field(default_factory=dict)
    dimensions: list = field(default_factory=list)
    enabled: bool = True
    hash_only: bool = False
    store_value_text: bool = False


@dataclass
class ObjectAttributeInput:
    object_type: str = ""
    object_id: int = 0
    attribute_key: str = ""
    raw_value: str = ""
    normalized_value: str = ""
    attribute_type: str = ""
    selector_path: str = ""
    transformations: list = field(default_factory=list)
    object_details: dict = field(default_factory=dict)
    sibling_attributes: dict = field(default_factory=dict)
    observed_at: datetime | None = None
    source_updated_at: datetime | None = None


@dataclass
class IndexedArtifactInput:
    source_kind: str = ""
    index_id: int = 0
    row_id: int = 0
    link_id: int = 0
    subject_key: str = ""
    name: str = ""
    raw_value: str = ""
    value: object = None
    occurrences: int = 0
    attributes: dict = field(default_factory=dict)
    observed_at: datetime | None = None
    source_updated_at: datetime | None = None
    object_type: str = ""
    object_id: int = 0


class InMemoryRepository:
    """Minimal Task-3 persistence contract: metric registry + observation
    store with dedupe-key uniqueness + previous-observation lookup."""

    def __init__(self, metrics: list[Metric] | None = None):
        self.metrics = list(metrics or [])
        self.observations: list[dict] = []
        self._dedupe: set[str] = set()
        # (metric_id, canonical scope, dimension hash) → insertion-ordered
        # candidates; turns previous_observation from an O(total) scan per
        # emit (quadratic per batch) into an O(per-key) probe
        self._prev_index: dict[tuple, list[dict]] = {}

    def list_metrics(self, source_kind: str) -> list[Metric]:
        return [m for m in self.metrics
                if m.source_kind == source_kind and m.enabled]

    @staticmethod
    def _prev_key(metric_id: int, scope: dict, dimensions) -> tuple:
        return (metric_id, canonical_json(scope or {}),
                dimension_hash(dimensions))

    def previous_observation(self, metric_id: int, scope: dict,
                             dimensions, before: datetime) -> dict | None:
        best = None
        candidates = self._prev_index.get(
            self._prev_key(metric_id, scope, dimensions), ())
        for o in candidates:
            if o["scope"] != scope:  # exact-equality guard (index is json)
                continue
            if o["observed_at"] >= before:
                continue
            # strict '>' keeps the earliest-inserted winner on ties, the
            # same answer the original full scan produced
            if best is None or o["observed_at"] > best["observed_at"]:
                best = o
        return best

    def insert_observation(self, observation: dict) -> bool:
        key = observation.get("dedupe_key", "")
        if key and key in self._dedupe:
            return False
        self._dedupe.add(key)
        self.observations.append(observation)
        self._prev_index.setdefault(
            self._prev_key(observation["metric_id"],
                           observation.get("scope") or {},
                           observation.get("dimensions")),
            [],
        ).append(observation)
        return True


# -- the emitter -----------------------------------------------------------------

def _select_metric_value(inp: ObjectAttributeInput, selector: dict):
    """emitter.go:299-336 selectMetricValue → (value, path, transforms,
    matched)."""
    value = inp.normalized_value
    path = str(selector.get("path") or "")
    if path:
        decoded = json.loads(inp.raw_value)
        value, ok = lookup_path(decoded, path)
        if not ok:
            return None, path, [], False
    if "equals" in selector and str(value) != str(selector["equals"]):
        return None, path, [], False
    expression = str(selector.get("regex") or "")
    if expression:
        m = re.search(expression, str(value))
        if m is None:
            return None, path, [], False
        if m.groups():
            value = m.group(1)
    transformations = list(selector.get("transformations") or [])
    if selector.get("transform"):
        transformations.append(str(selector["transform"]))
    value = apply_transformations(value, transformations)
    return value, path, transformations, True


def _resolve_selector(selector: dict, inp: ObjectAttributeInput, selected):
    """emitter.go:338-368 resolveSelector → (value, ok)."""
    if "constant" in selector:
        return selector["constant"], True
    from_ = str(selector.get("from") or "")
    path = str(selector.get("path") or "")
    if from_ == "value":
        root = selected
    elif from_ == "metric":
        root = {"attribute_key": inp.attribute_key,
                "object_type": inp.object_type,
                "attribute_type": inp.attribute_type}
    elif from_ in ("sibling", "sibling_attribute"):
        root = inp.sibling_attributes.get(str(selector.get("attribute_key", "")))
    else:
        key = str(selector.get("attribute_key") or "")
        root = inp.sibling_attributes.get(key) if key else inp.object_details
    if root is None:
        return None, False
    if path:
        return lookup_path(root, path)
    return root, True


def _redact(dimensions: dict, patterns) -> dict:
    if not dimensions or not patterns:
        return dimensions
    compiled = [re.compile(p) for p in patterns]

    def red(v):
        if isinstance(v, str):
            for rx in compiled:
                v = rx.sub("[REDACTED]", v)
            return v
        if isinstance(v, list):
            return [red(x) for x in v]
        if isinstance(v, dict):
            return {k: red(x) for k, x in v.items()}
        return v

    return {k: red(v) for k, v in dimensions.items()}


def _artifact_text_equal(a: str, b: str) -> bool:
    return normalize_subject(a) == normalize_subject(b)


def _match_artifact_rule(value: str, rule: dict) -> bool:
    v = normalize_subject(value)
    if "prefix" in rule and not v.startswith(normalize_subject(str(rule["prefix"]))):
        return False
    if "suffix" in rule and not v.endswith(normalize_subject(str(rule["suffix"]))):
        return False
    if "contains" in rule and normalize_subject(str(rule["contains"])) not in v:
        return False
    return True


class Emitter:
    """Evaluates configured metrics and persists prepared observations
    (emitter.go Emitter; scope resolution is injected like the reference's
    ScopeResolver / IndexedArtifactScopeResolver)."""

    def __init__(self, repository: InMemoryRepository,
                 scopes=None, artifact_scopes=None, enabled: bool = True,
                 failure_policy: str = "log_skip",
                 privacy: dict | None = None,
                 cardinality: dict | None = None,
                 now=None, logger=None):
        self.repository = repository
        self.scopes = scopes or (lambda inp: [])
        self.artifact_scopes = artifact_scopes or (lambda inp: [])
        self.enabled = enabled
        self.failure_policy = failure_policy
        self.privacy = privacy or {}
        self.cardinality = cardinality or {}
        self.now = now or (lambda: datetime.now(timezone.utc))
        self.logger = logger
        self.failures: list[str] = []

    def _policy(self, metric: Metric) -> dict:
        return {
            "max_dimensions": self.cardinality.get("max_dimensions", 0),
            "max_value_length": self.privacy.get("max_value_length", 0),
            "redact_patterns": self.privacy.get("redact_patterns", []),
            "hash_only": metric.hash_only or self.privacy.get("hash_only",
                                                              False),
            "store_value_text": metric.store_value_text
            or self.privacy.get("store_value_text", False),
        }

    def _fail(self, policy: str, context: str, err: Exception):
        policy = policy or self.failure_policy
        if policy == "fail_indexing":
            raise RuntimeError(f"{context}: {err}") from err
        if policy == "skip":
            return
        self.failures.append(f"{context}: {err}")
        if self.logger:
            self.logger(f"time-series {context}: {err}")

    # -- object attributes ---------------------------------------------------

    def emit_object_attribute(self, inp: ObjectAttributeInput) -> None:
        if not self.enabled:
            return
        for metric in self.repository.list_metrics("object_attribute"):
            try:
                self._emit_metric(metric, inp)
            except Exception as e:  # per-metric safe failure
                self._fail(metric.failure_policy, f"emit metric {metric.key!r}",
                           e)

    def _emit_metric(self, metric: Metric, inp: ObjectAttributeInput) -> None:
        selector = metric.selector or {}
        if metric.object_type != inp.object_type or \
                str(selector.get("attribute_key", "")) != inp.attribute_key:
            return
        selected, path, transformations, matched = _select_metric_value(
            inp, selector)
        if not matched:
            return
        value = parse_value(metric.value_type, selected)
        scopes = self.scopes(inp) or [
            {"object_type": inp.object_type, "object_id": inp.object_id}]
        dimensions = self._dimensions(metric, inp, selected)
        dimensions = _redact(dimensions,
                             self._policy(metric)["redact_patterns"])
        observed_at = (inp.observed_at or self.now()).astimezone(timezone.utc)
        bstart, bend = bucket_bounds(observed_at, metric.bucket)
        for scope in scopes:
            provenance = {"source_kind": "object_attribute",
                          "attribute_key": inp.attribute_key,
                          "object_type": inp.object_type,
                          "object_id": inp.object_id}
            if scope.get("source_id") is not None:
                provenance["source_id"] = scope["source_id"]
            sel_path = path or inp.selector_path
            if sel_path:
                provenance["selector_path"] = sel_path
            all_tf = list(inp.transformations) + list(transformations)
            if all_tf:
                provenance["transformations"] = all_tf
            nonce = ""
            if metric.dedupe_scope == "none":
                nonce = (f"{inp.object_type}:{inp.object_id}:"
                         f"{inp.attribute_key}:{_rfc3339(observed_at)}")
            self._persist(metric, scope, value, dict(dimensions),
                          observed_at, bstart, bend, provenance, nonce)

    def _dimensions(self, metric: Metric, inp: ObjectAttributeInput,
                    selected) -> dict:
        result = {}
        for definition in metric.dimensions or []:
            value, ok = _resolve_selector(definition.get("selector", {}),
                                          inp, selected)
            if ok:
                result[definition["key"]] = value
        return result

    # -- indexed artifacts (keywords / metatags) -------------------------------

    def emit_indexed_artifact(self, inp: IndexedArtifactInput) -> None:
        if not self.enabled:
            return
        for metric in self.repository.list_metrics(inp.source_kind):
            try:
                self._emit_artifact_metric(metric, inp)
            except Exception as e:
                self._fail(metric.failure_policy, f"emit metric {metric.key!r}",
                           e)

    def _emit_artifact_metric(self, metric: Metric,
                              inp: IndexedArtifactInput) -> None:
        selector = metric.selector or {}
        selected, transformations, matched = \
            self._select_artifact_value(inp, selector)
        if not matched:
            return
        value = parse_indexed_artifact_value(metric.value_type, selected)
        scopes = self.artifact_scopes(inp) or [{"index_id": inp.index_id}]
        observed_at = (inp.observed_at or self.now()).astimezone(timezone.utc)
        bstart, bend = bucket_bounds(observed_at, metric.bucket)
        for base in scopes:
            scope = dict(base)
            scope["subject_type"] = inp.source_kind
            scope["subject_id"] = inp.row_id
            scope["subject_text"] = _subject_text(inp)
            if inp.object_type and inp.object_id:
                scope["object_type"] = inp.object_type
                scope["object_id"] = inp.object_id
            provenance = {
                "source_kind": inp.source_kind,
                "row_id": inp.row_id,
                "link_id": inp.link_id,
                "index_id": inp.index_id,
                "subject_key": _subject_text(inp),
                "parser": metric.value_type,
                "artifact_type": inp.source_kind,
                "source_row_id": inp.row_id,
            }
            if inp.source_kind == "keyword":
                provenance.update(keyword_id=inp.row_id,
                                  keyword_index_id=inp.link_id,
                                  normalized_keyword=inp.subject_key,
                                  occurrences=inp.occurrences)
            elif inp.source_kind == "metatag":
                provenance.update(metatag_id=inp.row_id,
                                  metatag_index_id=inp.link_id,
                                  normalized_name=inp.subject_key)
            if inp.object_type:
                provenance["object_type"] = inp.object_type
                provenance["object_id"] = inp.object_id
            if selector.get("path"):
                provenance["selector_path"] = str(selector["path"])
            if transformations:
                provenance["transformations"] = transformations
            nonce = ""
            if metric.dedupe_scope == "none":
                nonce = (f"{inp.source_kind}:{inp.row_id}:{inp.link_id}:"
                         f"{_rfc3339(observed_at)}")
            self._persist(metric, scope, value, {}, observed_at,
                          bstart, bend, provenance, nonce)

    def _select_artifact_value(self, inp: IndexedArtifactInput,
                               selector: dict):
        """indexed_artifact.go:244-330 for keyword/metatag subjects: exact
        (subject_key / keyword / metatag_name / name / equals), rule
        (prefix/suffix/contains), regex with a case-insensitive default."""
        if inp.source_kind not in ("keyword", "metatag"):
            value = inp.value
            transformations = list(selector.get("transformations") or [])
            if selector.get("transform"):
                transformations.append(str(selector["transform"]))
            value = apply_transformations(value, transformations)
            return value, transformations, True
        exact = str(selector.get("subject_key") or "")
        if not exact:
            exact = str(selector.get("keyword") or "") \
                if inp.source_kind == "keyword" else \
                (str(selector.get("metatag_name") or "")
                 or str(selector.get("name") or ""))
        if not exact:
            exact = str(selector.get("equals") or "")
        if exact and not _artifact_text_equal(inp.subject_key, exact):
            return None, [], False
        rule = selector.get("rule")
        if isinstance(rule, dict) and not _match_artifact_rule(
                inp.subject_key, rule):
            return None, [], False
        expression = str(selector.get("subject_regex")
                         or selector.get("regex") or "")
        if expression:
            if not expression.startswith("(?"):
                expression = "(?i)" + expression
            if re.search(expression, inp.subject_key) is None:
                return None, [], False
        transformations = list(selector.get("transformations") or [])
        if selector.get("transform"):
            transformations.append(str(selector["transform"]))
        value = apply_transformations(inp.value, transformations)
        return value, transformations, True

    # -- shared persistence tail -----------------------------------------------

    def _persist(self, metric: Metric, scope: dict, value: dict,
                 dimensions: dict, observed_at: datetime,
                 bstart: datetime, bend: datetime,
                 provenance: dict, nonce: str) -> None:
        observation = {
            "metric_id": metric.id,
            "metric_key": metric.key,
            "observed_at": observed_at,
            "collected_at": self.now(),
            "bucket_start": bstart,
            "bucket_end": bend,
            "scope": scope,
            "value": value,
            "dimensions": dimensions,
        }
        prepared = prepare_observation(observation, metric.value_type,
                                       self._policy(metric))
        previous = self.repository.previous_observation(
            metric.id, scope, observation.get("dimensions"), observed_at)
        apply_change(observation, previous, observed_at)
        observation["dedupe_key"] = dedupe_key(
            metric.dedupe_scope, metric.id, observation, nonce)
        for flag, name in ((prepared["redacted"], "redacted"),
                           (prepared["hashed_only"], "hash_only"),
                           (prepared["truncated"], "truncated")):
            if flag:
                provenance[name] = True
        observation["provenance"] = provenance
        observation["provenance_hash"] = provenance_hash(provenance)
        self.repository.insert_observation(observation)


def _subject_text(inp: IndexedArtifactInput) -> str:
    return inp.subject_key or inp.name
