"""Tests for detection, page validation, exprterpreter, config, search,
JSON repair — the SURVEY §2 long-tail operators."""

import random

import pandas as pd
import pytest

from thecrowler_ray.config import combine_config, deep_merge, load_config
from thecrowler_ray.detection import (
    DEFAULT_SIGNATURES,
    TechDetector,
    calculate_confidence,
)
from thecrowler_ray.exprterpreter import get_float, get_int, parse_duration
from thecrowler_ray.page_validation import (
    VA_FAIL,
    VA_RETRY,
    VA_SKIP,
    apply_load_validation,
)
from thecrowler_ray.search import compile_predicate, parse, to_sql_where, tokenize
from thecrowler_ray.textnorm import remove_impurities, sanitize_json


def test_confidence_curve():
    assert calculate_confidence(0) == 0
    assert calculate_confidence(5) == 5.0          # [0,noise)→[0,10)
    assert calculate_confidence(10) == 10.0
    assert calculate_confidence(30) == 40.0
    assert calculate_confidence(59.999) == pytest.approx(100.0, abs=0.01)
    # reference quirk: exactly x == detected falls into the [detected, ∞)
    # branch which restarts at 40 (faithfully reproduced)
    assert calculate_confidence(60) == 40.0
    assert calculate_confidence(1000) == 100.0     # capped
    assert calculate_confidence(-30) == 70.0       # absence evidence


def test_tech_detection():
    det = TechDetector()
    found = det.detect(
        url="http://x.test/index.php?id=1",
        headers={"Server": "nginx/1.18", "X-Powered-By": "PHP/8.1"},
        meta_tags=[{"name": "generator", "content": "WordPress 6.2"}],
        content='<script src="/wp-content/themes/x/jquery.min.js"></script>',
    )
    assert found["nginx"] >= 40
    assert "php" in found and "wordpress" in found and "jquery" in found
    # implied closure: wordpress implies php (already present), php implies apache
    assert "apache" in found
    assert det.detect(url="http://plain.test/") == {}


def test_page_validation():
    html = "<html><body><div id='app'>loaded</div><p class='err'>404</p></body></html>"
    ok_cfg = {"load_validation": {"groups": [{
        "url_pattern": ".*",
        "on_fail": "skip",
        "validations": [{"dom_checks": [{"selector": "#app"}]}],
    }]}}
    assert apply_load_validation(ok_cfg, html, "http://x.test/").valid

    missing_cfg = {"load_validation": {"groups": [{
        "on_fail": "skip",
        "validations": [{"dom_checks": [{"selector": "#missing"}]}],
    }]}}
    st = apply_load_validation(missing_cfg, html, "http://x.test/")
    assert not st.valid and st.action == VA_SKIP

    retry_cfg = {"load_validation": {"groups": [{
        "on_fail": "mark_invalid",
        "validations": [{
            "on_fail": "retry", "max_retries": 2,
            "dom_checks": [{"selector": "#missing"}],
        }],
    }]}}
    st = apply_load_validation(retry_cfg, html, "http://x.test/")
    assert st.action == VA_RETRY and st.max_retries == 2

    fail_cfg = {"load_validation": {"groups": [{
        "on_fail": "mark_invalid",
        "validations": [{"dom_checks": [
            {"selector": "p.err", "conditions": [{"type": "not_exists"}]}
        ]}],
    }]}}
    assert apply_load_validation(fail_cfg, html, "http://x.test/").action == VA_FAIL

    # conditions: text / attribute / count
    cond_cfg = {"load_validation": {"groups": [{
        "validations": [{"all_checks_must_pass": True, "dom_checks": [
            {"selector": "#app", "conditions": [{"type": "text", "pattern": "load"}]},
            {"selector": "div", "conditions": [{"type": "count", "min_count": 1, "max_count": 3}]},
        ]}],
    }]}}
    assert apply_load_validation(cond_cfg, html, "http://x.test/").valid
    # no groups / unmatched url_pattern → neutral pass
    assert apply_load_validation({}, html, "u").valid
    nm = {"load_validation": {"groups": [{"url_pattern": "^ftp://", "on_fail": "skip",
                                          "validations": [{"dom_checks": [{"selector": "#x"}]}]}]}}
    assert apply_load_validation(nm, html, "http://x.test/").valid


def test_exprterpreter():
    assert get_float("42.5") == 42.5
    assert get_int("7") == 7
    rng = random.Random(1)
    v = get_float("random(1, 3)", rng=rng)
    assert 1 <= v <= 3
    assert get_float("random(1, 3)", rng=random.Random(1)) == get_float(
        "random(1, 3)", rng=random.Random(1)
    )
    assert get_float("random(2, random(2, 2))", rng=rng) == 2.0
    assert get_float("time(unix)", now=1700000000) == 1700000000.0
    assert get_float("time(ms)", now=2) == 2000.0
    assert get_float("not_a_number") == 0.0


def test_parse_duration():
    assert parse_duration("3 days") == 259200
    assert parse_duration("15 minutes") == 900
    assert parse_duration("1h") == 3600
    assert parse_duration("90") == 90
    assert parse_duration("1 minute 30 seconds") == 90
    assert parse_duration("", default=5) == 5
    assert parse_duration("10", min_seconds=60) == 60
    assert parse_duration("2 weeks", max_seconds=86400) == 86400


def test_config_loader():
    cfg = load_config("""
crawler:
  max_links: ${MAXL:-500}
  workers: 8
database:
  host: ${DBHOST:-localhost}
""", env={})
    assert cfg["crawler"]["max_links"] == 500
    assert cfg["crawler"]["workers"] == 8
    assert cfg["crawler"]["interval"] == "random(1,3)"  # default preserved
    assert cfg["database"]["host"] == "localhost"
    cfg2 = load_config("crawler: {max_links: ${MAXL:-500}}", env={"MAXL": "9"})
    assert cfg2["crawler"]["max_links"] == 9

    merged = combine_config(cfg, {
        "restricted": 2,
        "crawling_config": {"max_links": 10, "unwanted_urls": ["\\.pdf$"]},
    })
    assert merged["crawler"]["max_links"] == 10
    assert merged["crawler"]["workers"] == 8
    assert merged["restricted"] == 2
    assert deep_merge({"a": {"b": 1, "c": 2}}, {"a": {"b": 9}}) == {"a": {"b": 9, "c": 2}}


def test_search_tokenizer_and_predicate():
    toks = tokenize('lang:en "big data" spark || source:src3 &limit:5')
    kinds = [k for k, _ in toks]
    assert kinds == ["field", "phrase", "term", "or", "field", "modifier"]
    q = parse('lang:en spark || source:src3 &limit:5')
    assert q.limit == 5
    assert len(q.groups) == 2

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["spark rules", "no match", "whatever", "SPARK upper"],
        "lang": ["en", "en", "fr", "en"],
        "source": ["src1", "src2", "src3", "src4"],
    })
    fn, _ = compile_predicate("lang:en spark || source:src3")
    mask = fn(df)
    assert mask.tolist() == [True, False, True, True]  # case-insensitive contains

    where, limit = to_sql_where("lang:en spark || source:src3 &limit:5")
    assert limit == 5
    assert "lang" in where and "OR" in where and "LIKE" in where

    import duckdb

    got = duckdb.sql(
        f"SELECT doc_id FROM df WHERE {where} ORDER BY doc_id"
    ).fetchall()
    assert [r[0] for r in got] == [1, 3, 4]


def test_json_repair():
    assert remove_impurities('{"a": 1,, "b": 2}#@!$%^') == '{"a": 1, "b": 2}'
    assert sanitize_json('{"a": "b\x00c\x01"}') == '{"a": "bc"}'
    # string contents untouched (incl. escapes and commas)
    assert remove_impurities('{"k": "x, y \\" z"}') == '{"k": "x, y \\" z"}'


def test_detection_rules_from_yaml():
    from thecrowler_ray.detection import TechDetector, detection_rules_from_yaml

    yaml_rules = """
rule_groups:
  - group_name: "detect"
    is_enabled: true
    detection_rules:
      - rule_name: "DetectDjango"
        object_name: "django"
        http_header_fields:
          - key: "x-framework"
            value: ["(?i)django"]
            confidence: 45
        url_micro_signatures:
          - value: "/admin/login"
            confidence: 20
        meta_tags:
          - name: "generator"
            content: "(?i)django"
            confidence: 40
        page_content_patterns:
          - key: "body"
            value: ["csrfmiddlewaretoken"]
            confidence: 35
        implies: ["python"]
      - rule_name: "DetectPython"
        object_name: "python"
        http_header_fields:
          - key: "server"
            value: ["(?i)gunicorn", "(?i)uwsgi"]
            confidence: 50
"""
    sigs = detection_rules_from_yaml(yaml_rules)
    assert [s.name for s in sigs] == ["django", "python"]
    det = TechDetector(sigs)
    found = det.detect(
        url="http://x.test/admin/login",
        headers={"X-Framework": "Django 4.2"},
        content="<form><input name='csrfmiddlewaretoken'></form>",
    )
    assert found["django"] == 100.0  # 45+20+35 = 100 raw → capped curve
    assert "python" in found          # implied closure
    # per-signature weights: only the weaker url signature
    weak = det.detect(url="http://x.test/admin/login")
    assert 0 < weak.get("django", 0) < 40


@pytest.mark.usefixtures("ray_session")
def test_cli_dedup_fingerprint_analyze(tmp_path):
    """The ray-job-submit CLI surface covers the training-data pipelines."""
    import json

    from thecrowler_ray.__main__ import main

    docs = "/root/testdata/sf0.001/documents.parquet"
    for argv, checks in [
        (["dedup", "--input", docs, "--method", "exact",
          "--out", str(tmp_path / "d1")], {"method": "exact"}),
        (["fingerprint", "--input", docs, "--kinds", "sha256,cityhash64",
          "--out", str(tmp_path / "d2")], {"kinds": ["sha256", "cityhash64"]}),
        (["analyze", "--input", docs, "--out", str(tmp_path / "d3")], {}),
    ]:
        import contextlib, io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(argv)
        assert rc == 0
        res = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert res["rows"] > 0
        for k, v in checks.items():
            assert res[k] == v
    import ray.data

    assert ray.data.read_parquet(str(tmp_path / "d2")).count() == 500


def test_source_claim_semantics():
    """update_sources eligibility (postgresql-setup.pgsql:2826-2901):
    re-crawl window, error retry, fresh states, lease expiry, priority
    filter, disabled exclusion, (created_at, source_id) order + LIMIT."""
    import numpy as np
    import pandas as pd

    from thecrowler_ray.scheduler import ClaimPolicy, claim_sources, due_mask

    now = 1_000_000.0
    H, D = 3600.0, 86400.0
    df = pd.DataFrame(
        {
            "source_id": range(10),
            "status": ["completed", "completed", "error", "error", "pending",
                       "new", None, "processing", "processing", "completed"],
            "last_updated_at": [now - 4 * D, now - H,      # 0 due, 1 fresh
                                now - 1000, now - 100,     # 2 due, 3 recent
                                now - 1, now - 1, np.nan,  # 4,5,6 always due
                                now - 2 * D, now - H,      # 7 lease-expired, 8 held
                                np.nan],                   # 9 never-updated
            "priority": ["high"] * 9 + ["low"],
            "disabled": [False] * 6 + [True] + [False] * 3,
            "created_at": [50, 40, 30, 20, 10, 60, 5, 70, 80, 90],
        }
    )
    pol = ClaimPolicy(limit=10, regular_crawling="3 days",
                      priority="high,medium", engine_id="e7")
    got = claim_sources(df, now, pol)
    # 0 (completed+old), 2 (error+past 15min), 4,5 (fresh), 7 (lease expired)
    # — NOT 1 (recent ok), 3 (error too recent), 6 (disabled), 8 (held),
    # 9 (priority low; never-updated only matters via last_ok_update)
    assert sorted(got.source_id) == [0, 2, 4, 5, 7]
    # ordering is (created_at, source_id): created_at 10,30,50,60,70
    assert list(got.source_id) == [4, 2, 0, 5, 7]
    assert (got.status == "processing").all() and (got.engine == "e7").all()

    # last_ok_update clause brings in the never-updated row (9 still low-pri)
    pol2 = ClaimPolicy(limit=10, last_ok_update="1 days", priority="")
    got2 = claim_sources(df, now, pol2)
    assert 9 in set(got2.source_id) and 6 not in set(got2.source_id)
    # limit truncates after ordering
    pol3 = ClaimPolicy(limit=2, regular_crawling="3 days", priority="high")
    got3 = claim_sources(df, now, pol3)
    assert len(got3) == 2
    assert list(got3.created_at) == sorted(got3.created_at)
    # vectorized mask matches row count
    assert due_mask(df, now, pol).sum() == 5


def test_due_mask_arrow_parity():
    """due_mask_arrow (the zero-copy batch path in claim_sources_ds) is
    bit-identical to the pandas due_mask across random source frames and
    policy variants."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from thecrowler_ray.scheduler import ClaimPolicy, due_mask, due_mask_arrow

    rng = np.random.default_rng(3)
    now = 2_000_000.0
    statuses = ["completed", "error", "pending", "new", "processing",
                "", "  Completed ", None]
    n = 500
    df = pd.DataFrame({
        "source_id": range(n),
        "status": rng.choice(np.array(statuses, dtype=object), n),
        "last_updated_at": np.where(rng.random(n) < 0.2, np.nan,
                                    now - rng.integers(0, 10**6, n)),
        "priority": rng.choice(["high", "medium", "low", " High", None], n),
        "disabled": rng.choice([True, False], n),
        "created_at": rng.integers(0, 1000, n),
    })
    policies = [
        ClaimPolicy(limit=10, regular_crawling="3 days",
                    priority="high,medium", engine_id="e"),
        ClaimPolicy(limit=10, last_ok_update="1 days", priority=""),
        ClaimPolicy(limit=10, priority="high",
                    processing_timeout="2 hours", last_error="1 minutes"),
    ]
    t = pa.Table.from_pandas(df, preserve_index=False)
    for pol in policies:
        want = due_mask(df, now, pol)
        got = due_mask_arrow(t, now, pol).to_numpy(zero_copy_only=False)
        np.testing.assert_array_equal(got, want)
