"""Agent-file lint/validate/convert (reference cmd/crowler-agt →
pkg/agent/cli.go + validation.go), characterized against the
reference's OWN agent corpus and strict-mode fixtures."""

import glob
import json
import os

import pytest

from thecrowler_ray.agents_cli import (
    AgentValidationError,
    convert_agent_file,
    convert_yaml_to_json,
    decode_doc,
    lint_agent_file,
    read_agent_file,
    validate_agent_config,
    validate_agent_file,
)

REF_AGENTS = "/root/reference/agents"
REF_TESTDATA = "/root/reference/pkg/agent/testdata"
ref_present = os.path.exists(REF_TESTDATA)


@pytest.mark.skipif(not ref_present, reason="reference absent")
def test_reference_agent_corpus_lints_clean():
    """Every agent file the reference ships (6 examples + 3 templates)
    passes lenient validation unmodified."""
    files = sorted(glob.glob(f"{REF_AGENTS}/examples/*.yaml") +
                   glob.glob(f"{REF_AGENTS}/templates/*.yaml"))
    assert len(files) >= 9
    for f in files:
        lint_agent_file(f)  # raises on any issue


@pytest.mark.skipif(not ref_present, reason="reference absent")
def test_reference_valid_fixtures_pass_strict():
    for name in ("identity.valid.json", "identity.valid.yaml",
                 "legacy.valid.json", "legacy.valid.yaml"):
        validate_agent_file(f"{REF_TESTDATA}/{name}", strict=True)


@pytest.mark.skipif(not ref_present, reason="reference absent")
def test_reference_strict_invalid_decision_fixture():
    """strict.invalid.decision.json: lenient-clean, strict fails on BOTH
    unresolvable Decision branches (cli_test.go:24)."""
    path = f"{REF_TESTDATA}/strict.invalid.decision.json"
    validate_agent_file(path, strict=False)  # lenient passes
    with pytest.raises(AgentValidationError) as ei:
        validate_agent_file(path, strict=True)
    paths = [p for p, _ in ei.value.issues]
    assert paths == [
        "jobs[0].steps[0].params.condition.on_true",
        "jobs[0].steps[0].params.condition.on_false",
    ]
    assert all("not resolvable" in m for _, m in ei.value.issues)


def test_schema_checks():
    with pytest.raises(AgentValidationError, match="jobs is required"):
        validate_agent_config({})
    with pytest.raises(AgentValidationError, match="must be an array"):
        validate_agent_config({"jobs": "x"})
    with pytest.raises(AgentValidationError, match="one of v1, v2"):
        validate_agent_config({"format_version": "v3", "jobs": []})
    bad = {"jobs": [{
        "name": "J", "process": "both", "trigger_type": "webhook",
        "steps": [
            {"action": "Teleport"},
            {"action": "APIRequest", "params": {"url": "http://x"}},
            {"action": "AIInteraction",
             "params": {"messages": [{"role": "user"}]}},
            {"action": "DBQuery", "params": {"query": "SELECT 1"}},
        ]}]}
    with pytest.raises(AgentValidationError) as ei:
        validate_agent_config(bad)
    msgs = "\n".join(f"{p}: {m}" for p, m in ei.value.issues)
    assert "jobs[0].process" in msgs
    assert "jobs[0].trigger_type" in msgs
    assert "jobs[0].steps[0].action" in msgs
    assert "APIRequest requires request_type" in msgs
    assert "AIInteraction requires model" in msgs
    assert "messages require role and content" in msgs
    assert "steps[3]" not in msgs  # the valid DBQuery step adds no issue
    # interval trigger_name shape
    with pytest.raises(AgentValidationError, match="every N minutes"):
        validate_agent_config({"jobs": [{
            "trigger_type": "interval", "trigger_name": "hourly"}]})
    validate_agent_config({"jobs": [{
        "trigger_type": "interval", "trigger_name": "every 5 minutes"}]})
    validate_agent_config({"jobs": [{
        "trigger_type": "interval",
        "trigger_name": "at 2026-01-01T00:00:00Z"}]})


def test_semantic_checks_and_registry_resolution():
    doc = {
        "agent_identity": {"name": "~bad~",
                           "memory": {"ttl": "10 parsecs",
                                      "retention": -1}},
        "jobs": [{"name": "x" * 200, "trigger_type": "manual",
                  "trigger_name": ""}],
    }
    with pytest.raises(AgentValidationError) as ei:
        validate_agent_config(doc, strict=True)
    paths = [p for p, _ in ei.value.issues]
    assert "agent_identity.name" in paths
    assert "agent_identity.memory.ttl" in paths
    assert "agent_identity.memory.retention" in paths
    assert "jobs[0].name" in paths
    assert "jobs[0].trigger" in paths

    # Decision target resolvable through a JobEngine registry
    decision_doc = {"jobs": [{
        "name": "Router", "trigger_type": "manual", "trigger_name": "r",
        "steps": [{"action": "Decision", "params": {"condition": {
            "on_true": {"call_agent": "Downstream"},
        }}}]}]}
    with pytest.raises(AgentValidationError, match="not resolvable"):
        validate_agent_config(decision_doc, strict=True)

    from thecrowler_ray.agents import AgentDefinition, JobEngine

    eng = JobEngine().register_agent(AgentDefinition(name="Downstream"))
    validate_agent_config(decision_doc, strict=True, registry=eng)
    # a branch naming a local job also resolves
    decision_doc["jobs"][0]["steps"][0]["params"]["condition"][
        "on_true"]["call_agent"] = "Router"
    validate_agent_config(decision_doc, strict=True)
    # empty branch target is its own error
    decision_doc["jobs"][0]["steps"][0]["params"]["condition"][
        "on_true"] = {}
    with pytest.raises(AgentValidationError, match="must include one of"):
        validate_agent_config(decision_doc, strict=True)


def test_read_and_convert(tmp_path):
    with pytest.raises(ValueError, match="unsupported file extension"):
        read_agent_file("agent.toml")
    with pytest.raises(ValueError, match="file path is required"):
        read_agent_file("  ")
    with pytest.raises(ValueError, match="must be a mapping"):
        decode_doc("[1,2]", "json")

    yml = tmp_path / "a.yaml"
    yml.write_text("jobs:\n  - name: A\n    trigger_type: manual\n"
                   "    trigger_name: t\n")
    out = convert_agent_file(str(yml), mode="yaml2json")
    doc = json.loads(out)
    assert doc["jobs"][0]["name"] == "A" and out.endswith("\n")
    jsn = tmp_path / "a.json"
    jsn.write_text(out)
    back = convert_agent_file(str(jsn), str(tmp_path / "b.yaml"),
                              "json2yaml")
    assert decode_doc(back, "yaml") == doc  # lossless round-trip
    with pytest.raises(ValueError, match="unsupported conversion mode"):
        convert_agent_file(str(yml), mode="yaml2yaml")


@pytest.mark.skipif(not ref_present, reason="reference absent")
def test_reference_golden_conversion_is_lossless():
    """yaml2json over the reference's own golden YAML preserves the
    document exactly (cli.go ConvertYAMLToJSON)."""
    src = open(f"{REF_TESTDATA}/legacy.golden.yaml").read()
    out = json.loads(convert_yaml_to_json(src))
    import yaml

    assert out == yaml.safe_load(src)


def test_cli_agents_roundtrip(tmp_path, capsys):
    from thecrowler_ray.__main__ import main

    good = tmp_path / "ok.yaml"
    good.write_text("jobs:\n  - name: Agent one\n    trigger_type: manual\n"
                    "    trigger_name: t\n")
    assert main(["agents", "validate", str(good), "--strict"]) == 0
    assert json.loads(capsys.readouterr().out)["ok"] is True
    bad = tmp_path / "bad.yaml"
    bad.write_text("format_version: v9\njobs: []\n")
    assert main(["agents", "lint", str(bad)]) == 1
    issues = json.loads(capsys.readouterr().out)["issues"]
    assert issues[0]["path"] == "format_version"
    assert main(["agents", "convert", str(good), "--mode", "yaml2json",
                 "--out", str(tmp_path / "o.json")]) == 0
    assert json.loads((tmp_path / "o.json").read_text())["jobs"]
