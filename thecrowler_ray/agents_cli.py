"""Agent-file lint / validate / convert (reference ``cmd/crowler-agt``
→ ``pkg/agent/cli.go:29-93`` and ``pkg/agent/validation.go:81-330``).

Two validation modes, like the reference:

- **lenient** (= lint): structural checks mirroring the load-bearing
  constraints of ``schemas/crowler-agent-schema.json`` — top-level
  ``jobs`` required, enums for format_version / process / trigger_type /
  action / agent_type / trust_level, per-action required params
  (PluginExecution→plugin_name, APIRequest→url+request_type,
  AIInteraction→model+prompt|messages, DBQuery→query,
  RunCommand→command), interval trigger_name shape
  ('every N minutes' | 'at <ISO8601>Z').
- **strict**: the semantic rules of ``validateSemanticRules``
  (validation.go:192-259): name pattern, memory.ttl Go duration,
  memory.retention ≥ 0, trigger_type+trigger_name both set, Decision
  branch targets resolvable against the registry or the local document.

Errors accumulate into one ``AgentValidationError`` carrying
``(path, message)`` issues, like the reference's ValidationError.
"""

from __future__ import annotations

import json
import os
import re

_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9 _.-]{1,127}$")
_INTERVAL_EVERY = re.compile(r"^every\s+\d+\s+minutes$")
_INTERVAL_AT = re.compile(
    r"^at\s+\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$")
_GO_DUR = re.compile(
    r"^([+-]?(\d+(\.\d*)?|\.\d+)(ns|us|µs|ms|s|m|h))+$")

_FORMAT_VERSIONS = {"v1", "v2"}
_PROCESS = {"serial", "parallel"}
_TRIGGER_TYPES = {"interval", "event", "manual", "signal", "agent"}
_ACTIONS = {"APIRequest", "AIInteraction", "DBQuery", "RunCommand",
            "PluginExecution", "CreateEvent", "Decision"}
_AGENT_TYPES = {"observer", "executor", "planner", "coordinator"}
_TRUST_LEVELS = {"untrusted", "restricted", "trusted", "system"}
_ACTION_REQUIRED = {
    "PluginExecution": [["plugin_name"]],
    "APIRequest": [["url"], ["request_type"]],
    "DBQuery": [["query"]],
    "RunCommand": [["command"]],
}


class AgentValidationError(Exception):
    """Accumulated (path, message) issues, reference ValidationError."""

    def __init__(self, issues: list[tuple[str, str]]):
        self.issues = list(issues)
        super().__init__("; ".join(f"{p}: {m}" for p, m in self.issues))


class _Issues:
    def __init__(self):
        self.items: list[tuple[str, str]] = []

    def add(self, path: str, msg: str):
        self.items.append((path or "$", msg))

    def raise_if_any(self):
        if self.items:
            raise AgentValidationError(self.items)


def read_agent_file(path: str) -> tuple[str, str]:
    """→ (text, file_type). Extension gates like readAgentFile
    (cli.go:98-113)."""
    if not path.strip():
        raise ValueError("file path is required")
    ext = os.path.splitext(path)[1].lstrip(".").lower()
    if ext not in ("json", "yaml", "yml"):
        raise ValueError(f"unsupported file extension: {ext}")
    return open(path).read(), ext


def decode_doc(text: str, file_type: str) -> dict:
    ft = file_type.strip().lstrip(".").lower()
    if ft == "json":
        try:
            raw = json.loads(text)
        except ValueError as exc:
            raise ValueError(f"invalid json: {exc}") from None
    elif ft in ("yaml", "yml"):
        import yaml

        try:
            raw = yaml.safe_load(text)
        except yaml.YAMLError as exc:
            raise ValueError(f"invalid yaml: {exc}") from None
    else:
        raise ValueError(f"unsupported file format: {file_type}")
    if not isinstance(raw, dict):
        raise ValueError("agent document must be a mapping")
    return raw


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------

def validate_agent_config(doc: dict, strict: bool = False,
                          registry=None) -> None:
    ve = _Issues()
    _schema_checks(doc, ve)
    ve.raise_if_any()  # schema issues gate strict checks, like the reference
    if strict:
        _semantic_checks(doc, registry, ve)
        ve.raise_if_any()


def _schema_checks(doc: dict, ve: _Issues) -> None:
    if "jobs" not in doc:
        ve.add("$", "jobs is required")
        return
    fv = doc.get("format_version")
    if fv is not None and fv not in _FORMAT_VERSIONS:
        ve.add("format_version", "must be one of v1, v2")
    ai = doc.get("agent_identity")
    if ai is not None:
        if not isinstance(ai, dict):
            ve.add("agent_identity", "must be an object")
        else:
            if (t := ai.get("agent_type")) is not None \
                    and t not in _AGENT_TYPES:
                ve.add("agent_identity.agent_type",
                       "must be one of " + ", ".join(sorted(_AGENT_TYPES)))
            if (t := ai.get("trust_level")) is not None \
                    and t not in _TRUST_LEVELS:
                ve.add("agent_identity.trust_level",
                       "must be one of " + ", ".join(sorted(_TRUST_LEVELS)))
    jobs = doc.get("jobs")
    if not isinstance(jobs, list):
        ve.add("jobs", "must be an array")
        return
    for i, job in enumerate(jobs):
        jp = f"jobs[{i}]"
        if not isinstance(job, dict):
            ve.add(jp, "must be an object")
            continue
        if (p := job.get("process")) is not None and p not in _PROCESS:
            ve.add(jp + ".process", "must be 'serial' or 'parallel'")
        tt = job.get("trigger_type")
        if tt is not None and tt not in _TRIGGER_TYPES:
            ve.add(jp + ".trigger_type",
                   "must be one of " + ", ".join(sorted(_TRIGGER_TYPES)))
        tn = job.get("trigger_name")
        if tt == "interval" and isinstance(tn, str) and \
                not (_INTERVAL_EVERY.match(tn) or _INTERVAL_AT.match(tn)):
            ve.add(jp + ".trigger_name",
                   "interval triggers must be 'every N minutes' or "
                   "'at YYYY-MM-DDTHH:MM:SSZ'")
        steps = job.get("steps")
        if steps is None:
            continue
        if not isinstance(steps, list):
            ve.add(jp + ".steps", "must be an array")
            continue
        for s, step in enumerate(steps):
            sp = f"{jp}.steps[{s}]"
            if not isinstance(step, dict):
                ve.add(sp, "must be an object")
                continue
            action = step.get("action")
            if action is not None and action not in _ACTIONS:
                ve.add(sp + ".action",
                       "must be one of " + ", ".join(sorted(_ACTIONS)))
            params = step.get("params")
            if params is not None and not isinstance(params, dict):
                ve.add(sp + ".params", "must be an object")
                continue
            params = params or {}
            for group in _ACTION_REQUIRED.get(action, []):
                if not any(k in params for k in group):
                    ve.add(sp + ".params",
                           f"{action} requires {' or '.join(group)}")
            if action == "AIInteraction":
                if "model" not in params:
                    ve.add(sp + ".params", "AIInteraction requires model")
                if "prompt" not in params and "messages" not in params:
                    ve.add(sp + ".params",
                           "AIInteraction requires prompt or messages")
                for m, msg in enumerate(params.get("messages") or []):
                    if not isinstance(msg, dict) or "role" not in msg \
                            or "content" not in msg:
                        ve.add(f"{sp}.params.messages[{m}]",
                               "messages require role and content")


def _semantic_checks(doc: dict, registry, ve: _Issues) -> None:
    ai = doc.get("agent_identity")
    if isinstance(ai, dict):
        name = ai.get("name")
        if isinstance(name, str) and name.strip() and \
                not _NAME_RE.match(name):
            ve.add("agent_identity.name",
                   "must match ^[A-Za-z0-9][A-Za-z0-9 _.-]{1,127}$")
        mem = ai.get("memory")
        if isinstance(mem, dict):
            ttl = mem.get("ttl")
            if isinstance(ttl, str) and ttl.strip() and \
                    not _GO_DUR.match(ttl.strip()):
                ve.add("agent_identity.memory.ttl",
                       "must be a valid Go duration (for example, "
                       "'30s' or '10m')")
            ret = mem.get("retention")
            if isinstance(ret, (int, float)) and not isinstance(ret, bool) \
                    and ret < 0:
                ve.add("agent_identity.memory.retention", "must be >= 0")
    for i, job in enumerate(doc.get("jobs") or []):
        if not isinstance(job, dict):
            continue
        jp = f"jobs[{i}]"
        jname = job.get("name")
        if isinstance(jname, str) and jname.strip() and \
                not _NAME_RE.match(jname):
            ve.add(jp + ".name",
                   "must match ^[A-Za-z0-9][A-Za-z0-9 _.-]{1,127}$")
        if not str(job.get("trigger_type") or "").strip() or \
                not str(job.get("trigger_name") or "").strip():
            ve.add(jp + ".trigger",
                   "trigger_type and trigger_name must both be set")
        for s, step in enumerate(job.get("steps") or []):
            if not isinstance(step, dict) or step.get("action") != "Decision":
                continue
            cond = (step.get("params") or {}).get("condition")
            if not isinstance(cond, dict):
                continue
            sp = f"{jp}.steps[{s}].params.condition"
            for branch in ("on_true", "on_false"):
                _check_decision_target(cond, branch, f"{sp}.{branch}",
                                       ve, doc, registry)


def _check_decision_target(cond, branch, path, ve, doc, registry):
    """validation.go:261-289."""
    target = cond.get(branch)
    if not isinstance(target, dict):
        return
    tid = str(target.get("agent_id") or "").strip()
    tname = str(target.get("agent_name") or "").strip() or \
        str(target.get("call_agent") or "").strip()
    if not tid and not tname:
        ve.add(path, "Decision branch must include one of agent_id, "
                     "agent_name, or call_agent")
        return
    if tid and _resolvable(tid, doc, registry, by_id=True):
        return
    if tname and _resolvable(tname, doc, registry, by_id=False):
        return
    ve.add(path, "Decision target is not resolvable to a registered or "
                 "local agent")


def _resolvable(key: str, doc: dict, registry, by_id: bool) -> bool:
    if registry is not None:
        names = getattr(registry, "agents", None)
        if isinstance(names, dict) and key in names:
            return True
    ai = doc.get("agent_identity")
    if isinstance(ai, dict):
        local = ai.get("agent_id" if by_id else "name")
        if isinstance(local, str) and local.strip() == key:
            return True
    if not by_id:
        for job in doc.get("jobs") or []:
            if isinstance(job, dict) and \
                    str(job.get("name") or "").strip() == key:
                return True
    return False


# ---------------------------------------------------------------------------
# file-level entry points (cli.go surface)
# ---------------------------------------------------------------------------

def validate_agent_file(path: str, strict: bool = False,
                        registry=None) -> None:
    text, ftype = read_agent_file(path)
    validate_agent_config(decode_doc(text, ftype), strict, registry)


def lint_agent_file(path: str) -> None:
    validate_agent_file(path, strict=False)


def convert_json_to_yaml(text: str) -> str:
    import yaml

    return yaml.safe_dump(decode_doc(text, "json"), sort_keys=False,
                          default_flow_style=False)


def convert_yaml_to_json(text: str) -> str:
    return json.dumps(decode_doc(text, "yaml"), indent=2) + "\n"


def convert_agent_file(input_path: str, output_path: str = "",
                       mode: str = "") -> str:
    text, _ = read_agent_file(input_path)
    m = mode.strip().lower()
    if m == "json2yaml":
        out = convert_json_to_yaml(text)
    elif m == "yaml2json":
        out = convert_yaml_to_json(text)
    else:
        raise ValueError(f"unsupported conversion mode: {mode}")
    if output_path:
        with open(output_path, "w") as f:
            f.write(out)
    return out
