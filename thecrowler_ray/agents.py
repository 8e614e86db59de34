"""Agent workflow engine (reference ``pkg/agent/``).

The reference's agents are named workflows: a JOB is a list of steps
``{action, params}``; after each step its result map is injected into the
next step's params (``agent.go:146-227``: ``config`` keys deep-merge, a
key already present in params merges into an array, everything else copies
over), and the engine dispatches on the registered action name.

Every action returns the reference's result envelope
(``agent.go:31-54``): ``output`` (StrResponse), ``config`` (the step's
resolved config echoed back), ``status`` (success|error), ``message``.
On an action error the job aborts (the Go ``(rval, err)`` pair → a raised
exception here).

Actions (``RegisterActions``, ``agent.go:90-101``) — all seven are real:

  - ``decision``  — `if` conditions are ``$``-path boolean expressions
    (``action_decision.go:189-227``) evaluated in :mod:`minijs` with each
    input key bound as ``$key``; `switch` maps the expression's value
    through a cases table; the winning branch delegates to another agent.
  - ``plugin``    — runs a named plugin from a :class:`PluginRegistry`
    (JS scripts execute in minijs); param strings are ``$response``-token
    resolved, the previous input rides as ``json_data``
    (action_run_plugin.go:100-149), and the output is the reference's
    ``[{"plugin_name", "response"}]`` list.
  - ``create_event`` — publishes to the repo's EventBus actor when one is
    attached, else records locally (the reference inserts into Events).
  - ``db_query``  — real SQL over the engine's registered parquet tables
    via DuckDB (the reference queries Postgres).
  - ``api_request`` — real HTTP via :func:`generic_api.generic_api_request`
    (action_run_api_request.go semantics, including the ``request["type"]``
    key-mismatch quirk under which the JSON body / Content-Type are never
    attached because the key written is ``method``); a ``transport``
    callable injected at construction replaces the wire client in tests.
  - ``run_command`` — real local execution (action_run_command.go +
    execute_isolated_linux.go): ``PATH=/usr/bin:/bin`` env, 180 s timeout
    with process-group kill, optional chroot / setuid / setgid (root only),
    the reference's argv quirk (``[command, "", "rest joined"]``), stdout
    else stderr as the output, non-zero exit → error.
  - ``ai_interaction`` — full LLM request normalization
    (action_run_ai_interaction.go:85-149: provider/url/auth/model
    precedence params > config.ai.* > config.*, messages/prompt,
    temperature/max_tokens/top_p coercion, extras passthrough), usage
    policy enforcement (trust-level + agent-contract deny rules,
    :151-203), and a provider registry whose default
    ``openai-compatible`` provider POSTs the assembled payload through
    the same HTTP seam (llm_provider.go:57-110).

``$response`` tokens and ``{{kv}}`` templates in param strings resolve per
``agent.go:265-354`` (``resolve_response_string`` / ``resolve_value``),
with Go ``%v`` formatting for substituted values.

Agents load from YAML (name/trigger/steps); event-triggered agents are
dispatched by ``handle_event`` — wire it to ``pipelines/handlers``'s bus
consumer to reproduce the reference's event-driven agent runs.
"""

from __future__ import annotations

import json
import os
import re
import signal
import subprocess
from dataclasses import dataclass, field
from typing import Callable

from .minijs import Interpreter
from .plugins import PluginRegistry, UnavailableCapabilityError

# agent.go:31-54
STR_RESPONSE = "output"
STR_CONFIG = "config"
STR_STATUS = "status"
STR_MESSAGE = "message"
STR_REQUEST = "input"
STR_EVENT = "event"
STATUS_SUCCESS = "success"
STATUS_ERROR = "error"
ERR_MISSING_URL = "missing 'url' parameter"
JSON_APP_TYPE = "application/json"

# agent.go:57-58
_TOKEN_PATTERN = re.compile(r"\$response(?:\.[a-zA-Z0-9_]+)+")
_KV_PATTERN = re.compile(r"{{(.*?)}}")

DEFAULT_LLM_PROVIDER = "openai-compatible"


class AgentActionError(ValueError):
    """An action's Go error return; carries the error envelope."""

    def __init__(self, message: str, rval: dict | None = None):
        super().__init__(message)
        self.rval = dict(rval or {})


# ---------------------------------------------------------------------------
# shared helpers (agent.go:234-354)

def json_parser(doc, keys):
    """cmn.JsonParser: nested key walk, None when missing/not-a-map."""
    cur = doc
    for i, key in enumerate(keys):
        if not isinstance(cur, dict):
            return None
        if key not in cur:
            return None
        cur = cur[key]
    return cur


def go_fmt(value) -> str:
    """Go ``fmt.Sprintf("%v", value)`` for the JSON-ish types that flow
    through agent params. Maps print sorted (Go sorts map keys in %v)."""
    if value is None:
        return "<nil>"
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, float):
        if value.is_integer() and abs(value) < 1e21:
            return str(int(value))
        return repr(value)
    if isinstance(value, dict):
        inner = " ".join(f"{go_fmt(k)}:{go_fmt(v)}"
                         for k, v in sorted(value.items(), key=lambda kv:
                                            str(kv[0])))
        return f"map[{inner}]"
    if isinstance(value, (list, tuple)):
        return "[" + " ".join(go_fmt(v) for v in value) + "]"
    return str(value)


def resolve_response_token(doc: dict, token: str):
    """agent.go:265-296: '$response[.key]*' → value from doc."""
    t = token.strip()
    if not t:
        return token
    if not t.startswith("$response"):
        return token
    path = t[len("$response"):]
    if not path:
        return doc
    path = path.lstrip(".")
    if not path:
        return doc
    return json_parser(doc, path.split("."))


def resolve_response_string(doc: dict | None, text: str, kv=None) -> str:
    """agent.go:298-330: '{{key}}' via the KV store (missing keys keep the
    original token), then '$response.x.y' tokens replaced with %v."""
    if doc is None:
        return text
    s = text.strip()
    if not s:
        return text

    def kv_sub(m):
        key = m.group(0).strip("{}").strip()
        if not key or kv is None:
            return m.group(0)
        try:
            val = kv.get(key)
        except Exception:
            return m.group(0)
        if val is None:
            return m.group(0)
        return val if isinstance(val, str) else ""

    result = _KV_PATTERN.sub(kv_sub, s)
    for token in set(_TOKEN_PATTERN.findall(result)):
        value = resolve_response_token(doc, token)
        result = result.replace(token, go_fmt(value))
    return result


def resolve_value(doc: dict | None, value, kv=None):
    """agent.go:332-354: recursive token resolution."""
    if isinstance(value, str):
        return resolve_response_string(doc, value, kv=kv)
    if isinstance(value, dict):
        return {k: resolve_value(doc, v, kv=kv) for k, v in value.items()}
    if isinstance(value, list):
        return [resolve_value(doc, v, kv=kv) for v in value]
    return value


def get_config(params: dict) -> dict:
    """agent.go:234-243: params['config'] if present else params itself."""
    if params.get(STR_CONFIG) is None:
        return params
    config = params[STR_CONFIG]
    if not isinstance(config, dict):
        raise AgentActionError("missing 'config' parameter")
    return config


def get_input(params: dict) -> dict:
    """agent.go:245-263: {'input': params['input']}, falling back to a
    config-carried event."""
    if params.get(STR_REQUEST) is None:
        config = params.get(STR_CONFIG)
        if isinstance(config, dict) and config.get(STR_EVENT) is not None:
            return {STR_REQUEST: config[STR_EVENT]}
        raise AgentActionError(f"missing '{STR_REQUEST}' parameter")
    return {STR_REQUEST: params[STR_REQUEST]}


def _merge_result_into_params(params: dict, last: dict) -> dict:
    """agent.go:169-207: config deep-merges; existing keys array-merge;
    new keys copy."""
    params = dict(params or {})
    for k, v in (last or {}).items():
        if k == STR_CONFIG:
            if params.get(STR_CONFIG) is None:
                params[STR_CONFIG] = v
            elif isinstance(v, dict) and isinstance(params[STR_CONFIG], dict):
                params[STR_CONFIG] = {**params[STR_CONFIG], **v}
            continue
        if k in params:
            merged = [v]
            if isinstance(params[k], list):
                merged.extend(params[k])
            params[k] = merged
        else:
            params[k] = v
    return params


# ---------------------------------------------------------------------------
# LLM providers (llm_provider.go)

@dataclass
class LLMRequest:
    provider: str = ""
    url: str = ""
    auth: str = ""
    model: str = ""
    messages: list = field(default_factory=list)
    prompt: str = ""
    temperature: float | None = None
    max_tokens: int | None = None
    top_p: float | None = None
    extras: dict = field(default_factory=dict)


class OpenAICompatibleProvider:
    """llm_provider.go:50-110: OpenAI-style POST payload through
    GenericAPIRequest; response body parsed as a JSON map."""

    name = DEFAULT_LLM_PROVIDER

    def execute(self, req: LLMRequest, http: Callable[[dict], str]) -> dict:
        from .urls import is_url_valid

        if not req.url.strip():
            raise AgentActionError(ERR_MISSING_URL)
        if not is_url_valid(req.url):
            raise AgentActionError(f"invalid URL: {req.url}")
        body: dict = {}
        if req.model.strip():
            body["model"] = req.model
        if req.messages:
            body["messages"] = req.messages
        else:
            body["prompt"] = req.prompt
        if req.temperature is not None:
            body["temperature"] = req.temperature
        if req.max_tokens is not None:
            body["max_tokens"] = req.max_tokens
        if req.top_p is not None:
            body["top_p"] = req.top_p
        for k, v in req.extras.items():
            body.setdefault(k, v)
        headers: dict = {"Content-Type": JSON_APP_TYPE}
        if req.auth.strip():
            headers["Authorization"] = req.auth
        try:
            response = http({
                "url": req.url,
                "body": json.dumps(body),
                "method": "POST",
                "headers": json.dumps(headers),
            })
        except Exception as e:
            raise AgentActionError(f"AI interaction failed: {e}")
        try:
            parsed = json.loads(response)
        except (TypeError, ValueError) as e:
            raise AgentActionError(f"failed to parse AI response: {e}")
        if not isinstance(parsed, dict):
            raise AgentActionError("failed to parse AI response: not a map")
        return parsed


LLM_PROVIDERS: dict[str, object] = {}


def register_llm_provider(provider) -> None:
    name = str(getattr(provider, "name", "")).strip().lower()
    if name:
        LLM_PROVIDERS[name] = provider


register_llm_provider(OpenAICompatibleProvider())


def _trust_level_rank(level: str) -> int:
    order = {"untrusted": 0, "basic": 1, "trusted": 2, "privileged": 3}
    return order.get(str(level).strip().lower(), 0)


def _disallow_high_trust_model(model: str) -> bool:
    m = model.strip().lower()
    if not m:
        return False
    if "mini" in m or "small" in m or "nano" in m:
        return False
    return "gpt-4" in m or m.startswith("o")


def _matches_policy_pattern(pattern: str, actual: str) -> bool:
    pattern = pattern.strip()
    if not pattern:
        return False
    if pattern.endswith("*"):
        return actual.startswith(pattern[:-1])
    return pattern == actual


# ---------------------------------------------------------------------------


@dataclass
class AgentDefinition:
    name: str
    trigger_type: str = "api"  # event | api | cron (agentmeta.go:45)
    trigger_name: str = ""
    steps: list = field(default_factory=list)


class JobEngine:
    """Action registry + agent registry + step executor."""

    def __init__(self, plugins: PluginRegistry | None = None,
                 tables: dict[str, str] | None = None,
                 transport: Callable | None = None,
                 event_bus=None, kv=None):
        self.plugins = plugins or PluginRegistry()
        self.tables = dict(tables or {})  # name -> parquet path (db_query)
        # transport(request: {url,method,headers,...}) -> APIResponse JSON
        # string; defaults to the real stdlib client (genericAPIclient.go)
        if transport is None:
            from .generic_api import generic_api_request

            transport = generic_api_request
        self.transport = transport
        self.event_bus = event_bus
        self.kv = kv  # {{key}} template store (agent.go:309-322)
        self.emitted_events: list[dict] = []
        self.agents: dict[str, AgentDefinition] = {}
        self.actions: dict[str, Callable] = {
            "decision": self._act_decision,
            "plugin": self._act_plugin,
            "create_event": self._act_create_event,
            "db_query": self._act_db_query,
            "api_request": self._act_api_request,
            "run_command": self._act_run_command,
            "ai_interaction": self._act_ai_interaction,
        }

    # -- registry -----------------------------------------------------------
    def register_agent(self, agent: AgentDefinition) -> "JobEngine":
        self.agents[agent.name] = agent
        return self

    def load_agents_yaml(self, yaml_text: str) -> "JobEngine":
        import yaml as _yaml

        doc = _yaml.safe_load(yaml_text) or []
        for a in doc if isinstance(doc, list) else doc.get("agents", []):
            trig = a.get("trigger") or {}
            self.register_agent(AgentDefinition(
                name=a["name"],
                trigger_type=str(trig.get("type", "api")),
                trigger_name=str(trig.get("name", "")),
                steps=list(a.get("steps") or []),
            ))
        return self

    # -- execution ----------------------------------------------------------
    def execute_job(self, steps: list[dict], params: dict | None = None) -> dict:
        """The reference step loop (agent.go:146-227)."""
        if not steps:
            raise ValueError("empty job")
        last: dict = dict(params or {})
        for step in steps:
            action = step.get("action")
            if not isinstance(action, str):
                raise ValueError("missing 'action' field in job step")
            fn = self.actions.get(action)
            if fn is None:
                raise ValueError(f"unknown action: {action}")
            step_params = _merge_result_into_params(
                step.get("params") or {}, last
            )
            last = fn(step_params)
        return last

    def run_agent(self, name: str, params: dict | None = None) -> dict:
        agent = self.agents.get(name)
        if agent is None:
            raise KeyError(f"agent not found: {name!r}")
        return self.execute_job(agent.steps, params)

    def handle_event(self, event: dict) -> list[tuple[str, dict]]:
        """Run every event-triggered agent matching the event type
        (reference: agents with trigger.type=event fire on Events rows)."""
        etype = event.get("type") or event.get("event_type")
        out = []
        for agent in self.agents.values():
            if agent.trigger_type == "event" and (
                not agent.trigger_name or agent.trigger_name == etype
            ):
                out.append((agent.name, self.run_agent(agent.name,
                                                       {"input": event})))
        return out

    # -- envelope helpers -----------------------------------------------------
    @staticmethod
    def _ok(output, config, message: str) -> dict:
        return {STR_RESPONSE: output, STR_CONFIG: config,
                STR_STATUS: STATUS_SUCCESS, STR_MESSAGE: message}

    @staticmethod
    def _fail(message: str, config=None):
        raise AgentActionError(message, {
            STR_RESPONSE: None, STR_CONFIG: config,
            STR_STATUS: STATUS_ERROR, STR_MESSAGE: message})

    def _resolve_str(self, doc, text) -> str:
        return resolve_response_string(doc, text, kv=self.kv)

    # -- actions ------------------------------------------------------------
    @staticmethod
    def _eval_expression(expr: str, inputs: dict):
        """`$key` path expressions (action_decision.go:197) via minijs."""
        extra = {f"${k}": v for k, v in (inputs or {}).items()}
        return Interpreter().run(expr, {}, extra_vars=extra)

    def _act_decision(self, params: dict) -> dict:
        config = get_config(params)
        cond = params.get("condition")
        if not isinstance(cond, dict):
            self._fail("missing 'condition' parameter", config)
        inputs = params.get("input") if isinstance(params.get("input"), dict) \
            else {k: v for k, v in params.items() if k != "condition"}
        ctype = str(cond.get("condition_type", "")).strip().lower()
        if ctype == "if":
            expr = cond.get("expression")
            if not isinstance(expr, str):
                self._fail("missing 'expression' in condition", config)
            outcome = bool(self._eval_expression(expr, inputs))
            branch = cond.get("on_true") if outcome else cond.get("on_false")
            if not isinstance(branch, dict):
                self._fail(
                    f"missing '{'on_true' if outcome else 'on_false'}' step",
                    config)
        elif ctype == "switch":
            expr = cond.get("expression") or params.get("expression")
            if not isinstance(expr, str):
                self._fail("missing 'expression' in condition", config)
            cases = cond.get("cases")
            if not isinstance(cases, dict):
                self._fail("missing 'cases' in condition", config)
            value = self._eval_expression(expr, inputs)
            key = str(int(value)) if isinstance(value, float) and float(
                value).is_integer() else str(value)
            branch = cases.get(key, cases.get("default"))
            if not isinstance(branch, dict):
                self._fail(f"no case for {key!r} and no default", config)
        else:
            self._fail(f"unsupported condition type: {ctype}", config)
        # delegation: the chosen branch names another agent
        agent_name = branch.get("agent")
        if not agent_name:
            self._fail("branch step must name an 'agent' to delegate to",
                       config)
        response = self.run_agent(
            str(agent_name), {"input": inputs, **branch.get("params", {})}
        )
        return self._ok(response, config, "decision executed successfully")

    def _act_plugin(self, params: dict) -> dict:
        """action_run_plugin.go:38-181."""
        config = get_config(params)
        try:
            input_raw = get_input(params)
        except AgentActionError:
            input_raw = {}
        name = params.get("plugin_name", params.get("plugin"))
        if not isinstance(name, str):
            self._fail("missing 'plugin_name' in parameters section", config)
        name = self._resolve_str(input_raw, name).strip()
        if not name:
            self._fail("empty plugin name", config)
        # assemble plugin params (action_run_plugin.go:100-149)
        plg_params = {
            STR_EVENT: config.get(STR_EVENT, params.get(STR_EVENT)),
            "meta_data": config.get("meta_data", params.get("meta_data")),
        }
        for k, v in params.items():
            if k in ("plugin_name", "plugin", STR_EVENT, "meta_data",
                     STR_CONFIG, "vdi_hook", "db_handler"):
                continue
            if isinstance(v, str):
                plg_params[k] = self._resolve_str(input_raw, v)
            elif isinstance(v, dict):
                plg_params[k] = resolve_value(input_raw, v, kv=self.kv)
            else:
                plg_params[k] = v
        if params.get(STR_REQUEST) is not None:
            plg_params["json_data"] = params[STR_REQUEST]
        try:
            # raw return value, like the reference's pRval
            # (action_run_plugin.go:154-177)
            response = self.plugins.run_plugin_raw(name, plg_params)
        except KeyError:
            self._fail(f"plugin '{name}' not found", config)
        results = [{"plugin_name": name, "response": response}]
        return self._ok(results, config, "plugin executed successfully")

    def _act_create_event(self, params: dict) -> dict:
        config = get_config(params)
        event = {
            "type": params.get("event_type", "agent_event"),
            "severity": params.get("severity", "info"),
            "details": params.get("details", {}),
        }
        if self.event_bus is not None:
            import ray

            ray.get(self.event_bus.publish.remote(
                params.get("action", "agent"), event["type"],
                event["severity"], event["details"]))
        self.emitted_events.append(event)
        return self._ok(event, config, "event created successfully")

    def _act_db_query(self, params: dict) -> dict:
        config = get_config(params)
        query = params.get("query")
        if not isinstance(query, str):
            self._fail("missing 'query' parameter", config)
        import duckdb

        con = duckdb.connect()
        for name, path in self.tables.items():
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
        rows = con.execute(query).fetchdf().to_dict(orient="records")
        return self._ok(json.loads(json.dumps(rows, default=str)), config,
                        "database operation successful")

    def _act_api_request(self, params: dict) -> dict:
        """action_run_api_request.go:36-157."""
        from .urls import is_url_valid

        try:
            input_raw = get_input(params)
        except AgentActionError:
            input_raw = {}  # :46-49 — missing input tolerated
        input_map = input_raw.get(STR_REQUEST)
        if not isinstance(input_map, dict):
            input_map = {}
        config = get_config(params)

        url = params.get("url")
        if not isinstance(url, str):
            self._fail(ERR_MISSING_URL, config)
        url = self._resolve_str(input_raw, url)
        if not is_url_valid(url):
            self._fail(f"invalid URL: {url}", config)

        request = {"url": url}
        method = "GET"
        if isinstance(params.get("request_type"), str):
            method = params["request_type"]
        if isinstance(params.get("type"), str):
            method = params["type"]  # backward compat
        request["method"] = method.strip().upper()

        # reference quirk (:92,:112): the body / Content-Type branches test
        # request["type"], which is never written (the key is "method") —
        # so the JSON body and Content-Type header are never attached.
        headers: dict = {"User-Agent": "CROWler", "Accept": JSON_APP_TYPE}
        if params.get("auth") is not None:
            auth = params["auth"]
            if isinstance(auth, str):
                auth = self._resolve_str(input_map, auth).strip()
            headers["Authorization"] = auth
        elif config.get("api_key") is not None:
            auth = config["api_key"]
            if isinstance(auth, str):
                headers["Authorization"] = self._resolve_str(
                    input_map, auth).strip()
        if isinstance(params.get("headers"), dict):
            headers.update(resolve_value(input_map, params["headers"],
                                         kv=self.kv))
        request["headers"] = json.dumps(headers)

        try:
            response = self.transport(request)
        except Exception as e:
            if isinstance(e, UnavailableCapabilityError):
                raise
            self._fail(f"API request failed: {e}", config)
        if isinstance(response, (dict, list)):
            response_map = response  # injected test transports may pre-parse
        else:
            try:
                response_map = json.loads(response)
            except (TypeError, ValueError) as e:
                self._fail(f"could not parse response: {e}", config)
        if not isinstance(response_map, dict):
            self._fail("could not parse response: not a map", config)
        return self._ok(response_map, config, "API request successful")

    def _act_run_command(self, params: dict) -> dict:
        """action_run_command.go:101-236 + execute_isolated_linux.go."""
        config = get_config(params)
        try:
            command_raw = get_input(params)
        except AgentActionError as e:
            # :121-129 — a nil input falls back to params['command']
            if params.get("command") is None:
                raise e
            command_raw = {STR_REQUEST: params["command"]}
        if command_raw.get(STR_REQUEST) is None:
            if params.get("command") is None:
                self._fail("missing 'command' parameter", config)
            command_raw[STR_REQUEST] = params["command"]

        cmd_str = ""
        command_map: dict = {}
        req = command_raw[STR_REQUEST]
        if isinstance(req, str):
            cmd_str = req
            command_map = {"command": cmd_str}
        elif isinstance(req, dict):
            command_map = req
        else:
            self._fail("invalid command format", config)
        cmd_str = self._resolve_str(command_map, cmd_str)

        args = cmd_str.split()
        if not args:
            self._fail("empty command", config)
        # reference argv quirk (:159-161): argv[1]="" and the remaining
        # args joined into ONE argv[2] string
        argv = [args[0], "", " ".join(args[1:])]

        chroot_dir = ""
        if params.get("chroot_dir") is not None:
            if isinstance(params["chroot_dir"], str):
                chroot_dir = self._resolve_str(command_map,
                                               params["chroot_dir"])
        uid = gid = 0
        for key in ("uid", "gid"):
            if params.get(key) is None:
                continue
            raw = params[key]
            text = self._resolve_str(command_map, raw) if isinstance(
                raw, str) else ""  # :175-181 — non-strings parse as ""
            try:
                val = int(text.strip())
                if val < 0 or val > 0xFFFFFFFF:
                    raise ValueError("out of uint32 range")
            except ValueError as e:
                self._fail(f"invalid {key.upper()}: {e}", config)
            if key == "uid":
                uid = val
            else:
                gid = val

        def preexec():
            os.setpgid(0, 0)
            if chroot_dir:
                os.chroot(chroot_dir)
                os.chdir("/")
            if gid:
                os.setgid(gid)
            if uid:
                os.setuid(uid)

        try:
            proc = subprocess.Popen(
                argv, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                env={"PATH": "/usr/bin:/bin"}, preexec_fn=preexec,
                text=True)
        except OSError as e:
            self._fail(f"command execution failed: start failed: {e}",
                       config)
        try:
            stdout, stderr = proc.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                proc.kill()
            stdout, stderr = proc.communicate()
            self._fail("command execution failed: command timeout after "
                       "3m0s", config)
        if proc.returncode != 0:
            # execute_isolated_linux.go:131-133 — non-zero exit is an error
            self._fail("command execution failed: command exited with "
                       f"status {proc.returncode}", config)
        output = stdout if stdout else stderr
        return self._ok(output, config, "command executed successfully")

    def _act_ai_interaction(self, params: dict) -> dict:
        """action_run_ai_interaction.go:33-83."""
        config = get_config(params)
        input_raw = get_input(params)
        req = self._normalize_llm_request(params, config, input_raw)
        self._enforce_ai_usage_policy(config, req)
        provider = LLM_PROVIDERS.get(
            (req.provider or DEFAULT_LLM_PROVIDER).strip().lower())
        if provider is None:
            self._fail(f"unsupported AI provider: {req.provider}", config)
        try:
            response_map = provider.execute(req, self.transport)
        except AgentActionError as e:
            self._fail(str(e), config)
        return self._ok(response_map, config, "AI interaction successful")

    def _normalize_llm_request(self, params, config, input_raw) -> LLMRequest:
        """action_run_ai_interaction.go:85-149."""
        def p_str(key: str) -> str:
            v = params.get(key)
            if not isinstance(v, str):
                return ""
            return self._resolve_str(input_raw, v).strip()

        def cfg_nested(key: str, nested: str) -> str:
            section = config.get(key)
            if not isinstance(section, dict):
                return ""
            v = section.get(nested)
            if not isinstance(v, str):
                return ""
            return self._resolve_str(input_raw, v).strip()

        def cfg_str(key: str) -> str:
            v = config.get(key)
            if not isinstance(v, str):
                return ""
            return self._resolve_str(input_raw, v).strip()

        def first(*values: str) -> str:
            for v in values:
                if v.strip():
                    return v.strip()
            return ""

        def opt(key: str):
            raw = params.get(key)
            if raw is None:
                return None, False
            if isinstance(raw, str):
                return self._resolve_str(input_raw, raw), True
            return resolve_value(input_raw, raw, kv=self.kv), True

        def opt_float(key: str):
            v, ok = opt(key)
            if not ok:
                return None
            try:
                return float(str(v).strip()) if isinstance(v, str) \
                    else float(v)
            except (TypeError, ValueError):
                self._fail(f"{key} '{v}' parameter doesn't appear to be a "
                           "valid float", config)

        def opt_int(key: str):
            v, ok = opt(key)
            if not ok:
                return None
            try:
                if isinstance(v, str):
                    return int(v.strip())
                if isinstance(v, float):
                    return int(v)
                if isinstance(v, int):
                    return v
                raise ValueError
            except (TypeError, ValueError):
                self._fail(f"{key} '{v}' parameter doesn't appear to be a "
                           "valid integer", config)

        provider = first(p_str("provider"), cfg_nested("ai", "provider"),
                         DEFAULT_LLM_PROVIDER)
        url = first(p_str("url"), cfg_nested("ai", "url"), cfg_str("url"))
        auth = first(p_str("auth"), cfg_nested("ai", "auth"), cfg_str("auth"))
        model = first(p_str("model"), cfg_nested("ai", "model"),
                      cfg_str("model"))

        messages: list = []
        if isinstance(params.get("messages"), list) and params["messages"]:
            resolved = resolve_value(input_raw, params["messages"],
                                     kv=self.kv)
            if isinstance(resolved, list):
                messages = resolved
        prompt = first(p_str("prompt"), p_str(STR_MESSAGE))
        if not prompt and isinstance(input_raw.get(STR_REQUEST), str):
            prompt = input_raw[STR_REQUEST].strip()
        if not messages and not prompt:
            self._fail("missing 'prompt' or 'message' parameter", config)
        if not url:
            self._fail(ERR_MISSING_URL, config)

        extras = {}
        for key in ("presence_penalty", "frequency_penalty", "stop", "echo",
                    "logprobs", "n", "logit_bias", "stream"):
            v, ok = opt(key)
            if ok:
                extras[key] = v

        return LLMRequest(
            provider=provider, url=url, auth=auth, model=model,
            messages=messages, prompt=prompt,
            temperature=opt_float("temperature"),
            max_tokens=opt_int("max_tokens"), top_p=opt_float("top_p"),
            extras=extras)

    def _enforce_ai_usage_policy(self, config: dict, req: LLMRequest):
        """action_run_ai_interaction.go:151-181."""
        runtime = config.get("agent_runtime")
        if not isinstance(runtime, dict):
            return
        identity = runtime.get("identity_snapshot")
        if not isinstance(identity, dict) or not identity:
            return
        trust = str(identity.get("trust_level", ""))
        if _trust_level_rank(trust) < _trust_level_rank("trusted") and \
                _disallow_high_trust_model(req.model):
            self._fail(f"AI policy denied model '{req.model}' for "
                       f"trust_level '{trust}'", config)
        contract = identity.get("agent_contract")
        if not isinstance(contract, dict):
            return
        forbidden = contract.get("forbidden_actions") or []
        if not isinstance(forbidden, list):
            return
        for token in forbidden:
            if not isinstance(token, str):
                continue
            norm = token.strip().lower()
            if norm == "aiinteraction":
                self._fail("AI policy denied: agent contract forbids "
                           "AIInteraction", config)
            elif norm.startswith("provider:"):
                if _matches_policy_pattern(norm[len("provider:"):],
                                           req.provider.lower()):
                    self._fail(f"AI policy denied provider '{req.provider}' "
                               "by contract", config)
            elif norm.startswith("model:"):
                if _matches_policy_pattern(norm[len("model:"):],
                                           req.model.lower()):
                    self._fail(f"AI policy denied model '{req.model}' by "
                               "contract", config)
