"""Agent workflow engine (reference ``pkg/agent/``).

The reference's agents are named workflows: a JOB is a list of steps
``{action, params}``; after each step its result map is injected into the
next step's params (``agent.go:146-227``: ``config`` keys deep-merge, a
key already present in params merges into an array, everything else copies
over), and the engine dispatches on the registered action name.

Actions modeled (``RegisterActions``, ``agent.go:90-101``):

  - ``decision``  — `if` conditions are ``$``-path boolean expressions
    (``action_decision.go:189-227``) evaluated in :mod:`minijs` with each
    input key bound as ``$key``; `switch` maps the expression's value
    through a cases table. A boolean outcome delegates to the agent named
    in ``on_true`` / ``on_false`` (the reference's delegation target).
  - ``plugin``    — runs a named plugin from a :class:`PluginRegistry`
    (JS scripts execute in minijs).
  - ``create_event`` — publishes to the repo's EventBus actor when one is
    attached, else records locally (the reference inserts into Events).
  - ``db_query``  — real SQL over the engine's registered parquet tables
    via DuckDB (the reference queries Postgres).
  - ``api_request`` — transport seam (live HTTP needs egress; tests
    inject a fake), same pattern as extdetect.
  - ``run_command`` / ``ai_interaction`` — UnavailableCapabilityError
    seams (sandboxed shell / LLM runtime are host capabilities).

Agents load from YAML (name/trigger/steps); event-triggered agents are
dispatched by ``handle_event`` — wire it to ``pipelines/handlers``'s bus
consumer to reproduce the reference's event-driven agent runs.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable

from .minijs import Interpreter
from .plugins import PluginRegistry, UnavailableCapabilityError


@dataclass
class AgentDefinition:
    name: str
    trigger_type: str = "api"  # event | api | cron (agentmeta.go:45)
    trigger_name: str = ""
    steps: list = field(default_factory=list)


def _merge_result_into_params(params: dict, last: dict) -> dict:
    """agent.go:169-207: config deep-merges; existing keys array-merge;
    new keys copy."""
    params = dict(params or {})
    for k, v in (last or {}).items():
        if k == "config":
            if params.get("config") is None:
                params["config"] = v
            elif isinstance(v, dict) and isinstance(params["config"], dict):
                params["config"] = {**params["config"], **v}
            continue
        if k in params:
            merged = [v]
            if isinstance(params[k], list):
                merged.extend(params[k])
            params[k] = merged
        else:
            params[k] = v
    return params


class JobEngine:
    """Action registry + agent registry + step executor."""

    def __init__(self, plugins: PluginRegistry | None = None,
                 tables: dict[str, str] | None = None,
                 transport: Callable | None = None,
                 event_bus=None):
        self.plugins = plugins or PluginRegistry()
        self.tables = dict(tables or {})  # name -> parquet path (db_query)
        self.transport = transport
        self.event_bus = event_bus
        self.emitted_events: list[dict] = []
        self.agents: dict[str, AgentDefinition] = {}
        self.actions: dict[str, Callable] = {
            "decision": self._act_decision,
            "plugin": self._act_plugin,
            "create_event": self._act_create_event,
            "db_query": self._act_db_query,
            "api_request": self._act_api_request,
            "run_command": self._act_unavailable("run_command"),
            "ai_interaction": self._act_unavailable("ai_interaction"),
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

    # -- actions ------------------------------------------------------------
    @staticmethod
    def _eval_expression(expr: str, inputs: dict):
        """`$key` path expressions (action_decision.go:197) via minijs."""
        extra = {f"${k}": v for k, v in (inputs or {}).items()}
        return Interpreter().run(expr, {}, extra_vars=extra)

    def _act_decision(self, params: dict) -> dict:
        cond = params.get("condition")
        if not isinstance(cond, dict):
            raise ValueError("missing 'condition' parameter")
        inputs = params.get("input") if isinstance(params.get("input"), dict) \
            else {k: v for k, v in params.items() if k != "condition"}
        ctype = str(cond.get("condition_type", "")).strip().lower()
        if ctype == "if":
            expr = cond.get("expression")
            if not isinstance(expr, str):
                raise ValueError("missing 'expression' in condition")
            outcome = bool(self._eval_expression(expr, inputs))
            branch = cond.get("on_true") if outcome else cond.get("on_false")
            if not isinstance(branch, dict):
                raise ValueError(
                    f"missing '{'on_true' if outcome else 'on_false'}' step"
                )
        elif ctype == "switch":
            expr = cond.get("expression") or params.get("expression")
            if not isinstance(expr, str):
                raise ValueError("missing 'expression' in condition")
            cases = cond.get("cases")
            if not isinstance(cases, dict):
                raise ValueError("missing 'cases' in condition")
            value = self._eval_expression(expr, inputs)
            key = str(int(value)) if isinstance(value, float) and float(
                value).is_integer() else str(value)
            branch = cases.get(key, cases.get("default"))
            if not isinstance(branch, dict):
                raise ValueError(f"no case for {key!r} and no default")
        else:
            raise ValueError(f"unsupported condition type: {ctype}")
        # delegation: the chosen branch names another agent
        agent_name = branch.get("agent")
        if not agent_name:
            raise ValueError("branch step must name an 'agent' to delegate to")
        response = self.run_agent(
            str(agent_name), {"input": inputs, **branch.get("params", {})}
        )
        return {"status": "success", "response": response}

    def _act_plugin(self, params: dict) -> dict:
        name = params.get("plugin")
        if not name:
            raise ValueError("missing 'plugin' parameter")
        values = self.plugins.run_plugin(str(name), dict(params))
        return {"status": "success",
                "response": values[0] if len(values) == 1 else values}

    def _act_create_event(self, params: dict) -> dict:
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
        return {"status": "success", "response": event}

    def _act_db_query(self, params: dict) -> dict:
        query = params.get("query")
        if not isinstance(query, str):
            raise ValueError("missing 'query' parameter")
        import duckdb

        con = duckdb.connect()
        for name, path in self.tables.items():
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
        rows = con.execute(query).fetchdf().to_dict(orient="records")
        return {"status": "success",
                "response": json.loads(json.dumps(rows, default=str))}

    def _act_api_request(self, params: dict) -> dict:
        if self.transport is None:
            raise UnavailableCapabilityError(
                "api_request needs an HTTP transport (egress); inject one "
                "like extdetect's transport seam"
            )
        return {"status": "success", "response": self.transport(params)}

    @staticmethod
    def _act_unavailable(name: str):
        def act(params: dict) -> dict:
            raise UnavailableCapabilityError(
                f"action {name!r} needs a host capability (sandboxed shell "
                "/ LLM runtime) outside this data plane"
            )

        return act
