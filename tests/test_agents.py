"""Agent workflow engine (pkg/agent): step chaining with result injection,
decision conditions ($-path expressions + switch), plugin/db/event actions,
YAML agent registry, and event-triggered dispatch. Results use the
reference envelope (agent.go:31-54): output/config/status/message."""

import pytest

from thecrowler_ray.agents import AgentDefinition, JobEngine


def _engine(**kw):
    from thecrowler_ray.plugins import PluginRegistry

    reg = PluginRegistry()
    reg.register_js_plugin("score_host", """
        var h = (params.input && params.input.host)
                ? params.input.host : params.host;
        var result = (h && h.indexOf('good') >= 0) ? 0.9 : 0.2;
    """)
    reg.register_plugin("echo", lambda ctx: ctx.get("payload", "none"))
    return JobEngine(plugins=reg, **kw)


def test_step_chaining_and_result_injection():
    eng = _engine()
    eng.register_agent(AgentDefinition(name="chain", steps=[
        {"action": "plugin", "params": {"plugin_name": "score_host",
                                        "host": "good.test"}},
        # previous result's envelope is injected into this step's params
        {"action": "plugin", "params": {"plugin_name": "echo"}},
    ]))
    out = eng.run_agent("chain")
    # echo sees no 'payload', returns 'none'; injection happened silently
    assert out["status"] == "success"
    assert out["output"] == [{"plugin_name": "echo", "response": "none"}]

    # reference quirk (agent.go:196-203): a key present in BOTH params and
    # the last result becomes [result_value] — a SCALAR params value is
    # dropped; only a LIST params value gets appended
    eng.plugins.register_plugin("inspect", lambda ctx: ctx.get("output"))
    score = [{"plugin_name": "score_host", "response": 0.9}]
    out2 = eng.execute_job([
        {"action": "plugin", "params": {"plugin_name": "score_host",
                                        "host": "good.test"}},
        {"action": "plugin", "params": {"plugin_name": "inspect",
                                        "output": "mine"}},
    ])
    assert out2["output"][0]["response"] == [score]  # scalar 'mine' dropped
    out3 = eng.execute_job([
        {"action": "plugin", "params": {"plugin_name": "score_host",
                                        "host": "good.test"}},
        {"action": "plugin", "params": {"plugin_name": "inspect",
                                        "output": ["mine"]}},
    ])
    assert out3["output"][0]["response"] == [score, "mine"]


def test_decision_if_and_switch_with_delegation():
    eng = _engine()
    eng.register_agent(AgentDefinition(name="accepter", steps=[
        {"action": "create_event",
         "params": {"event_type": "accepted", "severity": "info"}},
    ]))
    eng.register_agent(AgentDefinition(name="rejecter", steps=[
        {"action": "create_event", "params": {"event_type": "rejected"}},
    ]))
    eng.register_agent(AgentDefinition(name="decider", steps=[
        {"action": "decision", "params": {
            "input": {"response": {"success": True, "value": 42}},
            "condition": {
                "condition_type": "if",
                "expression":
                    "$response.success === true && $response.value > 10",
                "on_true": {"agent": "accepter"},
                "on_false": {"agent": "rejecter"},
            },
        }},
    ]))
    out = eng.run_agent("decider")
    assert out["output"]["output"]["type"] == "accepted"
    assert [e["type"] for e in eng.emitted_events] == ["accepted"]

    # switch condition maps the expression value through cases
    eng.register_agent(AgentDefinition(name="switcher", steps=[
        {"action": "decision", "params": {
            "input": {"response": {"tier": 2}},
            "condition": {
                "condition_type": "switch",
                "expression": "$response.tier",
                "cases": {"1": {"agent": "rejecter"},
                          "2": {"agent": "accepter"},
                          "default": {"agent": "rejecter"}},
            },
        }},
    ]))
    out2 = eng.run_agent("switcher")
    assert out2["output"]["output"]["type"] == "accepted"


def test_db_query_action_real_duckdb():
    eng = _engine(tables={"documents":
                          "/root/testdata/sf0.001/documents.parquet"})
    out = eng.execute_job([
        {"action": "db_query",
         "params": {"query":
                    "SELECT COUNT(*) AS n, MIN(doc_id) AS lo FROM documents"}},
    ])
    assert out["output"][0]["n"] > 0 and out["output"][0]["lo"] == 0
    assert out["message"] == "database operation successful"


def test_errors_abort_the_job():
    eng = _engine()
    with pytest.raises(ValueError, match="missing 'url'"):
        eng.execute_job([{"action": "api_request", "params": {}}])
    with pytest.raises(ValueError, match="unknown action"):
        eng.execute_job([{"action": "teleport", "params": {}}])
    with pytest.raises(ValueError, match="empty job"):
        eng.execute_job([])


def test_yaml_registry_and_event_trigger():
    eng = _engine()
    eng.load_agents_yaml("""
agents:
  - name: on-crawl-done
    trigger: {type: event, name: crawl_completed}
    steps:
      - action: plugin
        params: {plugin_name: score_host, host: good.test}
  - name: on-anything
    trigger: {type: event}
    steps:
      - action: create_event
        params: {event_type: observed}
  - name: api-only
    trigger: {type: api}
    steps:
      - action: create_event
        params: {event_type: never}
""")
    fired = eng.handle_event({"type": "crawl_completed", "run": "r1"})
    names = [n for n, _ in fired]
    assert names == ["on-crawl-done", "on-anything"]
    # the matching agent's plugin ran over the event input
    assert fired[0][1]["output"][0]["response"] == 0.9
    # api-triggered agents don't fire on events
    assert "api-only" not in names
    fired2 = eng.handle_event({"type": "other_event"})
    assert [n for n, _ in fired2] == ["on-anything"]


@pytest.mark.usefixtures("ray_session")
def test_event_bus_drives_agents_end_to_end():
    """EventBus → drain_events → agent dispatch → agent publishes a
    follow-up event (the reference's event-driven agent loop)."""
    import ray

    from thecrowler_ray.pipelines.handlers import (
        HandlerRegistry,
        drain_events,
        make_agent_handler,
    )
    from thecrowler_ray.state.events import EventBus

    bus = ray.remote(EventBus).remote()
    eng = _engine(event_bus=bus)
    eng.load_agents_yaml("""
agents:
  - name: crawl-auditor
    trigger: {type: event, name: crawl_completed}
    steps:
      - action: create_event
        params: {event_type: audit_done, severity: info}
""")
    registry = HandlerRegistry()
    registry.register("crawl_completed", make_agent_handler(eng))
    ray.get(bus.publish.remote("crawl", "crawl_completed", "info", {"run": "r9"}))
    out = drain_events(bus, registry)
    assert out["handled"] >= 1
    assert eng.emitted_events[0]["type"] == "audit_done"
    # the agent's follow-up event landed on the bus
    follow = ray.get(bus.poll.remote("audit_done"))
    assert follow and follow[0]["details"] == {}
    ray.kill(bus)
