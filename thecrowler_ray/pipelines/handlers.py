"""Event-driven handlers (§3.3): consumers that turn bus events into work.

The reference's events service polls the Events table and dispatches each
event by type to registered plugins/agents (``services/events/main.go:1544``
processEvent; events with no registered handler are counted as dropped), and
runs periodic jobs through a scheduler that publishes scheduler events
(``events_scheduler.go``; time-series aggregation,
``services/events/time_series.go:14``). This module is that consumer loop
over the repo's :class:`~thecrowler_ray.state.events.EventBus` actor:

- :class:`HandlerRegistry` — event_type → handler callables
- :func:`drain_events` — poll → dispatch → ack handled / drop unmatched
- :func:`run_schedules` — fire due schedules (each publishes a
  ``scheduler`` event) then drain, so scheduled actions flow through the
  same dispatch path as ad-hoc events
- built-in handlers: scheduled time-series aggregation over the events
  table (the reference's flagship scheduled job) and wave compaction
  (maintenance), both returning row counts for the caller's metrics
"""

from __future__ import annotations

import ray


class HandlerRegistry:
    """event_type → [handler(event_dict) -> result]."""

    def __init__(self):
        self._handlers: dict[str, list] = {}

    def register(self, event_type: str, fn) -> None:
        self._handlers.setdefault(event_type, []).append(fn)

    def handlers_for(self, event_type: str) -> list:
        return list(self._handlers.get(event_type, ()))


def drain_events(bus, registry: HandlerRegistry, now: float | None = None,
                 ws_hub=None) -> dict:
    """Poll the bus, dispatch each event to its type's handlers, ack the
    handled ones. Events with no handler are dropped (acked without work),
    mirroring the reference's dropped-events counter. When a ``ws_hub``
    is attached, every polled event is also broadcast as a live
    ``"event"`` message (services/events/main.go:1157)."""
    events = ray.get(bus.poll.remote(None, now))
    handled = dropped = 0
    results = []
    for ev in events:
        if ws_hub is not None:
            ws_hub.broadcast("event", ev)
        fns = registry.handlers_for(ev["event_type"])
        if not fns:
            dropped += 1
            ray.get(bus.ack.remote(ev["event_id"]))
            continue
        for fn in fns:
            results.append(
                {"event_id": ev["event_id"], "event_type": ev["event_type"],
                 "action": ev["action"], "result": fn(ev)}
            )
        handled += 1
        ray.get(bus.ack.remote(ev["event_id"]))
    return {"handled": handled, "dropped": dropped, "results": results}


def run_schedules(bus, registry: HandlerRegistry, now: float | None = None) -> dict:
    """Fire due schedules (the bus publishes one ``scheduler`` event per
    firing, carrying the schedule's action in details) then drain — so a
    schedule's action reaches the same handlers an ad-hoc event would."""
    fired = ray.get(bus.due_schedules.remote(now))
    out = drain_events(bus, registry, now)
    out["fired"] = fired
    return out


# ---------------------------------------------------------------------------
# built-in handlers
# ---------------------------------------------------------------------------


def make_timeseries_handler(sf_dir: str, out_dir: str, freq: str = "h"):
    """Scheduler action 'timeseries_aggregate': run the per-bucket
    aggregation over the events table and write the result table
    (reference runTimeSeriesAggregation)."""

    def handler(event: dict) -> dict:
        import ray.data

        from ..storage import write_table
        from ..stages.timeseries import timeseries_aggregate

        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_type", "ts", "value", "user_id"],
        )
        out = timeseries_aggregate(ds, "event_type", "ts", "value", "user_id", freq)
        out = out.materialize()
        write_table(out, out_dir)
        return {"rows": out.count(), "out_dir": out_dir}

    return handler


def make_compaction_handler(run_dir: str, out_dir: str):
    """Scheduler action 'compact_waves': maintenance compaction of per-wave
    page files into right-sized partitions."""

    def handler(event: dict) -> dict:
        from .maintenance import compact_waves

        stats = compact_waves(run_dir, out_dir)
        return {**stats, "out_dir": out_dir}

    return handler


def scheduler_router(registry: HandlerRegistry) -> None:
    """Route 'scheduler' events to the handler registered under their
    ACTION name (details.action), the reference's scheduler → job
    dispatch."""

    def route(event: dict):
        action = (event.get("details") or {}).get("action", "")
        results = [fn(event) for fn in registry.handlers_for(action)]
        return results

    registry.register("scheduler", route)


def make_agent_handler(engine):
    """Bridge an agents.JobEngine into the bus consumer: events dispatch
    to every matching event-triggered agent (reference: agents with
    trigger.type=event fire on Events rows)."""

    def handler(event: dict) -> dict:
        fired = engine.handle_event(event)
        return {"agents_fired": [name for name, _ in fired],
                "results": [r for _, r in fired]}

    return handler
