"""Events bus + schedules (§3.3 ``services/events`` analog).

The reference uses SQL tables as a message bus (``Events`` with
action/type/severity/details + ``ExpiresAt``, ``postgresql-setup.pgsql:865``)
and a scheduler table polled by ``services/events``
(``pkg/database/events_scheduler.go``). Here the bus is a named Ray actor
(like the KV store) so pipeline stages and the driver share it, and
schedules are cron-lite ``every_seconds`` entries whose due-ness is a pure
function of (last_run, now) — deterministic and testable without wall-clock
sleeps.
"""

from __future__ import annotations

import itertools
import time
from dataclasses import dataclass, field

import ray


@dataclass
class Event:
    event_id: int
    action: str
    event_type: str
    severity: str = "info"
    details: dict = field(default_factory=dict)
    created_at: float = 0.0
    expires_at: float | None = None


class EventBus:
    """Actor body: publish / poll / ack / expire."""

    def __init__(self):
        self._seq = itertools.count(1)
        self._events: dict[int, Event] = {}
        self._schedules: dict[str, dict] = {}

    # -- events ------------------------------------------------------------
    def publish(self, action: str, event_type: str, severity: str = "info",
                details: dict | None = None, ttl_seconds: float | None = None,
                now: float | None = None) -> int:
        now = time.time() if now is None else now
        eid = next(self._seq)
        self._events[eid] = Event(
            eid, action, event_type, severity, details or {}, now,
            now + ttl_seconds if ttl_seconds else None,
        )
        return eid

    def poll(self, event_type: str | None = None, now: float | None = None) -> list[dict]:
        now = time.time() if now is None else now
        self._expire(now)
        out = [
            vars(e) for e in self._events.values()
            if event_type is None or e.event_type == event_type
        ]
        return sorted(out, key=lambda e: e["event_id"])

    def ack(self, event_id: int) -> bool:
        return self._events.pop(event_id, None) is not None

    def get(self, event_id: int, now: float | None = None) -> dict | None:
        """checkEventHandler analog: one event by id, expiry applied."""
        self._expire(time.time() if now is None else now)
        e = self._events.get(event_id)
        return vars(e) if e else None

    def update(self, event_id: int, severity: str | None = None,
               details: dict | None = None,
               action: str | None = None) -> bool:
        """updateEventHandler analog: mutate the mutable fields."""
        e = self._events.get(event_id)
        if e is None:
            return False
        if severity is not None:
            e.severity = severity
        if details is not None:
            e.details = details
        if action is not None:
            e.action = action
        return True

    def remove_before(self, cutoff: float) -> int:
        """RemoveEventsBeforeTime analog: drop events created before the
        cutoff; returns the removed count (the janitor's bulk cleanup)."""
        doomed = [eid for eid, e in self._events.items()
                  if e.created_at < cutoff]
        for eid in doomed:
            del self._events[eid]
        return len(doomed)

    def _expire(self, now: float) -> int:
        doomed = [
            eid for eid, e in self._events.items()
            if e.expires_at is not None and e.expires_at <= now
        ]
        for eid in doomed:
            del self._events[eid]
        return len(doomed)

    # -- schedules ---------------------------------------------------------
    def add_schedule(self, name: str, action: str, every_seconds: float,
                     now: float | None = None) -> None:
        now = time.time() if now is None else now
        self._schedules[name] = {
            "action": action, "every_seconds": every_seconds, "last_run": now,
        }

    def due_schedules(self, now: float | None = None) -> list[str]:
        """Names of schedules due at `now`; marks them run (and publishes a
        scheduler event per firing, like the reference dispatch)."""
        now = time.time() if now is None else now
        fired = []
        for name, sc in self._schedules.items():
            if now - sc["last_run"] >= sc["every_seconds"]:
                sc["last_run"] = now
                self.publish("schedule_fired", "scheduler",
                             details={"schedule": name, "action": sc["action"]},
                             now=now)
                fired.append(name)
        return sorted(fired)


def event_bus(name: str = "crowler_events", detached: bool = False):
    try:
        return ray.get_actor(name)
    except ValueError:
        pass
    opts = {"name": name, "num_cpus": 0.05}
    if detached:
        opts["lifetime"] = "detached"
    return ray.remote(EventBus).options(**opts).remote()
