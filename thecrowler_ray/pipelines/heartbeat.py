"""Fleet heartbeat protocol (reference ``services/events/helpers.go``
:84-362 + ``main.go`` heartbeat constants).

The master events manager broadcasts a ``crowler_heartbeat`` request
event; every engine replica answers with a ``crowler_heartbeat_response``
carrying its pipeline statuses; a timeout closes the round into a
HeartbeatReport. Mirrored semantics over the repo's EventBus actor:

- one round at a time (a start while a round is open is a no-op,
  :96-101); response timeout defaults to 15 s, with sub-5-second or
  invalid configs snapping back to the default (:106-121);
- responses must match the round's parent event id; responders identify
  by ``origin_name`` with a ``src-{id}`` fallback (:188-217);
- the close-out analyses idleness across every response's
  ``pipeline_status`` array — any pipeline/crawling/netinfo/httpinfo
  subsystem ``running`` means the fleet is busy (:236-285) — and when
  the whole fleet is idle, the MASTER instance schedules one
  ``db_maintenance`` system event, rate-limited by the configured
  maintenance interval (:286-345);
- replicas answer through :func:`respond_to_heartbeat` (the engine-side
  half the reference runs inside processEvent).
"""

from __future__ import annotations

import time

import ray

HEARTBEAT_TYPE = "crowler_heartbeat"
HEARTBEAT_RESPONSE_TYPE = "crowler_heartbeat_response"
SYS_EVENT_DB_MAINTENANCE = "db_maintenance"
EVENT_TYPE_SYSTEM = "system_event"
DEFAULT_RESPONSE_TIMEOUT = 15.0
_RUNNING = "running"


def normalize_heartbeat_timeout(raw) -> float:
    """:106-121 — empty/invalid/≤0/<5 s all snap to the default."""
    try:
        timeout = float(raw)
    except (TypeError, ValueError):
        return DEFAULT_RESPONSE_TIMEOUT
    if timeout <= 0 or timeout < 5.0:
        return DEFAULT_RESPONSE_TIMEOUT
    return timeout


def respond_to_heartbeat(bus, event: dict, origin_name: str,
                         pipeline_status: list[dict] | None = None,
                         now: float | None = None) -> int:
    """Engine-replica half: answer a heartbeat request event."""
    return ray.get(bus.publish.remote(
        "", HEARTBEAT_RESPONSE_TYPE, severity="crowler_system_info",
        details={
            "parent_event_id": str(event["event_id"]),
            "origin_name": origin_name,
            "type": "heartbeat_response",
            "pipeline_status": pipeline_status or [],
        }, now=now))


def _response_is_busy(details: dict) -> bool:
    statuses = details.get("pipeline_status")
    if not isinstance(statuses, list):
        return False
    for entry in statuses:
        if not isinstance(entry, dict):
            continue
        for field in ("pipeline_status", "crawling_status",
                      "netinfo_status", "httpinfo_status"):
            if str(entry.get(field, "")).strip().lower() == _RUNNING:
                return True
    return False


class HeartbeatCoordinator:
    def __init__(self, bus, origin_name: str = "events-manager-1",
                 timeout=None, master: str = "",
                 maintenance_interval: float = 0.0):
        self.bus = bus
        self.origin_name = origin_name
        self.timeout = normalize_heartbeat_timeout(
            timeout if timeout is not None else DEFAULT_RESPONSE_TIMEOUT)
        self.master = master.strip().lower()
        self.maintenance_interval = maintenance_interval
        self._active: dict | None = None
        self._last_maintenance: float | None = None

    def start(self, now: float | None = None) -> int | None:
        """Broadcast a round; None while a previous round is open."""
        if self._active is not None:
            return None
        now = time.time() if now is None else now
        parent_id = ray.get(self.bus.publish.remote(
            "", HEARTBEAT_TYPE, severity="crowler_system_info",
            details={"origin_type": "events-manager",
                     "origin_name": self.origin_name,
                     "origin_time": now,
                     "type": "heartbeat_request"},
            ttl_seconds=self.timeout, now=now))
        self._active = {"parent_id": parent_id, "sent_at": now,
                        "responses": {}}
        return parent_id

    def maybe_handle_response(self, event: dict) -> bool:
        """:188-217 — consume a matching response; False otherwise."""
        if self._active is None:
            return False
        if (event.get("event_type") or "").strip().lower() != \
                HEARTBEAT_RESPONSE_TYPE:
            return False
        details = event.get("details") or {}
        if str(details.get("parent_event_id")) != \
                str(self._active["parent_id"]):
            return False
        responder = details.get("origin_name") or \
            f"src-{event.get('event_id')}"
        self._active["responses"][responder] = event
        return True

    def collect(self, now: float | None = None) -> int:
        """Poll the bus for pending responses (the reference hooks into
        processEvent; here a poll pass drains them)."""
        if self._active is None:
            return 0
        consumed = 0
        for event in ray.get(self.bus.poll.remote(
                HEARTBEAT_RESPONSE_TYPE, now)):
            if self.maybe_handle_response(event):
                ray.get(self.bus.ack.remote(event["event_id"]))
                consumed += 1
        return consumed

    def _can_schedule_maintenance(self, now: float) -> bool:
        """:326-345 — interval gate; records the grant."""
        if self.maintenance_interval <= 0:
            return False
        if self._last_maintenance is not None and \
                now - self._last_maintenance < self.maintenance_interval:
            return False
        self._last_maintenance = now
        return True

    def finish(self, now: float | None = None) -> dict:
        """Close the round → HeartbeatReport; master schedules the
        db_maintenance event when the fleet is idle (:222-323)."""
        if self._active is None:
            return {"parent_id": None, "total": 0, "responders": [],
                    "raw": [], "all_idle": False,
                    "maintenance_scheduled": False}
        now = time.time() if now is None else now
        state, self._active = self._active, None
        responses = state["responses"]
        all_idle = not any(_response_is_busy(e.get("details") or {})
                           for e in responses.values())
        scheduled = False
        if all_idle and self.origin_name.strip().lower() == self.master \
                and self._can_schedule_maintenance(now):
            ray.get(self.bus.publish.remote(
                SYS_EVENT_DB_MAINTENANCE, EVENT_TYPE_SYSTEM,
                severity="low",
                details={"action": SYS_EVENT_DB_MAINTENANCE,
                         "reason": "all_fleet_idle", "time": now},
                now=now))
            scheduled = True
        return {"parent_id": state["parent_id"],
                "total": len(responses),
                "responders": sorted(responses),
                "raw": list(responses.values()),
                "all_idle": all_idle,
                "maintenance_scheduled": scheduled}
