"""IMAP IDLE listener (reference ``pkg/mail/imap_idle_listener.go``).

One long-lived authenticated session per selected priority mailbox sits
in IDLE; a server update is only a *hint* — the listener leaves IDLE,
submits the mailbox to the event sink (whose durable reconciliation owns
actual progress), and resumes (:55-60, 203-258). Mirrored semantics:

- mailbox selection: config include order is the priority order with
  case-insensitive id/name matching and exclusion; no include → caller
  order, deduped by identity (:406-446);
- per-mailbox reconnect loops with doubling backoff capped at the
  maximum (``next_backoff``: jump to max once past half, :270-276);
- IDLE reissue on an interval (servers drop silent connections);
- a sink failure is fatal for the listener (the hint could not be
  recorded — better to stop than silently lose change signals), while
  connect/IDLE failures only degrade and retry (:149-180);
- a concurrency-safe status snapshot: running/degraded/active vs
  expected sessions/reconnect count/last error, cleared on recovery.

The protocol client is the fakeable boundary (``client_factory``), same
as the reference's ``imapIdleClientFactory`` — the real socket client
lives with the IMAP connector in ``mailbox.py``; tests drive the
listener with scripted fake clients.
"""

from __future__ import annotations

import threading


def next_backoff(current: float, maximum: float) -> float:
    if current >= maximum or current > maximum / 2:
        return maximum
    return current * 2


def _mailbox_name(mailbox: dict) -> str:
    return (mailbox.get("id") or "").strip() or \
        (mailbox.get("name") or "").strip()


def priority_mailboxes(mailboxes: list[dict], include: list[str],
                       exclude: list[str]) -> list[dict]:
    """priorityIMAPMailboxes (:406-446)."""
    by_name = {}
    for key in mailboxes:
        mailbox = key.get("mailbox") or {}
        for name in (mailbox.get("id", ""), mailbox.get("name", "")):
            name = (name or "").strip().lower()
            if name:
                by_name[name] = key
    excluded = {e.strip().lower() for e in exclude if e.strip()}
    selected, seen = [], set()

    def append(key: dict) -> None:
        mailbox = key.get("mailbox") or {}
        identity = _mailbox_name(mailbox).lower()
        if not identity or identity in seen:
            return
        names = {(mailbox.get("id") or "").strip().lower(),
                 (mailbox.get("name") or "").strip().lower()} - {""}
        if names & excluded:
            return
        seen.add(identity)
        selected.append(key)

    if include:
        for configured in include:
            key = by_name.get(configured.strip().lower())
            if key is not None:
                append(key)
        return selected
    for key in mailboxes:
        append(key)
    return selected


class ImapIdleListener:
    """``client_factory() -> client`` with the fakeable protocol:
    ``authenticate(auth)``, ``select_mailbox(name)``,
    ``idle(stop_event, timeout) -> "change"|"timeout"|raise``,
    ``logout()``/``close()``. ``sink.notify(mailbox_key)`` records the
    hint (raise → listener stops)."""

    def __init__(self, client_factory, auth=None,
                 include: list[str] | None = None,
                 exclude: list[str] | None = None,
                 reconnect_backoff: float = 0.05,
                 max_reconnect_backoff: float = 1.0,
                 idle_reissue_interval: float = 60.0):
        if client_factory is None:
            raise ValueError("client factory is required")
        self.client_factory = client_factory
        self.auth = auth
        self.include = list(include or [])
        self.exclude = list(exclude or [])
        self.reconnect_backoff = reconnect_backoff
        self.max_reconnect_backoff = max_reconnect_backoff
        self.idle_reissue_interval = idle_reissue_interval
        self._mu = threading.Lock()
        self._running = False
        self._states: dict[str, dict] = {}
        self._reconnects = 0
        self._last_error = ""
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._fatal: Exception | None = None

    # -- status --------------------------------------------------------------
    def status(self) -> dict:
        with self._mu:
            active = sum(1 for s in self._states.values() if s["active"])
            return {
                "running": self._running,
                "degraded": self._running and
                any(not s["active"] for s in self._states.values()),
                "active_sessions": active,
                "expected_sessions": len(self._states),
                "reconnect_count": self._reconnects,
                "last_error": self._last_error,
            }

    # -- lifecycle -----------------------------------------------------------
    def listen(self, mailboxes: list[dict], sink) -> None:
        """Start one thread per selected mailbox; non-blocking (call
        ``stop()`` to end). Raises if already running or sink missing."""
        if sink is None:
            raise ValueError("event sink is required")
        selected = priority_mailboxes(mailboxes, self.include, self.exclude)
        with self._mu:
            if self._running:
                raise RuntimeError("IMAP IDLE listener is already running")
            self._running = True
            self._states = {
                _mailbox_name(k.get("mailbox") or {}).lower():
                {"active": False, "last_error": ""} for k in selected}
        self._stop.clear()
        self._fatal = None
        self._threads = []
        for key in selected:
            t = threading.Thread(target=self._listen_mailbox,
                                 args=(key, sink), daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> Exception | None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5)
        with self._mu:
            self._running = False
        return self._fatal

    # -- per-mailbox loop ----------------------------------------------------
    def _listen_mailbox(self, key: dict, sink) -> None:
        state_key = _mailbox_name(key.get("mailbox") or {}).lower()
        backoff = self.reconnect_backoff
        while not self._stop.is_set():
            client = None
            try:
                client = self.client_factory()
                client.authenticate(self.auth)
                client.select_mailbox(_mailbox_name(key["mailbox"]))
                self._mark(state_key, active=True, error="")
                self._run_idle_session(client, key, sink)
            except _SinkError as e:
                self._mark(state_key, active=False, error=str(e))
                self._fatal = e.cause
                self._stop.set()
                return
            except Exception as e:
                self._mark(state_key, active=False, error=str(e))
            finally:
                if client is not None:
                    try:
                        client.logout()
                    except Exception:
                        pass
                    try:
                        client.close()
                    except Exception:
                        pass
            with self._mu:
                self._reconnects += 1
            if self._stop.wait(backoff):
                return
            backoff = next_backoff(backoff, self.max_reconnect_backoff)

    def _run_idle_session(self, client, key: dict, sink) -> None:
        while not self._stop.is_set():
            outcome = client.idle(self._stop, self.idle_reissue_interval)
            if self._stop.is_set():
                return
            if outcome == "timeout":
                continue  # reissue IDLE
            if outcome != "change":
                raise RuntimeError(
                    "IDLE session ended without a change notification")
            try:
                sink.notify(key)
            except Exception as e:
                raise _SinkError(e) from e

    def _mark(self, state_key: str, active: bool, error: str) -> None:
        with self._mu:
            if state_key in self._states:
                self._states[state_key] = {"active": active,
                                           "last_error": error}
            if error:
                self._last_error = error
            elif all(s["active"] for s in self._states.values()):
                self._last_error = ""


class _SinkError(Exception):
    def __init__(self, cause: Exception):
        super().__init__(str(cause))
        self.cause = cause


# -- polling listener (reference pkg/mail/polling_listener.go) ---------------

class PollingListener:
    """Serial reconciliation passes: the first pass runs immediately and
    each interval starts only after the previous pass completes (one-shot
    waits, so a slow connector can never overlap itself,
    polling_listener.go:28-52,96-166). The loop fails fast on the first
    reconcile or scheduler error. ``scheduler(stop_event, interval) ->
    bool`` returns False when stopped mid-wait (tests inject one to
    advance time deterministically)."""

    def __init__(self, reconcile, interval: float, scheduler=None):
        if reconcile is None:
            raise ValueError("reconciler is required")
        if interval <= 0:
            raise ValueError("interval must be greater than zero")
        self.reconcile = reconcile
        self.interval = interval
        self.scheduler = scheduler or \
            (lambda stop, interval: not stop.wait(interval))
        self._mu = threading.Lock()
        self._running = False
        self.state = "stopped"
        self.last_error = ""
        self.passes = 0

    def run(self, mailboxes: list[dict], stop_event: threading.Event,
            max_passes: int = 0) -> None:
        """Blocking loop; ``stop_event`` ends it cleanly. ``max_passes``
        bounds the loop for tests (0 = until stopped). Raises the first
        reconcile error after recording the failed state."""
        with self._mu:
            if self._running:
                raise RuntimeError("polling listener is already running")
            self._running = True
        self.state = "starting"
        mailboxes = list(mailboxes)
        try:
            while not stop_event.is_set():
                for mailbox in mailboxes:
                    if stop_event.is_set():
                        return
                    try:
                        self.reconcile(mailbox)
                    except Exception as e:
                        self.state = "failed"
                        self.last_error = str(e)
                        raise
                self.passes += 1
                self.state = "running"
                if max_passes and self.passes >= max_passes:
                    return
                if not self.scheduler(stop_event, self.interval):
                    return
        finally:
            with self._mu:
                self._running = False
            if self.state != "failed":
                self.state = "stopped"
