"""IMAP IDLE listener tests (pkg/mail/imap_idle_listener.go): priority
selection, change→notify→resume, reconnect with backoff, fatal sink
errors, status snapshots."""

import threading
import time

import pytest

from thecrowler_ray.sources.mail_idle import (
    ImapIdleListener,
    next_backoff,
    priority_mailboxes,
)


def _key(name):
    return {"provider": "imap", "account_id": "a",
            "mailbox": {"id": "", "name": name}}


def test_backoff_curve():
    assert next_backoff(0.05, 1.0) == 0.1
    assert next_backoff(0.4, 1.0) == 0.8
    assert next_backoff(0.6, 1.0) == 1.0  # past half → max
    assert next_backoff(1.0, 1.0) == 1.0


def test_priority_selection():
    keys = [_key("INBOX"), _key("Archive"), _key("Spam"), _key("INBOX")]
    # include order is priority order, case-insensitive, exclusion wins
    sel = priority_mailboxes(keys, include=["archive", "inbox", "nope"],
                             exclude=["spam"])
    assert [k["mailbox"]["name"] for k in sel] == ["Archive", "INBOX"]
    # no include → caller order deduped, exclusions still applied
    sel2 = priority_mailboxes(keys, include=[], exclude=["spam"])
    assert [k["mailbox"]["name"] for k in sel2] == ["INBOX", "Archive"]


class FakeClient:
    """Scripted IDLE outcomes: each idle() call pops the next action."""

    def __init__(self, script, log):
        self.script = script
        self.log = log

    def authenticate(self, auth):
        self.log.append("auth")
        if self.script and self.script[0] == "auth-fail":
            self.script.pop(0)
            raise ConnectionError("bad credentials")

    def select_mailbox(self, name):
        self.log.append(f"select:{name}")

    def idle(self, stop_event, timeout):
        while True:
            if stop_event.is_set():
                return "stopped"
            if self.script:
                action = self.script.pop(0)
                if action == "die":
                    raise ConnectionError("connection lost")
                return action
            time.sleep(0.005)

    def logout(self):
        self.log.append("logout")

    def close(self):
        self.log.append("close")


class Sink:
    def __init__(self, fail=False):
        self.notified = []
        self.fail = fail

    def notify(self, key):
        if self.fail:
            raise RuntimeError("queue down")
        self.notified.append(key["mailbox"]["name"])


def _wait(cond, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.005)
    return cond()


def test_change_notify_resume_and_reissue():
    log = []
    script = ["timeout", "change", "change"]
    listener = ImapIdleListener(lambda: FakeClient(script, log),
                                idle_reissue_interval=0.05)
    sink = Sink()
    listener.listen([_key("INBOX")], sink)
    assert _wait(lambda: len(sink.notified) == 2)
    st = listener.status()
    assert st["running"] and st["active_sessions"] == 1
    assert not st["degraded"]
    listener.stop()
    assert listener.status()["running"] is False
    assert sink.notified == ["INBOX", "INBOX"]
    assert "select:INBOX" in log


def test_reconnect_on_failure_with_status():
    log = []
    scripts = [["auth-fail"], ["die"], ["change"]]

    def factory():
        return FakeClient(scripts.pop(0) if scripts else [], log)

    listener = ImapIdleListener(factory, reconnect_backoff=0.01,
                                max_reconnect_backoff=0.02)
    sink = Sink()
    listener.listen([_key("INBOX")], sink)
    assert _wait(lambda: len(sink.notified) >= 1)
    st = listener.status()
    assert st["reconnect_count"] >= 2
    listener.stop()
    # the failing sessions cleaned up their clients
    assert log.count("close") >= 2


def test_sink_failure_is_fatal():
    listener = ImapIdleListener(lambda: FakeClient(["change"], []),
                                reconnect_backoff=0.01)
    listener.listen([_key("INBOX")], Sink(fail=True))
    assert _wait(lambda: listener._stop.is_set())
    err = listener.stop()
    assert isinstance(err, RuntimeError)
    st = listener.status()
    assert st["last_error"]


def test_double_listen_rejected():
    listener = ImapIdleListener(lambda: FakeClient([], []))
    listener.listen([_key("INBOX")], Sink())
    with pytest.raises(RuntimeError):
        listener.listen([_key("INBOX")], Sink())
    listener.stop()
    with pytest.raises(ValueError):
        listener.listen([_key("INBOX")], None)


# -- polling listener (polling_listener.go mirrored) -------------------------

from thecrowler_ray.sources.mail_idle import PollingListener


def test_polling_serial_passes_and_failfast():
    calls = []
    waits = []

    def scheduler(stop, interval):
        waits.append(interval)
        return len(waits) < 3  # stop after 3 waits

    pl = PollingListener(lambda mb: calls.append(mb["mailbox"]["name"]),
                         interval=5.0, scheduler=scheduler)
    pl.run([_key("A"), _key("B")], threading.Event())
    # first pass immediate, then one pass per wait; serial order kept
    assert calls[:2] == ["A", "B"]
    assert pl.passes == 3 and waits == [5.0, 5.0, 5.0]
    assert pl.state == "stopped"

    boom = PollingListener(
        lambda mb: (_ for _ in ()).throw(ConnectionError("down")),
        interval=1.0)
    with pytest.raises(ConnectionError):
        boom.run([_key("A")], threading.Event())
    assert boom.state == "failed" and "down" in boom.last_error

    with pytest.raises(ValueError):
        PollingListener(None, 1.0)
    with pytest.raises(ValueError):
        PollingListener(lambda mb: None, 0)


def test_polling_single_run_guard_and_bounded():
    pl = PollingListener(lambda mb: None, interval=0.01)
    stop = threading.Event()
    t = threading.Thread(target=pl.run, args=([_key("A")], stop),
                         daemon=True)
    t.start()
    assert _wait(lambda: pl.passes >= 1)
    with pytest.raises(RuntimeError):
        pl.run([_key("A")], threading.Event())
    stop.set()
    t.join(timeout=5)
    assert pl.state == "stopped"
    # max_passes bounds deterministic tests
    pl2 = PollingListener(lambda mb: None, interval=10.0,
                          scheduler=lambda s, i: True)
    pl2.run([_key("A")], threading.Event(), max_passes=2)
    assert pl2.passes == 2
