"""Listener reconciliation tests
(services/events/email_listener_runtime.go:76-184)."""

from thecrowler_ray.sources.mail_listener import (
    MailListenerManager,
    listener_fingerprint,
    listener_mailboxes,
    load_listener_sources,
)


def _src(sid, interval=60, mailboxes=("INBOX",), url="imap://h/"):
    return {"source_id": sid, "url": url, "disabled": False,
            "config": {"connector": {"provider": "imap"},
                       "auth": {"identity": f"acct{sid}"},
                       "crawl": {"mode": "listen"},
                       "listener": {"enabled": True},
                       "reconciliation": {"poll_interval": interval},
                       "mailboxes": {"include": list(mailboxes)}}}


class Handle:
    def __init__(self):
        self.stopped = False

    def stop(self):
        self.stopped = True


def test_source_eligibility():
    sources = [
        _src(1),
        {**_src(2), "disabled": True},
        {**_src(3), "url": "https://web.example/"},
        _src(4), _src(5),
    ]
    sources[3]["config"]["crawl"]["mode"] = "poll"
    sources[4]["config"]["listener"]["enabled"] = False
    bad = _src(6)
    eligible = load_listener_sources(
        sources + [bad],
        validate=lambda c: (_ for _ in ()).throw(ValueError("boom"))
        if c["auth"]["identity"] == "acct6" else None)
    assert [s["id"] for s in eligible] == [1]


def test_mailboxes_skip_blanks():
    keys = listener_mailboxes(9, _src(9, mailboxes=("INBOX", " ", "",
                                                    "Archive"))["config"])
    assert [k["mailbox"]["name"] for k in keys] == ["INBOX", "Archive"]
    assert keys[0]["source_id"] == "9"


def test_reconcile_lifecycle():
    handles = {}

    def factory(source, mailboxes):
        h = Handle()
        handles.setdefault(source["id"], []).append(h)
        return h

    mgr = MailListenerManager(factory)
    s1, s2 = _src(1), _src(2)
    stats = mgr.reconcile([{"id": s["source_id"], "config": s["config"]}
                           for s in (s1, s2)])
    assert stats["started"] == 2 and mgr.active() == 2
    # unchanged fingerprints → kept, no restart
    stats = mgr.reconcile([{"id": s["source_id"], "config": s["config"]}
                           for s in (s1, s2)])
    assert stats == {"started": 0, "restarted": 0, "stopped": 0,
                     "kept": 2, "failed": 0}
    assert len(handles[1]) == 1
    # config change → old handle stopped, new started
    s1b = _src(1, interval=300)
    assert listener_fingerprint(s1b["config"]) != \
        listener_fingerprint(s1["config"])
    stats = mgr.reconcile([{"id": 1, "config": s1b["config"]},
                           {"id": 2, "config": s2["config"]}])
    assert stats["restarted"] == 1 and stats["kept"] == 1
    assert handles[1][0].stopped and not handles[1][1].stopped
    # removed source → stopped
    stats = mgr.reconcile([{"id": 1, "config": s1b["config"]}])
    assert stats["stopped"] == 1 and mgr.active() == 1
    assert handles[2][0].stopped
    mgr.stop_all()
    assert mgr.active() == 0 and handles[1][1].stopped


def test_failed_start_tolerated():
    def factory(source, mailboxes):
        if source["id"] == 1:
            raise OSError("connect refused")
        return Handle()

    mgr = MailListenerManager(factory)
    stats = mgr.reconcile([{"id": 1, "config": _src(1)["config"]},
                           {"id": 2, "config": _src(2)["config"]}])
    assert stats["failed"] == 1 and stats["started"] == 1
    assert mgr.active() == 1
    # empty include list is also a failed start
    stats = mgr.reconcile([{"id": 3, "config":
                            _src(3, mailboxes=())["config"]},
                           {"id": 2, "config": _src(2)["config"]}])
    assert stats["failed"] == 1 and mgr.active() == 1
