"""Push-notification decoder tests (pkg/mail/gmail_push.go +
graph_notifications.go): envelope validation, account normalization,
monotonic watermark, clientState auth, change/lifecycle mapping, batch
dedup and bounded redelivery suppression."""

import base64
import json

import pytest

from thecrowler_ray.sources.mail_push import (
    GmailPushReceiver,
    GraphChangeNotificationReceiver,
    MalformedGmailPush,
    MalformedGraphNotification,
    decode_gmail_push,
    decode_graph_notifications,
)


def _gmail_payload(email="User@Example.com", history="42", raw_b64=False):
    data = json.dumps({"emailAddress": email, "historyId": history}).encode()
    b64 = base64.b64encode(data).decode()
    if raw_b64:
        b64 = b64.rstrip("=")
    return json.dumps({"message": {"data": b64}}).encode()


def test_gmail_decode_happy_path():
    ev = decode_gmail_push(_gmail_payload())
    assert ev["provider"] == "gmail"
    assert ev["account_id"] == "user@example.com"  # lowercased
    assert ev["cursor"]["history_id"] == 42
    assert ev["mailbox"] == {"id": "*", "name": "All mailboxes"}
    assert len(ev["safe_identity"]) == 64
    # raw (unpadded) base64 also accepted
    assert decode_gmail_push(
        _gmail_payload(raw_b64=True))["cursor"]["history_id"] == 42


def test_gmail_decode_rejections():
    with pytest.raises(MalformedGmailPush):
        decode_gmail_push(b"")
    with pytest.raises(MalformedGmailPush):
        decode_gmail_push(b'{"message": {"data": ""}}')
    with pytest.raises(MalformedGmailPush):
        decode_gmail_push(b'{"message": {"data": "!!!"}}')
    # trailing JSON value rejected
    with pytest.raises(MalformedGmailPush):
        decode_gmail_push(_gmail_payload() + b' {"second": 1}')
    for bad_email in ("", "two@@example.com", "a b@example.com",
                     "Display Name <x@example.com>", "x" * 300 + "@e.com"):
        with pytest.raises(MalformedGmailPush):
            decode_gmail_push(_gmail_payload(email=bad_email))
    for bad_history in ("0", "-1", "abc", ""):
        with pytest.raises(MalformedGmailPush):
            decode_gmail_push(_gmail_payload(history=bad_history))
    with pytest.raises(MalformedGmailPush):
        decode_gmail_push(b"x" * ((1 << 20) + 1))


def test_gmail_receiver_monotonic_watermark():
    accepted = []
    r = GmailPushReceiver(accepted.append)
    assert r.handle(_gmail_payload(history="10")) is True
    assert r.handle(_gmail_payload(history="10")) is False  # duplicate
    assert r.handle(_gmail_payload(history="9")) is False   # out of order
    assert r.handle(_gmail_payload(history="11")) is True
    # other accounts have independent watermarks
    assert r.handle(_gmail_payload(email="b@example.com", history="1"))
    assert len(accepted) == 3

    # watermark only advances after a successful enqueue
    def failing(event):
        raise RuntimeError("queue down")

    r2 = GmailPushReceiver(failing)
    with pytest.raises(RuntimeError):
        r2.handle(_gmail_payload(history="5"))
    assert r2.latest == {}


GRAPH_CFG = {"account_id": "acct-1", "mailbox": {"id": "inbox-id",
                                                 "name": "Inbox"},
             "client_state": "secret-state", "subscription_id": "sub-1"}


def _graph_payload(*notifications):
    return json.dumps({"value": list(notifications)}).encode()


def _notif(**over):
    base = {"id": "n1", "subscriptionId": "sub-1",
            "clientState": "secret-state", "changeType": "created",
            "resource": "me/messages/m1",
            "resourceData": {"id": "m1"}}
    base.update(over)
    return base


def test_graph_decode_and_mapping():
    events = decode_graph_notifications(
        _graph_payload(_notif(),
                       _notif(id="n2", changeType="deleted"),
                       _notif(id="n3", changeType=None,
                              resource=None,
                              lifecycleEvent="reauthorizationRequired"),
                       _notif(id="n4", changeType=None, resource=None,
                              lifecycleEvent="subscriptionRemoved")),
        GRAPH_CFG)
    kinds = [(e["change_type"], e["metadata"]["listener_status"])
             for e in events]
    assert kinds == [("upsert", "active"), ("delete", "active"),
                     ("reset", "degraded"), ("reset", "stopped")]
    assert all(e["provider"] == "graph" and e["account_id"] == "acct-1"
               for e in events)
    # batch-internal duplicates collapse (same notification JSON)
    again = decode_graph_notifications(
        _graph_payload(_notif(), _notif()), GRAPH_CFG)
    assert len(again) == 1


def test_graph_rejections():
    with pytest.raises(MalformedGraphNotification):
        decode_graph_notifications(_graph_payload(), GRAPH_CFG)
    with pytest.raises(MalformedGraphNotification):
        decode_graph_notifications(
            _graph_payload(_notif(clientState="wrong")), GRAPH_CFG)
    with pytest.raises(MalformedGraphNotification):
        decode_graph_notifications(
            _graph_payload(_notif(subscriptionId="other")), GRAPH_CFG)
    with pytest.raises(MalformedGraphNotification):
        decode_graph_notifications(
            _graph_payload(_notif(changeType="archived")), GRAPH_CFG)
    # both or neither of changeType/lifecycleEvent
    with pytest.raises(MalformedGraphNotification):
        decode_graph_notifications(
            _graph_payload(_notif(lifecycleEvent="missed")), GRAPH_CFG)
    with pytest.raises(MalformedGraphNotification):
        decode_graph_notifications(
            _graph_payload(_notif(changeType=None)), GRAPH_CFG)
    # change notifications need a resource
    with pytest.raises(MalformedGraphNotification):
        decode_graph_notifications(
            _graph_payload(_notif(resource="")), GRAPH_CFG)
    # config validation
    with pytest.raises(MalformedGraphNotification):
        decode_graph_notifications(_graph_payload(_notif()),
                                   {**GRAPH_CFG, "client_state": ""})
    with pytest.raises(MalformedGraphNotification):
        decode_graph_notifications(_graph_payload(_notif()),
                                   {**GRAPH_CFG, "account_id": " "})


def test_graph_receiver_redelivery_suppression():
    accepted = []
    r = GraphChangeNotificationReceiver(accepted.append, GRAPH_CFG,
                                        capacity=2)
    assert r.handle(_graph_payload(_notif())) == 1
    assert r.handle(_graph_payload(_notif())) == 0  # redelivery
    assert r.handle(_graph_payload(_notif(id="n2"),
                                   _notif(id="n3"))) == 2
    # capacity 2: n1 evicted, redelivery of n1 accepted again
    assert r.handle(_graph_payload(_notif())) == 1
    assert len(accepted) == 4
