"""Push-notification decoders for mail change hints (reference
``pkg/mail/gmail_push.go`` + ``pkg/mail/graph_notifications.go``).

Gmail publishes mailbox changes through Pub/Sub push envelopes (base64
JSON ``{emailAddress, historyId}``); Microsoft Graph delivers webhook
batches of change notifications authenticated by a clientState secret.
Both decoders are transport-independent — the webhook HTTP route is the
serving seam; everything from the payload bytes on is mirrored here:

- Gmail (:82-143): 1 MiB envelope / 64 KiB data caps, single-JSON-value
  strictness (trailing values rejected), std- or raw-base64 data,
  bounded bare-address account normalization (lowercased), positive
  history id, the ``*``/"All mailboxes" scope, safe identity digest.
  :class:`GmailPushReceiver` enqueues only monotonically newer history
  ids per account, advancing the watermark only after the queue accepts
  the event (:54-80).
- Graph (:106-225): config validation (account + mailbox + bounded
  clientState), constant-time clientState check via SHA-256 compare,
  optional subscription pinning, exactly-one-of changeType /
  lifecycleEvent, created/updated→upsert, deleted→delete, lifecycle
  events→reset with degraded/stopped listener status, per-batch dedup by
  the SHA-256 of the whole notification JSON.
  :class:`GraphChangeNotificationReceiver` additionally suppresses
  redeliveries with a bounded FIFO dedup memory (capacity 4096,
  :260-273), remembering ids only after a successful enqueue.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import re
from collections import OrderedDict

from .mail_events import safe_mailbox_identity

MAX_GMAIL_PUSH_PAYLOAD = 1 << 20
MAX_GMAIL_NOTIFICATION_DATA = 64 << 10
MAX_GRAPH_PAYLOAD = 1 << 20
MAX_GRAPH_CLIENT_STATE = 1024
MAX_EVENT_STRING = 1024
GRAPH_DEDUP_CAPACITY = 4096

GMAIL_PROVIDER = "gmail"
GRAPH_PROVIDER = "graph"


class MalformedGmailPush(ValueError):
    pass


class MalformedGraphNotification(ValueError):
    pass


def _decode_single_json(data: bytes):
    """decodeSingleJSON: exactly one JSON value, no trailing content."""
    decoder = json.JSONDecoder()
    text = data.decode("utf-8")
    value, end = decoder.raw_decode(text.lstrip())
    if text.lstrip()[end:].strip():
        raise ValueError("multiple JSON values")
    return value


_ADDR_LOCAL = re.compile(r"^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+$")


def _safe_gmail_account(value: str) -> str:
    account = (value or "").strip()
    if not account or len(account) > 254 or account.count("@") != 1:
        raise ValueError("account must be a bounded email address")
    if any(ord(ch) > 127 or ord(ch) < 0x21 or ch.isspace()
           for ch in account):
        raise ValueError("account contains unsafe characters")
    local, domain = account.split("@")
    if not local or not domain or not _ADDR_LOCAL.match(local) \
            or domain.startswith(".") or domain.endswith(".") \
            or ".." in domain:
        raise ValueError("account must be a bare email address")
    return account.lower()


def decode_gmail_push(payload: bytes) -> dict:
    """DecodeGmailPushNotification → a provider-neutral change event."""
    if not payload:
        raise MalformedGmailPush("payload is empty")
    if len(payload) > MAX_GMAIL_PUSH_PAYLOAD:
        raise MalformedGmailPush("payload exceeds size limit")
    try:
        envelope = _decode_single_json(payload)
    except (ValueError, UnicodeDecodeError) as e:
        raise MalformedGmailPush(f"decode Pub/Sub envelope: {e}") from e
    data_b64 = ((envelope.get("message") or {}).get("data")
                if isinstance(envelope, dict) else None) or ""
    if not data_b64:
        raise MalformedGmailPush("Pub/Sub message data is empty")
    try:
        try:
            data = base64.b64decode(data_b64, validate=True)
        except ValueError:
            data = base64.b64decode(data_b64 + "=" * (-len(data_b64) % 4),
                                    validate=True)
    except ValueError as e:
        raise MalformedGmailPush(f"decode Pub/Sub message data: {e}") from e
    if len(data) > MAX_GMAIL_NOTIFICATION_DATA:
        raise MalformedGmailPush("decoded message data exceeds size limit")
    try:
        notification = _decode_single_json(data)
    except (ValueError, UnicodeDecodeError) as e:
        raise MalformedGmailPush(f"decode Gmail notification: {e}") from e
    if not isinstance(notification, dict):
        raise MalformedGmailPush("decode Gmail notification: not an object")
    try:
        account = _safe_gmail_account(notification.get("emailAddress", ""))
    except ValueError as e:
        raise MalformedGmailPush(f"invalid Gmail account: {e}") from e
    history_raw = str(notification.get("historyId", ""))
    if not history_raw.isdigit() or int(history_raw) == 0:
        raise MalformedGmailPush("invalid Gmail history ID")
    mailbox = {"id": "*", "name": "All mailboxes"}
    return {
        "provider": GMAIL_PROVIDER,
        "account_id": account,
        "mailbox": mailbox,
        "cursor": {"history_id": int(history_raw)},
        "safe_identity": safe_mailbox_identity(
            GMAIL_PROVIDER, account, mailbox["id"], mailbox["name"]),
        "change_type": "upsert",
        "metadata": {"listener_mode": "push",
                     "listener_status": "active"},
    }


class GmailPushReceiver:
    """Monotonic per-account history watermark; the watermark advances
    only after a successful enqueue so failed deliveries retry."""

    def __init__(self, queue):
        if queue is None:
            raise ValueError("Gmail push receiver requires a queue")
        self.queue = queue
        self.latest: dict[str, int] = {}

    def handle(self, payload: bytes) -> bool:
        event = decode_gmail_push(payload)
        if event["cursor"]["history_id"] <= \
                self.latest.get(event["account_id"], 0):
            return False
        self.queue(event)
        self.latest[event["account_id"]] = event["cursor"]["history_id"]
        return True


# -- Microsoft Graph ---------------------------------------------------------

def _validate_graph_config(config: dict) -> None:
    if not (config.get("account_id") or "").strip():
        raise MalformedGraphNotification("configured account ID is required")
    mailbox = config.get("mailbox") or {}
    if not (mailbox.get("id") or "").strip() \
            and not (mailbox.get("name") or "").strip():
        raise MalformedGraphNotification(
            "configured mailbox requires an ID or name")
    client_state = config.get("client_state", "")
    if not client_state:
        raise MalformedGraphNotification("configured clientState is required")
    if len(client_state) > MAX_GRAPH_CLIENT_STATE:
        raise MalformedGraphNotification(
            "configured clientState exceeds size limit")
    if len(config.get("subscription_id", "")) > MAX_EVENT_STRING:
        raise MalformedGraphNotification(
            "configured subscription ID exceeds size limit")


def _constant_time_equal(actual: str, expected: str) -> bool:
    return hmac.compare_digest(
        hashlib.sha256(actual.encode()).digest(),
        hashlib.sha256(expected.encode()).digest())


def _graph_event(notification: dict, config: dict) -> dict:
    if not (notification.get("subscriptionId") or "").strip():
        raise ValueError("subscriptionId is required")
    if config.get("subscription_id") and \
            notification["subscriptionId"] != config["subscription_id"]:
        raise ValueError(
            "subscriptionId does not match configured subscription")
    if not _constant_time_equal(notification.get("clientState", ""),
                                config.get("client_state", "")):
        raise ValueError("clientState does not match configured secret")
    change_type = (notification.get("changeType") or "").strip()
    lifecycle = (notification.get("lifecycleEvent") or "").strip()
    if bool(change_type) == bool(lifecycle):
        raise ValueError(
            "exactly one of changeType or lifecycleEvent is required")
    status = "active"
    if change_type:
        if not (notification.get("resource") or "").strip():
            raise ValueError("resource is required for a change notification")
        if change_type in ("created", "updated"):
            kind = "upsert"
        elif change_type == "deleted":
            kind = "delete"
        else:
            raise ValueError(f"unsupported changeType {change_type!r}")
    else:
        kind = "reset"
        if lifecycle in ("reauthorizationRequired", "missed"):
            status = "degraded"
        elif lifecycle == "subscriptionRemoved":
            status = "stopped"
        else:
            raise ValueError(f"unsupported lifecycleEvent {lifecycle!r}")
    event_id = hashlib.sha256(
        json.dumps(notification, sort_keys=True,
                   separators=(",", ":")).encode()).hexdigest()
    mailbox = config.get("mailbox") or {}
    return {
        "provider": GRAPH_PROVIDER,
        "account_id": (config.get("account_id") or "").strip(),
        "mailbox": mailbox,
        "cursor": {"token": event_id},
        "safe_identity": safe_mailbox_identity(
            GRAPH_PROVIDER, config.get("account_id", ""),
            mailbox.get("id", ""), mailbox.get("name", "")),
        "change_type": kind,
        "metadata": {"event_id": event_id, "listener_mode": "webhook",
                     "listener_status": status},
    }


def decode_graph_notifications(payload: bytes, config: dict) -> list[dict]:
    """DecodeGraphChangeNotifications: validate the whole batch, dedup
    within it, fail the batch on the first bad value."""
    _validate_graph_config(config)
    if not payload:
        raise MalformedGraphNotification("payload is empty")
    if len(payload) > MAX_GRAPH_PAYLOAD:
        raise MalformedGraphNotification("payload exceeds size limit")
    try:
        collection = _decode_single_json(payload)
    except (ValueError, UnicodeDecodeError) as e:
        raise MalformedGraphNotification(
            f"decode notification collection: {e}") from e
    values = (collection.get("value")
              if isinstance(collection, dict) else None) or []
    if not values:
        raise MalformedGraphNotification("notification collection is empty")
    events, seen = [], set()
    for index, notification in enumerate(values):
        try:
            event = _graph_event(notification, config)
        except ValueError as e:
            raise MalformedGraphNotification(
                f"value[{index}]: {e}") from e
        if event["metadata"]["event_id"] in seen:
            continue
        seen.add(event["metadata"]["event_id"])
        events.append(event)
    return events


class GraphChangeNotificationReceiver:
    """Bounded-FIFO redelivery suppression (capacity 4096), ids
    remembered only after the queue accepts the event."""

    def __init__(self, queue, config: dict,
                 capacity: int = GRAPH_DEDUP_CAPACITY):
        if queue is None:
            raise ValueError("Graph receiver requires a queue")
        _validate_graph_config(config)
        self.queue = queue
        self.config = config
        self.capacity = capacity
        self.seen: OrderedDict[str, None] = OrderedDict()

    def handle(self, payload: bytes) -> int:
        events = decode_graph_notifications(payload, self.config)
        accepted = 0
        for event in events:
            event_id = event["metadata"]["event_id"]
            if event_id in self.seen:
                continue
            self.queue(event)
            if self.capacity > 0:
                if len(self.seen) >= self.capacity:
                    self.seen.popitem(last=False)
                self.seen[event_id] = None
            accepted += 1
        return accepted
