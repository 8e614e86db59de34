"""Mail source-config defaults + validation (reference
``pkg/mail/config/validation.go``).

``validate_source_config`` is the gate every mail source passes before a
provider adapter sees it — the events-service listener loader and the
pipeline both rely on it (it plugs straight into
``mail_listener.load_listener_sources(validate=...)``). Mirrored rules:

- provider/scheme table (imap|imaps, pop3|pop3s, gmail, graph-mail,
  maildir, mbox) with per-provider endpoint shape: local providers need
  an absolute path, no host/TLS; network providers need a host, no
  query/fragment/credentials (gmail may carry a bare username), valid
  port; TLS options only on the secure scheme (:171-256);
- mailbox include/exclude non-empty and disjoint (case-insensitive);
- crawl/limits ordering constraints (attachment ≤ total ≤ message
  bytes, header ≤ message, batch ≤ max messages, every bound > 0);
- extraction: follow_remote requires extract, inline/download/text
  require include, no blank media types;
- safety: remote resources / JavaScript / mailbox mutation are
  unconditionally unsupported; follow_remote needs an allowlist or the
  explicit unrestricted-links opt-in (:354-376);
- listener: positive buffers/backoffs, max ≥ initial backoff,
  enabled ⇔ crawl.mode == listen, push listeners unsupported for
  pop3/maildir/mbox;
- reconciliation: positive intervals, full-sync ≥ poll, lease shorter
  than the poll interval.

Durations are seconds (floats) in this repo's config dialect.
"""

from __future__ import annotations

from urllib.parse import urlsplit

PROVIDER_SCHEMES = {
    "pop3": "pop3", "imap": "imap", "gmail": "gmail",
    "graph-mail": "graph-mail", "maildir": "maildir", "mbox": "mbox",
}

DEFAULT_LIMITS = {
    "max_message_bytes": 25 << 20,
    "max_attachment_bytes": 10 << 20,
    "max_total_attachment_bytes": 25 << 20,
    "max_attachments": 50,
    "max_header_bytes": 1 << 20,
    "max_embedded_message_depth": 3,
    "max_mime_depth": 30,
    "max_mime_parts": 1000,
}


class InvalidMailConfig(ValueError):
    pass


def default_source_config() -> dict:
    """DefaultSourceConfig (:36-83); provider/endpoint/credential_ref
    still required from the caller."""
    return {
        "connector": {"provider": "", "endpoint": "", "proxy_url": "",
                      "timeout": 30.0, "tls": {}},
        "auth": {"credential_ref": "", "identity": ""},
        "mailboxes": {"include": ["INBOX"], "exclude": []},
        "crawl": {"mode": "poll", "batch_size": 100, "max_messages": 1000,
                  "timeout": 600.0, "limits": dict(DEFAULT_LIMITS)},
        "extraction": {
            "links": {"extract": True, "follow_remote": False,
                      "allowed_schemes": ["http", "https"],
                      "allowlist": [], "denylist": [],
                      "max_links_per_message": 100,
                      "suppress_unsubscribe": False},
            "attachments": {"include": False, "include_inline": False,
                            "download": False, "extract_text": False,
                            "allowed_media_types": [],
                            "blocked_media_types": []},
        },
        "safety": {"allow_remote_resources": False,
                   "allow_javascript": False,
                   "allow_mailbox_mutation": False,
                   "allow_unrestricted_links": False},
        "listener": {"enabled": False, "buffer_size": 128,
                     "coalesce_window": 1.0, "reconnect_backoff": 5.0,
                     "max_reconnect_backoff": 60.0,
                     "idle_reissue_interval": 1500.0},
        "reconciliation": {"poll_interval": 300.0,
                           "full_sync_interval": 86400.0,
                           "page_size": 100, "max_pages": 100,
                           "lease_ttl": 120.0},
    }


def _fail(message: str) -> None:
    raise InvalidMailConfig(message)


def _validate_endpoint(raw: str, provider: str, expected_scheme: str,
                       tls: dict) -> None:
    raw = (raw or "").strip()
    if not raw:
        _fail("connector.endpoint is required")
    if any(ch in raw for ch in "\r\n\t "):
        _fail("connector.endpoint must not contain whitespace")
    parts = urlsplit(raw)
    scheme = parts.scheme.lower()
    if provider == "imap":
        if scheme not in ("imap", "imaps"):
            _fail("connector.endpoint scheme must be imap or imaps "
                  f"for provider {provider!r}")
    elif provider == "pop3":
        if scheme not in ("pop3", "pop3s"):
            _fail("connector.endpoint scheme must be pop3 or pop3s "
                  f"for provider {provider!r}")
    elif scheme != expected_scheme:
        _fail(f"connector.endpoint scheme must be {expected_scheme!r} "
              f"for provider {provider!r}")

    tls_set = bool(tls.get("insecure_skip_verify")) or \
        bool((tls.get("server_name") or "").strip())
    if provider in ("maildir", "mbox"):
        if parts.netloc or not parts.path.startswith("/") \
                or parts.path == "/":
            _fail(f"connector.endpoint for provider {provider!r} must "
                  "contain an absolute path and no host")
        if parts.query or parts.fragment:
            _fail(f"connector.endpoint for provider {provider!r} must "
                  "not contain a query or fragment")
        if tls_set:
            _fail(f"connector.tls is not valid for provider {provider!r}")
        return
    if not parts.netloc or not parts.hostname:
        _fail(f"connector.endpoint for provider {provider!r} must "
              "contain a host")
    if parts.query or parts.fragment:
        _fail("connector.endpoint must not contain a query or fragment")
    if "@" in parts.netloc:
        if provider != "gmail" or not parts.username \
                or parts.password is not None:
            _fail("connector.endpoint must not contain credentials")
    try:
        port = parts.port
    except ValueError:
        _fail("connector.endpoint port must be between 1 and 65535")
    else:
        if port is not None and not 1 <= port <= 65535:
            _fail("connector.endpoint port must be between 1 and 65535")

    if provider in ("imap", "pop3"):
        secure = {"imap": "imaps", "pop3": "pop3s"}[provider]
        if scheme != secure and tls_set:
            _fail(f"connector.tls options require an {secure} endpoint")
    elif tls_set:
        _fail("connector.tls options are only supported by network "
              "mail providers")


def _validate_proxy(raw: str) -> None:
    raw = (raw or "").strip()
    if not raw:
        return
    parts = urlsplit(raw)
    if parts.scheme.lower() not in ("socks5", "socks5h", "http", "https"):
        _fail("connector.proxy_url scheme is unsupported")
    if not parts.hostname:
        _fail("connector.proxy_url must contain a host")
    try:
        port = parts.port
    except ValueError:
        _fail("connector.proxy_url port must be between 1 and 65535")
    else:
        if port is not None and not 1 <= port <= 65535:
            _fail("connector.proxy_url port must be between 1 and 65535")


def validate_source_config(config: dict) -> None:
    """ValidateSourceConfig (:86-125). Raises InvalidMailConfig."""
    connector = config.get("connector") or {}
    provider = (connector.get("provider") or "").strip().lower()
    if provider not in PROVIDER_SCHEMES:
        _fail(f"connector.provider {connector.get('provider')!r} "
              "is unsupported")
    _validate_endpoint(connector.get("endpoint", ""), provider,
                       PROVIDER_SCHEMES[provider],
                       connector.get("tls") or {})
    _validate_proxy(connector.get("proxy_url", ""))
    if (connector.get("timeout") or 0) <= 0:
        _fail("connector.timeout must be greater than zero")
    auth = config.get("auth") or {}
    if not (auth.get("credential_ref") or "").strip() \
            and provider not in ("maildir", "mbox"):
        _fail(f"auth.credential_ref is required for provider {provider!r}")

    mailboxes = config.get("mailboxes") or {}
    included = set()
    for name in mailboxes.get("include", []):
        name = (name or "").strip()
        if not name:
            _fail("mailboxes.include must not contain an empty mailbox")
        included.add(name.lower())
    for name in mailboxes.get("exclude", []):
        name = (name or "").strip()
        if not name:
            _fail("mailboxes.exclude must not contain an empty mailbox")
        if name.lower() in included:
            _fail(f"mailbox {name!r} cannot be both included and excluded")

    crawl = config.get("crawl") or {}
    if crawl.get("mode") not in ("poll", "listen"):
        _fail("crawl.mode must be 'poll' or 'listen'")
    if (crawl.get("batch_size") or 0) <= 0:
        _fail("crawl.batch_size must be greater than zero")
    if (crawl.get("max_messages") or 0) <= 0:
        _fail("crawl.max_messages must be greater than zero")
    if crawl["batch_size"] > crawl["max_messages"]:
        _fail("crawl.batch_size must not exceed crawl.max_messages")
    if (crawl.get("timeout") or 0) <= 0:
        _fail("crawl.timeout must be greater than zero")
    limits = crawl.get("limits") or {}
    msg_b = limits.get("max_message_bytes", 0)
    att_b = limits.get("max_attachment_bytes", 0)
    total_b = limits.get("max_total_attachment_bytes", 0)
    if msg_b <= 0:
        _fail("crawl.limits.max_message_bytes must be greater than zero")
    if att_b <= 0:
        _fail("crawl.limits.max_attachment_bytes must be greater than zero")
    if att_b > msg_b:
        _fail("crawl.limits.max_attachment_bytes must not exceed "
              "max_message_bytes")
    if total_b <= 0 or total_b > msg_b:
        _fail("crawl.limits.max_total_attachment_bytes must be greater "
              "than zero and not exceed max_message_bytes")
    if att_b > total_b:
        _fail("crawl.limits.max_attachment_bytes must not exceed "
              "max_total_attachment_bytes")
    for key in ("max_attachments", "max_embedded_message_depth",
                "max_mime_depth", "max_mime_parts"):
        if (limits.get(key) or 0) <= 0:
            _fail(f"crawl.limits.{key} must be greater than zero")
    header_b = limits.get("max_header_bytes", 0)
    if header_b <= 0 or header_b > msg_b:
        _fail("crawl.limits.max_header_bytes must be greater than zero "
              "and not exceed max_message_bytes")

    extraction = config.get("extraction") or {}
    links = extraction.get("links") or {}
    if links.get("follow_remote") and not links.get("extract"):
        _fail("extraction.links.follow_remote requires "
              "extraction.links.extract")
    if (links.get("max_links_per_message") or 0) <= 0:
        _fail("extraction.links.max_links_per_message must be greater "
              "than zero")
    atts = extraction.get("attachments") or {}
    if (atts.get("include_inline") or atts.get("download")
            or atts.get("extract_text")) and not atts.get("include"):
        _fail("attachment inline, download, or text extraction requires "
              "extraction.attachments.include")
    for key in ("allowed_media_types", "blocked_media_types"):
        for value in atts.get(key, []):
            if not (value or "").strip():
                _fail(f"extraction.attachments.{key} must not contain "
                      "an empty value")

    safety = config.get("safety") or {}
    if safety.get("allow_remote_resources"):
        _fail("safety.allow_remote_resources is not supported; message "
              "content must remain static")
    if safety.get("allow_javascript"):
        _fail("safety.allow_javascript is not supported; message content "
              "must not execute JavaScript")
    if safety.get("allow_mailbox_mutation"):
        _fail("safety.allow_mailbox_mutation is not supported; mail "
              "sources must remain read-only")
    if safety.get("allow_unrestricted_links") \
            and not links.get("follow_remote"):
        _fail("safety.allow_unrestricted_links requires "
              "extraction.links.follow_remote")
    if links.get("follow_remote") \
            and not any((v or "").strip() for v in
                        links.get("allowlist", [])) \
            and not safety.get("allow_unrestricted_links"):
        _fail("extraction.links.follow_remote requires a non-empty "
              "allowlist or safety.allow_unrestricted_links=true")

    listener = config.get("listener") or {}
    if (listener.get("buffer_size") or 0) <= 0:
        _fail("listener.buffer_size must be greater than zero")
    if (listener.get("coalesce_window") or 0) <= 0:
        _fail("listener.coalesce_window must be greater than zero")
    if (listener.get("reconnect_backoff") or 0) <= 0:
        _fail("listener.reconnect_backoff must be greater than zero")
    if listener.get("max_reconnect_backoff", 0) < \
            listener["reconnect_backoff"]:
        _fail("listener.max_reconnect_backoff must be at least "
              "listener.reconnect_backoff")
    if (listener.get("idle_reissue_interval") or 0) <= 0:
        _fail("listener.idle_reissue_interval must be greater than zero")
    if crawl["mode"] == "listen" and not listener.get("enabled"):
        _fail("listener.enabled must be true when crawl.mode is 'listen'")
    if listener.get("enabled") and crawl["mode"] != "listen":
        _fail("crawl.mode must be 'listen' when listener.enabled is true")
    if listener.get("enabled") and provider in ("pop3", "maildir", "mbox"):
        _fail(f"listener mode is not supported by provider {provider!r}")

    rec = config.get("reconciliation") or {}
    if (rec.get("poll_interval") or 0) <= 0:
        _fail("reconciliation.poll_interval must be greater than zero")
    if (rec.get("full_sync_interval") or 0) <= 0:
        _fail("reconciliation.full_sync_interval must be greater than zero")
    if rec["full_sync_interval"] < rec["poll_interval"]:
        _fail("reconciliation.full_sync_interval must not be shorter "
              "than poll_interval")
    if (rec.get("page_size") or 0) <= 0:
        _fail("reconciliation.page_size must be greater than zero")
    if (rec.get("max_pages") or 0) <= 0:
        _fail("reconciliation.max_pages must be greater than zero")
    if (rec.get("lease_ttl") or 0) <= 0:
        _fail("reconciliation.lease_ttl must be greater than zero")
    if rec["lease_ttl"] >= rec["poll_interval"]:
        _fail("reconciliation.lease_ttl must be shorter than poll_interval")
