"""Static link classification for mail bodies (reference
``pkg/mail/link_classification.go``).

URIs discovered in a message classify by TEXT ONLY — never dereferenced:
mailto/cid/webcal schemes map directly; http(s)/protocol-relative/
relative references layer action semantics with a fixed precedence —
unsubscribe > auth_action > calendar > tracking > remote_image > normal
(:76-99) — so a tracking wrapper whose visible destination is an
unsubscribe endpoint stays ``unsubscribe``. Unsupported schemes
(``data:`` included), control/space/backslash characters, malformed
percent-escapes, and host-less absolute URLs are ``unknown``.
"""

from __future__ import annotations

import posixpath
import re
from urllib.parse import parse_qs, unquote, urlsplit

LINK_NORMAL = "normal"
LINK_TRACKING = "tracking"
LINK_UNSUBSCRIBE = "unsubscribe"
LINK_AUTH_ACTION = "auth_action"
LINK_CALENDAR = "calendar"
LINK_MAILTO = "mailto"
LINK_CID = "cid"
LINK_REMOTE_IMAGE = "remote_image"
LINK_UNKNOWN = "unknown"

_IMAGE_EXT = re.compile(
    r"(?i)\.(?:avif|bmp|gif|ico|jpe?g|png|svg|tiff?|webp)$")
_BAD_ESCAPE = re.compile(r"%(?![0-9A-Fa-f]{2})")


def _contains_unsafe(value: str) -> bool:
    return any(ch.isspace() or ch == "\\" or (ord(ch) < 0x20)
               or ord(ch) == 0x7F for ch in value)


def _normalized(value: str) -> str:
    try:
        value = unquote(value, errors="strict")
    except UnicodeDecodeError:
        pass
    return value.lower()


def _tokens(value: str) -> list[str]:
    return [t for t in re.split(r"[/_-]", value) if t]


def _query_map(raw_query: str) -> dict[str, list[str]]:
    return parse_qs(raw_query, keep_blank_values=True)


def _contains_any(value: str, *tokens: str) -> bool:
    return any(token in value for token in tokens)


def _query_contains_action(query: dict, actions: list[str]) -> bool:
    for key, values in query.items():
        lowered = key.lower()
        if lowered in actions:
            return True
        if lowered in ("action", "operation", "redirect", "redirect_url",
                       "redirect_uri", "destination", "destination_url",
                       "target", "target_url", "url", "next", "continue"):
            for value in values:
                v = value.lower()
                if any(action in v for action in actions):
                    return True
    return False


def _is_unsubscribe(query: dict, path_text: str) -> bool:
    if _contains_any(path_text, "unsubscribe", "optout", "opt-out",
                     "remove-me", "remove_me", "email-preferences",
                     "email_preferences", "subscription-preferences"):
        return True
    return _query_contains_action(
        query, ["unsubscribe", "unsub", "optout", "opt-out"])


def _is_auth_action(query: dict, path_text: str) -> bool:
    if _contains_any(path_text,
                     "verify-email", "verify_email", "email-verification",
                     "email_verification", "confirm-email", "confirm_email",
                     "activate-account", "activate_account",
                     "reset-password", "reset_password", "password-reset",
                     "password_reset", "magic-link", "magic_link",
                     "account-recovery", "account_recovery",
                     "/password/reset", "/account/activate",
                     "/email/verify", "/email/confirm"):
        return True
    if any(seg in ("verify", "confirm", "activate", "reset", "login")
           for seg in _tokens(path_text)) and \
            any(k.lower() in ("token", "code", "key", "signature", "secret")
                for k in query):
        return True
    return _query_contains_action(query, [
        "verify-email", "verify_email", "confirm-email", "confirm_email",
        "activate-account", "activate_account", "reset-password",
        "reset_password", "magic-link", "magic_link", "account-recovery",
        "account_recovery"])


def _is_calendar(path_text: str, query_text: str) -> bool:
    if path_text.rstrip("/").endswith(".ics"):
        return True
    return _contains_any(path_text + " " + query_text,
                         "/calendar/", "/calendar", "add-to-calendar",
                         "add_to_calendar", "calendar-event",
                         "calendar_event", "event.ics", "format=ics",
                         "output=ics")


def _is_tracking(host: str, query: dict, path_text: str,
                 query_text: str) -> bool:
    if _contains_any(host, "click.", "clicks.", "track.", "tracker.",
                     "tracking."):
        return True
    clean = posixpath.normpath("/" + path_text).strip("/")
    if any(seg in ("click", "clicks", "track", "tracking", "redirect",
                   "redir") for seg in _tokens(clean)):
        return True
    if any(k.lower() in ("redirect", "redirect_url", "redirect_uri",
                         "destination", "destination_url", "target",
                         "target_url") for k in query):
        return True
    return _contains_any(path_text + " " + query_text, "tracking-pixel",
                         "tracking_pixel", "open-pixel", "open_pixel")


def _is_remote_image(path_text: str, query_text: str) -> bool:
    if _IMAGE_EXT.search(path_text.rstrip("/")):
        return True
    return _contains_any(path_text + " " + query_text,
                         "/image/", "/images/", "/img/", "format=image",
                         "format=png", "format=jpg", "format=jpeg",
                         "format=gif", "format=webp", "type=image",
                         "content-type=image", "content_type=image")


def classify_link(raw_uri: str) -> str:
    """ClassifyLink (link_classification.go:33-103)."""
    raw_uri = (raw_uri or "").strip()
    if not raw_uri or _contains_unsafe(raw_uri) \
            or _BAD_ESCAPE.search(raw_uri):
        return LINK_UNKNOWN
    try:
        parts = urlsplit(raw_uri)
    except ValueError:
        return LINK_UNKNOWN
    scheme = parts.scheme.lower()
    opaque = parts.path if not parts.netloc else ""

    if scheme == "mailto":
        recipient = _normalized(opaque.split("?", 1)[0])
        if not recipient or "@" not in recipient:
            return LINK_UNKNOWN
        return LINK_MAILTO
    if scheme == "cid":
        return LINK_CID if opaque else LINK_UNKNOWN
    if scheme in ("webcal", "webcals"):
        return LINK_CALENDAR if parts.netloc else LINK_UNKNOWN
    if scheme in ("http", "https"):
        if not parts.netloc:
            return LINK_UNKNOWN
    elif scheme == "":
        if not parts.netloc and not parts.path and not parts.query \
                and not parts.fragment:
            return LINK_UNKNOWN
    else:  # data: and every other scheme
        return LINK_UNKNOWN

    path_text = _normalized(parts.path)
    query_text = _normalized(parts.query)
    query = _query_map(parts.query)
    host = parts.hostname or ""

    if _is_unsubscribe(query, path_text):
        return LINK_UNSUBSCRIBE
    if _is_auth_action(query, path_text):
        return LINK_AUTH_ACTION
    if _is_calendar(path_text, query_text):
        return LINK_CALENDAR
    if _is_tracking(host, query, path_text, query_text):
        return LINK_TRACKING
    if _is_remote_image(path_text, query_text):
        return LINK_REMOTE_IMAGE
    return LINK_NORMAL


# -- link policy (reference pkg/mail/link_policy.go) -------------------------

DECISION_IGNORE = "ignore"
DECISION_RECORD_ONLY = "record-only"
DECISION_ENQUEUE = "enqueue"


def _normalize_policy_host(host: str) -> str:
    host = (host or "").strip().lower().rstrip(".")
    # strip a :port suffix (net.SplitHostPort succeeds only with a port)
    if host.count(":") == 1 and host.rsplit(":", 1)[1].isdigit():
        host = host.rsplit(":", 1)[0]
    return host


def _matches_host_list(host: str, patterns: list[str]) -> bool:
    for pattern in patterns:
        pattern = _normalize_policy_host(pattern)
        if not pattern:
            continue
        if pattern.startswith("*."):
            root = pattern[2:]
            if host != root and host.endswith("." + root):
                return True
            continue
        if host == pattern:
            return True
    return False


def _parse_safe_remote(raw_url: str):
    """parseSafeRemoteLink (link_policy.go:108-126): absolute http(s),
    a host, no userinfo, no unsafe characters."""
    raw_url = (raw_url or "").strip()
    if not raw_url or _contains_unsafe(raw_url):
        return None
    try:
        parts = urlsplit(raw_url)
    except ValueError:
        return None
    if not parts.netloc or parts.username is not None \
            or "@" in parts.netloc:
        return None
    if parts.scheme.lower() not in ("http", "https"):
        return None
    if not parts.hostname:
        return None
    return parts


class LinkPolicyEvaluator:
    """Message-scoped decision engine (link_policy.go:23-105): denylists
    and hard safety rules beat allowlists and remote-follow opt-in; links
    that mutate account state (auth_action/unsubscribe) are at most
    record-only; only safe remote http(s) links on an allowlisted host
    with FollowRemote on can reach the fetch queue."""

    def __init__(self, extract: bool = True, follow_remote: bool = False,
                 suppress_unsubscribe: bool = False,
                 max_links_per_message: int = 0,
                 allowed_schemes: list[str] | None = None,
                 allowlist: list[str] | None = None,
                 denylist: list[str] | None = None):
        self.extract = extract
        self.follow_remote = follow_remote
        self.suppress_unsubscribe = suppress_unsubscribe
        self.max_links = max_links_per_message
        self.allowed_schemes = list(allowed_schemes or [])
        self.allowlist = list(allowlist or [])
        self.denylist = list(denylist or [])
        self.seen = 0

    def evaluate_url(self, raw_url: str) -> str:
        self.seen += 1
        if self.max_links <= 0 or self.seen > self.max_links:
            return DECISION_IGNORE
        if not self.extract:
            return DECISION_IGNORE
        # reclassify from the URL — never trust caller metadata
        classification = classify_link(raw_url)
        parsed = _parse_safe_remote(raw_url)
        if parsed is None:
            return DECISION_IGNORE
        if classification in (LINK_UNKNOWN, LINK_MAILTO, LINK_CID):
            return DECISION_IGNORE
        if self.suppress_unsubscribe and classification == LINK_UNSUBSCRIBE:
            return DECISION_IGNORE
        host = _normalize_policy_host(parsed.hostname)
        if _matches_host_list(host, self.denylist):
            return DECISION_IGNORE
        if classification in (LINK_AUTH_ACTION, LINK_UNSUBSCRIBE):
            return DECISION_RECORD_ONLY
        if not self.follow_remote:
            return DECISION_RECORD_ONLY
        if not any(s.strip().lower() == parsed.scheme.lower()
                   for s in self.allowed_schemes):
            return DECISION_RECORD_ONLY
        if self.allowlist and not _matches_host_list(host, self.allowlist):
            return DECISION_RECORD_ONLY
        return DECISION_ENQUEUE
