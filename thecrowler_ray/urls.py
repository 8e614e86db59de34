"""URL semantics: canonicalization, validation, restriction policy, skip rules.

From-scratch reimplementation of the reference behavior (semantics only, no
code reuse):

- ``normalize_url``        — reference ``pkg/common/url.go:24-32`` /
                             ``pkg/crawler/crawler.go:2104-2114`` (flags&1)
- ``is_url_valid``         — ``pkg/common/url.go:35-68``
- ``combine_urls``         — ``pkg/crawler/crawler.go:2433-2447``
- ``is_external_link``     — ``pkg/crawler/crawler.go:2117-2187`` (restriction
                             levels 0..4) + ``get_domain_parts``
- ``skip_url``             — ``pkg/crawler/crawler.go:2295-2368`` (empty →
                             relative resolve → external policy → unwanted
                             regexes → self-URL → user patterns with ``!``
                             negatives, no-match ⇒ skip)
- ``url_key``              — SHA-1 of the canonicalized URL (the seen-filter
                             key mandated by BASELINE.json's north star).

All functions are pure and vectorization-friendly; the batch stages call them
through numpy object loops only on the (small) link columns, never on body
text.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urlparse

_WEB_SCHEMES = ("http", "https", "ws", "wss", "ftp", "ftps")
_MAIL_HOST_SCHEMES = ("email", "imap", "imaps", "pop3", "pop3s", "gmail", "graph-mail")
_MAIL_PATH_SCHEMES = ("maildir", "mbox")


def normalize_url(url: str, lowercase: bool = True) -> str:
    """Trim spaces, strip trailing ``/``, optionally lowercase.

    This is the seen-set key normalization: two URLs that differ only by a
    trailing slash or by case are the same frontier entry. Trim + rstrip
    repeat to a fixed point — a single pass (the reference's
    TrimSpace+TrimSuffix) is not idempotent when stripping a trailing "/"
    exposes unicode whitespace, and the seen key must be stable under
    re-normalization (matches the reference on all real URLs; only
    whitespace-embedded garbage differs).
    """
    prev = None
    while url != prev:
        prev = url
        url = url.strip().rstrip("/")
    if lowercase:
        url = url.lower()
    return url


def is_url_valid(raw_url: str) -> bool:
    """Scheme-whitelisted, parseable, and (for web schemes) has a dot."""
    if not raw_url:
        return False
    trimmed = raw_url.strip()
    lower = trimmed.lower()
    if any(c in lower for c in (" ", "\n", "\t")):
        return False
    for scheme in _WEB_SCHEMES:
        if lower.startswith(scheme + "://"):
            return "." in lower
    try:
        parsed = urlparse(trimmed)
    except ValueError:
        return False
    scheme = parsed.scheme.lower()
    if scheme in _MAIL_HOST_SCHEMES:
        return lower.startswith(scheme + "://") and bool(parsed.netloc)
    if scheme in _MAIL_PATH_SCHEMES:
        return (
            lower.startswith(scheme + "://")
            and not parsed.netloc
            and parsed.path.startswith("/")
            and parsed.path != "/"
        )
    return False


def combine_urls(base_url: str, relative_url: str) -> str:
    """scheme://host of *base_url* + *relative_url* when the latter is
    root-relative; otherwise *relative_url* unchanged."""
    parsed = urlparse(base_url)
    base = f"{parsed.scheme}://{parsed.netloc}"
    if relative_url.startswith("/"):
        return base + relative_url
    return relative_url


def get_domain_parts(parts: list[str], level: int) -> str:
    """Tail-of-hostname selector used by restriction levels 1..3."""
    n = len(parts)
    if level == 1 and n >= 3:
        return ".".join(parts[-3:])
    if level == 2 and n >= 2:
        return ".".join(parts[-2:])
    if level == 3 and n >= 1:
        return parts[-1]
    return ".".join(parts)


def is_external_link(source_url: str, link_url: str, domain_level: int) -> bool:
    """Restriction policy: 0=exact URL, 1=prefix, 2=SLD, 3=TLD, 4=none."""
    if domain_level == 4:
        return False
    link_url = link_url.strip()
    if link_url.startswith("/"):
        return False  # relative → never external
    try:
        src = urlparse(source_url)
        lnk = urlparse(link_url)
    except ValueError:
        return False
    if domain_level == 0:
        return src.geturl() != lnk.geturl()
    if domain_level == 1:
        return not lnk.geturl().startswith(source_url)
    src_parts = (src.hostname or "").split(".")
    lnk_parts = (lnk.hostname or "").split(".")
    return get_domain_parts(src_parts, domain_level) != get_domain_parts(
        lnk_parts, domain_level
    )


def is_negative_pattern(pattern: str) -> bool:
    return pattern.startswith("!")


def compile_patterns(patterns: list[str]) -> list[re.Pattern]:
    """Precompile unwanted-URL regexes once per actor (never per batch)."""
    return [re.compile(p) for p in patterns]


def skip_url(
    url: str,
    source_url: str,
    restricted: int,
    unwanted: list[re.Pattern] | None = None,
    user_patterns: list[str] | None = None,
    allow_external: bool = False,
) -> bool:
    """The full skip chain, in reference order.

    ``user_patterns`` semantics: first matching pattern decides — a ``!``
    pattern skips, a plain pattern keeps; zero matches ⇒ skip.
    """
    url = url.strip()
    if not url:
        return True
    if url.startswith("/"):
        url = combine_urls(source_url, url)
    if (
        not allow_external
        and restricted != 4
        and is_external_link(source_url, url, restricted)
    ):
        return True
    if unwanted:
        for rx in unwanted:
            if rx.search(url):
                return True
    if url == source_url:
        return True
    if user_patterns:
        matches = 0
        for pattern in user_patterns:
            if re.search(pattern.lstrip("!"), url):
                matches += 1
                if is_negative_pattern(pattern):
                    return True
                break
        if matches == 0:
            return True
    return False


def url_key(url: str) -> bytes:
    """SHA-1 digest of the canonicalized URL — the 20-byte seen-filter key."""
    return hashlib.sha1(normalize_url(url).encode("utf-8")).digest()


def url_key_hex(url: str) -> str:
    return hashlib.sha1(normalize_url(url).encode("utf-8")).hexdigest()


def host_of(url: str) -> str:
    try:
        return (urlparse(url).hostname or "").lower()
    except ValueError:
        return ""


def host_hash(host: str, buckets: int = 1 << 32) -> int:
    """Stable 32-bit host hash (shard / partition key). Uses SHA-1 so the
    partitioning is identical across processes and Python versions (never
    ``hash()``, which is salted per process)."""
    return int.from_bytes(hashlib.sha1(host.encode("utf-8")).digest()[:4], "big") % buckets


def parse_robots_txt(text: str, user_agent: str = "*") -> list[str]:
    """robots.txt → list of Disallow path prefixes for the given agent
    (the most specific matching User-agent group wins; '*' is the
    fallback — standard robots exclusion semantics). Feed the result to the
    politeness actors' robots cache (``stages/politeness.py``)."""
    groups: dict[str, list[str]] = {}
    current: list[str] | None = None
    current_agents: list[str] = []
    saw_rule = True
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if saw_rule:  # a new group starts
                current_agents = []
                saw_rule = False
            agent = value.lower()
            current_agents.append(agent)
            current = groups.setdefault(agent, [])
        elif field == "disallow":
            saw_rule = True
            if value:
                for agent in current_agents:
                    groups.setdefault(agent, []).append(value)
        elif field in ("allow", "crawl-delay", "sitemap"):
            saw_rule = True  # recognized but not modeled (allow-all default)
    ua = user_agent.lower()
    for candidate in (ua, "*"):
        if candidate in groups:
            return groups[candidate]
    return []
