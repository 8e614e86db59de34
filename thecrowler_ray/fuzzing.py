"""URL fuzzing — crawling-rule link generation (§2.10) + lifecycle hooks.

Reimplements (semantics only) ``pkg/crawler/fuzzing_rules.go:28-107``:

- ``fuzz_url(base, rule)``: query-parameter substitution (every fuzzing
  parameter named ``query`` sets its ``selector`` query key to each value,
  only when the base URL already has a query string) + path-segment
  substitution (target elements with selector_type ``path``: first
  occurrence of the selector replaced by each value)
- ``pattern_based`` fuzzing type yields the pattern itself (reference's
  simplification, faithfully kept)

Rule shape (YAML crawling rule): ``{rule_name, target_elements:
[{selector_type, selector}], fuzzing_parameters: [{parameter_name,
selector, fuzzing_type, values|pattern}]}``.

Lifecycle hooks: the reference runs crawling-rule hooks at
pre_crawl / pre_request / post_response / pre_fuzz / per_fuzz_candidate /
post_fuzz / post_crawl (``pkg/ruleset/crawling_lifecycle.go:6-19``,
executed ``fuzzing_rules.go:109-124``). The v0 extension surface is a
registry of plain Python callables per hook point — ``run_hooks`` is called
by pipelines that opt in; JS-plugin execution is out of scope.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

HOOK_POINTS = (
    "pre_crawl",
    "pre_request",
    "post_response",
    "pre_fuzz",
    "per_fuzz_candidate",
    "post_fuzz",
    "post_crawl",
)

_HOOKS: dict[str, list] = {h: [] for h in HOOK_POINTS}


def register_hook(point: str, fn) -> None:
    if point not in _HOOKS:
        raise ValueError(f"unknown hook point {point!r}; valid: {HOOK_POINTS}")
    _HOOKS[point].append(fn)


def clear_hooks(point: str | None = None) -> None:
    for p in ([point] if point else HOOK_POINTS):
        _HOOKS[p] = []


def run_hooks(point: str, payload):
    """Run every registered hook in order; each may transform the payload
    (return None to keep it unchanged)."""
    for fn in _HOOKS.get(point, []):
        result = fn(payload)
        if result is not None:
            payload = result
    return payload


def _fuzz_values(param: dict) -> list[str]:
    if param.get("fuzzing_type") == "pattern_based":
        return [param.get("pattern", "")]
    return list(param.get("values", []))


def fuzz_url(base_url: str, rule: dict) -> list[str]:
    """→ generated candidate URLs, in rule order (deterministic)."""
    parts = urlsplit(base_url)
    out: list[str] = []

    # query-parameter substitution (only if a query string exists)
    if parts.query:
        original = parse_qsl(parts.query, keep_blank_values=True)
        for param in rule.get("fuzzing_parameters", []):
            if param.get("parameter_name") != "query":
                continue
            selector = param.get("selector", "")
            for value in _fuzz_values(param):
                q = dict(original)
                q[selector] = value
                out.append(
                    urlunsplit(
                        (parts.scheme, parts.netloc, parts.path,
                         urlencode(q), parts.fragment)
                    )
                )

    # path-segment substitution
    for target in rule.get("target_elements", []):
        if target.get("selector_type") != "path":
            continue
        selector = target.get("selector", "")
        for param in rule.get("fuzzing_parameters", []):
            if param.get("parameter_name") != "path":
                continue
            for value in _fuzz_values(param):
                new_path = parts.path.replace(selector, value, 1)
                out.append(
                    urlunsplit(
                        (parts.scheme, parts.netloc, new_path,
                         parts.query, parts.fragment)
                    )
                )
    return out


def generate_links(base_url: str, rules: list[dict]) -> list[str]:
    """Fuzzing browsing mode: links are generated, not extracted
    (reference ``generateLinks``, ``pkg/crawler/crawler.go:2084-2100``),
    with the pre_fuzz / per_fuzz_candidate / post_fuzz hooks applied."""
    run_hooks("pre_fuzz", base_url)
    links: list[str] = []
    for rule in rules:
        for link in fuzz_url(base_url, rule):
            link = run_hooks("per_fuzz_candidate", link)
            if link:
                links.append(link)
    run_hooks("post_fuzz", links)
    return links
