"""Page-load validation rules (M18).

Reimplements (semantics only) ``pkg/crawler/page_validation.go`` against the
local DOM (no live WebDriver — checks evaluate on fetched HTML; the per-check
wait/timeout of the reference is a browser concern with no data-plane
effect):

- config shape ``load_validation.groups[]``: ``url_pattern`` gate,
  ``validations[]`` (OR by default; each with ``dom_checks[]`` and
  ``all_checks_must_pass``), group-level ``on_fail`` →
  retry / skip / log_only / mark_invalid / none
- dom_check: CSS selector + ANY-of conditions (exists / not_exists / text /
  attribute / count with regex ``pattern`` and min/max counts); no
  conditions ⇒ "exists ≥ 1"
- first passing validation ⇒ Valid; all validations *broken* (malformed) ⇒
  fail-open Valid; per-validation ``on_fail: retry`` takes precedence over
  the group action; first matching group decides.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .htmldom import css_select, parse_dom

VA_NONE = "none"
VA_RETRY = "retry"
VA_SKIP = "skip"
VA_FAIL = "fail"
VA_LOG_ONLY = "log_only"


@dataclass
class ValidationStatus:
    valid: bool
    action: str = VA_NONE
    retry_key: str = ""
    max_retries: int = 0
    reason: str = ""


def _eval_condition(cond: dict, elems: list) -> bool:
    ctype = str(cond.get("type", "exists")).lower()
    if ctype == "exists":
        return len(elems) >= int(cond.get("min_count", 1) or 1)
    if ctype == "not_exists":
        return len(elems) == 0
    if ctype == "count":
        n = len(elems)
        lo = cond.get("min_count")
        hi = cond.get("max_count")
        if lo is not None and n < int(lo):
            return False
        if hi is not None and n > int(hi):
            return False
        return True
    if ctype == "text":
        pat = cond.get("pattern", "")
        return any(re.search(pat, e.text()) for e in elems)
    if ctype == "attribute":
        attr = cond.get("attribute", "")
        pat = cond.get("pattern", "")
        return any(re.search(pat, e.get(attr, "")) for e in elems)
    raise ValueError(f"unknown condition type {ctype!r}")


def _eval_dom_check(check: dict, root) -> bool:
    elems = css_select(root, check.get("selector", ""))
    conditions = check.get("conditions") or []
    if not conditions:
        return len(elems) >= 1
    for cond in conditions:  # ANY-of
        try:
            if _eval_condition(cond, elems):
                return True
        except ValueError:
            continue
    return False


def _eval_validation(validation: dict, root) -> tuple[bool, bool]:
    """→ (passed, broken). Broken = malformed enough to be non-actionable."""
    checks = validation.get("dom_checks") or []
    if not checks:
        return True, False
    all_must = bool(validation.get("all_checks_must_pass", False))
    try:
        if all_must:
            return all(_eval_dom_check(c, root) for c in checks), False
        return any(_eval_dom_check(c, root) for c in checks), False
    except Exception:
        return False, True


def apply_load_validation(config: dict, html: str, url: str) -> ValidationStatus:
    """Evaluate ``crawling_config.load_validation`` for a fetched page."""
    lv = (config or {}).get("load_validation") or {}
    groups = lv.get("groups") or []
    if not groups:
        return ValidationStatus(valid=True)
    root = parse_dom(html)

    for g_idx, group in enumerate(groups):
        pattern = group.get("url_pattern", "")
        if pattern:
            try:
                if not re.search(pattern, url):
                    continue
            except re.error:
                continue

        any_actionable = False
        pending_retry: ValidationStatus | None = None
        for v_idx, validation in enumerate(group.get("validations") or []):
            passed, broken = _eval_validation(validation, root)
            if broken:
                continue
            any_actionable = True
            if passed:
                return ValidationStatus(valid=True)
            if (
                str(validation.get("on_fail", "")).lower() == "retry"
                and int(validation.get("max_retries", 0)) > 0
                and pending_retry is None
            ):
                pending_retry = ValidationStatus(
                    valid=False,
                    action=VA_RETRY,
                    retry_key=f"g{g_idx}.v{v_idx}",
                    max_retries=int(validation["max_retries"]),
                    reason="per-validation retry",
                )

        if not any_actionable:
            return ValidationStatus(valid=True, reason="all validations broken; fail-open")
        if pending_retry is not None:
            return pending_retry

        on_fail = str(group.get("on_fail", "")).strip().lower()
        if on_fail == "retry":
            if int(group.get("max_retries", 0)) > 0:
                return ValidationStatus(
                    valid=False,
                    action=VA_RETRY,
                    retry_key=f"g{g_idx}",
                    max_retries=int(group["max_retries"]),
                    reason="group retry",
                )
            return ValidationStatus(valid=False, action=VA_NONE,
                                    reason="group retry without budget")
        if on_fail == "skip":
            return ValidationStatus(valid=False, action=VA_SKIP)
        if on_fail == "log_only":
            return ValidationStatus(valid=True, action=VA_LOG_ONLY)
        if on_fail == "mark_invalid":
            return ValidationStatus(valid=False, action=VA_FAIL)
        return ValidationStatus(valid=False, action=VA_NONE)

    return ValidationStatus(valid=True)
