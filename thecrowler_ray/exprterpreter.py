"""ExprTerpreter — the reference's mini expression language for config values.

Reimplements (semantics only) ``pkg/exprterpreter/exprterpreter.go:140-265``:
``get_float`` / ``get_int`` accept a plain numeric literal or a command:

- ``random(min, max)`` — uniform value in [min, max] (the reference uses
  crypto rand; here a seedable RNG so tests/benches pin it — pass
  ``rng=random.Random(seed)``)
- ``time(unit)`` — current time: ``unix`` seconds (default), ``ms``,
  ``hour``, ``minute``
- nested commands allowed as arguments: ``random(1, random(2, 3))``

Plus the human-duration parser (``pkg/crawler/crawler.go:541-644``):
``parse_duration("3 days") → 259200.0`` with optional clamping.
"""

from __future__ import annotations

import random as _random
import re
import time as _time

_CMD_RE = re.compile(r"^\s*(\w+)\s*\((.*)\)\s*$")


def _split_args(s: str) -> list[str]:
    args, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur or args:
        args.append("".join(cur).strip())
    return [a for a in args if a != ""]


def get_float(expr, rng: _random.Random | None = None, now=None) -> float:
    """Evaluate an expression (or pass through numbers)."""
    if isinstance(expr, (int, float)):
        return float(expr)
    s = str(expr).strip()
    m = _CMD_RE.match(s)
    if not m:
        try:
            return float(s)
        except ValueError:
            return 0.0
    cmd, argstr = m.group(1).lower(), m.group(2)
    args = _split_args(argstr)
    if cmd == "random":
        lo = get_float(args[0], rng, now) if len(args) > 0 else 0.0
        hi = get_float(args[1], rng, now) if len(args) > 1 else lo
        r = rng or _random
        return lo + (hi - lo) * r.random()
    if cmd == "time":
        t = now if now is not None else _time.time()
        unit = (args[0].strip("'\"").lower() if args else "unix")
        if unit in ("unix", "now", "s", "seconds"):
            return float(t)
        if unit in ("ms", "milliseconds"):
            return float(t) * 1000.0
        if unit == "hour":
            return float(_time.gmtime(t).tm_hour)
        if unit == "minute":
            return float(_time.gmtime(t).tm_min)
        return float(t)
    return 0.0


def get_int(expr, rng: _random.Random | None = None, now=None) -> int:
    return int(get_float(expr, rng, now))


_DUR_RE = re.compile(
    r"(?i)\s*(\d+(?:\.\d+)?)\s*(ms|milliseconds?|s|secs?|seconds?|m|mins?|"
    r"minutes?|h|hrs?|hours?|d|days?|w|weeks?)?\s*"
)

_UNIT_SECONDS = {
    "ms": 0.001, "millisecond": 0.001, "milliseconds": 0.001,
    "s": 1, "sec": 1, "secs": 1, "second": 1, "seconds": 1,
    "m": 60, "min": 60, "mins": 60, "minute": 60, "minutes": 60,
    "h": 3600, "hr": 3600, "hrs": 3600, "hour": 3600, "hours": 3600,
    "d": 86400, "day": 86400, "days": 86400,
    "w": 604800, "week": 604800, "weeks": 604800,
}


def parse_duration(s: str, default: float = 0.0,
                   min_seconds: float | None = None,
                   max_seconds: float | None = None) -> float:
    """``"3 days"`` → 259200.0; bare numbers are seconds; clamps applied."""
    total = 0.0
    matched = False
    for m in _DUR_RE.finditer(str(s)):
        if not m.group(1):
            continue
        matched = True
        unit = (m.group(2) or "s").lower()
        total += float(m.group(1)) * _UNIT_SECONDS.get(unit, 1)
    if not matched:
        total = default
    if min_seconds is not None:
        total = max(total, min_seconds)
    if max_seconds is not None:
        total = min(total, max_seconds)
    return total
