"""Heuristic language identification (n-gram/stop-word scoring).

The reference uses the ``whatlang`` library on body text with an
``<html lang>`` attribute fast path (``pkg/crawler/web.go:3370-3401``) and a
language-name → ISO-code map (``pkg/crawler/types.go:416-480``). This module
is a from-scratch, dependency-free equivalent: score each supported language
by stop-word hit rate plus a few characteristic character classes; ties break
deterministically by language code. Returns ``"unknown"`` for empty text.
"""

from __future__ import annotations

from .keywords import STOP_WORDS

_MARKERS = {
    "es": {"el", "la", "los", "las", "una", "que", "de", "en", "es", "por"},
    "fr": {"le", "la", "les", "des", "une", "est", "et", "dans", "pour", "qui"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"},
    "en": {"the", "and", "is", "of", "to", "in", "that", "with", "for", "this"},
}


def detect_lang(text: str) -> str:
    text = text.strip()
    if not text:
        return "unknown"
    # CJK fast path
    cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
    if cjk > len(text[:400]) * 0.2:
        return "zh"
    words = [w.lower() for w in text.split()[:200]]
    if not words:
        return "unknown"
    best_lang, best_score = "unknown", 0.0
    for lang in sorted(_MARKERS):
        marker_hits = sum(1 for w in words if w in _MARKERS[lang])
        stop_hits = sum(1 for w in words if w in STOP_WORDS.get(lang, ()))
        score = (2 * marker_hits + stop_hits) / len(words)
        if score > best_score:
            best_lang, best_score = lang, score
    if best_score < 0.02:
        return "unknown"
    return best_lang
