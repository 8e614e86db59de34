"""Keyword extraction — reimplementation of the reference semantics.

Mirrors (semantics only) ``pkg/crawler/keywords.go``:

- punctuation set ``p`` (``keywords.go:35``)
- ``normalize_keyword`` (``keywords.go:124-130``)
- ``is_keyword`` (``keywords.go:132-165``): len ≥ 3, not symbol-only, not a
  per-language stop word; unknown language ⇒ everything is a keyword
- ``extract_content_keywords`` (``keywords.go:201-230``): split on
  space/punct/symbol, drop empty or > 45 chars, always keep ``#``/``@``
  prefixed
- ``extract_from_meta_tag`` (``keywords.go:167-199``) for ``keywords`` and
  ``description`` meta tags
- ``unique`` (``keywords.go:232-246``): case-insensitive dedup preserving
  first-seen order
- driver ``extract_keywords`` (``keywords.go:248-304``): body content then
  meta keywords then meta description, deduped
- DB canonicalization (``pkg/crawler/crawler.go:1758-1767``): truncate 256
  runes, trim, valid UTF-8, lowercase, NFC

The stop-word lists are this repo's own (the reference ships a data file we
do not copy); engine and oracle share this module so parity holds by
construction.
"""

from __future__ import annotations

import re
import unicodedata

from .textnorm import fix_utf8, normalize_text

PUNCT = ".,?!:;\"'()[]{}<>"

# Our own per-language stop-word lists (small, deterministic).
STOP_WORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        """the and for are but not you all any can had her was one our out day
        get has him his how man new now old see two way who boy did its let put
        say she too use that with this from they have been were said each which
        their will other about there when your what some them then than into
        could these only over very also after most made more must such a an of
        to in is it on he as do at by we or be""".split()
    ),
    "es": frozenset(
        """que los las una por con para del est como mas pero sus le ya o fue
        este ha si porque esta entre cuando muy sin sobre tambien me hasta hay
        donde quien desde todo nos durante todos uno les ni contra otros ese
        eso ante ellos e esto antes algunos unos yo otro otras otra el en y a
        de la se no un lo""".split()
    ),
    "fr": frozenset(
        """les des une dans est pour que qui sur pas plus par il au avec ne se
        ce vous la le et un a du en son ses mais comme tout nous sont cette aux
        ou ils leur elle si les meme ete etre avoir fait peut sans sous entre
        deux""".split()
    ),
    "de": frozenset(
        """der die das und ist von den des dem ein eine nicht mit auf fur als
        auch sich auf werden aus bei hat wird sind noch nach wie einem einen
        einer uber zum zur kann nur vor durch man mehr wenn aber oder so was
        im am um zu in es an er wir ich sie""".split()
    ),
    "zh": frozenset(),
}

_SPLIT_RE = re.compile(
    r"[\s" + re.escape(".,?!:;\"'()[]{}<>-=+/*\\_|~`^%$€£&§°") + r"]+"
)
_SYMBOL_ONLY_STRIP = ".,?!:;'\"()[]{}<>-=+/*\\_"


def normalize_keyword(word: str) -> str:
    word = word.strip().lower()
    word = word.strip(PUNCT)
    return word.strip()


def is_keyword(word: str, lang: str = "") -> bool:
    lang = lang.strip() or "en"
    word = word.strip().lower()
    return _is_keyword_norm(word, STOP_WORDS.get(lang))


def _is_keyword_norm(word: str, lang_words) -> bool:
    """is_keyword fast path: input already stripped+lowercased and the
    stop-word set already resolved (identical semantics, no re-normalize)."""
    if len(word) < 3:
        return False
    if word.strip(_SYMBOL_ONLY_STRIP) == "":
        return False
    if word in ("/*", "*/", "<!--", "-->"):
        return False
    if lang_words is None:
        return True
    return word not in lang_words


def _split_words(content: str) -> list[str]:
    return [w for w in _SPLIT_RE.split(content) if w]


def _filter_words(words: list[str], lang: str = "") -> list[str]:
    # normalize_keyword output is already stripped+lowercased → use the
    # is_keyword fast path with the stop-word set resolved once
    lang_words = STOP_WORDS.get(lang.strip() or "en")
    out = []
    for word in words:
        kw = normalize_keyword(word)
        if not kw or len(kw) > 45:
            continue
        if kw[0] in "#@":
            out.append(kw)
        elif _is_keyword_norm(kw, lang_words):
            out.append(kw)
    return out


def extract_content_keywords(content: str, lang: str = "") -> list[str]:
    return _filter_words(_split_words(content), lang)


def extract_from_meta_tag(meta_tags: list[dict], tag_name: str, lang: str = "") -> list[str]:
    tag_name = tag_name.strip().lower()
    out: list[str] = []
    for tag in meta_tags:
        if str(tag.get("name", "")).strip().lower() == tag_name:
            out.extend(_filter_words(_split_words(str(tag.get("content", ""))), lang))
    return out


def unique(words: list[str]) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for w in words:
        e = w.strip().lower()
        if not e or e in seen:
            continue
        seen.add(e)
        out.append(e)
    return out


# per-process (lang, raw token) → normalized keyword | None memo: tokens
# repeat massively across pages of a crawl, so the normalize+filter decision
# runs once per distinct token per worker rather than once per page. Size
# capped so adversarial vocabularies cannot grow the worker heap unbounded.
_KW_MEMO: dict[tuple[str, str], str | None] = {}
_KW_MEMO_CAP = 2_000_000


def extract_keywords(body_text: str, meta_tags: list[dict] | None = None, lang: str = "") -> list[str]:
    """Reference driver order: normalized body content, then meta
    ``keywords``, then meta ``description``; dedup preserving first-seen.

    Fused fast path: one ordered-unique pass with a per-process decision
    memo (normalize+filter computed once per distinct (lang, token) per
    worker). Equivalent to ``unique(filter(content) + filter(meta...))``
    because ``normalize_keyword`` output is already stripped+lowercased, so
    ``unique``'s re-normalization is a no-op on it."""
    meta_tags = meta_tags or []
    lang_key = lang.strip() or "en"
    lang_words = STOP_WORDS.get(lang_key)
    memo = _KW_MEMO
    seen: set[str] = set()
    out: list[str] = []

    def consume(words: list[str]) -> None:
        for word in words:
            mk = (lang_key, word)
            kw = memo.get(mk, "\x00")
            if kw == "\x00":
                k = normalize_keyword(word)
                if not k or len(k) > 45:
                    kw = None
                elif k[0] in "#@" or _is_keyword_norm(k, lang_words):
                    kw = k
                else:
                    kw = None
                if len(memo) < _KW_MEMO_CAP:
                    memo[mk] = kw
            if kw is not None and kw not in seen:
                seen.add(kw)
                out.append(kw)

    consume(_split_words(normalize_text(body_text)))
    for tag_name in ("keywords", "description"):
        for tag in meta_tags:
            if str(tag.get("name", "")).strip().lower() == tag_name:
                consume(_split_words(str(tag.get("content", ""))))
    return out


def canonicalize_keyword_db(word: str) -> str:
    """DB-side canonicalization before the grouped occurrence count."""
    word = word[:256].strip()
    word = fix_utf8(word).lower()
    return unicodedata.normalize("NFC", word)
