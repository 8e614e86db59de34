"""Dorking query language (§2.8) — tokenizer + compiler.

Reimplements (semantics only) the reference's search tokenizer
(``pkg/search/tokenizer.go:53-236``) for the data-plane subset:

- quoted phrases: ``"exact phrase"`` (with ``\\"`` escapes)
- field specifiers: ``field:value`` / ``field=value`` for known fields
- logical ops: ``||`` (OR), ``&&`` / adjacency (AND), ``;`` (OR separator)
- control modifiers: ``&limit:N``

Compilation targets:
- a pandas boolean mask (``compile_predicate``) for Dataset filtering
- the equivalent DuckDB WHERE clause (``to_sql_where``) over the same
  columns (exact-match fields vs case-insensitive contains on text fields)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

EXACT_FIELDS = {"lang", "source", "doc_id", "vec_id", "label"}
TEXT_FIELDS = {"text", "content", "title", "summary"}
VALID_FIELDS = EXACT_FIELDS | TEXT_FIELDS


@dataclass
class Term:
    value: str
    field_name: str = ""  # empty → default text search
    phrase: bool = False


@dataclass
class Query:
    # OR of ANDs (disjunctive normal form as parsed left-to-right)
    groups: list[list[Term]] = field(default_factory=list)
    limit: int | None = None


def tokenize(q: str) -> list[tuple[str, str]]:
    """→ [(kind, value)]; kind ∈ {term, phrase, field, or, and, modifier}.
    ``field`` tokens are ``name=value`` encoded as ``name\\x00value``."""
    tokens: list[tuple[str, str]] = []
    i, n = 0, len(q)
    cur: list[str] = []
    pending_field = ""

    def flush():
        nonlocal pending_field
        if cur:
            word = "".join(cur)
            if pending_field:
                tokens.append(("field", f"{pending_field}\x00{word}"))
            else:
                tokens.append(("term", word))
            cur.clear()
        pending_field = ""

    while i < n:
        ch = q[i]
        if ch == '"':
            j = i + 1
            buf = []
            while j < n and q[j] != '"':
                if q[j] == "\\" and j + 1 < n:
                    j += 1
                buf.append(q[j])
                j += 1
            if pending_field:
                tokens.append(("field", f"{pending_field}\x00{''.join(buf)}"))
                pending_field = ""
            else:
                tokens.append(("phrase", "".join(buf)))
            i = j + 1
        elif ch in (":", "=") and cur and "".join(cur).lower() in VALID_FIELDS:
            pending_field = "".join(cur).lower()
            cur.clear()
            i += 1
        elif ch.isspace():
            flush()
            i += 1
        elif q.startswith("||", i):
            flush()
            tokens.append(("or", "||"))
            i += 2
        elif q.startswith("&&", i):
            flush()
            tokens.append(("and", "&&"))
            i += 2
        elif ch == ";":
            flush()
            tokens.append(("or", ";"))
            i += 1
        elif ch == "&" and re.match(r"&(limit|offset)[:=]", q[i:]):
            flush()
            m = re.match(r"&(limit|offset)[:=](\d+)", q[i:])
            tokens.append(("modifier", f"{m.group(1)}\x00{m.group(2)}"))
            i += m.end()
        else:
            cur.append(ch)
            i += 1
    flush()
    return tokens


def parse(q: str) -> Query:
    out = Query()
    group: list[Term] = []
    for kind, value in tokenize(q):
        if kind == "or":
            if group:
                out.groups.append(group)
                group = []
        elif kind == "and":
            continue  # adjacency is already AND
        elif kind == "modifier":
            name, _, val = value.partition("\x00")
            if name == "limit":
                out.limit = int(val)
        elif kind == "field":
            name, _, val = value.partition("\x00")
            group.append(Term(value=val, field_name=name))
        elif kind == "phrase":
            group.append(Term(value=value, phrase=True))
        else:
            group.append(Term(value=value))
    if group:
        out.groups.append(group)
    return out


def _term_mask(df, term: Term, text_col: str = "text"):
    if term.field_name in EXACT_FIELDS:
        return df[term.field_name].astype(str) == term.value
    col = term.field_name if term.field_name in TEXT_FIELDS and term.field_name in df.columns else text_col
    return df[col].astype(str).str.contains(re.escape(term.value), case=False, na=False)


def compile_predicate(q: str, text_col: str = "text"):
    """→ fn(pandas DataFrame) → boolean mask implementing the query."""
    query = parse(q)

    def fn(df):
        import numpy as np
        import pandas as pd

        if not query.groups:
            return pd.Series(True, index=df.index)
        total = pd.Series(False, index=df.index)
        for group in query.groups:
            g = pd.Series(True, index=df.index)
            for term in group:
                g &= _term_mask(df, term, text_col)
            total |= g
        return total

    return fn, query


def _sql_term(term: Term, text_col: str = "text") -> str:
    v = term.value.replace("'", "''")
    if term.field_name in EXACT_FIELDS:
        return f"CAST({term.field_name} AS VARCHAR) = '{v}'"
    col = term.field_name if term.field_name in TEXT_FIELDS else text_col
    return f"lower({col}) LIKE '%' || lower('{v}') || '%'"


def to_sql_where(q: str, text_col: str = "text") -> tuple[str, int | None]:
    """→ (WHERE clause, limit) equivalent to ``compile_predicate``."""
    query = parse(q)
    if not query.groups:
        return "TRUE", query.limit
    ors = []
    for group in query.groups:
        ands = [_sql_term(t, text_col) for t in group]
        ors.append("(" + " AND ".join(ands) + ")")
    return " OR ".join(ors), query.limit


def term_frequency_score(df, q: str, text_col: str = "text"):
    """FTS-style relevance: per-row sum over query terms of term-occurrence
    counts (reference ``search_pages`` ranks by FTS score,
    ``postgresql-setup.pgsql:2955+``; this is the deterministic
    non-Postgres equivalent). Field-specifier terms gate rows (score only
    from text terms)."""
    import pandas as pd

    query = parse(q)
    text = df[text_col].astype(str).str.lower()
    score = pd.Series(0, index=df.index, dtype="int64")
    seen_vals: set[str] = set()
    for group in query.groups:
        for term in group:
            if term.field_name in EXACT_FIELDS:
                continue
            v = term.value.lower()
            if v in seen_vals:
                continue
            seen_vals.add(v)
            score = score + text.str.count(re.escape(v))
    return score
