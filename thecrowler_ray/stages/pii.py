"""PII detection + redaction over a documents-shaped table.

A training-data pipeline must scrub personally identifying strings before
corpus release. This stage detects and redacts emails, IPv4 addresses,
US-SSN-shaped ids and phone numbers with RE2 regexes executed by Arrow
compute kernels (``pc.count_substring_regex`` / ``pc.replace_substring_regex``)
— zero-copy over the object-store batch, no pandas round-trip, no Python
loop. DuckDB's regex engine is RE2 as well, so the oracle applies the SAME
patterns in the SAME order and must agree byte-for-byte.

Redaction order matters where patterns could overlap (an SSN is also
phone-shaped): EMAIL → SSN → IP → PHONE, identical on both sides.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe patterns (no backrefs / lookarounds): keep in sync with
# PII_PATTERNS_SQL below — the oracle replays them verbatim.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,2}[-. ]\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
]


def pii_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Arrow batch → batch + per-kind match counts (on the ORIGINAL text)
    + ``redacted`` text + ``redacted_len``."""
    text = pc.cast(batch[text_col], pa.string())
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for kind, pat, _tok in PII_PATTERNS:
        cols[f"n_{kind}"] = pc.cast(
            pc.count_substring_regex(text, pat), pa.int64()
        )
    red = text
    for _kind, pat, tok in PII_PATTERNS:
        red = pc.replace_substring_regex(red, pat, tok)
    cols["redacted"] = red
    cols["redacted_len"] = pc.cast(pc.utf8_length(red), pa.int64())
    out = batch
    for name, arr in cols.items():
        out = out.append_column(name, arr)
    return out


def pii_sql_exprs(text_expr: str) -> dict[str, str]:
    """The DuckDB twin of :func:`pii_stage` — returns SQL expressions for
    each output column over ``text_expr`` (DuckDB regexps are RE2 too)."""
    counts = {
        f"n_{kind}": f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT)"
        for kind, pat, _tok in PII_PATTERNS
    }
    red = text_expr
    for _kind, pat, tok in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{tok}', 'g')"
    counts["redacted"] = red
    counts["redacted_len"] = f"CAST(length({red}) AS BIGINT)"
    return counts
