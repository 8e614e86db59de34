"""Mail sources (S4) — modeled as an alternative reader with the same
document schema.

The reference ships full IMAP/POP3/Gmail/MS-Graph/maildir/mbox connectors
with durable per-mailbox checkpoints (``pkg/mail/connector_*.go``,
``pipeline.go``; state tables ``postgresql-setup.pgsql:310,348``). Network
connectors need live accounts and are out of v0 scope
(``read_mail(...)`` raises for them); the **mbox path is real**: parse an
mbox string/file into document rows shaped exactly like crawled pages
(doc_id, url = ``mbox://…``, title = Subject, body_text, spans), so every
downstream stage (keywords, dedup, indexing) runs unchanged. The checkpoint
is the (mailbox, last_message_index) pair, mirroring the reference's
durable mailbox offsets.
"""

from __future__ import annotations

import hashlib
from email.parser import Parser

import pyarrow as pa

from ..keywords import extract_keywords
from ..stages.fetch import SPAN_TYPE

MAIL_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("url", pa.string()),
        ("mailbox", pa.string()),
        ("msg_index", pa.int64()),
        ("title", pa.string()),
        ("sender", pa.string()),
        ("date", pa.string()),
        ("body_text", pa.string()),
        ("spans", SPAN_TYPE),
    ]
)


def parse_mbox(text: str, mailbox: str = "inbox", start_index: int = 0) -> pa.Table:
    """mbox-format text → document rows (resume via ``start_index``)."""
    rows = {n: [] for n in MAIL_SCHEMA.names}
    # split on the canonical mbox 'From ' separator at line start
    chunks = []
    cur: list[str] = []
    for line in text.splitlines():
        if line.startswith("From ") and cur:
            chunks.append("\n".join(cur))
            cur = [line]
        else:
            cur.append(line)
    if cur:
        chunks.append("\n".join(cur))

    parser = Parser()
    for idx, chunk in enumerate(chunks):
        if idx < start_index:
            continue
        body_lines = chunk.splitlines()
        if body_lines and body_lines[0].startswith("From "):
            chunk = "\n".join(body_lines[1:])
        msg = parser.parsestr(chunk)
        body = msg.get_payload() if isinstance(msg.get_payload(), str) else ""
        subject = msg.get("Subject", "")
        url = f"mbox://{mailbox}/{idx}"
        doc_id = hashlib.sha1(url.encode()).hexdigest()
        spans = [
            {"kind": "title", "text": subject, "media_ref": "", "offset": 0},
            {"kind": "summary", "text": body[:200], "media_ref": "", "offset": 1},
            {"kind": "body_text", "text": body, "media_ref": "", "offset": 2},
        ]
        for kw in extract_keywords(body, [{"name": "keywords", "content": ""}]):
            spans.append(
                {"kind": "keyword", "text": kw, "media_ref": "",
                 "offset": len(spans)}
            )
        rows["doc_id"].append(doc_id)
        rows["url"].append(url)
        rows["mailbox"].append(mailbox)
        rows["msg_index"].append(idx)
        rows["title"].append(subject)
        rows["sender"].append(msg.get("From", ""))
        rows["date"].append(msg.get("Date", ""))
        rows["body_text"].append(body)
        rows["spans"].append(spans)
    return pa.Table.from_pydict(rows, schema=MAIL_SCHEMA)


def read_mail(source_url: str, content: str | None = None, start_index: int = 0):
    """Dispatch on the mail scheme (reference protocol classifier).
    Only ``mbox://`` is implemented in-sandbox; the rest need live
    accounts."""
    import ray.data

    scheme = source_url.split("://", 1)[0].lower()
    if scheme == "mbox":
        mailbox = source_url.split("://", 1)[1].strip("/") or "inbox"
        if content is None:
            with open("/" + mailbox, encoding="utf-8") as f:
                content = f.read()
        return ray.data.from_arrow(parse_mbox(content, mailbox, start_index))
    if scheme in ("imap", "imaps", "pop3", "pop3s", "gmail", "graph-mail", "email"):
        raise NotImplementedError(
            f"{scheme} connector requires live mail credentials/network "
            "(reference pkg/mail/connector_*.go); out of v0 sandbox scope"
        )
    raise ValueError(f"not a mail source: {source_url}")
