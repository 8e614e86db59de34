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


def _message_rows(msg, url: str, mailbox: str, msg_index: int) -> dict:
    """One parsed email.message → MAIL_SCHEMA row dict."""
    body = msg.get_payload() if isinstance(msg.get_payload(), str) else ""
    subject = msg.get("Subject", "")
    spans = [
        {"kind": "title", "text": subject, "media_ref": "", "offset": 0},
        {"kind": "summary", "text": body[:200], "media_ref": "", "offset": 1},
        {"kind": "body_text", "text": body, "media_ref": "", "offset": 2},
    ]
    for kw in extract_keywords(body, [{"name": "keywords", "content": ""}]):
        spans.append(
            {"kind": "keyword", "text": kw, "media_ref": "", "offset": len(spans)}
        )
    return {
        "doc_id": hashlib.sha1(url.encode()).hexdigest(),
        "url": url,
        "mailbox": mailbox,
        "msg_index": msg_index,
        "title": subject,
        "sender": msg.get("From", ""),
        "date": msg.get("Date", ""),
        "body_text": body,
        "spans": spans,
    }


def imap_fetch_documents(
    host: str,
    port: int,
    user: str,
    password: str,
    mailbox: str = "INBOX",
    last_uid: int = 0,
    tls: bool = False,
    ssl_context=None,
) -> tuple[pa.Table, int]:
    """Incremental IMAP fetch (reference ``pkg/mail/connector_imap.go``):
    LOGIN → SELECT → ``UID SEARCH UID last+1:*`` → ``UID FETCH (RFC822)``
    per new message → document rows + the new checkpoint UID.

    The client is stdlib :mod:`imaplib` speaking real RFC 3501; the durable
    per-mailbox checkpoint is the highest UID ingested, mirroring the
    reference's mailbox-offset state tables
    (``postgresql-setup.pgsql:310,348``). IMAP returns the last message for
    ``N:*`` even when its UID < N, so UIDs are re-filtered client-side.
    ``tls=True`` speaks IMAPS (IMAP4_SSL; pass ``ssl_context`` to pin a
    test CA — the reference's imaps scheme)."""
    import imaplib

    rows = {n: [] for n in MAIL_SCHEMA.names}
    new_last = last_uid
    if tls:
        conn = imaplib.IMAP4_SSL(host, port, ssl_context=ssl_context)
    else:
        conn = imaplib.IMAP4(host, port)
    try:
        conn.login(user, password)
        typ, _ = conn.select(mailbox)
        if typ != "OK":
            raise RuntimeError(f"SELECT {mailbox} failed: {typ}")
        typ, data = conn.uid("search", None, f"UID {last_uid + 1}:*")
        if typ != "OK":
            raise RuntimeError(f"UID SEARCH failed: {typ}")
        uids = [int(u) for u in (data[0] or b"").split() if int(u) > last_uid]
        parser = Parser()
        for uid in sorted(uids):
            typ, fetched = conn.uid("fetch", str(uid), "(RFC822)")
            if typ != "OK" or not fetched or fetched[0] is None:
                continue
            raw = fetched[0][1]
            msg = parser.parsestr(
                raw.decode("utf-8", "replace") if isinstance(raw, bytes) else raw
            )
            url = f"imap://{host}:{port}/{mailbox}/{uid}"
            row = _message_rows(msg, url, mailbox, uid)
            for k, v in row.items():
                rows[k].append(v)
            new_last = max(new_last, uid)
        conn.logout()
    except Exception:
        try:
            conn.shutdown()
        except OSError:
            pass
        raise
    return pa.Table.from_pydict(rows, schema=MAIL_SCHEMA), new_last


def pop3_fetch_documents(
    host: str,
    port: int,
    user: str,
    password: str,
    last_index: int = 0,
    tls: bool = False,
    ssl_context=None,
) -> tuple[pa.Table, int]:
    """Incremental POP3 fetch (reference ``pkg/mail/connector_pop3.go``):
    USER/PASS → STAT → RETR each message past the checkpoint → document
    rows + the new checkpoint index.

    POP3 has no stable UIDs across sessions in the base protocol, so the
    checkpoint is the message ORDINAL (the reference's pop3 connector keeps
    the same per-mailbox offset); it is only stable on servers that do not
    delete/renumber between sessions — UIDL support is the upgrade path.
    ``tls=True`` speaks POP3S (POP3_SSL with optional pinned context)."""
    import poplib

    rows = {n: [] for n in MAIL_SCHEMA.names}
    if tls:
        conn = poplib.POP3_SSL(host, port, context=ssl_context)
    else:
        conn = poplib.POP3(host, port)
    new_last = last_index
    try:
        conn.user(user)
        conn.pass_(password)
        count, _ = conn.stat()
        parser = Parser()
        for i in range(last_index + 1, count + 1):
            _, lines, _ = conn.retr(i)
            raw = b"\r\n".join(lines).decode("utf-8", "replace")
            msg = parser.parsestr(raw)
            url = f"pop3://{host}:{port}/INBOX/{i}"
            row = _message_rows(msg, url, "INBOX", i)
            for k, v in row.items():
                rows[k].append(v)
            new_last = i
        conn.quit()
    except Exception:
        try:
            conn.close()
        except OSError:
            pass
        raise
    return pa.Table.from_pydict(rows, schema=MAIL_SCHEMA), new_last


def _bearer_get(url: str, token: str, accept: str = "application/json"):
    """GET with bearer auth (the reference's Graph/Gmail HTTP hop)."""
    import urllib.request

    req = urllib.request.Request(url)
    req.add_header("Authorization", "Bearer " + token)
    req.add_header("Accept", accept)
    with urllib.request.urlopen(req, timeout=15) as r:
        return r.read()


def graph_fetch_documents(
    base_url: str,
    user_id: str,
    folder: str = "inbox",
    delta_link: str | None = None,
    token_provider=None,
    page_size: int = 50,
) -> tuple[pa.Table, str | None]:
    """Incremental Microsoft-Graph mail fetch (reference
    ``pkg/mail/connector_graph.go:518-568``): the messages **delta** query
    (``/users/{uid}/mailFolders/{folder}/messages/delta?$select=…&$top=N``)
    paged via ``@odata.nextLink``, then the raw RFC-822 body per message
    (``/users/{uid}/messages/{id}/$value`` with ``Accept: message/rfc822``).
    The durable checkpoint is the ``@odata.deltaLink`` cursor — pass it back
    to resume; only messages added since are returned.

    OAuth client-credential acquisition needs a live tenant, so the token
    comes from ``token_provider()`` (a seam, like the reference's
    ``TokenSource``). ``base_url`` defaults to the public endpoint; tests
    point it at a local fixture server."""
    import json as _json

    if token_provider is None:
        raise NotImplementedError(
            "graph-mail needs an OAuth token_provider (live tenant); "
            "reference connector_graph.go:116-137"
        )
    token = token_provider()
    base = base_url.rstrip("/")
    next_url = delta_link or (
        f"{base}/users/{user_id}/mailFolders/{folder}/messages/delta"
        f"?$select=id,receivedDateTime&$top={page_size}"
    )
    rows = {n: [] for n in MAIL_SCHEMA.names}
    parser = Parser()
    new_delta = delta_link
    idx = 0
    while next_url:
        page = _json.loads(_bearer_get(next_url, token))
        for m in page.get("value", []):
            if m.get("@removed"):
                continue
            raw = _bearer_get(
                f"{base}/users/{user_id}/messages/{m['id']}/$value",
                token,
                accept="message/rfc822",
            )
            msg = parser.parsestr(raw.decode("utf-8", "replace"))
            idx += 1
            url = f"graph-mail://{user_id}/{folder}/{m['id']}"
            for k, v in _message_rows(msg, url, folder, idx).items():
                rows[k].append(v)
        new_delta = page.get("@odata.deltaLink", new_delta)
        next_url = page.get("@odata.nextLink")
    return pa.Table.from_pydict(rows, schema=MAIL_SCHEMA), new_delta


def gmail_fetch_documents(
    base_url: str,
    user_id: str = "me",
    label: str = "INBOX",
    history_id: int = 0,
    token_provider=None,
    page_size: int = 50,
) -> tuple[pa.Table, int]:
    """Incremental Gmail fetch (reference ``connector_gmail.go:625-684``):
    bootstrap from ``messages.list`` (labelIds + pageToken paging) when no
    checkpoint, else advance with ``history.list?startHistoryId=N``
    (messagesAdded); each message body via ``messages.get?format=raw``
    (base64url RFC-822). The durable checkpoint is the mailbox
    ``historyId``. Token acquisition is the same seam as Graph."""
    import base64
    import json as _json

    if token_provider is None:
        raise NotImplementedError(
            "gmail needs an OAuth token_provider (live account); "
            "reference connector_gmail.go:163"
        )
    token = token_provider()
    base = base_url.rstrip("/")
    api = f"{base}/gmail/v1/users/{user_id}"
    msg_ids: list[str] = []
    new_history = history_id
    if history_id == 0:
        page_token = ""
        while True:
            url = f"{api}/messages?labelIds={label}&maxResults={page_size}"
            if page_token:
                url += f"&pageToken={page_token}"
            page = _json.loads(_bearer_get(url, token))
            msg_ids.extend(m["id"] for m in page.get("messages", []))
            page_token = page.get("nextPageToken", "")
            if not page_token:
                break
    else:
        url = f"{api}/history?startHistoryId={history_id}&labelId={label}"
        page = _json.loads(_bearer_get(url, token))
        for h in page.get("history", []):
            msg_ids.extend(
                a["message"]["id"] for a in h.get("messagesAdded", [])
            )
        new_history = int(page.get("historyId", history_id))
    rows = {n: [] for n in MAIL_SCHEMA.names}
    parser = Parser()
    for i, mid in enumerate(msg_ids, 1):
        m = _json.loads(_bearer_get(f"{api}/messages/{mid}?format=raw", token))
        # each message response carries its historyId; the checkpoint is
        # the max seen (messages.list itself does not report one)
        new_history = max(new_history, int(m.get("historyId", 0)))
        raw = base64.urlsafe_b64decode(m["raw"] + "=" * (-len(m["raw"]) % 4))
        msg = parser.parsestr(raw.decode("utf-8", "replace"))
        url = f"gmail://{user_id}/{label}/{mid}"
        for k, v in _message_rows(msg, url, label, i).items():
            rows[k].append(v)
    return pa.Table.from_pydict(rows, schema=MAIL_SCHEMA), new_history


def read_mail(source_url: str, content: str | None = None, start_index: int = 0,
              user: str = "user", password: str = "pass"):
    """Dispatch on the mail scheme (reference protocol classifier).
    ``mbox://`` parses local content; ``imap://host:port/MAILBOX`` speaks
    RFC 3501 to the given endpoint (``start_index`` = last ingested UID);
    POP3/Gmail/MS-Graph need live accounts and stay out of sandbox scope."""
    import ray.data

    scheme = source_url.split("://", 1)[0].lower()
    if scheme == "mbox":
        mailbox = source_url.split("://", 1)[1].strip("/") or "inbox"
        if content is None:
            with open("/" + mailbox, encoding="utf-8") as f:
                content = f.read()
        return ray.data.from_arrow(parse_mbox(content, mailbox, start_index))
    if scheme in ("imap", "imaps"):
        tls = scheme == "imaps"
        rest = source_url.split("://", 1)[1]
        endpoint, _, mailbox = rest.partition("/")
        host, _, port = endpoint.partition(":")
        table, _ = imap_fetch_documents(
            host, int(port or (993 if tls else 143)), user, password,
            mailbox or "INBOX", last_uid=start_index, tls=tls,
        )
        return ray.data.from_arrow(table)
    if scheme in ("pop3", "pop3s"):
        tls = scheme == "pop3s"
        rest = source_url.split("://", 1)[1]
        endpoint = rest.split("/", 1)[0]
        host, _, port = endpoint.partition(":")
        table, _ = pop3_fetch_documents(
            host, int(port or (995 if tls else 110)), user, password,
            last_index=start_index, tls=tls,
        )
        return ray.data.from_arrow(table)
    if scheme in ("gmail", "graph-mail"):
        raise NotImplementedError(
            f"{scheme}: call gmail_fetch_documents / graph_fetch_documents "
            "with a token_provider — the REST clients and delta/history "
            "checkpoints are implemented; only OAuth token acquisition "
            "needs a live account (connector_gmail.go:163, "
            "connector_graph.go:116-137)"
        )
    if scheme == "email":
        raise NotImplementedError(
            "the 'email' meta-scheme needs per-account routing config "
            "(reference pkg/mail/pipeline.go); use an explicit scheme"
        )
    raise ValueError(f"not a mail source: {source_url}")
