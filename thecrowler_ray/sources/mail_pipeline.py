"""Multi-account mail ingestion pipeline (reference ``pkg/mail/pipeline.go``:
connector + durable cursor store + processor, per-mailbox runs with retry
and a RunSummary; state tables ``postgresql-setup.pgsql:310,348``).

``run_mail_pipeline`` drives every configured account through its protocol
connector (mbox / IMAP / POP3 / IMAPS / POP3S / Gmail / MS-Graph — all in
``mailbox.py``), resuming each (account, mailbox) from the durable
checkpoint in ``MailStateStore`` (a JSON file: crash-safe rewrite via
rename). New messages from all accounts union into one document table with
an ``account`` column, so the downstream stages (keywords, dedup, index)
run unchanged over mail like they do over crawled pages.

Scale note: accounts are independent — on a cluster, fan accounts out as
Ray tasks (one connector session per task) and union the resulting tables;
the state store becomes a small keyed table. The sandbox form runs them
sequentially through the same code path.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa

from .mailbox import (
    MAIL_SCHEMA,
    gmail_fetch_documents,
    graph_fetch_documents,
    imap_fetch_documents,
    parse_mbox,
    pop3_fetch_documents,
)


@dataclass
class MailAccount:
    name: str
    scheme: str  # mbox|imap|imaps|pop3|pop3s|gmail|graph-mail
    host: str = ""
    port: int = 0
    user: str = "user"
    password: str = "pass"
    mailboxes: tuple[str, ...] = ("INBOX",)
    content: str | None = None  # mbox text
    base_url: str = ""  # REST connectors
    token_provider: object = None
    ssl_context: object = None
    max_retries: int = 2
    retry_delay_sec: float = 0.0


class MailStateStore:
    """Durable per-(account, mailbox) checkpoints. JSON file, atomic
    rewrite (write temp + rename) like the reference's transactional
    mailbox-offset updates."""

    def __init__(self, path: str):
        self.path = path
        self._state: dict[str, dict] = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                self._state = json.load(f)

    def get(self, account: str, mailbox: str, default=None):
        return self._state.get(f"{account}/{mailbox}", default)

    def put(self, account: str, mailbox: str, cursor) -> None:
        self._state[f"{account}/{mailbox}"] = cursor
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(self._state, f)
        os.replace(tmp, self.path)


@dataclass
class RunSummary:
    accounts: int = 0
    mailboxes: int = 0
    messages_new: int = 0
    errors: list = field(default_factory=list)


def _with_retries(account: MailAccount, fn):
    last = None
    for attempt in range(account.max_retries + 1):
        try:
            return fn()
        except (OSError, ConnectionError) as e:  # transient transport
            last = e
            if account.retry_delay_sec:
                time.sleep(account.retry_delay_sec)
    raise last


def _fetch(account: MailAccount, mailbox: str, cursor):
    """Dispatch one (account, mailbox) incremental fetch → (table, cursor)."""
    a = account
    if a.scheme == "mbox":
        start = int(cursor or 0)
        t = parse_mbox(a.content or "", mailbox, start_index=start)
        return t, start + t.num_rows
    if a.scheme in ("imap", "imaps"):
        return imap_fetch_documents(
            a.host, a.port, a.user, a.password, mailbox,
            last_uid=int(cursor or 0), tls=a.scheme == "imaps",
            ssl_context=a.ssl_context,
        )
    if a.scheme in ("pop3", "pop3s"):
        return pop3_fetch_documents(
            a.host, a.port, a.user, a.password,
            last_index=int(cursor or 0), tls=a.scheme == "pop3s",
            ssl_context=a.ssl_context,
        )
    if a.scheme == "graph-mail":
        return graph_fetch_documents(
            a.base_url, a.user, mailbox, delta_link=cursor,
            token_provider=a.token_provider,
        )
    if a.scheme == "gmail":
        return gmail_fetch_documents(
            a.base_url, a.user, mailbox, history_id=int(cursor or 0),
            token_provider=a.token_provider,
        )
    raise ValueError(f"unknown mail scheme {a.scheme!r}")


def run_mail_pipeline(
    accounts: list[MailAccount], state: MailStateStore,
    event_bus=None, source_id: str = "mail",
) -> tuple[pa.Table, RunSummary]:
    """One pipeline pass over every account/mailbox → (new documents with
    an ``account`` column, RunSummary). Checkpoints advance only after a
    mailbox fetch succeeds; a failing mailbox is recorded in
    ``summary.errors`` and does not block the others (pipeline.go's
    per-mailbox error isolation). With ``event_bus`` set, the run emits
    an ``email.reconciliation_completed`` lifecycle event per account
    (privacy-preserving digests only — see ``mail_events.py``)."""
    import time as _time

    t0 = _time.monotonic()
    summary = RunSummary()
    tables: list[pa.Table] = []
    for account in accounts:
        summary.accounts += 1
        for mailbox in account.mailboxes:
            summary.mailboxes += 1
            cursor = state.get(account.name, mailbox)
            try:
                table, new_cursor = _with_retries(
                    account, lambda: _fetch(account, mailbox, cursor)
                )
            except Exception as e:
                summary.errors.append(
                    {"account": account.name, "mailbox": mailbox,
                     "error": f"{type(e).__name__}: {e}"}
                )
                continue
            if table.num_rows:
                tables.append(
                    table.append_column(
                        "account",
                        pa.array([account.name] * table.num_rows, pa.string()),
                    )
                )
            summary.messages_new += table.num_rows
            state.put(account.name, mailbox, new_cursor)
    schema = MAIL_SCHEMA.append(pa.field("account", pa.string()))
    out = (
        pa.concat_tables(tables)
        if tables
        else schema.empty_table()
    )
    if event_bus is not None:
        from .mail_events import emit_run_events

        for account in accounts:
            emit_run_events(event_bus, source_id, account.scheme,
                            account.name, summary,
                            duration_sec=_time.monotonic() - t0)
    return out, summary
