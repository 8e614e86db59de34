import pytest

from thecrowler_ray.sources.mailbox import parse_mbox, read_mail

MBOX = """From alice@example.com Mon Jan  1 10:00:00 2024
From: alice@example.com
Subject: Weekly crawler report
Date: Mon, 1 Jan 2024 10:00:00 +0000

The crawler fetched many pages this week with excellent throughput numbers.

From bob@example.com Tue Jan  2 11:00:00 2024
From: bob@example.com
Subject: Re: Weekly crawler report
Date: Tue, 2 Jan 2024 11:00:00 +0000

Thanks for the report about the crawler performance.
"""


def test_parse_mbox_shape():
    t = parse_mbox(MBOX, "team")
    assert t.num_rows == 2
    rows = t.to_pylist()
    assert rows[0]["title"] == "Weekly crawler report"
    assert rows[0]["sender"] == "alice@example.com"
    assert rows[0]["url"] == "mbox://team/0"
    kinds = [s["kind"] for s in rows[0]["spans"]]
    assert kinds[:3] == ["title", "summary", "body_text"]
    assert "keyword" in kinds
    kw = [s["text"] for s in rows[0]["spans"] if s["kind"] == "keyword"]
    assert "crawler" in kw
    # checkpoint resume: start_index skips already-processed messages
    t2 = parse_mbox(MBOX, "team", start_index=1)
    assert t2.num_rows == 1 and t2.to_pylist()[0]["msg_index"] == 1


@pytest.mark.usefixtures("ray_session")
def test_read_mail_dispatch():
    ds = read_mail("mbox://team", content=MBOX)
    assert ds.count() == 2
    with pytest.raises(NotImplementedError):
        read_mail("gmail://acct")  # imap/pop3 are now real clients
    with pytest.raises(ValueError):
        read_mail("http://not-mail.example.com")


# ---------------------------------------------------------------------------
# IMAP connector against a local fixture server (RFC 3501 subset) — mirrors
# the reference's hermetic connector tests (no live accounts).
# ---------------------------------------------------------------------------


class _FixtureImapServer:
    """Minimal in-process IMAP4 server: greeting, LOGIN, SELECT, UID SEARCH,
    UID FETCH (RFC822 literal), LOGOUT. Messages are (uid, rfc822-bytes)."""

    def __init__(self, messages):
        import socket
        import threading

        self.messages = dict(messages)  # uid -> bytes
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(4)
        self.port = self.sock.getsockname()[1]
        self._stop = False
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        while not self._stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            try:
                self._session(conn)
            except (OSError, ValueError):
                pass
            finally:
                conn.close()

    def _session(self, conn):
        w = conn.makefile("wb")
        r = conn.makefile("rb")
        w.write(b"* OK fixture IMAP4rev1 ready\r\n")
        w.flush()
        while True:
            line = r.readline()
            if not line:
                return
            parts = line.decode().strip().split(" ", 2)
            tag, cmd = parts[0], parts[1].upper() if len(parts) > 1 else ""
            rest = parts[2] if len(parts) > 2 else ""
            if cmd == "CAPABILITY":
                w.write(b"* CAPABILITY IMAP4rev1\r\n")
                w.write(f"{tag} OK CAPABILITY completed\r\n".encode())
            elif cmd == "LOGIN":
                w.write(f"{tag} OK LOGIN completed\r\n".encode())
            elif cmd == "SELECT":
                w.write(f"* {len(self.messages)} EXISTS\r\n".encode())
                w.write(b"* OK [UIDVALIDITY 1] UIDs valid\r\n")
                w.write(f"{tag} OK [READ-WRITE] SELECT completed\r\n".encode())
            elif cmd == "UID" and rest.upper().startswith("SEARCH"):
                spec = rest.split()[-1]  # e.g. 4:*
                lo = int(spec.split(":")[0])
                uids = sorted(u for u in self.messages if u >= lo)
                if not uids and self.messages:  # RFC quirk: N:* includes last
                    uids = [max(self.messages)]
                w.write(("* SEARCH " + " ".join(map(str, uids))).encode() + b"\r\n")
                w.write(f"{tag} OK SEARCH completed\r\n".encode())
            elif cmd == "UID" and rest.upper().startswith("FETCH"):
                uid = int(rest.split()[1])
                raw = self.messages.get(uid, b"")
                w.write(
                    f"* {uid} FETCH (UID {uid} RFC822 {{{len(raw)}}}\r\n".encode()
                )
                w.write(raw)
                w.write(b")\r\n")
                w.write(f"{tag} OK FETCH completed\r\n".encode())
            elif cmd == "LOGOUT":
                w.write(b"* BYE fixture terminating\r\n")
                w.write(f"{tag} OK LOGOUT completed\r\n".encode())
                w.flush()
                return
            else:
                w.write(f"{tag} BAD unsupported\r\n".encode())
            w.flush()

    def close(self):
        self._stop = True
        try:
            self.sock.close()
        except OSError:
            pass


def _rfc822(subject, body, sender="a@x.test"):
    return (
        f"From: {sender}\r\nSubject: {subject}\r\n"
        f"Date: Mon, 1 Jan 2024 00:00:00 +0000\r\n\r\n{body}\r\n"
    ).encode()


def test_imap_incremental_fetch_with_checkpoint():
    """Full fetch, then incremental fetch from the checkpoint UID sees only
    newly arrived mail — the reference connector_imap.go contract."""
    from thecrowler_ray.sources.mailbox import imap_fetch_documents

    srv = _FixtureImapServer({
        1: _rfc822("first", "crawler frontier body one"),
        2: _rfc822("second", "index keyword body two"),
        3: _rfc822("third", "dedup shard body three"),
    })
    try:
        table, last = imap_fetch_documents(
            "127.0.0.1", srv.port, "u", "p", "INBOX", last_uid=0
        )
        assert last == 3
        df = table.to_pandas()
        assert list(df.msg_index) == [1, 2, 3]
        assert list(df.title) == ["first", "second", "third"]
        assert df.url.str.startswith(f"imap://127.0.0.1:{srv.port}/INBOX/").all()
        assert all(s[0]["kind"] == "title" for s in df.spans)

        # nothing new → empty incremental fetch, checkpoint unchanged
        t2, last2 = imap_fetch_documents(
            "127.0.0.1", srv.port, "u", "p", "INBOX", last_uid=last
        )
        assert len(t2) == 0 and last2 == last

        # new mail arrives → only it is fetched
        srv.messages[4] = _rfc822("fourth", "politeness budget body four")
        t3, last3 = imap_fetch_documents(
            "127.0.0.1", srv.port, "u", "p", "INBOX", last_uid=last
        )
        assert last3 == 4
        assert list(t3.to_pandas().title) == ["fourth"]
    finally:
        srv.close()


@pytest.mark.usefixtures("ray_session")
def test_read_mail_imap_scheme():
    from thecrowler_ray.sources.mailbox import read_mail

    srv = _FixtureImapServer({1: _rfc822("hello", "body text here")})
    try:
        ds = read_mail(f"imap://127.0.0.1:{srv.port}/INBOX")
        df = ds.to_pandas()
        assert len(df) == 1 and df.title[0] == "hello"
    finally:
        srv.close()


class _FixturePop3Server:
    """Minimal POP3 server: USER/PASS/STAT/RETR/QUIT over a local socket."""

    def __init__(self, messages):
        import socket
        import threading

        self.messages = list(messages)  # ordinal order, bytes
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(4)
        self.port = self.sock.getsockname()[1]
        self._stop = False
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self):
        while not self._stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            try:
                self._session(conn)
            except (OSError, ValueError):
                pass
            finally:
                conn.close()

    def _session(self, conn):
        w = conn.makefile("wb")
        r = conn.makefile("rb")
        w.write(b"+OK fixture POP3 ready\r\n")
        w.flush()
        while True:
            line = r.readline()
            if not line:
                return
            parts = line.decode().strip().split()
            cmd = parts[0].upper() if parts else ""
            if cmd in ("USER", "PASS"):
                w.write(b"+OK\r\n")
            elif cmd == "STAT":
                total = sum(len(m) for m in self.messages)
                w.write(f"+OK {len(self.messages)} {total}\r\n".encode())
            elif cmd == "RETR":
                i = int(parts[1])
                if 1 <= i <= len(self.messages):
                    w.write(b"+OK message follows\r\n")
                    w.write(self.messages[i - 1])
                    w.write(b"\r\n.\r\n")
                else:
                    w.write(b"-ERR no such message\r\n")
            elif cmd == "QUIT":
                w.write(b"+OK bye\r\n")
                w.flush()
                return
            else:
                w.write(b"-ERR unsupported\r\n")
            w.flush()

    def close(self):
        self._stop = True
        try:
            self.sock.close()
        except OSError:
            pass


def test_pop3_incremental_fetch_with_checkpoint():
    from thecrowler_ray.sources.mailbox import pop3_fetch_documents

    srv = _FixturePop3Server([
        _rfc822("one", "alpha body"),
        _rfc822("two", "beta body"),
    ])
    try:
        table, last = pop3_fetch_documents("127.0.0.1", srv.port, "u", "p")
        assert last == 2
        assert list(table.to_pandas().title) == ["one", "two"]
        srv.messages.append(_rfc822("three", "gamma body"))
        t2, last2 = pop3_fetch_documents(
            "127.0.0.1", srv.port, "u", "p", last_index=last
        )
        assert last2 == 3
        assert list(t2.to_pandas().title) == ["three"]
    finally:
        srv.close()
