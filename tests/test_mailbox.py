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
    UID FETCH (RFC822 literal), LOGOUT. Messages are (uid, rfc822-bytes).
    ``ssl_ctx`` wraps accepted connections (the IMAPS form)."""

    def __init__(self, messages, ssl_ctx=None):
        import socket
        import threading

        self.ssl_ctx = ssl_ctx
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
                if self.ssl_ctx is not None:
                    conn = self.ssl_ctx.wrap_socket(conn, server_side=True)
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

    def __init__(self, messages, ssl_ctx=None):
        import socket
        import threading

        self.ssl_ctx = ssl_ctx
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
                if self.ssl_ctx is not None:
                    conn = self.ssl_ctx.wrap_socket(conn, server_side=True)
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


# ---------------------------------------------------------------------------
# Microsoft-Graph and Gmail REST connectors against local fixture servers
# (delta / history checkpoints; OAuth token acquisition stays a seam)
# ---------------------------------------------------------------------------

import json as _json
import threading as _threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def _rest_rfc822(subject, body):
    return (f"From: a@b.test\r\nSubject: {subject}\r\n"
            f"Date: Mon, 01 Jan 2024 00:00:00 +0000\r\n\r\n{body}\r\n")


class _FixtureRestServer:
    """Serves Graph-shaped and Gmail-shaped JSON; requires Bearer tok-123."""

    def __init__(self):
        self.graph_msgs = [("g1", "graph one", "alpha body"),
                           ("g2", "graph two", "beta body")]
        self.gmail_msgs = [("m1", "gmail one", "gamma body", 100),
                           ("m2", "gmail two", "delta body", 101)]
        self.added_gmail = []  # (id, subject, body, historyId)
        self.delta_round = 0
        srv = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code, payload, ctype="application/json"):
                data = (payload if isinstance(payload, bytes)
                        else _json.dumps(payload).encode())
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.headers.get("Authorization") != "Bearer tok-123":
                    return self._send(401, {"error": "unauthorized"})
                u = urlparse(self.path)
                qs = {k: v[0] for k, v in parse_qs(u.query).items()}
                p = u.path
                # ---- Graph ----
                if "/messages/delta" in p:
                    if qs.get("page") == "2":  # initial sync: page 2 (last)
                        return self._send(200, {
                            "value": [{"id": srv.graph_msgs[1][0]}],
                            "@odata.deltaLink":
                                f"http://127.0.0.1:{srv.port}{p}?token=d1",
                        })
                    if qs.get("token") == "d1":  # resumed delta: nothing new
                        return self._send(200, {
                            "value": [],
                            "@odata.deltaLink":
                                f"http://127.0.0.1:{srv.port}{p}?token=d2",
                        })
                    return self._send(200, {  # initial sync: page 1 of 2
                        "value": [{"id": srv.graph_msgs[0][0]}],
                        "@odata.nextLink":
                            f"http://127.0.0.1:{srv.port}{p}?page=2",
                    })
                if p.endswith("/$value"):
                    mid = p.split("/")[-2]
                    for gid, subj, body in srv.graph_msgs:
                        if gid == mid:
                            return self._send(
                                200, _rest_rfc822(subj, body).encode(),
                                ctype="message/rfc822")
                    return self._send(404, {"error": "no such message"})
                # ---- Gmail ----
                if p.endswith("/gmail/v1/users/me/messages"):
                    if "pageToken" not in qs:
                        return self._send(200, {
                            "messages": [{"id": srv.gmail_msgs[0][0]}],
                            "nextPageToken": "p2",
                        })
                    return self._send(200, {
                        "messages": [{"id": srv.gmail_msgs[1][0]}],
                    })
                if "/gmail/v1/users/me/messages/" in p:
                    import base64 as _b64

                    mid = p.rsplit("/", 1)[1]
                    for gid, subj, body, hid in srv.gmail_msgs + srv.added_gmail:
                        if gid == mid:
                            raw = _b64.urlsafe_b64encode(
                                _rest_rfc822(subj, body).encode()).decode().rstrip("=")
                            return self._send(200, {"id": gid, "raw": raw,
                                                    "historyId": hid})
                    return self._send(404, {"error": "no such message"})
                if p.endswith("/gmail/v1/users/me/history"):
                    start = int(qs.get("startHistoryId", 0))
                    added = [
                        {"messagesAdded": [{"message": {"id": gid}}]}
                        for gid, _, _, hid in srv.added_gmail if hid > start
                    ]
                    top = max([h for *_, h in
                               (srv.gmail_msgs + srv.added_gmail)] or [start])
                    return self._send(200, {"history": added, "historyId": top})
                return self._send(404, {"error": p})

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self.httpd.server_address[1]
        self.thread = _threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self.thread.start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def test_graph_connector_delta_checkpoint():
    from thecrowler_ray.sources.mailbox import graph_fetch_documents

    srv = _FixtureRestServer()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        t1, delta = graph_fetch_documents(
            base, "u1", "inbox", token_provider=lambda: "tok-123")
        assert list(t1.to_pandas().title) == ["graph one", "graph two"]
        assert delta and "token=d1" in delta
        # resume from the delta cursor: nothing new
        srv.delta_round = 1
        t2, delta2 = graph_fetch_documents(
            base, "u1", "inbox", delta_link=delta,
            token_provider=lambda: "tok-123")
        assert t2.num_rows == 0 and "token=d2" in delta2
        # token seam is mandatory
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            graph_fetch_documents(base, "u1")
    finally:
        srv.close()


def test_gmail_connector_history_checkpoint():
    from thecrowler_ray.sources.mailbox import gmail_fetch_documents

    srv = _FixtureRestServer()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        t1, hid = gmail_fetch_documents(
            base, token_provider=lambda: "tok-123")
        assert list(t1.to_pandas().title) == ["gmail one", "gmail two"]
        assert hid == 101  # max historyId across fetched messages
        # a new message arrives; incremental fetch picks up only it
        srv.added_gmail.append(("m3", "gmail three", "epsilon body", 102))
        t2, hid2 = gmail_fetch_documents(
            base, history_id=hid, token_provider=lambda: "tok-123")
        assert list(t2.to_pandas().title) == ["gmail three"]
        assert hid2 == 102
    finally:
        srv.close()


def test_read_mail_gmail_scheme_points_at_fetchers():
    from thecrowler_ray.sources.mailbox import read_mail

    with pytest.raises(NotImplementedError, match="token_provider"):
        read_mail("gmail://me/INBOX")


# ---------------------------------------------------------------------------
# TLS variants (imaps / pop3s): self-signed cert, ssl-wrapped fixtures
# ---------------------------------------------------------------------------


def _tls_contexts(tmp_path):
    """Self-signed localhost cert → (server ctx, pinned client ctx)."""
    import datetime
    import ssl

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")])
    now = datetime.datetime(2026, 1, 1)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now)
        .not_valid_after(now + datetime.timedelta(days=3650))
        .add_extension(
            x509.SubjectAlternativeName([x509.IPAddress(__import__("ipaddress").ip_address("127.0.0.1"))]),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    cert_pem = tmp_path / "cert.pem"
    key_pem = tmp_path / "key.pem"
    cert_pem.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_pem.write_bytes(key.private_bytes(
        serialization.Encoding.PEM, serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption()))
    server = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    server.load_cert_chain(str(cert_pem), str(key_pem))
    client = ssl.create_default_context(cafile=str(cert_pem))
    return server, client


def test_imaps_fetch_over_tls(tmp_path):
    from thecrowler_ray.sources.mailbox import imap_fetch_documents

    server_ctx, client_ctx = _tls_contexts(tmp_path)
    srv = _FixtureImapServer(
        {1: _rfc822("secure one", "tls body"), 2: _rfc822("secure two", "more")},
        ssl_ctx=server_ctx,
    )
    try:
        t, last = imap_fetch_documents(
            "127.0.0.1", srv.port, "u", "p", "INBOX",
            last_uid=0, tls=True, ssl_context=client_ctx,
        )
        assert list(t.to_pandas().title) == ["secure one", "secure two"]
        assert last == 2
    finally:
        srv.close()


def test_pop3s_fetch_over_tls(tmp_path):
    from thecrowler_ray.sources.mailbox import pop3_fetch_documents

    server_ctx, client_ctx = _tls_contexts(tmp_path)
    srv = _FixturePop3Server(
        [_rfc822("s-one", "b1"), _rfc822("s-two", "b2")], ssl_ctx=server_ctx
    )
    try:
        t, last = pop3_fetch_documents(
            "127.0.0.1", srv.port, "u", "p",
            last_index=0, tls=True, ssl_context=client_ctx,
        )
        assert list(t.to_pandas().title) == ["s-one", "s-two"]
        assert last == 2
    finally:
        srv.close()


# ---------------------------------------------------------------------------
# Multi-account mail pipeline (pkg/mail/pipeline.go analog)
# ---------------------------------------------------------------------------


def test_mail_pipeline_multi_account_incremental(tmp_path):
    from thecrowler_ray.sources.mail_pipeline import (
        MailAccount,
        MailStateStore,
        run_mail_pipeline,
    )

    imap_srv = _FixtureImapServer(
        {1: _rfc822("imap one", "a"), 2: _rfc822("imap two", "b")}
    )
    pop_srv = _FixturePop3Server([_rfc822("pop one", "c")])
    state_path = str(tmp_path / "mail_state.json")
    accounts = [
        MailAccount(name="acct-imap", scheme="imap", host="127.0.0.1",
                    port=imap_srv.port),
        MailAccount(name="acct-pop", scheme="pop3", host="127.0.0.1",
                    port=pop_srv.port),
        MailAccount(name="acct-mbox", scheme="mbox", content=MBOX,
                    mailboxes=("team",)),
        MailAccount(name="acct-dead", scheme="imap", host="127.0.0.1",
                    port=1, max_retries=0),  # connection refused
    ]
    try:
        state = MailStateStore(state_path)
        table, s1 = run_mail_pipeline(accounts, state)
        assert s1.accounts == 4 and s1.mailboxes == 4
        assert s1.messages_new == 5  # 2 imap + 1 pop + 2 mbox
        assert len(s1.errors) == 1 and s1.errors[0]["account"] == "acct-dead"
        df = table.to_pandas()
        assert sorted(df.account.unique()) == ["acct-imap", "acct-mbox",
                                               "acct-pop"]

        # second pass from a FRESH store instance (state survives disk)
        state2 = MailStateStore(state_path)
        t2, s2 = run_mail_pipeline(accounts[:3], state2)
        assert s2.messages_new == 0 and t2.num_rows == 0

        # a new imap message arrives → only it is fetched
        imap_srv.messages[3] = _rfc822("imap three", "d")
        t3, s3 = run_mail_pipeline(accounts[:3], MailStateStore(state_path))
        assert s3.messages_new == 1
        assert t3.to_pandas().title.tolist() == ["imap three"]
    finally:
        imap_srv.close()
        pop_srv.close()
