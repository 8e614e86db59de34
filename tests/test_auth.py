"""Auth (pkg/auth): password hashing, HS256 JWT issue/verify, the login
flow's single Unauthorized failure mode, and the API server's JWT mode."""

import json
import urllib.error
import urllib.request

import pytest

from thecrowler_ray.auth import (
    AuthError,
    UserStore,
    hash_password,
    issue_token,
    login,
    verify_password,
    verify_token,
)


def test_password_hash_roundtrip():
    h = hash_password("hunter2")
    assert h.startswith("scrypt$")
    assert verify_password("hunter2", h)
    assert not verify_password("hunter3", h)
    assert not verify_password("hunter2", "argon2id$x$y")  # foreign scheme
    assert not verify_password("hunter2", "garbage")
    # salted: same password hashes differently
    assert hash_password("hunter2") != h


def test_jwt_issue_verify_claims():
    tok = issue_token("sekret", "42", "alice", roles=["admin"],
                      scopes=["read"], ttl_seconds=60, now=1000.0)
    assert tok.count(".") == 2
    claims = verify_token("sekret", tok, now=1030.0)
    assert claims["sub"] == "42" and claims["username"] == "alice"
    assert claims["iss"] == "crowler"  # reference default issuer
    assert claims["roles"] == ["admin"] and claims["scopes"] == ["read"]
    assert claims["exp"] == 1060 and claims["iat"] == 1000
    # expiry
    with pytest.raises(AuthError, match="expired"):
        verify_token("sekret", tok, now=2000.0)
    # wrong secret / tampered payload / malformed
    with pytest.raises(AuthError, match="signature"):
        verify_token("other", tok, now=1030.0)
    # tampered payload (valid JSON, escalated role) fails the signature
    import base64 as _b64
    import json as _json

    h, p, s = tok.split(".")
    claims2 = _json.loads(_b64.urlsafe_b64decode(p + "=" * (-len(p) % 4)))
    claims2["roles"] = ["superadmin"]
    p2 = _b64.urlsafe_b64encode(
        _json.dumps(claims2).encode()).decode().rstrip("=")
    with pytest.raises(AuthError, match="signature"):
        verify_token("sekret", f"{h}.{p2}.{s}", now=1030.0)
    with pytest.raises(AuthError, match="malformed"):
        verify_token("sekret", "not-a-token")


def test_login_single_failure_mode():
    store = (UserStore()
             .add("alice", "pw-a", roles=["admin"])
             .add("mallory", "pw-m", disabled=True))
    tok = login(store, "alice", "pw-a", "sek", now=500.0)
    assert verify_token("sek", tok, now=600.0)["username"] == "alice"
    # unknown user, bad password, disabled user: identical error
    for user, pw in (("nobody", "x"), ("alice", "wrong"), ("mallory", "pw-m")):
        with pytest.raises(AuthError, match="unauthorized"):
            login(store, user, pw, "sek")


def test_api_server_jwt_mode():
    from thecrowler_ray.api_server import ApiConfig, ApiServer

    users = UserStore().add("bob", "pw-b")
    srv = ApiServer(
        "/tmp/idx",
        ApiConfig(rate_limit="1000,1000", jwt_secret="s3", token_ttl=120),
        search_fn=lambda d, q, k: [{"doc_id": 1, "url": "u", "title": q,
                                    "score": 1.0}],
        users=users,
    )
    port = srv.start()
    try:
        # login over the socket
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/auth/login",
            data=json.dumps({"username": "bob", "password": "pw-b"}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=5) as r:
            body = json.loads(r.read())
        assert body["token_type"] == "Bearer" and body["expires_in"] == 120
        token = body["access_token"]

        # the issued token authorizes queries
        q = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/search/general?q=x")
        q.add_header("Authorization", "Bearer " + token)
        with urllib.request.urlopen(q, timeout=5) as r:
            assert json.loads(r.read())["results"][0]["title"] == "x"

        # no/garbage token → 401
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/search/general?q=x", timeout=5)
        assert ei.value.code == 401
        # bad credentials → 401
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/auth/login",
            data=json.dumps({"username": "bob", "password": "no"}).encode(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=5)
        assert ei.value.code == 401
    finally:
        srv.close()
