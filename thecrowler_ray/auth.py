"""Authentication (reference ``pkg/auth/auth.go``): password hashing,
HS256 JWT issue/verify, and the local-login flow.

The reference hand-rolls HS256 JWTs (``IssueToken``, auth.go:107-125:
header/claims base64url + HMAC signature — no JWT library) with claims
{sub, username, iss (default "crowler"), jti, roles, scopes, iat, exp
(TTL default 1 h)}; passwords hash as ``argon2id$salt$digest``
(auth.go:210-233). Python's stdlib has no argon2, so the hash scheme here
is ``scrypt$salt$digest`` (hashlib.scrypt — the stdlib memory-hard KDF)
with the same format, constant-time verify, and the same tag-prefix
upgrade path. Login mirrors auth.go:54-66: unknown user, disabled user
and bad password all collapse into one Unauthorized error.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import time
from dataclasses import dataclass, field


class AuthError(Exception):
    """The reference's ErrUnauthorized."""


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).decode().rstrip("=")


def _unb64url(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def hash_password(password: str, salt: bytes | None = None) -> str:
    salt = salt if salt is not None else os.urandom(16)
    digest = hashlib.scrypt(password.encode("utf-8"), salt=salt,
                            n=2**14, r=8, p=1, dklen=32)
    return "scrypt$%s$%s" % (
        base64.b64encode(salt).decode().rstrip("="),
        base64.b64encode(digest).decode().rstrip("="),
    )


def verify_password(password: str, stored: str) -> bool:
    parts = stored.split("$")
    if len(parts) != 3 or parts[0] != "scrypt":
        return False
    try:
        salt = base64.b64decode(parts[1] + "=" * (-len(parts[1]) % 4))
        want = base64.b64decode(parts[2] + "=" * (-len(parts[2]) % 4))
    except Exception:
        return False
    got = hashlib.scrypt(password.encode("utf-8"), salt=salt,
                         n=2**14, r=8, p=1, dklen=32)
    return hmac.compare_digest(got, want)


def issue_token(secret: str, subject: str, username: str = "",
                roles: list | None = None, scopes: list | None = None,
                ttl_seconds: int = 3600, issuer: str = "crowler",
                jti: str = "", now: float | None = None) -> str:
    """HS256 JWT with the reference's claim set (auth.go:107-125)."""
    now = time.time() if now is None else now
    ttl = ttl_seconds if ttl_seconds > 0 else 3600
    claims = {
        "sub": subject, "username": username, "iss": issuer or "crowler",
        "jti": jti or _b64url(os.urandom(9)),
        "roles": roles or [], "scopes": scopes or [],
        "iat": int(now), "exp": int(now) + ttl,
    }
    header = _b64url(b'{"alg":"HS256","typ":"JWT"}')
    payload = _b64url(json.dumps(claims, separators=(",", ":")).encode())
    signing_input = f"{header}.{payload}".encode()
    sig = _b64url(hmac.new(secret.encode(), signing_input,
                           hashlib.sha256).digest())
    return f"{header}.{payload}.{sig}"


def verify_token(secret: str, token: str, now: float | None = None) -> dict:
    """→ claims; raises AuthError on malformed/bad-signature/expired."""
    now = time.time() if now is None else now
    parts = token.split(".")
    if len(parts) != 3:
        raise AuthError("malformed token")
    signing_input = f"{parts[0]}.{parts[1]}".encode()
    want = hmac.new(secret.encode(), signing_input, hashlib.sha256).digest()
    try:
        got = _unb64url(parts[2])
        header = json.loads(_unb64url(parts[0]))
        claims = json.loads(_unb64url(parts[1]))
    except Exception as e:
        raise AuthError(f"malformed token: {type(e).__name__}") from None
    if header.get("alg") != "HS256":
        raise AuthError("unsupported algorithm")
    if not hmac.compare_digest(got, want):
        raise AuthError("bad signature")
    if float(claims.get("exp", 0)) < now:
        raise AuthError("token expired")
    return claims


@dataclass
class User:
    user_id: str
    password_hash: str
    disabled: bool = False
    roles: list = field(default_factory=list)
    scopes: list = field(default_factory=list)


class UserStore:
    """In-memory Users table (the reference reads Postgres Users +
    role/scope grants; the login semantics are identical)."""

    def __init__(self):
        self._users: dict[str, User] = {}

    def add(self, username: str, password: str, *, disabled: bool = False,
            roles: list | None = None, scopes: list | None = None,
            user_id: str | None = None) -> "UserStore":
        self._users[username] = User(
            user_id=user_id or str(len(self._users) + 1),
            password_hash=hash_password(password), disabled=disabled,
            roles=list(roles or []), scopes=list(scopes or []),
        )
        return self

    def get(self, username: str) -> User | None:
        return self._users.get(username)


def login(store: UserStore, username: str, password: str, secret: str,
          ttl_seconds: int = 3600, now: float | None = None) -> str:
    """auth.go:54-66: every failure mode collapses into Unauthorized."""
    user = store.get(username)
    if user is None or user.disabled or not verify_password(
            password, user.password_hash):
        raise AuthError("unauthorized")
    return issue_token(secret, user.user_id, username, user.roles,
                       user.scopes, ttl_seconds, now=now)
