"""OAuth 2.0 token acquisition for the mail connectors.

From-scratch stdlib implementation of the three public grant flows the
reference's connectors rely on (it delegates to golang.org/x/oauth2;
semantics cited per RFC, parity per reference file:line):

- refresh-token grant (RFC 6749 §6) — the Gmail user flow
  (``connector_gmail.go:137-150``: GoogleGmailTokenProvider wraps a
  refreshing token source around stored user credentials);
- client-credentials grant (RFC 6749 §4.4, credentials in the form
  body like oauth2.AuthStyleInParams) — the Microsoft Graph app flow
  (``connector_graph.go:112-133``: clientcredentials.Config against
  ``login.microsoftonline.com/<tenant>/oauth2/v2.0/token``);
- device-authorization grant (RFC 8628) — the interactive bootstrap
  that first OBTAINS a refresh token on a browserless host, with the
  full ``authorization_pending`` / ``slow_down`` / ``expired_token``
  poll protocol.

``TokenSource`` mirrors ``oauth2.ReuseTokenSource``
(``connector_graph.go:232``): it caches the access token and re-runs
its grant only within ``skew`` seconds of expiry; instances are
callables, so they plug directly into the connectors'
``token_provider=`` seam (``mailbox.py:gmail_fetch_documents`` /
``graph_fetch_documents``).

No live tenant is reachable from this sandbox; ``tests/test_oauth.py``
drives every flow against an in-process fixture token server, including
an end-to-end Gmail fetch whose Bearer token is minted here.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.parse
import urllib.request

DEVICE_GRANT = "urn:ietf:params:oauth:grant-type:device_code"


class OAuthError(Exception):
    """A token-endpoint error response (RFC 6749 §5.2): ``code`` is the
    registered error string (``invalid_grant``, ``access_denied``, ...),
    ``description`` the optional human text."""

    def __init__(self, code: str, description: str = ""):
        self.code = code
        self.description = description
        super().__init__(f"{code}: {description}" if description else code)


def _post_form(url: str, fields: dict, timeout: float = 30.0) -> dict:
    """POST application/x-www-form-urlencoded, return the parsed JSON
    body. RFC 6749 error responses arrive as HTTP 400 with a JSON body —
    surface those as OAuthError, not URLError."""
    body = urllib.parse.urlencode(
        {k: v for k, v in fields.items() if v is not None}).encode()
    req = urllib.request.Request(url, data=body, method="POST")
    req.add_header("Content-Type", "application/x-www-form-urlencoded")
    req.add_header("Accept", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            payload = resp.read()
    except urllib.error.HTTPError as e:
        payload = e.read()
        try:
            doc = json.loads(payload)
        except ValueError:
            raise OAuthError("invalid_response",
                             f"HTTP {e.code} non-JSON body") from e
        raise OAuthError(doc.get("error", f"http_{e.code}"),
                         doc.get("error_description", "")) from e
    doc = json.loads(payload)
    if "error" in doc:
        # some providers return 200 with an error body (RFC 8628 pollers
        # must handle both); normalize to the exception
        raise OAuthError(doc["error"], doc.get("error_description", ""))
    return doc


def refresh_token_grant(
    token_url: str,
    *,
    client_id: str,
    refresh_token: str,
    client_secret: str | None = None,
    scopes: tuple[str, ...] = (),
) -> dict:
    """RFC 6749 §6: exchange a long-lived refresh token for a fresh
    access token (the Gmail user-credential path). Returns the token
    response dict (``access_token``, ``expires_in``, and a possibly
    rotated ``refresh_token``)."""
    return _post_form(token_url, {
        "grant_type": "refresh_token",
        "refresh_token": refresh_token,
        "client_id": client_id,
        "client_secret": client_secret,
        "scope": " ".join(scopes) if scopes else None,
    })


def client_credentials_grant(
    token_url: str,
    *,
    client_id: str,
    client_secret: str,
    scopes: tuple[str, ...] = (),
) -> dict:
    """RFC 6749 §4.4 with credentials in the form body — the Microsoft
    identity platform style the reference configures
    (``connector_graph.go:130`` AuthStyleInParams)."""
    return _post_form(token_url, {
        "grant_type": "client_credentials",
        "client_id": client_id,
        "client_secret": client_secret,
        "scope": " ".join(scopes) if scopes else None,
    })


def device_code_flow(
    device_url: str,
    token_url: str,
    *,
    client_id: str,
    scopes: tuple[str, ...] = (),
    on_prompt=None,
    sleep=time.sleep,
    clock=time.monotonic,
) -> dict:
    """RFC 8628 device-authorization grant, the browserless bootstrap:

    1. POST the device-authorization request → ``device_code`` /
       ``user_code`` / ``verification_uri`` / ``interval`` /
       ``expires_in``; ``on_prompt(response)`` shows the user code.
    2. Poll the token endpoint with the device grant type every
       ``interval`` seconds (§3.5): ``authorization_pending`` keeps
       waiting, ``slow_down`` adds 5 s to the interval (§3.5's
       required back-off), any other error (``access_denied``,
       ``expired_token``) aborts; local ``expires_in`` is enforced
       too so a dead server cannot spin the loop forever.

    Returns the final token response (access + refresh token).
    ``sleep``/``clock`` are injectable for tests.
    """
    dev = _post_form(device_url, {
        "client_id": client_id,
        "scope": " ".join(scopes) if scopes else None,
    })
    if on_prompt is not None:
        on_prompt(dev)
    interval = int(dev.get("interval", 5))
    deadline = clock() + int(dev.get("expires_in", 1800))
    while True:
        if clock() >= deadline:
            raise OAuthError("expired_token",
                             "device code expired before authorization")
        sleep(interval)
        try:
            return _post_form(token_url, {
                "grant_type": DEVICE_GRANT,
                "device_code": dev["device_code"],
                "client_id": client_id,
            })
        except OAuthError as e:
            if e.code == "authorization_pending":
                continue
            if e.code == "slow_down":
                interval += 5  # RFC 8628 §3.5
                continue
            raise


class TokenSource:
    """Caching, auto-refreshing access-token provider (the
    ``oauth2.ReuseTokenSource`` shape, ``connector_graph.go:232``).

    ``grant()`` is any zero-arg callable returning a token-response
    dict; it runs lazily on first use and again once the cached token
    is within ``skew`` seconds of its ``expires_in`` horizon. If a
    response rotates the refresh token, ``on_rotate`` (when given)
    receives the new one — the durable-checkpoint hook. Instances are
    callables returning the bare access-token string, matching the
    connectors' ``token_provider`` seam."""

    def __init__(self, grant, *, skew: float = 60.0, clock=time.monotonic,
                 on_rotate=None):
        self._grant = grant
        self._skew = skew
        self._clock = clock
        self._on_rotate = on_rotate
        self._lock = threading.Lock()
        self._token: str | None = None
        self._expiry: float = 0.0

    def token(self) -> str:
        with self._lock:
            if self._token is None or (
                    self._clock() >= self._expiry - self._skew):
                doc = self._grant()
                self._token = doc["access_token"]
                self._expiry = self._clock() + float(
                    doc.get("expires_in", 3600))
                if self._on_rotate is not None and "refresh_token" in doc:
                    self._on_rotate(doc["refresh_token"])
            return self._token

    __call__ = token


def gmail_token_provider(
    token_url: str,
    *,
    client_id: str,
    client_secret: str | None,
    refresh_token: str,
    scopes: tuple[str, ...] = ("https://www.googleapis.com/auth/gmail.readonly",),
    on_rotate=None,
) -> TokenSource:
    """The Gmail connector's token source (reference
    ``connector_gmail.go:137-150``): a refreshing wrapper around stored
    user credentials. Plug the result into
    ``gmail_fetch_documents(token_provider=...)``."""
    return TokenSource(
        lambda: refresh_token_grant(
            token_url, client_id=client_id, client_secret=client_secret,
            refresh_token=refresh_token, scopes=scopes),
        on_rotate=on_rotate)


def graph_token_provider(
    token_url: str,
    *,
    client_id: str,
    client_secret: str,
    scopes: tuple[str, ...] = ("https://graph.microsoft.com/.default",),
) -> TokenSource:
    """The Graph connector's app-only token source (reference
    ``connector_graph.go:112-133``). Plug into
    ``graph_fetch_documents(token_provider=...)``."""
    return TokenSource(
        lambda: client_credentials_grant(
            token_url, client_id=client_id, client_secret=client_secret,
            scopes=scopes))
