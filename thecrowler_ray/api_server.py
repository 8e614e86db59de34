"""HTTP API serving layer (reference ``services/api/main.go``).

The reference exposes the crawl/index state over a REST surface:
``/v1/health``, ``/v1/ready``, ``/v1/search/*`` (dork query → SearchIndex
rows), ``/v1/timeseries`` — each behind rate-limit + optional-auth
middleware (``main.go:586-724``, rate default "10,10" ``main.go:108-122``).

Here the handlers call the repo's own Ray-Data pipelines
(``pipelines/search_api.search_pages``, ``stages/timeseries``), so the
server is a thin stdlib ``ThreadingHTTPServer`` front over the data plane —
no web framework needed, and tests drive it over a real local socket.
The DB-admin endpoints (``/v1/source/*``: add/remove/update/vacuum/status/
statuses, ``main.go:706-725``) run over the parquet-backed
``source_registry.SourceRegistry`` instead of the reference's Postgres
console.

Deployment note (100 TB): the server is a *driver-side* query facade; the
heavy lifting stays in Ray Data tasks. Run one per head node; queries
stream through ``search_pages``'s partial top-k, so a request never
materializes the index.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable
from urllib.parse import parse_qs, urlparse


@dataclass
class ApiConfig:
    """Mirror of the reference API config (rate_limit "rate,burst" string,
    ``main.go:108-122``; optional static bearer token for the auth
    middleware seam)."""

    host: str = "127.0.0.1"
    port: int = 0  # 0 → ephemeral (tests)
    rate_limit: str = "10,10"
    auth_token: str = ""  # static bearer token (simple mode)
    # JWT mode (reference local auth): set a secret + a UserStore on the
    # server; POST /v1/auth/login issues HS256 tokens, bearer auth
    # verifies signature+expiry instead of comparing the static token
    jwt_secret: str = ""
    token_ttl: int = 3600

    def rate_burst(self) -> tuple[float, float]:
        s = self.rate_limit.strip() or "10,10"
        if "," not in s:
            s += ",10"
        rate_s, burst_s = s.split(",", 1)
        return float(rate_s or 10), float(burst_s or 10)


@dataclass
class CorsConfig:
    """pkg/common/cors.go CORSOptions: disabled → no CORS headers at all;
    enabled → exact-origin match unless the list contains ``*``."""

    enabled: bool = False
    allowed_origins: list = field(default_factory=list)

    def normalized(self) -> tuple[set, bool]:
        out = set()
        for origin in self.allowed_origins:
            origin = origin.strip()
            if origin == "*":
                return set(), True
            if origin:
                out.add(origin)
        return out, False


class _TokenBucket:
    def __init__(self, rate: float, burst: float):
        self.rate, self.burst = rate, burst
        self.tokens = burst
        self.t = time.monotonic()
        self.lock = threading.Lock()

    def allow(self) -> bool:
        with self.lock:
            now = time.monotonic()
            self.tokens = min(self.burst, self.tokens + (now - self.t) * self.rate)
            self.t = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return True
            return False


class ApiServer:
    """``serve(index_dir)`` starts the thread; ``close()`` stops it.

    Handler seams (injectable for tests / alternate backends):
      search_fn(index_dir, dork, k) -> list[dict]
      timeseries_fn(index_dir, params) -> list[dict]
    Defaults call the real Ray pipelines (Ray must already be initialised
    by the process that owns the server — same contract as the driver).
    """

    def __init__(
        self,
        index_dir: str,
        config: ApiConfig | None = None,
        search_fn: Callable | None = None,
        timeseries_fn: Callable | None = None,
        users=None,
        ws_config=None,
        cors=None,
        events_bus=None,
        source_registry=None,
    ):
        # /v1/source/* admin surface (main.go:706-725) over the parquet
        # registry; created lazily under index_dir when not injected
        self._source_registry = source_registry
        self._source_lock = threading.Lock()
        self.cors = cors or CorsConfig()
        self.events_bus = events_bus  # EventBus actor → /v1/event/* surface
        self.index_dir = index_dir
        self.cfg = config or ApiConfig()
        self.users = users  # auth.UserStore for JWT mode
        self.search_fn = search_fn or _default_search
        self.timeseries_fn = timeseries_fn or _default_timeseries
        rate, burst = self.cfg.rate_burst()
        self.bucket = _TokenBucket(rate, burst)
        self.httpd: ThreadingHTTPServer | None = None
        self.thread: threading.Thread | None = None
        # /v1/ws live-update hub (main.go:808-810); disabled unless a
        # ws.WSConfig with enabled=True is passed
        from .ws import Hub, WSConfig

        self.ws_hub = Hub("api", ws_config or WSConfig())
        self.route_registry = self._build_route_registry()

    def _build_route_registry(self):
        """Register this server's own routes like services/api/main.go
        does with cmn.RegisterAPIRoute; /v1/docs and /v1/openapi.json
        serve off the registry (main.go:862-930)."""
        from .api_docs import RouteRegistry

        reg = RouteRegistry()
        reg.register("/v1/health", ["GET"], "Service liveness check")
        reg.register("/v1/ready", ["GET"], "Service readiness check")
        reg.register(
            "/v1/search/general", ["GET"],
            "General dorking search over the crawl index",
            query={"type": "object",
                   "properties": {"q": {"type": "string"},
                                  "limit": {"type": "integer"}},
                   "required": ["q"]})
        reg.register(
            "/v1/timeseries", ["GET"],
            "Bucketed time-series aggregates over the events table",
            query={"type": "object",
                   "properties": {"table": {"type": "string"},
                                  "bucket": {"type": "string"},
                                  "metric_col": {"type": "string"}}})
        reg.register(
            "/v1/auth/login", ["POST"], "Local login issuing an HS256 JWT",
            body={"type": "object",
                  "properties": {"username": {"type": "string"},
                                 "password": {"type": "string"}},
                  "required": ["username", "password"]})
        reg.register("/v1/ws", ["GET"],
                     "WebSocket live API updates endpoint",
                     success_status=101)
        reg.register("/v1/docs", ["GET"], "Registered API route listing")
        reg.register("/v1/openapi.json", ["GET"],
                     "Dynamically generated OpenAPI specification")
        # /v1/source/* console (main.go:706-725)
        q_schema = {"type": "object",
                    "properties": {"q": {"type": "string"}},
                    "required": ["q"]}
        reg.register("/v1/source/add", ["GET", "POST"],
                     "Add source endpoint (console)", query=q_schema,
                     success_status=201)
        reg.register("/v1/source/remove", ["GET"],
                     "Remove source endpoint (console)", query=q_schema,
                     success_status=204)
        reg.register("/v1/source/update", ["POST"],
                     "Update source endpoint (console)",
                     body={"type": "object",
                           "properties": {"url": {"type": "string"},
                                          "status": {"type": "string"}},
                           "required": ["url", "status"]},
                     success_status=204)
        reg.register("/v1/source/vacuum", ["GET"],
                     "Vacuum source endpoint (console)", success_status=204)
        reg.register("/v1/source/status", ["GET"],
                     "Single URL status endpoint (console)", query=q_schema)
        reg.register("/v1/source/statuses", ["GET"],
                     "All URLs status endpoint (console)")
        reg.register("/v1/source/statuses/filter", ["GET"],
                     "Filtered URLs status endpoint (console)",
                     query=q_schema)
        return reg

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> int:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                server._handle(self)

            def do_POST(self):
                server._handle(self)

            def do_OPTIONS(self):
                server._handle(self)

        self.httpd = ThreadingHTTPServer(
            (self.cfg.host, self.cfg.port), Handler
        )
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self.thread.start()
        return self.httpd.server_address[1]

    def close(self) -> None:
        self.ws_hub.shutdown()
        if self.httpd:
            self.httpd.shutdown()
            self.httpd.server_close()

    # -- request handling --------------------------------------------------
    def _apply_cors(self, req: BaseHTTPRequestHandler) -> bool:
        """cors.go:24-69 as a pre-step: stashes the CORS headers for
        _json to emit, answers OPTIONS preflights itself. Returns True
        when the request was fully handled (preflight)."""
        req.cors_headers = []
        if not self.cors.enabled:
            return False
        allowed, allow_all = self.cors.normalized()
        origin = (req.headers.get("Origin") or "").strip()
        origin_allowed = False
        if allow_all:
            req.cors_headers.append(("Access-Control-Allow-Origin", "*"))
            origin_allowed = True
        elif origin and origin in allowed:
            req.cors_headers.append(("Access-Control-Allow-Origin", origin))
            req.cors_headers.append(("Vary", "Origin"))
            origin_allowed = True
        req.cors_headers += [
            ("Access-Control-Allow-Methods", "GET, POST, OPTIONS"),
            ("Access-Control-Allow-Headers",
             "Content-Type, Authorization, Accept"),
            ("Access-Control-Max-Age", "86400"),
        ]
        if (req.headers.get("Access-Control-Request-Private-Network", "")
                .lower() == "true"):
            req.cors_headers.append(
                ("Access-Control-Allow-Private-Network", "true"))
        if req.command == "OPTIONS":
            if origin and not origin_allowed:
                return _json(req, 403, {"error": "CORS origin not allowed"}) \
                    or True
            req.send_response(204)
            for k, v in req.cors_headers:
                req.send_header(k, v)
            req.end_headers()
            return True
        return False

    def _handle(self, req: BaseHTTPRequestHandler) -> None:
        parsed = urlparse(req.path)
        path = parsed.path.rstrip("/") or "/"
        qs = {k: v[0] for k, v in parse_qs(parsed.query).items()}

        if self._apply_cors(req):
            return

        # health/ready bypass auth+rate-limit (reference: public middlewares
        # but no auth; they must answer while the service is saturated)
        if path in ("/v1/health", "/v1/ready"):
            return _json(req, 200, {"status": "ok"})

        if not self.bucket.allow():
            return _json(req, 429, {"error": "Rate limit exceeded"})

        if path == "/v1/auth/login" and req.command == "POST":
            return self._login(req)

        auth_header = req.headers.get("Authorization", "")
        if self.cfg.jwt_secret:
            from .auth import AuthError, verify_token

            if not auth_header.startswith("Bearer "):
                return _json(req, 401, {"error": "Unauthorized"})
            try:
                req.claims = verify_token(self.cfg.jwt_secret,
                                          auth_header[len("Bearer "):])
            except AuthError as e:
                return _json(req, 401, {"error": f"Unauthorized: {e}"})
        elif self.cfg.auth_token:
            if auth_header != "Bearer " + self.cfg.auth_token:
                return _json(req, 401, {"error": "Unauthorized"})

        # websocket upgrade sits behind rate limiter AND auth, like every
        # other middleware-wrapped route (main.go:809,1100-1110 mounts
        # /v1/ws behind withMiddlewares which includes auth.Middleware)
        if path == "/v1/ws":
            return self.ws_hub.handle_upgrade(req)

        if path == "/v1/docs":
            return _json(req, 200, {
                "service": "CROWler API", "version": "v1",
                "endpoints": [r.to_dict()
                              for r in self.route_registry.get_routes()]})
        if path == "/v1/openapi.json":
            from .api_docs import build_openapi_spec

            return _json(req, 200, build_openapi_spec(
                self.route_registry.get_routes(),
                title="CROWler Search API", version="v1",
                description="Dynamically generated OpenAPI spec from the "
                            "running server route registry.",
                server_url=f"http://{self.cfg.host}"))

        if path.startswith("/v1/event/") and self.events_bus is not None:
            return self._handle_event(req, path, qs)

        if path.startswith("/v1/source/"):
            try:
                return self._handle_source(req, path, qs)
            except ValueError as e:
                return _json(req, 400, {"message": str(e)})
            except Exception as e:
                return _json(req, 500,
                             {"message": f"{type(e).__name__}: {e}"})

        try:
            if path == "/v1/search/general":
                q = qs.get("q", "")
                if not q:
                    return _json(req, 400, {"error": "missing q"})
                k = int(qs.get("limit", "10"))
                rows = self.search_fn(self.index_dir, q, k)
                return _json(req, 200, {"query": q, "results": rows})
            if path == "/v1/timeseries":
                rows = self.timeseries_fn(self.index_dir, qs)
                return _json(req, 200, {"results": rows})
            return _json(req, 404, {"error": f"no such endpoint {path}"})
        except Exception as e:  # handler errors → 500, server stays up
            return _json(req, 500, {"error": f"{type(e).__name__}: {e}"})


    # -- /v1/source/* admin surface (services/api/main.go:706-725) ----------

    def _registry(self):
        if self._source_registry is None:
            from .source_registry import SourceRegistry

            self._source_registry = SourceRegistry(
                os.path.join(self.index_dir, "sources.parquet"))
        return self._source_registry

    @staticmethod
    def _read_body(req: BaseHTTPRequestHandler) -> dict:
        n = int(req.headers.get("Content-Length") or 0)
        raw = req.rfile.read(n) if n else b""
        return json.loads(raw) if raw.strip() else {}

    @staticmethod
    def _status_row(r) -> dict:
        import math

        def ts(v):
            return "" if v is None or (isinstance(v, float)
                                       and math.isnan(v)) else str(v)

        return {
            "source_id": int(r["source_id"]),
            "source_uid": r["source_uid"],
            "url": r["url"], "status": r["status"],
            "priority": r["priority"] or "",
            "engine": r.get("engine", "") or "",
            "created_at": ts(r["created_at"]),
            "last_updated_at": ts(r["last_updated_at"]),
            "last_crawled_at": ts(r["last_crawled_at"]),
            "restricted": int(r["restricted"]),
            "disabled": bool(r["disabled"]),
            "flags": int(r["flags"]),
        }

    def _handle_source(self, req: BaseHTTPRequestHandler, path: str,
                       qs: dict) -> None:
        """add/remove/update/vacuum/status/statuses[/filter] console over
        the parquet-backed SourceRegistry (console.go:715-1057: GET takes
        'q', POST takes a JSON body; add defaults restricted=2 status=
        'pending'; statuses respond {message, items})."""
        from .source_registry import normalize_source_url
        from .urls import normalize_url

        op = path[len("/v1/source/"):]
        reg = self._registry()
        q = qs.get("q", "")

        if op == "add":
            with self._source_lock:
                if req.command == "POST":
                    body = self._read_body(req)
                    url = normalize_url(str(body.get("url", "")).strip())
                    if not url:
                        return _json(req, 400, {"message": "Invalid URL"})
                    sid = reg.add_source(
                        url, name=str(body.get("name", "")),
                        priority=str(body.get("priority", "")),
                        category_id=int(body.get("category_id", 0)),
                        usr_id=int(body.get("usr_id", 0)),
                        restricted=int(body.get("restricted", 2)),
                        flags=int(body.get("flags", 0)),
                        config=body.get("config"),
                        status=str(body.get("status", "pending")),
                        now_s=time.time())
                else:
                    if not q:
                        return _json(req, 400, {
                            "message": "Missing parameter 'q' in addSource "
                                       "request"})
                    # console GET defaults (console.go:718-729)
                    sid = reg.add_source(normalize_url(q.strip()),
                                         restricted=2, status="pending",
                                         now_s=time.time())
                reg.save()
            return _json(req, 201, {
                "message": "Source added successfully", "source_id": sid})

        if op == "remove":
            if not q:
                return _json(req, 400, {
                    "message": "Missing parameter 'q' in removeSource "
                               "request"})
            with self._source_lock:
                res = reg.remove_source(normalize_source_url(q))
                reg.save()
            if "successfully" not in res.message:
                return _json(req, 500, dict(res))
            return _no_content(req)

        if op == "update":
            body = self._read_body(req) if req.command == "POST" else {}
            status = str(body.get("status", qs.get("status", "")))
            url = str(body.get("url", q))
            if not status or not url:
                return _json(req, 400,
                             {"message": "missing url or status"})
            with self._source_lock:
                n = reg.update_status(status, url=url)
                reg.save()
            return _no_content(req)

        if op == "vacuum":
            with self._source_lock:
                reg.save()
            return _no_content(req)

        if op in ("status", "statuses", "statuses/filter"):
            df = reg.df
            if op == "status":
                if not q:
                    return _json(req, 400, {
                        "message": "Missing parameter 'q' in status "
                                   "request"})
                df = df[df["url"] == normalize_source_url(q)]
            elif op == "statuses/filter":
                if not q:
                    return _json(req, 400, {
                        "message": "Missing parameter 'q' in status "
                                   "request"})
                df = df[df["url"].str.contains(q, regex=False)]
            items = [self._status_row(r) for _, r in
                     df.sort_values("source_id").iterrows()]
            return _json(req, 200,
                         {"message": "All Sources status", "items": items})

        return _json(req, 404, {"error": f"no such endpoint {path}"})

    def _handle_event(self, req: BaseHTTPRequestHandler, path: str,
                      qs: dict) -> None:
        """/v1/event/* surface over the EventBus actor (reference
        services/events/main.go:579-1160: create/schedule/check/update/
        remove/removeEventsBefore/list). Created events broadcast
        ``event.created`` on the ws hub (main.go:1185)."""
        import ray

        bus = self.events_bus
        op = path[len("/v1/event/"):]
        body = {}
        if req.command == "POST":
            try:
                length = int(req.headers.get("Content-Length", "0"))
                body = json.loads(req.rfile.read(length) or b"{}")
            except (ValueError, OSError):
                return _json(req, 400, {"error": "invalid JSON body"})
        try:
            if op == "create" and req.command == "POST":
                eid = ray.get(bus.publish.remote(
                    body.get("action", ""), body.get("type", "event"),
                    severity=body.get("severity", "info"),
                    details=body.get("details") or {},
                    ttl_seconds=body.get("ttl_seconds")))
                self.ws_hub.broadcast("event.created",
                                      {"event_id": eid, **body})
                return _json(req, 200, {"id": eid,
                                        "msg": "Event created successfully"})
            if op == "schedule" and req.command == "POST":
                for field_name in ("name", "action", "every_seconds"):
                    if not body.get(field_name):
                        return _json(req, 400,
                                     {"error": f"missing {field_name}"})
                ray.get(bus.add_schedule.remote(
                    body["name"], body["action"],
                    float(body["every_seconds"])))
                return _json(req, 200,
                             {"msg": "Event scheduled successfully"})
            if op == "check":
                if not qs.get("event_id"):
                    return _json(req, 400,
                                 {"error": "Missing event_id parameter"})
                event = ray.get(bus.get.remote(int(qs["event_id"])))
                if event is None:
                    return _json(req, 404, {"error": "event not found"})
                return _json(req, 200, {"event": event})
            if op == "update" and req.command == "POST":
                if not body.get("event_id"):
                    return _json(req, 400,
                                 {"error": "Missing event_id parameter"})
                ok = ray.get(bus.update.remote(
                    int(body["event_id"]), severity=body.get("severity"),
                    details=body.get("details"),
                    action=body.get("action")))
                if not ok:
                    return _json(req, 404, {"error": "event not found"})
                return _json(req, 200,
                             {"msg": "Event updated successfully"})
            if op == "remove":
                if not qs.get("event_id"):
                    return _json(req, 400,
                                 {"error": "Missing event_id parameter"})
                ray.get(bus.ack.remote(int(qs["event_id"])))
                return _json(req, 200, {"id": qs["event_id"],
                                        "msg": "Event removed successfully"})
            if op == "removeEventsBefore":
                cutoff = _parse_event_timestamp(qs.get("timestamp", ""))
                if cutoff is None:
                    return _json(req, 400,
                                 {"error": "Invalid 'timestamp' parameter"})
                removed = ray.get(bus.remove_before.remote(cutoff))
                return _json(req, 200, {"removed": removed,
                                        "msg": "Events removed successfully"})
            if op == "list":
                events = ray.get(bus.poll.remote(None, None))
                return _json(req, 200, {"events": events})
            return _json(req, 404, {"error": f"no such endpoint {path}"})
        except Exception as e:
            return _json(req, 500, {"error": f"{type(e).__name__}: {e}"})

    def _login(self, req: BaseHTTPRequestHandler) -> None:
        """POST /v1/auth/login (main.go:841-860): {username, password} →
        {access_token, token_type: Bearer, expires_in}."""
        from .auth import AuthError, login

        if not self.cfg.jwt_secret or self.users is None:
            return _json(req, 401, {"error": "local auth disabled"})
        try:
            length = int(req.headers.get("Content-Length", "0"))
            body = json.loads(req.rfile.read(length) or b"{}")
            token = login(self.users, str(body.get("username", "")),
                          str(body.get("password", "")),
                          self.cfg.jwt_secret, self.cfg.token_ttl)
        except AuthError:
            return _json(req, 401, {"error": "Unauthorized"})
        except Exception as e:
            return _json(req, 400, {"error": f"bad request: {e}"})
        return _json(req, 200, {"access_token": token,
                                "token_type": "Bearer",
                                "expires_in": self.cfg.token_ttl})


def _parse_event_timestamp(raw: str) -> float | None:
    """removeEventsBeforeHandler's forgiving parse (main.go:1009-1035):
    RFC 3339, plain YYYY-MM-DD, or a unix-epoch integer."""
    import datetime as _dt

    raw = (raw or "").strip()
    if not raw:
        return None
    for parser in (
        lambda s: _dt.datetime.fromisoformat(s.replace("Z", "+00:00")),
        lambda s: _dt.datetime.strptime(s, "%Y-%m-%d").replace(
            tzinfo=_dt.timezone.utc),
    ):
        try:
            return parser(raw).timestamp()
        except ValueError:
            continue
    try:
        return float(int(raw))
    except ValueError:
        return None


def _json(req: BaseHTTPRequestHandler, code: int, obj: dict) -> None:
    body = json.dumps(obj).encode("utf-8")
    req.send_response(code)
    req.send_header("Content-Type", "application/json")
    req.send_header("Content-Length", str(len(body)))
    for k, v in getattr(req, "cors_headers", ()):
        req.send_header(k, v)
    req.end_headers()
    req.wfile.write(body)


def _no_content(req) -> None:
    """RFC 7231: 204 responses carry no body (console remove/update/vacuum
    success codes, main.go:710-716)."""
    req.send_response(204)
    for k, v in getattr(req, "cors_headers", ()):
        req.send_header(k, v)
    req.end_headers()


def _default_search(index_dir: str, dork: str, k: int) -> list[dict]:
    from .pipelines.search_api import search_pages

    df = search_pages(index_dir, dork, k=k)
    return df.to_dict(orient="records")


def _default_timeseries(index_dir: str, params: dict) -> list[dict]:
    """Bucket aggregates over an events parquet table under the index dir
    (reference /v1/timeseries over the TimeSeries tables)."""
    import ray.data

    from .stages.timeseries import timeseries_aggregate

    # 'table' is a logical name resolved under index_dir, never a raw
    # path: a client-controlled path would let any caller read arbitrary
    # parquet on the server filesystem (endpoint is public-middleware in
    # the reference).
    table = params.get("table", "events")
    if table.endswith(".parquet"):
        table = table[: -len(".parquet")]
    base = os.path.realpath(index_dir)
    path = os.path.realpath(os.path.join(base, f"{table}.parquet"))
    if os.path.commonpath([base, path]) != base:
        raise ValueError(f"invalid table name: {params.get('table')!r}")
    ds = ray.data.read_parquet(path)
    out = timeseries_aggregate(
        ds,
        metric_col=params.get("metric_col", "event_type"),
        ts_col=params.get("ts_col", "ts"),
        value_col=params.get("value_col", "value"),
        entity_col=params.get("entity_col", "user_id"),
        bucket=params.get("bucket", "h"),
    )
    df = out.to_pandas()
    for c in df.columns:  # timestamps → ISO strings for JSON
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.to_dict(orient="records")
