"""Plugin / agent call seam (SURVEY.md §2.10).

The reference embeds a JS VM (``pkg/plugin/plugins.go``) and an agent
runtime (``pkg/agent/``); rulesets reach them through ``plugin_call`` /
``agent_call`` selectors and post-processing steps, resolved via a runtime
lookup by NAME (``pkg/scraper/rules.go:133-150`` extractExternal →
``runtime.Plugins.RunPlugin(name)`` / ``runtime.Agents``; absence yields
``UnavailableCapabilityError``). The embedded VM itself is out of sandbox
scope, but the *call contract* — named external handlers invoked with the
page context, returning values that flow into extracted data — is plain
data-plane behavior. This registry implements that contract with Python
callables, so public rulesets that reference plugins run once the handler
is registered (on a real deployment the callable shells into the JS VM).

Handlers receive ``ctx = {url, html, rule_name, selector, data}`` and may
return None / scalar / list; values normalize like the reference's
``normalizeExternalValue`` (None → [], scalar → [scalar]).
"""

from __future__ import annotations


class UnavailableCapabilityError(NotImplementedError):
    """Selector needs a plugin/agent runtime that is not configured
    (reference scraper.UnavailableCapabilityError)."""


class PluginNotFoundError(KeyError):
    pass


def normalize_external_value(value) -> list:
    if value is None:
        return []
    if isinstance(value, (list, tuple)):
        return list(value)
    return [value]


class PluginRegistry:
    """Named plugin + agent handlers (one registry per ScrapeStage actor —
    built once in ``__init__`` like the reference's rules-engine cache)."""

    def __init__(self):
        self._plugins: dict[str, object] = {}
        self._agents: dict[str, object] = {}

    def register_plugin(self, name: str, fn) -> "PluginRegistry":
        self._plugins[name] = fn
        return self

    def register_js_plugin(self, name: str, source: str,
                           max_ops: int = 500_000) -> "PluginRegistry":
        """Register an actual JS plugin script, executed by the bounded
        JS-subset interpreter (``thecrowler_ray.minijs``; reference contract
        ``plugins.go:983,2265-2299``: the script sees ``params`` = ctx and
        exports via ``var result = …`` or its final expression). Parse
        errors surface at registration, not at scrape time."""
        from .minijs import Interpreter, _Parser, _tokenize

        _Parser(_tokenize(source)).program()  # fail fast on bad scripts

        def run(ctx: dict):
            return Interpreter(max_ops=max_ops).run(source, ctx)

        self._plugins[name] = run
        return self

    def register_vdi_plugin(self, name: str, source: str,
                            max_ops: int = 500_000) -> "PluginRegistry":
        """Register a vdi_plugin (reference ``plugins.go:751-795``: runs in
        the browser page via ExecuteScript). Here it runs against the parsed
        DOM (``domjs.run_dom_plugin``); the handler returns the plugin's
        result and leaves the mutated HTML in ``ctx["html"]`` so downstream
        selectors see the post-plugin page."""
        from .minijs import _Parser, _tokenize

        _Parser(_tokenize(source)).program()  # fail fast on bad scripts

        def run(ctx: dict):
            from .domjs import run_dom_plugin

            result, mutated = run_dom_plugin(
                source, ctx.get("html", ""), ctx, max_ops=max_ops)
            ctx["html"] = mutated
            return result

        self._plugins[name] = run
        return self

    def register_agent(self, name: str, fn) -> "PluginRegistry":
        self._agents[name] = fn
        return self

    def run_plugin(self, name: str, ctx: dict) -> list:
        return normalize_external_value(self.run_plugin_raw(name, ctx))

    def run_plugin_raw(self, name: str, ctx: dict):
        """The plugin's return value verbatim (the reference's ``pRval``,
        action_run_plugin.go:154-177) — no list normalization."""
        try:
            fn = self._plugins[name]
        except KeyError:
            raise PluginNotFoundError(f"plugin not found: {name!r}") from None
        return fn(ctx)

    def run_agent(self, name: str, ctx: dict) -> list:
        try:
            fn = self._agents[name]
        except KeyError:
            raise PluginNotFoundError(f"agent not found: {name!r}") from None
        return normalize_external_value(fn(ctx))


# ---------------------------------------------------------------------------
# Plugin unit-test harness (pkg/plugin/plugins.go:1124-1407 PlgTestHarness +
# ExecEnginePluginTest). Original JS implementing the documented assertion
# contract — test() collects {name, ok, error} rows, the runner composes
# harness + plugin + tests and reads __crowler_test_results back.
# ---------------------------------------------------------------------------

PLG_TEST_HARNESS = r"""
var __crowler_test_results = [];

function test(name, fn) {
    try {
        fn();
        __crowler_test_results.push({ name: name, ok: true });
    } catch (e) {
        __crowler_test_results.push({ name: name, ok: false,
                                      error: String(e) });
    }
}

function assertTrue(cond, msg) {
    if (!cond) throw new Error(msg || "assertTrue failed");
}
function assertFalse(cond, msg) {
    if (cond) throw new Error(msg || "assertFalse failed");
}
function assertEqual(a, b, msg) {
    if (a !== b) {
        throw new Error(msg || ("assertEqual failed: " + a + " !== " + b));
    }
}
function assertNotEqual(a, b, msg) {
    if (a === b) {
        throw new Error(msg || ("assertNotEqual failed: " + a + " === " + b));
    }
}
function assertThrows(fn, msg) {
    var threw = false;
    try { fn(); } catch (e) { threw = true; }
    if (!threw) throw new Error(msg || "assertThrows failed");
}
function assertDeepEqual(a, b, msg) {
    var sa = JSON.stringify(a);
    var sb = JSON.stringify(b);
    if (sa !== sb) {
        throw new Error(msg ||
            ("assertDeepEqual failed: " + sa + " !== " + sb));
    }
}
function assertType(val, type, msg) {
    if (typeof val !== type) {
        throw new Error(msg || ("assertType failed: expected " + type +
                                ", got " + typeof val));
    }
}
function assertDefined(val, msg) {
    if (typeof val === "undefined") {
        throw new Error(msg || "assertDefined failed");
    }
}
function assertUndefined(val, msg) {
    if (typeof val !== "undefined") {
        throw new Error(msg || "assertUndefined failed");
    }
}
function assertIsObject(val, msg) {
    if (val === null || typeof val !== "object" || Array.isArray(val)) {
        throw new Error(msg || "assertIsObject failed");
    }
}
function assertIsArray(val, msg) {
    if (!Array.isArray(val)) {
        throw new Error(msg || "assertIsArray failed");
    }
}
function __normalizeJSON(value) {
    if (Array.isArray(value)) {
        var arr = [];
        for (var i = 0; i < value.length; i++) {
            arr.push(__normalizeJSON(value[i]));
        }
        return arr;
    }
    if (value && typeof value === "object") {
        var keys = Object.keys(value).sort();
        var out = {};
        for (var j = 0; j < keys.length; j++) {
            out[keys[j]] = __normalizeJSON(value[keys[j]]);
        }
        return out;
    }
    return value;
}
function assertJSONEqual(a, b, msg) {
    var sa = JSON.stringify(__normalizeJSON(a));
    var sb = JSON.stringify(__normalizeJSON(b));
    if (sa !== sb) {
        throw new Error(msg ||
            ("assertJSONEqual failed: " + sa + " !== " + sb));
    }
}
function assertArrayLength(arr, expected, msg) {
    if (!Array.isArray(arr)) {
        throw new Error(msg || "assertArrayLength failed: not an array");
    }
    if (arr.length !== expected) {
        throw new Error(msg || ("assertArrayLength failed: " + arr.length +
                                " !== " + expected));
    }
}
"""


def exec_plugin_test(plugin_script: str, test_script: str,
                     params: dict | None = None,
                     max_ops: int = 5_000_000) -> list[dict]:
    """ExecEnginePluginTest (plugins.go:1410-1470): compose
    harness + plugin + tests, run in one minijs VM, return
    ``[{"name", "passed", "error"}, ...]`` parsed from
    ``__crowler_test_results``."""
    from .minijs import run_script

    full = (PLG_TEST_HARNESS + "\n\n" + plugin_script + "\n\n"
            + test_script + "\n\nresult = __crowler_test_results;")
    raw = run_script(full, params=params or {}, max_ops=max_ops)
    import json as _json

    rows = _json.loads(raw) if isinstance(raw, str) else raw
    return [{"name": r.get("name", ""), "passed": bool(r.get("ok")),
             "error": r.get("error", "")} for r in rows]
