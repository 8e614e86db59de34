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
        try:
            fn = self._plugins[name]
        except KeyError:
            raise PluginNotFoundError(f"plugin not found: {name!r}") from None
        return normalize_external_value(fn(ctx))

    def run_agent(self, name: str, ctx: dict) -> list:
        try:
            fn = self._agents[name]
        except KeyError:
            raise PluginNotFoundError(f"agent not found: {name!r}") from None
        return normalize_external_value(fn(ctx))
