"""Configuration loading (S8): YAML + env substitution + per-source merge.

Reimplements (semantics only) the reference's config pipeline
(``pkg/config/config.go``): ``${ENV_VAR}`` / ``${ENV_VAR:-default}``
substitution in the YAML text, defaults applied, and ``combine_config`` —
the per-source JSON config deep-merged over the global config
(``pkg/crawler/crawler.go:124-132`` CombineConfig; per-source keys win,
nested dicts merge recursively, lists replace wholesale).
"""

from __future__ import annotations

import os
import re

import yaml

_ENV_RE = re.compile(r"\$\{(\w+)(?::-([^}]*))?\}")

DEFAULTS: dict = {
    "crawler": {
        "workers": 3,
        "max_depth": 0,
        "max_links": 0,
        "interval": "random(1,3)",
        "delay": "random(1,3)",
        "timeout": 60,
        "max_retries": 3,
        "collect_html": False,
        "collect_meta_tags": True,
        "collect_keywords": True,
        "check_for_robots": False,
        "prevent_duplicate_urls": True,
        "browsing_mode": "recursive",
    },
    "politeness": {"rate": 1_000_000_000, "capacity": 1_000_000_000},
    "engine": {
        "n_seen_shards": 8,
        "n_pol_shards": 8,
        "n_key_buckets": 64,
        "fetch_batch_size": 128,
    },
}


def substitute_env(text: str, env: dict | None = None) -> str:
    env = os.environ if env is None else env

    def sub(m: re.Match) -> str:
        return str(env.get(m.group(1), m.group(2) if m.group(2) is not None else ""))

    return _ENV_RE.sub(sub, text)


def deep_merge(base: dict, override: dict) -> dict:
    """Recursive merge: override wins; nested dicts merge; lists replace."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(yaml_text: str, env: dict | None = None) -> dict:
    """YAML string → config dict with env substitution + defaults."""
    doc = yaml.safe_load(substitute_env(yaml_text, env)) or {}
    return deep_merge(DEFAULTS, doc)


def combine_config(global_config: dict, source_config: dict | None) -> dict:
    """Per-source config overrides the global config (reference
    CombineConfig). The per-source document uses the ``crawling_config``
    envelope; its keys land under ``crawler``."""
    if not source_config:
        return global_config
    merged = deep_merge(global_config, {
        k: v for k, v in source_config.items() if k != "crawling_config"
    })
    cc = source_config.get("crawling_config")
    if isinstance(cc, dict):
        merged = deep_merge(merged, {"crawler": cc})
    return merged
