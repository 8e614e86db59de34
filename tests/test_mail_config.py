"""Mail source-config validation tests
(pkg/mail/config/validation.go:36-434)."""

import pytest

from thecrowler_ray.sources.mail_config import (
    InvalidMailConfig,
    default_source_config,
    validate_source_config,
)
from thecrowler_ray.sources.mail_listener import load_listener_sources


def _valid(provider="imap", endpoint="imaps://mail.example.test:993",
           **over):
    cfg = default_source_config()
    cfg["connector"]["provider"] = provider
    cfg["connector"]["endpoint"] = endpoint
    cfg["auth"]["credential_ref"] = "cred-1"
    for path, value in over.items():
        node = cfg
        *parents, leaf = path.split(".")
        for p in parents:
            node = node[p]
        node[leaf] = value
    return cfg


def test_defaults_validate_once_required_fields_set():
    validate_source_config(_valid())
    validate_source_config(_valid("mbox", "mbox:///var/mail/u"))
    # local providers need no credential
    cfg = _valid("maildir", "maildir:///home/u/Maildir")
    cfg["auth"]["credential_ref"] = ""
    validate_source_config(cfg)


def _expect(message_part, cfg):
    with pytest.raises(InvalidMailConfig) as err:
        validate_source_config(cfg)
    assert message_part in str(err.value), str(err.value)


def test_endpoint_rules():
    _expect("unsupported", _valid("smtp"))
    _expect("endpoint is required", _valid(endpoint=""))
    _expect("whitespace", _valid(endpoint="imaps://mail.example .test"))
    _expect("scheme must be imap or imaps",
            _valid(endpoint="https://mail.example.test"))
    _expect("must contain a host", _valid(endpoint="imaps:///nohost"))
    _expect("query or fragment",
            _valid(endpoint="imaps://h.test/?x=1"))
    _expect("credentials",
            _valid(endpoint="imaps://user:pw@h.test"))
    _expect("port must be between",
            _valid(endpoint="imaps://h.test:70000"))
    # local providers: absolute path, no host, no TLS
    _expect("absolute path", _valid("mbox", "mbox://host/var/mail"))
    _expect("absolute path", _valid("mbox", "mbox:///"))
    cfg = _valid("mbox", "mbox:///var/mail/u")
    cfg["connector"]["tls"] = {"server_name": "x"}
    _expect("tls is not valid", cfg)
    # TLS options only on the secure scheme
    cfg2 = _valid(endpoint="imap://h.test:143")
    cfg2["connector"]["tls"] = {"insecure_skip_verify": True}
    _expect("require an imaps endpoint", cfg2)
    # gmail endpoints may carry a bare username
    validate_source_config(_valid("gmail", "gmail://acct@gmail"))


def test_crawl_and_limit_orderings():
    _expect("batch_size must not exceed",
            _valid(**{"crawl.batch_size": 2000}))
    _expect("max_attachment_bytes must not exceed max_message_bytes",
            _valid(**{"crawl.limits.max_attachment_bytes": 30 << 20}))
    _expect("max_total_attachment_bytes",
            _valid(**{"crawl.limits.max_total_attachment_bytes": 30 << 20}))
    _expect("max_header_bytes",
            _valid(**{"crawl.limits.max_header_bytes": 0}))
    _expect("mode must be",
            _valid(**{"crawl.mode": "stream"}))


def test_extraction_safety_listener_reconciliation():
    _expect("follow_remote requires extraction.links.extract",
            _valid(**{"extraction.links.extract": False,
                      "extraction.links.follow_remote": True}))
    _expect("requires extraction.attachments.include",
            _valid(**{"extraction.attachments.download": True}))
    _expect("must remain static",
            _valid(**{"safety.allow_remote_resources": True}))
    _expect("read-only",
            _valid(**{"safety.allow_mailbox_mutation": True}))
    # follow_remote needs an allowlist or the explicit opt-in
    cfg = _valid(**{"extraction.links.follow_remote": True})
    _expect("non-empty allowlist", cfg)
    cfg["extraction"]["links"]["allowlist"] = ["example.test"]
    validate_source_config(cfg)
    cfg["extraction"]["links"]["allowlist"] = []
    cfg["safety"]["allow_unrestricted_links"] = True
    validate_source_config(cfg)
    # listener mode coupling
    _expect("listener.enabled must be true",
            _valid(**{"crawl.mode": "listen"}))
    _expect("crawl.mode must be 'listen'",
            _valid(**{"listener.enabled": True}))
    bad = _valid("pop3", "pop3s://h.test",
                 **{"crawl.mode": "listen", "listener.enabled": True})
    _expect("not supported by provider", bad)
    _expect("lease_ttl must be shorter",
            _valid(**{"reconciliation.lease_ttl": 400.0}))
    _expect("full_sync_interval must not be shorter",
            _valid(**{"reconciliation.full_sync_interval": 10.0}))


def test_plugs_into_listener_loader():
    good = _valid(**{"crawl.mode": "listen", "listener.enabled": True})
    bad = _valid(endpoint="")  # invalid → silently skipped by the loader
    bad["crawl"]["mode"] = "listen"
    bad["listener"]["enabled"] = True
    sources = [
        {"source_id": 1, "url": "imaps://h/", "config": good},
        {"source_id": 2, "url": "imaps://h/", "config": bad},
    ]
    eligible = load_listener_sources(sources,
                                     validate=validate_source_config)
    assert [s["id"] for s in eligible] == [1]
