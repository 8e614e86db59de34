"""Subscription-renewal coordinator tests (pkg/mail/renewal.go):
due/expired boundaries with the half-lifetime margin cap, status
precedence, success/failure persistence, bounded retry scheduling."""

from datetime import datetime, timedelta, timezone

import pytest

from thecrowler_ray.sources.mail_renewal import (
    RenewalCoordinator,
    empty_metadata,
    next_renewal_at,
    renewal_due,
    renewal_status_at,
    safe_renewal_retry_at,
)

T0 = datetime(2026, 8, 17, 12, 0, tzinfo=timezone.utc)


def _meta(**over):
    return {**empty_metadata(), **over}


def test_due_and_margin_cap():
    # no expiry recorded → always due, never expired
    assert renewal_due(T0, _meta(), 600) == (True, False)
    # boundary = expiry - margin
    m = _meta(expires_at=T0 + timedelta(seconds=1000),
              last_renewed_at=T0 - timedelta(seconds=9000))
    assert renewal_due(T0, m, 600) == (False, False)
    assert renewal_due(T0 + timedelta(seconds=400), m, 600) == (True, False)
    # expiry at now is both due and expired
    m2 = _meta(expires_at=T0)
    assert renewal_due(T0, m2, 0) == (True, True)
    # margin capped at half the granted lifetime
    short = _meta(last_renewed_at=T0, expires_at=T0 + timedelta(seconds=100))
    assert next_renewal_at(short, 600) == T0 + timedelta(seconds=50)


def test_status_precedence():
    failed = _meta(failure_count=2, expires_at=T0 - timedelta(seconds=1))
    assert renewal_status_at(T0, failed, 0) == "failed"  # beats expired
    assert renewal_status_at(T0, _meta(expires_at=T0), 0) == "expired"
    due = _meta(expires_at=T0 + timedelta(seconds=10))
    assert renewal_status_at(T0, due, 60) == "due"
    healthy = _meta(expires_at=T0 + timedelta(seconds=9000),
                    last_renewed_at=T0)
    assert renewal_status_at(T0, healthy, 60) == "healthy"


def test_retry_capped_before_expiry():
    soon = T0 + timedelta(seconds=100)
    # plain retry when it lands before expiry
    assert safe_renewal_retry_at(T0, soon, 30) == T0 + timedelta(seconds=30)
    # capped at half the remaining lifetime otherwise
    assert safe_renewal_retry_at(T0, soon, 300) == \
        T0 + timedelta(seconds=50)
    assert safe_renewal_retry_at(T0, None, 300) == \
        T0 + timedelta(seconds=300)


class Store:
    def __init__(self, metadata=None):
        self.metadata = metadata or empty_metadata()
        self.version = "v1"
        self.commits = []

    def load(self, key):
        return dict(self.metadata), self.version

    def commit(self, key, version, metadata):
        assert version == self.version
        self.commits.append(metadata)
        self.metadata = metadata


def test_renew_success_and_failure_cycle():
    store = Store()
    scheduled = []
    calls = []

    def renewer(key):
        calls.append(key)
        if len(calls) == 1:
            raise ConnectionError("watch API down")
        return {"subscription_id": " sub-9 ", "resource_path": "topic/x",
                "expires_at": T0 + timedelta(hours=2)}

    c = RenewalCoordinator(store, renewer,
                           scheduler=lambda k, at: scheduled.append(at),
                           safety_margin=600, retry_delay=120,
                           now=lambda: T0)
    d1 = c.renew_if_due("mb")
    assert d1["attempted"] and not d1["renewed"]
    assert d1["status"] == "failed"
    assert store.metadata["failure_count"] == 1
    assert "watch API down" in store.metadata["last_error"]
    assert scheduled[-1] == T0 + timedelta(seconds=120)  # bounded retry
    assert isinstance(d1["error"], ConnectionError)

    d2 = c.renew_if_due("mb")
    assert d2["renewed"] and d2["status"] == "healthy"
    meta = store.metadata
    assert meta["subscription_id"] == "sub-9"
    assert meta["failure_count"] == 0 and meta["last_error"] == ""
    assert meta["expires_at"] == T0 + timedelta(hours=2)
    assert scheduled[-1] == T0 + timedelta(hours=2) - timedelta(seconds=600)

    # now healthy → not due; only scheduling happens
    d3 = c.renew_if_due("mb")
    assert not d3["attempted"] and d3["status"] == "healthy"
    assert len(store.commits) == 2  # no new persistence


def test_stale_provider_expiry_is_a_failure():
    store = Store()
    c = RenewalCoordinator(
        store, lambda k: {"subscription_id": "s", "resource_path": "r",
                          "expires_at": T0 - timedelta(seconds=1)},
        now=lambda: T0)
    d = c.renew_if_due("mb")
    assert d["status"] == "failed"
    assert "not in the future" in store.metadata["last_error"]
    with pytest.raises(ValueError):
        RenewalCoordinator(None, lambda k: None)
    with pytest.raises(ValueError):
        RenewalCoordinator(store, lambda k: None, safety_margin=-1)
