"""Retry taxonomy tests (pkg/mail/errors.go:114-277)."""

import pytest

from thecrowler_ray.sources.mail_errors import (
    CanceledError,
    MailError,
    RetryPolicy,
    decide_retry,
    retryable,
)


def test_backoff_curve():
    p = RetryPolicy(max_attempts=5, initial_backoff=1.0, max_backoff=30.0)
    assert [p.backoff(i) for i in (1, 2, 3, 4, 5, 6, 7)] == \
        [1.0, 2.0, 4.0, 8.0, 16.0, 30.0, 30.0]
    # normalization: zero values select defaults; initial capped at max
    assert RetryPolicy().backoff(1) == 1.0
    assert RetryPolicy(initial_backoff=60, max_backoff=30).backoff(1) == 30


def test_decide_retry_actions():
    policy = RetryPolicy(max_attempts=3, initial_backoff=1.0,
                         max_backoff=30.0)
    d = decide_retry(MailError("network", "fetch", "conn reset"), 1, policy)
    assert d == {"action": "retry", "reason": "transient", "delay": 1.0}
    # rate-limit honours a retry-after hint, capped at max backoff
    d2 = decide_retry(MailError("rate_limit", retry_after=10.0), 1, policy)
    assert d2["delay"] == 10.0
    d3 = decide_retry(MailError("rate_limit", retry_after=100.0), 1, policy)
    assert d3["delay"] == 30.0
    # budget exhaustion (one-based attempt counting incl. initial call)
    d4 = decide_retry(MailError("timeout"), 3, policy)
    assert d4 == {"action": "fail", "reason": "exhausted", "delay": 0.0}
    # discard classes never retry
    for kind in ("oversized", "policy"):
        assert decide_retry(MailError(kind), 1, policy)["action"] == \
            "discard"
    assert decide_retry(MailError("malformed"), 1, policy) == \
        {"action": "discard", "reason": "malformed", "delay": 0.0}
    # auth fails without discard; unknown kinds are permanent
    assert decide_retry(MailError("authentication"), 1, policy) == \
        {"action": "fail", "reason": "authentication", "delay": 0.0}
    assert decide_retry(MailError("permission"), 1, policy)["reason"] == \
        "permanent"
    # cancellation and plain exceptions
    assert decide_retry(CanceledError(), 1, policy)["reason"] == "canceled"
    assert decide_retry(ValueError("x"), 1, policy)["action"] == "fail"
    assert decide_retry(TimeoutError(), 1, policy)["action"] == "retry"
    assert decide_retry(None, 1, policy)["reason"] == "permanent"


def test_retryable_helper():
    assert retryable(MailError("transient"))
    assert retryable(TimeoutError())
    assert not retryable(MailError("malformed"))
    assert not retryable(CanceledError())
    assert not retryable(None)
    # log-safe message formatting
    e = MailError("network", "fetch inbox", "connection reset")
    assert str(e) == "mail: fetch inbox: connection reset"
