"""Mail error taxonomy + retry decisions (reference
``pkg/mail/errors.go``).

Failures classify into provider-neutral kinds (no provider or secret
details leak into the message); ``decide_retry`` turns a failure into a
bounded action with the reference's exact semantics (:114-267):

- cancellation always fails without retrying;
- transient/network/timeout/rate-limit/partial retry with capped
  exponential backoff (double, jumping to the max once past half) and
  honour a provider retry-after hint up to the max backoff;
- oversized/policy/malformed failures are *discarded* — re-fetching the
  same content can never make it valid (mailbox-level failures never use
  discard);
- authentication and every other kind fail for operator intervention;
- the attempt budget (default 3 incl. the initial call) converts a
  retryable failure into ``exhausted``.
"""

from __future__ import annotations

from dataclasses import dataclass

KIND_TRANSIENT = "transient"
KIND_NETWORK = "network"
KIND_TIMEOUT = "timeout"
KIND_RATE_LIMIT = "rate_limit"
KIND_PARTIAL = "partial"
KIND_AUTHENTICATION = "authentication"
KIND_PERMISSION = "permission"
KIND_CONFIGURATION = "configuration"
KIND_MAILBOX_NOT_FOUND = "mailbox_not_found"
KIND_MESSAGE_NOT_FOUND = "message_not_found"
KIND_UNSUPPORTED = "unsupported"
KIND_MALFORMED = "malformed"
KIND_OVERSIZED = "oversized"
KIND_POLICY = "policy"
KIND_CHECKPOINT_RESET = "checkpoint_reset"

ACTION_RETRY = "retry"
ACTION_DISCARD = "discard"
ACTION_FAIL = "fail"


class MailError(Exception):
    """Provider-neutral failure; ``message`` must be log-safe, the
    wrapped ``cause`` is internal-only (errors.go:57-80)."""

    def __init__(self, kind: str, operation: str = "", message: str = "",
                 retry_after: float = 0.0, cause: Exception | None = None):
        self.kind = kind
        self.operation = operation
        self.message = message
        self.retry_after = retry_after
        self.cause = cause
        text = f"mail: {operation}: {message}" if operation else \
            f"mail: {message}"
        super().__init__(text)


class CanceledError(Exception):
    """Stands in for Go's context.Canceled."""


@dataclass
class RetryPolicy:
    max_attempts: int = 0
    initial_backoff: float = 0.0
    max_backoff: float = 0.0

    def normalized(self) -> "RetryPolicy":
        p = RetryPolicy(self.max_attempts, self.initial_backoff,
                        self.max_backoff)
        if p.max_attempts <= 0:
            p.max_attempts = 3
        if p.initial_backoff <= 0:
            p.initial_backoff = 1.0
        if p.max_backoff <= 0:
            p.max_backoff = 30.0
        if p.initial_backoff > p.max_backoff:
            p.initial_backoff = p.max_backoff
        return p

    def backoff(self, failed_attempt: int) -> float:
        p = self.normalized()
        if failed_attempt <= 1:
            return p.initial_backoff
        delay = p.initial_backoff
        for _ in range(1, failed_attempt):
            if delay >= p.max_backoff or delay > p.max_backoff / 2:
                return p.max_backoff
            delay *= 2
        return min(delay, p.max_backoff)


def _classify(err: Exception):
    """→ (reason, retryable, discard, retry_after)."""
    if isinstance(err, MailError):
        kind = err.kind
        if kind in (KIND_TRANSIENT, KIND_NETWORK):
            return "transient", True, False, err.retry_after
        if kind == KIND_TIMEOUT:
            return "timeout", True, False, err.retry_after
        if kind == KIND_RATE_LIMIT:
            return "rate_limit", True, False, err.retry_after
        if kind == KIND_PARTIAL:
            return "parser_partial", True, False, err.retry_after
        if kind in (KIND_OVERSIZED, KIND_POLICY):
            return "oversized", False, True, 0.0
        if kind == KIND_MALFORMED:
            return "malformed", False, True, 0.0
        if kind == KIND_AUTHENTICATION:
            return "authentication", False, False, 0.0
        return "permanent", False, False, 0.0
    if isinstance(err, (TimeoutError,)) or \
            getattr(err, "timeout", None) is True:
        return "timeout", True, False, 0.0
    import socket

    if isinstance(err, socket.timeout):
        return "timeout", True, False, 0.0
    return "permanent", False, False, 0.0


def decide_retry(err: Exception | None, failed_attempt: int,
                 policy: RetryPolicy | None = None) -> dict:
    """DecideRetry (:203-231): ``failed_attempt`` is one-based and
    counts the call that produced ``err``."""
    if err is None:
        return {"action": ACTION_FAIL, "reason": "permanent", "delay": 0.0}
    if isinstance(err, CanceledError):
        return {"action": ACTION_FAIL, "reason": "canceled", "delay": 0.0}
    policy = (policy or RetryPolicy()).normalized()
    reason, retryable, discard, retry_after = _classify(err)
    if discard:
        return {"action": ACTION_DISCARD, "reason": reason, "delay": 0.0}
    if not retryable:
        return {"action": ACTION_FAIL, "reason": reason, "delay": 0.0}
    if failed_attempt >= policy.max_attempts:
        return {"action": ACTION_FAIL, "reason": "exhausted", "delay": 0.0}
    delay = policy.backoff(failed_attempt)
    if retry_after > delay:
        delay = retry_after
    delay = min(delay, policy.max_backoff)
    return {"action": ACTION_RETRY, "reason": reason, "delay": delay}


def retryable(err: Exception | None) -> bool:
    if err is None or isinstance(err, CanceledError):
        return False
    _reason, is_retryable, _discard, _after = _classify(err)
    return is_retryable
