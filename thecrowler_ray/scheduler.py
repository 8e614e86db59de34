"""Source scheduling / claiming (reference ``update_sources``,
``pkg/database/postgresql-setup.pgsql:2826-2901``; cadence defaults
``config.default:84-90``: claim batches of ``max_sources`` every
``query_timer`` seconds, re-crawl ``crawling_if_ok: 3 days`` /
``crawling_if_error: 15 minutes`` / ``processing_timeout: 1 day``).

The reference's engine claims work by running that SQL function: a source
is DUE when it is enabled, passes the optional priority filter, and any of

  - ``last_ok_update`` window:   never updated, or older than the window
  - ``regular_crawling`` window: status=completed and older than the window
  - error retry:                 status=error and older than ``last_error``
  - fresh:                       status in (pending, new) or NULL
  - stale claim:                 status=processing and older than
                                 ``processing_timeout`` (lease expiry)

Due sources order by (created_at, source_id), take ``limit``, and flip to
status=processing owned by the claiming engine.

Here eligibility is a vectorized pandas kernel (usable inside
``map_batches`` for a huge source table), and the claim itself —
inherently a global order-by + limit + atomic flip — runs on the
controller over the due subset, which is bounded by the batch limit.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .exprterpreter import parse_duration


@dataclass(frozen=True)
class ClaimPolicy:
    """Mirror of update_sources' arguments (pgsql defaults applied)."""

    limit: int = 10
    priority: str = ""  # csv filter; empty = all priorities
    last_ok_update: str = ""  # e.g. "3 days"; empty disables the clause
    regular_crawling: str = ""  # empty disables
    last_error: str = "15 minutes"
    processing_timeout: str = "1 day"
    engine_id: str = "engine-0"


def _win(now_s: float, spec: str) -> float:
    return now_s - parse_duration(spec, default=0.0)


def due_mask(df: pd.DataFrame, now_s: float, policy: ClaimPolicy) -> np.ndarray:
    """Vectorized eligibility (the WHERE clause of update_sources).

    Expects columns: ``status`` (str/None), ``priority`` (str),
    ``disabled`` (bool), ``last_updated_at`` (epoch seconds, NaN = never).
    """
    status = df["status"].fillna("").str.strip().str.lower()
    upd = df["last_updated_at"].to_numpy(dtype=np.float64)
    never = np.isnan(upd)

    ok = np.zeros(len(df), dtype=bool)
    if policy.last_ok_update.strip():
        ok |= never | (upd < _win(now_s, policy.last_ok_update))
    if policy.regular_crawling.strip():
        ok |= (status == "completed").to_numpy() & (
            upd < _win(now_s, policy.regular_crawling)
        )
    ok |= (status == "error").to_numpy() & (
        upd < _win(now_s, policy.last_error or "15 minutes")
    )
    ok |= status.isin(["pending", "new", ""]).to_numpy()
    ok |= (status == "processing").to_numpy() & (
        upd < _win(now_s, policy.processing_timeout or "1 day")
    )

    if policy.priority.strip():
        wanted = {p.strip().lower() for p in policy.priority.split(",")}
        ok &= df["priority"].fillna("").str.strip().str.lower().isin(wanted).to_numpy()
    ok &= ~df["disabled"].fillna(False).to_numpy(dtype=bool)
    return ok


def claim_sources(
    sources: pd.DataFrame, now_s: float, policy: ClaimPolicy
) -> pd.DataFrame:
    """Due → (created_at, source_id) order → LIMIT → claimed rows with
    status='processing' and engine set (the RETURNING shape)."""
    due = sources[due_mask(sources, now_s, policy)]
    claimed = due.sort_values(
        ["created_at", "source_id"], kind="mergesort"
    ).head(policy.limit)
    claimed = claimed.copy()
    claimed["status"] = "processing"
    claimed["engine"] = policy.engine_id
    return claimed.reset_index(drop=True)


def due_mask_arrow(t, now_s: float, policy: ClaimPolicy):
    """Arrow twin of :func:`due_mask` (zero-copy batch path — no per-batch
    pandas round-trip). Bit-parity asserted in tests."""
    import pyarrow as pa
    import pyarrow.compute as pc

    status = pc.utf8_lower(
        pc.utf8_trim_whitespace(pc.fill_null(t["status"], "")))
    upd = pc.cast(t["last_updated_at"], pa.float64())
    never = pc.is_nan(pc.fill_null(upd, float("nan")))
    upd0 = pc.fill_null(upd, float("inf"))  # never-rows handled via `never`

    ok = pa.array(np.zeros(len(t), dtype=bool))
    if policy.last_ok_update.strip():
        ok = pc.or_(ok, pc.or_(
            never, pc.less(upd0, _win(now_s, policy.last_ok_update))))
    if policy.regular_crawling.strip():
        ok = pc.or_(ok, pc.and_(
            pc.equal(status, "completed"),
            pc.less(upd0, _win(now_s, policy.regular_crawling))))
    ok = pc.or_(ok, pc.and_(
        pc.equal(status, "error"),
        pc.less(upd0, _win(now_s, policy.last_error or "15 minutes"))))
    ok = pc.or_(ok, pc.is_in(
        status, value_set=pa.array(["pending", "new", ""])))
    ok = pc.or_(ok, pc.and_(
        pc.equal(status, "processing"),
        pc.less(upd0, _win(now_s, policy.processing_timeout or "1 day"))))

    if policy.priority.strip():
        wanted = sorted({p.strip().lower() for p in policy.priority.split(",")})
        prio = pc.utf8_lower(
            pc.utf8_trim_whitespace(pc.fill_null(t["priority"], "")))
        ok = pc.and_(ok, pc.is_in(prio, value_set=pa.array(wanted)))
    disabled = pc.fill_null(pc.cast(t["disabled"], pa.bool_()), False)
    return pc.and_(ok, pc.invert(disabled))


def claim_sources_ds(ds, now_s: float, policy: ClaimPolicy) -> pd.DataFrame:
    """Distributed form: eligibility filters inside ``map_batches`` (the
    source table can be arbitrarily large; only due rows move), then the
    bounded global order/limit on the controller. Both stages run on
    zero-copy Arrow batches."""

    def filt(t):
        return t.filter(due_mask_arrow(t, now_s, policy))

    due = ds.map_batches(filt, batch_format="pyarrow")

    # per-batch partial top-limit bounds what reaches the driver
    def partial_top(t):
        return t.sort_by(
            [("created_at", "ascending"), ("source_id", "ascending")]
        ).slice(0, policy.limit)

    slim = due.map_batches(partial_top, batch_format="pyarrow").to_pandas()
    return claim_sources(slim, now_s, policy) if len(slim) else slim
