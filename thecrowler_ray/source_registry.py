"""Source-registry console operations (reference ``cmd/addSource``,
``cmd/removeSource``, ``cmd/updateSourceStatus``, ``cmd/exportSources``,
``cmd/addCategory`` — the Sources-table CRUD a reference operator uses
daily).

The reference keeps Sources in Postgres; here the registry is a
parquet-backed small-side table (sources are thousands-to-millions of
rows — registry ops are metadata writes, never the 100 TB data plane).
The schema matches what ``scheduler.claim_sources`` consumes, so a
registry written here feeds source-claim scheduling directly.

Semantics mirrored per function:

- ``prepare_url`` — cmd/addSource/main.go:285-320: trim, strip trailing
  '/', de-obfuscate squatted separators ([.] (.) {.} [:] … [?]), restore
  defanged schemes (hxxp/hxxps/fxp/fxps).
- ``normalize_source_url`` — pkg/database/source.go:106-129: decode only
  %2F and %3A inside the query string (searchability), leave other
  escapes alone.
- ``calculate_source_uid`` — pkg/database/source.go:92-97:
  sha256 over "len(name):name" + "len(url):url" (length-prefixed).
- ``add_source`` / ``add_bulk_csv`` — cmd/addSource: status 'pending',
  CSV columns URL, CategoryID, UsrID, Restricted(default 1),
  Flags(default 0), ConfigFileName.
- ``remove_source`` — cmd/removeSource/main.go:46-73: delete by exact
  URL + orphan cleanup, returning the ConsoleResponse message.
- ``update_status`` — cmd/updateSourceStatus: by url / id / bulk CSV /
  all / time-window over last_updated_at; 'yesterday' = the
  Europe/London civil day [00:00 yesterday, 00:00 today);
  'within' = [now-d, now]; after/before = RFC3339 [start, end).
- ``export_sources`` — cmd/exportSources: nested
  {exported_at, sources:[{source_id, source_url, pages:[{index_id,
  page_url, objects:[…]}]}]} joining Sources → SearchIndex →
  WebObjects(Index), LEFT-join so pages without objects still export.
- ``add_categories`` — cmd/addCategory: nested category/subcategory
  insert with parent ids.
"""

from __future__ import annotations

import csv
import datetime as _dt
import hashlib
import io
import json
import os
import re
import urllib.parse as _up
from zoneinfo import ZoneInfo

import pandas as pd

_SQUAT = {
    "[.]": ".", "(.)": ".", "{.}": ".",
    "[:]": ":", "(:)": ":", "{:}": ":",
    "[/]": "/", "(/)": "/", "{/}": "/",
    "[?]": "?", "(?)": "?", "{?}": "?",
}
_DEFANG = [("hxxps://", "https://"), ("hxxp://", "http://"),
           ("fxps://", "ftps://"), ("fxp://", "ftp://")]


def prepare_url(url: str) -> str:
    url = url.strip().rstrip("/")
    for k, v in _SQUAT.items():
        url = url.replace(k, v)
    for pre, repl in _DEFANG:
        if url.startswith(pre):
            url = repl + url[len(pre):]
            break
    return url


def normalize_source_url(raw: str) -> str:
    trimmed = raw.strip()
    if not trimmed:
        return ""
    try:
        parsed = _up.urlsplit(trimmed)
    except ValueError:
        return trimmed
    if not parsed.query:
        return trimmed
    query = re.sub("%2F", "/", parsed.query, flags=re.IGNORECASE)
    query = re.sub("%3A", ":", query, flags=re.IGNORECASE)
    return _up.urlunsplit(parsed._replace(query=query))


def calculate_source_uid(name: str, source_url: str) -> str:
    n = name.strip()
    u = normalize_source_url(source_url)
    # length prefixes are UTF-8 *byte* counts (Go len(), source.go:95),
    # not code points — they diverge for any non-ASCII name/URL
    payload = f"{len(n.encode('utf-8'))}:{n}{len(u.encode('utf-8'))}:{u}"
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


_COLUMNS = ["source_id", "source_uid", "url", "name", "priority",
            "category_id", "usr_id", "restricted", "flags", "config",
            "disabled", "status", "last_crawled_at", "last_updated_at",
            "created_at"]


class ConsoleResponse(dict):
    @property
    def message(self) -> str:
        return self.get("message", "")


class SourceRegistry:
    """Parquet-backed Sources table. Loads fully (small side), mutates in
    pandas, rewrites atomically (tmp + rename) — the registry is config
    state, not pipeline data."""

    def __init__(self, path: str):
        self.path = path
        if os.path.exists(path):
            self.df = pd.read_parquet(path)
        else:
            self.df = pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in zip(_COLUMNS, [
                    "int64", "object", "object", "object", "object",
                    "int64", "int64", "int64", "int64", "object",
                    "bool", "object", "float64", "float64", "float64"])})
        self.categories = pd.DataFrame(
            columns=["category_id", "name", "description", "parent_id"])
        cat_path = self._cat_path()
        if os.path.exists(cat_path):
            self.categories = pd.read_parquet(cat_path)

    def _cat_path(self) -> str:
        base, ext = os.path.splitext(self.path)
        return f"{base}.categories{ext or '.parquet'}"

    def save(self) -> None:
        for p, df in ((self.path, self.df),
                      (self._cat_path(), self.categories)):
            tmp = p + ".tmp"
            os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
            df.to_parquet(tmp, index=False)
            os.replace(tmp, p)

    # -- addSource ---------------------------------------------------------
    def add_source(self, url: str, name: str = "", priority: str = "",
                   category_id: int = 0, usr_id: int = 0,
                   restricted: int = 1, flags: int = 0,
                   config: dict | str | None = None,
                   status: str = "pending",
                   now_s: float | None = None) -> int:
        url = prepare_url(url)
        cfg = (config if isinstance(config, str)
               else json.dumps(config) if config is not None else None)
        sid = int(self.df["source_id"].max()) + 1 if len(self.df) else 1
        now_s = float(now_s if now_s is not None else 0.0)
        row = {
            "source_id": sid,
            "source_uid": calculate_source_uid(name, url),
            "url": url, "name": name, "priority": priority,
            "category_id": int(category_id), "usr_id": int(usr_id),
            "restricted": int(restricted), "flags": int(flags),
            "config": cfg, "disabled": False, "status": status,
            "last_crawled_at": float("nan"), "last_updated_at": now_s,
            "created_at": now_s,
        }
        self.df = pd.concat([self.df, pd.DataFrame([row])],
                            ignore_index=True)
        return sid

    def add_bulk_csv(self, csv_text_or_path: str,
                     config_loader=None, force: bool = False,
                     now_s: float | None = None) -> list[int]:
        """CSV columns: URL, CategoryID, UsrID, Restricted, Flags,
        ConfigFileName (trailing columns optional, reference
        cmd/addSource/main.go:186-280). ``config_loader(name)`` resolves
        the config-file column; with ``force`` a failed load inserts the
        row without config instead of aborting."""
        if os.path.exists(csv_text_or_path):
            text = open(csv_text_or_path).read()
        else:
            text = csv_text_or_path
        ids = []
        for rec in csv.reader(io.StringIO(text)):
            if not rec or not rec[0].strip():
                continue
            cfg = None
            if len(rec) > 5 and rec[5].strip():
                try:
                    cfg = (config_loader or (lambda n: open(n).read()))(
                        rec[5].strip())
                except Exception:
                    if not force:
                        raise
            ids.append(self.add_source(
                prepare_url(rec[0]),
                category_id=int(rec[1]) if len(rec) > 1 and rec[1].strip()
                else 0,
                usr_id=int(rec[2]) if len(rec) > 2 and rec[2].strip() else 0,
                restricted=int(rec[3]) if len(rec) > 3 and rec[3].strip()
                else 1,
                flags=int(rec[4]) if len(rec) > 4 and rec[4].strip() else 0,
                config=cfg, now_s=now_s))
        return ids

    # -- removeSource ------------------------------------------------------
    def remove_source(self, url: str) -> ConsoleResponse:
        mask = self.df["url"] == url
        if not mask.any():
            return ConsoleResponse(message="Failed to remove the source")
        self.df = self.df[~mask].reset_index(drop=True)
        return ConsoleResponse(
            message="Source and related data removed successfully")

    # -- updateSourceStatus ------------------------------------------------
    def update_status(self, status: str, url: str = "",
                      source_id: int = 0, bulk_csv: str = "",
                      all_sources: bool = False,
                      yesterday: bool = False, within: str = "",
                      after: str = "", before: str = "",
                      now_s: float | None = None) -> int:
        if not status.strip():
            raise ValueError("you must provide -status")
        if yesterday or within or after or before:
            start, end = _time_window(yesterday, within, after, before,
                                      now_s)
            upd = self.df["last_updated_at"]
            mask = upd >= start
            if end is not None:
                mask &= upd < end
        elif all_sources:
            mask = pd.Series(True, index=self.df.index)
        elif url:
            mask = self.df["url"] == url.strip().rstrip("/")
        elif source_id:
            mask = self.df["source_id"] == int(source_id)
        elif bulk_csv:
            text = (open(bulk_csv).read() if os.path.exists(bulk_csv)
                    else bulk_csv)
            urls = {r[0].strip().rstrip("/")
                    for r in csv.reader(io.StringIO(text))
                    if r and r[0].strip()}
            mask = self.df["url"].isin(urls)
        else:
            raise ValueError(
                "specify url, id, bulk, all, or a time window")
        n = int(mask.sum())
        self.df.loc[mask, "status"] = status
        return n

    # -- addCategory -------------------------------------------------------
    def add_categories(self, schema: dict) -> list[int]:
        """Insert {categories:[{name, description, subcategories:[…]}]}
        with parent ids (reference cmd/addCategory insertCategory)."""
        ids = []

        def nxt() -> int:
            return (int(self.categories["category_id"].max()) + 1
                    if len(self.categories) else 1)

        def insert(cat: dict, parent_id):
            if not str(cat.get("name", "")).strip():
                raise ValueError("category name is required")
            cid = nxt()
            self.categories = pd.concat([self.categories, pd.DataFrame([{
                "category_id": cid, "name": cat["name"],
                "description": cat.get("description", ""),
                "parent_id": parent_id,
            }])], ignore_index=True)
            ids.append(cid)
            for sub in cat.get("subcategories", []) or []:
                insert(sub, cid)

        for cat in schema.get("categories", []):
            insert(cat, None)
        return ids


def _time_window(yesterday: bool, within: str, after: str, before: str,
                 now_s: float | None):
    """→ (start_epoch_s, end_epoch_s | None), reference computeTimeWindow
    (cmd/updateSourceStatus/main.go:130-186)."""
    loc = ZoneInfo("Europe/London")
    now = _dt.datetime.fromtimestamp(
        float(now_s if now_s is not None else 0.0), tz=loc)
    if yesterday:
        today0 = now.replace(hour=0, minute=0, second=0, microsecond=0)
        return ((today0 - _dt.timedelta(days=1)).timestamp(),
                today0.timestamp())
    if within:
        d = _parse_go_duration(within)
        if d <= 0:
            raise ValueError("updated-within duration must be > 0")
        return now.timestamp() - d, now.timestamp()
    if not after:
        raise ValueError("you must provide -updated-after")
    start = _dt.datetime.fromisoformat(after.replace("Z", "+00:00"))
    if not before:
        return start.timestamp(), None
    end = _dt.datetime.fromisoformat(before.replace("Z", "+00:00"))
    if end <= start:
        raise ValueError("updated-before must be after updated-after")
    return start.timestamp(), end.timestamp()


_GO_DUR = re.compile(r"(\d+(?:\.\d+)?)(h|m|s|ms)")


def _parse_go_duration(s: str) -> float:
    """Go time.ParseDuration subset (h/m/s/ms, e.g. '48h', '30m')."""
    mult = {"h": 3600.0, "m": 60.0, "s": 1.0, "ms": 0.001}
    pos, total = 0, 0.0
    for m in _GO_DUR.finditer(s.strip()):
        if m.start() != pos:
            raise ValueError(f"bad duration {s!r}")
        total += float(m.group(1)) * mult[m.group(2)]
        pos = m.end()
    if pos != len(s.strip()) or pos == 0:
        raise ValueError(f"bad duration {s!r}")
    return total


# ---------------------------------------------------------------------------
# exportSources
# ---------------------------------------------------------------------------

def export_sources(registry: SourceRegistry, index_dir: str,
                   exported_at: str = "1970-01-01T00:00:00Z") -> dict:
    """Nested export (reference cmd/exportSources exportQuery: Sources ⋈
    SearchIndex LEFT⋈ WebObjects, ordered by source/page/object ids).
    Pages attach to the source whose URL is a prefix of the page's seed
    (``src_url``); sources without pages export with ``pages: []``. The
    export is a full dump by design (mirrors the reference); at scale the
    caller exports per-source partitions instead."""
    out = {"exported_at": exported_at, "sources": []}
    si_path = os.path.join(index_dir, "search_index")
    pages = (pd.read_parquet(si_path) if os.path.exists(si_path)
             else pd.DataFrame(columns=["doc_id", "url"]))
    woi_path = os.path.join(index_dir, "web_objects_index")
    wo_path = os.path.join(index_dir, "web_objects")
    if os.path.exists(woi_path) and os.path.exists(wo_path):
        objects = pd.read_parquet(woi_path).merge(
            pd.read_parquet(wo_path), on="object_hash", how="left")
    else:
        objects = pd.DataFrame(columns=["doc_id", "object_hash",
                                        "object_id"])
    by_doc = dict(tuple(objects.groupby("doc_id"))) if len(objects) else {}
    reg = registry.df.sort_values("source_id")
    for _, src in reg.iterrows():
        entry = {"source_id": int(src["source_id"]),
                 "source_url": src["url"], "pages": []}
        prefix = str(src["url"])
        mine = pages[pages["url"].str.startswith(prefix)] if len(pages) \
            else pages
        for _, pg in mine.sort_values("doc_id").iterrows():
            objs = []
            for _, ob in by_doc.get(pg["doc_id"],
                                    pd.DataFrame()).iterrows():
                objs.append({"object_id": ob.get("object_id"),
                             "object_hash": ob.get("object_hash")})
            entry["pages"].append({"index_id": pg["doc_id"],
                                   "page_url": pg["url"],
                                   "objects": objs})
        out["sources"].append(entry)
    return out
