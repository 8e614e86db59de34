"""Table storage seam: Lance when available, Parquet otherwise.

BASELINE.json's north star materializes the frontier / page tables as
**Lance** tables (versioned, random-access, compaction built in); the
reference itself persists to Postgres (``pkg/database/postgresql-setup.pgsql``).
This container ships pyarrow but not the ``lance`` / ``lancedb`` package, so
the writers negotiate:

- ``format="auto"`` (default): Lance if ``import lance`` succeeds, else
  Parquet. Both layouts are partition-per-directory and resumable; readers
  sniff the on-disk format.
- ``format="lance"`` raises a clear error when the library is missing
  instead of silently degrading — a cluster image that includes ``pylance``
  gets Lance end-to-end with no code change.

Everything that matters at 10^10 scale (streamed ``Dataset`` writes, one
directory per wave/table, no driver materialization) is identical across
the two formats; Lance additionally gives version cleanup where the parquet
path uses :mod:`thecrowler_ray.pipelines.maintenance` compaction.
"""

from __future__ import annotations

import os

import ray.data


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def resolve_format(fmt: str = "auto") -> str:
    """'auto' | 'lance' | 'parquet' → concrete format for this environment."""
    if fmt == "auto":
        return "lance" if lance_available() else "parquet"
    if fmt == "lance" and not lance_available():
        raise ImportError(
            "storage format 'lance' requested but the 'lance' package is not "
            "installed in this environment; install pylance or use "
            "format='auto' (falls back to parquet)"
        )
    if fmt not in ("lance", "parquet"):
        raise ValueError(f"unknown storage format: {fmt!r}")
    return fmt


def write_table(ds: "ray.data.Dataset", path: str, fmt: str = "auto") -> str:
    """Stream a Dataset to ``path`` in the resolved format. → format used."""
    concrete = resolve_format(fmt)
    if concrete == "lance":
        ds.write_lance(path)
    else:
        ds.write_parquet(path)
    return concrete


def read_table(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Read a table directory written by :func:`write_table`, sniffing the
    format (Lance datasets carry a ``_versions`` / ``.lance`` layout)."""
    is_lance = os.path.isdir(os.path.join(path, "_versions")) or (
        isinstance(path, str) and path.endswith(".lance")
    )
    if is_lance:
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)
