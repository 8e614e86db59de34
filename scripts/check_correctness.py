"""Mimic the driver's correctness gate: run each queries() entry and its
oracle_sql() twin over the same sf dir, compare row count / schema / values
(order-insensitive: sort columns by name, then rows by all columns).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd
import ray


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res.reset_index(drop=True)
    if isinstance(res, pa.Table):
        return res.to_pandas()
    df = res.to_pandas()  # ray Dataset
    if len(df) == 0 and len(df.columns) == 0:
        # Ray quirk: to_pandas() on an empty Dataset drops all columns —
        # rebuild the typed empty frame from the Dataset schema
        schema = res.schema()
        empty = pa.table({n: pa.array([], t)
                          for n, t in zip(schema.names, schema.types)})
        return empty.to_pandas()
    return df


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            raw = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(raw)} rows, cols={list(raw.columns)}")
            if len(raw) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        got = canon(raw)
        try:
            want_raw = con.execute(oracles[name]).fetchdf()
            want = canon(want_raw)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {e}")
            failures += 1
            continue
        ok = True
        # dtype-strict pass: the driver's canonical hash is dtype-sensitive
        # (r4's q_ts_emitted was value-equal but float64-vs-int64 red), so a
        # raw-dtype mismatch between the Ray output and the DuckDB oracle is
        # a FAILURE here even when values compare equal below.
        if set(raw.columns) == set(want_raw.columns):
            for c in sorted(raw.columns):
                da, db = raw[c].dtype, want_raw[c].dtype
                if str(da) != str(db):
                    print(f"FAIL {name}: dtype skew col {c}: ray={da} "
                          f"oracle={db}")
                    ok = False
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            ok = False
        else:
            for c in got.columns:
                a, b = got[c].to_numpy(), want[c].to_numpy()
                if pd.api.types.is_float_dtype(got[c]):
                    eq = np.allclose(a.astype(float), b.astype(float),
                                     rtol=0, atol=0, equal_nan=True)
                    exact = (pd.Series(a) == pd.Series(b)).all()
                    if not exact:
                        print(f"FAIL {name}: float col {c} not bit-equal "
                              f"(allclose={eq}); first diff: "
                              f"{_first_diff(a, b)}")
                        ok = False
                else:
                    if not (pd.Series(a) == pd.Series(b)).all():
                        print(f"FAIL {name}: col {c} differs; first diff: "
                              f"{_first_diff(a, b)}")
                        ok = False
        if ok:
            print(f"PASS {name}: {len(got)} rows")
        else:
            failures += 1
    ray.shutdown()
    return 1 if failures else 0


def _first_diff(a, b):
    for i, (x, y) in enumerate(zip(a, b)):
        if not (x == y or (pd.isna(x) and pd.isna(y))):
            return f"row {i}: {x!r} != {y!r}"
    return "?"


if __name__ == "__main__":
    sys.exit(main())
