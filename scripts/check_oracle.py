"""Local replica of the driver's correctness gate: run each queries()
entry through Spark and its oracle_sql() twin through DuckDB on the same
parquet, compare row count + schema-insensitive sorted values.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from mapnik_vector_tile_spark.queries import TABLES  # noqa: E402
from mapnik_vector_tile_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            s = s.astype(str)
        elif str(s.dtype).startswith("float"):
            s = s.round(6)
        out[c] = s
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", cores=4, shuffle_partitions=4)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
                print(f"{name:28s} rows-only: {n} rows")
            except Exception as exc:
                failures.append(name)
                print(f"{name:28s} ERROR (rows-only): {exc}")
            continue
        try:
            got_raw = fn(spark, sf_dir).toPandas()
            exp_raw = con.execute(oracles[name]).df()
            got, exp = normalize(got_raw), normalize(exp_raw)
        except Exception as exc:
            failures.append(name)
            print(f"{name:28s} ERROR: {type(exc).__name__}: {str(exc)[:300]}")
            continue
        # the driver's value hash is dtype-sensitive where this checker
        # normalizes (r1: DuckDB HUGEINT vs Spark BIGINT) — so fail on
        # dtype-KIND mismatches (int vs float vs object) up front
        kinds_g = {c: got_raw[c].dtype.kind for c in got_raw.columns}
        kinds_e = {c: exp_raw[c].dtype.kind for c in exp_raw.columns}
        kind_diff = {
            c: (kinds_g.get(c), kinds_e.get(c))
            for c in set(kinds_g) | set(kinds_e)
            if kinds_g.get(c) != kinds_e.get(c)
            and {kinds_g.get(c), kinds_e.get(c)} != {"i", "u"}
        }
        if kind_diff:
            failures.append(name)
            print(f"{name:28s} DTYPE-KIND MISMATCH: {kind_diff}")
            continue
        if list(got.columns) != list(exp.columns):
            failures.append(name)
            print(f"{name:28s} SCHEMA MISMATCH: {list(got.columns)} vs {list(exp.columns)}")
            continue
        if len(got) != len(exp):
            failures.append(name)
            print(f"{name:28s} ROWCOUNT MISMATCH: {len(got)} vs {len(exp)}")
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, rtol=0, atol=1e-9)
            print(f"{name:28s} OK ({len(got)} rows)")
        except AssertionError as exc:
            failures.append(name)
            print(f"{name:28s} VALUE MISMATCH: {str(exc)[:300]}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
