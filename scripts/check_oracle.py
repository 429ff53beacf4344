"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and the matching ``oracle_sql()`` on DuckDB
at sf0.01, compare row count + sorted-column schema + order-insensitive
values. Usage: python scripts/check_oracle.py [sf_dir] [only_query...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            # NO rounding here: queries are responsible for emitting
            # bit-identical doubles on both engines (they round in-query);
            # this surfaces any sub-decimal drift the driver could catch
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        # driver-hash emulation: the driver hashes raw values, so an
        # int64 Spark column vs a float64 DuckDB fetch (e.g. HUGEINT
        # from an uncast integer SUM) is a hash mismatch even when the
        # numbers are equal. Compare dtype *kinds* pre-normalization.
        kinds_g = {c: got[c].dtype.kind for c in got.columns}
        kinds_e = {c: exp[c].dtype.kind for c in exp.columns}
        kind_drift = {
            c: (kinds_g.get(c), kinds_e.get(c))
            for c in set(kinds_g) & set(kinds_e)
            if {"i", "u"} & {kinds_g[c]} and kinds_e[c] == "f"
            or kinds_g[c] == "f" and {"i", "u"} & {kinds_e[c]}
        }
        g, e = normalize(got), normalize(exp)
        status = None
        if kind_drift:
            status = f"dtype-kind drift (driver hash would differ): {kind_drift}"
        elif list(g.columns) != list(e.columns):
            status = f"schema mismatch: spark={list(g.columns)} duck={list(e.columns)}"
        elif len(g) != len(e):
            status = f"rowcount mismatch: spark={len(g)} duck={len(e)}"
        else:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            except AssertionError as exc:
                status = f"value mismatch: {str(exc)[:400]}"
        if status:
            print(f"[FAIL] {name}: {status}")
            failures.append(name)
        else:
            print(f"[MATCH] {name}: {len(g)} rows ({time.time()-t0:.1f}s)")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nALL MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
