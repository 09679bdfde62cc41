"""Diff Spark queries() vs DuckDB oracle_sql() cell-by-cell at sf0.01.

Mimics the driver's compare: sort columns by name, sort rows, compare
values.  Prints dtype info and the first differing cells per query so
hash mismatches can be root-caused.

Usage: python scripts/compare_oracle.py [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def main() -> None:
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("compare-oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[1:])

    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sdf = canon(fn(spark, SF_DIR).toPandas())
            odf = canon(con.execute(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            continue
        issues = []
        if list(sdf.columns) != list(odf.columns):
            issues.append(f"cols spark={list(sdf.columns)} oracle={list(odf.columns)}")
        elif len(sdf) != len(odf):
            issues.append(f"rows spark={len(sdf)} oracle={len(odf)}")
        else:
            for c in sdf.columns:
                s, o = sdf[c], odf[c]
                if str(s.dtype) != str(o.dtype):
                    issues.append(f"col {c!r}: dtype spark={s.dtype} oracle={o.dtype}")
                neq = 0
                example = None
                for i in range(len(s)):
                    sv, ov = s.iloc[i], o.iloc[i]
                    if pd.isna(sv) and pd.isna(ov):
                        continue
                    if sv != ov or type(sv) is not type(ov):
                        neq += 1
                        if example is None:
                            example = (i, repr(sv), type(sv).__name__, repr(ov), type(ov).__name__)
                if neq:
                    i, sv, st, ov, ot = example
                    issues.append(
                        f"col {c!r}: {neq} diffs; row {i}: spark={sv} ({st}) vs oracle={ov} ({ot})"
                    )
        status = "OK" if not issues else "DIFF"
        print(f"{name}: {status}")
        for msg in issues:
            print(f"    {msg}")

    spark.stop()


if __name__ == "__main__":
    main()
