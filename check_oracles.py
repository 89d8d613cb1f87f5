"""Local replica of the driver's correctness gate: run each `queries()` entry
on Spark and its `oracle_sql()` twin on DuckDB at sf0.01, compare row count,
schema (column names sorted) and a value hash over rows sorted by all columns.

Usage: python check_oracles.py [query ...]   (default: all with an oracle)
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), ignore_index=True)
    return df


def _value_hash(df: pd.DataFrame) -> str:
    df = _norm(df)
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_float_dtype(s):
            s = s.round(6)
        h.update(s.astype(str).str.cat(sep="\x1f").encode())
    return h.hexdigest()


def main(names: list[str]) -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("check_oracles")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = names or [n for n in qs if n in oracles]
    bad = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        sdf = qs[name](spark, SF_DIR).toPandas()
        odf = con.execute(oracles[name]).df()
        rows = len(sdf) == len(odf)
        schema = sorted(sdf.columns) == sorted(odf.columns)
        hmatch = rows and schema and _value_hash(sdf) == _value_hash(odf)
        status = "OK" if (rows and schema and hmatch) else "FAIL"
        if status == "FAIL":
            bad += 1
        print(
            f"{name}: {status} rows={rows}({len(sdf)}/{len(odf)}) "
            f"schema={schema} hash={hmatch}"
        )
        if not schema:
            print(f"  spark cols: {sorted(sdf.columns)}\n  oracle cols: {sorted(odf.columns)}")
        if rows and schema and not hmatch:
            a, b = _norm(sdf), _norm(odf)
            for col in a.columns:
                ca, cb = a[col], b[col]
                if pd.api.types.is_float_dtype(ca) or pd.api.types.is_float_dtype(cb):
                    ca, cb = ca.astype(float).round(6), cb.astype(float).round(6)
                neq = ca.astype(str) != cb.astype(str)
                if neq.any():
                    i = neq.idxmax()
                    print(f"  first diff col={col} row={i}: spark={ca[i]!r} oracle={cb[i]!r} "
                          f"(dtypes {a[col].dtype}/{b[col].dtype})")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
