"""Differential oracle harness — mirrors the driver's correctness
gate: run a suite query in Spark and its oracle in DuckDB over the
same parquet dir, then compare row count, column-name set, and
order-insensitive values (columns sorted by name).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from mfdb_hafro_etl_spark.catalog import TESTDATA_TABLES

_FLOAT_FMT = "%.10g"


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return _FLOAT_FMT % v
        return _FLOAT_FMT % v
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    out.sort()
    return out


def compare(spark_df, duck_df: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(duck_df.columns):
        problems.append(f"columns differ: spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(sp) != len(duck_df):
        problems.append(f"row count differs: spark={len(sp)} duck={len(duck_df)}")
    a, b = canon_rows(sp), canon_rows(duck_df)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:5]
        diff_b = [r for r in b if r not in set(a)][:5]
        problems.append(
            f"values differ ({len(a)} vs {len(b)} rows); "
            f"spark-only sample={diff_a}; duck-only sample={diff_b}; cols={sorted(sp.columns)}"
        )
    return problems
