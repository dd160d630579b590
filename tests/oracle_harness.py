"""Local twin of the driver's DuckDB-oracle check (SURVEY.md §5.2).

For each registered op with an oracle: run the Spark query and the DuckDB
SQL on the same sf dir, then compare row count, column-name set, and
order-insensitive values (columns sorted by name, rows sorted by every
column, floats compared exactly — both sides round computed floats, so
surviving differences are real bugs).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from esxsnmp_tsdb_spark.sources.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Stable order-insensitive comparison: sort by the string form of every
    # column (handles None/NaN/bool uniformly).
    if len(df):
        key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
        df = df.loc[key.sort_values(kind="mergesort").index]
    return df.reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or math.isclose(a, b, rel_tol=0, abs_tol=1e-9)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, key: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"{key}: row count {len(spark_pdf)} vs {len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"{key}: columns {sc} vs {dc}")
        return problems
    # Driver compares schemas too: require matching pandas dtypes per column
    # (empirically identical across all ops when Spark types are cast right
    # — int32-producing functions like size/length/row_number need explicit
    # bigint casts to line up with DuckDB).
    dtype_diffs = {
        c: (str(spark_pdf[c].dtype), str(duck_pdf[c].dtype))
        for c in sc
        if str(spark_pdf[c].dtype) != str(duck_pdf[c].dtype)
    }
    if dtype_diffs:
        problems.append(f"{key}: dtype mismatches {dtype_diffs}")
    if problems:
        return problems
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"{key}.{col}: {len(bad)}/{len(av)} values differ; first at row {i}: "
                f"spark={x!r} duck={y!r}"
            )
    return problems


def run_op(spark, con, fn, sql: str, sf_dir: str, key: str) -> list[str]:
    spark_pdf = fn(spark, sf_dir).toPandas()
    duck_pdf = con.execute(sql).fetchdf()
    return compare(spark_pdf, duck_pdf, key)
