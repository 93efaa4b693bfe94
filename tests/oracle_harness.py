"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query through Spark AND its oracle SQL through DuckDB
on the same parquet tables, then compares row count, column-name set,
and order-insensitive cell values — catching hash mismatches before
the driver does.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from elb_log_etl_enrichment_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # bound the oracle's memory and let it spill: the quadratic
    # oracles (pairwise-cosine triangles) exhaust RAM at sf1 when a
    # Spark driver JVM holds its share (sf1 sweep finding); with a
    # temp_directory DuckDB runs them out-of-core instead of dying
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for name in TABLE_NAMES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):  # Spark-written layout (e.g. /tmp/sf1)
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else v)
    # stable order-insensitive row ordering via stringified tuples
    key = df.apply(lambda row: tuple(str(v) for v in row), axis=1)
    df = df.iloc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df


def _cell_equal(a, b) -> bool:
    a_nan = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
    b_nan = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
    if a_nan or b_nan:
        return a_nan and b_nan
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if fa == fb:
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    issues: list[str] = []
    s = _normalize(spark_df.toPandas())
    o = _normalize(oracle_df)
    if list(s.columns) != list(o.columns):
        issues.append(f"{name}: columns differ spark={list(s.columns)} oracle={list(o.columns)}")
        return issues
    if len(s) != len(o):
        issues.append(f"{name}: row count spark={len(s)} oracle={len(o)}")
        return issues
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(sv, ov))
            if not _cell_equal(a, b)
        ]
        if bad:
            i, a, b = bad[0]
            issues.append(
                f"{name}: col {c}: {len(bad)}/{len(sv)} cells differ; "
                f"first at row {i}: spark={a!r} oracle={b!r}"
            )
    return issues
