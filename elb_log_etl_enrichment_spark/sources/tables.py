"""Readers for the driver's synthetic TPC-H-ish parquet tables.

Analog of the reference's scans (SURVEY.md §2.1 S2/S4): parquet scans
with schema carried by the files, column pruning and predicate pushdown
handled by the parquet datasource.

``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
vectorized reader rejects. We scan it as a nanosecond long
(``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microsecond
timestamps with integer arithmetic — identical to DuckDB's ns→µs
truncation, keeping the oracle comparison exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_engine_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table from ``{sf_dir}/{name}.parquet``."""
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns since epoch -> µs timestamp; `div` is integer division so we
        # never round-trip a 1e18-magnitude long through a double.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; defaults to every table."""
    names = names or TABLE_NAMES
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so callers can use
    the raw ``spark.sql`` surface — the migration path for reference
    users whose queries are SQL text rather than DataFrame code. Views
    are lazy: registration costs nothing until a query scans one, and
    each scan gets the same pruning/pushdown as `load_table`."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
