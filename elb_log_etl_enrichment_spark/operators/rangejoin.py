"""Bucketized range join and hierarchical time rollup.

**Range join** (`events within Δt of each other`, per key): Spark has
no IEJoin, so a naive ``|t1 − t2| <= Δ`` theta join degenerates to a
per-key nested loop. Bucketizing time into Δ-wide cells and probing
each row into its cell ±1 turns the range predicate into a shuffled
EQUI-join on (key, cell) + a residual filter — each qualifying pair
is produced exactly once (bucket distance of a qualifying pair is
≤ 1), and cluster cost is O(rows · pairs-per-cell), not O(rows²).

**Hierarchical rollup** (hypertable-style continuous aggregate):
minute → hour → day, each coarser level re-aggregated from the finer
level's partials — the 100 TB pattern where raw data is touched once
and each coarser tier reads only the tier below (here: one scan,
reused partials inside one plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_self_join(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    max_gap_ms: int,
) -> DataFrame:
    """Pairs (a, b) with the same key, ``id_a < id_b`` and
    ``|ts_a − ts_b| <= max_gap_ms``. Returns (key, id_a, id_b,
    gap_ms)."""
    ms = F.unix_millis(F.col(ts))
    base = df.select(F.col(key).alias("k"), F.col(id_col).alias("id"), ms.alias("ms"))
    cell = (F.col("ms") / max_gap_ms).cast("long")
    probe = base.select(
        "k", F.col("id").alias("id_a"), F.col("ms").alias("ms_a"),
        F.explode(F.array(cell - 1, cell, cell + 1)).alias("cell"),
    )
    build = base.select(
        "k", F.col("id").alias("id_b"), F.col("ms").alias("ms_b"),
        cell.alias("cell"),
    )
    return (
        probe.join(build, on=["k", "cell"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("ms_a") - F.col("ms_b")) <= max_gap_ms)
        )
        .select(
            F.col("k").alias(key),
            "id_a",
            "id_b",
            F.abs(F.col("ms_a") - F.col("ms_b")).cast("long").alias("gap_ms"),
        )
    )


def hierarchical_time_rollup(
    df: DataFrame, ts: str, value: str
) -> DataFrame:
    """Minute/hour/day continuous-aggregate tiers from ONE scan:
    hour re-aggregates minute partials, day re-aggregates hour
    partials. Returns (level, bucket_start_ms, n, sum_value)."""
    minute = (
        df.select(F.date_trunc("minute", F.col(ts)).alias("b"), F.col(value).alias("v"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    hour = (
        minute.select(F.date_trunc("hour", "b").alias("b"), "n", "s")
        .groupBy("b")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    day = (
        hour.select(F.date_trunc("day", "b").alias("b"), "n", "s")
        .groupBy("b")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )

    def out(level: str, d: DataFrame) -> DataFrame:
        return d.select(
            F.lit(level).alias("level"),
            F.unix_millis("b").alias("bucket_start_ms"),
            F.col("n").cast("long").alias("n"),
            F.round("s", 2).alias("sum_value"),
        )

    return out("minute", minute).unionByName(out("hour", hour)).unionByName(
        out("day", day)
    )
