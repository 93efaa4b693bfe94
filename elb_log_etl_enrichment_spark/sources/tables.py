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


#: session-scoped memo of loaded (lazy, unpersisted) table frames.
#: ``spark.read.parquet`` costs ~100-400 ms of driver work per call
#: (file listing + footer schema inference + analysis), and every
#: registry query pays it 1-4x — at bench scale that fixed cost
#: dominated many sub-second queries (r10; guide §1.2 — remove work
#: before tuning it). A DataFrame is an immutable logical plan, so
#: reusing it is exactly plan-template reuse (the r9
#: make_feature_chain_template precedent): execution still scans the
#: parquet files every action, nothing is cached but the plan. Keyed by
#: (applicationId, path) and GUARDED by ``_path_stamp`` — file paths
#: stamp (mtime_ns, size); directory datasets fold every contained
#: file's (relpath, mtime_ns, size) into the stamp (ADVICE r10) — so an
#: overwritten OR in-place-mutated fixture is re-read with a fresh file
#: listing. Entries from stopped applications are evicted when a new
#: application first loads.
_TABLE_MEMO: dict[tuple[str, str], tuple[tuple, DataFrame]] = {}


def _path_stamp(path: str) -> tuple:
    """Freshness stamp for a parquet path. For a single file,
    (mtime_ns, size). For a DIRECTORY dataset (ADVICE r10): a
    directory's own st_size says nothing about its files, and
    replacing a part file's bytes in place (same file names) need not
    bump the directory mtime — so fold every contained file's
    (relpath, mtime_ns, size) into the stamp. Fixture dirs hold a
    handful of files, so the walk is microseconds; the memo hit path
    re-stamps on every call, which is exactly what makes in-place
    rewrites visible instead of served from a stale plan."""
    import os

    st = os.stat(path)
    if not os.path.isdir(path):
        return (st.st_mtime_ns, st.st_size)
    entries = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            fp = os.path.join(root, f)
            try:
                fst = os.stat(fp)
            except OSError:
                continue  # racing writer: next call re-stamps
            entries.append(
                (os.path.relpath(fp, path), fst.st_mtime_ns, fst.st_size)
            )
    # the listing tuple itself is the stamp — never a hash() of it
    # (64-bit truncation could collide and silently serve a stale
    # plan, and str hashes are per-process salted anyway). Fixture
    # dirs hold a handful of files, so the memory cost is noise.
    return (st.st_mtime_ns, tuple(sorted(entries)))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table from ``{sf_dir}/{name}.parquet``.

    SINGLE-INSTANCE CONTRACT (ADVICE r10): repeated loads of the same
    unchanged path return the IDENTICAL DataFrame object (the memo
    below), so a query that loads a table twice and joins the two
    handles self-joins with colliding attribute IDs. Queries that need
    two independent sides of one table must alias them
    (``load_table(...).alias("a")`` / ``.alias("b")``) and reference
    columns through the aliases — the same rule as any Spark
    self-join."""
    import os

    ensure_engine_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    try:
        stamp = _path_stamp(path)
        app_id = spark.sparkContext.applicationId
    except Exception:  # missing path / stopped session: no memo
        stamp = None
        app_id = None
    key = (app_id, path)
    if stamp is not None:
        hit = _TABLE_MEMO.get(key)
        if hit is not None and hit[0] == stamp:
            return hit[1]
        for stale in [k for k in _TABLE_MEMO if k[0] != app_id]:
            _TABLE_MEMO.pop(stale, None)  # dead-session plans
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns since epoch -> µs timestamp; `div` is integer division so we
        # never round-trip a 1e18-magnitude long through a double.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if stamp is not None:
        if len(_TABLE_MEMO) > 256:  # lazy plans only — size is tiny,
            _TABLE_MEMO.clear()  # the cap is a leak backstop
        _TABLE_MEMO[key] = (stamp, df)
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
