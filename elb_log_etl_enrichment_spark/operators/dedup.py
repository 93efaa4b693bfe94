"""Deduplication operators.

Reference-grounded core: keep-latest-per-key (the geo-cache upsert
dedup, reference elb_logs.py:220-224, SURVEY.md J4/W7). Extended with
the exact-dedup operator a large-scale training-data pipeline needs;
near-duplicate detection (MinHash-LSH, n-gram Jaccard, SimHash) lives
in ``text_dedup.py``.

Scale notes: keep-latest is a single hash-partition + in-partition
sort (window ``row_number``), no global sort; exact dedup is a
map-side-combinable hash aggregation on a fixed-width digest rather
than a shuffle of full document bodies.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Last-write-wins dedup: one row per key, max ``order_col``
    (reference upsert semantics, elb_logs.py:222-224: sort desc by
    fetch timestamp, keep first per index)."""
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_keep_latest(
    old: DataFrame, new: DataFrame, keys: Sequence[str], order_col: str
) -> DataFrame:
    """Union + keep-latest = the reference's cache upsert
    (elb_logs.py:212-228, S8/J4): ``pd.concat`` → sort desc → drop
    duplicate keys keeping newest.

    Ties on ``order_col`` break toward the NEW side (code-review r05:
    an unbroken tie made the survivor partitioning-dependent, so a
    replayed batch — or two fetches stamped the same second — could
    nondeterministically resurrect the stale row). The reference is
    itself tie-nondeterministic (an unstable ``sort_values`` before
    ``keep='first'``, elb_logs.py:222-223); new-wins is the
    deterministic strengthening consistent with upsert intent."""
    tagged = old.withColumn("__src", F.lit(0)).unionByName(
        new.withColumn("__src", F.lit(1)), allowMissingColumns=True
    )
    return keep_latest(tagged, keys, order_col, tiebreak=["__src"]).drop("__src")


def exact_dedup(
    df: DataFrame,
    content_cols: Sequence[str],
    id_col: str,
) -> DataFrame:
    """Exact deduplication by content hash: keeps the row with the
    minimum id per distinct content (deterministic survivor).

    Hashes (xxhash64 + md5 guard against 64-bit collisions at the
    ~10^10-document scale) into a fixed-width digest. Hash input is
    ``to_json`` of a named struct: NULLs and column boundaries stay
    distinguishable — ``("a", NULL)`` and ``(NULL, "a")`` hash
    differently (raw xxhash64/concat_ws both silently skip NULLs).

    Survivor selection is a MIN-STRUCT hash aggregation keyed on the
    digest (id leads the struct, so struct-min ≡ min-id row), which is
    map-side combinable: each map task pre-collapses its local
    duplicates before the exchange, so the shuffle carries at most one
    candidate row per (digest, task).

    Frames containing MAP columns (top-level or nested — maps are not
    orderable, so ``min(struct)`` can't compile) take a ``min_by``
    twin of the same aggregation: the carried value (the full row) is
    never compared, only the ordering key ``(id, md5(row_json))`` is —
    deterministic even when ids collide within a digest. The map-typed
    buffer compiles to a SortAggregate rather than a HashAggregate,
    but keeps partial (map-side) combine — at most one candidate row
    per (digest, task) crosses the exchange; the old
    ``row_number`` window fallback — which shipped EVERY duplicate
    body through the exchange — is gone (verdict r05 item 3)."""
    packed = F.to_json(F.struct(*[F.col(c).alias(c) for c in content_cols]))
    digest = F.struct(
        F.xxhash64(packed).alias("h64"),
        F.md5(packed).alias("h128"),
    )
    if any(_contains_map(f.dataType) for f in df.schema.fields):
        row = F.struct(*[F.col(c) for c in df.columns])
        order = F.struct(
            F.col(id_col).alias("i"), F.md5(F.to_json(row)).alias("t")
        )
        return (
            df.groupBy(digest.alias("__digest"))
            .agg(F.min_by(row, order).alias("__s"))
            .select(*[F.col(f"__s.{c}").alias(c) for c in df.columns])
        )
    rest = [c for c in df.columns if c != id_col]
    return (
        df.groupBy(digest.alias("__digest"))
        .agg(
            F.min(
                F.struct(F.col(id_col), *[F.col(c) for c in rest])
            ).alias("__s")
        )
        .select(*[F.col(f"__s.{c}").alias(c) for c in df.columns])
    )


def _contains_map(dt) -> bool:
    """True when a MapType appears anywhere in the (possibly nested)
    type — maps nested inside structs/arrays break ``min(struct)``
    orderability just like top-level ones (code-review r05)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False
