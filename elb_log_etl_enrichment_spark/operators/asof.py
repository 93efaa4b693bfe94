"""As-of joins (nearest earlier / nearest later match per key).

The reference has no as-of join; this is part of the engine's
generalized operator inventory (SURVEY.md §2.4 note). Implemented as a
union + running-window fill rather than a range self-join: one shuffle
on the key, linear in rows, no pair explosion — the plan survives a
100× scale-up where a ``right_time <= left_time`` theta-join would
not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: Sequence[str],
    right_tiebreak: str | None,
    forward: bool,
) -> DataFrame:
    """Shared core: union both sides, then fill each left row's payload
    from the nearest qualifying right row via a keyed running window.
    Direction only changes the ordering, the frame, and first-vs-last.

    NULL semantics match SQL/DuckDB ASOF (code-review r05): a NULL
    join key or NULL time NEVER matches — NULL-key/NULL-time right
    rows are excluded, and NULL-key/NULL-time left rows pass through
    with NULL payload (the window's NULL partition would otherwise
    pair them). Payload names must not collide with left columns
    (the old code silently overwrote the left column with NULL and
    emitted a duplicate name), and the tiebreak rides an internal
    column so it works without being listed in ``payload_cols``."""
    lcols = list(left.columns)
    overlap = sorted(set(payload_cols) & set(lcols))
    if overlap:
        raise ValueError(
            f"payload_cols {overlap} already exist in the left frame; "
            "alias them on the right side first"
        )
    if right_tiebreak is not None and right_tiebreak not in right.columns:
        raise ValueError(
            f"right_tiebreak {right_tiebreak!r} is not a right-frame column"
        )
    r = right.filter(
        F.col(right_on).isNotNull() & F.col(right_time).isNotNull()
    ).select(
        F.col(right_on).alias(left_on),
        F.col(right_time).alias("__t"),
        *([F.col(right_tiebreak).alias("__tb")] if right_tiebreak else []),
        *[F.col(c) for c in payload_cols],
    )
    l2 = left.withColumn("__t", F.col(left_time)).withColumn("__is_left", F.lit(1))
    for c in payload_cols:
        l2 = l2.withColumn(c, F.lit(None).cast(r.schema[c].dataType))
    if right_tiebreak:
        l2 = l2.withColumn("__tb", F.lit(None).cast(r.schema["__tb"].dataType))
    r2 = r.withColumn("__is_left", F.lit(0))
    for c in lcols:
        if c not in r2.columns:
            r2 = r2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l2.unionByName(r2.select(l2.columns))

    if forward:
        # left rows sort before right rows at equal time → inclusive >=;
        # among equal-time right rows the first (min tiebreak, nulls
        # kept away from the front) wins.
        order = [F.col("__t").asc(), F.col("__is_left").desc()]
        frame = (Window.currentRow, Window.unboundedFollowing)
        fill = F.first
        tiebreak_order = F.col("__tb").asc_nulls_last() if right_tiebreak else None
    else:
        # right rows sort before left rows at equal time → inclusive <=;
        # among equal-time right rows the last (max tiebreak, nulls
        # kept away from the back) wins.
        order = [F.col("__t").asc(), F.col("__is_left").asc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
        fill = F.last
        tiebreak_order = F.col("__tb").asc_nulls_first() if right_tiebreak else None
    if tiebreak_order is not None:
        order.append(tiebreak_order)
    w = Window.partitionBy(left_on).orderBy(*order).rowsBetween(*frame)
    # Fill the WHOLE payload as one struct (NULL on left-side rows):
    # per-column fill with ignorenulls would stitch a composite "row"
    # from different right rows whenever a payload column is NULL.
    payload_struct = F.when(
        F.col("__is_left") == 0, F.struct(*[F.col(c) for c in payload_cols])
    )
    # NULL key / NULL time on the LEFT: no right row can qualify (SQL
    # comparison with NULL is never true) — force the NULL payload the
    # window's NULL-first ordering would otherwise leak around
    no_match = F.col(left_on).isNull() | F.col("__t").isNull()
    filled = u.select(
        *lcols,
        F.col("__is_left"),
        F.when(
            ~no_match, fill(payload_struct, ignorenulls=True).over(w)
        ).alias("__p"),
    )
    return filled.filter(F.col("__is_left") == 1).select(
        *lcols, *[F.col("__p").getField(c).alias(c) for c in payload_cols]
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: Sequence[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the payload of the latest right row
    with the same key and ``right_time <= left_time`` (inclusive);
    NULL payload when no such row exists (left-outer as-of).

    Ties on ``right_time`` resolve to the greatest ``right_tiebreak``.
    """
    return _asof_join(
        left, right, left_on, right_on, left_time, right_time,
        payload_cols, right_tiebreak, forward=False,
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: Sequence[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Mirror of :func:`asof_join_backward`: for every left row, the
    payload of the EARLIEST right row with the same key and
    ``right_time >= left_time`` (inclusive); NULL payload when none.

    Ties on ``right_time`` resolve to the smallest ``right_tiebreak``.
    """
    return _asof_join(
        left, right, left_on, right_on, left_time, right_time,
        payload_cols, right_tiebreak, forward=True,
    )
