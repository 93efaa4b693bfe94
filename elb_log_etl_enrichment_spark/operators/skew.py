"""Skew-mitigation operators.

AQE's skew-join splitting handles most runtime skew automatically
(session.py turns it on), but aggregation skew on a pathological hot
key still serializes one reducer. ``salted_agg`` is the classic
manual fix: explode each key into ``n_salts`` sub-keys, aggregate
partially per (key, salt), then combine partials per key. The second
stage shuffles one row per (key, salt) — bounded regardless of how
hot the key is.

Only aggregates with a decomposition into (partial, combine) are
supported; results are identical to the unsalted plan (the oracle
checks this with a plain GROUP BY).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: partial-aggregate spec: output_name -> (partial_fn, combine_fn)
SALTABLE = {
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-safe shuffle equi-join: the manual fix for join skew
    when the small side is too big to broadcast and one join key is
    pathologically hot (AQE skew splitting covers sort-merge; this is
    the explicit form that also pins the layout).

    The big side is salted by ROW POSITION (monotonically_increasing_id
    mod ``n_salts``) — never by row content: a hot key's rows are often
    literal duplicates (replays, enum-valued columns), and any
    content-derived salt maps them all to one reducer, keeping exactly
    the straggler this operator exists to remove. Salt values cannot
    affect results (each big row meets exactly the one replica carrying
    its salt), so position-dependence is harmless. The small side
    replicates each row once per salt via a literal-array explode, and
    the join key becomes (key, salt) — the oracle checks the result
    against the unsalted JOIN. Cost: the small side shuffles
    ``n_salts``× its size — bounded and chosen, unlike the unbounded
    straggler it removes.

    Only big-side-preserving join types are accepted: with the small
    side replicated, right/full joins would emit one null-extended row
    per UNMATCHED REPLICA (up to ``n_salts`` spurious rows per small
    key) — for those, salt the other way around.
    """
    _BIG_PRESERVING = {
        "inner", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
    }
    if how.lower() not in _BIG_PRESERVING:
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, got {how!r}: "
            "replicated small-side rows would null-extend once per salt"
        )
    on = list(on)
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [*on, "__salt"], how).drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column name → (agg_name, input_col) with
    agg_name in SALTABLE. The salt is derived deterministically from
    ``salt_source`` (default: a stable hash of all non-key columns
    via xxhash64) so re-runs produce identical partials.
    """
    if salt_source is None:
        value_cols = [c for c in df.columns if c not in keys]
        salt_source = F.xxhash64(*[F.col(c) for c in value_cols])
    salted = df.withColumn("__salt", F.pmod(salt_source, F.lit(n_salts)))

    partials = salted.groupBy(*keys, "__salt").agg(
        *[
            SALTABLE[agg][0](F.col(col)).alias(f"__p_{out}")
            for out, (agg, col) in aggs.items()
        ]
    )
    return partials.groupBy(*keys).agg(
        *[
            SALTABLE[agg][1](F.col(f"__p_{out}")).alias(out)
            for out, (agg, col) in aggs.items()
        ]
    )
