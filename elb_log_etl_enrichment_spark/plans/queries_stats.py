"""Statistical monitoring / experimentation tier: A/B testing
(Welch t + CUPED), control charts (EWMA), changepoint detection
(CUSUM), forecast backtesting (seasonal naive), distributional
audits (Benford), concentration metrics (Pareto / Gini), and an
empirical survival curve.

Reference grounding: the reference pipeline ends at descriptive
aggregates (hourly counts, error summaries — elb_logs.py:351-396);
it has no inferential or monitoring layer. Production telemetry at
100 TB needs the next step: is this hour's traffic ANOMALOUS
(EWMA/CUSUM), did the experiment MOVE the metric (Welch/CUPED), is
the data DISTRIBUTED as expected (Benford), how CONCENTRATED is the
workload (Pareto/Gini)? Every query here is a pure DataFrame program
with a DuckDB oracle mirror.

Cross-engine hardening (the house rules from PERF.md, applied
throughout):

* All decision-making arithmetic is EXACT: integer counts, integer
  cents (``CAST(ROUND(x*100) AS BIGINT)``), basis points, and
  power-of-two EWMA weights (bit shifts, never ``POWER``).
* Doubles appear only as (a) quantized-decimal sums — order
  independent in both engines — or (b) derived expressions whose
  operands are bit-identical in both engines and whose operator
  tree is written identically on both sides, so IEEE determinism
  guarantees bit-equal results before any final ``ROUND``.
* Transcendental constants (Benford's log10 probabilities) are
  embedded as shared ``repr`` literals in BOTH the Spark plan and
  the SQL text — each engine parses the same decimal literal to the
  same double; neither engine's ``log10`` is ever called.

Scale notes (100 TB):

* Every query aggregates to group-size output (per event_type, per
  nation, per digit, per day); no all-pairs joins anywhere.
* The time-series queries (EWMA/CUSUM/backtest) window over HOURLY
  aggregates — the window input is |types| x |hours| rows no matter
  how many raw events feed it, so the sort behind each window is
  bounded by calendar size, not data size.
* The hour spine for the backtest is |types| x |hours| rows
  (`sequence` + `explode`); years of hourly history stay < 10^5
  rows per type.
* A/B and CUPED shuffle once on user_id (the per-user reduction);
  everything after is dimension-sized. Variant assignment is the
  same portable md5 bucket as the sampling tier — codegen'd per
  row, no exchange, reproducible across engines and runs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..memo import PersistSlot
from .queries import _t, register
from .queries_sampling import hash_bucket, _sql_bucket

# --------------------------------------------------------------------------
# Shared helpers
# --------------------------------------------------------------------------

#: Spark column + DuckDB expr for the deterministic 50/50 variant
#: assignment (portable md5 bucket mod 2 — same family as the
#: sampling tier's hash_bucket, different salt so assignments are
#: independent of sampling decisions).
_AB_SALT = "ab|"


def _variant(col) -> F.Column:
    return (hash_bucket(col, _AB_SALT) % 2).cast("long")


_VARIANT_SQL = f"({_sql_bucket('CAST(user_id AS VARCHAR)', _AB_SALT)} % 2)::BIGINT"

#: tz-free hour index: epoch milliseconds floor-divided by 3600000.
#: Both engines see the same parquet instants (Spark reads them as
#: LTZ, DuckDB as naive-UTC), so the integer index is identical.
_HOUR_IDX_SQL = "epoch_ms(ts) // 3600000"


def _hour_idx(ts="ts") -> F.Column:
    return F.expr(f"unix_millis({ts}) div 3600000")


# --------------------------------------------------------------------------
# A/B test: Welch's t statistic per event_type
# --------------------------------------------------------------------------
@register(
    "ab_welch_ttest",
    sql=f"""
    WITH v AS (
        SELECT event_type, value, {_VARIANT_SQL} AS variant
        FROM events
    ),
    s AS (
        SELECT event_type,
            COUNT(CASE WHEN variant = 0 THEN value END) AS n_a,
            COUNT(CASE WHEN variant = 1 THEN value END) AS n_b,
            CAST(SUM(CASE WHEN variant = 0
                          THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS s1a,
            CAST(SUM(CASE WHEN variant = 1
                          THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS s1b,
            CAST(SUM(CASE WHEN variant = 0
                          THEN CAST(value * value AS DECIMAL(38,12)) END)
                 AS DOUBLE) AS s2a,
            CAST(SUM(CASE WHEN variant = 1
                          THEN CAST(value * value AS DECIMAL(38,12)) END)
                 AS DOUBLE) AS s2b
        FROM v GROUP BY event_type
    ),
    m AS (
        SELECT *,
            s1a / n_a AS mean_a,
            s1b / n_b AS mean_b,
            (s2a - s1a * s1a / n_a) / (n_a - 1) AS var_a,
            (s2b - s1b * s1b / n_b) / (n_b - 1) AS var_b
        FROM s WHERE n_a > 1 AND n_b > 1
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           ROUND(mean_a, 6) AS mean_a,
           ROUND(mean_b, 6) AS mean_b,
           CASE WHEN var_a / n_a + var_b / n_b > 0
                THEN ROUND((mean_a - mean_b)
                           / sqrt(var_a / n_a + var_b / n_b), 6)
           END AS t_stat
    FROM m
    ORDER BY event_type
    """,
    tags=("stats", "experiment", "ab_test", "agg"),
)
def ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type Welch two-sample t statistic between the two
    hash-assigned variants. Moments come from exact decimal sums
    (order-independent); every double op after that is the same IEEE
    expression tree as the oracle, so the final ROUND sees
    bit-identical inputs in both engines (sqrt is correctly rounded
    by IEEE 754, so it preserves the invariant)."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "value")
    v = e.withColumn("variant", _variant(F.col("user_id")))

    def arm(tag: str, variant: int):
        cond = F.col("variant") == variant
        val = F.when(cond, F.col("value"))
        return [
            F.count(val).alias(f"n_{tag}"),
            F.sum(F.when(cond, F.col("value").cast("decimal(18,6)")))
            .cast("double")
            .alias(f"s1{tag}"),
            F.sum(
                F.when(cond, (F.col("value") * F.col("value")).cast("decimal(38,12)"))
            )
            .cast("double")
            .alias(f"s2{tag}"),
        ]

    s = v.groupBy("event_type").agg(*arm("a", 0), *arm("b", 1))
    m = (
        s.filter((F.col("n_a") > 1) & (F.col("n_b") > 1))
        .withColumn("mean_a", F.col("s1a") / F.col("n_a"))
        .withColumn("mean_b", F.col("s1b") / F.col("n_b"))
        .withColumn(
            "var_a",
            (F.col("s2a") - F.col("s1a") * F.col("s1a") / F.col("n_a"))
            / (F.col("n_a") - 1),
        )
        .withColumn(
            "var_b",
            (F.col("s2b") - F.col("s1b") * F.col("s1b") / F.col("n_b"))
            / (F.col("n_b") - 1),
        )
    )
    # Guard on the sqrt OPERAND (not the sqrt) so a marginally negative
    # variance sum from double rounding yields NULL in both engines
    # instead of raising in DuckDB while Spark returns NaN (ADVICE r02).
    se_sq = F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    se = F.sqrt(se_sq)
    return m.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.when(se_sq > 0, F.round((F.col("mean_a") - F.col("mean_b")) / se, 6)).alias(
            "t_stat"
        ),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# CUPED variance reduction: adjust the experiment metric with the
# pre-period covariate (theta = cov(x,y)/var(x) over included users)
# --------------------------------------------------------------------------
#: persisted per-user frames from the PREVIOUS cuped_adjusted_lift call
#: (released at the next call's entry — the _NARROW_SLOT pattern).
_CUPED_SLOT = PersistSlot()

@register(
    "cuped_adjusted_lift",
    sql=f"""
    WITH b AS (
        SELECT (MIN(epoch_ms(ts)) + MAX(epoch_ms(ts))) // 2 AS mid
        FROM events
    ),
    per_user AS (
        SELECT user_id,
            COUNT(CASE WHEN epoch_ms(ts) <  (SELECT mid FROM b) THEN value END) AS np,
            COUNT(CASE WHEN epoch_ms(ts) >= (SELECT mid FROM b) THEN value END) AS nq,
            CAST(SUM(CASE WHEN epoch_ms(ts) < (SELECT mid FROM b)
                          THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sp,
            CAST(SUM(CASE WHEN epoch_ms(ts) >= (SELECT mid FROM b)
                          THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sq
        FROM events GROUP BY user_id
    ),
    xy AS (
        SELECT user_id, sp / np AS x, sq / nq AS y,
               {_VARIANT_SQL} AS variant
        FROM per_user WHERE np > 0 AND nq > 0
    ),
    g AS (
        SELECT COUNT(*) AS n,
            CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS sx,
            CAST(SUM(CAST(y AS DECIMAL(18,9))) AS DOUBLE) AS sy,
            CAST(SUM(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
            CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx
        FROM xy
    ),
    t AS (
        SELECT n,
            CASE WHEN n * sxx - sx * sx > 0
                 THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                 ELSE 0.0 END AS theta,
            sx / n AS xbar
        FROM g WHERE n > 0
    ),
    adj AS (
        SELECT xy.variant, xy.y,
               xy.y - t.theta * (xy.x - t.xbar) AS y_adj
        FROM xy CROSS JOIN t
    )
    SELECT variant,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(y AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6)
               AS mean_metric,
           ROUND(CAST(SUM(CAST(y_adj AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6)
               AS mean_metric_cuped
    FROM adj
    GROUP BY variant
    ORDER BY variant
    """,
    tags=("stats", "experiment", "cuped", "agg"),
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout: covariate x = user's mean
    value in the first half of the time range, metric y = mean in the
    second half; theta fit once globally, y_adj = y - theta*(x-xbar).
    One shuffle on user_id; theta/xbar ride a broadcast of a 1-row
    aggregate. Per-user doubles are derived from exact decimal sums
    and combined with the oracle's exact expression tree, then
    re-quantized to decimals before the final (order-independent)
    variant averages."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    ems = F.expr("unix_millis(ts)")
    b = e.agg(
        F.expr("(min(unix_millis(ts)) + max(unix_millis(ts))) div 2").alias("mid")
    )
    ej = e.crossJoin(F.broadcast(b))
    pre = F.when(ems < F.col("mid"), F.col("value"))
    post = F.when(ems >= F.col("mid"), F.col("value"))
    per_user = ej.groupBy("user_id").agg(
        F.count(pre).alias("np"),
        F.count(post).alias("nq"),
        F.sum(pre.cast("decimal(18,6)")).cast("double").alias("sp"),
        F.sum(post.cast("decimal(18,6)")).cast("double").alias("sq"),
    )
    _CUPED_SLOT.release()
    # persisted (r10): xy feeds BOTH the theta fit and the adjustment
    # pass — unpersisted, the events scan + per-user shuffle ran twice.
    # The cached frame is one row per qualifying user (4 doubles), far
    # cheaper than a second full pass at any scale.
    xy = (
        per_user.filter((F.col("np") > 0) & (F.col("nq") > 0))
        .withColumn("x", F.col("sp") / F.col("np"))
        .withColumn("y", F.col("sq") / F.col("nq"))
        .withColumn("variant", _variant(F.col("user_id")))
        .select("user_id", "x", "y", "variant")
        .persist()
    )
    _CUPED_SLOT.hold(xy)
    g = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(18,9)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(18,9)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxx"),
    )
    t = g.filter(F.col("n") > 0).select(
        F.when(
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0,
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
        )
        .otherwise(F.lit(0.0))
        .alias("theta"),
        (F.col("sx") / F.col("n")).alias("xbar"),
    )
    adj = xy.crossJoin(F.broadcast(t)).select(
        "variant",
        "y",
        (F.col("y") - F.col("theta") * (F.col("x") - F.col("xbar"))).alias("y_adj"),
    )
    return (
        adj.groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.sum(F.col("y").cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_metric"),
            F.round(
                F.sum(F.col("y_adj").cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_metric_cuped"),
        )
        .orderBy("variant")
    )


# --------------------------------------------------------------------------
# EWMA control chart (alpha = 1/2, exact power-of-two weights)
# --------------------------------------------------------------------------
@register(
    "ewma_control_chart",
    sql=f"""
    WITH hourly AS (
        SELECT event_type,
               ({_HOUR_IDX_SQL}) // 24 AS day,
               ({_HOUR_IDX_SQL}) % 24 AS hr,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2, 3
    ),
    r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, day
                                     ORDER BY hr) AS rn
        FROM hourly
    ),
    n AS (
        SELECT *,
            SUM(x * (CASE WHEN rn = 1 THEN 2
                          ELSE (1::BIGINT << (rn - 1)) END))
                OVER (PARTITION BY event_type, day ORDER BY rn
                      ROWS UNBOUNDED PRECEDING) AS acc
        FROM r
    ),
    e AS (
        SELECT *,
               CAST(acc AS DOUBLE) / CAST(1::BIGINT << rn AS DOUBLE) AS ewma
        FROM n
    ),
    l AS (
        SELECT *, LAG(ewma) OVER (PARTITION BY event_type, day
                                  ORDER BY rn) AS prev
        FROM e
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(CASE WHEN rn > 1
                            AND 2 * abs(CAST(x AS DOUBLE) - prev)
                                > greatest(prev, 4.0)
                           THEN 1 END) AS BIGINT) AS n_alerts,
           ROUND(MAX(ewma), 6) AS max_ewma,
           ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS mean_hourly
    FROM l
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("stats", "monitoring", "ewma", "window", "timeseries"),
)
def ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA(alpha=1/2) over hourly event counts, restarted per (type,
    day); alert when this hour deviates from the running EWMA by more
    than 50% (and by more than 2 absolute events — the greatest()
    floor keeps tiny-count hours from alerting).

    The recursion s_t = x_t/2 + s_(t-1)/2 is evaluated in CLOSED FORM
    as an exact integer prefix sum: s_t = N_t / 2^t with
    N_t = 2*x_1 + sum_(k>=2) x_k * 2^(k-1) — pure BIGINT bit-shift
    math (exact while hourly counts stay < 2^29, i.e. half a billion
    events per type-hour), so the EWMA doubles are bit-identical in
    both engines with no POWER/EXP anywhere. Day restarts bound the
    shift exponent at 24 and make every day independently
    parallelizable — at 100 TB the window input is |types|x|hours|
    rows, already reduced by the hourly aggregate."""
    e = _t(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            (_hour_idx() / 24).cast("long").alias("day"),
            (_hour_idx() % 24).alias("hr"),
        )
        .groupBy("event_type", "day", "hr")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = Window.partitionBy("event_type", "day").orderBy("hr")
    r = hourly.withColumn("rn", F.row_number().over(w))
    wcum = Window.partitionBy("event_type", "day").orderBy("rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    term = F.col("x") * F.when(F.col("rn") == 1, F.lit(2).cast("long")).otherwise(
        F.expr("shiftleft(1L, rn - 1)")
    )
    n = r.withColumn("acc", F.sum(term).over(wcum))
    ew = n.withColumn(
        "ewma",
        F.col("acc").cast("double") / F.expr("shiftleft(1L, rn)").cast("double"),
    )
    wl = Window.partitionBy("event_type", "day").orderBy("rn")
    led = ew.withColumn("prev", F.lag("ewma").over(wl))
    alert = (F.col("rn") > 1) & (
        2 * F.abs(F.col("x").cast("double") - F.col("prev"))
        > F.greatest(F.col("prev"), F.lit(4.0))
    )
    return (
        led.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.count(F.when(alert, 1)).alias("n_alerts"),
            F.round(F.max("ewma"), 6).alias("max_ewma"),
            F.round(F.sum("x").cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_hourly"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# CUSUM changepoint detection (one-sided, closed form via running min)
# --------------------------------------------------------------------------
@register(
    "cusum_changepoint",
    sql=f"""
    WITH hourly AS (
        SELECT event_type, {_HOUR_IDX_SQL} AS h, COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ),
    scaled AS (
        SELECT *,
            COUNT(*) OVER (PARTITION BY event_type) AS n,
            SUM(x)   OVER (PARTITION BY event_type) AS total
        FROM hourly
    ),
    pref AS (
        SELECT *,
            SUM(n * x - total) OVER (PARTITION BY event_type ORDER BY h
                                     ROWS UNBOUNDED PRECEDING) AS p
        FROM scaled
    ),
    cus AS (
        SELECT *,
            p - least(0, MIN(p) OVER (PARTITION BY event_type ORDER BY h
                                      ROWS UNBOUNDED PRECEDING)) AS s
        FROM pref
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_hours,
           ROUND(CAST(MAX(s) AS DOUBLE) / MAX(n), 6) AS max_cusum,
           CAST(COUNT(CASE WHEN s > 3 * total THEN 1 END) AS BIGINT)
               AS n_alert_hours,
           MIN(CASE WHEN s > 3 * total THEN h END) AS first_alert_hour
    FROM cus
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("stats", "monitoring", "cusum", "window", "timeseries"),
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM over hourly counts per event_type: the
    recursion S_t = max(0, S_(t-1) + (x_t - mean)) has the closed
    form S_t = P_t - min(0, min_(j<=t) P_j) with P the prefix sum of
    deviations — a cumulative sum plus a RUNNING MIN, both plain
    window aggregates. Deviations are scaled by n (y = n*x - total)
    so everything stays exact BIGINT; an hour alerts when the
    normalized CUSUM exceeds 3x the mean hourly rate (S > 3*total).
    first_alert_hour is an exact integer MIN — no argmax tie issues."""
    e = _t(spark, sf_dir, "events")
    hourly = (
        e.select("event_type", _hour_idx().alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    wp = Window.partitionBy("event_type")
    scaled = hourly.withColumn("n", F.count(F.lit(1)).over(wp)).withColumn(
        "total", F.sum("x").over(wp)
    )
    wcum = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pref = scaled.withColumn(
        "p", F.sum(F.col("n") * F.col("x") - F.col("total")).over(wcum)
    )
    cus = pref.withColumn(
        "s", F.col("p") - F.least(F.lit(0).cast("long"), F.min("p").over(wcum))
    )
    alert = F.col("s") > 3 * F.col("total")
    return (
        cus.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_hours"),
            F.round(F.max("s").cast("double") / F.max("n"), 6).alias("max_cusum"),
            F.count(F.when(alert, 1)).alias("n_alert_hours"),
            F.min(F.when(alert, F.col("h"))).alias("first_alert_hour"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Seasonal-naive forecast backtest (24-hour seasonality, dense spine)
# --------------------------------------------------------------------------
@register(
    "seasonal_naive_backtest",
    sql=f"""
    WITH b AS (
        SELECT MIN({_HOUR_IDX_SQL}) AS h0, MAX({_HOUR_IDX_SQL}) AS h1
        FROM events
    ),
    spine AS (
        SELECT t.event_type, s.h
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(range(h0, h1 + 1)) AS h
                    FROM b WHERE h0 IS NOT NULL) s
    ),
    cnt AS (
        SELECT event_type, {_HOUR_IDX_SQL} AS h, COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ),
    dense AS (
        SELECT spine.event_type, spine.h, COALESCE(cnt.x, 0) AS x
        FROM spine LEFT JOIN cnt
          ON spine.event_type = cnt.event_type AND spine.h = cnt.h
    ),
    fc AS (
        SELECT *, LAG(x, 24) OVER (PARTITION BY event_type ORDER BY h) AS f
        FROM dense
    ),
    ev AS (
        SELECT event_type, x, f, x - f AS err, abs(x - f) AS ae,
            CASE WHEN x + f = 0 THEN CAST(0.0 AS DECIMAL(18,12))
                 ELSE CAST(2.0 * abs(x - f) / (x + f) AS DECIMAL(18,12))
            END AS smape_term
        FROM fc WHERE f IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           ROUND(CAST(SUM(ae) AS DOUBLE) / COUNT(*), 6) AS mae,
           ROUND(CAST(SUM(err) AS DOUBLE) / COUNT(*), 6) AS bias,
           ROUND(CAST(SUM(smape_term) AS DOUBLE) / COUNT(*), 6) AS smape
    FROM ev
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("stats", "forecast", "backtest", "timeseries", "gapfill"),
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecast x_hat(t) = x(t-24h)
    over a DENSE hour spine (missing hours count 0 — lag over sparse
    rows would silently compare non-adjacent days). MAE/bias are
    exact-integer sums; sMAPE terms are identical IEEE doubles
    quantized to DECIMAL(18,12) before the order-independent sum."""
    e = _t(spark, sf_dir, "events")
    b = e.agg(
        F.min(_hour_idx()).alias("h0"),
        F.max(_hour_idx()).alias("h1"),
    )
    types = e.select("event_type").distinct()
    spine = types.crossJoin(
        F.broadcast(b.filter(F.col("h0").isNotNull()))
    ).select(
        "event_type", F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    cnt = (
        e.select("event_type", _hour_idx().alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    dense = spine.join(cnt, ["event_type", "h"], "left").withColumn(
        "x", F.coalesce(F.col("x"), F.lit(0).cast("long"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    fc = dense.withColumn("f", F.lag("x", 24).over(w)).filter(
        F.col("f").isNotNull()
    )
    ae = F.abs(F.col("x") - F.col("f"))
    smape_term = (
        F.when((F.col("x") + F.col("f")) == 0, F.lit(0.0))
        .otherwise(2.0 * ae / (F.col("x") + F.col("f")))
        .cast("decimal(18,12)")
    )
    return (
        fc.select(
            "event_type",
            (F.col("x") - F.col("f")).alias("err"),
            ae.alias("ae"),
            smape_term.alias("smape_term"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.round(F.sum("ae").cast("double") / F.count(F.lit(1)), 6).alias("mae"),
            F.round(F.sum("err").cast("double") / F.count(F.lit(1)), 6).alias("bias"),
            F.round(F.sum("smape_term").cast("double") / F.count(F.lit(1)), 6).alias(
                "smape"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Benford first-digit audit
# --------------------------------------------------------------------------

#: log10(1 + 1/d) as shared repr literals: both engines parse the
#: same decimal literal to the same nearest double — neither engine's
#: log10 is invoked, so libm differences can't leak in.
_BENFORD_P = {d: repr(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}

#: the CAST keeps DuckDB from typing the literal as DECIMAL (whose
#: arithmetic would overflow in the chi-square product); casting the
#: exactly-held decimal literal to DOUBLE yields the same nearest
#: double as parsing it directly.
_BENFORD_VALUES_SQL = ", ".join(
    f"({d}, CAST({p} AS DOUBLE))" for d, p in _BENFORD_P.items()
)


@register(
    "benford_first_digit_audit",
    sql=f"""
    WITH cents AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
        FROM orders
        WHERE o_totalprice > 0
    ),
    d AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               COUNT(*) AS n_obs
        FROM cents GROUP BY 1
    ),
    t AS (SELECT SUM(n_obs) AS n FROM d)
    SELECT p.digit,
           COALESCE(d.n_obs, 0) AS n_obs,
           ROUND(t.n * p.p, 3) AS expected_n,
           ROUND((COALESCE(d.n_obs, 0) - t.n * p.p)
                 * (COALESCE(d.n_obs, 0) - t.n * p.p) / (t.n * p.p), 6)
               AS chi2_part
    FROM (VALUES {_BENFORD_VALUES_SQL}) p(digit, p)
    LEFT JOIN d ON d.digit = p.digit
    CROSS JOIN t
    WHERE t.n > 0
    ORDER BY p.digit
    """,
    tags=("stats", "quality", "benford", "audit"),
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs
    Benford's law, with per-digit chi-square contributions. The digit
    comes from the INTEGER-cents string (integer-to-string is exact
    and identical in both engines; scaling by 100 preserves the first
    significant digit), and the Benford probabilities are shared
    literals — see _BENFORD_P."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    cents = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    d = cents.select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("long").alias("digit")
    ).groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    t = d.agg(F.sum("n_obs").alias("n")).filter(F.col("n") > 0)
    spark_p = spark.createDataFrame(
        [(dd, float(p)) for dd, p in _BENFORD_P.items()], "digit long, p double"
    )
    joined = (
        spark_p.join(d, "digit", "left")
        .crossJoin(F.broadcast(t))
        .withColumn("n_obs", F.coalesce(F.col("n_obs"), F.lit(0).cast("long")))
    )
    dev = F.col("n_obs") - F.col("n") * F.col("p")
    return joined.select(
        "digit",
        "n_obs",
        F.round(F.col("n") * F.col("p"), 3).alias("expected_n"),
        F.round(dev * dev / (F.col("n") * F.col("p")), 6).alias("chi2_part"),
    ).orderBy("digit")


# --------------------------------------------------------------------------
# Pareto concentration (pure integer basis-point math)
# --------------------------------------------------------------------------
@register(
    "pareto_concentration",
    sql="""
    WITH rev AS (
        SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    j AS (
        SELECT n.n_name AS nation_name, rev.o_custkey AS ck, rev.cents
        FROM rev
        JOIN customer c ON rev.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
    ),
    w AS (
        SELECT *,
            ROW_NUMBER() OVER (PARTITION BY nation_name
                               ORDER BY cents DESC, ck) AS rn,
            SUM(cents) OVER (PARTITION BY nation_name
                             ORDER BY cents DESC, ck
                             ROWS UNBOUNDED PRECEDING) AS cum,
            SUM(cents) OVER (PARTITION BY nation_name) AS total,
            COUNT(*)   OVER (PARTITION BY nation_name) AS n
        FROM j
    )
    SELECT nation_name,
           CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(COUNT(CASE WHEN 5 * (cum - cents) < 4 * total THEN 1 END)
                AS BIGINT) AS n_top80,
           CAST(10000 * SUM(CASE WHEN rn <= (n + 9) // 10 THEN cents ELSE 0 END)
                // MAX(total) AS BIGINT) AS top10pct_share_bp
    FROM w
    WHERE total > 0
    GROUP BY nation_name
    ORDER BY nation_name
    """,
    tags=("stats", "concentration", "pareto", "window"),
)
def pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per nation: how many customers cover 80%
    of revenue (n_top80), and what share the top decile of customers
    holds (integer basis points — `10000*topsum // total`, no doubles
    anywhere). Ordering ties broken by custkey so ranks are identical
    across engines."""
    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        rev.join(c, rev.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation_name"),
            F.col("o_custkey").alias("ck"),
            "cents",
        )
    )
    wo = Window.partitionBy("nation_name").orderBy(F.desc("cents"), F.asc("ck"))
    wp = Window.partitionBy("nation_name")
    w = (
        j.withColumn("rn", F.row_number().over(wo))
        .withColumn(
            "cum",
            F.sum("cents").over(
                wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("total", F.sum("cents").over(wp))
        .withColumn("n", F.count(F.lit(1)).over(wp))
    )
    top10 = F.when(
        F.col("rn") <= F.expr("(n + 9) div 10"), F.col("cents")
    ).otherwise(F.lit(0).cast("long"))
    return (
        w.filter(F.col("total") > 0)
        .groupBy("nation_name")
        .agg(
            F.max("n").cast("long").alias("n_customers"),
            F.count(
                F.when(5 * (F.col("cum") - F.col("cents")) < 4 * F.col("total"), 1)
            ).alias("n_top80"),
            F.expr("CAST(10000 * sum(CASE WHEN rn <= (n + 9) div 10 THEN cents ELSE 0L END) div max(total) AS BIGINT)").alias(
                "top10pct_share_bp"
            ),
        )
        .orderBy("nation_name")
    )


# --------------------------------------------------------------------------
# Empirical survival curve (user lifetime in days, integer bp)
# --------------------------------------------------------------------------
@register(
    "user_survival_curve",
    sql="""
    WITH lt AS (
        SELECT user_id,
               (MAX(epoch_ms(ts)) - MIN(epoch_ms(ts))) // 86400000 AS days
        FROM events GROUP BY user_id
    ),
    tot AS (SELECT COUNT(*) AS n FROM lt),
    hist AS (
        SELECT least(days, 14) AS db, COUNT(*) AS cnt FROM lt GROUP BY 1
    ),
    spine AS (
        SELECT unnest(range(0, 15)) AS day, n
        FROM tot WHERE n > 0
    )
    SELECT s.day,
           CAST(COALESCE(SUM(h.cnt), 0) AS BIGINT) AS n_surviving,
           CAST(10000 * COALESCE(SUM(h.cnt), 0) // MAX(s.n) AS BIGINT)
               AS survival_bp
    FROM spine s
    LEFT JOIN hist h ON h.db >= s.day
    GROUP BY s.day
    ORDER BY s.day
    """,
    tags=("stats", "survival", "retention"),
)
def user_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical survival: fraction of users (basis points, exact
    integer math) whose observed activity span reaches day d, for
    d = 0..14 (capped histogram + 15x15 spine join — the heavy
    per-user reduction happens once; the curve itself is
    calendar-sized)."""
    e = _t(spark, sf_dir, "events")
    lt = e.groupBy("user_id").agg(
        F.expr("(max(unix_millis(ts)) - min(unix_millis(ts))) div 86400000").alias(
            "days"
        )
    )
    tot = lt.agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 0)
    hist = lt.groupBy(F.least(F.col("days"), F.lit(14)).alias("db")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    spine = tot.select(
        F.explode(F.sequence(F.lit(0), F.lit(14))).alias("day"), "n"
    )
    return (
        spine.join(F.broadcast(hist), hist.db >= spine.day, "left")
        .groupBy("day")
        .agg(
            F.coalesce(F.sum("cnt"), F.lit(0).cast("long")).alias("n_surviving"),
            F.expr(
                "CAST(10000 * coalesce(sum(cnt), 0L) div max(n) AS BIGINT)"
            ).alias("survival_bp"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Gini coefficient of customer revenue per nation
# --------------------------------------------------------------------------
@register(
    "gini_concentration",
    sql="""
    WITH rev AS (
        SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    j AS (
        SELECT n.n_name AS nation_name, rev.o_custkey AS ck, rev.cents
        FROM rev
        JOIN customer c ON rev.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
    ),
    r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY nation_name
                                     ORDER BY cents, ck) AS i
        FROM j
    )
    SELECT nation_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(2 * SUM(i * cents) - (COUNT(*) + 1) * SUM(cents) AS DOUBLE)
                 / CAST(COUNT(*) * SUM(cents) AS DOUBLE), 6) AS gini
    FROM r
    GROUP BY nation_name
    HAVING SUM(cents) > 0
    ORDER BY nation_name
    """,
    tags=("stats", "concentration", "gini", "window"),
)
def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue within each nation:
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with x sorted
    ascending and deterministic custkey tie-break. All sums are exact
    BIGINT (rank * cents stays far under 2^63 at any per-nation
    cardinality the cents fit; at extreme scale the same formula runs
    in DECIMAL(38,0)); the single double division is identical IEEE
    in both engines."""
    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        rev.join(c, rev.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation_name"),
            F.col("o_custkey").alias("ck"),
            "cents",
        )
    )
    r = j.withColumn(
        "i",
        F.row_number().over(
            Window.partitionBy("nation_name").orderBy("cents", "ck")
        ),
    )
    g = (
        r.groupBy("nation_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("i") * F.col("cents")).alias("sic"),
            F.sum("cents").alias("sx"),
        )
        .filter(F.col("sx") > 0)
    )
    return g.select(
        "nation_name",
        F.col("n_customers").cast("long").alias("n_customers"),
        F.round(
            (2 * F.col("sic") - (F.col("n_customers") + 1) * F.col("sx")).cast(
                "double"
            )
            / (F.col("n_customers") * F.col("sx")).cast("double"),
            6,
        ).alias("gini"),
    ).orderBy("nation_name")


# --------------------------------------------------------------------------
# Multivariate OLS by normal equations — distributed moments, closed-
# form Cramer solve. The derived arithmetic is ONE shared SQL string
# (_OLS_SOLVE_SQL) evaluated by BOTH engines over identical
# decimal-summed moments, so coefficient parity is by construction.
# --------------------------------------------------------------------------

#: Cramer's-rule solve of the 3x3 normal equations + moment-form R².
#: Operates on a 1-row frame with columns
#: n (BIGINT), nn/sx1/sx2/sy/s11/s12/s22/s1y/s2y/syy (DOUBLE).
_OLS_SOLVE_SQL = {
    "det": (
        "nn*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2)"
        " + sx2*(sx1*s12 - s11*sx2)"
    ),
    "det0": (
        "sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y)"
        " + sx2*(s1y*s12 - s11*s2y)"
    ),
    "det1": (
        "nn*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2)"
        " + sx2*(sx1*s2y - s1y*sx2)"
    ),
    "det2": (
        "nn*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2)"
        " + sy*(sx1*s12 - s11*sx2)"
    ),
}

_OLS_FINAL_SQL = f"""
    SELECT CAST(n AS BIGINT) AS n_orders,
           ROUND(det0 / det, 6) AS b_intercept,
           ROUND(det1 / det, 6) AS b_n_items,
           ROUND(det2 / det, 6) AS b_sum_price,
           ROUND(1.0 - (syy - ((det0 / det) * sy + (det1 / det) * s1y
                               + (det2 / det) * s2y))
                       / (syy - sy * sy / nn), 6) AS r2
    FROM (SELECT *,
                 {_OLS_SOLVE_SQL['det']}  AS det,
                 {_OLS_SOLVE_SQL['det0']} AS det0,
                 {_OLS_SOLVE_SQL['det1']} AS det1,
                 {_OLS_SOLVE_SQL['det2']} AS det2
          FROM ols_moments_v) m
    WHERE det <> 0 AND (syy - sy * sy / nn) > 0
"""

_OLS_MOMENTS_SQL = """
    WITH per_order AS (
        SELECT l_orderkey,
               CAST(COUNT(*) AS DOUBLE) AS x1,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS x2
        FROM lineitem GROUP BY l_orderkey
    ),
    xy AS (
        SELECT p.x1, p.x2, o.o_totalprice AS y
        FROM per_order p JOIN orders o ON p.l_orderkey = o.o_orderkey
    ),
    ols_moments_v AS (
        SELECT COUNT(*) AS n,
            CAST(COUNT(*) AS DOUBLE) AS nn,
            CAST(SUM(CAST(x1 AS DECIMAL(28,12))) AS DOUBLE)      AS sx1,
            CAST(SUM(CAST(x2 AS DECIMAL(28,12))) AS DOUBLE)      AS sx2,
            CAST(SUM(CAST(y  AS DECIMAL(28,12))) AS DOUBLE)      AS sy,
            CAST(SUM(CAST(x1 * x1 AS DECIMAL(38,12))) AS DOUBLE) AS s11,
            CAST(SUM(CAST(x1 * x2 AS DECIMAL(38,12))) AS DOUBLE) AS s12,
            CAST(SUM(CAST(x2 * x2 AS DECIMAL(38,12))) AS DOUBLE) AS s22,
            CAST(SUM(CAST(x1 * y  AS DECIMAL(38,12))) AS DOUBLE) AS s1y,
            CAST(SUM(CAST(x2 * y  AS DECIMAL(38,12))) AS DOUBLE) AS s2y,
            CAST(SUM(CAST(y  * y  AS DECIMAL(38,12))) AS DOUBLE) AS syy
        FROM xy
    )
"""


@register(
    "ols_order_value_regression",
    sql=_OLS_MOMENTS_SQL + _OLS_FINAL_SQL,
    tags=("stats", "regression", "ols", "agg"),
)
def ols_order_value_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS of o_totalprice on (n_items, sum_extendedprice) per order:
    X'X / X'y assembled in ONE distributed aggregate of decimal-
    quantized products (order-independent, cross-engine exact), then
    the 3x3 normal equations solved in closed form by Cramer's rule —
    the solve is the SAME SQL text (_OLS_SOLVE_SQL / _OLS_FINAL_SQL)
    in both engines, evaluated over bit-identical moments, so b and
    R² match bit-for-bit before the final ROUND. The 100 TB shape:
    one lineitem shuffle (per-order reduce), one orders join, one
    9-sum aggregate; the 'model fit' itself is O(1)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("double").alias("x1"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("x2"),
    )
    xy = per_order.join(o, per_order.l_orderkey == o.o_orderkey).select(
        "x1", "x2", F.col("o_totalprice").alias("y")
    )

    def dsum(expr, dec):
        return F.sum(expr.cast(dec)).cast("double")

    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    moments = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.lit(1)).cast("double").alias("nn"),
        dsum(x1, "decimal(28,12)").alias("sx1"),
        dsum(x2, "decimal(28,12)").alias("sx2"),
        dsum(y, "decimal(28,12)").alias("sy"),
        dsum(x1 * x1, "decimal(38,12)").alias("s11"),
        dsum(x1 * x2, "decimal(38,12)").alias("s12"),
        dsum(x2 * x2, "decimal(38,12)").alias("s22"),
        dsum(x1 * y, "decimal(38,12)").alias("s1y"),
        dsum(x2 * y, "decimal(38,12)").alias("s2y"),
        dsum(y * y, "decimal(38,12)").alias("syy"),
    )
    moments.createOrReplaceTempView("ols_moments_v")
    return spark.sql(_OLS_FINAL_SQL)


# --------------------------------------------------------------------------
# Distribution drift audit: equi-width histogram of `value` in the
# first vs second half of the time range, per-bin counts + an exact
# integer total-variation distance. Drift statistics that need no
# transcendentals (PSI's ln would drag libm differences into the
# hash) — TV distance is |p - q| arithmetic on integer counts and
# chi-square is polynomial in identical doubles.
# --------------------------------------------------------------------------
_DRIFT_BINS = 10

#: persisted bin-count frames from the PREVIOUS value_drift_audit call,
#: released at the next call's entry (_NARROW_SLOT pattern).
_DRIFT_SLOT = PersistSlot()


@register(
    "value_drift_audit",
    sql=f"""
    WITH b AS (
        SELECT MIN(value) AS lo, MAX(value) AS hi,
               (MIN(epoch_ms(ts)) + MAX(epoch_ms(ts))) // 2 AS mid
        FROM events WHERE value IS NOT NULL
    ),
    binned AS (
        SELECT least(CAST(floor((value - b.lo) / (b.hi - b.lo)
                                * {_DRIFT_BINS}) AS BIGINT),
                     {_DRIFT_BINS - 1}) AS bin,
               CASE WHEN epoch_ms(ts) < b.mid THEN 0 ELSE 1 END AS period
        FROM events CROSS JOIN b
        WHERE value IS NOT NULL AND b.hi > b.lo
    ),
    cnt AS (
        SELECT bin,
               COUNT(CASE WHEN period = 0 THEN 1 END) AS n_ref,
               COUNT(CASE WHEN period = 1 THEN 1 END) AS n_cur
        FROM binned GROUP BY bin
    ),
    tot AS (SELECT SUM(n_ref) AS nr, SUM(n_cur) AS nc FROM cnt)
    SELECT cnt.bin,
           CAST(cnt.n_ref AS BIGINT) AS n_ref,
           CAST(cnt.n_cur AS BIGINT) AS n_cur,
           -- per-bin TV contribution in exact 0.01-bp integer units:
           -- |n_ref*nc - n_cur*nr| scaled into 2*nr*nc
           CAST(1000000 * abs(cnt.n_ref * tot.nc - cnt.n_cur * tot.nr)
                // (2 * tot.nr * tot.nc) AS BIGINT) AS tv_contrib_ubp,
           ROUND(CASE WHEN cnt.n_ref > 0
                      THEN (CAST(cnt.n_cur AS DOUBLE) / tot.nc
                            - CAST(cnt.n_ref AS DOUBLE) / tot.nr)
                           * (CAST(cnt.n_cur AS DOUBLE) / tot.nc
                              - CAST(cnt.n_ref AS DOUBLE) / tot.nr)
                           / (CAST(cnt.n_ref AS DOUBLE) / tot.nr)
                      END, 9) AS chi2_part
    FROM cnt CROSS JOIN tot
    WHERE tot.nr > 0 AND tot.nc > 0
    ORDER BY cnt.bin
    """,
    tags=("stats", "monitoring", "drift", "histogram"),
)
def value_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram drift between the two halves of the time range:
    per-bin counts, exact-integer total-variation contributions
    (micro-basis-points: |n_ref*nc - n_cur*nr| // (2*nr*nc) scaled by
    1e6 — no doubles in the decision path), and a chi-square term
    whose doubles are the same expression tree in both engines. Bin
    edges derive from global min/max via identical IEEE arithmetic.
    One events scan + one bin-sized aggregate + a 1-row broadcast."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = e.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.expr("(min(unix_millis(ts)) + max(unix_millis(ts))) div 2").alias("mid"),
    )
    binned = (
        e.crossJoin(F.broadcast(b))
        .filter(F.col("hi") > F.col("lo"))
        .select(
            F.least(
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * _DRIFT_BINS
                ).cast("long"),
                F.lit(_DRIFT_BINS - 1).cast("long"),
            ).alias("bin"),
            F.when(F.expr("unix_millis(ts)") < F.col("mid"), 0)
            .otherwise(1)
            .alias("period"),
        )
    )
    _DRIFT_SLOT.release()
    # persisted (r10): cnt (≤ _DRIFT_BINS rows) feeds the totals AND
    # the final projection — unpersisted, both branches re-ran the
    # events scan + bin aggregate
    cnt = binned.groupBy("bin").agg(
        F.count(F.when(F.col("period") == 0, 1)).alias("n_ref"),
        F.count(F.when(F.col("period") == 1, 1)).alias("n_cur"),
    ).persist()
    _DRIFT_SLOT.hold(cnt)
    tot = cnt.agg(
        F.sum("n_ref").alias("nr"), F.sum("n_cur").alias("nc")
    ).filter((F.col("nr") > 0) & (F.col("nc") > 0))
    j = cnt.crossJoin(F.broadcast(tot))
    p = F.col("n_cur").cast("double") / F.col("nc")
    q = F.col("n_ref").cast("double") / F.col("nr")
    return j.select(
        "bin",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.expr(
            "CAST(1000000 * abs(n_ref * nc - n_cur * nr)"
            " div (2 * nr * nc) AS BIGINT)"
        ).alias("tv_contrib_ubp"),
        F.when(F.col("n_ref") > 0, F.round((p - q) * (p - q) / q, 9)).alias(
            "chi2_part"
        ),
    ).orderBy("bin")


# --------------------------------------------------------------------------
# Multi-horizon forecast backtest: the same dense-spine evaluation as
# seasonal_naive_backtest, swept over three baseline forecasters —
# 1 h persistence, 24 h daily-seasonal, 168 h weekly-seasonal. One
# spine build, three lags over ONE window partitioning, stacked into
# a (event_type, horizon) scoreboard; at 100 TB the eval input is
# still |types| x |hours| rows.
# --------------------------------------------------------------------------
_HORIZONS = (1, 24, 168)

#: persisted dense-spine frames from the PREVIOUS multi_horizon_backtest
#: call, released at the next call's entry (_NARROW_SLOT pattern).
_BACKTEST_SLOT = PersistSlot()


def _horizon_sql(h: int) -> str:
    return f"""
        SELECT event_type, {h} AS horizon_h, x,
               LAG(x, {h}) OVER (PARTITION BY event_type ORDER BY hh) AS f
        FROM dense"""


@register(
    "multi_horizon_backtest",
    sql=f"""
    WITH b AS (
        SELECT MIN({_HOUR_IDX_SQL}) AS h0, MAX({_HOUR_IDX_SQL}) AS h1
        FROM events
    ),
    spine AS (
        SELECT t.event_type, s.hh
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(range(h0, h1 + 1)) AS hh
                    FROM b WHERE h0 IS NOT NULL) s
    ),
    cnt AS (
        SELECT event_type, {_HOUR_IDX_SQL} AS hh, COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ),
    dense AS (
        SELECT spine.event_type, spine.hh, COALESCE(cnt.x, 0) AS x
        FROM spine LEFT JOIN cnt
          ON spine.event_type = cnt.event_type AND spine.hh = cnt.hh
    ),
    stacked AS ({" UNION ALL ".join(_horizon_sql(h) for h in _HORIZONS)})
    SELECT event_type,
           CAST(horizon_h AS BIGINT) AS horizon_h,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           ROUND(CAST(SUM(abs(x - f)) AS DOUBLE) / COUNT(*), 6) AS mae,
           ROUND(CAST(SUM(x - f) AS DOUBLE) / COUNT(*), 6) AS bias
    FROM stacked
    WHERE f IS NOT NULL
    GROUP BY event_type, horizon_h
    ORDER BY event_type, horizon_h
    """,
    tags=("stats", "forecast", "backtest", "timeseries"),
)
def multi_horizon_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAE/bias scoreboard of the three lag baselines per event_type.
    All error arithmetic is exact-integer (hourly counts); the stack
    is a 3-way unionByName over the SAME dense frame, so Spark plans
    one spine build feeding three window lags with a shared
    event_type partitioning."""
    e = _t(spark, sf_dir, "events")
    b = e.agg(
        F.min(_hour_idx()).alias("h0"), F.max(_hour_idx()).alias("h1")
    )
    spine = (
        e.select("event_type").distinct()
        .crossJoin(F.broadcast(b.filter(F.col("h0").isNotNull())))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hh"),
        )
    )
    cnt = (
        e.select("event_type", _hour_idx().alias("hh"))
        .groupBy("event_type", "hh")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    _BACKTEST_SLOT.release()
    # persisted (r10): the union stacks three lag projections OVER THE
    # SAME dense frame, but without the cache each union arm re-ran the
    # whole spine build (two events scans + the left join) — the
    # docstring's "one spine build" is only true with the persist. The
    # frame is |types| x |hours| rows at any scale.
    dense = (
        spine.join(cnt, ["event_type", "hh"], "left")
        .withColumn("x", F.coalesce(F.col("x"), F.lit(0).cast("long")))
        .persist()
    )
    _BACKTEST_SLOT.hold(dense)
    w = Window.partitionBy("event_type").orderBy("hh")
    parts = [
        dense.select(
            "event_type",
            F.lit(h).cast("long").alias("horizon_h"),
            "x",
            F.lag("x", h).over(w).alias("f"),
        )
        for h in _HORIZONS
    ]
    stacked = parts[0]
    for p in parts[1:]:
        stacked = stacked.unionByName(p)
    return (
        stacked.filter(F.col("f").isNotNull())
        .groupBy("event_type", "horizon_h")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.round(
                F.sum(F.abs(F.col("x") - F.col("f"))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mae"),
            F.round(
                F.sum(F.col("x") - F.col("f")).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("bias"),
        )
        .orderBy("event_type", "horizon_h")
    )



# --------------------------------------------------------------------------
# Distributed exclusive running sum (two-pass bucket scheme, same
# family as queries_training._distributed_global_rank): percentile
# cuts split the order-column domain into ranges (ties share a value,
# so they never straddle a cut), per-bucket exclusive prefix sums run
# in parallel, and a broadcast of the tiny per-bucket totals
# prefix-sum turns local sums into global ones. The only globally
# ordered structure is the bucket-count offset frame. The rank-test
# oracles use the plain single window — proving this scheme exact.
# --------------------------------------------------------------------------
#: persisted inputs from the PREVIOUS _bucketed_running_sum call,
#: released at the next call's entry (_NARROW_SLOT pattern).
_RUNNING_SUM_SLOT = PersistSlot()


def _bucketed_running_sum(
    df, order_col: str, sum_col: str, out_col: str,
    partition_cols: tuple[str, ...] = (), n_buckets: int = 32,
):
    _RUNNING_SUM_SLOT.release()
    # persisted (r10): df feeds THREE branches (percentile cuts, bucket
    # totals, and the final bucketed join) — unpersisted, the caller's
    # whole upstream lineage (a fact scan + distinct-value shuffle in
    # both callers) ran three times. The frame is value-cardinality-
    # sized, strictly smaller than any of those recomputes.
    df = df.persist()
    _RUNNING_SUM_SLOT.hold(df)
    cuts = df.agg(
        F.percentile(
            order_col,
            F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)]),
        ).alias("_cs")
    )
    rb = F.size(F.filter(F.col("_cs"), lambda x: x <= F.col(order_col)))
    b = df.join(F.broadcast(cuts)).withColumn("_rb", rb).drop("_cs")
    totals = b.groupBy(*partition_cols, "_rb").agg(F.sum(sum_col).alias("_c"))
    off_w = (
        Window.partitionBy(*partition_cols).orderBy("_rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *partition_cols,
        "_rb",
        F.coalesce(F.sum("_c").over(off_w), F.lit(0).cast("long")).alias("_off"),
    )
    in_w = (
        Window.partitionBy(*partition_cols, "_rb").orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(offsets), [*partition_cols, "_rb"])
        .withColumn(
            out_col,
            F.coalesce(F.sum(sum_col).over(in_w), F.lit(0).cast("long"))
            + F.col("_off"),
        )
        .drop("_rb", "_off")
    )


# --------------------------------------------------------------------------
# Mann-Whitney U: the nonparametric complement of ab_welch_ttest.
# Ranks are midranks over the POOLED per-type distribution; doubling
# every midrank keeps tie handling in exact integers
# (2*midrank = 2*cnt_less + cnt_eq + 1), so U is emitted as the exact
# BIGINT 2U and only the normal-approximation z touches doubles —
# built from those integers with the same expression tree both
# engines.
# --------------------------------------------------------------------------
@register(
    "mann_whitney_u",
    sql=f"""
    WITH v AS (
        SELECT event_type, value, {_VARIANT_SQL} AS variant
        FROM events WHERE value IS NOT NULL
    ),
    g AS (
        SELECT event_type, value,
               COUNT(CASE WHEN variant = 0 THEN 1 END) AS na_v,
               COUNT(*) AS cnt_eq
        FROM v GROUP BY event_type, value
    ),
    r AS (
        SELECT *,
            COALESCE(SUM(cnt_eq) OVER (PARTITION BY event_type ORDER BY value
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS cnt_less
        FROM g
    ),
    s AS (
        SELECT event_type,
            SUM(na_v) AS n_a,
            SUM(cnt_eq) - SUM(na_v) AS n_b,
            SUM(na_v * (2 * cnt_less + cnt_eq + 1)) AS r2_a,
            SUM(cnt_eq * cnt_eq * cnt_eq - cnt_eq) AS tie_term
        FROM r GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_stat,
           CASE WHEN n_a > 0 AND n_b > 0 AND (n_a + n_b) > 1
                 AND (CAST(n_a AS DOUBLE) * n_b * (n_a + n_b + 1) / 12.0
                      - CAST(n_a AS DOUBLE) * n_b * tie_term
                        / (12.0 * (n_a + n_b) * (n_a + n_b - 1))) > 0
                THEN ROUND(
                    (CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) / 2.0
                     - CAST(n_a AS DOUBLE) * n_b / 2.0)
                    / sqrt(CAST(n_a AS DOUBLE) * n_b * (n_a + n_b + 1) / 12.0
                           - CAST(n_a AS DOUBLE) * n_b * tie_term
                             / (12.0 * (n_a + n_b) * (n_a + n_b - 1))), 6)
           END AS z_stat
    FROM s
    ORDER BY event_type
    """,
    tags=("stats", "experiment", "nonparametric", "window"),
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type Mann-Whitney U between the hash-assigned
    variants, with midrank tie handling and tie-corrected normal
    z. The rank pass aggregates per DISTINCT (type, value) first, so
    the window input is value-cardinality-sized, and every decision
    quantity is exact BIGINT (u2_stat = 2U)."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = e.select(
        "event_type",
        "value",
        _variant(F.col("user_id")).alias("variant"),
    )
    g = v.groupBy("event_type", "value").agg(
        F.count(F.when(F.col("variant") == 0, 1)).alias("na_v"),
        F.count(F.lit(1)).alias("cnt_eq"),
    )
    r = _bucketed_running_sum(
        g, "value", "cnt_eq", "cnt_less", partition_cols=("event_type",)
    )
    s = r.groupBy("event_type").agg(
        F.sum("na_v").alias("n_a"),
        (F.sum("cnt_eq") - F.sum("na_v")).alias("n_b"),
        F.sum(
            F.col("na_v") * (2 * F.col("cnt_less") + F.col("cnt_eq") + 1)
        ).alias("r2_a"),
        F.sum(
            F.col("cnt_eq") * F.col("cnt_eq") * F.col("cnt_eq") - F.col("cnt_eq")
        ).alias("tie_term"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = F.col("n_a") + F.col("n_b")
    var = na * nb * (n + 1) / 12.0 - na * nb * F.col("tie_term") / (
        12.0 * n * (n - 1)
    )
    u2 = (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)).cast("long")
    z = (u2.cast("double") / 2.0 - na * nb / 2.0) / F.sqrt(var)
    return s.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        u2.alias("u2_stat"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0) & (n > 1) & (var > 0),
            F.round(z, 6),
        ).alias("z_stat"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Kruskal-Wallis H: k-sample rank test (does `value` differ across
# event_types?). Same exact-integer midrank machinery as
# mann_whitney_u, pooled over ALL types; the H statistic and its tie
# correction are built from integer sums with an identical double
# expression tree in both engines.
# --------------------------------------------------------------------------
@register(
    "kruskal_wallis_value_by_type",
    sql="""
    WITH v AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    g AS (
        SELECT value, event_type, COUNT(*) AS n_gv
        FROM v GROUP BY value, event_type
    ),
    pooled AS (
        SELECT value, SUM(n_gv) AS cnt_eq FROM g GROUP BY value
    ),
    ranked AS (
        SELECT *,
            COALESCE(SUM(cnt_eq) OVER (ORDER BY value
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS cnt_less
        FROM pooled
    ),
    per_group AS (
        SELECT g.event_type,
               SUM(g.n_gv) AS n_g,
               SUM(g.n_gv * (2 * r.cnt_less + r.cnt_eq + 1)) AS r2_g
        FROM g JOIN ranked r ON g.value = r.value
        GROUP BY g.event_type
    ),
    ties AS (
        SELECT SUM(cnt_eq * cnt_eq * cnt_eq - cnt_eq) AS tie_term FROM pooled
    ),
    tot AS (
        SELECT SUM(n_g) AS n, COUNT(*) AS k,
               SUM((CAST(r2_g AS DOUBLE) / 2.0) * (CAST(r2_g AS DOUBLE) / 2.0)
                   / n_g) AS sum_r2_over_n
        FROM per_group
    )
    SELECT CAST(tot.n AS BIGINT) AS n,
           CAST(tot.k AS BIGINT) AS k,
           CASE WHEN tot.n > 1
                 AND 1.0 - CAST(ties.tie_term AS DOUBLE)
                           / (CAST(tot.n AS DOUBLE) * tot.n * tot.n - tot.n) > 0
                THEN ROUND(
                    (12.0 / (CAST(tot.n AS DOUBLE) * (tot.n + 1))
                     * tot.sum_r2_over_n - 3.0 * (tot.n + 1))
                    / (1.0 - CAST(ties.tie_term AS DOUBLE)
                             / (CAST(tot.n AS DOUBLE) * tot.n * tot.n - tot.n)),
                    6)
           END AS h_stat
    FROM tot CROSS JOIN ties
    WHERE tot.n > 0
    """,
    tags=("stats", "nonparametric", "kruskal_wallis", "window"),
)
def kruskal_wallis_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H over pooled midranks: the rank
    pass aggregates per DISTINCT value (window input is value-
    cardinality-sized), group rank sums stay exact BIGINT (2*midrank
    trick), and only the final H expression touches doubles —
    identically in both engines."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # persisted (r10): g feeds pooled AND the per_group join — without
    # the cache the events scan + (value, type) shuffle ran twice. The
    # frame is distinct-(value, type)-sized. Registered in the running-
    # sum release list AFTER the helper call (its entry releases the
    # PREVIOUS call's frames; this one must survive the current call).
    g = (
        e.groupBy("value", "event_type")
        .agg(F.count(F.lit(1)).alias("n_gv"))
        .persist()
    )
    pooled = g.groupBy("value").agg(F.sum("n_gv").alias("cnt_eq"))
    ranked = _bucketed_running_sum(pooled, "value", "cnt_eq", "cnt_less")
    _RUNNING_SUM_SLOT.hold(g)
    per_group = (
        g.join(ranked, "value")
        .groupBy("event_type")
        .agg(
            F.sum("n_gv").alias("n_g"),
            F.sum(
                F.col("n_gv") * (2 * F.col("cnt_less") + F.col("cnt_eq") + 1)
            ).alias("r2_g"),
        )
    )
    ties = pooled.agg(
        F.sum(
            F.col("cnt_eq") * F.col("cnt_eq") * F.col("cnt_eq") - F.col("cnt_eq")
        ).alias("tie_term")
    )
    half = F.col("r2_g").cast("double") / 2.0
    tot = per_group.agg(
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(half * half / F.col("n_g")).alias("sum_r2_over_n"),
    ).filter(F.col("n") > 0)
    j = tot.crossJoin(F.broadcast(ties))
    nd = F.col("n").cast("double")
    corr = 1.0 - F.col("tie_term").cast("double") / (nd * F.col("n") * F.col("n") - F.col("n"))
    h = (12.0 / (nd * (F.col("n") + 1)) * F.col("sum_r2_over_n") - 3.0 * (F.col("n") + 1)) / corr
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.when((F.col("n") > 1) & (corr > 0), F.round(h, 6)).alias("h_stat"),
    )


# --------------------------------------------------------------------------
# Sample-ratio-mismatch audit: the first thing to check before ANY
# experiment readout — does the realized variant split match the
# designed 50/50? One-df chi-square against equal allocation, per
# metric slice; (n_a - n_b)^2 / (n_a + n_b) is integer-exact until
# one final division.
# --------------------------------------------------------------------------
@register(
    "srm_balance_audit",
    sql=f"""
    WITH u AS (
        SELECT DISTINCT event_type, user_id, {_VARIANT_SQL} AS variant
        FROM events
    ),
    s AS (
        SELECT event_type,
               COUNT(CASE WHEN variant = 0 THEN 1 END) AS n_a,
               COUNT(CASE WHEN variant = 1 THEN 1 END) AS n_b
        FROM u GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           ROUND(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b), 6)
               AS chi2,
           CAST(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)
                > 10.828 AS BOOLEAN) AS srm_flag
    FROM s
    WHERE n_a + n_b > 0
    ORDER BY event_type
    """,
    tags=("stats", "experiment", "srm", "audit"),
)
def srm_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square (1 df) of the realized user split vs the designed
    50/50, per event_type — the guardrail that invalidates a readout
    before anyone looks at metrics. Counts DISTINCT users per slice
    (a user's event volume must not weight the allocation check).
    srm_flag trips at the p≈0.001 critical value 10.828."""
    e = _t(spark, sf_dir, "events")
    u = (
        e.select("event_type", "user_id")
        .distinct()
        .withColumn("variant", _variant(F.col("user_id")))
    )
    s = u.groupBy("event_type").agg(
        F.count(F.when(F.col("variant") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("variant") == 1, 1)).alias("n_b"),
    )
    diff = F.col("n_a") - F.col("n_b")
    chi2 = (diff * diff).cast("double") / (F.col("n_a") + F.col("n_b"))
    return (
        s.filter(F.col("n_a") + F.col("n_b") > 0)
        .select(
            "event_type",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(chi2, 6).alias("chi2"),
            (chi2 > 10.828).alias("srm_flag"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Two-proportion z-test on conversion (did the user purchase?): the
# binary-outcome companion of ab_welch_ttest. Everything up to the
# final z is exact integers (user counts, converter counts, bp rates).
# --------------------------------------------------------------------------
@register(
    "ab_conversion_ztest",
    sql=f"""
    WITH u AS (
        SELECT user_id,
               {_VARIANT_SQL} AS variant,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT
            COUNT(CASE WHEN variant = 0 THEN 1 END) AS n_a,
            COUNT(CASE WHEN variant = 1 THEN 1 END) AS n_b,
            SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS c_a,
            SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS c_b
        FROM u
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(c_a AS BIGINT) AS conv_a,
           CAST(c_b AS BIGINT) AS conv_b,
           CAST(10000 * c_a // n_a AS BIGINT) AS rate_a_bp,
           CAST(10000 * c_b // n_b AS BIGINT) AS rate_b_bp,
           CASE WHEN (CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                     * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                     * (1.0 / n_a + 1.0 / n_b) > 0
                THEN ROUND((CAST(c_a AS DOUBLE) / n_a
                            - CAST(c_b AS DOUBLE) / n_b)
                           / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                                  * (1.0 - CAST(c_a + c_b AS DOUBLE)
                                           / (n_a + n_b))
                                  * (1.0 / n_a + 1.0 / n_b)), 6)
           END AS z_stat
    FROM s
    WHERE n_a > 0 AND n_b > 0
    """,
    tags=("stats", "experiment", "proportion", "agg"),
)
def ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z on per-user purchase conversion: one
    user_id reduce, one 4-count aggregate, exact integer counts and
    basis-point rates, identical-tree doubles only inside the final
    z."""
    e = _t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    ).withColumn("variant", _variant(F.col("user_id")))
    s = u.agg(
        F.count(F.when(F.col("variant") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("variant") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0)).alias("c_b"),
    ).filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    p = (F.col("c_a") + F.col("c_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    var = p * (1.0 - p) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    z = (
        F.col("c_a").cast("double") / F.col("n_a")
        - F.col("c_b").cast("double") / F.col("n_b")
    ) / F.sqrt(var)
    return s.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("c_a").cast("long").alias("conv_a"),
        F.col("c_b").cast("long").alias("conv_b"),
        F.expr("CAST(10000 * c_a div n_a AS BIGINT)").alias("rate_a_bp"),
        F.expr("CAST(10000 * c_b div n_b AS BIGINT)").alias("rate_b_bp"),
        F.when(var > 0, F.round(z, 6)).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Chi-square test of independence: event_type x day-of-week contingency
# --------------------------------------------------------------------------


@register(
    "chi_square_independence",
    sql="""
    WITH cells AS (
        SELECT event_type,
               (epoch_ms(ts) // 86400000 + 3) % 7 AS dow,
               COUNT(*) AS observed
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, dow, observed,
               SUM(observed) OVER (PARTITION BY event_type) AS rt,
               SUM(observed) OVER (PARTITION BY dow) AS ct,
               SUM(observed) OVER () AS n
        FROM cells
    )
    SELECT event_type, CAST(dow AS BIGINT) AS dow,
           CAST(observed AS BIGINT) AS observed,
           CAST(rt * ct * 1000 // n AS BIGINT) AS expected_milli,
           ROUND((observed - CAST(rt * ct AS DOUBLE) / n)
                 * (observed - CAST(rt * ct AS DOUBLE) / n)
                 / (CAST(rt * ct AS DOUBLE) / n), 6) AS chi2_part
    FROM m
    ORDER BY event_type, dow
    """,
    tags=("stats", "chi_square", "independence"),
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence cells for event_type x
    day-of-week: per-cell observed counts (exact integers), expected
    counts in exact milli-units (``rt*ct*1000 // n``), and the chi2
    contribution through an identical IEEE tree in both engines
    (sum the `chi2_part` column against the (r-1)(c-1) quantile to
    complete the test downstream).

    Day-of-week is computed as ``(epoch_day + 3) % 7`` (0 = Monday)
    in pure integer arithmetic — calendar functions disagree across
    engines on week start, integer math does not.  The marginals
    come from windows over the AGGREGATED cell table (#event_types
    x 7 rows), so the only data-scale operation is the first
    map-side-combined count; everything after runs on a few dozen
    rows regardless of input size.
    """
    e = _t(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        ((F.expr("unix_millis(ts) div 86400000") + 3) % 7).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("observed"))
    m = cells.select(
        "event_type",
        "dow",
        "observed",
        F.sum("observed").over(Window.partitionBy("event_type")).alias("rt"),
        F.sum("observed").over(Window.partitionBy("dow")).alias("ct"),
        F.sum("observed").over(
            Window.partitionBy()
        ).alias("n"),
    )
    expected = (F.col("rt") * F.col("ct")).cast("double") / F.col("n")
    return m.select(
        "event_type",
        F.col("dow").cast("long").alias("dow"),
        F.col("observed").cast("long").alias("observed"),
        # exact integer floor div — the double-division form diverges
        # from the oracle's // once rt*ct*1000 exceeds 2^53
        F.expr("CAST(rt * ct * 1000 div n AS BIGINT)").alias("expected_milli"),
        F.round(
            (F.col("observed") - expected)
            * (F.col("observed") - expected)
            / expected,
            6,
        ).alias("chi2_part"),
    ).orderBy("event_type", "dow")


# --------------------------------------------------------------------------
# Exact order statistics WITHOUT a global sort: ITERATED histogram
# narrowing (VERDICT r03 item 2). Each level bins the surviving rows
# into 1024 equi-width buckets (map-side combined counts); the
# cumulative bucket counts locate which bucket holds the target rank
# and the residual rank inside it; only that bucket survives to the
# next level. After L levels no downstream operator sees more than
# ~n/1024^L rows (n/2^20 at the default depth 2), and the final
# selection collapses the bucket to DISTINCT values before its
# single-partition cumulative window — so even a pathological
# all-ties bucket costs one tiny aggregate, never a full sort. The
# approx twins (equi_depth_histogram_orders_approx etc.) trade
# exactness for one pass; this is the EXACT scale path.
# --------------------------------------------------------------------------
_SEL_BINS = 1024
_SEL_DEPTH = 2
#: early-stop bound (r10): the level histogram already reports the
#: surviving bucket's row count driver-side, so once it is at or below
#: this many rows further narrowing levels are pure job overhead — the
#: final distinct-value collapse + single-partition cumulative window
#: handle a bucket this small trivially at any scale. Depth stays the
#: cap; this only skips levels that can no longer shrink anything that
#: matters.
_SEL_STOP = 1 << 16


def _bin_col(lo, hi) -> F.Column:
    """Equi-width bucket index over [lo, hi]; ties share a bucket by
    construction (binning is a pure function of value), the top edge
    clamps into the last bucket, and a degenerate lo == hi range maps
    everything to bucket 0."""
    return F.when(
        hi > lo,
        F.least(
            F.floor((F.col("value") - lo) / (hi - lo) * _SEL_BINS).cast("long"),
            F.lit(_SEL_BINS - 1).cast("long"),
        ),
    ).otherwise(F.lit(0).cast("long"))


_NARROW_SLOT = PersistSlot()


def _narrow_release() -> None:
    """Unpersist every bucket level cached by the PREVIOUS
    ``histogram_narrow`` call. The per-level persists must outlive the
    caller's final action (the returned bucket is lazy), so they can't
    be freed inside the loop; releasing them at the next call's entry
    bounds the cache footprint to one call's worth of tiny buckets
    (≤ ~n/1024 rows each) instead of leaking ``_SEL_DEPTH`` frames per
    call for the session's lifetime (ADVICE r04). Unpersisting a frame
    a stale handle still references only forces recompute, never a
    wrong answer. Assumes the registry's single-threaded execution
    model: a concurrent histogram_narrow on the same session would
    release the other call's levels mid-flight — recompute-only, but
    it defeats the persist's purpose; key the registry per query if
    the engine ever drives these concurrently."""
    _NARROW_SLOT.release()


def histogram_narrow(
    values: DataFrame,
    k_frame: DataFrame,
    levels: int = _SEL_DEPTH,
    bounds0: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Narrow a single-column ``values`` frame to the bucket holding
    order statistic k (``k_frame``: one row, column ``k``), iterating
    ``levels`` times. Each level re-bins within exact data-derived
    bounds: the surviving bucket's min/max ride the SAME histogram
    aggregate that counts the bins (r11 — one Spark job per level
    instead of two), so boundary IEEE drift between levels is
    impossible — the sub-range is the exact min/max of the surviving
    rows, never arithmetic on the parent's edges. The surviving bucket
    is persisted (≤ ~n/1024 rows after level 1) so later levels and
    the final selection don't re-expand the full-scan lineage. Returns
    ``(bucket, residual_k)``.

    EAGER (ADVICE r10): this function (and therefore any registry
    entry built on it, e.g. ``exact_median_two_pass``) runs its
    counting jobs AT PLAN-BUILD TIME — the steering histogram is
    collected driver-side and re-injected as literals, so merely
    constructing the returned DataFrame executes the narrowing scans.
    Plan-dump/introspection tooling that builds registry frames
    without acting on them will still pay (and time) these jobs.

    ``bounds0`` (optional, one row: ``lo``/``hi`` over ``values``) lets
    a caller that already aggregates the full input (for n/k) fuse the
    level-0 min/max into that same pass instead of paying a separate
    full scan (r10, guide §1.2/§2.4 — one fewer full pass over the
    fact table at any scale).

    r10 rewrite (guide §8 — decide with small rows): the steering
    values are DRIVER-SIZED BY CONSTRUCTION — k is one row, the bin
    histogram is ≤ ``_SEL_BINS`` (1024) rows per level — so they are
    collected and re-injected as literals instead of flowing through
    broadcast crossJoins + single-row windows. The old all-lazy
    formulation re-ran the FULL input scan once per consuming branch
    (exact_median_two_pass's plan held 123 Exchanges) and paid ~10
    steering jobs per level; this shape runs exactly one counting scan
    and one extraction scan per level and the steering arithmetic is
    exact Python integers. The data rows never leave the cluster —
    only the 1024-row histogram does — so the shape is unchanged at
    100 TB. Results are identical: binning stays a pure function of
    value, evaluated by the same Spark expression in the counting and
    extraction passes."""
    _narrow_release()
    spark = values.sparkSession
    krow = k_frame.first()
    k = int(krow.k) if krow is not None and krow.k is not None else 0
    cur = values
    empty_k = spark.createDataFrame([], "k bigint")
    if k <= 0:  # empty input: nothing to narrow
        return values.filter(F.lit(False)), empty_k
    # bounds for the CURRENT level: level 0 takes them from the
    # caller's fused pass (or one min/max job when absent); every
    # later level's bounds fall out of the PREVIOUS level's histogram
    # pass (r11, VERDICT r10 item 6: per-bin min/max aggregates ride
    # the same scan, so the per-level min/max job disappears — exactly
    # one Spark job per level). The surviving bucket's bounds are
    # still the exact min/max OF ITS ROWS — re-derived from the data,
    # never arithmetic on the parent's edges, so the IEEE-drift
    # guarantee is unchanged.
    if bounds0 is not None:
        brow = bounds0.first()
    else:
        brow = cur.agg(
            F.min("value").alias("lo"), F.max("value").alias("hi")
        ).first()
    lo = brow.lo if brow is not None else None
    hi = brow.hi if brow is not None else None
    for _level in range(levels):
        if lo is None or hi is None:  # no surviving rows
            return cur.filter(F.lit(False)), empty_k
        bin_expr = _bin_col(F.lit(lo), F.lit(hi))
        hist = sorted(
            cur.groupBy(bin_expr.alias("bin"))
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.min("value").alias("blo"),
                F.max("value").alias("bhi"),
            )
            .collect(),  # ≤ _SEL_BINS rows — bounded by construction
            # nulls-first bin order, matching the window ordering the
            # lazy formulation used (a null bin is unreachable for
            # non-NaN doubles; kept for exact shape parity)
            key=lambda r: (r.bin is not None, r.bin if r.bin is not None else 0),
        )
        cum = 0
        tbin = None
        tcount = 0
        for row in hist:
            if cum < k <= cum + row.c:
                tbin = row.bin
                tcount = row.c
                lo, hi = row.blo, row.bhi
                k -= cum
                break
            cum += row.c
        if tbin is None:  # k beyond row count (degenerate caller)
            return cur.filter(F.lit(False)), empty_k
        cur = (
            cur.filter(bin_expr == F.lit(tbin))
            .select("value")
            .persist()  # ≤ ~n/1024^(level+1) rows: feeds next level
        )
        _NARROW_SLOT.hold(cur)
        if tcount <= _SEL_STOP:  # bucket already driver-histogram-small
            break
    return cur, spark.createDataFrame([(k,)], "k bigint")


@register(
    "exact_median_two_pass",
    sql=f"""
    WITH v AS (
        SELECT value, event_id FROM events WHERE value IS NOT NULL
    ),
    n AS (SELECT COUNT(*) AS n, (COUNT(*) + 1) // 2 AS k FROM v),
    ranked AS (
        SELECT value, ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn
        FROM v
    )
    SELECT CAST(n.n AS BIGINT) AS n,
           CAST(n.k AS BIGINT) AS k,
           ROUND(ranked.value, 6) AS median_value
    FROM ranked CROSS JOIN n
    WHERE ranked.rn = n.k
    """,
    tags=("stats", "percentile", "exact", "two_pass"),
)
def exact_median_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact lower median (order statistic k = (n+1)//2) of
    events.value computed by ITERATED histogram narrowing instead of
    a global sort: ``_SEL_DEPTH`` 1024-bin count passes each locate
    the bucket holding the residual rank and keep only that bucket
    (no operator downstream of level L sees more than ~n/1024^L
    rows), then the final bucket collapses to DISTINCT values before
    a single-partition cumulative window picks the value whose count
    range covers the residual rank. The oracle's plain global
    ROW_NUMBER proves the narrowed answer exact; tie rows always
    share a bucket (binning is a pure function of value), and the
    order statistic's VALUE never needs a row tiebreak — tied rows
    carry the same value.

    EAGER at plan-build time (see ``histogram_narrow``): constructing
    this query's DataFrame runs the steering scans."""
    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("value")
    )
    # one full pass produces n, k AND the level-0 bin bounds (r10 —
    # formerly n/k and min/max were two separate full scans, and the
    # un-persisted 1-row frame re-ran the scan once per consuming
    # branch); persisted so the final n/k projection reuses it too
    b = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("(count(*) + 1) div 2").alias("k"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    ).persist()
    bucket, k = histogram_narrow(
        e, b.select("k"), bounds0=b.select("lo", "hi")
    )
    # registered AFTER the call — histogram_narrow's entry releases the
    # PREVIOUS call's frames, and b must survive this call's action
    _NARROW_SLOT.hold(b)
    g = bucket.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
    vw = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    hit = (
        g.crossJoin(F.broadcast(k))
        .withColumn("cum_before", F.coalesce(F.sum("c").over(vw), F.lit(0)))
        .filter(
            (F.col("cum_before") < F.col("k"))
            & (F.col("cum_before") + F.col("c") >= F.col("k"))
        )
        .select(F.round("value", 6).alias("median_value"))
    )
    return b.select(
        F.col("n").cast("long").alias("n"), F.col("k").cast("long").alias("k")
    ).crossJoin(hit)


# --------------------------------------------------------------------------
# Seasonal-baseline anomaly detection (STL-lite): the EWMA chart
# tracks level shifts and value_drift_audit tracks distribution
# shifts; neither knows that 3 AM is ALWAYS quiet. This removes the
# hour-of-day seasonal component first — baseline = per
# (event_type, hour-of-day) exact median — and flags residuals
# beyond 3 robust sigmas, with sigma = MAD of the residuals in the
# same seasonal cell (robust to the very outliers being hunted).
# --------------------------------------------------------------------------


@register(
    "seasonal_residual_anomalies",
    sql="""
    WITH v AS (
        SELECT event_type, hour(ts) AS hod, value
        FROM events WHERE value IS NOT NULL
    ),
    base AS (
        SELECT event_type, hod,
               quantile_cont(value, 0.5) AS med
        FROM v GROUP BY event_type, hod
    ),
    r AS (
        SELECT v.event_type, v.hod, v.value - base.med AS resid
        FROM v JOIN base USING (event_type, hod)
    ),
    mad AS (
        SELECT event_type, hod,
               quantile_cont(abs(resid), 0.5) AS mad
        FROM r GROUP BY event_type, hod
    )
    SELECT r.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(CASE WHEN abs(r.resid) > 3 * mad.mad
                           AND mad.mad > 0 THEN 1 END) AS BIGINT)
               AS n_anomalies,
           ROUND(MAX(abs(r.resid)), 6) AS max_abs_resid
    FROM r JOIN mad USING (event_type, hod)
    GROUP BY r.event_type
    ORDER BY r.event_type
    """,
    tags=("stats", "anomaly", "seasonal", "robust"),
)
def seasonal_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: how many values sit more than 3 robust sigmas
    from their SEASONAL baseline (the exact median of the same
    (event_type, hour-of-day) cell), with sigma = the cell's MAD.
    Both medians are exact interpolated percentiles — the identical
    IEEE expression both engines implement, the same parity
    order_price_quartiles banks — so the anomaly flags agree bit for
    bit. Scale shape: two grouped exact-percentile aggregates over
    ≤ types x 24 cells, two broadcast joins of those cell tables —
    the events scan happens twice, nothing else is data-sized."""
    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.hour("ts").alias("hod"), "value")
    )
    base = e.groupBy("event_type", "hod").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    r = e.join(F.broadcast(base), ["event_type", "hod"]).select(
        "event_type", "hod", (F.col("value") - F.col("med")).alias("resid")
    )
    mad = r.groupBy("event_type", "hod").agg(
        F.percentile(F.abs(F.col("resid")), F.lit(0.5)).alias("mad")
    )
    return (
        r.join(F.broadcast(mad), ["event_type", "hod"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(
                F.when(
                    (F.abs(F.col("resid")) > 3 * F.col("mad"))
                    & (F.col("mad") > 0),
                    1,
                )
            ).alias("n_anomalies"),
            F.round(F.max(F.abs(F.col("resid"))), 6).alias("max_abs_resid"),
        )
        .orderBy("event_type")
    )
