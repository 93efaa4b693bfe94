"""Ground-truth + plan-shape tests for the physical-layout /
cost-estimation tier (plans/queries_layout.py). The DuckDB oracle
differential (test_oracle.py) proves Spark == DuckDB; these tests
prove the shared algorithm is RIGHT, against hand-computed answers
and structural properties that a bug in both engines couldn't fake.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from elb_log_etl_enrichment_spark.plans.audit import plan_text

SF = "/root/testdata/sf0.001"


def _q(spark, name, sf=SF):
    from elb_log_etl_enrichment_spark.plans.queries import (
        REGISTRY,
        _load_extensions,
    )

    _load_extensions()
    return REGISTRY[name].fn(spark, sf)


# --------------------------------------------------------------------------
# Morton spread: the 4-round shift/mask must equal bit interleaving
# --------------------------------------------------------------------------


def _py_spread16(x: int) -> int:
    return sum(((x >> i) & 1) << (2 * i) for i in range(16))


def test_spread16_matches_python_bit_interleave(spark):
    from elb_log_etl_enrichment_spark.plans.queries_layout import _spread16

    vals = [0, 1, 2, 3, 0xFF, 0x100, 0xABCD, 0xFFFF, 54321]
    df = spark.createDataFrame([(v,) for v in vals], "x long").select(
        "x", _spread16(F.col("x")).alias("s")
    )
    for r in df.collect():
        assert r.s == _py_spread16(r.x), (r.x, r.s)


def test_zorder_buckets_bound_both_dims(spark):
    """The whole point of z-ordering: z buckets have small spans on
    BOTH columns, while the date-sorted layout leaves the custkey
    span at ~the full domain. Checked against the audit's own
    numbers at sf0.001."""
    rows = {r.layout: r for r in _q(spark, "zorder_layout_audit").collect()}
    z, d = rows["zorder"], rows["date_sorted"]
    assert z.n_rows == d.n_rows  # both arms cover every order
    # date-sorted: near-zero date span, near-total custkey span
    assert d.avg_date_span_bp < 1000
    assert d.avg_cust_span_bp > 8000
    # zorder: materially bounded on BOTH dimensions
    assert z.avg_cust_span_bp < d.avg_cust_span_bp / 2
    assert z.avg_date_span_bp < 5000


def test_zorder_plan_has_no_global_sort_or_window(spark):
    txt = plan_text(_q(spark, "zorder_layout_audit"))
    assert "Window" not in txt
    # the only sort allowed is the final 2-row presentation orderBy
    assert txt.count("Sort ") <= 1


# --------------------------------------------------------------------------
# Compaction planner: hand-computed greedy packing
# --------------------------------------------------------------------------


def test_binpack_matches_hand_greedy(spark, tmp_path):
    from elb_log_etl_enrichment_spark.plans.queries_layout import (
        _COMPACT_TARGET,
    )

    # file sizes chosen to straddle the 512-row target awkwardly
    sizes = [100, 500, 10, 400, 512, 1, 700, 50]
    rows = []
    eid = 0
    for i, sz in enumerate(sizes):
        base = dt.datetime(2024, 3, 1, i)
        for j in range(sz):
            rows.append(
                Row(
                    event_id=eid,
                    ts=base + dt.timedelta(seconds=j % 3600),
                    user_id=1,
                    event_type="view",
                    value=1.0,
                    props="{}",
                )
            )
            eid += 1
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    got = {
        r.bin: (r.n_files, r.total_rows)
        for r in _q(spark, "compaction_binpack_plan", str(tmp_path)).collect()
    }
    # hand-run the same greedy rule
    expect: dict[int, list[int]] = {}
    cum = 0
    for sz in sizes:
        b = cum // _COMPACT_TARGET
        expect.setdefault(b, []).append(sz)
        cum += sz
    assert got == {b: (len(v), sum(v)) for b, v in expect.items()}
    # packing preserves order — every file lands in exactly one bin
    assert sum(n for n, _ in got.values()) == len(sizes)


def test_histogram_quantiles_known_uniform(spark, tmp_path):
    """64 distinct values, one per bin → p50 crosses at bin 31,
    p90 at bin 57 (first cum with c*10 >= 9*n)."""
    rows = [
        Row(
            event_id=i,
            ts=dt.datetime(2024, 3, 1, i % 24, i // 24, 0),
            user_id=1,
            event_type="view",
            value=float(i),
            props="{}",
        )
        for i in range(64)
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    out = _q(spark, "mergeable_histogram_quantiles", str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 64
    assert r.p50_bin == 31
    assert r.p90_bin == 57
    # edge = lo + bin*(hi-lo)/64 with lo=0, hi=63
    assert abs(r.p50_edge - 31 * 63 / 64) < 1e-6


def test_histogram_merge_is_algebraic(spark):
    """Merging hour partials then taking quantiles must equal
    skipping the hour level entirely — the defining property of a
    mergeable state. Rebuild day-level bins directly and compare."""
    merged = {
        (r.day, r.p50_bin, r.p90_bin)
        for r in _q(spark, "mergeable_histogram_quantiles").collect()
    }
    # direct day-level build (no hourly stage) via plain Spark
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    e = load_table(spark, SF, "events").filter(F.col("value").isNotNull())
    b = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi")).collect()[0]
    direct = (
        e.select(
            F.date_trunc("day", "ts").alias("day"),
            F.least(
                F.floor((F.col("value") - b.lo) / (b.hi - b.lo) * 64).cast(
                    "long"
                ),
                F.lit(63).cast("long"),
            ).alias("bin"),
        )
        .groupBy("day", "bin")
        .count()
        .collect()
    )
    import collections

    per_day: dict = collections.defaultdict(dict)
    for r in direct:
        per_day[r.day][r.bin] = r["count"]
    expect = set()
    for day, bins in per_day.items():
        n = sum(bins.values())
        c = 0
        p50 = p90 = None
        for bin_ in sorted(bins):
            c += bins[bin_]
            if p50 is None and c * 2 >= n:
                p50 = bin_
            if p90 is None and c * 10 >= 9 * n:
                p90 = bin_
        expect.add((day, p50, p90))
    assert merged == expect


# --------------------------------------------------------------------------
# Join cardinality: estimator invariants + accuracy at sf0.01
# --------------------------------------------------------------------------


def test_cardinality_estimate_invariants(spark):
    r = _q(spark, "join_cardinality_estimate").collect()[0]
    assert r.est_rows % 100 == 0  # scale-up factor is 100
    assert r.actual_rows > 0
    assert (r.abs_err_bp is None) == (r.actual_rows == 0)


def test_cardinality_estimate_accuracy_sf001(spark):
    """Deterministic md5 stratum → this is a fixed number, not a
    flaky draw: at sf0.01 (~150 sampled keys) the estimate must land
    within 3x of the true cardinality."""
    r = _q(
        spark, "join_cardinality_estimate", "/root/testdata/sf0.01"
    ).collect()[0]
    assert r.actual_rows > 0
    assert r.actual_rows / 3 <= r.est_rows <= r.actual_rows * 3, (
        r.est_rows,
        r.actual_rows,
    )


# --------------------------------------------------------------------------
# Chi-square: hand-computed 2x2-ish contingency
# --------------------------------------------------------------------------


def test_chi_square_cells_match_hand_computation(spark, tmp_path):
    # two event types, two weekdays, imbalanced: contingency
    #   view:     Mon=30  Tue=10
    #   purchase: Mon=10  Tue=30
    counts = {("view", 0): 30, ("view", 1): 10,
              ("purchase", 0): 10, ("purchase", 1): 30}
    # 2024-03-04 is a Monday; +1 day = Tuesday
    rows = []
    eid = 0
    for (etype, day), n in counts.items():
        for _ in range(n):
            rows.append(
                Row(
                    event_id=eid,
                    ts=dt.datetime(2024, 3, 4 + day, 12, 0, 0),
                    user_id=1,
                    event_type=etype,
                    value=1.0,
                    props="{}",
                )
            )
            eid += 1
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    out = {
        (r.event_type, r.dow): r
        for r in _q(spark, "chi_square_independence", str(tmp_path)).collect()
    }
    n = 80
    for (etype, day), obs in counts.items():
        rt = 40  # both event types total 40
        ct = 40  # both days total 40
        exp = rt * ct / n  # = 20
        cell = out[(etype, day)]
        assert cell.observed == obs
        assert cell.expected_milli == int(rt * ct * 1000 // n)
        assert abs(cell.chi2_part - (obs - exp) ** 2 / exp) < 1e-6
    # hand chi2 total: 4 cells x (10^2/20) = 20
    assert abs(sum(c.chi2_part for c in out.values()) - 20.0) < 1e-6


# --------------------------------------------------------------------------
# Temporal embargo split: hand-built timeline
# --------------------------------------------------------------------------


def test_embargo_split_hand_timeline(spark, tmp_path):
    """10 days of data, one event/user/day: cut at day 8 (80%),
    embargo eats day 9 events within 24h of the cut."""
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    for d in range(11):  # days 0..10 → span = 10 days, cut at day 8
        for u in (1, 2):
            rows.append(
                Row(
                    event_id=d * 10 + u,
                    ts=t0 + dt.timedelta(days=d),
                    user_id=u,
                    event_type="view",
                    value=1.0,
                    props="{}",
                )
            )
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    r = _q(
        spark, "temporal_embargo_split_audit", str(tmp_path)
    ).collect()[0]
    # days 0..8 inclusive → train (cut = day 8 exactly); day 9 is
    # exactly cut+24h → embargo (<=); day 10 → test
    assert r.n_train == 18
    assert r.n_embargo_dropped == 2
    assert r.n_test == 2
    assert r.gap_ok == 1  # realized gap = 2 days > 1-day embargo
    assert r.users_in_both == 2


def test_round3b_queries_on_empty_inputs(spark, tmp_path):
    """Layout tier totality on empty inputs."""
    from pyspark.sql import functions as F

    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    all_queries()
    for t in ("orders", "lineitem", "events"):
        load_table(spark, SF, t).filter(F.lit(False)).write.parquet(
            f"{tmp_path}/{t}.parquet"
        )
    for name, expect in (
        ("zorder_layout_audit", 0),
        ("compaction_binpack_plan", 0),
        ("mergeable_histogram_quantiles", 0),
        ("chi_square_independence", 0),
        ("join_cardinality_estimate", 1),   # 0-est / 0-actual summary row
        ("temporal_embargo_split_audit", 1),  # all-zero audit row
        ("write_audit_publish_stats", 1),   # zero row, vacuous proofs
    ):
        out = REGISTRY[name].fn(spark, str(tmp_path)).collect()
        assert len(out) == expect, (name, len(out))
    card = REGISTRY["join_cardinality_estimate"].fn(spark, str(tmp_path)).collect()[0]
    assert card.est_rows == 0 and card.actual_rows == 0
    assert card.abs_err_bp is None


def test_parquet_footer_stats_matches_duckdb_metadata(spark):
    """Local differential for the path-addressed footer DETAIL frame
    (the registered query is the view-recomputable audit): every cell
    must equal DuckDB's parquet_metadata() aggregated the same way
    over the same files."""
    import duckdb

    from elb_log_etl_enrichment_spark.plans.queries_layout import (
        parquet_footer_stats_detail,
    )

    got = {
        r.column_name: (
            r.n_row_groups,
            r.compressed_bytes,
            r.uncompressed_bytes,
            r.n_values,
            r.n_minmax,
        )
        for r in parquet_footer_stats_detail(spark, SF).collect()
    }
    exp = {
        row[0]: tuple(int(v) for v in row[1:])
        for row in duckdb.sql(
            f"""
            SELECT path_in_schema,
                   COUNT(*),
                   SUM(total_compressed_size),
                   SUM(total_uncompressed_size),
                   SUM(num_values),
                   COUNT(stats_min_value)
            FROM parquet_metadata('{SF}/lineitem.parquet')
            GROUP BY 1
            """
        ).fetchall()
    }
    assert got == exp


def test_parquet_footer_stats_total_on_missing_table(spark, tmp_path):
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries
    from elb_log_etl_enrichment_spark.plans.queries_layout import (
        parquet_footer_stats_detail,
    )

    detail = parquet_footer_stats_detail(spark, str(tmp_path))
    assert detail.count() == 0
    assert "compression_ratio_bp" in detail.columns

    all_queries()
    row = REGISTRY["parquet_footer_stats"].fn(spark, str(tmp_path)).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_rows == 0 and r.n_columns == 0
    assert r.values_complete_ok == 1 and r.footer_minmax_ok == 1


def test_parquet_footer_audit_flags_on_real_data(spark):
    """The registered audit must find truthful footers on the real
    testdata (flags 1, counts matching a direct read)."""
    import pyarrow.parquet as pq

    r = _q(spark, "parquet_footer_stats").collect()[0]
    md = pq.ParquetFile(f"{SF}/lineitem.parquet")
    assert r.n_rows == md.metadata.num_rows
    assert r.n_columns == len(md.schema_arrow.names)
    assert r.values_complete_ok == 1
    assert r.footer_minmax_ok == 1


def test_feature_hashing_matches_python_md5(spark, tmp_path):
    """Hand-computed hashing trick on a tiny corpus: bucket and sign
    derive from the same md5 prefixes in pure Python."""
    import hashlib

    docs = [
        (0, "alpha beta alpha!"),
        (1, "Beta GAMMA, beta"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")

    def h(prefix, tok):
        return int(hashlib.md5((prefix + tok).encode()).hexdigest()[:15], 16)

    import re

    expect: dict = {}
    for doc_id, text in docs:
        for tok in re.findall(r"[a-z0-9]+", text.lower()):
            b = h("fh|", tok) % 64
            s = 1 if h("sg|", tok) % 2 == 0 else -1
            w, n = expect.get((doc_id, b), (0, 0))
            expect[(doc_id, b)] = (w + s, n + 1)
    expect = {k: v for k, v in expect.items() if v[0] != 0}
    got = {
        (r.doc_id, r.bucket): (r.weight, r.n_tokens)
        for r in _q(spark, "feature_hashing_vectors", str(tmp_path)).collect()
    }
    assert got == expect


def test_streaming_wap_total_on_empty_events(spark, tmp_path):
    """Cold-start totality: an empty events table drains an empty (or
    zero) batch set, publishes nothing, and still returns the typed
    all-zero summary row with both exactly-once proofs vacuously
    true."""
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    all_queries()
    load_table(spark, SF, "events").filter(F.lit(False)).write.parquet(
        f"{tmp_path}/events.parquet"
    )
    rows = REGISTRY["streaming_wap_publish_stats"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_rows == 0
    assert r.restart_published_nothing == 1
    assert r.republish_noop == 1


def test_segment_reconcile_flags_exactly_corrupted_segments(spark):
    """Ground truth independent of the SQL oracle: a segment must
    mismatch IFF it contains a mutated or dropped key — no false
    alarms, no missed corruption."""
    from pyspark.sql import functions as F

    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries
    from elb_log_etl_enrichment_spark.plans.queries_profiling import (
        _RECON_DROP_LO,
        _RECON_MUT_BP,
        _RECON_SEGMENTS,
    )
    from elb_log_etl_enrichment_spark.plans.queries_sampling import hash_bucket
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    all_queries()
    sf = "/root/testdata/sf0.01"
    got_bad = {
        r.seg
        for r in REGISTRY["segment_digest_reconcile"].fn(spark, sf).collect()
        if r.segment_match == 0
    }
    o = load_table(spark, sf, "orders")
    corrupted = (
        o.select(
            (hash_bucket(F.col("o_orderkey"), "seg|") % _RECON_SEGMENTS).alias(
                "seg"
            ),
            (
                (hash_bucket(F.col("o_orderkey"), "mut|") < _RECON_MUT_BP)
                | (hash_bucket(F.col("o_orderkey"), "drop|") >= _RECON_DROP_LO)
            ).alias("bad"),
        )
        .filter("bad")
        .select("seg")
        .distinct()
        .collect()
    )
    expect_bad = {r.seg for r in corrupted}
    assert got_bad == expect_bad
    assert 0 < len(expect_bad) < _RECON_SEGMENTS  # corruption is sparse
