"""Empty-input totality: every core operator must return an empty,
correctly-typed frame on empty input — never throw. At 100 TB,
"empty" happens constantly (a partition-pruned read, a filter that
matched nothing, a cold-start stream) and an operator that dies on it
kills the whole job."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty_like(spark, sf_dir, name):
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, name)
    return df.filter(F.lit(False))


SF = "/root/testdata/sf0.001"


def test_dedup_and_text_ops_on_empty_corpus(spark):
    from elb_log_etl_enrichment_spark.operators.dedup import exact_dedup
    from elb_log_etl_enrichment_spark.operators.text_dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash,
        simhash_near_dup,
    )

    d = _empty_like(spark, SF, "documents")
    assert exact_dedup(d, ["text"], "doc_id").count() == 0
    assert simhash(d).count() == 0
    assert simhash_near_dup(d).count() == 0
    assert minhash_lsh_pairs(d).count() == 0
    assert ngram_jaccard_pairs(d).count() == 0


def test_window_ops_on_empty_events(spark):
    from elb_log_etl_enrichment_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
    )
    from elb_log_etl_enrichment_spark.operators.grouped import (
        cogroup_user_activity,
        zscore_outliers,
    )

    e = _empty_like(spark, SF, "events")
    o = _empty_like(spark, SF, "orders")
    assert zscore_outliers(e).count() == 0
    assert cogroup_user_activity(e, o).count() == 0
    for fn in (asof_join_backward, asof_join_forward):
        assert (
            fn(
                e.select("event_id", "user_id", "ts"),
                o,
                left_on="user_id",
                right_on="o_custkey",
                left_time="ts",
                right_time="o_orderdate",
                payload_cols=["o_orderkey"],
            ).count()
            == 0
        )


def test_graph_on_empty_edges(spark):
    """Isolated nodes with NO edges: every node is its own cluster."""
    from elb_log_etl_enrichment_spark.operators.graph import (
        cluster_sizes,
        connected_components,
    )

    nodes = spark.range(5).withColumnRenamed("id", "doc_id")
    edges = (
        spark.range(0)
        .select(F.col("id").alias("doc_a"), F.col("id").alias("doc_b"))
    )
    labels = connected_components(
        nodes, edges, id_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    sizes = {r.cluster_size for r in cluster_sizes(labels).collect()}
    assert labels.count() == 5
    assert sizes == {1}


def test_round2_operators_on_empty_inputs(spark, tmp_path):
    """Round-2 operators: bloom/CMS/entropy/BPE/salted-join totality on
    an empty corpus (registry queries read parquet, so an empty typed
    documents table is written to disk)."""
    from elb_log_etl_enrichment_spark.operators.bpe import bpe_train
    from elb_log_etl_enrichment_spark.operators.skew import salted_join
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries

    all_queries()
    _empty_like(spark, SF, "documents").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    # single-row summaries stay single-row with zero counts; per-group
    # outputs are empty
    bloom = REGISTRY["bloom_decontamination_audit"].fn(spark, str(tmp_path)).collect()
    assert len(bloom) == 1 and bloom[0]["probes"] == 0
    assert REGISTRY["count_min_sketch_audit"].fn(spark, str(tmp_path)).count() == 0
    assert REGISTRY["token_entropy_quality"].fn(spark, str(tmp_path)).count() == 0
    bpe = REGISTRY["bpe_merge_table"].fn(spark, str(tmp_path)).collect()
    # empty corpus: zero merges is a LEGAL early stop (pair
    # exhaustion), so the engine-verified contract flag is 1
    # (ADVICE r8 — the old raw n_merges column pinned a literal 12
    # in the oracle and mismatched on degenerate corpora)
    assert len(bpe) == 1 and bpe[0]["n_merges_ok"] == 1
    assert bpe[0]["first_left"] is None
    assert bpe[0]["n_initial_pairs"] == 0
    assert bpe[0]["total_adjacent_pairs"] == 0

    words = spark.createDataFrame([], "word string, cnt long")
    assert bpe_train(words, n_merges=3) == []
    assert bpe_train(words, n_merges=3, driver_vocab_limit=0) == []

    e = _empty_like(spark, SF, "events").select("user_id", "value")
    c = spark.createDataFrame([(1, "A")], "user_id long, c_mktsegment string")
    assert salted_join(e, c, on=["user_id"]).count() == 0


def test_round2b_operators_on_empty_inputs(spark, tmp_path):
    """Span coverage, split/padding/ingest audits, BPE encode, the
    truncation audit, and ALL trained-ANN paths must be total on an
    empty corpus — an index over nothing serves nothing, it must not
    crash the job."""
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries

    all_queries()
    _empty_like(spark, SF, "documents").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    _empty_like(spark, SF, "embeddings").write.parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    for name in (
        "duplicated_span_coverage",
        "leakage_safe_split_audit",
        "padding_waste_audit",
        "incremental_ingest_dedup",
        "bpe_encode_stats",
        "dim_truncation_recall",
    ):
        out = REGISTRY[name].fn(spark, str(tmp_path))
        assert out.count() == 0, name
    # the ANN recall audits (r7 oracle promotion) keep their one
    # summary row on an empty corpus — 0 queries, 0/0 recall passes —
    # matching their oracle's unconditional aggregate; the neighbor
    # frames themselves stay empty
    from elb_log_etl_enrichment_spark.plans import queries_ext as qx

    for name in ("cosine_topk_ivf", "cosine_topk_pq", "cosine_topk_ivfpq"):
        row = REGISTRY[name].fn(spark, str(tmp_path)).collect()
        assert len(row) == 1 and row[0].n_queries == 0, name
        assert row[0].recall_ok == 1, name
    for detail in (
        qx.cosine_topk_ivf_detail,
        qx.cosine_topk_pq_detail,
        qx.cosine_topk_ivfpq_detail,
    ):
        assert detail(spark, str(tmp_path)).count() == 0


def test_round2c_operators_on_empty_inputs(spark, tmp_path):
    """Geo tier, PMI, capstone, contracts, hints, drift union: total on
    empty inputs (empty typed tables written for every table the
    queries touch)."""
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries

    all_queries()
    for t in ("documents", "events", "orders", "lineitem", "customer", "nation"):
        _empty_like(spark, SF, t).write.parquet(f"{tmp_path}/{t}.parquet")
    # summary queries keep their summary rows; per-group outputs empty
    for name, expect in (
        ("geo_cell_density", 0),
        ("nearest_dc_assignment", 0),
        ("geo_hotspot_clusters", 0),
        ("pmi_collocations", 0),
        ("training_export_pipeline", 0),
        ("schema_drift_union_stats", 0),
        ("lateral_top2_customers", 0),
        ("hinted_join_strategies", 0),
        ("expectations_audit", 9),  # every rule still reports, all pass
        # NOTE engine divergence on empty input: Spark's cube() emits NO
        # grand-total row over an empty frame (DuckDB's GROUP BY CUBE
        # emits the () grouping set with count 0). Harmless at the
        # oracle gate (sf0.01 is non-empty) but worth pinning.
        ("cube_status_priority", 0),
    ):
        out = REGISTRY[name].fn(spark, str(tmp_path)).collect()
        assert len(out) == expect, (name, len(out))
    ex = {r["name"]: r["pass"] for r in
          REGISTRY["expectations_audit"].fn(spark, str(tmp_path)).collect()}
    assert all(ex.values())


def test_sampling_privacy_jsonl_on_empty_inputs(spark, tmp_path):
    """Round-5 tiers (deterministic sampling, privacy, JSONL
    round-trip): total on empty inputs. Global-aggregate audits keep
    their single summary row (with NULL extrema); per-group/row
    outputs are empty."""
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries

    all_queries()
    for t in ("orders", "customer", "nation", "events", "lineitem", "embeddings"):
        _empty_like(spark, SF, t).write.parquet(f"{tmp_path}/{t}.parquet")
    for name, expect in (
        ("deterministic_uniform_sample", 0),
        ("stratified_sample_audit", 0),
        ("leakproof_customer_split", 0),
        ("per_nation_deterministic_sample", 0),
        ("pii_redaction_audit", 0),
        ("k_anonymity_audit", 1),  # one summary row, n_groups=0
        ("jsonl_roundtrip_stats", 0),
        ("snapshot_diff_orders", 0),
        ("format_matrix_roundtrip", 0),
        ("incremental_hourly_rollup", 0),
        ("partition_backfill_stats", 0),
        ("bucketed_join_agg", 0),
        # statistical monitoring / experimentation tier
        ("ab_welch_ttest", 0),
        ("cuped_adjusted_lift", 0),
        ("ewma_control_chart", 0),
        ("cusum_changepoint", 0),
        ("seasonal_naive_backtest", 0),
        ("benford_first_digit_audit", 0),
        ("pareto_concentration", 0),
        ("user_survival_curve", 0),
        ("gini_concentration", 0),
        ("embedding_dim_profile", 0),
        # r7 oracle promotion: the PCA audit keeps its one summary row
        # (vacuous flags) on an empty corpus, like its oracle's
        # unconditional aggregate
        ("embedding_pca_variance", 1),
        ("ols_order_value_regression", 0),
        ("lpa_communities", 0),
        ("value_drift_audit", 0),
        ("multi_horizon_backtest", 0),
    ):
        out = REGISTRY[name].fn(spark, str(tmp_path)).collect()
        assert len(out) == expect, (name, len(out))
    k = REGISTRY["k_anonymity_audit"].fn(spark, str(tmp_path)).collect()[0]
    assert k.n_groups == 0 and k.n_small_groups == 0


def test_streaming_queries_on_empty_events(spark, tmp_path):
    """Streaming tier totality: a cold-start stream over an empty (but
    schema-bearing) events table must terminate cleanly with zero
    rows — no watermark, join-state, or session-window code path may
    assume a non-empty first batch."""
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries

    all_queries()
    _empty_like(spark, SF, "events").write.parquet(f"{tmp_path}/events.parquet")
    for name in (
        "streaming_hourly_counts",
        "streaming_sessionize_events",
        "streaming_view_purchase_outer",
        "streaming_timeout_sessions",
    ):
        out = REGISTRY[name].fn(spark, str(tmp_path))
        assert out.count() == 0, name


def test_round3_queries_on_empty_inputs(spark, tmp_path):
    """Round-3 additions: total on empty inputs. The battery and
    funnel keep zero rows (no docs → no rules evaluated, no sources);
    the revenue aggregate keeps its single summary row with NULL sum."""
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries

    all_queries()
    for t in ("orders", "customer", "lineitem", "part", "documents"):
        _empty_like(spark, SF, t).write.parquet(f"{tmp_path}/{t}.parquet")
    for name, expect in (
        ("large_volume_customers", 0),
        ("disjunctive_bracket_revenue", 1),  # global agg summary row
        ("gopher_quality_battery", 6),       # 6 rules, all zero counts
        ("source_mixing_weights", 0),
        ("curation_funnel_by_source", 0),
        ("vocab_growth_audit_approx", 0),
    ):
        out = REGISTRY[name].fn(spark, str(tmp_path)).collect()
        assert len(out) == expect, (name, len(out))
    g = {r.rule: r.n_violations for r in
         REGISTRY["gopher_quality_battery"].fn(spark, str(tmp_path)).collect()}
    assert set(g.values()) == {0}


def test_simhash_weighted_empty_and_tokenless(spark):
    """Empty corpus and token-less documents must yield typed empty
    signature/pair frames (token-less docs have no vote and drop from
    the signature table in BOTH engines — explode and unnest agree)."""
    from pyspark.sql import Row

    from elb_log_etl_enrichment_spark.operators.text_dedup import (
        simhash_block_pairs,
        simhash_weighted,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert simhash_weighted(empty).count() == 0
    assert simhash_block_pairs(simhash_weighted(empty)).count() == 0
    tokenless = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text=None)],
        schema="doc_id long, text string",
    )
    assert simhash_weighted(tokenless).count() == 0


def test_histogram_narrow_empty_and_all_ties(spark):
    """Empty input narrows to an empty bucket (no crash); an all-ties
    frame cannot shrink but the residual rank stays valid and the
    distinct-value collapse bounds the final window to ONE row."""
    from pyspark.sql import functions as F

    from elb_log_etl_enrichment_spark.plans.queries_stats import histogram_narrow

    empty = spark.createDataFrame([], "value double")
    k0 = empty.agg(F.expr("(count(*) + 1) div 2").alias("k"))
    bucket, k = histogram_narrow(empty, k0)
    assert bucket.count() == 0 and k.count() == 0

    ties = spark.range(1000).select(F.lit(7.5).alias("value"))
    kt = ties.agg(F.expr("(count(*) + 1) div 2").alias("k"))
    bucket, k = histogram_narrow(ties, kt)
    assert bucket.count() == 1000  # cannot shrink: one shared bucket
    assert k.first().k == 500  # rank still valid
    assert bucket.select("value").distinct().count() == 1  # window sees 1 row
