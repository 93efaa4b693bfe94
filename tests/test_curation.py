"""Curation-tier semantics on hand-built corpora + the plan
properties that matter at scale (test-set broadcast, digest-only
shuffles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from elb_log_etl_enrichment_spark.plans.audit import plan_stats


def _q(name):
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries

    all_queries()
    return REGISTRY[name].fn


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_chunk_dedup_counts_cross_doc_duplicates(spark, tmp_path):
    # doc0 and doc1 share their first 8-token chunk; doc2 is unique
    shared = "a b c d e f g h"
    _docs(
        spark,
        [
            (shared + " x1 x2 x3 x4 x5 x6 x7 x8", "en", "s"),
            (shared + " y1 y2 y3 y4 y5 y6 y7 y8", "en", "s"),
            ("z1 z2 z3 z4 z5 z6 z7 z8", "en", "s"),
        ],
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = _q("chunk_dedup_stats")(spark, str(tmp_path)).collect()[0]
    assert out["n_docs"] == 3 and out["total_chunks"] == 5
    assert out["dup_chunks"] == 2  # the shared chunk, once per doc
    assert out["fully_clean_docs"] == 1


def test_token_budget_topp_integer_cut(spark, tmp_path):
    # lang en: chars 50, 30, 20 (total 100); keep while 5*prev < 3*100:
    # doc a (prev 0), doc b (prev 50, 250<300 keep), doc c (prev 80, drop)
    _docs(
        spark,
        [("a" * 50, "en", "s"), ("b" * 30, "en", "s"), ("c" * 20, "en", "s")],
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = _q("token_budget_topp")(spark, str(tmp_path)).collect()[0]
    assert out["kept_docs"] == 2 and out["kept_chars"] == 80
    assert out["kept_frac"] == 0.8


def test_unigram_logprob_uniform_corpus_is_flat(spark, tmp_path):
    # every token equally frequent -> every doc scores exactly log2(V)
    _docs(
        spark,
        [("aa bb", "en", "s"), ("cc dd", "en", "s")],
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = _q("unigram_logprob_quality")(spark, str(tmp_path)).collect()[0]
    assert out["avg_bits"] == out["min_bits"] == out["max_bits"] == 2.0


def test_decontamination_broadcasts_test_set(spark):
    df = _q("decontamination_overlap")(spark, "/root/testdata/sf0.001")
    stats = plan_stats(df)
    assert stats["broadcast_joins"] >= 1
    row = df.collect()[0]
    # the synthetic corpus's tiny vocabulary guarantees real overlap
    assert 0 < row["n_contaminated_docs"] <= row["n_train_docs"]
    assert row["total_hits"] >= row["n_contaminated_docs"]


def test_bloom_decontamination_no_false_negatives(spark):
    """Bloom contract: candidates are a SUPERSET of exact hits (zero
    false negatives by construction), the filter broadcasts, and at
    2^20 bits / k=4 the realized FP rate on this corpus stays tiny."""
    df = _q("bloom_decontamination_audit")(spark, "/root/testdata/sf0.001")
    stats = plan_stats(df)
    assert stats["broadcast_joins"] >= 1
    row = df.collect()[0]
    assert row["bloom_pos_probes"] >= row["exact_pos_probes"] > 0
    assert row["flagged_docs_bloom"] >= row["flagged_docs_exact"]
    assert (
        row["false_pos_probes"]
        == row["bloom_pos_probes"] - row["exact_pos_probes"]
    )
    assert row["fp_rate"] <= 0.05


def test_bloom_flags_planted_contamination(spark, tmp_path):
    """A train document sharing a 3-gram with a test document must be
    bloom-flagged; md5-prefix split buckets are chosen by trial
    strings so the fixture controls which side each doc lands on."""
    import hashlib

    def side(text):
        return hashlib.md5(text.encode()).hexdigest()[0] > "c"

    # find one test-side and two train-side texts deterministically
    shared = "alpha beta gamma"
    test_text = train_hit = train_clean = None
    for i in range(200):
        cand = f"{shared} tdoc{i}"
        if side(cand):
            test_text = test_text or cand
        else:
            train_hit = train_hit or cand
        clean = f"delta epsilon zeta udoc{i}"
        if not side(clean):
            train_clean = train_clean or clean
        if test_text and train_hit and train_clean:
            break
    assert test_text and train_hit and train_clean
    _docs(
        spark,
        [(test_text, "en", "s"), (train_hit, "en", "s"), (train_clean, "en", "s")],
    ).write.parquet(f"{tmp_path}/documents.parquet")
    row = _q("bloom_decontamination_audit")(spark, str(tmp_path)).collect()[0]
    assert row["n_train_docs"] == 2
    assert row["flagged_docs_exact"] == 1
    assert row["flagged_docs_bloom"] >= 1


def test_token_entropy_known_values(spark, tmp_path):
    """Closed-form checks: a constant doc has entropy 0 (flagged low),
    a uniform 4-token doc has exactly log2(4) = 2.0 (not flagged —
    threshold is strict <)."""
    _docs(
        spark,
        [
            ("a a a a a a", "const", "s"),
            ("w x y z", "unif", "s"),
        ],
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["lang"]: r
        for r in _q("token_entropy_quality")(spark, str(tmp_path)).collect()
    }
    assert rows["const"]["avg_entropy"] == 0.0
    assert rows["const"]["n_low_entropy"] == 1
    assert rows["unif"]["avg_entropy"] == 2.0
    assert rows["unif"]["n_low_entropy"] == 0


def test_count_min_sketch_never_undercounts(spark):
    """CMS one-sided error: collisions only ADD, so the estimate can
    never be below the exact count."""
    rows = _q("count_min_sketch_audit")(spark, "/root/testdata/sf0.001").collect()
    assert rows, "top-k must be non-empty"
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)


def test_naive_bayes_perfectly_separates_disjoint_vocab(spark, tmp_path):
    """Sanity on a separable fixture: two languages with disjoint
    vocabularies must classify in-sample with a perfect diagonal."""
    _docs(
        spark,
        [
            ("aaa bbb aaa ccc", "xx", "s"),
            ("bbb aaa aaa", "xx", "s"),
            ("zzz yyy zzz", "yy", "s"),
            ("yyy zzz yyy yyy", "yy", "s"),
        ],
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = _q("naive_bayes_langid_confusion")(spark, str(tmp_path)).collect()
    got = {(r["actual_lang"], r["pred_lang"]): r["n"] for r in rows}
    assert got == {("xx", "xx"): 2, ("yy", "yy"): 2}


def test_vocab_growth_multi_quartile_curve(spark, tmp_path):
    """Fixture with vocabulary arriving in waves: each quartile (4
    docs -> 1 doc per quartile) introduces known new tokens."""
    _docs(
        spark,
        [
            ("a b", "en", "s"),          # Q1: a,b new
            ("a b c", "en", "s"),        # Q2: c new
            ("a c", "en", "s"),          # Q3: nothing new
            ("d e f", "en", "s"),        # Q4: d,e,f new
        ],
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["quartile"]: r
        for r in _q("vocab_growth_audit")(spark, str(tmp_path)).collect()
    }
    assert rows[1]["new_tokens"] == 2 and rows[1]["cum_vocab"] == 2
    assert rows[2]["new_tokens"] == 1 and rows[2]["cum_vocab"] == 3
    assert 3 not in rows  # no new vocabulary in Q3
    assert rows[4]["new_tokens"] == 3 and rows[4]["cum_vocab"] == 6


def test_duplicated_span_coverage_straddles_chunk_boundary(spark, tmp_path):
    """A repeated 8-token run placed at offset 4 in doc1 straddles the
    non-overlapping chunk grid — exactly the duplicate chunk_dedup_stats
    misses — and two overlapping duplicate windows must interval-merge
    into one span (union, not sum-of-windows)."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = [
        # doc0: shared run at offset 0 (16 tokens total)
        (shared + " a1 a2 a3 a4 a5 a6 a7 a8", "en", "s"),
        # doc1: shared run at offset 4 of 16 tokens — chunk grid splits it
        ("b1 b2 b3 b4 " + shared + " b5 b6 b7 b8", "en", "s"),
        # doc2: unique, and shorter than one window
        ("u1 u2 u3", "en", "s"),
        # doc3: SELF-repeat — "r1..r8 r1..r8" duplicates within one doc;
        # windows at start 0 and 8 share a digest, plus every window in
        # between pairs with its shifted twin? (no: interior windows mix
        # r-suffix+r-prefix and appear twice too — all 9 windows dup,
        # merging to one span covering all 16 tokens)
        ("r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8", "en", "s"),
    ]
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in _q("duplicated_span_coverage")(spark, str(tmp_path)).collect()
    }
    # doc0/doc1: exactly the one shared window each, covering 8 tokens
    assert rows[0]["n_dup_windows"] == 1 and rows[0]["covered_tokens"] == 8
    assert rows[1]["n_dup_windows"] == 1 and rows[1]["covered_tokens"] == 8
    assert rows[1]["dup_fraction"] == 0.5
    # doc2: below window width -> zero everything, still present
    assert rows[2]["n_dup_windows"] == 0 and rows[2]["covered_tokens"] == 0
    assert rows[2]["dup_fraction"] == 0.0
    # doc3 self-repeat: start-0 and start-8 windows are identical ("r1..r8");
    # every interior window w_i (i=1..7) equals... no other window, so dup
    # windows = {0, 8}, which merge-coverage = [0,7] ∪ [8,15] = 16 tokens
    # via two ADJACENT (non-overlapping) groups.
    assert rows[3]["n_dup_windows"] == 2 and rows[3]["covered_tokens"] == 16
    assert rows[3]["dup_fraction"] == 1.0


def test_duplicated_span_interval_union_not_window_sum(spark, tmp_path):
    """Three consecutive duplicate windows (starts 0,1,2 over a 10-token
    shared run) must merge to ONE 10-token span, not 3x8 tokens."""
    shared = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    docs = [(shared, "en", "s"), (shared + " z1 z2", "en", "s")]
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in _q("duplicated_span_coverage")(spark, str(tmp_path)).collect()
    }
    assert rows[0]["n_dup_windows"] == 3 and rows[0]["covered_tokens"] == 10
    assert rows[0]["dup_fraction"] == 1.0
    assert rows[1]["n_dup_windows"] == 3 and rows[1]["covered_tokens"] == 10
    assert rows[1]["dup_fraction"] == 0.833333


def test_leakage_safe_split_keeps_near_dups_together(spark, tmp_path):
    """Two near-identical docs whose TEXT hashes fall on opposite sides
    of the naive split boundary must still land in the SAME split under
    the cluster-granular rule, and the audit must report the naive
    tearing while proving safe_torn == 0."""
    import hashlib

    base = " ".join(f"w{i}" for i in range(40))
    # find a suffix word that flips the naive md5-nibble split of the
    # variant relative to the base (guaranteed to exist quickly)
    base_side = hashlib.md5(base.encode()).hexdigest()[0] <= "c"
    variant = None
    for k in range(200):
        cand = base + f" extra{k}"
        if (hashlib.md5(cand.encode()).hexdigest()[0] <= "c") != base_side:
            variant = cand
            break
    assert variant is not None
    docs = [base, variant, "zz1 zz2 zz3 zz4 zz5"]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = _q("leakage_safe_split_audit")(spark, str(tmp_path)).collect()
    assert sum(r["n_docs"] for r in out) == 3
    for r in out:
        assert r["safe_torn_clusters"] == 0
        assert r["naive_torn_clusters"] == 1  # exactly the planted pair


def test_incremental_ingest_classifies_all_three_ways(spark, tmp_path):
    """Planted corpus: doc 5 shares its 8-token prefix with history
    doc 1 (dup_of_history); docs 10 and 15 share a prefix unseen in
    history (one survivor ingested, one within-batch dup); doc 20 is
    fresh. doc_id % 5 == 0 defines the batch."""
    pre_a = "a1 a2 a3 a4 a5 a6 a7 a8"
    pre_b = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = {
        1: pre_a + " hist tail words here",      # history
        2: "h1 h2 h3 h4 h5 h6 h7 h8 other",      # history
        5: pre_a + " different continuation",    # batch: dup of history
        10: pre_b + " one continuation",          # batch: survivor
        15: pre_b + " another continuation",      # batch: within-batch dup
        20: "f1 f2 f3 f4 f5 f6 f7 f8 fresh",      # batch: fresh
    }
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = _q("incremental_ingest_dedup")(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_batch"] == 4
    assert r["n_dup_of_history"] == 1
    assert r["n_dup_within_batch"] == 1   # doc 15 (doc 10 is the survivor)
    assert r["n_ingested"] == 2           # docs 10 and 20


def test_incremental_ingest_history_probe_is_broadcast(spark):
    """The history side (the 100 TB index at scale) must be probed by
    a broadcast semi-join against the batch digest set — a
    SortMergeJoin would re-shuffle the whole index per ingest tick."""
    from elb_log_etl_enrichment_spark.plans.audit import plan_text
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries

    all_queries()
    plan = plan_text(
        REGISTRY["incremental_ingest_dedup"].fn(spark, "/root/testdata/sf0.001")
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_span_coverage_plan_is_digest_shuffled(spark):
    """duplicated_span_coverage's exchanges must carry (doc_id, start,
    digest) — never document text; the text column may appear only in
    the scan/project stage."""
    from elb_log_etl_enrichment_spark.plans.audit import plan_stats, plan_text
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries

    all_queries()
    df = REGISTRY["duplicated_span_coverage"].fn(spark, "/root/testdata/sf0.001")
    stats = plan_stats(df)
    # documents read twice (spans + per-doc join-back), nothing more
    assert stats["scans"] <= 2, stats
    plan = plan_text(df)
    # every Exchange's partitioning key is digest or doc_id, never text
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([a-zA-Z_#0-9]+)", plan):
        assert not m.group(1).startswith("text"), m.group(0)
