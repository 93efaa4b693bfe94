"""Training-export tier (plans/queries_training.py): plan-shape
guards plus the integer-exactness properties the packing/sharding
audits rely on. Value correctness is the oracle harness's job."""

from __future__ import annotations

from pyspark.sql import functions as F

from elb_log_etl_enrichment_spark.plans.audit import plan_stats, plan_text

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    from elb_log_etl_enrichment_spark.plans.queries import (
        REGISTRY,
        _load_extensions,
    )

    _load_extensions()
    return REGISTRY[name].fn(spark, SF)


def test_packing_window_and_agg_share_one_exchange(spark):
    # the running-total window and the per-source aggregate both
    # partition on source — the plan must not shuffle twice
    stats = plan_stats(_q(spark, "sequence_packing_stats"))
    assert stats["exchanges"] <= 2, stats  # window shuffle + tiny final sort
    assert stats["scans"] == 1


def test_packing_windows_are_exact_integers(spark):
    # every window id must be < n_windows and spans consistent:
    # sum over sources of per-source window counts == global check
    df = _q(spark, "sequence_packing_stats")
    for row in df.collect():
        assert row.n_windows * 512 >= row.total_tokens
        assert (row.n_windows - 1) * 512 < row.total_tokens
        assert row.tail_waste_tokens == row.n_windows * 512 - row.total_tokens
        assert 0 <= row.n_crossing_docs <= row.n_docs


def test_shard_assignment_is_narrow_until_audit_agg(spark):
    # shard id is a projection; the ONLY shuffle is the 16-row audit
    # aggregate (plus its orderBy on a 16-row frame)
    stats = plan_stats(_q(spark, "shard_assignment_stats"))
    assert stats["scans"] == 1
    assert stats["exchanges"] <= 2, stats
    # full shard coverage at sf0.001 (1k docs >> 16 shards)
    rows = _q(spark, "shard_assignment_stats").collect()
    assert len(rows) == 16
    assert sum(r.n_docs for r in rows) > 0


def test_knn_triangle_graph_degree_is_bounded(spark):
    # rebuild the edge set the query uses and assert the k-cap held:
    # no node may exceed 2k undirected neighbors (k chosen by itself
    # + up to k reverse picks... actually bounded by 2k)
    from elb_log_etl_enrichment_spark.plans.queries import _t
    from elb_log_etl_enrichment_spark.plans.queries_training import KNN_K

    li = _t(spark, SF, "lineitem")
    os_ = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s")
    ).distinct()
    pairs = (
        os_.alias("a")
        .join(
            os_.alias("b"),
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    directed = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("u").orderBy(F.col("w").desc(), F.col("v").asc())
    )
    topk = directed.withColumn("rn", rn).filter(F.col("rn") <= KNN_K)
    edges = topk.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct()
    deg = (
        edges.select(F.col("u").alias("s"))
        .unionByName(edges.select(F.col("v").alias("s")))
        .groupBy("s")
        .count()
    )
    assert deg.agg(F.max("count")).first()[0] <= 2 * KNN_K


def test_dsir_model_joins_are_broadcast(spark):
    # the 1024-bucket model and the 1-row totals must broadcast —
    # the corpus-sized token stream never shuffles for the join
    plan = plan_text(_q(spark, "dsir_importance_weights"))
    stats = plan_stats(plan)
    assert stats["broadcast_joins"] >= 2, stats
    assert "SortMergeJoin" not in plan


def test_pq_topk_recall_against_bruteforce(spark):
    # PQ is approximate by construction; the contract is recall vs the
    # exact brute-force top-k on the same query set. Random synthetic
    # embeddings are PQ's worst case — 0.5 is a conservative floor at
    # the m=32/n_centroids=64 defaults (measured ≈0.78 at sf0.1).
    from elb_log_etl_enrichment_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_pq,
    )
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    e = load_table(spark, SF, "embeddings")
    pred = F.col("vec_id") % 100 == 0
    exact = {
        (r.query_id, r.neighbor)
        for r in cosine_topk_bruteforce(e, pred, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor) for r in cosine_topk_pq(e, pred, k=5).collect()
    }
    assert exact, "query set must not be empty"
    assert len(approx & exact) / len(exact) >= 0.5


def test_ann_query_collect_is_hard_capped(spark):
    """VERDICT r04: the PQ/IVFPQ query-set driver collect must fail
    FAST on an oversized query_pred (a careless always-true predicate
    at 100 TB is a driver OOM, not a slow query) — and the limit-based
    guard ships at most cap+1 rows before raising."""
    import pytest

    from elb_log_etl_enrichment_spark.operators.similarity import (
        cosine_topk_ivfpq,
        cosine_topk_pq,
    )
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    from elb_log_etl_enrichment_spark.operators.similarity import (
        _adc_query_cap,
        cosine_topk_arrow,
    )

    e = load_table(spark, SF, "embeddings")
    everything = F.lit(True)
    for fn in (cosine_topk_pq, cosine_topk_ivfpq, cosine_topk_arrow):
        with pytest.raises(ValueError, match="query_pred selects more than"):
            # cap=8 keeps the negative path instant; the default caps
            # are exercised by the green recall tests above.
            fn(e, everything, k=5, query_cap=8)
    # the ADC default cap is sized by the LOOKUP TABLES (the quantity
    # that actually OOMs the driver), not the vector matrix: 256 MiB
    # budget / (m * n_centroids * 8 B) at the m=32/n_centroids=64
    # defaults = 16,384 queries
    assert _adc_query_cap(32, 64) == 16_384
    assert _adc_query_cap(1, 1) == 65_536  # clamped to MAX_QUERY_ROWS


def test_ivf_topk_recall_and_nprobe_monotonicity(spark):
    """IVF contract (VERDICT r01): training is bounded to a seeded
    sample (never a full-corpus fit), and recall@k vs brute force
    rises with n_probe. Floors are conservative halves of the measured
    sf0.01 values (0.53 @ n_probe=1, 0.93 @ n_probe=4) — random
    uniform vectors are IVF's worst case."""
    from elb_log_etl_enrichment_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    e = load_table(spark, SF, "embeddings")
    pred = F.col("vec_id") % 100 == 0
    exact = {
        (r.query_id, r.neighbor)
        for r in cosine_topk_bruteforce(e, pred, k=3).collect()
    }
    assert exact

    def recall(n_probe, **kw):
        hits = {
            (r.query_id, r.neighbor)
            for r in cosine_topk_ivf(
                e, pred, k=3, n_cells=16, n_probe=n_probe, **kw
            ).collect()
        }
        return len(hits & exact) / len(exact)

    r1, r4 = recall(1), recall(4)
    assert r1 >= 0.25, r1
    assert r4 >= 0.6, r4
    assert r4 >= r1
    # bounded training stays usable even with a tiny sample: the fit
    # input is .limit(sample_limit), NOT the corpus
    assert recall(4, sample_limit=512) >= 0.5


def test_bpe_paths_agree_and_match_reference(spark):
    """The distributed merge loop (driver_vocab_limit=0) and the
    driver fast path must produce IDENTICAL merge tables, and both
    must match hand-checkable BPE semantics on the classic corpus:
    'es'+'est' merge first (newest+widest share est, weight 9), with
    ties broken (count DESC, left ASC, right ASC)."""
    from elb_log_etl_enrichment_spark.operators.bpe import bpe_train

    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word string, cnt long",
    )
    fast = bpe_train(words, n_merges=6)
    slow = bpe_train(words, n_merges=6, driver_vocab_limit=0)
    assert fast == slow
    assert [m["merged"] for m in fast[:2]] == ["es", "est"]
    assert fast[0]["pair_count"] == 9  # 6 newest + 3 widest
    # greedy non-overlap: 'aaa' with pair (a,a) yields ONE merge site
    rep = spark.createDataFrame([("aaa", 4)], "word string, cnt long")
    first = bpe_train(rep, n_merges=1, driver_vocab_limit=0)[0]
    assert (first["left"], first["right"]) == ("a", "a")
    assert first["pair_count"] == 8  # two adjacent pairs × cnt 4


def test_bpe_merge_table_registry_query(spark):
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries
    from elb_log_etl_enrichment_spark.plans.queries_training import (
        bpe_merge_table_detail,
    )

    out = bpe_merge_table_detail(spark, SF).collect()
    assert len(out) == 12
    assert [r["rank"] for r in out] == list(range(12))
    assert all(r["merged"] == r["left"] + r["right"] for r in out)
    # merge priority is non-increasing only within equal-arity rounds is
    # NOT guaranteed (later merges can create heavier pairs); pin
    # determinism instead: re-run yields the identical table
    out2 = bpe_merge_table_detail(spark, SF).collect()
    assert out == out2

    # the registered audit row mirrors the detail's first merge
    all_queries()
    audit = REGISTRY["bpe_merge_table"].fn(spark, SF).collect()
    assert len(audit) == 1
    a = audit[0]
    assert a["n_merges_ok"] == 1
    assert (a["first_left"], a["first_right"], a["first_count"]) == (
        out[0]["left"],
        out[0]["right"],
        out[0]["pair_count"],
    )
    assert a["ranks_ok"] == 1 and a["merged_concat_ok"] == 1
    assert a["n_initial_pairs"] > 0
    assert a["total_adjacent_pairs"] >= a["first_count"]


def test_ivfpq_recall_probe_tradeoff_and_full_probe_parity(spark):
    """IVF-PQ contract: training is bounded to a seeded sample; probing
    ALL cells must be within noise of plain PQ's recall (residual
    encoding loses ~nothing: 0.88 vs 0.88 on the sf0.01 draw, 0.72 vs
    0.84 on this sf0.001 draw — the 500-sample coarse fit is noisier),
    and fewer probes trade recall for candidate volume (0.52 @ 2/16,
    0.64 @ 4/16 measured @ sf0.01; floors are conservative)."""
    from elb_log_etl_enrichment_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivfpq,
        cosine_topk_pq,
    )
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    e = load_table(spark, SF, "embeddings")
    pred = F.col("vec_id") % 100 == 0
    exact = {
        (r.query_id, r.neighbor)
        for r in cosine_topk_bruteforce(e, pred, k=5).collect()
    }
    assert exact

    def recall(fn):
        hits = {(r.query_id, r.neighbor) for r in fn.collect()}
        return len(hits & exact) / len(exact)

    r2 = recall(cosine_topk_ivfpq(e, pred, k=5, n_cells=16, n_probe=2))
    r4 = recall(cosine_topk_ivfpq(e, pred, k=5, n_cells=16, n_probe=4))
    r16 = recall(cosine_topk_ivfpq(e, pred, k=5, n_cells=16, n_probe=16))
    r_pq = recall(cosine_topk_pq(e, pred, k=5))
    assert r2 >= 0.25, r2
    assert r4 >= 0.4, r4
    assert r16 >= r2, (r16, r2)
    # full probe sees every candidate plain PQ sees; residual codes
    # must stay within small-sample noise of whole-vector codes
    assert r16 >= 0.6, r16
    assert r16 >= r_pq - 0.15, (r16, r_pq)


def _sennrich_encode(word: str, merges: list[dict]) -> list[str]:
    """Independent reference BPE encoder: iteratively find the
    LOWEST-RANK adjacent pair present and merge all its occurrences
    left-to-right (greedy non-overlapping), repeat until none apply —
    the classic subword-nmt apply_bpe loop."""
    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}
    merged_of = {(m["left"], m["right"]): m["merged"] for m in merges}
    sym = list(word)
    while len(sym) > 1:
        pairs = {(sym[i], sym[i + 1]) for i in range(len(sym) - 1)}
        cand = [p for p in pairs if p in ranks]
        if not cand:
            break
        best = min(cand, key=lambda p: ranks[p])
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                out.append(merged_of[best])
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_bpe_encode_matches_independent_encoder(spark):
    """The chained _merge_fold encoding must equal the iterative
    min-rank-first reference encoder on chain-merge edge cases (runs
    of one char, back-to-back pairs, merged-token-feeds-later-merge),
    using a merge table the trainer itself produced on this corpus."""
    from elb_log_etl_enrichment_spark.operators.bpe import (
        bpe_encode_tokens,
        bpe_train,
    )

    corpus_words = [
        ("aaaa", 50), ("aaab", 40), ("abab", 30), ("banana", 20),
        ("abcabc", 10), ("a", 5), ("bb", 4), ("cab", 3),
    ]
    words = spark.createDataFrame(corpus_words, "word string, cnt long")
    merges = bpe_train(words, n_merges=6)
    assert merges, "trainer must learn merges on this corpus"
    enc = {
        r["word"]: (list(r["bpe_sym"]), r["n_bpe_tokens"])
        for r in bpe_encode_tokens(words, merges).collect()
    }
    for w, _ in corpus_words:
        ref = _sennrich_encode(w, merges)
        assert enc[w][0] == ref, (w, enc[w][0], ref)
        assert enc[w][1] == len(ref)
    # reconstruction invariant: concatenating subwords restores the word
    for w, (sym, _) in enc.items():
        assert "".join(sym) == w


def test_bpe_encode_stats_query_shape(spark):
    """Registry query (r7: the oracle-backed audit): every per-source
    row passes both in-plan contracts, and the inflation DETAIL frame
    keeps the invariants the audit summarizes — n_bpe_tokens ≥ n_words
    (BPE splits words into ≥1 subwords), chars/token ≥ 1."""
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries
    from elb_log_etl_enrichment_spark.plans.queries_training import (
        bpe_encode_stats_detail,
    )

    all_queries()
    out = REGISTRY["bpe_encode_stats"].fn(spark, SF).collect()
    assert out
    for r in out:
        assert r["tokens_in_bounds"] == 1
        assert r["roundtrip_ok"] == 1
        assert r["n_chars"] >= r["n_words"]
    detail = bpe_encode_stats_detail(spark, SF).collect()
    assert detail
    for r in detail:
        assert r["n_bpe_tokens"] >= r["n_words"]
        assert r["chars_per_token"] >= 1.0
        assert r["tokens_per_word"] >= 1.0


def test_two_pass_global_rank_equals_single_window(spark):
    """The bucket-rank scheme must reproduce the exact global
    row_number for any value distribution — including heavy ties that
    straddle percentile cut positions."""
    import random

    from pyspark.sql import Window
    from elb_log_etl_enrichment_spark.plans.queries_training import (
        _distributed_global_rank,
    )

    rng = random.Random(7)
    rows = [(i, rng.choice([3, 3, 3, 5, 8, 8, 13, 21])) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r["doc_id"]: r["rnk"]
        for r in _distributed_global_rank(df, "n", "doc_id").collect()
    }
    want = {
        r["doc_id"]: r["rnk"]
        for r in df.withColumn(
            "rnk",
            F.row_number().over(Window.orderBy("n", "doc_id")),
        ).collect()
    }
    assert got == want


def test_padding_waste_sorted_never_worse_than_arrival(spark):
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries

    all_queries()
    rows = {r["strategy"]: r for r in
            REGISTRY["padding_waste_audit"].fn(spark, SF).collect()}
    assert rows["length_sorted"]["waste_frac"] <= rows["arrival"]["waste_frac"]
    for r in rows.values():
        assert r["padded_slots"] >= r["total_tokens"]
        assert r["n_batches"] == -(-r["n_docs"] // 32)  # ceil
