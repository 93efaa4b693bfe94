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
