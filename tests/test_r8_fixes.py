"""Round-8 fix pins.

* ``stat_fingerprint`` through the Hadoop FS API (VERDICT r07 item
  2): a schemed corpus (exercised via Hadoop's built-in ``viewfs://``
  mounted over local files — a genuinely non-``file:`` scheme with no
  network dependency) now yields a stable cross-session identity
  where r7 returned None and silently retrained every session.
* Audit-envelope fuzzing (VERDICT r07 item 8): the error-bound /
  recall-floor / trace-invariant audit oracles encode tolerances; a
  wrong slack formula reads as eternal-green. Each audit's gate is
  fed a deliberately corrupted estimate and must flip its flag.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _mount(spark, name: str, local_dir: str) -> str:
    """Mount ``local_dir`` under viewfs://<name>/data and return the
    schemed URI root."""
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set(f"fs.viewfs.mounttable.{name}.link./data", "file://" + local_dir)
    return f"viewfs://{name}/data"


class TestHadoopFingerprint:
    def test_schemed_file_fingerprints_and_invalidates(self, spark, tmp_path):
        from elb_log_etl_enrichment_spark.artifacts import stat_fingerprint

        p = tmp_path / "corpus.parquet"
        p.write_bytes(b"x" * 100)
        root = _mount(spark, "r8fpa", str(tmp_path))
        uri = f"{root}/corpus.parquet"

        fp1 = stat_fingerprint([uri], spark=spark)
        assert fp1 is not None
        # stable while the file is untouched
        assert stat_fingerprint([uri], spark=spark) == fp1
        # params still discriminate
        assert stat_fingerprint([uri], extra=("k2",), spark=spark) != fp1
        # rewrite -> new identity (len + modificationTime)
        time.sleep(0.05)
        p.write_bytes(b"y" * 101)
        assert stat_fingerprint([uri], spark=spark) != fp1

    def test_none_without_session_or_on_missing_path(self, spark, tmp_path):
        from elb_log_etl_enrichment_spark.artifacts import stat_fingerprint

        (tmp_path / "t.parquet").write_bytes(b"z")
        root = _mount(spark, "r8fpb", str(tmp_path))
        assert stat_fingerprint([f"{root}/t.parquet"]) is None  # no spark
        assert (
            stat_fingerprint([f"{root}/missing.parquet"], spark=spark) is None
        )
        # unresolvable scheme: miss, never a crash
        assert stat_fingerprint(["nosuchfs://x/y"], spark=spark) is None

    def test_directory_walk_matches_remote_semantics(self, spark, tmp_path):
        from elb_log_etl_enrichment_spark.artifacts import stat_fingerprint

        tbl = tmp_path / "tbl.parquet"
        tbl.mkdir()
        (tbl / "part-0.parquet").write_bytes(b"a" * 10)
        (tbl / "part-1.parquet").write_bytes(b"b" * 20)
        root = _mount(spark, "r8fpc", str(tmp_path))
        fp1 = stat_fingerprint([f"{root}/tbl.parquet"], spark=spark)
        assert fp1 is not None
        (tbl / "part-2.parquet").write_bytes(b"c" * 30)
        assert stat_fingerprint([f"{root}/tbl.parquet"], spark=spark) != fp1

    def test_grouped_listing_mixed_files_and_dirs(self, spark, tmp_path):
        """The batched per-parent listing (r8 review: one listStatus
        per directory, not one getFileStatus per file) must handle a
        mix of plain files and table DIRECTORIES in one call, and a
        missing member must read as no-identity, not a crash."""
        from elb_log_etl_enrichment_spark.artifacts import (
            _hadoop_stat_entries_grouped,
            stat_fingerprint,
        )

        (tmp_path / "a.parquet").write_bytes(b"a" * 11)
        (tmp_path / "b.parquet").write_bytes(b"b" * 22)
        tbl = tmp_path / "tbl.parquet"
        tbl.mkdir()
        (tbl / "part-0.parquet").write_bytes(b"p" * 5)
        (tbl / "part-1.parquet").write_bytes(b"q" * 6)
        root = _mount(spark, "r8fpg", str(tmp_path))
        uris = [
            f"{root}/a.parquet",
            f"{root}/b.parquet",
            f"{root}/tbl.parquet",
        ]
        entries = _hadoop_stat_entries_grouped(spark, uris)
        # 2 plain files + 2 recursed table parts
        assert len(entries) == 4, entries
        fp = stat_fingerprint(uris, spark=spark)
        assert fp is not None
        # same set through the public API is order-insensitive
        assert stat_fingerprint(list(reversed(uris)), spark=spark) == fp
        # a vanished member -> None (retrain), never a crash
        assert (
            stat_fingerprint(uris + [f"{root}/gone.parquet"], spark=spark)
            is None
        )

    def test_index_artifact_path_for_schemed_corpus(self, spark, tmp_path):
        """The ANN artifact tier gets a disk path for a schemed corpus
        (r7: None -> retrain every session)."""
        from elb_log_etl_enrichment_spark.operators.similarity import (
            _index_artifact_path,
        )

        (tmp_path / "emb.parquet").write_bytes(b"e" * 64)
        root = _mount(spark, "r8fpd", str(tmp_path))
        uri = f"{root}/emb.parquet"
        path = _index_artifact_path([uri], ("pq", "ph", 4, 16), spark=spark)
        assert path is not None and path.endswith(".npz")
        # no session -> honest miss, same as r7
        assert _index_artifact_path([uri], ("pq", "ph", 4, 16)) is None
        # identity is stable across calls (what cross-session reuse
        # keys on)
        assert (
            _index_artifact_path([uri], ("pq", "ph", 4, 16), spark=spark)
            == path
        )

    def test_source_fingerprint_for_schemed_sf_dir(self, spark, tmp_path):
        """The bucketed-layout tier fingerprints a schemed sf_dir."""
        import shutil

        from elb_log_etl_enrichment_spark.plans.queries_ext import (
            _source_fingerprint,
        )

        for t in ("orders", "lineitem"):
            shutil.copyfile(
                os.path.join(SF, f"{t}.parquet"),
                tmp_path / f"{t}.parquet",
            )
        root = _mount(spark, "r8fpe", str(tmp_path))
        fp1 = _source_fingerprint(root, spark=spark)
        assert fp1 is not None
        assert _source_fingerprint(root, spark=spark) == fp1
        assert _source_fingerprint(root) is None  # no session
        time.sleep(0.05)
        (tmp_path / "orders.parquet").write_bytes(b"regenerated")
        assert _source_fingerprint(root, spark=spark) != fp1

    def test_ivf_sizing_rule_pins(self):
        """√N clamped to [8, 256], ~37.5 % probe fraction (raised
        from 25 % in r9 — VERDICT r08 item 4: the probe ceiling bound
        IVFADC+R recall before the rerank budget; the measured rerank
        recall@5 curve at 3/8 is 0.80/0.80/0.80/0.838 across
        sf0.001/0.01/0.1/sf1, monotone-or-flat — see ivf_sizing's
        docstring); sf1 must stay ≥ sf0.1."""
        from elb_log_etl_enrichment_spark.operators.similarity import (
            ivf_sizing,
        )

        assert ivf_sizing(500) == (22, 9)
        assert ivf_sizing(2000) == (45, 17)
        assert ivf_sizing(20000) == (141, 53)
        assert ivf_sizing(1) == (8, 3)  # lower clamp
        assert ivf_sizing(10**9) == (256, 96)  # expression-size clamp

    def test_adaptive_ivf_recall_on_small_corpus(self, spark):
        """Defaults (no explicit geometry) resolve via the rule and
        clear the registered audit's 0.4 floor with margin."""
        from elb_log_etl_enrichment_spark.operators.similarity import (
            cosine_topk_arrow,
            cosine_topk_ivf,
        )
        from elb_log_etl_enrichment_spark.sources.tables import load_table

        e = load_table(spark, SF, "embeddings")
        pred = F.col("vec_id") % 100 == 0
        exact = {
            (r.query_id, r.neighbor)
            for r in cosine_topk_arrow(e, pred, k=3).collect()
        }
        hits = {
            (r.query_id, r.neighbor)
            for r in cosine_topk_ivf(e, pred, k=3).collect()
        }
        assert exact
        assert len(hits & exact) / len(exact) >= 0.6

    def test_local_fast_path_unchanged(self, tmp_path):
        """file:/absolute URIs keep the os.stat entry format — the r7
        artifact keys must survive the r8 extension."""
        from elb_log_etl_enrichment_spark.artifacts import stat_fingerprint

        p = tmp_path / "f.bin"
        p.write_bytes(b"q" * 7)
        st = os.stat(p)
        import hashlib

        h = hashlib.md5()
        h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
        assert stat_fingerprint([str(p)]) == h.hexdigest()
        assert stat_fingerprint([f"file://{p}"]) == h.hexdigest()


def _registry(spark, name):
    from elb_log_etl_enrichment_spark.plans.queries import (
        REGISTRY,
        all_queries,
    )

    all_queries()
    return REGISTRY[name].fn


class TestAuditEnvelopeFuzz:
    """VERDICT r07 item 8: every error-bound / recall-floor /
    trace-invariant audit is fed a deliberately corrupted estimate —
    a wrong slack formula reads as eternal-green, so each gate must
    demonstrably FLIP on drift past its envelope."""

    def test_equi_depth_rank_gate_flips_on_doubled_estimates(
        self, spark, monkeypatch
    ):
        import pyspark.sql.functions as pf

        orig = pf.percentile_approx
        monkeypatch.setattr(
            pf,
            "percentile_approx",
            lambda c, p, a=None: F.transform(
                orig(c, p, a) if a is not None else orig(c, p),
                lambda x: x * 2,
            ),
        )
        rows = _registry(spark, "equi_depth_histogram_orders_approx")(
            spark, SF
        ).collect()
        assert any(r.rank_ok == 0 for r in rows), rows

    def test_iqr_rank_gate_flips_on_doubled_quartiles(
        self, spark, monkeypatch
    ):
        import pyspark.sql.functions as pf

        orig = pf.percentile_approx
        monkeypatch.setattr(
            pf,
            "percentile_approx",
            lambda c, p, a=None: (
                orig(c, p, a) if a is not None else orig(c, p)
            )
            * 2
            + 1e9,
        )
        rows = _registry(spark, "iqr_outlier_audit_approx")(
            spark, SF
        ).collect()
        assert rows and all(
            r.q1_rank_ok == 0 and r.q3_rank_ok == 0 for r in rows
        ), rows

    def test_approx_aggregates_gates_flip_independently(
        self, spark, monkeypatch
    ):
        import pyspark.sql.functions as pf

        fn = _registry(spark, "approx_aggregates_events")
        orig_acd = pf.approx_count_distinct
        monkeypatch.setattr(
            pf, "approx_count_distinct", lambda c: orig_acd(c) * 2
        )
        rows = fn(spark, SF).collect()
        assert rows and all(r.users_est_ok == 0 for r in rows), rows
        assert all(r.median_rank_ok == 1 for r in rows), rows
        monkeypatch.undo()

        orig_pa = pf.percentile_approx
        monkeypatch.setattr(
            pf,
            "percentile_approx",
            lambda c, p, a=None: (
                orig_pa(c, p, a) if a is not None else orig_pa(c, p)
            )
            + 1e12,
        )
        rows = fn(spark, SF).collect()
        assert rows and all(r.median_rank_ok == 0 for r in rows), rows
        assert all(r.users_est_ok == 1 for r in rows), rows

    def test_hll_union_gate_flips_on_mismerged_estimate(
        self, spark, monkeypatch
    ):
        import pyspark.sql.functions as pf

        orig = pf.hll_sketch_estimate
        monkeypatch.setattr(
            pf, "hll_sketch_estimate", lambda c: orig(c) * 3
        )
        r = _registry(spark, "hll_sketch_distinct_users")(
            spark, SF
        ).collect()[0]
        assert r.merged_est_ok == 0, r

    def test_vocab_quartile_gate_flips_on_skewed_partition(
        self, spark, monkeypatch
    ):
        from elb_log_etl_enrichment_spark.plans import queries_profiling as qp

        orig = qp.doc_quartiles_approx
        monkeypatch.setattr(
            qp,
            "doc_quartiles_approx",
            lambda d: orig(d).withColumn("q", F.lit(1)),
        )
        rows = _registry(spark, "vocab_growth_audit_approx")(
            spark, SF
        ).collect()
        assert any(r.docs_balance_ok == 0 for r in rows), rows

    def test_pca_eigensum_gate_flips_on_scaled_spectrum(
        self, spark, monkeypatch
    ):
        from elb_log_etl_enrichment_spark.operators import linalg

        orig = linalg.pca_spectrum
        monkeypatch.setattr(
            linalg,
            "pca_spectrum",
            lambda emb, top_k=64: [
                (c, ev * 2, sh, cu)
                for c, ev, sh, cu in orig(emb, top_k=top_k)
            ],
        )
        r = _registry(spark, "embedding_pca_variance")(spark, SF).collect()[0]
        assert r.eigensum_ok == 0, r

    def test_pca_spectrum_gate_flips_on_shuffled_cumulatives(
        self, spark, monkeypatch
    ):
        from elb_log_etl_enrichment_spark.operators import linalg

        orig = linalg.pca_spectrum

        def corrupt(emb, top_k=64):
            rows = orig(emb, top_k=top_k)
            # reverse the cumulative-share column: no longer the
            # running sum of shares
            cums = [cu for _c, _ev, _sh, cu in rows][::-1]
            return [
                (c, ev, sh, cu2)
                for (c, ev, sh, _cu), cu2 in zip(rows, cums)
            ]

        monkeypatch.setattr(linalg, "pca_spectrum", corrupt)
        r = _registry(spark, "embedding_pca_variance")(spark, SF).collect()[0]
        assert r.spectrum_ok == 0, r

    def test_ann_recall_gate_flips_on_empty_and_wrong_approx(self, spark):
        from elb_log_etl_enrichment_spark.plans.queries_ext import (
            _ann_recall_audit,
        )

        empty = spark.createDataFrame([], "query_id long, neighbor long")
        r = _ann_recall_audit(spark, SF, empty, k=3, floor=0.4).collect()[0]
        assert r.recall_ok == 0 and r.n_queries > 0, r
        # wrong neighbors (shifted ids) must not count as hits
        from elb_log_etl_enrichment_spark.operators.similarity import (
            cosine_topk_arrow,
        )
        from elb_log_etl_enrichment_spark.sources.tables import load_table

        e = load_table(spark, SF, "embeddings")
        wrong = (
            cosine_topk_arrow(e, F.col("vec_id") % 100 == 0, k=3)
            .select("query_id", (F.col("neighbor") + 100000).alias("neighbor"))
        )
        r = _ann_recall_audit(spark, SF, wrong, k=3, floor=0.4).collect()[0]
        assert r.recall_ok == 0, r

    def test_ann_recall_accounting_immune_to_duplicate_pairs(self, spark):
        """ADVICE r7: duplicate (query_id, neighbor) pairs in an approx
        frame must not fan out the join and inflate the recall."""
        from elb_log_etl_enrichment_spark.operators.similarity import (
            cosine_topk_arrow,
        )
        from elb_log_etl_enrichment_spark.plans.queries_ext import (
            _ann_recall_audit,
        )
        from elb_log_etl_enrichment_spark.sources.tables import load_table

        e = load_table(spark, SF, "embeddings")
        exact = cosine_topk_arrow(e, F.col("vec_id") % 100 == 0, k=3).select(
            "query_id", "neighbor"
        )
        doubled = exact.unionByName(exact)
        r = _ann_recall_audit(spark, SF, doubled, k=3, floor=0.4).collect()[0]
        r1 = _ann_recall_audit(spark, SF, exact, k=3, floor=0.4).collect()[0]
        assert r.recall_ok == 1 and r1.recall_ok == 1
        assert r.n_queries == r1.n_queries

    def test_bpe_roundtrip_gate_flips_on_corrupt_encoder(
        self, spark, monkeypatch
    ):
        from elb_log_etl_enrichment_spark.operators import bpe

        orig = bpe.bpe_encode_tokens

        def corrupt(vocab, merges, **kw):
            out = orig(vocab, merges, **kw)
            return out.withColumn("bpe_sym", F.slice("bpe_sym", 1, 1))

        monkeypatch.setattr(bpe, "bpe_encode_tokens", corrupt)
        rows = _registry(spark, "bpe_encode_stats")(spark, SF).collect()
        assert any(r.roundtrip_ok == 0 for r in rows), rows

    def test_bpe_bounds_gate_flips_on_inflated_counts(
        self, spark, monkeypatch
    ):
        from elb_log_etl_enrichment_spark.operators import bpe

        orig = bpe.bpe_encode_tokens

        def corrupt(vocab, merges, **kw):
            out = orig(vocab, merges, **kw)
            return out.withColumn(
                "n_bpe_tokens", F.col("n_bpe_tokens") + F.lit(1000)
            )

        monkeypatch.setattr(bpe, "bpe_encode_tokens", corrupt)
        rows = _registry(spark, "bpe_encode_stats")(spark, SF).collect()
        assert rows and all(r.tokens_in_bounds == 0 for r in rows), rows

    def test_footer_minmax_gate_flips_on_divergent_data(
        self, spark, monkeypatch
    ):
        """Feed the audit a data side that disagrees with the footers
        (a filtered lineitem): the min/max truthfulness flag must
        flip while the footer-internal counts stay consistent."""
        from elb_log_etl_enrichment_spark.sources import tables

        orig = tables.load_table

        def corrupt(sess, sf_dir, name, **kw):
            df = orig(sess, sf_dir, name, **kw)
            if name == "lineitem":
                med = df.agg(
                    F.percentile_approx("l_orderkey", F.lit(0.5))
                ).collect()[0][0]
                return df.filter(F.col("l_orderkey") < F.lit(med))
            return df

        monkeypatch.setattr(tables, "load_table", corrupt)
        r = _registry(spark, "parquet_footer_stats")(spark, SF).collect()[0]
        assert r.footer_minmax_ok == 0, r
        assert r.values_complete_ok == 1, r


class TestPlantedLeakIsAlwaysCaught:
    """VERDICT r07 item 6: leakage_safe_split_audit guards the most
    expensive real-world failure (train/test contamination); a
    PLANTED near-dup pair straddling the naive per-document split
    must always be reported torn by the naive scheme and never by
    the cluster-granular one."""

    _counter = [0]

    def _corpus_dir(self, spark, tmp_path_factory, docs):
        """Write a documents corpus to a FRESH dir (the minhash pair
        memo keys on (app, sf_dir) — reusing a path would serve stale
        cluster labels)."""
        self._counter[0] += 1
        d = tmp_path_factory.mktemp(f"leak{self._counter[0]}")
        spark.createDataFrame(
            [(i, t, "en", "synthetic", len(t)) for i, t in enumerate(docs)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        ).write.parquet(str(d / "documents.parquet"))
        return str(d)

    @staticmethod
    def _naive_side(text: str) -> str:
        import hashlib

        return (
            "train"
            if hashlib.md5(text.encode()).hexdigest()[0] <= "c"
            else "test"
        )

    def test_planted_leak_hypothesis(self, spark, tmp_path_factory):
        """Property: for ANY planted near-dup pair with differing
        naive hash sides, naive_torn_clusters >= 1 and
        safe_torn_clusters == 0. The pair is built to share an
        IDENTICAL 3-gram shingle set (a repeated word cycle — text
        differs, shingles don't), so the LSH edge is deterministic,
        never a banding coin-flip."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        words = st.lists(
            st.sampled_from(
                ["alpha", "bravo", "carol", "delta", "echo", "fox",
                 "golf", "hotel", "india", "julia", "kilo", "lima"]
            ),
            min_size=3,
            max_size=5,
            unique=True,
        )

        @settings(
            max_examples=6,
            deadline=None,
            suppress_health_check=[
                HealthCheck.function_scoped_fixture,
                HealthCheck.filter_too_much,
            ],
        )
        @given(cycle=words, reps=st.integers(min_value=2, max_value=5))
        def run(cycle, reps):
            base = " ".join(cycle * reps)
            leak = None
            # find a repeat count whose text hashes to the OTHER naive
            # side — same shingle set, different md5 by construction
            for extra in range(reps + 1, reps + 40):
                cand = " ".join(cycle * extra)
                if self._naive_side(cand) != self._naive_side(base):
                    leak = cand
                    break
            if leak is None:  # astronomically unlikely (p ~ 0.7^39)
                return
            fillers = [
                f"unique{i}a unique{i}b unique{i}c unique{i}d"
                for i in range(10)
            ]
            sf = self._corpus_dir(
                spark, tmp_path_factory, fillers + [base, leak]
            )
            rows = _registry(spark, "leakage_safe_split_audit")(
                spark, sf
            ).collect()
            assert rows, "audit emitted no rows"
            assert all(r.safe_torn_clusters == 0 for r in rows), rows
            assert all(r.naive_torn_clusters >= 1 for r in rows), rows

        run()

    def test_untorn_corpus_reports_clean(self, spark, tmp_path_factory):
        """No near-dups at all: both torn counters must be 0."""
        docs = [
            f"solo{i}x solo{i}y solo{i}z solo{i}w" for i in range(12)
        ]
        sf = self._corpus_dir(spark, tmp_path_factory, docs)
        rows = _registry(spark, "leakage_safe_split_audit")(
            spark, sf
        ).collect()
        assert rows
        assert all(
            r.safe_torn_clusters == 0 and r.naive_torn_clusters == 0
            for r in rows
        ), rows
