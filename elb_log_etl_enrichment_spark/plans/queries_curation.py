"""Corpus-curation tier: benchmark decontamination, chunk-level exact
dedup, unigram-LM quality scoring, and token-budget selection.

The four operations a training-data pipeline runs between raw dedup
and tokenization:

* **Decontamination** — n-gram overlap between the train split and a
  held-out (test/benchmark) split; any train document sharing a
  3-gram with the test set is flagged. The test n-gram set is tiny
  relative to the corpus (benchmarks are small), so it broadcasts;
  the corpus side never shuffles document text, only 32-char digests.
* **Chunk-level exact dedup** (C4/RefinedWeb line-dedup adapted to
  unstructured text) — non-overlapping 8-token chunks hashed
  corpus-wide; chunks appearing more than once are "duplicated
  content". The chunk-frequency table is vocabulary-sized, the join
  back is on digests.
* **Unigram-LM scoring** (CCNet-style) — mean -log2 p(token) per
  document under the corpus unigram model; the model is a broadcast
  join-back (vocabulary ≪ corpus).
* **Token-budget selection** (top-p by length) — per language, keep
  the largest documents until 60 % of the language's characters are
  covered. All comparisons are integer (5·prev_cum < 3·total), so
  the cut is exactly reproducible on any engine.

Determinism: digests are md5 hex (identical in both engines); floats
appear only as final ROUND(..., 6) ratios; the budget rule is pure
integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import TOKEN_RE
from ..operators.text_dedup import shingles
from .queries import _t, register

#: DuckDB-side shingle CTE over a pre-split base table carrying the
#: is_test flag (same 3-gram definition as operators.text_dedup).
_SPLIT_SH_CTE = r"""
    base AS (
        SELECT doc_id, text,
               substr(md5(text), 1, 1) > 'c' AS is_test
        FROM documents
    ),
    sh AS (
        SELECT doc_id, is_test,
               list_distinct([concat(t[i], ' ', t[i+1], ' ', t[i+2])
                              for i in range(1, len(t) - 1)]) AS s
        FROM (SELECT doc_id, is_test, regexp_extract_all(text, '\S+') AS t
              FROM base)
        WHERE len(t) >= 3
    )
"""


@register(
    "decontamination_overlap",
    sql=f"""
    WITH {_SPLIT_SH_CTE},
    test_sg AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(sg), 1, 15))::UBIGINT AS BIGINT) AS digest
        FROM (SELECT unnest(s) AS sg FROM sh WHERE is_test)
    ),
    train_ex AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(sg), 1, 15))::UBIGINT AS BIGINT) AS digest
        FROM (SELECT doc_id, unnest(s) AS sg FROM sh WHERE NOT is_test)
    ),
    hits AS (
        SELECT doc_id, COUNT(*) AS c
        FROM train_ex JOIN test_sg USING (digest)
        GROUP BY doc_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sh WHERE NOT is_test)
               AS n_train_docs,
           CAST(COUNT(*) AS BIGINT)              AS n_contaminated_docs,
           CAST(COALESCE(SUM(c), 0) AS BIGINT)   AS total_hits,
           CAST(COALESCE(MAX(c), 0) AS BIGINT)   AS max_hits_per_doc
    FROM hits
    """,
    tags=("curation", "decontamination", "ngram", "join"),
)
def decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-vs-test 3-gram contamination. ONE tokenize/shingle pass
    over the corpus (the is_test flag rides along and splits the
    output — a second shingles() call would re-scan every document);
    digests are 60-bit ints from the md5 prefix, so the broadcast set
    and the probe side carry 8-byte keys, not 32-char strings. The
    test digest set is broadcast (benchmark splits are small by
    construction); train documents shuffle only (doc_id, digest)."""
    d = _t(spark, sf_dir, "documents")
    is_test = F.substring(F.md5("text"), 1, 1) > "c"
    sh_all = shingles(d.withColumn("is_test", is_test), keep_cols=("is_test",)).persist()

    def _digest(col):
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")

    test_sg = (
        sh_all.filter("is_test")
        .select(F.explode("sh").alias("sg"))
        .select(_digest(F.col("sg")).alias("digest"))
        .distinct()
    )
    train = sh_all.filter(~F.col("is_test"))
    train_ex = train.select(
        "doc_id", F.explode(F.transform("sh", _digest)).alias("digest")
    )
    hits = (
        train_ex.join(F.broadcast(test_sg), "digest")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    summary = hits.agg(
        F.count(F.lit(1)).alias("n_contaminated_docs"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("total_hits"),
        F.coalesce(F.max("c"), F.lit(0)).cast("long").alias("max_hits_per_doc"),
    )
    n_train = train.agg(F.count(F.lit(1)).alias("n_train_docs"))
    return n_train.crossJoin(summary).select(
        "n_train_docs", "n_contaminated_docs", "total_hits", "max_hits_per_doc"
    )


_CHUNK_T = 8  # tokens per dedup chunk


@register(
    "chunk_dedup_stats",
    sql=f"""
    WITH tk AS (
        SELECT doc_id, source, regexp_extract_all(text, '\\S+') AS t
        FROM documents
    ),
    ch AS (
        SELECT doc_id, source,
               [CAST(('0x' || substr(md5(array_to_string(
                    t[k*{_CHUNK_T}+1 : k*{_CHUNK_T}+{_CHUNK_T}], ' ')), 1, 15))::UBIGINT
                     AS BIGINT)
                for k in range(0, CAST(floor(len(t) / {_CHUNK_T}) AS INT))] AS cs
        FROM tk
        WHERE len(t) >= {_CHUNK_T}
    ),
    e AS (SELECT doc_id, source, unnest(cs) AS digest FROM ch),
    freq AS (SELECT digest, COUNT(*) AS c FROM e GROUP BY digest),
    perdoc AS (
        SELECT doc_id, source,
               COUNT(*) AS n_chunks,
               SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS n_dup
        FROM e JOIN freq USING (digest)
        GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)        AS n_docs,
           CAST(SUM(n_chunks) AS BIGINT)   AS total_chunks,
           CAST(SUM(n_dup) AS BIGINT)      AS dup_chunks,
           ROUND(AVG(1.0 - n_dup * 1.0 / n_chunks), 6) AS avg_retained_frac,
           CAST(SUM(CASE WHEN n_dup = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS fully_clean_docs
    FROM perdoc
    GROUP BY source
    """,
    tags=("curation", "dedup", "chunk", "agg"),
)
def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicate-chunk accounting. Chunks hash to 60-bit
    integer digests (md5-prefix, identical in both engines) before any
    shuffle, so both the explode shuffle and the frequency join carry
    8-byte keys instead of 32-char strings; the frequency table joins
    back on the digest (chunk-vocabulary sized, not corpus sized)."""
    d = _t(spark, sf_dir, "documents")
    t = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)
    chunks = F.transform(
        F.sequence(F.lit(0), F.floor(F.size("t") / _CHUNK_T).cast("int") - 1),
        lambda k: F.conv(
            F.substring(
                F.md5(F.concat_ws(" ", F.slice("t", k * _CHUNK_T + 1, _CHUNK_T))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
    )
    e = (
        d.select("doc_id", "source", t.alias("t"))
        .filter(F.size("t") >= _CHUNK_T)
        .select("doc_id", "source", F.explode(chunks).alias("digest"))
        .persist()  # feeds the frequency agg AND the join-back probe
    )
    freq = e.groupBy("digest").agg(F.count(F.lit(1)).alias("c"))
    perdoc = (
        e.join(freq, "digest")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_dup"),
        )
    )
    return perdoc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chunks").cast("long").alias("total_chunks"),
        F.sum("n_dup").cast("long").alias("dup_chunks"),
        F.round(F.avg(1.0 - F.col("n_dup") * 1.0 / F.col("n_chunks")), 6).alias(
            "avg_retained_frac"
        ),
        F.sum(F.when(F.col("n_dup") == 0, 1).otherwise(0))
        .cast("long")
        .alias("fully_clean_docs"),
    )


@register(
    "unigram_logprob_quality",
    sql="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(regexp_extract_all(text, '\\S+')) AS tok
        FROM documents
    ),
    model AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    total AS (SELECT SUM(c) AS n FROM model),
    scored AS (
        SELECT t.doc_id, t.lang,
               AVG(-log2(m.c * 1.0 / total.n)) AS bits_per_tok
        FROM tok t JOIN model m ON t.tok = m.tok CROSS JOIN total
        GROUP BY t.doc_id, t.lang
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)       AS n_docs,
           ROUND(AVG(bits_per_tok), 6)    AS avg_bits,
           ROUND(MIN(bits_per_tok), 6)    AS min_bits,
           ROUND(MAX(bits_per_tok), 6)    AS max_bits
    FROM scored
    GROUP BY lang
    """,
    tags=("curation", "quality", "lm", "agg"),
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity proxy: mean -log2 p(token) under the
    corpus unigram model. The model (vocabulary-sized) and the 1-row
    total broadcast back onto the token stream — one shuffle builds
    the model, one shuffle scores documents."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)).alias("tok"),
    )
    model = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = model.agg(F.sum("c").alias("n"))
    scored = (
        tok.join(F.broadcast(model), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(F.avg(-F.log2(F.col("c") * 1.0 / F.col("n"))).alias("bits_per_tok"))
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("bits_per_tok"), 6).alias("avg_bits"),
        F.round(F.min("bits_per_tok"), 6).alias("min_bits"),
        F.round(F.max("bits_per_tok"), 6).alias("max_bits"),
    )


@register(
    "token_budget_topp",
    sql="""
    WITH ranked AS (
        SELECT lang, doc_id, n_chars,
               COALESCE(SUM(n_chars) OVER
                   (PARTITION BY lang ORDER BY n_chars DESC, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prev_cum,
               SUM(n_chars) OVER (PARTITION BY lang) AS total_chars
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS total_docs,
           CAST(MIN(total_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN 5 * prev_cum < 3 * total_chars
                         THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
           CAST(SUM(CASE WHEN 5 * prev_cum < 3 * total_chars
                         THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
           ROUND(SUM(CASE WHEN 5 * prev_cum < 3 * total_chars
                          THEN n_chars ELSE 0 END) * 1.0
                 / MIN(total_chars), 6) AS kept_frac
    FROM ranked
    GROUP BY lang
    """,
    tags=("curation", "sampling", "window", "agg"),
)
def token_budget_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-first selection until 60 % of each language's character
    budget is covered. The keep rule (5·prev_cum < 3·total) is pure
    integer arithmetic — bit-identical on any engine. Both windows
    share one Exchange on lang."""
    d = _t(spark, sf_dir, "documents")
    order_w = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    total_w = Window.partitionBy("lang")
    ranked = d.select(
        "lang",
        "doc_id",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(order_w), F.lit(0)).alias("prev_cum"),
        F.sum("n_chars").over(total_w).alias("total_chars"),
    )
    keep = 5 * F.col("prev_cum") < 3 * F.col("total_chars")
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.min("total_chars").cast("long").alias("total_chars"),
        F.sum(keep.cast("int")).cast("long").alias("kept_docs"),
        F.sum(F.when(keep, F.col("n_chars")).otherwise(0)).cast("long").alias("kept_chars"),
        F.round(
            F.sum(F.when(keep, F.col("n_chars")).otherwise(0))
            * 1.0
            / F.min("total_chars"),
            6,
        ).alias("kept_frac"),
    )
