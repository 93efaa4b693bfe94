"""Corpus-quality operators for training-data curation (BASELINE.json
north-star tier, alongside ``queries_text.py``).

Three capabilities a 100 TB text pipeline needs beyond dedup:

* **Repetition/diversity filtering** (Gopher-style rules): type-token
  ratio and most-frequent-token share per document, bucketed into
  keep/drop flags. Two map-side-combinable aggregations — shuffle rows
  are one per (doc, distinct token), then one per doc.
* **PII scanning + redaction plumbing**: regex match counts (emails,
  IPv4, phone shapes) and a checksum over the redacted corpus, all
  JVM-side regexp expressions. On the synthetic corpus the PII counts
  are zero by construction — the query still proves the full scan +
  redact + checksum path end-to-end against the oracle.
* **Fingerprint collision mining** (MOSS-style): document pairs
  sharing ≥3 winnowing fingerprints, joining on 8-byte hash keys only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.text_dedup import (
    WINNOW_BASE,
    WINNOW_K,
    WINNOW_MOD,
    WINNOW_W,
    winnowing_collision_pairs,
)
from .queries import _t, register


# --------------------------------------------------------------------------
# Gopher-style repetition flags.
# --------------------------------------------------------------------------
@register(
    "token_diversity_flags",
    sql="""
    WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tc AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM t WHERE tok <> '' GROUP BY doc_id, tok
    ),
    s AS (
      SELECT doc_id,
             SUM(c)   AS n_toks,
             COUNT(*) AS n_distinct,
             MAX(c)   AS top_tok_count
      FROM tc GROUP BY doc_id
    )
    SELECT (n_distinct * 1.0 / n_toks < 0.5)      AS low_diversity,
           (top_tok_count * 1.0 / n_toks > 0.125) AS high_repetition,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n_distinct * 1.0 / n_toks), 6)    AS avg_ttr,
           ROUND(AVG(top_tok_count * 1.0 / n_toks), 6) AS avg_top_frac
    FROM s
    GROUP BY 1, 2
    """,
    tags=("text", "quality", "repetition", "agg"),
)
def token_diversity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_toks"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_tok_count"),
    )
    ttr = F.col("n_distinct") * 1.0 / F.col("n_toks")
    top_frac = F.col("top_tok_count") * 1.0 / F.col("n_toks")
    return (
        s.select(
            (ttr < 0.5).alias("low_diversity"),
            (top_frac > 0.125).alias("high_repetition"),
            ttr.alias("ttr"),
            top_frac.alias("top_frac"),
        )
        .groupBy("low_diversity", "high_repetition")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ttr"), 6).alias("avg_ttr"),
            F.round(F.avg("top_frac"), 6).alias("avg_top_frac"),
        )
    )


# --------------------------------------------------------------------------
# PII scan + redaction checksum. Patterns are anchored to common PII
# shapes; `mentions_spark` is a guaranteed-nonzero control so the
# oracle comparison exercises real counts, not just zeros.
# --------------------------------------------------------------------------
_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-z]{2,}"
_IPV4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
_PHONE = r"\d{3}[- ]\d{3,4}[- ]\d{4}"


@register(
    "pii_redaction_stats",
    sql=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '{_EMAIL}'))) AS BIGINT)
             AS n_emails,
           CAST(SUM(len(regexp_extract_all(text, '{_IPV4}'))) AS BIGINT)
             AS n_ipv4,
           CAST(SUM(len(regexp_extract_all(text, '{_PHONE}'))) AS BIGINT)
             AS n_phones,
           CAST(SUM(CASE WHEN regexp_matches(text, 'spark')
                         THEN 1 ELSE 0 END) AS BIGINT) AS mentions_spark,
           MIN(md5(regexp_replace(text, 'table|row', '[REDACTED]', 'g')))
             AS redacted_checksum
    FROM documents
    GROUP BY source
    """,
    tags=("text", "pii", "regex", "agg"),
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    text = F.col("text")

    def n_matches(pat: str):
        return F.size(F.regexp_extract_all(text, F.lit(pat), 0))

    redacted = F.regexp_replace(text, "table|row", "[REDACTED]")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_matches(_EMAIL)).cast("long").alias("n_emails"),
        F.sum(n_matches(_IPV4)).cast("long").alias("n_ipv4"),
        F.sum(n_matches(_PHONE)).cast("long").alias("n_phones"),
        F.sum(F.when(text.rlike("spark"), 1).otherwise(0))
        .cast("long")
        .alias("mentions_spark"),
        F.min(F.md5(redacted)).alias("redacted_checksum"),
    )


# --------------------------------------------------------------------------
# MOSS-style fingerprint collision mining; oracle replays the identical
# integer polynomial with DuckDB list comprehensions.
# --------------------------------------------------------------------------
def _collision_sql() -> str:
    poly = " + ".join(
        f"(CAST(ascii(substr(text, p + {j}, 1)) AS BIGINT) % {WINNOW_MOD})"
        f" * {WINNOW_BASE ** j % WINNOW_MOD}"
        for j in range(WINNOW_K)
    )
    return f"""
    WITH r AS (
        SELECT doc_id,
               [({poly}) % {WINNOW_MOD}
                for p in range(1, length(text) - {WINNOW_K - 1} + 1)] AS rhs
        FROM documents
        WHERE length(text) >= {WINNOW_K + WINNOW_W - 1}
    ),
    f AS (
        SELECT doc_id,
               list_distinct([list_min(rhs[p : p + {WINNOW_W - 1}])
                              for p in range(1, len(rhs) - {WINNOW_W - 1} + 1)]) AS fps
        FROM r
    ),
    e0 AS (SELECT doc_id, unnest(fps) AS fp FROM f),
    rare AS (SELECT fp FROM e0 GROUP BY fp HAVING COUNT(*) <= 20),
    e AS (SELECT e0.* FROM e0 JOIN rare USING (fp))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 3
    """


@register(
    "winnowing_collision_pairs",
    sql=_collision_sql(),
    tags=("text", "fingerprint", "dedup", "join"),
)
def winnowing_collision_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return winnowing_collision_pairs(d, min_shared=3)


# --------------------------------------------------------------------------
# Gopher repetition detail: fraction of each document's tokens covered
# by its single most frequent bigram (top-2-gram fraction; reference
# rule "top n-gram char fraction"). Only the max COUNT travels out of
# the per-doc aggregation, so bigram ties cannot introduce
# nondeterminism.
# --------------------------------------------------------------------------
@register(
    "bigram_repetition_flags",
    sql="""
    WITH tk AS (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents
    ),
    bg AS (
        SELECT doc_id, len(t) AS n_toks, unnest(
            [concat(t[i], ' ', t[i+1]) for i in range(1, len(t))]
        ) AS bigram
        FROM tk WHERE len(t) >= 2
    ),
    bc AS (
        SELECT doc_id, n_toks, bigram, COUNT(*) AS c
        FROM bg GROUP BY doc_id, n_toks, bigram
    ),
    perdoc AS (
        SELECT doc_id, n_toks, MAX(c) AS top_bigram_count
        FROM bc GROUP BY doc_id, n_toks
    )
    SELECT (top_bigram_count * 2.0 / n_toks > 0.18) AS high_bigram_repetition,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(top_bigram_count * 2.0 / n_toks), 6) AS avg_top_bigram_frac,
           CAST(MAX(top_bigram_count) AS BIGINT) AS max_top_bigram_count
    FROM perdoc
    GROUP BY 1
    """,
    tags=("text", "quality", "repetition", "ngram"),
)
def bigram_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-doc top-bigram count is a run-length maximum over the
    SORTED bigram array — a narrow array-HOF computation, so the only
    shuffle in the whole query is the final 2-group flag aggregation.
    (The oracle keeps the equivalent explode + GROUP BY formulation:
    max run in a sorted list == max bigram multiplicity.)"""
    from ..functions.text import TOKEN_RE

    d = _t(spark, sf_dir, "documents")
    t = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)
    base = d.select("doc_id", t.alias("t")).filter(F.size("t") >= 2)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat_ws(" ", F.element_at("t", i), F.element_at("t", i + 1)),
    )

    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        _step,
        lambda acc: acc["best"],
    )
    perdoc = base.select(
        F.size("t").alias("n_toks"), top.alias("top_bigram_count")
    )
    frac = F.col("top_bigram_count") * 2.0 / F.col("n_toks")
    return (
        perdoc.select(
            (frac > 0.18).alias("high_bigram_repetition"),
            frac.alias("f"),
            "top_bigram_count",
        )
        .groupBy("high_bigram_repetition")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("f"), 6).alias("avg_top_bigram_frac"),
            F.max("top_bigram_count").cast("long").alias("max_top_bigram_count"),
        )
    )


# --------------------------------------------------------------------------
# Token-distribution Shannon entropy per document — the gibberish /
# boilerplate detector that complements type-token ratio: TTR sees
# "how many distinct tokens", entropy sees "how evenly they're used"
# (a doc that is 90% one token + 10% unique tail can pass TTR yet
# score near-zero entropy). H = log2(n) − Σ c·log2(c)/n.
# --------------------------------------------------------------------------
@register(
    "token_entropy_quality",
    sql=r"""
    WITH tok AS (
        SELECT doc_id, lang, unnest(regexp_extract_all(text, '\S+')) AS tok
        FROM documents
    ),
    tc AS (
        SELECT doc_id, lang, tok, COUNT(*) AS c
        FROM tok GROUP BY doc_id, lang, tok
    ),
    perdoc AS (
        SELECT doc_id, lang,
               ROUND(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 6) AS entropy
        FROM tc GROUP BY doc_id, lang
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(entropy), 6) AS avg_entropy,
           ROUND(MIN(entropy), 6) AS min_entropy,
           ROUND(MAX(entropy), 6) AS max_entropy,
           CAST(SUM(CASE WHEN entropy < 2.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_low_entropy
    FROM perdoc
    GROUP BY lang
    """,
    tags=("text", "quality", "entropy", "hof"),
)
def token_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token entropy as a single fold over the SORTED
    token array: extending a run from r to r+1 adds the telescoping
    delta (r+1)·log2(r+1) − r·log2(r), so the fold finishes with
    Σ c·log2(c) without ever exploding (doc, token) rows — the only
    Exchange in the plan is the final per-lang aggregate. Per-doc
    entropies are rounded to 6 dp in BOTH engines before aggregating
    (the advisor's round-alignment rule), keeping the low-entropy flag
    and averages hash-stable."""
    from ..functions.text import TOKEN_RE

    d = _t(spark, sf_dir, "documents")
    t = F.regexp_extract_all("text", F.lit(TOKEN_RE), 0)
    base = d.select("doc_id", "lang", t.alias("t")).filter(F.size("t") >= 1)

    def _step(acc, x):
        same = x == acc["prev"]
        newrun = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        delta = F.when(
            same,
            newrun.cast("double") * F.log2(newrun)
            - acc["run"].cast("double") * F.log2(acc["run"]),
        ).otherwise(F.lit(0.0))
        return F.struct(
            x.alias("prev"), newrun.alias("run"), (acc["s"] + delta).alias("s")
        )

    clogc = F.aggregate(
        F.array_sort("t"),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0.0).alias("s"),
        ),
        _step,
        lambda acc: acc["s"],
    )
    n = F.size("t").cast("double")
    perdoc = base.select(
        "lang", F.round(F.log2(n) - clogc / n, 6).alias("entropy")
    )
    return perdoc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("entropy"), 6).alias("avg_entropy"),
        F.round(F.min("entropy"), 6).alias("min_entropy"),
        F.round(F.max("entropy"), 6).alias("max_entropy"),
        F.sum((F.col("entropy") < 2.0).cast("int")).cast("long").alias(
            "n_low_entropy"
        ),
    )


# --------------------------------------------------------------------------
# Readability scoring (Flesch reading ease, regex-approximated).
# Syllables ≈ vowel-group runs per word; sentences ≈ terminal-punct
# runs. Everything is JVM-side regexp counting over one narrow scan —
# no UDF, no shuffle until the sources-sized final aggregate, and the
# identical regex definitions run on the oracle so the scores match
# bit for bit.
# --------------------------------------------------------------------------
@register(
    "readability_scores",
    sql=r"""
    WITH per_doc AS (
        SELECT source,
               GREATEST(len(regexp_extract_all(text, '\S+')), 1) AS words,
               GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sentences,
               GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
                   AS syllables
        FROM documents
    ),
    scored AS (
        SELECT source,
               206.835 - 1.015 * (words * 1.0 / sentences)
                       - 84.6 * (syllables * 1.0 / words) AS flesch
        FROM per_doc
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)      AS n_docs,
           ROUND(AVG(flesch), 6)         AS avg_flesch,
           ROUND(MIN(flesch), 6)         AS min_flesch,
           ROUND(MAX(flesch), 6)         AS max_flesch,
           CAST(COUNT(CASE WHEN flesch >= 60 THEN 1 END) AS BIGINT)
               AS n_easy
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
    tags=("quality", "readability", "regex"),
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease per source. The vowel-group syllable
    approximation is the standard cheap heuristic; the point is the
    shape — three regexp_extract_all counts fused into one projection,
    whole-stage-codegen'd, aggregating straight to |sources| rows."""
    d = _t(spark, sf_dir, "documents")
    words = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))), F.lit(1)
    )
    sentences = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit(r"[.!?]+"), F.lit(0))), F.lit(1)
    )
    syllables = F.greatest(
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(r"[aeiouy]+"), F.lit(0))
        ),
        F.lit(1),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words * 1.0 / sentences)
        - F.lit(84.6) * (syllables * 1.0 / words)
    )
    return (
        d.select("source", flesch.alias("flesch"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("flesch"), 6).alias("avg_flesch"),
            F.round(F.min("flesch"), 6).alias("min_flesch"),
            F.round(F.max("flesch"), 6).alias("max_flesch"),
            F.count_if(F.col("flesch") >= 60).alias("n_easy"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Naive Bayes language classifier — distributed TRAINING (pure
# counting aggregates: multinomial NB with add-1 smoothing is
# closed-form) and INFERENCE (vocabulary-sized model broadcast back
# onto the token stream) in one declarative plan. The learned twin of
# the stopword-heuristic `langid_confusion`. Absent (lang, token)
# pairs use the smoothing default via the delta trick:
# score = prior + n_toks·default_l + Σ_hits c·(logp − default_l),
# so the join touches only OBSERVED pairs — no dense cross join.
# Scores round to 6 dp in BOTH engines before the argmax (ties break
# by lang ASC), keeping the prediction hash-stable.
# --------------------------------------------------------------------------
@register(
    "naive_bayes_langid_confusion",
    sql=r"""
    WITH tok AS (
        SELECT doc_id, lang, unnest(regexp_extract_all(text, '\S+')) AS tok
        FROM documents
    ),
    doc_tok AS (
        SELECT doc_id, lang, tok, COUNT(*) AS c FROM tok
        GROUP BY doc_id, lang, tok
    ),
    doc_len AS (
        SELECT doc_id, lang AS actual_lang, SUM(c) AS n_toks FROM doc_tok
        GROUP BY doc_id, lang
    ),
    vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM tok),
    lang_tot AS (
        SELECT lang, SUM(c) AS tot,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM doc_tok GROUP BY lang
    ),
    n_all AS (SELECT SUM(n_docs) AS nd FROM lang_tot),
    model AS (
        SELECT lang, tok, SUM(c) AS cnt FROM doc_tok GROUP BY lang, tok
    ),
    langs AS (
        SELECT lang,
               ln(n_docs * 1.0 / nd)        AS prior,
               ln(1.0 / (tot + v))          AS dflt,
               tot, v
        FROM lang_tot CROSS JOIN vocab CROSS JOIN n_all
    ),
    hits AS (
        SELECT dt.doc_id, m.lang,
               SUM(dt.c * (ln((m.cnt + 1.0) / (l.tot + l.v)) - l.dflt)) AS s
        FROM doc_tok dt
        JOIN model m ON m.tok = dt.tok
        JOIN langs l ON l.lang = m.lang
        GROUP BY dt.doc_id, m.lang
    ),
    scored AS (
        SELECT d.doc_id, d.actual_lang, l.lang AS cand,
               ROUND(l.prior + d.n_toks * l.dflt + COALESCE(h.s, 0), 6)
                   AS score
        FROM doc_len d
        CROSS JOIN langs l
        LEFT JOIN hits h ON h.doc_id = d.doc_id AND h.lang = l.lang
    ),
    pred AS (
        SELECT doc_id, actual_lang, cand AS pred_lang
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score DESC, cand ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    )
    SELECT actual_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred
    GROUP BY actual_lang, pred_lang
    ORDER BY actual_lang, pred_lang
    """,
    tags=("quality", "langid", "naive_bayes", "ml"),
)
def naive_bayes_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-sample confusion matrix of the NB classifier. Plan shape:
    one token shuffle builds doc_tok (persisted — it feeds the model,
    doc lengths, AND the scoring join), the model/priors/vocab are
    lang×vocab-sized broadcasts, and scoring is a broadcast join over
    observed (doc, token) pairs only."""
    d = _t(spark, sf_dir, "documents")
    from ..functions.text import TOKEN_RE

    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.regexp_extract_all("text", F.lit(TOKEN_RE), F.lit(0))).alias(
            "tok"
        ),
    )
    doc_tok = (
        tok.groupBy("doc_id", "lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    doc_len = doc_tok.groupBy(
        "doc_id", F.col("lang").alias("actual_lang")
    ).agg(F.sum("c").alias("n_toks"))
    # Lang-cardinality stats are collected (bounded by #langs + one
    # vocab count — both from the persisted doc_tok, no corpus
    # re-explode) and re-enter the plan as a LOCAL relation: embedding
    # the ≤#langs rows replaces three nested broadcast-build jobs
    # (vocab, n_all, langs) and two cross joins with two driver
    # round-trips. prior/dflt stay JVM-side F.log over the same
    # long/double operands, so values are bit-identical to the
    # aggregate formulation.
    # ONE rollup pass fuses what were two jobs + two driver
    # round-trips (per-lang stats AND the global vocab size): the
    # rollup's grand-total row carries count_distinct(tok) = |V|,
    # the per-lang rows carry tot/n_docs. grouping() disambiguates
    # the total row from a (hypothetical) NULL lang group. (r6)
    stat_rows = (
        doc_tok.rollup("lang")
        .agg(
            F.sum("c").alias("tot"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.count_distinct("tok").alias("vocab"),
            F.grouping("lang").alias("is_total"),
        )
        .collect()
    )
    lang_rows = [r for r in stat_rows if r["is_total"] == 0]
    v = next(r["vocab"] for r in stat_rows if r["is_total"] == 1)
    nd = sum(r["n_docs"] for r in lang_rows)
    model = doc_tok.groupBy("lang", "tok").agg(F.sum("c").alias("cnt"))
    langs = spark.createDataFrame(
        [(r["lang"], int(r["tot"]), int(r["n_docs"])) for r in lang_rows],
        "lang string, tot long, n_docs long",
    ).select(
        "lang",
        F.log(F.col("n_docs") * 1.0 / F.lit(nd)).alias("prior"),
        F.log(1.0 / (F.col("tot") + F.lit(v))).alias("dflt"),
        "tot",
        F.lit(v).cast("long").alias("v"),
    )
    hits = (
        doc_tok.alias("dt")
        .join(F.broadcast(model.alias("m")), F.col("m.tok") == F.col("dt.tok"))
        .join(F.broadcast(langs.alias("l")), F.col("l.lang") == F.col("m.lang"))
        .groupBy(F.col("dt.doc_id").alias("doc_id"), F.col("m.lang").alias("lang"))
        .agg(
            F.sum(
                F.col("dt.c")
                * (
                    F.log((F.col("m.cnt") + 1.0) / (F.col("l.tot") + F.col("l.v")))
                    - F.col("l.dflt")
                )
            ).alias("s")
        )
    )
    scored = (
        doc_len.alias("d")
        .crossJoin(
            F.broadcast(langs.select("lang", "prior", "dflt")).alias("l")
        )
        .join(
            hits.alias("h"),
            (F.col("h.doc_id") == F.col("d.doc_id"))
            & (F.col("h.lang") == F.col("l.lang")),
            "left",
        )
        .select(
            F.col("d.doc_id").alias("doc_id"),
            F.col("d.actual_lang").alias("actual_lang"),
            F.col("l.lang").alias("cand"),
            F.round(
                F.col("l.prior")
                + F.col("d.n_toks") * F.col("l.dflt")
                + F.coalesce(F.col("h.s"), F.lit(0.0)),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand").asc()
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("actual_lang", F.col("cand").alias("pred_lang"))
    )
    return (
        pred.groupBy("actual_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("actual_lang", "pred_lang")
    )


# --------------------------------------------------------------------------
# Gopher-style quality-rule battery (Rae et al. 2021 §A1.1 heuristics
# adapted to the corpus): word-count bounds, mean-word-length bounds,
# minimum stopword evidence, maximum token length, and a type-token
# floor — evaluated per document in ONE pass (every statistic is an
# array HOF over the token list; no explode, no per-rule job), then
# melted to a per-rule violation ledger. This is the text analog of
# `expectations_audit`: the artifact a curation run publishes so
# downstream consumers know exactly what each rule removed.
# --------------------------------------------------------------------------
_GOPHER_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "that"]


@register(
    "gopher_quality_battery",
    sql=f"""
    WITH tk AS (
        SELECT regexp_extract_all(text, '\\S+') AS t FROM documents
    ),
    stats AS (
        SELECT len(t) AS n_words,
               list_aggregate(list_transform(t, x -> len(x)), 'sum')
                   * 1.0 / len(t) AS mean_wl,
               list_aggregate(list_transform(t, x -> len(x)), 'max')
                   AS max_wl,
               len(list_filter(t, x -> list_contains(
                   {_GOPHER_STOPWORDS!r}, x))) AS n_stop,
               len(list_distinct(t)) * 1.0 / len(t) AS ttr
        FROM tk WHERE len(t) > 0
    ),
    flags AS (
        SELECT (n_words < 50 OR n_words > 20000)       AS v_word_count,
               (mean_wl < 3 OR mean_wl > 10)           AS v_mean_word_len,
               (n_stop < 2)                            AS v_stopwords,
               (max_wl > 30)                           AS v_max_token_len,
               (ttr < 0.2)                             AS v_ttr
        FROM stats
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) FILTER (v_word_count)    AS BIGINT) AS word_count_bounds,
               CAST(COUNT(*) FILTER (v_mean_word_len) AS BIGINT) AS mean_word_len_bounds,
               CAST(COUNT(*) FILTER (v_stopwords)     AS BIGINT) AS stopword_min2,
               CAST(COUNT(*) FILTER (v_max_token_len) AS BIGINT) AS max_token_len,
               CAST(COUNT(*) FILTER (v_ttr)           AS BIGINT) AS ttr_floor,
               CAST(COUNT(*) FILTER (v_word_count OR v_mean_word_len
                    OR v_stopwords OR v_max_token_len OR v_ttr) AS BIGINT)
                   AS any_rule
        FROM flags
    )
    SELECT u.rule, u.n_violations,
           CAST(u.n_violations * 10000 // a.n_docs AS BIGINT) AS violation_bp
    FROM agg a, (
        SELECT 'word_count_bounds' AS rule, word_count_bounds AS n_violations FROM agg
        UNION ALL SELECT 'mean_word_len_bounds', mean_word_len_bounds FROM agg
        UNION ALL SELECT 'stopword_min2', stopword_min2 FROM agg
        UNION ALL SELECT 'max_token_len', max_token_len FROM agg
        UNION ALL SELECT 'ttr_floor', ttr_floor FROM agg
        UNION ALL SELECT 'any_rule', any_rule FROM agg
    ) u
    ORDER BY u.rule
    """,
    tags=("text", "quality", "gopher", "battery", "agg"),
)
def gopher_quality_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule violation counts + basis-point rates for five Gopher
    heuristics. One whole-stage-codegen pass computes all five flags
    per document (token-array HOFs), one aggregate fuses the six
    conditional counts, and the 1-row result melts via stack — never
    one job per rule (the trap rule-engine frameworks hit at scale)."""
    from ..functions.text import TOKEN_RE

    d = _t(spark, sf_dir, "documents")
    t = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)
    lens = F.transform(F.col("t"), lambda x: F.length(x))
    stop_arr = F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS])
    stats = (
        d.select(t.alias("t"))
        .filter(F.size("t") > 0)
        .select(
            F.size("t").alias("n_words"),
            (
                F.aggregate(lens, F.lit(0), lambda a, x: a + x)
                * F.lit(1.0)
                / F.size("t")
            ).alias("mean_wl"),
            F.array_max(lens).alias("max_wl"),
            F.size(
                F.filter(F.col("t"), lambda x: F.array_contains(stop_arr, x))
            ).alias("n_stop"),
            (F.size(F.array_distinct("t")) * F.lit(1.0) / F.size("t")).alias(
                "ttr"
            ),
        )
    )
    v = stats.select(
        ((F.col("n_words") < 50) | (F.col("n_words") > 20000)).alias("v_wc"),
        ((F.col("mean_wl") < 3) | (F.col("mean_wl") > 10)).alias("v_mwl"),
        (F.col("n_stop") < 2).alias("v_stop"),
        (F.col("max_wl") > 30).alias("v_mtl"),
        (F.col("ttr") < 0.2).alias("v_ttr"),
    )
    agg = v.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if("v_wc").alias("word_count_bounds"),
        F.count_if("v_mwl").alias("mean_word_len_bounds"),
        F.count_if("v_stop").alias("stopword_min2"),
        F.count_if("v_mtl").alias("max_token_len"),
        F.count_if("v_ttr").alias("ttr_floor"),
        F.count_if(
            F.col("v_wc")
            | F.col("v_mwl")
            | F.col("v_stop")
            | F.col("v_mtl")
            | F.col("v_ttr")
        ).alias("any_rule"),
    )
    stack = F.expr(
        "stack(6, 'word_count_bounds', word_count_bounds,"
        " 'mean_word_len_bounds', mean_word_len_bounds,"
        " 'stopword_min2', stopword_min2,"
        " 'max_token_len', max_token_len,"
        " 'ttr_floor', ttr_floor,"
        " 'any_rule', any_rule) AS (rule, n_violations)"
    )
    return (
        agg.select("n_docs", stack)
        .select(
            "rule",
            F.col("n_violations").cast("long").alias("n_violations"),
            F.floor(F.col("n_violations") * 10000 / F.col("n_docs"))
            .cast("long")
            .alias("violation_bp"),
        )
        .orderBy("rule")
    )
