"""Registry entries for the training-data-pipeline tier: text
analysis, deduplication (exact / n-gram Jaccard / MinHash-LSH /
SimHash) and embedding similarity search (brute-force + sign-LSH).

Oracle SQL here is partially *generated* from the same Python
constants the Spark operators use (stopword lists, hyperplane
literals, SimHash bit expressions) so both engines evaluate the exact
same formulas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..memo import PersistSlot
from ..functions.text import (
    STOPWORDS,
    bpe_token_count,
    fingerprint,
    predict_lang,
    quality_score,
    token_count,
    tokens,
)
from ..operators.dedup import exact_dedup
from ..operators.graph import cluster_sizes, connected_components
from ..operators.similarity import cosine_topk_bruteforce, cosine_topk_lsh
from ..operators.text_dedup import (
    _simhash_bit_sql,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from .queries import REGISTRY, _t, register

# shared CTE: distinct word-3-gram shingle sets (mirrors
# operators.text_dedup.shingles)
_SH_CTE = """
    sh AS (
        SELECT doc_id,
               list_distinct([concat(t[i], ' ', t[i+1], ' ', t[i+2])
                              for i in range(1, len(t) - 1)]) AS s
        FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents)
        WHERE len(t) >= 3
    )
"""

_JACCARD = (
    "ROUND(len(list_intersect({a}, {b})) * 1.0 / "
    "(len({a}) + len({b}) - len(list_intersect({a}, {b}))), 6)"
)


# --------------------------------------------------------------------------
# Token counting (whitespace-run tokens; identical regex both engines).
# --------------------------------------------------------------------------
@register(
    "token_count_documents",
    sql="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text,
                '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+'))
                AS BIGINT) AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS text_len
    FROM documents
    """,
    tags=("text", "tokenize", "bpe"),
)
def token_count_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("text_len"),
    )


# --------------------------------------------------------------------------
# Quality scoring: character-class ratios + composite score.
# --------------------------------------------------------------------------
@register(
    "text_quality_scores",
    sql="""
    SELECT doc_id,
           ROUND(alpha_ratio, 6) AS alpha_ratio,
           ROUND(digit_ratio, 6) AS digit_ratio,
           ROUND(avg_token_len, 6) AS avg_token_len,
           ROUND(alpha_ratio * 0.5 + (1.0 - digit_ratio) * 0.3
                 + least(1.0, n_tokens / 50.0) * 0.2, 6) AS quality
    FROM (
        SELECT doc_id,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                   / length(text) AS alpha_ratio,
               length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
                   / length(text) AS digit_ratio,
               length(regexp_replace(text, '\\s', '', 'g')) * 1.0
                   / len(regexp_extract_all(text, '\\S+')) AS avg_token_len,
               len(regexp_extract_all(text, '\\S+')) AS n_tokens
        FROM documents
        WHERE length(text) > 0
    ) t
    """,
    tags=("text", "quality"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    alpha = (
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")) * 1.0 / F.length("text")
    )
    digit = (
        F.length(F.regexp_replace("text", "[^0-9]", "")) * 1.0 / F.length("text")
    )
    avg_tok = (
        F.length(F.regexp_replace("text", r"\s", "")) * 1.0
        / F.size(tokens(F.col("text")))
    )
    return d.select(
        "doc_id",
        F.round(alpha, 6).alias("alpha_ratio"),
        F.round(digit, 6).alias("digit_ratio"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(quality_score(F.col("text")), 6).alias("quality"),
    )


# --------------------------------------------------------------------------
# Language-ID heuristic: stopword-hit argmax vs the declared label.
# --------------------------------------------------------------------------
def _langid_sql() -> str:
    def hits(lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return (
            "len(list_filter(regexp_extract_all(lower(text), '\\S+'), "
            f"x -> list_contains([{lst}], x)))"
        )

    return f"""
    SELECT pred_lang, lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT lang,
               CASE
                 WHEN s_en IS NULL THEN 'und'
                 WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 THEN 'und'
                 WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                 WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                 WHEN s_de >= s_fr THEN 'de'
                 ELSE 'fr'
               END AS pred_lang
        FROM (
            SELECT lang,
                   {hits('en')} AS s_en,
                   {hits('es')} AS s_es,
                   {hits('de')} AS s_de,
                   {hits('fr')} AS s_fr
            FROM documents
        ) s
    ) p
    GROUP BY pred_lang, lang
    """


@register("langid_confusion", sql=_langid_sql(), tags=("text", "langid"))
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(predict_lang(F.col("text")).alias("pred_lang"), "lang")
        .groupBy("pred_lang", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Content fingerprinting (normalized md5) — near-exact identity.
# --------------------------------------------------------------------------
@register(
    "doc_fingerprint_summary",
    sql="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(NULLIF(
                    regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), '')))
                AS BIGINT) AS n_distinct_fp
    FROM documents
    GROUP BY source
    """,
    tags=("text", "fingerprint", "dedup"),
)
def doc_fingerprint_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("source", fingerprint(F.col("text")).alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("fp")).alias("n_distinct_fp"),
        )
    )


# --------------------------------------------------------------------------
# Exact dedup (operators/dedup.exact_dedup): survivors per source.
# --------------------------------------------------------------------------
@register(
    "exact_dedup_documents",
    sql="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_survivors
    FROM (
        SELECT source, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents
    ) d
    WHERE rn = 1
    GROUP BY source
    """,
    tags=("dedup", "exact"),
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    survivors = exact_dedup(d, ["text"], "doc_id")
    return survivors.groupBy("source").agg(F.count(F.lit(1)).alias("n_survivors"))


# --------------------------------------------------------------------------
# Exact dedup of a MAP-typed frame (operators/dedup.exact_dedup's
# min_by path, r6): maps are not orderable, so min(struct) can't
# carry them — min_by carries the full row (map included) while
# comparing only the (id, row-digest) ordering key, still map-side
# combinable. The payload sums prove the survivor's map arrived
# untorn (content from the same source row as the id).
# --------------------------------------------------------------------------
@register(
    "exact_dedup_map_payload",
    sql="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_survivors,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY event_id) AS rn
        FROM events
    ) s
    WHERE rn = 1
    GROUP BY event_type
    """,
    tags=("dedup", "exact", "map", "udf-free"),
)
def exact_dedup_map_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    typed = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.from_json("props", "map<string,string>").alias("pm"),
    )
    survivors = exact_dedup(typed, ["user_id", "event_type"], "event_id")
    return survivors.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_survivors"),
        F.sum("event_id").alias("sum_event_id"),
        F.sum(F.element_at("pm", "k").cast("bigint")).alias("sum_k"),
    )


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs with size-band candidate pruning.
# --------------------------------------------------------------------------
@register(
    "ngram_jaccard_near_dup",
    sql=f"""
    WITH {_SH_CTE},
    wp AS (
        SELECT doc_id, s,
               list_sort(list_transform(s, x -> md5(x)))
                   [1 : len(s) - CAST(ceil(len(s) * 0.8) AS INT) + 1] AS pref
        FROM sh
    ),
    probe AS (SELECT doc_id, s, unnest(pref) AS digest FROM wp),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.s AS s_a, b.s AS s_b
        FROM probe a JOIN probe b ON a.digest = b.digest
        WHERE a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT doc_a, doc_b, {_JACCARD.format(a='s_a', b='s_b')} AS jaccard
        FROM cand
    )
    SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.8
    """,
    tags=("dedup", "jaccard", "ngram", "prefix_filter"),
)
def ngram_jaccard_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, threshold=0.8)


# --------------------------------------------------------------------------
# MinHash-LSH near-dup pairs (16 sigs, 4 bands × 4) + exact verify.
# --------------------------------------------------------------------------
def _minhash_ctes() -> str:
    """Full CTE chain producing ``verified(doc_a, doc_b, jaccard)`` —
    shared by the pair query and the connected-components clustering
    query so both oracles mine the identical edge set. Generated from
    the SAME A/B/P constants the Spark operator uses (see
    operators.text_dedup.MINHASH_A) so both engines evaluate the exact
    same universal-hash minhash family."""
    from ..operators.text_dedup import (
        LSH_BANDS,
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
        MINHASH_SEEDS,
    )

    rows = MINHASH_SEEDS // LSH_BANDS
    sig_cols = ",\n               ".join(
        f"MIN(({MINHASH_A[s]} * h + {MINHASH_B[s]}) % {MINHASH_P}) AS g{s}"
        for s in range(MINHASH_SEEDS)
    )
    band_selects = "\n        UNION ALL\n        ".join(
        "SELECT doc_id, {b} AS band, concat_ws(',', {cols}) AS band_key FROM sigs".format(
            b=b, cols=", ".join(f"g{b * rows + i}" for i in range(rows))
        )
        for b in range(LSH_BANDS)
    )
    return f"""{_SH_CTE},
    ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
    hashed AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(sg), 1, 15))::UBIGINT AS BIGINT)
                   % {MINHASH_P} AS h
        FROM ex
    ),
    sigs AS (
        SELECT doc_id,
               {sig_cols}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
        {band_selects}
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x
        JOIN bands y ON x.band = y.band AND x.band_key = y.band_key
                    AND x.doc_id < y.doc_id
    ),
    verified AS (
        SELECT doc_a, doc_b, {_JACCARD.format(a='a.s', b='b.s')} AS jaccard
        FROM cand
        JOIN sh a ON a.doc_id = doc_a
        JOIN sh b ON b.doc_id = doc_b
    )"""


_MINHASH_CTES = _minhash_ctes()


#: session-scoped memo of mined MinHash-LSH pair graphs, keyed by
#: (applicationId, sf_dir): three registry queries (pair mining,
#: clustering, pruning) consume the SAME graph, and testdata is
#: immutable, so within one session the expensive mine runs once and
#: the persisted (tiny) pair frame is reused — the materialized-
#: intermediate reuse a production pipeline would get from writing the
#: pair table. A new SparkSession (new applicationId) recomputes.
_MINHASH_PAIR_MEMO: dict[tuple[str, str], DataFrame] = {}


def _minhash_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    pairs = _MINHASH_PAIR_MEMO.get(key)
    if pairs is None:
        # evict entries from other (stopped/restarted) sessions so a
        # long-lived driver cycling SparkSessions can't accumulate
        # dead session graphs through this memo
        for stale in [k for k in _MINHASH_PAIR_MEMO if k[0] != app_id]:
            try:
                _MINHASH_PAIR_MEMO.pop(stale).unpersist()
            except Exception:
                pass
        from ..memo import memo_put, unpersist_frame

        d = _t(spark, sf_dir, "documents")
        pairs = minhash_lsh_pairs(d, threshold=0.8).persist()
        memo_put(
            _MINHASH_PAIR_MEMO, key, pairs, cap=8, on_evict=unpersist_frame
        )
    return pairs


@register(
    "minhash_lsh_near_dup",
    sql=f"""
    WITH {_MINHASH_CTES}
    SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= 0.8
    """,
    tags=("dedup", "minhash", "lsh"),
)
def minhash_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_pairs_cached(spark, sf_dir)


# --------------------------------------------------------------------------
# SimHash signatures (32-bit, md5-derived — generated SQL mirrors the
# Spark bit expressions exactly).
# --------------------------------------------------------------------------
def _simhash_sql() -> str:
    from ..operators.text_dedup import SIMHASH_BITS

    sums = ",\n               ".join(
        f"SUM(({_simhash_bit_sql(j, 'duckdb')}) * 2 - 1) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents
    ),
    hashed AS (SELECT doc_id, md5(t) AS h FROM tok),
    s AS (
        SELECT doc_id,
               {sums}
        FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM s
    """


@register("simhash_documents", sql=_simhash_sql(), tags=("dedup", "simhash"))
def simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return simhash(d)


# --------------------------------------------------------------------------
# SimHash pair mining: byte-blocked Hamming join (exact for distance
# ≤ 3 by pigeonhole). Oracle states the raw bit_count predicate.
# --------------------------------------------------------------------------
def _simhash_near_dup_sql() -> str:
    return f"""
    WITH s AS ({_simhash_sql()})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


@register(
    "simhash_near_dup", sql=_simhash_near_dup_sql(), tags=("dedup", "simhash", "hamming")
)
def simhash_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_dedup import simhash_near_dup

    d = _t(spark, sf_dir, "documents")
    return simhash_near_dup(d, max_hamming=3)


# --------------------------------------------------------------------------
# IDF-weighted SimHash (round 4): the plain majority vote is dominated
# by corpus-common tokens, which drags every signature toward one
# corpus point and inflates the block-collision floor ~24× above
# uniform (PERF.md r04 stress). Weighting each occurrence's vote by an
# ENGINE-STABLE integer IDF — least(16, n_docs div df + 1), integer
# division only, no libm log — is the standard counter. The bias
# audit below measures exactly the quantity the blocking design
# bounds (Σ over buckets of c·(c−1)/2, per scheme per block), so a
# user picks the scheme from MEASUREMENT, not folklore: on the
# synthetic single-topic testdata the weighted scheme wins only
# 4-5% (its ~uniform small vocabulary gives IDF little to exploit);
# on a natural Zipfian corpus the audit is the cheap way to find out.
# --------------------------------------------------------------------------
def _simhash_weighted_sig_sql() -> str:
    from ..operators.text_dedup import SIMHASH_BITS, SIMHASH_IDF_CAP

    sums = ",\n               ".join(
        f"SUM(w * (({_simhash_bit_sql(j, 'duckdb')}) * 2 - 1)) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents
    ),
    nd AS (SELECT COUNT(*) AS n FROM documents),
    dfq AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY t),
    hashed AS (
        SELECT doc_id, md5(t) AS h,
               LEAST({SIMHASH_IDF_CAP}, n // df + 1) AS w
        FROM tok JOIN dfq USING (t) CROSS JOIN nd
    ),
    s AS (
        SELECT doc_id,
               {sums}
        FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM s
    """


def _simhash_weighted_near_dup_sql() -> str:
    return f"""
    WITH sw AS ({_simhash_weighted_sig_sql()})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sw a JOIN sw b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


@register(
    "simhash_weighted_near_dup",
    sql=_simhash_weighted_near_dup_sql(),
    tags=("dedup", "simhash", "hamming", "idf"),
)
def simhash_weighted_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs under the IDF-weighted signature, mined through
    the same 4 × 15-bit pigeonhole block join (exact for hamming ≤ 3)."""
    from ..operators.text_dedup import simhash_block_pairs, simhash_weighted

    d = _t(spark, sf_dir, "documents")
    return simhash_block_pairs(simhash_weighted(d), max_hamming=3)


def _simhash_block_bias_sql() -> str:
    from ..operators.text_dedup import SIMHASH_BLOCK_BITS, SIMHASH_BLOCKS

    mask = (1 << SIMHASH_BLOCK_BITS) - 1
    ks = ", ".join(str(k) for k in range(SIMHASH_BLOCKS))
    return f"""
    WITH sp AS ({_simhash_sql()}),
    sw AS ({_simhash_weighted_sig_sql()}),
    both_s AS (
        SELECT 'plain' AS scheme, simhash FROM sp
        UNION ALL
        SELECT 'weighted' AS scheme, simhash FROM sw
    ),
    blocks AS (
        SELECT scheme, k.k AS k,
               (simhash >> ({SIMHASH_BLOCK_BITS} * k.k)) & {mask} AS v
        FROM both_s CROSS JOIN (SELECT unnest([{ks}]) AS k) k
    ),
    buckets AS (
        SELECT scheme, k, v, COUNT(*) AS c FROM blocks GROUP BY 1, 2, 3
    )
    SELECT scheme, CAST(k AS BIGINT) AS block,
           CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS bucket_pairs
    FROM buckets GROUP BY 1, 2 ORDER BY 1, 2
    """


@register(
    "simhash_block_bias_audit",
    sql=_simhash_block_bias_sql(),
    tags=("dedup", "simhash", "audit", "scale"),
)
def simhash_block_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (scheme, block): the raw candidate-pair volume the
    pigeonhole join would shuffle — Σ over block-value buckets of
    c·(c−1)/2. This is the exact quantity the LSH-style blocking
    bounds at scale; the weighted scheme's rows measure how much the
    IDF vote de-biases the signature distribution. Scale shape: ONE
    fused signature aggregate for both schemes (simhash_both — r7:
    the union of two standalone passes re-scanned the whole token
    stream; cold 9.8→5.7 s at sf0.1, one corpus scan instead of two
    at 100 TB, for ~0.4 s extra steady-state in the 120-column
    aggregate) + an 8-row output, no pairwise work."""
    from ..operators.text_dedup import (
        SIMHASH_BLOCK_BITS,
        SIMHASH_BLOCKS,
        simhash_both,
    )

    d = _t(spark, sf_dir, "documents")
    dom = 1 << SIMHASH_BLOCK_BITS
    # one fused signature pass (simhash_both) instead of two full
    # tokenize→hash→aggregate pipelines unioned — the schemes differ
    # only in vote weight, so the comparison audit shares the scan
    both = simhash_both(d).select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("plain").alias("scheme"),
                    F.col("simhash_plain").alias("simhash"),
                ),
                F.struct(
                    F.lit("weighted").alias("scheme"),
                    F.col("simhash_weighted").alias("simhash"),
                ),
            )
        ).alias("s"),
    ).select("s.scheme", "s.simhash")
    blocks = both.select(
        "scheme",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        (
                            F.shiftright(F.col("simhash"), SIMHASH_BLOCK_BITS * k)
                            % dom
                        ).alias("v"),
                    )
                    for k in range(SIMHASH_BLOCKS)
                ]
            )
        ).alias("b"),
    ).select("scheme", "b.k", "b.v")
    return (
        blocks.groupBy("scheme", "k", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("scheme", F.col("k").cast("long").alias("block"))
        .agg(
            F.expr("CAST(SUM(c * (c - 1) div 2) AS BIGINT)").alias(
                "bucket_pairs"
            )
        )
        .orderBy("scheme", "block")
    )


# --------------------------------------------------------------------------
# Rolling-hash winnowing fingerprints (MOSS-style). Oracle replays the
# identical integer polynomial with list comprehensions.
# --------------------------------------------------------------------------
def _winnowing_sql() -> str:
    from ..operators.text_dedup import WINNOW_BASE, WINNOW_K, WINNOW_MOD, WINNOW_W

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
    )
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fps,
           CAST(list_min(fps) AS BIGINT) AS min_fp,
           CAST(list_max(fps) AS BIGINT) AS max_fp
    FROM f
    """


@register(
    "winnowing_fingerprints",
    sql=_winnowing_sql(),
    tags=("text", "fingerprint", "rolling_hash"),
)
def winnowing_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_dedup import winnowing_fingerprints

    d = _t(spark, sf_dir, "documents")
    return winnowing_fingerprints(d)


# --------------------------------------------------------------------------
# Embedding similarity: exact brute-force top-k and sign-LSH bucketed.
# Query set = vec_id % 100 == 0.
# --------------------------------------------------------------------------
@register(
    "cosine_topk_bruteforce",
    sql="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    p AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor,
               ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        FROM n q JOIN n c ON c.vec_id <> q.vec_id
        WHERE q.vec_id % 100 = 0
    ),
    r AS (
        SELECT *, row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor ASC) AS rk
        FROM p
    )
    SELECT query_id, CAST(rk AS BIGINT) AS rnk, neighbor, cosine
    FROM r WHERE rk <= 5
    """,
    tags=("similarity", "knn"),
)
def cosine_topk_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return cosine_topk_bruteforce(e, F.col("vec_id") % 100 == 0, k=5)


_COSINE_TOPK_SQL = REGISTRY["cosine_topk_bruteforce"].sql


@register(
    "cosine_topk_arrow",
    sql=_COSINE_TOPK_SQL,  # same contract, same oracle — different physical plan
    tags=("similarity", "knn", "arrow", "pandas_udf"),
)
def cosine_topk_arrow_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk_arrow

    e = _t(spark, sf_dir, "embeddings")
    return cosine_topk_arrow(e, F.col("vec_id") % 100 == 0, k=5)


def _lsh_topk_sql() -> str:
    from ..functions.vectors import lsh_sql_ctes

    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    {lsh_sql_ctes()},
    p AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor,
               ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        FROM nb q JOIN nb c ON q.bkt = c.bkt AND c.vec_id <> q.vec_id
        WHERE q.vec_id % 100 = 0
    ),
    r AS (
        SELECT *, row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor ASC) AS rk
        FROM p
    )
    SELECT query_id, CAST(rk AS BIGINT) AS rnk, neighbor, cosine
    FROM r WHERE rk <= 3
    """


@register("cosine_topk_lsh", sql=_lsh_topk_sql(), tags=("similarity", "lsh", "ann"))
def cosine_topk_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(e, F.col("vec_id") % 100 == 0, k=3)


# --------------------------------------------------------------------------
# Near-dup CLUSTERING: connected components over the MinHash-LSH pair
# graph (operators/graph.py — iterative min-label propagation, one
# shuffle per round, lineage cut per round). The oracle computes the
# same transitive closure with a recursive CTE over the identical edge
# CTE chain, so both engines cluster the exact same graph.
# --------------------------------------------------------------------------
@register(
    "dedup_cluster_sizes",
    sql=f"""
    WITH RECURSIVE {_MINHASH_CTES},
    edges AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.8),
    undirected AS (
        SELECT doc_a AS src, doc_b AS dst FROM edges
        UNION
        SELECT doc_b, doc_a FROM edges
    ),
    reach(id, root) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT u.dst, r.root FROM reach r JOIN undirected u ON u.src = r.id
    ),
    comp AS (SELECT id, MIN(root) AS cluster_id FROM reach GROUP BY id)
    SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
    FROM comp GROUP BY cluster_id
    """,
    tags=("dedup", "minhash", "graph", "connected_components", "iterative"),
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    pairs = _minhash_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    nodes = d.select("doc_id")
    labels = connected_components(
        nodes, pairs, id_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    return cluster_sizes(labels)


# --------------------------------------------------------------------------
# Deterministic train/test split: hash-mod on md5 of the document text
# (no RNG → reproducible across runs, engines, and partitionings; the
# split follows the *content*, so re-ingesting the corpus re-derives
# the same membership). First hex nibble <= 'c' ⇒ 13/16 ≈ 81% train.
# --------------------------------------------------------------------------
@register(
    "deterministic_split_counts",
    sql="""
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n_chars), 6) AS avg_chars
    FROM (
      SELECT CASE WHEN substr(md5(text), 1, 1) <= 'c'
                  THEN 'train' ELSE 'test' END AS split,
             n_chars
      FROM documents
    ) s
    GROUP BY split
    """,
    tags=("text", "split", "hash"),
)
def deterministic_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    split = F.when(F.substring(F.md5("text"), 1, 1) <= "c", "train").otherwise("test")
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


# --------------------------------------------------------------------------
# Document-length histogram (fixed-width buckets): the length-profile
# view a corpus pipeline checks before choosing truncation limits.
# Map-side combinable — the shuffle carries one row per bucket.
# --------------------------------------------------------------------------
@register(
    "doc_length_histogram",
    sql="""
    SELECT CAST(FLOOR(n_chars / 64) * 64 AS BIGINT) AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY bucket_lo
    """,
    tags=("text", "histogram", "agg"),
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    bucket = (F.floor(F.col("n_chars") / 64) * 64).cast("bigint")
    return (
        d.groupBy(bucket.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic stratified sampling: per-language downsampling rates
# via content-hash bucketing (256 hex buckets) — the "rebalance
# over-represented languages" pass of a corpus pipeline, reproducible
# across runs/engines because membership follows the content hash, not
# an RNG. Contrast with df.sampleBy(), whose per-partition RNG draw is
# neither engine- nor partitioning-stable.
# --------------------------------------------------------------------------
@register(
    "stratified_sample_counts",
    sql="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           ROUND(AVG(n_chars), 6) AS avg_chars
    FROM documents
    WHERE substr(md5(text), 1, 2) <
          CASE lang WHEN 'en' THEN '33'
                    WHEN 'es' THEN '80'
                    WHEN 'de' THEN 'cc'
                    ELSE 'ff' END
    GROUP BY lang
    """,
    tags=("text", "sampling", "stratified", "hash"),
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    threshold = (
        F.when(F.col("lang") == "en", "33")
        .when(F.col("lang") == "es", "80")
        .when(F.col("lang") == "de", "cc")
        .otherwise("ff")
    )
    return (
        d.filter(F.substring(F.md5("text"), 1, 2) < threshold)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


# --------------------------------------------------------------------------
# Fixed-size document chunking with overlap (LLM-pipeline op: context-
# window packing). Chunk starts come from `sequence(1, len, stride)` —
# a pure JVM expression — and each chunk is a substring, so the whole
# op is a zero-shuffle narrow projection + explode: at 100 TB it
# pipelines through the scan with no exchange, and chunk counts scale
# with output size, not with a per-row Python crossing. Oracle mirrors
# it with generate_series + substr under DuckDB's identical 1-based
# inclusive semantics.
# --------------------------------------------------------------------------
@register(
    "doc_chunking_stats",
    sql="""
    WITH chunks AS (
        SELECT doc_id,
               u.chunk_no,
               substr(text, CAST((u.chunk_no - 1) * 384 + 1 AS BIGINT), 512)
                   AS chunk
        FROM documents,
             LATERAL (
                 SELECT UNNEST(generate_series(
                     1, CAST(CEIL(GREATEST(length(text) - 128, 1) / 384.0)
                             AS BIGINT))) AS chunk_no
             ) u
    )
    SELECT CAST(COUNT(*) AS BIGINT)                    AS n_chunks,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT)      AS n_docs,
           CAST(SUM(length(chunk)) AS BIGINT)          AS total_chars,
           CAST(MAX(length(chunk)) AS BIGINT)          AS max_chunk_len,
           ROUND(AVG(length(chunk)), 6)                AS avg_chunk_len
    FROM chunks
    """,
    tags=("text", "chunking", "explode"),
)
def doc_chunking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding chunks: size 512 chars, stride 384 (128 overlap).

    n_chunks per doc = ceil(max(len-128, 1) / 384) — every char lands
    in ≥1 chunk and the final chunk is never a bare overlap-tail of
    the previous one.
    """
    d = _t(spark, sf_dir, "documents")
    size, stride, overlap = 512, 384, 128
    n_chunks = F.ceil(
        F.greatest(F.length("text") - overlap, F.lit(1)) / F.lit(float(stride))
    ).cast("long")
    starts = F.sequence(F.lit(1).cast("long"), n_chunks)
    chunk = F.substring(
        F.col("text"),
        ((F.col("chunk_no") - 1) * stride + 1).cast("int"),
        size,
    )
    chunks = (
        d.select("doc_id", "text", F.explode(starts).alias("chunk_no"))
        .select("doc_id", "chunk_no", chunk.alias("chunk"))
    )
    return chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.sum(F.length("chunk")).alias("total_chars"),
        F.max(F.length("chunk")).cast("long").alias("max_chunk_len"),
        F.round(F.avg(F.length("chunk")), 6).alias("avg_chunk_len"),
    )


# --------------------------------------------------------------------------
# TF-IDF corpus term scoring (LLM-pipeline op: keyword extraction /
# relevance weighting). tokenize → per-(doc,term) TF → per-term DF →
# smoothed IDF ln((N+1)/(df+1))+1 → top-20 terms by total TF-IDF.
# All JVM-side: regex split + explode + two hash aggs + one broadcast
# join of the tiny DF side back onto TF. At 100 TB the only wide
# exchanges are the two aggs (both map-side combinable); doc count N
# is a 1-row broadcast. Ordering ties are broken by term for a
# deterministic top-20 cut in both engines.
# --------------------------------------------------------------------------
@register(
    "tfidf_top_terms",
    sql="""
    WITH tok AS (
        SELECT doc_id,
               UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE term <> '' GROUP BY doc_id, term
    ), df AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
    SELECT tf.term,
           ANY_VALUE(df.df) AS doc_freq,
           ROUND(SUM(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0)), 6)
               AS total_tfidf
    FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    GROUP BY tf.term
    ORDER BY total_tfidf DESC, tf.term
    LIMIT 20
    """,
    tags=("text", "tfidf", "explode", "broadcast"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Algebraic fusion: Σ_docs tf·idf(term) = idf(term)·Σ_docs tf, and
    Σ_docs tf is just the term's corpus frequency — so ONE
    groupBy(term) computing (count(*), count_distinct(doc_id))
    replaces the textbook TF→DF join-back. One shuffle, one scan,
    identical result (the oracle keeps the didactic two-level SQL)."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term"),
    ).filter(F.col("term") != "")
    # N stays inside the plan (1-row agg broadcast-cross-joined) so the
    # builder remains lazy like every other registry entry — no eager
    # count job at construction time
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    idf = F.ln((F.col("n_docs") + 1.0) / (F.col("doc_freq") + 1.0)) + 1.0
    return (
        tok.groupBy("term")
        .agg(
            F.count_distinct("doc_id").alias("doc_freq"),
            F.count(F.lit(1)).alias("total_tf"),
        )
        .join(F.broadcast(n_docs))
        .select(
            "term",
            "doc_freq",
            F.round(F.col("total_tf") * idf, 6).alias("total_tfidf"),
        )
        .orderBy(F.col("total_tfidf").desc(), "term")
        .limit(20)
    )


# --------------------------------------------------------------------------
# End-to-end dedup PRUNING: cluster near-dups (same CC pipeline as
# dedup_cluster_sizes), keep one canonical doc per cluster (min
# doc_id — exactly the CC label, since min-label propagation seeds
# labels with doc_id), and report the corpus before/after. This is the
# step a training-data pipeline actually ships: the filtered corpus,
# not just the cluster map.
# --------------------------------------------------------------------------
@register(
    "dedup_survivor_stats",
    sql=f"""
    WITH RECURSIVE {_MINHASH_CTES},
    edges AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.8),
    undirected AS (
        SELECT doc_a AS src, doc_b AS dst FROM edges
        UNION
        SELECT doc_b, doc_a FROM edges
    ),
    reach(id, root) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT u.dst, r.root FROM reach r JOIN undirected u ON u.src = r.id
    ),
    comp AS (SELECT id, MIN(root) AS cluster_id FROM reach GROUP BY id)
    SELECT CAST(COUNT(*) AS BIGINT)                            AS n_docs,
           CAST(COUNT(*) FILTER (WHERE id = cluster_id) AS BIGINT)
               AS n_survivors,
           CAST(COUNT(*) FILTER (WHERE id <> cluster_id) AS BIGINT)
               AS n_dropped,
           CAST(SUM(CASE WHEN id = cluster_id THEN d.n_chars ELSE 0 END)
                AS BIGINT)                                     AS kept_chars,
           CAST(SUM(CASE WHEN id <> cluster_id THEN d.n_chars ELSE 0 END)
                AS BIGINT)                                     AS dropped_chars
    FROM comp JOIN documents d ON comp.id = d.doc_id
    """,
    tags=("dedup", "graph", "pipeline"),
)
def dedup_survivor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = _minhash_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(
        d.select("doc_id"), pairs, id_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    joined = labels.join(
        d.select("doc_id", "n_chars"), labels["id"] == F.col("doc_id")
    )
    survivor = F.col("id") == F.col("label")
    return joined.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(survivor).alias("n_survivors"),
        F.count_if(~survivor).alias("n_dropped"),
        F.sum(F.when(survivor, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("kept_chars"),
        F.sum(F.when(~survivor, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("dropped_chars"),
    )


# --------------------------------------------------------------------------
# BM25 ranked retrieval (text-side search, complementing the embedding
# ANN tier): classic Okapi BM25 (k1=1.2, b=0.75) for a fixed query
# term set, top-10 docs. Shape at scale: the token explosion feeds two
# map-side-combinable aggs (per-doc length, per-(doc,term) TF filtered
# to query terms — the filter prunes BEFORE the shuffle, so the big
# exchange carries only query-term hits); doc-frequency and avgdl are
# tiny aggregates broadcast back. Corpus stats (N, df, avgdl) count
# only docs with ≥1 token.
# --------------------------------------------------------------------------
_BM25_TERMS = ("join", "scan", "window")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH tok AS (
        SELECT doc_id,
               UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
        FROM documents
    ), tok_ne AS (SELECT doc_id, term FROM tok WHERE term <> ''),
    dl AS (
        SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM tok_ne GROUP BY doc_id
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tok_ne WHERE term IN ({terms}) GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term)
    SELECT tf.doc_id,
           ROUND(SUM(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1}
                  * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
           ), 6) AS bm25
    FROM tf
    JOIN df ON tf.term = df.term
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id
    LIMIT 10
    """


@register("bm25_top_docs", sql=_bm25_sql(), tags=("text", "bm25", "retrieval"))
def bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivoted plan: the query-term set is small and fixed, so per-doc
    TFs become `count_if` columns of ONE doc-keyed agg (alongside doc
    length) instead of a (doc,term) agg joined back to a doc-length
    agg — the whole query is explosion → one wide agg → 1-row corpus
    stats broadcast → row-wise scoring → top-k. Two shuffles total,
    no doc-level join. The oracle keeps the textbook normalized
    formulation."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term"),
    ).filter(F.col("term") != "")
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dl"),
        *[
            F.count_if(F.col("term") == t).cast("double").alias(f"tf_{t}")
            for t in _BM25_TERMS
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.count_if(F.col(f"tf_{t}") > 0).cast("double").alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    def term_score(t: str):
        tf = F.col(f"tf_{t}")
        idf = F.ln(
            (F.col("n_docs") - F.col(f"df_{t}") + 0.5)
            / (F.col(f"df_{t}") + 0.5)
            + 1.0
        )
        denom = tf + _BM25_K1 * (
            1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
        )
        return F.when(tf > 0, idf * tf * (_BM25_K1 + 1.0) / denom).otherwise(0.0)

    score = sum((term_score(t) for t in _BM25_TERMS), F.lit(0.0))
    return (
        per_doc.join(F.broadcast(stats))
        .filter(sum((F.col(f"tf_{t}") for t in _BM25_TERMS), F.lit(0.0)) > 0)
        .select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# MinHash sketch calibration: estimated vs exact Jaccard on the LSH
# candidate set, summarized per exact-Jaccard decile. This is the
# query you run before trusting a sketch at 100 TB — it quantifies
# the 16-signature estimator's bias/error on YOUR corpus, using one
# signature pass and the same candidate join the dedup pipeline
# already does (sketch state: 16 longs/doc, mergeable; the exact
# verify exists here only to ground the calibration).
# --------------------------------------------------------------------------
def _nano_avg_6dp(col):
    """Tie-free 6-dp half-up average (see minhash_calibration): exact
    nano-unit BIGINT sum, integer-floor rounding, identical IEEE ops
    in Spark and DuckDB."""
    nanos = F.sum((col.cast("decimal(20,9)") * 1000000000).cast("long"))
    n = F.count(F.lit(1))
    return F.floor((2 * nanos + 1000 * n) / (2000.0 * n)).cast("double") / 1e6


@register(
    "minhash_calibration",
    sql=f"""
    WITH {_MINHASH_CTES},
    est AS (
        -- RAW jaccard recomputed from the shingle sets (the shared
        -- `verified` CTE rounds to 6 dp for the near-dup queries'
        -- output contract; averaging rounded values diverges from
        -- Spark's raw aggregation at scale — observed at sf0.1)
        SELECT v.doc_a, v.doc_b,
               len(list_intersect(sa.s, sb.s)) * 1.0
                 / (len(sa.s) + len(sb.s)
                    - len(list_intersect(sa.s, sb.s))) AS jaccard,
               (CASE WHEN a.g0 = b.g0 THEN 1 ELSE 0 END + CASE WHEN a.g1 = b.g1 THEN 1 ELSE 0 END + CASE WHEN a.g2 = b.g2 THEN 1 ELSE 0 END + CASE WHEN a.g3 = b.g3 THEN 1 ELSE 0 END + CASE WHEN a.g4 = b.g4 THEN 1 ELSE 0 END + CASE WHEN a.g5 = b.g5 THEN 1 ELSE 0 END + CASE WHEN a.g6 = b.g6 THEN 1 ELSE 0 END + CASE WHEN a.g7 = b.g7 THEN 1 ELSE 0 END + CASE WHEN a.g8 = b.g8 THEN 1 ELSE 0 END + CASE WHEN a.g9 = b.g9 THEN 1 ELSE 0 END + CASE WHEN a.g10 = b.g10 THEN 1 ELSE 0 END + CASE WHEN a.g11 = b.g11 THEN 1 ELSE 0 END + CASE WHEN a.g12 = b.g12 THEN 1 ELSE 0 END + CASE WHEN a.g13 = b.g13 THEN 1 ELSE 0 END + CASE WHEN a.g14 = b.g14 THEN 1 ELSE 0 END + CASE WHEN a.g15 = b.g15 THEN 1 ELSE 0 END) / 16.0 AS est
        FROM verified v
        JOIN sh sa ON sa.doc_id = v.doc_a
        JOIN sh sb ON sb.doc_id = v.doc_b
        JOIN sigs a ON a.doc_id = v.doc_a
        JOIN sigs b ON b.doc_id = v.doc_b
    )
    SELECT CAST(LEAST(FLOOR(jaccard * 10), 9) AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(FLOOR((2 * SUM(CAST(CAST(jaccard AS DECIMAL(20,9))
                                     * 1000000000 AS BIGINT))
                        + 1000 * COUNT(*))
                       / (2000.0 * COUNT(*))) AS DOUBLE) / 1e6 AS avg_exact,
           CAST(FLOOR((2 * SUM(CAST(CAST(est AS DECIMAL(20,9))
                                     * 1000000000 AS BIGINT))
                        + 1000 * COUNT(*))
                       / (2000.0 * COUNT(*))) AS DOUBLE) / 1e6 AS avg_est,
           CAST(FLOOR((2 * SUM(CAST(CAST(ABS(est - jaccard) AS DECIMAL(20,9))
                                     * 1000000000 AS BIGINT))
                        + 1000 * COUNT(*))
                       / (2000.0 * COUNT(*))) AS DOUBLE) / 1e6 AS mae
    FROM est
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("dedup", "minhash", "sketch", "calibration"),
)
def minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile MinHash estimator error over LSH candidates."""
    from ..operators.text_dedup import (
        MINHASH_SEEDS,
        _jaccard,
        minhash_band_keys,
        minhash_signatures,
        shingles,
    )

    d = _t(spark, sf_dir, "documents")
    sh = shingles(d).persist()
    sigs = minhash_signatures(d, sh=sh)
    bands = minhash_band_keys(d, sh=sh)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), on=["band", "band_key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    matches = sum(
        (
            F.when(F.col(f"a.g{s}") == F.col(f"b.g{s}"), 1).otherwise(0)
            for s in range(MINHASH_SEEDS)
        ),
        F.lit(0),
    )
    est = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .join(sigs.alias("a"), F.col("a.doc_id") == F.col("doc_a"))
        .join(sigs.alias("b"), F.col("b.doc_id") == F.col("doc_b"))
        .select(
            # raw (unrounded) jaccard, matching the oracle's `verified` CTE:
            # decile bucketing and AVG/MAE must aggregate identical values
            # on both engines; only the final aggregates are rounded.
            _jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
            (matches / 16.0).alias("est"),
        )
    )
    return (
        est.groupBy(
            F.least(F.floor(F.col("jaccard") * 10), F.lit(9))
            .cast("long")
            .alias("decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            # Integer micro-unit averages: jaccard/est are rationals of
            # small ints, and their 12-dp-quantized average LANDED ON AN
            # EXACT x.xxxxxx5 tie at sf0.1 — where Spark's and DuckDB's
            # double ROUND disagree. So: quantize each value to 9 dp as
            # an exact BIGINT of nano-units (a double can never sit ON a
            # non-dyadic decimal tie, so the cast itself is tie-free),
            # sum exactly, and round half-up with INTEGER floor math —
            # (2S + 1000n) / (2000n) in doubles ≤ 2^53, identical IEEE
            # ops on identical operands in both engines, no rounding
            # function involved at all.
            _nano_avg_6dp(F.col("jaccard")).alias("avg_exact"),
            _nano_avg_6dp(F.col("est")).alias("avg_est"),
            _nano_avg_6dp(F.abs(F.col("est") - F.col("jaccard"))).alias("mae"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# Leakage-safe train/test split: near-duplicate documents must land in
# the SAME split, or the held-out set silently overlaps the training
# set (the contamination path benchmarks suffer from). Split decision
# is made per dedup CLUSTER (md5 of the connected-component label),
# not per document — and the audit quantifies exactly what the naive
# per-document hash split would have torn apart.
# --------------------------------------------------------------------------
@register(
    "leakage_safe_split_audit",
    sql=f"""
    WITH RECURSIVE {_MINHASH_CTES},
    edges AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.8),
    undirected AS (
        SELECT doc_a AS src, doc_b AS dst FROM edges
        UNION
        SELECT doc_b, doc_a FROM edges
    ),
    reach(id, root) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT u.dst, r.root FROM reach r JOIN undirected u ON u.src = r.id
    ),
    comp AS (SELECT id, MIN(root) AS cluster_id FROM reach GROUP BY id),
    assign AS (
        SELECT c.id AS doc_id, c.cluster_id,
               CASE WHEN substr(md5(CAST(c.cluster_id AS VARCHAR)), 1, 1) <= 'c'
                    THEN 'train' ELSE 'test' END AS split,
               CASE WHEN substr(md5(d.text), 1, 1) <= 'c'
                    THEN 'train' ELSE 'test' END AS naive_split
        FROM comp c JOIN documents d ON d.doc_id = c.id
    ),
    torn AS (
        SELECT
            COUNT(CASE WHEN n_naive > 1 THEN 1 END) AS naive_torn,
            COUNT(CASE WHEN n_safe  > 1 THEN 1 END) AS safe_torn
        FROM (
            SELECT cluster_id,
                   COUNT(DISTINCT naive_split) AS n_naive,
                   COUNT(DISTINCT split)       AS n_safe
            FROM assign GROUP BY cluster_id
        )
    )
    SELECT a.split,
           CAST(COUNT(*) AS BIGINT)                    AS n_docs,
           CAST(COUNT(DISTINCT a.cluster_id) AS BIGINT) AS n_clusters,
           CAST(t.naive_torn AS BIGINT)                AS naive_torn_clusters,
           CAST(t.safe_torn AS BIGINT)                 AS safe_torn_clusters
    FROM assign a CROSS JOIN torn t
    GROUP BY a.split, t.naive_torn, t.safe_torn
    ORDER BY a.split
    """,
    tags=("dedup", "split", "leakage", "graph", "curation"),
)
def leakage_safe_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-granular deterministic split + tearing audit. Labels
    come from the memoized MinHash-LSH component pass; the split is a
    pure hash of the cluster label (content-derived: the label is the
    min doc_id, stable for a fixed corpus), so membership reproduces
    on any engine/partitioning. ``safe_torn_clusters`` is structurally
    0 — the audit PROVES the invariant rather than assuming it —
    while ``naive_torn_clusters`` counts the near-dup clusters a
    per-document hash split would have leaked across the boundary.
    Scale shape: everything after the (memoized) LSH pass is
    cluster/doc-id-sized — the torn audit aggregates label frames,
    never text."""
    from ..operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = _minhash_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(
        d.select("doc_id"), pairs, id_col="doc_id", src_col="doc_a", dst_col="doc_b"
    ).select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))
    safe = F.when(
        F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 1) <= "c",
        "train",
    ).otherwise("test")
    naive = F.when(F.substring(F.md5("text"), 1, 1) <= "c", "train").otherwise(
        "test"
    )
    assign = (
        labels.join(d.select("doc_id", "text"), "doc_id")
        .select("doc_id", "cluster_id", safe.alias("split"), naive.alias("naive_split"))
        .persist()  # feeds the torn audit AND the per-split rollup
    )
    torn = (
        assign.groupBy("cluster_id")
        .agg(
            F.count_distinct("naive_split").alias("n_naive"),
            F.count_distinct("split").alias("n_safe"),
        )
        .agg(
            F.count_if(F.col("n_naive") > 1).alias("naive_torn"),
            F.count_if(F.col("n_safe") > 1).alias("safe_torn"),
        )
    )
    return (
        assign.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("cluster_id").cast("long").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(torn))
        .select(
            "split",
            "n_docs",
            "n_clusters",
            F.col("naive_torn").cast("long").alias("naive_torn_clusters"),
            F.col("safe_torn").cast("long").alias("safe_torn_clusters"),
        )
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# Matryoshka-style dimension-truncation audit: how much of the full
# 64-d top-k survives when search runs on the first 16 dims only
# (prefix-normalized, MRL semantics). The question every
# embedding-storage budget decision asks — answered from the corpus
# itself, per query.
# --------------------------------------------------------------------------
_TRUNC_DIMS = 16

#: persisted top-k frames from the PREVIOUS dim_truncation_recall call
#: (released at the next call's entry — the memo.PersistSlot discipline).
_TRUNC_SLOT = PersistSlot()


@register(
    "dim_truncation_recall",
    sql=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    fn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    tn AS (SELECT vec_id, v[1:{_TRUNC_DIMS}] AS v,
                  sqrt(list_dot_product(v[1:{_TRUNC_DIMS}], v[1:{_TRUNC_DIMS}]))
                      AS nrm
           FROM e),
    ftop AS (
        SELECT query_id, neighbor FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                       ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6)
                           DESC, c.vec_id ASC) AS rk
            FROM fn q JOIN fn c ON c.vec_id <> q.vec_id
            WHERE q.vec_id % 100 = 0
        ) WHERE rk <= 5
    ),
    ttop AS (
        SELECT query_id, neighbor FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                       ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6)
                           DESC, c.vec_id ASC) AS rk
            FROM tn q JOIN tn c ON c.vec_id <> q.vec_id
            WHERE q.vec_id % 100 = 0
        ) WHERE rk <= 5
    )
    SELECT f.query_id,
           CAST(5 AS BIGINT) AS k,
           CAST(COUNT(t.neighbor) AS BIGINT) AS n_overlap,
           ROUND(COUNT(t.neighbor) * 1.0 / 5, 6) AS recall
    FROM ftop f
    LEFT JOIN ttop t ON t.query_id = f.query_id AND t.neighbor = f.neighbor
    GROUP BY f.query_id
    ORDER BY f.query_id
    """,
    tags=("similarity", "matryoshka", "truncation", "ann"),
)
def dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query overlap between full-dimension exact top-5 and
    first-16-dims exact top-5 (both prefix-normalized — the MRL
    truncation rule). Reuses the broadcast-query brute-force operator
    for both passes; the truncated pass simply slices the embedding
    column before the same plan, so at scale the audit costs two
    query-broadcast scans and nothing new. Registry analog of the
    recall contract the ANN tests use, expressed as an oracle-checked
    corpus measurement. On THIS corpus recall is near zero — i.i.d.
    random dims carry equal information, the truncation worst case;
    MRL-trained embeddings front-load information and keep most of it.
    The audit is what tells you which regime your corpus is in."""
    _TRUNC_SLOT.release()
    e = _t(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") % 100 == 0
    # persisted (r10): the full-dimension top-k feeds BOTH the overlap
    # semi-join and the per-query k aggregate — unpersisted, the whole
    # brute-force pass (a corpus scan per reference) ran twice. The
    # cached frame is queries x k rows, tiny at any scale.
    full = (
        cosine_topk_bruteforce(e, pred, k=5)
        .select("query_id", "neighbor")
        .persist()
    )
    _TRUNC_SLOT.hold(full)
    trunc_e = e.withColumn("embedding", F.slice("embedding", 1, _TRUNC_DIMS))
    trunc = cosine_topk_bruteforce(trunc_e, pred, k=5).select(
        "query_id", "neighbor"
    )
    ov = (
        full.join(trunc, ["query_id", "neighbor"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        full.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
        .join(ov, "query_id", "left")
        .select(
            "query_id",
            "k",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.round(F.coalesce("n_overlap", F.lit(0)) * 1.0 / F.col("k"), 6).alias(
                "recall"
            ),
        )
        .orderBy("query_id")
    )


# --------------------------------------------------------------------------
# PMI collocations: corpus-level bigram association strength —
# pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with a min-count support cut.
# The corpus-analysis op behind phrase mining / tokenizer-merge
# diagnostics (which adjacent pairs cohere more than chance predicts).
# --------------------------------------------------------------------------
_PMI_MIN_COUNT = 5
_PMI_TOP = 20


@register(
    "pmi_collocations",
    sql=f"""
    WITH tok AS (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents
    ),
    bg AS (
        SELECT t[i] AS a, t[i + 1] AS b
        FROM tok, UNNEST(range(1, len(t))) AS u(i)
        WHERE len(t) >= 2
    ),
    uni AS (
        SELECT unnest(t) AS w FROM tok
    ),
    nb AS (SELECT a, b, COUNT(*) AS c_ab FROM bg GROUP BY a, b),
    nu AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
    tot AS (
        SELECT (SELECT COUNT(*) FROM bg) AS t_bg,
               (SELECT COUNT(*) FROM uni) AS t_un
    )
    SELECT a, b,
           CAST(c_ab AS BIGINT) AS n_pair,
           ROUND(ln((c_ab * 1.0 / t_bg)
                 / ((ua.c * 1.0 / t_un) * (ub.c * 1.0 / t_un))), 6) AS pmi
    FROM nb
    JOIN nu ua ON ua.w = nb.a
    JOIN nu ub ON ub.w = nb.b
    CROSS JOIN tot
    WHERE c_ab >= {_PMI_MIN_COUNT}
    ORDER BY pmi DESC, a, b
    LIMIT {_PMI_TOP}
    """,
    tags=("text", "collocation", "pmi", "ngram"),
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by PMI. ONE token-array scan feeds both the
    bigram explode and the unigram explode; the unigram frequency
    table is vocabulary-sized and broadcast back onto the (already
    support-filtered) bigram aggregate, and the two scalar totals ride
    a 1-row cross join — the corpus shuffles only exploded tokens,
    once per granularity. Support cut BEFORE the joins: at web scale
    the bigram tail is the cardinality bomb, and c_ab >= 5 kills it
    ahead of any join or sort."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(tokens(F.col("text")).alias("t")).persist()
    bg = (
        tok.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice("t", 2, F.size("t") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    uni = tok.select(F.explode("t").alias("w"))
    nb = (
        bg.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_COUNT)
    )
    nu = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = bg.agg(F.count(F.lit(1)).alias("t_bg")).crossJoin(
        uni.agg(F.count(F.lit(1)).alias("t_un"))
    )
    ua = nu.select(F.col("w").alias("a"), F.col("c").alias("c_a"))
    ub = nu.select(F.col("w").alias("b"), F.col("c").alias("c_b"))
    pmi = F.round(
        F.log(
            (F.col("c_ab") * 1.0 / F.col("t_bg"))
            / ((F.col("c_a") * 1.0 / F.col("t_un")) * (F.col("c_b") * 1.0 / F.col("t_un")))
        ),
        6,
    )
    return (
        nb.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot))
        .select("a", "b", F.col("c_ab").cast("long").alias("n_pair"), pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "a", "b")
        .limit(_PMI_TOP)
    )


# --------------------------------------------------------------------------
# The LLM-tier capstone, composed end-to-end (the training-data analog
# of elb_pipeline_hourly): near-dup dedup (MinHash-LSH → connected
# components → canonical survivor) → quality floor → concat-and-chunk
# packing into 512-token windows → per-source export accounting.
# Every stage reuses an already-oracle-checked operator; the
# composition itself is what this query pins.
# --------------------------------------------------------------------------
_EXPORT_MIN_TOKENS = 16
_EXPORT_WINDOW = 512


@register(
    "training_export_pipeline",
    sql=f"""
    WITH RECURSIVE {_MINHASH_CTES},
    edges AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.8),
    undirected AS (
        SELECT doc_a AS src, doc_b AS dst FROM edges
        UNION
        SELECT doc_b, doc_a FROM edges
    ),
    reach(id, root) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT u.dst, r.root FROM reach r JOIN undirected u ON u.src = r.id
    ),
    comp AS (SELECT id, MIN(root) AS cluster_id FROM reach GROUP BY id),
    raw AS (
        SELECT d.source, d.doc_id,
               len(regexp_extract_all(d.text, '\\S+')) AS n_tok,
               c.id = c.cluster_id AS is_survivor
        FROM documents d JOIN comp c ON c.id = d.doc_id
    ),
    kept AS (
        SELECT source, doc_id, n_tok FROM raw
        WHERE is_survivor AND n_tok >= {_EXPORT_MIN_TOKENS}
    ),
    packed AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS kept_docs,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               CAST((SUM(n_tok) - 1) // {_EXPORT_WINDOW} + 1 AS BIGINT)
                   AS n_windows,
               CAST(((SUM(n_tok) - 1) // {_EXPORT_WINDOW} + 1) * {_EXPORT_WINDOW}
                    - SUM(n_tok) AS BIGINT) AS tail_waste_tokens
        FROM kept GROUP BY source
    ),
    totals AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs_raw,
               CAST(COUNT(CASE WHEN NOT is_survivor THEN 1 END) AS BIGINT)
                   AS dropped_dups,
               CAST(COUNT(CASE WHEN is_survivor
                                AND n_tok < {_EXPORT_MIN_TOKENS} THEN 1 END)
                    AS BIGINT) AS dropped_short
        FROM raw GROUP BY source
    )
    SELECT t.source, t.n_docs_raw, t.dropped_dups, t.dropped_short,
           COALESCE(p.kept_docs, 0) AS kept_docs,
           COALESCE(p.total_tokens, 0) AS total_tokens,
           COALESCE(p.n_windows, 0) AS n_windows,
           COALESCE(p.tail_waste_tokens, 0) AS tail_waste_tokens
    FROM totals t LEFT JOIN packed p USING (source)
    ORDER BY t.source
    """,
    tags=("training", "e2e", "dedup", "packing", "pipeline"),
)
def training_export_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed export: the memoized LSH pass feeds connected
    components once per session; survivor pruning, the quality floor,
    and the packing accounting all share the per-source partitioning,
    so beyond the (amortized) dedup pass the whole export is two
    per-source hash aggregates and a sources-sized join — concat-and-
    chunk window counts are pure integer functions of the per-source
    token total, no running window needed. The output is the
    accounting a data-engineering run signs off on: what was dropped
    (dups vs short), what ships (docs, tokens, windows, tail waste)."""
    from ..operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = _minhash_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(
        d.select("doc_id"), pairs, id_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    raw = (
        d.select("source", "doc_id", token_count(F.col("text")).alias("n_tok"))
        .join(
            labels.select(
                F.col("id").alias("doc_id"),
                (F.col("id") == F.col("label")).alias("is_survivor"),
            ),
            "doc_id",
        )
        .persist()  # feeds the drop accounting AND the packing chain
    )
    kept = raw.filter(
        F.col("is_survivor") & (F.col("n_tok") >= _EXPORT_MIN_TOKENS)
    )
    total = F.sum("n_tok")
    n_windows = ((total - 1) / _EXPORT_WINDOW).cast("long") + 1
    packed = (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("kept_docs"),
            total.cast("long").alias("total_tokens"),
            n_windows.alias("n_windows"),
            (n_windows * _EXPORT_WINDOW - total)
            .cast("long")
            .alias("tail_waste_tokens"),
        )
    )
    totals = raw.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_raw"),
        F.count_if(~F.col("is_survivor")).cast("long").alias("dropped_dups"),
        F.count_if(
            F.col("is_survivor") & (F.col("n_tok") < _EXPORT_MIN_TOKENS)
        ).cast("long").alias("dropped_short"),
    )
    return (
        totals.join(packed, "source", "left")
        .select(
            "source",
            "n_docs_raw",
            "dropped_dups",
            "dropped_short",
            F.coalesce("kept_docs", F.lit(0)).cast("long").alias("kept_docs"),
            F.coalesce("total_tokens", F.lit(0)).cast("long").alias("total_tokens"),
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("tail_waste_tokens", F.lit(0))
            .cast("long")
            .alias("tail_waste_tokens"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Containment near-dup: asymmetric overlap |A∩B|/min(|A|,|B|) over the
# SAME LSH candidate set as the Jaccard miner. Catches subset
# duplication (one document embedded inside another — quotes, reposts
# with boilerplate) that symmetric Jaccard under-scores: a 100-shingle
# doc fully contained in a 1000-shingle doc has J ≈ 0.1 but
# containment 1.0. Thresholding is exact integer arithmetic
# (5*inter >= 4*min) and the emitted containment is integer basis
# points — no doubles anywhere.
# --------------------------------------------------------------------------
@register(
    "shingle_containment_pairs",
    sql=f"""
    WITH {_MINHASH_CTES}
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
           CAST(len(a.s) AS BIGINT) AS n_a,
           CAST(len(b.s) AS BIGINT) AS n_b,
           CAST(10000 * len(list_intersect(a.s, b.s))
                // least(len(a.s), len(b.s)) AS BIGINT) AS containment_bp
    FROM cand c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b
    WHERE 5 * len(list_intersect(a.s, b.s)) >= 4 * least(len(a.s), len(b.s))
    ORDER BY c.doc_a, c.doc_b
    """,
    tags=("dedup", "containment", "lsh", "text"),
)
def shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs from the shared LSH band join, scored by
    max-containment (|A∩B| / min set size) with an exact integer 0.8
    threshold. Scale shape identical to the Jaccard miner: candidates
    are band-key equi-joins (O(docs x bands)), verification joins only
    candidate ids back to shingle sets."""
    from ..operators.text_dedup import minhash_band_keys, shingles

    d = _t(spark, sf_dir, "documents")
    # persisted for the same two reasons as minhash_lsh_pairs: the
    # band gen + both verify joins reuse it, and an UNPERSISTED
    # shingle column makes the fused explode re-evaluate the shingle
    # construction per exploded row (the r6 streaming-ingest finding —
    # ~5x the materialized cost)
    sh = shingles(d).persist()
    bands = minhash_band_keys(d, sh=sh)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), on=["band", "band_key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    j = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb")),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb"))).cast("long")
    na = F.size(F.col("sa")).cast("long")
    nb = F.size(F.col("sb")).cast("long")
    return (
        j.select(
            "doc_a",
            "doc_b",
            inter.alias("n_inter"),
            na.alias("n_a"),
            nb.alias("n_b"),
        )
        .filter(5 * F.col("n_inter") >= 4 * F.least(F.col("n_a"), F.col("n_b")))
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            "n_a",
            "n_b",
            F.expr(
                "CAST(10000 * n_inter div least(n_a, n_b) AS BIGINT)"
            ).alias("containment_bp"),
        )
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# Feature hashing (the hashing trick): fixed-width featurization with
# no vocabulary pass. TF-IDF/BM25 need a vocabulary (one extra
# corpus reduce + a join or broadcast that grows with vocab size);
# the hashing trick maps each token straight to one of 2^k buckets
# with a +/-1 sign bit, so featurization is a single narrow pass with
# a fixed output width — the standard trick when the vocabulary is
# unbounded (URLs, user agents, ngrams) or the model wants a fixed
# dense width. Collisions are the accepted trade; the signed sum
# makes them unbiased (Weinberger et al., ICML 2009).
# --------------------------------------------------------------------------
_FH_BUCKETS = 64


@register(
    "feature_hashing_vectors",
    sql=f"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
               AS token
        FROM documents WHERE doc_id < 200
    ),
    h AS (
        SELECT doc_id,
               ('0x' || substr(md5('fh|' || token), 1, 15))::UBIGINT
                   % {_FH_BUCKETS} AS bucket,
               CASE WHEN ('0x' || substr(md5('sg|' || token), 1, 15))::UBIGINT
                    % 2 = 0 THEN 1 ELSE -1 END AS sign
        FROM tok
    )
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(SUM(sign) AS BIGINT) AS weight,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM h
    GROUP BY doc_id, bucket
    HAVING SUM(sign) != 0
    ORDER BY doc_id, bucket
    """,
    tags=("text", "featurize", "hashing_trick", "llm_pipeline"),
)
def feature_hashing_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed feature hashing over the first 200 documents (bounded
    output for the oracle compare; the plan is row-local either way):
    lowercase alnum tokens hash to one of 64 buckets via the portable
    md5 bucketing (identical in both engines), a second independent
    md5 bit gives the +/-1 sign, and per-(doc, bucket) signed sums
    form the sparse vector in long format. Zero-weight cells (exact
    sign cancellation) drop on both sides.

    Scale shape: explode → hash → groupBy(doc_id, bucket) with
    map-side partial aggregation; no vocabulary reduce, no join, no
    broadcast — output width fixed at 64 regardless of corpus size.
    """
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("token"),
    )
    # long casts: lossless for the 60-bit conv value, and the per-token
    # integer mod stays in codegen (hash_bucket rationale, r7) — this
    # runs twice per exploded token, the hottest hash path in the tier
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("fh|"), F.col("token"))), 1, 15), 16, 10)
        .cast("long")
        % _FH_BUCKETS
    )
    sign = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("sg|"), F.col("token"))), 1, 15), 16, 10)
        .cast("long")
        % 2
        == 0,
        1,
    ).otherwise(-1)
    return (
        tok.select("doc_id", bucket.alias("bucket"), sign.alias("sign"))
        .groupBy("doc_id", "bucket")
        .agg(
            F.sum("sign").cast("long").alias("weight"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .filter(F.col("weight") != 0)
        .orderBy("doc_id", "bucket")
    )
