"""Privacy / compliance tier: PII scrubbing and re-identification
audits.

A training-data pipeline has a scrub stage between ingest and export:
detect personal identifiers (emails, phone numbers, IP addresses),
mask them, and prove — auditable by an external engine — that the
masked corpus is what ships. The reference touches this domain
implicitly (client IPs are the enrichment key; log anonymization
zeroes/strips them before retention), and the engine generalizes it
the way the rest of the LLM tier does.

Both queries are pure JVM expression work (regexp_* built-ins and
hash aggregates — no UDFs, no shuffle beyond the final group-sized
aggregate), so they ride whole-stage codegen and scale linearly with
the corpus.

Cross-engine notes: the synthetic PII fixture column is constructed
from table keys with identical string rendering in Spark and DuckDB
(integer → decimal digits, no locale), the regexes avoid
backreferences in replacements (Java spells them ``$1``, RE2 ``\\1``),
and redacted CONTENT is verified by the portable 60-bit md5 digest —
the audit proves the bytes, not just the counts.

The k-anonymity audit is the other half of compliance review: how
many quasi-identifier groups are small enough to re-identify, before
any release of "anonymized" aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..memo import PersistSlot
from .queries import _t, register

#: Detection patterns — valid under BOTH Java regex (Spark) and RE2
#: (DuckDB): no lookaround, no backreferences, \b supported by both.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{7}\b"

#: Deterministic synthetic contact line per customer, identical in
#: both engines (fixture for the scrubber — the testdata itself is
#: PII-free by design).
_CONTACT_SQL = (
    "('user' || c_custkey || '@example.com call ' "
    "|| lpad(CAST(c_custkey * 7 % 10000000 AS VARCHAR), 7, '0') "
    "|| ' from 10.' || (c_custkey % 256) || '.' || (c_nationkey % 25) || '.9')"
)


def _contact_col():
    return F.concat(
        F.lit("user"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com call "),
        F.lpad((F.col("c_custkey") * 7 % 10000000).cast("string"), 7, "0"),
        F.lit(" from 10."),
        (F.col("c_custkey") % 256).cast("string"),
        F.lit("."),
        (F.col("c_nationkey") % 25).cast("string"),
        F.lit(".9"),
    )


@register(
    "pii_redaction_audit",
    sql=rf"""
    WITH contact AS (
        SELECT c_mktsegment, {_CONTACT_SQL} AS txt FROM customer
    ),
    red AS (
        SELECT c_mktsegment, txt,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(txt, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{IPV4_RE}', '<IP>', 'g'),
                 '{PHONE_RE}', '<PHONE>', 'g') AS clean
        FROM contact
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(len(regexp_extract_all(txt, '{EMAIL_RE}'))) AS BIGINT)
               AS n_emails,
           CAST(SUM(len(regexp_extract_all(txt, '{IPV4_RE}'))) AS BIGINT)
               AS n_ips,
           CAST(SUM(len(regexp_extract_all(clean,
                '{EMAIL_RE}|{IPV4_RE}|{PHONE_RE}'))) AS BIGINT)
               AS n_residual,
           CAST(SUM(('0x' || substr(md5(clean), 1, 15))::UBIGINT)
                % 9223372036854775807 AS BIGINT) AS clean_digest
    FROM red
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("privacy", "pii", "redaction", "regex", "llm_pipeline"),
)
def pii_redaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect-and-mask over a deterministic contact-line fixture:
    emails, IPv4 addresses, then 7-digit phone numbers are each
    replaced with a typed placeholder, and the audit reports per
    segment (a) how many identifiers were found, (b) that ZERO
    survive redaction (``n_residual``), and (c) the portable digest
    of the redacted text — so the oracle hash-verifies the masked
    BYTES, not merely the counts. All detection/masking is
    ``regexp_*`` built-ins chained in one codegen'd projection; the
    only exchange is the segments-sized final aggregate."""
    c = _t(spark, sf_dir, "customer")
    txt = _contact_col()
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(txt, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    rows = c.select(
        "c_mktsegment",
        txt.alias("txt"),
        clean.alias("clean"),
    )
    digest = (
        F.conv(F.substring(F.md5("clean"), 1, 15), 16, 10).cast("decimal(20,0)")
    )
    return (
        rows.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.regexp_count("txt", F.lit(EMAIL_RE))).alias("n_emails"),
            F.sum(F.regexp_count("txt", F.lit(IPV4_RE))).alias("n_ips"),
            F.sum(
                F.regexp_count(
                    "clean", F.lit(f"{EMAIL_RE}|{IPV4_RE}|{PHONE_RE}")
                )
            ).alias("n_residual"),
            (F.sum(digest) % F.lit(9223372036854775807))
            .cast("long")
            .alias("clean_digest"),
        )
        .orderBy("c_mktsegment")
    )


#: k-anonymity threshold: groups smaller than this are re-identifiable.
K_ANON = 5


@register(
    "k_anonymity_audit",
    sql=f"""
    WITH qi AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
               COUNT(*) AS sz
        FROM customer
        GROUP BY c_nationkey, c_mktsegment, bal_band
    )
    SELECT CAST(COUNT(*) AS BIGINT)                       AS n_groups,
           CAST(COUNT(*) FILTER (WHERE sz < {K_ANON}) AS BIGINT)
                                                          AS n_small_groups,
           CAST(MIN(sz) AS BIGINT)                        AS min_group_size,
           CAST(SUM(CASE WHEN sz < {K_ANON} THEN sz ELSE 0 END) AS BIGINT)
                                                          AS rows_at_risk,
           ROUND(SUM(CASE WHEN sz < {K_ANON} THEN sz ELSE 0 END) * 1.0
                 / SUM(sz), 6)                            AS risk_frac
    FROM qi
    """,
    tags=("privacy", "k_anonymity", "agg", "llm_pipeline"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity over the quasi-identifier triple (nation, market
    segment, account-balance band): a released row is re-identifiable
    when its QI group has fewer than k=5 members. Two stacked
    aggregates — group sizes, then one summary row — both map-side
    combinable; the QI cardinality (25x5x~12 bands) bounds state
    regardless of row count, so the audit costs one scan at any
    scale."""
    c = _t(spark, sf_dir, "customer")
    qi = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("sz"))
    small = F.col("sz") < K_ANON
    return qi.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.count_if(small).alias("n_small_groups"),
        F.min("sz").alias("min_group_size"),
        F.sum(F.when(small, F.col("sz")).otherwise(F.lit(0))).alias(
            "rows_at_risk"
        ),
        F.round(
            F.sum(F.when(small, F.col("sz")).otherwise(F.lit(0)))
            * 1.0
            / F.sum("sz"),
            6,
        ).alias("risk_frac"),
    )


# --------------------------------------------------------------------------
# Right-to-be-forgotten audit: erase an entity set EVERYWHERE it is
# referenced, and PROVE the erasure. A deletion request at 100 TB is
# not one DELETE — it is an anti-join rewrite of every table keyed by
# the entity plus evidence: per-table rows removed, zero remaining
# references, and a digest of the surviving rows (so downstream
# consumers can verify they hold the post-erasure version). The
# request set is a deterministic md5 stratum of customers, so both
# engines erase identical entities and the audit hash-matches.
# --------------------------------------------------------------------------
from .queries_sampling import _sql_bucket as _priv_sql_bucket
from .queries_sampling import hash_bucket as _priv_hash_bucket

_FORGET_BP = 200  # 2% of customers file a deletion request

#: persisted frames from the PREVIOUS forget_entity_audit call,
#: released at the next call's entry (memo.PersistSlot discipline).
_FORGET_SLOT = PersistSlot()


@register(
    "forget_entity_audit",
    sql=f"""
    WITH req AS (
        SELECT c_custkey FROM customer
        WHERE {_priv_sql_bucket("CAST(c_custkey AS VARCHAR)", "forget|")}
              < {_FORGET_BP}
    ),
    cust AS (
        SELECT c.*,
               c_custkey IN (SELECT c_custkey FROM req) AS erased
        FROM customer c
    ),
    ords AS (
        SELECT o.*,
               o_custkey IN (SELECT c_custkey FROM req) AS erased
        FROM orders o
    ),
    cs AS (
        SELECT COUNT(CASE WHEN erased THEN 1 END) AS removed,
               COUNT(CASE WHEN NOT erased THEN 1 END) AS remaining,
               SUM(CASE WHEN NOT erased THEN
                   ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
                       ::UBIGINT END) % 9223372036854775807 AS digest
        FROM cust
    ),
    os AS (
        SELECT COUNT(CASE WHEN erased THEN 1 END) AS removed,
               COUNT(CASE WHEN NOT erased THEN 1 END) AS remaining,
               SUM(CASE WHEN NOT erased THEN
                   ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                       ::UBIGINT END) % 9223372036854775807 AS digest
        FROM ords
    ),
    leftover AS (
        -- completeness proof: the surviving orders must reference
        -- ZERO requested customers
        SELECT COUNT(*) AS n FROM ords
        WHERE NOT erased
          AND o_custkey IN (SELECT c_custkey FROM req)
    )
    SELECT 'customer' AS tbl,
           CAST(cs.removed AS BIGINT) AS rows_removed,
           CAST(cs.remaining AS BIGINT) AS rows_remaining,
           CAST(cs.digest AS BIGINT) AS survivor_digest,
           CAST(leftover.n AS BIGINT) AS remaining_refs
    FROM cs CROSS JOIN leftover
    UNION ALL
    SELECT 'orders',
           CAST(os.removed AS BIGINT),
           CAST(os.remaining AS BIGINT),
           CAST(os.digest AS BIGINT),
           CAST(leftover.n AS BIGINT)
    FROM os CROSS JOIN leftover
    ORDER BY tbl
    """,
    tags=("privacy", "gdpr", "erasure", "digest"),
)
def forget_entity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erase a deterministic 2% customer stratum from every table
    that references it (customer directly, orders via o_custkey) and
    emit the compliance evidence per table: rows removed, rows
    remaining, a key digest of the survivors, and the remaining-
    reference count — which must be zero, and is computed as a probe
    against the surviving orders, not assumed.

    Scale shape: the request set broadcasts (it is tiny by nature);
    each table rewrite is ONE broadcast anti-join — a scan-shaped
    pass per table, no data-sized shuffle; digests fold map-side."""
    _FORGET_SLOT.release()
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    # persisted (r10): req builds THREE broadcast sides (two anti-joins
    # + the completeness probe) and each build re-scanned customer;
    # the request set is tiny by nature (2% of keys)
    req = (
        c.filter(
            _priv_hash_bucket(F.col("c_custkey"), "forget|") < _FORGET_BP
        )
        .select("c_custkey")
        .persist()
    )
    _FORGET_SLOT.hold(req)

    def digest(col):
        return (
            F.sum(
                F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
                .cast("decimal(20,0)")
            )
            % F.lit(9223372036854775807)
        ).cast("long")

    surv_c = c.join(F.broadcast(req), "c_custkey", "left_anti")
    surv_o = o.join(
        F.broadcast(req), o.o_custkey == req.c_custkey, "left_anti"
    )
    # persisted (r10): the 1-row completeness probe feeds BOTH output
    # arms — unpersisted it re-ran its whole orders pass per arm. This
    # stays a genuine anti-join OBSERVATION (the audit's point: the
    # zero remaining references are measured over the erased output,
    # not assumed from the erasure's definition).
    leftover = (
        surv_o.join(F.broadcast(req), surv_o.o_custkey == req.c_custkey)
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    _FORGET_SLOT.hold(leftover)

    # r11 (VERDICT r10 item 5, 6 → 4 scans):
    # - customer rows_removed = |req| — req IS a subset of customer by
    #   construction (it is the filtered customer scan), so the total-
    #   count scan added nothing the request set doesn't already prove;
    #   counting the persisted req is an InMemoryTableScan, not a scan.
    # - orders removed/remaining/digest fold out of ONE flagged
    #   broadcast-left-join pass (erased = matched request key) instead
    #   of an anti-join agg plus a separate total-count scan — same
    #   arithmetic, one orders pass fewer.
    n_req = req.agg(F.count(F.lit(1)).alias("removed"))
    cs = (
        surv_c.agg(
            F.count(F.lit(1)).alias("remaining"),
            digest(F.col("c_custkey")).alias("survivor_digest"),
        )
        .crossJoin(n_req)
        .crossJoin(leftover)
        .select(
            F.lit("customer").alias("tbl"),
            F.col("removed").cast("long").alias("rows_removed"),
            F.col("remaining").cast("long").alias("rows_remaining"),
            "survivor_digest",
            F.col("n").cast("long").alias("remaining_refs"),
        )
    )
    erased = req.c_custkey.isNotNull()
    os_ = (
        o.join(F.broadcast(req), o.o_custkey == req.c_custkey, "left")
        .agg(
            F.count_if(erased).alias("removed"),
            F.count_if(~erased).alias("remaining"),
            digest(
                F.when(~erased, F.col("o_orderkey"))
            ).alias("survivor_digest"),
        )
        .crossJoin(leftover)
        .select(
            F.lit("orders").alias("tbl"),
            F.col("removed").cast("long").alias("rows_removed"),
            F.col("remaining").cast("long").alias("rows_remaining"),
            "survivor_digest",
            F.col("n").cast("long").alias("remaining_refs"),
        )
    )
    return cs.unionByName(os_).orderBy("tbl")


# --------------------------------------------------------------------------
# l-diversity: the companion risk metric to k-anonymity. A QI group
# can be large (k-anonymous) yet expose everyone in it if the
# SENSITIVE attribute is constant within the group — l-diversity
# requires >= l distinct sensitive values per group.
# --------------------------------------------------------------------------
_L_DIVERSITY_L = 2


@register(
    "l_diversity_audit",
    sql=f"""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment,
               COUNT(*) AS group_size,
               COUNT(DISTINCT
                   CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS l_distinct
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(COUNT(CASE WHEN l_distinct < {_L_DIVERSITY_L} THEN 1 END)
               AS BIGINT) AS n_below_l,
           CAST(SUM(CASE WHEN l_distinct < {_L_DIVERSITY_L}
                         THEN group_size ELSE 0 END) AS BIGINT)
               AS n_exposed_rows,
           CAST(MIN(l_distinct) AS BIGINT) AS min_l,
           CAST(SUM(group_size) AS BIGINT) AS n_rows
    FROM g
    """,
    tags=("privacy", "l_diversity", "risk"),
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity over the (nation, market segment) quasi-identifier
    with the account-balance band (1000-unit buckets) as the
    sensitive attribute: groups where every member falls in the SAME
    band leak the band to anyone who can place a person in the group,
    however k-anonymous the group is. One grouped aggregate + one
    5-slot summary; integer banding keeps both engines bit-equal."""
    c = _t(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("long")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct(band).alias("l_distinct"),
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.count(F.when(F.col("l_distinct") < _L_DIVERSITY_L, 1)).alias(
            "n_below_l"
        ),
        F.sum(
            F.when(
                F.col("l_distinct") < _L_DIVERSITY_L, F.col("group_size")
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_exposed_rows"),
        F.min("l_distinct").cast("long").alias("min_l"),
        F.sum("group_size").cast("long").alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Field-level encryption round trip: aes_encrypt/aes_decrypt (GCM,
# random IV per value — ciphertexts are non-deterministic, which is
# the point) proven lossless by digesting the DECRYPTED bytes. The
# oracle digests the plaintext straight from the table: a hash match
# proves encrypt→decrypt returned every name byte-identically.
# --------------------------------------------------------------------------
_AES_KEY = "0123456789abcdef"  # demo key; production keys come from a KMS


@register(
    "column_encryption_roundtrip",
    sql="""
    WITH h AS (
        SELECT ('0x' || substr(md5(c_name), 1, 15))::UBIGINT AS rh,
               length(c_name) AS pl
        FROM customer
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(rh) % 9223372036854775807 AS BIGINT)
               AS roundtrip_digest,
           CAST(COUNT(*) AS BIGINT) AS n_cipher_expanded
    FROM h
    """,
    tags=("privacy", "encryption", "aes", "roundtrip"),
)
def column_encryption_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encrypt every customer name with AES-GCM, decrypt it back, and
    digest the DECRYPTED values — hash-matching a digest the oracle
    computes from the plaintext column, which proves the field-level
    encryption layer is lossless. Also counts rows whose ciphertext
    is strictly longer than the plaintext (GCM adds IV + tag to every
    value, so this must be ALL rows — a cheap tripwire against an
    identity 'encryption' misconfiguration). Spark-side only by
    nature (the oracle has no AES): the cryptography is the
    engine-specific part, the digest equality is the portable proof."""
    c = _t(spark, sf_dir, "customer")
    enc = F.expr(f"aes_encrypt(c_name, '{_AES_KEY}', 'GCM')")
    dec = F.expr(
        f"CAST(aes_decrypt(aes_encrypt(c_name, '{_AES_KEY}', 'GCM'), "
        f"'{_AES_KEY}', 'GCM') AS STRING)"
    )
    h = c.select(
        F.conv(F.substring(F.md5(dec), 1, 15), 16, 10)
        .cast("decimal(20,0)")
        .alias("rh"),
        (F.length(enc) > F.length(F.col("c_name")))
        .cast("long")
        .alias("expanded"),
    )
    return h.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum("rh") % F.lit(9223372036854775807))
        .cast("long")
        .alias("roundtrip_digest"),
        F.sum("expanded").cast("long").alias("n_cipher_expanded"),
    )
