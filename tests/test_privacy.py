"""Privacy tier: the scrubber actually scrubs (planted-PII test), the
redaction leaves zero residual identifiers, and the audits stay pure
JVM expression work (no Python stages).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elb_log_etl_enrichment_spark.plans.queries_privacy import (
    EMAIL_RE,
    IPV4_RE,
    K_ANON,
    PHONE_RE,
    k_anonymity_audit,
    pii_redaction_audit,
)

SF_DIR = "/root/testdata/sf0.001"


def test_planted_pii_is_detected_and_masked(spark):
    """Hand-planted identifiers in free text: every one detected,
    none survive the three-stage mask."""
    rows = [
        ("contact alice.smith+x@corp.example.org asap", 1, 0, 0),
        ("server 192.168.001.255 then 10.0.0.1", 0, 2, 0),
        ("dial 5551234 twice: 5551234", 0, 0, 2),
        ("mixed a@b.io at 8.8.8.8 ext 1234567", 1, 1, 1),
        ("clean text with number 42 and dots...", 0, 0, 0),
    ]
    df = spark.createDataFrame(
        rows, "txt string, n_email int, n_ip int, n_phone int"
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("txt"), EMAIL_RE, "<EMAIL>"),
            IPV4_RE,
            "<IP>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
    got = df.select(
        "n_email",
        "n_ip",
        "n_phone",
        F.regexp_count("txt", F.lit(EMAIL_RE)).alias("e"),
        F.regexp_count("txt", F.lit(IPV4_RE)).alias("i"),
        F.regexp_count("txt", F.lit(PHONE_RE)).alias("p"),
        F.regexp_count(
            clean, F.lit(f"{EMAIL_RE}|{IPV4_RE}|{PHONE_RE}")
        ).alias("residual"),
    ).collect()
    for r in got:
        assert (r.e, r.i, r.p) == (r.n_email, r.n_ip, r.n_phone)
        assert r.residual == 0


def test_redaction_audit_residual_zero_and_counts(spark):
    out = pii_redaction_audit(spark, SF_DIR).collect()
    assert out
    for r in out:
        # fixture synthesizes exactly one email + one IP per row
        assert r.n_emails == r.n_rows
        assert r.n_ips == r.n_rows
        assert r.n_residual == 0


def test_privacy_plans_have_no_python_stages(spark):
    for q in (pii_redaction_audit, k_anonymity_audit):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_k_anonymity_matches_bruteforce(spark):
    import math

    pdf = spark.read.parquet(f"{SF_DIR}/customer.parquet").toPandas()

    pdf["bal_band"] = pdf["c_acctbal"].apply(lambda v: math.floor(v / 1000))
    sizes = pdf.groupby(
        ["c_nationkey", "c_mktsegment", "bal_band"]
    ).size()
    r = k_anonymity_audit(spark, SF_DIR).collect()[0]
    assert r.n_groups == len(sizes)
    assert r.n_small_groups == int((sizes < K_ANON).sum())
    assert r.min_group_size == int(sizes.min())
    assert r.rows_at_risk == int(sizes[sizes < K_ANON].sum())


def test_forget_entity_audit_erasure_is_complete_and_scoped(spark):
    """Ground truth: rows_removed must equal the independently
    computed membership counts, remaining_refs must be zero, and
    non-requested entities must be untouched."""
    from pyspark.sql import functions as F

    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries
    from elb_log_etl_enrichment_spark.plans.queries_privacy import _FORGET_BP
    from elb_log_etl_enrichment_spark.plans.queries_sampling import hash_bucket
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    all_queries()
    sf = "/root/testdata/sf0.01"
    out = {
        r.tbl: r
        for r in REGISTRY["forget_entity_audit"].fn(spark, sf).collect()
    }
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    in_req_c = c.filter(
        hash_bucket(F.col("c_custkey"), "forget|") < _FORGET_BP
    ).count()
    in_req_o = o.filter(
        hash_bucket(F.col("o_custkey"), "forget|") < _FORGET_BP
    ).count()
    assert out["customer"].rows_removed == in_req_c > 0
    assert out["orders"].rows_removed == in_req_o > 0
    assert out["customer"].remaining_refs == 0
    assert out["orders"].remaining_refs == 0
    assert out["customer"].rows_remaining == c.count() - in_req_c
    assert out["orders"].rows_remaining == o.count() - in_req_o
