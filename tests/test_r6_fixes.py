"""Regression tests for the round-6 fixes (VERDICT r05 next-round
items + ADVICE r05 findings) — each pins the exact failure scenario."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from elb_log_etl_enrichment_spark.operators.dedup import exact_dedup


def test_exact_dedup_map_column_uses_aggregation_not_window(spark):
    """VERDICT r05 item 3 / ADVICE low: map-typed frames used to fall
    back to a row_number window that shipped duplicate bodies through
    the exchange. They must now dedup via the min_by hash aggregation:
    no Window in the plan, deterministic min-id survivor."""
    df = spark.createDataFrame(
        [
            Row(id=2, text="dup", props={"a": "1"}),
            Row(id=1, text="dup", props={"a": "2"}),
            Row(id=3, text="uniq", props={"b": "9"}),
        ],
        schema="id long, text string, props map<string,string>",
    )
    out = exact_dedup(df, ["text"], "id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # partial_min_by BEFORE the exchange = map-side combine: at most
    # one candidate row per (digest, task) crosses the shuffle
    assert "partial_min_by" in plan
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {1, 3}  # min-id survivor per content
    assert rows[1].props == {"a": "2"}  # full row carried, not torn


def test_exact_dedup_nested_map_in_struct(spark):
    """ADVICE low: a map nested inside a struct used to slip past the
    top-level-only MapType guard and crash min(struct) at plan time.
    The recursive detector must route it to the min_by path."""
    df = spark.createDataFrame(
        [
            Row(id=5, text="x", meta=Row(tags={"k": "v"})),
            Row(id=4, text="x", meta=Row(tags={"k": "w"})),
        ],
        schema="id long, text string, meta struct<tags: map<string,string>>",
    )
    out = exact_dedup(df, ["text"], "id").collect()
    assert len(out) == 1 and out[0].id == 4


def test_exact_dedup_map_path_null_positions(spark):
    """The min_by path must keep the to_json struct hashing semantics:
    ("a", NULL) and (NULL, "a") stay distinct contents."""
    df = spark.createDataFrame(
        [Row(id=1, x="a", y=None, m={}), Row(id=2, x=None, y="a", m={})],
        schema="id long, x string, y string, m map<string,string>",
    )
    assert exact_dedup(df, ["x", "y"], "id").count() == 2


def test_hadoop_path_exists_local_and_missing(spark, tmp_path):
    """ADVICE medium: _index_history's existence probe must go through
    the Hadoop FileSystem API so non-local URIs resolve (or fail
    loudly) instead of silently reading as missing."""
    from elb_log_etl_enrichment_spark.streaming.stream import (
        _hadoop_path_exists,
    )

    d = tmp_path / "idx"
    assert not _hadoop_path_exists(spark, str(d))
    d.mkdir()
    assert _hadoop_path_exists(spark, str(d))
    # explicit file:// scheme resolves identically
    assert _hadoop_path_exists(spark, "file://" + str(d))


def test_fingerprint_oracle_parity_on_empty_normalization(spark):
    """ADVICE medium: a corpus containing an all-punctuation / CJK doc
    must produce the SAME distinct-fingerprint count in Spark (NULL
    skipped by count_distinct) and the DuckDB oracle (md5(NULLIF(...))
    now also NULL)."""
    import duckdb

    from elb_log_etl_enrichment_spark.functions.text import fingerprint

    docs = [
        ("s", "hello world"),
        ("s", "HELLO, world!"),  # same fingerprint as above
        ("s", "!!!"),  # normalizes to nothing -> NULL fp
        ("s", "你好世界"),  # non-Latin -> NULL fp
    ]
    sdf = spark.createDataFrame(docs, schema="source string, text string")
    got = (
        sdf.select("source", fingerprint(F.col("text")).alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("fp").alias("n_distinct_fp"),
        )
        .collect()[0]
    )
    con = duckdb.connect()
    want = con.execute(
        """
        SELECT CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT md5(NULLIF(
                   regexp_replace(lower(txt), '[^a-z0-9]', '', 'g'), '')))
                   AS BIGINT)
        FROM (VALUES ('hello world'), ('HELLO, world!'), ('!!!'), ('你好世界'))
             t(txt)
        """
    ).fetchone()
    con.close()
    assert (got.n_docs, got.n_distinct_fp) == want == (4, 1)


def test_parse_ipv6_client_ip_guard(spark):
    """VERDICT r05 item 7 (SURVEY P8): the reference's split(':')[0]
    truncates an IPv6 client to its first hex group; stripping the
    last ':port' must yield the full address while keeping IPv4
    behavior byte-identical."""
    from tests.test_parse import GOLDEN_LINE, _parse

    v6_line = GOLDEN_LINE.replace(
        "34.217.80.200:44256", "2001:db8:cafe::17:44256"
    )
    rows = _parse(spark, [GOLDEN_LINE, v6_line]).orderBy("client_ip").collect()
    assert [r.client_ip for r in rows] == [
        "2001:db8:cafe::17",
        "34.217.80.200",
    ]


def test_vendored_uap_core_snippet_battery():
    """VERDICT r05 item 5: the repo now ships a vendored snippet of
    the REAL public uap-core regexes.yaml (Apache-2.0), so the
    full-table loader path runs in CI. Every row here is an agent the
    curated fallback table does NOT resolve (it returns 'Other' /
    generic) while the loaded snippet yields uap-core's published
    family — proving the loader path adds real coverage."""
    import os

    from elb_log_etl_enrichment_spark.functions import ua as U
    from elb_log_etl_enrichment_spark.functions.ua import _first_match
    from elb_log_etl_enrichment_spark.functions.ua_regexes import load_uap_core

    path = os.path.join(
        os.path.dirname(U.__file__), "uap_core_snippet.yaml"
    )
    tables = load_uap_core(path)
    assert tables is not None
    browsers = U._compile(tables["user_agent_parsers"], "family_replacement")
    os_rules = U._compile(tables["os_parsers"], "os_replacement")
    devices = U._compile(tables["device_parsers"], "device_replacement")

    ua_rows = [
        ("Mozilla/5.0 (Windows NT 10.0) PaleMoon/33.0", "Pale Moon"),
        ("Mozilla/5.0 (X11; Linux) Gecko SeaMonkey/2.53.18", "SeaMonkey"),
        ("Mozilla/5.0 (Windows NT 10.0; Win64) Waterfox/6.0.5", "Waterfox"),
        (
            "Opera/9.80 (Android; Opera Mobi/1234) Version/12.02",
            "Opera Mobile",
        ),
    ]
    for agent, family in ua_rows:
        assert _first_match(U._BROWSER_RULES, agent) in ("Other", "Opera")
        assert _first_match(browsers, agent) == family

    os_rows = [
        ("Mozilla/5.0 (Linux; Tizen 2.3; SAMSUNG SM-Z130H)", "Tizen"),
    ]
    for agent, family in os_rows:
        assert _first_match(os_rules, agent) == family

    dev_rows = [
        ("Mozilla/5.0 (Linux; Android 9; Nexus 5X Build/P)", "Nexus 5X"),
        ("Mozilla/5.0 (PlayStation 4 3.11) AppleWebKit/537.73", "PlayStation 4"),
        ("Mozilla/5.0 (Nintendo Switch; WifiWebAuthApplet)", "Nintendo Switch"),
        ("Mozilla/5.0 (Linux; U; Android 4.4.2; LG-D855 Build)", "LG D855"),
        ("Mozilla/5.0 (Linux; Android 8.0; HUAWEI VTR-L09)", "Huawei VTR-L09"),
        ("SmartWatch ( Sony; SWR50 ; x)", "Sony SWR50"),
        (
            "Mozilla/5.0 (Linux; U; Android 4.2.2; ALCATEL ONE TOUCH 7047D)",
            "Alcatel ONE TOUCH 7047D",
        ),
    ]
    for agent, family in dev_rows:
        assert _first_match(U._DEVICE_RULES, agent, trim=True) != family
        assert _first_match(devices, agent, trim=True) == family
    # spider pseudo-device rides first exactly as upstream
    assert _first_match(devices, "Googlebot/2.1", trim=True) == "Spider"


def test_stage_two_batches_orders_files_by_mtime(spark, tmp_path):
    """VERDICT r05 item 4: the single paced availableNow run replaces
    the two-run ingest shape, so FileStreamSource MUST process the
    staged history file as micro-batch 0 and the tick file as batch 1
    — _stage_two_batches forces that with a 60 s mtime gap. A flipped
    order would classify history docs as the incoming batch and break
    the ingest oracles."""
    import os

    from pyspark.sql import Row

    from elb_log_etl_enrichment_spark.plans.queries_ext import (
        _stage_two_batches,
    )

    src = str(tmp_path / "src")
    first = spark.createDataFrame([Row(doc_id=1, text="a")])
    second = spark.createDataFrame([Row(doc_id=2, text="b")])
    _stage_two_batches(first, second, src)
    parts = sorted(
        (os.path.getmtime(os.path.join(src, f)), f)
        for f in os.listdir(src)
        if not f.startswith(("_", "."))  # Spark ignores hidden files
    )
    assert len(parts) == 2
    assert parts[1][0] - parts[0][0] >= 30  # forced gap, no mtime tie

    seen: list[tuple[int, list[int]]] = []
    (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(
            lambda b, bid: seen.append((bid, [r.doc_id for r in b.collect()]))
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert seen == [(0, [1]), (1, [2])]


def test_state_partitions_knob_captured_and_restored(spark, tmp_path):
    """run_available_now(state_partitions=N) must pin the stream's
    STATE partitioning to N (Spark captures the conf at start()) and
    restore the session conf afterwards — if a Spark upgrade ever
    captures lazily instead, the state dir count exposes it."""
    import os

    from pyspark.sql import functions as F

    from elb_log_etl_enrichment_spark.streaming.stream import (
        run_available_now,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "v long, k long"
    ).coalesce(1).write.parquet(src)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    stream = (
        spark.readStream.schema("v long, k long").parquet(src)
        .groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    )
    ck = str(tmp_path / "ck")
    out = run_available_now(
        stream, spark, "mem_state_knob", ck,
        output_mode="complete", state_partitions=3,
    )
    assert out.count() == 3
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    state_dirs = os.listdir(os.path.join(ck, "state", "0"))
    assert sorted(d for d in state_dirs if d.isdigit()) == ["0", "1", "2"]


def test_compact_ingest_index_preserves_classification(spark, tmp_path):
    """Compacting the append-grown ingest index between ticks must not
    change a later batch's history classification: same stats row with
    and without compaction, fewer data files after."""
    import os

    from pyspark.sql import Row

    from elb_log_etl_enrichment_spark.streaming.stream import (
        _digest_ingest_upsert,
        compact_ingest_index,
    )

    def _stats(index):
        return sorted(
            (r.batch_id, r.n_batch, r.n_dup_of_history, r.n_ingested)
            for r in spark.read.parquet(index + "_stats").collect()
        )

    docs0 = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma"), Row(doc_id=2, text="delta eps")]
    )
    docs1 = spark.createDataFrame(
        [Row(doc_id=3, text="alpha beta gamma"), Row(doc_id=4, text="zeta")]
    )
    results = {}
    for tag, compact in [("plain", False), ("compacted", True)]:
        index = str(tmp_path / f"idx_{tag}.parquet")
        _digest_ingest_upsert(docs0, 0, index)
        if compact:
            n = compact_ingest_index(spark, index, target_files=1)
            assert n == spark.read.parquet(index).count()
            files = [
                f for f in os.listdir(index)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            ]
            assert len(files) == 1
        _digest_ingest_upsert(docs1, 1, index)
        results[tag] = _stats(index)
    assert results["plain"] == results["compacted"]
    # doc 3 is a history dup of doc 1 in batch 1 either way
    assert results["plain"][1][2] == 1


def test_compact_ingest_index_band_layout(spark, tmp_path):
    """Same invariance for the MinHash BAND index (the other persisted
    ingest layout): compaction between ticks leaves near-dup history
    classification unchanged."""
    from pyspark.sql import Row

    from elb_log_etl_enrichment_spark.streaming.stream import (
        _neardup_ingest_upsert,
        compact_ingest_index,
    )

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    docs0 = spark.createDataFrame([Row(doc_id=1, text=text_a)])
    docs1 = spark.createDataFrame(
        [Row(doc_id=2, text=text_a), Row(doc_id=3, text="totally different words here nothing shared at all today")]
    )
    stats = {}
    for tag, compact in [("plain", False), ("compacted", True)]:
        index = str(tmp_path / f"band_{tag}.parquet")
        _neardup_ingest_upsert(docs0, 0, index)
        if compact:
            compact_ingest_index(spark, index, target_files=1)
        _neardup_ingest_upsert(docs1, 1, index)
        stats[tag] = sorted(
            (r.batch_id, r.n_batch, r.n_dup_of_history, r.n_ingested)
            for r in spark.read.parquet(index + "_stats").collect()
        )
    assert stats["plain"] == stats["compacted"]
    assert stats["plain"][1][2] == 1  # doc 2 is a near-dup of history


def test_connected_components_paths_agree(spark):
    """The r6 driver union-find gate must label identically to the
    distributed min-label loop (forced via small_graph_threshold=0) —
    chain + singleton + duplicate/reversed edges."""
    from pyspark.sql import Row

    from elb_log_etl_enrichment_spark.operators.graph import (
        connected_components,
    )

    nodes = spark.createDataFrame([Row(id=i) for i in [1, 2, 3, 4, 7, 9]])
    edges = spark.createDataFrame(
        [Row(src=2, dst=1), Row(src=2, dst=3), Row(src=3, dst=2),
         Row(src=4, dst=3), Row(src=9, dst=7)]
    )
    local = {
        (r.id, r.label)
        for r in connected_components(nodes, edges).collect()
    }
    dist = {
        (r.id, r.label)
        for r in connected_components(
            nodes, edges, small_graph_threshold=0
        ).collect()
    }
    assert local == dist == {
        (1, 1), (2, 1), (3, 1), (4, 1), (7, 7), (9, 7)
    }


def test_device_case_sql_rejects_unsupported_substitutions():
    """The device-report oracle generator replays only '<prefix>$1'
    replacements; anything else must fail loudly at generation time,
    never silently drop a substitution tail."""
    import pytest

    from elb_log_etl_enrichment_spark.plans import queries_ext as qe
    from elb_log_etl_enrichment_spark.functions import ua

    # the generator reads ua.DEVICE_PARSERS — the table the classifier
    # actually uses (code-review r06) — so the monkeypatch goes there
    rules = ua.DEVICE_PARSERS
    try:
        ua.DEVICE_PARSERS = rules + [
            {"regex": "(A) (B)", "device_replacement": "$1 $2"}
        ]
        with pytest.raises(ValueError, match="device_replacement"):
            qe._device_case_sql("ua")
    finally:
        ua.DEVICE_PARSERS = rules


def test_ua_device_trim_only_and_multidigit_groups():
    """ADVICE low: uap-core trims only DEVICE replacements; UA/OS
    substitute verbatim. $NN binds to the longest valid group."""
    import re

    from elb_log_etl_enrichment_spark.functions.ua import _first_match

    # partial substitution leaves a trailing space: UA/OS keep it,
    # device strips it
    rules = [(re.compile(r"(Foo)(?: (\d+))?"), "$1 $2")]
    assert _first_match(rules, "Foo") == "Foo "
    assert _first_match(rules, "Foo", trim=True) == "Foo"
    assert _first_match(rules, "Foo 9") == "Foo 9"
    # $10 against a 1-group pattern = $1 then literal '0'
    rules10 = [(re.compile(r"(Bar)"), "$10")]
    assert _first_match(rules10, "Bar") == "Bar0"
