"""Property-based tests (hypothesis): the parser never crashes and
never emits more rows than input lines; sessionization matches an
independent pure-Python reference on random event streams."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from elb_log_etl_enrichment_spark.operators.features import sessionize
from elb_log_etl_enrichment_spark.sources.elb_logs import parse_elb_lines

_spark = None  # bound by the autouse fixture below

import pytest


@pytest.fixture(autouse=True)
def _bind_spark(spark):
    global _spark
    _spark = spark
    yield


# printable-ish lines, including quote/space torture cases
line_strategy = st.text(
    alphabet=st.characters(
        codec="ascii", min_codepoint=32, max_codepoint=126
    ),
    max_size=200,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(line_strategy, min_size=1, max_size=40))
def test_parser_total_on_arbitrary_input(lines):
    """Totality: any input parses to 0..n rows, never throws — the
    reference's per-line exception-to-None tolerance
    (elb_logs.py:130-132) as a whole-DataFrame property."""
    df = _spark.createDataFrame([Row(value=ln) for ln in lines])
    out = parse_elb_lines(df)
    assert 0 <= out.count() <= len(lines)


def _reference_sessions(events: list[tuple[int, int]], gap_s: int) -> dict:
    """Independent sessionizer: dict (user, session_number) -> count."""
    by_user: dict[int, list[int]] = {}
    for uid, ts in sorted(events, key=lambda e: (e[0], e[1])):
        by_user.setdefault(uid, []).append(ts)
    out: dict[tuple[int, int], int] = {}
    for uid, times in by_user.items():
        sess = 0
        prev = None
        for t in times:
            if prev is not None and t - prev > gap_s:
                sess += 1
            out[(uid, sess)] = out.get((uid, sess), 0) + 1
            prev = t
    return out


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),       # user
            st.integers(min_value=0, max_value=7200),    # seconds offset
        ),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_sessionize_matches_reference(events):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        Row(user=uid, time=base + datetime.timedelta(seconds=ts), eid=i)
        for i, (uid, ts) in enumerate(events)
    ]
    df = _spark.createDataFrame(rows)
    sess = sessionize(df, key="user", ts="time", gap_minutes=30, tiebreak="eid")
    got = {
        (r.user, r.session_number): r.cnt
        for r in sess.groupBy("user", "session_number")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    # hypothesis generates unique (user, ts) pairs → deterministic order
    expected = _reference_sessions(events, gap_s=30 * 60)
    assert got == expected


def _brute_asof(events, orders, forward: bool):
    """Pure-Python as-of reference: for each (key, t) event, the
    orders row with min/max time on the correct side; ties on time
    resolve to min orderkey (forward) / max orderkey (backward)."""
    out = {}
    for eid, key, t in events:
        cands = [
            (ot, okey)
            for okey, okeyy, ot in orders
            if okeyy == key and (ot >= t if forward else ot <= t)
        ]
        if not cands:
            out[eid] = None
        elif forward:
            ot = min(c[0] for c in cands)
            out[eid] = min(okey for t2, okey in cands if t2 == ot)
        else:
            ot = max(c[0] for c in cands)
            out[eid] = max(okey for t2, okey in cands if t2 == ot)
    return out


@settings(max_examples=5, deadline=None)
@given(
    st.lists(  # events: (event_id, key, time)
        st.tuples(st.integers(0, 10_000), st.integers(0, 3), st.integers(0, 50)),
        min_size=1, max_size=30, unique_by=lambda e: e[0],
    ),
    st.lists(  # orders: (orderkey, key, time)
        st.tuples(st.integers(0, 10_000), st.integers(0, 3), st.integers(0, 50)),
        min_size=0, max_size=30, unique_by=lambda o: o[0],
    ),
)
def test_asof_joins_match_bruteforce(events, orders):
    from elb_log_etl_enrichment_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
    )

    e_df = _spark.createDataFrame(
        [Row(event_id=e, key=k, t=t) for e, k, t in events]
    )
    o_schema = "orderkey long, okey long, ot long"
    o_df = _spark.createDataFrame(
        [Row(orderkey=o, okey=k, ot=t) for o, k, t in orders], schema=o_schema
    )
    for forward, fn in ((False, asof_join_backward), (True, asof_join_forward)):
        got = {
            r.event_id: r.orderkey
            for r in fn(
                e_df, o_df,
                left_on="key", right_on="okey",
                left_time="t", right_time="ot",
                payload_cols=["orderkey"],
                right_tiebreak="orderkey",
            ).collect()
        }
        assert got == _brute_asof(events, orders, forward), f"forward={forward}"


def _py_merge(sym: list, a: str, b: str, merged: str) -> list:
    """Independent greedy left-to-right non-overlapping replacement."""
    sym = list(sym)
    i = 0
    while i < len(sym) - 1:
        if sym[i] == a and sym[i + 1] == b:
            sym[i : i + 2] = [merged]
        i += 1
    return sym


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("ab"), min_size=1, max_size=8),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from(["aa", "ab", "ba", "bb"]),
)
def test_bpe_merge_fold_matches_reference(words, pair):
    """The HOF merge fold (the subtle part of distributed BPE: pending
    symbol + just-merged flag) must agree with an independent Python
    greedy replacement on adversarial repeat-heavy arrays ('aaaa' with
    pair (a,a) → [aa, aa], never [aa, a, a] or [aaa, a])."""
    from pyspark.sql import functions as F

    from elb_log_etl_enrichment_spark.operators.bpe import _merge_fold

    a, b = pair[0], pair[1]
    df = _spark.createDataFrame([(w,) for w in words], "sym array<string>")
    got = [
        r["m"]
        for r in df.select(
            _merge_fold(F.col("sym"), a, b, a + b).alias("m")
        ).collect()
    ]
    assert got == [_py_merge(w, a, b, a + b) for w in words]


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    )
)
def test_bpe_paths_agree_random(vocab):
    """Driver fast path and the distributed merge loop produce the
    identical merge table on random vocabularies (shared tie-breaks)."""
    from elb_log_etl_enrichment_spark.operators.bpe import bpe_train

    words = _spark.createDataFrame(vocab, "word string, cnt long")
    fast = bpe_train(words, n_merges=3)
    slow = bpe_train(words, n_merges=3, driver_vocab_limit=0)
    assert fast == slow


def test_truncation_recall_is_identity_at_full_width(spark):
    """Slicing the embedding to its FULL width must reproduce the
    full-dimension top-k exactly (recall 1.0 for every query) — the
    degenerate case that pins the truncation plumbing; the registry
    query's 16-dim recall is then a real measurement, not an artifact."""
    from pyspark.sql import functions as F

    from elb_log_etl_enrichment_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    dim = len(e.select("embedding").first()[0])
    pred = F.col("vec_id") % 100 == 0
    full = {(r.query_id, r.rnk, r.neighbor)
            for r in cosine_topk_bruteforce(e, pred, k=5).collect()}
    sliced = e.withColumn("embedding", F.slice("embedding", 1, dim))
    again = {(r.query_id, r.rnk, r.neighbor)
             for r in cosine_topk_bruteforce(sliced, pred, k=5).collect()}
    assert full == again and full


def test_duplicated_span_coverage_matches_reference_on_random_corpora(spark, tmp_path):
    """Randomized differential: tiny-alphabet corpora force heavy
    window collisions (incl. self-repeats and cross-doc overlaps);
    per-doc (n_dup_windows, covered_tokens) must equal a brute-force
    reference that counts duplicated 8-windows and unions intervals."""
    import random

    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries

    all_queries()
    W = 8
    rng = random.Random(1234)
    for trial in range(3):
        docs = []
        for i in range(30):
            n = rng.randint(0, 24)
            docs.append((i, " ".join(rng.choice("ab") for _ in range(n))))
        # reference
        from collections import Counter

        toks = {i: t.split() if t else [] for i, t in docs}
        freq = Counter()
        wins = {}
        for i, ts in toks.items():
            wins[i] = [tuple(ts[j : j + W]) for j in range(len(ts) - W + 1)]
            freq.update(wins[i])
        want = {}
        for i, ts in toks.items():
            dup = [j for j, w in enumerate(wins[i]) if freq[w] >= 2]
            covered = set()
            for j in dup:
                covered.update(range(j, j + W))
            want[i] = (len(dup), len(covered))
        out_dir = f"{tmp_path}/t{trial}"
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in docs],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{out_dir}/documents.parquet")
        got = {
            r["doc_id"]: (r["n_dup_windows"], r["covered_tokens"])
            for r in REGISTRY["duplicated_span_coverage"].fn(spark, out_dir).collect()
        }
        assert got == want, (trial, {k: (got[k], want[k]) for k in got if got[k] != want[k]})


def test_gopher_battery_matches_reference_on_random_corpora(spark, tmp_path):
    """Randomized differential for the Gopher rule battery: per-rule
    violation counts over random corpora (token lengths spanning every
    rule boundary) must equal a brute-force Python reference — the
    guard against a shared bug in both the Spark and oracle
    formulations."""
    import random

    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries
    from elb_log_etl_enrichment_spark.plans.queries_quality import (
        _GOPHER_STOPWORDS,
    )

    all_queries()
    rng = random.Random(99)
    words = ["the", "a", "of", "xx", "zzz", "longword", "q" * 31, "medium"]
    for trial in range(3):
        docs = []
        for i in range(40):
            n = rng.choice([0, 5, 30, 49, 50, 51, 120])
            docs.append((i, " ".join(rng.choice(words) for _ in range(n))))
        # brute-force reference
        counts = dict.fromkeys(
            ["word_count_bounds", "mean_word_len_bounds", "stopword_min2",
             "max_token_len", "ttr_floor", "any_rule"], 0)
        n_docs = 0
        for _, text in docs:
            t = text.split()
            if not t:
                continue
            n_docs += 1
            v = {
                "word_count_bounds": not (50 <= len(t) <= 20000),
                "mean_word_len_bounds": not (
                    3 <= sum(map(len, t)) / len(t) <= 10
                ),
                "stopword_min2": sum(x in _GOPHER_STOPWORDS for x in t) < 2,
                "max_token_len": max(map(len, t)) > 30,
                "ttr_floor": len(set(t)) / len(t) < 0.2,
            }
            v["any_rule"] = any(v.values())
            for k, b in v.items():
                counts[k] += b
        out_dir = f"{tmp_path}/g{trial}"
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in docs],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{out_dir}/documents.parquet")
        got = {
            r["rule"]: (r["n_violations"], r["violation_bp"])
            for r in REGISTRY["gopher_quality_battery"].fn(spark, out_dir).collect()
        }
        want = {
            k: (v, v * 10000 // n_docs) for k, v in counts.items()
        }
        assert got == want, (trial, got, want)


# --------------------------------------------------------------------------
# Morton spread: the SQL twin (evaluated by DuckDB) and the Spark
# expression must both equal a bit-by-bit Python reference
# --------------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=0xFFFF),
       st.integers(min_value=0, max_value=0xFFFF))
def test_sql_spread16_matches_python_reference(a, b):
    import duckdb

    from elb_log_etl_enrichment_spark.plans.queries_layout import _sql_spread16

    def py_spread(x):
        return sum(((x >> i) & 1) << (2 * i) for i in range(16))

    # BIGINT casts mirror the real query, whose operands are BIGINT
    # columns — bare INT32 literals overflow on the final << 1
    expr_a = _sql_spread16(f"CAST({a} AS BIGINT)")
    expr_b = _sql_spread16(f"CAST({b} AS BIGINT)")
    got = duckdb.sql(
        f"SELECT {expr_a} AS sa, ({expr_a} | ({expr_b} << 1)) AS z"
    ).fetchone()
    assert got[0] == py_spread(a)
    assert got[1] == (py_spread(a) | (py_spread(b) << 1))
    # interleave is a bijection: decode back
    z = got[1]
    da = sum((((z >> (2 * i)) & 1) << i) for i in range(16))
    db = sum((((z >> (2 * i + 1)) & 1) << i) for i in range(16))
    assert (da, db) == (a, b)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=1500),
                min_size=1, max_size=30))
def test_binpack_rule_invariants(sizes):
    """The greedy cum_before // target rule, checked in pure Python
    against its defining invariants (the Spark/SQL twins both
    implement this exact rule; test_layout.py pins them to it)."""
    target = 512
    bins: dict[int, list[int]] = {}
    cum = 0
    for sz in sizes:
        bins.setdefault(cum // target, []).append(sz)
        cum += sz
    labels = sorted(bins)
    # every non-final bin is "full": its last file STARTED before the
    # boundary, so total-so-far through that bin reaches the boundary
    run = 0
    for lb in labels[:-1]:
        run += sum(bins[lb])
        assert run >= (lb + 1) * target
    # no bin except possibly its last file could move one bin earlier:
    # each bin's first file starts inside [lb*target, (lb+1)*target)
    start = 0
    for lb in labels:
        assert lb == start // target
        start += sum(bins[lb])
    # totality: nothing lost
    assert sum(len(v) for v in bins.values()) == len(sizes)
    assert sum(sum(v) for v in bins.values()) == sum(sizes)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=200,
    )
)
def test_histogram_narrow_median_matches_python_sort(values):
    """The iterated narrowing's order statistic equals the plain
    Python sort on arbitrary doubles — duplicates, negatives, and
    pathological clustering included (the narrowing's exactness
    cannot depend on the value distribution)."""
    from pyspark.sql import functions as F

    from elb_log_etl_enrichment_spark.plans.queries_stats import histogram_narrow

    vals = _spark.createDataFrame(
        [Row(value=float(v)) for v in values], schema="value double"
    )
    k_target = (len(values) + 1) // 2
    k0 = vals.agg(F.expr("(count(*) + 1) div 2").alias("k"))
    bucket, k = histogram_narrow(vals, k0)
    g = bucket.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window

    vw = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    hit = (
        g.crossJoin(F.broadcast(k))
        .withColumn("cb", F.coalesce(F.sum("c").over(vw), F.lit(0)))
        .filter((F.col("cb") < F.col("k")) & (F.col("cb") + F.col("c") >= F.col("k")))
        .collect()
    )
    assert len(hit) == 1
    assert hit[0].value == sorted(values)[k_target - 1]


def test_simhash_block_join_exact_vs_bruteforce(spark):
    """Pigeonhole exactness: the 4x15-bit block equi-join must find
    EXACTLY the pairs a full cross-join Hamming filter finds at the
    default threshold 3 — checked on 300 pseudo-random 60-bit
    signatures (the worst case for blocking: no structure to help)."""
    from pyspark.sql import functions as F

    from elb_log_etl_enrichment_spark.operators.text_dedup import (
        SIMHASH_BITS,
        simhash_block_pairs,
    )

    # xxhash64 masked to 60 bits; force some near-collisions by also
    # including each signature with 1-3 bits flipped for a subset
    base = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (
            F.abs(F.xxhash64(F.col("id").cast("string")))
            % F.lit(1 << SIMHASH_BITS)
        ).alias("simhash"),
    )
    flipped = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.col("simhash").bitwiseXOR(
            F.expr("shiftleft(1L, CAST(doc_id % 59 AS INT))")
        ).alias("simhash"),
    )
    sig = base.unionByName(flipped)
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_block_pairs(sig, max_hamming=3).collect()
    }
    a = sig.select(F.col("doc_id").alias("da"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("db"), F.col("simhash").alias("hb"))
    brute = {
        (r.da, r.db)
        for r in a.crossJoin(b)
        .filter(F.col("da") < F.col("db"))
        .filter(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 3
        )
        .collect()
    }
    assert got == brute
    assert brute  # the flipped twins guarantee true pairs exist


# --- codec round-trips: arbitrary content must survive bit-exactly ---


@given(
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
    st.booleans(),
    st.randoms(use_true_random=False),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_arbitrary_pixels(w, h, cycle, rng):
    from elb_log_etl_enrichment_spark.operators.png_codec import (
        decode_png,
        encode_png,
    )

    px = [
        [[rng.randrange(256) for _ in range(3)] for _ in range(w)]
        for _ in range(h)
    ]
    dw, dh, ch, rows = decode_png(
        encode_png(px, color_type=2, filter_mode="cycle" if cycle else "none")
    )
    assert (dw, dh, ch) == (w, h, 3)
    for r in range(h):
        assert list(rows[r]) == [v for pix in px[r] for v in pix]


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=64,
    ),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_arbitrary_samples(samples, rate):
    from elb_log_etl_enrichment_spark.operators.wav_codec import (
        decode_wav,
        encode_wav,
    )

    sr, ch, got = decode_wav(encode_wav(samples, sample_rate=rate))
    assert (sr, ch, got) == (rate, 1, samples)


@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=4),
    st.randoms(use_true_random=False),
)
@settings(max_examples=30, deadline=None)
def test_y4m_roundtrip_arbitrary_planes(w, h, n_frames, rng):
    from elb_log_etl_enrichment_spark.operators.y4m_codec import (
        decode_y4m,
        encode_y4m,
    )

    plane = w * h
    frames = [
        tuple(
            bytes(rng.randrange(256) for _ in range(plane))
            for _ in range(3)
        )
        for _ in range(n_frames)
    ]
    dw, dh, got = decode_y4m(encode_y4m(frames, w, h))
    assert (dw, dh) == (w, h)
    assert got == frames


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=0, max_size=3),  # content
            st.dictionaries(
                st.sampled_from(["k1", "k2"]),
                st.integers(min_value=0, max_value=3),
                max_size=2,
            ),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=10, deadline=None)
def test_exact_dedup_map_path_properties(rows):
    """min_by map-path invariants on random frames (r6): one survivor
    per distinct content, survivor id is the MINIMUM id for that
    content, and the carried map payload belongs to that exact row."""
    from elb_log_etl_enrichment_spark.operators.dedup import exact_dedup

    data = [(i, txt, {k: str(v) for k, v in m.items()}) for i, (txt, m) in enumerate(rows)]
    df = _spark.createDataFrame(
        data, "id long, text string, props map<string,string>"
    )
    out = {r.id: r for r in exact_dedup(df, ["text"], "id").collect()}
    expect = {}
    for i, txt, m in data:
        if txt not in expect or i < expect[txt][0]:
            expect[txt] = (i, m)
    assert sorted(out) == sorted(i for i, _ in expect.values())
    for txt, (i, m) in expect.items():
        assert out[i].text == txt and (out[i].props or {}) == m


# ---------------------------------------------------------------------------
# r7 (verdict r06 item 8): fuzz the FULL _contains_map decision tree —
# maps nested inside structs, arrays, and struct/array compositions all
# must take the min_by path and carry the exact survivor row's payload.
# ---------------------------------------------------------------------------
_NESTED_MAP_SHAPES = {
    "struct_map": (
        "struct<a:long, m:map<string,string>>",
        lambda i: (i % 5, {"k": str(i % 3)}),
        lambda p, i: p.a == i % 5 and dict(p.m or {}) == {"k": str(i % 3)},
    ),
    "array_map": (
        "array<map<string,string>>",
        lambda i: [{"k": str(i % 3)}, {"j": str(i % 2)}],
        lambda p, i: [dict(m) for m in (p or [])]
        == [{"k": str(i % 3)}, {"j": str(i % 2)}],
    ),
    "struct_array_map": (
        "struct<xs:array<map<string,long>>>",
        lambda i: ([{"k": i % 4}],),
        lambda p, i: [dict(m) for m in (p.xs or [])] == [{"k": i % 4}],
    ),
    "array_struct_map": (
        "array<struct<m:map<string,long>>>",
        lambda i: [({"k": i % 4},)],
        lambda p, i: [dict(s.m) for s in (p or [])] == [{"k": i % 4}],
    ),
}


@pytest.mark.parametrize("shape", sorted(_NESTED_MAP_SHAPES))
@given(st.lists(st.text(alphabet="abc", min_size=0, max_size=3), min_size=1, max_size=20))
@settings(max_examples=6, deadline=None)
def test_exact_dedup_nested_map_shapes(shape, texts):
    """Nested-map dedup invariants: one survivor per distinct content,
    survivor id is the minimum id for that content, and the carried
    nested payload is the survivor row's own (derived from its id)."""
    from elb_log_etl_enrichment_spark.operators.dedup import (
        _contains_map,
        exact_dedup,
    )

    ddl, build, check = _NESTED_MAP_SHAPES[shape]
    df = _spark.createDataFrame(
        [(i, t, build(i)) for i, t in enumerate(texts)],
        f"id long, text string, payload {ddl}",
    )
    assert any(_contains_map(f.dataType) for f in df.schema.fields)
    out = {r.id: r for r in exact_dedup(df, ["text"], "id").collect()}
    expect = {}
    for i, t in enumerate(texts):
        if t not in expect or i < expect[t]:
            expect[t] = i
    assert sorted(out) == sorted(expect.values())
    for t, i in expect.items():
        assert out[i].text == t
        assert check(out[i].payload, i)


def test_contains_map_decision_tree():
    """Direct unit coverage of every _contains_map recursion branch,
    including the False leaves (struct/array with no map inside)."""
    from pyspark.sql.types import _parse_datatype_string as ddl

    from elb_log_etl_enrichment_spark.operators.dedup import _contains_map

    true_cases = [
        "map<string,string>",
        "array<map<string,long>>",
        "struct<m:map<string,long>>",
        "struct<xs:array<map<string,long>>>",
        "array<struct<m:map<string,long>>>",
        "struct<s:struct<xs:array<struct<m:map<string,long>>>>>",
    ]
    false_cases = [
        "string",
        "array<long>",
        "struct<a:long, b:array<string>>",
        "array<struct<xs:array<struct<a:long>>>>",
    ]
    for t in true_cases:
        assert _contains_map(ddl(t)), t
    for t in false_cases:
        assert not _contains_map(ddl(t)), t


def test_simhash_both_matches_individual_schemes(spark):
    """The fused one-pass signature builder (r7: simhash_both) must be
    bit-for-bit identical to the standalone simhash / simhash_weighted
    operators — including on documents whose text tokenizes to nothing
    (they vanish from all three, explode drops them)."""
    from elb_log_etl_enrichment_spark.operators.text_dedup import (
        simhash,
        simhash_both,
        simhash_weighted,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),
            (2, "alpha beta gamma delta"),
            (3, "completely different words here"),
            (4, "alpha"),
            (5, "   "),  # tokenless: drops out of every scheme
            (6, "beta beta beta beta beta"),
        ],
        "doc_id long, text string",
    )
    p = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    w = {r.doc_id: r.simhash for r in simhash_weighted(docs).collect()}
    b = {
        r.doc_id: (r.simhash_plain, r.simhash_weighted)
        for r in simhash_both(docs).collect()
    }
    assert set(b) == set(p) == set(w) == {1, 2, 3, 4, 6}
    assert b == {k: (p[k], w[k]) for k in p}
