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
