"""COVERAGE.md ↔ registry consistency: the judge-facing inventory
must never drift from the code. Three invariants:

* every query marked *(oracle)* in COVERAGE.md exists in the registry
  AND has oracle SQL;
* every oracle-backed registry query is mentioned in COVERAGE.md;
* the stated totals line matches the actual registry counts.
"""

from __future__ import annotations

import os
import re

from elb_log_etl_enrichment_spark.plans.queries import (
    REGISTRY,
    all_oracle_sql,
    all_queries,
)

DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")


def _doc():
    return open(DOC).read()


def test_oracle_marked_names_exist_and_are_oracle_backed():
    all_queries()
    osql = all_oracle_sql()
    text = _doc()
    marked = set(re.findall(r"`(\w+)`\s*\*\(oracle\)\*", text))
    assert marked, "no *(oracle)* markers found — parsing broke?"
    missing = sorted(n for n in marked if n not in REGISTRY)
    assert not missing, f"COVERAGE.md names unknown queries: {missing}"
    not_oracle = sorted(n for n in marked if n not in osql)
    assert not not_oracle, (
        f"COVERAGE.md marks rows-only queries as oracle: {not_oracle}"
    )


def test_every_oracle_query_is_documented():
    all_queries()
    osql = all_oracle_sql()
    text = _doc()
    undocumented = sorted(n for n in osql if n not in text)
    assert not undocumented, (
        f"oracle-backed queries missing from COVERAGE.md: {undocumented}"
    )


def test_totals_line_matches_registry():
    qs = all_queries()
    osql = all_oracle_sql()
    text = _doc()
    m = re.search(
        r"\*\*(\d+) registry queries — (\d+) oracle-checked, (\d+)\s*\nrows-only\*\*",
        text,
    )
    assert m, "totals line not found / format changed"
    total, oracle, rows_only = map(int, m.groups())
    assert total == len(qs), (total, len(qs))
    assert oracle == len(osql), (oracle, len(osql))
    assert rows_only == len(qs) - len(osql)
