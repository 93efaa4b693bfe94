"""Vendored user-agent rule table in uap-core's schema (P11 offline path).

uap-core (https://github.com/ua-parser/uap-core, the data behind the
reference's `user_agents` library, reference/elb_logs.py:119-121)
publishes `regexes.yaml`: ORDERED first-match rule lists where each
rule is `{regex, family_replacement?}` and the family defaults to the
regex's first capture group, with `$1` substitution supported in
replacements. This module vendors that schema as a dependency-free
Python data file (the container has neither the wheel nor network for
the YAML) holding a curated subset of uap-core's published rules —
the families its maintainers emit for the major + long-tail agents the
engine's battery pins (tests/test_parse.py::UA_BATTERY). The full
upstream `regexes.yaml` is a drop-in widening via ``load_uap_core``
below (r05): place the public file next to this module or point
``$SPARK_UAP_CORE_REGEXES`` at it and `functions/ua.py` classifies
with the complete rule set instead; the curated tables remain the
dependency-free fallback and the battery is green either way.

Rule order is load-bearing exactly as in upstream: specific families
(Opera Mini, YaBrowser, Vivaldi, UCBrowser, SamsungBrowser,
HeadlessChrome, Chromium, the iOS shells) must precede the generic
Chrome/Safari/Opera rules they embed.
"""

from __future__ import annotations

import os as _os
import re as _re

#: Env var pointing at a full public uap-core ``regexes.yaml``; the
#: default probe location is a file of that name next to this module.
UAP_CORE_ENV = "SPARK_UAP_CORE_REGEXES"

_LINE_RE = _re.compile(r"^(\s*)(- )?([A-Za-z0-9_]+):\s*(.*?)\s*$")


def _unquote(value: str) -> str:
    """Decode the scalar styles uap-core's regexes.yaml actually uses:
    single-quoted ('' escapes a quote), double-quoted (backslash
    escapes pass through to the regex engine), or plain."""
    if len(value) >= 2 and value[0] == "'" and value[-1] == "'":
        return value[1:-1].replace("''", "'")
    if len(value) >= 2 and value[0] == '"' and value[-1] == '"':
        body = value[1:-1]
        # YAML double-quote escapes that matter for these files:
        return body.replace('\\"', '"').replace("\\\\", "\\")
    return value


def _parse_uap_yaml(text: str) -> dict[str, list[dict]]:
    """Minimal parser for the uap-core regexes.yaml SUBSET of YAML
    (three top-level keys, each a list of flat string->string maps,
    one key per line). Used when PyYAML isn't importable — this
    container has no wheel and no network, and the file's structure
    is stable enough that the subset grammar is the whole grammar."""
    data: dict[str, list[dict]] = {}
    section: list[dict] | None = None
    current: dict | None = None
    for raw in text.splitlines():
        if not raw.strip() or raw.lstrip().startswith("#"):
            continue
        m = _LINE_RE.match(raw)
        if m is None:
            continue
        indent, dash, key, value = m.groups()
        if not indent and not dash:
            section = data.setdefault(key, [])
            current = None
        elif section is not None and dash:
            current = {key: _unquote(value)}
            section.append(current)
        elif current is not None:
            current[key] = _unquote(value)
    return data


def load_uap_core(path: str | None = None) -> dict[str, list[dict]] | None:
    """Load the full PUBLIC uap-core ``regexes.yaml`` (the data behind
    the reference's `user_agents` library) if one is available:
    explicit ``path`` arg, then ``$SPARK_UAP_CORE_REGEXES``, then a
    ``regexes.yaml`` sitting next to this module. Returns the three
    rule lists in this module's schema, or None when no file exists —
    in which case the curated tables below stand in (their expected
    outputs are uap-core's published values, so swapping the full
    table in never changes a battery-pinned answer, it only widens
    the resolved long tail). Parses with PyYAML when importable,
    else the subset parser above."""
    path = (
        path
        or _os.environ.get(UAP_CORE_ENV)
        or _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "regexes.yaml")
    )
    if not _os.path.isfile(path):
        return None
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    try:  # pragma: no cover - PyYAML absent in this container
        import yaml

        data = yaml.safe_load(text)
    except Exception:
        data = _parse_uap_yaml(text)
    if not isinstance(data, dict):  # empty file / non-mapping YAML
        data = {}
    tables = {
        k: [r for r in (data.get(k) or []) if isinstance(r, dict) and "regex" in r]
        for k in ("user_agent_parsers", "os_parsers", "device_parsers")
    }
    if not tables["user_agent_parsers"]:
        # a file that parses to nothing usable (truncated download,
        # HTML error page saved as regexes.yaml, empty file) must NOT
        # replace the curated tables with empty rule lists — every UA
        # would silently classify as 'Other' (code-review r05 finding)
        return None
    return tables


#: Browser-family rules (uap-core `user_agent_parsers` shape).
UA_PARSERS: list[dict] = [
    # --- crawlers / monitors the ALB corpus actually sees ---
    {"regex": r"(Googlebot)(?:-Image|-News|-Video)?/", "family_replacement": "Googlebot"},
    {"regex": r"(bingbot)/"},
    # --- Opera family (Mini before Mobile/desktop; OPR is desktop) ---
    {"regex": r"(Opera Mini)(?:/[\d.]+)?", "family_replacement": "Opera Mini"},
    {"regex": r"\b(OPR)/\d+", "family_replacement": "Opera"},
    {"regex": r"(Opera)[/ ]\d+"},
    # --- Edge shells before Chrome ---
    {"regex": r"(EdgiOS)/\d+", "family_replacement": "Edge Mobile"},
    {"regex": r"(EdgA)/\d+", "family_replacement": "Edge Mobile"},
    {"regex": r"(Edge?)/\d+", "family_replacement": "Edge"},
    # --- iOS third-party shells before Safari ---
    {"regex": r"(FxiOS)/\d+", "family_replacement": "Firefox iOS"},
    {"regex": r"(CriOS)/\d+", "family_replacement": "Chrome Mobile iOS"},
    # --- Chrome-embedding browsers before Chrome ---
    {"regex": r"(YaBrowser)/\d+", "family_replacement": "Yandex Browser"},
    {"regex": r"(Vivaldi)/\d+"},
    {"regex": r"(UCBrowser|UC Browser|UCWEB)[ /]?[\d.]*", "family_replacement": "UC Browser"},
    {"regex": r"(SamsungBrowser)/\d+", "family_replacement": "Samsung Internet"},
    {"regex": r"(HeadlessChrome)(?:/\d+)?"},
    {"regex": r"(Chromium)/\d+"},
    # --- Firefox (mobile variant first) ---
    {"regex": r"Android[^)]*\).*(Firefox)/\d+", "family_replacement": "Firefox Mobile"},
    {"regex": r"(Firefox)/\d+"},
    # --- Chrome (webview / mobile / desktop) ---
    {"regex": r"; wv\).*(Chrome)/\d+", "family_replacement": "Chrome Mobile WebView"},
    {"regex": r"(Chrome)/[\d.]+ Mobile", "family_replacement": "Chrome Mobile"},
    {"regex": r"(Chrome)/\d+"},
    # --- Safari (Version/ token distinguishes real Safari) ---
    {
        "regex": r"(?:iPhone|iPad|iPod).*Version/[\d.]+.*(Safari)/",
        "family_replacement": "Mobile Safari",
    },
    {"regex": r"Version/[\d.]+.*(Safari)/", "family_replacement": "Safari"},
    {"regex": r"(MSIE |Trident/)", "family_replacement": "IE"},
    # --- programmatic clients ---
    {"regex": r"(Apache-HttpClient)/\d+"},
    {"regex": r"(Go-http-client)/\d+"},
    {"regex": r"^(Java)/\d+"},
    {"regex": r"(okhttp)/\d+"},
    {"regex": r"(curl)/\d+"},
    {"regex": r"(python-requests)/\d+", "family_replacement": "Python Requests"},
    {"regex": r"(Python-urllib)/?\d*"},
    {"regex": r"(Wget)/\d+"},
    # --- monitoring agents (round 4: the reference's bot keyword list
    # names pingdom/uptimerobot/newrelic; uap-core publishes explicit
    # rules for these exact agents) ---
    {
        "regex": r"(Pingdom\.com_bot_version_)[\d.]+",
        "family_replacement": "PingdomBot",
    },
    {"regex": r"(NewRelicPinger)/\d+"},
    # --- generic crawler fallback (uap-core's token-is-the-family
    # convention: AhrefsBot → "AhrefsBot", PetalBot → "PetalBot").
    # Deliberately LAST: a bot that impersonates a full browser UA
    # classifies as that browser here (upstream orders some bot rules
    # first and carves device exceptions like Cubot phones; the
    # curated table trades that edge for zero false positives on real
    # browser traffic — no genuine browser UA contains these tokens).
    {
        "regex": r"([A-Za-z0-9._-]*(?:[Bb]ot|[Ss]pider|[Cc]rawler))"
        r"(?:[/ ;)]|$)"
    },
]

#: OS-family rules (uap-core `os_parsers` shape). Specific before
#: generic: Windows Phone < Windows; CrOS/Android/Ubuntu < Linux.
OS_PARSERS: list[dict] = [
    {"regex": r"(Windows Phone)"},
    {"regex": r"(Windows)"},
    {"regex": r"(CrOS)", "os_replacement": "Chrome OS"},
    {"regex": r"(Android)"},
    {"regex": r"(iPhone|iPad|iPod|iOS)", "os_replacement": "iOS"},
    {"regex": r"(Mac OS X|Macintosh)", "os_replacement": "Mac OS X"},
    # specific distros before generic Linux (uap-core ordering)
    {"regex": r"(Ubuntu)"},
    {"regex": r"(Debian)"},
    {"regex": r"(Fedora)"},
    {"regex": r"(FreeBSD)"},
    {"regex": r"(OpenBSD)"},
    {"regex": r"(NetBSD)"},
    {"regex": r"(Linux)"},
]

#: Device-family rules (uap-core `device_parsers` shape:
#: ``device_replacement`` with $1 substitution; default = first
#: capture group). Curated high-frequency subset: crawler traffic maps
#: to uap-core's "Spider" pseudo-device, Apple hardware to
#: iPhone/iPad/Mac, Samsung/Pixel Androids to their model families,
#: remaining Androids to the Generic buckets, desktop Windows/Linux to
#: "Other" (upstream's convention). First match wins, as upstream.
DEVICE_PARSERS: list[dict] = [
    {
        "regex": r"(?:Googlebot|bingbot|[A-Za-z0-9._-]*(?:[Bb]ot|[Ss]pider|"
        r"[Cc]rawler)(?:[/ ;)]|$))",
        "device_replacement": "Spider",
    },
    {"regex": r"(iPhone)"},
    {"regex": r"(iPad)"},
    {"regex": r"(iPod)"},
    {
        "regex": r"Android[^;)]*;\s(?:U;\s)?(?:[a-z]{2}-[A-Za-z]{2};\s)?"
        r"(SM-[A-Za-z0-9]+)",
        "device_replacement": "Samsung $1",
    },
    {
        "regex": r"Android[^;)]*;\s(?:U;\s)?(?:[a-z]{2}-[A-Za-z]{2};\s)?"
        r"(Pixel[ a-zA-Z0-9]*)",
        "device_replacement": "$1",
    },
    # Android with a Mobile token but no recognized model
    {"regex": r"(Android).*Mobile", "device_replacement": "Generic Smartphone"},
    {"regex": r"(Android)", "device_replacement": "Generic Tablet"},
    {"regex": r"(Macintosh)", "device_replacement": "Mac"},
]
