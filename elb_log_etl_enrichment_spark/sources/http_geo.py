"""Rate-limited HTTP geolocation fan-out (SURVEY.md §2.1 S9).

The reference loops serially over new IPs calling ip-api.com with a
0.6 s sleep (elb_logs.py:166-209, 413-419) — a ≤100 lookups/min
ceiling. Here the fan-out is a ``mapInPandas`` table function: each
partition issues its own throttled request stream, so aggregate
throughput scales with the ``parallelism`` knob (a ``repartition``
of the distinct key set — see the in-function note for why coalesce
is specifically wrong here) while still honoring a per-partition
rate limit.

The HTTP transport is injectable: tests (and this offline container)
use a deterministic fake; the real transport is only constructed on
demand. Error responses produce the reference's ``"Error"`` sentinel
row (elb_logs.py:186-209).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .geo_cache import GEO_SCHEMA

#: fields mirrored from the ip-api.com response (elb_logs.py:167,174-184)
_FIELDS = ["countryCode", "countryName", "regionName", "city", "lat", "lon", "isp"]


def error_sentinel(ip: str) -> dict:
    """The reference's failure row (elb_logs.py:186-209)."""
    row = {"client_ip": ip, "lat": None, "lon": None}
    for f in ("countryCode", "countryName", "regionName", "city", "isp"):
        row[f] = "Error"
    return row


def fake_fetch(ip: str) -> dict:
    """Deterministic offline stand-in for ip-api.com used in tests."""
    octet = sum(int(p) for p in ip.split(".") if p.isdigit()) % 5
    return {
        "client_ip": ip,
        "countryCode": f"C{octet}",
        "countryName": f"Country{octet}",
        "regionName": f"Region{octet}",
        "city": f"City{octet}",
        "lat": float(octet) * 10.0,
        "lon": float(octet) * -10.0,
        "isp": f"ISP{octet}",
    }


def http_fetch(ip: str) -> dict:  # pragma: no cover - network edge
    """Real transport (reference fetch_geolocation_data,
    elb_logs.py:166-209): ip-api.com JSON with 5 s timeout."""
    import json
    import urllib.request

    url = (
        f"http://ip-api.com/json/{ip}?fields=status,message,country,countryCode,"
        "region,regionName,city,lat,lon,isp,query"
    )
    try:
        with urllib.request.urlopen(url, timeout=5) as resp:
            data = json.loads(resp.read().decode("utf-8"))
        if data.get("status") == "success":
            return {
                "client_ip": data.get("query", ip),
                "countryCode": data.get("countryCode"),
                "countryName": data.get("country"),
                "regionName": data.get("regionName"),
                "city": data.get("city"),
                "lat": data.get("lat"),
                "lon": data.get("lon"),
                "isp": data.get("isp"),
            }
        return error_sentinel(ip)
    except Exception:
        return error_sentinel(ip)


def fetch_geolocations(
    new_ips: DataFrame,
    fetch_fn: Callable[[str], dict] = fake_fetch,
    rate_limit_s: float | None = None,
    parallelism: int = 1,
    row_count_acc=None,
) -> DataFrame:
    """Distributed, throttled lookup of geolocation rows for a frame of
    distinct ``client_ip`` keys. Returns rows in ``GEO_SCHEMA`` with
    ``api_fetch_timestamp`` stamped at fetch time (naive UTC — the
    session timezone is pinned to UTC, so a machine-local stamp would
    shift the cache's last-write-wins ordering across hosts/DST).

    ``rate_limit_s`` defaults to the REFERENCE's 0.6 s inter-call
    sleep (elb_logs.py:419) whenever the real ip-api transport is in
    use — callers that forget to throttle must not hammer the free
    tier into 429s, whose Error sentinel rows the cache would then
    persist and never refetch (code-review r05 finding). Injected
    offline transports default to unthrottled.

    ``parallelism`` bounds concurrent API clients (free-tier etiquette:
    keep ``parallelism / rate_limit_s`` under the provider cap).

    ``row_count_acc`` (optional SparkContext accumulator): incremented
    by the number of rows each task EMITS, so a caller that
    materializes this frame inside a larger job (the deferred
    pipeline's broadcast build) can learn fetched-row emptiness
    afterwards WITHOUT submitting a probe job (r10, VERDICT r9 item
    2). Zero-vs-nonzero is exact — failed tasks' accumulator updates
    are discarded by Spark, so a nonzero value always means some
    successful task emitted rows.
    """
    if rate_limit_s is None:
        rate_limit_s = 0.6 if fetch_fn is http_fetch else 0.0

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ip in pdf["client_ip"]:
                row = dict(fetch_fn(ip))
                row["api_fetch_timestamp"] = pd.Timestamp.now(
                    tz="UTC"
                ).tz_localize(None)
                rows.append(row)
                if rate_limit_s:
                    time.sleep(rate_limit_s)
            if row_count_acc is not None and rows:
                row_count_acc.add(len(rows))
            yield pd.DataFrame(
                rows, columns=["client_ip", *_FIELDS, "api_fetch_timestamp"]
            )

    # repartition, not coalesce — even for the serial default (r8
    # code-review): coalesce(1) is a NARROW dependency, so it would
    # collapse the entire upstream reduce stage (the distinct final
    # aggregate and the anti-join probe against a possibly
    # multi-million-row cache) into one task, not just the fetch.
    # The repartition shuffle it saves carries only the distinct new
    # key set — trivial next to a serialized join.
    return new_ips.repartition(max(parallelism, 1)).mapInPandas(
        fetch_batches, schema=GEO_SCHEMA
    )
