"""Deterministic synthetic ALB log-line fixtures (FIXTURES.md §A):
bursts (<5 min apart), session gaps (>30 min), health-check UAs, bot
UAs, '-' timing sentinels, non-digit status codes, 4xx/5xx rows."""

from __future__ import annotations

from datetime import datetime, timedelta

UAS = {
    "browser": "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
               "(KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36",
    "bot": "Googlebot/2.1 (+http://www.google.com/bot.html)",
    "healthcheck": "ELB-HealthChecker/2.0 aws-elb",
    "curl": "curl/8.5.0",
}


def make_line(
    ts: datetime,
    ip: str,
    status: int | str = 200,
    ua: str = UAS["browser"],
    path: str = "/api/v1/items",
    rpt: str = "0.001",
    tpt: str = "0.020",
    classification_reason: str = "-",
) -> str:
    t = ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
    return (
        f"https {t} app/test-lb/abc123 {ip}:4431 10.0.0.5:80 "
        f"{rpt} {tpt} 0.000 {status} {status} 120 2048 "
        f'"GET https://svc.example.com:443{path}?q=1 HTTP/1.1" "{ua}" '
        f"TLS_AES_128_GCM_SHA256 TLSv1.3 arn:aws:elb:tg/abc "
        f'"Root=1-abc" "svc.example.com" "arn:aws:acm:cert/xyz" '
        f'1 {t} "forward" "-" "-" "10.0.0.5:80" "{status}" "-" '
        f'"{classification_reason}" TID_{ip.replace(".", "")}_{int(ts.timestamp())}'
    )


def fixture_lines() -> list[str]:
    """~40 lines across 3 IPs: a burst, a session break, bots, health
    checks, errors, '-' timings, a WAF block, and garbage lines."""
    base = datetime(2025, 5, 26, 12, 0, 0)
    lines: list[str] = []
    # burst: 10 requests < 5 min apart from one IP
    for i in range(10):
        lines.append(make_line(base + timedelta(seconds=20 * i), "10.1.1.1"))
    # session break: same IP returns 40 minutes later
    lines.append(make_line(base + timedelta(minutes=45), "10.1.1.1"))
    # second IP: errors + '-' timings + non-digit status
    for i, status in enumerate([404, 500, 503, "abc", 200]):
        lines.append(
            make_line(
                base + timedelta(minutes=2 * i),
                "10.2.2.2",
                status=status,
                rpt="-",
                path=f"/errors/e{i}",
            )
        )
    # WAF-blocked request
    lines.append(
        make_line(
            base + timedelta(minutes=20), "10.2.2.2", status=403,
            classification_reason="WAF,Blocked",
        )
    )
    # bot traffic from a third IP
    for i in range(5):
        lines.append(
            make_line(
                base + timedelta(minutes=i), "10.3.3.3", ua=UAS["bot"],
                path="/robots.txt",
            )
        )
    # health checks (must be filtered out)
    for i in range(5):
        lines.append(
            make_line(base + timedelta(minutes=i), "10.0.9.9", ua=UAS["healthcheck"])
        )
    # garbage (must be dropped by the parser)
    lines += ["", "not a log line", "https 2025-05-26T12:00:00.000000Z short"]
    return lines


#: Committed parquet of the raw fixture lines — shared input for the
#: `elb_pipeline_hourly` registry query AND its DuckDB oracle (which
#: reads it by absolute path, since the driver registers only the
#: testdata tables as views). Regenerate with `write_fixture_parquet()`.
import os as _os

FIXTURE_PARQUET = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "data", "elb_fixture_lines.parquet"
)


def write_fixture_parquet(path: str = FIXTURE_PARQUET) -> str:
    """Write `fixture_lines()` to a single-column (`value`) parquet file.

    Deterministic (fixed lines, fixed encoding) so the committed file
    never churns; pyarrow directly — no SparkSession needed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    _os.makedirs(_os.path.dirname(path), exist_ok=True)
    table = pa.table({"value": pa.array(fixture_lines(), pa.string())})
    pq.write_table(table, path, compression="snappy")
    return path
