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


def fixture_lines_extended() -> list[str]:
    """`fixture_lines()` plus a deterministic 3-day corpus: 3 days ×
    7 UTC hours × 3 client IPs whose octet sums spread across all 5
    fake-geo countries, with mixed statuses (2xx/3xx/4xx/5xx), browser/
    bot/curl agents, '-' timing sentinels, WAF blocks, per-day health
    checks (filtered) and garbage lines (dropped). Grows the composed
    `elb_pipeline_hourly` oracle from 3 hourly groups to 60+ and gives
    `elb_error_report` dozens of 4xx/5xx rows across agents/countries
    (VERDICT r02 item 6)."""
    lines = fixture_lines()
    statuses = [200, 200, 301, 404, 500, 200, 503, 200, 404, 200]
    ua_cycle = ["browser", "browser", "bot", "curl", "browser", "bot"]
    paths = ["/api/v1/items", "/api/v2/users", "/static/app.js",
             "/checkout", "/search", "/admin/login"]
    for day in (26, 27, 28):
        base = datetime(2025, 5, day)
        for hour in (0, 6, 9, 12, 15, 18, 21):
            for u in range(3):
                # octet sum = 20 + (day-26) + hour + (7u+day) → country
                # residue varies with all three loop indices
                ip = f"20.{day - 26}.{hour}.{u * 7 + day}"
                n_req = 2 + (day + hour + u) % 3
                for r in range(n_req):
                    k = day + hour + u + r
                    status = statuses[k % len(statuses)]
                    ua = UAS[ua_cycle[(u + r) % len(ua_cycle)]]
                    lines.append(
                        make_line(
                            base + timedelta(hours=hour, minutes=3 * r, seconds=u),
                            ip,
                            status=status,
                            ua=ua,
                            path=paths[k % len(paths)],
                            rpt="-" if k % 7 == 0 else "0.002",
                            classification_reason=(
                                "WAF,Blocked" if status == 503 and r == 0 else "-"
                            ),
                        )
                    )
        # per-day noise: health checks (filtered) + a garbage line
        lines.append(
            make_line(base + timedelta(hours=12), "10.0.9.9", ua=UAS["healthcheck"])
        )
        lines.append(f"garbage line day {day}")
    return lines




#: Committed parquet of the raw fixture lines — shared input for the
#: `elb_pipeline_hourly` registry query AND its DuckDB oracle (which
#: reads it by absolute path, since the driver registers only the
#: testdata tables as views). Regenerate with `write_fixture_parquet()`.
import os as _os

FIXTURE_PARQUET = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "data", "elb_fixture_lines.parquet"
)

#: Extended 3-day corpus — shared input of `elb_pipeline_hourly` and
#: `elb_error_report` and their DuckDB oracles (round 3).
FIXTURE_PARQUET_EXT = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "data", "elb_fixture_lines_ext.parquet"
)


def write_fixture_parquet(path: str = FIXTURE_PARQUET, extended: bool = False) -> str:
    """Write fixture lines to a single-column (`value`) parquet file.

    Deterministic (fixed lines, fixed encoding) so the committed file
    never churns; pyarrow directly — no SparkSession needed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    _os.makedirs(_os.path.dirname(path), exist_ok=True)
    lines = fixture_lines_extended() if extended else fixture_lines()
    table = pa.table({"value": pa.array(lines, pa.string())})
    pq.write_table(table, path, compression="snappy")
    return path
