"""URL filtering + canonicalization rules (C4-style corpus pre-filter).

The first gate of a web-corpus pipeline runs before a single byte of page
text is touched: drop documents by URL alone (binary/media extensions,
admin/login pages, blocklisted hosts, pathological paths), and
canonicalize the URL (lowercase host, strip query/fragment and trailing
slash) so exact-URL dedup keys are stable.

Everything is a Column expression over the url string — JVM-side,
evaluated at scan speed, prunable before the (expensive) text columns are
even read. Host/path come from ``regexp_extract`` rather than
``parse_url`` so the DuckDB oracle can reproduce them with the identical
regex.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)?"

BLOCKED_EXTENSIONS = (
    "jpg jpeg png gif webp svg ico css js woff woff2 ttf mp3 mp4 avi mov "
    "zip gz tar rar exe dmg iso pdf"
).split()
BLOCKED_PATH_TOKENS = ("/wp-admin", "/wp-login", "/cgi-bin", "/login",
                       "/signup", "/cart", "/checkout")
MAX_URL_LEN = 2048
MAX_PATH_DEPTH = 10


def host_of(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(u, HOST_RE, 1))


def path_of(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(u, PATH_RE, 1)


def canonical_url(url: Column | str) -> Column:
    """scheme://lowercased-host/path — query, fragment and trailing
    slashes stripped; empty path normalized to '/'. The stable
    exact-dedup key."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    stripped = F.regexp_replace(path_of(u), r"/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    return F.concat(scheme, F.lit("://"), host_of(u), path)


def with_url_rules(
    df: DataFrame,
    url_col: str = "url",
    blocked_hosts: list[str] | None = None,
) -> DataFrame:
    """Attach host, path, canonical_url, url_keep, url_reasons."""
    u = F.col(url_col)
    host = host_of(u)
    path = path_of(u)
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1))
    depth = F.size(F.filter(F.split(path, "/"),
                            lambda p: p != ""))
    checks: list[tuple[str, Column]] = [
        ("url_too_long", F.length(u) > MAX_URL_LEN),
        ("no_host", host == ""),
        ("blocked_extension", ext.isin(BLOCKED_EXTENSIONS)),
        ("path_too_deep", depth > MAX_PATH_DEPTH),
        # tokens are plain literals (letters, '/', '-') — safe unescaped
        ("blocked_path", F.lower(path).rlike("|".join(BLOCKED_PATH_TOKENS))),
    ]
    if blocked_hosts:
        checks.append(("blocked_host", host.isin([h.lower() for h in blocked_hosts])))
    reasons = F.array_compact(F.array(*[
        F.when(cond, F.lit(name)) for name, cond in checks
    ]))
    return (
        df
        .withColumn("host", host)
        .withColumn("path", path)
        .withColumn("url_reasons", reasons)
        .withColumn("url_keep", F.size(F.col("url_reasons")) == 0)
    )
