"""Per-host quota sampling (crawl politeness / anti-domination cap).

A 10^12-page crawl is dominated by a handful of hosts; training corpora
cap documents per host so no domain overwhelms the mixture (C4 and
derivatives do this at ingest). Operator: keep at most ``max_per_host``
documents per host, chosen by a *deterministic* pseudo-random priority —
an md5-fold of (seed, url) — so the sample is reproducible across runs
and engines (no rand()).

Plan shape: one shuffle on host (the window partition), row_number,
filter. Skewed hosts are exactly the point here — the window only needs
(priority, rank) per partition and AQE handles the hot host's partition;
for pathological hosts the same salting used in tables.py applies first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"


def priority_expr(url: Column, seed: int) -> Column:
    """Deterministic 32-bit priority: first 8 hex chars of
    md5('<seed>:' || url) — reproducible in any engine."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), url)), 1, 8),
        16, 10,
    ).cast("bigint")


def cap_per_host(df: DataFrame, url_col: str = "url",
                 max_per_host: int = 100, seed: int = 42) -> DataFrame:
    """Keep at most ``max_per_host`` docs per host (deterministic)."""
    host = F.lower(F.regexp_extract(F.col(url_col), HOST_RE, 1))
    w = Window.partitionBy("host").orderBy("priority", url_col)
    return (
        df
        .withColumn("host", host)
        .withColumn("priority", priority_expr(F.col(url_col), seed))
        .withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= max_per_host)
        .drop("priority", "host_rank")
    )


def cap_per_host_oracle_sql(urls_cte: str, max_per_host: int = 100,
                            seed: int = 42) -> str:
    """DuckDB twin over a CTE producing (doc_id, url)."""
    fold = (
        "list_sum(list_transform(range(8), i -> "
        f"CAST(strpos('0123456789abcdef', substr(md5('{seed}:' || url), "
        "CAST(i+1 AS INT), 1)) - 1 AS BIGINT) * CAST(power(16, 7 - i) AS BIGINT)))"
    )
    return f"""
WITH urls AS ({urls_cte}),
ranked AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS host,
         ROW_NUMBER() OVER (
           PARTITION BY lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1))
           ORDER BY {fold}, url) AS host_rank
  FROM urls)
SELECT doc_id, url, host FROM ranked WHERE host_rank <= {max_per_host}
"""
