"""Per-host quota sampling (crawl politeness / anti-domination cap).

A 10^12-page crawl is dominated by a handful of hosts; training corpora
cap documents per host so no domain overwhelms the mixture (C4 and
derivatives do this at ingest). Operator: keep at most ``max_per_host``
documents per host, chosen by a *deterministic* pseudo-random priority —
an md5-fold of (seed, url) — so the sample is reproducible across runs
and engines (no rand()).

Plan shape: TWO-PHASE salted cap. A single ``Window.partitionBy(host)``
would put a hot host (by construction ~50% of the crawl) into ONE window
partition — AQE's skew splitting does not apply to window partitions, so
at 10^12 pages one task would sort half the corpus. Instead:

  phase 1 — row_number over (host, salt) with salt = priority % k:
            every host's rows spread over k window partitions; keep the
            top ``max_per_host`` of each salt bucket (a superset of the
            global per-host top, since every global-top row is also in
            the top of its own bucket);
  phase 2 — row_number over host on the <= k * max_per_host survivors
            per host: the hot partition is now bounded by
            max(cold-host size, k * max_per_host) regardless of corpus
            size.

Both phases order by the same md5 priority, so the result — and the
DuckDB oracle, which keeps the one-window formulation — is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"

CAP_SALT_K = 16  # phase-1 fan-out; hot-partition bound = k * max_per_host


def priority_expr(url: Column, seed: int) -> Column:
    """Deterministic 32-bit priority: first 8 hex chars of
    md5('<seed>:' || url) — reproducible in any engine."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), url)), 1, 8),
        16, 10,
    ).cast("bigint")


def cap_per_host(df: DataFrame, url_col: str = "url",
                 max_per_host: int = 100, seed: int = 42,
                 salt_k: int = CAP_SALT_K,
                 tiebreak_col: str | None = None) -> DataFrame:
    """Keep at most ``max_per_host`` docs per host (deterministic).

    Two-phase: per-(host, salt) pre-cap bounds every window partition,
    then the per-host window ranks only the <= salt_k * max_per_host
    survivors. Selection is identical to a single per-host window
    ordered by (priority, url[, tiebreak]) PROVIDED that ordering is a
    total order — the phase-1/phase-2 equivalence proof needs it (each
    global top-``max_per_host`` row of a host is within the top
    ``max_per_host`` of its own salt bucket, so phase 1 never drops a
    winner; with ties, row_number tie-breaking is physical-order
    dependent and the two plans may keep different physical rows).
    Pass ``tiebreak_col`` (e.g. a unique doc id) whenever ``url_col``
    can repeat within a host (round-2 advice); with unique urls the
    default ordering is already total."""
    host = F.lower(F.regexp_extract(F.col(url_col), HOST_RE, 1))
    order = ["priority", url_col] + (
        [tiebreak_col] if tiebreak_col is not None else [])
    w1 = Window.partitionBy("host", "_salt").orderBy(*order)
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        df
        .withColumn("host", host)
        .withColumn("priority", priority_expr(F.col(url_col), seed))
        .withColumn("_salt", F.pmod(F.col("priority"), F.lit(salt_k)))
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= max_per_host)
        .withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= max_per_host)
        .drop("priority", "_salt", "_r1", "host_rank")
    )


def hash_split(df: DataFrame, id_col: str = "doc_id",
               salt: str = "split:",
               train_pct: int = 80, val_pct: int = 10,
               part_col: str = "part") -> DataFrame:
    """Deterministic train/val/test split by id-hash percentile — the
    standard NON-positional corpus splitter (contrast O30's positional
    slice, which the reference mandates for its devset;
    membership here is a pure projection: stable under reordering,
    repartitioning, and corpus growth, and needs no rank at all).
    md5-fold so the DuckDB oracle reproduces the assignment."""
    h = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            1, 8), 16, 10).cast("bigint"),
        F.lit(100))
    return df.withColumn(
        part_col,
        F.when(h < train_pct, F.lit("train"))
         .when(h < train_pct + val_pct, F.lit("val"))
         .otherwise(F.lit("test")))


def cap_per_host_oracle_sql(urls_cte: str, max_per_host: int = 100,
                            seed: int = 42,
                            tiebreak_col: str | None = None) -> str:
    """DuckDB twin over a CTE producing (doc_id, url) — single-window
    formulation; ``tiebreak_col`` mirrors the Spark side's total-order
    tie-breaker."""
    fold = (
        "list_sum(list_transform(range(8), i -> "
        f"CAST(strpos('0123456789abcdef', substr(md5('{seed}:' || url), "
        "CAST(i+1 AS INT), 1)) - 1 AS BIGINT) * CAST(power(16, 7 - i) AS BIGINT)))"
    )
    tb = f", {tiebreak_col}" if tiebreak_col is not None else ""
    return f"""
WITH urls AS ({urls_cte}),
ranked AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS host,
         ROW_NUMBER() OVER (
           PARTITION BY lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1))
           ORDER BY {fold}, url{tb}) AS host_rank
  FROM urls)
SELECT doc_id, url, host FROM ranked WHERE host_rank <= {max_per_host}
"""
