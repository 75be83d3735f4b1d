"""Driver-contract query registry: Spark queries + DuckDB oracle SQL.

Each registered query implements an operator from SURVEY.md §2 over the
driver testdata tables; the paired ANSI-SQL string is run by DuckDB on the
same parquet for row-count + schema + value-hash comparison. Column names
are aliased identically on both sides. Float aggregates go through
DECIMAL(18,6) so partial-aggregation order (Spark shuffles) cannot change
low-order bits vs the single-threaded oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pii_redactor_spark.session import ship_package

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

# Stand-in for the reference's FEWSHOT_ROW_IDS exclusion set
# (reference: examples.py:5-31, optimizer.py:46-47): the driver corpus keys
# are integers, so the anti-join key set is the first 25 doc ids.
FEWSHOT_DOC_IDS = list(range(25))


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ship_package(spark)  # executors need the package importable
            return fn(spark, sf_dir)
        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# O8 — language equality filter (reference: optimizer.py:43).
# Catalyst pushes the predicate into the parquet scan.
# ---------------------------------------------------------------------------
@register(
    "q_lang_filter",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents WHERE lang = 'en'
    """,
)
def q_lang_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "lang", "source", "n_chars")
    )


# ---------------------------------------------------------------------------
# O9/O17 — few-shot exclusion as a broadcast left-anti join
# (reference: optimizer.py:46-47 over examples.py:5-31).
# ---------------------------------------------------------------------------
@register(
    "q_fewshot_anti",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE doc_id NOT IN ({', '.join(map(str, FEWSHOT_DOC_IDS))})
    """,
)
def q_fewshot_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    excluded = spark.createDataFrame(
        [(i,) for i in FEWSHOT_DOC_IDS], "doc_id long")
    return (
        docs.join(F.broadcast(excluded), "doc_id", "left_anti")
        .select("doc_id", "lang", "n_chars")
    )


# ---------------------------------------------------------------------------
# O28/O29 — deterministic offset+limit slice (reference: evaluator.py:50-53);
# order pinned by doc_id since Spark has no implicit row order (SURVEY §7.6).
# ---------------------------------------------------------------------------
@register(
    "q_slice_offset",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents ORDER BY doc_id OFFSET 100 LIMIT 50
    """,
)
def q_slice_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .offset(100).limit(50)
        .select("doc_id", "lang", "n_chars")
    )


# ---------------------------------------------------------------------------
# Top-k (TakeOrderedAndProject): longest documents (SURVEY §2.6 bench note).
# ---------------------------------------------------------------------------
@register(
    "q_topk_longest",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 20
    """,
)
def q_topk_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", "lang", "n_chars")
    )


# ---------------------------------------------------------------------------
# O20/O24 — counts + mean over groups (reference: optimizer.py:44-52,
# evaluator.py:95-96) as a partial+final hash aggregation.
# ---------------------------------------------------------------------------
@register(
    "q_lang_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS doc_count,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(ROUND(AVG(CAST(n_chars AS DECIMAL(18,6))), 4) AS DOUBLE) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def q_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(F.avg(F.col("n_chars").cast("decimal(18,6)")), 4)
             .cast("double").alias("avg_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Batch time-window aggregation over the events table (SURVEY §7.5) —
# tumbling 1-hour windows via date_trunc, exact decimal sums.
# ---------------------------------------------------------------------------
@register(
    "q_events_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
             .cast("double").alias("total_value"),
        )
    )
