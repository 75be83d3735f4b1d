"""pii_redactor_spark — a PySpark-native web-corpus quality + PII-scrub engine.

A from-scratch re-expression of the *capabilities* of the reference repo
tomkaith13/pii-redactor (per-document PII redaction, keep/drop decisions,
label-multiset metrics, dataset slicing/sampling, held-out evaluation,
checkpoint-resume) as an idiomatic Spark DataFrame pipeline over a
Common-Crawl-style corpus table, with the reference's per-document LLM call
replaced by local numeric kernels (language-ID, n-gram perplexity,
heuristic quality rules, compiled-regex + gazetteer scrub) running as
vectorized pandas/Arrow UDFs.

Layout:
    session       SparkSession factory with pinned configs
    kernels/      scrub, langid, perplexity (numpy/pandas, Arrow-batched)
    functions/    label extraction + quality-rule Column expressions
    operators/    metrics, slicing, dedup, similarity — DataFrame combinators
    sources/      corpus load/synthesis + Iceberg-style table layer
    plans/        end-to-end pipeline assembly
    streaming/    foreachBatch wrapper for the scrub stage
"""

__version__ = "0.1.0"
