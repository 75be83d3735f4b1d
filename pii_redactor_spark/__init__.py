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
    session       SparkSession factory with pinned configs + ship_package
    tables        Iceberg-style table layer, checkpoint-resume, salting
    kernels/      scrub, langid, perplexity (numpy/pandas, Arrow-batched)
    functions/    quality-rule Column expressions + gazetteers
    operators/    metrics, dedup, similarity, fingerprint, multimodal
    sources/      Common-Crawl-shaped corpus synthesis + html→text
    plans/        pipeline assembly + held-out evaluation
    streaming/    foreachBatch scrub + watermarked window aggs
    cli           spark-submit entry points
"""

__version__ = "0.1.0"
