"""The corpus quality pipeline: ingest → kernels → rules → decide.

Equivalent of the reference's per-document ``redact(text)`` flow
(reference: main.py:13-33) plus the north-star quality-filter stages,
assembled scale-first:

- the three Python kernels (langid, perplexity, scrub) run in ONE fused
  struct-returning pandas UDF, so document text crosses the JVM→Arrow
  boundary exactly once (SURVEY §4.2: the biggest physical win);
- heuristic rules and the keep/drop decision are pure Column expressions
  evaluated JVM-side;
- the result keeps per-document entities + reasons for auditing, mirroring
  the reference's per-example feedback records (evaluator.py:125-161).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from pii_redactor_spark.functions.rules import (
    QualityThresholds,
    attach_quality_stats,
    keep_decision,
    toxicity_hit,
)

KERNEL_RESULT_TYPE = StructType([
    StructField("lang_pred", StringType()),
    StructField("lang_conf", DoubleType()),
    StructField("ppl", DoubleType()),
    StructField("scrubbed_text", StringType()),
    StructField("entities", ArrayType(StructType([
        StructField("value", StringType()),
        StructField("label", StringType()),
        StructField("start", IntegerType()),
        StructField("end", IntegerType()),
    ]))),
    StructField("n_redactions", IntegerType()),
])


def make_fused_kernel_udf(
    per_url_gazetteer: dict[str, list[tuple[str, str]]] | None = None,
    enable_regex: bool = True,
    global_gazetteer: list[tuple[str, str]] | None = None,
):
    """(url, text) -> struct<lang_pred, lang_conf, ppl, scrubbed_text,
    entities, n_redactions> — one Python pass, one Arrow round-trip."""
    per_url = per_url_gazetteer or {}
    global_gaz = list(global_gazetteer or ())
    regex_on = enable_regex

    @F.pandas_udf(KERNEL_RESULT_TYPE)
    def kernels(
        batches: Iterator[tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.DataFrame]:
        # heavy imports + model fitting once per worker, not per batch
        from pii_redactor_spark.kernels.langid import (
            fit_langid, predict_lang_batch)
        from pii_redactor_spark.kernels.perplexity import (
            fit_charlm, perplexity_batch)
        from pii_redactor_spark.kernels.scrub import scrub_text
        fit_langid()
        fit_charlm()
        for urls, texts in batches:
            langs, confs = predict_lang_batch(texts)
            # score each doc under ITS predicted language's LM
            ppls = perplexity_batch(texts, langs)
            scrubbed_col: list[str | None] = []
            ents_col: list[list[dict] | None] = []
            n_col: list[int | None] = []
            for url, text in zip(urls, texts):
                if text is None:
                    scrubbed_col.append(None)
                    ents_col.append(None)
                    n_col.append(None)
                    continue
                scrubbed, ents = scrub_text(
                    text, per_url.get(url, ()),
                    enable_regex=regex_on, global_gazetteer=global_gaz)
                scrubbed_col.append(scrubbed)
                ents_col.append(ents)
                n_col.append(len(ents))
            yield pd.DataFrame({
                "lang_pred": langs, "lang_conf": confs, "ppl": ppls,
                "scrubbed_text": scrubbed_col, "entities": ents_col,
                "n_redactions": n_col,
            })

    return kernels


def run_pipeline(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    thresholds: QualityThresholds | None = None,
    allowed_langs: tuple[str, ...] = ("en",),
    max_ppl: float | None = 30.0,
    per_url_gazetteer: dict[str, list[tuple[str, str]]] | None = None,
    enable_regex: bool = True,
    global_gazetteer: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Full quality pipeline over a pages DataFrame.

    Output adds: lang_pred, lang_conf, ppl, scrubbed_text, entities,
    n_redactions, all quality-rule stats, keep:boolean, reasons:array.
    """
    th = thresholds or QualityThresholds()
    fused = make_fused_kernel_udf(per_url_gazetteer, enable_regex,
                                  global_gazetteer)
    df = attach_quality_stats(
        pages
        .withColumn("_k", fused(F.col(url_col), F.col(text_col)))
        .select("*", "_k.*")
        .drop("_k"),
        text_col, th,
    )
    if th.toxicity_words:
        df = df.withColumn("is_toxic", toxicity_hit(text_col, list(th.toxicity_words)))
    rule_keep, rule_reasons = keep_decision(th)

    extra_checks: list[tuple[str, Column]] = []
    if allowed_langs:
        extra_checks.append(
            ("lang_not_allowed", ~F.col("lang_pred").isin(*allowed_langs)))
    if max_ppl is not None:
        extra_checks.append(("perplexity_high", F.col("ppl") > F.lit(max_ppl)))
    extra_reasons = F.array_compact(F.array(*[
        F.when(cond, F.lit(name)) for name, cond in extra_checks
    ])) if extra_checks else F.array().cast("array<string>")

    reasons = F.concat(rule_reasons, extra_reasons)
    return (
        df
        .withColumn("reasons", reasons)
        .withColumn("keep", F.size(F.col("reasons")) == 0)
    )
