"""Model-based quality classifier (kernels/quality_clf.py).

Gates: deterministic fit, clean/junk separation, exact Spark-vs-Python
scoring parity (integer-scaled weights make summation order-free),
empty-doc behavior, artifact roundtrip, and plan shape (projection
only — no shuffle, no Python in the hot path)."""

from __future__ import annotations

import numpy as np
import pytest

from pii_redactor_spark.kernels import quality_clf as qc

from tests.conftest import SF_DIR


def _score_py(doc: str, w: np.ndarray, b: int) -> float:
    words = doc.split()
    if not words:
        return b / 1e6
    s = sum(int(w[qc.bucket_of(x)]) for x in words)
    return s / 1e6 / len(words) + b / 1e6


def test_fit_deterministic():
    w1, b1 = qc.fit_quality_clf()
    w2, b2 = qc.fit_quality_clf.__wrapped__()
    assert np.array_equal(w1, w2) and b1 == b2
    assert w1.dtype == np.int64 and len(w1) == qc.CLF_DIM


def test_separates_clean_from_junk():
    w, b = qc.fit_quality_clf()
    pos = [_score_py(d, w, b) for d in qc._positive_docs()]
    neg = [_score_py(d, w, b) for d in qc._junk_docs()]
    assert min(pos) > qc.CLF_THRESHOLD
    assert max(neg) < qc.CLF_THRESHOLD
    # held-out probes: unseen clean prose vs seen-vocab spam
    clean = _score_py(
        "the committee reviewed the annual report and approved new "
        "funding for local schools", w, b)
    junk = _score_py("buy buy buy click here click here free winner", w, b)
    assert clean > qc.CLF_THRESHOLD > junk


def test_spark_scoring_matches_python(spark):
    w, b = qc.clf_weights()
    docs = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "click click click buy free winner casino"),
        ("c", ""),
        ("d", "   "),
        ("e", "Science and technology have changed the way we live"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           qc.quality_clf_columns(df).collect()}
    for doc_id, text in docs:
        exp = round(_score_py(text, w, b), 6) + 0.0
        got = out[doc_id]["q_logit"]
        assert got == pytest.approx(exp, abs=0), (doc_id, got, exp)
        assert out[doc_id]["clf_keep"] == (got >= qc.CLF_THRESHOLD)
    # empty/whitespace docs score exactly the bias
    assert out["c"]["q_logit"] == round(b / 1e6, 6)
    assert out["c"]["n_words"] == 0


def test_artifact_roundtrip(tmp_path):
    from pii_redactor_spark.kernels import artifacts
    artifacts.save_artifacts(tmp_path)
    t = artifacts.load_tables(tmp_path)
    w0, b0 = qc.fit_quality_clf()
    assert np.array_equal(t["quality_clf"][0], w0)
    assert t["quality_clf"][1] == b0
    assert t["manifest"]["quality_clf"]["dim"] == qc.CLF_DIM
    # preload wins over refitting and is visible through clf_weights
    bumped = (w0 + 1, b0 + 5)
    qc.preload(bumped)
    try:
        w1, b1 = qc.clf_weights()
        assert b1 == b0 + 5 and np.array_equal(w1, w0 + 1)
    finally:
        qc._PRELOADED = None
    assert qc.clf_weights()[1] == b0


def test_plan_is_projection_only(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (qc.quality_clf_columns(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_oracle_agrees_at_sf0001(spark):
    import duckdb
    from pii_redactor_spark.contract import ORACLE_SQL, QUERIES
    sd = (QUERIES["q_quality_clf"](spark, SF_DIR).toPandas()
          .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')")
    od = (con.execute(ORACLE_SQL["q_quality_clf"]).fetchdf()
          .sort_values("doc_id").reset_index(drop=True))
    assert len(sd) == len(od) == 500
    assert (sd["q_logit"].values == od["q_logit"].values).all()
    assert (sd["clf_keep"].values == od["clf_keep"].values).all()
    assert (sd["n_words"].values == od["n_words"].values).all()


def test_nb_fit_distributed_separates(spark):
    """One-pass NB fit over a labeled DataFrame: the corpus-scale fit
    path. Served through the same projection, it must separate the
    training classes and generalize to held-out probes."""
    pos, neg = qc._positive_docs(), qc._junk_docs()
    df = spark.createDataFrame(
        [(i, d, True) for i, d in enumerate(pos)]
        + [(len(pos) + i, d, False) for i, d in enumerate(neg)],
        "doc_id long, text string, label boolean")
    w, b = qc.fit_quality_nb(df, "label")
    assert b == 0 and w.dtype == np.int64 and len(w) == qc.CLF_DIM
    scores_pos = [_score_py(d, w, b) for d in pos]
    scores_neg = [_score_py(d, w, b) for d in neg]
    correct = sum(s > 0 for s in scores_pos) + sum(s < 0 for s in scores_neg)
    assert correct >= 0.9 * (len(pos) + len(neg))
    clean = _score_py(
        "the committee reviewed the annual report and approved new "
        "funding for local schools", w, b)
    junk = _score_py("click click click buy free winner casino", w, b)
    assert clean > 0 > junk
    # serving the NB weights reuses the exact projection path
    out = {r["doc_id"]: r["q_logit"] for r in qc.quality_clf_columns(
        df, weights=(w, b)).collect()}
    assert out[0] == pytest.approx(round(scores_pos[0], 6) + 0.0, abs=0)


def test_nb_counts_conserve_words(spark):
    """Bucket counts are sufficient statistics: per-class totals equal
    the corpus word totals, and the aggregation is one shuffle."""
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .withColumn("_label", F.col("n_chars") >= 300)
    counts = qc.nb_bucket_counts(docs, "_label")
    plan = counts._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "EvalPython" not in plan
    got = counts.agg(F.sum("n_pos").alias("p"),
                     F.sum("n_neg").alias("n")).first()
    totals = (docs.select(
        F.size(F.filter(F.split(F.trim("text"), r"\s+"),
                        lambda w: w != "")).alias("nw"), "_label")
        .groupBy("_label").agg(F.sum("nw").alias("t")).collect())
    exp = {r["_label"]: r["t"] for r in totals}
    assert got["p"] == exp[True] and got["n"] == exp[False]


def test_quality_tiers_exact_terciles(spark):
    from pii_redactor_spark.operators.cache import release_caches
    from pyspark.sql import functions as F
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = qc.quality_tiers(docs).collect()
        assert len(out) == 500
        sizes = {}
        for r in out:
            sizes[r["tier"]] = sizes.get(r["tier"], 0) + 1
        # ((rn-1)*3) div 500: tail rn 1..167, middle 168..334, head 335..500
        assert sizes == {"tail": 167, "middle": 167, "head": 166}
        by_tier = {t: [r["q_logit"] for r in out if r["tier"] == t]
                   for t in sizes}
        assert max(by_tier["tail"]) <= min(by_tier["middle"])
        assert max(by_tier["middle"]) <= min(by_tier["head"])
        ranks = sorted(r["rn"] for r in out)
        assert ranks == list(range(1, 501))
        plan = (qc.quality_tiers(docs)._jdf.queryExecution()
                .executedPlan().toString())
        assert "SinglePartition" not in plan
    finally:
        release_caches()
