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
