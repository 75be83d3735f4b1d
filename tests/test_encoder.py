"""Neural-encoder slot (kernels/encoder.py): expression/UDF equality,
plan shape, artifact round-trip, and the encoder->ANN loop."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pii_redactor_spark.kernels import encoder

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").limit(100)


def test_udf_equals_expression_form(docs, spark):
    """The Arrow/numpy twin and the oracle-mirrored expression form are
    the same network — bit-identical integer outputs, INCLUDING the
    NULL/empty-text rows (both emit the bias-only activation, the
    oracle's COALESCE semantics)."""
    docs = docs.unionByName(spark.createDataFrame(
        [(90001, None, None, None, None), (90002, "", None, None, None)],
        docs.schema))
    a = {r["doc_id"]: r["emb"]
         for r in encoder.with_mlp_embedding(docs).collect()}
    b = {r["doc_id"]: r["emb"]
         for r in encoder.mlp_embeddings_udf(docs).collect()}
    assert a == b
    assert all(len(v) == encoder.MLP_OUT for v in a.values())
    assert a[90001] == a[90002]  # NULL and empty: bias-only activation


def test_expression_plan_is_projection_only(docs):
    plan = (encoder.with_mlp_embedding(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_relu_actually_fires(docs):
    """The network is genuinely nonlinear on this corpus: some hidden
    pre-activations go negative (so relu clips them) — if not, the MLP
    would collapse to one linear projection."""
    w1, b1, w2 = encoder.mlp_weights()
    from pii_redactor_spark.functions.rules import words_col
    rows = docs.select(words_col(F.col("text")).alias("ws")).collect()
    clipped = total = 0
    for r in rows:
        x = np.zeros(len(w1), dtype=np.int64)
        for w in r["ws"]:
            bkt, sign = encoder.bow_bucket(w)
            x[bkt] += sign
        pre = x @ w1 + b1
        clipped += int((pre < 0).sum())
        total += len(pre)
    assert 0 < clipped < total


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "hello world")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["emb"]
           for r in encoder.with_mlp_embedding(df).collect()}
    w1, b1, w2 = encoder.mlp_weights()
    bias_only = list(np.maximum(b1, 0) @ w2)
    # NULL and empty both score the bias-only activation (the oracle's
    # COALESCE(SUM, 0) semantics)
    assert out[0] == bias_only and out[1] == bias_only
    assert out[2] != bias_only


def test_artifact_roundtrip_and_preload(tmp_path, docs):
    from pii_redactor_spark.kernels.artifacts import (
        load_artifacts, save_artifacts)
    try:
        save_artifacts(tmp_path / "art")
        base = {r["doc_id"]: r["emb"]
                for r in encoder.with_mlp_embedding(docs).collect()}
        load_artifacts(tmp_path / "art")
        again = {r["doc_id"]: r["emb"]
                 for r in encoder.with_mlp_embedding(docs).collect()}
        assert base == again  # npz round-trips the int64 tables exactly
        # a DIFFERENT artifact changes the served embeddings (fit->serve
        # is real, not cosmetic)
        w1, b1, w2 = encoder.mlp_weights()
        encoder.preload((w1, b1 + 1, w2))
        changed = {r["doc_id"]: r["emb"]
                   for r in encoder.with_mlp_embedding(docs).collect()}
        assert changed != base
    finally:
        encoder.clear_preload()


def test_mlp_ann_udf_form_matches_expression_form(docs):
    a = sorted(map(tuple,
                   encoder.mlp_ann(docs, k=5, udf_form=False).collect()))
    b = sorted(map(tuple,
                   encoder.mlp_ann(docs, k=5, udf_form=True).collect()))
    assert a == b
    assert len(a) == 5 * 5  # 5 queries x top-5, fully populated


def test_mlp_summary_vectorized_matches_expression(docs):
    a = sorted(map(tuple,
                   encoder.mlp_summary(docs, vectorized=False).collect()))
    b = sorted(map(tuple,
                   encoder.mlp_summary(docs, vectorized=True).collect()))
    assert a == b


def test_preloaded_artifact_reaches_udf_executors(docs):
    """Round-4 ADVICE regression: the Arrow twin must serve the
    PRELOADED artifact, not the md5 defaults — executor Python workers
    never see a driver-side preload(), so make_mlp_embed_udf resolves
    the weight arrays at construction time and cloudpickle ships them
    in the closure (the fused-kernel pattern of plans/pipeline.py)."""
    try:
        w1, b1, w2 = encoder.mlp_weights()
        base = {r["doc_id"]: r["emb"]
                for r in encoder.mlp_embeddings_udf(docs).collect()}
        encoder.preload((w1, b1 + 3, w2))
        expr = {r["doc_id"]: r["emb"]
                for r in encoder.with_mlp_embedding(docs).collect()}
        udf = {r["doc_id"]: r["emb"]
               for r in encoder.mlp_embeddings_udf(docs).collect()}
        assert udf == expr      # both serve the fitted artifact...
        assert udf != base      # ...which actually changed the output
    finally:
        encoder.clear_preload()
