"""Sequence packing + the bounded global prefix-sum primitive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pii_redactor_spark.operators.ranking import global_prefix_sum

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _toks(docs):
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(
            F.col("text"),
            F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)).alias("n"))


def test_prefix_sum_matches_single_window(docs):
    toks = _toks(docs)
    got = {r["doc_id"]: r["ps"]
           for r in global_prefix_sum(toks, "doc_id", "n",
                                      sum_name="ps").collect()}
    w = (Window.orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    want = {r["doc_id"]: r["ps"] for r in toks.withColumn(
        "ps", F.coalesce(F.sum("n").over(w), F.lit(0))).collect()}
    assert got == want


def test_prefix_sum_plan_never_single_partition(docs):
    plan = (global_prefix_sum(_toks(docs), "doc_id", "n")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastExchange" in plan  # tiny offsets table broadcast


def test_pack_covers_token_stream_exactly(spark):
    from pii_redactor_spark.contract import QUERIES, SEQ_TOKENS
    out = sorted(QUERIES["q_pack"](spark, SF).collect(),
                 key=lambda r: r["doc_id"])
    # offsets are contiguous: each doc starts where the previous ended
    run = 0
    for r in out:
        assert r["start_off"] == run
        run += r["n_tokens"]
        assert r["seq_idx"] == r["start_off"] // SEQ_TOKENS
        if r["n_tokens"] > 0:
            last = r["start_off"] + r["n_tokens"] - 1
            assert r["n_seqs"] == last // SEQ_TOKENS - r["seq_idx"] + 1
    # every sequence index up to the last is inhabited (chunking leaves
    # no empty training sequences) — only token-bearing docs count
    seqs = set()
    for r in out:
        if r["n_tokens"] > 0:
            seqs.update(range(r["seq_idx"], r["seq_idx"] + r["n_seqs"]))
    assert seqs == set(range(max(seqs) + 1))


def test_pack_rows_materialization(spark):
    """q_pack_rows is the exploded writer-ready form: row count equals
    sum(n_seqs), every doc's slices tile its token stream contiguously,
    and per-seq_idx slice sums hit SEQ_TOKENS exactly except the final
    partial sequence."""
    from collections import defaultdict

    from pii_redactor_spark.contract import QUERIES, SEQ_TOKENS
    pack = QUERIES["q_pack"](spark, SF).collect()
    rows = QUERIES["q_pack_rows"](spark, SF).collect()
    assert len(rows) == sum(r["n_seqs"] for r in pack)
    by_doc = defaultdict(list)
    per_seq = defaultdict(int)
    for r in rows:
        assert r["slice_len"] > 0
        by_doc[r["doc_id"]].append(r)
        per_seq[r["seq_idx"]] += r["slice_len"]
    ntok = {r["doc_id"]: r["n_tokens"] for r in pack}
    for doc_id, spans in by_doc.items():
        spans.sort(key=lambda r: r["seq_idx"])
        pos = 0
        for s in spans:
            assert s["slice_start"] == pos
            pos += s["slice_len"]
        assert pos == ntok[doc_id]
    last = max(per_seq)
    for seq_idx, tot in per_seq.items():
        if seq_idx < last:
            assert tot == SEQ_TOKENS
        else:
            assert 0 < tot <= SEQ_TOKENS


def test_prefix_sum_null_values_and_null_buckets(spark):
    """NULL values contribute 0 in both phases (window sum skips them,
    bucket sums coalesce) — including a bucket that is entirely NULL."""
    rows = [(i, None if i % 3 == 0 else i) for i in range(30)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r["k"]: r["ps"]
           for r in global_prefix_sum(df, "k", "v", sum_name="ps",
                                      num_buckets=4).collect()}
    run, want = 0, {}
    for k, v in rows:
        want[k] = run
        run += v or 0
    assert got == want
