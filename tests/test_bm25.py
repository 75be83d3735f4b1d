"""BM25 seed-relevance selection: integer-exact scoring semantics and
the zero-shuffle serving-plan shape."""

from __future__ import annotations

import math

from pii_redactor_spark.operators import bm25


def test_idf_quantization_matches_duckdb_ln():
    import duckdb
    con = duckdb.connect()
    for n, df in [(500, 3), (500, 250), (5000, 1), (5000, 4999)]:
        got = bm25._idf_q(n, df)
        want = con.execute(
            f"SELECT CAST(floor(ln(1.0 + (CAST({n} AS DOUBLE) - {df} + 0.5)"
            f" / ({df} + 0.5)) * 1000000 + 0.5) AS BIGINT)").fetchone()[0]
        assert got == want, (n, df, got, want)


def test_bm25_scoring_semantics(spark):
    rows = [
        (0, "join join join filler filler filler"),     # tf=3 common term
        (1, "vector filler filler filler filler"),      # tf=1 rare term
        (2, "join filler filler filler filler filler"), # tf=1 common term
        (3, "filler words only nothing relevant here"), # score 0
        (4, None),                                      # NULL text -> 0
        (5, "join hash scan vector"),                   # all four terms
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["bm25_q"]
           for r in bm25.bm25_topk(docs, topk=6).collect()}
    assert out[3] == 0 and out[4] == 0
    # rare term beats a single common-term hit (idf dominates)
    assert out[1] > out[2]
    # more hits of the same term beats fewer (tf saturation is monotone)
    assert out[0] > out[2]
    # covering every query term scores highest
    assert out[5] == max(out.values())
    # exact recompute of one cell in Python: doc 2, term 'join'
    n = 6
    n_words = {0: 6, 1: 5, 2: 6, 3: 6, 4: 0, 5: 4}
    total = sum(n_words.values())
    dfs = {"join": 3, "hash": 1, "scan": 1, "vector": 2}
    idf = bm25._idf_q(n, dfs["join"])
    tf, dl = 1, 6
    want = (idf * 22 * tf * total) // (
        10 * tf * total + 3 * total + 9 * dl * n)
    assert out[2] == want


def test_bm25_plan_zero_shuffle_take_ordered(spark):
    """The serving plan is scan -> projection (literal idf constants,
    word array materialized once) -> TakeOrderedAndProject: no
    Exchange, no Window, no Python. The stats pass runs once at plan
    construction (bounded 1-row collect) like every other model fit."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = bm25.bm25_topk(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan, plan
    assert "Window" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_bm25_tie_break_is_deterministic(spark):
    rows = [(i, "join filler one two three") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = [r["doc_id"] for r in bm25.bm25_topk(docs, topk=4).collect()]
    assert top == [0, 1, 2, 3]  # equal scores -> doc_id ascending


def test_bm25_matches_pure_python_on_random_corpora(spark):
    """Property check (fixed seed grid, no float in either path's
    score): the Spark plan's integer BM25 equals a from-scratch pure-
    Python recompute — same idf quantization (math.log), same integer
    floor-div saturation — on random corpora drawn from a vocabulary
    overlapping the query terms."""
    import random

    terms = bm25.BM25_TERMS
    vocab = list(terms) + ["filler", "words", "page", "data"]
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        rows = []
        for i in range(30):
            n = rng.randint(0, 12)
            rows.append((i, " ".join(rng.choice(vocab)
                                     for _ in range(n)) or None))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r["doc_id"], r["n_words"], r["bm25_q"])
               for r in bm25.bm25_topk(docs, topk=30).collect()}

        # pure-Python twin
        toks = {i: (t.split() if t else []) for i, t in rows}
        n_docs = len(rows)
        total = sum(len(v) for v in toks.values())
        want = set()
        for i, ws in toks.items():
            score = 0
            for t in terms:
                tf = ws.count(t)
                if tf == 0:
                    continue
                df = sum(1 for v in toks.values() if t in v)
                idf = bm25._idf_q(n_docs, df)
                score += (idf * 22 * tf * total) // (
                    10 * tf * total + 3 * total + 9 * len(ws) * n_docs)
            want.add((i, len(ws), score))
        assert got == want, seed
