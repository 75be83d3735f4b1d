"""Metric truth table — port of reference tests/unit/test_optimizer.py:14-184
against the Spark column-expression implementation (SURVEY §5.2 item 2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pii_redactor_spark import fixtures
from pii_redactor_spark.kernels.scrub import make_scrub_udf
from pii_redactor_spark.operators.metrics import (
    build_feedback,
    extract_labels,
    token_f1,
    with_hybrid_score,
)

# (gold, pred, det, cls, score, num_correct) —
# reference: tests/unit/test_optimizer.py:27-113
TRUTH_TABLE = [
    ("Call [GIVENNAME1] at [TEL].", "Call [GIVENNAME1] at [TEL].",
     1.0, 1.0, 1.0, 2),
    ("Hello world.", "Hello world.", 1.0, 1.0, 1.0, 0),
    ("Call [GIVENNAME1] at [TEL].", "Call [GIVENNAME1] at 555-1234.",
     0.5, 1.0, 0.75 * 0.5 + 0.25 * 1.0, 1),
    ("Call [GIVENNAME1] at home.", "Call [GIVENNAME1] at [TEL].",
     1.0, 1.0, 1.0, 1),
    ("ID: [PASSPORT]", "ID: [IDCARD]", 1.0, 0.0, 0.75, 0),
    ("Call [GIVENNAME1] at [TEL].", "Call John at 555-1234.",
     0.0, 0.0, 0.0, 0),
    ("[TEL]", "555-1234", 0.0, 0.0, 0.0, 0),
    ("555-1234", "[TEL]", 1.0, 1.0, 1.0, 0),
    ("[TEL] and [TEL]", "[TEL]", 0.5, 1.0, 0.75 * 0.5 + 0.25, 1),
    ("[GIVENNAME1] [LASTNAME1] [TEL]", "[GIVENNAME1] [IDCARD] [EMAIL]",
     1.0, 1 / 3, 0.75 + 0.25 / 3, 1),
    ("[GIVENNAME1] [LASTNAME1] [TEL] [EMAIL]",
     "[GIVENNAME1] [IDCARD] [TEL] [IP] [USERNAME]",
     1.0, 0.5, 0.75 + 0.25 * 0.5, 2),
    # whitespace stripping (reference: test_optimizer.py:148-152)
    ("Call [GIVENNAME1]", "  Call [GIVENNAME1]  ", 1.0, 1.0, 1.0, 1),
]


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(
        [(i, g, p) for i, (g, p, *_) in enumerate(TRUTH_TABLE)],
        "id int, gold string, pred string",
    )
    df = with_hybrid_score(df)
    df = build_feedback(df)
    return {r["id"]: r for r in df.collect()}


class TestHybridScore:
    @pytest.mark.parametrize("i", range(len(TRUTH_TABLE)))
    def test_truth_table_row(self, scored, i):
        _, _, det, cls, score, n = TRUTH_TABLE[i]
        row = scored[i]
        assert row["detection_recall"] == pytest.approx(det), row
        assert row["classification_acc"] == pytest.approx(cls), row
        assert row["hybrid_score"] == pytest.approx(score), row
        assert row["num_correct"] == n, row


class TestSeverityAndFeedback:
    def test_correct_feedback(self, scored):
        assert "Correct" in scored[0]["feedback"]
        assert scored[0]["severity"] == "correct"

    def test_critical_on_missed_pii(self, scored):
        row = scored[2]  # under-redaction
        assert row["severity"] == "CRITICAL"
        assert "CRITICAL" in row["feedback"]

    def test_minor_on_wrong_label(self, scored):
        row = scored[4]  # PASSPORT vs IDCARD
        assert row["severity"] == "minor"
        assert "Minor:" in row["feedback"]

    def test_note_on_over_redaction(self, scored):
        row = scored[3]
        assert row["severity"] == "note"
        assert "Note: Over-redacted" in row["feedback"]
        assert row["hybrid_score"] == 1.0

    def test_feedback_has_score_parts(self, scored):
        assert "detection_recall=" in scored[2]["feedback"]
        assert "classification_acc=" in scored[2]["feedback"]


class TestFeedbackStringParity:
    """String-level port of the reference feedback assertions
    (tests/unit/test_optimizer.py:116-184) plus full-string pins of
    ``_build_feedback``'s assembly (optimizer.py:142-213)."""

    def test_correct_is_exact_string(self, scored):
        assert scored[0]["feedback"] == (
            "Correct. All PII entities detected with correct labels.")

    def test_missing_and_unexpected_label_lists(self, scored):
        fb = scored[4]["feedback"]  # PASSPORT vs IDCARD
        assert "Missing labels: PASSPORT" in fb
        assert "Unexpected labels: IDCARD" in fb

    def test_includes_expected_and_got(self, scored):
        fb = scored[4]["feedback"]
        assert "Expected" in fb and "Got" in fb

    def test_includes_text_f1_reference(self, scored):
        assert "Full-text token F1=" in scored[4]["feedback"]

    def test_labels_match_text_differs_line(self, scored):
        # over-redaction: hybrid == 1.0 but texts differ
        fb = scored[3]["feedback"]
        assert "Note: Over-redacted by 1 item(s) (acceptable)." in fb
        assert "All PII labels match, but surrounding text differs." in fb

    def test_full_string_minor_case(self, scored):
        # byte-level assembly parity for the wrong-label case
        assert scored[4]["feedback"] == (
            "Hybrid score=0.75 (detection_recall=1.00, "
            "classification_acc=0.00). "
            "Minor: 0/1 detected item(s) have correct labels. "
            "Missing labels: PASSPORT. Unexpected labels: IDCARD. "
            "Full-text token F1=0.50 (for reference). "
            "\nExpected:\nID: [PASSPORT]\n\nGot:\nID: [IDCARD]")

    def test_full_string_critical_case(self, scored):
        # hybrid 0.625 formats as "0.62" (Python round-half-even; the
        # reference is CPython f-string formatting)
        assert scored[2]["feedback"] == (
            "Hybrid score=0.62 (detection_recall=0.50, "
            "classification_acc=1.00). "
            "CRITICAL: Missed 1 PII item(s) — only 1/2 redacted. "
            "Full-text token F1=0.75 (for reference). "
            "\nExpected:\nCall [GIVENNAME1] at [TEL].\n\n"
            "Got:\nCall [GIVENNAME1] at 555-1234.")

    def test_multiplicity_suffix_in_label_lists(self, spark):
        # Counter-subtraction multiplicity renders as "LBL (xN)"
        df = spark.createDataFrame(
            [("[TEL] [TEL] [EMAIL]", "[IP] [IP] [EMAIL]")],
            "gold string, pred string")
        fb = build_feedback(with_hybrid_score(df)).first()["feedback"]
        assert "Missing labels: TEL (x2)." in fb
        assert "Unexpected labels: IP (x2)." in fb


class TestExtractLabels:
    def test_extracts_in_order(self, spark):
        # reference: test_optimizer.py:14-24
        df = spark.createDataFrame(
            [("Call [GIVENNAME1] [LASTNAME1] at [TEL].",),
             ("No PII here.",),
             ("[GIVENNAME1] and [GIVENNAME2]",)],
            "t string",
        ).select(extract_labels("t").alias("labels"))
        rows = [r["labels"] for r in df.collect()]
        assert rows[0] == ["GIVENNAME1", "LASTNAME1", "TEL"]
        assert rows[1] == []
        assert rows[2] == ["GIVENNAME1", "GIVENNAME2"]


class TestTokenF1:
    def test_identical_is_one(self, spark):
        df = spark.createDataFrame([("a b c", "a b c")], "g string, p string")
        assert df.select(token_f1("g", "p").alias("f1")).first()["f1"] == 1.0

    def test_half_overlap(self, spark):
        df = spark.createDataFrame([("a b", "a c")], "g string, p string")
        assert df.select(token_f1("g", "p").alias("f1")).first()["f1"] == pytest.approx(0.5)

    def test_dspy_f1_both_empty_after_normalization_is_zero(self, spark):
        # pure-article/punctuation text normalizes to EMPTY token lists;
        # dspy's _f1_score only warns there and falls through to
        # num_same == 0 -> 0.0 (round-2 advice: parity is 0, not 1)
        from pii_redactor_spark.operators.metrics import dspy_token_f1
        df = spark.createDataFrame([("the. a!", "an, the;"), ("", "")],
                                   "g string, p string")
        vals = [r["f1"] for r in
                df.select(dspy_token_f1("g", "p").alias("f1")).collect()]
        assert vals == [0.0, 0.0]


class TestEndToEndGoldenScore:
    def test_scrub_output_scores_one_on_every_fixture(self, spark):
        """Pipeline self-consistency: our scrub output vs the reference's
        redacted text must score 1.0 on all 25 fixtures (the F1/parity
        gate's metric counterpart)."""
        udf = make_scrub_udf(per_url_gazetteer=fixtures.per_url_gazetteer(),
                             enable_regex=False)
        df = (
            fixtures.golden_df(spark)
            .withColumn("pred", udf("url", "text").scrubbed_text)
            .withColumnRenamed("redacted_text_gold", "gold")
        )
        df = with_hybrid_score(df)
        agg = df.agg(
            F.min("hybrid_score").alias("mn"),
            F.avg("hybrid_score").alias("avg"),
        ).first()
        assert agg["mn"] == 1.0 and agg["avg"] == 1.0
