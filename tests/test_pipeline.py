"""End-to-end pipeline: fused kernels + rules + keep/drop decision.

The F1 gate (BASELINE.md): Spark pipeline keep/drop decisions vs an
independent driver-side oracle must reach F1 >= 0.99 (expected: exact).
"""

from __future__ import annotations

import re

import pytest

from pii_redactor_spark import fixtures
from pii_redactor_spark.functions.gazetteers import global_scrub_gazetteer
from pii_redactor_spark.functions.rules import STOPWORDS, QualityThresholds
from pii_redactor_spark.kernels.langid import predict_lang_batch
from pii_redactor_spark.kernels.perplexity import perplexity_batch
from pii_redactor_spark.plans.pipeline import run_pipeline

TH = QualityThresholds(toxicity_words=("tox_slur_a", "tox_profanity_a"))
MAX_PPL = 30.0
ALLOWED = ("en",)

NATURAL_DOCS = [
    "The children walked to school in the morning and read their favorite stories.",
    "A gentle rain fell over the fields as the train departed from the old station.",
    "Many people in the city enjoy walking through the park on a warm summer evening.",
    "The teacher asked the students to write a short essay about their holidays.",
    "He opened the window and listened to the sound of the birds in the garden.",
]


def corpus_rows() -> list[tuple[str, str]]:
    rows = [(f"test://natural/{i}", t) for i, t in enumerate(NATURAL_DOCS)]
    rows += [
        ("test://short/1", "Hi there"),
        ("test://garbled/1", "xq zvk jjq wfp qzx vkj mmx ppw zzq xkv jqz wpf qqq zzz"),
        ("test://toxic/1", NATURAL_DOCS[0] + " tox_slur_a"),
        ("test://dup/1", "the same line again and again\n" * 8 + "one more\n"),
        ("test://german/1", "Die Bibliothek öffnet samstags früh und die Studenten "
                            "kommen mit ihren Büchern und lesen den ganzen Tag."),
        ("test://symbols/1", "# " * 30 + "the word"),
    ]
    rows += [(r["url"], r["text"]) for r in fixtures.golden_rows()]
    return rows


def oracle_decision(url: str, text: str) -> tuple[bool, set[str]]:
    """Independent pure-Python implementation of the decision spec."""
    reasons: set[str] = set()
    words = [w for w in re.split(r"\s+", text.strip()) if w]
    n = len(words)
    if n < TH.min_words:
        reasons.add("too_few_words")
    if n > TH.max_words:
        reasons.add("too_many_words")
    mwl = sum(len(w) for w in words) / n if n else 0.0
    if not (TH.min_mean_word_len <= mwl <= TH.max_mean_word_len):
        reasons.add("mean_word_len_out_of_range")
    symbols = text.count("#") + text.count("…")
    if n and symbols / n > TH.max_symbol_word_ratio:
        reasons.add("symbol_ratio_high")
    alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
    if (alpha / n if n else 0.0) < TH.min_alpha_word_ratio:
        reasons.add("alpha_ratio_low")
    stop = sum(1 for w in words if w.lower() in STOPWORDS)
    if (stop / n if n else 0.0) < TH.min_stopword_ratio:
        reasons.add("stopword_ratio_low")
    lines = [l for l in text.split("\n") if l.strip()]
    if lines and 1 - len(set(lines)) / len(lines) > TH.max_dup_line_ratio:
        reasons.add("dup_lines_high")
    if n > 1:
        from collections import Counter
        bigrams = Counter(zip(words, words[1:]))
        if max(bigrams.values()) / (n - 1) > TH.max_top_bigram_ratio:
            reasons.add("repeated_bigram_high")
    from collections import Counter as _C

    def _ngrams(k):
        return [tuple(words[i:i + k]) for i in range(n - k + 1)] \
            if n >= k else []
    tri = _C(_ngrams(3))
    if tri and max(tri.values()) / sum(tri.values()) > TH.max_top_trigram_ratio:
        reasons.add("repeated_trigram_high")
    quad = _C(_ngrams(4))
    if quad and max(quad.values()) / sum(quad.values()) > TH.max_top_quadgram_ratio:
        reasons.add("repeated_quadgram_high")
    five = _ngrams(5)
    if five and 1 - len(set(five)) / len(five) > TH.max_dup_5gram_ratio:
        reasons.add("dup_5gram_high")
    low = {w.lower() for w in words}
    if any(t in low for t in TH.toxicity_words):
        reasons.add("toxicity")
    lang = predict_lang_batch([text])[0][0]
    if lang not in ALLOWED:
        reasons.add("lang_not_allowed")
    # ppl is scored under the PREDICTED language's LM (multilingual gate)
    ppl = perplexity_batch([text], [lang])[0]
    if ppl is not None and ppl > MAX_PPL:
        reasons.add("perplexity_high")
    return (not reasons, reasons)


@pytest.fixture(scope="module")
def pipeline_out(spark):
    rows = corpus_rows()
    df = spark.createDataFrame(rows, "url string, text string")
    out = run_pipeline(
        df, thresholds=TH, allowed_langs=ALLOWED, max_ppl=MAX_PPL,
        per_url_gazetteer=fixtures.per_url_gazetteer(),
        global_gazetteer=global_scrub_gazetteer(),
    )
    return {r["url"]: r for r in out.collect()}


class TestKeepDropF1:
    def test_f1_gate(self, pipeline_out):
        tp = fp = fn = tn = 0
        mismatches = []
        for url, text in corpus_rows():
            want_keep, _ = oracle_decision(url, text)
            got_keep = pipeline_out[url]["keep"]
            if want_keep and got_keep:
                tp += 1
            elif want_keep and not got_keep:
                fn += 1
                mismatches.append((url, "dropped", pipeline_out[url]["reasons"]))
            elif not want_keep and got_keep:
                fp += 1
                mismatches.append((url, "kept", None))
            else:
                tn += 1
        precision = tp / (tp + fp) if tp + fp else 1.0
        recall = tp / (tp + fn) if tp + fn else 1.0
        f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
        assert f1 >= 0.99, (f1, mismatches)

    def test_reason_parity(self, pipeline_out):
        for url, text in corpus_rows():
            _, want_reasons = oracle_decision(url, text)
            got = set(pipeline_out[url]["reasons"])
            assert got == want_reasons, (url, got, want_reasons)


class TestPipelineBehaviors:
    def test_natural_kept(self, pipeline_out):
        for i in range(len(NATURAL_DOCS)):
            assert pipeline_out[f"test://natural/{i}"]["keep"] is True

    def test_golden_scrub_byte_identical_through_pipeline(self, pipeline_out):
        for r in fixtures.golden_rows():
            got = pipeline_out[r["url"]]["scrubbed_text"]
            # pipeline runs with regex + global gazetteer ON; the per-url
            # gazetteer has priority, but extra tiers may add redactions —
            # run the strict parity check on gazetteer-only spans instead:
            # here assert no gold label token is lost
            gold_labels = re.findall(r"\[([A-Z]+\d*)\]", r["redacted_text_gold"])
            got_labels = re.findall(r"\[([A-Z]+\d*)\]", got)
            for lbl in set(gold_labels):
                assert got_labels.count(lbl) >= gold_labels.count(lbl), (r["url"], lbl)

    def test_kernel_outputs_present(self, pipeline_out):
        row = pipeline_out["test://natural/0"]
        assert row["lang_pred"] == "en"
        assert row["ppl"] is not None and row["ppl"] < MAX_PPL
        assert row["n_redactions"] == 0

    def test_garbled_dropped_for_ppl(self, pipeline_out):
        assert "perplexity_high" in pipeline_out["test://garbled/1"]["reasons"]

    def test_german_dropped_for_lang(self, pipeline_out):
        assert "lang_not_allowed" in pipeline_out["test://german/1"]["reasons"]
