"""Fixture-integrity suite — port of the reference's golden-corpus checks
(reference: tests/unit/test_examples.py:38-99) over the vendored JSON.

Pure-Python (no Spark) so it runs first and fast under ``pytest -x``.
"""

from __future__ import annotations

import re

from pii_redactor_spark import fixtures

LABEL_PATTERN = re.compile(r"\[([A-Z0-9]+)\]")


def test_minimum_count():
    assert len(fixtures.golden_rows()) >= 20  # reference: test_examples.py:39-40


def test_all_have_required_fields():
    for r in fixtures.golden_rows():
        assert r["text"] and r["entities"] and r["redacted_text_gold"]


def test_entities_use_valid_labels():
    valid = set(fixtures.valid_labels())
    for r in fixtures.golden_rows():
        for e in r["entities"]:
            assert e["label"] in valid, (r["url"], e)


def test_entity_values_appear_in_text():
    for r in fixtures.golden_rows():
        for e in r["entities"]:
            assert e["value"] in r["text"], (r["url"], e)


def test_redacted_text_contains_labels():
    for r in fixtures.golden_rows():
        in_redacted = set(LABEL_PATTERN.findall(r["redacted_text_gold"]))
        entity_labels = {e["label"] for e in r["entities"]}
        assert entity_labels == in_redacted, r["url"]


def test_redacted_text_has_no_raw_pii():
    # reference: tests/unit/test_examples.py:75-83 (word-boundary leak check)
    for r in fixtures.golden_rows():
        for e in r["entities"]:
            pattern = re.compile(r"\b" + re.escape(e["value"]) + r"\b")
            assert not pattern.search(r["redacted_text_gold"]), (r["url"], e)


def test_all_labels_covered():
    used = {e["label"] for r in fixtures.golden_rows() for e in r["entities"]}
    missing = set(fixtures.valid_labels()) - used
    assert not missing, missing


def test_fewshot_ids_count():
    ids = fixtures.fewshot_row_ids()
    assert len(ids) == 25 and len(set(ids)) == 25
