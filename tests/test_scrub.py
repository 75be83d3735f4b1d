"""Scrub-kernel correctness: byte-identical golden parity (pure + Spark)
and the offline scenario behaviors.

Gates (BASELINE.md): scrubbed text byte-identical to the reference's
``redacted_text`` per url (reference: examples.py:33-418); scenario
behaviors per reference: tests/integration/test_redact.py:9-54.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pii_redactor_spark import fixtures
from pii_redactor_spark.functions.gazetteers import global_scrub_gazetteer
from pii_redactor_spark.kernels.scrub import make_scrub_udf, scrub_text

LABEL_RE = re.compile(r"\[([A-Z0-9]+)\]")


class TestPureKernelGolden:
    def test_byte_identical_all_25(self):
        for r in fixtures.golden_rows():
            gaz = [(e["value"], e["label"]) for e in r["entities"]]
            scrubbed, ents = scrub_text(r["text"], gaz, enable_regex=False)
            assert scrubbed == r["redacted_text_gold"], r["url"]

    def test_no_raw_pii_after_scrub(self):
        for r in fixtures.golden_rows():
            gaz = [(e["value"], e["label"]) for e in r["entities"]]
            scrubbed, _ = scrub_text(r["text"], gaz, enable_regex=False)
            for e in r["entities"]:
                pat = re.compile(r"\b" + re.escape(e["value"]) + r"\b")
                assert not pat.search(scrubbed), (r["url"], e["value"])

    def test_entities_carry_offsets(self):
        r = fixtures.golden_rows()[0]
        gaz = [(e["value"], e["label"]) for e in r["entities"]]
        _, ents = scrub_text(r["text"], gaz, enable_regex=False)
        for e in ents:
            assert r["text"][e["start"]:e["end"]] == e["value"]

    def test_empty_and_none(self):
        assert scrub_text("", [("x", "EMAIL")]) == ("", [])


class TestScrubSpark:
    """The same kernel through the Arrow-batched pandas UDF."""

    @pytest.fixture(scope="class")
    def scrubbed(self, spark):
        udf = make_scrub_udf(
            per_url_gazetteer=fixtures.per_url_gazetteer(),
            enable_regex=False,
        )
        df = (
            fixtures.golden_df(spark)
            .withColumn("result", udf("url", "text"))
            .select("url", "redacted_text_gold", "result.*")
        )
        return {r["url"]: r for r in df.collect()}

    def test_byte_identical_via_spark(self, scrubbed):
        for r in fixtures.golden_rows():
            got = scrubbed[r["url"]]
            assert got["scrubbed_text"] == r["redacted_text_gold"], r["url"]

    def test_redaction_counts_positive(self, scrubbed):
        for url, row in scrubbed.items():
            assert row["n_redactions"] == len(row["entities"]) > 0


class TestScenarios:
    """Offline port of the reference's 8 live-LLM integration scenarios."""

    @pytest.fixture(scope="class")
    def results(self, spark):
        udf = make_scrub_udf(
            enable_regex=True,
            global_gazetteer=global_scrub_gazetteer(),
        )
        df = (
            fixtures.scenario_df(spark)
            .withColumn("result", udf("url", "text"))
            .select("url", "text", "result.*")
        )
        return {r["url"]: r for r in df.collect()}

    def _labels(self, row):
        return set(LABEL_RE.findall(row["scrubbed_text"]))

    def test_name_and_phone(self, results):
        r = results["fixture://scenario/1"]
        assert {"GIVENNAME1", "LASTNAME1", "TEL"} <= self._labels(r)
        for raw in ("John", "Smith", "555-123-4567"):
            assert raw not in r["scrubbed_text"]

    def test_email(self, results):
        r = results["fixture://scenario/2"]
        assert "EMAIL" in self._labels(r)
        assert "alice@example.com" not in r["scrubbed_text"]

    def test_ssn(self, results):
        r = results["fixture://scenario/3"]
        assert "SOCIALNUMBER" in self._labels(r)
        assert "123-45-6789" not in r["scrubbed_text"]

    def test_address(self, results):
        r = results["fixture://scenario/4"]
        assert {"STREET", "CITY", "STATE", "POSTCODE"} <= self._labels(r)
        for raw in ("Oak Street", "Portland", "97201"):
            assert raw not in r["scrubbed_text"]

    def test_no_pii_passthrough(self, results):
        r = results["fixture://scenario/5"]
        assert r["scrubbed_text"] == r["text"]
        assert r["n_redactions"] == 0

    def test_multiple_people(self, results):
        r = results["fixture://scenario/6"]
        for raw in ("Alice", "Brown", "Bob", "Davis"):
            assert raw not in r["scrubbed_text"]

    def test_ip(self, results):
        r = results["fixture://scenario/7"]
        assert "IP" in self._labels(r)
        assert "10.0.0.1" not in r["scrubbed_text"]

    def test_short_passthrough(self, results):
        r = results["fixture://scenario/8"]
        assert r["scrubbed_text"] == "Hi there"


class TestRegexTierUnits:
    @pytest.mark.parametrize("text,label", [
        ("pay 4111 1111 1111 1111 now", "CREDITCARD"),
        ("host 2001:db8::8a2e:370:7334 up", "IP"),
        ("at 7836:3dcf:9edf:692:fd5f:4de5:a9d6:da24 x", "IP"),
        ("meet at 10:20am ok", "TIME"),
        ("updated 29/06/2013 yes", "DATE"),
        ("born 29/06/2013 yes", "BOD"),
        ("zip 93023-9549 ok", "POSTCODE"),
        ("geo [37.4353, -86.941] there", "GEOCOORD"),
    ])
    def test_structured_patterns(self, text, label):
        scrubbed, ents = scrub_text(text)
        assert [e["label"] for e in ents] == [label], scrubbed

    def test_document_id_classes(self):
        # context-anchored patterns redact the full PII-bearing span
        # (prefix included), so assert the label fires and the id value
        # is gone
        cases = [
            ("Passport No: AB1234567 issued", "PASSPORT", "AB1234567"),
            ("code XY9876543 on file", "PASSPORT", "XY9876543"),
            ("Driver's License #: D123-4567-8901", "DRIVERLICENSE",
             "D123-4567-8901"),
            ("ID card no: A12345678", "IDCARD", "A12345678"),
            ("ping @some_user about it", "USERNAME", "@some_user"),
        ]
        for text, label, value in cases:
            scrubbed, ents = scrub_text(text, (), enable_regex=True)
            assert any(e["label"] == label for e in ents), (text, ents)
            assert value not in scrubbed, (text, scrubbed)

    def test_username_does_not_eat_emails(self):
        scrubbed, ents = scrub_text(
            "write to jane.doe@example.com today", (), enable_regex=True)
        assert "[EMAIL]" in scrubbed
        assert all(e["label"] != "USERNAME" for e in ents)

    def test_boundary_guard_no_partial_match(self):
        # "F" as a gazetteer value must not fire inside "UTF-8"
        scrubbed, _ = scrub_text('encoding="UTF-8" sex: F', [("F", "SEX")],
                                 enable_regex=False)
        assert scrubbed == 'encoding="UTF-8" sex: [SEX]'

    def test_pass_and_bod_context_words_need_left_boundary(self):
        # review finding: '[Pp]ass'/'[Bb]orn' matched inside ordinary
        # words ('compass:', 'stubborn'), corrupting clean text
        for text in ("compass: north of here", "the bypass = closed now",
                     "surpass: all records"):
            scrubbed, ents = scrub_text(text)
            assert scrubbed == text, (text, scrubbed)
            assert ents == []
        scrubbed, ents = scrub_text("stubborn 12/25/1990 mule")
        assert [e["label"] for e in ents] == ["DATE"], scrubbed

    def test_digit_free_ip_and_idcard_not_gated(self):
        # regression (round-2 advice): IP-v6 and IDCARD can match
        # digit-free text, so neither may sit behind the has-digit gate
        scrubbed, ents = scrub_text("node dead:beef::cafe replied")
        assert [e["label"] for e in ents] == ["IP"], scrubbed
        scrubbed, ents = scrub_text("ID No: ABCDEF on file")
        assert [e["label"] for e in ents] == ["IDCARD"], scrubbed


class TestCorpusModeLabelCoverage:
    """Corpus mode (regex + global gazetteer, NO per-url gold) must be
    able to produce every label in the reference taxonomy — the mirror of
    the reference's coverage test (tests/unit/test_examples.py:86-99),
    using the vendored fixture label vocabulary as the spec."""

    # one probe text per label; the named label must appear in entities
    PROBES = {
        "GIVENNAME1": "Contact Alice today",
        "GIVENNAME2": "Alice met Bob yesterday",
        "LASTNAME1": "The Smith family",
        "LASTNAME2": "Smith and Brown arrived",
        "LASTNAME3": "Smith, Brown and Davis signed",
        "TITLE": "Dear Mr. Smith",
        "SEX": "Patient is a female aged 40",
        "BOD": "Date of birth: 12/05/1980 confirmed",
        "PASS": "password: s3cr3t!x",
        "BUILDING": "Lives at 4420 Maple Street in town",
        "SECADDRESS": "Apt 4B, 4420 Maple Street",
        "STREET": "Maple Street corner",
        "IP": "server at dead:beef::cafe responded",
        "IDCARD": "ID No: ABCDEF9 on file",
        "EMAIL": "mail me x@y.com",
        "TEL": "call 555-123-4567 now",
        "SOCIALNUMBER": "ssn 123-45-6789",
        "CREDITCARD": "card 4111 1111 1111 1111",
        "GEOCOORD": "at [53.1051, -2.62021] now",
        "TIME": "at 12:30pm sharp",
        "DATE": "on 12/05/2020 we met",
        "POSTCODE": "zip 97201 here",
        "PASSPORT": "Passport No: AB1234567",
        "DRIVERLICENSE": "Driver license no: A12-345-678",
        "USERNAME": "ping @cool_user99",
        "CITY": "flew to Portland",
        "STATE": "in OR today",
        "COUNTRY": "from Canada with love",
    }

    def test_probe_set_covers_fixture_vocabulary(self):
        vocab = set(fixtures.load_raw()["labels"])
        assert vocab <= set(self.PROBES), vocab - set(self.PROBES)

    def test_every_label_detectable_in_corpus_mode(self):
        gaz = global_scrub_gazetteer()
        for label, text in self.PROBES.items():
            _, ents = scrub_text(text, (), enable_regex=True,
                                 global_gazetteer=gaz)
            got = [e["label"] for e in ents]
            assert label in got, (label, text, got)

    def test_name_ordinals_stable_on_repeats(self):
        gaz = global_scrub_gazetteer()
        scrubbed, ents = scrub_text(
            "Alice called Bob. Then Alice called Bob again.",
            (), enable_regex=True, global_gazetteer=gaz)
        assert scrubbed == ("[GIVENNAME1] called [GIVENNAME2]. "
                            "Then [GIVENNAME1] called [GIVENNAME2] again.")

    def test_fourth_surname_shares_last_ordinal(self):
        gaz = global_scrub_gazetteer()
        _, ents = scrub_text("Smith Brown Davis Johnson",
                             (), enable_regex=True, global_gazetteer=gaz)
        assert [e["label"] for e in ents] == [
            "LASTNAME1", "LASTNAME2", "LASTNAME3", "LASTNAME3"]
