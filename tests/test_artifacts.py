"""Kernel artifact save/load round-trip (the --py-files-shippable fitted
tables — reference analogue: optimized-model JSON, optimizer.py:295-322)."""

from __future__ import annotations

import numpy as np
import pytest

from pii_redactor_spark.kernels import langid, perplexity
from pii_redactor_spark.kernels.artifacts import (
    MANIFEST,
    load_artifacts,
    save_artifacts,
)


@pytest.fixture(autouse=True)
def reset_kernels():
    yield
    # undo preloads so other tests refit from corpora
    langid._PRELOADED = None
    langid.fit_langid.cache_clear()
    perplexity.preload({})
    perplexity._PRELOADED.clear()
    perplexity.fit_charlm.cache_clear()


def test_roundtrip_identical_predictions(tmp_path):
    texts = ["the quick brown fox jumps over the lazy dog and reads books",
             "der schnelle braune fuchs springt über den faulen hund heute"]
    before_langs = langid.predict_lang_batch(texts)
    before_ppl = perplexity.perplexity_batch(texts, ["en", "de"])

    manifest = save_artifacts(tmp_path / "art")
    assert (tmp_path / "art" / MANIFEST).exists()
    assert manifest["charlm"]["languages"] == ["de", "en", "es", "fr", "zh"]

    # simulate a fresh worker: clear caches, then load artifacts
    langid.fit_langid.cache_clear()
    perplexity.fit_charlm.cache_clear()
    load_artifacts(tmp_path / "art")

    after_langs = langid.predict_lang_batch(texts)
    after_ppl = perplexity.perplexity_batch(texts, ["en", "de"])
    assert after_langs == before_langs
    assert after_ppl == pytest.approx(before_ppl, abs=0.0)  # bit-identical


def test_loaded_tables_are_used(tmp_path):
    save_artifacts(tmp_path / "art")
    # corrupt the loaded langid likelihoods -> predictions must change,
    # proving the loaded tables (not a refit) are in use
    z = np.load(tmp_path / "art" / "langid.npz", allow_pickle=False)
    np.savez_compressed(
        tmp_path / "art" / "langid.npz",
        langs=z["langs"], prior=z["prior"] + 100.0 * np.eye(1, len(z["langs"]), 2)[0],
        lik=z["lik"])
    load_artifacts(tmp_path / "art")
    langs, prior, lik = langid.fit_langid()
    assert prior[2] > 50  # the doctored prior is live


def test_artifacts_ship_to_executor_workers(spark, tmp_path):
    """Round-2 review finding: a driver-side load_artifacts never
    reaches executor Python workers (they refit from seed corpora).
    run_pipeline(artifacts=...) must closure-ship the tables so worker
    predictions come from THE SHIPPED tables — proven by shipping a
    single-language table and asserting every doc predicts it."""
    from pii_redactor_spark.kernels.artifacts import load_tables
    from pii_redactor_spark.plans.pipeline import run_pipeline

    save_artifacts(tmp_path / "art")
    t = load_tables(tmp_path / "art")
    langs, prior, lik = t["langid"]
    i = langs.index("fr")
    shipped = {"langid": (["fr"], prior[i:i + 1], lik[i:i + 1]),
               "charlms": t["charlms"]}

    docs = spark.createDataFrame(
        [("u://1", "the quick brown fox jumps over the lazy dog today"),
         ("u://2", "completely ordinary english words in a plain row")],
        "url string, text string")
    out = run_pipeline(docs, artifacts=shipped, allowed_langs=("fr",),
                       max_ppl=None)
    rows = out.collect()
    assert all(r["lang_pred"] == "fr" for r in rows)

    # hermetic reset: a following default-fit run in the SAME reused
    # workers must NOT see the shipped single-language table
    out2 = run_pipeline(docs, allowed_langs=("en",), max_ppl=None)
    assert all(r["lang_pred"] == "en" for r in out2.collect())
