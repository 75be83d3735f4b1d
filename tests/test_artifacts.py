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
