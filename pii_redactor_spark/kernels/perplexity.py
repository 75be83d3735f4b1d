"""KenLM-style n-gram perplexity kernel (interpolated char-trigram LM).

North-star requirement: "a KenLM-style n-gram perplexity scorer run as
vectorized pandas/Arrow UDFs over Arrow batches". KenLM itself is not
importable in this sandbox (SURVEY §0), so the scorer is a numpy
log-probability table: an interpolated order-3 character LM fitted
deterministically from the embedded English seed corpus.

    p(c3 | c1 c2) = λ3·p̂3 + λ2·p̂2 + λ1·p̂1      (fixed interpolation)
    ppl(doc) = exp(-mean log p)

Natural English scores low; garbled/lorem/random text scores high — the
corpus filter drops documents above a ppl threshold, and "worst-k by
perplexity" is a bench query (SURVEY §2.6).

Chars are bucketed to a small alphabet (lowercase ASCII + space + OTHER),
so the full table is 38^3 floats (~420 KB) captured in the UDF closure.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from pii_redactor_spark.kernels.corpora import SEED_CORPORA

# alphabet: a-z, 0-9, space, OTHER
_ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789 "
A = len(_ALPHA) + 1  # +1 = OTHER bucket
_LOOKUP = np.full(256, A - 1, dtype=np.int64)
for _i, _c in enumerate(_ALPHA):
    _LOOKUP[ord(_c)] = _i

LAMBDAS = (0.7, 0.2, 0.1)  # trigram, bigram, unigram


def _encode(text: str) -> np.ndarray:
    """Map text to alphabet ids (lowercased; non-ASCII -> OTHER)."""
    b = text.lower().encode("ascii", "replace")
    return _LOOKUP[np.frombuffer(b, dtype=np.uint8)]


@lru_cache(maxsize=8)
def _learned_alphabet(lang: str) -> dict[str, int] | None:
    """Per-language alphabet for non-Latin scripts: the ASCII alphabet
    encodes e.g. Chinese to all-OTHER, so for languages whose seed
    corpus is mostly non-ASCII we learn the top A-1 characters instead.
    Returns None for Latin-script languages (ASCII fast path applies)."""
    corpus = SEED_CORPORA[lang].lower()
    ascii_frac = sum(c in _ALPHA for c in corpus) / max(len(corpus), 1)
    if ascii_frac >= 0.5:
        return None
    from collections import Counter
    top = [c for c, _ in sorted(Counter(corpus).items(),
                                key=lambda kv: (-kv[1], kv[0]))[: A - 1]]
    return {c: i for i, c in enumerate(top)}


def _encode_for(text: str, lang: str) -> np.ndarray:
    alpha = _learned_alphabet(lang) if lang in SEED_CORPORA else None
    if alpha is None:
        return _encode(text)
    other = A - 1
    return np.fromiter((alpha.get(c, other) for c in text.lower()),
                       dtype=np.int64, count=len(text))


_PRELOADED: dict[str, np.ndarray] = {}


def preload(tables: dict[str, "np.ndarray"]) -> None:
    """Install externally fitted LM tables (kernels/artifacts.py)."""
    _PRELOADED.clear()
    _PRELOADED.update(tables)
    fit_charlm.cache_clear()


def clear_preload() -> None:
    """Drop installed artifact LMs (no-op when none) — see
    langid.clear_preload for why reused workers must reset."""
    if _PRELOADED:
        _PRELOADED.clear()
        fit_charlm.cache_clear()


@lru_cache(maxsize=8)
def fit_charlm(lang: str = "en") -> np.ndarray:
    """Interpolated log-prob table, shape (A, A, A) float32:
    logp[c1, c2, c3] = log p(c3 | c1 c2). One table per language,
    cached per worker; preloaded artifacts win over refitting."""
    if lang in _PRELOADED:
        return _PRELOADED[lang]
    ids = _encode_for(SEED_CORPORA[lang], lang)
    uni = np.ones(A)
    bi = np.ones((A, A))
    tri = np.ones((A, A, A))
    np.add.at(uni, ids, 1.0)
    np.add.at(bi, (ids[:-1], ids[1:]), 1.0)
    np.add.at(tri, (ids[:-2], ids[1:-1], ids[2:]), 1.0)
    p1 = uni / uni.sum()
    p2 = bi / bi.sum(axis=1, keepdims=True)
    p3 = tri / tri.sum(axis=2, keepdims=True)
    # interpolate: broadcast p2 over the c1 axis and p1 over (c1, c2)
    p = LAMBDAS[0] * p3 + LAMBDAS[1] * p2[np.newaxis, :, :] + LAMBDAS[2] * p1[np.newaxis, np.newaxis, :]
    return np.log(p).astype(np.float32)


def perplexity_batch(
    texts: "pd.Series | list[str]",
    langs: "pd.Series | list[str | None] | None" = None,
) -> list[float | None]:
    """Per-document perplexity. When ``langs`` is given (e.g. the langid
    kernel's predictions), each document is scored under ITS language's
    LM — a document is low-perplexity under the right model, so the
    quality gate stays meaningful on a multilingual crawl. Unknown or
    missing languages fall back to the English LM."""
    out: list[float | None] = []
    lang_list = list(langs) if langs is not None else None
    for i, text in enumerate(texts):
        if text is None or len(str(text)) < 3:
            out.append(None)
            continue
        lang = "en"
        if lang_list is not None and lang_list[i] in SEED_CORPORA:
            lang = lang_list[i]
        logp = fit_charlm(lang)
        ids = _encode_for(str(text), lang)
        lp = logp[ids[:-2], ids[1:-1], ids[2:]]
        out.append(float(np.exp(-lp.mean())))
    return out


def make_perplexity_udf():
    """Iterator pandas UDF: text -> double perplexity."""

    @F.pandas_udf(DoubleType())
    def ppl(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        fit_charlm()
        for texts in batches:
            yield pd.Series(perplexity_batch(texts), dtype="float64")

    return ppl
