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


@lru_cache(maxsize=1)
def fit_charlm(lang: str = "en") -> np.ndarray:
    """Interpolated log-prob table, shape (A, A, A) float32:
    logp[c1, c2, c3] = log p(c3 | c1 c2)."""
    ids = _encode(SEED_CORPORA[lang])
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


def perplexity_batch(texts: "pd.Series | list[str]") -> list[float | None]:
    logp = fit_charlm()
    out: list[float | None] = []
    for text in texts:
        if text is None or len(str(text)) < 3:
            out.append(None)
            continue
        ids = _encode(str(text))
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
