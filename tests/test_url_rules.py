"""URL filtering + canonicalization rule semantics."""

from __future__ import annotations

import pytest

from pii_redactor_spark.functions.url_rules import (
    canonical_url,
    with_url_rules,
)

CASES = [
    # (url, expect_keep, expect_canonical)
    ("https://ok.example/doc/1", True, "https://ok.example/doc/1"),
    ("HTTPS://MiXeD.Example/Path/9/", True, "https://mixed.example/Path/9"),
    ("https://ok.example", True, "https://ok.example/"),
    ("https://cdn.example/a/img.jpg", False, "https://cdn.example/a/img.jpg"),
    ("https://shop.example/cart/item/3?x=1#f", False,
     "https://shop.example/cart/item/3"),
    ("https://deep.example" + "/p" * 12 + "/3", False, None),
    ("https://blocked.example/page/1", False, None),
    ("not-a-url", False, None),
    ("https://ok.example/login", False, None),
    ("https://ok.example/page.html", True, "https://ok.example/page.html"),
]


@pytest.fixture(scope="module")
def results(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in CASES], "url string")
    out = (
        with_url_rules(df, blocked_hosts=["blocked.example"])
        .withColumn("canonical", canonical_url("url"))
    )
    return {r["url"]: r for r in out.collect()}


def test_keep_decisions(results):
    for url, keep, _ in CASES:
        assert results[url]["url_keep"] == keep, (
            url, results[url]["url_reasons"])


def test_canonicalization(results):
    for url, _, canon in CASES:
        if canon is not None:
            assert results[url]["canonical"] == canon


def test_reasons_named(results):
    assert results["https://cdn.example/a/img.jpg"]["url_reasons"] == [
        "blocked_extension"]
    assert results["https://blocked.example/page/1"]["url_reasons"] == [
        "blocked_host"]
    assert "no_host" in results["not-a-url"]["url_reasons"]


def test_url_dedup_collapses_canonical_variants(spark):
    """q_url_dedup: the four crawl variants of a page (host case,
    trailing slash, query string, fragment) share a canonical form —
    groups of four collapse to the lowest doc_id, which is never
    flagged as a duplicate."""
    from pii_redactor_spark.contract import QUERIES
    out = QUERIES["q_url_dedup"](spark, "/root/testdata/sf0.001").collect()
    by_canon: dict[str, list] = {}
    for r in out:
        by_canon.setdefault(r["canonical"], []).append(r)
    for canon, rows in by_canon.items():
        ids = sorted(r["doc_id"] for r in rows)
        assert len(ids) == 4, canon          # all variants collapse
        for r in rows:
            assert r["rep_id"] == ids[0]
            assert r["is_dup"] == (r["doc_id"] != ids[0])
