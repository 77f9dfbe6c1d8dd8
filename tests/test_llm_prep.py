"""End-to-end LLM prep pipeline invariants (pipelines/llm_prep.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openseizuredatabase_spark.pipelines.llm_prep import (
    exact_dedup,
    llm_prep_pipeline,
    quality_filter,
)


@pytest.fixture(scope="module")
def corpus(spark):
    boiler = "the quick brown fox jumps over a lazy dog"
    rows = [
        # 5 quality docs sharing an 8-token boilerplate prefix
        Row(
            doc_id=i,
            source="web",
            text=f"{boiler} the cat is in a box and the dog is out {i}",
        )
        for i in range(5)
    ] + [
        # exact duplicate pair (only lowest id survives dedup)
        Row(doc_id=10, source="book",
            text="the a and of to in is the a and of to in is unique"),
        Row(doc_id=11, source="book",
            text="the a and of to in is the a and of to in is unique"),
        # junk: too short
        Row(doc_id=20, source="web", text="tiny"),
        # junk: no stopwords (quality 0)
        Row(doc_id=21, source="web",
            text="alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        # PII-bearing quality doc
        Row(doc_id=30, source="mail",
            text="the user is a person and the address is bob@x.com for "
                 "a while now ok"),
    ]
    return spark.createDataFrame(rows)


def test_quality_filter_drops_junk(corpus):
    kept = {r["doc_id"] for r in quality_filter(corpus).collect()}
    assert 20 not in kept and 21 not in kept
    assert {0, 1, 2, 3, 4, 10, 11, 30} <= kept


def test_exact_dedup_keeps_lowest_id(corpus):
    out = {r["doc_id"] for r in exact_dedup(corpus).collect()}
    assert 10 in out and 11 not in out


def test_pipeline_end_to_end(corpus):
    cleaned, summary = llm_prep_pipeline(corpus, max_df=4)
    docs = {r["doc_id"]: r for r in cleaned.collect()}
    # the 9-token boilerplate prefix spans the first TWO 8-token
    # segments, both shared by 5 docs > max_df=4: dropped; only the
    # doc-unique tail segment survives
    for i in range(5):
        assert docs[i]["cleaned"] == f"the dog is out {i}"
    # duplicate 11 gone, junk gone
    assert 11 not in docs and 20 not in docs and 21 not in docs
    # PII scrubbed
    assert "bob@x.com" not in docs[30]["cleaned"]
    assert "<EMAIL>" in docs[30]["cleaned"]
    # summary consistency: per-source doc counts match cleaned rows
    s = {r["source"]: r for r in summary.collect()}
    assert s["web"]["n_docs"] == 5
    assert s["book"]["n_docs"] == 1
    assert s["mail"]["n_docs"] == 1
    # n_packs = ceil(tokens/64) per doc summed
    for src, row in s.items():
        per_doc = [
            r["n_tokens"] for r in cleaned.filter(
                F.col("source") == src
            ).collect()
        ]
        assert row["n_packs"] == sum(-(-t // 64) for t in per_doc)


def test_scrape_ingest_dedups_only_after_normalization(spark):
    """Two scrapes of the same page differing only in curly-vs-ASCII
    quotes must collapse to one doc; a genuinely different page
    survives. Quality filter needs >=10 tokens with stopword density."""
    from pyspark.sql import Row

    from openseizuredatabase_spark.pipelines.llm_prep import scrape_ingest

    body = "the story of the day and the end of the tale in the night"
    pages = spark.createDataFrame(
        [
            Row(doc_id=1, source="s1",
                html=f"<p>{chr(0x201C)}{body}{chr(0x201D)}</p>"),
            Row(doc_id=2, source="s1", html=f'<p>"{body}"</p>'),
            Row(doc_id=3, source="s1",
                html=f"<p>a different page where the words of the "
                     f"story are told in the long run</p>"),
            Row(doc_id=4, source="s2", html="<p>too short</p>"),
        ]
    )
    docs, summary = scrape_ingest(pages)
    kept = sorted(r["doc_id"] for r in docs.collect())
    assert kept == [1, 3]  # 2 deduped against 1; 4 fails quality
    s = {r["source"]: (r["n_pages"], r["n_docs"]) for r in summary.collect()}
    assert s["s1"] == (3, 2)
    assert s["s2"] == (1, 0)
