"""End-to-end LLM training-corpus preparation pipeline.

The capstone composition of the engine's text operators — the chain a
pretraining-data team runs over a raw corpus lake before tokenization:

    quality filter → exact dedup → PII scrub → corpus boilerplate
    scrub → pack-count summary

Everything is ONE lazy Spark plan: no stage materializes unless the
caller checkpoints it, so Catalyst fuses the narrow stages (quality
features, scrubbing) into the scan and only the dedup window, the
boilerplate screen and the final rollup shuffle. Each stage reuses an
already-oracled operator (t2 / t4 / t13 / t19 semantics), which is what
makes the composed pipeline itself oracle-checkable end-to-end
(registry p1_llm_prep_pipeline) — an invariant pytest alone could not
pin this cheaply.

At 100 TB: the quality filter and scrub are scan-absorbed maps; exact
dedup shuffles once on the md5 fingerprint (uniform key); the
boilerplate screen shuffles once on the segment key with spillable
window buffers; the summary is a partial-combined rollup. Nothing
driver-side, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openseizuredatabase_spark.functions.text import (
    fingerprint,
    scrub_pii,
    stopword_count_expr,
    token_count,
    tokens,
)
from openseizuredatabase_spark.operators.dedup import boilerplate_scrub


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    min_quality: float = 0.05,
) -> DataFrame:
    """Stage 1 (t2 semantics): drop short and low-stopword-density docs
    — the cheap heuristic screen that removes boilerplate-ish and
    non-linguistic junk before any expensive stage runs."""
    n_tokens = token_count(F.col(text_col))
    n_stop = stopword_count_expr(text_col)
    quality = F.least(n_tokens / 100.0, F.lit(1.0)) * (
        n_stop / n_tokens.cast("double")
    )
    return docs.filter(
        (n_tokens >= min_tokens) & (quality > min_quality)
    )


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stage 2 (t4 semantics): one survivor per normalized-text md5
    fingerprint, lowest id wins — a single shuffle on a uniform key."""
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("__fp", fingerprint(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def llm_prep_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_tokens: int = 10,
    min_quality: float = 0.05,
    seg_tokens: int = 8,
    max_df: int = 4,
    pack_len: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Run the full prep chain; returns (cleaned_docs, summary).

    ``cleaned_docs``: (id, source, cleaned, n_tokens) — the corpus a
    tokenizer would consume. ``summary``: per-source (n_docs, n_tokens,
    n_packs) where n_packs counts ``pack_len``-token training sequences
    (ceil per doc — the t15 pre-packing budget view).
    """
    survivors = exact_dedup(
        quality_filter(docs, text_col, min_tokens, min_quality),
        text_col,
        id_col,
    )
    scrubbed = survivors.select(
        id_col, source_col, scrub_pii(F.col(text_col)).alias(text_col)
    )
    cleaned = boilerplate_scrub(
        scrubbed, text_col, id_col, seg_tokens=seg_tokens, max_df=max_df
    )
    # re-attach source (the scrub aggregates per doc); doc-key equi-join
    cleaned_docs = cleaned.join(
        scrubbed.select(id_col, source_col), id_col
    ).select(
        id_col,
        source_col,
        "cleaned",
        F.size(tokens(F.col("cleaned"))).alias("n_tokens"),
    )
    summary = cleaned_docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(
            F.ceil(F.col("n_tokens") / float(pack_len)).cast("long")
        ).alias("n_packs"),
    )
    return cleaned_docs, summary


def scrape_ingest(
    pages: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_tokens: int = 10,
    min_quality: float = 0.05,
) -> tuple[DataFrame, DataFrame]:
    """Web-scrape ingest front end: raw HTML pages → clean candidate
    docs for :func:`llm_prep_pipeline`.

        HTML-to-text (t26) → unicode normalize (t27) → quality filter
        (t2) → exact dedup (t4) → per-source ingest summary

    Returns (docs, summary): ``docs`` is (id, source, text) ready for
    the main prep chain; ``summary`` is per-source
    (n_pages, n_docs, n_tokens) — pages seen vs docs surviving.

    One lazy plan: extraction + normalization + quality are
    scan-absorbed codegen'd maps (zero Python); the only exchanges are
    the dedup window on the uniform md5 key and the rollup. The
    dedup runs AFTER normalization by design — near-identical scrapes
    (curly-quote vs ASCII variants of the same page) fingerprint
    identically only once canonicalized.
    """
    from openseizuredatabase_spark.functions.text import (
        html_to_text,
        normalize_text,
    )

    docs = pages.select(
        F.col(id_col),
        F.col(source_col),
        normalize_text(html_to_text(F.col(html_col))).alias("text"),
    )
    n_pages = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_pages")
    )
    kept = exact_dedup(
        quality_filter(docs, "text", min_tokens, min_quality),
        "text",
        id_col,
    )
    per_source = kept.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("n_tokens"),
    )
    summary = n_pages.join(per_source, source_col, "left").select(
        source_col,
        "n_pages",
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
    )
    return kept, summary
