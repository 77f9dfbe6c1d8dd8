"""Round-11 optimization guards: the self-join near-dup matchers must
evaluate their (expensive) input lineage exactly ONCE.

``dhash_near_dup_pairs`` and ``fingerprint_match_pairs`` feed BOTH
sides of a banded self-join; before round 11 each side replayed the
input subtree — for the media queries that subtree is the full
container decode, so every corpus was decoded twice. The fix pins the
narrow fingerprint frame before the join. These tests count input
evaluations with an accumulator-backed mapInPandas source and pin the
once-only property (they fail if someone removes the pins), plus the
unchanged pairing semantics on a known fixture.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from openseizuredatabase_spark.functions.multimodal import (
    dhash_near_dup_pairs,
    fingerprint_match_pairs,
)


def _counted_source(spark, rows, schema):
    """DataFrame whose materialization bumps an accumulator per row."""
    acc = spark.sparkContext.accumulator(0)

    def run(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    base = spark.createDataFrame(rows, schema)
    return base.mapInPandas(run, schema), acc


def test_dhash_near_dup_pairs_single_input_pass(spark):
    rows = [
        (1, 0x00FF00FF00FF00FF, 0x0F0F0F0F0F0F0F0F),
        (2, 0x00FF00FF00FF00FE, 0x0F0F0F0F0F0F0F0F),  # hamming 1 to id 1
        (3, 0x123456789ABCDEF0, 0x0FEDCBA987654321),
    ]
    hashes, acc = _counted_source(
        spark, rows, "media_id long, h0 long, h1 long"
    )
    out = dhash_near_dup_pairs(hashes, max_hamming=6).collect()
    assert acc.value == len(rows), (
        "input lineage evaluated more than once — the pre-join pin is "
        f"gone (saw {acc.value} row evaluations for {len(rows)} rows)"
    )
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in out] == [
        (1, 2, 1)
    ]


def test_fingerprint_match_pairs_single_input_pass(spark):
    rows = [
        (10, 0, 777),
        (10, 1, 888),
        (20, 0, 777),
        (20, 1, 888),  # two shared codes with 10 -> a pair
        (30, 0, 999),
    ]
    fps, acc = _counted_source(spark, rows, "media_id long, k long, code long")
    out = fingerprint_match_pairs(fps, min_common=2).collect()
    assert acc.value == len(rows), (
        "input lineage evaluated more than once — the distinct-pin is "
        f"gone (saw {acc.value} row evaluations for {len(rows)} rows)"
    )
    assert [(r["id_a"], r["id_b"], r["n_common"]) for r in out] == [
        (10, 20, 2)
    ]
