"""Curator event-editing operations as distributed lake transforms.

Re-expresses the reference's curator utilities — single-event field
updates / deletes (curator_tools/edit_event.py:55-140, matching by id
and rewriting the store), GUI mark-deleted / mark-unknown
(curator_tools/makeOsdDb_refactor/event_editor.py:590-626), and
datasource stripping (curator_tools/strip_phone_datasource.py:41-66) —
as DataFrame transforms instead of driver-side list surgery.

Scale shape: the edit/delete sets are curator-sized (human-curated,
thousands at most), so every operation here is a BROADCAST join against
the big fact table — no shuffle of the 100 TB side, and the rewrite is
a normal partition-parallel write of the transformed frame. A lake
"update" is transform + rewrite (or MERGE on a table format); these
transforms are exactly the MERGE's matched/not-matched clauses.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def edits_frame(
    spark: SparkSession,
    edits: Mapping[int, Mapping[str, object]],
    id_col: str,
    editable_cols: Iterable[str],
) -> DataFrame:
    """Build the small edits dimension from {event_id: {field: new_value}}.

    Unspecified fields are NULL (= keep existing value on apply), mirroring
    edit_event.py's "only update the flags the caller passed" behavior.
    """
    cols = list(editable_cols)
    rows = [
        tuple([int(eid)] + [e.get(c) for c in cols]) for eid, e in edits.items()
    ]
    return spark.createDataFrame(rows, [id_col] + cols)


def apply_event_edits(
    df: DataFrame, edits: DataFrame, id_col: str = "event_id"
) -> DataFrame:
    """Apply field updates from a small edits frame by id.

    edit_event.py:113-131 mutates matched dicts in a loaded list; here the
    edits dim is broadcast and each edited column becomes
    ``coalesce(edit.value, fact.value)`` — rows without an edit (or edits
    with NULL for a field) keep the original value. One narrow projection,
    zero shuffles of the fact side.
    """
    edited_cols = [c for c in edits.columns if c != id_col]
    e = F.broadcast(
        edits.select(
            F.col(id_col).alias("__edit_id"),
            *[F.col(c).alias(f"__edit_{c}") for c in edited_cols],
        )
    )
    out = df.join(e, df[id_col] == e["__edit_id"], "left")
    for c in edited_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__edit_{c}"), F.col(c)))
    return out.drop("__edit_id", *[f"__edit_{c}" for c in edited_cols])


def delete_events(
    df: DataFrame, ids: DataFrame | Iterable[int], id_col: str = "event_id"
) -> DataFrame:
    """Drop rows whose id is in the (small) delete list.

    edit_event.py --delete removes matched entries from the list; the lake
    equivalent is a broadcast LEFT ANTI join — the fact table never
    shuffles, and the rewrite omits the deleted rows.
    """
    if not isinstance(ids, DataFrame):
        spark = df.sparkSession
        ids = spark.createDataFrame([(int(i),) for i in ids], [id_col])
    return df.join(
        F.broadcast(ids.select(F.col(id_col).alias(id_col))), id_col, "left_anti"
    )


def strip_datasource(
    df: DataFrame, source_col: str, value: str = "Phone"
) -> DataFrame:
    """Remove every row from one data source.

    strip_phone_datasource.py:53-58 filters dataSourceName=='Phone' while
    streaming the file; here it is a plain pushdown-able predicate — at
    lake scale with source-partitioned layout this prunes whole partitions
    instead of reading them. NULL sources are kept, matching the
    reference's ``ev.get('dataSourceName') == 'Phone'`` (missing key ≠
    match).
    """
    c = F.col(source_col)
    return df.filter(c.isNull() | (c != F.lit(value)))


def mark_events(
    df: DataFrame,
    ids: DataFrame | Iterable[int],
    type_col: str = "event_type",
    new_value: str = "unknown",
    id_col: str = "event_id",
) -> DataFrame:
    """Re-label matched events (event_editor.py mark-deleted/mark-unknown):
    a one-column edit expressed through the same broadcast-edit path."""
    if not isinstance(ids, DataFrame):
        spark = df.sparkSession
        ids = spark.createDataFrame([(int(i),) for i in ids], [id_col])
    edits = ids.select(id_col, F.lit(new_value).alias(type_col))
    return apply_event_edits(df, edits, id_col=id_col)
