"""Train/test split & sampling operators (reference M1-M7).

Deterministic, shuffle-light versions of sklearn/imblearn behaviors:
fold assignment is a pure column expression (id mod k — portable across
engines, unlike engine hash functions), replication uses
explode(sequence(...)) with synthesized copy ids (reference C20
`{id}-{n}` convention, augmentData.py:110-124).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def modulo_folds(df: DataFrame, id_col: str, k: int) -> DataFrame:
    """M2: deterministic stratifiable fold assignment fold = id mod k.

    The reference uses StratifiedKFold over unique event ids
    (splitData.py:122-218); a mod-k fold over a dense/uniform id space is
    the scale-friendly equivalent: no global sort, no driver-side
    materialization of the id list.
    """
    return df.withColumn("fold", (F.col(id_col) % k).cast("int"))


def nested_kfold(
    df: DataFrame, id_col: str, k_outer: int, k_inner: int
) -> DataFrame:
    """Nested k-fold assignment (splitData.py nestedKfold>1 /
    NESTED_KFOLD_README): outer folds are completely-held-out test sets;
    inner folds partition the remaining data for model selection, so
    validation metrics never touch the outer test set.

    Deterministic column expressions: ``outer_fold = id mod K_out``;
    ``inner_fold = (id div K_out) mod K_in``. Because the inner label is
    independent of which outer fold is held out, ONE pass annotates every
    row for all K_out × K_in training runs — consumers filter
    ``outer_fold != o`` and group by ``inner_fold``; no per-combination
    re-shuffle, no driver-side id lists.
    """
    return df.withColumn(
        "outer_fold", (F.col(id_col) % k_outer).cast("int")
    ).withColumn(
        "inner_fold",
        (F.expr(f"{id_col} div {k_outer}") % k_inner).cast("int"),
    )


def train_test_split(
    df: DataFrame, id_col: str, test_frac: float, seed: int
) -> tuple[DataFrame, DataFrame]:
    """M1: seeded random split on distinct ids, semi-joined back so all
    rows of an id land on one side (osdDbConnection.py:614-634)."""
    ids = df.select(id_col).distinct()
    train_ids, test_ids = ids.randomSplit([1 - test_frac, test_frac], seed=seed)
    return (
        df.join(train_ids, id_col, "left_semi"),
        df.join(test_ids, id_col, "left_semi"),
    )


def hash_split(
    df: DataFrame, id_col: str, test_frac: float, seed: int
) -> tuple[DataFrame, DataFrame]:
    """M1 portable variant: assign sides by a seeded md5 hash of the id.

    randomSplit samples per partition, so its assignment changes with
    partition layout (repartition, cluster size, AQE coalescing) — fine
    for one-shot experiments, wrong for a reproducible 100 TB pipeline.
    A pure hash of the id is bit-stable under any layout and any engine:
    test iff (md5_long(seed:id) + 0.5) / 2^60 < test_frac. No distinct,
    no semi-join — a narrow filter the scan absorbs."""
    from openseizuredatabase_spark.functions.hashing import seeded_md5_long

    u = (
        seeded_md5_long(F.col(id_col).cast("string"), seed).cast("double")
        + 0.5
    ) / float(1 << 60)
    return df.filter(u >= test_frac), df.filter(u < test_frac)


def oversample_by_factor(
    df: DataFrame,
    id_col: str,
    factor_col: Column,
    copy_id_name: str = "copy_id",
) -> DataFrame:
    """M3/M4/M7 replication core: emit ``factor`` copies of each row with
    synthetic ids `{id}-{n}` (n=0 is the original).

    explode(sequence(0, factor-1)) is a generator, not a shuffle — data
    expands in place on each executor.
    """
    return (
        df.withColumn("__f", factor_col.cast("int"))
        .select(
            "*", F.explode(F.sequence(F.lit(0), F.col("__f") - 1)).alias("__copy")
        )
        .withColumn(
            copy_id_name,
            F.concat_ws("-", F.col(id_col).cast("string"), F.col("__copy").cast("string")),
        )
        .drop("__f")
    )


def balance_classes(
    df: DataFrame, id_col: str, label_col: str, copy_id_name: str = "copy_id"
) -> DataFrame:
    """M3: oversample every minority class by floor(majority/class) copies.

    Class counts are a tiny aggregate → broadcast join back; replication
    is explode (no shuffle of the big side).
    """
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("__cnt"))
    max_cnt = counts.agg(F.max("__cnt").alias("__max"))
    factors = counts.crossJoin(F.broadcast(max_cnt)).select(
        label_col, F.floor(F.col("__max") / F.col("__cnt")).cast("int").alias("__factor")
    )
    return oversample_by_factor(
        df.join(F.broadcast(factors), label_col),
        id_col,
        F.col("__factor"),
        copy_id_name,
    ).drop("__factor")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str,
    seed: int = 0,
    default_frac: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling rates (the class-balancing downsample of a
    training pipeline — e.g. keep 100% of seizures, 10% of background).

    Spark's ``sampleBy`` assigns per partition (layout-dependent, like
    randomSplit — see hash_split); this is the portable variant: keep a
    row iff (md5_long(seed:id) + 0.5) / 2^60 < fraction[stratum]. The
    per-stratum threshold rides a broadcast map join and the keep test
    is a narrow filter the scan absorbs — no shuffle at all.
    """
    from openseizuredatabase_spark.functions.hashing import seeded_md5_long

    spark = df.sparkSession
    from openseizuredatabase_spark.functions.literal import literal_df

    fr = literal_df(
        spark,
        [(k, float(v)) for k, v in fractions.items()],
        f"{strata_col} string, __frac double",
    )
    u = (
        seeded_md5_long(F.col(id_col).cast("string"), seed).cast("double")
        + 0.5
    ) / float(1 << 60)
    return (
        df.join(F.broadcast(fr), strata_col, "left")
        .fillna({"__frac": default_frac})
        .filter(u < F.col("__frac"))
        .drop("__frac")
    )
