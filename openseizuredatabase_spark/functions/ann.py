"""Approximate nearest-neighbor search over embedding columns.

Three tiers, ordered by scale:
1. brute force (v1 query): full-scan cosine — exact, embarrassingly
   parallel, the baseline every ANN variant is measured against.
2. random-hyperplane LSH buckets (functions/vectors.py) — stateless,
   cheap, no training; candidate generation via bucket equi-join.
3. IVF (this module): MLlib KMeans coarse quantizer; vectors are
   assigned to their nearest centroid partition, a query probes only the
   ``n_probe`` nearest clusters — the classic inverted-file index. At
   100 TB the assignment becomes the partitioning scheme (write the lake
   partitioned by cluster_id), so a probe touches only those partitions.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector

from openseizuredatabase_spark.functions.vectors import cosine


def build_ivf(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, list[np.ndarray]]:
    """Train the coarse quantizer and assign every vector to a cluster.

    Returns (assignments DF with ``cluster_id``, centroid list).
    """
    vecs = emb.withColumn("__v", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=k, seed=seed, featuresCol="__v", predictionCol="cluster_id").fit(
        vecs
    )
    assigned = model.transform(vecs).drop("__v")
    centroids = [np.asarray(c) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: list[np.ndarray],
    query: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe: int = 4,
    top_k: int = 10,
) -> DataFrame:
    """Probe the n_probe nearest clusters, exact-cosine rerank inside.

    The cluster filter is a partition-prunable predicate; the rerank is a
    JVM-side expression over only the probed fraction of the data.
    """
    dists = [float(np.linalg.norm(query - c)) for c in centroids]
    probe = sorted(range(len(centroids)), key=lambda i: dists[i])[:n_probe]
    qlit = F.array(*[F.lit(float(x)) for x in query])
    sim = cosine(F.col(vec_col).cast("array<double>"), qlit)
    return (
        assigned.filter(F.col("cluster_id").isin(probe))
        .select(id_col, "cluster_id", F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(top_k)
    )
