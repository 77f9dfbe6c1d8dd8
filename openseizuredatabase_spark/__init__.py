"""openseizuredatabase_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of OpenSeizureDetector/OpenSeizureDatabase (the reference, a
single-node Python/pandas toolkit over a JSON document DB of seizure events).

Design stance (see SURVEY.md):
  * DataFrame/SQL declarative plans; Catalyst/Tungsten pick physical strategy.
  * Parquet columnar lake; arrays stay ArrayType columns (no 510-col CSVs).
  * Pandas UDFs (Arrow) only for DSP kernels and per-event ordered recurrences.
  * Every operator designed for a 1000-executor cluster: broadcast small dims,
    map-side partial aggregation, no driver-side collects in the hot path.
"""

__version__ = "0.1.0"

from openseizuredatabase_spark.session import get_spark  # noqa: F401
