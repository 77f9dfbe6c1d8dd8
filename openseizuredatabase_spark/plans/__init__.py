from openseizuredatabase_spark.plans.registry import QUERIES, QuerySpec  # noqa: F401
