from openseizuredatabase_spark.sources.tables import TABLE_NAMES, load_table, register_tables  # noqa: F401
