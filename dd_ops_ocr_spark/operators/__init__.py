"""Operator library — each module exposes ``QUERIES`` (name -> builder
taking (spark, sf_dir) -> DataFrame) and ``ORACLE_SQL`` (name -> DuckDB
SQL over the driver-registered views). Collected by
``dd_ops_ocr_spark.registry``."""
