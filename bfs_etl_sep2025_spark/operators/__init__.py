"""Operator inventory (SURVEY.md §2).

One module per operator family. Each module registers named queries through
``bfs_etl_sep2025_spark.registry.query`` with both the Spark implementation
and (where expressible) the equivalent DuckDB oracle SQL.
"""
