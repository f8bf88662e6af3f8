"""bfs_etl_sep2025_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of the reference repo
``beaconfireDE/bfs-etl-sep2025`` (an Airflow->Snowflake ETL DAG repo),
re-expressed Spark-first:

- ``plans``      — the orchestration layer (Pipeline DAG, schedule/backfill,
                   SqlTask / CsvCopyTask / BashTask), replacing Airflow+Snowflake
                   operators (reference ``dags/*.py``).
- ``operators``  — the relational + LLM-data query surface reachable through the
                   reference's arbitrary-SQL chokepoint
                   (reference ``dags/dev_db_test.py:41-70``), built on the Spark
                   DataFrame/SQL API so Catalyst/Tungsten do the physical work.
- ``sources``    — ingestion (CSV COPY-INTO semantics, reference
                   ``dags/s3_data_copy_test.py:32-41``).
- ``streaming``  — Structured Streaming analogs of the reference's
                   scheduled-file-arrival incremental model.
- ``functions``  — shared portable column expressions (hashing, tokenization)
                   designed to produce identical results in Spark and in the
                   DuckDB correctness oracle.

Design center: declare logical plans with DataFrame/SQL; never hand-schedule
what Catalyst optimizes; Python UDFs only where built-ins cannot express the
semantics (and then Arrow-vectorized). Every operator is written for a
1000-executor / 100 TB deployment and merely *tested* on local[32].
"""

__version__ = "0.1.0"
