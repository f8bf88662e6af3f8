"""The examples/ ports of the reference DAGs must import and run — they ARE
the 'a reference user can switch' claim, executed."""

from __future__ import annotations

import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples"))


@pytest.mark.parametrize(
    "module, pipeline_id, tasks",
    [
        ("empty_workflow_example", "basic_three_empty_tasks", 3),
        ("complex_example", "example_complex_demo", 5),
        ("dev_db_test", "dev_db_test", 5),
        ("s3_data_copy_test", "s3_data_copy_test", 1),
    ],
)
def test_example_definitions(module, pipeline_id, tasks):
    mod = importlib.import_module(module)
    dag = mod.dag
    assert dag.pipeline_id == pipeline_id
    assert len(dag.tasks) == tasks


def test_empty_workflow_runs(spark):
    dag = importlib.import_module("empty_workflow_example").dag
    dag.run(spark)  # three no-ops; success == no exception


def test_complex_diamond_runs(spark):
    mod = importlib.import_module("complex_example")
    mod.dag.run(spark, parallelism=2)
    assert mod.merge.last_output.strip() == "merge"


def test_file_format_clause_parses_reference_string():
    from bfs_etl_sep2025_spark.sources import map_file_format

    task = importlib.import_module("s3_data_copy_test").copy_into_prestg
    assert task.file_format["type"] == "CSV"
    assert task.file_format["NULL_IF"] == ["NULL", "null", ""]
    assert task.file_format["RECORD_DELIMITER"] == "\n"
    assert task.file_format["FIELD_OPTIONALLY_ENCLOSED_BY"] == '"'
    reader, sentinels = map_file_format(task.file_format)
    assert reader["sep"] == "," and reader["header"] is True
    assert sentinels == ["null", "", ""]  # NULL_IF tail + empty_field_as_null
