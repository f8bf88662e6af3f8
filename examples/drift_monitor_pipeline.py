"""Scheduled data-drift monitor as an orchestrated DAG — the observability
companion to ``llm_corpus_pipeline``:

    snapshot >> gate >> publish

- **snapshot**: run the baseline-vs-current column profile
  (``operators/quality.py::dq_profile_drift``) and APPEND it, stamped with
  the run's logical date, into a ``VersionedTable`` metrics store — so the
  drift history itself is a time-travelable table (what warehouse shops
  build as a "metrics layer"; the reference's closest analog is load
  metadata in Snowflake, reached via the arbitrary-SQL chokepoint
  ``/root/reference/dags/dev_db_test.py:41-70``).
- **gate**: run the exact two-sample KS test
  (``operators/quality.py::dq_ks_drift``). Share-level drift (the 2%
  cross-multiplied flag) is REPORTED but does not abort — distribution
  wobble is normal; a KS D statistic past the hard ceiling aborts the run
  loudly, the same hard/soft split as the corpus pipeline's HARD_RULES.
- **publish**: emit the audit trail — metrics-store history plus the
  per-type verdicts of this run.

Stages share state only through the versioned metrics table (edges carry
ordering, not data), mirroring the reference's Airflow discipline.
"""

import datetime
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))  # repo checkout; pip install replaces this

from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.plans import Pipeline, PythonTask, chain
from bfs_etl_sep2025_spark.plans.versioned import VersionedTable

PIPELINE_ID = "drift_monitor_pipeline"
SF_DIR = "/root/testdata/sf0.001"

#: abort the run when any event type's KS statistic D = d_num/(n1*n2)
#: reaches this ceiling (per-mille). Small windows are noisy — the dev
#: fixture's ~100-event types sit in the 65-160 band by chance alone, so
#: the ceiling is 200; a production deployment would scale it with the
#: KS critical value c(alpha)*sqrt((n1+n2)/(n1*n2)) instead of a constant.
HARD_KS_MILLE = 200


def snapshot_fn(spark, sf_dir=SF_DIR, table_root=None, ds=None, **_):
    from bfs_etl_sep2025_spark.operators.quality import dq_profile_drift

    prof = dq_profile_drift(spark, sf_dir).withColumn(
        "run_ds", F.lit(ds or "manual")
    )
    vt = VersionedTable(spark, table_root)
    version = vt.append(prof) if vt.exists() else vt.create(prof)
    return {"version": version, "rows": prof.count()}


def gate_fn(spark, sf_dir=SF_DIR, **_):
    from bfs_etl_sep2025_spark.operators.quality import dq_ks_drift

    rows = dq_ks_drift(spark, sf_dir).collect()
    hard = [
        r["event_type"]
        for r in rows
        if r["d_num"] * 1000 >= HARD_KS_MILLE * r["n_base"] * r["n_cur"]
    ]
    if hard:
        raise RuntimeError(f"KS drift ceiling breached for: {hard}")
    return {
        "soft_drift": [r["event_type"] for r in rows if r["drift"] == 1],
        "checked": len(rows),
    }


def publish_fn(spark, table_root=None, **_):
    vt = VersionedTable(spark, table_root)
    latest = vt.read().groupBy("event_type").agg(
        F.max("run_ds").alias("last_run")
    )
    return {
        "history": vt.history(),
        "types_tracked": latest.count(),
    }


def build(table_root: str):
    with Pipeline(
        pipeline_id=PIPELINE_ID,
        schedule="0 6 * * *",  # after the nightly corpus refresh
        start_date=datetime.datetime(2025, 7, 1),
        catchup=False,
        tags=["llm", "monitoring"],
    ) as dag:
        snapshot = PythonTask(
            "snapshot", snapshot_fn, table_root=table_root, ds="{{ ds }}"
        )
        gate = PythonTask("gate", gate_fn)
        publish = PythonTask("publish", publish_fn, table_root=table_root)
        chain(snapshot, gate, publish)
    return dag, (snapshot, gate, publish)


dag, (snapshot, gate, publish) = build(
    str(pathlib.Path(tempfile.gettempdir()) / "drift_monitor_tbl")
)


if __name__ == "__main__":
    from bfs_etl_sep2025_spark.session import build_spark

    dag.run(build_spark())
    print(f"ran {dag.pipeline_id}: publish -> {publish.last_result}")
