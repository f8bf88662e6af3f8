"""End-to-end LLM training-corpus pipeline as an orchestrated DAG — the
composition a reference user would schedule once they switch engines:

    profile >> clean >> select >> publish

- **profile**: run the data-quality expectation suite over the raw corpus
  (``operators/quality.py``); fail the run loudly if a hard rule breaks —
  the load-abort behavior a warehouse pipeline gets from constraint errors.
- **clean**: quality-gate + exact-dedup + MinHash/LSH near-dup removal in
  one fused plan (``operators/dedup.py::llm_corpus_clean``), committed as
  version 1..N of a ``VersionedTable`` — every run's snapshot stays
  time-travelable (``plans/versioned.py``).
- **select**: greedy per-source token-budget cap over the CLEANED snapshot
  (same prefix-sum rewrite as ``corpus_budget_select``), committed as the
  next version of the same table.
- **publish**: record the audit trail (version history + per-source counts)
  — what a warehouse exposes as load metadata.

Each stage reads its input from the versioned table the previous stage
committed, so stages are restartable and every intermediate corpus state is
inspectable after the fact. No task passes DataFrames in memory — the DAG's
edges carry ordering only, exactly like the reference's Airflow DAGs
(``/root/reference/dags/dev_db_test.py:74-83`` — data lives in tables,
edges order the work).
"""

import datetime
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))  # repo checkout; pip install replaces this

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bfs_etl_sep2025_spark.plans import Pipeline, PythonTask, chain
from bfs_etl_sep2025_spark.plans.versioned import VersionedTable

PIPELINE_ID = "llm_corpus_pipeline"
SF_DIR = "/root/testdata/sf0.001"  # override per-run via task params
TOKEN_BUDGET = 500  # per-source cap for the select stage


def _table(spark, root):
    return VersionedTable(spark, root)


#: expectations that ABORT the run (vs. soft rules that only report —
#: e.g. the fixture's synthetic lineitem reuses line numbers, a known
#: data quirk, not a reason to skip tonight's corpus build)
HARD_RULES = (
    "orders.o_custkey references customer",
    "documents.n_chars = length(text)",
)


def profile_fn(spark, sf_dir=SF_DIR, **_):
    from bfs_etl_sep2025_spark.operators.quality import dq_expectations

    verdicts = dq_expectations(spark, sf_dir).collect()
    hard_failures = [
        r["rule"] for r in verdicts if not r["ok"] and r["rule"] in HARD_RULES
    ]
    if hard_failures:
        raise RuntimeError(f"data-quality gate failed: {hard_failures}")
    return {r["rule"]: r["n_violations"] for r in verdicts}


def clean_fn(spark, sf_dir=SF_DIR, table_root=None, **_):
    from bfs_etl_sep2025_spark.operators.dedup import llm_corpus_clean
    from bfs_etl_sep2025_spark.tables import load

    survivors = llm_corpus_clean(spark, sf_dir)  # (doc_id, quality)
    corpus = load(spark, sf_dir, "documents").join(
        survivors, "doc_id"
    )  # materialize the surviving documents with their text + quality score
    vt = _table(spark, table_root)
    version = (
        vt.overwrite(corpus, op="clean") if vt.exists() else vt.create(corpus)
    )
    return {"version": version, "rows": vt.read().count()}


def select_fn(spark, table_root=None, budget=TOKEN_BUDGET, **_):
    vt = _table(spark, table_root)
    docs = vt.read()
    w = W.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    running = F.sum(F.size(F.split("text", " "))).over(w)
    selected = docs.withColumn("running_tok", running).filter(
        F.col("running_tok") <= budget
    ).drop("running_tok")
    version = vt.overwrite(selected, op="budget_select")
    return {"version": version, "rows": vt.read().count()}


def publish_fn(spark, table_root=None, **_):
    vt = _table(spark, table_root)
    per_source = {
        r["source"]: r["n"]
        for r in vt.read().groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {"history": vt.history(), "per_source": per_source}


def build(table_root: str):
    """Construct the DAG bound to one versioned-table root."""
    with Pipeline(
        pipeline_id=PIPELINE_ID,
        schedule="0 3 * * *",  # nightly corpus refresh
        start_date=datetime.datetime(2025, 7, 1),
        catchup=False,
        tags=["llm", "corpus"],
    ) as dag:
        profile = PythonTask("profile", profile_fn)
        clean = PythonTask("clean", clean_fn, table_root=table_root)
        select = PythonTask("select", select_fn, table_root=table_root)
        publish = PythonTask("publish", publish_fn, table_root=table_root)
        chain(profile, clean, select, publish)
    return dag, (profile, clean, select, publish)


dag, (profile, clean, select, publish) = build(
    str(pathlib.Path(tempfile.gettempdir()) / "llm_corpus_pipeline_tbl")
)


if __name__ == "__main__":
    from bfs_etl_sep2025_spark.session import build_spark

    dag.run(build_spark())
    print(f"ran {dag.pipeline_id}: publish -> {publish.last_result}")
