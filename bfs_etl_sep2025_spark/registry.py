"""Named-query registry.

The driver contract (``/root/repo/__spark_entry__.py``) wants two parallel
dicts: ``queries()`` (name -> callable(spark, sf_dir) -> DataFrame) and
``oracle_sql()`` (name -> equivalent DuckDB SQL). Operator modules register
both through one decorator so they can never drift apart structurally, and so
test/bench harnesses can iterate the same inventory.

Ops whose semantics are not expressible in portable ANSI SQL (streaming with
watermarks, approximate sketches) register with ``oracle=None`` and get the
driver's weaker rows-only check — exactly as the contract permits.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    #: operator family (joins/aggregates/windows/...), for reporting & bench
    family: str
    #: include in bench.py's headline timing set
    bench: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None,
    family: str,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, family=family, bench=bench, tags=tags
        )
        return fn

    return deco


#: Names promoted to the FRONT of ``queries()``/``oracle_sql()`` iteration
#: order. The external driver hash-checks queries in iteration order under a
#: ~50-query/round budget; the union across rounds covers 204/207, so each
#: round's job is to keep the OLDEST green signal fresh and to re-verify any
#: query whose code changed since its last driver row.
#:
#: This list is GENERATED: run ``python scripts/staleness_ledger.py
#: --priority`` (which diffs CORRECTNESS_r*.json into latest-round-per-query)
#: and paste its output here, after setting the script's ``PLAN_CHANGED``
#: tuple for any query restructured since its last green. Round-8 window
#: (VERDICT r7 item 1): the 3 queries that landed after the r7 driver run and
#: have NO external row yet lead, then the two plan-changed graph queries,
#: then three named-priority r3 joins (VERDICT r7 item 8 — the joins most
#: likely to drift under Spark upgrades), then the 8 r2 stragglers and the
#: r3 cohort oldest-first. Names not in the registry are ignored, so this
#: list is safe across refactors; everything else follows registration order.
_PRIORITY: tuple[str, ...] = (
    # never externally checked (landed after the r7 driver run, plus r8's
    # new queries):
    "dq_mad_outliers",
    "corpus_cdc_chunk_dedup",
    "window_time_weighted_avg",
    "corpus_duplicate_spans",
    "corpus_span_removal",
    "dq_benford_digits",
    "window_gap_fill",
    "multimodal_decode_jpeg_lossless",
    "dedup_ngram_containment",
    "graph_bfs_distances",
    "join_asof_tolerance",
    "dq_referential_integrity",
    "multimodal_decode_jpeg_baseline",
    "corpus_epoch_shuffle",
    "corpus_mixture_interleave",
    "window_period_over_period",
    "scan_schema_evolution",
    "text_ngram_novelty",
    "multimodal_scene_cuts",
    # plan changed since latest green (r7 twin collapse + memoized masks;
    # r8 GEMM-prefiltered semdedup pair pass):
    "graph_link_prediction_cn",
    "graph_triangle_count",
    "dedup_semantic_embedding",
    "similarity_cosine_neardup",
    # named priority (VERDICT r7 item 8): non-trivial join plans on r3 greens
    "join_asof",
    "join_salted_skew",
    "q9_product_profit",
    # stale tail, oldest external green first (generated):
    "project_computed_columns",  # r2
    "null_safe_equality",  # r2
    "sink_partitioned_roundtrip",  # r2
    "cdc_latest_per_key",  # r2
    "scd2_intervals",  # r2
    "setop_union_all",  # r2
    "setop_union_distinct",  # r2
    "setop_intersect",  # r2
    "subquery_scalar",  # r3
    "subquery_in",  # r3
    "subquery_exists_correlated",  # r3
    "subquery_correlated_scalar",  # r3
    "lateral_view_explode",  # r3
    "similarity_topk_bruteforce",  # r3
    "similarity_topk_lsh",  # r3
    "similarity_ann_ivf",  # r3
    "embedding_quantize_int8",  # r3
    "text_token_stats",  # r3
    "text_language_id",  # r3
    "text_language_id_ngram",  # r3
    "text_quality_score",  # r3
    "text_fingerprint",  # r3
    "text_term_scores",  # r3
    "text_top_bigrams",  # r3
    "text_gopher_rules",  # r3
    "text_bpe_pretokenize",  # r3
    "udf_python_scalar",  # r3
    "udf_pandas_scalar",  # r3
    "udf_grouped_map",  # r3
    "udf_grouped_agg",  # r3
    "stream_tumbling_window",  # r3
    "stream_sliding_window",  # r3
    "stream_session_window",  # r3
    "stream_ingest_availablenow",  # r3
    "stream_static_join",  # r3
    "stream_dedup_stateful",  # r3
    "multimodal_binary_meta",  # r3
    "multimodal_feature_extract",  # r3
    "multimodal_frame_sample",  # r3
    "setop_except",  # r3
    "setop_except_all",  # r3
    "setop_intersect_all",  # r3
    "distinct_pairs",  # r3
    "sort_limit_topn",  # r3
    "scan_orc_roundtrip",  # r3
    "corpus_pack_sequences",  # r3
    "text_repetition_ngrams",  # r3
    "similarity_topk_lsh_multitable",  # r3
    "diag_table_stats",  # r3
    "events_anomaly_burst",  # r3
    "udf_arrow_scalar",  # r3
    "fn_higher_order_suite",  # r3
    "fn_array_advanced",  # r3
    "fn_struct_collect",  # r3
    # r5 cohort leads round 9's window
    "graph_degree_distribution",  # r5
    "sql_recursive_cte",  # r5
    "fn_sql_udf",  # r5
    "fn_sql_table_udf",  # r5
    "fn_session_variables",  # r5
    "sql_scripting_block",  # r5
    "dq_expectations",  # r5
    "agg_corr_cov",  # r5
    "agg_histogram",  # r5
    "agg_heavy_hitter_tokens",  # r5
    "agg_outliers_iqr",  # r5
    "diag_key_skew",  # r5
    "agg_mode_deterministic",  # r5
    "corpus_budget_select",  # r5
)


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        spec = _REGISTRY.get(name)
        if spec is not None:
            ordered[name] = spec
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every operator module exactly once so its @query decorators run.

    Import order is deliberate: the external driver walks ``queries()`` in
    registration order under a time budget and may not reach the tail, so the
    families that earned zero driver CORRECTNESS rows in round 1 (everything
    after ``joins`` in the old alphabetical order — see VERDICT r01 item 1)
    are registered FIRST, and the families that are already driver-green
    (aggregates, dedup, functions_scalar, formats) come last.
    """
    global _LOADED
    if _LOADED:
        return
    from bfs_etl_sep2025_spark.operators import (  # noqa: F401
        sqlfeatures,
        graph,
        quality,
        stats,
        tpch_full,
        corpus,
        profiling,
        funnel,
        analytics,
        windows,
        relational,
        setops,
        subqueries,
        similarity,
        text,
        udfs,
        streaming_batch,
        multimodal,
        joins,
        aggregates,
        dedup,
        formats,
        functions_scalar,
    )

    _LOADED = True
