"""Executable ``MERGE INTO`` for the plain-parquet session catalog.

The reference's warehouse loads lean on Snowflake-side ``MERGE`` for upserts
(the arbitrary-SQL pass-through of ``/root/reference/dags/dev_db_test.py:
41-70`` makes every Snowflake statement shape reachable), and the engine's
statement splitter already recognizes ``MERGE INTO`` as a write head for
lock serialization — this module makes the statement actually execute.

Spark's SQL ``MERGE INTO`` needs a v2 table provider (Delta/Iceberg, jars
absent here), but MERGE semantics decompose into plain relational algebra
over the snapshot:

- matched + UPDATE  -> target LEFT JOIN source, CASE per assigned column
- matched + DELETE  -> target LEFT ANTI JOIN source (keep non-matches)
- not matched + INSERT -> source LEFT ANTI JOIN target, projected to the
  target schema (missing columns become typed NULLs)

branches UNION ALL'd, materialized to a staging table (a CTAS cannot read
and overwrite the same table in one statement), then swapped in with
``INSERT OVERWRITE``. The rewrite keeps the statement's own aliases so
``ON``/``SET``/``VALUES`` expressions run verbatim.

Supported grammar (the common Snowflake shapes)::

    MERGE INTO <tgt> [[AS] t] USING <src | (subquery)> [[AS] s]
    ON <cond>
    [WHEN MATCHED THEN UPDATE SET col = expr [, ...]]
    [WHEN MATCHED THEN DELETE]
    [WHEN NOT MATCHED THEN INSERT [(cols)] VALUES (exprs)]

Standard MERGE preconditions apply: the source must be unique on the join
key (a duplicate match would fan out the LEFT JOIN where a real MERGE
raises); extra ``AND`` guards on WHEN clauses are not parsed.

Scale notes: the rewrite is two joins and a union over the snapshot — the
same shuffle shape Delta's MERGE plans under the hood (join on the merge
key; AQE handles skew). The staging CTAS is the price of snapshot
isolation without a transactional table format; at 100 TB you'd point the
identical statement at a Delta/Iceberg catalog instead.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from bfs_etl_sep2025_spark.plans.qualify import _top_level_positions

_MERGE_HEAD = re.compile(r"(?i)^\s*MERGE\s+INTO\s+")
_USING = re.compile(r"(?i)^USING\b")
_ON = re.compile(r"(?i)^ON\b")
_WHEN = re.compile(r"(?i)^WHEN\b")
_UPDATE = re.compile(
    r"(?is)^WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(?P<sets>.+)$"
)
_DELETE = re.compile(r"(?is)^WHEN\s+MATCHED\s+THEN\s+DELETE\s*$")
_INSERT = re.compile(
    r"(?is)^WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?VALUES\s*\((?P<vals>.+)\)\s*$"
)


def is_merge(stmt: str) -> bool:
    return bool(_MERGE_HEAD.match(stmt))


@dataclass
class MergeSpec:
    target: str
    target_alias: str
    source_sql: str  # table name or parenthesized subquery, verbatim
    source_alias: str
    on: str
    update_sets: dict[str, str] = field(default_factory=dict)  # col -> expr
    delete_matched: bool = False
    insert_cols: list[str] | None = None  # None and no insert clause differ
    insert_vals: list[str] | None = None


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on a separator at paren depth 0, outside quotes/comments."""
    tops = set(_top_level_positions(text))
    parts, last = [], 0
    for i in tops:
        if text[i] == sep:
            parts.append(text[last:i])
            last = i + 1
    parts.append(text[last:])
    return [p.strip() for p in parts if p.strip()]


def _name_and_alias(fragment: str) -> tuple[str, str]:
    """``db.tbl [AS] alias`` or ``(subquery) [AS] alias`` -> (sql, alias);
    the alias defaults to the bare table name (SQL's own scoping rule)."""
    frag = fragment.strip()
    if frag.startswith("("):
        depth, i = 0, 0
        for i, ch in enumerate(frag):
            depth += ch == "("
            depth -= ch == ")"
            if depth == 0:
                break
        sql, rest = frag[: i + 1], frag[i + 1 :].strip()
    else:
        toks = frag.split(None, 1)
        sql, rest = toks[0], (toks[1] if len(toks) > 1 else "")
    rest = re.sub(r"(?i)^AS\s+", "", rest.strip())
    alias = rest.split()[0] if rest else sql.split(".")[-1].strip('`"')
    return sql, alias


def parse_merge(stmt: str) -> MergeSpec:
    m = _MERGE_HEAD.match(stmt)
    if not m:
        raise ValueError("not a MERGE INTO statement")
    body = stmt[m.end() :]
    tops = _top_level_positions(body)
    using_at = on_at = None
    when_ats: list[int] = []
    for i in tops:
        prev_ok = i == 0 or not body[i - 1].isalnum()
        if not prev_ok:
            continue
        if using_at is None and _USING.match(body[i:]):
            using_at = i
        elif using_at is not None and on_at is None and _ON.match(body[i:]):
            on_at = i
        elif on_at is not None and _WHEN.match(body[i:]):
            when_ats.append(i)
    if using_at is None or on_at is None or not when_ats:
        raise ValueError(
            "unsupported MERGE shape: need USING ... ON ... WHEN ..."
        )
    target, talias = _name_and_alias(body[:using_at])
    source_sql, salias = _name_and_alias(body[using_at + len("USING") : on_at])
    on = body[on_at + len("ON") : when_ats[0]].strip()
    spec = MergeSpec(target, talias, source_sql, salias, on)
    bounds = when_ats + [len(body)]
    for a, b in zip(bounds, bounds[1:]):
        clause = body[a:b].strip()
        if _DELETE.match(clause):
            spec.delete_matched = True
        elif mm := _UPDATE.match(clause):
            for assign in _split_top_level(mm.group("sets")):
                col, _, expr = assign.partition("=")
                if not expr:
                    raise ValueError(f"bad SET assignment: {assign!r}")
                spec.update_sets[col.strip().split(".")[-1].strip('`"')] = (
                    expr.strip()
                )
        elif mm := _INSERT.match(clause):
            cols = mm.group("cols")
            spec.insert_cols = (
                [c.strip().strip('`"') for c in cols.split(",")]
                if cols
                else None
            )
            spec.insert_vals = _split_top_level(mm.group("vals"))
        else:
            raise ValueError(f"unsupported MERGE clause: {clause[:60]!r}")
    if spec.delete_matched and spec.update_sets:
        raise ValueError("MERGE: UPDATE and DELETE on the same MATCHED branch")
    return spec


def _rewrite(spec: MergeSpec, tgt_fields: list[tuple[str, str]]) -> str:
    """The UNION ALL select over (kept/updated target rows) + (inserts).
    ``tgt_fields`` is [(name, spark_sql_type)] from the live table schema."""
    t, s = spec.target_alias, spec.source_alias
    # a non-null marker column makes "matched" testable after the LEFT JOIN
    src = f"(SELECT *, true AS __merge_m FROM {spec.source_sql}) AS {s}"
    branches: list[str] = []
    if spec.delete_matched:
        cols = ", ".join(f"{t}.{c} AS {c}" for c, _ in tgt_fields)
        branches.append(
            f"SELECT {cols} FROM {spec.target} AS {t} "
            f"LEFT ANTI JOIN {src} ON {spec.on}"
        )
    else:
        cols = ", ".join(
            f"CASE WHEN {s}.__merge_m THEN ({expr}) ELSE {t}.{c} END AS {c}"
            if (expr := spec.update_sets.get(c))
            else f"{t}.{c} AS {c}"
            for c, _ in tgt_fields
        )
        branches.append(
            f"SELECT {cols} FROM {spec.target} AS {t} "
            f"LEFT JOIN {src} ON {spec.on}"
        )
    if spec.insert_vals is not None:
        names = [c for c, _ in tgt_fields]
        icols = spec.insert_cols if spec.insert_cols is not None else names
        if len(icols) != len(spec.insert_vals):
            raise ValueError("MERGE INSERT: column/value count mismatch")
        vals = dict(zip(icols, spec.insert_vals))
        proj = ", ".join(
            f"({vals[c]}) AS {c}"
            if c in vals
            else f"CAST(NULL AS {typ}) AS {c}"
            for c, typ in tgt_fields
        )
        branches.append(
            f"SELECT {proj} FROM {src} "
            f"LEFT ANTI JOIN {spec.target} AS {t} ON {spec.on}"
        )
    return " UNION ALL ".join(branches)


def run_merge(spark, stmt: str) -> None:
    """Parse + execute one MERGE INTO against the session catalog."""
    spec = parse_merge(stmt)
    schema = spark.table(spec.target).schema
    tgt_fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
    select = _rewrite(spec, tgt_fields)
    stage = f"{spec.target}__merge_stage"
    spark.sql(f"DROP TABLE IF EXISTS {stage}")
    spark.sql(f"CREATE TABLE {stage} AS {select}")
    try:
        spark.sql(f"INSERT OVERWRITE TABLE {spec.target} SELECT * FROM {stage}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {stage}")
