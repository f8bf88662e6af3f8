"""Shared codegen'd n-gram / shingle expansion — the sanctioned hot-path form.

Banned form (hot-path rule, VERDICT r01/r02):
``F.explode(F.transform(F.sequence(...), lambda i: <gram>))`` — higher-order
array lambdas have no codegen (``HigherOrderFunction`` evaluates the lambda
interpreted, per element, inside an otherwise compiled stage). On the minhash
signature build at sf0.1 the lambda form measured ~2.5-6x slower end-to-end
than this module's form, with bitwise-identical output (r4 microbench).

The fast shape: explode the *index* sequence first, then assemble each gram
from the carried token array with ``element_at(tokens, i + k)`` — plain
expressions, so Generate + Project stay inside one WholeStageCodegen span and
the gram never materializes as an intermediate array.

Semantics (each caller mirrors this in its DuckDB oracle): n-token
space-joined shingles for docs with >= n tokens; shorter docs contribute one
whole-text shingle. The sentinel index -1 marks the degenerate branch so the
output matches the array form exactly for any whitespace shape.

Reference parity: the reference has no text-shingling surface at all (its 5
DAGs delegate SQL to the warehouse, ``dags/dev_db_test.py:41-70``); this is
part of the training-data-pipeline tier layered on top.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exploded_ngrams(
    docs: DataFrame,
    n: int = 3,
    id_cols: Sequence[str] = ("doc_id",),
    out: str = "s",
) -> DataFrame:
    """``(id_cols..., text)`` -> one row per shingle: ``(id_cols..., out)``.

    Output order within a doc follows gram start position (explode preserves
    element order), identical to the array-transform form it replaces.
    """
    t = F.split("text", " ")
    idx = F.when(
        F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
    ).otherwise(F.array(F.lit(-1)))
    base = docs.select(
        *id_cols, "text", t.alias("__tk"), F.explode(idx).alias("__i")
    )
    i = F.col("__i")
    gram = F.when(i == F.lit(-1), F.col("text")).otherwise(
        F.concat_ws(
            " ", *[F.element_at(F.col("__tk"), i + k) for k in range(n)]
        )
    )
    return base.select(*id_cols, gram.alias(out))
