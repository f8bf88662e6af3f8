"""Long-document regime tests (VERDICT r7 item 5).

Every corpus/text scale claim was previously proven only on the fixture's
~300-char documents. This file synthesizes a documents table with 10–100 KB
docs (plus the <= _CDC_W edge lengths) and re-proves, at that regime:

  * corpus_cdc_chunk_dedup — DuckDB parity on long docs AND the r8 shuffle
    fix: document text crosses AT MOST ONE exchange (the old shape shipped
    text through the boundary window once per surviving boundary,
    O(doc_len²/64) shuffle bytes per doc — invisible at 300 chars, ~150 MB
    per 100 KB doc);
  * the ADVICE r7 guard — docs with n_chars <= _CDC_W must produce no
    fabricated boundaries (Spark's sequence() DESCENDS when stop < start);
  * corpus_chunk_dedup / text_repetition_ngrams / text_pii_redact /
    text_bpe_pretokenize — parity at long-doc scale (explode fan-outs in
    the hundred-thousands of rows per doc, not hundreds).

Codegen health: the Janino 64 KB ceiling (CLAUDE.md) cannot be gripped from
inside pytest (the only symptom is `ERROR CodeGenerator` on stderr), so the
chunking paths here are also part of the manual sf1 sweep grep; these tests
pin plan SHAPE, which is the part that regresses silently.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from bfs_etl_sep2025_spark import registry
from bfs_etl_sep2025_spark.operators.corpus import _CDC_W

#: slow tier (r12): long-doc regime parity sweeps are minutes-scale by design
pytestmark = pytest.mark.slow

_WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "batch state stream shuffle spark chunk span quote header license block"
).split()

#: a passage long enough to span several expected CDC chunks (~64 chars
#: each), shared across documents at different offsets / 1-char shifts —
#: the re-synchronization property content-defined chunking exists for.
_SHARED = " ".join(_WORDS * 30)  # ~3.4 KB


def _make_docs() -> pd.DataFrame:
    rng = random.Random(42)
    rows = []
    doc_id = 0

    def add(text: str) -> None:
        nonlocal doc_id
        rows.append(
            {
                "doc_id": doc_id,
                "text": text,
                "lang": "en",
                "source": f"src{doc_id % 4}",
                "n_chars": len(text),
            }
        )
        doc_id += 1

    # 12 long docs, ~10 KB to ~100 KB, each embedding the shared passage
    # once at a random offset; half are prefixed with ONE extra char so the
    # passage is shifted — CDC must still find its chunks cross-doc.
    for i in range(12):
        target = 10_000 + i * 8_000
        filler_a = " ".join(rng.choices(_WORDS, k=target // 10))
        filler_b = " ".join(rng.choices(_WORDS, k=target // 10))
        shift = "X" if i % 2 else ""
        add(shift + filler_a + " " + _SHARED + " " + filler_b)
    # edge lengths around the CDC window: no interior candidate positions
    # exist for n_chars <= _CDC_W; Spark must not fabricate them.
    for n in (1, 2, _CDC_W - 1, _CDC_W, _CDC_W + 1, _CDC_W + 2):
        add("a" * n)
    # two identical short docs -> exactly one duplicated single-chunk
    add("duplicate!")
    add("duplicate!")
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def longdoc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("longdocs")
    _make_docs().to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.fixture(scope="module")
def longdoc_duck(longdoc_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{longdoc_dir}/documents.parquet')"
    )
    yield con
    con.close()


def _parity(spark, longdoc_dir, longdoc_duck, name):
    spec = registry.all_specs()[name]
    got = spec.fn(spark, longdoc_dir).toPandas()
    want = longdoc_duck.execute(spec.oracle).fetchdf()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns), name
    gs = (
        got.reindex(cols, axis=1)
        .astype(str)
        .sort_values(cols)
        .reset_index(drop=True)
    )
    ws = (
        want.reindex(cols, axis=1)
        .astype(str)
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert len(gs) == len(ws), f"{name}: {len(gs)} vs {len(ws)} rows"
    assert gs.equals(ws), name
    return got


def _exchanges_carrying(spark, df, col: str) -> int:
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    n = 0
    for section in plan.split("\n\n"):
        first = section.strip().splitlines()[0] if section.strip() else ""
        if "Exchange" in first and col in section:
            n += 1
    return n


def test_cdc_longdoc_parity_and_resync(spark, longdoc_dir, longdoc_duck):
    got = _parity(spark, longdoc_dir, longdoc_duck, "corpus_cdc_chunk_dedup")
    # the shared passage spans many expected-~64-char chunks; shifted copies
    # must re-synchronize, so plenty of cross-doc duplicate chunks exist
    assert len(got) > 20, "shared passage should yield many duplicate chunks"
    # the duplicated 10-char doc pair survives the <=W guard as ONE chunk
    assert (got["n_docs"] >= 2).all()


def test_cdc_text_crosses_at_most_one_exchange(spark, longdoc_dir):
    """The r8 amplification fix: only (doc_id, p) boundary pairs shuffle;
    text rides at most the single join exchange (zero when AQE broadcasts
    the boundary side)."""
    df = registry.all_specs()["corpus_cdc_chunk_dedup"].fn(spark, longdoc_dir)
    assert _exchanges_carrying(spark, df, "text") <= 1


def test_cdc_short_docs_single_chunk(spark, longdoc_dir, longdoc_duck):
    """Docs with n_chars <= _CDC_W have no valid interior window; the only
    boundary is position 1 (the ADVICE r7 descending-sequence trap). The
    two identical 10-char docs must therefore dedup as ONE whole-doc chunk
    with exactly 2 occurrences."""
    got = (
        registry.all_specs()["corpus_cdc_chunk_dedup"]
        .fn(spark, longdoc_dir)
        .toPandas()
    )
    import hashlib

    dup_md5 = hashlib.md5(b"duplicate!").hexdigest()
    row = got[got.chunk_md5 == dup_md5]
    assert len(row) == 1
    assert int(row.n_docs.iloc[0]) == 2
    assert int(row.n_occurrences.iloc[0]) == 2


def test_chunk_dedup_fixed_stride_longdoc_parity(
    spark, longdoc_dir, longdoc_duck
):
    got = _parity(spark, longdoc_dir, longdoc_duck, "corpus_chunk_dedup")
    assert len(got) > 0
    # narrow-shuffle claim holds at this regime too: chunk md5s shuffle,
    # never chunk text
    df = registry.all_specs()["corpus_chunk_dedup"].fn(spark, longdoc_dir)
    assert _exchanges_carrying(spark, df, "text") == 0


def test_repetition_ngrams_longdoc_parity(spark, longdoc_dir, longdoc_duck):
    got = _parity(spark, longdoc_dir, longdoc_duck, "text_repetition_ngrams")
    # the _SHARED-heavy docs repeat bigrams massively; make sure the regime
    # actually exercises large per-doc fan-out (tens of thousands of bigrams)
    assert int(got["n_bigrams"].max()) > 10_000


def test_duplicate_spans_longdoc_parity(spark, longdoc_dir, longdoc_duck):
    """Exact substring-dedup spans at the long-doc regime: the shared
    passage must surface as one maximal span (~len(_SHARED)) per carrier
    doc, 1-char-shifted copies included (alignment-free), with text never
    crossing an exchange (only (md5, doc_id, p) shuffles)."""
    got = _parity(spark, longdoc_dir, longdoc_duck, "corpus_duplicate_spans")
    carriers = got[got.max_span_len >= len(_SHARED) - 100]
    assert len(carriers) == 12, "every long doc embeds the shared passage"
    df = registry.all_specs()["corpus_duplicate_spans"].fn(spark, longdoc_dir)
    assert _exchanges_carrying(spark, df, "text") == 0


def test_span_removal_longdoc_parity(spark, longdoc_dir, longdoc_duck):
    """The removal pass at the long-doc regime: every non-owner carrier of
    the shared passage loses ~one passage-sized region; the owner doc (and
    its unique filler) survives intact. Parity pins the cleaned-text md5s,
    i.e. the actual spliced output, not just the counts."""
    got = _parity(spark, longdoc_dir, longdoc_duck, "corpus_span_removal")
    # 11 of the 12 long docs are non-owners of the shared passage
    assert len(got[got.removed_chars >= len(_SHARED) - 100]) == 11


def test_span_removal_one_text_exchange_no_codegen_fallback(
    spark, longdoc_dir, longdoc_duck
):
    """VERDICT r8 item 7: assert corpus_span_removal's one-text-join claim
    against the PLAN at the 10-100 KB regime — document text must cross at
    most the single final-splice join exchange — and prove the splice
    expressions stay inside codegen. The Janino 64 KB ceiling's only
    default symptom is an `ERROR CodeGenerator` stderr line (CLAUDE.md), so
    instead of grepping logs the run here flips
    ``spark.sql.codegen.fallback=false`` + ``factoryMode=CODEGEN_ONLY``:
    any expression or whole-stage compile failure then RAISES instead of
    silently dropping the stage to interpreted mode."""
    spec = registry.all_specs()["corpus_span_removal"]
    df = spec.fn(spark, longdoc_dir)
    assert _exchanges_carrying(spark, df, "text") <= 1

    conf = spark.conf
    old_fallback = conf.get("spark.sql.codegen.fallback", "true")
    old_factory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try:
        n = spec.fn(spark, longdoc_dir).count()
        assert n > 0
    finally:
        conf.set("spark.sql.codegen.fallback", old_fallback)
        conf.set("spark.sql.codegen.factoryMode", old_factory)


def test_pii_redact_longdoc_parity(spark, longdoc_dir, longdoc_duck):
    _parity(spark, longdoc_dir, longdoc_duck, "text_pii_redact")


def test_bpe_pretokenize_longdoc_parity(spark, longdoc_dir, longdoc_duck):
    _parity(spark, longdoc_dir, longdoc_duck, "text_bpe_pretokenize")
