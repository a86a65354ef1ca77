"""Short-document robustness: every shingle-based operator must handle
docs with 0/1/2 tokens (fewer tokens than the shingle width) without
crashing, and must stay cross-engine identical with the DuckDB oracle.

Regression for the unguarded `sequence(0, size(toks) - 3)` bug: with
size < 3 Spark produced a DESCENDING sequence and the toks[i+j]
subscript threw INVALID_ARRAY_INDEX, while DuckDB's generate_series
returned an empty list — a crash AND a cross-engine divergence. The
fixture corpus never has short docs, so this needs its own corpus.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from lab04_spark_streaming_spark.plans import llm, wave7
from tests.oracle_harness import compare_query

# 0, 1, 2 tokens (below shingle width 3), exactly 3, and a few normal.
TEXTS = [
    "",
    "one",
    "two tokens",
    "exactly three tokens",
    "a b c d e f g h",
    "punct,only!!  ??",
    "the quick brown fox jumps over the lazy dog again",
    "the quick brown fox jumps over the lazy dog again",  # exact dup
]


@pytest.fixture(scope="module")
def short_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("shortdocs"))
    rows = [(i, t, "en", "unit", len(t)) for i, t in enumerate(TEXTS)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


@pytest.fixture(scope="module")
def short_duck(short_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{short_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "fn,sql",
    [
        (llm.q_minhash_signatures, llm.SQL_MINHASH_SIGNATURES),
        (llm.q_minhash_lsh_pairs, llm.SQL_MINHASH_LSH_PAIRS),
        (llm.q_jaccard_pairs, llm.SQL_JACCARD_PAIRS),
        (llm.q_fingerprint, llm.SQL_FINGERPRINT),
        (llm.q_doc_chunks, llm.SQL_DOC_CHUNKS),
        (llm.q_text_metrics, llm.SQL_TEXT_METRICS),
        (llm.q_dedup_exact, llm.SQL_DEDUP_EXACT),
        # r7 code-review regression: DuckDB ln(0) is a hard error while
        # Spark F.log(0.0) is NULL — the Theil term must guard x = 0.
        (wave7.q_length_theil_by_source, wave7.SQL_LENGTH_THEIL),
    ],
    ids=[
        "minhash_signatures",
        "minhash_lsh_pairs",
        "jaccard_pairs",
        "fingerprint",
        "doc_chunks",
        "text_metrics",
        "dedup_exact",
        "length_theil_empty_doc",
    ],
)
def test_short_doc_oracle_parity(spark, short_duck, short_dir, fn, sql):
    compare_query(spark, short_duck, fn, sql, short_dir)


def test_short_docs_excluded_from_lsh_buckets(spark, short_dir):
    """Docs with an empty shingle set must NOT pair with each other via
    the shared md5('') band bucket."""
    pairs = llm.q_minhash_lsh_pairs(spark, short_dir).collect()
    short_ids = {0, 1, 2}  # <3 tokens
    for r in pairs:
        assert r.id_a not in short_ids and r.id_b not in short_ids
    # the exact-dup pair (6, 7) must still be found
    assert any((r.id_a, r.id_b) == (6, 7) for r in pairs)
