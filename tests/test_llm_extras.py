"""Crafted-corpus tests for the round-2 LLM-pipeline additions. The
fixture documents contain no PII and little cross-source overlap, so
these operators need a corpus that actually exercises them: redaction
spans, a contaminated eval split, hamming-near simhashes."""

from __future__ import annotations

import os

import duckdb
import pytest

from lab04_spark_streaming_spark.operators.dedup import (
    cross_source_overlap,
    simhash_pairs,
)
from lab04_spark_streaming_spark.plans import llm
from tests.oracle_harness import compare_query

ROWS = [
    # (doc_id, text, lang, source, n_chars)
    (0, "contact me at alice@example.com or visit https://a.example.com/x?q=1 soon", "en", "web", 0),
    (1, "call +1 (555) 123-4567 today; backup line 555 987 6543 ok", "en", "web", 0),
    (2, "the quick brown fox jumps over the lazy dog near the river bank", "en", "train", 0),
    (3, "a quick brown fox jumps over the lazy dog near the river bank today", "en", "eval", 0),
    (4, "totally unrelated content about spark partitions and shuffle plans", "en", "eval", 0),
    (5, "no pii here just words", "en", "train", 0),
    (6, "the quick brown fox jumps over the lazy dog near the river bank", "en", "train", 0),
]


@pytest.fixture(scope="module")
def pii_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("llmextras"))
    df = spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


@pytest.fixture(scope="module")
def pii_duck(pii_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{pii_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


def test_pii_scrub_redacts_and_counts(spark, pii_dir):
    got = {r.doc_id: r for r in llm.q_pii_scrub(spark, pii_dir).collect()}
    assert got[0].n_emails == 1 and got[0].n_urls == 1
    assert "<EMAIL>" in got[0].clean_text and "<URL>" in got[0].clean_text
    assert "alice@example.com" not in got[0].clean_text
    assert "https://" not in got[0].clean_text
    assert got[1].n_phones >= 2 and "<PHONE>" in got[1].clean_text
    assert "123-4567" not in got[1].clean_text
    assert got[5].clean_text == ROWS[5][1]  # untouched doc stays intact
    assert (got[5].n_urls, got[5].n_emails, got[5].n_phones) == (0, 0, 0)


def test_decontamination_catches_train_eval_overlap(spark, pii_dir):
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in cross_source_overlap(
            spark.read.parquet(f"{pii_dir}/documents.parquet"),
            group_col="source",
            n=5,
            min_shared=3,
        ).collect()
    }
    # eval doc 3 shares its 5-gram tail with train docs 2 and 6;
    # the identical 2-6 pair is SAME-source and must NOT appear.
    assert (2, 3) in pairs and (3, 6) in pairs
    assert (2, 6) not in pairs
    assert all(a != 4 and b != 4 for a, b in pairs)  # unrelated doc clean


def test_simhash_pairs_finds_near_identical_docs(spark, pii_dir):
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs(
            spark.read.parquet(f"{pii_dir}/documents.parquet"), max_hamming=3
        ).collect()
    }
    assert got.get((2, 6)) == 0  # identical token sets -> distance 0
    for (a, b), h in got.items():
        assert h <= 3


@pytest.mark.parametrize(
    "fn,sql",
    [
        (llm.q_pii_scrub, llm.SQL_PII_SCRUB),
        (llm.q_token_count_bpe, llm.SQL_TOKEN_COUNT_BPE),
        (llm.q_simhash_pairs, llm.SQL_SIMHASH_PAIRS),
        (llm.q_decontamination_pairs, llm.SQL_DECONTAMINATION_PAIRS),
        (llm.q_stratified_sample, llm.SQL_STRATIFIED_SAMPLE),
    ],
    ids=["pii_scrub", "token_count_bpe", "simhash_pairs", "decontamination", "stratified_sample"],
)
def test_crafted_corpus_oracle_parity(spark, pii_duck, pii_dir, fn, sql):
    compare_query(spark, pii_duck, fn, sql, pii_dir)
