"""Run every registered query against its DuckDB oracle — the local
version of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from lab04_spark_streaming_spark.registry import all_specs
from tests.oracle_harness import compare_query, duckdb_connection

SPECS = [s for s in all_specs() if s.sql is not None]
ROWS_ONLY = [s for s in all_specs() if s.sql is None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spark, duck, sf_dir, spec):
    compare_query(spark, duck, spec.fn, spec.sql, sf_dir)


@pytest.mark.parametrize("spec", ROWS_ONLY, ids=[s.name for s in ROWS_ONLY] or None)
def test_rows_only_runs(spark, sf_dir, spec):
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_harness_catches_hugeint_oracle(spark, duck, sf_dir):
    """The r6 driver reds were uncast SUM() oracles (DuckDB widens
    SUM(BIGINT) to HUGEINT; the driver hash is type-sensitive). The
    local harness must fail such an oracle BEFORE it burns a stamp."""

    def fn(sp, d):
        from pyspark.sql import functions as F

        return (
            sp.read.parquet(f"{d}/nation.parquet")
            .groupBy("n_regionkey")
            .agg(F.sum("n_nationkey").alias("s"))
        )

    bad_sql = (
        "SELECT n_regionkey, SUM(n_nationkey) AS s "
        "FROM nation GROUP BY n_regionkey"
    )
    with pytest.raises(AssertionError, match="HUGEINT"):
        compare_query(spark, duck, fn, bad_sql, sf_dir)
    good_sql = (
        "SELECT n_regionkey, CAST(SUM(n_nationkey) AS BIGINT) AS s "
        "FROM nation GROUP BY n_regionkey"
    )
    compare_query(spark, duck, fn, good_sql, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_registry_contract():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0
