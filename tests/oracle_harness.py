"""Local stand-in for the driver's DuckDB-oracle correctness check.

Mimics the documented contract (__spark_entry__.py): for each query,
row-count + schema + ORDER-INSENSITIVE value comparison between the
Spark result and the DuckDB oracle on the same parquet tables. We
compare exact stringified multisets (strictest plausible hash), so if
this passes, any reasonable driver-side hash passes too.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import duckdb

from lab04_spark_streaming_spark.schemas import STAR_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0"  # -0.0 == 0.0
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return repr(v)


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare_query(spark, con, fn, sql: str, sf_dir: str) -> None:
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    if s_norm != d_norm:
        only_s = list((s_norm - d_norm).items())[:5]
        only_d = list((d_norm - s_norm).items())[:5]
        raise AssertionError(
            f"value mismatch: {sum((s_norm - d_norm).values())} rows differ\n"
            f"spark-only sample: {only_s}\nduck-only sample: {only_d}"
        )
