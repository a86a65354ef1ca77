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


#: DuckDB scalar type -> the Spark simpleString the driver's hash expects.
#: Types absent from this map (STRUCT, MAP, enums, ...) are skipped by the
#: type audit; HUGEINT/UHUGEINT are hard errors (DuckDB widens SUM(BIGINT)
#: to int128, Spark emits int64, and the driver hash is type-sensitive —
#: the exact class that produced CORRECTNESS_r06's four reds).
#: Integer WIDTH differences are benign (both engines surface Python
#: ints; driver stamps prove it: window_ntile_percent_rank r6-green with
#: Spark int vs DuckDB BIGINT) — any int maps to any int. HUGEINT is NOT
#: in the family: DuckDB's pandas conversion widens int128 to float64,
#: so 123 hashes as 123.0 and the driver goes red.
_INTS = ("bigint", "int", "smallint", "tinyint")
_DUCK_TO_SPARK = {
    "BIGINT": _INTS,
    "INTEGER": _INTS,
    "INT": _INTS,
    "SMALLINT": _INTS,
    "TINYINT": _INTS,
    "DOUBLE": ("double",),
    "FLOAT": ("float",),
    "REAL": ("float",),
    "VARCHAR": ("string",),
    "BOOLEAN": ("boolean",),
    "DATE": ("date",),
    "TIMESTAMP": ("timestamp", "timestamp_ntz"),
    "TIMESTAMP WITH TIME ZONE": ("timestamp",),
    "BLOB": ("binary",),
}


def _duck_to_spark(duck_type: str):
    """Expected Spark simpleString(s) for a DuckDB type, or None if the
    audit should skip it (no unambiguous mapping)."""
    t = duck_type.strip().upper()
    if t.endswith("[]"):
        inner = _duck_to_spark(t[:-2])
        if inner is None:
            return None
        return tuple(f"array<{i}>" for i in inner)
    if t.startswith("DECIMAL"):
        return (t.lower().replace(" ", ""),)
    return _DUCK_TO_SPARK.get(t)


def assert_oracle_types(spark_df, con, sql: str) -> None:
    """Fail if the oracle's output schema cannot hash-match Spark's.

    The driver's value hash is type-sensitive: an oracle column whose
    DuckDB type maps to a different Spark type mismatches even when every
    value is equal. ``DESCRIBE`` the oracle and (a) hard-reject
    HUGEINT/UHUGEINT anywhere, (b) for every mappable scalar type assert
    it matches the Spark column's simpleString.
    """
    desc = con.execute("DESCRIBE " + sql).fetchall()
    duck_types = {row[0]: row[1] for row in desc}
    spark_types = {f.name: f.dataType.simpleString() for f in spark_df.schema}
    problems = []
    for col, dtyp in duck_types.items():
        if "HUGEINT" in dtyp.upper():
            problems.append(
                f"{col}: oracle emits {dtyp} (int128) — add CAST(... AS "
                f"BIGINT/DOUBLE); Spark side is "
                f"{spark_types.get(col, '<missing>')}"
            )
            continue
        expected = _duck_to_spark(dtyp)
        if expected is None or col not in spark_types:
            continue
        if spark_types[col] not in expected:
            problems.append(
                f"{col}: oracle {dtyp} maps to spark {expected} but query "
                f"emits {spark_types[col]}"
            )
    assert not problems, "oracle/spark type mismatch:\n  " + "\n  ".join(
        problems
    )


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
    assert_oracle_types(sdf, con, sql)
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
