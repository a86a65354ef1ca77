"""The scale-probe fixture builder must upscale the way it claims:
row counts x factor, key spaces grown by one decade stride per
replica, replica documents perturbed off the near-dup cliff, replica
embeddings noised but dimension-preserving, and replica 0 identical
to the source in every rewritten column (documents text, embedding
vectors, lineitem partkeys) so the fixture's base decade IS the 1x
data the t1x timings run against (scripts/scale_probe.py)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

SRC = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def fixture2x(tmp_path_factory):
    from scale_probe import build_fixture

    out = str(tmp_path_factory.mktemp("scale2x"))
    build_fixture(SRC, out, 2)
    return out


def q1(sql: str):
    return duckdb.sql(sql).fetchone()


def test_row_counts_and_key_spaces(fixture2x):
    for t in ("events", "lineitem", "documents", "embeddings"):
        n_src = q1(f"select count(*) from '{SRC}/{t}.parquet'")[0]
        n_out = q1(f"select count(*) from '{fixture2x}/{t}.parquet'")[0]
        assert n_out == 2 * n_src, t
    # key spaces grow: distinct users/docs/vectors double, partkeys
    # scatter over the doubled part space.
    u_src = q1(f"select count(distinct user_id) from '{SRC}/events.parquet'")[0]
    u_out = q1(
        f"select count(distinct user_id) from '{fixture2x}/events.parquet'"
    )[0]
    assert u_out == 2 * u_src
    pk_max = q1(
        f"select max(l_partkey) from '{fixture2x}/lineitem.parquet'"
    )[0]
    assert 20_000 <= pk_max < 40_000  # scattered into the 2x part space
    # orders uses the SAME orderkey stride as lineitem — every upscaled
    # lineitem row must still find its order (a 1x orders beside a 2x
    # lineitem silently drops half the join).
    n_orders = q1(f"select count(*) from '{fixture2x}/orders.parquet'")[0]
    assert n_orders == 2 * q1(f"select count(*) from '{SRC}/orders.parquet'")[0]
    orphans = q1(
        f"""
        select count(*) from '{fixture2x}/lineitem.parquet' l
        anti join '{fixture2x}/orders.parquet' o
          on l.l_orderkey = o.o_orderkey
        """
    )[0]
    assert orphans == 0


def test_replica_zero_identical_and_replicas_perturbed(fixture2x):
    # replica 0 of lineitem keeps its source partkeys (only replicas
    # 1..N-1 are hash-scattered) — the base decade is the 1x data.
    pk_changed = q1(
        f"""
        select count(*) from (
          select l_orderkey, l_linenumber, l_partkey
          from '{SRC}/lineitem.parquet'
          except
          select l_orderkey, l_linenumber, l_partkey
          from '{fixture2x}/lineitem.parquet' where l_orderkey < 150000
        )
        """
    )[0]
    assert pk_changed == 0
    # replica 0 of documents is byte-identical to the source
    same = q1(
        f"""
        select count(*) from '{SRC}/documents.parquet' s
        join '{fixture2x}/documents.parquet' o using (doc_id)
        where s.text = o.text
        """
    )[0]
    n_src = q1(f"select count(*) from '{SRC}/documents.parquet'")[0]
    assert same == n_src
    # replica 1 texts differ from their source (not near-identical)
    differing = q1(
        f"""
        select count(*) from '{SRC}/documents.parquet' s
        join '{fixture2x}/documents.parquet' o
          on o.doc_id = s.doc_id + 5000
        where s.text <> o.text
        """
    )[0]
    assert differing == n_src
    # embeddings: same dimension, replica values within 1% of source
    row = q1(
        f"""
        select max(abs(o.e - s.e) / greatest(abs(s.e), 1e-9))
        from (select vec_id, unnest(embedding) as e,
                     generate_subscripts(embedding, 1) as i
              from '{SRC}/embeddings.parquet') s
        join (select vec_id - 2000 as vec_id, unnest(embedding) as e,
                     generate_subscripts(embedding, 1) as i
              from '{fixture2x}/embeddings.parquet'
              where vec_id >= 2000) o using (vec_id, i)
        """
    )
    assert row[0] is not None and row[0] <= 0.0101


def test_build_is_deterministic(fixture2x, tmp_path):
    from scale_probe import build_fixture

    out2 = str(tmp_path / "again")
    build_fixture(SRC, out2, 2)
    for t in ("documents", "embeddings", "lineitem"):
        a = q1(
            f"select count(*) from '{fixture2x}/{t}.parquet' x "
            f"positional join '{out2}/{t}.parquet' y where x <> y"
        )
        # identical row-for-row (DuckDB COPY order is deterministic
        # for a deterministic query plan)
        assert a[0] == 0, t
