"""bfs_hops output-vs-time adjudication (r14, the r13 verdict item 3):
compute the TRUE work profile of the BFS frontier expansion exactly in
DuckDB at 1x/10x/100x, the way kcore_docs' x22-edges-per-x10-docs
adjudication settled whether its 1.12 time exponent was plan- or
output-driven.

The plan's per-iteration join work is Sigma_{x in dist_{i-1}} deg(x)
(the current implementation re-expands the ENTIRE reached set each
hop, not just the new frontier), so the quantities that bound the
plan's cost are:

  * |edges|            — the symmetric co-purchase edge count
  * reached_i          — |dist_i| after each hop
  * work_i             — Sigma deg over dist_{i-1} (join probe rows)
  * total_work         — Sigma_i work_i  (the relational cost driver)

If total_work grows at least as fast as the measured wall time
(exponent 0.87 at 100x, SCALE_PROBE_r13), the plan is edge/output
bound and 0.87 is the data, not a quadratic stage.  If time grows
faster than total_work, the plan leaves work on the table (the
delta-frontier rewrite: expand only newly-discovered nodes).

Usage: python scripts/bfs_adjudicate.py [--tiers 1,10,100]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MAX_HOPS = 3  # keep in sync with plans/wave11._BFS_MAX_HOPS


def profile(sf_dir: str) -> dict:
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    con.execute(
        "CREATE VIEW lineitem AS "
        f"SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    t0 = time.time()
    con.execute(
        """
CREATE TEMP TABLE edges AS
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
pairs AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
)
SELECT u AS src, v AS dst FROM pairs
UNION ALL SELECT v AS src, u AS dst FROM pairs
"""
    )
    con.execute(
        "CREATE TEMP TABLE deg AS "
        "SELECT src, COUNT(*) AS deg FROM edges GROUP BY src"
    )
    n_edges = con.execute("SELECT COUNT(*) FROM edges").fetchone()[0]
    n_nodes = con.execute("SELECT COUNT(*) FROM deg").fetchone()[0]
    con.execute(
        "CREATE TEMP TABLE dist0 AS "
        "SELECT src AS x, 0 AS dist FROM deg ORDER BY deg DESC, src LIMIT 1"
    )
    out = {
        "n_edges": n_edges,
        "n_nodes": n_nodes,
        "hops": [],
        "total_work": 0,
        "delta_work": 0,
    }
    for i in range(1, MAX_HOPS + 1):
        work = con.execute(
            f"SELECT COALESCE(SUM(deg), 0) FROM deg "
            f"JOIN dist{i-1} d ON deg.src = d.x"
        ).fetchone()[0]
        con.execute(
            f"""
CREATE TEMP TABLE dist{i} AS
SELECT x, MIN(dist) AS dist FROM (
  SELECT x, dist FROM dist{i-1}
  UNION ALL
  SELECT e.dst AS x, d.dist + 1 AS dist
  FROM edges e JOIN dist{i-1} d ON e.src = d.x
) GROUP BY x
"""
        )
        reached = con.execute(f"SELECT COUNT(*) FROM dist{i}").fetchone()[0]
        # what a delta-frontier rewrite would pay this hop: degrees of
        # only the NEWLY discovered nodes (hop 1 pays the seed's degree)
        dwork = con.execute(
            f"SELECT COALESCE(SUM(deg), 0) FROM deg JOIN ("
            f"  SELECT x FROM dist{i-1} WHERE dist = {i-1}) f ON deg.src = f.x"
        ).fetchone()[0]
        out["hops"].append(
            {"hop": i, "work_rows": work, "delta_work_rows": dwork,
             "reached": reached}
        )
        out["total_work"] += work
        out["delta_work"] += dwork
    out["profile_secs"] = round(time.time() - t0, 1)
    con.close()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="1,10,100")
    ap.add_argument("--out", default="/tmp/bfs_adjudicate.json")
    args = ap.parse_args()
    dirs = {1: BASE, 10: "/tmp/scale10x", 100: "/tmp/scale100x"}
    res = {}
    for t in (int(x) for x in args.tiers.split(",")):
        print(f"[tier {t}x] {dirs[t]} ...", file=sys.stderr, flush=True)
        res[f"t{t}x"] = profile(dirs[t])
    if "t1x" in res:
        base = res["t1x"]["total_work"]
        for k, v in res.items():
            f = int(k[1:-1])
            if f > 1 and base:
                v["work_exponent_vs_1x"] = round(
                    math.log(v["total_work"] / base) / math.log(f), 3
                )
    with open(args.out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
