"""Scale probe: measure how the most expensive headline plans scale
from sf0.1 to a deterministic 10x upscale (synthetic "sf1").

The driver ships fixtures only up to sf0.1; this script answers the
100-TB design question empirically one decade up: build a 10x fixture
whose KEY SPACES grow the way the driver's generator grows them
(sf0.01 -> sf0.1 multiplies part/customer/user/doc/vector counts by 10
alongside row counts — verified against the shipped fixtures), time
each probed query at 1x and 10x (median of N count() runs, same method
as bench.py), and report the empirical scaling exponent
log(t10/t1)/log(10).  An exponent near 1 means the plan's cost is
linear in data size (shuffle-bound); near 2 means a quadratic stage
survived — the thing the plan-audit gates exist to prevent.

Fixture construction (all deterministic, DuckDB):
  * events    x10: new user decades (user_id + R*2000), event_id
                   offset, timestamps/types/values unchanged — traffic
                   grows, the one-month time axis does not (matches the
                   driver: sf0.01 and sf0.1 span the same month).
  * lineitem  x10: new order decades (l_orderkey + R*150000); replica
                   partkeys hash-scattered over a 10x part space (200k)
                   so the co-purchase graph grows like the generator's
                   random bipartite structure instead of decomposing
                   into 10 disjoint copies (which would fake perfect
                   linearity).  Replica 0 keeps its source keys, so the
                   base decade IS the 1x data the t1x timings run on.
  * documents x10: new doc decades; every 7th word of each replica is
                   suffixed with the replica id, so replicas are NOT
                   near-duplicates of their source (the corpus-wide
                   near-dup rate stays constant as the corpus grows —
                   replicating text verbatim would grow LSH candidate
                   pairs quadratically for reasons that have nothing to
                   do with the algorithm under test).
  * embeddings x10: new vec decades; deterministic +-1% component
                   noise on replicas keeps them off their source's
                   cosine neighborhood cliff while preserving the
                   cluster structure k-means/IVF/PQ train on.
  * other tables: copied verbatim (none of the probed queries read
                   them; present so load_table works for any query).

Usage:
  python scripts/scale_probe.py [--factor 10] [--runs 3]
                                [--out /tmp/scale_probe.json]
Prints one JSON line per query plus a summary line.

Tier conventions (SCALE_PROBE_r10/r11 artifacts): 10x = default run,
all probes; 100x = --probes <subset> with SPARK_GRAFT_DRIVER_MEM=24g
(the one-box equivalent of a cluster's per-core memory; partitions
already scale via min(512, 32*factor)); 1000x (r11) = the
events/documents/embeddings families only (a 1000x lineitem is a
600M-row one-box fixture — hours of shuffle for no added signal).
On boxes whose /tmp reaps idle temp files mid-run (observed r11:
temp_shuffle ENOENT ~15 min in), set
SPARK_LOCAL_DIRS=/root/repo/.probe_tmp/sparklocal and
--fixture-dir under .probe_tmp/ (gitignored).
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The five most expensive headline plans (BENCH_r10 ordering) — the
# ones whose 100x behavior the round verdicts grade.
PROBES = [
    "zscore_asof_join",
    "semdedup_keep_best",
    "triangle_count",
    "ann_ivfpq_topk",
    "dedup_minhash_lsh_pairs",
    # second tier (r10): the next-most-expensive shuffle shapes — the
    # exact set-similarity join, the basket-pair fan-out, the
    # full-corpus tokenize + double aggregation, and the df-prefiltered
    # document pair walk.
    "jaccard_prefix_join",
    "copurchase_lift",
    "source_kl_divergence",
    "pmi_word_pairs",
    # third tier (r10): the rest of the bench headline, completing the
    # 24-query scale table.
    "q1_pricing_summary",
    "q5_local_supplier",
    "moving_stats_flat",
    "moving_stats_long_windows",
    "moving_stats_nested_json",
    "sessionize_gap30m",
    "first_crossing_higher",
    "scd2_intervals",
    "concurrent_active_30m",
    "holt_backtest",
    "dedup_minhash_signatures",
    "knn_cosine_topk",
    "kmeans_clusters",
    "poisson_bootstrap",
    "kcenter_coreset",
    "mmd_rff",
    # fourth tier (r12): representatives of the pin-converted plans
    # (the r11 verdict's item-2 triage; "pins converted count as
    # changes" re-probe rule).  dedup_clusters stands for the whole
    # connected-components pipeline — dedup_keep_best /
    # dedup_cluster_sizes / golden_records are thin composers over the
    # same pinned relations.
    "dedup_clusters",
    "decontamination_containment",
    "item_item_cosine",
    # fifth tier (r13): never-probed wave16 graph plans on the
    # triangle-count edge relation, plus one representative per r13
    # pin-conversion class (token explode: heaps_law; events
    # row_number rank: tukey_fences).
    "graph_assortativity",
    "rich_club",
    "heaps_law",
    "tukey_fences",
    "kcore_docs",
    "fs_linkage",
    "snm_candidates",
    "randomization_test",
    "decontamination_pairs",
    "multimodal_decode_stub",
    "ppr_related_parts",
    "bfs_hops",
    # sixth tier (r14): the dedup-before-graph variants (the r13
    # verdict's one `weak` — the exact graph is output-quadratic on
    # replica-heavy corpora; these must show the 100x wall far below
    # the exact graph's 1358 s), plus the exact LPA (never probed —
    # it shares kcore's edge build but not its peel loop).
    "kcore_docs_deduped",
    "lpa_communities",
    "lpa_communities_deduped",
]

# (r11) semdedup_keep_best itself now scales its cell count with the
# corpus (k = ceil(sqrt(n)) from the parquet footer, the SemDeDup
# paper's rule), so the separate k-proportional-to-n probe variant
# from r10 — which measured exponent 0.73 vs the then-pinned-k's 1.09
# and motivated the promotion — is gone: the headline probe now IS the
# scaled configuration.

# Key-space strides: one decade per replica, matching the shipped
# sf0.01 -> sf0.1 growth (all maxima verified against the fixtures).
STRIDES = {
    "event_id": 100_000,
    "user_id": 2_000,  # user_id max 1499 at sf0.1
    "l_orderkey": 150_000,
    "doc_id": 5_000,
    "vec_id": 2_000,
    "n_parts": 20_000,
    "n_cust": 15_000,  # c_custkey 0..14999 at sf0.1; 1500 at sf0.01
}


# Which upscaled tables each probe reads — a selective run (--probes)
# builds only what it needs, so a 100x events-only point stays cheap
# (100x lineitem would be 600M rows).
# Bump whenever build_fixture's generation scheme changes (key
# scattering, dimension handling, ...): fixture reuse is meta-based,
# not existence-based — a stale dir built under an older scheme is
# wiped and rebuilt instead of silently reused (r12 advisor: pre-r12
# dirs carried unscattered o_custkey orders and verbatim 1x customer
# next to scattered orders, resurrecting the exact join-drop and
# factor^2-basket artifacts the r12 fixes removed).
FIXTURE_GENERATION = 3

PROBE_TABLES = {
    "zscore_asof_join": {"events"},
    "semdedup_keep_best": {"embeddings"},
    "triangle_count": {"lineitem"},
    "ann_ivfpq_topk": {"embeddings"},
    "dedup_minhash_lsh_pairs": {"documents"},
    "jaccard_prefix_join": {"documents"},
    "copurchase_lift": {"lineitem"},
    "source_kl_divergence": {"documents"},
    "pmi_word_pairs": {"documents"},
    # third tier (r10): the rest of the bench headline, completing the
    # 24-query scale table.
    "q1_pricing_summary": {"lineitem"},
    "q5_local_supplier": {"lineitem", "orders", "customer"},
    "moving_stats_flat": {"events"},
    "moving_stats_long_windows": {"events"},
    "moving_stats_nested_json": {"events"},
    "sessionize_gap30m": {"events"},
    "first_crossing_higher": {"events"},
    "scd2_intervals": {"events"},
    "concurrent_active_30m": {"events"},
    "holt_backtest": {"events"},
    "dedup_minhash_signatures": {"documents"},
    "knn_cosine_topk": {"embeddings"},
    "kmeans_clusters": {"embeddings"},
    "poisson_bootstrap": {"events"},
    "kcenter_coreset": {"embeddings"},
    "mmd_rff": {"embeddings"},
    # fourth tier (r12)
    "dedup_clusters": {"documents"},
    "decontamination_containment": {"documents"},
    "item_item_cosine": {"lineitem", "orders"},
    # fifth tier (r13): the wave16 graph queries share triangle_count's
    # co-purchase edge relation but had never been probed (r12 verdict
    # item 3); heaps_law/tukey_fences carry the r13 pin conversions for
    # the token-explode and events-rank pin classes.
    "graph_assortativity": {"lineitem"},
    "rich_club": {"lineitem"},
    "heaps_law": {"documents"},
    "tukey_fences": {"events"},
    # r13 audit: the doc-shingle co-occurrence edge build behind
    # kcore_docs/lpa_communities is a raw shingle self-join (Sigma df^2
    # candidate rows) - the class that killed the pre-PPJoin jaccard
    # walk; never probed before.
    "kcore_docs": {"documents"},
    # r13 audit, second batch: the remaining never-probed PAIR
    # generators - record-linkage blocking (first-chars block key:
    # replica-heavy corpora share prefixes) and sorted-neighborhood
    # candidates (w-bounded by construction - the probe verifies).
    "fs_linkage": {"documents"},
    "snm_candidates": {"documents"},
    # r13 audit, third batch: the permutation-loop test, the decontam
    # pair emitter, and the Arrow mapInPandas decode plumbing.
    "randomization_test": {"events"},
    "decontamination_pairs": {"documents"},
    "multimodal_decode_stub": {"documents"},
    # r13 audit, fourth batch: the iterative co-purchase graph walks
    # (PPR power iteration, BFS frontier expansion) on the
    # triangle-count edge relation.
    "ppr_related_parts": {"lineitem"},
    "bfs_hops": {"lineitem"},
    # r14: dedup-before-graph variants + the exact LPA.
    "kcore_docs_deduped": {"documents"},
    "lpa_communities": {"documents"},
    "lpa_communities_deduped": {"documents"},
}


def build_fixture(
    src: str, out: str, factor: int, tables: set[str] | None = None
) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({factor})) AS r")
    p = STRIDES

    def emit(table: str, select_sql: str) -> None:
        if tables is not None and table not in tables:
            return
        con.execute(
            f"COPY ({select_sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )

    emit(
        "events",
        f"""
        SELECT event_id + r * {p['event_id']} AS event_id,
               ts,
               user_id + r * {p['user_id']} AS user_id,
               event_type, value, props
        FROM '{src}/events.parquet' CROSS JOIN reps
        """,
    )
    emit(
        "lineitem",
        f"""
        SELECT * REPLACE (
            l_orderkey + r * {p['l_orderkey']} AS l_orderkey,
            CASE WHEN r = 0 THEN l_partkey
                 ELSE CAST(hash(l_orderkey * 1000003 + l_partkey * 7919 + r)
                      % {p['n_parts'] * factor} AS BIGINT)
            END AS l_partkey)
        FROM '{src}/lineitem.parquet' CROSS JOIN reps
        """,
    )
    emit(
        "documents",
        f"""
        SELECT doc_id + r * {p['doc_id']} AS doc_id,
               CASE WHEN r = 0 THEN text ELSE array_to_string(
                 list_transform(string_split(text, ' '),
                   (w, i) -> CASE WHEN (i + r) % 7 = 0
                             THEN concat(w, 'x', r) ELSE w END), ' ')
               END AS text,
               lang, source,
               CASE WHEN r = 0 THEN n_chars ELSE length(array_to_string(
                 list_transform(string_split(text, ' '),
                   (w, i) -> CASE WHEN (i + r) % 7 = 0
                             THEN concat(w, 'x', r) ELSE w END), ' '))
               END AS n_chars
        FROM '{src}/documents.parquet' CROSS JOIN reps
        """,
    )
    # o_custkey must scatter over a factor-x customer space, exactly
    # like lineitem's partkeys: the shipped generator grows customers
    # 10x alongside orders (sf0.01: 1500 -> sf0.1: 15000, verified),
    # so keeping replica custkeys unchanged would give every customer
    # factor-x more orders — basket-pair stages (item_item_cosine's
    # per-customer self-join) then grow ~factor^2 as a FIXTURE artifact
    # (caught r12: the first item_item probe ran >10x over its
    # projected time on exactly this shape).  Replica 0 keeps source
    # keys, as everywhere.
    emit(
        "orders",
        f"""
        SELECT * REPLACE (
            o_orderkey + r * {p['l_orderkey']} AS o_orderkey,
            CASE WHEN r = 0 THEN o_custkey
                 ELSE CAST(hash(o_orderkey * 2654435761 + r)
                      % {p['n_cust'] * factor} AS BIGINT)
            END AS o_custkey)
        FROM '{src}/orders.parquet' CROSS JOIN reps
        """,
    )
    # Upscaled customer dimension to match the scattered o_custkey
    # domain (only built when a probe reads the customer TABLE, e.g.
    # q5_local_supplier — a 1x customer next to a factor-x orders
    # would silently drop the join).  Replica custkeys stride by the
    # base count; every scattered o_custkey lands in [0, n_cust*factor).
    emit(
        "customer",
        f"""
        SELECT * REPLACE (c_custkey + r * {p['n_cust']} AS c_custkey)
        FROM '{src}/customer.parquet' CROSS JOIN reps
        """,
    )
    emit(
        "embeddings",
        f"""
        SELECT vec_id + r * {p['vec_id']} AS vec_id,
               CASE WHEN r = 0 THEN embedding ELSE
                 list_transform(embedding, (x, i) -> CAST(
                   x * (1.0 + (CAST(hash(vec_id * 31 + i * 7 + r) % 200
                               AS BIGINT) - 100) / 10000.0) AS FLOAT))
               END AS embedding,
               label
        FROM '{src}/embeddings.parquet' CROSS JOIN reps
        """,
    )
    # Dimensions stay 1x (at real SF they grow too, but remain
    # broadcast-side; the probed costs live in the fact tables).
    # `orders` and `customer` are NOT copied verbatim — a 1x copy next
    # to a factor-x counterpart silently drops most of the join (r12
    # advisor); they exist only when explicitly upscaled via `tables`
    # (PROBE_TABLES lists them for every probe that reads them).
    for t in ("region", "nation", "supplier", "part"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{src}/{t}.parquet", dst)
    con.close()
    # Record what this dir now contains and under which scheme.
    meta_path = f"{out}/_fixture_meta.json"
    meta = {"generation": FIXTURE_GENERATION, "factor": factor, "built": []}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            prev = json.load(fh)
        if (
            prev.get("generation") == FIXTURE_GENERATION
            and prev.get("factor") == factor
        ):
            meta["built"] = prev.get("built", [])
    meta["built"] = sorted(
        set(meta["built"]) | (tables if tables is not None else set())
    )
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="/tmp/scale_probe.json")
    ap.add_argument("--fixture-dir", default=None)
    ap.add_argument(
        "--rebuild",
        action="store_true",
        help="allow wiping *.parquet in a --fixture-dir this script "
        "did not create (no _fixture_meta.json and no scale{N}x name)",
    )
    ap.add_argument(
        "--probes",
        default=None,
        help="comma-separated subset of probes (default: all)",
    )
    args = ap.parse_args()

    selected = args.probes.split(",") if args.probes else None
    if selected is not None:
        unknown = set(selected) - set(PROBE_TABLES)
        if unknown:
            ap.error(f"unknown probes: {sorted(unknown)}")
    # Upscale exactly the tables the probes being run will read — the
    # union over PROBE_TABLES, never a hardcoded list (a default run
    # includes q5_local_supplier, which needs an upscaled orders next
    # to the upscaled lineitem or the join silently drops rows).
    running = selected if selected is not None else list(PROBE_TABLES)
    want = set().union(*(PROBE_TABLES[n] for n in running))

    fixture = args.fixture_dir or f"/tmp/scale{args.factor}x"
    # Never treat the 1x base dataset as a scratch fixture dir — the
    # wipe below would irreversibly delete the data build_fixture then
    # tries to read (r13 advisor, medium).
    if os.path.realpath(fixture) == os.path.realpath(BASE_SF_DIR):
        ap.error(
            f"--fixture-dir {fixture} is the base dataset dir "
            f"({BASE_SF_DIR}); pick a scratch directory"
        )
    # Meta-based reuse: a dir built under an older generation scheme
    # is wiped and rebuilt — file existence alone resurrects
    # stale-keyed tables (r12 advisor).
    meta_path = f"{fixture}/_fixture_meta.json"
    built: set[str] = set()
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if (
            meta.get("generation") == FIXTURE_GENERATION
            and meta.get("factor") == args.factor
        ):
            built = set(meta.get("built", []))
    if not built and os.path.isdir(fixture):
        stale = glob.glob(f"{fixture}/*.parquet")
        # Refuse to wipe a directory this script did not create: only
        # delete when a marker proves ownership (stale generation /
        # factor), the dir name follows the scale{N}x convention this
        # script generates, or the user passed --rebuild explicitly
        # (r13 advisor, medium — a user pointing --fixture-dir at
        # their own parquet dir must not lose it to a stderr notice).
        ours = (
            os.path.exists(meta_path)
            or re.search(r"scale\d+x/?$", fixture) is not None
            or args.rebuild
        )
        if stale and not ours:
            ap.error(
                f"--fixture-dir {fixture} contains {len(stale)} parquet "
                "files but no _fixture_meta.json marker from this "
                "script; refusing to wipe it (pass --rebuild to force, "
                "or pick an empty/scale{N}x-named scratch dir)"
            )
        if stale:
            print(
                f"[fixture] wiping {len(stale)} stale files in {fixture} "
                f"(generation != {FIXTURE_GENERATION})",
                file=sys.stderr,
            )
        for f in stale + glob.glob(f"{fixture}/_fixture_meta.json"):
            os.remove(f)
    if want - built:
        t0 = time.time()
        build_fixture(BASE_SF_DIR, fixture, args.factor, tables=want - built)
        print(f"[fixture] built {sorted(want - built)} in {fixture} "
              f"in {time.time() - t0:.1f}s", file=sys.stderr)

    from lab04_spark_streaming_spark.registry import queries
    from lab04_spark_streaming_spark.session import get_spark

    spark = get_spark(app_name="lab04-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()

    # Warm codegen/JIT once per scale (not measured).
    q["zscore_asof_join"](spark, BASE_SF_DIR).count()

    probes = [(name, lambda s, d, _sc, n=name: q[n](s, d)) for name in PROBES]
    if selected is not None:
        probes = [(n, f) for n, f in probes if n in selected]

    results = {}
    for name, fn in probes:
        times = {}
        for label, sf_dir, scale in (
            ("t1x", BASE_SF_DIR, 1),
            (f"t{args.factor}x", fixture, args.factor),
        ):
            # Partition count scales with the data, the way a real
            # cluster's would (the session docstring's "raise the
            # initial value via config, not code"): a fixed 32 at 100x
            # leaves ~3M-row post-shuffle partitions whose DESER cache
            # allocation OOMs an 8 GiB single-JVM heap (observed on
            # copurchase_lift's pair checkpoint) — a partition-sizing
            # artifact of the one-box probe, not a plan property.
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(min(512, 32 * scale)),
            )
            samples = []
            for _ in range(args.runs):
                t0 = time.time()
                fn(spark, sf_dir, scale).count()
                samples.append(time.time() - t0)
            times[label] = round(sorted(samples)[len(samples) // 2], 3)
        ratio = times[f"t{args.factor}x"] / times["t1x"]
        results[name] = {
            **times,
            "ratio": round(ratio, 2),
            "exponent": round(math.log(ratio) / math.log(args.factor), 2),
        }
        print(json.dumps({name: results[name]}), file=sys.stderr)

    out = {
        "metric": "scale_probe",
        "factor": args.factor,
        "base": BASE_SF_DIR,
        "runs_per_point": args.runs,
        "aggregation": "median",
        "queries": results,
    }
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
