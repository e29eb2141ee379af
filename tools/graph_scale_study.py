"""Graph-family scaling study — iterative joins a decade (or two) up
(VERDICT r10 item 5: the last unmeasured family).

Iterative-join workloads are where shuffle amplification hides: an
edge list that re-shuffles every round, a frontier that accidentally
densifies, a wedge join whose fan-out breaks with a hub. This study
drives the four iterative/graph rungs x8..x64 with structure-
preserving growth and cross-engine verification at scale, mirroring
the vec/dedup study protocol (SCALE.md rounds 9-10).

Two growth transforms, each preserving the property the algorithm's
round count depends on:

* **Document-graph rungs** (components, cluster stats, triangles)
  reuse tools/dedup_scale_study.replicate_documents: replica r
  suffixes every token with ``_r<r>`` and shifts doc_id, so the
  J>=0.6 pair graph becomes k disjoint copies of the base graph —
  component sizes, diameters, and triangle structure are IDENTICAL
  per replica. The honest claims: components/triangles k-fold
  (linear), min-label propagation converges in the SAME number of
  rounds at every k (diameter is a per-component property), wall
  ~k-fold.

* **Bipartite-graph rungs** (pagerank, bfs) get replicated
  orders+lineitem with per-replica key offsets (custkey +r*1e5,
  suppkey +r*1e4, orderkey +r*1e6): k disjoint copies of the
  customer<->supplier graph. PageRank's init mass PR_SCALE//n shrinks
  with n — per-node values CHANGE with k, which is exactly why the
  cross-engine verify runs on the scaled fixture, not a closed form.
  BFS seeds (node < 10) exist only in replica 0, so the reached set
  stays CONSTANT while the graph grows k-fold — the documented claim
  "per-round shuffle volume is bounded by the reached set, not the
  graph" becomes directly falsifiable: BFS wall must grow far
  sub-linearly.

    python tools/graph_scale_study.py --reps 8 32      [--verify]
    python tools/graph_scale_study.py --rungs q_graph_pagerank --reps 64

``--verify`` cross-checks each rung against its registered DuckDB
oracle AT THE LARGEST BUILT SCALE via the driver-faithful compare
(order-insensitive bit-exact values), with per-rung rep caps where the
oracle side (recursive CTE closure) outgrows DuckDB's single box.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dedup_scale_study import (  # noqa: E402
    build as build_docs,  # replica-distinct documents corpus
)
from sd2_drp_experimentgen_spark.plans import all_specs  # noqa: E402
from sd2_drp_experimentgen_spark.schemas import TABLE_NAMES  # noqa: E402
from sd2_drp_experimentgen_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
CUST_STRIDE = 100_000  # max o_custkey at sf0.1 is 14 999
SUPP_STRIDE = 10_000  # max l_suppkey at sf0.1 is 999
ORDER_STRIDE = 1_000_000  # max orderkey at sf0.1 is 149 999

DOC_RUNGS = [
    "q_dedup_components",
    "q_dedup_cluster_stats",
    "q_graph_triangle_count",
]
GRAPH_RUNGS = [
    "q_graph_pagerank",
    "q_graph_bfs_hops",
]

# Largest rep at which the full cross-engine compare stays tractable
# PER RUNG (the cap bounds the VERIFY HARNESS, not the engine — same
# protocol note as dedup_scale_study.VERIFY_REP_CAP). The recursive-
# CTE closure oracles are quadratic-ish in DuckDB per component and
# the compare collects both full outputs; measured caps land below.
VERIFY_REP_CAP: dict[str, int] = {}


def scaled_graph_dir(rep: int) -> str:
    root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".scratch",
        "scale_graph",
    )
    return os.path.abspath(os.path.join(root, f"x{rep}"))


def replicate_bipartite(spark, df, table: str, rep: int):
    """rep disjoint copies of the orders/lineitem tables with every
    graph-relevant key shifted into a per-replica namespace."""
    reps = spark.range(rep).select(F.col("id").alias("rep"))
    out = df.crossJoin(F.broadcast(reps))
    if table == "orders":
        out = out.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("rep") * ORDER_STRIDE
        ).withColumn(
            "o_custkey", F.col("o_custkey") + F.col("rep") * CUST_STRIDE
        )
    else:  # lineitem
        out = out.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("rep") * ORDER_STRIDE
        ).withColumn(
            "l_suppkey", F.col("l_suppkey") + F.col("rep") * SUPP_STRIDE
        )
    return out.drop("rep")


def build_graph(spark, rep: int) -> str:
    out = scaled_graph_dir(rep)
    marker = os.path.join(out, "_BUILT")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in TABLE_NAMES:
        df = spark.read.parquet(f"{BASE_SF}/{t}.parquet")
        if t in ("orders", "lineitem"):
            df = replicate_bipartite(spark, df, t, rep)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    open(marker, "w").write("ok")
    return out


def _drop_checkpoints(spark) -> None:
    """Release localCheckpoint blocks from the previous invocation.

    The iterative rungs localCheckpoint per-round state; the blocks are
    freed by the ContextCleaner only after the Python references are
    GC'd. Back-to-back x32 invocations in one 16g JVM OOM'd on the
    accumulation (first x32 sweep of this study), so the harness forces
    the collection between runs — a cluster driver would never hold
    three runs' worth of a study loop."""
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()


def run_rung(spark, name: str, sf_dir: str, runs: int = 2):
    from sd2_drp_experimentgen_spark.functions.helpers import (
        release_persisted,
    )
    from sd2_drp_experimentgen_spark.operators import graph as graph_mod

    fn = all_specs()[name].fn
    rows = fn(spark, sf_dir).count()  # warm-up
    release_persisted()
    _drop_checkpoints(spark)
    best, rounds = float("inf"), None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
        release_persisted()
        _drop_checkpoints(spark)
        if name == "q_dedup_components":
            rounds = graph_mod.CC_ROUNDS_LAST
    return round(best, 3), rows, rounds


def verify_rung(spark, name: str, sf_dir: str) -> bool:
    import duckdb

    from verify_local import compare

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    spec = all_specs()[name]
    t0 = time.perf_counter()
    ok = compare(name, spec.fn(spark, sf_dir), con.execute(spec.oracle))[0]
    print(f"  verify {name}: {'PASS' if ok else 'FAIL'} "
          f"({time.perf_counter() - t0:.1f}s)")
    from sd2_drp_experimentgen_spark.functions.helpers import (
        release_persisted,
    )

    release_persisted()
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", nargs="*", type=int, default=[8, 32])
    ap.add_argument("--rungs", nargs="*", default=DOC_RUNGS + GRAPH_RUNGS)
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    # The decade-up runs a cluster-sized workload inside ONE JVM; give
    # the study session real heap (overridable) — 16g held to x8 but
    # OOM'd mid-x32 on execution memory + checkpoint-block carryover.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    results: dict[str, dict] = {}
    scales = [1] + [r for r in args.reps if r != 1]
    for rep in scales:
        # ONE SESSION PER SCALE: a single long session accumulated
        # checkpoint/broadcast blocks across rungs until even 48g hit
        # GCLocker exhaustion mid-x32, and the thrash inflated walls
        # 2x before dying (first x32 sweep) — while every rung passes
        # alone in a fresh 24g session. The fleet-driver analogue is a
        # driver per job, which is also what bench.py and the driver
        # harness do.
        spark = get_spark(
            app_name=f"graph-scale-study-x{rep}", shuffle_partitions=32
        )
        doc_dir = BASE_SF if rep == 1 else None
        graph_dir = BASE_SF if rep == 1 else None
        for name in args.rungs:
            is_doc = name in DOC_RUNGS
            if rep != 1:
                if is_doc and doc_dir is None:
                    doc_dir = build_docs(spark, rep)
                if not is_doc and graph_dir is None:
                    graph_dir = build_graph(spark, rep)
            sf_dir = doc_dir if is_doc else graph_dir
            wall, rows, rounds = run_rung(spark, name, sf_dir, args.runs)
            results.setdefault(name, {})[f"x{rep}"] = {
                "wall_s": wall,
                "rows": rows,
                **({"cc_rounds": rounds} if rounds is not None else {}),
            }
            extra = f" rounds={rounds}" if rounds is not None else ""
            print(f"x{rep} {name}: {wall}s rows={rows}{extra}", flush=True)
        spark.stop()

    if args.verify:
        spark = get_spark(
            app_name="graph-scale-verify", shuffle_partitions=32
        )
        for name in args.rungs:
            cap = VERIFY_REP_CAP.get(name)
            vrep = max(r for r in scales if cap is None or r <= cap)
            sf_dir = (
                BASE_SF if vrep == 1
                else (build_docs(spark, vrep) if name in DOC_RUNGS
                      else build_graph(spark, vrep))
            )
            print(f"verify at x{vrep}:")
            ok = verify_rung(spark, name, sf_dir)
            results[name]["verify"] = {"rep": vrep, "pass": ok}

    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
