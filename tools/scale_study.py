"""Empirical scaling study — the "would it survive 10x/30x?" evidence.

Builds enlarged fixture copies inside the repo's .scratch (facts
replicated k-fold with shifted unique keys so joins stay valid;
dimensions copied unscaled), re-runs representative operators from the
registry at each scale, and DuckDB-verifies a subset at the largest
scale so correctness is proven, not assumed, off the fixture sizes.

    python tools/scale_study.py [--reps 8 32] [--verify]

Replication scheme (deterministic, join-preserving):
  orders   : o_orderkey += rep * 10^9       (o_custkey unchanged)
  lineitem : l_orderkey += rep * 10^9       (follows orders)
  events   : event_id   += rep * 10^9, ts += rep seconds
  other    : copied as-is (dimension semantics unchanged; each
             customer simply has k-fold history, which is exactly how
             a fixture grows into a production table)
Documents/embeddings are copied unscaled: replicating identical texts
k-fold would inflate every near-dup pair count quadratically — a
different workload, not a bigger one.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from sd2_drp_experimentgen_spark.plans import all_specs  # noqa: E402
from sd2_drp_experimentgen_spark.schemas import TABLE_NAMES  # noqa: E402
from sd2_drp_experimentgen_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
KEY_STRIDE = 10**9

# Representative heavy operators: scan-agg, fact-fact join, as-of,
# interval self-join, windows, sessionization, exact dedup path.
STUDY_QUERIES = [
    "q_agg_groupby_q1",
    "q_join_multiway_topk",
    "q_win_running",
    "q_join_asof",
    "q_join_interval",
    "q_stream_session_30m",
    "q_stream_tumbling_1h",
    "q_agg_window_distinct",
]

VERIFY_QUERIES = ["q_agg_groupby_q1", "q_win_running", "q_stream_tumbling_1h"]


def scaled_dir(rep: int) -> str:
    root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".scratch", "scale"
    )
    return os.path.abspath(os.path.join(root, f"x{rep}"))


def build(spark, rep: int) -> str:
    out = scaled_dir(rep)
    marker = os.path.join(out, "_BUILT")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    reps = spark.range(rep).select(F.col("id").alias("rep"))
    for t in TABLE_NAMES:
        src = f"{BASE_SF}/{t}.parquet"
        dst = os.path.join(out, f"{t}.parquet")
        df = spark.read.parquet(src)
        if t == "orders":
            df = df.crossJoin(F.broadcast(reps)).withColumn(
                "o_orderkey",
                F.col("o_orderkey") + F.col("rep") * KEY_STRIDE,
            ).drop("rep")
        elif t == "lineitem":
            df = df.crossJoin(F.broadcast(reps)).withColumn(
                "l_orderkey",
                F.col("l_orderkey") + F.col("rep") * KEY_STRIDE,
            ).drop("rep")
        elif t == "events":
            df = (
                df.crossJoin(F.broadcast(reps))
                .withColumn(
                    "event_id", F.col("event_id") + F.col("rep") * KEY_STRIDE
                )
                .withColumn(
                    "ts",
                    F.timestamp_micros(
                        F.unix_micros(F.col("ts").cast("timestamp"))
                        + F.col("rep") * 1_000_000
                    ).cast("timestamp_ntz"),
                )
                .drop("rep")
            )
        df.write.mode("overwrite").parquet(dst)
    open(marker, "w").write("ok")
    return out


def time_query(spark, name: str, sf_dir: str, runs: int = 2) -> float:
    fn = all_specs()[name].fn
    fn(spark, sf_dir).collect()  # warm-up
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", nargs="*", type=int, default=[8, 32])
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="sd2drp-scale-study", shuffle_partitions=32)
    result: dict = {"base": {}, "scales": {}}
    for q in STUDY_QUERIES:
        result["base"][q] = time_query(spark, q, BASE_SF)
        print(f"x1   {q}: {result['base'][q]}s", flush=True)

    for rep in args.reps:
        d = build(spark, rep)
        row = {}
        for q in STUDY_QUERIES:
            row[q] = time_query(spark, q, d)
            ratio = round(row[q] / max(result["base"][q], 1e-9), 1)
            print(f"x{rep:<3} {q}: {row[q]}s ({ratio}x time at {rep}x data)",
                  flush=True)
        result["scales"][rep] = row

        if args.verify and rep == max(args.reps):
            from tools.verify_local import compare, duck_connect

            con = duck_connect(d)
            for q in VERIFY_QUERIES:
                spec = all_specs()[q]
                ok, msg = compare(q, spec.fn(spark, d), con.execute(spec.oracle))
                print(f"VERIFY x{rep} {q}: {'PASS' if ok else 'FAIL'} {msg}",
                      flush=True)
                if not ok:
                    return 1

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
