"""Round-15 item 1 (VERDICT r14): like-for-like A/B of the 13
protocol-regressed headliners — r14/r15 HEAD vs the r13 tree
(616aebd, checked out as a worktree) — under the SHIPPED recycle
protocol on BOTH sides.

The r13->r14 PERF comparison crossed a declared protocol change
(single long-lived JVM -> jvm_recycle=9) and the r14 driver bench ran
at loadavg 8+; 11 of the 13 "regressed" queries had no code change.
This tool produces the missing clean signal: identical protocol
(bench.py's warm-up + min-of-3 .collect(), release_persisted inside
the timing loop, fresh subprocess JVM per 9-query segment), both
trees, interleaved rep order (A,B / B,A / A,B) so ambient drift hits
both sides symmetrically, loadavg stamped per rep.

    python tools/r15_ab_headliners.py [--reps 3] [--out FILE] \
        [--tree-b /root/r13_ab]

The child protocol is REIMPLEMENTED here (15 lines) rather than
invoking each tree's bench.py because the r13 tree's bench.py predates
JVM recycling — the point is identical protocol by construction.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REGRESSED_13 = [
    "q_tpch_q11_important_stock",
    "q_tfidf_top_terms",
    "q_tpch_q9_product_profit",
    "q_text_tokenize_counts",
    "q_train_features_wide",
    "q_join_asof",
    "q_win_rank_topn",
    "q_sim_cosine_topk",
    "q_join_interval",
    "q_stream_session_30m",
    "q_dedup_embedding_nn",
    "q_ml_auc_rank",
    "q_mm_corpus_pipeline",
]

SEGMENT_ENV = "SPARK_GRAFT_AB_SEGMENT"
TREE_ENV = "SPARK_GRAFT_AB_TREE"


def child_main() -> None:
    tree = os.environ[TREE_ENV]
    sys.path.insert(0, tree)
    os.chdir(tree)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = json.loads(os.environ[SEGMENT_ENV])

    from sd2_drp_experimentgen_spark.functions.helpers import (
        release_persisted,
    )
    from sd2_drp_experimentgen_spark.plans import all_specs
    from sd2_drp_experimentgen_spark.session import get_spark

    spark = get_spark(app_name="r15-ab", shuffle_partitions=32)
    specs = all_specs()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = specs[name].fn
        spark.sparkContext.setJobDescription(f"ab {name}: warm-up")
        fn(spark, sf_dir).collect()
        release_persisted()
        runs: list[float] = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"ab {name}: timed {i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 4))
            release_persisted()
        out[name] = runs
    print(json.dumps(out))


def run_side(tree: str, names: list[str], segment: int) -> dict[str, list[float]]:
    merged: dict[str, list[float]] = {}
    for i in range(0, len(names), segment):
        seg = names[i : i + segment]
        env = dict(
            os.environ,
            **{SEGMENT_ENV: json.dumps(seg), TREE_ENV: tree},
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env,
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(f"segment {seg[0]}.. failed in {tree}")
        merged.update(json.loads(proc.stdout.strip().splitlines()[-1]))
    return merged


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--segment", type=int, default=9)
    ap.add_argument("--tree-a", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--tree-b", default="/root/r13_ab")
    ap.add_argument("--out", default="plans/r15/ab_headliners.json")
    ap.add_argument("--queries", default=",".join(REGRESSED_13))
    args = ap.parse_args()
    if args.child:
        child_main()
        return

    names = [q for q in args.queries.split(",") if q]
    record: dict = {
        "queries": names,
        "tree_a": args.tree_a,
        "tree_b": args.tree_b,
        "reps": [],
    }
    for rep in range(args.reps):
        order = ["a", "b"] if rep % 2 == 0 else ["b", "a"]
        entry: dict = {"loadavg_before": os.getloadavg(), "order": order}
        for side in order:
            tree = args.tree_a if side == "a" else args.tree_b
            entry[side] = run_side(tree, names, args.segment)
        entry["loadavg_after"] = os.getloadavg()
        record["reps"].append(entry)
        print(json.dumps({"rep": rep, "order": order,
                          "load": entry["loadavg_after"]}))

    summary = {}
    for q in names:
        a = min(min(r["a"][q]) for r in record["reps"])
        b = min(min(r["b"][q]) for r in record["reps"])
        summary[q] = {"head_min": a, "r13_min": b,
                      "head_over_r13": round(a / b, 3) if b else None}
    record["summary"] = summary
    out = args.out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
