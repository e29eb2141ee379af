"""Round-15 VERDICT item 3: stage decomposition of
q_graph_triangle_count at sf0.1 — where do its ~4 s actually go?

Times, in one fresh JVM with labelled jobs and noop sinks:
  1. nd_pairs build alone (the shared persisted pair relation —
     released first so the build is paid here)
  2. the hub-wedge skew gate scalar (over the now-persisted pairs)
  3. the wedge+close join and explode/groupBy (over persisted pairs)
  4. the full query from cold (fresh release), for the cross-check

    python tools/r15_triangle_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from sd2_drp_experimentgen_spark.functions.helpers import (
        release_persisted,
    )
    from sd2_drp_experimentgen_spark.operators import graph
    from sd2_drp_experimentgen_spark.session import get_spark

    spark = get_spark(app_name="r15-tri-probe", shuffle_partitions=32)
    sc = spark.sparkContext
    out = {"loadavg": os.getloadavg()}

    # warm the session on an unrelated cheap job
    spark.range(1000000).selectExpr("sum(id)").collect()

    for rep in range(3):
        release_persisted()
        sc.setJobDescription("tri probe: nd_pairs build")
        t0 = time.perf_counter()
        e = graph.nd_pairs(spark, sf_dir)
        noop(e)
        out.setdefault("nd_pairs_build", []).append(
            round(time.perf_counter() - t0, 3)
        )

        sc.setJobDescription("tri probe: hub-wedge gate scalar")
        t0 = time.perf_counter()
        from pyspark.sql import functions as F

        hub = (
            e.groupBy("id_lo")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max(F.expr("n * (n - 1) div 2")).alias("w"))
            .first()[0]
        )
        out.setdefault("gate_scalar", []).append(
            round(time.perf_counter() - t0, 3)
        )

        sc.setJobDescription("tri probe: wedge+close+groupBy")
        t0 = time.perf_counter()
        noop(graph._tri_counts_id_oriented(e))
        out.setdefault("wedge_close", []).append(
            round(time.perf_counter() - t0, 3)
        )
        out["hub_wedges"] = hub

        release_persisted()
        sc.setJobDescription("tri probe: full query cold")
        t0 = time.perf_counter()
        from sd2_drp_experimentgen_spark.plans import all_specs

        noop(all_specs()["q_graph_triangle_count"].fn(spark, sf_dir))
        out.setdefault("full_cold", []).append(
            round(time.perf_counter() - t0, 3)
        )

    out["loadavg_after"] = os.getloadavg()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
