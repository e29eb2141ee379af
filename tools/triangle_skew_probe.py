"""Triangle-orientation skew probe (VERDICT r11 item 6).

The r11 study measured degree orientation on the FIXTURE pair graph
(max degree 221) at only -9% wedges and kept the simpler id form,
with the caveat that web-scale skew changes the answer. This probe
measures WHERE: a deterministic synthetic corpus with a power-law-ish
hub — node 0 adjacent to H background nodes — drives hub degree up
one decade per rung and times both orientations end-to-end
(per-node-count materialization). The id form orients edges low->high
id, so a LOW-id hub enumerates C(H, 2) wedges (the worst case); the
degree form orients toward the higher (degree, id) order, giving the
hub forward-degree ~0.

The measured crossover sets graph.TRI_ID_HUB_WEDGE_CAP; SCALE.md round 12
records the table. No RNG anywhere: background edges are the
deterministic 3-out lattice (i, i+1), (i, i+2), (i, i+7), which
contains real triangles so the close join does work.

Run:
    python tools/triangle_skew_probe.py [--n 200000] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

HUB_RUNGS = (0, 1_024, 4_096, 16_384, 65_536)
LATTICE_STEPS = (1, 2, 7)


def synth_edges(spark, n: int, hub: int) -> DataFrame:
    """(id_lo, id_hi) with id_lo < id_hi: 3-out lattice over n nodes
    plus node 0 -> 1..hub. Distinct-safe: lattice edges from node 0
    (0->1, 0->2, 0->7) overlap the hub range, so a final distinct
    dedups; the hub node keeps the LOWEST id, the id form's worst
    case by construction."""
    base = spark.range(n).select(F.col("id").alias("id_lo"))
    lattice = (
        base.select(
            "id_lo",
            F.explode(
                F.array(*[F.col("id_lo") + s for s in LATTICE_STEPS])
            ).alias("id_hi"),
        )
        .where(F.col("id_hi") < n)
    )
    if hub <= 0:
        return lattice.distinct()
    hub_edges = (
        spark.range(1, min(hub, n - 1) + 1)
        .select(F.lit(0).cast("long").alias("id_lo"), F.col("id").alias("id_hi"))
    )
    return lattice.unionAll(hub_edges).distinct()


def wedge_volume(e: DataFrame, oriented: str) -> int:
    """Total wedge count sum C(fwd_deg, 2) under either orientation.
    The degree orientation comes from the OPERATOR's own
    degree_oriented_edges (r12 review: a probe-local copy could
    silently measure a different orientation than the one that ships,
    making TRI_ID_HUB_WEDGE_CAP describe nothing)."""
    if oriented == "id":
        fwd = e.groupBy("id_lo").agg(F.count(F.lit(1)).alias("n"))
    else:
        from sd2_drp_experimentgen_spark.operators.graph import (
            degree_oriented_edges,
        )

        fwd = (
            degree_oriented_edges(e)
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    return fwd.agg(F.sum(F.expr("n * (n - 1) div 2"))).first()[0] or 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--hubs",
        type=lambda s: tuple(int(x) for x in s.split(",")),
        default=HUB_RUNGS,
        help="comma-separated hub-degree rungs (partial sweeps survive "
        "a wall-clock budget; each rung prints its row immediately)",
    )
    args = ap.parse_args()

    from sd2_drp_experimentgen_spark.operators.graph import (
        _tri_counts_degree_oriented,
        _tri_counts_id_oriented,
    )
    from sd2_drp_experimentgen_spark.session import get_spark

    spark = get_spark(app_name="tri-skew-probe", shuffle_partitions=32)
    out = []
    for hub in args.hubs:
        e = synth_edges(spark, args.n, hub).persist()
        n_edges = e.count()
        row = {
            "hub_deg": hub,
            "edges": n_edges,
            "wedges_id": wedge_volume(e, "id"),
            "wedges_deg": wedge_volume(e, "deg"),
        }
        for label, fn in (
            ("id", _tri_counts_id_oriented),
            ("deg", _tri_counts_degree_oriented),
        ):
            # correctness cross-check at every rung: both orientations
            # must agree on total triangle participation
            tot = fn(e).agg(
                F.sum("n_triangles").alias("s"), F.count(F.lit(1)).alias("k")
            ).first()
            row[f"tri_sum_{label}"], row[f"nodes_{label}"] = tot["s"], tot["k"]
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn(e).count()
                best = min(best, time.perf_counter() - t0)
            row[f"wall_{label}_s"] = round(best, 2)
        assert row["tri_sum_id"] == row["tri_sum_deg"], row
        assert row["nodes_id"] == row["nodes_deg"], row
        e.unpersist()
        print(json.dumps(row), flush=True)
        out.append(row)
    print(json.dumps({"probe": "triangle_skew", "n": args.n, "rungs": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
