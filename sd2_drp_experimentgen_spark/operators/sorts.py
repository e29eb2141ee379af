"""Sorts / limits / top-k — SURVEY §2.6.

Reference analog: sample-N selection and report ordering. Global
ORDER BY + LIMIT plans as TakeOrderedAndProject — each partition keeps
only its local top-k and the driver merges k*partitions rows, so top-k
never materializes a full sort at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.helpers import int_units
from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "q_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tier="P0",
    doc="Global top-25 by totalprice with unique-key tiebreak "
    "(TakeOrderedAndProject — no full sort).",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "q_sort_multikey_nulls",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, count(*) AS n_items
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderkey, n_items, o_totalprice
    FROM orders LEFT JOIN li ON l_orderkey = o_orderkey
    ORDER BY n_items NULLS FIRST, o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tier="P1",
    doc="Multi-key sort over a nullable left-join column with explicit "
    "NULLS FIRST + total-order tiebreak; ~1.7% of orders have no "
    "lineitems so NULL placement decides the LIMIT set.",
)
def q_sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    li_counts = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    return (
        o.join(li_counts, o.o_orderkey == li_counts.l_orderkey, "left")
        .select("o_orderkey", "n_items", "o_totalprice")
        .orderBy(
            F.asc_nulls_first("n_items"),
            F.desc("o_totalprice"),
            F.asc("o_orderkey"),
        )
        .limit(100)
    )


PAGE_SIZE = 100


@register(
    "q_sort_keyset_pagination",
    oracle=f"""
    WITH page3_offset AS (
      SELECT o_orderkey, o_orderdate, o_totalprice
      FROM orders
      ORDER BY o_orderdate, o_orderkey
      LIMIT {PAGE_SIZE} OFFSET {2 * PAGE_SIZE}
    ),
    last_of_page2 AS (
      SELECT o_orderdate AS d, o_orderkey AS k
      FROM orders
      ORDER BY o_orderdate, o_orderkey
      LIMIT 1 OFFSET {2 * PAGE_SIZE - 1}
    ),
    page3_keyset AS (
      SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
      FROM orders o, last_of_page2 p
      WHERE (o.o_orderdate, o.o_orderkey) > (p.d, p.k)
      ORDER BY o.o_orderdate, o.o_orderkey
      LIMIT {PAGE_SIZE}
    )
    SELECT a.o_orderkey,
           CAST(epoch(a.o_orderdate) AS BIGINT) AS order_date_epoch,
           floor(a.o_totalprice * 10000 + 0.5) / 10000 AS total,
           CASE WHEN b.o_orderkey IS NOT NULL THEN 1 ELSE 0 END AS keyset_match
    FROM page3_offset a
    LEFT JOIN page3_keyset b ON a.o_orderkey = b.o_orderkey
    """,
    tier="P2",
    doc="Keyset pagination vs OFFSET — the operational export/API "
    "pattern at scale: page 3 of the order history fetched both ways "
    "over a total order (date, key), with keyset_match proving the "
    "seek-predicate page equals the OFFSET page row-for-row. The "
    "point for 100 TB: OFFSET n scans and discards n rows per page "
    "(quadratic over a full export) while the keyset predicate "
    "'(date, key) > (last_date, last_key)' pushes into the scan and "
    "each page costs one bounded TakeOrdered — the only shape that "
    "survives paging a petabyte table. Total-order tiebreak makes "
    "page boundaries engine-exact.",
)
def q_sort_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import _round_halfup, epoch_seconds

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("timestamp").alias("d"),
        "o_totalprice",
    )
    ordered = o.orderBy("d", "o_orderkey")
    page3_offset = ordered.offset(2 * PAGE_SIZE).limit(PAGE_SIZE)
    last_of_p2 = (
        ordered.offset(2 * PAGE_SIZE - 1)
        .limit(1)
        .select(F.col("d").alias("pd"), F.col("o_orderkey").alias("pk"))
    )
    page3_keyset = (
        o.crossJoin(F.broadcast(last_of_p2))
        .where(
            (F.col("d") > F.col("pd"))
            | ((F.col("d") == F.col("pd")) & (F.col("o_orderkey") > F.col("pk")))
        )
        .orderBy("d", "o_orderkey")
        .limit(PAGE_SIZE)
        .select(F.col("o_orderkey").alias("k2"))
    )
    return (
        page3_offset.join(
            page3_keyset, page3_offset.o_orderkey == page3_keyset.k2, "left"
        )
        .select(
            "o_orderkey",
            epoch_seconds(F.col("d")).alias("order_date_epoch"),
            _round_halfup(F.col("o_totalprice"), 4).alias("total"),
            F.when(F.col("k2").isNotNull(), 1).otherwise(0).alias(
                "keyset_match"
            ),
        )
    )


@register(
    "q_sort_pareto_frontier",
    oracle="""
    WITH pts AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(date_diff('day', DATE '1995-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS days
      FROM orders
    ),
    flagged AS (
      SELECT o_orderkey, cents, days,
             min(days) OVER (ORDER BY cents
                             RANGE BETWEEN 1 FOLLOWING
                                       AND UNBOUNDED FOLLOWING)
               AS best_days_higher,
             min(days) OVER (PARTITION BY cents) AS best_days_same
      FROM pts
    )
    SELECT o_orderkey, cents, days
    FROM flagged
    WHERE (best_days_higher IS NULL OR days < best_days_higher)
      AND days = best_days_same
    """,
    tier="P1",
    doc="Pareto frontier (2-D skyline): the orders no other order "
    "dominates on (maximize price, minimize order date) — the "
    "multi-objective shortlist query behind supplier selection, "
    "experiment-candidate triage, and price/latency tradeoff "
    "curves. In 2-D the skyline reduces to windows, no pairwise "
    "join: a RANGE frame over the price axis (1 FOLLOWING .. "
    "UNBOUNDED = all strictly-higher-priced rows) takes the running "
    "best (min) date — a row survives iff its date beats every "
    "strictly-richer row's best and is the best within its own "
    "price tie-group (ties on both axes are mutually non-dominating "
    "and all kept). Exact integer cents/days make dominance "
    "comparisons bit-deterministic. At 100 TB the skyline is "
    "DECOMPOSABLE: skyline(∪ partitions) = skyline(∪ local "
    "skylines), so each task computes its local frontier (tiny) and "
    "only frontier candidates reach the final window — the same "
    "partial-then-final shape as TakeOrdered, with the RANGE-frame "
    "window as the merge step.",
)
def q_sort_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderkey",
        int_units("o_totalprice", 2).alias("cents"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("long")
        .alias("days"),
    )

    # Phase 1 — LOCAL skyline per Arrow batch (sound pre-filter: a
    # globally non-dominated row is non-dominated in every subset, so
    # filtering each batch to its local frontier can never drop a
    # global-frontier row). This is what makes the operator scale: a
    # naive global RANGE-frame window moves every row to ONE task and
    # measured 432 s at sf0.1; the local pre-filter leaves only
    # frontier-candidate rows (typically tens) for the exact merge.
    def local_frontier(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            cents = pdf["cents"].to_numpy(dtype=np.int64)
            days = pdf["days"].to_numpy(dtype=np.int64)
            order = np.lexsort((days, -cents))  # cents desc, days asc
            c_s, d_s = cents[order], days[order]
            run_min = np.minimum.accumulate(d_s)
            prev_min = np.concatenate(
                ([np.iinfo(np.int64).max], run_min[:-1])
            )
            # rows tying on cents share the SAME strictly-higher-cents
            # bound: prev_min evaluated at the group's FIRST row (all
            # earlier rows there have strictly greater cents)
            grp_start = np.concatenate(([True], c_s[1:] != c_s[:-1]))
            grp_ids = np.cumsum(grp_start) - 1
            first_idx = np.flatnonzero(grp_start)
            bound = prev_min[first_idx][grp_ids]
            # same-cents best days = first day in group (days ascending)
            best_same = d_s[first_idx][grp_ids]
            keep = (d_s < bound) & (d_s == best_same)
            kept = order[keep]
            yield pdf.iloc[kept][["o_orderkey", "cents", "days"]]

    cand = pts.mapInPandas(
        local_frontier, schema="o_orderkey long, cents long, days long"
    )

    # Phase 2 — exact merge over the tiny candidate set: the same
    # dominance rule, expressed with the RANGE frame (correct and cheap
    # at candidate cardinality).
    higher = Window.orderBy("cents").rangeBetween(1, Window.unboundedFollowing)
    same = Window.partitionBy("cents")
    flagged = cand.select(
        "o_orderkey",
        "cents",
        "days",
        F.min("days").over(higher).alias("best_days_higher"),
        F.min("days").over(same).alias("best_days_same"),
    )
    return flagged.where(
        (
            F.col("best_days_higher").isNull()
            | (F.col("days") < F.col("best_days_higher"))
        )
        & (F.col("days") == F.col("best_days_same"))
    ).select("o_orderkey", "cents", "days")
