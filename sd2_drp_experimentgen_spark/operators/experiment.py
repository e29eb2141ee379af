"""Reference-parity experiment-generation pipeline — the end-to-end
signature computation of the reference (SURVEY §1.1 steps 2-4): stateset
grid -> physical-constraint filter -> seeded plate sample -> well layout
-> mixing chemistry, as ONE declarative Spark plan, hash-checked against
a DuckDB oracle.

Determinism doctrine: the "random" plate sample is a *hash sample* —
rank candidates by md5 of their volume triple (salted with a fixed seed
string) and take the first 96. md5 is identical across engines, so the
sampled plate is reproducible everywhere, which is exactly what the
reference's fixed-seed numpy sampling provided, minus the
engine-specific RNG. At 100 TB hash-sampling is also the distributed
pattern of choice: no global shuffle of the candidate set is needed
beyond the top-96 selection (TakeOrderedAndProject-style), whereas a
seeded RNG sample would require a stable global row order first.

Chemistry model (SURVEY §1.1 step 3): three reagent slots with fixed
stock concentrations; each well's final concentration is the
volume-weighted mixture over its dispensed volumes — computed both
against the dispensed total and against the full well capacity
(solvent top-up), the two numbers the reference's robot files carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.helpers import _round_halfup, sql_r
from ..plans.registry import register

GRID_STEP = 50
GRID_MAX = 500
WELL_CAP_UL = 500
PLATE_WELLS = 96
SEED_SALT = "plate-seed-42"

# Stock concentrations (mol/L) for the three reagent slots.
STOCK_CONC = (2.0, 0.5, 1.0)


@register(
    "q_gen_experiment_pipeline",
    oracle=f"""
    WITH g AS (SELECT x * {GRID_STEP} AS v FROM generate_series(0, {GRID_MAX // GRID_STEP}) t(x)),
    candidates AS (
      SELECT a.v AS v1, b.v AS v2, c.v AS v3
      FROM g a, g b, g c
      WHERE a.v + b.v + c.v <= {WELL_CAP_UL} AND a.v + b.v + c.v > 0
    ),
    sampled AS (
      SELECT v1, v2, v3,
             row_number() OVER (
               ORDER BY md5('{SEED_SALT}' || '-' || v1 || '-' || v2 || '-' || v3),
                        v1, v2, v3
             ) AS rn
      FROM candidates
      QUALIFY rn <= {PLATE_WELLS}
    )
    SELECT
      chr(65 + CAST(floor((rn - 1) / 12) AS INT))
        || CAST((rn - 1) % 12 + 1 AS VARCHAR) AS well,
      v1, v2, v3,
      CAST(v1 + v2 + v3 AS BIGINT) AS total_ul,
      {sql_r(f"(v1 * {STOCK_CONC[0]} + v2 * {STOCK_CONC[1]} + v3 * {STOCK_CONC[2]})"
             f" / (v1 + v2 + v3)")} AS conc_dispensed,
      {sql_r(f"(v1 * {STOCK_CONC[0]} + v2 * {STOCK_CONC[1]} + v3 * {STOCK_CONC[2]})"
             f" / {WELL_CAP_UL}")} AS conc_in_well
    FROM sampled
    """,
    tier="P0",
    doc="The reference pipeline end-to-end in one plan: enumerate the "
    "volume-grid stateset, apply the total-volume constraint, take a "
    "deterministic 96-well hash sample (md5-ranked, seed-salted), lay "
    "out plate labels A1..H12, and compute per-well mixing chemistry "
    "(volume-weighted molarity vs dispensed total and vs well "
    "capacity). Grid generation is distributed (spark.range cross "
    "joins), the constraint filters before any shuffle, and the only "
    "ordered step is the tiny top-96 selection.",
)
def q_gen_experiment_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = spark.range(0, GRID_MAX // GRID_STEP + 1).select(
        (F.col("id") * GRID_STEP).alias("v")
    )
    g1 = grid.select(F.col("v").alias("v1"))
    g2 = grid.select(F.col("v").alias("v2"))
    g3 = grid.select(F.col("v").alias("v3"))
    total = F.col("v1") + F.col("v2") + F.col("v3")
    candidates = (
        g1.crossJoin(g2)
        .crossJoin(g3)
        .where((total <= WELL_CAP_UL) & (total > 0))
    )

    sample_key = F.md5(
        F.concat_ws("-", F.lit(SEED_SALT), F.col("v1"), F.col("v2"), F.col("v3"))
    )
    rn = F.row_number().over(
        Window.orderBy(sample_key, F.col("v1"), F.col("v2"), F.col("v3"))
    )
    sampled = candidates.withColumn("rn", rn).where(F.col("rn") <= PLATE_WELLS)

    well = F.concat(
        F.char(F.lit(65) + F.floor((F.col("rn") - 1) / 12).cast("int")),
        ((F.col("rn") - 1) % 12 + 1).cast("string"),
    )
    mol = (
        F.col("v1") * STOCK_CONC[0]
        + F.col("v2") * STOCK_CONC[1]
        + F.col("v3") * STOCK_CONC[2]
    )
    return sampled.select(
        well.alias("well"),
        "v1",
        "v2",
        "v3",
        total.alias("total_ul"),
        _round_halfup(mol / total, 4).alias("conc_dispensed"),
        _round_halfup(mol / WELL_CAP_UL, 4).alias("conc_in_well"),
    )


LAYOUT_SAMPLES = 384           # 4 full plates
LAYOUT_PLATES = LAYOUT_SAMPLES // PLATE_WELLS
LAYOUT_SALT = "layout-seed-7"  # stratum-shuffle salt
LAYOUT_SALT2 = "well-seed-11"  # within-plate shuffle salt


@register(
    "q_gen_randomized_plate_layout",
    oracle=f"""
    WITH top AS (
      SELECT o_orderkey, o_orderpriority
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT {LAYOUT_SAMPLES}
    ),
    strat AS (
      SELECT o_orderkey, o_orderpriority,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY md5('{LAYOUT_SALT}-' || o_orderkey), o_orderkey
             ) AS rt
      FROM top
    ),
    slotted AS (
      SELECT o_orderkey, o_orderpriority,
             row_number() OVER (
               ORDER BY rt, o_orderpriority, o_orderkey
             ) AS slot
      FROM strat
    ),
    placed AS (
      SELECT o_orderkey, o_orderpriority,
             CAST((slot - 1) // {PLATE_WELLS} AS BIGINT) AS plate_id,
             row_number() OVER (
               PARTITION BY (slot - 1) // {PLATE_WELLS}
               ORDER BY md5('{LAYOUT_SALT2}-' || o_orderkey), o_orderkey
             ) AS ws
      FROM slotted
    )
    SELECT o_orderkey, o_orderpriority, plate_id,
           chr(65 + CAST(floor((ws - 1) / 12) AS INT))
             || CAST((ws - 1) % 12 + 1 AS VARCHAR) AS well,
           CAST(count(*) OVER (PARTITION BY plate_id, o_orderpriority)
                AS BIGINT) AS n_tier_on_plate
    FROM placed
    """,
    tier="P1",
    doc="Block-randomized plate layout — the experiment-design step "
    "between sample selection and robot dispatch: assign the top-384 "
    "samples to 4 plates of 96 wells so that (a) treatment strata "
    "(o_orderpriority) spread EVENLY across plates — plate effects "
    "must not confound treatment effects — and (b) positions WITHIN "
    "a plate are shuffled — row/column gradients (edge evaporation, "
    "thermal) must not correlate with anything. Both randomizations "
    "are seed-salted md5 hash orders (the q_gen_experiment_pipeline "
    "determinism doctrine: cross-engine reproducible, no RNG state, "
    "no global pre-sort at scale). Mechanism: per-stratum hash rank "
    "rt -> interleave strata by (rt, stratum) into global slots -> "
    "plates cut every 96 slots (exactly full plates), then an "
    "independent within-plate hash shuffle picks the well. The "
    "n_tier_on_plate companion rides in the hash, so the ±1 stratum "
    "balance is DATA the oracle pins, not a claim. Windows: the "
    "stratum rank and plate shuffle are PARTITIONED; the one global "
    "window orders the 384 sampled rows (bounded by construction — "
    "allowlisted with the q_wellplate_labels argument). At scale "
    "(thousands of plates) the same plan holds: the bounded sample "
    "is per-campaign, and every unbounded step is partitioned.",
)
def q_gen_randomized_plate_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import well_label
    from ..sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    top = (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(LAYOUT_SAMPLES)
        .drop("o_totalprice")
    )
    h1 = F.md5(F.concat_ws("-", F.lit(LAYOUT_SALT), F.col("o_orderkey")))
    rt = F.row_number().over(
        Window.partitionBy("o_orderpriority").orderBy(h1, F.col("o_orderkey"))
    )
    strat = top.withColumn("rt", rt)
    slot = F.row_number().over(
        Window.orderBy("rt", "o_orderpriority", "o_orderkey")
    )
    slotted = strat.withColumn("slot", slot)
    plate = ((F.col("slot") - 1) / PLATE_WELLS).cast("int")
    h2 = F.md5(F.concat_ws("-", F.lit(LAYOUT_SALT2), F.col("o_orderkey")))
    placed = slotted.withColumn("plate_id", plate.cast("long")).withColumn(
        "ws",
        F.row_number().over(
            Window.partitionBy("plate_id").orderBy(h2, F.col("o_orderkey"))
        ),
    )
    return placed.select(
        "o_orderkey",
        "o_orderpriority",
        "plate_id",
        well_label(F.col("ws") - 1).alias("well"),
        F.count(F.lit(1))
        .over(Window.partitionBy("plate_id", "o_orderpriority"))
        .cast("long")
        .alias("n_tier_on_plate"),
    )


DOE_FACTORS = 4  # 2-level factors; half fraction via I = ABCD


@register(
    "q_gen_doe_fractional",
    oracle=f"""
    WITH runs AS (
      SELECT x AS run_id,
             ((x // 1) % 2) * 2 - 1 AS f1,
             ((x // 2) % 2) * 2 - 1 AS f2,
             ((x // 4) % 2) * 2 - 1 AS f3,
             ((x // 8) % 2) * 2 - 1 AS f4
      FROM generate_series(0, {2 ** DOE_FACTORS - 1}) t(x)
    ),
    frac AS (
      SELECT * FROM runs WHERE f1 * f2 * f3 * f4 = 1
    ),
    audit AS (
      SELECT CAST(count(*) AS BIGINT) AS n_runs,
             CAST(greatest(
               abs(sum(f1)), abs(sum(f2)), abs(sum(f3)), abs(sum(f4)),
               abs(sum(f1*f2)), abs(sum(f1*f3)), abs(sum(f1*f4)),
               abs(sum(f2*f3)), abs(sum(f2*f4)), abs(sum(f3*f4))
             ) AS BIGINT) AS max_imbalance,
             CAST(sum(f1*f2*f3*f4) AS BIGINT) AS defining_word_sum
      FROM frac
    )
    SELECT CAST(f.run_id AS BIGINT) AS run_id,
           CAST(f.f1 AS BIGINT) AS f1, CAST(f.f2 AS BIGINT) AS f2,
           CAST(f.f3 AS BIGINT) AS f3, CAST(f.f4 AS BIGINT) AS f4,
           a.n_runs, a.max_imbalance, a.defining_word_sum
    FROM frac f CROSS JOIN audit a
    """,
    tier="P1",
    doc="Fractional-factorial design generation — the DOE counterpart "
    "of the full-grid stateset: a 2^(4-1) resolution-IV half "
    "fraction, generated by enumerating the full 2^4 run space from "
    "spark.range bit-decomposition and keeping the runs satisfying "
    "the defining relation I = ABCD (f1*f2*f3*f4 = +1). The audit "
    "companions make the design's statistical properties DATA in the "
    "hash: max_imbalance = 0 proves every main effect is balanced "
    "AND every factor pair orthogonal over the fraction (the 10 "
    "sums), while defining_word_sum = n_runs (= 8) witnesses the "
    "intended aliasing — ABCD confounds with the intercept, exactly "
    "what a half fraction trades away. All quantities are exact "
    "integers; the 1-row audit attaches by broadcast cross join. At "
    "scale (k factors -> 2^k runs) generation stays a distributed "
    "range + bit projection with the parity filter applied before "
    "any shuffle, and the audits are map-side partial sums — the "
    "same plan at 2^40 runs.",
)
def q_gen_doe_fractional(spark: SparkSession, sf_dir: str) -> DataFrame:
    runs = spark.range(2 ** DOE_FACTORS).select(
        F.col("id").alias("run_id"),
        *[
            (((F.col("id") / (2 ** i)).cast("long") % 2) * 2 - 1)
            .cast("long")
            .alias(f"f{i + 1}")
            for i in range(DOE_FACTORS)
        ],
    )
    frac = runs.where(
        F.col("f1") * F.col("f2") * F.col("f3") * F.col("f4") == 1
    )
    pair_sums = [
        F.abs(F.sum(F.col(f"f{i}") * F.col(f"f{j}")))
        for i in range(1, DOE_FACTORS + 1)
        for j in range(i + 1, DOE_FACTORS + 1)
    ]
    main_sums = [
        F.abs(F.sum(F.col(f"f{i}"))) for i in range(1, DOE_FACTORS + 1)
    ]
    audit = frac.agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.greatest(*main_sums, *pair_sums).cast("long").alias("max_imbalance"),
        F.sum(
            F.col("f1") * F.col("f2") * F.col("f3") * F.col("f4")
        )
        .cast("long")
        .alias("defining_word_sum"),
    )
    return frac.crossJoin(F.broadcast(audit)).select(
        "run_id", "f1", "f2", "f3", "f4",
        "n_runs", "max_imbalance", "defining_word_sum",
    )
