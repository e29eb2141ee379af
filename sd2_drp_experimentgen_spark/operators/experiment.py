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
