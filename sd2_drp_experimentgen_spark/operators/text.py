"""Text / dedup pipeline operators — SURVEY §2.8 (LLM-data-pipeline
extensions over the ``documents`` table).

Scale notes: exact dedup is a hash groupBy on the text (at 100 TB,
group on a content hash — xxhash64(text) — so the shuffle moves 8-byte
keys, not document bodies; survivor selection via min(doc_id) keeps the
result deterministic, never dropDuplicates). Token explode fans out
rows but the follow-up count aggregates map-side before shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "q_dedup_exact_docs",
    oracle="""
    SELECT min(doc_id) AS survivor_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY text
    """,
    tier="P0",
    doc="Exact dedup on text: deterministic survivor = min(doc_id) per "
    "distinct text + copy count. Emits every group (sf<=0.01 has zero "
    "duplicate texts, so a dups-only output would be trivially empty). "
    "At 100 TB: group on xxhash64(text) first, verify within hash "
    "buckets, so full documents never shuffle.",
)
def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("survivor_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("survivor_id", "n_copies")


@register(
    "q_text_tokenize_counts",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
    tier="P0",
    doc="Whitespace tokenize + top-20 token counts (desc, token asc "
    "tiebreak). explode fans out, count aggregates with map-side "
    "partials, top-20 via TakeOrderedAndProject.",
)
def q_text_tokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )
