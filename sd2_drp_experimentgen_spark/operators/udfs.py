"""UDF / UDAF / UDTF surface — SURVEY §2.9.

These exist to exercise the JVM<->Python worker boundary (process
boundary #2 in SURVEY §3.3), not because the formulas need Python —
each one's oracle is plain SQL. Performance doctrine: row-at-a-time
Python UDFs (q_udf_python_scalar) are the documented slow path; the
Arrow-vectorized pandas variants are the acceptable one; JVM-native
Column expressions remain the default everywhere else in the engine.

Determinism: rounding happens INSIDE the UDF with the same
floor(x*10^n+0.5)/10^n formula as the oracle, so the Python/numpy libm
and the IEEE rounding agree with DuckDB bit-for-bit.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..functions.helpers import sql_exact_sum, sql_r
from ..plans.registry import register
from ..sources.tables import load_table


def _score(price: float, disc: float) -> float:
    s = math.log(1.0 + price) * (1.0 - disc)
    return math.floor(s * 1e6 + 0.5) / 1e6


@register(
    "q_udf_python_scalar",
    oracle=f"""
    SELECT l_orderkey,
           l_linenumber,
           {sql_r('ln(1 + l_extendedprice) * (1 - l_discount)', 6)} AS score
    FROM lineitem
    """,
    tier="P1",
    doc="Row-at-a-time Python UDF computing ln(1+price)*(1-disc) — "
    "exercises the per-row Python-worker boundary. Deliberately the "
    "slow path; kept off every hot path in the engine.",
)
def q_udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    score_udf = F.udf(_score, DoubleType())
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        score_udf(F.col("l_extendedprice"), F.col("l_discount")).alias("score"),
    )


# NOTE: pandas_udf objects are built inside each query fn — the
# decorator parses its DDL return type against the active session, so
# module-level construction would require a SparkSession at import time.
def _score_vec_udf():
    @pandas_udf("double")
    def _score_vec(price: pd.Series, disc: pd.Series) -> pd.Series:
        import numpy as np

        s = np.log1p(price.to_numpy()) * (1.0 - disc.to_numpy())
        return pd.Series(np.floor(s * 1e6 + 0.5) / 1e6)

    return _score_vec


@register(
    "q_udf_pandas_vectorized",
    oracle=f"""
    SELECT l_orderkey,
           l_linenumber,
           {sql_r('ln(1 + l_extendedprice) * (1 - l_discount)', 6)} AS score
    FROM lineitem
    """,
    tier="P1",
    doc="Same formula as an Arrow-vectorized pandas UDF — the "
    "acceptable Python boundary (~10-100x the row-at-a-time UDF).",
)
def q_udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _score_vec_udf()(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "score"
        ),
    )


def _geomean_udf():
    @pandas_udf("double")
    def _geomean(v: pd.Series) -> float:
        import numpy as np

        x = np.log(v.to_numpy(dtype=np.float64))
        # exact sum absorbs reduction-order noise vs the SQL oracle
        return float(np.exp(math.fsum(x) / len(x)))

    return _geomean


@register(
    "q_udaf_pandas_grouped",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_r('exp(avg(ln(o_totalprice)))')} AS geo_mean_price
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
    tier="P2",
    doc="Grouped-agg pandas UDAF: geometric mean of order totals per "
    "market segment (exp of mean log). fsum inside the UDAF + 4dp "
    "rounding absorb reduction-order noise vs the SQL oracle.",
)
def q_udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(r4(_geomean_udf()(F.col("o_totalprice"))).alias("geo_mean_price"))
    )


@register(
    "q_udtf_split",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
    GROUP BY token
    """,
    tier="P2",
    doc="Python UDTF (Spark 4 @udtf) exploding a delimited string to "
    "rows, lateral-joined in SQL, + token counts. Scale note: for "
    "real pipelines explode() is the JVM-native equivalent; the UDTF "
    "exists to cover the table-function API surface.",
)
def q_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string")
    class SplitWords:
        def eval(self, text: str):
            for tok in text.split(" "):
                yield (tok,)

    spark.udtf.register("udtf_split_words", SplitWords)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("udtf_part")
    return spark.sql(
        """
        SELECT t.token, count(*) AS n
        FROM udtf_part, LATERAL udtf_split_words(p_name) t
        GROUP BY t.token
        """
    )


COGROUP_BUCKETS = 64  # users per python call: ~n_users/64; results are
# bucket-count invariant (each user lives in exactly one bucket), so the
# constant only sizes batches — raise it in production so a bucket's two
# frames stay comfortably in a worker's memory.


@register(
    "q_udf_cogrouped",
    oracle="""
    WITH lo AS (
      SELECT o_custkey AS user_id,
             max(CAST(o_orderdate AS TIMESTAMP)) AS last_dt,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT e.user_id,
           count(*) AS n_events,
           CAST(coalesce(any_value(lo.n_orders), 0) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN lo.last_dt IS NULL OR e.ts > lo.last_dt
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_after_last
    FROM events e LEFT JOIN lo ON lo.user_id = e.user_id
    GROUP BY e.user_id
    """,
    tier="P2",
    doc="Cogrouped-map pandas API (groupBy.cogroup.applyInPandas) — the "
    "custom-join escape hatch: each user's events AND orders arrive as "
    "two aligned pandas frames in one function call, which computes "
    "events after the user's last order (a merge needing both sides in "
    "hand). Hash-checked against the equivalent join+agg SQL. Scale "
    "shape: one co-partitioned shuffle on the key for both inputs, "
    "Arrow-batched transfer, per-key python work.",
)
def q_udf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    # Cogroup on a deterministic user BUCKET, not the raw user_id
    # (r14): one python call per user (~15k calls at sf0.1) spent 95%
    # of its 18.8 s wall in per-call overhead — two pandas frames
    # constructed per user for a 4-int result. Bucketing keeps the
    # cogrouped-map contract (both sides of a key arrive aligned in
    # one call) while the per-user merge runs VECTORIZED pandas inside
    # the bucket: measured 18.8 s -> 0.64 s at sf0.1, output
    # bit-identical (pytest-forced against the per-user form).
    ev = load_events(spark, sf_dir).select("user_id", "ts").withColumn(
        "b", F.pmod(F.col("user_id"), F.lit(COGROUP_BUCKETS))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .withColumn("b", F.pmod(F.col("user_id"), F.lit(COGROUP_BUCKETS)))
    )

    def merge(ev_pdf: pd.DataFrame, ord_pdf: pd.DataFrame) -> pd.DataFrame:
        if ev_pdf.empty:  # emit only users that have events (oracle twin)
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_events": pd.Series(dtype="int64"),
                    "n_orders": pd.Series(dtype="int64"),
                    "n_after_last": pd.Series(dtype="int64"),
                }
            )
        res = (
            ev_pdf.groupby("user_id", sort=False)
            .size()
            .rename("n_events")
            .reset_index()
        )
        if len(ord_pdf):
            og = ord_pdf.groupby("user_id", sort=False)["o_orderdate"].agg(
                ["max", "size"]
            )
            og.columns = ["last_dt", "n_orders"]
            res = res.merge(
                og, left_on="user_id", right_index=True, how="left"
            )
            res["n_orders"] = res["n_orders"].fillna(0).astype("int64")
            last = res.set_index("user_id")["last_dt"]
            ev_last = ev_pdf["user_id"].map(last)
            after = ev_last.isna() | (ev_pdf["ts"] > ev_last)
            n_after = after.groupby(ev_pdf["user_id"]).sum()
            res["n_after_last"] = (
                res["user_id"].map(n_after).astype("int64")
            )
            res = res.drop(columns=["last_dt"])
        else:
            res["n_orders"] = 0
            res["n_after_last"] = res["n_events"]
        res["user_id"] = res["user_id"].astype("int64")
        return res[["user_id", "n_events", "n_orders", "n_after_last"]]

    return (
        ev.groupBy("b")
        .cogroup(orders.groupBy("b"))
        .applyInPandas(
            merge,
            schema="user_id long, n_events long, n_orders long, n_after_last long",
        )
    )


@register(
    "q_udf_arrow_scalar",
    oracle=f"""
    SELECT l_orderkey,
           l_linenumber,
           {sql_r('ln(1 + l_extendedprice) * (1 - l_discount)', 6)} AS score
    FROM lineitem
    """,
    tier="P1",
    doc="Arrow-optimized Python UDF (Spark 4 useArrow=True): the same "
    "per-row function as q_udf_python_scalar but with Arrow batch "
    "serialization across the Python-worker boundary instead of "
    "pickled rows — the drop-in acceleration for existing row UDFs "
    "that can't be rewritten as pandas_udfs. Completes the UDF "
    "execution matrix: row-pickled, row-Arrow, pandas-vectorized, "
    "pandas grouped-agg, UDTF, cogrouped-map.",
)
def q_udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    score_udf = F.udf(_score, DoubleType(), useArrow=True)
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        score_udf(F.col("l_extendedprice"), F.col("l_discount")).alias("score"),
    )


@register(
    "q_udf_map_in_arrow",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           {sql_r('''sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))''')} AS l2_norm
    FROM embeddings
    """,
    tier="P1",
    doc="mapInArrow — the RecordBatch-level Python API one rung below "
    "mapInPandas (no pandas conversion at all; the UDF sees raw "
    "pyarrow batches): per-vector L2 norms computed with numpy over "
    "the Arrow buffers. Rounds with the oracle's half-up formula; "
    "the per-row sequential fold matches the SQL list_sum order so "
    "doubles are bit-identical. Completes the Python execution "
    "matrix's lowest level.",
)
def q_udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def norms(batches):
        import numpy as np

        for batch in batches:
            vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            embs = batch.column("embedding").to_pylist()
            out_norm = []
            out_dim = []
            for e in embs:
                arr = np.asarray(e, dtype=np.float64)
                # sequential left-fold like list_sum/F.aggregate
                acc = 0.0
                for v in arr:
                    acc += v * v
                s = math.sqrt(acc)
                out_norm.append(math.floor(s * 1e4 + 0.5) / 1e4)
                out_dim.append(len(arr))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(vec_ids, type=pa.int64()),
                    pa.array(out_dim, type=pa.int32()),
                    pa.array(out_norm, type=pa.float64()),
                ],
                names=["vec_id", "dim", "l2_norm"],
            )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.mapInArrow(norms, schema="vec_id long, dim int, l2_norm double")


@register(
    "q_pandas_api_groupby",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           {sql_r(sql_exact_sum('o_totalprice'))} AS total,
           {sql_r('max(o_totalprice)')} AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tier="P2",
    doc="Pandas API on Spark (pyspark.pandas): the pandas-syntax "
    "groupby-agg executed as a distributed Spark plan — the migration "
    "path for pandas codebases (same idioms, Catalyst underneath, no "
    "driver materialization; to_spark() hands the lazy frame back to "
    "the native API). Hash-checked against plain SQL, proving the "
    "pandas layer computes exactly what the DataFrame API would.",
)
def q_pandas_api_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.pandas as ps

    from ..functions.helpers import _round_halfup

    psdf = ps.read_parquet(f"{sf_dir}/orders.parquet")
    # exact_sum form through the pandas-API surface (r10): 5 bounded
    # groups over all orders, so the money sum rides exact int64 units
    # instead of float64 (see q_agg_groupby_q1). The pandas layer has
    # no decimal dtype, so the unit sum stays int64 — exact while a
    # group's total is below 2^63 units ≈ $9.2e14 (~sf 2e4); the
    # native-API money pipelines use exact_sum's decimal(38,0) form,
    # which has no such bound.
    psdf = psdf.assign(
        price_units=((psdf["o_totalprice"] * 10000 + 0.5) // 1).astype(
            "int64"
        )
    )
    agg = psdf.groupby("o_orderpriority").agg(
        n=("o_orderkey", "count"),
        total_units=("price_units", "sum"),
        max_price=("o_totalprice", "max"),
    )
    sdf = agg.reset_index().to_spark()
    return sdf.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        _round_halfup(
            F.col("total_units").cast("double") / F.lit(10000.0), 4
        ).alias("total"),
        _round_halfup(F.col("max_price"), 4).alias("max_price"),
    )


@register(
    "q_udf_apply_in_arrow",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tier="P2",
    doc="Grouped applyInArrow (Spark 4): per-group aggregation written "
    "directly against pyarrow RecordBatch compute kernels — no pandas "
    "conversion on either side of the worker boundary. Completes the "
    "Python execution matrix alongside row-UDF, pandas_udf, grouped "
    "pandas UDAF, cogrouped pandas, mapInPandas, and mapInArrow. "
    "Quantities are summed as integer hundredths (per-row round, then "
    "integer sum), so the result is exact and order-independent and "
    "hash-checks against SQL.",
)
def q_udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def per_salted_flag(key: tuple, table: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        cents = pc.cast(
            pc.round(pc.multiply(table["l_quantity"], 100)), pa.int64()
        )
        return pa.table(
            {
                "l_returnflag": [key[0]],
                "n": [table.num_rows],
                "qty_cents": [pc.sum(cents).as_py()],
            }
        )

    # Salted two-stage shape: applyInArrow routes EVERY row of a group
    # to one Python worker, and l_returnflag has only 3 values — at
    # 100 TB that is 3 workers eating the whole table. Grouping on
    # (flag, salt) caps any single Arrow group at ~1/32 of a flag; the
    # integer partials then combine JVM-side (associative sums), same
    # exact answer.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_quantity",
        (F.crc32(F.col("l_orderkey").cast("string")) % 32).alias("salt"),
    )
    partials = li.groupBy("l_returnflag", "salt").applyInArrow(
        lambda key, table: per_salted_flag(key, table.drop(["salt"])),
        schema="l_returnflag string, n long, qty_cents long",
    )
    return partials.groupBy("l_returnflag").agg(
        F.sum("n").alias("n"), F.sum("qty_cents").alias("qty_cents")
    )


@register(
    "q_udtf_arrow_tokens",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
    tier="P2",
    doc="Arrow-optimized Python UDTF (Spark 4.1 arrow_udtf): table in, "
    "table out over raw pyarrow RecordBatches — the vectorized "
    "table-function rung of the Python execution matrix, beside the "
    "row-yield UDTF (q_udtf_split) and the scalar Arrow UDF "
    "(q_udf_arrow_scalar). The UDTF explodes documents to (doc_id, "
    "token) pairs entirely with pyarrow compute kernels "
    "(split_pattern + list_flatten + parent-index take — zero "
    "per-row Python, zero pandas), and the downstream top-20 count "
    "runs as an ordinary Catalyst aggregate over the UDTF's output "
    "relation. At 100 TB the UDTF processes one Arrow batch at a "
    "time per task with bounded memory, and the fan-out never "
    "materializes outside the engine.",
)
def q_udtf_arrow_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udtf

    @arrow_udtf(returnType="doc_id: bigint, token: string")
    class TokenizeArrow:
        def eval(self, batch: "pa.RecordBatch"):
            toks = pc.split_pattern(batch.column(1), " ")
            ids = pc.take(batch.column(0), pc.list_parent_indices(toks))
            yield pa.table({"doc_id": ids, "token": pc.list_flatten(toks)})

    spark.udtf.register("udtf_tokenize_arrow", TokenizeArrow)
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView("v_docs_arrow_udtf")
    return spark.sql(
        """
        SELECT token, count(*) AS n
        FROM udtf_tokenize_arrow(
          TABLE(SELECT doc_id, text FROM v_docs_arrow_udtf))
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 20
        """
    )


@register(
    "q_udf_sql_registered",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
               * (6 - CAST(substr(o_orderpriority, 1, 1) AS BIGINT)))
             AS BIGINT) AS weighted_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
    tier="P2",
    doc="SQL-visible scalar Python UDF (spark.udf.register + useArrow): "
    "the registration surface that makes a Python function callable "
    "from ANY spark.sql text — the path analysts use without touching "
    "the DataFrame API. The UDF multiplies exact cents by an integer "
    "urgency weight parsed from the priority string, so the SQL "
    "oracle reproduces it in closed form and the check is hash-exact. "
    "Arrow serialization keeps the Python boundary batched; the "
    "surrounding plan (scan, groupBy) stays JVM-side — only the "
    "projected expression crosses to Python. At 100 TB a closed-form "
    "expression like this belongs in Column functions (and every "
    "other operator here keeps it there); this op exists to pin the "
    "registration path itself.",
)
def q_udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType

    @F.udf(returnType=LongType(), useArrow=True)
    def weighted_cents(cents: int, prio: str) -> int:
        return cents * (6 - int(prio[0]))

    spark.udf.register("sd2drp_weighted_cents", weighted_cents)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_orders_sqludf"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n,
               sum(sd2drp_weighted_cents(
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
                     o_orderpriority)) AS weighted_cents
        FROM v_orders_sqludf
        GROUP BY o_orderpriority
        """
    )
