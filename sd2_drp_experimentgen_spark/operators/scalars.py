"""Projections, filters, scalar functions — SURVEY §2.2.

Reference analogs: constraint filters on the candidate-experiment
stateset (volume caps), molarity/unit-conversion arithmetic, and the
stateset grid enumeration itself. Everything here is pure Column
expressions inside whole-stage codegen — no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.helpers import exact_sum, r4, sql_exact_sum, sql_r
from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "q_filter_pred_q6",
    oracle=f"""
    SELECT {sql_r(sql_exact_sum('l_extendedprice * l_discount'))} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tier="P0",
    doc="TPC-H Q6 shape: conjunctive range predicate + single aggregate. "
    "Reference analog: physical-constraint filter over the stateset. "
    "ONE global group over an unbounded fact, so the revenue SUM rides "
    "exact_sum (r10 x128 finding; 2dp price x 2dp discount = exact at "
    "scale 4) — a float sum's ulp crosses the 4dp rounding step once "
    "the total reaches ~5e11.",
)
def q_filter_pred_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            r4(
                exact_sum(F.col("l_extendedprice") * F.col("l_discount"))
            ).alias("revenue")
        )
    )


@register(
    "q_filter_in_like_null",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE (p_brand IN ('Brand#3', 'Brand#7', 'Brand#21')
           OR p_name LIKE 'red%')
      AND p_type IS NOT NULL
    """,
    tier="P0",
    doc="IN-list + LIKE prefix + OR + IS NOT NULL selection "
    "(categorical chemical selection).",
)
def q_filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.where(
        (
            F.col("p_brand").isin("Brand#3", "Brand#7", "Brand#21")
            | F.col("p_name").like("red%")
        )
        & F.col("p_type").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@register(
    "q_proj_arith_case",
    oracle=f"""
    SELECT
      l_orderkey,
      l_linenumber,
      {sql_r('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS revenue,
      CASE
        WHEN l_extendedprice > 5000 THEN 'HIGH'
        WHEN l_extendedprice > 1000 THEN 'MID'
        ELSE 'LOW'
      END AS price_tier
    FROM lineitem
    """,
    tier="P0",
    doc="Derived arithmetic columns + CASE WHEN tiers "
    "(molarity / unit-conversion arithmetic analog).",
)
def q_proj_arith_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r4(
            F.col("l_extendedprice")
            * (F.lit(1) - F.col("l_discount"))
            * (F.lit(1) + F.col("l_tax"))
        ).alias("revenue"),
        F.when(F.col("l_extendedprice") > 5000, "HIGH")
        .when(F.col("l_extendedprice") > 1000, "MID")
        .otherwise("LOW")
        .alias("price_tier"),
    )


@register(
    "q_gen_stateset_grid",
    oracle="""
    WITH g AS (SELECT x * 50 AS v FROM generate_series(0, 10) t(x))
    SELECT
      CAST(count(*) AS BIGINT) AS n_candidates,
      CAST(sum(v1 * 1000000 + v2 * 1000 + v3) AS BIGINT) AS checksum,
      CAST(max(v1 + v2 + v3) AS BIGINT) AS max_total
    FROM (
      SELECT a.v AS v1, b.v AS v2, c.v AS v3
      FROM g a, g b, g c
      WHERE a.v + b.v + c.v <= 500 AND a.v + b.v + c.v > 0
    )
    """,
    tier="P0",
    doc="Stateset generation — the reference's signature computation: "
    "cross join of three discrete volume grids (0..500 step 50), filtered "
    "by a total-volume cap. Generated with spark.range, never "
    "materialized outside Spark; at scale the grid is generated "
    "distributed and the filter is applied before any shuffle.",
)
def q_gen_stateset_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = spark.range(0, 11).select((F.col("id") * 50).alias("v"))
    g1 = grid.select(F.col("v").alias("v1"))
    g2 = grid.select(F.col("v").alias("v2"))
    g3 = grid.select(F.col("v").alias("v3"))
    total = F.col("v1") + F.col("v2") + F.col("v3")
    return (
        g1.crossJoin(g2)
        .crossJoin(g3)
        .where((total <= 500) & (total > 0))
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(
                F.col("v1") * 1000000 + F.col("v2") * 1000 + F.col("v3")
            ).alias("checksum"),
            F.max(total).alias("max_total"),
        )
    )


@register(
    "q_str_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_name) AS lname,
           substring(c_name, 1, 8) AS sub8,
           concat_ws('-', c_mktsegment, c_name) AS joined,
           CAST(length(c_name) AS INTEGER) AS name_len,
           trim(' ' || c_name || ' ') AS trimmed,
           replace(c_name, 'Customer#', 'Cust_') AS repl,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded
    FROM customer
    """,
    tier="P1",
    doc="String function battery: upper/lower/substr/concat_ws/length/"
    "trim/replace/lpad (chemical-name munging analog).",
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.upper(name).alias("uname"),
        F.lower(name).alias("lname"),
        F.substring(name, 1, 8).alias("sub8"),
        F.concat_ws("-", F.col("c_mktsegment"), name).alias("joined"),
        F.length(name).alias("name_len"),
        F.trim(F.concat(F.lit(" "), name, F.lit(" "))).alias("trimmed"),
        F.replace(name, F.lit("Customer#"), F.lit("Cust_")).alias("repl"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded"),
    )


@register(
    "q_regexp_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_extract(p_name, ' ([a-z]+)$', 1) AS last_word
    FROM part
    WHERE regexp_matches(p_name, '^(red|blue|green)')
    """,
    tier="P1",
    doc="Regex extract + regex filter (spec-string parsing analog). "
    "Patterns restricted to syntax identical under Java regex and RE2.",
)
def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.where(F.col("p_name").rlike("^(red|blue|green)")).select(
        "p_partkey",
        F.regexp_extract(F.col("p_name"), "([a-z]+)", 1).alias("first_word"),
        F.regexp_extract(F.col("p_name"), " ([a-z]+)$", 1).alias("last_word"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wd,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
                AS INTEGER) AS days_to_2002,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3mo
    FROM orders
    """,
    tier="P1",
    doc="Date functions: year/month/weekday/date_trunc/datediff/"
    "add_months (run-date stamping analog). Weekday emitted Monday=0 "
    "(Spark weekday == DuckDB isodow-1; dayofweek disagrees between "
    "engines).",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.weekday(d).alias("wd"),
        # DuckDB date_trunc('month') yields DATE; cast to match
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).alias(
            "days_to_2002"
        ),
        F.add_months(d, 3).alias("plus3mo"),
    )


@register(
    "q_math_funcs",
    oracle=f"""
    SELECT l_orderkey,
           l_linenumber,
           abs(l_quantity - 25) AS abs_dev,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           {sql_r('sqrt(l_quantity)', 6)} AS sqrt_qty,
           {sql_r('ln(l_extendedprice)', 6)} AS ln_price,
           {sql_r('exp(l_discount)', 6)} AS exp_disc,
           {sql_r('pow(l_quantity, 2)', 6)} AS qty_sq,
           l_linenumber % 3 AS mod3
    FROM lineitem
    """,
    tier="P1",
    doc="Math battery: abs/ceil/floor/sqrt/ln/exp/pow/mod "
    "(concentration-math analog).",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r6

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("abs_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        r6(F.sqrt(F.col("l_quantity"))).alias("sqrt_qty"),
        r6(F.log(F.col("l_extendedprice"))).alias("ln_price"),
        r6(F.exp(F.col("l_discount"))).alias("exp_disc"),
        r6(F.pow(F.col("l_quantity"), 2)).alias("qty_sq"),
        (F.col("l_linenumber") % 3).alias("mod3"),
    )


@register(
    "q_json_extract",
    oracle=f"""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k,
           {sql_r("avg(CAST(json_extract_string(props, '$.k') AS INTEGER))")}
             AS avg_k
    FROM events
    GROUP BY event_type
    """,
    tier="P1",
    doc="JSON field extraction from the props column + per-type stats "
    "(experiment-spec JSON handling analog).",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        r4(F.avg(k)).alias("avg_k"),
    )


@register(
    "q_array_funcs",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           {sql_r('CAST(embedding[1] AS DOUBLE)')} AS first_val,
           {sql_r('list_sum(list_transform(list_slice(embedding, 1, 3),'
                  ' x -> CAST(x AS DOUBLE)))')} AS head3_sum,
           {sql_r('sqrt(list_sum(list_transform(embedding,'
                  ' x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))')} AS l2_norm
    FROM embeddings
    """,
    tier="P1",
    doc="Array functions over the embedding column: size/element_at/"
    "slice + per-row L2 norm (multimodal-column extension). float32 "
    "elements cast to double before arithmetic on both engines; "
    "element order is identical so the fold is bit-deterministic.",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    dbl = lambda x: x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        r4(F.element_at(emb, 1).cast("double")).alias("first_val"),
        r4(
            F.aggregate(
                F.slice(emb, 1, 3), F.lit(0.0), lambda acc, x: acc + dbl(x)
            )
        ).alias("head3_sum"),
        r4(
            F.sqrt(
                F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + dbl(x) * dbl(x))
            )
        ).alias("l2_norm"),
    )


@register(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    """,
    tier="P2",
    doc="from_json into map<string,int> + map_keys/element_at emitted "
    "as sortable scalars (map internals are never emitted directly).",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    m = F.from_json(F.col("props"), "map<string,int>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
    )


@register(
    "q_wellplate_labels",
    oracle="""
    WITH top AS (
      SELECT o_orderkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 96
    ), ranked AS (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) - 1
               AS rn
      FROM top
    )
    SELECT o_orderkey,
           chr(65 + CAST(floor(rn / 12) AS INTEGER))
             || CAST(rn % 12 + 1 AS VARCHAR) AS well
    FROM ranked
    """,
    tier="P1",
    doc="SIGNATURE: plate/well layout — top-96 orders ranked into an "
    "8x12 plate with labels A1..H12 (rank -> row letter + column "
    "number). Top-96 via TakeOrderedAndProject, then the rank window "
    "runs on 96 rows only.",
)
def q_wellplate_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.helpers import well_label

    o = load_table(spark, sf_dir, "orders")
    top = (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(96)
    )
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return top.select(
        "o_orderkey",
        well_label(F.row_number().over(w) - 1).alias("well"),
    )


@register(
    "q_null_funcs",
    oracle="""
    SELECT c.c_custkey,
           coalesce(e.n_events, 0) AS n_events,
           CASE WHEN e.n_events IS NULL THEN 1 ELSE 0 END AS is_missing,
           nullif(coalesce(e.n_events, 0), 0) AS n_or_null,
           ifnull(e.n_events, -1) AS n_or_sentinel
    FROM customer c
    LEFT JOIN (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
               FROM events GROUP BY user_id) e
      ON e.user_id = c.c_custkey
    """,
    tier="P1",
    doc="NULL-handling battery over real outer-join NULLs (90% of "
    "customers have no events): coalesce, IS NULL flag, nullif, "
    "ifnull — the unobserved-well handling of the reference's "
    "spec-to-outcome join. The fixture has zero stored NULLs, so the "
    "left join manufactures them (SURVEY §5.4).",
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    c = load_table(spark, sf_dir, "customer")
    ev = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    j = c.join(ev, c.c_custkey == ev.user_id, "left")
    n = F.col("n_events")
    return j.select(
        "c_custkey",
        F.coalesce(n, F.lit(0)).alias("n_events"),
        F.when(n.isNull(), 1).otherwise(0).alias("is_missing"),
        F.nullif(F.coalesce(n, F.lit(0)), F.lit(0)).alias("n_or_null"),
        F.ifnull(n, F.lit(-1)).alias("n_or_sentinel"),
    )


@register(
    "q_decimal_exact_money",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR)
             AS total_dec,
           CAST(CAST(avg(CAST(l_quantity AS DECIMAL(10,2)))
                     AS DECIMAL(14,4)) AS VARCHAR) AS avg_dec
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tier="P1",
    doc="Exact decimal money arithmetic: prices cast to DECIMAL(14,2) "
    "before summing, so the result is exact and identical under ANY "
    "partitioning or reduction order — unlike float sums, which need "
    "the rounding discipline. Emitted as strings to pin the scale "
    "cross-engine. The fixed-point path a financial/inventory ledger "
    "uses at 100 TB where float drift is unacceptable.",
)
def q_decimal_exact_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(14,2)"))
        .cast("string")
        .alias("total_dec"),
        F.avg(F.col("l_quantity").cast("decimal(10,2)"))
        .cast("decimal(14,4)")
        .cast("string")
        .alias("avg_dec"),
    )


@register(
    "q_variant_json",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k')
                              AS BIGINT) >= 50 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_high,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tier="P1",
    doc="Spark 4 VARIANT semi-structured path: parse_json(props) to a "
    "VARIANT column once, then typed variant_get extraction — the "
    "shredded-JSON storage model (parse once, extract many, no "
    "re-tokenizing per field the way repeated get_json_object does). "
    "Twin of q_json_extract on the legacy string-path API; all "
    "emitted aggregates are integers, so the hash check is exact.",
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    v = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("vprops")
    )
    k = F.try_variant_get(F.col("vprops"), "$.k", "bigint")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.sum(F.when(k >= 50, 1).otherwise(0)).alias("n_high"),
        F.max(k).alias("max_k"),
    )


@register(
    "q_gen_date_dim",
    oracle="""
    SELECT CAST(d AS DATE) AS d,
           CAST(year(d) AS INTEGER) AS year,
           CAST(month(d) AS INTEGER) AS month,
           CAST(dayofmonth(d) AS INTEGER) AS day,
           CAST(quarter(d) AS INTEGER) AS quarter,
           CAST(isodow(d) AS INTEGER) AS iso_dow,
           CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END AS is_weekend,
           CAST(weekofyear(d) AS INTEGER) AS iso_week
    FROM (
      SELECT unnest(generate_series(DATE '1995-01-01', DATE '2001-12-31',
                                    INTERVAL '1 day')) AS d
    )
    """,
    tier="P1",
    doc="Calendar/date-dimension generation: the span of the orders "
    "history densified to one row per day with the standard "
    "attributes (year/month/day/quarter, ISO weekday and week, "
    "weekend flag) — the dimension every time-grouped report joins "
    "against. Generated from sequence()+explode, all derivations are "
    "JVM date functions; broadcast-sized at any fact scale (a century "
    "is 36k rows).",
)
def q_gen_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("2001-12-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    dow = F.dayofweek(F.col("d"))  # Sun=1..Sat=7
    iso_dow = F.when(dow == 1, 7).otherwise(dow - 1)
    return days.select(
        "d",
        F.year("d").cast("int").alias("year"),
        F.month("d").cast("int").alias("month"),
        F.dayofmonth("d").cast("int").alias("day"),
        F.quarter("d").cast("int").alias("quarter"),
        iso_dow.cast("int").alias("iso_dow"),
        F.when(iso_dow >= 6, 1).otherwise(0).alias("is_weekend"),
        F.weekofyear("d").cast("int").alias("iso_week"),
    )


@register(
    "q_explode_outer_nulls",
    oracle="""
    WITH marked AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '),
                         t -> t IN ('error', 'warn', 'fatal')) AS hits
      FROM documents
    )
    SELECT doc_id, token, CAST(n_hits AS INTEGER) AS n_hits
    FROM (
      SELECT doc_id,
             unnest(CASE WHEN len(hits) = 0 THEN [NULL] ELSE hits END)
               AS token,
             len(hits) AS n_hits
      FROM marked
    )
    """,
    tier="P1",
    doc="explode_outer semantics: documents with NO marker tokens "
    "survive as a single NULL row instead of vanishing — the "
    "LEFT-JOIN-shaped explode every per-document fan-out needs when "
    "downstream counts must cover the whole corpus (plain explode "
    "silently drops empty arrays and corrupts denominators).",
)
def q_explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    markers = F.array(F.lit("error"), F.lit("warn"), F.lit("fatal"))
    hits = F.filter(
        F.split(F.col("text"), " "), lambda t: F.array_contains(markers, t)
    )
    marked = d.select("doc_id", hits.alias("hits"))
    return marked.select(
        "doc_id",
        F.explode_outer(F.col("hits")).alias("token"),
        F.size("hits").cast("int").alias("n_hits"),
    )


@register(
    "q_try_functions",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE CAST(floor(o_totalprice / (o_orderkey % 5)) AS BIGINT)
           END AS safe_div,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
           TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast
    FROM orders
    """,
    tier="P1",
    doc="Error-safe ANSI arithmetic: try_divide returns NULL on "
    "division by zero and try_cast returns NULL on malformed input "
    "instead of failing the job — the poison-row tolerance a 100 TB "
    "batch needs (one bad row must not kill a 6-hour job; NULLs are "
    "countable and quarantineable downstream). Map-only projection.",
)
def q_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    denom = F.col("o_orderkey") % 5
    return o.select(
        "o_orderkey",
        F.floor(F.try_divide(F.col("o_totalprice"), denom)).cast("long").alias(
            "safe_div"
        ),
        F.substring("o_orderpriority", 1, 1).try_cast("bigint").alias(
            "prio_num"
        ),
        F.col("o_orderpriority").try_cast("bigint").alias("bad_cast"),
    )


@register(
    "q_union_by_name",
    oracle="""
    SELECT source, o_orderkey, total, coalesce(prio, 'n/a') AS prio
    FROM (
      SELECT 'open' AS source, o_orderkey, o_totalprice AS total,
             o_orderpriority AS prio
      FROM orders WHERE o_orderstatus = 'O'
      UNION ALL BY NAME
      SELECT 'done' AS source, o_totalprice AS total, o_orderkey
      FROM orders WHERE o_orderstatus = 'F'
    )
    """,
    tier="P1",
    doc="Schema-drift union: unionByName(allowMissingColumns=True) "
    "aligns by COLUMN NAME, not position, and NULL-fills columns one "
    "side lacks — how feeds with evolving or reordered schemas merge "
    "safely (positional unionAll silently mis-binds reordered "
    "columns). DuckDB twin is UNION ALL BY NAME.",
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_side = o.where(F.col("o_orderstatus") == "O").select(
        F.lit("open").alias("source"),
        "o_orderkey",
        F.col("o_totalprice").alias("total"),
        F.col("o_orderpriority").alias("prio"),
    )
    done_side = o.where(F.col("o_orderstatus") == "F").select(
        F.lit("done").alias("source"),
        F.col("o_totalprice").alias("total"),
        "o_orderkey",
    )
    merged = open_side.unionByName(done_side, allowMissingColumns=True)
    return merged.select(
        "source",
        "o_orderkey",
        "total",
        F.coalesce(F.col("prio"), F.lit("n/a")).alias("prio"),
    )


@register(
    "q_json_to_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                     IS NULL THEN 1 ELSE 0 END AS parse_failed
    FROM events
    """,
    tier="P1",
    doc="Schema-full JSON parse (from_json with an explicit schema -> "
    "typed struct, then star-expansion) — the third JSON path beside "
    "per-field get_json_object (q_json_extract) and VARIANT "
    "(q_variant_json). Parsing once into a typed struct is the "
    "columnar-friendly form: downstream projections prune struct "
    "fields, and malformed documents surface as NULL structs "
    "(counted here) instead of job failures.",
)
def q_json_to_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    parsed = ev.select(
        "event_id",
        F.from_json(F.col("props"), "k BIGINT").alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.when(F.col("p.k").isNull(), 1).otherwise(0).alias("parse_failed"),
    )


@register(
    "q_nested_collect_inline",
    oracle="""
    SELECT l_linenumber, count(*) AS n,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS sum_cents,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY l_linenumber
    """,
    tier="P2",
    doc="Nested build + flatten round-trip: lineitems are collected "
    "into a per-order ARRAY<STRUCT> (sort_array on the struct's "
    "leading l_linenumber field makes the array order deterministic "
    "— a bare collect_list is partition-order-dependent and could "
    "never hash-check), then exploded back with inline() and "
    "re-aggregated; equality with the direct aggregate proves the "
    "denormalize/renormalize cycle lossless. This is the "
    "document-model shape (order-with-items JSON, one record per "
    "entity) every export/API layer builds; at 100 TB the collect "
    "is one groupBy shuffle and per-order arrays stay small (items "
    "per order is bounded), so no skew amplification — the pattern "
    "to avoid is collecting UNBOUNDED groups (a user's full event "
    "history) into one array.",
)
def q_nested_collect_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import int_units

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.struct(
            F.col("l_linenumber"),
            F.col("l_quantity").cast("long").alias("qty"),
            int_units("l_extendedprice", 2).alias("cents"),
        ).alias("item"),
    )
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("item")).alias("items")
    )
    flat = nested.select(F.inline("items"))
    return flat.groupBy("l_linenumber").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.sum("qty").alias("sum_qty"),
    )


@register(
    "q_sql_collation",
    oracle="""
    SELECT lower(min(mixed)) AS name_ci, min(mixed) AS repr_name,
           count(*) AS n, CAST(sum(CAST(p_size AS BIGINT)) AS BIGINT) AS sum_size
    FROM (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
                  ELSE p_name END AS mixed,
             p_size
      FROM part
    )
    GROUP BY lower(mixed)
    """,
    tier="P2",
    doc="String collations (Spark 4 COLLATE): case-insensitive "
    "grouping via UTF8_LCASE collation on a deliberately mixed-case "
    "column (every even key uppercased), proven equal to grouping by "
    "lower() — the collation-aware GROUP BY runs inside the engine "
    "with no expression wrapper, which at 100 TB means the "
    "aggregation hashes collation keys directly instead of "
    "materializing a lowercased copy of every string. The collated "
    "GROUP BY key has no canonical spelling, so every emitted column "
    "is an aggregate over the UNCOLLATED strings (binary min and its "
    "lowercase) — min over the collated column itself would pick a "
    "collation-equal representative nondeterministically (observed: "
    "Spark returned either case at whim while DuckDB's binary min "
    "always took the uppercase).",
)
def q_sql_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "part").createOrReplaceTempView("v_part_coll")
    return spark.sql(
        """
        SELECT lower(min(mixed)) AS name_ci, min(mixed) AS repr_name,
               count(*) AS n, CAST(sum(CAST(p_size AS BIGINT)) AS BIGINT) AS sum_size
        FROM (
          SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
                      ELSE p_name END AS mixed,
                 p_size
          FROM v_part_coll
        )
        GROUP BY mixed COLLATE UTF8_LCASE
        """
    )


@register(
    "q_sql_identifier_clause",
    oracle="""
    SELECT 'open' AS segment, count(*) AS n,
           CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS sum_cents
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT 'final' AS segment, count(*) AS n,
           CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS sum_cents
    FROM orders WHERE o_orderstatus = 'F'
    """,
    tier="P2",
    doc="Parameterized identifiers (Spark 4 IDENTIFIER clause): the "
    "table a query reads is bound as a named PARAMETER, not spliced "
    "into the SQL string — the injection-safe form of dynamic table "
    "routing every multi-tenant/sharded report generator needs "
    "(string-built identifiers are the SQL-injection vector the "
    "clause exists to close). Two status-partitioned views are "
    "queried through the same parameterized statement; constant "
    "folding still applies once the identifier resolves, so the "
    "plan is identical to a literal table reference.",
)
def q_sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.where(F.col("o_orderstatus") == "O").createOrReplaceTempView(
        "v_orders_open"
    )
    o.where(F.col("o_orderstatus") == "F").createOrReplaceTempView(
        "v_orders_final"
    )
    parts = []
    for seg, view in (("open", "v_orders_open"), ("final", "v_orders_final")):
        parts.append(
            o.sparkSession.sql(
                """
                SELECT :seg AS segment, count(*) AS n,
                       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT)
                         AS sum_cents
                FROM IDENTIFIER(:tbl)
                """,
                args={"seg": seg, "tbl": view},
            )
        )
    return parts[0].unionAll(parts[1])


@register(
    "q_sql_udf_declared",
    oracle="""
    WITH top_by_status AS (
      SELECT o_orderstatus, o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY floor(o_totalprice * 100 + 0.5) DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    SELECT o_orderstatus, o_orderkey, cents
    FROM top_by_status WHERE rn <= 3
    """,
    tier="P2",
    doc="SQL-defined functions (Spark 4 CREATE TEMPORARY FUNCTION ... "
    "RETURN): a scalar SQL UDF (exact cents conversion) and a TABLE "
    "function (top-3 orders for a given status, parameterized) "
    "declared in pure SQL — no Python worker, no JVM jar; the bodies "
    "INLINE into the calling plan at analysis time, so unlike "
    "external UDFs they cost nothing at 100 TB and stay inside "
    "whole-stage codegen with full pushdown. The table function is "
    "invoked once per status via a literal LATERAL-style union, and "
    "results rank on exact cents with a key tiebreak (on the raw "
    "expression — the analyzer rejects SQL UDFs inside Sort).",
)
def q_sql_udf_declared(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark
    load_table(s, sf_dir, "orders").createOrReplaceTempView("v_orders_sqlfn")
    s.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sd2drp_cents(x DOUBLE) "
        "RETURNS BIGINT RETURN CAST(floor(x * 100 + 0.5) AS BIGINT)"
    )
    s.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION sd2drp_top3(status STRING)
        RETURNS TABLE(o_orderstatus STRING, o_orderkey BIGINT, cents BIGINT)
        RETURN
          SELECT o_orderstatus, o_orderkey, sd2drp_cents(o_totalprice)
          FROM v_orders_sqlfn
          WHERE o_orderstatus = status
          ORDER BY floor(o_totalprice * 100 + 0.5) DESC, o_orderkey
          LIMIT 3
        """
    )
    return s.sql(
        """
        SELECT * FROM sd2drp_top3('F')
        UNION ALL SELECT * FROM sd2drp_top3('O')
        UNION ALL SELECT * FROM sd2drp_top3('P')
        """
    )


@register(
    "q_frame_transpose",
    oracle="""
    WITH agg AS (
      SELECT o_orderstatus,
             count(*) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_orderstatus
    )
    SELECT 'n_orders' AS key,
           max(CASE WHEN o_orderstatus = 'F' THEN n_orders END) AS F,
           max(CASE WHEN o_orderstatus = 'O' THEN n_orders END) AS O,
           max(CASE WHEN o_orderstatus = 'P' THEN n_orders END) AS P
    FROM agg
    UNION ALL
    SELECT 'cents' AS key,
           max(CASE WHEN o_orderstatus = 'F' THEN cents END) AS F,
           max(CASE WHEN o_orderstatus = 'O' THEN cents END) AS O,
           max(CASE WHEN o_orderstatus = 'P' THEN cents END) AS P
    FROM agg
    """,
    tier="P2",
    doc="DataFrame.transpose (Spark 4): a per-status summary flipped "
    "so measures become rows and statuses become columns — the "
    "report-orientation step every summary table hits before a "
    "human reads it. transpose() collects the index column to the "
    "DRIVER to mint the output schema (column names must exist at "
    "plan time), which is exactly why it is safe here and a trap in "
    "general: transposing a 3-row aggregate is free, transposing a "
    "fact table would materialize it — so the operator transposes "
    "only the final small rollup, never input data. Measures are "
    "pre-cast to one type (transpose requires a least-common type "
    "across transposed columns; exact integer cents keep the "
    "values hash-stable).",
)
def q_frame_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents"),
    )
    return agg.transpose("o_orderstatus")
