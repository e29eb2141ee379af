"""MLlib-backed operators — SURVEY §2.8 rows #59-61 plus the ANN scale
path. Originally all rows-only (algorithm-specific results have no
direct cross-engine SQL oracle); every one is now HASH-checked via the
exact-companion+witness pattern (KMeans r7, pipeline r8, MinHash-LSH
r12), and each keeps a quantitative pytest self-check per SURVEY §5.2:
LSH candidates must cover the exact-Jaccard ground truth, KMeans must
find real structure (inertia + above-chance purity + seed
determinism), the trained pipeline must beat AUC 0.5,
and IVF top-k must reach high recall vs exact brute force.

Scale rationale: these ARE the 100 TB paths — MinHashLSH replaces the
O(n^2) token self-join of q_neardup_jaccard, and IVF probes a few
centroid buckets instead of the full matrix product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table

SEED = 42


def _token_vectors(spark: SparkSession, sf_dir: str):
    """documents -> (doc_id, binary token-presence vector) for LSH.

    Tokenization is F.split(text, ' ') — the SAME token definition as
    q_neardup_jaccard's exact companion and every DuckDB oracle
    (string_split on a single space, case-sensitive, '' tokens kept).
    r12 review: the original MLlib Tokenizer lowercased and split on
    \\s+, a DIFFERENT token space — invisible on the all-lowercase
    single-space fixtures, but on mixed-case text the LSH arm's
    refined Jaccard would diverge from the companion's and the recall
    witness could false-red. One token definition, one truth."""
    from pyspark.ml.feature import CountVectorizer

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    tokenized = d.withColumn("tokens", F.split(F.col("text"), " "))
    cv = CountVectorizer(
        inputCol="tokens", outputCol="features", binary=True, minDF=1.0
    )
    model = cv.fit(tokenized)
    return model.transform(tokenized).select("doc_id", "source", "features")


def lsh_refined_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw MinHash-LSH near-duplicate pair frame (id_lo, id_hi,
    jaccard_sim): token sets -> binary vectors -> MinHash signatures ->
    approxSimilarityJoin (band-bucket join under the hood), exact
    Jaccard distance <= 0.4 refined on candidates only. The pair SET
    depends on the seeded hash family, so it stays out of any driver
    hash — q_dedup_minhash_lsh wraps it in the exact-companion+witness
    form; the pytest self-check consumes it directly."""
    from pyspark.ml.feature import MinHashLSH

    vecs = _token_vectors(spark, sf_dir)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=SEED
    )
    model = lsh.fit(vecs)
    pairs = model.approxSimilarityJoin(
        vecs, vecs, threshold=0.4, distCol="jaccard_dist"
    )
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_lo"),
            F.col("datasetB.doc_id").alias("id_hi"),
            F.round(F.lit(1.0) - F.col("jaccard_dist"), 4).alias("jaccard_sim"),
        )
    )


@register(
    "q_dedup_minhash_lsh",
    oracle="""
    WITH dt AS (
      SELECT DISTINCT doc_id, source, token
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
            FROM documents)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_tok FROM dt GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_lo, b.doc_id AS id_hi, a.source AS source,
             count(*) AS n_inter
      FROM dt a JOIN dt b
        ON a.token = b.token AND a.source = b.source
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3
    ), pairs AS (
      SELECT source,
             floor((CAST(n_inter AS DOUBLE)
                    / (sa.n_tok + sb.n_tok - n_inter)) * 10000 + 0.5) / 10000
               AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_lo
      JOIN sizes sb ON sb.doc_id = id_hi
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter) >= 0.6
    )
    SELECT source,
           count(*) AS n_pairs_06,
           count(*) FILTER (jaccard >= 0.8) AS n_pairs_08,
           true AS recall_ok
    FROM pairs
    GROUP BY source
    """,
    tier="P2",
    doc="MinHash-LSH near-duplicate detection — the 100 TB path for "
    "q_neardup_jaccard — promoted from rows-only to a HASH check in "
    "round 12 (VERDICT r11 item 2) via the exact-companion+witness "
    "pattern that promoted KMeans (r7), the MLlib pipeline (r8) and "
    "the multimodal decodes (r10). Emitted rows are per-source: "
    "n_pairs_06/n_pairs_08 are EXACT same-source near-dup pair counts "
    "at J >= 0.6 / 0.8 (computed by the registered exact plan — "
    "SQL-expressible companion values); recall_ok witnesses that the "
    "LSH-refined candidate set covers all but at most ONE of the "
    "J >= 0.8 ground-truth pairs per source (covered_08 + 1 >= "
    "n_pairs_08). The seed-dependent covered count itself stays OUT "
    "of the hashed output — ONLY companions and the margin boolean "
    "are hashed, the r7/r8 promotion pattern — because the MinHash "
    "family is drawn from seed=42 AND the CountVectorizer vocabulary "
    "ORDER, whose df ties resolve partition-dependently: an "
    "environment change is a fresh family draw, and with ~1500 "
    "hashed pairs missing each with p <= 0.2^8 = 2.6e-6, exact "
    "equality would false-red ~0.4% of draws. The one-miss margin "
    "drops that below 1e-8 per source while the pytest self-check "
    "still asserts EXACT coverage with a readable message (measured "
    "exact at sf0.001/0.01/0.1: 1540/1540, 1506/1506, sf0.1 green). "
    "r14: candidate membership is PROBED per ground-truth pair "
    "(compare the two docs' 8-value MinHash signatures from the same "
    "seeded model fit) instead of materializing approxSimilarityJoin "
    "over the whole corpus — provably the same covered_08 (a J>=0.8 "
    "pair passes the dist<=0.4 refinement by definition, so "
    "membership reduces to sharing >=1 hash table bucket), "
    "pytest-forced equal to the approxSimilarityJoin form and "
    "measured 328 s -> 3.4 s at sf0.1: the fixture vocabulary's hot "
    "tokens make every table's min-hash bucket hold ~78% of all docs, "
    "so the join form enumerated 123M candidate struct rows to answer "
    "a question about ~1500 pairs. 100 TB: the probe touches "
    "O(ground-truth pairs), never the O(sum k^2) bucket join; "
    "lsh_refined_pairs keeps the approxSimilarityJoin form for the "
    "pytest self-check that audits the RAW candidate set.",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import MinHashLSH
    from pyspark.ml.functions import vector_to_array

    from .text import q_neardup_jaccard

    exact = q_neardup_jaccard(spark, sf_dir)  # same-source, J >= 0.6
    src = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id_lo"), "source"
    )
    # The SAME seeded model draw as lsh_refined_pairs: fit defines the
    # hash family, transform emits each doc's 8-value signature.
    vecs = _token_vectors(spark, sf_dir)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=SEED
    )
    model = lsh.fit(vecs)
    sig = model.transform(vecs).select(
        "doc_id",
        F.transform("hashes", lambda v: vector_to_array(v)[0]).alias("sig"),
    )
    a = sig.select(F.col("doc_id").alias("id_lo"), F.col("sig").alias("sig_lo"))
    b = sig.select(F.col("doc_id").alias("id_hi"), F.col("sig").alias("sig_hi"))
    # (id_lo, id_hi) is an approxSimilarityJoin candidate iff the two
    # signatures collide in >=1 of the 8 tables; the dist <= threshold
    # refinement is implied for every pair covered_08 reads (J >= 0.8
    # -> jaccard_dist = 0.2).
    shared = F.exists(
        F.zip_with(F.col("sig_lo"), F.col("sig_hi"), lambda x, y: x == y),
        lambda v: v,
    )
    j8 = (F.col("jaccard") >= 0.8).cast("long")
    return (
        exact.join(src, "id_lo")
        .join(a, "id_lo")
        .join(b, "id_hi")
        .withColumn("hit", shared.cast("long"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_pairs_06"),
            F.sum(j8).alias("n_pairs_08"),
            F.sum(j8 * F.col("hit")).alias("covered_08"),
        )
        .withColumn(
            "recall_ok", F.col("covered_08") + 1 >= F.col("n_pairs_08")
        )
        .drop("covered_08")  # seed-dependent: witness boolean only
    )


KMEANS_DIM = 64  # fixture embedding width (matches vectors.EMB_DIM)


@register(
    "q_kmeans_embeddings",
    oracle="""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           true AS purity_ok,
           true AS inertia_ok
    FROM embeddings
    GROUP BY label
    """,
    tier="P2",
    doc="KMeans k=10 (fixed seed) over the embedding vectors. Promoted "
    "to a HASH check in round 7 (VERDICT r6 #8) via the sketch-family "
    "pattern (same as q_ann_ivf_topk in r6): the emitted rows carry the "
    "EXACT per-label vector counts (SQL-expressible companion) plus two "
    "deterministic witness booleans oracled as literals — "
    "purity_ok: majority-label purity of the fixed-seed clustering is "
    ">= 0.12 (chance level 1/k = 0.10; measured 0.174 / 0.154 / 0.1325 "
    "at sf0.001/0.01/0.1 — the fixture's labels are only weakly "
    "geometrically separable, SURVEY §2 #60), computed as an exact "
    "integer comparison 10000*sum(majority counts) >= 1200*n; "
    "inertia_ok: KMeans training cost <= 0.98 * single-cluster "
    "baseline SSE (measured ratios 0.914-0.944), baseline computed "
    "in-plan as sum||x||^2 - sum_d S_d^2 / n — no driver collect "
    "anywhere; cluster ids stay OUT of the hash so centroid-init drift "
    "cannot flip it while quality holds. Self-test (pytest): purity "
    "margin + inertia + seed determinism. MLlib KMeans is the "
    "distributed path: per-partition assignment + tree-aggregated "
    "centroid updates.",
)
def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("emb"),
    ).withColumn("features", array_to_vector(F.col("emb")))
    km = KMeans(k=10, seed=SEED, featuresCol="features", predictionCol="cluster")
    model = km.fit(e)
    inertia = float(model.summary.trainingCost)
    pred = model.transform(e)

    # Purity numerator: sum over clusters of the majority-label count —
    # two map-side-combined groupBys over (cluster, label), never wider
    # than k*|labels| rows after the first.
    top = (
        pred.groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("cluster")
        .agg(F.max("n").alias("top_n"))
        .agg(F.sum("top_n").alias("top_sum"))
    )

    # Single-cluster baseline SSE around the global mean, in one
    # distributed pass: sum||x||^2 - sum_d S_d^2 / n.
    base = e.select(
        F.aggregate("emb", F.lit(0.0), lambda a, x: a + x * x).alias("rowsq"),
        *[F.col("emb")[d].alias(f"x{d}") for d in range(KMEANS_DIM)],
    ).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("rowsq").alias("ssq"),
        *[F.sum(f"x{d}").alias(f"s{d}") for d in range(KMEANS_DIM)],
    )
    mean_sq = sum(
        (F.col(f"s{d}") * F.col(f"s{d}") for d in range(KMEANS_DIM)),
        start=F.lit(0.0),
    )
    witness = top.crossJoin(base).select(
        (F.col("top_sum") * F.lit(10000) >= F.col("n_total") * F.lit(1200))
        .alias("purity_ok"),
        (
            F.lit(inertia)
            <= F.lit(0.98) * (F.col("ssq") - mean_sq / F.col("n_total"))
        ).alias("inertia_ok"),
    )

    return (
        e.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .crossJoin(F.broadcast(witness))
        .select("label", "n_vectors", "purity_ok", "inertia_ok")
    )


def kmeans_quality(spark: SparkSession, sf_dir: str) -> dict:
    """Quality stats for the q_kmeans_embeddings clustering (pytest
    self-check helper): majority-label purity, KMeans training cost
    (inertia), and the single-cluster baseline SSE around the global
    mean. The fixture's labels are only weakly separable (nearest-
    centroid label accuracy ~0.41 at sf0.01), so the check asserts
    purity above the 1/k chance level and inertia well below the
    baseline — i.e. the clustering found real geometric structure —
    rather than label recovery the data cannot support."""
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "label",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = KMeans(k=10, seed=SEED, predictionCol="cluster").fit(e)
    pred = model.transform(e)
    counts = pred.groupBy("cluster", "label").agg(F.count(F.lit(1)).alias("n"))
    top = counts.groupBy("cluster").agg(F.max("n").alias("top_n"))
    total = e.count()
    purity = top.agg(F.sum("top_n")).collect()[0][0] / total

    X = np.array(
        [r["embedding"] for r in load_table(spark, sf_dir, "embeddings")
         .select(F.col("embedding").cast("array<double>").alias("embedding"))
         .collect()],
        dtype=np.float64,
    )
    baseline_sse = float(((X - X.mean(axis=0)) ** 2).sum())
    inertia = float(model.summary.trainingCost)
    return {"purity": purity, "inertia": inertia, "baseline_sse": baseline_sse}


# Witness threshold for q_mllib_train_pipeline's training AUC: measured
# 1.0000 / 0.8641 / 0.7901 at sf0.001/0.01/0.1 — 0.70 sits 0.09 below
# the weakest measurement, far above the 0.5 chance level, and LBFGS on
# identical data is deterministic well past that margin.
PIPELINE_AUC_MIN = 0.70


def _pipeline_oracle() -> str:
    from .aggregates import FEATURES_WIDE_SQL

    return f"""
    WITH feats AS ({FEATURES_WIDE_SQL})
    SELECT CAST(count(*) AS BIGINT) AS n_train,
           CAST(9 + count(DISTINCT n_name) AS INT) AS n_features,
           true AS auc_ok
    FROM feats
    """


@register(
    "q_mllib_train_pipeline",
    oracle=_pipeline_oracle(),
    tier="P2",
    doc="End-to-end MLlib Pipeline on the q_train_features_wide table: "
    "StringIndexer(nation) -> OneHotEncoder -> VectorAssembler -> "
    "LogisticRegression predicting the has-finished-order label. "
    "Promoted from rows-only to a HASH check in round 8 via the "
    "kmeans/sketch pattern: n_train and n_features are SQL-expressible "
    "companions (n_features = 10 numeric inputs + |nations|-1 one-hot "
    "slots under OneHotEncoder's default dropLast — the oracle "
    "DERIVES it as 9 + count(DISTINCT n_name), so the hash also "
    "verifies the encoder's category handling against the data), and "
    f"the training AUC becomes the witness boolean auc_ok (> "
    f"{PIPELINE_AUC_MIN}; measured 1.00/0.86/0.79 at the three "
    "fixture scales) oracled as a literal. The raw AUC stays out of "
    "the hash because float optimizer internals are not cross-engine "
    "reproducible; the quality CLAIM is. Self-test: AUC > 0.5. This "
    "is the reference's model-feeding step run natively distributed.",
)
def q_mllib_train_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler

    from .aggregates import q_train_features_wide

    # r15 (guide §5 — cache only frames reused >= 2x): the wide-feature
    # aggregate re-executed its 4-join build per consumer — the
    # StringIndexer fit, the LR fit (which persists only its OWN
    # assembled instances), the scoring transform + evaluator pass,
    # the n_features head, and the count: ~5 executions per query
    # (interleaved stash-toggled A/B, min over 6 fresh-JVM runs:
    # 5.86 -> 3.74 s at sf0.1, every after-run under every before-run).
    # Same cache +
    # unpersist-in-finally discipline as q_mllib_cross_validation;
    # the persist-hygiene guard test allowlists both.
    feats = q_train_features_wide(spark, sf_dir).cache()
    pipe = Pipeline(
        stages=[
            StringIndexer(inputCol="n_name", outputCol="nation_idx"),
            OneHotEncoder(inputCol="nation_idx", outputCol="nation_oh"),
            VectorAssembler(
                inputCols=[
                    "n_orders",
                    "total_spend",
                    "avg_spend",
                    "avg_disc",
                    "n_items",
                    "seg_automobile",
                    "seg_building",
                    "seg_furniture",
                    "seg_household",
                    "seg_machinery",
                    "nation_oh",
                ],
                outputCol="features",
            ),
            LogisticRegression(
                featuresCol="features", labelCol="label", maxIter=20
            ),
        ]
    )
    try:
        model = pipe.fit(feats)
        scored = model.transform(feats)
        auc = BinaryClassificationEvaluator(
            labelCol="label", metricName="areaUnderROC"
        ).evaluate(scored)
        n_features = scored.select("features").head()["features"].size
        n_train = feats.count()
    finally:
        feats.unpersist()
    return spark.createDataFrame(
        [(n_train, n_features, bool(auc > PIPELINE_AUC_MIN))],
        schema="n_train long, n_features int, auc_ok boolean",
    )


@register(
    "q_ann_ivf_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, embedding
      FROM embeddings ORDER BY vec_id LIMIT 20
    ),
    pairs AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             floor(list_cosine_similarity(
               list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))
             ) * 10000 + 0.5) AS sim_u
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim_u,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim_u DESC, neighbor_id) AS rn
      FROM pairs
    )
    SELECT query_id,
           CAST(max(CASE WHEN rn = 1 THEN neighbor_id END) AS BIGINT)
             AS exact_top1,
           max(CASE WHEN rn = 1 THEN sim_u END) / 10000 AS exact_top1_sim,
           CAST(10 AS BIGINT) AS n_ivf,
           true AS recall_ok
    FROM ranked WHERE rn <= 10
    GROUP BY query_id
    """,
    tier="P2",
    doc="IVF-style approximate nearest neighbors, fully distributed: "
    "KMeans coarse quantizer (16 cells, fixed seed) assigns every "
    "vector a cell; each query probes its 8 nearest cells. Refinement "
    "runs INSIDE mapInPandas over a cell-filtered scan — only the query "
    "vectors (20 rows) and centroids (16x64) are ever driver-side / "
    "broadcast; the vector table itself never leaves the executors. "
    "Per-batch local top-k then an exact global top-k per query "
    "(row_number window). Promoted to a HASH check in round 6 "
    "(VERDICT r5 #7) via the sketch-family pattern: a second, "
    "unfiltered scan computes the EXACT brute-force top-10 per query "
    "(SQL-expressible, same quantize-then-rank tie rule as "
    "q_sim_cosine_topk), and the emitted audit row per query carries "
    "the exact top-1 neighbor + sim, the IVF candidate count, and a "
    "deterministic AGGREGATE recall@10 >= 0.8 witness boolean "
    "(measured macro recall 0.845/0.90/0.875 at the three fixture "
    "scales; KMeans is seed-fixed so the number is stable per "
    "dataset) — the IVF ids "
    "themselves stay out of the hash so KMeans centroid drift cannot "
    "flip it while recall holds. Self-test: recall@10 >= 0.8 vs exact "
    "brute force (pytest, margin-checked). At "
    "100 TB 'cell' is the table's partition key and the cell filter is "
    "partition pruning, so each query touches n_probe/n_cells of the "
    "data and no full matrix product ever forms; the exact companion "
    "is the ground-truth job a real pipeline runs on a sampled query "
    "set to monitor recall.",
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    from collections.abc import Iterator

    import pandas as pd

    n_cells, n_probe, k, n_queries = 16, 8, 10, 20

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        F.col("embedding"),
    )
    km = KMeans(k=n_cells, seed=SEED, predictionCol="cell").fit(
        e.select("features")
    )
    assigned = km.transform(e).select("vec_id", "cell", "embedding")
    centers = np.array(km.clusterCenters())

    # The query set is tiny by definition (n_queries rows) — collecting
    # it is broadcast of the SMALL side, not the table. Probe cells are
    # computed driver-side over the (n_queries x n_cells) distance
    # matrix.
    q_rows = assigned.orderBy("vec_id").limit(n_queries).collect()
    queries = []
    for r in q_rows:
        qv = np.asarray(r["embedding"], dtype=np.float64)
        d2 = ((centers - qv) ** 2).sum(axis=1)
        probe = frozenset(int(c) for c in np.argsort(d2)[:n_probe])
        queries.append((int(r["vec_id"]), qv, float(np.sqrt(qv @ qv)), probe))
    probed_cells = sorted({c for _, _, _, p in queries for c in p})
    bc = spark.sparkContext.broadcast(queries)

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qs = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            norms = np.sqrt((mat * mat).sum(axis=1))
            out_q, out_n, out_s = [], [], []
            for qid, qv, qnorm, probe in qs:
                mask = np.isin(cells, list(probe)) & (ids != qid)
                if not mask.any():
                    continue
                cand_ids = ids[mask]
                sims = (mat[mask] @ qv) / (norms[mask] * qnorm)
                sims_r = np.floor(sims * 1e4 + 0.5) / 1e4
                order = np.lexsort((cand_ids, -sims_r))[: min(k, cand_ids.size)]
                out_q.extend([qid] * order.size)
                out_n.extend(cand_ids[order])
                out_s.extend(sims_r[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    # Cell filter = the partition-pruned probe scan; local top-k per
    # Arrow batch, exact global top-k per query over the tiny candidate
    # union (<= k * n_batches * n_queries rows).
    cand = assigned.where(F.col("cell").isin(probed_cells)).mapInPandas(
        refine, schema="query_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    ivf = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )

    # Exact brute-force companion (the hash-checkable ground truth):
    # the same refine kernel WITHOUT the cell filter — cells pass a
    # sentinel that matches every row, so every vector scores against
    # every query. Distributed scan; nothing but the 20 queries is ever
    # driver-side.
    def exact_refine(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        qs = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            norms = np.sqrt((mat * mat).sum(axis=1))
            out_q, out_n, out_s = [], [], []
            for qid, qv, qnorm, _probe in qs:
                mask = ids != qid
                if not mask.any():
                    continue
                cand_ids = ids[mask]
                sims = (mat[mask] @ qv) / (norms[mask] * qnorm)
                sims_r = np.floor(sims * 1e4 + 0.5) / 1e4
                order = np.lexsort((cand_ids, -sims_r))[
                    : min(k, cand_ids.size)
                ]
                out_q.extend([qid] * order.size)
                out_n.extend(cand_ids[order])
                out_s.extend(sims_r[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    exact_cand = assigned.select("vec_id", "embedding").mapInPandas(
        exact_refine, schema="query_id long, neighbor_id long, sim double"
    )
    exact = (
        exact_cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )

    top1 = exact.where(F.col("rank") == 1).select(
        "query_id",
        F.col("neighbor_id").alias("exact_top1"),
        F.col("sim").alias("exact_top1_sim"),
    )
    n_ivf = ivf.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ivf")
    )
    # Witness is AGGREGATE recall@10 over the whole query set (the
    # metric real ANN evaluation reports): per-query recall legitimately
    # dips below 0.8 for boundary queries at n_probe=8/16 (measured:
    # macro recall 0.845 / 0.90 / 0.875 at sf0.001/0.01/0.1, per-query
    # minima ~0.5), so the per-query witness would be miscalibrated.
    total_hits = (
        ivf.select("query_id", "neighbor_id")
        .join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .agg(F.count(F.lit(1)).alias("n_hit_total"))
    )
    return (
        top1.join(n_ivf, "query_id")
        .crossJoin(F.broadcast(total_hits))
        .select(
            "query_id",
            "exact_top1",
            "exact_top1_sim",
            "n_ivf",
            (
                F.col("n_hit_total") >= int(0.8 * k * n_queries)
            ).alias("recall_ok"),
        )
    )


# Witness threshold for q_mllib_cross_validation's best CV-AUC:
# measured 0.7807 / 0.8297 / 0.7786 at sf0.001/0.01/0.1 — 0.70 sits
# 0.078 below the weakest measurement, far above the 0.5 chance level.
CV_AUC_MIN = 0.70


def _cv_oracle() -> str:
    from .aggregates import FEATURES_WIDE_SQL

    return f"""
    WITH feats AS ({FEATURES_WIDE_SQL})
    SELECT CAST(count(*) AS BIGINT) AS n_train,
           CAST(4 AS INT) AS n_grid,
           CAST(3 AS INT) AS n_folds,
           true AS cv_auc_ok
    FROM feats
    """


@register(
    "q_mllib_cross_validation",
    oracle=_cv_oracle(),
    tier="P2",
    doc="Hyperparameter tuning via CrossValidator: the logistic-"
    "regression pipeline from q_mllib_train_pipeline cross-validated "
    "3-fold over a 4-point regParam x elasticNetParam grid (12 fits "
    "+ 1 refit), with the folds parallelized across the cluster "
    "(parallelism=4 — fits are independent Spark jobs, the classic "
    "embarrassing parallelism OUTSIDE the data). Promoted from "
    "rows-only to a HASH check in round 9 via the kmeans/pipeline "
    "pattern, HONORING the r8 promotion audit: the winning grid "
    "point is dataset-dependent and wins by only 5e-4 avg-AUC at "
    "sf0.1 ((0.1,0.0)=0.7787 vs (0.0,*)=0.7782), so best-params stay "
    "OUT of the hash (asserted in-function as a self-test: winner "
    "must come from the declared grid, CV-AUC > chance) — instead "
    "the hashed row carries the SQL-expressible companions n_train "
    "(the oracle re-derives the CV input table, sharing "
    "FEATURES_WIDE_SQL with q_mllib_train_pipeline), the grid/fold "
    "cardinalities as exact literals, and the witness boolean "
    f"cv_auc_ok (best CV-AUC > {CV_AUC_MIN}; measured "
    "0.781/0.830/0.779 at the three fixture scales — margin 0.078 "
    "below the weakest, where the 5e-4 winner margin made best-param "
    "literals dishonest). Fold assignment uses the estimator's fixed "
    "seed, so the quality claim is stable per dataset/env.",
)
def q_mllib_cross_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    from .aggregates import q_train_features_wide

    feats = q_train_features_wide(spark, sf_dir).cache()
    lr = LogisticRegression(featuresCol="features", labelCol="label", maxIter=20)
    pipe = Pipeline(
        stages=[
            # handleInvalid='keep': a CV fold's train split may miss a
            # rare nation that its validation split contains — unseen
            # labels must bucket, not fail the fold
            StringIndexer(
                inputCol="n_name",
                outputCol="nation_idx",
                handleInvalid="keep",
            ),
            OneHotEncoder(inputCol="nation_idx", outputCol="nation_oh"),
            VectorAssembler(
                inputCols=[
                    "n_orders", "total_spend", "avg_spend", "avg_disc",
                    "n_items", "seg_automobile", "seg_building",
                    "seg_furniture", "seg_household", "seg_machinery",
                    "nation_oh",
                ],
                outputCol="features",
            ),
            lr,
        ]
    )
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, [0.0, 0.1])
        .addGrid(lr.elasticNetParam, [0.0, 0.5])
        .build()
    )
    evaluator = BinaryClassificationEvaluator(
        labelCol="label", metricName="areaUnderROC"
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=3,
        parallelism=4,
        seed=7,
    )
    try:
        model = cv.fit(feats)
        best_auc = max(model.avgMetrics)
        assert best_auc > 0.5, f"CV never beat chance: {best_auc}"
        best_lr = model.bestModel.stages[-1]
        # self-tests for what the hash deliberately excludes (r8 audit:
        # the winner's 5e-4 margin makes best-param literals dishonest)
        assert best_lr.getRegParam() in (0.0, 0.1)
        assert best_lr.getElasticNetParam() in (0.0, 0.5)
        n_train = feats.count()
    finally:
        # unpersist even when a self-test assert fires: the cached
        # features frame is not tracked_persist'ed, so nothing else
        # could reclaim it for the rest of a sweep
        feats.unpersist()
    return spark.createDataFrame(
        [(n_train, len(grid), cv.getNumFolds(), bool(best_auc > CV_AUC_MIN))],
        schema="n_train long, n_grid int, n_folds int, cv_auc_ok boolean",
    )
