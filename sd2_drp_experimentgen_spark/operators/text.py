"""Text / dedup pipeline operators — SURVEY §2.8 (LLM-data-pipeline
extensions over the ``documents`` table).

Scale notes: exact dedup ships hash-first (r13): phase 1 groups
xxhash64(text) so the full-corpus shuffle moves 8-byte keys, not
document bodies; phase 2 exact-verifies text only inside multi-member
hash buckets (survivor selection via min(doc_id) keeps the result
deterministic, never dropDuplicates). Token explode fans out rows but
the follow-up count aggregates map-side before shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.helpers import sql_r
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
    "100 TB plan (shipped r13, VERDICT r12 #1): phase 1 groups on "
    "xxhash64(text) so the wide exchange moves (8B hash, 8B id) — "
    "document bodies are projected out BEFORE the shuffle. Phase 2 "
    "exact-verifies text equality only inside multi-member hash "
    "buckets (the duplicates themselves plus ~2^-64 collision "
    "victims), so unique text — the bulk of any corpus — never "
    "crosses an exchange. Bit-identical to the direct groupBy(text) "
    "form by construction (singleton hash bucket => unique text; "
    "multi bucket => per-text regroup inside the bucket); "
    "tests/test_selfchecks.py::test_exact_dedup_hash_first_identity "
    "forces the equivalence, the same discipline as the r12 bitset "
    "gate.",
)
def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(d).select("survivor_id", "n_copies")


def exact_dedup_groups(d: DataFrame) -> DataFrame:
    """Distinct-text groups as (survivor_id = min(doc_id), n_copies),
    computed hash-first so full text never shuffles for unique docs.

    Phase 1: groupBy(xxhash64(text)) — the exchange carries only the
    8-byte hash and doc_id. A singleton hash bucket is PROOF of a
    unique text (any duplicated text lands its copies in one bucket),
    so those rows finalize without ever touching text again.
    Phase 2: docs in multi-member buckets (rare: true duplicates plus
    negligible xxhash64 collisions) semi-join back on the 8-byte hash
    and regroup by exact text — byte-level verification happens here,
    and only this small subset's text crosses an exchange. The union
    is bit-identical to ``groupBy(text)`` on any input."""
    hashed = d.select(
        "doc_id", F.xxhash64(F.col("text")).alias("h")
    )
    buckets = hashed.groupBy("h").agg(
        F.min("doc_id").alias("survivor_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    multi = buckets.where(F.col("n_copies") > 1).select("h")
    singles = buckets.where(F.col("n_copies") == 1).select(
        "survivor_id", "n_copies"
    )
    # NOT broadcast: at 100 TB a dup-heavy corpus can have billions of
    # multi buckets; a shuffled semi-join on the 8-byte key is the
    # scale-safe shape (AQE converts it to broadcast when small).
    verified = (
        d.withColumn("h", F.xxhash64(F.col("text")))
        .join(multi, "h", "left_semi")
        .groupBy("text")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("survivor_id", "n_copies")
    )
    return singles.unionByName(verified)


def exact_dedup_losers(d: DataFrame) -> DataFrame:
    """The REMOVAL list of exact dedup: doc_ids that share their text
    with a lower doc_id (non-survivor duplicates), computed with the
    same hash-first discipline as exact_dedup_groups — phase 1 finds
    multi-member xxhash64 buckets over an (8B hash, 8B id) exchange;
    phase 2 exact-verifies text and picks min-doc_id survivors inside
    those buckets only; losers = multi-bucket ids minus survivors
    (id-only anti-join). Consumers anti-join this list — at any dup
    rate below 50% the loser side is the SMALLER relation, and it is
    what a production dedup pass actually materializes (the delete
    set). Bit-equivalent to filtering on groupBy(text) survivors; the
    r13 variant study measured the loser-side form fastest for the
    corpus pipeline (2.27 s vs 2.94 s at sf0.1)."""
    hashed = d.select("doc_id", F.xxhash64(F.col("text")).alias("h"))
    multi = (
        hashed.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select("h")
    )
    multi_docs = (
        d.withColumn("h", F.xxhash64(F.col("text")))
        .join(multi, "h", "left_semi")
    )
    survivors = (
        multi_docs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return multi_docs.select("doc_id").join(survivors, "doc_id", "left_anti")


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


@register(
    "q_text_stats_by_lang",
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           {sql_r('avg(n_chars)')} AS avg_chars,
           {sql_r("avg(len(string_split(text, ' ')))")} AS avg_tokens
    FROM documents
    GROUP BY lang
    """,
    tier="P1",
    doc="Per-language doc count, average chars, average token count.",
)
def q_text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4

    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        r4(F.avg("n_chars")).alias("avg_chars"),
        r4(F.avg(F.size(F.split(F.col("text"), " ")))).alias("avg_tokens"),
    )


@register(
    "q_tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      FROM documents
    ), tf AS (
      SELECT lang, token, count(*) AS tf
      FROM tok GROUP BY lang, token
    ), df AS (
      SELECT token, count(DISTINCT doc_id) AS df
      FROM tok GROUP BY token
    ), n AS (
      SELECT count(*) AS n FROM documents
    ), scored AS (
      SELECT lang, tf.token AS token,
             floor((CAST(tf AS DOUBLE)
                    * ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)))
                   * 1000000 + 0.5) / 1000000 AS score
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    )
    SELECT lang, token, score
    FROM (
      SELECT lang, token, score,
             row_number() OVER (PARTITION BY lang
                                ORDER BY score DESC, token) AS rn
      FROM scored
    )
    WHERE rn <= 5
    """,
    tier="P1",
    doc="Exact arithmetic TF-IDF (never HashingTF — must hash-match): "
    "tf = corpus-wide term count per (lang, token); idf = ln(N/df) with "
    "df the distinct-doc count. Because idf is constant per token the "
    "score is (sum of integer tfs) * ln(N/df) — a single float multiply, "
    "so no float-summation order exists and the result is "
    "bit-deterministic. Top-5 per lang, token tiebreak.",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.helpers import r6

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    tf = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "token",
            r6(
                F.col("tf").cast("double")
                * F.log(F.col("n").cast("double") / F.col("df").cast("double"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.select("lang", "token", "score", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 5)
        .select("lang", "token", "score")
    )


# Vocabulary width (distinct tokens) at or below which the near-dup
# pair scan switches to the BITSET path: each doc's distinct-token
# set packs into one int64 mask (bits 0..62), intersection size is
# bit_count(a & b), and the whole verify collapses to codegen'd
# integer ops on 8-byte payloads. The gate exists because prefix
# filtering is provably USELESS on tiny vocabularies — the r12
# profile measured the ppjoin path emitting 619 835 candidates out of
# a possible 622 500 same-source pairs at sf0.1 (31-token vocab:
# every prefix shares tokens with nearly every other doc), then
# paying ~4 s of array_intersect on string arrays; the bitset scan
# does the same pair coverage on masks for ~5x less total wall
# (8.4 s -> 1.6 s, SCALE.md round 12). 63 not 64: bits 0..62 keep the
# mask sum inside signed int64.
ND_BITSET_VOCAB_MAX = 63


def _doc_masks(dt: DataFrame, tok_df: DataFrame) -> DataFrame:
    """(doc_id, source, mask, n_tok) with each doc's distinct-token
    set packed into one int64 mask. Deterministic bit index per token
    (alphabetical — the global window runs over the <= 63-row
    vocabulary, bounded by ND_BITSET_VOCAB_MAX's gate, never by data
    volume); the index attaches by broadcast so docs never shuffle on
    token in this path."""
    idx = tok_df.select(
        "token",
        (F.row_number().over(Window.orderBy("token")) - 1).alias("bit"),
    )
    return (
        dt.join(F.broadcast(idx), "token")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.expr("CAST(1 AS BIGINT) << bit")).alias("mask"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )


def _mask_pairs(masks: DataFrame) -> DataFrame:
    """Same-source unordered doc pairs over the mask frame, with the
    exact intersection size bit_count(ma & mb) — the shared verify of
    both bitset paths (Jaccard and containment)."""
    a = masks.select(
        F.col("doc_id").alias("id_lo"),
        "source",
        F.col("mask").alias("ma"),
        F.col("n_tok").alias("na"),
    )
    b = masks.select(
        F.col("doc_id").alias("id_hi"),
        F.col("source").alias("sb"),
        F.col("mask").alias("mb"),
        F.col("n_tok").alias("nb"),
    )
    return a.join(
        b, (F.col("source") == F.col("sb")) & (F.col("id_lo") < F.col("id_hi"))
    ).withColumn(
        "n_inter", F.bit_count(F.col("ma").bitwiseAND(F.col("mb"))).cast("long")
    )


def _neardup_bitset(dt: DataFrame, tok_df: DataFrame) -> DataFrame:
    """Small-vocabulary exact-Jaccard pair scan: one int64 mask per
    doc, same-source pair join with bit_count(ma & mb) as the
    intersection. Bit-identical to the ppjoin path (pytest forces
    both on the same corpus): n_inter is the same integer, the J
    divide is the same IEEE op."""
    from ..functions.helpers import r4

    pairs = _mask_pairs(_doc_masks(dt, tok_df))
    n_inter = F.col("n_inter")
    j = n_inter.cast("double") / (F.col("na") + F.col("nb") - n_inter)
    return (
        pairs.where(j >= 0.6)
        .select("id_lo", "id_hi", r4(j).alias("jaccard"))
    )


def _containment_bitset(dt: DataFrame, tok_df: DataFrame) -> DataFrame:
    """Small-vocabulary asymmetric-containment scan — same mask frame,
    C = n_inter / min(na, nb) >= 0.7. Bit-identical to the asymmetric
    ppjoin path (pytest-forced)."""
    from ..functions.helpers import r4

    pairs = _mask_pairs(_doc_masks(dt, tok_df))
    c = F.col("n_inter").cast("double") / F.least("na", "nb")
    return (
        pairs.where(c >= 0.7)
        .select(
            "id_lo",
            "id_hi",
            F.least("na", "nb").cast("long").alias("n_small"),
            r4(c).alias("containment"),
        )
    )


@register(
    "q_neardup_jaccard",
    oracle="""
    WITH dt AS (
      SELECT DISTINCT doc_id, source, token
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
            FROM documents)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_tok FROM dt GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_lo, b.doc_id AS id_hi, count(*) AS n_inter
      FROM dt a JOIN dt b
        ON a.token = b.token AND a.source = b.source
       AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_lo, id_hi,
           floor((CAST(n_inter AS DOUBLE)
                  / (sa.n_tok + sb.n_tok - n_inter)) * 10000 + 0.5) / 10000
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_lo
    JOIN sizes sb ON sb.doc_id = id_hi
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter) >= 0.6
    """,
    tier="P1",
    doc="Exact near-duplicate pairs: Jaccard over distinct-token sets "
    "with same-source blocking (the natural blocking key: 20 sources), "
    "J >= 0.6. All arithmetic is integer counts + one float divide, so "
    "cross-engine bit-deterministic. This is the ground truth the "
    "MinHash-LSH scale path (q_dedup_minhash_lsh) is checked against. "
    "TWO measured paths behind one vocabulary gate (r12): at <= 63 "
    "distinct tokens the per-doc sets pack into int64 BITSET masks and "
    "the same-source pair scan verifies with bit_count(a & b) — prefix "
    "filtering cannot help there (the r12 profile measured 619 835 of "
    "622 500 possible same-source pairs surviving the prefix filter on "
    "the 31-token corpus) and the mask scan is ~5x faster end-to-end. "
    "Above the gate, candidate generation is PREFIX-FILTERED "
    "(ppjoin-style, VERDICT r2 item 5): tokens are globally ordered by "
    "(document-frequency asc, token asc) and each doc joins only on "
    "its first n - ceil(0.6*n) + 1 rarest tokens. Lossless at "
    "J >= 0.6 — if J(A,B) >= t, the globally-rarest common token sits "
    "inside both prefixes (all common tokens would otherwise fit in a "
    "suffix of size ceil(t*n)-1 < |A∩B|) — and the hot stopwords that "
    "made the naive token self-join O(df^2) sort LAST, so they never "
    "enter the join. Verification is per-candidate-pair "
    "array_intersect on the (per-doc, bounded) token sets. Prefix "
    "length uses integer arithmetic (n - (3n+4) div 5 + 1) to dodge "
    "FP ceil(0.6*5)=4. Both paths produce bit-identical pairs "
    "(pytest-forced); the 100 TB story is per-path: big vocabularies "
    "take ppjoin (stopwords never join), tag/label/enum-like corpora "
    "take the mask scan (8-byte payloads, one broadcastable index).",
)
def q_neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4

    d = load_table(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).distinct()
    tok_df = dt.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # Path gate: one scalar over the (already tiny) vocabulary
    # aggregate — same driver-control discipline as the graph loops'
    # convergence scalars. See ND_BITSET_VOCAB_MAX for the measured
    # rationale; both paths are bit-identical (pytest-forced).
    # Measured gate cost on the big-vocab (ppjoin) path: 0.58 s of a
    # 7.0 s x8 replica run (~6%) — and persisting tok_df to "reuse"
    # the gate's materialization was tried and REVERTED: the 248-row
    # InMemoryRelation demoted the downstream df-attach join off the
    # broadcast plan and cost +2.5 s at x8 (9.51 s vs 7.04 s
    # min-of-3). A fresh recompute stays inside whole-stage codegen
    # with a broadcast; the gate scan is the cheaper evil.
    if tok_df.count() <= ND_BITSET_VOCAB_MAX:
        return _neardup_bitset(dt, tok_df)
    ranked = (
        dt.join(tok_df, "token")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "token")
            ),
        )
        .withColumn(
            "n_tok", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
    )
    # prefix length n - ceil(0.6n) + 1, integer-exact: ceil(3n/5) = (3n+4) div 5
    pre = ranked.where(
        F.col("rn") <= F.col("n_tok") - F.expr("(3 * n_tok + 4) div 5") + 1
    ).select("doc_id", "source", "token")
    cand = (
        pre.alias("a")
        .join(
            pre.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_lo"), F.col("b.doc_id").alias("id_hi")
        )
        .distinct()
    )
    toksets = dt.groupBy("doc_id").agg(
        F.collect_set("token").alias("toks"), F.count(F.lit(1)).alias("n_tok")
    )
    verified = (
        cand.join(
            toksets.select(
                F.col("doc_id").alias("id_lo"),
                F.col("toks").alias("ta"),
                F.col("n_tok").alias("na"),
            ),
            "id_lo",
        )
        .join(
            toksets.select(
                F.col("doc_id").alias("id_hi"),
                F.col("toks").alias("tb"),
                F.col("n_tok").alias("nb"),
            ),
            "id_hi",
        )
        .withColumn("n_inter", F.size(F.array_intersect("ta", "tb")))
    )
    j = F.col("n_inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    )
    return verified.where(j >= 0.6).select(
        "id_lo", "id_hi", r4(j).alias("jaccard")
    )


@register(
    "q_neardup_containment",
    oracle="""
    WITH dt AS (
      SELECT DISTINCT doc_id, source, token
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
            FROM documents)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_tok FROM dt GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_lo, b.doc_id AS id_hi, count(*) AS n_inter
      FROM dt a JOIN dt b
        ON a.token = b.token AND a.source = b.source
       AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_lo, id_hi,
           CAST(least(sa.n_tok, sb.n_tok) AS BIGINT) AS n_small,
           floor((CAST(n_inter AS DOUBLE)
                  / least(sa.n_tok, sb.n_tok)) * 10000 + 0.5) / 10000
             AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_lo
    JOIN sizes sb ON sb.doc_id = id_hi
    WHERE CAST(n_inter AS DOUBLE) / least(sa.n_tok, sb.n_tok) >= 0.7
    """,
    tier="P1",
    doc="Sub-document duplication via the CONTAINMENT / overlap "
    "coefficient |A∩B| / min(|A|,|B|) >= 0.7 — the measure that "
    "catches a short document embedded verbatim inside a long one, "
    "which symmetric Jaccard structurally misses (a 50-token quote "
    "inside a 5000-token page has J≈0.01 but containment 1.0); the "
    "standard boilerplate/quotation rung of an LLM dedup ladder next "
    "to q_neardup_jaccard. Candidates are prefix-filtered for the "
    "ASYMMETRIC threshold: each doc's rarest n - ceil(0.7n) + 1 "
    "tokens (integer-exact (7n+9) div 10) join against the OTHER "
    "side's full token list — lossless, because if C(A,B) >= t the "
    "globally-rarest common token cannot fit inside the smaller set's "
    "size-(ceil(t*n)-1) suffix; hot stopwords never appear in any "
    "prefix, so they never become join keys (the full side only "
    "contributes occurrences of rare tokens). All arithmetic is "
    "integer counts + one IEEE divide — cross-engine bit-exact. "
    "100 TB: same-source blocking bounds the join, the verify step "
    "intersects bounded per-doc token sets, and text never shuffles "
    "past tokenization.",
)
def q_neardup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4

    d = load_table(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).distinct()
    tok_df = dt.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # Same vocabulary gate as q_neardup_jaccard (r12): the shared
    # mask frame verifies containment with bit_count; both paths are
    # bit-identical (pytest-forced).
    if tok_df.count() <= ND_BITSET_VOCAB_MAX:
        return _containment_bitset(dt, tok_df)
    ranked = (
        dt.join(tok_df, "token")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "token")
            ),
        )
        .withColumn(
            "n_tok", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
    )
    # prefix length n - ceil(0.7n) + 1, integer-exact: ceil(7n/10) = (7n+9) div 10
    pre = ranked.where(
        F.col("rn") <= F.col("n_tok") - F.expr("(7 * n_tok + 9) div 10") + 1
    ).select("doc_id", "source", "token")
    # asymmetric candidate join: either side's PREFIX against the other
    # side's FULL token list (pair normalized to id_lo < id_hi)
    cand = (
        pre.alias("a")
        .join(
            dt.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("id_lo"),
            F.greatest("a.doc_id", "b.doc_id").alias("id_hi"),
        )
        .distinct()
    )
    toksets = dt.groupBy("doc_id").agg(
        F.collect_set("token").alias("toks"), F.count(F.lit(1)).alias("n_tok")
    )
    verified = (
        cand.join(
            toksets.select(
                F.col("doc_id").alias("id_lo"),
                F.col("toks").alias("ta"),
                F.col("n_tok").alias("na"),
            ),
            "id_lo",
        )
        .join(
            toksets.select(
                F.col("doc_id").alias("id_hi"),
                F.col("toks").alias("tb"),
                F.col("n_tok").alias("nb"),
            ),
            "id_hi",
        )
        .withColumn("n_inter", F.size(F.array_intersect("ta", "tb")))
        .withColumn("n_small", F.least("na", "nb").cast("long"))
    )
    c = F.col("n_inter").cast("double") / F.col("n_small")
    return verified.where(c >= 0.7).select(
        "id_lo", "id_hi", "n_small", r4(c).alias("containment")
    )


FEATURE_HASH_DIM = 64  # buckets in the hashed feature space


@register(
    "q_text_feature_hashing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    bucketed AS (
      SELECT lang, token,
             CAST('0x' || substr(md5(token), 1, 4) AS BIGINT)
               % {FEATURE_HASH_DIM} AS bucket
      FROM tok
    )
    SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           count(*) AS tf,
           CAST(count(DISTINCT token) AS BIGINT) AS n_distinct_tokens
    FROM bucketed
    GROUP BY lang, bucket
    """,
    tier="P1",
    doc="Feature hashing (the 'hashing trick') — the fixed-dimension "
    "featurizer behind fast quality classifiers and fastText-style "
    "models: every token maps to one of 64 buckets via a stateless "
    "hash (first 2 md5 bytes mod D — engine-independent, so the "
    "oracle reproduces the exact bucketing), giving a bounded "
    "per-language term-frequency matrix with NO vocabulary to build, "
    "broadcast, or version. The n_distinct_tokens column makes the "
    "collision rate observable (the dimension/collision tradeoff the "
    "hashing trick accepts). 100 TB: vocabulary-free means no "
    "global dictionary stage at all — the whole featurization is one "
    "map + one (lang, bucket) groupBy whose output is D rows per "
    "language regardless of corpus size; the same bucketing keys a "
    "per-doc sparse vector for model input (q_mllib_train_pipeline's "
    "assembler consumes the dense twin).",
)
def q_text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("token").cast("binary")), 1, 4), 16, 10)
        .cast("long")
        % FEATURE_HASH_DIM
    )
    return (
        tok.withColumn("bucket", bucket)
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct("token").alias("n_distinct_tokens"),
        )
    )


def _threshold_curve_rollup(d: DataFrame, verified: DataFrame) -> DataFrame:
    """Shared tail of both threshold-curve paths: per-source
    conditional counts over (source, n_inter, na, nb) pair rows,
    anchored on the FULL source list — a source whose candidate set
    is empty (or all below 0.6) must still appear with zero counts,
    so row presence never depends on either path's candidate recall."""
    jac = F.col("n_inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    )

    def at(t):
        return F.sum(F.when(jac >= t, 1).otherwise(0)).cast("long")

    counts = verified.groupBy("source").agg(
        at(0.6).alias("n_pairs_06"),
        at(0.7).alias("n_pairs_07"),
        at(0.8).alias("n_pairs_08"),
        at(0.9).alias("n_pairs_09"),
    )
    sources = d.select("source").distinct()
    z = F.lit(0).cast("long")
    return sources.join(counts, "source", "left").select(
        "source",
        *[
            F.coalesce(c, z).alias(c)
            for c in ("n_pairs_06", "n_pairs_07", "n_pairs_08", "n_pairs_09")
        ],
    )


@register(
    "q_dedup_threshold_curve",
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
      GROUP BY a.doc_id, b.doc_id, a.source
    ), j AS (
      SELECT source,
             CAST(n_inter AS DOUBLE)
               / (sa.n_tok + sb.n_tok - n_inter) AS jac
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_lo
      JOIN sizes sb ON sb.doc_id = id_hi
    )
    SELECT s.source,
           CAST(coalesce(sum(CASE WHEN jac >= 0.6 THEN 1 END), 0) AS BIGINT)
             AS n_pairs_06,
           CAST(coalesce(sum(CASE WHEN jac >= 0.7 THEN 1 END), 0) AS BIGINT)
             AS n_pairs_07,
           CAST(coalesce(sum(CASE WHEN jac >= 0.8 THEN 1 END), 0) AS BIGINT)
             AS n_pairs_08,
           CAST(coalesce(sum(CASE WHEN jac >= 0.9 THEN 1 END), 0) AS BIGINT)
             AS n_pairs_09
    FROM (SELECT DISTINCT source FROM documents) s
    LEFT JOIN j ON j.source = s.source
    GROUP BY s.source
    """,
    tier="P1",
    doc="Dedup threshold tuning curve — the artifact that decides J "
    "before a corpus-wide dedup pass: per source block, near-dup "
    "pair counts at J >= 0.6/0.7/0.8/0.9 from ONE candidate "
    "generation (the ppjoin prefix filter runs once at the LOOSEST "
    "threshold, which is lossless for every tighter one — the curve "
    "costs no more than a single-threshold run). All thresholds "
    "compare an exact integer-ratio divide, so the curve is "
    "bit-deterministic. 100 TB: this is the sweep a data team runs "
    "on a sample to pick the production threshold; the plan is the "
    "q_neardup_jaccard plan with four conditional counts folded "
    "into the final rollup.",
)
def q_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).distinct()
    tok_df = dt.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if tok_df.count() <= ND_BITSET_VOCAB_MAX:
        # r12 vocabulary gate: the mask-pair frame carries source,
        # n_inter, na, nb directly; extra below-0.6 pairs it emits
        # (the ppjoin path never generates them) fall out of every
        # at(t) conditional count, so the curve is bit-identical.
        return _threshold_curve_rollup(d, _mask_pairs(_doc_masks(dt, tok_df)))
    ranked = (
        dt.join(tok_df, "token")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "token")
            ),
        )
        .withColumn(
            "n_tok", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
    )
    # prefix for the loosest threshold 0.6: n - ceil(0.6n) + 1
    pre = ranked.where(
        F.col("rn") <= F.col("n_tok") - F.expr("(3 * n_tok + 4) div 5") + 1
    ).select("doc_id", "source", "token")
    cand = (
        pre.alias("a")
        .join(
            pre.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_lo"),
            F.col("b.doc_id").alias("id_hi"),
            F.col("a.source").alias("source"),
        )
        .distinct()
    )
    toksets = dt.groupBy("doc_id").agg(
        F.collect_set("token").alias("toks"), F.count(F.lit(1)).alias("n_tok")
    )
    verified = (
        cand.join(
            toksets.select(
                F.col("doc_id").alias("id_lo"),
                F.col("toks").alias("ta"),
                F.col("n_tok").alias("na"),
            ),
            "id_lo",
        )
        .join(
            toksets.select(
                F.col("doc_id").alias("id_hi"),
                F.col("toks").alias("tb"),
                F.col("n_tok").alias("nb"),
            ),
            "id_hi",
        )
        .withColumn("n_inter", F.size(F.array_intersect("ta", "tb")))
    )
    return _threshold_curve_rollup(d, verified)


@register(
    "q_dedup_source_precedence",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, source,
             md5(array_to_string(list_slice(string_split(text, ' '), 1, 5),
                                 ' ')) AS h,
             CAST(substr(source, 4) AS BIGINT) AS src_rank
      FROM documents
    ),
    decided AS (
      SELECT h, min(src_rank) AS keep_rank, count(*) AS n_copies
      FROM hashed GROUP BY h
    )
    SELECT k.source AS kept_source, d.source AS dropped_source,
           CAST(count(*) AS BIGINT) AS n_dropped
    FROM hashed d
    JOIN decided dec ON dec.h = d.h
    JOIN hashed k ON k.h = d.h AND k.src_rank = dec.keep_rank
    WHERE d.src_rank <> dec.keep_rank
    GROUP BY k.source, d.source
    """,
    tier="P1",
    doc="Source-precedence dedup — the cross-source conflict rule "
    "every multi-corpus assembly needs (curated > web > crawl: when "
    "the same text appears in several sources, keep the "
    "highest-priority copy and drop the rest): documents group by "
    "their leading fingerprint (md5 of the first 5 tokens — the "
    "syndicated-prefix key, colliding exactly when two sources host "
    "the same opening even if the tails diverge; full-content "
    "md5(text) is the same plan with a longer key and has zero "
    "collisions below sf0.1 in these fixtures), each "
    "group keeps its minimum source rank (the fixture's srcNN "
    "suffix is the precedence order), and the emitted "
    "(kept_source, dropped_source) matrix is the audit a data team "
    "reads to see which corpus is shadowing which. Shuffles move "
    "(hash, source-rank) pairs, never text; the decide step is one "
    "groupBy(h) and the attribution joins are equi on h. At 100 TB "
    "this runs right after q_dedup_url_canonical and before the "
    "near-dup ladder — precedence among EXACT copies is free once "
    "content hashes exist, and the same min-rank pattern extends to "
    "near-dup clusters via q_dedup_components' component id.",
)
def q_dedup_source_precedence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(
            F.array_join(F.slice(F.split(F.col("text"), " "), 1, 5), " ")
        ).alias("h"),
        F.substring("source", 4, 10).cast("long").alias("src_rank"),
    )
    decided = d.groupBy("h").agg(
        F.min("src_rank").alias("keep_rank"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    keepers = d.select(
        F.col("h").alias("kh"),
        F.col("src_rank").alias("k_rank"),
        F.col("source").alias("kept_source"),
    )
    return (
        d.join(decided, "h")
        .where(F.col("src_rank") != F.col("keep_rank"))
        .join(
            keepers,
            (F.col("h") == F.col("kh"))
            & (F.col("k_rank") == F.col("keep_rank")),
        )
        .groupBy("kept_source", F.col("source").alias("dropped_source"))
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )


def _set_pair_counts(
    sets: DataFrame, col: str, lo: str, hi: str
) -> DataFrame:
    """(lo, hi, count) over a frame of sorted distinct-value arrays:
    one row per ordered pair (i < j) of each array PLUS one singleton
    marker row (lo = hi = v) per element, counted across the frame in
    a single groupBy. The single-pass core of the r14 overlap-matrix /
    common-neighbors rewrites: pair co-occurrence counts AND per-value
    totals fall out of one aggregation over a bounded key space
    (|values| + C(|values|, 2) groups), replacing a distinct +
    self-join that shuffled the full relation twice more and re-ran
    its subtree per consumer. The sorted array's (i < j) pairs are
    exactly the self-join's a < b rows; singletons cannot collide with
    pairs because pair rows are strictly lo < hi.

    PRECONDITIONS (ADVICE r14 item 1): the grouping key and array
    values must be NON-NULL, and per-hash value arrays must be a
    BOUNDED enum (|values| small — ~8 sources / 5 event types here).
    Equivalence to the distinct + self-join breaks under NULLs:
    collect_set upstream drops NULL values (losing their singleton
    rows) and groupBy merges NULL keys into one group (pairing rows an
    equi-join could never pair, since NULL == NULL is false). An
    UNBOUNDED value domain would make the per-array pair explosion the
    quadratic anti-pattern this helper exists to avoid."""
    return (
        sets.select(
            F.explode(
                F.expr(
                    f"concat("
                    f"transform({col}, a -> struct(a AS {lo}, a AS {hi})), "
                    f"flatten(transform({col}, (a, i) -> "
                    f"transform(slice({col}, i + 2, size({col})), "
                    f"b -> struct(a AS {lo}, b AS {hi})))))"
                )
            ).alias("pair")
        )
        .groupBy(
            F.col(f"pair.{lo}").alias(lo),
            F.col(f"pair.{hi}").alias(hi),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _source_shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(h, ss) — per 5-token shingle digest, the sorted SET of corpus
    sources containing it. The corpus subtree of the r14 overlap-matrix
    rewrite, factored out so tests/test_plans.py pins the OPERATOR'S
    subtree rather than a copy-pasted rebuild (ADVICE r14 item 3).

    Plan rationale (guide §2.3/§2.4 — aggregate before you shuffle;
    remove the payload self-join): the r13 form DISTINCTed (source, h)
    and then SELF-JOINED it on h, which (a) executed the explode+md5
    shingle subtree FOUR times (tf lane a/b + both denominator lanes —
    four Generate nodes in the before-plan) and (b) broadcast the
    corpus-sized distinct relation, a shape that flips to a double SMJ
    of exploded rows the moment the corpus outgrows the broadcast cap.
    Sources are a bounded enum (|sources| ~ 20), so the per-hash source
    SET is itself bounded: ONE exchange on the 16-byte digest with
    map-side partial collect_set replaces the distinct + self-join, and
    both the pair counts and the per-source denominators derive from
    that single aggregated frame. Shingle identities cross the exchange
    as unhex(md5) digests — half the bytes of the hex string, bijective
    (the r14 corpus-pipeline precedent)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.split("text", " ").alias("w")
    ).where(F.size("w") >= 5)
    return (
        toks.select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 5), "
                    "i -> unhex(md5(concat_ws(' ', w[i], w[i+1], w[i+2], "
                    "w[i+3], w[i+4]))))"
                )
            ).alias("h"),
        )
        .groupBy("h")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
    )


@register(
    "q_corpus_overlap_matrix",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT source,
             md5(string_split(text, ' ')[i] || ' '
                 || string_split(text, ' ')[i + 1] || ' '
                 || string_split(text, ' ')[i + 2] || ' '
                 || string_split(text, ' ')[i + 3] || ' '
                 || string_split(text, ' ')[i + 4]) AS h
      FROM documents,
           unnest(generate_series(1,
                  len(string_split(text, ' ')) - 4)) AS t(i)
      WHERE len(string_split(text, ' ')) >= 5
    ),
    tot AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_shingles
      FROM sh GROUP BY source
    ),
    p AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS shared
      FROM sh a JOIN sh b
        ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, shared,
           ta.n_shingles AS n_a, tb.n_shingles AS n_b,
           floor(CAST(shared AS DOUBLE)
                 / least(ta.n_shingles, tb.n_shingles)
                 * 1000000 + 0.5) / 1000000 AS overlap_coef
    FROM p
    JOIN tot ta ON ta.source = p.src_a
    JOIN tot tb ON tb.source = p.src_b
    ORDER BY src_a, src_b
    """,
    tier="P1",
    doc="Cross-source contamination matrix — for every pair of corpus "
    "sources, the count of shared distinct 5-token shingle hashes "
    "and the overlap coefficient shared/min(|A|,|B|): the "
    "corpus-governance rollup ('how much of source X is already in "
    "source Y?') that decides source precedence and dedup budgets "
    "BEFORE any per-document pass (q_dedup_source_precedence then "
    "acts per document; q_decontaminate_ngrams is the train/test "
    "special case). Per-source DISTINCT collapses each shingle to "
    "one row before the self-join, so the join carries 16-byte "
    "hashes with fan-out bounded by |sources| per hash; output is "
    "|sources| choose 2. Exact int64 counts; one IEEE divide.",
)
def q_corpus_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r6

    # Output bit-identical to the r13 distinct + self-join: the sorted
    # set's (i < j) pairs are exactly the join's a.source < b.source
    # rows, and n_shingles is the same distinct-(source, h) count.
    sets = _source_shingle_sets(spark, sf_dir)
    # Singleton markers (src_a = src_b = s, impossible for a pair row
    # where src_a < src_b strictly) ride the SAME explode as the
    # pairs, so denominators and pair counts fall out of one groupBy;
    # the result is bounded by |sources| + C(|sources|, 2) rows and a
    # localCheckpoint lets both consumers split it without re-running
    # the corpus subtree.
    cnt = (
        _set_pair_counts(sets, "ss", "src_a", "src_b")
        .withColumnRenamed("n", "shared")
        .localCheckpoint()
    )
    tot = cnt.where(F.col("src_a") == F.col("src_b")).select(
        F.col("src_a").alias("source"), F.col("shared").alias("n_shingles")
    )
    p = cnt.where(F.col("src_a") != F.col("src_b"))
    ta = F.broadcast(tot.select(F.col("source").alias("src_a"),
                                F.col("n_shingles").alias("n_a")))
    tb = F.broadcast(tot.select(F.col("source").alias("src_b"),
                                F.col("n_shingles").alias("n_b")))
    return (
        p.join(ta, "src_a")
        .join(tb, "src_b")
        .select(
            "src_a",
            "src_b",
            "shared",
            "n_a",
            "n_b",
            r6(
                F.col("shared").cast("double")
                / F.least("n_a", "n_b")
            ).alias("overlap_coef"),
        )
        .orderBy("src_a", "src_b")
    )


@register(
    "q_text_vocab_growth",
    oracle="""
    WITH mx AS (
      SELECT CAST(max(doc_id) AS BIGINT) AS max_id FROM documents
    ),
    first_seen AS (
      SELECT token, CAST(min(doc_id) AS BIGINT) AS fs
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents)
      GROUP BY token
    ),
    newv AS (
      SELECT fs * 10 // (max_id + 1) AS decile,
             CAST(count(*) AS BIGINT) AS new_tokens
      FROM first_seen CROSS JOIN mx
      GROUP BY 1
    ),
    docs AS (
      SELECT doc_id * 10 // (max_id + 1) AS decile,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM documents CROSS JOIN mx
      GROUP BY 1
    )
    SELECT CAST(d.decile AS BIGINT) AS decile,
           d.n_docs,
           CAST(sum(d.n_docs) OVER w AS BIGINT) AS cum_docs,
           COALESCE(v.new_tokens, 0) AS new_tokens,
           CAST(sum(COALESCE(v.new_tokens, 0)) OVER w AS BIGINT)
             AS cum_vocab
    FROM docs d LEFT JOIN newv v ON v.decile = d.decile
    WINDOW w AS (ORDER BY d.decile ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
    ORDER BY decile
    """,
    tier="P1",
    doc="Vocabulary growth curve (Heaps' law) — cumulative distinct "
    "vocabulary as the corpus grows through 10 id-space deciles, "
    "the corpus-health curve that says whether more data still "
    "buys new types (tokenizer coverage planning, dedup sanity: a "
    "flat tail on a 'growing' corpus means the new data is "
    "copies). Computed WITHOUT re-scanning any prefix: each "
    "token's FIRST-SEEN doc id (a min aggregate) assigns it to "
    "the decile where it enters the vocabulary, and the cumulative "
    "curve is a prefix sum over the 10-row rollup — one tokenize "
    "pass total, versus the naive 10 passes with growing DISTINCT "
    "scopes. Decile ids via exact integer div of the id space "
    "(Spark div == DuckDB //). Exact int64 everywhere; no floats "
    "at all.",
)
def q_text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").cast("long").alias("max_id"))
    first_seen = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.min("doc_id").cast("long").alias("fs"))
    )
    newv = (
        first_seen.crossJoin(F.broadcast(mx))
        .groupBy(F.expr("fs * 10 div (max_id + 1)").alias("decile"))
        .agg(F.count(F.lit(1)).alias("new_tokens"))
    )
    docs = (
        d.crossJoin(F.broadcast(mx))
        .groupBy(F.expr("doc_id * 10 div (max_id + 1)").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        docs.join(newv, "decile", "left")
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_docs",
            F.sum("n_docs").over(w).alias("cum_docs"),
            F.coalesce("new_tokens", F.lit(0)).alias("new_tokens"),
            F.sum(F.coalesce("new_tokens", F.lit(0)))
            .over(w)
            .alias("cum_vocab"),
        )
        .orderBy("decile")
    )


def _gram5_count_kernel(batches):
    """Arrow batch kernel: (doc_id, text) -> per-(doc, 5-gram digest)
    position counts (doc_id, h, k). hashlib md5 == Spark md5 byte for
    byte; digests are the bijective narrow encoding of the hex
    strings, and in-kernel counting removes per-position explode rows
    from the Python->JVM transfer."""
    import hashlib
    from collections import Counter

    import pyarrow as pa

    md5 = hashlib.md5
    for b in batches:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out_id: list[int] = []
        out_h: list[bytes] = []
        out_k: list[int] = []
        for did, tx in zip(ids, texts):
            if tx is None:
                continue
            w = tx.split(" ")
            if len(w) < 5:
                continue
            c = Counter(
                md5(" ".join(w[i : i + 5]).encode()).digest()
                for i in range(len(w) - 4)
            )
            for h, k in c.items():
                out_id.append(did)
                out_h.append(h)
                out_k.append(k)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_id, pa.int64()),
                pa.array(out_h, pa.binary()),
                pa.array(out_k, pa.int64()),
            ],
            names=["doc_id", "h", "k"],
        )


@register(
    "q_corpus_novelty_curve",
    oracle="""
    WITH mx AS (
      SELECT CAST(max(doc_id) AS BIGINT) AS max_id FROM documents
    ),
    sh AS (
      SELECT doc_id,
             md5(string_split(text, ' ')[i] || ' '
                 || string_split(text, ' ')[i + 1] || ' '
                 || string_split(text, ' ')[i + 2] || ' '
                 || string_split(text, ' ')[i + 3] || ' '
                 || string_split(text, ' ')[i + 4]) AS h
      FROM documents,
           unnest(generate_series(1,
                  len(string_split(text, ' ')) - 4)) AS t(i)
      WHERE len(string_split(text, ' ')) >= 5
    ),
    first_seen AS (
      SELECT h, CAST(min(doc_id) AS BIGINT) AS fs
      FROM sh GROUP BY h
    ),
    per_dec AS (
      SELECT sh.doc_id * 10 // (max_id + 1) AS decile,
             count(*) AS n_shingles,
             CAST(sum(CASE WHEN f.fs = sh.doc_id
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_first
      FROM sh JOIN first_seen f ON f.h = sh.h
      CROSS JOIN mx
      GROUP BY 1
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_shingles AS BIGINT) AS n_shingles,
           n_first AS n_novel,
           CAST(floor(CAST(n_first AS DOUBLE) / n_shingles
                      * 1000000 + 0.5) AS BIGINT) AS novelty_ppm
    FROM per_dec ORDER BY decile
    """,
    tier="P1",
    doc="Marginal novelty curve — per id-space decile, the share of "
    "its 5-token shingle OCCURRENCES whose first appearance in the "
    "whole corpus is in that very document ('is new data still new, "
    "or are we re-ingesting?'): the decision input for stopping "
    "collection or raising dedup aggressiveness, and the "
    "shingle-level companion of q_text_vocab_growth's type-level "
    "curve. A shingle occurrence counts as novel iff its corpus-"
    "wide min(doc_id) equals its own doc — one min-aggregate + one "
    "equi-join on the 16-byte hash, never a prefix re-scan per "
    "decile. Exact int64 counts; the ppm share is one exact-int "
    "divide per output row (10 rows at any corpus size).",
)
def q_corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").cast("long").alias("max_id"))
    # r14 (guide §4.2 + §2.3): per-(doc, 5-gram) counts come from one
    # vectorized mapInArrow kernel and are localCheckpointed — the r13
    # Column form's explode subtree was consumed TWICE (first-seen min
    # + the decile join), re-running the 5-wide interpreted HOF chain
    # per consumer; measured 1.9/2.7 s -> 1.3/1.6 s at sf0.1, output
    # bit-identical (pytest-forced). Checkpoint rows are (8-byte id,
    # 16-byte digest, count) — text never persists or shuffles.
    sh = (
        d.select("doc_id", "text")
        .mapInArrow(_gram5_count_kernel, schema="doc_id long, h binary, k long")
        .localCheckpoint()
    )
    first_seen = sh.groupBy("h").agg(
        F.min("doc_id").cast("long").alias("fs")
    )
    per_dec = (
        sh.join(first_seen, "h")
        .crossJoin(F.broadcast(mx))
        .groupBy(F.expr("doc_id * 10 div (max_id + 1)").alias("decile"))
        .agg(
            F.sum("k").alias("n_shingles"),
            F.sum(
                F.when(F.col("fs") == F.col("doc_id"), F.col("k")).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per_dec.select(
        F.col("decile").cast("long").alias("decile"),
        "n_shingles",
        "n_novel",
        F.floor(
            F.col("n_novel").cast("double")
            / F.col("n_shingles")
            * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("novelty_ppm"),
    ).orderBy("decile")
