"""LLM-training-data pipeline operators over ``documents`` — the
north-star extensions beyond the reference's own surface: language ID,
quality scoring, tokenizer-style counting, content fingerprinting, and
SimHash near-dup bucketing.

All five are hash-checked against DuckDB oracles: every computation is
expressed in integer arithmetic, md5 (identical across engines), and
single float divides, so no cross-engine float noise exists.

Scale posture: each operator is a single projection or one groupBy —
per-document work parallelizes embarrassingly; the SimHash collision
grouping shuffles 2-byte signatures, never documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.helpers import sql_r
from ..plans.registry import register
from ..sources.tables import load_table

# Stopword-voting language ID. The structure is the standard top-K
# stopword/n-gram voter; the marker sets are drawn from the fixture's
# 31-token synthetic vocabulary (real deployments swap in per-language
# stopword lists — the plan shape is identical). Sets are disjoint.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "order", "table"),
    "fr": ("scan", "data", "batch"),
    "es": ("slow", "agg", "merge"),
    "de": ("customer", "hash", "join"),
    "zh": ("small", "row", "column"),
}

QUALITY_STOPWORDS = ("the", "a", "key", "value", "data")


def _hits(tokens, markers: tuple[str, ...]):
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def _sql_hits(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"''{m}''" for m in markers).replace("''", "'")
    return (
        f"len(list_filter(string_split(text, ' '), "
        f"t -> list_contains([{lst}], t)))"
    )


@register(
    "q_text_langid",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_sql_hits(LANG_MARKERS['en'])} AS h_en,
             {_sql_hits(LANG_MARKERS['fr'])} AS h_fr,
             {_sql_hits(LANG_MARKERS['es'])} AS h_es,
             {_sql_hits(LANG_MARKERS['de'])} AS h_de,
             {_sql_hits(LANG_MARKERS['zh'])} AS h_zh
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN h_en >= greatest(h_fr, h_es, h_de, h_zh) THEN 'en'
                WHEN h_fr >= greatest(h_es, h_de, h_zh) THEN 'fr'
                WHEN h_es >= greatest(h_de, h_zh) THEN 'es'
                WHEN h_de >= h_zh THEN 'de'
                ELSE 'zh' END AS lang_guess,
           CASE WHEN CASE WHEN h_en >= greatest(h_fr, h_es, h_de, h_zh) THEN 'en'
                          WHEN h_fr >= greatest(h_es, h_de, h_zh) THEN 'fr'
                          WHEN h_es >= greatest(h_de, h_zh) THEN 'es'
                          WHEN h_de >= h_zh THEN 'de'
                          ELSE 'zh' END = lang
                THEN 1 ELSE 0 END AS agrees
    FROM scored
    """,
    tier="P1",
    doc="Language identification via stopword voting (argmax of marker-"
    "token hit counts with a fixed preference order on ties) + "
    "agreement flag against the labeled lang column. Single projection "
    "— no shuffle.",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    hits = {
        lang: _hits(tokens, marks).alias(f"h_{lang}")
        for lang, marks in LANG_MARKERS.items()
    }
    scored = d.select("doc_id", "lang", *hits.values())
    h = {lang: F.col(f"h_{lang}") for lang in LANG_MARKERS}
    guess = (
        F.when(h["en"] >= F.greatest(h["fr"], h["es"], h["de"], h["zh"]), "en")
        .when(h["fr"] >= F.greatest(h["es"], h["de"], h["zh"]), "fr")
        .when(h["es"] >= F.greatest(h["de"], h["zh"]), "es")
        .when(h["de"] >= h["zh"], "de")
        .otherwise("zh")
    )
    return scored.select(
        "doc_id",
        guess.alias("lang_guess"),
        F.when(guess == F.col("lang"), 1).otherwise(0).alias("agrees"),
    )


@register(
    "q_text_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           {sql_r("CAST(n_chars AS DOUBLE) / len(string_split(text, ' '))")}
             AS avg_token_len,
           {sql_r(_sql_hits(QUALITY_STOPWORDS)
                  + " * 1.0 / len(string_split(text, ' '))")} AS stopword_ratio,
           CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 80
                THEN 1 ELSE 0 END AS len_ok
    FROM documents
    """,
    tier="P1",
    doc="Per-document quality features: token count, mean token length, "
    "stopword ratio, length-window flag — the standard pre-training "
    "quality-filter feature set (punctuation/casing features are "
    "degenerate on the all-lowercase fixture vocabulary and omitted).",
)
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4

    d = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    n_tok = F.size(tokens)
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        r4(F.col("n_chars").cast("double") / n_tok).alias("avg_token_len"),
        r4(_hits(tokens, QUALITY_STOPWORDS) * F.lit(1.0) / n_tok).alias(
            "stopword_ratio"
        ),
        F.when((n_tok >= 20) & (n_tok <= 80), 1).otherwise(0).alias("len_ok"),
    )


@register(
    "q_text_token_bpe_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER)
             AS n_re_tokens,
           {sql_r("len(regexp_extract_all(text, '[a-z]+|[0-9]+')) * 1.0"
                  " / len(string_split(text, ' '))")} AS re_per_ws
    FROM documents
    """,
    tier="P1",
    doc="Token counting two ways: whitespace split vs a BPE-ish "
    "pre-tokenizer regex ([a-z]+|[0-9]+ runs — the GPT-2-style "
    "pretoken split restricted to the fixture alphabet) + their ratio.",
)
def q_text_token_bpe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4

    d = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.col("text"), " "))
    re_toks = F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+"), 0))
    return d.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        re_toks.alias("n_re_tokens"),
        r4(re_toks * F.lit(1.0) / ws).alias("re_per_ws"),
    )


def _fp_shingle_kernel(batches):
    """Arrow batch kernel: documents -> (doc_id, md5(text) hex, min
    3-token shingle md5 hex). hashlib md5 hexdigest is byte-identical
    to Spark's md5; min over 32-char hex strings equals min over raw
    digests (the 0-9a-f charset is ascii-monotone in the nibble
    value), so the Column form's array_min is reproduced exactly."""
    import hashlib

    import pyarrow as pa

    md5 = hashlib.md5
    for b in batches:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out_id: list[int] = []
        out_fp: list[str] = []
        out_min: list[str | None] = []
        for did, tx in zip(ids, texts):
            if tx is None:
                continue
            toks = tx.split(" ")
            out_id.append(did)
            out_fp.append(md5(tx.encode()).hexdigest())
            if len(toks) < 3:
                out_min.append(None)
            else:
                out_min.append(
                    min(
                        md5(
                            (
                                toks[i] + " " + toks[i + 1] + " " + toks[i + 2]
                            ).encode()
                        ).hexdigest()
                        for i in range(len(toks) - 2)
                    )
                )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_id, pa.int64()),
                pa.array(out_fp, pa.string()),
                pa.array(out_min, pa.string()),
            ],
            names=["doc_id", "fp", "min_shingle_sig"],
        )


@register(
    "q_doc_fingerprint_shingle",
    oracle="""
    SELECT doc_id,
           md5(text) AS fp,
           list_aggregate(
             list_transform(
               generate_series(1, len(string_split(text, ' ')) - 2),
               i -> md5(string_split(text, ' ')[i] || ' '
                        || string_split(text, ' ')[i + 1] || ' '
                        || string_split(text, ' ')[i + 2])
             ), 'min') AS min_shingle_sig
    FROM documents
    """,
    tier="P1",
    doc="Content fingerprinting: whole-document md5 plus a k=1 MinHash "
    "over 3-token shingles (min of shingle md5s — the rolling-window "
    "signature primitive that MinHash signatures stack on). md5 is "
    "identical across engines, so this hash-checks exactly.",
)
def q_doc_fingerprint_shingle(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14 (guide §4.2): one vectorized mapInArrow pass — the r13
    # Column form paid 3 interpreted element_at HOF evals + one md5
    # per shingle position (Spark does not codegen HOF lambdas);
    # measured 3.9 s -> 0.65 s at sf0.1, output bit-identical
    # (pytest-forced). Map-side only, zero exchanges either way.
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "text").mapInArrow(
        _fp_shingle_kernel,
        schema="doc_id long, fp string, min_shingle_sig string",
    )


def _simhash_kernel(batches):
    """Arrow batch kernel: documents -> (doc_id, simhash16). Per
    distinct token ONE hashlib md5 (byte-identical to Spark's md5),
    votes weighted by the token's occurrence count — exactly the
    per-occurrence vote sum of the Column form; bit b is the parity
    of hex digit b."""
    import hashlib
    from collections import Counter

    import pyarrow as pa

    md5 = hashlib.md5
    for b in batches:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out_id: list[int] = []
        out_sh: list[int] = []
        for did, tx in zip(ids, texts):
            if tx is None:
                continue
            votes = [0] * 16
            for token, k in Counter(tx.split(" ")).items():
                hx = md5(token.encode()).hexdigest()
                for bi in range(16):
                    votes[bi] += k if ord(hx[bi]) % 2 == 1 else -k
            sh = 0
            for bi in range(16):
                if votes[bi] > 0:
                    sh |= 1 << bi
            out_id.append(did)
            out_sh.append(sh)
        yield pa.RecordBatch.from_arrays(
            [pa.array(out_id, pa.int64()), pa.array(out_sh, pa.int64())],
            names=["doc_id", "simhash16"],
        )


@register(
    "q_dedup_simhash",
    oracle="""
    WITH bits AS (
      SELECT doc_id, b.b AS b,
             CASE WHEN sum(CASE WHEN ascii(substr(md5(t.token), b.b + 1, 1)) % 2
                                = 1 THEN 1 ELSE -1 END) > 0
                  THEN 1 ELSE 0 END AS bit
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents) t
      CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) b
      GROUP BY doc_id, b.b
    )
    SELECT doc_id,
           CAST(sum(bit * (1 << b)) AS BIGINT) AS simhash16
    FROM bits
    GROUP BY doc_id
    """,
    tier="P1",
    doc="SimHash(16-bit) near-dup signature: per token, bit b is the "
    "parity of hex digit b of md5(token); per document each bit is the "
    "sign of the token-vote sum — the standard SimHash construction "
    "with md5-derived hyperplanes, fully deterministic cross-engine. "
    "Signature collisions are the near-dup candidate buckets; at "
    "100 TB the groupBy shuffles 2-byte signatures only.",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14 (guide §4.2 + §2.4): one vectorized mapInArrow pass. The r13
    # Column form exploded every token OCCURRENCE x16 bits (~30M rows
    # at sf0.1) through a (doc_id, b) groupBy exchange plus a second
    # (doc_id) exchange; the signature is a per-doc map-side value, so
    # both exchanges are removable outright. One md5 per DISTINCT
    # token per doc, votes weighted by occurrence count — measured
    # 3.9 s -> 0.91 s at sf0.1, output bit-identical (pytest-forced).
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "text").mapInArrow(
        _simhash_kernel, schema="doc_id long, simhash16 long"
    )


N_MINHASH = 16
BAND_SIZE = 4  # 4 bands x 4 rows — the banding that targets J ≈ 0.8


MINHASH_P = 1_000_000_007  # compacting modulus for the derived family

# Stop-bucket cap (VERDICT r7 weak #1): a band signature (or winnowing
# fingerprint) shared by more than this many documents is boilerplate —
# a shared header, a license block, an empty-ish template. Generating
# pairs inside such a bucket is O(n²) in ONE task (10⁶ docs sharing a
# footer → 10¹² pairs); dropping the bucket loses no real near-dup
# signal, because any pair that truly overlaps also collides on its
# non-boilerplate content under other bands/fingerprints. The drop is
# AUDITED: every capped query carries the count of dropped buckets in
# its (hash-checked) output, so the lever is visible in the data card,
# never silent. 64 bounds the worst in-bucket explosion at ~2k pairs
# per bucket while sitting far above any organic fixture bucket
# (measured max 24 at sf0.1, SCALE.md).
LSH_BUCKET_CAP = 64


def _minhash_signatures(d: DataFrame, keep_shingles: bool = False) -> DataFrame:
    """documents -> (doc_id[, mds], m0..m15): the Carter-Wegman banded-
    MinHash signature construction shared by the bands / refine /
    estimator operators — ONE md5 per 3-token shingle split into two
    48-bit halves (h1, h2), family member h derived as (h1 + h*h2) mod P.
    ``keep_shingles`` additionally carries the distinct shingle-hash
    array for exact-Jaccard refinement.

    r14 (guide §4.2): BATCH frames compute the signature in a single
    vectorized mapInArrow kernel — md5 via hashlib (byte-identical to
    Spark's md5), the 16 family members and their minima via numpy
    reduceat over the whole batch. The r13 Column form evaluated 16
    zip_with/array_min higher-order passes per document, and Spark
    interprets HOF lambdas per element (no codegen); the Arrow kernel
    measured 0.75 -> 0.41 s (noop, min-of-5, sf0.1) with bit-identical
    output, and only (doc_id, text) crosses the Python boundary.

    r15 (VERDICT r14 item 4): STREAMING frames now take the SAME
    kernel. The r14 posture kept a pure-Column projection on streams
    (zero per-micro-batch Python worker cost, no standing-query
    dependence on worker lifecycle) — re-priced this round with a
    stage decomposition of q_stream_ingest_neardup at sf0.1: scaffold
    (stream session + dropDuplicates state + rollup + memory sink,
    measured via the md5-only ingest twin) 1.01 s; shipped Column
    form 5.40 s; kernel lane 1.70 s with identical results — the
    interpreted-HOF signature was 81% of the standing query's wall,
    dwarfing the worker-lifecycle concern (mapInArrow is stateless
    and micro-batches are file-sized, so each batch amortizes the
    worker exactly as the batch lane does). The r13 Column
    construction stays pinned bit-identical to the kernel by
    tests/test_round2b.py::test_minhash_arrow_kernel_matches_column_
    form, which rebuilds it inline."""
    return _minhash_signatures_arrow(d, keep_shingles)


def _minhash_sig_kernel(batches, keep_shingles: bool):
    """The vectorized batch kernel behind _minhash_signatures: per
    Arrow batch, tokenize + md5-shingle in Python (hashlib md5 ==
    Spark md5 byte-for-byte), then derive all 16 Carter-Wegman family
    members and their per-document minima with numpy over the batch's
    concatenated shingle vector (np.minimum.reduceat on document
    offsets). Pure integer arithmetic below 2^63 — bit-identical to
    the Column form on every input (guarded by
    tests/test_round2b.py::test_minhash_arrow_kernel_matches_column_form).
    """
    import hashlib

    import numpy as np
    import pyarrow as pa

    md5 = hashlib.md5
    p = MINHASH_P
    names = (
        ["doc_id"]
        + (["mds"] if keep_shingles else [])
        + [f"m{h}" for h in range(N_MINHASH)]
    )
    for b in batches:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out_ids: list[int] = []
        mds_out: list[list[str]] = []
        h1s: list[int] = []
        h2s: list[int] = []
        offs = [0]
        for did, tx in zip(ids, texts):
            if tx is None:
                continue
            toks = tx.split(" ")
            if len(toks) < 3:
                continue
            digests = [
                md5(
                    (toks[i] + " " + toks[i + 1] + " " + toks[i + 2]).encode()
                ).digest()
                for i in range(len(toks) - 2)
            ]
            if keep_shingles:
                # first-occurrence-order dedup == F.array_distinct
                digests = list(dict.fromkeys(digests))
                mds_out.append([dg.hex() for dg in digests])
            out_ids.append(did)
            for dg in digests:
                h1s.append(int.from_bytes(dg[:6], "big"))
                h2s.append(int.from_bytes(dg[6:12], "big"))
            offs.append(len(h1s))
        h1 = np.asarray(h1s, dtype=np.int64) % p
        h2 = np.asarray(h2s, dtype=np.int64) % p
        starts = np.asarray(offs[:-1])
        cols = [pa.array(out_ids, type=pa.int64())]
        if keep_shingles:
            cols.append(pa.array(mds_out, type=pa.list_(pa.string())))
        for h in range(N_MINHASH):
            v = (h1 + h * h2) % p
            mins = (
                np.minimum.reduceat(v, starts)
                if out_ids
                else np.array([], dtype=np.int64)
            )
            cols.append(pa.array(mins, type=pa.int64()))
        yield pa.RecordBatch.from_arrays(cols, names=names)


def _minhash_signatures_arrow(
    d: DataFrame, keep_shingles: bool = False
) -> DataFrame:
    """Batch lane of _minhash_signatures (see its docstring)."""
    from functools import partial

    schema = (
        "doc_id long, "
        + ("mds array<string>, " if keep_shingles else "")
        + ", ".join(f"m{h} long" for h in range(N_MINHASH))
    )
    # select() first: mapInArrow is opaque to column pruning — without
    # it the scan would ship every document column (guide §4.1)
    return d.select("doc_id", "text").mapInArrow(
        partial(_minhash_sig_kernel, keep_shingles=keep_shingles),
        schema=schema,
    )


def _band_frame(sigs: DataFrame) -> DataFrame:
    """signatures -> exploded (doc_id, band_idx, band_sig) rows: md5 of
    each 4-row band — the 16-byte keys the LSH groupBy/self-join moves."""
    band_structs = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"m{b * BAND_SIZE + j}").cast("string")
                        for j in range(BAND_SIZE)
                    ],
                )
            ).alias("band_sig"),
        )
        for b in range(N_MINHASH // BAND_SIZE)
    ]
    return sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_idx", "band.band_sig")


def _band_buckets(bands: DataFrame) -> DataFrame:
    """band rows -> (band_idx, band_sig, ids) collision buckets with
    >= 2 docs, ids sorted for deterministic in-bucket pair order.

    Shared subplan of `_band_candidates` and `_band_drop_audit` —
    tracked_persist so the signature pipeline evaluates exactly ONCE:
    AQE's exchange reuse between the two consumers is opportunistic
    (when the stages race, the md5/minhash subtree runs twice
    concurrently — measured 1.4 s -> 6 s spikes), while the cache
    manager's partition-level locking is deterministic. This is the
    production shape too — the collision/bucket table IS the LSH
    index a 100 TB pipeline materializes; MEMORY_AND_DISK spills
    gracefully and harnesses release it between queries."""
    from ..functions.helpers import tracked_persist

    return tracked_persist(
        bands.groupBy("band_idx", "band_sig")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )


def _band_candidates(buckets: DataFrame) -> DataFrame:
    """collision buckets (from `_band_buckets`) -> distinct
    (doc_lo, doc_hi) LSH candidate pairs.

    GroupBy-collect bucket form, NOT a self-join: one shuffle of
    16-byte band keys evaluates the (expensive) signature pipeline
    ONCE, then ordered pairs are generated inside each bucket with
    array combinatorics. The r6 self-join form evaluated the whole
    minhash chain once per join side and at scale would need either a
    data-sized broadcast or a second shuffle+sort; measured at sf0.1
    this form cut candidate generation ~2x. The within-bucket pair
    explosion is the SAME quadratic the join had — confined to a band
    bucket, the LSH boundedness argument — and since r8 additionally
    CAPPED at LSH_BUCKET_CAP docs per bucket (stop-bucket exclusion):
    a signature shared by millions of boilerplate documents would
    otherwise put the whole collision set in one task and ask for a
    quadratic pair explosion there. Dropped buckets are counted by
    `_band_drop_audit`, which consumers surface in their output."""
    buckets = buckets.where(F.size("ids") <= LSH_BUCKET_CAP)
    pairs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size("ids")),
                lambda y: F.struct(x.alias("doc_lo"), y.alias("doc_hi")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.doc_lo", "p.doc_hi")
        .distinct()
    )


def _band_drop_audit(buckets: DataFrame) -> DataFrame:
    """1-row (n_buckets_dropped): collision buckets over LSH_BUCKET_CAP
    excluded from pair generation. Riding in every consumer's hashed
    output keeps the stop-bucket lever auditable — 0 on organic
    corpora, nonzero exactly when boilerplate was suppressed."""
    return buckets.agg(
        F.count_if(F.size("ids") > LSH_BUCKET_CAP)
        .cast("long")
        .alias("n_buckets_dropped")
    )


def _sql_minhash_bands() -> str:
    """DuckDB twin of the banded-MinHash construction below: ONE md5
    per shingle, 16 minhashes derived as (h1 + i*h2) mod P."""
    return _sql_minhash_bands_cte() + """
    SELECT band_idx, band_sig,
           count(*) AS n_docs,
           min(doc_id) AS min_doc_id
    FROM bands
    GROUP BY band_idx, band_sig
    HAVING count(*) >= 2
    """


def _sql_minhash_bands_cte() -> str:
    """The WITH-clause prefix (sh/hh/mh/bands CTEs) of the banded-
    MinHash SQL twin, shared by the batch bands oracle and the
    streaming ingest-suppression oracle."""
    split = "string_split(text, ' ')"
    shingle = (
        f"{split}[i] || ' ' || {split}[i + 1] || ' ' || {split}[i + 2]"
    )
    p = MINHASH_P
    mh_cols = ",\n             ".join(
        f"list_aggregate(list_transform(generate_series(1, len(h1)), "
        f"j -> (h1[j] + {h} * h2[j]) % {p}), 'min') AS m{h}"
        for h in range(N_MINHASH)
    )
    band_selects = []
    for b in range(N_MINHASH // BAND_SIZE):
        cat = " || '|' || ".join(
            f"CAST(m{b * BAND_SIZE + j} AS VARCHAR)" for j in range(BAND_SIZE)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band_idx, md5({cat}) AS band_sig FROM mh"
        )
    bands = "\n      UNION ALL\n      ".join(band_selects)
    return f"""
    WITH sh AS (
      SELECT doc_id,
             list_transform(generate_series(1, len({split}) - 2),
                            i -> md5({shingle})) AS mds
      FROM documents
      WHERE len({split}) >= 3
    ),
    hh AS (
      SELECT doc_id,
             list_transform(mds,
               m -> CAST('0x' || substr(m, 1, 12) AS BIGINT) % {p}) AS h1,
             list_transform(mds,
               m -> CAST('0x' || substr(m, 13, 12) AS BIGINT) % {p}) AS h2
      FROM sh
    ),
    mh AS (
      SELECT doc_id,
             {mh_cols}
      FROM hh
    ),
    bands AS (
      {bands}
    )
    """


@register(
    "q_dedup_minhash_bands",
    oracle=_sql_minhash_bands(),
    tier="P1",
    doc="Banded MinHash LSH, hash-checkable end-to-end (unlike the "
    "MLlib twin q_dedup_minhash_lsh, whose hash family is opaque): "
    "ONE md5 per 3-token shingle, split into two 48-bit integers, "
    "and the 16-member hash family derived as (h1 + i*h2) mod P — "
    "the Carter-Wegman construction every production MinHash uses, "
    "because hashing each shingle k times (the naive form) multiplies "
    "the dominant cost k-fold. Banded 4x4 (targets Jaccard ≈ 0.8); "
    "docs sharing a band signature are near-dup candidates. Emits "
    "the non-singleton candidate buckets. This IS the 100 TB dedup "
    "shuffle shape: per-doc signatures are map-only, and the single "
    "groupBy moves 16-byte band signatures — never shingles or text.",
)
def q_dedup_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import fan_out

    sigs = _minhash_signatures(
        fan_out(load_table(spark, sf_dir, "documents"), spark, sf_dir)
    )
    bands = _band_frame(sigs)
    return (
        bands.groupBy("band_idx", "band_sig")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .where(F.col("n_docs") >= 2)
    )


@register(
    "q_str_edit_distance",
    oracle="""
    SELECT s_suppkey,
           levenshtein(s_name, replace(s_name, '#', '-')) AS d_punct,
           levenshtein(lower(s_name), s_name) AS d_case,
           CAST(length(s_name) AS INTEGER) AS name_len
    FROM supplier
    """,
    tier="P1",
    doc="Edit-distance string similarity (levenshtein, built into both "
    "engines' expression layers): distance of each supplier name to "
    "two deterministic perturbations. The fuzzy-matching primitive "
    "for entity resolution of free-text chemical names; map-only, "
    "JVM-side, no shuffle.",
)
def q_str_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    name = F.col("s_name")
    return s.select(
        "s_suppkey",
        F.levenshtein(name, F.replace(name, F.lit("#"), F.lit("-"))).alias(
            "d_punct"
        ),
        F.levenshtein(F.lower(name), name).alias("d_case"),
        F.length(name).cast("int").alias("name_len"),
    )


@register(
    "q_text_repetition",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    per AS (
      SELECT doc_id, token, count(*) AS n
      FROM tok GROUP BY doc_id, token
    )
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(n) AS BIGINT) AS top_token_n,
           {sql_r("1.0 - count(*) * 1.0 / sum(n)")} AS dup_ratio,
           {sql_r("max(n) * 1.0 / sum(n)")} AS top_token_ratio
    FROM per GROUP BY doc_id
    """,
    tier="P1",
    doc="Repetition-detection quality features (the Gopher-style "
    "repetition filters): per-document distinct-token ratio and "
    "most-frequent-token mass. Everything is integer counts plus one "
    "float divide, so it hash-checks exactly. Plan: explode + "
    "two-phase groupBy — the (doc_id, token) partial aggregates "
    "combine map-side before the shuffle, and the second groupBy "
    "re-aggregates counts, never token strings; a 100 TB corpus "
    "shuffles (doc_id, token-hash, count) triples only.",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    per = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("n"))
    return per.groupBy("doc_id").agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("n").alias("top_token_n"),
        r4(F.lit(1.0) - F.count(F.lit(1)) * F.lit(1.0) / F.sum("n")).alias(
            "dup_ratio"
        ),
        r4(F.max("n") * F.lit(1.0) / F.sum("n")).alias("top_token_ratio"),
    )


def _trigram_partial_kernel(batches):
    """Arrow batch kernel: (lang, text) -> PARTIAL per-(lang, char
    trigram) counts, one Counter per batch — a map-side partial
    aggregate (guide §2.3) that replaces the per-position interpreted
    substring HOF and shrinks both the Python->JVM transfer and the
    exchange to distinct-gram rows."""
    from collections import Counter

    import pyarrow as pa

    for b in batches:
        langs = b.column("lang").to_pylist()
        texts = b.column("text").to_pylist()
        c: Counter = Counter()
        for lang, tx in zip(langs, texts):
            if tx is None or len(tx) < 3:
                continue
            for i in range(len(tx) - 2):
                c[(lang, tx[i : i + 3])] += 1
        if c:
            ks = list(c.keys())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([k[0] for k in ks], pa.string()),
                    pa.array([k[1] for k in ks], pa.string()),
                    pa.array([c[k] for k in ks], pa.int64()),
                ],
                names=["lang", "gram", "pn"],
            )


@register(
    "q_text_ngram_profile",
    oracle="""
    WITH grams AS (
      SELECT lang,
             unnest(list_transform(
               generate_series(1, length(text) - 2),
               i -> substring(text, i, 3)
             )) AS gram
      FROM documents
      WHERE length(text) >= 3
    ),
    counted AS (
      SELECT lang, gram, count(*) AS n
      FROM grams GROUP BY lang, gram
    )
    SELECT lang, gram, n
    FROM (
      SELECT lang, gram, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, gram) AS rn
      FROM counted
    )
    WHERE rn <= 10
    """,
    tier="P1",
    doc="Character-trigram profile: top-10 trigrams per language "
    "(count desc, gram asc tiebreak) — the feature table an n-gram "
    "language identifier trains on. Trigram generation is a pure "
    "Column expression (transform over sequence + substring, JVM-side "
    "codegen, no UDF); the explode fans out ~n_chars rows per doc but "
    "the count aggregates map-side before shuffling (gram, partial) "
    "pairs, and top-10 per lang is a bounded window.",
)
def q_text_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # r14 (guide §4.2 + §2.3): batch-local partial trigram counts in
    # one mapInArrow kernel, final sum per (lang, gram) — measured
    # 2.3 s -> 1.3 s at sf0.1, output bit-identical (pytest-forced).
    d = load_table(spark, sf_dir, "documents").where(F.length("text") >= 3)
    partial = d.select("lang", "text").mapInArrow(
        _trigram_partial_kernel, schema="lang string, gram string, pn long"
    )
    counted = partial.groupBy("lang", "gram").agg(F.sum("pn").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("gram"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("lang", "gram", "n")
    )


@register(
    "q_dedup_lsh_refine",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
                            i -> md5(string_split(text, ' ')[i] || ' '
                                     || string_split(text, ' ')[i + 1] || ' '
                                     || string_split(text, ' ')[i + 2])) AS mds
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    hh AS (
      SELECT doc_id,
             list_transform(mds,
               m -> CAST('0x' || substr(m, 1, 12) AS BIGINT) % {MINHASH_P}) AS h1,
             list_transform(mds,
               m -> CAST('0x' || substr(m, 13, 12) AS BIGINT) % {MINHASH_P}) AS h2
      FROM sh
    ),
    mh AS (
      SELECT doc_id,
             {", ".join(
                 f"list_aggregate(list_transform(generate_series(1, len(h1)), "
                 f"j -> (h1[j] + {h} * h2[j]) % {MINHASH_P}), 'min') AS m{h}"
                 for h in range(N_MINHASH))}
      FROM hh
    ),
    bands AS (
      {" UNION ALL ".join(
          "SELECT doc_id, md5(" + " || '|' || ".join(
              f"CAST(m{b * BAND_SIZE + j} AS VARCHAR)" for j in range(BAND_SIZE)
          ) + f") AS band_sig, {b} AS band_idx FROM mh"
          for b in range(N_MINHASH // BAND_SIZE))}
    ),
    bsz AS (
      SELECT band_idx, band_sig, count(*) AS n
      FROM bands GROUP BY band_idx, band_sig HAVING count(*) >= 2
    ),
    audit AS (
      SELECT CAST(count(*) FILTER (WHERE n > {LSH_BUCKET_CAP}) AS BIGINT)
             AS n_buckets_dropped
      FROM bsz
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_lo, b.doc_id AS doc_hi
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
      JOIN bsz s
        ON s.band_idx = a.band_idx AND s.band_sig = a.band_sig
      WHERE s.n <= {LSH_BUCKET_CAP}
    ),
    toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS t
      FROM documents
    )
    SELECT doc_lo, doc_hi,
           {sql_r('''len(list_filter(ta.t, x -> list_contains(tb.t, x))) * 1.0
             / (len(ta.t) + len(tb.t)
                - len(list_filter(ta.t, x -> list_contains(tb.t, x))))''')}
             AS jaccard,
           audit.n_buckets_dropped
    FROM cand
    JOIN toks ta ON ta.doc_id = doc_lo
    JOIN toks tb ON tb.doc_id = doc_hi
    CROSS JOIN audit
    WHERE len(list_filter(ta.t, x -> list_contains(tb.t, x))) * 3
          >= len(ta.t) + len(tb.t)
    """,
    tier="P1",
    doc="The complete LSH dedup pipeline composed end-to-end: banded-"
    "MinHash candidate buckets -> distinct candidate pairs (equal-"
    "band self-join — the only join, on 16-byte signatures) -> exact "
    "Jaccard refine computed ONLY for candidates -> near-dup pairs at "
    "J >= 0.5. This is the production shape: the quadratic all-pairs "
    "comparison never happens; exact similarity is paid solely inside "
    "LSH buckets, and buckets wider than LSH_BUCKET_CAP docs (shared "
    "boilerplate signatures) are dropped BEFORE pair generation with "
    "the dropped count riding in the output (n_buckets_dropped) — "
    "the stop-bucket lever that keeps one hot signature from pulling "
    "a quadratic into a single task at 100 TB. Integer set sizes + "
    "one float divide — hash-exact.",
)
def q_dedup_lsh_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4
    from ..sources.tables import fan_out

    d = fan_out(
        load_table(spark, sf_dir, "documents"), spark, sf_dir
    )
    buckets = _band_buckets(_band_frame(_minhash_signatures(d)))
    cand = _band_candidates(buckets)
    toks = d.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("t")
    )
    ta = toks.alias("ta")
    tb = toks.alias("tb")
    joined = cand.join(ta, F.col("ta.doc_id") == F.col("doc_lo")).join(
        tb, F.col("tb.doc_id") == F.col("doc_hi")
    )
    inter = F.size(F.array_intersect(F.col("ta.t"), F.col("tb.t")))
    union = F.size(F.col("ta.t")) + F.size(F.col("tb.t")) - inter
    return (
        joined.where(
            inter * 3 >= F.size(F.col("ta.t")) + F.size(F.col("tb.t"))
        )
        .crossJoin(F.broadcast(_band_drop_audit(buckets)))
        .select(
            "doc_lo",
            "doc_hi",
            r4(inter * F.lit(1.0) / union).alias("jaccard"),
            "n_buckets_dropped",
        )
    )


PACK_BUDGET = 2048  # tokens per packed training sequence


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             sum(len(string_split(text, ' '))) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM documents
    )
    SELECT lang,
           CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM sized
    GROUP BY lang, (cum - n_tokens) // {PACK_BUDGET}
    """,
    tier="P1",
    doc="Training-sequence packing: documents are packed into fixed "
    f"{PACK_BUDGET}-token sequences by contiguous fill — each doc's "
    "sequence is the running token offset (window cumsum over the "
    "stable doc_id order, per language) divided by the budget. The "
    "batch-construction step between a cleaned corpus and the "
    "trainer: pure integer arithmetic, one window + one groupBy on "
    "the same partition key (a single shuffle), deterministic on any "
    "engine. Greedy bin-packing variants change only the ordering "
    "column; the offset-division shape is what scales.",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sized = d.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        F.sum(n_tok).over(w).alias("cum"),
    )
    # exact integer division (Spark `div` == DuckDB `//`, repo rule —
    # never a double divide + cast; ADVICE r5)
    seq = F.expr(f"(cum - n_tokens) div {PACK_BUDGET}")
    return sized.groupBy("lang", seq.alias("seq_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


def _sql_split_expr() -> str:
    return (
        "CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' "
        "THEN 'train' WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) "
        "< 'e6' THEN 'val' ELSE 'test' END"
    )


def _shingle3_kernel(batches):
    """Arrow batch kernel: documents -> per-doc DISTINCT 3-token
    shingle digests (doc_id, sh = raw md5 digest). hashlib md5 is
    byte-identical to Spark's md5 (the _minhash_sig_kernel precedent);
    dict.fromkeys == F.array_distinct on digests; the 16-byte digest
    is the bijective narrow encoding of the hex string."""
    import hashlib

    import pyarrow as pa

    md5 = hashlib.md5
    for b in batches:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out_id: list[int] = []
        out_h: list[bytes] = []
        for did, tx in zip(ids, texts):
            if tx is None:
                continue
            toks = tx.split(" ")
            if len(toks) < 3:
                continue
            seen = dict.fromkeys(
                md5(
                    (toks[i] + " " + toks[i + 1] + " " + toks[i + 2]).encode()
                ).digest()
                for i in range(len(toks) - 2)
            )
            for h in seen:
                out_id.append(did)
                out_h.append(h)
        yield pa.RecordBatch.from_arrays(
            [pa.array(out_id, pa.int64()), pa.array(out_h, pa.binary())],
            names=["doc_id", "sh"],
        )


@register(
    "q_decontaminate_ngrams",
    oracle=f"""
    WITH split AS (
      SELECT doc_id, text, {_sql_split_expr()} AS split
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    shingled AS (
      SELECT doc_id, split,
             unnest(list_distinct(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 2),
               i -> md5(string_split(text, ' ')[i] || ' '
                        || string_split(text, ' ')[i + 1] || ' '
                        || string_split(text, ' ')[i + 2])))) AS sh
      FROM split
    ),
    train_sh AS (
      SELECT DISTINCT sh FROM shingled WHERE split = 'train'
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN sh IN (SELECT sh FROM train_sh)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           {sql_r('''sum(CASE WHEN sh IN (SELECT sh FROM train_sh)
                         THEN 1 ELSE 0 END) * 1.0 / count(*)''')}
             AS contamination
    FROM shingled
    WHERE split = 'test'
    GROUP BY doc_id
    """,
    tier="P1",
    doc="Benchmark decontamination: for every TEST document, the "
    "fraction of its distinct 3-token shingles that also occur "
    "anywhere in the TRAIN split — the n-gram-overlap pass run before "
    "any evaluation set is trusted (a test doc whose shingles live in "
    "the training corpus is leaked). Composes the deterministic md5 "
    "split with md5 shingle fingerprints: the join is a semi-join on "
    "16-byte shingle hashes (left_semi marks, never widens), so at "
    "100 TB the shuffle moves hashes, not text, and the train side "
    "dedupes to distinct shingles before joining.",
)
def q_decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4

    d = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(prefix < "cc", "train").when(prefix < "e6", "val").otherwise("test")
    )
    d = d.withColumn("split", split)

    # r14 (guide §4.2 + §2.3): each split lane shingles via ONE
    # vectorized mapInArrow kernel (the span-dup precedent — the r13
    # Column form paid 3 interpreted element_at HOF evals + one md5
    # per position; digests replace hex strings bijectively), with the
    # split filter applied BEFORE the opaque op so scan pruning
    # survives. The test lane is consumed ONCE: a left join against
    # the distinct train shingles with a hit flag computes n_shingles
    # and n_contaminated in one aggregate — the r13 form ran the test
    # explode twice (semi-join lane + per-doc-count lane). Measured
    # 4.6 s -> 1.25 s at sf0.1, output bit-identical (pytest-forced).
    def lane(name: str) -> DataFrame:
        return (
            d.where(F.col("split") == name)
            .select("doc_id", "text")
            .mapInArrow(_shingle3_kernel, schema="doc_id long, sh binary")
        )

    train_sh = lane("train").select("sh").distinct().withColumn(
        "hit", F.lit(1)
    )
    marked = lane("test").join(train_sh, "sh", "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias(
                "n_contaminated"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            r4(
                F.col("n_contaminated") * F.lit(1.0) / F.col("n_shingles")
            ).alias("contamination"),
        )
    )


@register(
    "q_text_pii_redact",
    oracle="""
    WITH injected AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0
                     THEN ' contact user' || doc_id || '@example.com'
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN ' call +1-555-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '[a-z0-9]+@[a-z]+\\.com'))
             AS n_emails,
           len(regexp_extract_all(t, '\\+1-555-[0-9]{4}')) AS n_phones,
           md5(regexp_replace(
                 regexp_replace(t, '[a-z0-9]+@[a-z]+\\.com', '<EMAIL>', 'g'),
                 '\\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
    FROM injected
    """,
    tier="P1",
    doc="PII detection + redaction — the pretraining-pipeline "
    "compliance pass: regex-count emails/phones per document, then "
    "redact them to typed placeholders. The synthetic corpus carries "
    "no organic PII, so deterministic PII is INJECTED first (derived "
    "from doc_id, identically in Spark and the oracle), which makes "
    "detection counts and the md5 of the redacted text exact "
    "cross-engine checks rather than pattern-luck. Patterns use the "
    "portable regex subset (classes, +, {n}) that Java regex and RE2 "
    "agree on. Scale: one projection, no shuffle; per-doc work "
    "parallelizes embarrassingly and the scan prunes to "
    "(doc_id, text).",
)
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    email_pat = r"[a-z0-9]+@[a-z]+\.com"
    phone_pat = r"\+1-555-[0-9]{4}"
    injected = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(injected, email_pat, "<EMAIL>"),
        phone_pat,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(injected, F.lit(email_pat)).alias("n_emails"),
        F.regexp_count(injected, F.lit(phone_pat)).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


@register(
    "q_mix_temperature",
    oracle=f"""
    WITH counts AS (
      SELECT lang, count(*) AS n_docs
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT sum(n_docs) AS total, sum(pow(n_docs, 0.7)) AS temp_mass
      FROM counts
    )
    SELECT lang, n_docs,
           {sql_r('n_docs / total', 6)} AS p_raw,
           {sql_r('pow(n_docs, 0.7) / temp_mass', 6)} AS p_temp,
           CAST(floor(10000 * pow(n_docs, 0.7) / temp_mass + 0.5) AS BIGINT)
             AS draws_10k
    FROM counts CROSS JOIN tot
    """,
    tier="P1",
    doc="Temperature-based corpus mixing (alpha=0.7, the multilingual "
    "sampling-rate design from the mBERT/XLM-R lineage): per-language "
    "document counts -> raw proportions -> temperature-flattened "
    "proportions n^0.7 / sum(n^0.7) -> integer draw budget out of "
    "10k. Upsamples low-resource languages at a controlled rate; "
    "combine with q_sample_weighted to materialize the mixture. One "
    "tiny groupBy + a broadcast scalar join; 6dp rounding absorbs the "
    "single pow/divide float steps (IEEE-identical inputs either "
    "side).",
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r6

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("total"),
        F.sum(F.pow("n_docs", F.lit(0.7))).alias("temp_mass"),
    )
    p_temp = F.pow("n_docs", F.lit(0.7)) / F.col("temp_mass")
    return counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        r6(F.col("n_docs") / F.col("total")).alias("p_raw"),
        r6(p_temp).alias("p_temp"),
        F.floor(F.lit(10000) * p_temp + F.lit(0.5))
        .cast("long")
        .alias("draws_10k"),
    )


@register(
    "q_llm_corpus_pipeline",
    oracle="""
    WITH toks AS (
      SELECT doc_id, text, lang,
             len(string_split(text, ' ')) AS n_tok, n_chars
      FROM documents
    ),
    quality AS (
      SELECT * FROM toks WHERE n_tok >= 20 AND n_chars BETWEEN 100 AND 1000
    ),
    dedup AS (
      SELECT * FROM quality
      QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
    ),
    split AS (
      SELECT *, CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                       THEN 'train'
                     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                       THEN 'val'
                     ELSE 'test' END AS split
      FROM dedup
    ),
    shingled AS (
      SELECT doc_id, split,
             unnest(list_distinct(list_transform(
               generate_series(1, n_tok - 2),
               i -> md5(string_split(text, ' ')[i] || ' '
                        || string_split(text, ' ')[i + 1] || ' '
                        || string_split(text, ' ')[i + 2])))) AS sh
      FROM split
    ),
    test_sh AS (SELECT DISTINCT sh FROM shingled WHERE split = 'test'),
    contaminated AS (
      SELECT DISTINCT doc_id FROM shingled
      WHERE split = 'train' AND sh IN (SELECT sh FROM test_sh)
    ),
    clean AS (
      SELECT * FROM split
      WHERE split <> 'train'
         OR doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT split, lang,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
           CAST((sum(n_tok) + 2047) // 2048 AS BIGINT) AS n_seqs_2048
    FROM clean
    GROUP BY split, lang
    """,
    tier="P1",
    doc="SIGNATURE composition: the LLM corpus-preparation pipeline as "
    "ONE declarative plan — quality gate (token count + length "
    "window) -> exact dedup (min-doc_id survivor per text) -> "
    "deterministic md5 train/val/test split -> decontamination (drop "
    "train docs sharing any 3-token shingle hash with the test "
    "split; left_anti on 16-byte hashes, text never shuffles) -> "
    "packing accounting (2048-token sequence budget) per (split, "
    "lang). Every stage is the registered standalone operator's "
    "logic composed in-plan; Catalyst pipelines the whole thing with "
    "three shuffles (dedup, shingle semi-join, final rollup). The "
    "100 TB posture is inherited from the pieces: hash-based "
    "determinism, no driver materialization, shuffles move hashes "
    "and integers.",
)
def q_llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import fan_out
    from .text import exact_dedup_losers

    d = fan_out(load_table(spark, sf_dir, "documents"), spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    d = d.select(
        "doc_id", "text", "lang", "n_chars", F.size(toks).alias("n_tok")
    ).where((F.col("n_tok") >= 20) & F.col("n_chars").between(100, 1000))

    # exact dedup: min-doc_id survivor per text (no dropDuplicates —
    # survivor selection must be partitioning-independent). r13
    # (VERDICT r12 #1): hash-first via the shared exact_dedup_losers
    # kernel — the wide exchange groups 8-byte xxhash64(text) keys and
    # exact text verification happens only inside multi-member hash
    # buckets, so unique text never shuffles. The dedup decision
    # materializes as the LOSER id list (localCheckpoint: it is tiny —
    # the duplicate fraction — and feeds two consumers), and the
    # filter applies as doc_id ANTI-joins against HASH-ONLY
    # projections of d (metadata ints + shingle md5s, text projected
    # out map-side below), never against the text-bearing frame —
    # with this, NO stage of the pipeline moves document bodies
    # through an exchange. The r13 variant study: 2.27 s (this form)
    # vs 2.54 s (survivor semi-join) vs 2.94 s (survivor subplan
    # duplicated), all bit-identical.
    losers = exact_dedup_losers(d).localCheckpoint()

    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    d = d.withColumn(
        "split",
        F.when(prefix < "cc", "train")
        .when(prefix < "e6", "val")
        .otherwise("test"),
    )

    # Text -> 16-byte shingle hashes map-side, BEFORE the dedup
    # filter; dup losers' shingles are built then dropped by the
    # doc_id anti-join (cheap: the loser fraction's map-side hashing
    # vs shuffling every survivor's text — and the filter must apply
    # before test_sh, else a removed duplicate test doc could still
    # contaminate train).
    t2 = F.split(F.col("text"), " ")
    # unhex: the shingle identity crosses the distinct exchange and
    # the semi-join broadcast as 16 raw bytes instead of the 32-char
    # md5 hex string (r14, guide §2.3 narrower types) — hex<->binary
    # is bijective, so distinctness and the semi-join hits are
    # untouched (variant study: outputs EQUAL, local timing inside the
    # noise band; the byte halving is the 100 TB argument).
    shingle = lambda i: F.unhex(  # noqa: E731
        F.md5(
            F.concat_ws(
                " ",
                F.element_at(t2, i),
                F.element_at(t2, i + 1),
                F.element_at(t2, i + 2),
            )
        )
    )
    idx = F.sequence(F.lit(1), F.col("n_tok") - 2)
    shingled = d.select(
        "doc_id",
        "split",
        F.explode(
            F.array_distinct(F.transform(idx, lambda i: shingle(i)))
        ).alias("sh"),
    ).join(losers, "doc_id", "left_anti")
    # metadata lane for the final rollup: ints + short strings only
    d = d.select("doc_id", "lang", "n_tok", "split").join(
        losers, "doc_id", "left_anti"
    )
    test_sh = (
        shingled.where(F.col("split") == "test").select("sh").distinct()
    )
    contaminated = (
        shingled.where(F.col("split") == "train")
        .join(test_sh, "sh", "left_semi")
        .select("doc_id")
        .distinct()
    )
    # Explicit aliases: `contaminated` shares lineage with `d`, so
    # `d.doc_id == contaminated.doc_id` resolves both sides to the SAME
    # attribute and Spark warns "trivially true equals predicate" —
    # harmless today, but a silent-cartesian footgun after a refactor
    # (VERDICT r9 wrong #2). Alias-qualified columns pin each side.
    clean = d.alias("docs").join(
        contaminated.alias("contam"),
        (F.col("docs.doc_id") == F.col("contam.doc_id"))
        & (F.col("docs.split") == "train"),
        "left_anti",
    )
    return clean.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
        ((F.sum("n_tok") + F.lit(2047)) / F.lit(2048))
        .cast("long")
        .alias("n_seqs_2048"),
    )


def _bigram_count_kernel(batches):
    """Arrow batch kernel: documents -> per-(doc, bigram) counts. The
    bigram travels as its RAW string (identity untouched — hashing it
    would let a collision merge two bigrams and corrupt the hapax
    count); the win is eliminating the per-position interpreted HOF
    chain and the (doc_id, bigram) groupBy exchange (counts are
    partition-local per doc by construction)."""
    from collections import Counter

    import pyarrow as pa

    for b in batches:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out_id: list[int] = []
        out_bg: list[str] = []
        out_k: list[int] = []
        for did, tx in zip(ids, texts):
            if tx is None:
                continue
            toks = tx.split(" ")
            if len(toks) < 2:
                continue
            c = Counter(
                toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
            )
            for bg, k in c.items():
                out_id.append(did)
                out_bg.append(bg)
                out_k.append(k)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_id, pa.int64()),
                pa.array(out_bg, pa.string()),
                pa.array(out_k, pa.int64()),
            ],
            names=["doc_id", "bigram", "k"],
        )


@register(
    "q_text_bigram_lm_score",
    oracle=f"""
    WITH bg AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 1),
               i -> string_split(text, ' ')[i] || ' '
                    || string_split(text, ' ')[i + 1])) AS bigram
      FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    cnt AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram)
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(sum(c) AS BIGINT) AS bigram_mass,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           {sql_r('sum(c) * 1.0 / count(*)')} AS avg_bigram_freq
    FROM bg JOIN cnt USING (bigram)
    GROUP BY doc_id
    """,
    tier="P1",
    doc="Count-based bigram language-model score per document — the "
    "classic corpus-statistics quality filter (a cheap stand-in for "
    "KenLM perplexity): every document position contributes the "
    "CORPUS frequency of its bigram, so boilerplate text (common "
    "bigrams) scores high and noise/garbage (hapax bigrams) scores "
    "low. bigram_mass and n_hapax are exact integers; the only float "
    "is one final divide, so the result hash-checks bit-for-bit. "
    "Plan: explode to (doc, bigram) positions, per-(doc,bigram) "
    "multiplicities combine map-side, and the corpus count attaches "
    "as a WINDOW over the bigram partition — one scan, one "
    "tokenize, no model-branch re-scan (plan-verified); at 100 TB "
    "only (doc_id, bigram, int) triples ever shuffle and the model "
    "never needs to fit anywhere in one piece.",
)
def q_text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4

    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    # per-(doc, bigram) multiplicities, then corpus counts as a WINDOW
    # over the bigram partition: one pass, one tokenize — a join
    # against a separately-aggregated model branch would re-scan and
    # re-tokenize the corpus (Catalyst does not share the subplan;
    # verified in PLANS.md), which at 100 TB doubles the dominant
    # cost. The window shuffles only (doc_id, bigram, count) triples.
    # r14 (guide §4.2): the pass is one vectorized mapInArrow kernel
    # emitting the per-(doc, bigram) counts directly — the r13 Column
    # form paid 2 interpreted element_at HOF evals per position plus a
    # groupBy exchange; measured 3.8 s -> 0.97 s end-to-end at sf0.1,
    # output bit-identical (pytest-forced).
    per = d.select("doc_id", "text").mapInArrow(
        _bigram_count_kernel, schema="doc_id long, bigram string, k long"
    )
    withc = per.withColumn(
        "c", F.sum("k").over(Window.partitionBy("bigram"))
    )
    return (
        withc
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("c")).alias("bigram_mass"),
            F.sum(F.when(F.col("c") == 1, F.col("k")).otherwise(0)).alias(
                "n_hapax"
            ),
            r4(
                F.sum(F.col("k") * F.col("c"))
                * F.lit(1.0)
                / F.sum("k")
            ).alias("avg_bigram_freq"),
        )
    )


SPAN_K = 8  # tokens per duplicated-span window


def _span_count_kernel(batches):
    """Arrow batch kernel: documents -> per-(doc, 8-token-span) counts
    (doc_id, h = raw md5 digest, k = positions). hashlib md5 is
    byte-identical to Spark's md5 (the _minhash_sig_kernel precedent);
    emitting the 16-byte digest instead of the hex string is the
    bijective narrow-types encoding, and counting WITHIN the kernel
    replaces the (doc_id, h) groupBy exchange outright — per-doc
    counts are partition-local by construction."""
    import hashlib
    from collections import Counter

    import pyarrow as pa

    md5 = hashlib.md5
    k_span = SPAN_K
    for b in batches:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out_id: list[int] = []
        out_h: list[bytes] = []
        out_k: list[int] = []
        for did, tx in zip(ids, texts):
            if tx is None:
                continue
            toks = tx.split(" ")
            n = len(toks)
            if n < k_span:
                continue
            c = Counter(
                md5(" ".join(toks[i : i + k_span]).encode()).digest()
                for i in range(n - k_span + 1)
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
    "q_text_span_dup",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(string_split(text, ' ')) - {SPAN_K - 1}),
               i -> md5({" || ' ' || ".join(
                   f"string_split(text, ' ')[i + {j}]" for j in range(SPAN_K)
               )}))) AS h
      FROM documents
      WHERE len(string_split(text, ' ')) >= {SPAN_K}
    ),
    nd AS (
      SELECT h, count(DISTINCT doc_id) AS n_docs FROM pos GROUP BY h
    )
    SELECT doc_id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN nd.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           {sql_r('sum(CASE WHEN nd.n_docs >= 2 THEN 1 ELSE 0 END) * 1.0'
                  ' / count(*)')} AS dup_share
    FROM pos JOIN nd USING (h)
    GROUP BY doc_id
    """,
    tier="P1",
    doc="Duplicated-span quality filter (the Gopher/RefinedWeb "
    "'fraction of text in duplicated 8-token windows' signal — the "
    "CROSS-document complement of q_text_repetition's intra-doc "
    "stats): every 8-token window is hashed, windows appearing in 2+ "
    "distinct documents are 'duplicated', and each doc reports its "
    "share of duplicated positions. Boilerplate headers/footers and "
    "template text light up even when whole docs are not near-dups. "
    "Shuffle shape: positions reduce to (doc_id, hash) pairs; the "
    "distinct-doc counts groupBy 16-byte hashes; the refine join is "
    "hash-to-hash — text never shuffles, integers + one divide only.",
)
def q_text_span_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4

    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    # r14 (guide §4.2): the span hashing runs in one vectorized
    # mapInArrow kernel that directly emits per-(doc, hash) position
    # counts. The r13 Column form paid 8 interpreted element_at HOF
    # evals per position (~88M interpreted calls for 235k spans at
    # sf0.1: the explode alone measured 7.6 s WITHOUT the md5) plus a
    # (doc_id, h) groupBy exchange; the kernel does both in one
    # partition-local pass — measured 8.4 s -> 0.80 s end-to-end,
    # output bit-identical (pytest-forced). Distinct-doc counts stay a
    # window over the hash partition; only (doc_id, 16-byte digest,
    # count) triples shuffle — text never does (select() first:
    # mapInArrow is opaque to column pruning, guide §4.1).
    per = d.select("doc_id", "text").mapInArrow(
        _span_count_kernel, schema="doc_id long, h binary, k long"
    )
    withnd = per.withColumn(
        "n_docs", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    dup_k = F.when(F.col("n_docs") >= 2, F.col("k")).otherwise(0)
    return withnd.groupBy("doc_id").agg(
        F.sum("k").alias("n_spans"),
        F.sum(dup_k).cast("long").alias("n_dup_spans"),
        r4(F.sum(dup_k) * F.lit(1.0) / F.sum("k")).alias("dup_share"),
    )


_EST_AGREE_SQL = " + ".join(
    f"CASE WHEN a.m{h} = b.m{h} THEN 1 ELSE 0 END" for h in range(N_MINHASH)
)
_EST_EXACT_SQL = (
    "len(list_filter(a.mds, x -> list_contains(b.mds, x))) * 1.0 "
    "/ (len(a.mds) + len(b.mds) "
    "- len(list_filter(a.mds, x -> list_contains(b.mds, x))))"
)


@register(
    "q_dedup_minhash_estimate",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 2),
               i -> md5(string_split(text, ' ')[i] || ' '
                        || string_split(text, ' ')[i + 1] || ' '
                        || string_split(text, ' ')[i + 2]))) AS mds
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    hh AS (
      SELECT doc_id, mds,
             list_transform(mds,
               m -> CAST('0x' || substr(m, 1, 12) AS BIGINT) % {MINHASH_P}) AS h1,
             list_transform(mds,
               m -> CAST('0x' || substr(m, 13, 12) AS BIGINT) % {MINHASH_P}) AS h2
      FROM sh
    ),
    mh AS (
      SELECT doc_id, mds,
             {", ".join(
                 f"list_aggregate(list_transform(generate_series(1, len(h1)), "
                 f"j -> (h1[j] + {h} * h2[j]) % {MINHASH_P}), 'min') AS m{h}"
                 for h in range(N_MINHASH))}
      FROM hh
    ),
    bands AS (
      {" UNION ALL ".join(
          "SELECT doc_id, md5(" + " || '|' || ".join(
              f"CAST(m{b * BAND_SIZE + j} AS VARCHAR)" for j in range(BAND_SIZE)
          ) + f") AS band_sig, {b} AS band_idx FROM mh"
          for b in range(N_MINHASH // BAND_SIZE))}
    ),
    bsz AS (
      SELECT band_idx, band_sig, count(*) AS n
      FROM bands GROUP BY band_idx, band_sig HAVING count(*) >= 2
    ),
    audit AS (
      SELECT CAST(count(*) FILTER (WHERE n > {LSH_BUCKET_CAP}) AS BIGINT)
             AS n_buckets_dropped
      FROM bsz
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_lo, b.doc_id AS doc_hi
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
      JOIN bsz s
        ON s.band_idx = a.band_idx AND s.band_sig = a.band_sig
      WHERE s.n <= {LSH_BUCKET_CAP}
    )
    SELECT doc_lo, doc_hi,
           CAST({_EST_AGREE_SQL} AS BIGINT) AS n_agree,
           {sql_r(f"({_EST_AGREE_SQL}) / {N_MINHASH}.0")} AS est_j,
           {sql_r(_EST_EXACT_SQL)} AS exact_j,
           audit.n_buckets_dropped
    FROM cand
    JOIN mh a ON a.doc_id = doc_lo
    JOIN mh b ON b.doc_id = doc_hi
    CROSS JOIN audit
    """,
    tier="P2",
    doc="MinHash estimator CALIBRATION: for every LSH candidate pair, "
    "the 16-hash agreement count, the Jaccard estimate it implies "
    "(n_agree/16), and the EXACT Jaccard of the distinct-shingle "
    "sets side by side. Because the hash family is md5-derived and "
    "deterministic, the estimate itself hash-checks bit-for-bit "
    "across engines — the estimator's per-pair accuracy is proven, "
    "not just recall-sampled. This is the table an operator reads "
    "when tuning bands x rows against a corpus: it shows exactly "
    "how the 4x4 banding's candidates distribute around the J=0.8 "
    "S-curve. Candidates come from the capped bucket form (r8): "
    "buckets over LSH_BUCKET_CAP docs are dropped pre-pairs with the "
    "count audited in n_buckets_dropped. Shuffle shape: signatures "
    "(16 ints) and distinct-shingle hash sets join only for "
    "candidate pairs.",
)
def q_dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4
    from ..sources.tables import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"), spark, sf_dir)
    # NOTE: the estimator hashes DISTINCT shingles (keep_shingles also
    # dedupes), which leaves every minhash unchanged — min over a set
    # ignores multiplicity — and gives the exact-Jaccard side its sets.
    sigs = _minhash_signatures(d, keep_shingles=True)
    buckets = _band_buckets(_band_frame(sigs))
    cand = _band_candidates(buckets)
    sa = sigs.alias("sa")
    sb = sigs.alias("sb")
    j = cand.join(sa, F.col("sa.doc_id") == F.col("doc_lo")).join(
        sb, F.col("sb.doc_id") == F.col("doc_hi")
    )
    agree = sum(
        F.when(F.col(f"sa.m{h}") == F.col(f"sb.m{h}"), 1).otherwise(0)
        for h in range(N_MINHASH)
    )
    inter = F.size(F.array_intersect(F.col("sa.mds"), F.col("sb.mds")))
    union = F.size(F.col("sa.mds")) + F.size(F.col("sb.mds")) - inter
    return j.crossJoin(F.broadcast(_band_drop_audit(buckets))).select(
        "doc_lo",
        "doc_hi",
        agree.cast("long").alias("n_agree"),
        r4(agree / F.lit(float(N_MINHASH))).alias("est_j"),
        r4(inter * F.lit(1.0) / union).alias("exact_j"),
        "n_buckets_dropped",
    )


@register(
    "q_text_langid_confusion",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_sql_hits(LANG_MARKERS['en'])} AS h_en,
             {_sql_hits(LANG_MARKERS['fr'])} AS h_fr,
             {_sql_hits(LANG_MARKERS['es'])} AS h_es,
             {_sql_hits(LANG_MARKERS['de'])} AS h_de,
             {_sql_hits(LANG_MARKERS['zh'])} AS h_zh
      FROM documents
    ),
    pred AS (
      SELECT lang AS actual,
             CASE WHEN h_en >= greatest(h_fr, h_es, h_de, h_zh) THEN 'en'
                  WHEN h_fr >= greatest(h_es, h_de, h_zh) THEN 'fr'
                  WHEN h_es >= greatest(h_de, h_zh) THEN 'es'
                  WHEN h_de >= h_zh THEN 'de'
                  ELSE 'zh' END AS predicted
      FROM scored
    ),
    tot AS (SELECT actual, count(*) AS n_actual FROM pred GROUP BY actual)
    SELECT p.actual, p.predicted,
           count(*) AS n,
           {sql_r('count(*) * 1.0 / max(t.n_actual)')} AS row_share
    FROM pred p JOIN tot t ON t.actual = p.actual
    GROUP BY p.actual, p.predicted
    """,
    tier="P2",
    doc="Classifier-evaluation confusion matrix over the langid voter "
    "— the model-eval table every labeling pipeline publishes: "
    "(actual, predicted, count, row-normalized share) per cell, "
    "computed distributed as prediction projection -> two-key "
    "groupBy -> per-actual totals joined back (broadcast — the "
    "matrix side is |langs|² rows regardless of corpus size). The "
    "share divides two exact integers, so the matrix hash-checks "
    "bit-for-bit; at 100 TB the eval costs one corpus scan.",
)
def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.helpers import r4

    d = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    hits = {
        lang: _hits(tokens, marks).alias(f"h_{lang}")
        for lang, marks in LANG_MARKERS.items()
    }
    scored = d.select("lang", *hits.values())
    h = {lang: F.col(f"h_{lang}") for lang in LANG_MARKERS}
    guess = (
        F.when(h["en"] >= F.greatest(h["fr"], h["es"], h["de"], h["zh"]), "en")
        .when(h["fr"] >= F.greatest(h["es"], h["de"], h["zh"]), "fr")
        .when(h["es"] >= F.greatest(h["de"], h["zh"]), "es")
        .when(h["de"] >= h["zh"], "de")
        .otherwise("zh")
    )
    pred = scored.select(
        F.col("lang").alias("actual"), guess.alias("predicted")
    )
    cells = pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = pred.groupBy("actual").agg(F.count(F.lit(1)).alias("n_actual"))
    return cells.join(F.broadcast(totals), "actual").select(
        "actual",
        "predicted",
        "n",
        r4(F.col("n") * F.lit(1.0) / F.col("n_actual")).alias("row_share"),
    )


DOMAIN_CAP = 10


@register(
    "q_corpus_domain_caps",
    oracle=f"""
    WITH ranked AS (
      SELECT source, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
             ) AS rk
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN rk <= {DOMAIN_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rk >  {DOMAIN_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN rk <= {DOMAIN_CAP} THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM ranked
    GROUP BY source
    """,
    tier="P1",
    doc="Per-domain document caps (the C4/RefinedWeb corpus-curation "
    "primitive): every source keeps at most its top-K documents by a "
    "quality proxy (length, doc_id tiebreak — a total order, so the "
    "cap boundary is engine-exact), and the report shows kept/dropped "
    "mass per domain. One shuffle on source feeds both the "
    "row_number window and the rollup. 100 TB skew note: a "
    "crawl-scale hot domain (1e9 docs) would funnel one partition; "
    "the production variant first aggregates per-domain counts "
    "(cheap), short-circuits the <=cap domains with no window at "
    "all, and ranks only over-cap domains — same semantics, and the "
    "window only ever sees the skewed tail. The cap itself is what "
    "bounds downstream cost: after this pass no domain contributes "
    "more than K docs to training.",
)
def q_corpus_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = docs.withColumn("rk", F.row_number().over(w))
    kept = F.col("rk") <= DOMAIN_CAP
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(~kept, 1).otherwise(0)).alias("n_dropped"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(F.lit(0))).alias(
            "kept_chars"
        ),
    )


@register(
    "q_corpus_report",
    oracle="""
    WITH per_doc AS (
      SELECT doc_id, lang, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CASE WHEN count(*) OVER (PARTITION BY md5(text)) > 1
                  THEN 1 ELSE 0 END AS is_dup,
             CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 80
                  THEN 1 ELSE 0 END AS len_ok
      FROM documents
    )
    SELECT coalesce(lang, 'ALL') AS lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
           CAST(sum(len_ok) AS BIGINT) AS n_len_ok,
           min(n_tokens) AS min_tokens,
           max(n_tokens) AS max_tokens
    FROM per_doc
    GROUP BY GROUPING SETS ((lang), ())
    """,
    tier="P1",
    doc="The dataset-card report as ONE Catalyst plan: per-document "
    "features (token count, exact-dup membership via a count window "
    "over the text hash, length-window flag) rolled up per language "
    "AND corpus-wide in the same pass with GROUPING SETS — the "
    "summary table every corpus release publishes (doc/token/char "
    "volumes, duplicate and quality rates, per-language mix). Two "
    "shuffles total: the dup window partitions by 16-byte text "
    "hashes (text itself never shuffles — the md5 projection "
    "happens at the scan), then the rollup; the grouping-sets "
    "expansion reuses the single aggregated pass rather than "
    "re-scanning the corpus per grain. All counters are exact "
    "integers — the report hash-checks bit-for-bit.",
)
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    w = Window.partitionBy(F.md5(F.col("text")))
    per_doc = docs.select(
        "lang",
        "n_chars",
        n_tokens.alias("n_tokens"),
        F.when(F.count(F.lit(1)).over(w) > 1, 1).otherwise(0).alias("is_dup"),
        F.when(n_tokens.between(20, 80), 1).otherwise(0).alias("len_ok"),
    )
    per_doc.createOrReplaceTempView("v_corpus_per_doc")
    return per_doc.sparkSession.sql(
        """
        SELECT coalesce(lang, 'ALL') AS lang,
               count(*) AS n_docs,
               sum(n_chars) AS total_chars,
               sum(n_tokens) AS total_tokens,
               sum(is_dup) AS n_dup_docs,
               sum(len_ok) AS n_len_ok,
               min(n_tokens) AS min_tokens,
               max(n_tokens) AS max_tokens
        FROM v_corpus_per_doc
        GROUP BY GROUPING SETS ((lang), ())
        """
    )


@register(
    "q_pack_policy_compare",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    arrival AS (
      SELECT CAST((sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) // {PACK_BUDGET} AS BIGINT) AS seq_id,
             n_tokens
      FROM sized
    ),
    sorted_fill AS (
      SELECT CAST((sum(n_tokens) OVER (ORDER BY n_tokens DESC, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) // {PACK_BUDGET} AS BIGINT) AS seq_id,
             n_tokens
      FROM sized
    )
    SELECT 'arrival' AS policy,
           (SELECT count(DISTINCT seq_id) FROM arrival) AS n_seqs,
           CAST((SELECT sum(n_tokens) FROM arrival) AS BIGINT)
             AS total_tokens,
           CAST((SELECT sum(CASE WHEN t = {PACK_BUDGET} THEN 1 ELSE 0 END)
            FROM (SELECT seq_id, sum(n_tokens) AS t FROM arrival
                  GROUP BY seq_id)) AS BIGINT) AS n_exact_full
    UNION ALL
    SELECT 'sorted' AS policy,
           (SELECT count(DISTINCT seq_id) FROM sorted_fill) AS n_seqs,
           CAST((SELECT sum(n_tokens) FROM sorted_fill) AS BIGINT)
             AS total_tokens,
           CAST((SELECT sum(CASE WHEN t = {PACK_BUDGET} THEN 1 ELSE 0 END)
            FROM (SELECT seq_id, sum(n_tokens) AS t FROM sorted_fill
                  GROUP BY seq_id)) AS BIGINT) AS n_exact_full
    """,
    tier="P2",
    doc="Packing-policy comparison: the same corpus packed into "
    f"{PACK_BUDGET}-token sequences under two deterministic "
    "policies — arrival order (stable doc_id; streaming-friendly, "
    "no extra shuffle) vs length-sorted-descending fill (the "
    "offline pass that reduces fragmentation by placing large docs "
    "first) — reporting sequences produced, total tokens (identical "
    "by construction: packing must conserve tokens), and "
    "exactly-full sequences per policy. The decision table for the "
    "batch-construction step: sorting costs one extra global sort "
    "of (doc_id, n_tokens) pairs — 16 bytes/doc, NOT the text — "
    "and pays off only if the fill-rate gain beats that sort at "
    "corpus scale. Same offset-division shape as q_pack_sequences; "
    "the policy is just the window's ORDER BY.",
)
def q_pack_policy_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    sized = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )

    def pack(order_cols, policy: str):
        w = Window.orderBy(*order_cols).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        seqs = sized.withColumn(
            "seq_id",
            ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET)
            .cast("long"),
        )
        per_seq = seqs.groupBy("seq_id").agg(F.sum("n_tokens").alias("t"))
        return per_seq.agg(
            F.lit(policy).alias("policy"),
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("t").alias("total_tokens"),
            F.sum(F.when(F.col("t") == PACK_BUDGET, 1).otherwise(0)).alias(
                "n_exact_full"
            ),
        ).select("policy", "n_seqs", "total_tokens", "n_exact_full")

    arrival = pack([F.asc("doc_id")], "arrival")
    sorted_fill = pack([F.desc("n_tokens"), F.asc("doc_id")], "sorted")
    return arrival.unionAll(sorted_fill)


MIX_TOKEN_BUDGET = 1_000_000
MIX_MAX_EPOCHS_X100 = 400  # cap any language at 4 epochs


@register(
    "q_mix_epochs_budget",
    oracle=f"""
    WITH lang_tokens AS (
      SELECT lang,
             sum(len(string_split(text, ' '))) AS avail
      FROM documents GROUP BY lang
    ),
    shares AS (
      SELECT lang, avail,
             CAST(floor(CAST(avail AS DOUBLE)
                        / (SELECT sum(avail) FROM lang_tokens)
                        * {MIX_TOKEN_BUDGET} + 0.5) AS BIGINT) AS want
      FROM lang_tokens
    )
    SELECT lang,
           CAST(avail AS BIGINT) AS avail_tokens,
           want AS target_tokens,
           least(CAST(floor(CAST(want AS DOUBLE) / avail * 100 + 0.5)
                      AS BIGINT), {MIX_MAX_EPOCHS_X100}) AS epochs_x100,
           CAST(least(CAST(floor(CAST(want AS DOUBLE) / avail * 100 + 0.5)
                      AS BIGINT), {MIX_MAX_EPOCHS_X100}) * avail // 100
             AS BIGINT) AS granted_tokens
    FROM shares
    """,
    tier="P2",
    doc="Mixing-budget / epochs table — the planning artifact behind "
    "every pre-training data card: given a total token budget and "
    "each language's available tokens, how many EPOCHS (repetition "
    "factor, x100 fixed-point) each slice contributes, capped at 4 "
    "epochs (the repetition ceiling the data-constrained-scaling "
    "literature motivates), and the tokens actually granted under "
    "the cap. Composes upstream of q_mix_temperature (which reshapes "
    "the target shares) and q_sample_weighted (which materializes "
    "the draw). All ratios are single IEEE divides rounded to "
    "fixed-point BEFORE the integer arithmetic, so the table is "
    "hash-exact; the whole plan is one small rollup + a 1-row "
    "total broadcast.",
)
def q_mix_epochs_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lang_tokens = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("avail")
    )
    total = lang_tokens.agg(F.sum("avail").alias("total_avail"))
    want = (
        F.floor(
            F.col("avail").cast("double")
            / F.col("total_avail")
            * MIX_TOKEN_BUDGET
            + F.lit(0.5)
        ).cast("long")
    )
    epochs = F.least(
        F.floor(
            F.col("target_tokens").cast("double") / F.col("avail") * 100
            + F.lit(0.5)
        ).cast("long"),
        F.lit(MIX_MAX_EPOCHS_X100),
    )
    return (
        lang_tokens.crossJoin(F.broadcast(total))
        .withColumn("target_tokens", want)
        .withColumn("epochs_x100", epochs)
        .select(
            "lang",
            F.col("avail").cast("long").alias("avail_tokens"),
            "target_tokens",
            "epochs_x100",
            ((F.col("epochs_x100") * F.col("avail")) / 100)
            .cast("long")
            .alias("granted_tokens"),
        )
    )


WINNOW_W = 4  # fingerprint-selection window over consecutive gram hashes


def _winnow_fps_kernel(batches):
    """Vectorized batch kernel behind ``_winnow_fps_frame``: per Arrow
    batch, 3-token gram hashes exactly as the Column form (hashlib md5
    == Spark md5 byte-for-byte; first 12 hex chars -> int64 %
    MINHASH_P), then every WINNOW_W-window minimum via W-1 shifted
    ``np.minimum`` passes over the batch's concatenated gram vector
    (sliced per document, so cross-document windows never exist), and
    the per-doc distinct selection in first-occurrence order
    (== ``F.array_distinct``). Pure integer arithmetic below 2^63 —
    bit-identical to the Column construction on every input (guarded
    by tests/test_round2b.py::test_winnow_arrow_kernel_matches_column_form).
    """
    import hashlib

    import numpy as np
    import pyarrow as pa

    md5 = hashlib.md5
    p = MINHASH_P
    w = WINNOW_W
    for b in batches:
        ids = b.column("doc_id").to_pylist()
        langs = b.column("lang").to_pylist()
        texts = b.column("text").to_pylist()
        out_ids: list[int] = []
        out_langs: list[str] = []
        n_grams: list[int] = []
        hs: list[int] = []
        offs = [0]
        for did, lg, tx in zip(ids, langs, texts):
            if tx is None:
                continue
            toks = tx.split(" ")
            if len(toks) < w + 3:
                continue
            out_ids.append(did)
            out_langs.append(lg)
            for i in range(len(toks) - 2):
                dg = md5(
                    (toks[i] + " " + toks[i + 1] + " " + toks[i + 2]).encode()
                ).digest()
                hs.append(int.from_bytes(dg[:6], "big"))
            offs.append(len(hs))
            n_grams.append(offs[-1] - offs[-2])
        v = np.asarray(hs, dtype=np.int64) % p
        m = v.copy()
        for k in range(1, w):
            np.minimum(m[:-k], v[k:], out=m[:-k])
        fps_out: list[list[int]] = []
        for di in range(len(out_ids)):
            s, e = offs[di], offs[di + 1]
            # valid window starts: s .. e-w (m beyond that mixes docs)
            fps_out.append(
                list(dict.fromkeys(m[s : e - (w - 1)].tolist()))
            )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_ids, type=pa.int64()),
                pa.array(out_langs, type=pa.string()),
                pa.array(n_grams, type=pa.int32()),
                pa.array(fps_out, type=pa.list_(pa.int64())),
            ],
            names=["doc_id", "lang", "n_grams", "fps"],
        )


def _winnow_fps_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_grams, fps) winnowing fingerprints per doc —
    the shared derivation of ``q_text_winnow_fingerprints`` and
    ``_winnow_buckets``.

    r14 (guide §4.2): the r13 Column form evaluated the window minima
    as ``transform(sequence(...), j -> array_min(slice(gh, j, W)))`` —
    an interpreted HOF lambda per window that ALLOCATES a fresh
    W-element array per invocation (plus the md5 gram chain, another
    interpreted transform). Both are linear per-task expression cost
    at any scale; the mapInArrow kernel computes the same values with
    one hashlib/numpy pass per batch, bit-identical (pytest-forced).
    Only (doc_id, lang, text) crosses the Python boundary — explicit
    select() before the opaque op so scan pruning survives (guide
    §4.1). No streaming consumer exists (the streaming dedup twins
    ride the minhash lane), so there is no Column dispatch here."""
    from ..sources.tables import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"), spark, sf_dir)
    return d.select("doc_id", "lang", "text").mapInArrow(
        _winnow_fps_kernel,
        schema="doc_id long, lang string, n_grams int, fps array<long>",
    )


@register(
    "q_text_winnow_fingerprints",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, lang,
             list_transform(
               list_transform(
                 generate_series(1, len(string_split(text, ' ')) - 2),
                 i -> md5(string_split(text, ' ')[i] || ' ' ||
                          string_split(text, ' ')[i + 1] || ' ' ||
                          string_split(text, ' ')[i + 2])),
               m -> CAST('0x' || substr(m, 1, 12) AS BIGINT)
                    % {MINHASH_P}) AS gh
      FROM documents
      WHERE len(string_split(text, ' ')) >= {WINNOW_W + 2 + 1}
    ),
    w AS (
      SELECT doc_id, lang, len(gh) AS n_grams,
             list_distinct(list_transform(
               generate_series(1, len(gh) - {WINNOW_W - 1}),
               j -> list_aggregate(gh[j:j + {WINNOW_W - 1}], 'min'))) AS fps
      FROM g
    )
    SELECT doc_id, lang,
           CAST(n_grams AS INTEGER) AS n_grams,
           CAST(len(fps) AS INTEGER) AS n_fps,
           CAST(list_aggregate(fps, 'sum') AS BIGINT) AS fp_checksum
    FROM w
    """,
    tier="P1",
    doc="Winnowing fingerprints (the MOSS local-minima scheme) — the "
    "fourth member of the fingerprint family beside MinHash, SimHash "
    "and the min-shingle digest: over each document's sequence of "
    "3-token gram hashes, every " f"{WINNOW_W}" "-gram window "
    "contributes its MINIMUM hash, and the distinct selected set is "
    "the fingerprint. Winnowing guarantees any shared substring of "
    "length >= w+k-1 yields at least one shared fingerprint "
    "(MinHash gives only probabilistic overlap), which is why "
    "plagiarism/clone detectors use it. The whole selection is "
    "per-doc map-side work (r14: one vectorized mapInArrow kernel, "
    "bit-identical to the Column transform/array_min/array_distinct "
    "form it replaced — see _winnow_fps_frame), so per-doc work "
    "never explodes to rows before selection and nothing shuffles "
    "but the final per-doc summary. The "
    "fingerprint SET is position-independent, hence deterministic; "
    "the checksum is an exact integer sum of distinct sub-1e9 "
    "values. The md5-derived gram hashes are the same cross-engine "
    "family the MinHash ladder uses.",
)
def q_text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = _winnow_fps_frame(spark, sf_dir)
    return fp.select(
        "doc_id",
        "lang",
        "n_grams",
        F.size("fps").alias("n_fps"),
        F.aggregate(
            F.col("fps"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("fp_checksum"),
    )


WINNOW_MIN_SHARED = 2
# Stop-fingerprint threshold: a winnowing fingerprint shared by more
# docs than this is boilerplate (shared header/license block) — its
# bucket is dropped before pair generation and counted into the
# audited n_stop_fps output column. Same rationale and value as
# LSH_BUCKET_CAP (see that constant's comment).
WINNOW_STOP_FP_CAP = LSH_BUCKET_CAP


def _winnow_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(f, ids) winnowing-fingerprint collision buckets (>= 2 docs),
    ids sorted for deterministic in-bucket pair order.

    Shared subplan of ``q_dedup_winnow_pairs`` (pair generation + stop
    audit) and the boilerplate cap study's dedicated audit read
    (ADVICE r8 #2) — extracted so the study never has to infer the
    drop counter from possibly-empty pair output. tracked_persist
    guarantees the fingerprint pipeline evaluates ONCE for all
    consumers — AQE exchange reuse is opportunistic and, when the two
    stages raced, ran the md5/window-minima subtree twice concurrently
    (measured 1.4 s -> 6-10 s spikes); the bucket table is the
    materialized fingerprint index a production run would checkpoint
    anyway."""
    from ..functions.helpers import tracked_persist

    fp = _winnow_fps_frame(spark, sf_dir).select(
        "doc_id", F.explode("fps").alias("f")
    )
    return tracked_persist(
        fp.groupBy("f")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )


def _winnow_stop_audit(buckets_all: DataFrame) -> DataFrame:
    """1-row (n_stop_fps): fingerprint buckets over WINNOW_STOP_FP_CAP
    excluded from pair generation — 0 on organic corpora, nonzero
    exactly when boilerplate was suppressed."""
    return buckets_all.agg(
        F.count_if(F.size("ids") > WINNOW_STOP_FP_CAP)
        .cast("long")
        .alias("n_stop_fps")
    )

@register(
    "q_dedup_winnow_pairs",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             list_transform(
               list_transform(
                 generate_series(1, len(string_split(text, ' ')) - 2),
                 i -> md5(string_split(text, ' ')[i] || ' ' ||
                          string_split(text, ' ')[i + 1] || ' ' ||
                          string_split(text, ' ')[i + 2])),
               m -> CAST('0x' || substr(m, 1, 12) AS BIGINT)
                    % {MINHASH_P}) AS gh
      FROM documents
      WHERE len(string_split(text, ' ')) >= {WINNOW_W + 2 + 1}
    ),
    fp AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, len(gh) - {WINNOW_W - 1}),
               j -> list_aggregate(gh[j:j + {WINNOW_W - 1}], 'min')))) AS f
      FROM g
    ),
    fpb AS (
      SELECT f, count(*) AS n FROM fp GROUP BY f HAVING count(*) >= 2
    ),
    audit AS (
      SELECT CAST(count(*) FILTER (WHERE n > {WINNOW_STOP_FP_CAP})
                  AS BIGINT) AS n_stop_fps
      FROM fpb
    ),
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_shared
      FROM fp a
      JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
      JOIN fpb s ON s.f = a.f
      WHERE s.n <= {WINNOW_STOP_FP_CAP}
      GROUP BY doc_a, doc_b
      HAVING count(*) >= {WINNOW_MIN_SHARED}
    )
    SELECT doc_a, doc_b, n_shared, audit.n_stop_fps
    FROM prs CROSS JOIN audit
    """,
    tier="P1",
    doc="Winnowing-based near-dup candidate pairs — the scheme "
    "composed into the dedup ladder: documents sharing at least "
    f"{WINNOW_MIN_SHARED} winnowing fingerprints are flagged, "
    "exactly MOSS's match step. Because winnowing guarantees a "
    "shared fingerprint for any sufficiently long shared substring, "
    "this candidate set provably CONTAINS every pair with "
    "substantial verbatim overlap — a recall guarantee banded "
    "MinHash cannot give. The match step is the groupBy-collect "
    "bucket form (the oracle keeps the equivalent self-join SQL): "
    "fingerprints group into per-value buckets with ONE shuffle of "
    "(long, long) rows and ONE evaluation of the md5/window-minima "
    "subtree, ordered pairs are generated inside each bucket with "
    "array combinatorics, and a pair-sized count aggregate applies "
    "the >= " f"{WINNOW_MIN_SHARED}" "-shared threshold. The r6 "
    "self-join form evaluated the fingerprint pipeline once PER "
    "SIDE and shuffled the exploded table twice — measured 15.2x "
    "wall-clock at a 16x corpus vs 2.6x for the bucketed LSH rungs "
    "(SCALE.md round-7 study); this form closes that gap. The "
    "within-bucket pair quadratic is confined to one fingerprint "
    "value's bucket AND capped (r8): STOP-FINGERPRINTS — values "
    f"shared by more than {WINNOW_STOP_FP_CAP} docs, i.e. "
    "boilerplate — are dropped before pair generation, the same "
    "hot-token exclusion the ppjoin rung uses, with the dropped "
    "count riding in the hashed output (n_stop_fps) so the lever "
    "is audited, never silent (edge case: if NO pair survives, the "
    "audit scalar has no row to ride on and the result is empty on "
    "both engines — the empty pair table is itself the signal). "
    "Recall caveat: a pair whose overlap is ONLY boilerplate is "
    "deliberately suppressed; pairs with real shared content still "
    "collide on their non-boilerplate fingerprints.",
)
def q_dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bucket form: docs are unique within a bucket (fps is
    # array_distinct per doc), so sorted ids + suffix slicing emits
    # each unordered pair exactly once with doc_a < doc_b. Buckets
    # wider than WINNOW_STOP_FP_CAP are stop-fingerprints
    # (boilerplate): dropped before pair generation, counted into
    # the audit column.
    buckets_all = _winnow_buckets(spark, sf_dir)
    audit = _winnow_stop_audit(buckets_all)
    buckets = buckets_all.where(F.size("ids") <= WINNOW_STOP_FP_CAP)
    pairs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size("ids")),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= WINNOW_MIN_SHARED)
        .crossJoin(F.broadcast(audit))
    )


@register(
    "q_corpus_upsample_epochs",
    oracle=f"""
    WITH lang_tokens AS (
      SELECT lang, sum(len(string_split(text, ' '))) AS avail
      FROM documents GROUP BY lang
    ),
    ep AS (
      SELECT lang,
             least(CAST(floor(
               CAST(floor(CAST(avail AS DOUBLE)
                          / (SELECT sum(avail) FROM lang_tokens)
                          * {MIX_TOKEN_BUDGET} + 0.5) AS DOUBLE)
               / avail * 100 + 0.5) AS BIGINT),
               {MIX_MAX_EPOCHS_X100}) AS e
      FROM lang_tokens
    ),
    docs AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    copies AS (
      SELECT d.lang, d.n_tok, ep.e,
             ep.e // 100
             + CASE WHEN CAST('0x' || substr(
                       md5(CAST(d.doc_id AS VARCHAR)), 1, 2) AS BIGINT) * 100
                    < (ep.e % 100) * 256
                    THEN 1 ELSE 0 END AS n_copies
      FROM docs d JOIN ep ON d.lang = ep.lang
    )
    SELECT lang,
           CAST(max(e) AS BIGINT) AS epochs_x100,
           count(*) AS n_docs_in,
           CAST(sum(n_copies) AS BIGINT) AS n_docs_out,
           CAST(sum(n_copies * n_tok) AS BIGINT) AS out_tokens
    FROM copies
    GROUP BY lang
    """,
    tier="P2",
    doc="Epoch-budget MATERIALIZATION — the execution step downstream "
    "of q_mix_epochs_budget's planning table: every document is "
    "physically repeated floor(epochs) times plus one extra copy for "
    "a deterministic md5-coin subset of size frac(epochs) (first "
    "md5(doc_id) byte * 100 < frac_x100 * 256 — the same "
    "hash-fraction idiom as q_split_train_val_test, so reruns and "
    "both engines pick the identical subset; no RNG, no seed "
    "plumbing). Spark plan: the 5-row epochs table broadcasts onto "
    "documents, array_repeat + explode mints the copies (narrow, no "
    "shuffle), and one partial-aggregated groupBy(lang) audits the "
    "materialized corpus. 100 TB: upsampling multiplies bytes at most "
    "4x (the epoch cap), stays embarrassingly parallel, and the only "
    "exchange carries 5 partial-agg rows; the audit columns ARE the "
    "data-card numbers (docs in/out, tokens out).",
)
def q_corpus_upsample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lang_tokens = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("avail")
    )
    total = lang_tokens.agg(F.sum("avail").alias("total_avail"))
    want = F.floor(
        F.col("avail").cast("double") / F.col("total_avail")
        * MIX_TOKEN_BUDGET + F.lit(0.5)
    ).cast("long")
    ep = (
        lang_tokens.crossJoin(F.broadcast(total))
        .withColumn("want", want)
        .select(
            "lang",
            F.least(
                F.floor(
                    F.col("want").cast("double") / F.col("avail") * 100
                    + F.lit(0.5)
                ).cast("long"),
                F.lit(MIX_MAX_EPOCHS_X100),
            ).alias("e"),
        )
    )
    coin = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("long")
    per_doc = (
        docs.select(
            "doc_id", "lang", F.size(F.split(F.col("text"), " ")).alias("n_tok")
        )
        .join(F.broadcast(ep), "lang")
        .withColumn(
            "n_copies",
            # exact integer division (Spark `div` == DuckDB `//`, repo
            # rule — never a double divide + cast; ADVICE r5)
            F.expr("e div 100")
            + F.when(coin * 100 < (F.col("e") % 100) * 256, 1).otherwise(0),
        )
    )
    materialized = per_doc.select(
        "lang",
        "e",
        "n_tok",
        F.explode(
            F.array_repeat(F.lit(1), F.col("n_copies").cast("int"))
        ).alias("copy"),
    )
    audit_in = per_doc.groupBy("lang").agg(
        F.max("e").alias("epochs_x100"),
        F.count(F.lit(1)).alias("n_docs_in"),
    )
    audit_out = materialized.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_out"),
        F.sum("n_tok").alias("out_tokens"),
    )
    # left join: a lang can legally materialize zero copies (e == 0 and
    # no coin hits) yet must still appear in the audit
    return audit_in.join(audit_out, "lang", "left").select(
        "lang",
        "epochs_x100",
        "n_docs_in",
        F.coalesce("n_docs_out", F.lit(0)).alias("n_docs_out"),
        F.coalesce("out_tokens", F.lit(0)).alias("out_tokens"),
    )


@register(
    "q_pack_loss_mask",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             sum(len(string_split(text, ' '))) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM documents
    )
    SELECT lang,
           CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS seq_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(count(*) - 1 AS BIGINT) AS n_boundary_masked,
           CAST(sum(n_tokens) - count(*) AS BIGINT) AS n_loss_positions,
           CAST((sum(n_tokens) * sum(n_tokens)
                 - sum(n_tokens * n_tokens)) // 2 AS BIGINT)
             AS n_cross_doc_pairs_blocked
    FROM sized
    GROUP BY lang, (cum - n_tokens) // {PACK_BUDGET}
    """,
    tier="P1",
    doc="Packing with LOSS-MASK accounting — what the trainer actually "
    "consumes beyond q_pack_sequences' layout: per packed sequence, "
    "the boundary positions masked out of the loss (one per "
    "document after the first), the supervised positions "
    "(sum_tokens - n_docs: each doc's first token has no preceding "
    "context), and the cross-document attention pairs BLOCKED by "
    "document-causal masking ((T² - Σtᵢ²)/2 — the attention-FLOP "
    "saving that motivates block-diagonal attention in packed "
    "training). All integer arithmetic over the same single "
    "window+groupBy construction as the packer, so the mask "
    "accounting is hash-exact and costs no extra pass. 100 TB: one "
    "per-lang sort/shuffle shared by layout AND mask computation; "
    "the emitted table IS the data card's tokens-supervised column.",
)
def q_pack_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sized = d.select(
        "lang",
        n_tok.alias("n_tokens"),
        F.sum(n_tok).over(w).alias("cum"),
    )
    # exact integer division (Spark `div` == DuckDB `//`, repo rule —
    # never a double divide + cast; ADVICE r5)
    seq = F.expr(f"(cum - n_tokens) div {PACK_BUDGET}")
    t = F.sum("n_tokens")
    n = F.count(F.lit(1))
    return sized.groupBy("lang", seq.alias("seq_id")).agg(
        n.alias("n_docs"),
        t.alias("sum_tokens"),
        (n - 1).cast("long").alias("n_boundary_masked"),
        (t - n).cast("long").alias("n_loss_positions"),
        F.expr(
            "(sum(n_tokens) * sum(n_tokens) "
            "- sum(n_tokens * n_tokens)) div 2"
        ).alias("n_cross_doc_pairs_blocked"),
    )


@register(
    "q_text_html_strip",
    oracle="""
    WITH wrapped AS (
      SELECT doc_id, lang, text,
             '<div class="doc" id="d' || CAST(doc_id AS VARCHAR)
               || '"><h1>' || lang || '</h1><p>'
               || replace(text, ' and ', ' &amp; ')
               || '</p><br/></div>' AS html
      FROM documents
    ),
    stripped AS (
      SELECT doc_id, lang, text, html,
             replace(regexp_replace(html, '<[^>]+>', '', 'g'),
                     '&amp;', '&') AS clean
      FROM wrapped
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(length(html)) AS BIGINT) AS sum_chars_html,
           CAST(sum(length(clean)) AS BIGINT) AS sum_chars_clean,
           CAST(sum(CASE WHEN clean = lang ||
                              replace(text, ' and ', ' & ')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok
    FROM stripped
    GROUP BY lang
    """,
    tier="P1",
    doc="HTML boilerplate stripping — the web-corpus cleaning verb "
    "(trafilatura's regex tier): documents are deterministically "
    "wrapped in markup (div/h1/p structure + an &amp; entity "
    "encoding), then cleaned by tag removal + entity decoding, and "
    "the per-lang audit proves EXACT recovery — n_roundtrip_ok "
    "counts documents whose cleaned text equals the expected "
    "original (the h1 heading text legitimately survives extraction, "
    "mirroring real extractors keeping headings), alongside the "
    "markup-overhead byte accounting. regexp_replace with the "
    "conservative '<[^>]+>' tag pattern behaves identically in "
    "Java regex and RE2, which the hash check proves rather than "
    "assumes. 100 TB: cleaning is a pure projection — no shuffle "
    "until the audit rollup; the same plan with a real extractor "
    "swaps one regex for a mapInPandas parser.",
)
def q_text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<div class="doc" id="d'),
        F.col("doc_id").cast("string"),
        F.lit('"><h1>'),
        F.col("lang"),
        F.lit("</h1><p>"),
        F.regexp_replace(F.col("text"), " and ", " &amp; "),
        F.lit("</p><br/></div>"),
    )
    wrapped = d.select("lang", "text", html.alias("html"))
    clean = F.regexp_replace(
        F.regexp_replace(F.col("html"), "<[^>]+>", ""), "&amp;", "&"
    )
    expected = F.concat(
        F.col("lang"), F.regexp_replace(F.col("text"), " and ", " & ")
    )
    stripped = wrapped.select(
        "lang",
        F.length("html").alias("n_html"),
        F.length(clean).alias("n_clean"),
        (clean == expected).cast("int").alias("ok"),
    )
    return stripped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_html").cast("long").alias("sum_chars_html"),
        F.sum("n_clean").cast("long").alias("sum_chars_clean"),
        F.sum("ok").cast("long").alias("n_roundtrip_ok"),
    )


NEG_SAMPLES_K = 4


@register(
    "q_train_negative_samples",
    oracle=f"""
    WITH nn AS (SELECT count(*) AS n FROM documents),
    anchors AS (
      SELECT d.doc_id, d.lang AS anchor_lang, j.j,
             (d.doc_id + 1 +
              CAST('0x' || substr(md5('neg-' || CAST(d.doc_id AS VARCHAR)
                                      || '-' || CAST(j.j AS VARCHAR)),
                                  1, 12) AS BIGINT) % (nn.n - 1)
             ) % nn.n AS neg_id
      FROM documents d
      CROSS JOIN (SELECT unnest(generate_series(0, {NEG_SAMPLES_K - 1}))
                    AS j) j
      CROSS JOIN nn
    )
    SELECT a.anchor_lang, d2.lang AS neg_lang,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT a.doc_id) AS BIGINT) AS n_anchor_docs,
           CAST(sum(CASE WHEN a.neg_id = a.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_self_collisions
    FROM anchors a JOIN documents d2 ON d2.doc_id = a.neg_id
    GROUP BY a.anchor_lang, d2.lang
    """,
    tier="P1",
    doc="Deterministic negative sampling — the contrastive-training "
    "data op (every embedding/retrieval trainer pairs each anchor "
    f"with K={NEG_SAMPLES_K} negatives): negative j of a document is "
    "doc_id + 1 + (md5(doc, j) mod N-1) mod N — the md5-ring "
    "construction makes the draw uniform-ish, REPRODUCIBLE on any "
    "engine/partitioning (rand() is neither), and structurally "
    "self-collision-free (the +1 and mod N-1 exclude step 0, "
    "witnessed by the emitted always-zero n_self_collisions). The "
    "audit grain is the (anchor_lang, neg_lang) mixing matrix — "
    "what a trainer inspects to confirm negatives aren't "
    "accidentally in-class-only. Spark plan: the K-fold expansion "
    "is a posexplode projection, the negative's attributes arrive "
    "by ONE equi-join on neg_id (at 100 TB: the anchors shuffle "
    "once on neg_id; with documents bucketed by doc_id the join "
    "co-locates), and the N scalar broadcasts from a 1-row "
    "aggregate — no collect. In-batch negatives (the other common "
    "scheme) are this same join with the ring replaced by the "
    "batch's own ids.",
)
def q_train_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    nn = d.agg(F.count(F.lit(1)).alias("n"))
    anchors = (
        d.select(
            "doc_id",
            F.col("lang").alias("anchor_lang"),
            F.explode(
                F.array(*[F.lit(j) for j in range(NEG_SAMPLES_K)])
            ).alias("j"),
        )
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "anchor_lang",
            (
                (
                    F.col("doc_id")
                    + 1
                    + F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit("neg-"),
                                    F.col("doc_id").cast("string"),
                                    F.lit("-"),
                                    F.col("j").cast("string"),
                                )
                            ),
                            1,
                            12,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % (F.col("n") - 1)
                )
                % F.col("n")
            ).alias("neg_id"),
        )
    )
    negs = d.select(
        F.col("doc_id").alias("neg_id"), F.col("lang").alias("neg_lang")
    )
    return (
        anchors.join(negs, "neg_id")
        .groupBy("anchor_lang", "neg_lang")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_distinct("doc_id").alias("n_anchor_docs"),
            F.sum(
                F.when(F.col("neg_id") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_self_collisions"),
        )
    )


# RAG / training-context chunking: fixed token-window chunks with
# overlap. C/S chosen so the 10-99-token fixture docs yield 1-4 chunks.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


@register(
    "q_text_chunk_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks, n,
             CASE WHEN n <= {CHUNK_TOKENS} THEN 1
                  ELSE 1 + (n - {CHUNK_TOKENS} + {CHUNK_STRIDE - 1})
                           // {CHUNK_STRIDE} END AS n_chunks
      FROM t
    ),
    e AS (
      SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS k FROM c
    )
    SELECT doc_id,
           CAST(k AS BIGINT) AS chunk_idx,
           CAST(1 + k * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
           CAST(least({CHUNK_TOKENS}, n - (1 + k * {CHUNK_STRIDE}) + 1)
                AS BIGINT) AS n_tok,
           md5(array_to_string(
                 list_slice(toks, 1 + k * {CHUNK_STRIDE},
                            least(1 + k * {CHUNK_STRIDE}
                                  + {CHUNK_TOKENS - 1}, n)),
                 ' ')) AS chunk_md5
    FROM e
    """,
    tier="P1",
    doc="RAG/pretraining context chunking: split every document's "
    f"token stream into {CHUNK_TOKENS}-token windows with stride "
    f"{CHUNK_STRIDE} (8-token overlap), emitting one row per chunk "
    "with its md5 content fingerprint — the chunker that feeds both "
    "retrieval indexing and packed-context training, with the "
    "fingerprint enabling chunk-level exact dedup downstream. "
    "Chunk count is closed-form (1 + ceil((n-C)/S) via exact integer "
    "div, so both engines enumerate identical windows); the final "
    "window is the short tail, never dropped. Determinism: token "
    "slicing + md5 only — zero float ops. Plan: pure narrow "
    "projection + explode; no shuffle anywhere — chunking 100 TB "
    "parallelizes embarrassingly, and only (doc_id, idx, md5) rows "
    "ever need to shuffle in a downstream dedup, never chunk text.",
)
def q_text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    C, S = CHUNK_TOKENS, CHUNK_STRIDE
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.select(
        "doc_id", toks.alias("toks"), F.size(toks).cast("long").alias("n")
    )
    n_chunks = F.when(F.col("n") <= C, F.lit(1).cast("long")).otherwise(
        F.lit(1) + F.expr(f"(n - {C} + {S - 1}) div {S}")
    )
    e = base.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0).cast("long"), n_chunks - F.lit(1))
        ).alias("k"),
    )
    start = F.lit(1) + F.col("k") * F.lit(S)
    return e.select(
        "doc_id",
        F.col("k").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        F.least(F.lit(C).cast("long"), F.col("n") - start + F.lit(1))
        .cast("long")
        .alias("n_tok"),
        F.md5(
            F.array_join(F.slice(F.col("toks"), start, F.lit(C)), " ")
        ).alias("chunk_md5"),
    )


VOCAB_TOP_K = 16


@register(
    "q_text_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    cnt AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
    vocab AS (
      SELECT token FROM (
        SELECT token,
               row_number() OVER (ORDER BY n DESC, token) AS r
        FROM cnt
      ) WHERE r <= {VOCAB_TOP_K}
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS oov_tokens,
           CAST(count(DISTINCT CASE WHEN v.token IS NULL
                                    THEN t.token END)
                AS BIGINT) AS oov_distinct,
           {sql_r("CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)"
                  " AS DOUBLE) / count(*)")} AS oov_rate
    FROM tok t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY t.source
    """,
    tier="P1",
    doc="Tokenizer vocabulary coverage: build the top-"
    f"{VOCAB_TOP_K} corpus vocabulary (count desc, token asc — a "
    "total order, so the cut is deterministic at any scale), then "
    "per source report total tokens, out-of-vocabulary tokens, "
    "distinct OOV types, and the OOV rate — the coverage audit run "
    "before freezing a tokenizer on a new corpus mix. Exact int64 "
    "counts; the rate is one IEEE divide of two exact ints, rounded "
    "4dp. Plan: token counts aggregate map-side before the shuffle; "
    "the row_number window runs over the AGGREGATED vocabulary "
    "(|V| rows, not the corpus); the vocab table is KBs and is "
    "broadcast to the token stream — the corpus-sized side never "
    "shuffles for the membership join, and the final rollup is one "
    "groupBy over |sources| keys.",
)
def q_text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.helpers import r4

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    cnt = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        cnt.withColumn(
            "r",
            F.row_number().over(Window.orderBy(F.desc("n"), F.asc("token"))),
        )
        .where(F.col("r") <= VOCAB_TOP_K)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    flagged = tok.join(F.broadcast(vocab), "token", "left")
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.sum(oov).alias("oov_tokens"),
        F.count_distinct(
            F.when(F.col("in_vocab").isNull(), F.col("token"))
        ).alias("oov_distinct"),
        r4(
            F.sum(oov).cast("double") / F.count(F.lit(1))
        ).alias("oov_rate"),
    )


@register(
    "q_train_curriculum",
    oracle="""
    WITH cuts AS (
      SELECT quantile_disc(n_chars, 0.2) AS c1,
             quantile_disc(n_chars, 0.4) AS c2,
             quantile_disc(n_chars, 0.6) AS c3,
             quantile_disc(n_chars, 0.8) AS c4
      FROM documents
    ),
    b AS (
      SELECT doc_id, n_chars,
             1 + CAST(n_chars > c1 AS INT) + CAST(n_chars > c2 AS INT)
               + CAST(n_chars > c3 AS INT) + CAST(n_chars > c4 AS INT)
               AS bucket,
             md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents, cuts
    ),
    r AS (
      SELECT doc_id, n_chars, bucket, shuffle_key,
             row_number() OVER (PARTITION BY bucket
                                ORDER BY shuffle_key, doc_id) AS pos
      FROM b
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(pos AS BIGINT) AS pos_in_bucket,
           doc_id, n_chars
    FROM r WHERE pos <= 8
    """,
    tier="P1",
    doc="Curriculum-learning schedule: bucket documents easy-to-hard "
    "into 5 difficulty tiers by length, deterministically shuffle "
    "WITHIN each tier (md5(doc_id) — the repo's standard seedless "
    "shuffle), and emit the first 8 docs of each tier. Tier "
    "boundaries are percentile_disc(0.2/0.4/0.6/0.8) cutpoints — "
    "an AGGREGATE, not a global rank: unlike ntile (which would "
    "force a single-partition window over the corpus), the "
    "cutpoint table is 1 row, broadcast, and bucketing is a pure "
    "projection, so the plan scales to any corpus size. The "
    "per-tier row_number window partitions by bucket (5 bounded "
    "partitions of the shuffle-key sort). percentile_disc selects "
    "actual data values by rank — no interpolation arithmetic to "
    "drift cross-engine; everything else is int compares + md5.",
)
def q_train_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    cuts = d.agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY n_chars)"
            ).alias(f"c{i}")
            for i, q in enumerate((0.2, 0.4, 0.6, 0.8), start=1)
        ]
    )
    bucket = (
        F.lit(1)
        + (F.col("n_chars") > F.col("c1")).cast("int")
        + (F.col("n_chars") > F.col("c2")).cast("int")
        + (F.col("n_chars") > F.col("c3")).cast("int")
        + (F.col("n_chars") > F.col("c4")).cast("int")
    )
    b = d.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_chars",
        bucket.alias("bucket"),
        F.md5(F.col("doc_id").cast("string")).alias("shuffle_key"),
    )
    w = Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
    return (
        b.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= 8)
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("pos").cast("long").alias("pos_in_bucket"),
            "doc_id",
            "n_chars",
        )
    )
