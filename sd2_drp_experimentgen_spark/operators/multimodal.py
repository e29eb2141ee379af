"""Multimodal-column operators — binary image payloads with typed
metadata, processed by Arrow-batched Pandas UDFs over mapInPandas.

The payloads are REAL images in a real format: PPM (P6), the
plain-raster format every imaging stack understands, chosen because it
decodes with pure numpy — no codec libraries needed. The engine
synthesizes each document's image entirely in JVM-side Column
expressions (header string + md5-derived raster bytes, so the content
is deterministic), and ``_decode_ppm`` is a genuine format parser:
magic-number check, header tokenization, dimension validation against
the metadata struct, ``np.frombuffer`` raster decode. Feature
extraction is real image math (per-channel means, luminance max,
strided 2x downsample) on the decoded (h, w, 3) array.

Swapping PPM for JPEG means replacing one parser function with
``PIL.Image.open``; the convention (binary payload + typed prunable
metadata struct travelling together), the plan shape
(scan -> mapInPandas -> agg) and the shuffle behavior (payload bytes
never shuffle; only per-doc features do) are exactly what a production
media pipeline runs. No SQL oracle can run a Pandas UDF, but every
query here is hash-checked anyway (round 10 promoted the last two):
because the synthetic raster is a truncated repetition of the 16-byte
md5(text) digest, every decoded statistic has a closed form over the
48-byte pattern period (lcm of the RGB stride 3 and digest length 16)
that the oracle computes directly from the md5 hex — the decode path
is verified bit-for-bit against SQL that never touches a binary.
Self-tests additionally assert determinism, exact pixel counts, and
header/metadata agreement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import fan_out, load_table


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> media table: (doc_id, payload binary PPM image,
    media struct<width int, height int, n_frames int>).

    The payload is a complete, valid P6 PPM file built from Column
    expressions: ``"P6\\n{w} {h}\\n255\\n"`` header + a raster of
    exactly w*h*3 bytes (md5(text) digest repeated then truncated —
    deterministic, engine-independent content). Metadata travels as a
    typed struct: columnar, prunable, filterable without touching a
    single payload byte — the core convention for multimodal columns
    at 100 TB.

    The fan_out sits BELOW payload construction: when the fixture scan
    is one row group, only (doc_id, text, n_chars) rebalances — the
    payload bytes are built post-shuffle and still never cross an
    exchange (the r7 decade-up study measured the decode chain running
    on the scan's 1-3 native splits regardless of local[32]; at
    production scale the guard no-ops and payloads arrive in many
    native splits).
    """
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, sf_dir)
    w = (F.col("n_chars") % 64 + 16).cast("int")
    h = (F.col("doc_id") % 48 + 16).cast("int")
    # md5 hex is 32 chars = 16 bytes; repeat enough times, truncate to
    # exactly w*h*3 bytes (substring works on binary).
    raster = F.expr(
        "substring(unhex(repeat(md5(text), "
        "cast(ceil((((n_chars % 64 + 16) * (doc_id % 48 + 16)) * 3) / 16) as int)"
        ")), 1, ((n_chars % 64 + 16) * (doc_id % 48 + 16)) * 3)"
    )
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"),
    ).cast("binary")
    return d.select(
        "doc_id",
        F.concat(header, raster).alias("payload"),
        F.struct(
            w.alias("width"),
            h.alias("height"),
            (F.col("n_chars") % 7 + 1).cast("int").alias("n_frames"),
        ).alias("media"),
    )


def _sql_hb(e: str) -> str:
    """SQL: integer value of md5-digest byte ``e`` (an expression in
    0..15), read from the 32-char hex string column ``hx`` — the same
    strpos/substr lookup q_mm_features_verified's oracle inlines. The
    raster byte at offset j is digest[j % 16], so every decoded
    statistic reduces to sums over these 16 byte values."""
    return (
        f"((strpos('0123456789abcdef', substr(hx, 2 * ({e}) + 1, 1)) - 1) * 16"
        f" + strpos('0123456789abcdef', substr(hx, 2 * ({e}) + 2, 1)) - 1)"
    )


def _decode_ppm(payload: bytes):
    """Pure-numpy decoder for binary P6 PPM images: parses the magic
    number, dimensions, and max-value header tokens, then decodes the
    raster into an (h, w, 3) uint8 array. Raises on malformed input —
    a real parser, not a stub."""
    import numpy as np

    if not payload.startswith(b"P6\n"):
        raise ValueError("not a P6 PPM payload")
    _, dims, maxval, raster = payload.split(b"\n", 3)
    w, h = (int(t) for t in dims.split())
    if maxval != b"255":
        raise ValueError(f"unsupported maxval {maxval!r}")
    if len(raster) < w * h * 3:
        raise ValueError("truncated raster")
    return np.frombuffer(raster[: w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def _phash_batch(payloads: "pd.Series"):
    """Vectorized 64-px perceptual hash of a batch of P6 PPM payloads:
    returns (phash int64[n], n_px int64[n]).

    The header of every payload is parsed and validated individually
    (magic number, maxval, raster length — the same checks as
    ``_decode_ppm``), then the 8x8 sample grid for ALL images is
    gathered with one fancy-index over the batch's concatenated raster
    buffer and the gradient bits are packed in one int64 matmul-free
    pass. Per-image Python work is reduced to the header split; the
    pixel math runs once per batch, not once per row — bit-identical
    to the per-row ``_decode_ppm`` + np.ix_ form (pytest-forced)."""
    import numpy as np

    n = len(payloads)
    ws = np.empty(n, np.int64)
    hs = np.empty(n, np.int64)
    rasters = []
    for i, p in enumerate(payloads):
        p = bytes(p)
        if not p.startswith(b"P6\n"):
            raise ValueError("not a P6 PPM payload")
        _, dims, maxval, raster = p.split(b"\n", 3)
        w, h = (int(t) for t in dims.split())
        if maxval != b"255":
            raise ValueError(f"unsupported maxval {maxval!r}")
        if len(raster) < w * h * 3:
            raise ValueError("truncated raster")
        ws[i] = w
        hs[i] = h
        rasters.append(raster[: w * h * 3])
    buf = np.frombuffer(b"".join(rasters), dtype=np.uint8)
    sizes = ws * hs * 3
    offs = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    g8 = np.arange(8)
    ys = (g8[None, :] * hs[:, None]) // 8  # (n, 8) sampled rows
    xs = (g8[None, :] * ws[:, None]) // 8  # (n, 8) sampled cols
    # linear byte offset of each sampled pixel's R byte: (n, 8, 8)
    base = (
        ys[:, :, None] * ws[:, None, None] + xs[:, None, :]
    ) * 3 + offs[:, None, None]
    gray = (buf[base].astype(np.int64) + buf[base + 1] + buf[base + 2]) // 3
    bits = gray[:, :, :7] > gray[:, :, 1:]  # horizontal gradient
    weights = np.int64(1) << (
        np.arange(8)[:, None] * 7 + np.arange(7)[None, :]
    )
    return (bits * weights).sum(axis=(1, 2)), ws * hs


N_BINARY_FILES = 12


def _ppm_file_payload(i: int) -> tuple[str, bytes]:
    """Deterministic standalone PPM file #i: (filename, bytes). Pure
    Python (hashlib md5 raster), so the SQL oracle can embed the exact
    expected (name, length, md5) rows as literals."""
    import hashlib

    w, h = 16 + i % 5, 16 + (i * 3) % 7
    header = f"P6\n{w} {h}\n255\n".encode()
    need = w * h * 3
    buf = b""
    k = 0
    while len(buf) < need:
        buf += hashlib.md5(f"ppmfile_{i}_{k}".encode()).digest()
        k += 1
    return f"img_{i:03d}.ppm", header + buf[:need]


def _binaryfile_oracle() -> str:
    import hashlib

    rows = []
    for i in range(N_BINARY_FILES):
        name, payload = _ppm_file_payload(i)
        md5 = hashlib.md5(payload).hexdigest()
        rows.append(f"('{name}', {len(payload)}, '{md5}')")
    values = ",\n           ".join(rows)
    return f"""
    SELECT file_name, CAST(length AS BIGINT) AS length, content_md5
    FROM (VALUES {values}) AS t(file_name, length, content_md5)
    """


@register(
    "q_source_binaryfile",
    oracle=_binaryfile_oracle(),
    tier="P1",
    doc="Raw media-file ingest via Spark's built-in binaryFile source — "
    "the entry point of every multimodal pipeline (a lake directory of "
    "image files -> a DataFrame of payload bytes + file metadata). The "
    "operator writes deterministic standalone PPM files, reads the "
    "directory back with format('binaryFile'), and emits per-file "
    "(name, length, md5) — hash-checked against oracle literals "
    "computed from the same pure-Python generator. At 100 TB the "
    "source parallelizes per-file (each task reads whole files; "
    "pathGlobFilter prunes by extension without opening payloads) and "
    "feeds the mapInPandas decode stage (q_mm_image_features) without "
    "the payload bytes ever shuffling.",
)
def q_source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from .scans import _scratch

    path = _scratch(sf_dir, "binary_ppm")
    os.makedirs(path, exist_ok=True)
    for i in range(N_BINARY_FILES):
        name, payload = _ppm_file_payload(i)
        with open(os.path.join(path, name), "wb") as fh:
            fh.write(payload)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.ppm")
        .load(path)
    )
    return files.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length"),
        F.md5(F.col("content")).alias("content_md5"),
    )


@register(
    "q_mm_image_features",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, md5(text) AS hx,
             (n_chars % 64 + 16) AS w, (doc_id % 48 + 16) AS h,
             (n_chars % 64 + 16) * (doc_id % 48 + 16) AS n_px,
             (n_chars % 64 + 16) * (doc_id % 48 + 16) * 3 AS L
      FROM documents
    ),
    b AS (  -- channel sums over the L-truncated 48-byte pattern period
      SELECT doc_id, n_px, L, pos, pos % 3 AS chan,
             {_sql_hb('pos % 16')} AS val
      FROM d CROSS JOIN (SELECT g AS pos FROM generate_series(0, 47) t(g))
    ),
    sums AS (
      SELECT doc_id, n_px,
             sum(CASE WHEN chan = 0 THEN val ELSE 0 END) * (L // 48)
               + sum(CASE WHEN chan = 0 AND pos < L % 48 THEN val ELSE 0 END)
               AS sum_r,
             sum(CASE WHEN chan = 1 THEN val ELSE 0 END) * (L // 48)
               + sum(CASE WHEN chan = 1 AND pos < L % 48 THEN val ELSE 0 END)
               AS sum_g,
             sum(CASE WHEN chan = 2 THEN val ELSE 0 END) * (L // 48)
               + sum(CASE WHEN chan = 2 AND pos < L % 48 THEN val ELSE 0 END)
               AS sum_b
      FROM b GROUP BY doc_id, n_px, L
    ),
    pix AS (  -- the 16 distinct pattern pixels (full period = 16 px)
      SELECT doc_id,
             k,
             {_sql_hb('(3 * k) % 16')}
               + {_sql_hb('(3 * k + 1) % 16')}
               + {_sql_hb('(3 * k + 2) % 16')} AS pixval,
             (299 * {_sql_hb('(3 * k) % 16')}
               + 587 * {_sql_hb('(3 * k + 1) % 16')}
               + 114 * {_sql_hb('(3 * k + 2) % 16')}) // 1000 AS lum
      FROM d CROSS JOIN (SELECT g AS k FROM generate_series(0, 15) t(g))
    ),
    -- n_px >= 256 > 16, so every pattern pixel occurs in every image
    lum AS (SELECT doc_id, CAST(max(lum) AS INT) AS max_lum
            FROM pix GROUP BY doc_id),
    thumb AS (  -- img[::2, ::2]: even rows x even cols, all 3 channels
      SELECT t.doc_id, CAST(sum(p.pixval) AS BIGINT) AS thumb_sum
      FROM (
        SELECT d.doc_id, ((2 * rh.g) * d.w + 2 * ch.g) % 16 AS k
        FROM d
        CROSS JOIN generate_series(0, 31) rh(g)
        CROSS JOIN generate_series(0, 39) ch(g)
        WHERE 2 * rh.g < d.h AND 2 * ch.g < d.w
      ) t JOIN pix p ON p.doc_id = t.doc_id AND p.k = t.k
      GROUP BY t.doc_id
    )
    SELECT s.doc_id,
           CAST(s.n_px AS INT) AS n_px,
           round(s.sum_r / s.n_px, 4) AS mean_r,
           round(s.sum_g / s.n_px, 4) AS mean_g,
           round(s.sum_b / s.n_px, 4) AS mean_b,
           l.max_lum,
           t.thumb_sum
    FROM sums s
    JOIN lum l ON l.doc_id = s.doc_id
    JOIN thumb t ON t.doc_id = s.doc_id
    """,
    tier="P2",
    doc="Multimodal feature extraction with a REAL decode: mapInPandas "
    "over (payload, metadata) batches -> per-doc image statistics via "
    "the pure-numpy PPM parser (_decode_ppm): per-channel means, max "
    "luminance (ITU-R 601 integer weights), and a strided 2x-downsample "
    "checksum (the resize step). Dimensions parsed from the file header "
    "are validated against the metadata struct. HASH-CHECKED since "
    "round 10 (previously the rows-only carve-out): the raster is the "
    "md5 digest repeated, so channel sums come from the 48-byte "
    "pattern period, max luminance from the 16 distinct pattern "
    "pixels (every image holds >= 256 px, so all 16 occur), and the "
    "2x-downsample checksum from enumerating even (row, col) cells "
    "and folding pixel-index mod 16 back onto the pattern — the "
    "numpy decode arithmetic is verified bit-for-bit against SQL "
    "that never parses a binary. Means are exact int sums / n_px "
    "(one IEEE division of exactly-representable ints on both "
    "engines) rounded 4dp per the determinism contract. Payloads "
    "never shuffle — only per-doc feature rows do.",
)
def q_mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = media_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload, media in zip(
                pdf["doc_id"], pdf["payload"], pdf["media"]
            ):
                img = _decode_ppm(bytes(payload))
                h, w, _ = img.shape
                if (w, h) != (media["width"], media["height"]):
                    raise ValueError(
                        f"header {w}x{h} != metadata for doc {doc_id}"
                    )
                means = img.reshape(-1, 3).mean(axis=0)
                # integer luminance (exact): (299 R + 587 G + 114 B)/1000
                lum = (
                    299 * img[:, :, 0].astype(np.int64)
                    + 587 * img[:, :, 1].astype(np.int64)
                    + 114 * img[:, :, 2].astype(np.int64)
                ) // 1000
                small = img[::2, ::2]  # strided 2x downsample (resize)
                rows.append(
                    (
                        int(doc_id),
                        int(h * w),
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                        int(lum.max()),
                        int(small.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_px", "mean_r", "mean_g", "mean_b",
                    "max_lum", "thumb_sum",
                ],
            )

    out = src.mapInPandas(
        extract,
        schema="doc_id long, n_px int, mean_r double, mean_g double, "
        "mean_b double, max_lum int, thumb_sum long",
    )
    return out.select(
        "doc_id",
        "n_px",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"),
        "max_lum",
        "thumb_sum",
    )


@register(
    "q_mm_frame_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, md5(text) AS hx,
             CAST(n_chars % 7 + 1 AS BIGINT) AS n_frames,
             (n_chars % 64 + 16) * (doc_id % 48 + 16) * 3 AS L
      FROM documents
    ),
    b AS (
      SELECT doc_id, L, pos, {_sql_hb('pos % 16')} AS val
      FROM d CROSS JOIN (SELECT g AS pos FROM generate_series(0, 47) t(g))
    )
    SELECT b.doc_id,
           any_value(d.n_frames) AS n_frames,
           CAST(sum(val) * (b.L // 48)
             + sum(CASE WHEN pos < b.L % 48 THEN val ELSE 0 END)
             AS BIGINT) AS checksum_sum
    FROM b JOIN d ON d.doc_id = b.doc_id
    GROUP BY b.doc_id, b.L
    """,
    tier="P2",
    doc="Frame sampling over decoded images: the raster is split into "
    "n_frames horizontal bands (the video-frame analog), each band "
    "checksummed from the DECODED array — the explode-shaped "
    "mapInPandas pattern a real frame-sampler uses (one input row -> "
    "n_frames output rows, then a per-doc aggregate). HASH-CHECKED "
    "since round 10 (previously the rows-only carve-out): "
    "np.array_split partitions the rows, so the per-band checksums "
    "telescope — their sum is the TOTAL raster sum, which the oracle "
    "computes in closed form from the 48-byte digest pattern period; "
    "and with n_frames = n_chars%7+1 <= 7 < 16 <= h every band is "
    "non-empty, so the band count equals the metadata value exactly.",
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = media_table(spark, sf_dir)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            doc_ids, frame_idx, checksums = [], [], []
            for doc_id, payload, media in zip(
                pdf["doc_id"], pdf["payload"], pdf["media"]
            ):
                img = _decode_ppm(bytes(payload)).astype(np.int64)
                n_frames = int(media["n_frames"])
                bands = np.array_split(img, n_frames, axis=0)
                for k, band in enumerate(bands):
                    doc_ids.append(int(doc_id))
                    frame_idx.append(k)
                    checksums.append(int(band.sum()))
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": frame_idx, "checksum": checksums}
            )

    frames = src.mapInPandas(
        sample, schema="doc_id long, frame_idx int, checksum long"
    )
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("checksum").alias("checksum_sum"),
    )


@register(
    "q_mm_features_verified",
    oracle="""
    WITH d AS (
      SELECT doc_id, md5(text) AS hx,
             (n_chars % 64 + 16) * (doc_id % 48 + 16) AS n_px,
             (n_chars % 64 + 16) * (doc_id % 48 + 16) * 3 AS L
      FROM documents
    ),
    p AS (SELECT g AS pos FROM generate_series(0, 47) t(g)),
    b AS (
      SELECT doc_id, n_px, L, pos, pos % 3 AS chan,
             (strpos('0123456789abcdef',
                     substr(hx, 2 * (pos % 16) + 1, 1)) - 1) * 16
             + strpos('0123456789abcdef',
                      substr(hx, 2 * (pos % 16) + 2, 1)) - 1 AS val
      FROM d CROSS JOIN p
    )
    SELECT doc_id, n_px,
           CAST(sum(CASE WHEN chan = 0 THEN val ELSE 0 END) * (L // 48)
             + sum(CASE WHEN chan = 0 AND pos < L % 48 THEN val ELSE 0 END)
             AS BIGINT) AS sum_r,
           CAST(sum(CASE WHEN chan = 1 THEN val ELSE 0 END) * (L // 48)
             + sum(CASE WHEN chan = 1 AND pos < L % 48 THEN val ELSE 0 END)
             AS BIGINT) AS sum_g,
           CAST(sum(CASE WHEN chan = 2 THEN val ELSE 0 END) * (L // 48)
             + sum(CASE WHEN chan = 2 AND pos < L % 48 THEN val ELSE 0 END)
             AS BIGINT) AS sum_b
    FROM b
    GROUP BY doc_id, n_px, L
    """,
    tier="P2",
    doc="Multimodal decode with EXACT cross-engine verification: the "
    "same real mapInPandas P6-PPM decode as q_mm_image_features, but "
    "emitting integer per-channel raster sums. Because the synthetic "
    "raster is a truncated repetition of the 16-byte md5(text) digest "
    "(period lcm(3,16)=48 against the RGB stride), the oracle computes "
    "the identical sums in closed form from the md5 hex — hashing a "
    "binary-decode path against SQL, which rows-only checks cannot do. "
    "Scale: the decode parallelizes per document; the oracle-side "
    "closed form is verify-only.",
)
def q_mm_features_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = media_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = _decode_ppm(bytes(payload))
                h, w, _ = img.shape
                flat = img.reshape(-1, 3).astype(np.int64)
                rows.append(
                    (
                        int(doc_id),
                        int(h * w),
                        int(flat[:, 0].sum()),
                        int(flat[:, 1].sum()),
                        int(flat[:, 2].sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_px", "sum_r", "sum_g", "sum_b"]
            )

    return src.select("doc_id", "payload").mapInPandas(
        extract, schema="doc_id long, n_px long, sum_r long, sum_g long, "
        "sum_b long"
    )


def _le32_hex(expr: str) -> str:
    """SQL: little-endian 4-byte hex string of an integer expression."""
    return (
        f"concat(lpad(hex(({expr}) % 256), 2, '0'), "
        f"lpad(hex((({expr}) div 256) % 256), 2, '0'), "
        f"lpad(hex((({expr}) div 65536) % 256), 2, '0'), "
        f"lpad(hex((({expr}) div 16777216) % 256), 2, '0'))"
    )


def audio_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> audio table: (doc_id, payload binary WAV file,
    audio struct<sample_rate int, n_samples int>).

    The payload is a complete, valid RIFF/WAVE file built in Column
    expressions: canonical 44-byte PCM header (chunk sizes little-
    endian, mono, 16-bit, 8 kHz) + a data chunk of int16 samples from
    the repeated md5(text) digest — deterministic, engine-independent
    content, decodable by any audio stack. Same multimodal convention
    as the PPM images: typed prunable metadata struct beside an opaque
    binary column.
    """
    n_samp = "(n_chars % 128 + 64)"
    data_len = f"({n_samp} * 2)"
    payload = F.expr(
        "concat("
        "cast('RIFF' as binary), "
        f"unhex({_le32_hex('36 + ' + data_len)}), "
        "cast('WAVE' as binary), cast('fmt ' as binary), "
        "unhex('10000000'), unhex('0100'), unhex('0100'), "
        "unhex('401F0000'), unhex('803E0000'), unhex('0200'), "
        "unhex('1000'), cast('data' as binary), "
        f"unhex({_le32_hex(data_len)}), "
        f"substring(unhex(repeat(md5(text), "
        f"cast(ceil(({data_len}) / 16.0) as int))), 1, {data_len})"
        ")"
    )
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(8000).alias("sample_rate"),
            F.expr(n_samp).cast("int").alias("n_samples"),
        ).alias("audio"),
    )


def _decode_wav(payload: bytes):
    """Genuine RIFF/WAVE parser (pure numpy/struct): validates magic,
    fmt chunk, PCM/mono/16-bit, and data-chunk length, then decodes
    little-endian int16 samples."""
    import struct

    import numpy as np

    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    if payload[12:16] != b"fmt ":
        raise ValueError("missing fmt chunk")
    (fmt_size,) = struct.unpack("<I", payload[16:20])
    if fmt_size != 16:
        raise ValueError(f"unsupported fmt chunk size {fmt_size}")
    audio_fmt, channels = struct.unpack("<HH", payload[20:24])
    if audio_fmt != 1 or channels != 1:
        raise ValueError("only PCM mono supported")
    (rate,) = struct.unpack("<I", payload[24:28])
    if payload[36:40] != b"data":
        raise ValueError("missing data chunk")
    (dl,) = struct.unpack("<I", payload[40:44])
    data = payload[44 : 44 + dl]
    if len(data) != dl:
        raise ValueError("truncated data chunk")
    return rate, np.frombuffer(data, dtype="<i2")


@register(
    "q_mm_audio_features",
    oracle="""
    WITH d AS (
      SELECT doc_id, md5(text) AS hx,
             n_chars % 128 + 64 AS n
      FROM documents
    ),
    p AS (SELECT g AS i FROM generate_series(0, 7) t(g)),
    s AS (
      SELECT doc_id, n, i,
             (strpos('0123456789abcdef', substr(hx, 2 * (2 * i) + 1, 1)) - 1) * 16
               + strpos('0123456789abcdef', substr(hx, 2 * (2 * i) + 2, 1)) - 1
               AS lo,
             (strpos('0123456789abcdef', substr(hx, 2 * (2 * i + 1) + 1, 1)) - 1) * 16
               + strpos('0123456789abcdef', substr(hx, 2 * (2 * i + 1) + 2, 1)) - 1
               AS hi
      FROM d CROSS JOIN p
    ),
    v AS (
      SELECT doc_id, n, i,
             CASE WHEN lo + 256 * hi >= 32768
                  THEN lo + 256 * hi - 65536
                  ELSE lo + 256 * hi END AS val
      FROM s
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(sum(abs(val)) * (n // 8)
                + sum(CASE WHEN i < n % 8 THEN abs(val) ELSE 0 END)
                AS BIGINT) AS sum_abs,
           CAST(sum(val * val) * (n // 8)
                + sum(CASE WHEN i < n % 8 THEN val * val ELSE 0 END)
                AS BIGINT) AS sum_sq,
           CAST(max(abs(val)) AS BIGINT) AS peak_abs
    FROM v
    GROUP BY doc_id, n
    """,
    tier="P2",
    doc="Multimodal AUDIO decode with EXACT cross-engine verification "
    "— the waveform twin of q_mm_features_verified: the payload is a "
    "complete valid RIFF/WAVE PCM file (canonical 44-byte header "
    "built little-endian in Column expressions), _decode_wav is a "
    "genuine format parser (magic/fmt/PCM/mono validation, int16 LE "
    "frombuffer), and the emitted features are exact integers "
    "(sample count, total absolute amplitude, signal energy, peak). "
    "Samples repeat the 16-byte md5 digest at period 8, so the "
    "oracle reproduces every sum in closed form from the hex — a "
    "real binary audio decode path hashed against SQL. Payload "
    "bytes decode inside mapInPandas and never shuffle; per-doc "
    "features are all that moves. Swapping WAV for FLAC/MP3 means "
    "replacing one parser with soundfile/librosa.",
)
def q_mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = audio_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload, sample_rate, n_samples in zip(
                pdf["doc_id"], pdf["payload"], pdf["sample_rate"],
                pdf["n_samples"],
            ):
                rate, samples = _decode_wav(bytes(payload))
                if rate != int(sample_rate):
                    raise ValueError("header/metadata sample-rate mismatch")
                if samples.size != int(n_samples):
                    raise ValueError("header/metadata length mismatch")
                s = samples.astype(np.int64)
                rows.append(
                    (
                        int(doc_id),
                        int(s.size),
                        int(np.abs(s).sum()),
                        int((s * s).sum()),
                        int(np.abs(s).max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "sum_abs", "sum_sq", "peak_abs"],
            )

    return src.select(
        "doc_id",
        "payload",
        F.col("audio.sample_rate").alias("sample_rate"),
        F.col("audio.n_samples").alias("n_samples"),
    ).mapInPandas(
        extract,
        schema="doc_id long, n_samples long, sum_abs long, sum_sq long, "
        "peak_abs long",
    )


N_VIDEO_FRAME_BYTES = 160  # 16-byte digest x 10 repeats


def video_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> video table: (doc_id, payload binary SVID
    container, video struct<n_frames int, frame_bytes int>).

    SVID is a minimal-but-real container built in Column expressions:
    magic 'SVID', one byte frame count, uint16-LE frame length, then
    n_frames fixed-length frames. Frame f's bytes are the 16-byte
    md5(md5(text) || '-' || f) digest repeated 10x — per-frame content
    that differs deterministically along the time axis, so temporal
    operators (stride sampling, per-frame stats) have real structure
    to verify against. Same multimodal convention as PPM/WAV: typed
    prunable metadata struct beside an opaque binary column.
    """
    nf = "(doc_id % 5 + 2)"  # 2..6 frames
    frame_hexes = ", ".join(
        f"unhex(case when {f} < {nf} then "
        f"repeat(md5(concat(md5(text), '-', '{f}')), 10) else '' end)"
        for f in range(6)
    )
    payload = F.expr(
        "concat(cast('SVID' as binary), "
        f"unhex(lpad(hex({nf}), 2, '0')), "
        "unhex('A000'), "  # frame_len = 160, little-endian uint16
        f"{frame_hexes})"
    )
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.expr(nf).cast("int").alias("n_frames"),
            F.lit(N_VIDEO_FRAME_BYTES).alias("frame_bytes"),
        ).alias("video"),
    )


def _decode_svid(payload: bytes):
    """Genuine SVID container parser: validates magic, reads the frame
    count and little-endian frame length, checks total length, and
    returns the list of frame byte arrays."""
    import struct

    import numpy as np

    if payload[:4] != b"SVID":
        raise ValueError("bad magic")
    n_frames = payload[4]
    (frame_len,) = struct.unpack("<H", payload[5:7])
    if len(payload) != 7 + n_frames * frame_len:
        raise ValueError("container length mismatch")
    body = np.frombuffer(payload, dtype=np.uint8, offset=7)
    return [
        body[f * frame_len : (f + 1) * frame_len] for f in range(n_frames)
    ]


@register(
    "q_mm_video_stride_verified",
    oracle="""
    WITH d AS (
      SELECT doc_id, md5(text) AS hx, doc_id % 5 + 2 AS nf
      FROM documents
    ),
    f AS (SELECT g AS fr FROM generate_series(0, 5) t(g)
          WHERE g % 2 = 0),
    i AS (SELECT g AS px FROM generate_series(0, 15) t(g)),
    b AS (
      SELECT d.doc_id, d.nf, f.fr,
             (strpos('0123456789abcdef',
                     substr(md5(d.hx || '-' || CAST(f.fr AS VARCHAR)),
                            2 * i.px + 1, 1)) - 1) * 16
             + strpos('0123456789abcdef',
                      substr(md5(d.hx || '-' || CAST(f.fr AS VARCHAR)),
                             2 * i.px + 2, 1)) - 1 AS val
      FROM d JOIN f ON f.fr < d.nf CROSS JOIN i
    )
    SELECT doc_id,
           CAST(max(nf) AS INTEGER) AS n_frames,
           CAST(count(*) / 16 AS INTEGER) AS n_sampled,
           CAST(sum(val) * 10 AS BIGINT) AS energy,
           CAST(max(val) AS BIGINT) AS peak
    FROM b
    GROUP BY doc_id
    """,
    tier="P2",
    doc="Multimodal VIDEO decode with EXACT verification — the "
    "temporal member of the verified-decode family beside the PPM "
    "image and RIFF/WAVE audio paths: the payload is a real "
    "container (magic, frame count, LE frame length, fixed-size "
    "frames) built in Column expressions, _decode_svid is a genuine "
    "parser with length validation, and the operator does what video "
    "pipelines do at ingest — STRIDE-SAMPLE every 2nd frame (the "
    "keyframe-thinning step that makes 100 TB of video tractable) "
    "and emit exact integer per-doc features (frames, sampled "
    "frames, sampled energy, peak). Frame bytes repeat a per-frame "
    "md5 digest, so the oracle reproduces every sampled sum in "
    "closed form. Payloads decode inside mapInPandas and never "
    "shuffle; swapping SVID for MP4 means replacing the parser with "
    "pyav and the stride with a keyframe index.",
)
def q_mm_video_stride_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = video_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload, n_frames in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                frames = _decode_svid(bytes(payload))
                if len(frames) != int(n_frames):
                    raise ValueError("header/metadata frame-count mismatch")
                sampled = frames[::2]
                stacked = np.concatenate(sampled).astype(np.int64)
                rows.append(
                    (
                        int(doc_id),
                        len(frames),
                        len(sampled),
                        int(stacked.sum()),
                        int(stacked.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "n_sampled", "energy", "peak"],
            )

    flat = src.select("doc_id", "payload", F.col("video.n_frames").alias("n_frames"))
    return flat.mapInPandas(
        extract,
        schema=(
            "doc_id bigint, n_frames int, n_sampled int, "
            "energy bigint, peak bigint"
        ),
    )


# --- perceptual-hash dedup (round 5) -------------------------------------

_HEXVAL = (
    "((strpos('0123456789abcdef', substr(hx, 2 * ({i}) + 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(hx, 2 * ({i}) + 2, 1)) - 1)"
)


def _gray_sql(base: str) -> str:
    """Closed-form gray value of the synthetic raster pixel whose first
    byte sits at linear offset ``base``: the raster is the 16-byte
    md5(text) digest repeated, so byte(p) = digest[p % 16], and
    gray = (R + G + B) // 3 in exact integer arithmetic."""
    return (
        "(" + " + ".join(
            _HEXVAL.format(i=f"(({base}) + {c}) % 16") for c in (0, 1, 2)
        ) + ") // 3"
    )


@register(
    "q_mm_phash_dedup",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, md5(text) AS hx,
             (n_chars % 64 + 16) AS w, (doc_id % 48 + 16) AS h
      FROM documents
    ),
    grid AS (
      SELECT gy.g AS y, gx.g AS x
      FROM generate_series(0, 7) gy(g) CROSS JOIN generate_series(0, 7) gx(g)
    ),
    gray AS (
      SELECT doc_id, y, x,
             {_gray_sql("(((y * h) // 8) * w + ((x * w) // 8)) * 3")} AS g
      FROM d CROSS JOIN grid
    ),
    bits AS (
      SELECT a.doc_id, a.y, a.x,
             CASE WHEN a.g > b.g THEN 1 ELSE 0 END AS bit
      FROM gray a
      JOIN gray b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
      WHERE a.x < 7
    ),
    ph AS (
      SELECT doc_id,
             CAST(sum(bit * (CAST(1 AS BIGINT) << (y * 7 + x)))
                  AS BIGINT) AS phash
      FROM bits GROUP BY doc_id
    )
    SELECT doc_id, phash,
           CAST(count(*) OVER (PARTITION BY phash) AS BIGINT)
             AS cluster_size
    FROM ph
    """,
    tier="P1",
    doc="Multimodal DEDUP rung: a dHash-style 56-bit perceptual hash "
    "computed from the DECODED image (real mapInPandas P6-PPM parse -> "
    "8x8 nearest-neighbor downsample -> integer gray -> horizontal "
    "gradient sign bits), then duplicate clusters via a groupBy on the "
    "hash. Extends the dedup ladder (exact/minhash/simhash/winnow/"
    "embedding) to binary media: identical images collide exactly, and "
    "near-identical re-encodes would collide in a real corpus (here "
    "content is md5-derived so only exact duplicates cluster — the "
    "detection PLUMBING is what scales). 100 TB: payload bytes never "
    "shuffle — the decode is data-local and only (doc_id, 8-byte hash) "
    "rows reach the exchange, exactly like q_dedup_minhash_bands' "
    "signature-only shuffle; Hamming-radius>0 lookups would band the "
    "56 bits into 4x14-bit keys, same bucket-join shape. The oracle "
    "reproduces the hash in closed form from the md5 hex (digest "
    "period 16 vs RGB stride 3), making a binary decode + downsample "
    "+ bit-packing pipeline hash-verifiable cross-engine.",
)
def q_mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    src = media_table(spark, sf_dir)

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            hashes, _ = _phash_batch(pdf["payload"])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(np.int64), "phash": hashes}
            )

    hashed = src.select("doc_id", "payload").mapInPandas(
        phash, schema="doc_id long, phash long"
    )
    return hashed.withColumn(
        "cluster_size",
        F.count(F.lit(1)).over(Window.partitionBy("phash")),
    )


@register(
    "q_mm_corpus_pipeline",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, n_chars, md5(text) AS hx,
             (n_chars % 64 + 16) AS w, (doc_id % 48 + 16) AS h
      FROM documents
    ),
    grid AS (
      SELECT gy.g AS y, gx.g AS x
      FROM generate_series(0, 7) gy(g) CROSS JOIN generate_series(0, 7) gx(g)
    ),
    gray AS (
      SELECT doc_id, y, x,
             {_gray_sql("(((y * h) // 8) * w + ((x * w) // 8)) * 3")} AS g
      FROM d CROSS JOIN grid
    ),
    bits AS (
      SELECT a.doc_id, a.y, a.x,
             CASE WHEN a.g > b.g THEN 1 ELSE 0 END AS bit
      FROM gray a
      JOIN gray b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
      WHERE a.x < 7
    ),
    ph AS (
      SELECT doc_id,
             CAST(sum(bit * (CAST(1 AS BIGINT) << (y * 7 + x)))
                  AS BIGINT) AS phash
      FROM bits GROUP BY doc_id
    ),
    joined AS (
      SELECT d.doc_id, d.lang, d.w * d.h AS n_px, ph.phash,
             CASE WHEN d.n_chars BETWEEN 100 AND 1000 THEN 1 ELSE 0 END
               AS quality_ok,
             count(*) OVER (PARTITION BY d.lang, ph.phash)
               AS cluster_size,
             min(d.doc_id) OVER (PARTITION BY d.lang, ph.phash)
               AS survivor_id
      FROM d JOIN ph ON ph.doc_id = d.doc_id
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(count(DISTINCT phash) AS BIGINT) AS n_clusters,
           CAST(sum(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_docs,
           CAST(sum(CASE WHEN doc_id = survivor_id AND quality_ok = 1
                         THEN n_px ELSE 0 END) AS BIGINT) AS kept_px
    FROM joined
    GROUP BY lang
    """,
    tier="P1",
    doc="SIGNATURE multimodal curation pipeline — decode, perceptual-"
    "hash dedup, quality gate, and data-card audit composed as ONE "
    "plan: the real mapInPandas P6 decode emits (doc_id, phash, "
    "n_px), joins back to document metadata, per-(lang, phash) "
    "windows mark duplicate clusters and min-id survivors, a "
    "metadata quality gate filters, and a per-lang rollup emits the "
    "audit a media-corpus curation run hands downstream (docs, "
    "unique images, duplicate members, surviving pixels). Payload "
    "bytes cross exactly one Arrow boundary and never shuffle — the "
    "exchanges carry (doc_id, 8-byte hash) pairs and partial "
    "aggregates only. The oracle reproduces the ENTIRE pipeline "
    "(hash included) in closed form from md5 hex, so a multi-stage "
    "binary-decode pipeline is hash-verified end-to-end, the same "
    "one-plan discipline as q_llm_corpus_pipeline and "
    "q_gen_experiment_pipeline.",
)
def q_mm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    src = media_table(spark, sf_dir)

    def phash_px(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            hashes, px = _phash_batch(pdf["payload"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(np.int64),
                    "phash": hashes,
                    "n_px": px,
                }
            )

    hashed = src.select("doc_id", "payload").mapInPandas(
        phash_px, schema="doc_id long, phash long, n_px long"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    w = Window.partitionBy("lang", "phash")
    joined = (
        hashed.join(docs, "doc_id")
        .withColumn(
            "quality_ok",
            F.col("n_chars").between(100, 1000).cast("int"),
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("survivor_id", F.min("doc_id").over(w))
    )
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("phash").alias("n_clusters"),
        F.sum(F.when(F.col("cluster_size") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_docs"),
        F.sum(
            F.when(
                (F.col("doc_id") == F.col("survivor_id"))
                & (F.col("quality_ok") == 1),
                F.col("n_px"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("kept_px"),
    )
