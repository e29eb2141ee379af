"""Multimodal-column operators — opaque binary payloads with typed
metadata, processed by Arrow-batched Pandas UDFs over mapInPandas.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic stub (``_decode_stub``) — but everything
Spark-side is real and tested: the binary column type, the typed
metadata struct, the mapInPandas batch iteration, the UDF signature,
and the partitioning. Swapping ``_decode_stub`` for Pillow/ffmpeg is a
one-function change; the plan shape (scan -> mapInPandas -> agg) and
the shuffle behavior are exactly what a production media pipeline runs.

The synthetic payload is derived in-engine: payload = md5 digest bytes
of the document text repeated to a deterministic length, with
"metadata" (width/height/frames) derived from doc features. Because the
derivation is deterministic, the feature-extraction output is
hash-checkable in self-tests (run twice -> identical), while the
queries are registered rows-only (no SQL oracle can run a Pandas UDF).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> synthetic media table: (doc_id, payload binary,
    media struct<width int, height int, n_frames int>).

    ``unhex(md5(text))`` gives a deterministic 16-byte binary payload;
    metadata derives from document stats. This is the engine's
    multimodal column CONVENTION: binary payload + typed metadata
    struct travel together; metadata is columnar and prunable, the
    payload is only deserialized inside Pandas UDF stages.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.unhex(F.md5(F.col("text"))).alias("payload"),
        F.struct(
            (F.col("n_chars") % 64 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 48 + 16).cast("int").alias("height"),
            (F.col("n_chars") % 7 + 1).cast("int").alias("n_frames"),
        ).alias("media"),
    )


def _decode_stub(payload: bytes, width: int, height: int) -> list[int]:
    """STUB for the real image decode (no codec libs in this
    container). Deterministically expands the payload to width*height
    'pixels' by repetition. Replace with e.g. PIL.Image.open in a real
    deployment; the calling plumbing does not change."""
    n = width * height
    reps = (n // len(payload)) + 1
    return list((payload * reps)[:n])


@register(
    "q_mm_image_features",
    oracle=None,
    tier="P2",
    doc="Multimodal feature extraction: mapInPandas over (payload, "
    "metadata) batches -> per-doc 'pixel' statistics (mean/max byte, "
    "px count) via the decode stub. Rows-only (Pandas UDFs have no SQL "
    "oracle); self-test asserts determinism across runs and exact px "
    "counts. Partitioning note: payloads stay inside their partition — "
    "no shuffle until the final small aggregate.",
)
def q_mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = media_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for _, r in pdf.iterrows():
                px = _decode_stub(
                    bytes(r["payload"]), r["media"]["width"], r["media"]["height"]
                )
                rows.append(
                    (
                        int(r["doc_id"]),
                        len(px),
                        float(sum(px)) / len(px),
                        max(px),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_px", "mean_byte", "max_byte"]
            )

    out = src.mapInPandas(
        extract, schema="doc_id long, n_px int, mean_byte double, max_byte int"
    )
    return out.select(
        "doc_id", "n_px", F.round("mean_byte", 4).alias("mean_byte"), "max_byte"
    )


@register(
    "q_mm_frame_sample",
    oracle=None,
    tier="P2",
    doc="Frame sampling plumbing for 'video' payloads: every payload "
    "yields n_frames rows (one per sampled frame) with a per-frame "
    "checksum — the explode-shaped mapInPandas pattern a real "
    "frame-sampler uses. Returns per-doc frame counts + checksum sum.",
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = media_table(spark, sf_dir)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            doc_ids, frame_idx, checksums = [], [], []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                for k in range(int(r["media"]["n_frames"])):
                    doc_ids.append(int(r["doc_id"]))
                    frame_idx.append(k)
                    checksums.append(sum(payload[k::7]))
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
