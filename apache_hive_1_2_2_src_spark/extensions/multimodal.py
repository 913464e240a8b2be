"""Multimodal (binary) column handling for training-data pipelines
(SURVEY.md §2.11 — BASELINE.json mandate; no reference analogue).

Model: image/audio/video payloads are opaque ``binary`` columns plus typed
metadata columns. The container has no image/audio libraries, so the decode
kernels are STUBBED with a deterministic fake (clearly marked below); the
Spark-side plumbing — schema, Arrow batch transfer, ``mapInPandas``
signatures, per-partition batch shapes, fan-out explode for frame sampling —
is real and is what the 100 TB pipeline exercises.

Scale notes: mapInPandas streams Arrow record batches through Python one
partition at a time — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``, not partition size; binary
payloads never pass through the driver. The metadata query is pure built-in
(no Python at all).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table


def _with_payload(df: DataFrame) -> DataFrame:
    """Attach a fake binary media payload (utf-8 bytes of the text column).

    Stands in for a real image/audio blob column; deterministic so both
    engines can reason about lengths/prefixes.
    """
    return df.withColumn("payload", F.encode(F.col("text"), "UTF-8"))


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           hex(encode(substring(text, 1, 4))) AS magic_hex,
           CASE WHEN octet_length(encode(text)) > 400 THEN 'large' ELSE 'small' END
             AS size_class
    FROM documents
    """,
    doc="Typed metadata over an opaque binary column: byte length, magic-"
    "prefix hex, size class — the columns a media table carries alongside "
    "the blob. All JVM-side (no UDF).",
    tags=("extension", "multimodal"),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_payload(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.hex(F.substring("payload", 1, 4)).alias("magic_hex"),
        F.when(F.length("payload") > 400, "large").otherwise("small").alias("size_class"),
    )


@register(
    "multimodal_decode_stub",
    # The deterministic fake decode is pure byte math, so it IS
    # SQL-expressible: the corpus is ASCII (asserted in
    # tests/test_multimodal_oracles.py), hence byte i == ord(char i).
    oracle="""
    SELECT doc_id,
           CAST(64 + octet_length(encode(text)) % 577 AS INTEGER) AS width,
           CAST(64 + COALESCE(list_sum(list_transform(
                    range(1, least(16, length(text)) + 1),
                    i -> ord(substring(text, CAST(i AS INTEGER), 1)))), 0) % 421
                AS INTEGER) AS height,
           'fake-rgb8' AS pixfmt
    FROM documents
    """,
    doc="Image-decode kernel over binary payloads via mapInPandas (Arrow "
    "batches, pandas in, pandas out). The decode itself is a STUB: real "
    "libs (PIL/cv2) are absent in this container, so a deterministic fake "
    "derives width/height from the bytes; swap `_fake_decode` for the real "
    "decoder on a cluster — schema, batching, and partitioning are already "
    "production-shaped. The fake is byte arithmetic, so the oracle "
    "recomputes it exactly in SQL — certifying the Arrow round-trip "
    "preserves every payload byte and row.",
    tags=("extension", "multimodal", "pandas_udf"),
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_payload(load_table(spark, sf_dir, "documents")).select("doc_id", "payload")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # pragma: no cover - real decoder path, absent in container
            from PIL import Image  # noqa: F401

            raise NotImplementedError("real image decode not wired in this container")
        except ImportError:
            pass

        def _fake_decode(buf: bytes) -> tuple[int, int, str]:
            # Deterministic stand-in: "dimensions" from byte stats.
            w = 64 + (len(buf) % 577)
            h = 64 + (sum(buf[:16]) % 421)
            return w, h, "fake-rgb8"

        for pdf in batches:
            decoded = [_fake_decode(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "pixfmt": [d[2] for d in decoded],
                }
            )

    return d.mapInPandas(decode_batches, "doc_id bigint, width int, height int, pixfmt string")


@register(
    "multimodal_frame_sample",
    # Frame layout AND checksum are pure byte math over an ASCII corpus
    # (see test_multimodal_oracles.py), so the whole fan-out is oracled.
    oracle="""
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents WHERE doc_id < 100
    ),
    f AS (
      SELECT doc_id, text, n,
             unnest(range(0, CAST(ceil(n / 128.0) AS BIGINT))) AS fr
      FROM d
    )
    SELECT doc_id,
           CAST(fr AS INTEGER) AS frame_no,
           CAST(fr * 128 AS INTEGER) AS "offset",
           CAST(COALESCE(list_sum(list_transform(
                    range(1, least(128, n - fr * 128) + 1),
                    i -> ord(substring(text, CAST(fr * 128 + i AS INTEGER), 1)))), 0)
                % 65521 AS INTEGER) AS checksum
    FROM f
    """,
    doc="Video frame sampling shape: mapInPandas fans each payload out to "
    "ceil(n_bytes/128) fake 'frames' (one row per frame with offset + a "
    "frame checksum). Demonstrates the 1→N batch fan-out a real "
    "frame-sampler produces; bounded memory via Arrow batch streaming. "
    "The oracle recomputes frame count, offsets AND per-frame byte "
    "checksums in SQL — a full-hash match certifies the fan-out emits "
    "every frame of every doc with byte-exact content.",
    tags=("extension", "multimodal", "pandas_udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_payload(load_table(spark, sf_dir, "documents")).select("doc_id", "payload")
    d = d.filter(F.col("doc_id") < 100).repartition(8, "doc_id")

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_no": [], "offset": [], "checksum": []}
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(buf), 128)):
                    chunk = buf[off : off + 128]
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["offset"].append(off)
                    out["checksum"].append(sum(chunk) % 65521)
            yield pd.DataFrame(out)

    return d.mapInPandas(
        sample_frames, "doc_id bigint, frame_no int, offset int, checksum int"
    )  # no final orderBy: frame rows are a set; sorting the full frame
    # output is a pure extra range-shuffle at scale (order-insensitive compare).
