"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

Design (the 100 TB contract):

- media is an opaque ``binary`` column plus a typed metadata struct —
  Spark never interprets payload bytes in the JVM; decode happens in
  Python workers on Arrow batches, so each executor core streams
  batches without materializing a partition of images at once;
- partitioning is by content hash of the payload (even work
  distribution independent of upstream file layout);
- the actual codec calls are STUBBED: the image/audio libraries are
  not in this container, so ``decode_media`` raises
  ``NotImplementedError`` for real codecs and supports the
  deterministic ``fake/*`` media types used by tests. The Spark-side
  plumbing — schemas, batch iteration, UDF signatures — is real and
  exercised.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("size_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("size_bytes", T.LongType(), False),
        T.StructField("header_hex", T.StringType(), False),
        T.StructField("content_md5", T.StringType(), False),
    ]
)


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Turn the documents table into a multimodal fixture: payload =
    UTF-8 bytes of the text (deterministic), media_type = fake/text.
    Real pipelines replace this with a binary-file / object-store
    reader ('spark.read.format(\"binaryFile\")')."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("fake/text").alias("media_type"),
            F.octet_length(payload).cast("long").alias("size_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, media_type: str) -> dict:
    """Decode stub. Real codecs (image/jpeg via PIL, audio/wav via
    soundfile, video frame-sampling via pyav) are not available in
    this container — the dispatch and error contract is the real
    interface; plug decoders in here."""
    if media_type.startswith("fake/"):
        return {"n_bytes": len(payload), "first_byte": payload[0] if payload else 0}
    raise NotImplementedError(
        f"no decoder for {media_type!r}: install the codec library and "
        "register it in decode_media()"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Per-payload feature extraction via ``mapInPandas``: bytes ->
    (size, 8-byte header hex, content md5). Deterministic, so the
    whole stage is oracle-checkable; swap the body for an embedding
    model / EXIF parser without touching the plan shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payloads = pdf["payload"]
            metas = pdf["meta"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in metas],
                    "size_bytes": [len(p) for p in payloads],
                    "header_hex": [bytes(p[:8]).hex() for p in payloads],
                    "content_md5": [
                        hashlib.md5(bytes(p)).hexdigest() for p in payloads
                    ],
                }
            )

    # repartition by content hash: even work distribution regardless
    # of upstream layout (payload sizes can be wildly skewed)
    return (
        df.repartition(F.pmod(F.xxhash64("payload"), F.lit(32)))
        .mapInPandas(batches, FEATURE_SCHEMA)
    )


def frame_sample(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 4
) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled 'frame' (here: a
    byte-slice window — stands in for video frame extraction; the
    batch-in/rows-out shape is the real contract)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    ids.append(doc_id)
                    nos.append(i)
                    frames.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame": frames})

    return df.mapInPandas(batches, schema)
