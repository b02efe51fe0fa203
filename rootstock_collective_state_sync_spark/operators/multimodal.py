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

import numpy as np
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


def _by_content_hash(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Repartition on the full 64-bit content hash of ``payload`` so the
    codec stage's parallelism scales with the cluster: with no explicit
    ``num_partitions`` the hash is spread over the session's
    ``spark.sql.shuffle.partitions`` (and AQE may coalesce), never a
    literal cap. Content-hash (rather than upstream layout) keys give
    even work distribution when payload sizes are wildly skewed."""
    key = F.xxhash64("payload")
    if num_partitions is None:
        return df.repartition(key)
    return df.repartition(num_partitions, key)


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
    """Decode dispatch. Two REAL dependency-free codecs are built in —
    binary PPM (``image/x-portable-pixmap``, the netpbm P6 format) and
    PCM WAV (``audio/wav``, RIFF chunks) — both parsed from the public
    format specs, byte by byte. Compressed codecs (JPEG/PNG/MP3/video)
    need libraries this container doesn't ship, so they keep the honest
    ``NotImplementedError``; plug decoders in here."""
    if media_type.startswith("fake/"):
        return {"n_bytes": len(payload), "first_byte": payload[0] if payload else 0}
    if media_type in ("image/x-portable-pixmap", "image/ppm"):
        return decode_ppm(payload)
    if media_type in ("audio/wav", "audio/x-wav", "audio/wave"):
        return decode_wav(payload)
    raise NotImplementedError(
        f"no decoder for {media_type!r}: install the codec library and "
        "register it in decode_media()"
    )


def _parse_ppm(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse a binary PPM (netpbm P6) header + raster: ``P6 <ws> width
    <ws> height <ws> maxval <single-ws> raw-RGB``, where ``#`` starts a
    comment running to end of line anywhere in the header. Only
    maxval <= 255 (1 byte/sample) is supported; 2-byte samples raise.
    Returns ``(width, height, maxval, raster)``."""
    w, h, maxval, raster, _ = _parse_ppm_at(payload, 0)
    return w, h, maxval, raster


def _parse_ppm_at(
    payload: bytes, start: int
) -> tuple[int, int, int, bytes, int]:
    """:func:`_parse_ppm` for concatenated frame streams: parse ONE
    frame beginning at ``start``, additionally returning the index
    just past its raster (the next frame's start)."""
    if payload[start : start + 2] != b"P6":
        raise ValueError(
            f"not a P6 PPM: magic {payload[start:start + 2]!r}"
        )
    pos = start + 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError(f"bad PPM header near byte {pos}")
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates header and raster
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError(f"2-byte PPM samples (maxval={maxval}) not supported")
    n = width * height * 3
    raster = payload[pos : pos + n]
    if len(raster) != n:
        raise ValueError(f"truncated PPM raster: want {n}, have {len(raster)}")
    return width, height, maxval, raster, pos + n


def decode_ppm(payload: bytes) -> dict:
    """Decode a binary PPM (see :func:`_parse_ppm`): dimensions plus
    per-channel means computed over the raw samples — real pixel
    statistics, not a stub."""
    width, height, maxval, raster = _parse_ppm(payload)
    npx = max(width * height, 1)
    return {
        "width": width,
        "height": height,
        "maxval": maxval,
        "n_pixels": width * height,
        "mean_r": sum(raster[0::3]) / npx,
        "mean_g": sum(raster[1::3]) / npx,
        "mean_b": sum(raster[2::3]) / npx,
    }


def decode_wav(payload: bytes) -> dict:
    """PCM WAV via the RIFF container: ``RIFF <size> WAVE`` then
    chunks; ``fmt `` carries (format, channels, sample_rate,
    bits/sample), ``data`` carries the samples. Chunks are walked in
    order with word alignment (odd-sized chunks pad one byte). Returns
    the format fields plus frame count and duration; peak amplitude is
    computed for 16-bit PCM (the overwhelmingly common case)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file: {payload[:12]!r}")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    n_frames = len(data) // block_align if block_align else 0
    out = {
        "audio_format": audio_format,  # 1 = PCM
        "channels": channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_frames": n_frames,
        "duration_s": n_frames / sample_rate if sample_rate else 0.0,
    }
    if audio_format == 1 and bits == 16:
        samples = struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2])
        out["peak"] = max((abs(s) for s in samples), default=0)
    return out


def resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a binary PPM, re-encoded as P6: out
    pixel (x, y) samples in pixel ``((x * in_w) DIV out_w,
    (y * in_h) DIV out_h)`` — integer floor arithmetic, so the result
    is bit-deterministic (and replicable in the SQL oracle). Vectorized
    via numpy fancy indexing on the raster array."""
    import numpy as np

    width, height, maxval, raster = _parse_ppm(payload)
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, 3)
    ys = (np.arange(out_h) * height) // out_h
    xs = (np.arange(out_w) * width) // out_w
    out = arr[ys][:, xs]
    header = f"P6\n{out_w} {out_h}\n{maxval}\n".encode()
    return header + out.tobytes()


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("in_w", T.LongType(), True),
        T.StructField("in_h", T.LongType(), True),
        T.StructField("out_w", T.LongType(), True),
        T.StructField("out_h", T.LongType(), True),
        T.StructField("out_len", T.LongType(), True),
        T.StructField("resized_md5", T.StringType(), True),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def resize_images(
    df: DataFrame, out_w: int, out_h: int, num_partitions: int | None = None
) -> DataFrame:
    """Distributed image resize via Arrow-batched ``mapInPandas``: PPM
    payloads in, resized PPM payloads (+ dims/md5 audit columns) out.
    Failures quarantine into ``decode_error`` per row — at 100 TB a
    corrupt image must not abort the stage. Work is re-balanced by
    payload content hash first (image sizes are wildly skewed relative
    to upstream file layout)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows: dict[str, list] = {k.name: [] for k in RESIZE_SCHEMA}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                rows["doc_id"].append(doc_id)
                try:
                    w, h, _, _ = _parse_ppm(b)
                    rz = resize_ppm(b, out_w, out_h)
                    rows["in_w"].append(w)
                    rows["in_h"].append(h)
                    rows["out_w"].append(out_w)
                    rows["out_h"].append(out_h)
                    rows["out_len"].append(len(rz))
                    rows["resized_md5"].append(hashlib.md5(rz).hexdigest())
                    rows["resized"].append(rz)
                    rows["decode_error"].append(None)
                except ValueError as e:
                    for k in ("in_w", "in_h", "out_w", "out_h", "out_len",
                              "resized_md5", "resized"):
                        rows[k].append(None)
                    rows["decode_error"].append(str(e))
            yield pd.DataFrame(rows)

    return _by_content_hash(df, num_partitions).mapInPandas(batches, RESIZE_SCHEMA)


def attach_ppm_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic PPM fixture generator: each document becomes a
    real P6 image whose dimensions derive from ``doc_id`` and whose
    raster is the text's bytes cycled to fill (ASCII corpus -> exact
    string/byte duality, which is what lets the SQL oracle rebuild the
    identical image). Real pipelines read actual images with
    ``spark.read.format("binaryFile")`` instead."""
    w = (F.lit(8) + F.col("doc_id") % 8).cast("int")
    h = (F.lit(6) + F.col("doc_id") % 5).cast("int")
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"),
    )
    return (
        df.withColumn("_w", w)
        .withColumn("_h", h)
        .withColumn(
            "payload",
            F.concat(
                header,
                F.expr(f"rpad({text_col}, CAST(_w * _h * 3 AS INT), {text_col})"),
            ).cast("binary"),
        )
        .select("doc_id", "payload")
    )


def extract_features(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
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

    return _by_content_hash(df, num_partitions).mapInPandas(batches, FEATURE_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("features", T.MapType(T.StringType(), T.DoubleType()), False),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def decode_feature_map(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Distributed decode stage: run :func:`decode_media` over Arrow
    batches, emitting each payload's numeric features as a
    ``map<string,double>`` (uniform schema across media types — PPM
    rows carry width/mean_r/..., WAV rows carry sample_rate/peak/...).
    Decode failures land in ``decode_error`` instead of killing the
    batch — at 100 TB a corrupt payload must quarantine, not abort."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mts, feats, errs = [], [], [], []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                mt = meta["media_type"]
                ids.append(doc_id)
                mts.append(mt)
                try:
                    d = decode_media(bytes(payload), mt)
                    feats.append(
                        {k: float(v) for k, v in d.items() if isinstance(v, (int, float))}
                    )
                    errs.append(None)
                except (NotImplementedError, ValueError) as e:
                    feats.append({})
                    errs.append(str(e))
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": mts, "features": feats,
                 "decode_error": errs}
            )

    return _by_content_hash(df, num_partitions).mapInPandas(batches, DECODED_SCHEMA)


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


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ahash", T.StringType(), True),
        T.StructField("gray_total", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def image_ahash(
    df: DataFrame, grid: int = 8, num_partitions: int | None = None
) -> DataFrame:
    """Perceptual average-hash over REAL decoded images: nearest-
    neighbor-sample the PPM to ``grid x grid`` (the same sampling
    arithmetic as :func:`resize_ppm`, already pixel-exact against the
    SQL oracle), integer-grayscale each cell ((r+g+b)//3), and emit
    one bit per cell — 1 iff ``gray * grid² > sum(grays)`` (strict,
    integer-exact; no float mean). Visually-near-identical images
    land within a few Hamming bits, so downstream near-dup mining is
    the same banded equi-join :func:`..dedup.simhash` uses — this is
    the image leg of the dedup stack.

    Decode failures quarantine per row (``decode_error``), never
    abort the batch. Arrow-batched ``mapInPandas`` over the content-
    hash partitioning — scales with the cluster, no literal caps.
    """
    import numpy as np

    cells = grid * grid

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes, totals, errs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                ids.append(doc_id)
                try:
                    rz = resize_ppm(bytes(payload), grid, grid)
                    _, _, _, raster = _parse_ppm(rz)
                    a = (
                        np.frombuffer(raster, dtype=np.uint8)
                        .astype(np.int64)
                        .reshape(cells, 3)
                    )
                    grays = a.sum(axis=1) // 3
                    total = int(grays.sum())
                    hashes.append(
                        "".join(
                            "1" if int(g) * cells > total else "0" for g in grays
                        )
                    )
                    totals.append(total)
                    errs.append(None)
                except ValueError as e:
                    hashes.append(None)
                    totals.append(None)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "ahash": hashes,
                    "gray_total": totals,
                    "decode_error": errs,
                }
            )

    return _by_content_hash(df, num_partitions).mapInPandas(batches, AHASH_SCHEMA)


def image_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    bands: int = 8,
    grid: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Image near-duplicate pairs at scale: band the 64-bit
    :func:`image_ahash` into ``bands`` chunks, equi-join on (band,
    chunk) — by pigeonhole a pair within ``max_hamming`` bits is
    GUARANTEED a band collision whenever ``max_hamming < bands``
    (each differing bit ruins at most one band), so the 8-band
    default makes the ≤6-bit search exact, not approximate — then
    verify the exact Hamming distance on candidates only. Same
    linear-shuffle design as the SimHash text path: the join key is
    an 8-bit chunk, never the image, and no all-pairs stage exists.

    Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``,
    ``hamming <= max_hamming``.
    """
    hashes = image_ahash(df, grid=grid, num_partitions=num_partitions).filter(
        F.col("ahash").isNotNull()
    )
    width = (grid * grid) // bands
    banded = hashes.select(
        F.col("doc_id"),
        "ahash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, substring(ahash, b * {width} + 1, {width}) AS chunk))"
            )
        ).alias("bk"),
    ).select("doc_id", "ahash", F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk"))
    a = banded.select(
        F.col("doc_id").alias("id_a"), F.col("ahash").alias("ha"), "band", "chunk"
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"), F.col("ahash").alias("hb"), "band", "chunk"
    )
    cand = (
        a.join(b, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()  # dedup multi-band collisions before the verify
    )
    hamming = F.aggregate(
        F.zip_with(
            F.split("ha", ""),
            F.split("hb", ""),
            lambda x, y: (x != y).cast("int"),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.select("id_a", "id_b", hamming.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# audio: WAV fixture + frame-level energy
# ---------------------------------------------------------------------------


def attach_wav_payload(
    df: DataFrame, text_col: str = "text", sample_rate: int = 8000
) -> DataFrame:
    """Deterministic PCM WAV fixture generator: each document becomes
    a real RIFF/WAVE file (mono, 16-bit, ``sample_rate`` Hz) whose
    sample count derives from ``doc_id`` and whose samples are the
    text's bytes cycled and centered (``(byte - 128) * 256``) — exact
    integer duality with the text, which is what lets the SQL oracle
    rebuild the identical waveform. Real pipelines read actual audio
    with ``spark.read.format("binaryFile")`` instead."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        def wav(doc_id: int, text: str) -> bytes:
            ns = 64 + doc_id % 64
            raw = (text * (ns // max(len(text), 1) + 1))[:ns] if text else "\0" * ns
            samples = [(ord(c) - 128) * 256 for c in raw]
            data = struct.pack(f"<{ns}h", *samples)
            hdr = (
                b"RIFF"
                + struct.pack("<I", 36 + len(data))
                + b"WAVEfmt "
                + struct.pack(
                    "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
                )
                + b"data"
                + struct.pack("<I", len(data))
            )
            return hdr + data

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        wav(int(d), str(t))
                        for d, t in zip(pdf["doc_id"], pdf[text_col])
                    ],
                }
            )

    return df.select("doc_id", text_col).mapInPandas(batches, schema)


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_no", T.LongType(), True),
        T.StructField("energy", T.LongType(), True),
        T.StructField("peak", T.LongType(), True),
        T.StructField("is_silence", T.IntegerType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def audio_frame_energy(
    df: DataFrame,
    frame: int = 16,
    silence_threshold: int = 16 * 4096 * 4096,
    num_partitions: int | None = None,
) -> DataFrame:
    """Frame-level audio energy over PCM WAV payloads: the payload is
    parsed through the RIFF walker (:func:`decode_wav` semantics),
    samples are grouped into non-overlapping ``frame``-sample windows
    (trailing partial frame dropped), and each frame emits its exact
    integer energy (sum of squared samples), peak amplitude, and a
    silence flag (``energy < silence_threshold``) — the
    voice-activity-detection primitive an audio curation pipeline runs
    before transcription. All-integer arithmetic end to end, so the
    SQL oracle replays it bit-exactly.

    Scale design: Arrow-batched ``mapInPandas`` after a content-hash
    repartition (audio payload sizes are wildly skewed); per-row
    errors quarantine into ``decode_error`` instead of failing the
    stage; energy fits int64 up to ~2^19 samples/frame at full scale.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in it:
            rows: dict[str, list] = {k.name: [] for k in AUDIO_FRAME_SCHEMA}

            def emit(doc_id, frame_no, energy, peak, sil, err):
                rows["doc_id"].append(doc_id)
                rows["frame_no"].append(frame_no)
                rows["energy"].append(energy)
                rows["peak"].append(peak)
                rows["is_silence"].append(sil)
                rows["decode_error"].append(err)

            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                try:
                    meta = decode_wav(b)
                    if meta["audio_format"] != 1 or meta["bits_per_sample"] != 16:
                        raise ValueError("only 16-bit PCM supported")
                    # re-walk to the data chunk for the raw samples
                    pos, data = 12, None
                    while pos + 8 <= len(b):
                        cid = b[pos : pos + 4]
                        (size,) = struct.unpack_from("<I", b, pos + 4)
                        if cid == b"data":
                            data = b[pos + 8 : pos + 8 + size]
                            break
                        pos += 8 + size + (size & 1)
                    n = len(data) // 2
                    samples = np.frombuffer(
                        data[: n * 2], dtype="<i2"
                    ).astype(np.int64)
                    nf = n // frame
                    if nf == 0:
                        emit(doc_id, None, None, None, None, "no full frame")
                        continue
                    fr = samples[: nf * frame].reshape(nf, frame)
                    energies = (fr * fr).sum(axis=1)
                    peaks = np.abs(fr).max(axis=1)
                    for i in range(nf):
                        emit(
                            doc_id,
                            i,
                            int(energies[i]),
                            int(peaks[i]),
                            int(energies[i] < silence_threshold),
                            None,
                        )
                except (ValueError, TypeError, IndexError) as e:
                    emit(doc_id, None, None, None, None, str(e))
            yield pd.DataFrame(rows)

    return _by_content_hash(df, num_partitions).mapInPandas(
        batches, AUDIO_FRAME_SCHEMA
    )


def attach_video_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic multi-frame 'video' fixture: ``2 + doc_id % 3``
    real P6 frames concatenated back-to-back, frame ``k``'s raster =
    the text with its first ``k`` chars dropped, cycle-filled — so
    consecutive frames differ by a deterministic pixel shift and the
    SQL oracle can rebuild every frame byte-for-byte (same
    string/byte duality as :func:`attach_ppm_payload`). Real
    pipelines read container formats via ``binaryFile`` + a real
    demuxer behind :func:`decode_media`."""
    w = (F.lit(8) + F.col("doc_id") % 8).cast("int")
    h = (F.lit(6) + F.col("doc_id") % 5).cast("int")
    nf = (F.lit(2) + F.col("doc_id") % 3).cast("int")
    payload = F.expr(
        "aggregate(sequence(0, _nf - 1), cast('' as string), (acc, k) -> "
        "acc || 'P6\\n' || cast(_w as string) || ' ' || cast(_h as string) "
        f"|| '\\n255\\n' || rpad(substr({text_col}, k + 1), "
        f"cast(_w * _h * 3 as int), {text_col}))"
    )
    return (
        df.withColumn("_w", w)
        .withColumn("_h", h)
        .withColumn("_nf", nf)
        .withColumn("payload", payload.cast("binary"))
        .select("doc_id", "payload")
    )


SCENE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("pair_no", T.IntegerType(), False),
        T.StructField("diff_total", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("mean_diff_e6", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def video_scene_scores(
    df: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """Scene-change scoring over REAL decoded frame sequences: walk
    the concatenated P6 stream, and for every consecutive frame pair
    emit the exact integer sum of absolute per-byte raster
    differences plus its e6 mean — the cut-detection signal a video
    curation pipeline thresholds. Exact integers end to end, so the
    oracle replays every byte.

    Plan shape / 100 TB: one Arrow-batched decode pass, work spread
    by content hash (:func:`_by_content_hash`); output is
    frames-per-video-bounded rows, never rasters. Corrupt payloads
    quarantine into ``decode_error`` (single emitted row, pair_no -1)
    instead of aborting the batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "pair_no", "diff_total", "n_bytes",
                "mean_diff_e6", "decode_error",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                try:
                    frames = []
                    pos = 0
                    while pos < len(b):
                        _, _, _, raster, pos = _parse_ppm_at(b, pos)
                        frames.append(raster)
                    if len(frames) < 2:
                        raise ValueError("fewer than 2 frames")
                    for k in range(len(frames) - 1):
                        a, c = frames[k], frames[k + 1]
                        dt = int(
                            np.abs(
                                np.frombuffer(a, dtype=np.uint8).astype(
                                    np.int64
                                )
                                - np.frombuffer(c, dtype=np.uint8).astype(
                                    np.int64
                                )
                            ).sum()
                        )
                        rows["doc_id"].append(doc_id)
                        rows["pair_no"].append(k)
                        rows["diff_total"].append(dt)
                        rows["n_bytes"].append(len(a))
                        rows["mean_diff_e6"].append(
                            dt * 1_000_000 // len(a)
                        )
                        rows["decode_error"].append(None)
                except ValueError as e:
                    rows["doc_id"].append(doc_id)
                    rows["pair_no"].append(-1)
                    for k in ("diff_total", "n_bytes", "mean_diff_e6"):
                        rows[k].append(None)
                    rows["decode_error"].append(str(e))
            yield pd.DataFrame(rows)

    return _by_content_hash(df, num_partitions).mapInPandas(
        batches, SCENE_SCHEMA
    )
