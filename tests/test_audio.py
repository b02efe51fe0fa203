"""Unit tests for the audio frame-energy operator: WAV fixture
roundtrip through the RIFF walker, planted waveform energies, and
per-row corrupt-payload quarantine."""

from __future__ import annotations

import struct

from rootstock_collective_state_sync_spark.operators import multimodal as M


def _wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    data = struct.pack(f"<{len(samples)}h", *samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_fixture_wav_decodes(spark):
    docs = spark.createDataFrame([(3, "abcdef")], "doc_id long, text string")
    payload = bytes(M.attach_wav_payload(docs).collect()[0]["payload"])
    meta = M.decode_wav(payload)
    assert meta["audio_format"] == 1
    assert meta["channels"] == 1
    assert meta["bits_per_sample"] == 16
    assert meta["n_frames"] == 64 + 3 % 64  # doc_id-derived sample count
    # first sample = ('a' - 128) * 256
    data = payload[44:]
    (s0,) = struct.unpack_from("<h", data, 0)
    assert s0 == (ord("a") - 128) * 256


def test_planted_frame_energy(spark):
    # 16 samples of +100 then 16 samples of 0 -> frame0 energy
    # 16*100^2, frame1 energy 0 (silent)
    payload = _wav([100] * 16 + [0] * 16)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = {
        r["frame_no"]: r
        for r in M.audio_frame_energy(df, frame=16).collect()
    }
    assert rows[0]["energy"] == 16 * 100 * 100
    assert rows[0]["peak"] == 100
    assert rows[0]["is_silence"] == 1  # quiet signal below threshold
    assert rows[1]["energy"] == 0
    assert rows[1]["is_silence"] == 1
    loud = _wav([20000, -20000] * 16)
    df2 = spark.createDataFrame(
        [(2, bytearray(loud))], "doc_id long, payload binary"
    )
    r2 = M.audio_frame_energy(df2, frame=16).collect()
    assert all(r["is_silence"] == 0 for r in r2)
    assert all(r["peak"] == 20000 for r in r2)


def test_partial_frame_dropped_and_corrupt_quarantined(spark):
    ok = _wav([1000] * 20)  # 16-sample frame + 4 trailing dropped
    df = spark.createDataFrame(
        [(1, bytearray(ok)), (2, bytearray(b"not a wav at all"))],
        "doc_id long, payload binary",
    )
    rows = M.audio_frame_energy(df, frame=16).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["decode_error"] is None
    assert len(by_doc[2]) == 1
    assert by_doc[2][0]["decode_error"] is not None
    assert by_doc[2][0]["energy"] is None
