"""Multimodal plumbing + batched-RPC enrichment tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F, types as T

from rootstock_collective_state_sync_spark.operators import multimodal as M
from rootstock_collective_state_sync_spark.sinks import TableCatalog
from rootstock_collective_state_sync_spark.sources import rpc


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "hello multimodal world"), (2, "x"), (3, "a" * 300)],
        ["doc_id", "text"],
    )


def test_attach_payload_meta(docs):
    mm = M.attach_fake_payload(docs)
    rows = {r.doc_id: r for r in mm.collect()}
    assert bytes(rows[1].payload) == b"hello multimodal world"
    assert rows[1].meta.media_type == "fake/text"
    assert rows[3].meta.size_bytes == 300
    assert rows[1].meta.width is None


def test_extract_features_values(docs):
    feats = {r.doc_id: r for r in M.extract_features(M.attach_fake_payload(docs)).collect()}
    assert feats[2].size_bytes == 1
    assert feats[2].header_hex == b"x".hex()
    assert feats[1].content_md5 == hashlib.md5(b"hello multimodal world").hexdigest()


def test_frame_sample_shapes(docs):
    frames = M.frame_sample(M.attach_fake_payload(docs), every_n_bytes=64, max_frames=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[2]) == 1  # tiny payload -> 1 frame
    assert len(by_doc[3]) == 4  # 300 bytes / 64 -> capped at 4
    assert bytes(by_doc[3][0].frame) == b"a" * 64


def test_decode_media_stub():
    assert M.decode_media(b"abc", "fake/text") == {"n_bytes": 3, "first_byte": 97}
    with pytest.raises(NotImplementedError, match="image/jpeg"):
        M.decode_media(b"\xff\xd8", "image/jpeg")


# ---------------------------------------------------------------------------
# RPC multicall enrichment (S6 + J1 + K2)
# ---------------------------------------------------------------------------

PROPOSAL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.BinaryType(), False),
        T.StructField("description", T.StringType(), False),
        T.StructField("rawState", T.IntegerType(), False),
        T.StructField("state", T.StringType(), False),
    ]
)


def pid(i: int) -> bytes:
    return bytes([i]) * 4


def test_refresh_proposal_states(spark, tmp_table_dir):
    table = TableCatalog(spark, tmp_table_dir).table("Proposal").create(
        PROPOSAL_SCHEMA, ["id"], num_buckets=4
    )
    from rootstock_collective_state_sync_spark.sinks import merge_upsert

    merge_upsert(
        table,
        spark.createDataFrame(
            [
                (pid(1), "p1", 0, "Pending"),    # live, will become Active
                (pid(2), "p2", 1, "Active"),     # live, unchanged
                (pid(3), "p3", 7, "Executed"),   # terminal: not refreshed
                (pid(4), "p4", 4, "Succeeded"),  # live, will become Queued
            ],
            PROPOSAL_SCHEMA,
        ),
    )
    v_before = table.current_version()

    def fake_multicall(ids: list[str]) -> dict[str, int]:
        out = {}
        for h in ids:
            i = bytes.fromhex(h[2:])[0]
            # KeyError for any non-live proposal: if the terminal p3
            # were queried, the whole job would fail — this IS the
            # "only live proposals hit the RPC" assertion (the fn runs
            # in worker processes, so a driver-side counter can't see
            # the calls)
            out[h] = {1: 1, 2: 1, 4: 5}[i]  # p1: 0->1, p2: 1->1, p4: 4->5
        return out

    rpc.refresh_proposal_states(table, fake_multicall)
    rows = {bytes(r.id)[0]: (r.rawState, r.state) for r in table.read().collect()}
    assert rows[1] == (1, "Active")      # updated + relabeled
    assert rows[2] == (1, "Active")      # matched but unchanged -> untouched
    assert rows[3] == (7, "Executed")    # terminal state never queried
    assert rows[4] == (5, "Queued")
    assert table.current_version() > v_before


def test_state_label_expr(spark):
    df = spark.createDataFrame([(i,) for i in range(9)], ["rawState"])
    labels = [
        r.l for r in df.select(rpc.state_label_expr().alias("l")).orderBy("rawState").collect()
    ]
    assert labels == list(rpc.PROPOSAL_STATES) + ["Unknown"]


def test_multicall_no_rpc_raises(spark):
    df = spark.createDataFrame([(b"\x01",)], ["id"])
    with pytest.raises(Exception, match="no RPC endpoint"):
        rpc.multicall_states(df).collect()
