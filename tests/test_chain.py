"""HttpChain: JSON-RPC chain client over an injectable transport
(parity ``createClient.ts:1-25`` + ``config/chain.ts:15-24``), unit +
sync/reorg e2e — the same fake-transport pattern the subgraph client
uses (tests/fake_subgraph.py), applied to eth_getBlockByNumber.
"""

from __future__ import annotations

import pytest

from rootstock_collective_state_sync_spark.streaming import (
    CHAINS,
    ChainRpcError,
    HttpChain,
    ReorgManager,
)
from rootstock_collective_state_sync_spark.streaming.chain import (
    Block,
    synthetic_blocks,
)

from tests.test_streaming import (  # noqa: F401  (world fixture)
    World,
    _reorged_world,
    expected_votes,
    make_engine,
    table_state,
    vote,
    world,
)


def rpc_transport_for(blocks_fn):
    """JSON-RPC 2.0 fake: serves eth_getBlockByNumber from a callable
    returning the current canonical block list (late-bound so reorgs
    take effect mid-test, like a real node's view)."""

    def transport(url: str, body: dict) -> dict:
        assert body["jsonrpc"] == "2.0" and "id" in body
        blocks = {b.number: b for b in blocks_fn()}
        if body["method"] != "eth_getBlockByNumber":
            return {
                "jsonrpc": "2.0", "id": body["id"],
                "error": {"code": -32601, "message": "method not found"},
            }
        tag, _full = body["params"]
        num = max(blocks) if tag == "latest" else int(tag, 16)
        b = blocks.get(num)
        result = None if b is None else {
            "number": hex(b.number),
            "hash": b.hash,
            "timestamp": hex(b.timestamp),
            "parentHash": b.parent_hash,
        }
        return {"jsonrpc": "2.0", "id": body["id"], "result": result}

    return transport


def test_http_chain_head_and_by_number():
    blocks = synthetic_blocks(1, 5)
    chain = HttpChain("fake://rpc", transport=rpc_transport_for(lambda: blocks))
    head = chain.head_block()
    assert head == blocks[-1]
    assert chain.get_block(2) == blocks[1]
    assert chain.get_block(99) is None
    assert isinstance(head, Block) and head.parent_hash == blocks[-2].hash


def test_http_chain_registry_resolution():
    for name, spec in CHAINS.items():
        chain = HttpChain.from_network(name, transport=lambda u, b: {"result": None})
        assert chain.rpc_url == spec.rpc_url
    assert CHAINS["mainnet"].chain_id == 30
    assert CHAINS["testnet"].chain_id == 31
    assert CHAINS["regtest"].chain_id == 33
    with pytest.raises(ValueError, match="Unsupported network"):
        HttpChain.from_network("goerli")
    with pytest.raises(TypeError):
        HttpChain.from_network("")
    with pytest.raises(TypeError):
        HttpChain.from_network(["mainnet", "testnet"])


def test_http_chain_rpc_error_surfaces():
    def err_transport(url, body):
        return {
            "jsonrpc": "2.0", "id": body["id"],
            "error": {"code": -32000, "message": "header not found"},
        }

    chain = HttpChain("fake://rpc", transport=err_transport)
    with pytest.raises(ChainRpcError, match="header not found"):
        chain.head_block()


def test_http_chain_retries_transient_transport_failures():
    """Transport exceptions retry up to `retries` times (viem parity);
    JSON-RPC `error` responses do NOT retry — the node answered."""
    calls = {"n": 0}

    def flaky(url, body):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise ConnectionError("boom")
        return {
            "jsonrpc": "2.0", "id": body["id"],
            "result": {"number": "0x1", "hash": "0xaa", "timestamp": "0x0",
                       "parentHash": ""},
        }

    chain = HttpChain("fake://rpc", transport=flaky, retry_backoff_s=0.0)
    assert chain.get_block(1).hash == "0xaa"
    assert calls["n"] == 3  # 2 failures + 1 success

    always = {"n": 0}

    def dead(url, body):
        always["n"] += 1
        raise ConnectionError("down")

    chain2 = HttpChain("fake://rpc", transport=dead, retries=2, retry_backoff_s=0.0)
    with pytest.raises(ChainRpcError, match="after 3 attempts"):
        chain2.get_block(1)
    assert always["n"] == 3

    rpc_err = {"n": 0}

    def erroring(url, body):
        rpc_err["n"] += 1
        return {"jsonrpc": "2.0", "id": body["id"],
                "error": {"code": -32000, "message": "nope"}}

    chain3 = HttpChain("fake://rpc", transport=erroring, retry_backoff_s=0.0)
    with pytest.raises(ChainRpcError, match="nope"):
        chain3.get_block(1)
    assert rpc_err["n"] == 1  # protocol errors never retry


def test_http_chain_request_ids_increment():
    seen = []

    def transport(url, body):
        seen.append(body["id"])
        return {"jsonrpc": "2.0", "id": body["id"], "result": None}

    chain = HttpChain("fake://rpc", transport=transport)
    chain.get_block(1)
    chain.get_block(2)
    assert seen == [1, 2]


def test_reorg_recovery_over_http_chain(spark, tmp_path, world):
    """The full detect -> ancestor walk -> restore protocol with every
    header read going through JSON-RPC (HttpChain + fake transport)
    instead of StaticChain: recovered state must equal a fresh rebuild
    of the canonical branch."""
    http_chain = HttpChain(
        "fake://rpc", transport=rpc_transport_for(lambda: world.blocks)
    )
    world.extend(
        synthetic_blocks(6, 2, fork_tag="a"),
        {
            6: {"VoteCast": [vote(1, support=2, reason="a-only")]},
            7: {"VoteCast": [vote(7)]},
        },
    )
    eng = make_engine(spark, tmp_path, world, "live")
    eng.bootstrap(at_block=http_chain.head_block().number)
    eng.sync_from_changelog(http_chain.head_block())
    assert eng.get_watermark().number == 7

    _reorged_world(world)  # fork at 4, branch b (chain view is late-bound)
    mgr = ReorgManager(engine=eng, chain=http_chain)
    assert mgr.detect() == 7
    assert mgr.find_common_ancestor() == 4
    assert mgr.detect_and_recover() == "restored@4"

    fresh = make_engine(spark, tmp_path, world, "fresh")
    fresh.bootstrap(at_block=http_chain.head_block().number)
    fresh.sync_from_changelog(http_chain.head_block())
    assert table_state(eng, "VoteCast") == table_state(fresh, "VoteCast")
    assert table_state(eng, "VoteCast") == expected_votes(world)
    assert mgr.detect() is None
