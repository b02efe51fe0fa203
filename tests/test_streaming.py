"""Sync engine + reorg protocol tests (FIXTURES.md F9).

A ``World`` holds a block log and per-block entity changes; its
transport answers the engine's GraphQL queries from folded state, so
the whole lifecycle — bootstrap, changelog-driven incremental sync,
reorg restore/rebuild — runs end-to-end with no sockets. The core
property: post-recovery tables ≡ a fresh full rebuild from the
canonical branch (``reorgCleanupStrategy.ts:21-56`` semantics).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from rootstock_collective_state_sync_spark.config import load_entities
from rootstock_collective_state_sync_spark.sinks import TableCatalog
from rootstock_collective_state_sync_spark.sources.graphql import SubgraphClient
from rootstock_collective_state_sync_spark.streaming import (
    Block,
    ReorgManager,
    StaticChain,
    SyncEngine,
)
from rootstock_collective_state_sync_spark.streaming.chain import synthetic_blocks

from tests import fake_subgraph

FIXTURE = Path(__file__).parent / "fixtures" / "entities.yml"


class World:
    """Chain + subgraph state as an event log: (block, entity, record).
    Reorg = truncate the log at the ancestor and extend with the new
    branch. State (incl. ``__changedAtBlock``) is folded on demand."""

    def __init__(self):
        self.blocks: list[Block] = []
        self.log: list[tuple[int, str, dict]] = []

    def extend(self, blocks: list[Block], changes: dict[int, dict[str, list[dict]]]):
        self.blocks.extend(blocks)
        for b in blocks:
            for entity, recs in changes.get(b.number, {}).items():
                for r in recs:
                    self.log.append((b.number, entity, r))

    def reorg(self, ancestor: int):
        self.blocks = [b for b in self.blocks if b.number <= ancestor]
        self.log = [(n, e, r) for (n, e, r) in self.log if n <= ancestor]

    def chain(self) -> StaticChain:
        return StaticChain(self.blocks)

    # -- folded state ---------------------------------------------------------

    def state(self) -> dict[str, dict[str, dict]]:
        out: dict[str, dict[str, dict]] = {}
        for n, entity, rec in self.log:
            cur = out.setdefault(entity, {})
            merged = {**cur.get(rec["id"], {}), **rec, "__changedAtBlock": n}
            cur[rec["id"]] = merged
        return out

    def changelog(self) -> list[dict]:
        by_block: dict[int, set[str]] = {}
        for n, entity, _ in self.log:
            by_block.setdefault(n, set()).add(entity)
        blocks = {b.number: b for b in self.blocks}
        return [
            {
                "id": blocks[n].hash,
                "blockNumber": str(n),
                "blockTimestamp": str(blocks[n].timestamp),
                "updatedEntities": sorted(names),
                "__changedAtBlock": n,
            }
            for n, names in sorted(by_block.items())
        ]

    def dump(self, path) -> str:
        """Serialize folded state for ``fake_subgraph.state_transport``
        — the bridge that lets executor workers (separate processes)
        serve this World through the real DataSource."""
        state = {
            e: sorted(recs.values(), key=lambda r: r["id"])
            for e, recs in self.state().items()
        }
        state["BlockChangeLog"] = sorted(self.changelog(), key=lambda r: r["id"])
        Path(path).write_text(json.dumps(state))
        return str(path)

    # -- transport -------------------------------------------------------------

    def transport(self, url: str, body: dict) -> dict:
        doc = body["query"]
        data = {}
        for m in fake_subgraph._QUERY_RE.finditer(doc):
            entity, idx, root, _, args = m.groups()
            parsed = fake_subgraph._parse_args(args or "")
            if entity == "BlockChangeLog":
                # The Graph's default order is id ascending — keyset
                # pagination depends on it
                recs = sorted(self.changelog(), key=lambda r: r["id"])
            else:
                recs = sorted(
                    self.state().get(entity, {}).values(), key=lambda r: r["id"]
                )
            where = parsed.get("where", {})
            cb = where.pop("_change_block", None)
            recs = [r for r in recs if fake_subgraph._matches(r, where)]
            if cb:
                recs = [
                    r for r in recs if r["__changedAtBlock"] >= int(cb["number_gte"])
                ]
            if "first" in parsed:
                recs = recs[: parsed["first"]]
            data[f"{entity}_{idx}"] = [
                {k: v for k, v in r.items() if not k.startswith("__")} for r in recs
            ]
        return {"data": data}


def vote(i: int, support: int = 0, reason: str = "r") -> dict:
    return {
        "id": f"0x{i:08x}",
        "voter": {"id": "0x" + "aa" * 20},
        "proposal": {"id": "0x" + "bb" * 32},
        "support": support,
        "weight": str(100 + i),
        "reason": reason,
        "blockNumber": "0",
    }


@pytest.fixture()
def world() -> World:
    w = World()
    blocks = synthetic_blocks(1, 5, fork_tag="a")
    w.extend(
        blocks,
        {
            1: {"Account": [{"id": "0x" + "aa" * 20}]},
            2: {"VoteCast": [vote(1), vote(2)]},
            4: {"VoteCast": [vote(3, support=1)]},
        },
    )
    return w


def make_engine(spark, tmp_path, world, name="live") -> SyncEngine:
    return SyncEngine(
        spark=spark,
        schema=load_entities(FIXTURE),
        catalog=TableCatalog(spark, tmp_path / name),
        client=SubgraphClient(url="fake://w", transport=world.transport),
        page_size=3,
        block_interval_threshold=1,
    )


def table_state(engine: SyncEngine, name: str) -> dict:
    rows = engine.catalog.table(name).read().collect()
    return {bytes(r.id).hex(): (r.support, r.reason, str(r.weight)) for r in rows}


def expected_votes(world: World) -> dict:
    return {
        r["id"][2:]: (r["support"], r["reason"], r["weight"])
        for r in world.state().get("VoteCast", {}).values()
    }


def test_bootstrap_full_hydration(spark, tmp_path, world):
    """Bulk hydration goes through the partition-parallel DataSource
    (X7): executors walk disjoint id ranges; the driver-side client is
    never touched and buffers no rows."""
    state_url = "fake-state://" + world.dump(tmp_path / "world_state.json")
    driver_calls: list[int] = []

    def counting(url, body):
        driver_calls.append(1)
        return fake_subgraph.state_transport(url, body)

    eng = SyncEngine(
        spark=spark,
        schema=load_entities(FIXTURE),
        catalog=TableCatalog(spark, tmp_path / "live"),
        client=SubgraphClient(url=state_url, transport=counting),
        page_size=3,
        block_interval_threshold=1,
        config_path=str(FIXTURE),
        transport_path="tests.fake_subgraph:state_transport",
        bulk_num_partitions=4,
    )
    counts = eng.bootstrap(at_block=5)
    assert counts["VoteCast"] == 3 and counts["Account"] == 1
    assert table_state(eng, "VoteCast") == expected_votes(world)
    assert eng.get_watermark() is None  # watermark only via changelog
    assert not driver_calls  # hydration never routed through the driver


def test_bootstrap_serial_fallback(spark, tmp_path, world):
    """Without ``config_path`` the engine falls back to the bounded
    driver-side pagination loop (small incremental batches)."""
    eng = make_engine(spark, tmp_path, world)
    counts = eng.bootstrap(at_block=5)
    assert counts["VoteCast"] == 3 and counts["Account"] == 1
    assert table_state(eng, "VoteCast") == expected_votes(world)
    assert eng.get_watermark() is None


def test_changelog_incremental_sync(spark, tmp_path, world):
    eng = make_engine(spark, tmp_path, world)
    eng.bootstrap(at_block=5)
    # first changelog pass establishes the watermark
    eng.sync_from_changelog(world.chain().head_block())
    wm = eng.get_watermark()
    assert wm.number == 4  # latest changelog entry (block 4)

    # new blocks: an update to vote 1 and a brand-new vote 4
    new_blocks = synthetic_blocks(6, 2, fork_tag="a")
    world.extend(
        new_blocks,
        {
            6: {"VoteCast": [vote(1, support=2, reason="changed")]},
            7: {"VoteCast": [vote(4)]},
        },
    )
    counts = eng.sync_from_changelog(world.chain().head_block())
    # selective + incremental: only VoteCast, and only the 2 records
    # changed past the watermark (_change_block gte), not all 5
    assert counts == {"VoteCast": 2}
    assert table_state(eng, "VoteCast") == expected_votes(world)
    assert eng.get_watermark().number == 7

    # head unchanged -> short-circuit no-op
    assert eng.sync_from_changelog(world.chain().head_block()) == {}


def test_throttling(spark, tmp_path, world):
    eng = make_engine(spark, tmp_path, world)
    eng.block_interval_threshold = 3
    eng.bootstrap(at_block=5)
    head = world.chain().head_block()
    r1 = eng.run_block(head)
    assert r1["changelog"] != "throttled"
    r2 = eng.run_block(Block(head.number + 1, "0x01", 0))
    assert r2["changelog"] == "throttled"
    r3 = eng.run_block(Block(head.number + 3, "0x02", 0))
    assert r3["changelog"] != "throttled"


def test_strategy_error_isolation(spark, tmp_path, world):
    eng = make_engine(spark, tmp_path, world)
    eng.bootstrap(at_block=5)

    def boom(block):
        raise RuntimeError("strategy exploded")

    res = eng.run_block(
        world.chain().head_block(), extra_steps=[("boom", boom)]
    )
    assert isinstance(res["boom"], RuntimeError)
    assert res["changelog"] != "throttled"  # later/earlier steps still ran
    assert eng.get_watermark() is not None


def _reorged_world(world: World) -> World:
    """Fork at block 4: drop block 5+, branch b rewrites history."""
    world.reorg(4)
    branch = synthetic_blocks(5, 3, fork_tag="b")
    world.extend(
        branch,
        {
            5: {"VoteCast": [vote(3, support=2, reason="b-branch")]},
            6: {"VoteCast": [vote(9)]},
        },
    )
    return world


def _sync_to_head(spark, tmp_path, world, name):
    eng = make_engine(spark, tmp_path, world, name)
    eng.bootstrap(at_block=world.chain().head_block().number)
    eng.sync_from_changelog(world.chain().head_block())
    return eng


def test_reorg_detect_clean(spark, tmp_path, world):
    eng = _sync_to_head(spark, tmp_path, world, "live")
    mgr = ReorgManager(engine=eng, chain=world.chain())
    assert mgr.detect() is None


def test_reorg_recovery_equivalence(spark, tmp_path, world):
    # sync live engine fully on branch a (through block 7)
    new_blocks = synthetic_blocks(6, 2, fork_tag="a")
    world.extend(
        new_blocks,
        {
            6: {"VoteCast": [vote(1, support=2, reason="a-only")]},
            7: {"VoteCast": [vote(7)]},
        },
    )
    eng = _sync_to_head(spark, tmp_path, world, "live")
    assert eng.get_watermark().number == 7

    # reorg: fork at 4, branch b
    _reorged_world(world)
    mgr = ReorgManager(engine=eng, chain=world.chain())
    assert mgr.detect() == 7  # stored block-7 hash orphaned
    assert mgr.find_common_ancestor() == 4

    outcome = mgr.detect_and_recover()
    assert outcome == "restored@4"
    # equivalence: recovered state == fresh rebuild from branch b
    fresh = _sync_to_head(spark, tmp_path, world, "fresh")
    assert table_state(eng, "VoteCast") == table_state(fresh, "VoteCast")
    assert table_state(eng, "VoteCast") == expected_votes(world)
    assert mgr.detect() is None  # clean after recovery


def test_reorg_shadow_rebuild_equivalence(spark, tmp_path, world):
    eng = _sync_to_head(spark, tmp_path, world, "live")
    _reorged_world(world)
    mgr = ReorgManager(engine=eng, chain=world.chain())
    mgr.recover_rebuild()
    fresh = _sync_to_head(spark, tmp_path, world, "fresh")
    assert table_state(eng, "VoteCast") == table_state(fresh, "VoteCast")
    assert mgr.detect() is None


def test_append_only_strategy(spark, tmp_path, world):
    # StakingHistory-style: strictly increasing blockNumber records
    eng = make_engine(spark, tmp_path, world)
    eng.bootstrap(at_block=5)
    world.log.append(
        (5, "VoteCast", {**vote(8), "blockNumber": "5"})
    )
    n = eng.sync_append_only("VoteCast")
    assert n >= 1
    assert "0x%08x" % 8 in {"0x" + k for k in table_state(eng, "VoteCast")}
    # re-run: idempotent, nothing newer
    assert eng.sync_append_only("VoteCast") <= n


# ---------------------------------------------------------------------------
# cross-strategy request coalescing (T7/X6) + look-back strategy (F3)
# ---------------------------------------------------------------------------


def _counting(world: World):
    calls: list[str] = []

    def t(url: str, body: dict) -> dict:
        calls.append(body["query"])
        return world.transport(url, body)

    return t, calls


def proposal(i: int, created_at: int) -> dict:
    return {
        "id": f"0x{i:064x}",
        "description": f"prop-{i}",
        "votesFor": "0",
        "votesAgainst": "0",
        "state": "Pending",
        "rawState": 0,
        "createdAtBlock": str(created_at),
        "targets": [],
        "values": [],
        "proposer": {"id": "0x" + "aa" * 20},
    }


def test_run_block_coalesces_strategies_into_one_http(spark, tmp_path, world):
    """Mirror of the reference's 5-strategies->1-HTTP assertion
    (``src/watchers/strategies/batching.test.ts:162-186``): changelog +
    two append-only entities + one look-back entity all prefetch in a
    single aliased document per block."""
    transport, calls = _counting(world)
    eng = SyncEngine(
        spark=spark,
        schema=load_entities(FIXTURE),
        catalog=TableCatalog(spark, tmp_path / "co"),
        client=SubgraphClient(url="fake://w", transport=transport),
        page_size=50,
        block_interval_threshold=1,
    )
    eng.bootstrap(at_block=5)
    eng.sync_from_changelog(world.chain().head_block())  # wm -> 4

    before = len(calls)
    res = eng.run_block(
        Block(5, "0xhead5", 0),
        append_only_entities=["VoteCast", "ClaimedRewardsHistory"],
        lookback_entities=["Proposal"],
    )
    new_calls = calls[before:]
    assert len(new_calls) == 1, f"expected 1 coalesced HTTP, got {new_calls}"
    doc = new_calls[0]
    for alias in ("BlockChangeLog_0", "VoteCast_1", "ClaimedRewardsHistory_2", "Proposal_3"):
        assert alias in doc
    assert res["changelog"] == {}
    assert res["append:VoteCast"] == 0
    assert res["append:ClaimedRewardsHistory"] == 0
    assert res["lookback:Proposal"] == 0


def test_run_block_coalesced_results_equivalent(spark, tmp_path, world):
    """Coalesced pipeline produces the same table state as the serial
    one — new changelog entries still drive selective re-sync."""
    eng = make_engine(spark, tmp_path, world, "eq")
    eng.bootstrap(at_block=5)
    eng.sync_from_changelog(world.chain().head_block())

    new_blocks = synthetic_blocks(6, 2, fork_tag="a")
    world.extend(
        new_blocks,
        {
            6: {"VoteCast": [vote(1, support=2, reason="changed")]},
            7: {"VoteCast": [vote(4)]},
        },
    )
    res = eng.run_block(world.chain().head_block())
    assert res["changelog"] == {"VoteCast": 2}
    assert table_state(eng, "VoteCast") == expected_votes(world)
    assert eng.get_watermark().number == 7


def test_lookback_strategy_fetches_only_window(spark, tmp_path, world):
    """F3: only proposals created inside the trailing window are
    re-fetched (``blockProposalStrategy.ts:51-53,88-93``)."""
    world.extend(
        synthetic_blocks(6, 2, fork_tag="a"),
        {
            6: {"Proposal": [proposal(1, created_at=3), proposal(2, created_at=6)]},
            7: {"Proposal": [proposal(3, created_at=7)]},
        },
    )
    eng = make_engine(spark, tmp_path, world, "lb")
    eng.lookback_window = 2
    eng.bootstrap(at_block=7)

    refreshed: list[int] = []
    head = world.chain().head_block()  # number 7 -> createdAtBlock_gt 5
    n = eng.sync_lookback(
        "Proposal", head, refresh_fn=lambda b: refreshed.append(b.number)
    )
    assert n == 2  # proposals 2 (block 6) and 3 (block 7); 1 is outside
    assert refreshed == [7]

    res = eng.run_block(head, lookback_entities=["Proposal"])
    assert res["lookback:Proposal"] == 2


def test_run_block_batch_failure_falls_back_per_step(spark, tmp_path, world):
    """A failing coalesced batch degrades to per-query execution
    (``batchExecutor.ts:254-264``) without losing any strategy."""
    transport, calls = _counting(world)

    def flaky(url: str, body: dict) -> dict:
        if len(fake_subgraph._QUERY_RE.findall(body["query"])) > 1:
            calls.append(body["query"])
            return {"errors": [{"message": "batch too complex"}]}
        return transport(url, body)

    eng = SyncEngine(
        spark=spark,
        schema=load_entities(FIXTURE),
        catalog=TableCatalog(spark, tmp_path / "fb"),
        client=SubgraphClient(url="fake://w", transport=flaky),
        page_size=50,
        block_interval_threshold=1,
    )
    eng.bootstrap(at_block=5)
    eng.sync_from_changelog(world.chain().head_block())
    res = eng.run_block(
        Block(5, "0xhead5", 0), append_only_entities=["VoteCast"]
    )
    assert res["changelog"] == {}
    assert res["append:VoteCast"] == 0


# ---------------------------------------------------------------------------
# streaming source (offset semantics = emitMissed)
# ---------------------------------------------------------------------------


def test_blockstream_source_offsets(spark, tmp_path):
    from rootstock_collective_state_sync_spark.sources.blockstream import (
        BlockStreamDataSource,
    )

    chain_file = tmp_path / "chain.json"
    blocks = synthetic_blocks(1, 5, fork_tag="s")
    chain_file.write_text(
        json.dumps(
            [
                {"number": b.number, "hash": b.hash, "timestamp": b.timestamp}
                for b in blocks
            ]
        )
    )
    spark.dataSource.register(BlockStreamDataSource)
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def run_once():
        q = (
            spark.readStream.format("blockstream")
            .option("chain_path", str(chain_file))
            .option("start_block", 0)
            .load()
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = {r.number for r in spark.read.parquet(str(out_dir)).collect()}
    assert got == {1, 2, 3, 4, 5}

    # chain grows; same checkpoint -> only the missed blocks replay
    more = synthetic_blocks(6, 3, fork_tag="s")
    chain_file.write_text(
        json.dumps(
            [
                {"number": b.number, "hash": b.hash, "timestamp": b.timestamp}
                for b in blocks + more
            ]
        )
    )
    run_once()
    got = sorted(r.number for r in spark.read.parquet(str(out_dir)).collect())
    assert got == [1, 2, 3, 4, 5, 6, 7, 8]  # no duplicates, no gaps


def test_lookback_with_multicall_refresh_e2e(spark, tmp_path, world):
    """The whole proposal pipeline in one pass (S6+F3+K2): run_block's
    look-back step syncs in-window proposals, then the refresh hook
    fetches on-chain states through the REAL ABI encoder (keccak
    selector -> aggregate3 calldata -> canned JSON-RPC) and
    diff-merges only changed rows."""
    from rootstock_collective_state_sync_spark.sources import abi, rpc
    from tests.test_abi import _encode_results

    world.extend(
        synthetic_blocks(6, 2, fork_tag="a"),
        {
            6: {"Proposal": [proposal(1, created_at=6)]},
            7: {"Proposal": [proposal(2, created_at=7)]},
        },
    )
    eng = make_engine(spark, tmp_path, world, "mc")
    eng.bootstrap(at_block=7)

    gov = "0x" + "cd" * 20
    posted = []

    def fake_post(url, payload):
        posted.append(payload)
        raw = bytes.fromhex(payload["params"][0]["data"][2:])
        n = abi.decode_uint256(raw[4 + 32 : 4 + 64])
        elems = 4 + 64
        results = []
        for i in range(n):
            off = elems + abi.decode_uint256(raw[elems + 32 * i : elems + 32 * i + 32])
            boff = off + abi.decode_uint256(raw[off + 64 : off + 96])
            blen = abi.decode_uint256(raw[boff : boff + 32])
            pid = abi.decode_uint256(raw[boff + 32 + 4 : boff + 32 + blen])
            # proposal 1 -> Active(1), proposal 2 stays Pending(0)
            results.append((True, abi.encode_uint256(1 if pid == 1 else 0)))
        return {"jsonrpc": "2.0", "id": 1, "result": "0x" + _encode_results(results).hex()}

    fn = abi.make_multicall_fn("fake://rpc", gov, post=fake_post)
    table = eng.catalog.table("Proposal")

    res = eng.run_block(
        world.chain().head_block(),
        lookback_entities=["Proposal"],
        lookback_block_col="createdAtBlock",
        lookback_refresh=lambda b: rpc.refresh_proposal_states(table, fn),
    )
    assert res["lookback:Proposal"] == 2
    # (fake_post runs in worker processes — `posted` can't observe the
    # call count from the driver; one-eth_call-per-batch is asserted
    # in tests/test_abi.py::test_make_multicall_fn_end_to_end)
    rows = {bytes(r.id)[-1]: (r.rawState, r.state) for r in table.read().collect()}
    assert rows[1] == (1, "Active")   # diff-updated + relabeled
    assert rows[2] == (0, "Pending")  # unchanged on chain -> untouched


def test_streaming_shell_end_to_end(spark, tmp_path, world):
    """The production loop of the reference (``main.ts:9-36``),
    composed from the engine's streaming pieces: a ``blockstream``
    readStream drives ``foreachBatch`` -> ordered per-block
    ``run_block`` (T8), every block coalesces its strategies into ONE
    prefetch HTTP document (T7), the checkpoint replays exactly the
    missed blocks across a restart (T1/emitMissed), and the persisted
    watermark advances with the changelog (T3)."""
    from rootstock_collective_state_sync_spark.sources.blockstream import (
        BlockStreamDataSource,
    )

    transport, calls = _counting(world)
    eng = SyncEngine(
        spark=spark,
        schema=load_entities(FIXTURE),
        catalog=TableCatalog(spark, tmp_path / "shell"),
        client=SubgraphClient(url="fake://w", transport=transport),
        page_size=50,
        block_interval_threshold=1,
    )
    eng.bootstrap(at_block=5)
    eng.sync_from_changelog(world.chain().head_block())  # wm -> 4

    chain_file = tmp_path / "chain.json"

    def write_chain():
        chain_file.write_text(
            json.dumps(
                [
                    {"number": b.number, "hash": b.hash, "timestamp": b.timestamp}
                    for b in world.blocks
                ]
            )
        )

    processed: list[int] = []

    def handle(batch_df, _epoch):
        # foreachBatch runs driver-side: bounded block-header rows only
        for r in sorted(batch_df.collect(), key=lambda r: r.number):
            eng.run_block(
                Block(r.number, r.hash, r.timestamp),
                append_only_entities=["ClaimedRewardsHistory"],
            )
            processed.append(r.number)

    spark.dataSource.register(BlockStreamDataSource)
    ckpt = tmp_path / "shell_ckpt"

    def run_stream():
        q = (
            spark.readStream.format("blockstream")
            .option("chain_path", str(chain_file))
            .option("start_block", 5)
            .load()
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # chain + subgraph advance to block 7 (one VoteCast change at 6)
    world.extend(
        synthetic_blocks(6, 2, fork_tag="a"),
        {6: {"VoteCast": [vote(1, support=2, reason="streamed")]}},
    )
    write_chain()
    before = len(calls)
    run_stream()
    assert processed == [6, 7]
    assert eng.get_watermark().number == 6

    # restart: chain grows to 9; the SAME checkpoint replays only 8..9
    world.extend(
        synthetic_blocks(8, 2, fork_tag="a"),
        {8: {"VoteCast": [vote(4)]}},
    )
    write_chain()
    run_stream()
    assert processed == [6, 7, 8, 9]  # no duplicates, no gaps
    assert eng.get_watermark().number == 8
    assert table_state(eng, "VoteCast") == expected_votes(world)

    # T7: each of the 4 blocks sent exactly ONE coalesced prefetch doc
    # carrying BOTH strategies; the only extra calls are the follow-up
    # entity fetches for the 2 blocks whose changelog had entries.
    new_calls = calls[before:]
    coalesced = [
        d for d in new_calls
        if "BlockChangeLog_0" in d and "ClaimedRewardsHistory_1" in d
    ]
    assert len(coalesced) == 4
    assert len(new_calls) == 6
