"""T6 reorg recovery at SCALE (r13 verdict item 7): one
detect → restore → replay cycle and one shadow-rebuild → swap cycle
against a corpus-sized vote table, with wall times printed so the
cost curve is MEASURED, not assumed (SCALING.md records the
sf0.1-scale numbers).

Runs at a quick default so the suite stays green everywhere; scale it
to bench size with ``SPARK_GRAFT_REORG_SCALE=50000`` (the sf0.1
`orders`-table magnitude — what SCALING.md's note was measured at).

The correctness contract is the same as the small fixtures
(``test_streaming.py``): post-recovery state ≡ a fresh rebuild from
the canonical branch, and detect() is clean afterwards.
"""

from __future__ import annotations

import os
import time

from rootstock_collective_state_sync_spark.config import load_entities
from rootstock_collective_state_sync_spark.sinks import TableCatalog
from rootstock_collective_state_sync_spark.sources.graphql import SubgraphClient
from rootstock_collective_state_sync_spark.streaming import (
    ReorgManager,
    SyncEngine,
)
from rootstock_collective_state_sync_spark.streaming.chain import (
    synthetic_blocks,
)

from tests.test_streaming import FIXTURE, World, expected_votes, table_state, vote

N = int(os.environ.get("SPARK_GRAFT_REORG_SCALE", "2000"))


def _big_world(n: int) -> World:
    """n votes spread over blocks 2..31 of branch a, heads at 40."""
    w = World()
    blocks = synthetic_blocks(1, 40, fork_tag="a")
    changes: dict[int, dict[str, list[dict]]] = {
        1: {"Account": [{"id": "0x" + "aa" * 20}]}
    }
    per_block = max(1, -(-n // 30))  # ceil: 30 blocks always cover n
    i = 0
    for b in range(2, 32):
        batch = [vote(i + j) for j in range(min(per_block, n - i))]
        i += len(batch)
        changes[b] = {"VoteCast": batch}
        if i >= n:
            break
    w.extend(blocks, changes)
    return w


def test_reorg_recovery_at_scale(spark, tmp_path, capsys):
    world = _big_world(N)
    state_url = "fake-state://" + world.dump(tmp_path / "world_state.json")
    eng = SyncEngine(
        spark=spark,
        schema=load_entities(FIXTURE),
        catalog=TableCatalog(spark, tmp_path / "live"),
        client=SubgraphClient(url=state_url, transport=world.transport),
        page_size=5000,
        block_interval_threshold=1,
        config_path=str(FIXTURE),
        transport_path="tests.fake_subgraph:state_transport",
        bulk_num_partitions=8,
    )
    t0 = time.perf_counter()
    counts = eng.bootstrap(at_block=40)
    t_bootstrap = time.perf_counter() - t0
    assert counts["VoteCast"] >= N
    eng.sync_from_changelog(world.chain().head_block())

    # branch-a tip the reorg will orphan, plus the canonical branch b
    tip = synthetic_blocks(41, 4, fork_tag="a")
    world.extend(
        tip,
        {
            41: {"VoteCast": [vote(i, support=2, reason="a-tip")
                              for i in range(0, max(1, N // 10))]},
            43: {"VoteCast": [vote(10_000_000 + i)
                              for i in range(max(1, N // 20))]},
        },
    )
    eng.sync_from_changelog(world.chain().head_block())
    assert eng.get_watermark().number >= 41

    world.reorg(40)
    branch_b = synthetic_blocks(41, 3, fork_tag="b")
    world.extend(
        branch_b,
        {
            41: {"VoteCast": [vote(i, support=1, reason="b-branch")
                              for i in range(0, max(1, N // 10))]},
            42: {"VoteCast": [vote(20_000_000 + i)
                              for i in range(max(1, N // 20))]},
        },
    )

    mgr = ReorgManager(engine=eng, chain=world.chain())
    t0 = time.perf_counter()
    detected = mgr.detect()
    t_detect = time.perf_counter() - t0
    assert detected is not None

    t0 = time.perf_counter()
    ancestor = mgr.find_common_ancestor()
    t_ancestor = time.perf_counter() - t0
    # the ancestor is the last COMMON CHANGELOG block: blocks 32..40
    # carry no entity changes, so the walk lands on the last populated
    # pre-fork block, not the fork height itself
    assert 0 < ancestor <= 40

    t0 = time.perf_counter()
    mgr.recover_restore(ancestor)
    t_restore = time.perf_counter() - t0
    assert table_state(eng, "VoteCast") == expected_votes(world)
    assert mgr.detect() is None

    # the general fallback on the same corpus: shadow rebuild + swap
    t0 = time.perf_counter()
    mgr.recover_rebuild()
    t_rebuild = time.perf_counter() - t0
    assert table_state(eng, "VoteCast") == expected_votes(world)
    assert mgr.detect() is None

    with capsys.disabled():
        print(
            f"\n[reorg-scale N={N}] bootstrap={t_bootstrap:.1f}s "
            f"detect={t_detect:.2f}s ancestor={t_ancestor:.2f}s "
            f"restore+replay={t_restore:.1f}s shadow_rebuild={t_rebuild:.1f}s"
        )
