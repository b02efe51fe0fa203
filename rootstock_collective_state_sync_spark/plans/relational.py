"""Core relational query surface (SURVEY.md §2.3-§2.9).

Each function is one conformance query: a declarative DataFrame plan
(Catalyst chooses the physical strategy) over the driver's test
tables, paired with a DuckDB oracle in :mod:`.registry`. Operator IDs
in docstrings refer to SURVEY.md §2 (reference file:line cited there).

Determinism policy for cross-engine hash comparison:
- money/quantity doubles are cast to ``decimal(18,2)`` BEFORE
  aggregation (exact, engine-independent sums);
- averages/ratios are computed as decimal-sum -> double -> divide ->
  ``round(…, 6)`` in both engines;
- every computed column is aliased identically in plan and oracle;
- **final decimal outputs are cast to DOUBLE on both sides** (r02):
  the driver materializes the DuckDB oracle through pandas, where
  DECIMAL columns become float64 (``str`` ``'529.0'``), while Spark
  decimals stay ``Decimal`` (``str`` ``'529.00'``) — a fixed-scale
  string never hash-matches a float string when the value has
  trailing zeros. Both engines convert the *same exact decimal sum*
  to the nearest double (correctly-rounded, identical bits for any
  |cents| < 2^53), so a final CAST AS DOUBLE in plan + oracle makes
  value, type, and string representation agree everywhere. Integral
  wide-int results are cast to BIGINT instead (exactness kept).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.plans.tables import load_table


def _dec(col: str, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Aggregations (A1-A4) over the fact table
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan->filter->agg (TPC-H Q1 shape). A2/A4 + F2.

    Single shuffle (partial agg map-side via hash aggregate); filter
    pushed to the Parquet scan.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            F.round(
                F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_disc"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_watermark_max_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/S8: resume-watermark read — global max over the stream table.

    Parity: ``db(t).orderBy('blockNumber','desc').first()``
    (reference ``src/watchers/strategies/utils.ts:4-15``); here the
    monotone ``event_id`` plays blockNumber.
    """
    return (
        load_table(spark, sf_dir, "events")
        .agg(F.max("event_id").alias("last_block"))
    )


Q_WATERMARK_ORACLE = "SELECT max(event_id) AS last_block FROM events"


def q_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A4: counts + decimal sums grouped by a key (per-entity
    record counting, ``subgraphSyncer.ts:30-36``)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


Q_GROUP_COUNT_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_distinct_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: distinct key set (``new Set(updatedEntities)`` dedup,
    ``blockChangeLogStrategy.ts:94``)."""
    return (
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .orderBy("event_type")
    )


Q_DISTINCT_SET_ORACLE = "SELECT DISTINCT event_type FROM events ORDER BY event_type"


def q_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface (Catalyst built-in; exposed per SURVEY
    §2.6 note): ROLLUP over two order dimensions."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


Q_ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# Filters (F1-F6)
# ---------------------------------------------------------------------------


def q_filter_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F3: range predicate + declared-column projection (P1).
    Both the filter and the 3-column projection reach the Parquet scan
    (PushedFilters / ReadSchema)."""
    return (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_id") >= 100) & (F.col("event_id") < 600))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


Q_FILTER_RANGE_ORACLE = """
SELECT event_id, user_id, event_type FROM events
WHERE event_id >= 100 AND event_id < 600 ORDER BY event_id
"""


def q_filter_isin_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: membership filter on an enum-ish column (live-proposal
    selection ``rawState IN (…)``, ``blockProposalStateStrategy.ts:20-27``)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isin("O", "P"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


Q_FILTER_ISIN_ORACLE = """
SELECT o_orderstatus, count(*) AS n FROM orders
WHERE o_orderstatus IN ('O','P') GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 + O1 + O2: keyset-pagination page — strictly-greater cursor
    on the PK, ordered, limited (``id_gt`` + ``first:`` + ``orderBy``,
    ``subgraphSyncer.ts:39-42``, ``subgraphQueryBuilder.ts:177-184``)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") > 100)
        .orderBy(F.col("c_custkey").asc())
        .limit(50)
        .select("c_custkey", "c_name", "c_mktsegment")
    )


Q_KEYSET_PAGE_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey > 100 ORDER BY c_custkey ASC LIMIT 50
"""


def q_changelog_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/X5 batch analog: fetch only rows past the stored watermark
    (CDC ``_change_block: {number_gte}``; here: events in the last
    1000 ids relative to the head, computed set-wise, no driver
    round-trip)."""
    ev = load_table(spark, sf_dir, "events")
    head = ev.agg(F.max("event_id").alias("head"))
    return (
        ev.join(F.broadcast(head))
        .filter(F.col("event_id") > F.col("head") - 1000)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_changed"))
        .orderBy("event_type")
    )


Q_CHANGELOG_INCR_ORACLE = """
SELECT event_type, count(*) AS n_changed
FROM events
WHERE event_id > (SELECT max(event_id) FROM events) - 1000
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Joins (J1-J2)
# ---------------------------------------------------------------------------


def q_fk_deref_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: FK dereference — child equi-joined to parent on its key
    (every FK column in the reference is this join, §1.3). Customer
    side is small -> Catalyst broadcasts it (AQE enforces)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        )
        .orderBy(F.col("c_mktsegment").asc_nulls_first())
    )


Q_FK_DEREF_ORACLE = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment ASC NULLS FIRST
"""


def q_broadcast_enrich_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: broadcast hash equi-join of facts to a small enrichment
    side + 'differs' filter — the set-based form of the reference's
    proposal-state diff-update (``blockProposalStateStrategy.ts:54-131``).

    Here: per-part average retail price joined back (broadcast) to
    lineitem; keep rows whose actual price deviates >2x.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    enriched = l.join(
        F.broadcast(p.select("p_partkey", "p_retailprice")),
        l.l_partkey == p.p_partkey,
        "inner",
    )
    return (
        enriched.filter(
            F.col("l_extendedprice") > F.col("p_retailprice") * 2
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_deviant"))
        .orderBy("l_returnflag")
    )


Q_BROADCAST_ENRICH_ORACLE = """
SELECT l_returnflag, count(*) AS n_deviant
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_extendedprice > p_retailprice * 2
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS: customers that placed at least one urgent order
    (left-semi — Catalyst-native join variant, SURVEY §2.5 note)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


Q_SEMI_JOIN_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS: customers with no pending orders (left-anti; the
    referential-cascade cleanup shape, SURVEY §1.3)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


Q_ANTI_JOIN_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderstatus = 'P')
ORDER BY c_custkey
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filter, agg, top-10 (J2 + O1-O3).
    customer is broadcast; orders⋈lineitem shuffles on the order key."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join through region->nation->
    (customer, supplier)->orders->lineitem. Dims broadcast; the only
    big shuffle is lineitem⋈orders."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .filter(customer.c_nationkey == supplier.s_nationkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


Q5_ORACLE = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (O1-O3)
# ---------------------------------------------------------------------------


def q_top1_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/S8: global top-1 by sort — 'latest row by blockNumber'
    (``db(t).orderBy('blockNumber','desc').first()``)."""
    return (
        load_table(spark, sf_dir, "events")
        .orderBy(F.col("event_id").desc())
        .limit(1)
        .select("event_id", "user_id", "event_type")
    )


Q_TOP1_ORACLE = """
SELECT event_id, user_id, event_type FROM events
ORDER BY event_id DESC LIMIT 1
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 per-key variant: top-3 orders by price within each priority
    (window rank — no global sort, one shuffle on the partition key)."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_orderpriority",
            F.col("rk").cast("bigint").alias("rk"),
            "o_orderkey",
            _dec("o_totalprice").cast("double").alias("price"),
        )
        .orderBy("o_orderpriority", "rk")
    )


Q_TOPK_PER_GROUP_ORACLE = """
SELECT o_orderpriority, rk, o_orderkey, price FROM (
  SELECT o_orderpriority, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 3 ORDER BY o_orderpriority, rk
"""


# ---------------------------------------------------------------------------
# Set operations (U1-U3)
# ---------------------------------------------------------------------------


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U3: union of two key sets + distinct (page-append +
    name-dedup shapes, ``subgraphSyncer.ts:124-127``)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct().orderBy("nationkey")


Q_UNION_DISTINCT_ORACLE = """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
) ORDER BY nationkey
"""


def q_except_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: set difference (create-only-missing shape,
    ``dbCreator.ts:202-203``): users with a high-value purchase that
    never produced a high-value error."""
    ev = load_table(spark, sf_dir, "events")
    hi_purchase = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 90))
        .select("user_id")
        .distinct()
    )
    hi_error = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 90))
        .select("user_id")
        .distinct()
    )
    return hi_purchase.exceptAll(hi_error).orderBy("user_id")


Q_EXCEPT_ORACLE = """
SELECT user_id FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 90
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 90
) ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Scalar functions (C1-C5)
# ---------------------------------------------------------------------------


def q_enum_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: enum -> label mapping (``rawState -> 'Pending'…``,
    ``blockProposalStateStrategy.ts:9-18``) as a chained CASE."""
    o = load_table(spark, sf_dir, "orders")
    label = (
        F.when(F.col("o_orderstatus") == "O", "Open")
        .when(F.col("o_orderstatus") == "F", "Fulfilled")
        .when(F.col("o_orderstatus") == "P", "Pending")
        .otherwise("Unknown")
    )
    return (
        o.select(label.alias("status_label"))
        .groupBy("status_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status_label")
    )


Q_ENUM_LABEL_ORACLE = """
SELECT CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Fulfilled'
            WHEN 'P' THEN 'Pending' ELSE 'Unknown' END AS status_label,
       count(*) AS n
FROM orders GROUP BY 1 ORDER BY status_label
"""


def q_bigint_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: watermark arithmetic on wide integers — ``fromBlock =
    last + 1``, look-back ``head - 25000`` — as decimal(38,0) math.

    The arithmetic runs at decimal(38,0) (uint256 policy,
    :mod:`..functions.uint256`); the *output* is cast back to BIGINT
    because the values here are small integrals and the driver's hash
    compares a pandas-floated oracle against Spark Decimals (module
    docstring) — BIGINT is exact and representation-stable.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        (F.max("event_id").cast("decimal(38,0)") + 1).cast("bigint").alias("from_block"),
        (F.max("event_id").cast("decimal(38,0)") - 25000).cast("bigint").alias("lookback_floor"),
        F.count(F.lit(1)).alias("n"),
    )


Q_BIGINT_ARITH_ORACLE = """
SELECT CAST(CAST(max(event_id) AS DECIMAL(38,0)) + 1 AS BIGINT) AS from_block,
       CAST(CAST(max(event_id) AS DECIMAL(38,0)) - 25000 AS BIGINT) AS lookback_floor,
       count(*) AS n
FROM events
"""


def q_hex_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: hex <-> utf8 id conversion (``Buffer.from(hex).toString()``,
    ``reorgCleanupStrategy.ts:12-14``): encode names to hex and back."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        F.col("n_nationkey").alias("nationkey"),
        F.lower(F.hex(F.col("n_name").cast("binary"))).alias("name_hex"),
        F.col("n_name").alias("name_roundtrip"),
    ).orderBy("nationkey")


Q_HEX_ORACLE = """
SELECT n_nationkey AS nationkey,
       lower(hex(CAST(n_name AS BLOB))) AS name_hex,
       n_name AS name_roundtrip
FROM nation ORDER BY nationkey
"""


def q_uint256_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5/§7 risk register: the uint256 shadow-column policy under the
    driver's hash gate (r15 verdict item 7). Three deterministic
    cohorts per order key k, all ingested FROM hex shadows the way
    chain data arrives (reference stores NUMERIC(78,0),
    ``db/schema.ts``; our canonical column is Decimal(38,0) with a
    lossless ``__hex`` shadow — :mod:`..functions.uint256`):

    - small  = 10^38-1 - k: inside Decimal(38,0); proves hex ->
      decimal -> hex round-trips bit-exact and decimal arithmetic on
      the canonical column matches the oracle;
    - over   = 10^38 + k: first values past the canonical range;
      policy says canonical is NULL and the shadow retains the value
      — proven by re-deriving base-10^18 limbs from the shadow with
      exact Python-int arithmetic, vs DuckDB HUGEINT (covers 2^127-1);
    - huge   = 2^200 + k: past HUGEINT too; the oracle pins the limbs
      via embedded pow-mod constants (string/modular domain), the
      Spark side re-derives them from the 53-char shadow.

    Full-width arithmetic (``hex_add``) runs on shadows via
    Arrow-batched Python ints; nothing here is row-at-a-time."""
    from rootstock_collective_state_sync_spark.functions.uint256 import (
        from_hex_checked,
        hex_add,
        hex_chunk,
        to_hex_shadow,
    )

    M = 10**38 - 1
    o = load_table(spark, sf_dir, "orders")
    dec_max = F.expr(f"CAST('{M}' AS DECIMAL(38,0))")
    okey = F.col("o_orderkey").cast("decimal(38,0)")
    base = o.select(
        F.col("o_orderkey").alias("okey"),
        to_hex_shadow(dec_max - okey).alias("h_small"),
        # 2k+1 so the over cohort strictly exceeds 10^38-1 even at
        # o_orderkey = 0 (present in the test data)
        to_hex_shadow((okey * 2 + 1).cast("decimal(38,0)")).alias("h_2k"),
        to_hex_shadow(okey).alias("h_k"),
    )
    huge_base = "0x1" + "0" * 50  # 16^50 = 2^200
    base = base.select(
        "okey",
        "h_small",
        hex_add(F.col("h_small"), F.col("h_2k")).alias("h_over"),
        hex_add(F.lit(huge_base), F.col("h_k")).alias("h_huge"),
    )
    canon = from_hex_checked(F.col("h_small"))
    E18 = 10**18
    return base.select(
        "okey",
        canon.cast("string").alias("v_small_str"),
        (canon % F.lit(10**9)).cast("bigint").alias("small_mod9"),
        (
            (to_hex_shadow(canon) == F.col("h_small")) & canon.isNotNull()
        ).cast("int").alias("roundtrip_ok"),
        from_hex_checked(F.col("h_over")).isNull().cast("int").alias("over_is_null"),
        hex_chunk(F.col("h_over"), 1, E18).alias("over_lo18"),
        hex_chunk(F.col("h_over"), E18, E18).alias("over_mid18"),
        hex_chunk(F.col("h_over"), E18 * E18, E18).alias("over_hi"),
        from_hex_checked(F.col("h_huge")).isNull().cast("int").alias("huge_is_null"),
        hex_chunk(F.col("h_huge"), 1, E18).alias("huge_lo18"),
        hex_chunk(F.col("h_huge"), E18, E18).alias("huge_mid18"),
        F.length("h_huge").alias("huge_hexlen"),
    ).orderBy("okey")


def _uint256_oracle() -> str:
    """Generated like the Hilbert oracle: the only constants the SQL
    embeds are public pow-mod limbs of 2^200 (DuckDB HUGEINT stops at
    2^127-1, so the huge cohort is checked in the modular domain)."""
    M = 10**38 - 1
    E18 = 10**18
    c0 = pow(2, 200, E18)  # 2^200 % 10^18
    c1 = (2**200 // E18) % E18
    return f"""
WITH base AS (
  SELECT o_orderkey AS okey,
         ('{M}'::HUGEINT - o_orderkey) AS v_small,
         ('{M}'::HUGEINT + o_orderkey + 1) AS v_over
  FROM orders
)
SELECT okey,
       CAST(v_small AS VARCHAR) AS v_small_str,
       CAST(v_small % 1000000000 AS BIGINT) AS small_mod9,
       1 AS roundtrip_ok,
       1 AS over_is_null,
       CAST(v_over % {E18} AS BIGINT) AS over_lo18,
       CAST((v_over // {E18}) % {E18} AS BIGINT) AS over_mid18,
       CAST(v_over // ('{E18}'::HUGEINT * '{E18}'::HUGEINT) AS BIGINT) AS over_hi,
       1 AS huge_is_null,
       CAST(({c0}::HUGEINT + okey) % {E18} AS BIGINT) AS huge_lo18,
       CAST(({c1} + ({c0}::HUGEINT + okey) // {E18}) % {E18} AS BIGINT) AS huge_mid18,
       53 AS huge_hexlen
FROM base ORDER BY okey
"""


Q_UINT256_ROUNDTRIP_ORACLE = _uint256_oracle()


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight multi-predicate scan + single global agg —
    the pure filter-pushdown benchmark (all three predicates reach the
    Parquet reader; no shuffle beyond the final 1-group agg)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01"))
            & (F.col("l_shipdate") < F.lit("2000-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1999-01-01'
  AND l_shipdate <  TIMESTAMP '2000-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot surface: order counts, priorities x status columns."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["O", "F", "P"])
        .orderBy("o_orderpriority")
    )


Q_PIVOT_ORACLE = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE surface: all grouping-set combinations over two dims."""
    return (
        load_table(spark, sf_dir, "events")
        .cube("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("event_type").asc_nulls_first(),
            F.col("user_id").asc_nulls_first(),
        )
    )


Q_CUBE_ORACLE = """
SELECT event_type, user_id, count(*) AS n
FROM events GROUP BY CUBE (event_type, user_id)
ORDER BY event_type ASC NULLS FIRST, user_id ASC NULLS FIRST
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL sketch) — algorithm differs per
    engine, so no value oracle; the companion exact count is checked
    by the group_count query. Rows-only."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
        .orderBy("event_type")
    )


def q_approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The layout-invariant deterministic twin of `approx_distinct`
    (r10 verdict item 6): per-type distinct-user estimate via the KMV
    bottom-64 sketch on the deterministic md5 schedule — the exact
    move that made `kmv_distinct_tokens` value-checkable — next to
    the exact count and realized error. The native HLL
    `approx_count_distinct` stays the production alias (constant
    state, mergeable); this twin is the audit the driver can
    hash-check. See :func:`..operators.sketches.kmv_distinct`."""
    from rootstock_collective_state_sync_spark.operators.sketches import (
        kmv_distinct,
    )

    ev = load_table(spark, sf_dir, "events")
    return (
        kmv_distinct(ev, "event_type", "user_id", k=64)
        .orderBy("event_type")
    )


Q_APPROX_DISTINCT_KMV_ORACLE = """
WITH h AS (
  SELECT DISTINCT event_type,
         list_sum(list_transform(range(15), kk ->
             (strpos('0123456789abcdef',
                     substr(md5(user_id::VARCHAR), kk + 1, 1)) - 1)
             * (1::BIGINT << (4 * (14 - kk)))))::BIGINT AS h
  FROM events
),
ex AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
  FROM events GROUP BY 1
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
),
per AS (
  SELECT event_type,
         count(*)::BIGINT AS n_hashes,
         max(CASE WHEN rn = 64 THEN h END) AS hk
  FROM r GROUP BY 1
),
m AS (
  SELECT ex.event_type, n_exact,
         CASE WHEN hk IS NULL THEN n_hashes
              ELSE ((63::HUGEINT * 1152921504606846976::HUGEINT) // hk)::BIGINT
         END AS kmv_est
  FROM ex JOIN per USING (event_type)
)
SELECT event_type, n_exact, kmv_est,
       (abs(kmv_est - n_exact) * 1000000 // n_exact)::BIGINT AS err_e6
FROM m ORDER BY event_type
"""


def q_camel_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C2: naming scalar fns (``toCamelCase``) applied set-wise:
    lower-case the first character of each distinct part type."""
    p = load_table(spark, sf_dir, "part")
    camel = F.concat(
        F.lower(F.substring(F.col("p_type"), 1, 1)),
        F.expr("substring(p_type, 2)"),
    )
    return p.select(camel.alias("camel_type")).distinct().orderBy("camel_type")


Q_CAMEL_ORACLE = """
SELECT DISTINCT lower(substr(p_type,1,1)) || substr(p_type,2) AS camel_type
FROM part ORDER BY camel_type
"""
