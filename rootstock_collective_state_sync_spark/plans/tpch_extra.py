"""Additional TPC-H-shaped conformance queries: date functions, LIKE
predicates, HAVING, conditional aggregation, per-group minima
(correlated-subquery semantics via windows), returned-items top-k.

These widen the relational surface beyond the reference's own
operator set (SURVEY §2.5 note: all join/agg variety is
Catalyst-native; the engine must still expose and verify it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from rootstock_collective_state_sync_spark.plans.tables import load_table


def _dec(col: str, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"


def _rev_col():
    return _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )


def q7_volume_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: fact joined to two small dims, grouped by an
    extracted date part (year) — date functions + multi-join."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            F.col("n_name").alias("supp_nation"),
        )
        .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
        .orderBy("l_year", "supp_nation")
    )


Q7_ORACLE = f"""
SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year, n_name AS supp_nation,
       CAST(sum({_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1, 2 ORDER BY l_year, supp_nation
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-lineitem revenue per customer, top 20."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name, c_mktsegment, CAST(sum({_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: LIKE predicate + conditional aggregation ratio."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    promo = F.when(F.col("p_type").like("PROMO%"), _rev_col()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return joined.agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.sum(_rev_col()).cast("double").alias("total_revenue"),
        F.round(
            F.sum(promo).cast("double") * 100.0 / F.sum(_rev_col()).cast("double"),
            6,
        ).alias("promo_pct"),
    )


Q14_ORACLE = f"""
SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
       CAST(sum({_REV}) AS DOUBLE) AS total_revenue,
       round(CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
             / CAST(sum({_REV}) AS DOUBLE), 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING over a grouped fact, joined back to dims."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "l_orderkey",
            F.col("sum_qty").cast("double").alias("sum_qty"),
            _dec("o_totalprice").cast("double").alias("total_price"),
        )
        .orderBy(F.col("sum_qty").desc(), F.col("l_orderkey").asc())
        .limit(50)
    )


Q18_ORACLE = """
SELECT c_custkey, c_name, l_orderkey, CAST(sum_qty AS DOUBLE) AS sum_qty,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
FROM (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 150
)
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY sum_qty DESC, l_orderkey ASC
LIMIT 50
"""


def q_min_cost_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-flavored correlated-minimum: for each part, the lineitem(s)
    hitting its minimum extended price — the window formulation of a
    correlated scalar subquery (one shuffle on the correlation key,
    no re-scan per outer row)."""
    l = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        l.withColumn("min_price", F.min(_dec("l_extendedprice")).over(w))
        .filter(_dec("l_extendedprice") == F.col("min_price"))
        .select(
            "l_partkey",
            F.col("l_orderkey").alias("order_at_min"),
            F.col("min_price").cast("double").alias("min_price"),
        )
        .orderBy("l_partkey", "order_at_min")
    )


Q_MIN_COST_ORACLE = """
SELECT l_partkey, l_orderkey AS order_at_min, CAST(min_price AS DOUBLE) AS min_price
FROM (
  SELECT l_partkey, l_orderkey,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
         min(CAST(l_extendedprice AS DECIMAL(18,2)))
           OVER (PARTITION BY l_partkey) AS min_price
  FROM lineitem
) WHERE price = min_price
ORDER BY l_partkey, order_at_min
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (the one TPC-H number the registry still lacked):
    for each small part, the EUROPE supplier(s) quoting its minimum
    price — correlated scalar-min over a region-filtered
    supplier×part cost table, returning supplier detail columns
    ordered by account balance. The driver testdata has no partsupp
    table, so lineitem stands in as the cost relation (min
    extendedprice per (part, supplier) — decimal-exact, no division).

    Plan shape: BOTH selective dims broadcast into the fact scan
    before any aggregation — the ``p_size <= 15`` part filter prunes
    lineitems ahead of the (partkey, suppkey) groupBy, so the shuffle
    and the correlated-min window only process small-part rows
    (filtering whole partkey groups commutes with a window
    PARTITIONed BY partkey, so this is exactly the r11 shape's
    result); the cost table shuffles once on (partkey, suppkey); the
    correlated min is a window over partkey reusing that exchange's
    key prefix; top-100 is a TakeOrderedAndProject, never a global
    sort materialization.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)

    supp_eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        l.join(
            F.broadcast(p.select("p_partkey", "p_name")),
            l.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(supp_eu), l.l_suppkey == supp_eu.s_suppkey)
        .groupBy(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name"
        )
        .agg(F.min(_dec("l_extendedprice")).alias("cost"))
    )
    w = Window.partitionBy("p_partkey")
    best = cost.withColumn("min_cost", F.min("cost").over(w)).filter(
        F.col("cost") == F.col("min_cost")
    )
    return (
        best.select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("min_cost").cast("double").alias("min_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


Q2_MIN_COST_SUPPLIER_ORACLE = """
WITH supp_eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cost AS (
  SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name,
         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
  FROM lineitem JOIN supp_eu ON l_suppkey = s_suppkey
  GROUP BY 1, 2, 3, 4, 5
),
best AS (
  SELECT *, min(cost) OVER (PARTITION BY l_partkey) AS min_cost
  FROM cost
)
SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
       p_partkey, p_name, CAST(min_cost AS DOUBLE) AS min_cost
FROM best JOIN part ON l_partkey = p_partkey
WHERE cost = min_cost AND p_size <= 15
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via SQL (the engine's SQL surface — Catalyst
    rewrites it to the same left-semi the DataFrame form plans)."""
    from rootstock_collective_state_sync_spark.plans.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_quantity >= 49)
        ORDER BY p_partkey
        """
    )


Q_EXISTS_ORACLE = """
SELECT p_partkey, p_name FROM part
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_partkey = p_partkey AND l_quantity >= 49)
ORDER BY p_partkey
"""


def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order counts per priority where a correlated EXISTS
    holds (returned lineitems stand in for late ones) — plans as one
    LeftSemi, no per-row subquery."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY 1 ORDER BY 1
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's revenue share per year — conditional
    decimal sums (exact), ratio rounded at the end only."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = _rev_col()
    nat = F.when(F.col("n_name") == "NATION_7", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.year("l_shipdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(nat).cast("double").alias("nation_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
            F.round(
                F.sum(nat).cast("double") * 100.0 / F.sum(rev).cast("double"), 6
            ).alias("share_pct"),
        )
        .orderBy("o_year")
    )


Q8_ORACLE = f"""
SELECT CAST(year(l_shipdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN n_name = 'NATION_7' THEN {_REV}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_revenue,
       CAST(sum({_REV}) AS DOUBLE) AS total_revenue,
       round(CAST(sum(CASE WHEN n_name = 'NATION_7' THEN {_REV}
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
             / CAST(sum({_REV}) AS DOUBLE), 6) AS share_pct
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1 ORDER BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit (revenue − retail cost) per nation and year
    over a name-filtered part set — 4-way join, exact decimal amounts."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    amount = _rev_col() - _dec("p_retailprice") * _dec("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_ORACLE = f"""
SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       CAST(sum({_REV} - CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional counts (urgent vs other orders) per
    lineitem status — counts, not sums, so both engines stay BIGINT."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_ORACLE = """
SELECT l_linestatus,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per (brand, type) for a
    filtered part set, excluding one brand."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") < 20)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type")
    )


Q16_ORACLE = """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size < 20
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_brand, p_type
"""


def q19_disc_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs predicate (brand × quantity bands) —
    the disjunction must still reach the scan as a pushed filter."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & (q >= 20) & (q <= 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
    )


Q19_ORACLE = f"""
SELECT CAST(sum({_REV}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND l_quantity BETWEEN 20 AND 30)
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose total value exceeds 1.5x the per-part
    average (scale-invariant, so every SF yields rows). Integer-cent
    arithmetic with integer division — exact on both engines (no
    float half-boundary); the scalar subquery plans as a reusable
    subquery stage, not a join."""
    from rootstock_collective_state_sync_spark.plans.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH pv AS (
          SELECT l_partkey,
                 sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_cents
          FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey, value_cents FROM pv
        WHERE value_cents > (SELECT (15 * sum(value_cents)) DIV (10 * count(*))
                             FROM pv)
        ORDER BY value_cents DESC, l_partkey
        """
    )


Q11_ORACLE = """
WITH pv AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, value_cents FROM pv
WHERE value_cents > (SELECT (15 * sum(value_cents)) // (10 * count(*)) FROM pv)
ORDER BY value_cents DESC, l_partkey
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers who never placed a
    large (>450k) order — scalar-subquery threshold (exact integer
    cents) + filtered anti join, aggregated per nation."""
    from rootstock_collective_state_sync_spark.plans.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH cents AS (
          SELECT c_custkey, c_nationkey,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
          FROM customer
        )
        SELECT c_nationkey,
               count(*) AS n_customers,
               sum(bal_cents) AS total_cents
        FROM cents c
        WHERE bal_cents > (SELECT sum(bal_cents) DIV count(*) FROM cents
                           WHERE bal_cents > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c.c_custkey
                            AND o_totalprice > 450000)
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """
    )


Q22_ORACLE = """
WITH cents AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
)
SELECT c_nationkey,
       count(*) AS n_customers,
       CAST(sum(bal_cents) AS BIGINT) AS total_cents
FROM cents c
WHERE bal_cents > (SELECT sum(bal_cents) // count(*) FROM cents
                   WHERE bal_cents > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey
                    AND o_totalprice > 450000)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: customer-order-count histogram INCLUDING zero-order
    customers — left outer join + two-level aggregation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count() skips NULLs
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) hitting the global maximum revenue —
    scalar-max subquery with exact integer-cent equality (no float
    ties to worry about on either engine)."""
    from rootstock_collective_state_sync_spark.plans.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH sr AS (
          SELECT l_suppkey,
                 sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev_cents
          FROM lineitem GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, rev_cents
        FROM supplier JOIN sr ON s_suppkey = l_suppkey
        WHERE rev_cents = (SELECT max(rev_cents) FROM sr)
        ORDER BY s_suppkey
        """
    )


Q15_ORACLE = """
WITH sr AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, rev_cents
FROM supplier JOIN sr ON s_suppkey = l_suppkey
WHERE rev_cents = (SELECT max(rev_cents) FROM sr)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: lineitems below 20% of their part's average quantity.
    The correlated average is a window; the comparison cross-multiplies
    integers (5*qty*n < sum) so NO division happens — exact on both
    engines with no rounding boundary at all."""
    l = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    qty_c = F.round(F.col("l_quantity") * 100).cast("bigint")
    return (
        l.select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            qty_c.alias("qty_cents"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_cents"),
        )
        .withColumn("sum_qty", F.sum("qty_cents").over(w))
        .withColumn("n_li", F.count(F.lit(1)).over(w))
        .filter(F.col("qty_cents") * 5 * F.col("n_li") < F.col("sum_qty"))
        .select("l_partkey", "l_orderkey", "l_linenumber", "qty_cents", "price_cents")
        .orderBy("l_partkey", "l_orderkey", "l_linenumber")
    )


Q17_ORACLE = """
SELECT l_partkey, l_orderkey, l_linenumber, qty_cents, price_cents FROM (
  SELECT l_partkey, l_orderkey, l_linenumber,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty_cents,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                OVER (PARTITION BY l_partkey) AS BIGINT) AS sum_qty,
         count(*) OVER (PARTITION BY l_partkey) AS n_li
  FROM lineitem
)
WHERE qty_cents * 5 * n_li < sum_qty
ORDER BY l_partkey, l_orderkey, l_linenumber
"""


def q20_supplier_part_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape — the nested-IN / semi-join chain (suppliers having
    significant availability of some part; reference: TPC-H Q20's
    ``s_suppkey IN (... ps_availqty > 0.5 * sum(l_quantity) ...)``).
    Adapted to the synthetic schema (no partsupp table): a supplier
    qualifies when its shipped quantity of some part exceeds THREE
    TIMES its fair share (part total / number of suppliers of that
    part) — a relative predicate, chosen over an absolute share cut
    because absolute shares shrink as the corpus grows (an absolute
    cut goes vacuous at sf >= 0.01, the q9 trap). Selective but
    non-empty at every shipped scale factor: 3/10 suppliers at
    sf0.001, 99/100 at sf0.01, 544/1000 at sf0.1. Plan: two
    partial-aggregated reductions (the per-(part, supplier) rollup,
    then one window over the part), a distinct, and a LEFT SEMI into
    the supplier dim — no correlated re-scan per outer row."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("supp_qty")
    )
    w = Window.partitionBy("l_partkey")
    hot = (
        per.withColumn("part_qty", F.sum("supp_qty").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .filter(F.col("supp_qty") * F.col("n_supp") > F.col("part_qty") * 3)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(hot, s.s_suppkey == hot.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


Q20_ORACLE = """
WITH per AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
  FROM lineitem GROUP BY 1, 2
),
hot AS (
  SELECT DISTINCT l_suppkey FROM (
    SELECT l_suppkey, supp_qty,
           sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty,
           count(*) OVER (PARTITION BY l_partkey) AS n_supp
    FROM per
  ) WHERE supp_qty * n_supp > part_qty * 3
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM hot)
ORDER BY s_suppkey
"""


def q21_blamed_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape — EXISTS + NOT-EXISTS self-joins on the fact table
    (reference: TPC-H Q21 "suppliers who kept orders waiting": the
    only supplier whose line missed its commit date in a
    multi-supplier order). Adapted to the synthetic schema (no
    commit/receipt dates): returnflag 'R' stands in for the late
    line. Plan: the flagged slice LEFT SEMI joins other-supplier
    lines of the same order (exists) and LEFT ANTI joins
    other-supplier FLAGGED lines (not exists) — both equi-joins on
    the order key with a residual supplier inequality, then one
    partial-aggregated count per supplier."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    l1 = l.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = l.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    blamed = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == l3.o3) & (l1.l_suppkey != l3.s3),
            "left_anti",
        )
    )
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


Q21_ORACLE = """
SELECT s_name, count(*)::BIGINT AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto front): cheapest-and-biggest parts
# ---------------------------------------------------------------------------


def q_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query (Börzsönyi et al. 2001): parts not dominated on
    (minimize ``p_retailprice``, maximize ``p_size``) — ``d``
    dominates ``s`` iff ``d`` is no worse on both axes and strictly
    better on one.

    Distributed shape (the classic local-skyline/merge decomposition):
    (1) LOCAL skyline per price bucket — a per-bucket window over the
    per-(bucket, price) maxima, fully parallel, output bounded by
    #distinct sizes per bucket; (2) cross-bucket prune against the
    running max size of strictly-cheaper buckets (a #buckets-row
    control-plane frame, broadcast); (3) exact dominance anti-join on
    the now-tiny survivor set (sound prunes + a complete final check
    = exact skyline). At 100 TB the only corpus-sized operations are
    one bucket-keyed aggregation and one broadcast-filter scan — the
    quadratic check never touches more than #buckets x #sizes rows.
    The oracle replays the O(n log n) sorted-sweep formulation; both
    compute the identical skyline."""
    from rootstock_collective_state_sync_spark.operators.skyline import (
        skyline_2d,
    )

    pt = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    sky = skyline_2d(
        pt,
        minimize="p_retailprice",
        maximize="p_size",
        bucket=F.expr("CAST(p_retailprice AS BIGINT) div 100"),
    )
    # price stays DOUBLE (both engines read the identical parquet
    # float64, and the driver's pandas materialization would collapse
    # a fixed-scale decimal's trailing zeros on the oracle side only)
    return sky.select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("long").alias("psize"),
    ).orderBy("price", "p_partkey")


Q_PARETO_FRONT_ORACLE = """
WITH pp AS (
  SELECT p_retailprice AS price, max(p_size) AS pmax
  FROM part GROUP BY 1
),
c AS (
  SELECT price, pmax,
         max(pmax) OVER (ORDER BY price
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS m_strict
  FROM pp
)
SELECT p.p_partkey,
       p.p_retailprice AS price,
       p.p_size::BIGINT AS psize
FROM part p JOIN c ON p.p_retailprice = c.price
WHERE (c.m_strict IS NULL OR p.p_size > c.m_strict)
  AND p.p_size >= c.pmax
ORDER BY price, p_partkey
"""
