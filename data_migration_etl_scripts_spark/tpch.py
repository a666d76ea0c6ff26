"""TPC-H decision-support suite, adapted to the engine's slim schema.

The reference ETL (GARAGE-POS/data-migration-etl-scripts) feeds a reporting
warehouse; these are the canonical decision-support shapes a user of
that warehouse runs downstream — correlated subqueries, EXISTS / NOT
EXISTS semi-joins, HAVING against scalar subqueries, disjunctive
predicate pushdown, CASE-pivoted counts, max-subquery selection.
q1/q3/q5/q10 live in queries.py; this module adds the rest of the
suite — ALL remaining queries q2, q4, q6-q9, q11-q22 (r7 completed
q2/q16) — adapted where the slim schema lacks a TPC-H column (no
partsupp — the supply relation derives from lineitem — l_shipmode,
l_commitdate, l_receiptdate, p_container, c_phone; each adaptation is
documented on the query).

Cross-engine determinism follows queries.py's rules: money aggregates
go through DECIMAL partials (exact, merge-order-independent at 1000
executors), per-row double arithmetic is left raw (identical IEEE),
rankings carry total-order tiebreakers.

Scale notes (100 TB): every dim side is broadcast; fact-fact joins
shuffle on their keys once; correlated aggregates become one extra
grouped pass over the fact (never a per-row subquery); all top-k
orderBy+limit compile to TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.queries import _t, query

_TS = "timestamp"


def _rev():
    """Exact decimal revenue term: extendedprice * (1 - discount)."""
    return (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    )


def _ts(s: str):
    return F.lit(s + " 00:00:00").cast(_TS)


@query(
    "q2_minimum_cost_supplier",
    oracle="""
    WITH supply AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    euro AS (
        SELECT ps_partkey, ps_cost, s_acctbal, s_name, n_name
        FROM supply
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    best AS (
        SELECT ps_partkey, min(ps_cost) AS best_cost
        FROM euro GROUP BY ps_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name,
           p.p_partkey AS p_partkey, p.p_brand,
           e.ps_cost AS supply_cost
    FROM part p
    JOIN euro e ON p.p_partkey = e.ps_partkey
    JOIN best b ON b.ps_partkey = e.ps_partkey AND e.ps_cost = b.best_cost
    WHERE p.p_size = 15 AND p.p_type = 'ECONOMY'
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p_partkey
    LIMIT 100
    """,
)
def q2_minimum_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: no partsupp table,
    so the supply relation derives from lineitem — supplier s supplies
    part p iff a line exists, at cost min(extendedprice/quantity) that
    supplier ever charged for that part (per-row IEEE division then
    MIN: bit-identical across engines, so the correlated min-cost
    equality cannot drift). The correlated subquery de-correlates into
    one grouped min per part over EUROPE suppliers; region/nation
    broadcast; top-100 with a total-order tiebreak compiles to
    TakeOrderedAndProject."""
    supply = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_cost"))
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    euro = supply.join(supp, supply["ps_suppkey"] == supp["s_suppkey"]).select(
        "ps_partkey", "ps_cost", "s_acctbal", "s_name", "n_name"
    )
    best = euro.groupBy("ps_partkey").agg(F.min("ps_cost").alias("best_cost"))
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey", "p_brand")
    return (
        euro.join(best, "ps_partkey")
        .where(F.col("ps_cost") == F.col("best_cost"))
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.col("ps_cost").alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "q16_parts_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem
    ) ps
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type NOT LIKE 'SMALL%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: the supply
    relation derives from lineitem (as in Q2) and the
    complaint-supplier NOT IN becomes a credit-hold stand-in
    (s_acctbal < 0) — the subquery keyset is non-null so NOT IN
    compiles to a LEFT ANTI join, never a per-row subquery. Part
    filters (brand <>, NOT LIKE, size IN-list) push to the part scan;
    part broadcasts onto the distinct supply pairs; the distinct
    supplier count is one grouped pass."""
    supply = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    hold = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("SMALL%"))
        & (F.col("p_size").isin([1, 4, 7, 10, 13, 16, 19, 22]))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        supply.join(
            F.broadcast(hold), supply["ps_suppkey"] == hold["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking), adapted: the slim schema has
    no l_commitdate/l_receiptdate, so "late" means a line shipped more
    than 30 days after the order date. The EXISTS compiles to a LEFT
    SEMI join with the non-equi lateness predicate folded into the
    join condition — one shuffle on orderkey, orders quarter-pruned at
    the scan."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change), verbatim semantics: a
    single fact scan with every predicate pushed to parquet (range on
    shipdate, between on discount, < on quantity) and one DECIMAL
    partial-sum — zero joins, one reduce. The canonical "is pushdown
    working" probe: .explain shows all three in PushedFilters."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.02) & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    )
    disc_rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * F.col("l_discount").cast("decimal(18,2)")
    )
    return li.agg(F.sum(disc_rev).cast("double").alias("revenue"))


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two trading nations), both
    directions. The nation pair filter lands on the two broadcast dim
    joins BEFORE the orders-lineitem shuffle, so only ~2/25ths of each
    fact side survives to the big join; the disjunction is enforced
    once on the joined pair."""
    nation = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    ).select("n_nationkey", "n_name")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle="""
    WITH all_nations AS (
        SELECT year(o_orderdate) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
               n1.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_5'
                               THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_5's share of ECONOMY
    part volume sold into ASIA, by order year. Both sums stay DECIMAL
    to the end (exact partials), the share divides as double and
    rounds to 6dp so the ratio hashes identically cross-engine. Part
    is the most selective side (1/6 of parts) and prunes lineitem
    via the first broadcast join."""
    part = _t(spark, sf_dir, "part").where(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n2 = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cust_nk"))
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nk")
    ).select("s_suppkey", "supp_nation")
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nk")
    ).select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = _rev()
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(F.year("o_orderdate").alias("o_year"),
                vol.alias("volume"), "supp_nation")
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume"))
                  .otherwise(F.lit(0).cast("decimal(18,2)"))).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS supp_nation, year(l_shipdate) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    - CAST(0.8 AS DECIMAL(2,1))
                      * CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE)
               AS sum_profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY supp_nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: the slim schema has no
    partsupp.ps_supplycost, so unit cost is modeled as 80% of
    p_retailprice — profit = revenue - 0.8 * retail * qty, entirely in
    DECIMAL so thousand-way partial merges stay exact. Part-name LIKE
    prunes via broadcast before the fact shuffle; profit groups by
    supplier nation x ship year."""
    part = _t(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    profit = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
        - F.lit(0.8).cast("decimal(2,1)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(4,0)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("supp_nation", F.year("l_shipdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@query(
    "q11_important_balance",
    oracle="""
    WITH per_nation AS (
        SELECT n_name,
               sum(CAST(s_acctbal AS DECIMAL(12,2))) AS bal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    )
    SELECT n_name, CAST(bal AS DOUBLE) AS total_bal
    FROM per_nation
    WHERE bal > (SELECT sum(bal) * CAST(0.04 AS DECIMAL(3,2)) FROM per_nation)
    """,
)
def q11_important_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock) shape, adapted: no partsupp, so the
    "value concentration" question is asked of supplier account
    balances — nations holding more than 4% of global supplier
    balance. The scalar subquery becomes a 1-row broadcast; the
    HAVING-vs-global-fraction compare stays DECIMAL-exact on both
    sides, so the cut line cannot drift with partitioning."""
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    per_nation = supp.groupBy("n_name").agg(
        F.sum(F.col("s_acctbal").cast("decimal(12,2)")).alias("bal")
    )
    total = per_nation.agg(
        (F.sum("bal") * F.lit(0.04).cast("decimal(3,2)")).alias("cut")
    )
    return (
        per_nation.crossJoin(F.broadcast(total))
        .where(F.col("bal") > F.col("cut"))
        .select("n_name", F.col("bal").cast("double").alias("total_bal"))
    )


@query(
    "q12_priority_lines",
    oracle="""
    SELECT l_returnflag,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / order priority), adapted: the slim
    schema has no l_shipmode or receipt/commit dates, so the dimension
    is l_returnflag and "late" is shipped >60 days after order date.
    The CASE-pivoted priority counts are the canonical conditional
    aggregation — one shuffle on orderkey, year filter pushed to the
    lineitem scan."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, (F.col("l_orderkey") == F.col("o_orderkey"))
                & (F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT join so
    zero-order customers survive with c_count=0, the join-side filter
    living in the JOIN CONDITION (not WHERE — a WHERE would turn the
    left join inner). Two aggregations: per-customer count, then the
    distribution. The first groups on the join key so AQE coalesces
    it into the join shuffle."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(
        100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                              THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                   * (1 - CAST(l_discount AS DECIMAL(18,2)))
                              ELSE 0 END) AS DOUBLE)
              / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
        6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percent of one month's revenue
    from PROMO-type parts. Part broadcasts; the month filter is pushed
    to the fact scan; numerator and denominator are sibling DECIMAL
    partials in ONE aggregate (a single pass, not two jobs), divided
    as double and rounded to 6dp for cross-engine hash parity."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    vol = _rev()
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero))
                    .cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarter revenue per supplier, return
    the max-revenue supplier(s) — the max comes from a 1-row broadcast
    over the SAME aggregated child (Spark reuses the exchange, so the
    fact scans once). Equality compares DECIMAL-exact totals, so ties
    and the winner are partitioning-independent."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                F.col("total_revenue").cast("double").alias("total_revenue"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < 0.2 * (
          SELECT avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines of Brand#3 parts
    ordered below 20% of that part's average quantity. The correlated
    scalar subquery de-correlates into ONE extra grouped pass over the
    fact joined back on partkey — never a per-row probe. avg of
    integer-valued quantities is exact IEEE in both engines, so the
    0.2x threshold compare cannot drift."""
    part = _t(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    # per-part average over ALL lineitems (matching the oracle's
    # uncorrelated-on-brand inner subquery), restricted afterwards to
    # branded parts via the join above
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        branded.join(F.broadcast(
            avg_qty.join(part.withColumnRenamed("p_partkey", "bp"),
                         F.col("ap_partkey") == F.col("bp"), "left_semi")
        ), F.col("l_partkey") == F.col("ap_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(sum(l_quantity) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 200
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 200, with their customers. The HAVING subquery and the
    outer aggregation share the same grouped child — the plan computes
    per-order quantity ONCE, filters, then joins customer/orders
    (both narrower than lineitem) onto the survivors. Top-100 by
    totalprice via TakeOrderedAndProject with orderkey tiebreak."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = li.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("total_qty")
    ).where(F.col("total_qty") > 200)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                F.col("o_totalprice").cast("double").alias("o_totalprice"),
                F.col("total_qty").cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates), adapted
    to brand/size/quantity (no p_container in the slim schema). The
    three OR-arms mix join-side (brand, size) and fact-side (quantity)
    predicates; Catalyst extracts the common l_quantity/p_size hulls
    as pushable conjuncts and evaluates the full disjunction post-join
    — the classic CNF-extraction probe."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 10) & q.between(1, 11))
        | ((b == "Brand#2") & s.between(1, 20) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 30) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "q20_excess_shippers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE 'red%'
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey
          HAVING sum(l_quantity) > 100
      )
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) shape, adapted: no
    partsupp availqty, so the inner threshold is absolute (>100 units
    of red parts shipped in 1996) rather than half of stocked. The
    nested IN becomes an aggregate -> HAVING -> LEFT SEMI chain; the
    nation filter prunes supplier before the semi-join probe."""
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal")
    part = _t(spark, sf_dir, "part").where(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    heavy = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey").agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
    )
    return supp.join(
        heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_name", "s_acctbal")


@query(
    "q21_waiting_orders",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: "late"
    is shipped >90 days after order date (no receipt/commit dates).
    The EXISTS / NOT EXISTS pair de-correlates into ONE windowless
    grouped pass over the order's lines (count of other suppliers,
    count of other LATE suppliers per (orderkey, suppkey)) instead of
    two probe joins — the blamed supplier is the sole late one on a
    multi-supplier finished order."""
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate")
         > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("late"),
    )
    # per (order, supplier): was I late; how many other suppliers; how
    # many other suppliers were late — one grouped pass + one self-agg
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("i_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("i_late").alias("n_late"),
    )
    blamed = (
        per_supp.where(F.col("i_late") == 1)
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    # numwait counts LATE LINES (oracle's l1 join), not distinct orders
    late_lines = lines.where(F.col("late")).groupBy(
        "l_orderkey", "l_suppkey"
    ).agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        blamed.join(late_lines, ["l_orderkey", "l_suppkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name").agg(F.sum("n_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / count(*) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
      AND c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: no c_phone, so
    the "country code" is c_nationkey in 0..6, and the dormant-account
    test is "no URGENT orders" (every synthetic customer has orders).
    Scalar avg broadcast + LEFT ANTI join + grouped DECIMAL balance
    sums. The average routes through a DECIMAL sum (2dp double sums
    are NOT order-exact) then one double divide — identical bits in
    both engines, so the > threshold cannot flip a boundary row."""
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(list(range(7)))
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = _t(spark, sf_dir, "customer").where(
        F.col("c_acctbal") > 0.0
    ).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
         / F.count(F.lit(1))).alias("a")
    )
    urgent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double").alias("totacctbal"),
        )
    )
