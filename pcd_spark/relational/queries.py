"""Relational operator surface — SURVEY.md §2 B–H, one query per operator row.

Every entry is a (PySpark DataFrame program, equivalent DuckDB ANSI SQL) pair;
the driver hash-compares their outputs at sf=0.01 (order-insensitive, columns
sorted by name), so every computed column is aliased IDENTICALLY on both
sides, doubles from order-dependent aggregations are rounded on both sides,
and no nondeterministic function appears anywhere.

Spark-first notes per query are inline: what Catalyst does for free
(pushdown/pruning/broadcast), and where an explicit hint is load-bearing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


REGISTRY: dict = {}


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = {"spark": fn, "sql": sql}
        return fn
    return deco


# =========================================================================
# B. projections / filters / predicates
# =========================================================================

@q(
    "b1_project_cast",
    """SELECT l_orderkey, l_linenumber,
              CAST(l_quantity AS INT) AS qty_int,
              l_returnflag AS flag
       FROM lineitem""",
)
def b1(spark, sf):
    # column pruning: the parquet scan reads only 4 of 11 columns
    return load(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_returnflag").alias("flag"),
    )


@q(
    "b2_filter_range",
    """SELECT l_orderkey, l_linenumber FROM lineitem
       WHERE l_quantity BETWEEN 10 AND 20
         AND l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_discount <> 0.0""",
)
def b2(spark, sf):
    # all three predicates push down to the parquet row-group stats
    li = load(spark, sf, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount") != 0.0)
    ).select("l_orderkey", "l_linenumber")


@q(
    "b3_filter_in_null_like",
    """SELECT c_custkey FROM customer
       WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
         AND c_name LIKE '%5%'
         AND c_acctbal IS NOT NULL""",
)
def b3(spark, sf):
    c = load(spark, sf, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_name").like("%5%")
        & F.col("c_acctbal").isNotNull()
    ).select("c_custkey")


@q(
    "b4_bool_combinators",
    """SELECT p_partkey FROM part
       WHERE (p_size < 10 OR p_type LIKE '%BRASS%') AND NOT p_brand = 'Brand#33'""",
)
def b4(spark, sf):
    p = load(spark, sf, "part")
    return p.filter(
        ((F.col("p_size") < 10) | F.col("p_type").like("%BRASS%"))
        & ~(F.col("p_brand") == "Brand#33")
    ).select("p_partkey")


@q(
    "b5_conditional_projection",
    """SELECT o_orderkey,
              CASE WHEN o_totalprice > 200000 THEN 'big'
                   WHEN o_totalprice > 50000 THEN 'mid'
                   ELSE 'small' END AS bucket,
              COALESCE(NULLIF(o_orderstatus, 'O'), 'open?') AS status_note
       FROM orders""",
)
def b5(spark, sf):
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open?")
        ).alias("status_note"),
    )


# =========================================================================
# C. joins
# =========================================================================

@q(
    "c1_join_inner_agg",
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
              ROUND(SUM(o_totalprice), 2) AS total
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
)
def c1(spark, sf):
    o, c = load(spark, sf, "orders"), load(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@q(
    "c2_join_broadcast_dims",
    """SELECT r_name, COUNT(*) AS n_customers
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name""",
)
def c2(spark, sf):
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    # explicit broadcast: dims are tiny; avoids shuffling the fact side —
    # at 100 TB this is the difference between a map-side join and a disaster
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"))
    )


@q(
    "c3_join_shuffle_hash_hint",
    """SELECT o_orderpriority, COUNT(*) AS n
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       GROUP BY o_orderpriority""",
)
def c3(spark, sf):
    # big-big join: SHUFFLE_HASH hint skips the SMJ sort (plan-invariant result)
    o, li = load(spark, sf, "orders"), load(spark, sf, "lineitem")
    return (
        o.hint("shuffle_hash")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@q(
    "c4_join_left_outer",
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey""",
)
def c4(spark, sf):
    c, o = load(spark, sf, "customer"), load(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@q(
    "c5_join_left_semi",
    """SELECT c_custkey FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)""",
)
def c5(spark, sf):
    c, o = load(spark, sf, "customer"), load(spark, sf, "orders")
    return c.join(
        o.filter(F.col("o_totalprice") > 100000),
        c.c_custkey == o.o_custkey,
        "left_semi",
    ).select("c_custkey")


@q(
    "c6_join_left_anti",
    """SELECT c_custkey FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
)
def c6(spark, sf):
    c, o = load(spark, sf, "customer"), load(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@q(
    "c7_self_join_theta",
    """SELECT a.s_suppkey AS s1, b.s_suppkey AS s2
       FROM supplier a JOIN supplier b
         ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey""",
)
def c7(spark, sf):
    s = load(spark, sf, "supplier")
    a = s.alias("a")
    b = s.alias("b")
    return a.join(
        b,
        (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
        & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
    ).select(F.col("a.s_suppkey").alias("s1"), F.col("b.s_suppkey").alias("s2"))


@q(
    "c8_range_join",
    """SELECT a.event_id AS eid, COUNT(*) AS n_following
       FROM events a JOIN events b
         ON a.user_id = b.user_id
        AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
       GROUP BY a.event_id""",
)
def c8(spark, sf):
    e = load(spark, sf, "events")
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy(F.col("a.event_id").alias("eid"))
        .agg(F.count("*").alias("n_following"))
    )


@q(
    "c9_asof_join",
    """SELECT e.event_id, o.o_orderkey AS last_order
       FROM events e ASOF JOIN orders o
         ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""",
)
def c9(spark, sf):
    # as-of = latest order at-or-before the event; expressed as candidate
    # join + deterministic argmax window (ties on o_orderdate -> max orderkey
    # mirrors DuckDB's ASOF which keeps one row; we pin the same tiebreak)
    e, o = load(spark, sf, "events"), load(spark, sf, "orders")
    cand = e.join(
        o,
        (e.user_id == o.o_custkey) & (e.ts >= o.o_orderdate),
        "inner",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", F.col("o_orderkey").alias("last_order"))
    )


# =========================================================================
# D. aggregations
# =========================================================================

@q(
    "d1_groupby_agg",
    """SELECT l_returnflag, l_linestatus,
              ROUND(SUM(l_quantity), 2) AS sum_qty,
              ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              ROUND(AVG(l_quantity), 4) AS avg_qty,
              COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def d1(spark, sf):
    # TPC-H Q1 shape: partial aggregation (map-side combine) is automatic
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@q(
    "d2_global_agg",
    """SELECT COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS total,
              ROUND(MIN(l_quantity), 2) AS min_q, ROUND(MAX(l_quantity), 2) AS max_q
       FROM lineitem""",
)
def d2(spark, sf):
    return load(spark, sf, "lineitem").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
        F.round(F.min("l_quantity"), 2).alias("min_q"),
        F.round(F.max("l_quantity"), 2).alias("max_q"),
    )


@q(
    "d3_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def d3(spark, sf):
    return load(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@q(
    "d4_count_distinct",
    """SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS n_segments,
              COUNT(*) AS n_customers
       FROM customer GROUP BY c_nationkey""",
)
def d4(spark, sf):
    return (
        load(spark, sf, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.count("*").alias("n_customers"),
        )
    )


@q(
    "d6_deterministic_argmax",
    """SELECT o_custkey, o_orderpriority AS top_priority FROM (
         SELECT o_custkey, o_orderpriority,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY COUNT(*) DESC, o_orderpriority ASC) AS rn
         FROM orders GROUP BY o_custkey, o_orderpriority
       ) WHERE rn = 1""",
)
def d6(spark, sf):
    # the LPA argmax pattern (D6) on relational data: most frequent value,
    # ties -> smallest — via min(struct(-cnt, value)), one hash agg, no window
    o = load(spark, sf, "orders")
    counts = o.groupBy("o_custkey", "o_orderpriority").agg(F.count("*").alias("cnt"))
    return (
        counts.groupBy("o_custkey")
        .agg(F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("o_orderpriority"))).alias("m"))
        .select("o_custkey", F.col("m.o_orderpriority").alias("top_priority"))
    )


@q(
    "d9_rollup",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
              ROUND(SUM(o_totalprice), 2) AS total
       FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
)
def d9(spark, sf):
    return (
        load(spark, sf, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@q(
    "d9b_cube",
    """SELECT lang, source, COUNT(*) AS n
       FROM documents GROUP BY CUBE(lang, source)""",
)
def d9b(spark, sf):
    return (
        load(spark, sf, "documents")
        .cube("lang", "source")
        .agg(F.count("*").alias("n"))
    )


# =========================================================================
# E. window functions
# =========================================================================

@q(
    "e1_rownum_latest",
    """SELECT o_custkey, o_orderkey AS latest_order FROM (
         SELECT o_custkey, o_orderkey,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         FROM orders) WHERE rn = 1""",
)
def e1(spark, sf):
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderkey").alias("latest_order"))
    )


@q(
    "e2_dense_rank",
    """SELECT o_orderkey, o_orderstatus,
              DENSE_RANK() OVER (PARTITION BY o_orderstatus
                                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS drk
       FROM orders WHERE o_totalprice > 300000""",
)
def e2(spark, sf):
    o = load(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select("o_orderkey", "o_orderstatus", F.dense_rank().over(w).alias("drk"))


@q(
    "e3_topk_per_group",
    """SELECT o_custkey, o_orderkey, rnk FROM (
         SELECT o_custkey, o_orderkey,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
         FROM orders) WHERE rnk <= 3""",
)
def e3(spark, sf):
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


@q(
    "e4_lag_delta",
    """SELECT event_id,
              ROUND(value - LAG(value) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id), 4) AS delta
       FROM events""",
)
def e4(spark, sf):
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
    )


@q(
    "e5_moving_avg",
    """SELECT event_id,
              ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg
       FROM events""",
)
def e5(spark, sf):
    e = load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select("event_id", F.round(F.avg("value").over(w), 4).alias("mavg"))


@q(
    "e6_ntile_percent_rank",
    """SELECT o_orderkey,
              NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile,
              ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS prk
       FROM orders""",
)
def e6(spark, sf):
    # E6 without the single-partition global window (the scale killer a bare
    # Window.orderBy plans): rank via the two-phase range-partitioned
    # global_rank, then derive both percentile functions arithmetically from
    # (rn, N). Under a total order (o_orderkey tiebreak) rank == row_number,
    # so PERCENT_RANK = (rn-1)/(N-1); NTILE(k) is the exact SQL bucket rule —
    # the first N mod k buckets get ceil(N/k) rows, the rest floor(N/k).
    o = load(spark, sf, "orders")
    stats: dict = {}
    ranked = global_rank(
        o.select("o_orderkey", "o_totalprice"),
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        stats_out=stats,
    )
    n, k = stats["total"], 10
    q, r = divmod(n, k)
    rn = F.col("rn")
    if q == 0:
        decile = rn.cast("int")
    else:
        big = r * (q + 1)  # rows covered by the size-(q+1) buckets
        decile = (
            F.when(rn <= big, F.ceil(rn / (q + 1)))
            .otherwise(r + F.ceil((rn - big) / q))
            .cast("int")
        )
    prk = F.lit(0.0) if n <= 1 else F.round((rn - 1) / F.lit(float(n - 1)), 6)
    return ranked.select(
        "o_orderkey", decile.alias("decile"), prk.alias("prk")
    )


@q(
    "e8_cume_dist",
    """SELECT o_orderkey,
              ROUND(CUME_DIST() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS cd
       FROM orders""",
)
def e8(spark, sf):
    # E8: global cumulative distribution — e6's remaining sibling, same
    # scale rule: NO partition-less Window (single-task funnel); rank via
    # the two-phase range-partitioned global_rank, then CUME_DIST under a
    # TOTAL order (the o_orderkey tiebreak means no ties) is exactly rn/N.
    o = load(spark, sf, "orders")
    stats: dict = {}
    ranked = global_rank(
        o.select("o_orderkey", "o_totalprice"),
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        stats_out=stats,
    )
    n = stats["total"]
    return ranked.select(
        "o_orderkey",
        F.round(F.col("rn") / F.lit(float(n)), 6).alias("cd"),
    )


# =========================================================================
# F. sorts / limits / top-k
# =========================================================================

def global_rank(
    df: DataFrame,
    order_cols: list,
    rank_name: str = "rn",
    stats_out: dict | None = None,
) -> DataFrame:
    """F1: distributed global rank (1-based) under a TOTAL order.

    Window.orderBy with no partitionBy funnels every row through ONE task —
    the classic global-sort scale killer. This is the scale-safe form:
    range-repartition on the sort keys (ordered partitions), rank
    partition-locally, then add per-partition row-count offsets (an O(P)
    driver collect — partition COUNTS, not rows). Deterministic as long as
    order_cols is a total order (caller supplies the tiebreaker).

    ``stats_out['total']`` receives the total row count (already on the
    driver from the offset collect — callers like e6 that need N for
    percentile arithmetic get it without a second scan).
    """
    ranged = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_n")).collect()
    sizes = {r["_pid"]: r["_n"] for r in counts}
    if stats_out is not None:
        stats_out["total"] = sum(sizes.values())
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(rank_name, F.row_number().over(w) + F.col("_off"))
        .drop("_pid", "_off")
    )


@q(
    "f1_global_sort",
    """SELECT c_custkey, c_acctbal,
              ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn
       FROM customer""",
)
def f1(spark, sf):
    # F1: total-order rank materialization — the order-insensitive driver
    # compare can't see a bare sort, so the rank column IS the evidence the
    # global order is right. Uses the range-partitioned two-phase rank
    # (global_rank), not a single-partition window.
    c = load(spark, sf, "customer")
    return global_rank(
        c.select("c_custkey", "c_acctbal"),
        [F.desc("c_acctbal"), F.asc("c_custkey")],
    ).select("c_custkey", "c_acctbal", "rn")


@q(
    "f2_limit",
    "SELECT n_nationkey, n_name FROM nation LIMIT 100",
)
def f2(spark, sf):
    # F2: bare LIMIT (CollectLimit, no sort). A limit below table cardinality
    # is nondeterministic by SQL semantics, so the oracle-comparable form
    # caps ABOVE cardinality (nation has 25 rows) — the operator still
    # executes its early-out path; f3 covers the ordered variant.
    return load(spark, sf, "nation").select("n_nationkey", "n_name").limit(100)


@q(
    "f3_global_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""",
)
def f3(spark, sf):
    # orderBy+limit compiles to TakeOrderedAndProject — no global sort
    return (
        load(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
        .select("o_orderkey", "o_totalprice")
    )


# =========================================================================
# G. set operations
# =========================================================================

@q(
    "g1_union",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       UNION
       SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000""",
)
def g1(spark, sf):
    c, o = load(spark, sf, "customer"), load(spark, sf, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.unionByName(b).distinct()


@q(
    "g2_intersect",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       INTERSECT
       SELECT o_custkey AS c_custkey FROM orders""",
)
def g2(spark, sf):
    c, o = load(spark, sf, "customer"), load(spark, sf, "orders")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .intersect(o.select(F.col("o_custkey").alias("c_custkey")))
    )


@q(
    "g3_except",
    """SELECT c_custkey FROM customer
       EXCEPT
       SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'""",
)
def g3(spark, sf):
    c, o = load(spark, sf, "customer"), load(spark, sf, "orders")
    return c.select("c_custkey").exceptAll(
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    ).distinct()


@q(
    "g5_bag_set_ops",
    """WITH a AS (SELECT o_custkey AS k FROM orders),
        b AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
       SELECT k, COUNT(*) AS n FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
       GROUP BY k""",
)
def g5(spark, sf):
    # G5: bag (multiset) set ops — EXCEPT ALL keeps multiplicities
    # (max(count_a - count_b, 0) copies per key), which the DISTINCT forms
    # g2/g3 erase. The one place multiplicity matters in a pipeline: "each
    # customer's open-order count" = all orders minus finished orders AS
    # BAGS. Spark plans exceptAll as a single hash agg of +1/-1 counts +
    # generate (no join, one shuffle) — the rollup here makes the
    # multiplicities themselves the oracle-checked output.
    o = load(spark, sf, "orders")
    a = o.select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    return a.exceptAll(b).groupBy("k").agg(F.count("*").alias("n"))


# =========================================================================
# H. scalar functions
# =========================================================================

@q(
    "h1_sha256",
    "SELECT doc_id, sha256(text) AS content_sha FROM documents",
)
def h1(spark, sf):
    # THE per-row invariant (BASELINE.json:15)
    return load(spark, sf, "documents").select(
        "doc_id", F.sha2(F.col("text"), 256).alias("content_sha")
    )


@q(
    "h2_regexp_extract_all",
    """SELECT doc_id, UNNEST(regexp_extract_all(text, '([a-z]{6,})')) AS word
       FROM documents""",
)
def h2(spark, sf):
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(r"([a-z]{6,})"), F.lit(1))
        ).alias("word"),
    )


@q(
    "h3_string_basics",
    """SELECT doc_id,
              UPPER(SUBSTR(text, 1, 10)) AS head,
              LENGTH(text) AS len,
              CONCAT(lang, ':', source) AS tag,
              REPLACE(SUBSTR(text, 1, 20), ' ', '_') AS snake
       FROM documents""",
)
def h3(spark, sf):
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head"),
        F.length("text").alias("len"),
        F.concat_ws(":", "lang", "source").alias("tag"),
        F.replace(F.substring("text", 1, 20), F.lit(" "), F.lit("_")).alias("snake"),
    )


@q(
    "h5_date_functions",
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
              YEAR(o_orderdate) AS yr, COUNT(*) AS n
       FROM orders GROUP BY ALL""",
)
def h5(spark, sf):
    o = load(spark, sf, "orders")
    return (
        o.groupBy(
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(F.count("*").alias("n"))
    )


@q(
    "h6_math",
    """SELECT l_orderkey, l_linenumber,
              ROUND(LN(l_extendedprice), 6) AS ln_price,
              ROUND(POW(l_discount, 2), 6) AS disc_sq,
              ABS(l_quantity - 25) AS q_dev,
              GREATEST(l_tax, l_discount) AS max_rate
       FROM lineitem""",
)
def h6(spark, sf):
    li = load(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.abs(F.col("l_quantity") - 25).alias("q_dev"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
    )


@q(
    "h7_array_functions",
    """SELECT vec_id, LEN(embedding) AS dim,
              ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
              ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val
       FROM embeddings""",
)
def h7(spark, sf):
    e = load(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.col("embedding")[0].cast("double"), 6).alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
    )


@q(
    "h8_higher_order_dot",
    """SELECT vec_id,
              ROUND(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[])), 4) AS norm_sq
       FROM embeddings""",
)
def h8(spark, sf):
    e = load(spark, sf, "embeddings")
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("embedding").cast("array<double>"),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select("vec_id", F.round(dot, 4).alias("norm_sq"))


@q(
    "h10_json",
    """SELECT event_id,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
       FROM events""",
)
def h10(spark, sf):
    e = load(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


# =========================================================================
# I. streaming operators, batch-equivalent form (SURVEY §2 I2/I4; the
# streaming forms with watermarks live in pcd_spark/streaming and are
# pytest-verified; these batch twins give them DuckDB oracles)
# =========================================================================

@q(
    "i2_tumbling_window_batch",
    """SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS win_start, event_type,
              COUNT(*) AS n, ROUND(SUM(value), 4) AS total
       FROM events GROUP BY 1, 2""",
)
def i2b(spark, sf):
    # batch twin of streaming.tumbling_counts (same groupBy plan minus the
    # watermark state); window start = 5-min floor of ts
    e = load(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n", "total"
        )
    )


@q(
    "i4_session_window_batch",
    """WITH o AS (
         SELECT user_id, ts,
                CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       s AS (
         SELECT user_id, ts,
                SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM o)
       SELECT user_id, MIN(ts) AS sess_start,
              MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
              COUNT(*) AS n_events
       FROM s GROUP BY user_id, sid""",
)
def i4b(spark, sf):
    # session windows (30-min inactivity gap) in batch mode — the exact
    # semantics of streaming session_window; the oracle is the classic
    # gaps-and-islands rewrite. Session end = last event + gap (exclusive),
    # so a new event at exactly gap distance starts a NEW session (>= in
    # the oracle's break condition, not >).
    e = load(spark, sf, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("sess_start"),
            F.col("sw.end").alias("sess_end"),
            "n_events",
        )
    )


@q(
    "i3_sliding_window_batch",
    """SELECT win_start, win_start + INTERVAL 10 MINUTE AS win_end,
              COUNT(*) AS n
       FROM (SELECT time_bucket(INTERVAL 5 MINUTE, ts)
                      - s.i * INTERVAL 5 MINUTE AS win_start
             FROM events, (VALUES (0), (1)) AS s(i))
       GROUP BY win_start""",
)
def i3b(spark, sf):
    # batch twin of streaming.sliding_counts: 10-min windows sliding every
    # 5 — each event lands in exactly window/slide = 2 overlapping windows
    # (starts = the two slide-aligned buckets in (ts - 10min, ts]). The
    # oracle enumerates those starts explicitly via a 2-row VALUES join.
    e = load(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n",
        )
    )


# =========================================================================
# D10 / J4: grouped-aggregate pandas UDAF (SURVEY §2 D10, J4)
# =========================================================================

@q(
    "d10_grouped_pandas_udaf",
    """SELECT event_type,
              ROUND(SUM(value * (user_id % 10 + 1)) / SUM(user_id % 10 + 1), 6)
                AS wavg
       FROM events GROUP BY event_type""",
)
def d10(spark, sf):
    # J4: Arrow-batched numpy UDAF (GROUPED_AGG) — weighted mean per group.
    # Per-group series arrive as one Arrow batch; no per-row Python.
    import numpy as np
    from pyspark.sql.functions import pandas_udf, PandasUDFType

    wavg = pandas_udf(
        lambda v, w: float(np.round(np.sum(v * w) / np.sum(w), 6)),
        "double",
        PandasUDFType.GROUPED_AGG,
    )
    e = load(spark, sf, "events").select(
        "event_type",
        F.col("value").alias("v"),
        (F.col("user_id") % 10 + 1).cast("double").alias("w"),
    )
    return e.groupBy("event_type").agg(wavg("v", "w").alias("wavg"))


@q(
    "d8_collect_set",
    """SELECT l_orderkey,
              array_to_string(list_sort(list_distinct(list(l_returnflag))), ',')
                AS flags,
              COUNT(*) AS n
       FROM lineitem GROUP BY l_orderkey""",
)
def d8(spark, sf):
    # D8: per-group array build; sort_array pins a deterministic order so
    # the result is comparable across engines/partitionings, and the array
    # is string-joined because the driver's canonicalizer hashes scalar
    # cells (list cells crash pandas factorize — round-1's one red row).
    # At scale this is the small-neighborhood adjacency builder
    # (collect_list); the CSR path (K2) replaces it when arrays get large.
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("l_returnflag"))).alias("flags"),
        F.count("*").alias("n"),
    )


@q(
    "i8_distinct_users_batch",
    """SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS win_start,
              COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
       FROM events GROUP BY 1""",
)
def i8b(spark, sf):
    # batch twin of streaming.approx_distinct_users with the EXACT distinct
    # count (batch can afford the extra shuffle; streaming must use the HLL
    # form because per-window distinct sets are unbounded state). The
    # approx-vs-exact gap is pinned in tests/test_streaming.py.
    e = load(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .select(F.col("w.start").alias("win_start"), "n_users", "n_events")
    )


@q(
    "d11_group_percentiles",
    """SELECT l_returnflag,
              ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
              ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
              ROUND(median(l_quantity), 4) AS med_qty
       FROM lineitem GROUP BY l_returnflag""",
)
def d11(spark, sf):
    # D11: exact grouped percentiles (linear interpolation — Spark
    # `percentile` == DuckDB `quantile_cont`). Exact percentile sorts each
    # group, fine when groups are few and bounded; at corpus scale the
    # engine-portable answer is approx_percentile (t-digest, d5-style
    # engine-specific values — which is exactly why the ORACLED row is the
    # exact form).
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
    )


@q(
    "i9_interval_join_batch",
    """SELECT a.event_id AS click_id,
              COUNT(b.ts) AS n_purchases,
              ROUND(COALESCE(SUM(b.value), 0.0), 4) AS amt
       FROM (SELECT event_id, user_id, ts FROM events
             WHERE event_type = 'click') a
       LEFT JOIN (SELECT user_id, ts, value FROM events
                  WHERE event_type = 'purchase') b
         ON a.user_id = b.user_id
        AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 30 MINUTE
       GROUP BY a.event_id""",
)
def i9b(spark, sf):
    # I9 batch twin of the stream-stream interval join (streaming form:
    # pcd_spark.streaming.ingest.click_purchase_join — equi-key user_id +
    # event-time range, both sides watermarked so state is bounded by the
    # interval). Batch plans the same thing as an equi-join on user_id with
    # the time range as a post-join filter — no theta explosion.
    e = load(spark, sf, "events")
    # Both sides derive from the same `events` scan; explicit string aliases
    # keep Catalyst from resolving the equi-key predicate against a single
    # lineage (the "trivially true" self-join warning class).
    a = (
        e.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .alias("clk")
    )
    b = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"), "value")
        .alias("pur")
    )
    j = a.join(
        b,
        (F.col("clk.user_id") == F.col("pur.user_id"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") < F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left",
    )
    return j.groupBy("click_id").agg(
        F.count("p_ts").alias("n_purchases"),
        F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 4).alias("amt"),
    )


@q(
    "i10_stream_static_join_batch",
    """SELECT c.c_mktsegment AS segment,
              COUNT(*) AS n_events,
              ROUND(SUM(e.value), 4) AS total_value
       FROM events e JOIN customer c ON e.user_id = c.c_custkey
       GROUP BY c.c_mktsegment""",
)
def i10b(spark, sf):
    # I10 batch twin of the stream-static enrichment join (streaming form:
    # pcd_spark.streaming.ingest.enrich_with_dimension — stateless, the
    # static dim re-resolved per micro-batch). The dim side is small per
    # entity, so the planner broadcasts it; the rollup is the standard
    # post-enrichment segment report.
    from pcd_spark.streaming.ingest import enrich_with_dimension

    e = load(spark, sf, "events")
    c = load(spark, sf, "customer")
    return (
        enrich_with_dimension(e, c)
        .select(F.col("c_mktsegment").alias("segment"), "value")
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@q(
    "e7_sessionization",
    """WITH flg AS (
         SELECT user_id, ts, event_id,
                CASE WHEN ts - LAG(ts) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id)
                          <= INTERVAL 30 MINUTE
                     THEN 0 ELSE 1 END AS new_sess
         FROM events),
       sess AS (
         SELECT user_id, ts,
                SUM(new_sess) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
         FROM flg)
       SELECT user_id, CAST(session_no AS INT) AS session_no,
              MIN(ts) AS session_start, MAX(ts) AS session_end,
              COUNT(*) AS n_events
       FROM sess GROUP BY user_id, session_no""",
)
def e7(spark, sf):
    """E7: gaps-and-islands sessionization — the relational twin of I4's
    session_window. A new session starts when a user's inter-event gap
    exceeds 30 minutes; sessions get per-user ordinals so downstream joins
    can key on (user_id, session_no).

    Spark shape: both windows partition by user_id, so no single-task
    global window (the e6 class of bug) — each user's event stream sorts
    locally inside its hash partition, and the same shuffle serves the lag,
    the running sum, AND the final groupBy (one Exchange, three uses). At
    100 TB this is the canonical sessionize plan: skewed power users are
    bounded by per-user event counts, not corpus size."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = load(spark, sf, "events").select("user_id", "ts", "event_id")
    # pure timestamp_ntz interval arithmetic — no epoch cast, no timezone
    within = F.col("ts") <= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")
    new_sess = F.when(within, F.lit(0)).otherwise(F.lit(1))
    sess = e.select(
        "user_id",
        "ts",
        F.sum(new_sess).over(run).cast("int").alias("session_no"),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


@q(
    "d12_grouped_stats",
    """SELECT l_returnflag,
              ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
              ROUND(var_samp(l_quantity), 6) AS var_qty,
              ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
              ROUND(covar_samp(l_quantity, l_extendedprice), 4)
                AS cov_qty_price
       FROM lineitem GROUP BY l_returnflag""",
)
def d12(spark, sf):
    """D12: grouped statistical moments — stddev/variance/correlation/
    covariance per group, the profiling surface a data-quality pass runs
    over every numeric column.

    Spark computes all four with single-pass mergeable moment sketches
    (Welford/Chan partial states), so the plan is one hash aggregate with
    map-side partials — same shuffle shape as d1, O(groups) output no
    matter the row count. Rounded on both sides: cross-engine float-sum
    order differs in low-order bits, agreement at 4-6 decimals is the
    semantic claim."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "cov_qty_price"
        ),
    )


@q(
    "c11_null_safe_join",
    """WITH c AS (SELECT c_custkey, NULLIF(c_nationkey, 3) AS nk
                  FROM customer),
         s AS (SELECT s_suppkey, NULLIF(s_nationkey, 3) AS nk
               FROM supplier)
       SELECT COALESCE(c.nk, -1) AS nation_grp,
              COUNT(*) AS n_pairs,
              COUNT(DISTINCT c.c_custkey) AS n_cust,
              COUNT(DISTINCT s.s_suppkey) AS n_supp
       FROM c JOIN s ON c.nk IS NOT DISTINCT FROM s.nk
       GROUP BY COALESCE(c.nk, -1)""",
)
def c11(spark, sf):
    """C11: null-safe equi join (`<=>` / IS NOT DISTINCT FROM) — the join
    variant entity-resolution pipelines need when the blocking key is
    legitimately absent (unknown nation here, NULLIF-derived so the NULL
    path is exercised deterministically): a plain equi join silently DROPS
    every NULL-keyed row, a null-safe join matches NULL with NULL.

    Spark shape: Catalyst extracts EqualNullSafe as a hash-join key (it
    wraps both sides in coalesce+isnull tuples), so this plans as a normal
    shuffled hash/sort-merge equi join — NOT a BroadcastNestedLoop — and
    scales like c1. The NULL bucket is one key and can skew (every unknown
    row lands on it); AQE skew-split or a c10-style salt is the documented
    mitigation at 100 TB."""
    c = load(spark, sf, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey"), F.lit(3)).alias("nk")
    )
    s = load(spark, sf, "supplier").select(
        "s_suppkey", F.nullif(F.col("s_nationkey"), F.lit(3)).alias("snk")
    )
    return (
        c.join(s, F.col("nk").eqNullSafe(F.col("snk")))
        .groupBy(F.coalesce(F.col("nk"), F.lit(-1)).alias("nation_grp"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("c_custkey").alias("n_cust"),
            F.countDistinct("s_suppkey").alias("n_supp"),
        )
    )


@q(
    "g4_union_by_name",
    """SELECT o_orderkey, o_totalprice, o_orderpriority
       FROM (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_orderstatus = 'F'
             UNION ALL BY NAME
             SELECT o_orderkey, o_orderpriority FROM orders
             WHERE o_orderstatus = 'O')""",
)
def g4(spark, sf):
    """G4: schema-evolving union — `unionByName(allowMissingColumns=True)`
    aligns by COLUMN NAME and null-fills columns absent on one side, the
    union a pipeline needs when appending a newer corpus snapshot whose
    schema gained fields (positional `UNION ALL` would silently zip
    mismatched columns). DuckDB's `UNION ALL BY NAME` is the exact oracle.

    Spark shape: pure narrow Union + Project, zero shuffle, and the
    branch filters push into both parquet scans."""
    o = load(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice"
    )
    b = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_orderpriority"
    )
    return a.unionByName(b, allowMissingColumns=True)


@q(
    "d13_pivot",
    """SELECT o_orderpriority,
              ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2)
                AS total_f,
              ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2)
                AS total_o,
              ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2)
                AS total_p
       FROM orders GROUP BY o_orderpriority""",
)
def d13(spark, sf):
    """D13: pivot (long -> wide reshaping agg) — revenue per priority
    broken out into one COLUMN per order status, the report/feature-matrix
    shape downstream BI and model-feature joins want. Oracle is the
    conditional-aggregation form (SUM FILTER), which is exactly what the
    pivot means.

    Spark shape: `.pivot(col, [values])` WITH the value list pinned — that
    compiles to ONE hash aggregate carrying a PivotFirst expression per
    value (map-side partials, one shuffle on the group key, zero extra
    jobs). Leaving the list off adds a corpus-wide DISTINCT job just to
    discover column names — never do that at 100 TB; the status domain is
    metadata, not data. ROUND(.,2) both sides: float-sum fold order
    differs cross-engine in the low bits (d1's proven discipline)."""
    o = load(spark, sf, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
        .withColumnRenamed("F", "total_f")
        .withColumnRenamed("O", "total_o")
        .withColumnRenamed("P", "total_p")
    )


@q(
    "d14_unpivot",
    """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
              l_quantity AS val
       FROM lineitem WHERE l_orderkey < 200
       UNION ALL
       SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
       FROM lineitem WHERE l_orderkey < 200
       UNION ALL
       SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
       FROM lineitem WHERE l_orderkey < 200
       UNION ALL
       SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
       FROM lineitem WHERE l_orderkey < 200""",
)
def d14(spark, sf):
    """D14: unpivot / melt (wide -> long reshaping) — each numeric measure
    column becomes a (metric, val) row, the shape per-metric quality
    dashboards and generic anomaly scans consume (one detector over ALL
    metrics instead of one query per column). Oracle is the UNION ALL
    expansion, which is the operator's definition.

    Spark shape: `df.unpivot` plans a single narrow Expand node — each
    input row emits 4 output rows in the SAME task, zero shuffle, zero
    extra scans (vs the naive 4x self-UNION which re-reads the table per
    metric; at 100 TB that's 4 scans vs 1). The id/filter predicate pushes
    into the parquet scan and only the 6 referenced columns are read.
    Values are copied, not computed, so no rounding is needed."""
    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )


# =========================================================================
# C12-C14: declarative subquery surface (round 3 continuation)
#
# C5/C6 cover semi/anti joins the user spells as joins; these three cover
# the way most SQL users actually write them — correlated EXISTS, NOT IN,
# scalar subqueries — and pin that Catalyst's RewritePredicateSubquery /
# ScalarSubquery machinery plans them as the SAME hash joins (no nested-
# loop re-execution per row, which is what a naive engine does and what
# dies first at 100 TB).
# =========================================================================

@q(
    "c12_exists_subquery",
    """SELECT c_custkey, c_mktsegment
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_totalprice > 400000)
         AND NOT EXISTS (SELECT 1 FROM orders o2
                         WHERE o2.o_custkey = c.c_custkey
                           AND o2.o_orderstatus = 'F'
                           AND o2.o_totalprice < 20000)""",
)
def c12(spark, sf):
    """C12: correlated EXISTS / NOT EXISTS predicates, written declaratively.

    Spark shape: Catalyst's RewritePredicateSubquery turns the EXISTS into a
    left-SEMI hash join and the NOT EXISTS into a left-ANTI hash join — one
    pass over orders each, with the correlated filter pushed into the orders
    scan BEFORE the join (PushedFilters on o_totalprice). Nothing is
    re-executed per customer row; at 10^9 customers this is two shuffles (or
    two broadcasts when the filtered order sets are small), not a per-row
    probe loop."""
    load(spark, sf, "customer").createOrReplaceTempView("c12_customer")
    load(spark, sf, "orders").createOrReplaceTempView("c12_orders")
    return spark.sql(
        """SELECT c_custkey, c_mktsegment
           FROM c12_customer c
           WHERE EXISTS (SELECT 1 FROM c12_orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_totalprice > 400000)
             AND NOT EXISTS (SELECT 1 FROM c12_orders o2
                             WHERE o2.o_custkey = c.c_custkey
                               AND o2.o_orderstatus = 'F'
                               AND o2.o_totalprice < 20000)"""
    )


@q(
    "c13_not_in_subquery",
    """SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
       FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                               WHERE o_orderpriority = '1-URGENT')""",
)
def c13(spark, sf):
    """C13: NOT IN over a subquery — the null-aware anti join.

    NOT IN is NOT the same operator as NOT EXISTS: under SQL three-valued
    logic a single NULL in the subquery column empties the whole result, so
    Catalyst plans a null-AWARE anti join (the join condition carries an
    ISNULL disjunct; with a broadcastable right side, BroadcastHashJoin
    LeftAnti with buildSide marked null-aware). This query pins that the
    engine implements those semantics as ONE hash join — a naive engine
    degrades NOT IN to a per-row scan of the subquery result.

    Scale note: the subquery side here is a filtered key column (urgent
    orders), broadcastable even when orders is 100 TB because only the
    distinct key set crosses; when it is not broadcastable Spark falls back
    to a single-partition BNLJ — at that point the pipeline should rewrite
    to NOT EXISTS (c12's anti join), which shuffles instead. The docstring
    is the documentation of that cliff; the test pins today's plan."""
    load(spark, sf, "customer").createOrReplaceTempView("c13_customer")
    load(spark, sf, "orders").createOrReplaceTempView("c13_orders")
    return spark.sql(
        """SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
           FROM c13_customer
           WHERE c_custkey NOT IN (SELECT o_custkey FROM c13_orders
                                   WHERE o_orderpriority = '1-URGENT')"""
    )


@q(
    "c14_scalar_subquery",
    """SELECT o_orderkey,
              ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 4)
                AS delta_avg
       FROM orders
       WHERE o_totalprice > (SELECT 1.8 * AVG(o_totalprice) FROM orders)""",
)
def c14(spark, sf):
    """C14: scalar subqueries in both the projection and the predicate.

    Spark shape: each uncorrelated scalar subquery runs ONCE as its own
    tiny job (a map-side-combined global agg), and the scalar is inlined
    into the main scan's filter/project as a literal at execution time
    (ScalarSubquery node; with AQE the filter can further prune). The main
    table is scanned once; the aggregate is never recomputed per row.
    Subquery REUSE also applies: the two AVG subqueries below share one
    physical subquery execution (ReusedSubquery), so the oracle's two
    mentions cost one job."""
    load(spark, sf, "orders").createOrReplaceTempView("c14_orders")
    return spark.sql(
        """SELECT o_orderkey,
                  ROUND(o_totalprice -
                        (SELECT AVG(o_totalprice) FROM c14_orders), 4)
                    AS delta_avg
           FROM c14_orders
           WHERE o_totalprice >
                 (SELECT 1.8 * AVG(o_totalprice) FROM c14_orders)"""
    )


# =========================================================================
# H11-H12: generator / lateral surface (round 3 continuation)
# =========================================================================

@q(
    "h11_posexplode",
    """SELECT doc_id, r.pos, string_split(text, ' ')[r.pos] AS word
       FROM documents,
            UNNEST(generate_series(
              1, LEAST(5, LEN(string_split(text, ' '))))) AS r(pos)
       WHERE doc_id < 40 AND LENGTH(TRIM(text)) > 0""",
)
def h11(spark, sf):
    """H11: positional explode (generator / lateral view) — each document
    row fans out into (pos, word) rows for its first 5 tokens. The
    generator operator is the normalization step every nested-data
    pipeline needs (array-of-struct event payloads, token streams).

    Spark shape: `posexplode` plans a narrow Generate node — fan-out
    happens inside the scan task, zero shuffle, and the doc_id predicate
    plus the 2-column projection push into the parquet scan. `slice`
    bounds the fan-out BEFORE generating (5 rows/doc, not len(text));
    at 100 TB unbounded explodes are the classic row-amplification
    accident. posexplode is 0-based; the oracle's generate_series is
    1-based — aligned with pos + 1."""
    d = load(spark, sf, "documents").filter(F.col("doc_id") < 40)
    return d.select(
        "doc_id",
        F.posexplode(F.slice(F.split(F.col("text"), " "), 1, 5)),
    ).select(
        "doc_id",
        (F.col("pos") + 1).cast("long").alias("pos"),
        F.col("col").alias("word"),
    )


@q(
    "h12_sequence_gapfill",
    """WITH ev AS (SELECT user_id, date_trunc('hour', ts) AS hr, value
                   FROM events WHERE user_id < 10),
        span AS (SELECT user_id, MIN(hr) AS lo, MAX(hr) AS hi
                 FROM ev GROUP BY user_id),
        grid AS (SELECT user_id, g.hr
                 FROM span,
                      UNNEST(generate_series(lo, hi, INTERVAL '1 hour'))
                        AS g(hr)),
        agg AS (SELECT user_id, hr, COUNT(*) AS n_events,
                       ROUND(SUM(value), 4) AS sum_value
                FROM ev GROUP BY user_id, hr)
        SELECT grid.user_id, grid.hr,
               COALESCE(agg.n_events, 0) AS n_events,
               COALESCE(agg.sum_value, 0.0) AS sum_value
        FROM grid LEFT JOIN agg
          ON agg.user_id = grid.user_id AND agg.hr = grid.hr""",
)
def h12(spark, sf):
    """H12: time-series resample + gap-fill — a dense per-user hourly grid
    (F.sequence + explode between each user's min and max hour) left-joined
    to the hourly aggregate, missing hours filled with zeros. This is the
    canonical prepare-for-forecasting / rate-alerting shape: downstream
    window math (lag, moving averages) is only correct on a gapless axis.

    Spark shape: the grid generates from the O(users) span table (narrow
    Generate, fan-out = hours-per-user), NOT from the event table, so grid
    size is independent of event volume; the join is an equi hash join on
    (user_id, hr) — at 10^9 users both sides shuffle on the same key, and
    the hourly agg is map-side combined. The user_id predicate pushes into
    the parquet scan on both branches."""
    ev = (
        load(spark, sf, "events")
        .filter(F.col("user_id") < 10)
        .select("user_id", F.date_trunc("hour", "ts").alias("hr"), "value")
    )
    span = ev.groupBy("user_id").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    agg = ev.groupBy("user_id", "hr").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    return grid.join(agg, ["user_id", "hr"], "left").select(
        "user_id",
        "hr",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )
