"""Relational query catalog: filters, aggregations, joins, windows, set ops.

These own the query surface the reference delegates wholesale to AWS Athena
(reference: README.md:5-6; intended shapes per SURVEY §2.2). Spark side is
the DataFrame API with explicit physical intent: dimension tables
(region/nation/supplier/part at TPC-H scale) are broadcast; fact-fact joins
shuffle on their keys and AQE handles skew; top-K compiles to
TakeOrderedAndProject (no full sort at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from s3_access_logs_spark.operators.joins import asof_join
from s3_access_logs_spark.plans.catalog import query
from s3_access_logs_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The relational catalog is scan/join/agg-bound: per-row expression work
    # is light, so the under-split remediation's extra exchange costs more
    # than the single-task scan it parallelizes (measured: q1 0.31 s -> 0.92,
    # q5 1.18 -> 1.88 at sf0.1 with it on). Expression-heavy catalogs
    # (parse/shingle/vector) keep it on via their own loaders.
    return load_table(spark, sf_dir, name, parallelize=False)


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                              AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                              AS avg_price,
           ROUND(AVG(l_discount), 4)                                   AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter", "tpch"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy partial-agg; Catalyst plans map-side
    partial aggregation so the shuffle carries one row per group per task."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# (r2 consolidation: mkt_segment_stats and distinct_users_by_type were
# folded out of the catalog — plain groupBy stats and COUNT(DISTINCT) are
# already exercised under the driver gate by q1_pricing_summary and
# events_5min_tumbling/running_distinct_users — so that every remaining
# entry fits inside the driver's 50-row correctness window.)


_KMV_K = 64


@query(
    "approx_distinct_users",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT
               / 4294967296.0 AS u
      FROM events WHERE user_id IS NOT NULL
    ),
    r AS (
      SELECT event_type, u,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS rn
      FROM h
    )
    SELECT event_type,
           CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)::DOUBLE
                ELSE ROUND(({_KMV_K} - 1) / MAX(u), 6) END AS approx_users
    FROM r WHERE rn <= {_KMV_K}
    GROUP BY event_type
    """,
    tags=("agg", "approx", "sketch"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based distinct estimation, made oracle-checkable: a KMV
    (k-minimum-values) estimator over md5-hashed user ids. With U_k the
    k-th smallest distinct hash mapped into [0,1), E[distinct] = (k-1)/U_k
    (Bar-Yossef et al.); when a group holds fewer than k distinct hashes
    the sketch IS the distinct set and the estimate is exact. Every
    arithmetic step (md5 -> first-8-hex int -> /2^32 -> (k-1)/U_k) is
    IEEE-identical cross-engine, so unlike HLL++ — whose estimate depends
    on the engine's register layout and is checked only by an accuracy
    bound (tests/test_operators.py::TestApproxDistinct) — the oracle
    verifies the values bit-for-bit. approx_count_distinct (HLL++)
    remains the production path at 100 TB: its sketch is fixed-size per
    group, while KMV's distinct pre-shuffle is the price of cross-engine
    determinism here."""
    ev = _t(spark, sf_dir, "events")
    u = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        / F.lit(float(1 << 32))
    ).alias("u")
    # NULL ids are excluded BEFORE hashing on both sides: md5(NULL) -> NULL
    # would survive the distinct and then sort NULLS FIRST in Spark's
    # window but NULLS LAST in DuckDB's, silently shifting the k-th value.
    h = (
        ev.filter(F.col("user_id").isNotNull())
        .select("event_type", u)
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("u")
    topk = h.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KMV_K
    )
    return topk.groupBy("event_type").agg(
        F.when(
            F.count(F.lit(1)) < _KMV_K,
            F.count(F.lit(1)).cast("double"),
        )
        .otherwise(F.round((_KMV_K - 1) / F.max("u"), 6))
        .alias("approx_users")
    )


@query(
    "revenue_rollup",
    oracle="""
    SELECT r_name, n_name,
           GROUPING(r_name) * 2 + GROUPING(n_name) AS grp_id,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg", "rollup", "join"),
    bench=True,
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping_id().alias("grp_id"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "cube_grouping_sets",
    oracle="""
    SELECT 'cube' AS part, o_orderstatus AS k1, o_orderpriority AS k2,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS grp_id,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS amount
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'gsets' AS part, l_returnflag AS k1, l_linestatus AS k2,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS grp_id,
           COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS amount
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("agg", "cube", "grouping-sets", "union"),
)
def cube_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE and explicit GROUPING SETS in one checked row (r2 consolidation
    of cube_status_priority + grouping_sets_returns): each arm is a single
    shuffle with map-side lattice expansion; the union is append-only (no
    extra exchange)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cube_part = (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("grp_id"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("amount"),
        )
        .select(
            F.lit("cube").alias("part"),
            F.col("o_orderstatus").alias("k1"),
            F.col("o_orderpriority").alias("k2"),
            "grp_id",
            "n",
            "amount",
        )
    )
    gs_part = (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().alias("grp_id"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("amount"),
        )
        .select(
            F.lit("gsets").alias("part"),
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus").alias("k2"),
            "grp_id",
            "n",
            "amount",
        )
    )
    return cube_part.unionByName(gs_part)


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "tpch"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> two shuffled joins -> agg ->
    top-K (TakeOrderedAndProject — never a global sort). Ties broken on the
    unique l_orderkey so the row set is deterministic cross-engine."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "agg", "tpch"),
    bench=True,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. Dimension chain region->nation->supplier
    is broadcast; only customer⨝orders⨝lineitem shuffle."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# (r2 consolidation: top_customers was folded out — orderBy().limit()'s
# TakeOrderedAndProject plan is pinned by q3_shipping_priority and
# tests/test_plan_shapes.py::test_topk_uses_take_ordered.)


@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join", "anti"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "suppliers_in_region",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE n_nationkey = s_nationkey AND r_name = 'ASIA'
    )
    """,
    tags=("join", "semi"),
)
def suppliers_in_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asian_nations = n.join(broadcast(r), n.n_regionkey == r.r_regionkey)
    return s.join(
        broadcast(asian_nations), s.s_nationkey == asian_nations.n_nationkey, "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "value_band_range_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1000.0)
    )
    SELECT band, event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band, event_type
    """,
    tags=("join", "range", "non-equi"),
)
def value_band_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join against a tiny banding dim — broadcast, so the
    range condition is evaluated map-side (BroadcastNestedLoopJoin) instead
    of a cartesian shuffle."""
    ev = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1000.0)],
        ["band", "lo", "hi"],
    )
    return (
        ev.join(
            broadcast(bands),
            (ev.value >= bands.lo) & (ev.value < bands.hi),
        )
        .groupBy("band", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@query(
    "running_revenue_window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER w_cum, 2) AS running_total,
           ROW_NUMBER() OVER w AS order_seq,
           date_diff('day', LAG(o_orderdate) OVER w, o_orderdate)::BIGINT
             AS days_since_prev,
           LEAD(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w_cum AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "lag-lead"),
    bench=True,
)
def running_revenue_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + row_number + lag/lead over ONE window spec (r2
    consolidation of lag_lead_order_gaps into this query): all four
    functions share the o_custkey shuffle and sort, so the merged query
    costs the same single exchange as either half did alone."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "rank_parts_window",
    oracle="""
    SELECT * FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             ROW_NUMBER() OVER (
               PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn,
             DENSE_RANK() OVER (
               PARTITION BY p_brand ORDER BY p_size) AS size_rank,
             NTILE(4) OVER (
               PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
               AS price_quartile
      FROM part
    ) WHERE rn <= 3
    """,
    tags=("window", "topk-per-group", "ntile"),
)
def rank_parts_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / dense_rank / ntile per group (r2 consolidation: the
    ntile quartile evidence from customer_balance_quartiles now lives here,
    sharing the same window spec as the top-k rank — ties broken on the
    unique key so bucket membership is deterministic cross-engine)."""
    p = _t(spark, sf_dir, "part")
    w_price = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    w_size = Window.partitionBy("p_brand").orderBy("p_size")
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_name",
            "p_retailprice",
            F.row_number().over(w_price).alias("rn"),
            F.dense_rank().over(w_size).alias("size_rank"),
            F.ntile(4).over(w_price).alias("price_quartile"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@query(
    "brand_set_ops",
    oracle="""
    SELECT 'both' AS src, p_brand FROM (
      SELECT p_brand FROM part WHERE p_size > 25
      INTERSECT
      SELECT p_brand FROM part WHERE p_retailprice > 1400
    )
    UNION ALL
    SELECT 'large_only' AS src, p_brand FROM (
      SELECT p_brand FROM part WHERE p_size > 25
      EXCEPT
      SELECT p_brand FROM part WHERE p_retailprice > 1400
    )
    """,
    tags=("setop",),
)
def brand_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    large = p.filter(F.col("p_size") > 25).select("p_brand")
    pricey = p.filter(F.col("p_retailprice") > 1400).select("p_brand")
    both = large.intersect(pricey).select(F.lit("both").alias("src"), "p_brand")
    only = large.subtract(pricey).select(F.lit("large_only").alias("src"), "p_brand")
    return both.unionByName(only)


# --------------------------------------------------------------------------
# Events: time windows, sessionization, JSON
# --------------------------------------------------------------------------

@query(
    "events_5min_tumbling",
    oracle="""
    SELECT (floor(epoch(ts) / 300) * 300)::BIGINT AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window-time", "agg"),
    bench=True,
)
def events_5min_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windows. Batch analog of the streaming pipeline's
    windowed aggregation (streaming/pipeline.py uses F.window on the same
    epoch bucketing)."""
    ev = _t(spark, sf_dir, "events")
    bucket = (F.floor(F.col("ts").cast("double") / 300) * 300).cast("long")
    return (
        ev.groupBy(bucket.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "events_json_extract",
    oracle="""
    WITH ev AS (
      -- malformed/NULL props degrade to NULL exactly like Spark's
      -- get_json_object; DuckDB's json_extract_string ERRORS on
      -- malformed input un-guarded (dirty-events sweep, round 7)
      SELECT event_type,
             CASE WHEN json_valid(props) THEN props END AS props
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           SUM(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
           ROUND(AVG(json_extract_string(props, '$.k')::BIGINT), 4) AS avg_k
    FROM ev
    GROUP BY event_type
    """,
    tags=("json", "agg"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


@query(
    "asof_last_click",
    oracle="""
    SELECT e.event_id, e.user_id,
           c.event_id AS click_event_id,
           floor(epoch(e.ts) - epoch(c.ts))::BIGINT AS secs_since_click
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    tags=("join", "asof"),
)
def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join: for every error event, the latest prior
    click by the same user. Implemented union+window (operators/joins.py) —
    one shuffle on user_id, no range cross-join; oracled by DuckDB's native
    ASOF JOIN."""
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts"), F.col("event_id")
    )
    joined = asof_join(
        errors, clicks, on="user_id", left_ts="ts", right_ts="ts", right_prefix="r_"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("r_event_id").alias("click_event_id"),
        F.floor(
            F.col("ts").cast("double") - F.col("r_ts").cast("double")
        )
        .cast("long")
        .alias("secs_since_click"),
    )


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      -- NULL user/ts are out of contract (dirty-events sweep, round 7):
      -- a session needs an owner and a clock, and NULL ordering inside
      -- the window is engine-specific (Spark NULLS FIRST, DuckDB LAST)
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, (SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           floor(epoch(MIN(ts)))::BIGINT AS session_start,
           floor(epoch(MAX(ts)))::BIGINT AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("window", "sessionize"),
    bench=True,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + cumulative
    flag sum — the batch twin of streaming session_window. One shuffle on
    user_id serves both window passes and the final group-by."""
    ev = _t(spark, sf_dir, "events").filter(
        "user_id IS NOT NULL AND ts IS NOT NULL"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(cum))
    return numbered.groupBy("user_id", "session_id").agg(
        F.floor(F.min(F.col("ts").cast("double"))).cast("long").alias("session_start"),
        F.floor(F.max(F.col("ts").cast("double"))).cast("long").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


# --------------------------------------------------------------------------
# Grouping sets / percentiles / pivot / ntile
# --------------------------------------------------------------------------


@query(
    "price_profile",
    oracle="""
    WITH pct AS (
      SELECT o_orderstatus AS key,
             ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
             ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
             ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
             ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95
      FROM orders GROUP BY 1
    ),
    hist AS (
      SELECT LEAST(floor(l_extendedprice / 6000), 19)::BIGINT AS bin,
             COUNT(*)::DOUBLE AS bin_n,
             ROUND(MIN(l_extendedprice), 2) AS bin_lo,
             ROUND(MAX(l_extendedprice), 2) AS bin_hi
      FROM lineitem GROUP BY 1
    )
    SELECT metric, key, value FROM (
      SELECT 'p25' AS metric, key, p25 AS value FROM pct
      UNION ALL SELECT 'p50', key, p50 FROM pct
      UNION ALL SELECT 'p75', key, p75 FROM pct
      UNION ALL SELECT 'p95', key, p95 FROM pct
      UNION ALL SELECT 'bin_n', bin::VARCHAR, bin_n FROM hist
      UNION ALL SELECT 'bin_lo', bin::VARCHAR, bin_lo FROM hist
      UNION ALL SELECT 'bin_hi', bin::VARCHAR, bin_hi FROM hist
    )
    """,
    tags=("agg", "percentile", "histogram", "profile"),
)
def price_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-format price-distribution profile (df.summary() shape): exact
    continuous percentiles of order totals by status (Spark `percentile` =
    DuckDB quantile_cont, both linear-interpolation) plus a fixed-width
    histogram (20 x 6000 bins, top bin open-ended) over line-item extended
    price — (metric, key, value) rows, the schema profiling dashboards
    ingest. (r2 consolidation of price_percentiles_by_status +
    price_histogram into one catalog slot; both capabilities stay
    value-checked.)

    Scale shape: each arm is one partial-agg pass over its table — the
    percentile shuffle carries one row per status, the histogram at most 20
    rows per task; `unpivot` is a zero-shuffle local expansion and the
    union of two tiny aggregates is free. The approx variant for the
    100 TB path is approx_percentile (t-digest, one pass, mergeable) —
    exact is the oracle-checkable form."""
    o = _t(spark, sf_dir, "orders")
    pct = o.groupBy(F.col("o_orderstatus").alias("key")).agg(
        *[
            F.round(F.percentile("o_totalprice", F.lit(p)), 4).alias(name)
            for p, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.95, "p95")]
        ]
    )
    pct_long = pct.unpivot(["key"], ["p25", "p50", "p75", "p95"], "metric", "value")
    li = _t(spark, sf_dir, "lineitem")
    bin_ = F.least(F.floor(F.col("l_extendedprice") / 6000), F.lit(19)).cast(
        "bigint"
    )
    hist = li.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).cast("double").alias("bin_n"),
        F.round(F.min("l_extendedprice"), 2).alias("bin_lo"),
        F.round(F.max("l_extendedprice"), 2).alias("bin_hi"),
    )
    hist_long = hist.withColumn("key", F.col("bin").cast("string")).unpivot(
        ["key"], ["bin_n", "bin_lo", "bin_hi"], "metric", "value"
    )
    return pct_long.select("metric", "key", "value").unionByName(
        hist_long.select("metric", "key", "value")
    )


@query(
    "returnflag_pivot",
    oracle="""
    SELECT l_linestatus,
           ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'A'
                 THEN l_extendedprice END), 0), 2) AS flag_a,
           ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'N'
                 THEN l_extendedprice END), 0), 2) AS flag_n,
           ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'R'
                 THEN l_extendedprice END), 0), 2) AS flag_r
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("agg", "pivot"),
)
def returnflag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide). Pivot values are declared, not discovered, so
    the plan is a single aggregation — no extra distinct-values job, which
    is the difference between one and two full scans at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_extendedprice"))
    )
    return out.select(
        "l_linestatus",
        *[
            F.round(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(f"flag_{c.lower()}")
            for c in ["A", "N", "R"]
        ],
    )


# --------------------------------------------------------------------------
# Map functions
# --------------------------------------------------------------------------


@query(
    "props_map_explode",
    oracle="""
    WITH ev AS (
      -- malformed/NULL props -> NULL map -> zero exploded rows, the
      -- from_json contract (dirty-events sweep, round 7)
      SELECT CASE WHEN json_valid(props) THEN props END AS props
      FROM events
    ),
    kv AS (
      SELECT unnest(json_keys(props)) AS prop_key,
             props
      FROM ev
    )
    SELECT prop_key,
           COUNT(*) AS n,
           SUM(json_extract_string(props, '$.' || prop_key)::BIGINT)::BIGINT AS total,
           MIN(json_extract_string(props, '$.' || prop_key)::BIGINT) AS lo,
           MAX(json_extract_string(props, '$.' || prop_key)::BIGINT) AS hi
    FROM kv GROUP BY prop_key
    """,
    tags=("json", "map", "explode"),
)
def props_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON -> MapType -> explode to (key, value) rows -> aggregate -> pack
    the per-key results back into a map (map_from_entries + collect_list)
    -> explode again: the schema-free side of the JSON surface plus the map
    construction round-trip (r2 consolidation of user_event_type_map's
    mechanism). The round-trip runs on the post-aggregation rows (a handful
    of keys), so the packing stage is a no-op at any scale; the output —
    and therefore the oracle — is unchanged by it."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    agg = (
        ev.select(F.explode(m).alias("prop_key", "v"))
        .groupBy("prop_key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )
    packed = agg.agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.struct("prop_key", F.struct("n", "total", "lo", "hi"))
                )
            )
        ).alias("m")
    )
    return packed.select(F.explode("m").alias("prop_key", "s")).select(
        "prop_key",
        F.col("s.n").alias("n"),
        F.col("s.total").alias("total"),
        F.col("s.lo").alias("lo"),
        F.col("s.hi").alias("hi"),
    )


# --------------------------------------------------------------------------
# Subqueries (Catalyst decorrelation)
# --------------------------------------------------------------------------

@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
    tags=("subquery", "join", "tpch", "sql-api"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity), expressed through the SQL entry surface. Catalyst
    decorrelates it into an aggregate + join — at 100 TB this becomes a
    partial-agg over lineitem shuffled once on l_partkey, not a per-row
    subquery execution (reference has no subquery machinery at all;
    Athena-delegated per SURVEY §2.2)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
            SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = p_partkey
          )
        """
    )


# (r2 consolidation: q18_large_volume_customers was folded out — subquery
# decorrelation keeps two checked rows via q17 (correlated scalar) and q22
# (NOT EXISTS anti-join + scalar avg); the agg->broadcast-join shape q18
# demonstrated is also the q17 plan.)


@query(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_nationkey AS nationkey,
           COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
      )
    GROUP BY c_nationkey
    """,
    tags=("subquery", "anti-join", "agg", "tpch"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (global average as a
    one-row broadcast) + NOT EXISTS (left-anti join). Both sides stay
    shuffle-light at scale: the scalar is a full-agg reduced to one row and
    broadcast; the anti join shuffles only custkeys of 'P'-status orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_pos = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    pending = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return (
        cust.join(broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(pending, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "user_daily_anomaly",
    oracle="""
    WITH daily AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
      FROM events WHERE user_id < 200
      GROUP BY 1, 2
    ),
    stats AS (
      SELECT user_id,
             AVG(n) AS m,
             CASE WHEN COUNT(*) > 0
                  THEN sqrt(AVG(n * n) - AVG(n) * AVG(n)) END AS s
      FROM daily GROUP BY user_id
    )
    SELECT d.user_id, d.day, d.n,
           ROUND(CASE WHEN s > 0 THEN (d.n - m) / s ELSE 0.0 END, 6) AS z
    FROM daily d JOIN stats USING (user_id)
    """,
    tags=("udaf", "pandas", "agg", "window"),
)
def user_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily event-count z-scores via a grouped-map
    ``applyInPandas`` UDAF — the Arrow escape hatch demonstrated *with* a
    correctness oracle. The group-map runs one vectorized numpy pass per
    user over pre-aggregated daily counts (never raw events: the JVM-side
    partial agg shrinks each group to ~days rows before a single shuffle
    hands it to Python). Population std is computed as
    sqrt(E[n^2] - E[n]^2) over exact integer sums, so Spark/numpy and the
    DuckDB oracle agree to 6dp. Everything upstream (filter pushdown on
    user_id, date_format, count) stays in whole-stage codegen."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("user_id") < 200)
        .groupBy("user_id", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def zscores(pdf: pd.DataFrame) -> pd.DataFrame:
        n = pdf["n"].astype("float64")
        m = n.sum() / len(n)  # exact integer sum -> double, matches SQL AVG
        var = (n * n).sum() / len(n) - m * m
        s = var**0.5 if var > 0 else 0.0
        pdf = pdf.copy()
        pdf["z"] = ((n - m) / s if s > 0 else 0.0 * n).round(6)
        return pdf

    return daily.groupBy("user_id").applyInPandas(
        zscores, schema="user_id long, day string, n long, z double"
    )


@query(
    "running_distinct_users",
    oracle="""
    WITH ev AS (
      -- NULL user/ts out of contract (dirty-events sweep, round 7): a
      -- NULL day's position in the running-sum ORDER BY is
      -- engine-specific (Spark NULLS FIRST, DuckDB NULLS LAST)
      SELECT * FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    fd AS (
      SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS day
      FROM ev GROUP BY user_id
    ),
    days AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM ev),
    newu AS (SELECT day, COUNT(*) AS new_users FROM fd GROUP BY day)
    SELECT days.day,
           COALESCE(new_users, 0) AS new_users,
           (SUM(COALESCE(new_users, 0)) OVER (ORDER BY days.day
             ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_distinct_users
    FROM days LEFT JOIN newu ON days.day = newu.day
    """,
    tags=("window", "distinct", "agg"),
)
def running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day. COUNT(DISTINCT) over a window is
    unsupported in Spark SQL; the scalable rewrite is first-seen-day per
    user (one shuffle on user_id) -> new-user counts per day -> running sum.
    The unpartitioned window runs AFTER aggregation shrank the data to one
    row per day, so the single-partition sort that would be a scale bug on
    raw rows is a few-hundred-row no-op here."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(
        "user_id IS NOT NULL AND ts IS NOT NULL"
    )
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    first_day = ev.groupBy("user_id").agg(F.min(day).alias("day"))
    days = ev.select(day).distinct()
    newu = first_day.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        days.join(newu, "day", "left")
        .select("day", F.coalesce("new_users", F.lit(0)).alias("new_users"))
        .withColumn("cum_distinct_users", F.sum("new_users").over(w))
    )


# (r2 consolidation: price_histogram folded into price_profile above —
# the histogram arm is value-checked there in long format.)
