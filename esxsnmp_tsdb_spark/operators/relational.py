"""§2.4 relational surface (EXT) — scans, joins, aggregations, windows,
set ops over the TPC-H-ish fixtures.  The reference has no relational
algebra at all (SURVEY.md §2.4); this is the full Spark surface exposed as
named, oracle-checked operators.

Scale notes appear per-op; common posture: dimension joins are broadcast
(`F.broadcast`), fact-fact joins shuffle on their keys under AQE (skew-join
enabled), aggregations rely on partial (map-side) aggregation, and nothing
collects to the driver.

Float discipline: big double sums round to 2 (cents), averages/rates to 6,
per-row arithmetic to 6 (bitwise-identical across engines anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.registry import op
from esxsnmp_tsdb_spark.sources import register_views


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return register_views(spark, sf_dir)


@op("scan_parquet", oracle="SELECT r_regionkey, r_name FROM region")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table scan — the vectorized parquet read path."""
    return _t(spark, sf_dir)["region"].select("r_regionkey", "r_name")


@op(
    "projection_filter",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
""",
)
def projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """σ/π with pushdown: the filter and the 4-column projection both reach
    the parquet scan (verify via ``plans.explain``: PushedFilters +
    ReadSchema show exactly these columns)."""
    li = _t(spark, sf_dir)["lineitem"]
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@op(
    "hash_join_inner",
    oracle="""
SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
""",
)
def hash_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join; AQE picks broadcast vs shuffled-hash vs SMJ by
    runtime stats.  At 100 TB orders⋈customer shuffles on custkey unless
    customer fits the broadcast threshold."""
    t = _t(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"), "inner")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@op(
    "broadcast_join",
    oracle="""
SELECT l_orderkey, l_linenumber, p_brand,
       round(l_extendedprice * (1 - l_discount), 6) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
""",
)
def broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dimension side — no shuffle of the 100 TB
    fact table; `part` ships to every executor once."""
    t = _t(spark, sf_dir)
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_brand",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            ),
        )
    )


@op(
    "sort_merge_join",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice, o_orderstatus
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
""",
)
def sort_merge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large join forced to sort-merge (`hint('merge')`) — the
    spill-safe strategy for two 100 TB-scale inputs; with bucketed storage
    on orderkey both shuffles disappear."""
    t = _t(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"].hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey", "l_linenumber", "l_quantity", "o_totalprice", "o_orderstatus"
        )
    )


@op(
    "outer_join_left",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
""",
)
def outer_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join — customers without orders survive with NULLs."""
    t = _t(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
    )


@op(
    "outer_join_full",
    oracle="""
WITH s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1),
c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1)
SELECT COALESCE(s.nk, c.nk) AS nationkey, n_supp, n_cust
FROM s FULL JOIN c ON s.nk = c.nk
""",
)
def outer_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation supplier vs customer counts."""
    t = _t(spark, sf_dir)
    s = t["supplier"].groupBy(F.col("s_nationkey").alias("nk_s")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    c = t["customer"].groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    return s.join(c, F.col("nk_s") == F.col("nk_c"), "full").select(
        F.coalesce("nk_s", "nk_c").alias("nationkey"), "n_supp", "n_cust"
    )


@op(
    "semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) — no row multiplication, build side only
    needs the key column."""
    t = _t(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@op(
    "anti_join",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1998-05-01')
""",
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — dormant customers: no orders since
    1998-05-01 (the fixture's final quarter).

    The date restriction is what makes the attestation mean something:
    unrestricted "customers with no orders" is EMPTY at every fixture
    scale (every customer has orders), so the oracle row was a
    trivially-green empty-vs-empty hash (CORRECTNESS r8: 0 rows).
    Dormant-since-cutoff yields 3/8/119 rows at sf0.001/0.01/0.1 — and
    is the anti-join a marketer actually runs.  The date filter lands on
    the orders scan BEFORE the join (PushedFilters on o_orderdate), so
    the anti-join's build side shrinks to the recent slice — 2.2 MB
    broadcast, zero shuffles at sf0.1."""
    t = _t(spark, sf_dir)
    recent = t["orders"].filter(F.col("o_orderdate") >= "1998-05-01")
    return (
        t["customer"]
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@op(
    "cross_join_topk",
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""",
)
def cross_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two small dims (the only safe cross-join shape;
    Spark requires it to be explicit)."""
    t = _t(spark, sf_dir)
    return t["region"].crossJoin(t["nation"]).select("r_name", "n_name")


@op(
    "range_interval_join",
    oracle="""
WITH e AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tse
           FROM events)
SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
       b.tse - a.tse AS gap_sec
FROM e a JOIN e b
  ON a.user_id = b.user_id
 AND b.tse >= a.tse AND b.tse <= a.tse + 300
 AND a.event_id < b.event_id
""",
)
def range_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval self-join: pairs of same-user events within 5 minutes.

    Executes as a hash join on the equality key (user_id) with the range
    predicate as a post-filter — at 100 TB you additionally bucket both
    sides by a coarse time bucket so the range filter prunes pairs early
    (classic interval-bucketing range join)."""
    e = _t(spark, sf_dir)["events"].select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("tse")
    )
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.tse") >= F.col("a.tse"))
            & (F.col("b.tse") <= F.col("a.tse") + 300)
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .select(
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
            F.col("a.user_id").alias("user_id"),
            (F.col("b.tse") - F.col("a.tse")).alias("gap_sec"),
        )
    )


@op(
    "asof_join",
    oracle="""
WITH e AS (SELECT event_id, user_id, event_type, value,
                  CAST(floor(epoch(ts)) AS BIGINT) AS tse
           FROM events),
tagged AS (
  SELECT user_id, tse, event_id,
         CASE WHEN event_type = 'click' THEN event_id END AS click_id,
         CASE WHEN event_type = 'click' THEN tse END AS click_tse,
         event_type
  FROM e WHERE event_type IN ('click', 'purchase')
),
filled AS (
  SELECT user_id, tse, event_id, event_type,
         last_value(click_id IGNORE NULLS) OVER w AS click_id,
         last_value(click_tse IGNORE NULLS) OVER w AS click_tse
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY tse, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id, tse AS purchase_tse,
       click_id, click_tse
FROM filled WHERE event_type = 'purchase'
""",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join without a native Spark ASOF (SURVEY.md §7 hard parts):
    for each purchase, the latest click at-or-before it per user.

    Implemented with the union+window trick — tag click rows, sort the
    combined stream once per user, forward-fill with
    ``last_value(ignorenulls)`` — ONE shuffle on user_id and no join
    explosion, which is why this formulation survives 100 TB where the
    inequality-join + row_number version does not."""
    e = _t(spark, sf_dir)["events"].select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("tse"),
    )
    tagged = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "tse",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id_t"),
        F.when(F.col("event_type") == "click", F.col("tse")).alias("click_tse_t"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tse", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.select(
        "user_id",
        "tse",
        "event_id",
        "event_type",
        F.last("click_id_t", ignorenulls=True).over(w).alias("click_id"),
        F.last("click_tse_t", ignorenulls=True).over(w).alias("click_tse"),
    )
    return filled.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("tse").alias("purchase_tse"),
        "click_id",
        "click_tse",
    )


@op(
    "hash_aggregate",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-03'
GROUP BY l_returnflag, l_linestatus
""",
)
def hash_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate group-by — partial aggregation
    map-side, final on a 6-group shuffle (nearly free at any scale)."""
    li = _t(spark, sf_dir)["lineitem"].filter(F.col("l_shipdate") < "1998-09-03")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@op(
    "distinct_agg",
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
""",
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Catalyst expands to a two-phase aggregate (distinct
    shuffle then count), skew-safe under AQE."""
    return (
        _t(spark, sf_dir)["events"]
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@op("approx_distinct")
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (rows-only check: approximate result has
    no cross-engine oracle; SURVEY.md §2.4 marks it N).  At 100 TB this is
    THE distinct-count op — fixed memory per group vs the exact version's
    distinct shuffle."""
    return (
        _t(spark, sf_dir)["events"]
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
    )


@op(
    "grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — single-pass multi-grouping (Catalyst Expand)."""
    _t(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@op(
    "rollup_cube",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals via ``.rollup`` (CUBE is the same machinery
    with the full power set)."""
    return (
        _t(spark, sf_dir)["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@op(
    "window_rank",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — rank window, deterministic tiebreak on
    orderkey.  One shuffle on the partition key."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir)["orders"]
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn"
        )
    )


@op(
    "window_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT), o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
""",
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per customer in order-date order (frame-sequential, so
    the float accumulation order is identical on both engines)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir)["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
    )


@op(
    "window_lag_lead",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_tse,
         round(avg(value), 6) AS day_avg
  FROM events GROUP BY 1, 2
)
SELECT event_type, day_tse, day_avg,
       round(day_avg - lag(day_avg) OVER w, 6) AS dod_change,
       round(lead(day_avg) OVER w - day_avg, 6) AS next_change
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day_tse)
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day change per series via lag/lead."""
    daily = (
        _t(spark, sf_dir)["events"]
        .groupBy(
            "event_type",
            F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_tse"),
        )
        .agg(F.round(F.avg("value"), 6).alias("day_avg"))
    )
    w = Window.partitionBy("event_type").orderBy("day_tse")
    return daily.select(
        "event_type",
        "day_tse",
        "day_avg",
        F.round(F.col("day_avg") - F.lag("day_avg").over(w), 6).alias("dod_change"),
        F.round(F.lead("day_avg").over(w) - F.col("day_avg"), 6).alias("next_change"),
    )


@op(
    "sort_limit_topk",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 100
""",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject: per-partition heaps + driver
    merge of k rows, never a full sort at scale."""
    return (
        _t(spark, sf_dir)["lineitem"]
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@op(
    "set_union",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of customer and supplier nation keys."""
    t = _t(spark, sf_dir)
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .union(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@op(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersect(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


@op(
    "set_except",
    oracle="""
SELECT CAST(floor(epoch(date_trunc('day', l_shipdate))) AS BIGINT) AS ship_day_tse
FROM lineitem
EXCEPT
SELECT CAST(floor(epoch(date_trunc('day', o_orderdate))) AS BIGINT)
FROM orders
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — ship days on which no order was booked (the ~122-day
    shipment tail past the last order date, plus holiday gaps).

    Previous shape (customer nationkeys minus supplier nationkeys) was
    EMPTY at sf0.01/0.1 — every nation has both — so the driver's
    attestation never hashed a value (CORRECTNESS r8: 0 rows).  This one
    is structurally non-empty at every scale (1291/101/95 rows): ship
    dates lag order dates by up to 122 days, so the tail days can never
    appear on the right side.  Days ride the floor-epoch-bigint output
    convention (raw timestamps never appear in oracle-compared outputs).

    Both sides are distinct-ed BEFORE the subtract: EXCEPT's anti-join
    then builds on ~2.4k day rows instead of the raw 150k-row order
    scan — measured at sf0.1, total wire volume is 17.8 KB over 2
    exchanges (map-side partial aggregation folds the 600k-row ship
    scan to days before anything moves; the 16.9 MB broadcast METRIC
    that remains is the HashedRelation allocation floor, same as the
    ts_time_spine finding — the data inside is KBs).  At 100 TB the
    day domain stays ~2.5k rows/decade — the build side is
    constant-sized regardless of fact growth."""
    t = _t(spark, sf_dir)
    ship = t["lineitem"].select(
        F.unix_timestamp(F.date_trunc("DAY", "l_shipdate"))
        .cast("bigint")
        .alias("ship_day_tse")
    ).distinct()
    booked = t["orders"].select(
        F.unix_timestamp(F.date_trunc("DAY", "o_orderdate"))
        .cast("bigint")
        .alias("ship_day_tse")
    ).distinct()
    return ship.subtract(booked)


@op(
    "percentiles",
    oracle="""
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
       count(*) AS n
FROM orders GROUP BY o_orderpriority
""",
)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — Spark `percentile` and
    DuckDB `quantile_cont` agree on R-7).  At 100 TB swap for
    `percentile_approx` (fixed-memory sketch) — exact needs the full sorted
    group."""
    return (
        _t(spark, sf_dir)["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@op(
    "subquery_scalar",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > round((SELECT avg(o_totalprice) FROM orders), 4)
""",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery — Catalyst plans the inner aggregate once and
    broadcasts the scalar.  The threshold is rounded on both engines:
    partial-aggregate summation order differs between Spark and the
    oracle, so a row within an ulp of the raw mean could otherwise flip
    in/out of the result."""
    _t(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > round((SELECT avg(o_totalprice) FROM orders), 4)
        """
    )
