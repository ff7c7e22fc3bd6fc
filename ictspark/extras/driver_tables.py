"""Generic operator queries over the driver-provided TPC-H-ish tables
(TESTDATA.md) — join/agg/window/shift coverage mirroring reference ops
(W5 shift buckets main.rs:567-581; 06:00 day window daily_yield.rs:203-214)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ictspark import io
from ictspark.aggregates import TS_FMT


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = io.load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), TS_FMT).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value").cast("double"), 2).alias("sum_value"),
    )


def events_shift_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift buckets 6-14 / 14-22 / 22-6 (main.rs:567-581)."""
    e = io.load_table(spark, sf_dir, "events")
    h = F.hour("ts")
    shift = (
        F.when((h >= 6) & (h < 14), "shift_a")
        .when((h >= 14) & (h < 22), "shift_b")
        .otherwise("shift_c")
    )
    return e.groupBy(shift.alias("shift")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_error"),
    )


def events_day_0600(spark: SparkSession, sf_dir: str) -> DataFrame:
    """06:00→06:00 report day (daily_yield.rs:203-214)."""
    e = io.load_table(spark, sf_dir, "events")
    day = F.date_format(
        F.date_trunc("day", F.col("ts") - F.expr("INTERVAL 6 HOURS")), "yyyy-MM-dd"
    )
    return e.groupBy(day.alias("shifted_day")).agg(F.count(F.lit(1)).alias("n"))


def tpch_q1like(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        F.round(F.sum("l_extendedprice").cast("double"), 2).alias("sum_base_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + deterministic top-10."""
    o = io.load_table(spark, sf_dir, "orders")
    c = io.load_table(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    return (
        j.groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice").cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


def events_sessionize(spark: SparkSession, sf_dir: str, gap_min: int = 30) -> DataFrame:
    """Sessionization by inactivity gap (classic log-pipeline op): a new session
    starts when a user's inter-event gap exceeds `gap_min` minutes. Window lag +
    running sum — no stateful UDF needed."""
    from pyspark.sql import Window

    e = io.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap_over = F.col("ts") > prev + F.expr(f"INTERVAL {gap_min} MINUTES")
    marked = e.withColumn("new_sess", F.when(prev.isNull() | gap_over, 1).otherwise(0))
    sess = marked.withColumn("sess_no", F.sum("new_sess").over(w))
    return sess.groupBy("user_id", "sess_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), TS_FMT).alias("sess_start"),
        F.date_format(F.max("ts"), TS_FMT).alias("sess_end"),
    )


def tpch_q5like(spark: SparkSession, sf_dir: str, region: str = "ASIA") -> DataFrame:
    """Q5-style six-table star join (local-supplier volume): customer ⋈ orders
    ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region, suppliers local to the customer's
    nation, one region selected. Dims (supplier/nation/region/customer at this
    ratio) broadcast; the fact side shuffles only for the order join + final
    agg — Catalyst orders the joins, AQE handles any skewed nation."""
    c = io.load_table(spark, sf_dir, "customer")
    o = io.load_table(spark, sf_dir, "orders")
    li = io.load_table(spark, sf_dir, "lineitem")
    s = io.load_table(spark, sf_dir, "supplier")
    n = io.load_table(spark, sf_dir, "nation")
    r = io.load_table(spark, sf_dir, "region")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .where(c["c_nationkey"] == s["s_nationkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .where(r["r_name"] == region)
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double"), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-ish fact⋈part rollup: per brand, item count + discounted revenue +
    mean retail price (broadcast part dim, single fact shuffle for the agg)."""
    li = io.load_table(spark, sf_dir, "lineitem")
    p = io.load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double"), 2).alias(
            "revenue"
        ),
        F.round(F.avg("p_retailprice"), 2).alias("avg_retail"),
    )
