"""Bucketed steps table: conv-grain aggregation must be exchange-free and
produce identical results to the shuffled path."""

from pyspark.sql import functions as F

from ictspark import bucketing, io, parse


def test_bucketed_agg_is_exchange_free(spark, smoke_sf_dir):
    steps = parse.parse_steps(io.load_transcripts(spark, smoke_sf_dir))
    bucketing.save_bucketed(steps, "steps_bucketed_test", n_buckets=8)
    try:
        b = bucketing.read_table(spark, "steps_bucketed_test")
        agg_b = b.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
        agg_s = steps.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
        # co-located: the bucket spec replaces the shuffle
        assert not bucketing.has_exchange(agg_b)
        assert bucketing.has_exchange(agg_s)
        # and the answers agree
        assert agg_b.exceptAll(agg_s).count() == 0
        assert agg_b.count() == agg_s.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS steps_bucketed_test")


def test_bucketed_self_join_exchange_free(spark, smoke_sf_dir):
    steps = parse.parse_steps(io.load_transcripts(spark, smoke_sf_dir))
    bucketing.save_bucketed(steps, "steps_bucketed_test2", n_buckets=8)
    try:
        b = bucketing.read_table(spark, "steps_bucketed_test2")
        j = b.alias("x").join(
            b.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).alias("y"), "conv_id"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan or "BroadcastExchange" in plan
        assert j.count() == steps.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS steps_bucketed_test2")


def test_shuffle_partition_heuristic():
    """Local = 1x cores (floor 16); cluster = 3x cores; env flag works."""
    import os

    from ictspark.session import shuffle_partitions_for

    assert shuffle_partitions_for(32, cluster=False) == 32
    assert shuffle_partitions_for(8, cluster=False) == 16  # floor
    assert shuffle_partitions_for(32, cluster=True) == 96
    old = os.environ.get("ICTSPARK_CLUSTER")
    try:
        os.environ["ICTSPARK_CLUSTER"] = "1"
        assert shuffle_partitions_for(32) == 96
        os.environ["ICTSPARK_CLUSTER"] = "0"
        assert shuffle_partitions_for(32) == 32
    finally:
        if old is None:
            os.environ.pop("ICTSPARK_CLUSTER", None)
        else:
            os.environ["ICTSPARK_CLUSTER"] = old
