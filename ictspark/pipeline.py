"""End-to-end pipeline orchestration (SURVEY.md §3.1 "Spark translation").

ReportSet materializes the three shared intermediates exactly once —

    steps_a  (parse + attempt windows, the per-measurement table)
    runs     (per (conv, attempt) — the reference's per-logfile record)
    fails    (failing executions only, ~10-15% of steps)

— and derives every report from the smallest sufficient one. This mirrors the
reference's design (update() computes all derived stats from one in-memory
collection, main.rs:420) and is the scale-correct shape: each report then
costs ONE aggregation over an already-materialized, much smaller input instead
of re-running parse + windows per report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ictspark import aggregates as A
from ictspark import enrich, parse


def _barrier(df: DataFrame) -> DataFrame:
    """Materialization barrier that also TRUNCATES LINEAGE (r10, guide §7.3
    "driver thread dumps → planning time" + §5 localCheckpoint): `persist`
    kept the full parse+window logical plan under every cached table, so
    each fresh report DataFrame re-paid ~0.5-1 s of driver-side catalyst
    analysis over that lineage before touching the (already cached) rows —
    measured fresh-plan yields().collect() 1.3-1.5 s vs 0.06 s re-collect
    of the same object at sf0.1/32; with the barrier the same call is
    0.56-0.72 s. Lazy (eager=False): the first action — ReportSet
    .materialize()'s counts, which the bench times — still performs the
    materialization work, exactly like persist. A RELIABLE checkpoint when
    the session has one configured (the real-cluster path, where these are
    the stage outputs a pipeline persists anyway); localCheckpoint
    otherwise (local/bench path — fault-tolerance of a rerunnable local
    intermediate is not critical). Checkpoint storage is released by the
    ContextCleaner when the ReportSet is dropped; unpersist() stays a
    safe no-op on these frames.

    Storage level DISK_ONLY, deliberately (r10, measured): the default
    MEMORY_AND_DISK holds the checkpointed rows DESERIALIZED in the
    unified memory pool's protected storage region, where — unlike a
    persist()'s evictable cache — repeated ReportSet construction (the
    bench's best-of-3 reps; the scaling job's warmup+reps) accumulates
    them (unpersist is a no-op on checkpoints) until aggregation tasks
    hit SparkOutOfMemoryError UNABLE_TO_ACQUIRE_MEMORY — reproduced at
    sf4/local[32] in scripts/_scaling_job.py. DISK_ONLY keeps the
    blocks out of the memory pool entirely at ANY scale factor; reads
    stream back through the OS page cache (sf0.1 bench e2e measured
    unchanged, sf4 scaling job green again)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=False)
    from pyspark import StorageLevel

    return df.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)


class ReportSet:
    def __init__(self, transcripts: DataFrame, tool_dim: DataFrame) -> None:
        self.tool_dim = tool_dim
        self.steps_a = _barrier(A.with_attempt(parse.parse_steps(transcripts)))
        self.runs = _barrier(A.runs(self.steps_a))
        self.fails = _barrier(self.steps_a.where(F.col("status") != "pass"))
        self._product_runs: DataFrame | None = None  # lazy, see product_reports()

    def materialize(self) -> dict[str, int]:
        return {
            "steps": self.steps_a.count(),
            "runs": self.runs.count(),
            "fails": self.fails.count(),
        }

    # --- reports over `runs` (tiny) ---

    def yields(self) -> DataFrame:
        return A.yields_from_run_grain(self.runs)

    def hourly_stats(self) -> DataFrame:
        r = self.runs
        return r.groupBy(
            F.date_format(F.date_trunc("hour", "run_ts"), A.TS_FMT).alias("hour")
        ).agg(
            F.sum(F.when(F.col("any_fail") == 0, 1).otherwise(0)).alias("ok"),
            F.sum(F.when(F.col("any_fail") == 1, 1).otherwise(0)).alias("nok"),
        )

    def mb_results(self) -> DataFrame:
        return (
            self.runs.groupBy("session_id", "attempt")
            .agg(
                F.date_format(F.min("run_ts"), A.TS_FMT).alias("run_ts"),
                F.max("any_fail").alias("any_fail"),
            )
            .withColumn("result", F.when(F.col("any_fail") == 1, "fail").otherwise("pass"))
            .drop("any_fail")
        )

    # --- reports over `fails` (small) ---

    def failure_counts(self) -> DataFrame:
        return A.failure_counts(self.fails)

    def failures_by_index(self) -> DataFrame:
        return A.failures_by_index(self.fails)

    def first_fail(self) -> DataFrame:
        return A.first_fail(self.fails)

    def failed_boards(self) -> DataFrame:
        per_run = self.fails.groupBy("conv_id", "attempt").agg(
            F.array_join(F.array_sort(F.collect_set("step")), ", ").alias("failed_steps")
        )
        return per_run.join(
            self.runs.select("conv_id", "attempt", F.date_format("run_ts", A.TS_FMT).alias("run_ts")),
            ["conv_id", "attempt"],
        ).select("conv_id", "attempt", "run_ts", "failed_steps")

    # --- reports over `steps_a` ---

    def limit_changes(self) -> DataFrame:
        return A.limit_changes(self.steps_a)

    def route_counts(self) -> DataFrame:
        return enrich.enrich_steps(self.steps_a, self.tool_dim).groupBy("route_key").agg(
            F.count(F.lit(1)).alias("n")
        )

    def enriched(self) -> DataFrame:
        return enrich.enrich_steps(self.steps_a, self.tool_dim)

    def all_reports(self) -> dict[str, DataFrame]:
        return {
            "yields": self.yields(),
            "failure_counts": self.failure_counts(),
            "failures_by_index": self.failures_by_index(),
            "hourly_stats": self.hourly_stats(),
            "mb_results": self.mb_results(),
            "limit_changes": self.limit_changes(),
            "first_fail": self.first_fail(),
            "failed_boards": self.failed_boards(),
            "route_counts": self.route_counts(),
        }

    def product_reports(self) -> dict[str, DataFrame]:
        """The write_product composite (per-route daily report) — kept out of
        all_reports() so the scaling-protocol workload stays the nine
        aggregates BENCH/BASELINE.md measured.

        product_runs — the (route_key, conv_id, attempt) wide shuffle that is
        the composite's dominant cost — is materialized ONCE and shared by
        product_hourly and product_failed_boards (VERDICT r02 nit #1: the two
        reports previously each recomputed it)."""
        from ictspark import product_report as PR

        es = self.enriched()
        if self._product_runs is None:
            self._product_runs = _barrier(PR.product_runs(es))
        return {
            "product_hourly": PR.product_hourly(es, runs=self._product_runs),
            "product_daily_failures": PR.product_daily_failures(es),
            "product_failed_boards": PR.product_failed_boards(es, runs=self._product_runs),
        }

    def unpersist(self) -> None:
        for df in (self.steps_a, self.runs, self.fails):
            df.unpersist()
        if self._product_runs is not None:
            self._product_runs.unpersist()
            self._product_runs = None
