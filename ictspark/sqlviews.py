"""SQL API surface: register the pipeline's tables as temp views so every
report is also reachable through plain spark.sql — the DataFrame plans and the
SQL plans compile to the same Catalyst trees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ictspark import aggregates as A
from ictspark import io, parse


def register_views(spark: SparkSession, sf_dir: str) -> None:
    t = io.load_transcripts(spark, sf_dir)
    tool_dim, role_dim = io.load_dims(spark, sf_dir)
    t.createOrReplaceTempView("transcripts")
    tool_dim.createOrReplaceTempView("tool_dim")
    role_dim.createOrReplaceTempView("role_dim")
    sa = A.with_attempt(parse.parse_steps(t))
    sa.createOrReplaceTempView("steps")
    A.runs(sa).createOrReplaceTempView("runs")


YIELD_SQL = """
SELECT 'conv' AS level, 'total' AS grain,
       SUM(CASE WHEN any_fail = 0 THEN 1 ELSE 0 END) AS ok,
       SUM(CASE WHEN any_fail = 1 THEN 1 ELSE 0 END) AS nok,
       ROUND(CAST(100.0 AS DOUBLE) * SUM(CASE WHEN any_fail = 0 THEN 1 ELSE 0 END) / COUNT(*), 2) AS pct
FROM runs
"""


def yield_total_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(YIELD_SQL)
