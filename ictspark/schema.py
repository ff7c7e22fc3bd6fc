"""Fixed schemas (SURVEY.md §1.2 — declared, never inferred)."""

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

TOOL_DIM = StructType(
    [
        StructField("tool", StringType(), False),
        StructField("category", StringType(), True),
        StructField("unit", StringType(), True),
        StructField("route_key", StringType(), True),
    ]
)

ROLE_DIM = StructType(
    [
        StructField("role", StringType(), False),
        StructField("role_group", StringType(), True),
        StructField("weight", DoubleType(), True),
    ]
)

# parse output (SEMANTICS.md "steps table")
STEPS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("session_id", StringType(), False),
        StructField("board_idx", IntegerType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("line_no", IntegerType(), False),
        StructField("ts", TimestampNTZType(), True),
        StructField("role", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("step", StringType(), False),
        StructField("status", StringType(), False),
        StructField("value", DoubleType(), True),
        StructField("lo", DoubleType(), True),
        StructField("nom", DoubleType(), True),
        StructField("hi", DoubleType(), True),
    ]
)
