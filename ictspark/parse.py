"""Vectorized parse stage (SURVEY.md S4 — the LogFileHandler::push_from_file analog,
/root/reference/src/main.rs:497).

Two interchangeable implementations, identical output schema (SEMANTICS.md "steps"):

1. ``parse_steps`` — pure built-in functions: split → posexplode → regexp_extract.
   Runs entirely JVM-side inside whole-stage codegen; zero Python in the hot path.
   This is the production path: at 100 TB the scan→parse stage never leaves the JVM,
   filters/pruning push down to the parquet/Iceberg scan, and Catalyst can reorder
   around it.
2. ``parse_steps_arrow`` — ``mapInArrow`` with pandas ``str.extract`` (precompiled
   regex, zero per-row Python) per the north_star's pandas/Arrow-UDF mandate.
   Kept for parity/bench comparison; the built-in path wins (see BENCH/).

Regexes are RE2-compatible so the DuckDB oracle runs the same patterns
(SURVEY.md §5.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# step name syntax per reference test names (/root/reference/src/locals.rs:66)
STEP_RE = (
    r"^STEP ([crvldu][0-9]{3}(?:%[A-Z]+)?) STATUS=(pass|fail|error)"
    r"(?: VALUE=(-?[0-9]+\.[0-9]+))?"
    r"(?: LIM2=(-?[0-9]+\.[0-9]+),(-?[0-9]+\.[0-9]+)"
    r"| LIM3=(-?[0-9]+\.[0-9]+),(-?[0-9]+\.[0-9]+),(-?[0-9]+\.[0-9]+))?$"
)
TOOL_CALL_RE = r"^TOOL_CALL ([A-Za-z_][A-Za-z0-9_]*) ARGS=(.*)$"
RETEST_RE = r"^RETEST ([crvldu][0-9]{3}(?:%[A-Z]+)?) ATTEMPT=([0-9]+)$"

CONV_ID_RE = r"^(.*)-([0-9]{2})$"


def with_identity(df: DataFrame) -> DataFrame:
    """Derived identities (SEMANTICS.md): <session>-BB → session + panel position.

    Suffix-based (not positional) so session ids of any width parse correctly.
    """
    return df.withColumn("session_id", F.regexp_extract("conv_id", CONV_ID_RE, 1)).withColumn(
        "board_idx", F.regexp_extract("conv_id", CONV_ID_RE, 2).cast("int")
    )


def explode_lines(transcripts: DataFrame) -> DataFrame:
    """One row per text line, keyed (conv_id, turn_idx, line_no).

    posexplode keeps line ordering stable — required for the per-turn text
    equality invariant (reassembly test) and attempt ranking.
    """
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        F.posexplode(F.split(F.col("text"), "\n")).alias("line_no", "line"),
    )


_GROUP_SEP = "\x01"  # cannot occur in a STEP_RE match: the anchored pattern
# consumes every character of the line and no character class admits \x01


def parse_steps(transcripts: DataFrame) -> DataFrame:
    """STEP marker lines → typed steps rows. Fully JVM-side (codegen).

    r10 (guide §1.2 per-task work): ONE regexp_replace evaluates STEP_RE once
    per line and emits all 8 groups joined by \\x01 (Java replaceAll expands a
    non-participating group as ''), then a plain split slices the fields —
    the former per-group ``regexp_extract`` form ran the same regex 8× per
    line and was measured 3× slower on the sf0.1 scan (1.22 s → 0.39 s warm
    at 32 cores). Grammar rejects are detected exactly as before: a matching
    line is REPLACED (the result carries 7 separators, which no matching line
    can contain), so ``replaced != line`` iff the line matched; output proved
    byte-identical both directions with exceptAll on the sf0.1 corpus."""
    # r10 (guide §2.3 project/filter before the heavy operator): a turn whose
    # text contains no "STEP " substring cannot yield a STEP line, so filter
    # whole turns with one substring scan BEFORE the split+posexplode
    # materializes every line (per-turn line_no is unaffected — numbering is
    # within the kept turn). ~21% of sf0.1 turns drop here; measured
    # 0.73 → 0.65 s warm on the parse stage at sf0.1/32.
    lines = explode_lines(transcripts.where(F.col("text").contains("STEP ")))
    rep = F.regexp_replace("line", STEP_RE, _GROUP_SEP.join(f"${i}" for i in range(1, 9)))
    m = (
        lines.where(F.col("line").startswith("STEP "))
        .select(
            "conv_id",
            "turn_idx",
            "line_no",
            "ts",
            "role",
            "tool",
            F.col("line").alias("_line"),
            rep.alias("_rep"),
        )
        .where(F.col("_rep") != F.col("_line"))
        .withColumn("_g", F.split("_rep", _GROUP_SEP, -1))
    )
    g = lambda i: F.element_at("_g", i)  # noqa: E731
    num = lambda i: F.nullif(g(i), F.lit("")).cast("double")  # noqa: E731
    m = m.select(
        "conv_id",
        "turn_idx",
        "line_no",
        "ts",
        "role",
        "tool",
        g(1).alias("step"),
        g(2).alias("status"),
        num(3).alias("value"),
        num(4).alias("lim2_hi"),
        num(5).alias("lim2_lo"),
        num(6).alias("lim3_nom"),
        num(7).alias("lim3_hi"),
        num(8).alias("lim3_lo"),
    )
    return with_identity(m).select(
        "conv_id",
        "session_id",
        "board_idx",
        "turn_idx",
        "line_no",
        "ts",
        "role",
        "tool",
        "step",
        "status",
        "value",
        F.coalesce("lim2_lo", "lim3_lo").alias("lo"),
        F.col("lim3_nom").alias("nom"),
        F.coalesce("lim2_hi", "lim3_hi").alias("hi"),
    )


def parse_tool_calls(transcripts: DataFrame) -> DataFrame:
    lines = explode_lines(transcripts)
    m = lines.where(F.col("line").startswith("TOOL_CALL ")).select(
        "conv_id",
        "turn_idx",
        "line_no",
        "ts",
        "role",
        F.regexp_extract("line", TOOL_CALL_RE, 1).alias("called_tool"),
        F.regexp_extract("line", TOOL_CALL_RE, 2).alias("args"),
    )
    return with_identity(m.where(F.col("called_tool") != ""))


def parse_retest_markers(transcripts: DataFrame) -> DataFrame:
    lines = explode_lines(transcripts)
    m = lines.where(F.col("line").startswith("RETEST ")).select(
        "conv_id",
        "turn_idx",
        "line_no",
        "ts",
        F.regexp_extract("line", RETEST_RE, 1).alias("step"),
        F.regexp_extract("line", RETEST_RE, 2).cast("int").alias("attempt_claimed"),
    )
    return with_identity(m.where(F.col("step") != ""))


def parse_steps_arrow(transcripts: DataFrame) -> DataFrame:
    """Arrow-vectorized alternative parse (north_star pandas/Arrow-UDF mandate).

    mapInArrow + pandas ``str.extractall`` with a precompiled regex: batches cross
    the JVM↔Python boundary as Arrow RecordBatches; no per-row Python. Output
    schema identical to ``parse_steps``.
    """
    import pyarrow as pa  # noqa: F401  (lazy: executors import on demand)

    from ictspark.schema import STEPS

    def _batches(it):
        import re

        import pandas as pd
        import pyarrow as pa

        rx = re.compile(
            r"^STEP (?P<step>[crvldu][0-9]{3}(?:%[A-Z]+)?) STATUS=(?P<status>pass|fail|error)"
            r"(?: VALUE=(?P<value>-?[0-9]+\.[0-9]+))?"
            r"(?: LIM2=(?P<lim2_hi>-?[0-9]+\.[0-9]+),(?P<lim2_lo>-?[0-9]+\.[0-9]+)"
            r"| LIM3=(?P<lim3_nom>-?[0-9]+\.[0-9]+),(?P<lim3_hi>-?[0-9]+\.[0-9]+),(?P<lim3_lo>-?[0-9]+\.[0-9]+))?$",
            re.M,
        )
        out_schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("session_id", pa.string()),
                ("board_idx", pa.int32()),
                ("turn_idx", pa.int32()),
                ("line_no", pa.int32()),
                ("ts", pa.timestamp("us")),
                ("role", pa.string()),
                ("tool", pa.string()),
                ("step", pa.string()),
                ("status", pa.string()),
                ("value", pa.float64()),
                ("lo", pa.float64()),
                ("nom", pa.float64()),
                ("hi", pa.float64()),
            ]
        )
        for batch in it:
            pdf = batch.to_pandas()
            if len(pdf) == 0:
                yield pa.RecordBatch.from_pandas(
                    pd.DataFrame(columns=out_schema.names), schema=out_schema, preserve_index=False
                )
                continue
            lines = pdf["text"].str.split("\n").explode()
            ln = lines.groupby(level=0).cumcount().astype("int32")
            base = pdf.loc[lines.index, ["conv_id", "turn_idx", "role", "tool", "ts"]].reset_index(drop=True)
            base["line_no"] = ln.values
            ext = lines.reset_index(drop=True).str.extract(rx)  # vectorized regex, no Python loop
            hit = ext["step"].notna()
            r = pd.concat([base[hit].reset_index(drop=True), ext[hit].reset_index(drop=True)], axis=1)
            idm = r["conv_id"].str.extract(r"^(.*)-([0-9]{2})$")
            r["session_id"] = idm[0]
            r["board_idx"] = idm[1].astype("int32")
            for c in ("value", "lim2_hi", "lim2_lo", "lim3_nom", "lim3_hi", "lim3_lo"):
                r[c] = pd.to_numeric(r[c], errors="coerce")
            r["lo"] = r["lim2_lo"].fillna(r["lim3_lo"])
            r["nom"] = r["lim3_nom"]
            r["hi"] = r["lim2_hi"].fillna(r["lim3_hi"])
            r["turn_idx"] = r["turn_idx"].astype("int32")
            yield pa.RecordBatch.from_pandas(
                r[list(out_schema.names)], schema=out_schema, preserve_index=False
            )

    return transcripts.mapInArrow(_batches, STEPS)


def parse_tool_call_args(transcripts: DataFrame) -> DataFrame:
    """TOOL_CALL ARGS k=v pairs exploded to rows: (called_tool, arg_key, arg_val)."""
    tc = parse_tool_calls(transcripts)
    kv = tc.select(
        "conv_id",
        "turn_idx",
        "called_tool",
        F.explode(F.split("args", ",")).alias("pair"),
    ).where(F.col("pair") != "")
    return kv.select(
        "conv_id",
        "turn_idx",
        "called_tool",
        F.substring_index("pair", "=", 1).alias("arg_key"),
        F.substring_index("pair", "=", -1).alias("arg_val"),
    )
