"""DuckDB oracle SQL for every transcript-pipeline query (SURVEY.md §5.1).

Each oracle is a self-contained SQL string: a shared WITH-prefix that parses the
synthesized transcripts parquet with the SAME regexes as ictspark/parse.py
(RE2-compatible by construction), followed by the aggregate. Column aliases are
kept identical to the Spark side so the driver's order-insensitive value hash
matches.
"""

from __future__ import annotations

from ictspark.parse import STEP_RE

_TSF = "%Y-%m-%d %H:%M:%S"


def _prefix(transcripts_path: str, tool_dim_path: str) -> str:
    r = STEP_RE.replace("'", "''")
    return f"""
WITH t AS (SELECT * FROM read_parquet('{transcripts_path}')),
tool_dim AS (SELECT * FROM read_parquet('{tool_dim_path}')),
lines AS (
  SELECT conv_id, turn_idx, role, tool, ts,
         unnest(generate_series(1, len(string_split(text, chr(10))))) - 1 AS line_no,
         unnest(string_split(text, chr(10))) AS line
  FROM t
),
steps0 AS (
  SELECT conv_id,
         regexp_extract(conv_id, '^(.*)-([0-9]{{2}})$', 1) AS session_id,
         CAST(regexp_extract(conv_id, '^(.*)-([0-9]{{2}})$', 2) AS INT) AS board_idx,
         turn_idx, line_no, ts, role, tool,
         regexp_extract(line, '{r}', 1) AS step,
         regexp_extract(line, '{r}', 2) AS status,
         TRY_CAST(NULLIF(regexp_extract(line, '{r}', 3), '') AS DOUBLE) AS "value",
         TRY_CAST(NULLIF(regexp_extract(line, '{r}', 4), '') AS DOUBLE) AS lim2_hi,
         TRY_CAST(NULLIF(regexp_extract(line, '{r}', 5), '') AS DOUBLE) AS lim2_lo,
         TRY_CAST(NULLIF(regexp_extract(line, '{r}', 6), '') AS DOUBLE) AS lim3_nom,
         TRY_CAST(NULLIF(regexp_extract(line, '{r}', 7), '') AS DOUBLE) AS lim3_hi,
         TRY_CAST(NULLIF(regexp_extract(line, '{r}', 8), '') AS DOUBLE) AS lim3_lo
  FROM lines WHERE line LIKE 'STEP %'
),
steps AS (
  SELECT conv_id, session_id, board_idx, turn_idx, line_no, ts, role, tool, step, status,
         "value",
         COALESCE(lim2_lo, lim3_lo) AS lo,
         lim3_nom AS nom,
         COALESCE(lim2_hi, lim3_hi) AS hi
  FROM steps0 WHERE step <> ''
),
steps_a AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY conv_id, step ORDER BY turn_idx, line_no) AS attempt,
         (ROW_NUMBER() OVER (PARTITION BY conv_id, step ORDER BY turn_idx DESC, line_no DESC) = 1) AS is_last
  FROM steps
),
runs AS (
  SELECT conv_id, session_id, board_idx, attempt,
         MIN(ts) AS run_ts,
         MAX(CASE WHEN status <> 'pass' THEN 1 ELSE 0 END) AS any_fail,
         COUNT(*) AS n_steps
  FROM steps_a GROUP BY 1, 2, 3, 4
),
conv_final AS (
  SELECT conv_id, session_id,
         MAX(CASE WHEN status <> 'pass' THEN 1 ELSE 0 END) AS any_fail
  FROM steps_a WHERE is_last GROUP BY 1, 2
),
fail_modes AS (
  SELECT 'first' AS mode, * FROM steps_a WHERE status <> 'pass' AND attempt = 1
  UNION ALL SELECT 'all' AS mode, * FROM steps_a WHERE status <> 'pass'
  UNION ALL SELECT 'after_retest' AS mode, * FROM steps_a WHERE status <> 'pass' AND is_last
)
"""


def transcript_oracles(transcripts_path: str, tool_dim_path: str) -> dict[str, str]:
    p = _prefix(transcripts_path, tool_dim_path)
    q: dict[str, str] = {}

    q["parse_steps"] = p + f"""
SELECT conv_id, turn_idx, line_no, step, status,
       "value" AS value, lo, nom, hi,
       strftime(ts, '{_TSF}') AS ts
FROM steps"""

    q["yield_report"] = p + """
, g AS (
  SELECT 'conv' AS level, 'first' AS grain,
         CAST(SUM(CASE WHEN any_fail = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ok, CAST(SUM(any_fail) AS BIGINT) AS nok
  FROM runs WHERE attempt = 1
  UNION ALL
  SELECT 'conv', 'after_retest', CAST(SUM(CASE WHEN any_fail = 0 THEN 1 ELSE 0 END) AS BIGINT), CAST(SUM(any_fail) AS BIGINT)
  FROM conv_final
  UNION ALL
  SELECT 'conv', 'total', CAST(SUM(CASE WHEN any_fail = 0 THEN 1 ELSE 0 END) AS BIGINT), CAST(SUM(any_fail) AS BIGINT)
  FROM runs
  UNION ALL
  SELECT 'session', 'first', CAST(SUM(CASE WHEN any_fail = 0 THEN 1 ELSE 0 END) AS BIGINT), CAST(SUM(any_fail) AS BIGINT)
  FROM (SELECT session_id, MAX(any_fail) AS any_fail FROM runs WHERE attempt = 1 GROUP BY 1)
  UNION ALL
  SELECT 'session', 'after_retest', CAST(SUM(CASE WHEN any_fail = 0 THEN 1 ELSE 0 END) AS BIGINT), CAST(SUM(any_fail) AS BIGINT)
  FROM (SELECT session_id, MAX(any_fail) AS any_fail FROM conv_final GROUP BY 1)
  UNION ALL
  SELECT 'session', 'total', CAST(SUM(CASE WHEN any_fail = 0 THEN 1 ELSE 0 END) AS BIGINT), CAST(SUM(any_fail) AS BIGINT)
  FROM (SELECT session_id, attempt, MAX(any_fail) AS any_fail FROM runs GROUP BY 1, 2)
)
SELECT level, grain, ok, nok, ROUND(100.0 * ok / (ok + nok), 2) AS pct FROM g"""

    q["failure_counts"] = p + """
SELECT mode, step, COUNT(*) AS n_fail FROM fail_modes GROUP BY 1, 2"""

    q["failure_detail"] = p + f"""
SELECT mode, step, conv_id, strftime(ts, '{_TSF}') AS ts FROM fail_modes"""

    q["failures_by_index"] = p + """
SELECT mode, step, board_idx, COUNT(*) AS n_fail FROM fail_modes GROUP BY 1, 2, 3"""

    q["hourly_stats"] = p + f"""
SELECT strftime(date_trunc('hour', run_ts), '{_TSF}') AS hour,
       CAST(SUM(CASE WHEN any_fail = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ok,
       CAST(SUM(CASE WHEN any_fail = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nok
FROM runs GROUP BY 1"""

    q["hourly_detail"] = p + f"""
SELECT strftime(date_trunc('hour', run_ts), '{_TSF}') AS hour,
       strftime(run_ts, '{_TSF}') AS run_ts,
       CASE WHEN any_fail = 1 THEN 'fail' ELSE 'pass' END AS result,
       conv_id
FROM runs"""

    q["hourly_totals"] = p + f"""
, h AS (
  SELECT strftime(date_trunc('hour', run_ts), '{_TSF}') AS hour,
         CAST(SUM(CASE WHEN any_fail = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ok,
         CAST(SUM(CASE WHEN any_fail = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nok
  FROM runs GROUP BY 1
)
SELECT COALESCE(hour, 'TOTAL') AS hour, CAST(SUM(ok) AS BIGINT) AS ok, CAST(SUM(nok) AS BIGINT) AS nok
FROM h GROUP BY ROLLUP (hour)"""

    q["mb_results"] = p + f"""
SELECT session_id, attempt,
       strftime(MIN(run_ts), '{_TSF}') AS run_ts,
       CASE WHEN MAX(any_fail) = 1 THEN 'fail' ELSE 'pass' END AS result
FROM runs GROUP BY 1, 2"""

    q["mb_positions"] = p + """
SELECT session_id, attempt, board_idx,
       CASE WHEN any_fail = 1 THEN 'fail' ELSE 'pass' END AS result
FROM runs"""

    q["limit_changes"] = p + """
SELECT step, COUNT(DISTINCT (lo, nom, hi)) AS n_limits
FROM steps_a WHERE lo IS NOT NULL
GROUP BY 1 HAVING COUNT(DISTINCT (lo, nom, hi)) > 1"""

    q["testlist"] = p + """
SELECT DISTINCT step FROM steps_a ORDER BY step"""

    q["failed_boards"] = p + f"""
SELECT conv_id, attempt,
       strftime(MIN(ts), '{_TSF}') AS run_ts,
       string_agg(DISTINCT CASE WHEN status <> 'pass' THEN step END, ', ' ORDER BY CASE WHEN status <> 'pass' THEN step END) AS failed_steps
FROM steps_a
GROUP BY 1, 2
HAVING MAX(CASE WHEN status <> 'pass' THEN 1 ELSE 0 END) = 1"""

    q["step_series"] = p + f"""
SELECT strftime(ts, '{_TSF}') AS ts, conv_id, board_idx, attempt,
       "value" AS value, lo, nom, hi, status
FROM steps_a
WHERE step = 'r210' AND "value" IS NOT NULL"""

    q["mb_result_boxes"] = p + f"""
SELECT session_id, attempt,
       strftime(MIN(run_ts), '{_TSF}') AS run_ts,
       string_agg(CAST(board_idx AS VARCHAR) || ':'
                  || CASE WHEN any_fail = 1 THEN 'fail' ELSE 'pass' END,
                  ' ' ORDER BY board_idx) AS boxes,
       CAST(SUM(any_fail) AS BIGINT) AS n_fail
FROM runs GROUP BY 1, 2"""

    q["step_cpk_trend"] = p + """
, v AS (
  SELECT step, strftime(ts, '%Y-%m-%d') AS day, "value" AS x, lo, hi
  FROM steps_a WHERE "value" IS NOT NULL AND lo IS NOT NULL
),
a AS (
  SELECT step, day, COUNT(*) AS n, CAST(SUM(x) AS DOUBLE) AS s1,
         CAST(SUM(x * x) AS DOUBLE) AS s2, MIN(lo) AS lo, MAX(hi) AS hi
  FROM v GROUP BY 1, 2
)
SELECT step, day, n, ROUND(s1 / n, 2) AS mean,
       ROUND(sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0)), 2) AS stddev,
       ROUND(least(hi - s1 / n, s1 / n - lo)
             / (3 * sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0))), 2) AS cpk
FROM a WHERE n > 1"""

    q["step_histogram"] = p + """
, v AS (
  SELECT step, "value" AS x, lo, hi FROM steps_a
  WHERE "value" IS NOT NULL AND lo IS NOT NULL
),
ext AS (SELECT step, MIN(lo) AS blo, MAX(hi) AS bhi FROM v GROUP BY 1),
j AS (SELECT v.step, v.x, e.blo, e.bhi FROM v JOIN ext e ON v.step = e.step WHERE e.bhi > e.blo),
b AS (
  SELECT step, blo, bhi,
         GREATEST(0, LEAST(9, CAST(FLOOR((x - blo) / ((bhi - blo) / 10.0)) AS INT))) AS bin
  FROM j
)
SELECT step, bin, COUNT(*) AS n,
       ROUND(MIN(blo) + MIN(bin) * (MAX(bhi) - MIN(blo)) / 10, 6) AS bin_lo
FROM b GROUP BY 1, 2"""

    q["retest_counts"] = p + """
SELECT step, COUNT(*) AS n_exec,
       CAST(SUM(CASE WHEN attempt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retest,
       COUNT(DISTINCT conv_id) AS n_convs
FROM steps_a GROUP BY 1"""

    q["first_fail"] = p + f"""
SELECT conv_id, step, turn_idx, strftime(ts, '{_TSF}') AS ts
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx, line_no) AS rn
  FROM steps_a WHERE status <> 'pass'
) WHERE rn = 1"""

    q["route_counts"] = p + """
SELECT COALESCE(d.route_key, 'misc') AS route_key, COUNT(*) AS n
FROM steps_a s LEFT JOIN tool_dim d ON s.tool = d.tool
GROUP BY 1"""

    q["tool_call_stats"] = p + """
, tc AS (
  SELECT regexp_extract(line, '^TOOL_CALL ([A-Za-z_][A-Za-z0-9_]*) ARGS=(.*)$', 1) AS called_tool
  FROM lines WHERE line LIKE 'TOOL_CALL %'
)
SELECT called_tool, COUNT(*) AS n_calls FROM tc WHERE called_tool <> '' GROUP BY 1"""

    q["tool_call_args_hist"] = p + """
, tc AS (
  SELECT regexp_extract(line, '^TOOL_CALL ([A-Za-z_][A-Za-z0-9_]*) ARGS=(.*)$', 1) AS called_tool,
         regexp_extract(line, '^TOOL_CALL ([A-Za-z_][A-Za-z0-9_]*) ARGS=(.*)$', 2) AS args
  FROM lines WHERE line LIKE 'TOOL_CALL %'
),
kv AS (
  SELECT called_tool, unnest(string_split(args, ',')) AS pair
  FROM tc WHERE called_tool <> ''
)
SELECT called_tool, split_part(pair, '=', 1) AS arg_key, COUNT(*) AS n
FROM kv WHERE pair <> '' GROUP BY 1, 2"""

    q["retest_marker_parity"] = p + """
, rm AS (
  SELECT conv_id, turn_idx, line_no,
         regexp_extract(line, '^RETEST ([crvldu][0-9]{3}(?:%[A-Z]+)?) ATTEMPT=([0-9]+)$', 1) AS step,
         TRY_CAST(regexp_extract(line, '^RETEST ([crvldu][0-9]{3}(?:%[A-Z]+)?) ATTEMPT=([0-9]+)$', 2) AS INT) AS attempt_claimed
  FROM lines WHERE line LIKE 'RETEST %'
)
SELECT COUNT(*) AS n_markers,
       CAST(SUM(CASE WHEN s.attempt = rm.attempt_claimed THEN 1 ELSE 0 END) AS BIGINT) AS n_rank_match
FROM (SELECT * FROM rm WHERE step <> '') rm
JOIN steps_a s ON s.conv_id = rm.conv_id AND s.turn_idx = rm.turn_idx AND s.step = rm.step"""

    q["reassembly_check"] = p + """
, re AS (
  SELECT conv_id, turn_idx, string_agg(line, chr(10) ORDER BY line_no) AS rebuilt
  FROM lines GROUP BY 1, 2
)
SELECT COUNT(*) AS n_turns,
       CAST(SUM(CASE WHEN re.rebuilt = t.text THEN 1 ELSE 0 END) AS BIGINT) AS n_equal
FROM re JOIN t ON t.conv_id = re.conv_id AND t.turn_idx = re.turn_idx"""

    return q


def product_oracles(transcripts_path: str, tool_dim_path: str) -> dict[str, str]:
    """write_product composite (daily_yield.rs:82-169) per route_key."""
    p = _prefix(transcripts_path, tool_dim_path)
    es = """
es AS (
  SELECT s.*, COALESCE(d.route_key, 'misc') AS route_key
  FROM steps_a s LEFT JOIN tool_dim d ON s.tool = d.tool
)"""
    pruns = es + f""",
pruns AS (
  SELECT route_key, conv_id, attempt, MIN(ts) AS run_ts,
         MAX(CASE WHEN status <> 'pass' THEN 1 ELSE 0 END) AS any_fail,
         COALESCE(string_agg(DISTINCT CASE WHEN status <> 'pass' THEN step END, ', '
                             ORDER BY CASE WHEN status <> 'pass' THEN step END), '') AS failed_steps
  FROM es GROUP BY 1, 2, 3
)"""
    q: dict[str, str] = {}

    q["product_hourly"] = p + "," + pruns + f""",
h AS (
  SELECT route_key, strftime(date_trunc('hour', run_ts), '{_TSF}') AS hour,
         CAST(SUM(1 - any_fail) AS BIGINT) AS ok,
         CAST(SUM(any_fail) AS BIGINT) AS nok
  FROM pruns GROUP BY 1, 2
)
SELECT route_key, hour, ok, nok FROM h
UNION ALL
SELECT route_key, 'TOTAL' AS hour, CAST(SUM(ok) AS BIGINT) AS ok, CAST(SUM(nok) AS BIGINT) AS nok
FROM h GROUP BY 1"""

    q["product_daily_failures"] = p + "," + es + """,
allf AS (
  SELECT route_key, step, COUNT(*) AS n_fail_all
  FROM es WHERE status <> 'pass' GROUP BY 1, 2
),
art AS (
  SELECT route_key, step, COUNT(*) AS n_fail_after_retest
  FROM es WHERE status <> 'pass' AND is_last GROUP BY 1, 2
),
wide AS (
  SELECT a.route_key, a.step, a.n_fail_all, r.n_fail_after_retest
  FROM allf a LEFT JOIN art r ON a.route_key = r.route_key AND a.step = r.step
)
SELECT route_key, step, n_fail_all, n_fail_after_retest FROM wide
UNION ALL
SELECT route_key, 'TOTAL' AS step, CAST(SUM(n_fail_all) AS BIGINT) AS n_fail_all,
       CAST(COALESCE(SUM(n_fail_after_retest), 0) AS BIGINT) AS n_fail_after_retest
FROM wide GROUP BY 1"""

    q["product_failed_boards"] = p + "," + pruns + f""",
flagged AS (
  SELECT *, MAX(any_fail) OVER (PARTITION BY route_key, conv_id) AS conv_any_fail FROM pruns
)
SELECT route_key,
       CASE WHEN attempt = 1 THEN conv_id ELSE '' END AS dmc_display,
       attempt,
       strftime(run_ts, '{_TSF}') AS run_ts,
       CASE WHEN any_fail = 1 THEN 'fail' ELSE 'pass' END AS result,
       failed_steps
FROM flagged WHERE conv_any_fail = 1"""

    q["product_workbook"] = p + "," + pruns + f""",
h AS (
  SELECT route_key, strftime(date_trunc('hour', run_ts), '{_TSF}') AS hour,
         CAST(SUM(1 - any_fail) AS BIGINT) AS ok,
         CAST(SUM(any_fail) AS BIGINT) AS nok
  FROM pruns GROUP BY 1, 2
),
hourly AS (
  SELECT route_key, hour, ok, nok FROM h
  UNION ALL
  SELECT route_key, 'TOTAL', CAST(SUM(ok) AS BIGINT), CAST(SUM(nok) AS BIGINT) FROM h GROUP BY 1
),
allf AS (
  SELECT route_key, step, COUNT(*) AS n_fail_all
  FROM es WHERE status <> 'pass' GROUP BY 1, 2
),
art AS (
  SELECT route_key, step, COUNT(*) AS n_fail_after_retest
  FROM es WHERE status <> 'pass' AND is_last GROUP BY 1, 2
),
wide AS (
  SELECT a.route_key, a.step, a.n_fail_all, r.n_fail_after_retest
  FROM allf a LEFT JOIN art r ON a.route_key = r.route_key AND a.step = r.step
),
fails AS (
  SELECT route_key, step, n_fail_all, n_fail_after_retest FROM wide
  UNION ALL
  SELECT route_key, 'TOTAL', CAST(SUM(n_fail_all) AS BIGINT),
         CAST(COALESCE(SUM(n_fail_after_retest), 0) AS BIGINT)
  FROM wide GROUP BY 1
),
flagged AS (
  SELECT *, MAX(any_fail) OVER (PARTITION BY route_key, conv_id) AS conv_any_fail FROM pruns
)
SELECT route_key, 1 AS section_order, 'hourly' AS section,
       hour AS c1, CAST(ok AS VARCHAR) AS c2, CAST(nok AS VARCHAR) AS c3,
       CAST(NULL AS VARCHAR) AS c4, CAST(NULL AS VARCHAR) AS c5
FROM hourly
UNION ALL
SELECT route_key, 2, 'failures', step, CAST(n_fail_all AS VARCHAR),
       CAST(n_fail_after_retest AS VARCHAR), NULL, NULL
FROM fails
UNION ALL
SELECT route_key, 3, 'failed_boards',
       CASE WHEN attempt = 1 THEN conv_id ELSE '' END,
       CAST(attempt AS VARCHAR), strftime(run_ts, '{_TSF}'),
       CASE WHEN any_fail = 1 THEN 'fail' ELSE 'pass' END, failed_steps
FROM flagged WHERE conv_any_fail = 1"""

    q["failed_boards_display"] = p + f""",
pr AS (
  SELECT conv_id, attempt, MIN(ts) AS run_ts,
         MAX(CASE WHEN status <> 'pass' THEN 1 ELSE 0 END) AS any_fail,
         COALESCE(string_agg(DISTINCT CASE WHEN status <> 'pass' THEN step END, ', '
                             ORDER BY CASE WHEN status <> 'pass' THEN step END), '') AS failed_steps
  FROM steps_a GROUP BY 1, 2
),
flagged AS (
  SELECT *, MAX(any_fail) OVER (PARTITION BY conv_id) AS conv_any_fail FROM pr
)
SELECT CASE WHEN attempt = 1 THEN conv_id ELSE '' END AS dmc_display,
       attempt,
       strftime(run_ts, '{_TSF}') AS run_ts,
       CASE WHEN any_fail = 1 THEN 'fail' ELSE 'pass' END AS result,
       failed_steps
FROM flagged WHERE conv_any_fail = 1"""

    return q


def _export_cols(steps: list[str]) -> str:
    cols = []
    for s in steps:
        safe = "val_" + "".join(c if c.isalnum() else "_" for c in s.lower())
        cols.append(f"MAX(CASE WHEN step = '{s}' THEN \"value\" END) AS {safe}")
    return ", ".join(cols)


def export_oracles(transcripts_path: str, tool_dim_path: str, steps: list[str]) -> dict[str, str]:
    p = _prefix(transcripts_path, tool_dim_path)
    inlist = ", ".join(f"'{s}'" for s in steps)
    cols = _export_cols(steps)
    q = {}
    q["export_matrix"] = p + f"""
SELECT conv_id, {cols}
FROM steps_a WHERE step IN ({inlist}) AND is_last
GROUP BY 1"""
    q["export_matrix_final_run"] = p + f"""
, fr AS (
  SELECT * FROM (
    SELECT *, MAX(attempt) OVER (PARTITION BY conv_id) AS max_attempt FROM steps_a
  ) WHERE attempt = max_attempt
)
SELECT conv_id, {cols}
FROM fr WHERE step IN ({inlist})
GROUP BY 1"""

    q["export_matrix_failed"] = p + f"""
SELECT conv_id, {cols}
FROM steps_a
WHERE step IN ({inlist}) AND is_last
  AND conv_id IN (SELECT conv_id FROM conv_final WHERE any_fail = 1)
GROUP BY 1"""

    q["export_matrix_vertical"] = p + f"""
SELECT step, conv_id, MAX("value") AS value
FROM steps_a WHERE step IN ({inlist}) AND is_last
GROUP BY 1, 2"""
    return q


def misc_oracles(transcripts_path: str, tool_dim_path: str) -> dict[str, str]:
    p = _prefix(transcripts_path, tool_dim_path)
    q = {}
    q["role_stats"] = f"""
WITH t AS (SELECT * FROM read_parquet('{transcripts_path}')),
role_dim AS (SELECT * FROM read_parquet('{tool_dim_path.replace("tool_dim", "role_dim")}'))
SELECT r.role_group, COUNT(*) AS n_turns,
       ROUND(CAST(SUM(r.weight) AS DOUBLE), 2) AS weighted_turns
FROM t LEFT JOIN role_dim r ON t.role = r.role
GROUP BY 1"""

    q["tool_latency"] = f"""
WITH t AS (SELECT * FROM read_parquet('{transcripts_path}')),
g AS (
  SELECT tool,
         -- epoch_us, NOT epoch_ms: Spark's ts.cast(double) keeps microsecond
         -- precision, and flooring to ms would shift sub-ms gaps (latent
         -- parity break on real, non-whole-second data)
         CAST(epoch_us(ts) AS DOUBLE) / 1000000.0
         - lag(CAST(epoch_us(ts) AS DOUBLE) / 1000000.0)
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap_s
  FROM t
)
SELECT tool, COUNT(*) AS n_calls,
       ROUND(AVG(gap_s), 4) AS avg_gap_s,
       ROUND(MAX(gap_s), 4) AS max_gap_s
FROM g WHERE tool IS NOT NULL AND gap_s IS NOT NULL GROUP BY 1"""

    q["tool_chain_stats"] = p + """
, tc AS (
  SELECT conv_id, turn_idx, line_no,
         regexp_extract(line, '^TOOL_CALL ([A-Za-z_][A-Za-z0-9_]*) ARGS=(.*)$', 1) AS called_tool
  FROM lines WHERE line LIKE 'TOOL_CALL %'
),
ch AS (
  SELECT conv_id, called_tool,
         lead(called_tool) OVER (PARTITION BY conv_id ORDER BY turn_idx, line_no) AS next_tool
  FROM tc WHERE called_tool <> ''
)
SELECT called_tool, next_tool, COUNT(*) AS n, COUNT(DISTINCT conv_id) AS n_convs
FROM ch WHERE next_tool IS NOT NULL GROUP BY 1, 2"""

    q["limit_regime_asof"] = p + f"""
, lim AS (SELECT * FROM steps_a WHERE lo IS NOT NULL),
ev0 AS (
  SELECT step, ts, conv_id, turn_idx, line_no, lo, nom, hi,
         lag(ts) OVER w AS pts,
         lag(lo) OVER w AS plo, lag(nom) OVER w AS pnom, lag(hi) OVER w AS phi
  FROM lim WINDOW w AS (PARTITION BY step ORDER BY ts, conv_id, turn_idx, line_no)
),
ev AS (
  SELECT step, ts AS rts, lo AS regime_lo, hi AS regime_hi,
         ROW_NUMBER() OVER (PARTITION BY step, ts
                            ORDER BY conv_id DESC, turn_idx DESC, line_no DESC) AS rn
  FROM ev0
  WHERE pts IS NULL
     OR plo IS DISTINCT FROM lo OR pnom IS DISTINCT FROM nom OR phi IS DISTINCT FROM hi
),
ev1 AS (SELECT step, rts, regime_lo, regime_hi FROM ev WHERE rn = 1),
qrows AS (SELECT * FROM steps_a WHERE "value" IS NOT NULL)
SELECT q.conv_id, q.turn_idx, q.line_no, q.step, strftime(q.ts, '{_TSF}') AS ts,
       q."value" AS value, r.regime_lo, r.regime_hi,
       strftime(r.rts, '{_TSF}') AS regime_since
FROM qrows q ASOF LEFT JOIN ev1 r ON q.step = r.step AND q.ts >= r.rts"""

    q["error_bursts"] = p + """
, d AS (
  SELECT conv_id, turn_idx, line_no,
         CASE WHEN status <> 'pass' THEN 1 ELSE 0 END AS is_fail,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx, line_no)
         - ROW_NUMBER() OVER (PARTITION BY conv_id, CASE WHEN status <> 'pass' THEN 1 ELSE 0 END
                              ORDER BY turn_idx, line_no) AS grp
  FROM steps_a
),
bursts AS (SELECT conv_id, grp, COUNT(*) AS len FROM d WHERE is_fail = 1 GROUP BY 1, 2)
SELECT conv_id, COUNT(*) AS n_bursts, CAST(MAX(len) AS BIGINT) AS max_burst
FROM bursts GROUP BY 1"""

    q["step_value_stats"] = p + """
, v AS (SELECT step, "value" AS x, lo, hi FROM steps_a WHERE "value" IS NOT NULL AND lo IS NOT NULL),
a AS (
  SELECT step, COUNT(*) AS n, CAST(SUM(x) AS DOUBLE) AS s1, CAST(SUM(x * x) AS DOUBLE) AS s2,
         MIN(lo) AS lo, MAX(hi) AS hi,
         CAST(SUM(CASE WHEN x < lo OR x > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_out
  FROM v GROUP BY 1
)
SELECT step, n, ROUND(s1 / n, 2) AS mean,
       ROUND(sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0)), 2) AS stddev,
       n_out,
       ROUND((hi - lo) / (6 * sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0))), 2) AS cp,
       ROUND(least(hi - s1 / n, s1 / n - lo) / (3 * sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0))), 2) AS cpk
FROM a WHERE n > 1"""

    q["first_fail_reports"] = p + f"""
, ff AS (
  SELECT conv_id, step AS first_fail_step, turn_idx AS first_fail_turn, strftime(ts, '{_TSF}') AS ts
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx, line_no) AS rn
    FROM steps_a WHERE status <> 'pass'
  ) WHERE rn = 1
),
rep AS (
  SELECT conv_id, string_agg(text, chr(10) || chr(10) ORDER BY turn_idx) AS report,
         COUNT(*) AS n_turns
  FROM t GROUP BY 1
)
SELECT ff.conv_id, ff.first_fail_step, ff.first_fail_turn, ff.ts, rep.report, rep.n_turns
FROM ff JOIN rep ON ff.conv_id = rep.conv_id"""

    q["dq_report"] = f"""
WITH t AS (SELECT * FROM read_parquet('{transcripts_path}')),
f AS (
  SELECT *,
         lag(ts) OVER w AS prev_ts,
         lag(turn_idx) OVER w AS prev_idx,
         COUNT(*) OVER (PARTITION BY conv_id, turn_idx) AS key_n
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
a AS (
  SELECT COUNT(*) AS n_total,
         CAST(SUM(CASE WHEN conv_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_conv_id,
         CAST(SUM(CASE WHEN turn_idx IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_turn_idx,
         CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
         CAST(SUM(CASE WHEN key_n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_key_rows,
         CAST(SUM(CASE WHEN prev_ts IS NOT NULL AND ts < prev_ts THEN 1 ELSE 0 END) AS BIGINT) AS ts_regressions,
         CAST(SUM(CASE WHEN prev_idx IS NOT NULL AND turn_idx <> prev_idx + 1 THEN 1 ELSE 0 END) AS BIGINT) AS turn_idx_gaps,
         CAST(SUM(CASE WHEN NOT regexp_matches(conv_id, '^.*-[0-9]{{2}}$') THEN 1 ELSE 0 END) AS BIGINT) AS malformed_conv_id
  FROM f
)
SELECT 'null_conv_id' AS "check", null_conv_id AS n_bad, n_total FROM a
UNION ALL SELECT 'null_turn_idx' AS "check", null_turn_idx AS n_bad, n_total FROM a
UNION ALL SELECT 'null_ts' AS "check", null_ts AS n_bad, n_total FROM a
UNION ALL SELECT 'dup_key_rows' AS "check", dup_key_rows AS n_bad, n_total FROM a
UNION ALL SELECT 'ts_regressions' AS "check", ts_regressions AS n_bad, n_total FROM a
UNION ALL SELECT 'turn_idx_gaps' AS "check", turn_idx_gaps AS n_bad, n_total FROM a
UNION ALL SELECT 'malformed_conv_id' AS "check", malformed_conv_id AS n_bad, n_total FROM a"""

    q["conv_reports"] = f"""
WITH t AS (SELECT * FROM read_parquet('{transcripts_path}'))
SELECT conv_id,
       string_agg(text, chr(10) || chr(10) ORDER BY turn_idx) AS report,
       COUNT(*) AS n_turns
FROM t GROUP BY 1"""

    q["conv_turn_stats"] = f"""
WITH t AS (SELECT * FROM read_parquet('{transcripts_path}'))
SELECT conv_id, COUNT(*) AS n_turns,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       COUNT(DISTINCT tool) AS n_tools
FROM t GROUP BY 1"""
    q["daily_report"] = p + """
SELECT strftime(run_ts - INTERVAL 6 HOUR, '%Y-%m-%d') AS report_day,
       CAST(SUM(CASE WHEN any_fail = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ok,
       CAST(SUM(CASE WHEN any_fail = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nok,
       ROUND(100.0 * CAST(SUM(CASE WHEN any_fail = 0 THEN 1 ELSE 0 END) AS BIGINT)
             / COUNT(*), 2) AS pct
FROM runs GROUP BY 1"""

    q["hourly_labeled"] = p + """
, h AS (
  SELECT date_trunc('hour', run_ts) AS h,
         CAST(SUM(CASE WHEN any_fail = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ok,
         CAST(SUM(CASE WHEN any_fail = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nok
  FROM runs GROUP BY 1
)
SELECT strftime(h, '%y.%m.%d') || ' ' || strftime(h, '%H') || ':00 - ' || strftime(h, '%H') || ':59' AS timeframe,
       strftime(h, '%H') || ':00 - ' || strftime(h, '%H') || ':59' AS hours,
       ok, nok, ROUND(100.0 * ok / (ok + nok), 2) AS pct
FROM h"""
    q["step_units"] = p + """
SELECT s.step, d.unit, COUNT(*) AS n,
       ROUND(AVG(s."value"), 4) AS avg_value,
       ROUND(MIN(s."value"), 4) AS min_value,
       ROUND(MAX(s."value"), 4) AS max_value
FROM steps_a s LEFT JOIN tool_dim d ON s.tool = d.tool
WHERE s."value" IS NOT NULL
GROUP BY 1, 2"""
    return q


def w7_oracles(transcripts_path: str, tool_dim_path: str) -> dict[str, str]:
    p = _prefix(transcripts_path, tool_dim_path)
    return {
        "limit_change_points": p + f"""
, lim AS (
  SELECT step, ts, conv_id, turn_idx, line_no, lo, nom, hi,
         lag(lo) OVER w AS prev_lo, lag(nom) OVER w AS prev_nom,
         lag(hi) OVER w AS prev_hi,
         COUNT(*) OVER (PARTITION BY step ORDER BY ts, conv_id, turn_idx, line_no
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_prev
  FROM steps_a WHERE lo IS NOT NULL
  WINDOW w AS (PARTITION BY step ORDER BY ts, conv_id, turn_idx, line_no)
)
SELECT step, strftime(ts, '{_TSF}') AS ts,
       prev_lo, prev_hi, lo, hi
FROM lim
WHERE n_prev > 0
  AND (prev_lo IS DISTINCT FROM lo OR prev_nom IS DISTINCT FROM nom OR prev_hi IS DISTINCT FROM hi)"""
    }
