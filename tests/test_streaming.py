"""Streaming variant: availableNow drain must reproduce the batch answers."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ictspark import io, parse, streaming
from ictspark import aggregates as A


@pytest.fixture(scope="module")
def stream_src(smoke_dir, tmp_path_factory):
    """File-source streams need a DIRECTORY; smoke scale is a single file."""
    src = os.path.join(smoke_dir, "transcripts.parquet")
    d = tmp_path_factory.mktemp("stream_src")
    import shutil

    shutil.copy(src, d / "part-0000.parquet")
    return str(d)


def test_hourly_stream_equals_batch(spark, stream_src, smoke_sf_dir):
    s = streaming.read_transcript_stream(spark, stream_src)
    agg = streaming.hourly_step_stats_stream(s)
    with tempfile.TemporaryDirectory() as ck:
        rows = streaming.run_available_now(agg, ck, output_mode="append")
    got = {(r["hour"], r["status"]): r["n"] for r in rows}
    steps = parse.parse_steps(io.load_transcripts(spark, smoke_sf_dir))
    exp = {
        (r["hour"], r["status"]): r["n"]
        for r in steps.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), A.TS_FMT).alias("hour"), "status"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # watermark may hold back only windows newer than max_ts - watermark; with
    # availableNow + append, all closed windows emit. Compare the emitted set.
    assert got
    for k, v in got.items():
        assert exp[k] == v
    # at most the trailing open windows may be withheld
    assert len(exp) - len(got) <= 2


def test_first_fail_stream_converges_to_batch(spark, stream_src, smoke_sf_dir):
    s = streaming.read_transcript_stream(spark, stream_src)
    ff = streaming.first_fail_stream(s)
    with tempfile.TemporaryDirectory() as ck:
        rows = streaming.run_available_now(ff, ck, output_mode="update")
    # update mode can emit several improvements per conv; the LAST per conv is final
    final = {}
    for r in rows:
        final[r["conv_id"]] = (r["step"], r["turn_idx"])
    sa = A.with_attempt(parse.parse_steps(io.load_transcripts(spark, smoke_sf_dir)))
    exp = {r["conv_id"]: (r["step"], r["turn_idx"]) for r in A.first_fail(sa).collect()}
    assert final == exp
    # emits only on improvement (ADVICE r01): rows per conv are strictly
    # decreasing in (turn_idx); identical re-emissions would violate this
    seen: dict = {}
    for r in rows:
        prev = seen.get(r["conv_id"])
        if prev is not None:
            assert (r["turn_idx"],) < (prev,), f"redundant emission for {r['conv_id']}"
        seen[r["conv_id"]] = r["turn_idx"]


def test_route_stream_equals_batch(spark, stream_src, smoke_sf_dir):
    """Streaming routed sink == batch routed output (per-sink counts + rows)."""
    import tempfile

    from ictspark import enrich
    from ictspark.route import route_columns

    tool_dim, _ = io.load_dims(spark, smoke_sf_dir)
    s = streaming.read_transcript_stream(spark, stream_src)
    routed = streaming.route_stream(s, tool_dim)
    with tempfile.TemporaryDirectory() as d:
        streaming.run_route_stream(routed, f"{d}/out", f"{d}/ck")
        got = spark.read.parquet(f"{d}/out")
        t = io.load_transcripts(spark, smoke_sf_dir)
        exp = route_columns(enrich.enrich_steps(parse.parse_steps(t), tool_dim))
        # streaming sink casts ts to TimestampType; compare on formatted ts
        cols = [c for c in exp.columns if c not in ("ts", "day")]
        g = got.select(*cols, F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"))
        e = exp.select(*cols, F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"))
        assert g.count() == e.count()
        assert g.exceptAll(e).count() == 0
        got_counts = {r["route_key"]: r["count"] for r in got.groupBy("route_key").count().collect()}
        exp_counts = {r["route_key"]: r["count"] for r in exp.groupBy("route_key").count().collect()}
        assert got_counts == exp_counts


def test_dedupe_stream_drops_duplicates(spark, stream_src, smoke_sf_dir):
    """Streaming dedupe (T4): feeding the same file twice in one availableNow
    drain yields each (conv_id, turn_idx) exactly once (within the watermark),
    matching the batch ingest dedupe."""
    import shutil

    with tempfile.TemporaryDirectory() as d2:
        src_file = os.path.join(stream_src, "part-0000.parquet")
        shutil.copy(src_file, os.path.join(d2, "part-0000.parquet"))
        shutil.copy(src_file, os.path.join(d2, "part-0001.parquet"))  # dup batch
        s = streaming.read_transcript_stream(spark, d2)
        dd = streaming.dedupe_stream(s).select("conv_id", "turn_idx")
        with tempfile.TemporaryDirectory() as ck:
            rows = streaming.run_available_now(dd, ck, output_mode="append")
        keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
        assert len(keys) == len(set(keys)), "duplicate keys leaked through"
        exp = io.load_transcripts(spark, smoke_sf_dir).select("conv_id", "turn_idx").distinct().count()
        assert len(set(keys)) == exp


def test_dedupe_stream_newest_wins_on_updated_payloads(spark, tmp_path):
    """VERDICT r03 item 6: duplicate keys whose payloads DIFFER (a re-push
    with updated content and newer ts), delivered in shuffled order across
    micro-batches, must resolve to exactly the batch newest-wins result
    (io.dedupe_transcripts) after the sink's per-key upsert reduction."""
    import datetime as dt

    from ictspark.schema import TRANSCRIPTS

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    for i in range(40):
        rows.append((f"c{i}", 0, "user", f"payload v1 {i}", None, base + dt.timedelta(minutes=i)))
    for i in range(25):  # keys 0-24 get a revised, newer copy
        rows.append((f"c{i}", 0, "user", f"payload v2 {i}", None, base + dt.timedelta(hours=1, minutes=i)))
    for i in range(10):  # keys 0-9 get a third, newest copy
        rows.append((f"c{i}", 0, "user", f"payload v3 {i}", None, base + dt.timedelta(hours=2, minutes=i)))
    # ADVICE r04: a missing-timestamp row — pandas delivers NaT, which the
    # champion pick must detect via pd.isna and map to the -1 sentinel (any
    # real ts beats it; a lone null-ts key emits ts=None)
    rows.append(("cnull", 0, "user", "payload no ts", None, None))
    df = spark.createDataFrame(rows, TRANSCRIPTS)
    src = str(tmp_path / "newest_src")
    # shuffled delivery: 5 files in content-hash order, one per micro-batch —
    # newer copies routinely arrive BEFORE older ones
    df.orderBy(F.md5("text")).repartition(5).write.parquet(src)
    s = spark.readStream.schema(TRANSCRIPTS).option("maxFilesPerTrigger", 1).parquet(src)
    # large finite retention: exercises the ProcessingTimeTimeout code path
    # without wall-clock flakiness (a 5 s TTL could genuinely expire between
    # this test's micro-batches); expiry semantics get their own test below
    dd = streaming.dedupe_stream_newest(s, retention_ms=600_000)
    with tempfile.TemporaryDirectory() as ck:
        emitted = streaming.run_until_idle(dd, ck, output_mode="update")
    # sink upsert: champion ts is monotone per key → max-ts emission per key
    final = {}
    for r in emitted:
        k = (r["conv_id"], r["turn_idx"])
        if k not in final or r["ts"] > final[k]["ts"]:
            final[k] = r
    got = {(r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"]) for r in final.values()}
    exp = {
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"])
        for r in io.dedupe_transcripts(df).collect()
    }
    assert got == exp
    # and a late OLDER re-push of an already-superseded key emits nothing new:
    # every emitted ts per key is strictly increasing
    seen: dict = {}
    for r in emitted:
        k = (r["conv_id"], r["turn_idx"])
        if k in seen:
            assert r["ts"] > seen[k], f"non-improving emission for {k}"
        seen[k] = r["ts"]


def test_dedupe_stream_newest_retention_expiry_readmits(spark, tmp_path):
    """VERDICT r04 item 2, the now-ENFORCED retention contract: champion
    state for a key idle past ``retention_ms`` is REMOVED (ProcessingTime
    timeout), so a re-push arriving after expiry re-admits the key — even
    with an OLDER ts. Three drains over one checkpoint: (1) key c0 arrives
    with a NEW ts and is emitted; (2) after sleeping past retention, a batch
    of unrelated keys runs, firing c0's timeout and dropping its state; (3)
    an older re-push of c0 arrives and MUST be emitted again (with live
    state it would have been silently absorbed — the monotonicity assert in
    the parity test above proves that side)."""
    import datetime as dt
    import shutil
    import time

    from ictspark.schema import TRANSCRIPTS

    newer = dt.datetime(2024, 3, 1, 12, 0, 0)
    older = dt.datetime(2024, 3, 1, 11, 0, 0)
    src = str(tmp_path / "exp_src")
    ck = str(tmp_path / "exp_ck")
    os.makedirs(src)

    def add_file(name: str, rows) -> None:
        tmp = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, TRANSCRIPTS).coalesce(1).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        shutil.copy(os.path.join(tmp, part), os.path.join(src, f"{name}.parquet"))

    def drain() -> list:
        s = spark.readStream.schema(TRANSCRIPTS).parquet(src)
        return streaming.run_until_idle(
            streaming.dedupe_stream_newest(s, retention_ms=500), ck, output_mode="update"
        )

    add_file("f1", [("c0", 0, "user", "v-new", None, newer)])
    first = drain()
    assert [(r["conv_id"], r["ts"]) for r in first] == [("c0", newer)]
    time.sleep(1.0)  # let c0's 500 ms retention lapse
    # a batch must RUN for the timeout to fire; unrelated keys provide it
    add_file("f2", [("c9", 0, "user", "other", None, newer)])
    second = drain()
    assert [(r["conv_id"]) for r in second] == ["c9"]
    # older re-push after expiry: re-admitted (fresh state), so it re-emits
    add_file("f3", [("c0", 0, "user", "v-old", None, older)])
    third = drain()
    assert [(r["conv_id"], r["text"], r["ts"]) for r in third] == [("c0", "v-old", older)]


def test_yield_state_loop_equals_batch(spark, smoke_sf_dir, tmp_path):
    """VERDICT r02 item 5 (T5 in anger): the run-grain yield aggregate as a
    streaming query — foreachBatch merges each micro-batch's step skeleton
    into a compact state table; yields derive from state alone. Multi-batch
    drain over shuffled file splits must equal the batch report exactly
    (attempt ranks are order-independent over merged state)."""
    t = io.load_transcripts(spark, smoke_sf_dir)
    src = str(tmp_path / "src")
    # 4 files in arbitrary row order → 4 micro-batches, out-of-order arrivals
    t.orderBy(F.md5(F.concat_ws("|", "conv_id", "turn_idx"))).repartition(4).write.parquet(src)
    s = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state_dir = str(tmp_path / "state")
    streaming.run_yield_state_loop(s, state_dir, str(tmp_path / "ck"))
    state = streaming.read_yield_state(spark, state_dir)
    got = {tuple(r) for r in streaming.yields_from_state(state).collect()}
    exp = {tuple(r) for r in A.yields(A.with_attempt(parse.parse_steps(t))).collect()}
    assert got == exp
    # the state is the compact skeleton, not raw: no text column, one row per
    # step execution
    assert "text" not in state.columns
    assert state.count() == parse.parse_steps(t).count()
    # restart parity: a second drain over the SAME source (fresh checkpoint →
    # full re-delivery) must leave the state unchanged (idempotent merge)
    streaming.run_yield_state_loop(
        spark.readStream.schema(t.schema).option("maxFilesPerTrigger", 1).parquet(src),
        state_dir,
        str(tmp_path / "ck2"),
    )
    state2 = streaming.read_yield_state(spark, state_dir)
    got2 = {tuple(r) for r in streaming.yields_from_state(state2).collect()}
    assert got2 == exp
    # retention: state disk is O(2 versions), not O(batches)
    vdirs = [d for d in os.listdir(state_dir) if d.startswith("v")]
    assert len(vdirs) <= 2, vdirs


def test_product_hourly_stream_equals_batch(spark, stream_src, smoke_sf_dir):
    """Streaming per-product hourly slice == the same step-grain aggregate
    computed in batch (closed windows; trailing open windows may be withheld)."""
    from ictspark import enrich

    tool_dim, _ = io.load_dims(spark, smoke_sf_dir)
    s = streaming.read_transcript_stream(spark, stream_src)
    agg = streaming.product_hourly_stream(s, tool_dim)
    with tempfile.TemporaryDirectory() as ck:
        rows = streaming.run_available_now(agg, ck, output_mode="append")
    got = {(r["hour"], r["route_key"], r["status"]): r["n"] for r in rows}
    steps = parse.parse_steps(io.load_transcripts(spark, smoke_sf_dir))
    es = enrich.enrich_steps(steps, tool_dim)
    exp_rows = (
        es.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "route_key",
            "status",
        )
        .count()
        .collect()
    )
    exp = {(r["hour"], r["route_key"], r["status"]): r["count"] for r in exp_rows}
    assert got
    for k, v in got.items():
        assert exp[k] == v
    missing_hours = {k[0] for k in exp} - {k[0] for k in got}
    assert len(missing_hours) <= 2  # only trailing open windows withheld


def test_yield_state_redelivery_with_pointer_at_same_batch(spark, smoke_sf_dir, tmp_path):
    """Code-review r03: after a crash between the pointer flip and the stream
    checkpoint commit, the SAME batch_id is re-delivered while the pointer
    already names that batch's version. Simulated by two single-batch drains
    with fresh checkpoints (both are batch 0): the second merge must read the
    current state and write a NEW dir — never overwrite the dir it reads —
    and leave the state unchanged."""
    t = io.load_transcripts(spark, smoke_sf_dir)
    src = str(tmp_path / "src")
    t.coalesce(1).write.parquet(src)
    state_dir = str(tmp_path / "state")

    def drain(ck):
        s = spark.readStream.schema(t.schema).parquet(src)  # one batch
        streaming.run_yield_state_loop(s, state_dir, str(tmp_path / ck))

    drain("ck1")
    exp = {tuple(r) for r in streaming.yields_from_state(
        streaming.read_yield_state(spark, state_dir)).collect()}
    drain("ck2")  # batch 0 re-delivered; pointer already at a v0-* version
    got = {tuple(r) for r in streaming.yields_from_state(
        streaming.read_yield_state(spark, state_dir)).collect()}
    assert got == exp


def test_sessionize_stream_equals_batch_session_windows(spark, tmp_path):
    """Streaming session_window aggregation == the SAME session_window run in
    batch over the same events (batch/stream unification); only sessions the
    watermark could not close may be withheld."""
    ev = io.load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "src")
    ev.coalesce(2).write.parquet(src)
    s = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = streaming.sessionize_stream(s)
    with tempfile.TemporaryDirectory() as ck:
        rows = streaming.run_available_now(agg, ck, output_mode="append")
    got = {(r["user_id"], r["sess_start"]): (r["sess_end"], r["n_events"]) for r in rows}
    exp_rows = streaming.sessionize_stream(ev).collect()  # same code, batch mode
    exp = {(r["user_id"], r["sess_start"]): (r["sess_end"], r["n_events"]) for r in exp_rows}
    assert got  # sessions actually emitted
    for k, v in got.items():
        assert exp[k] == v
    # only trailing (watermark-open) sessions may be withheld — they must all
    # sit in the stream's tail (start later than the median emitted session)
    missing = set(exp) - set(got)
    if missing:
        emitted_starts = sorted(s for _, s in got)
        median_start = emitted_starts[len(emitted_starts) // 2]
        assert all(s >= median_start for _, s in missing), (missing, median_start)
        assert len(missing) < len(exp) * 0.2


def test_available_now_refuses_processing_time_timeout_stream(spark, tmp_path):
    """ADVICE r05: the hazardous no-args configuration — dedupe_stream_newest
    (finite default retention → ProcessingTimeTimeout) drained via
    run_available_now — never self-terminates; it must be refused loudly up
    front, not hang until an outer timeout. retention_ms=None (NoTimeout)
    remains availableNow-compatible and is NOT refused."""
    import datetime as dt

    from ictspark.schema import TRANSCRIPTS

    src = str(tmp_path / "guard_src")
    spark.createDataFrame(
        [("c0", 0, "user", "x", None, dt.datetime(2024, 3, 1))], TRANSCRIPTS
    ).write.parquet(src)
    s = spark.readStream.schema(TRANSCRIPTS).parquet(src)
    dd = streaming.dedupe_stream_newest(s)  # the no-args default path
    with pytest.raises(ValueError, match="ProcessingTimeTimeout"):
        streaming.run_available_now(dd, str(tmp_path / "ck0"), output_mode="update")
    # ADVICE r06: the guard must survive transformations — a select over the
    # stateful frame drops the Python breadcrumb attribute, so the check now
    # derives from the analyzed plan and must still fire on the descendant
    with pytest.raises(ValueError, match="ProcessingTimeTimeout"):
        streaming.run_available_now(
            dd.select("conv_id", "turn_idx"), str(tmp_path / "ck0b"), output_mode="update"
        )
    # the unbounded-state variant still drains (and yields the one row)
    dd_none = streaming.dedupe_stream_newest(s, retention_ms=None)
    rows = streaming.run_available_now(dd_none, str(tmp_path / "ck1"), output_mode="update")
    assert [(r["conv_id"], r["turn_idx"]) for r in rows] == [("c0", 0)]


def test_dedupe_stream_eventtime_replay_parity(spark, tmp_path):
    """VERDICT r05 item 6: the EVENT-time dedupe variant must converge to the
    batch io.dedupe_transcripts under shuffled AND replayed delivery — the
    exact setting where the processing-time TTL diverges (state expiry
    between backlogged micro-batches re-admits older copies). Delivery is
    shuffled WITHIN each time phase with ordered phases (disorder bounded by
    the 40 min watermark — the watermark contract every event-time operator
    carries; unbounded disorder is the batch path's job). Drain 1: equals
    batch after the max-ts upsert reduction, across micro-batches whose
    watermark EXPIRES the v1-only and early-v2 keys (retention 10 min ≪ the
    2 h span). Drain 2: the ENTIRE dataset re-delivered (replay) through the
    same checkpoint emits NOTHING — live keys keep their incumbents, and
    every copy an expired key could re-admit is below the persisted
    watermark, which the operator drops; under the processing-time variant
    this same replay re-emits (that divergence is documented there)."""
    import datetime as dt
    import shutil

    from ictspark.schema import TRANSCRIPTS

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    phases = [[], [], []]
    for i in range(40):
        phases[0].append((f"c{i}", 0, "user", f"v1 {i}", None, base + dt.timedelta(minutes=i)))
    for i in range(25):
        phases[1].append((f"c{i}", 0, "user", f"v2 {i}", None, base + dt.timedelta(hours=1, minutes=i)))
    for i in range(10):
        phases[2].append((f"c{i}", 0, "user", f"v3 {i}", None, base + dt.timedelta(hours=2, minutes=i)))
    rows = [r for p in phases for r in p]
    df = spark.createDataFrame(rows, TRANSCRIPTS)
    src = str(tmp_path / "et_src")
    ck = str(tmp_path / "et_ck")
    os.makedirs(src)
    for pi, prows in enumerate(phases):  # 2 shuffled files per phase, phases ordered
        pdf = spark.createDataFrame(prows, TRANSCRIPTS).orderBy(F.md5("text"))
        tmp = str(tmp_path / f"stage{pi}")
        pdf.repartition(2).write.parquet(tmp)
        for fi, part in enumerate(sorted(p for p in os.listdir(tmp) if p.endswith(".parquet"))):
            shutil.copy(os.path.join(tmp, part), os.path.join(src, f"p{pi}-{fi}.parquet"))

    def drain() -> list:
        s = spark.readStream.schema(TRANSCRIPTS).option("maxFilesPerTrigger", 1).parquet(src)
        dd = streaming.dedupe_stream_newest_eventtime(
            s, watermark="40 minutes", retention_ms=600_000
        )
        # foreachBatch collector, not the memory sink (which refuses
        # checkpoint RECOVERY — drain 2 restarts the same checkpoint); the
        # availableNow trigger itself self-terminates under EventTimeTimeout,
        # which is part of what this variant promises
        out: list = []
        q = (
            dd.writeStream.foreachBatch(lambda bdf, _eid: out.extend(bdf.collect()))
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return out

    emitted = drain()
    final = {}
    for r in emitted:
        k = (r["conv_id"], r["turn_idx"])
        if k not in final or r["ts"] > final[k]["ts"]:
            final[k] = r
    got = {
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"])
        for r in final.values()
    }
    exp = {
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"])
        for r in io.dedupe_transcripts(df).collect()
    }
    assert got == exp
    # superseded champions really were re-emitted along the way (the upsert
    # reduction had work to do), so drain 1 exercised champion replacement
    assert len(emitted) > len(final)
    # replay: re-deliver every file under new names through the SAME checkpoint
    for i, p in enumerate(sorted(os.listdir(src))):
        if p.endswith(".parquet"):
            shutil.copy(os.path.join(src, p), os.path.join(src, f"replay-{i}.parquet"))
    replay_emits = drain()
    assert replay_emits == [], f"replay re-emitted {len(replay_emits)} rows"
