"""Deterministic synthetic transcript generator (FIXTURES.md §1–2).

Pure function of (scale name, GEN_VERSION): same inputs → byte-identical parquet.
No external data. Writes to /root/repo/synthdata/<sf>/{transcripts,tool_dim,role_dim}.parquet.

Grammar emitted into `text` (one marker per line, filler interleaved):
    TOOL_CALL <tool> ARGS=<k=v,...>
    RETEST <step> ATTEMPT=<k>
    STEP <step> STATUS=<pass|fail|error> [VALUE=<f>] [LIM2=<hi>,<lo> | LIM3=<nom>,<hi>,<lo>]

Reference analog: one i3070 logfile per board run (/root/reference/src/main.rs:497);
test-name syntax `c613 r412 v605%ON` (/root/reference/src/locals.rs:66).
"""

from __future__ import annotations

import json
import os
import zlib
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GEN_VERSION = 4
SEED = 42
BASE_TS = datetime(2024, 3, 1, 0, 0, 0)  # UTC wall clock
CUTOVER_TS = BASE_TS + timedelta(hours=36)  # limit-change boundary (SURVEY A6)
SPREAD_S = 72 * 3600  # conv starts spread over 72 h → ≥48 hourly buckets

SYNTH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "synthdata")

# conversations per scale (FIXTURES.md: ~100 smoke / ~5k correctness / ~500k turns bench;
# sf1 is the scaling-protocol tier — big enough that parallelism, not overhead, dominates)
SCALES = {
    "sf0.001": 100,
    "sf0.01": 5000,
    "sf0.1": 30000,
    "sf1": 300000,
    "sf4": 1200000,
    # r10: the scaling protocol's input tier must keep per-phase fixed
    # driver cost < 5% of the smallest measured phase (scripts/scaling.py
    # methodology note); after this round's ~1.8× pipeline speedup the sf4
    # tier no longer satisfies that at 32 CPUs, so a ~3× tier restores the
    # protocol's own sizing assumption. Same deterministic generator.
    "sf12": 3600000,
}
# files per scale: >1 so the scan/parse stage splits across tasks (a single small
# parquet file pins the whole parse to ONE task regardless of cluster size)
N_FILES = {"sf0.001": 1, "sf0.01": 1, "sf0.1": 32, "sf1": 32, "sf4": 64, "sf12": 64}

TOOL_BY_PREFIX = {
    "c": "meas_capacitance",
    "r": "meas_resistance",
    "v": "meas_voltage",
    "l": "meas_inductance",
    "d": "meas_diode",
    "u": "test_digital",  # deliberately ABSENT from tool_dim → routes to 'misc'
}

FILLER = [
    "operator note: board staged on fixture",
    "assistant: proceeding with the measurement plan",
    "ambient 23.4C humidity 41%",
    "checking continuity before powered test",
    "nothing to report on this turn",
    "STEPPING through the plan",  # near-miss: must NOT match '^STEP ' marker
    "retest scheduled pending review",  # near-miss for RETEST marker
]


def _crc(s: str) -> int:
    return zlib.crc32(s.encode())


def step_pool() -> list[str]:
    """60 deterministic step names matching [crvldu][0-9]{3}(%[A-Z]+)?."""
    names = []
    prefixes = "crvldu"
    for i in range(60):
        p = prefixes[i % 6]
        num = 100 + (i * 97 + 13) % 900
        name = f"{p}{num}"
        if i % 7 == 3:
            name += "%ON" if i % 2 else "%OFF"
        names.append(name)
    return names


def base_limit(step: str) -> float:
    return 10.0 + (_crc(step) % 1000) / 10.0


def limit_changes_steps(pool: list[str]) -> set[str]:
    """Fixed ~2% subset whose limits change at CUTOVER_TS."""
    return {s for s in pool if _crc(s) % 43 == 0}


def tool_dim_rows() -> list[tuple[str, str, str, str]]:
    rows = [
        ("meas_capacitance", "analog", "F", "alpha"),
        ("meas_resistance", "analog", "Ohm", "alpha"),
        ("meas_inductance", "analog", "H", "alpha"),
        ("meas_voltage", "power", "V", "beta"),
        ("meas_diode", "semiconductor", "V", "gamma"),
        # test_digital intentionally missing → misc route (left-join coverage)
    ]
    for i, t in enumerate(
        [
            "search", "browser", "python", "bash", "calculator", "sql",
            "file_read", "file_write", "http_get", "summarize", "translate",
            "ocr", "speech", "planner", "retriever",
        ]
    ):
        rows.append((t, "agent", "-", ["alpha", "beta", "gamma", "misc"][i % 4]))
    return rows


def role_dim_rows() -> list[tuple[str, str, float]]:
    return [("user", "human", 1.0), ("assistant", "model", 0.5), ("tool", "system", 0.25)]


def _fmt(v: float) -> str:
    return f"{v:.4f}"


def _limits(step: str, ts: datetime, changed: set[str]) -> tuple[float, float, float]:
    b = base_limit(step)
    if step in changed and ts >= CUTOVER_TS:
        b *= 1.05
    return round(b * 0.9, 4), round(b, 4), round(b * 1.1, 4)


def _conv_specs(rng: "np.random.RandomState", n_convs: int) -> list[tuple[str, int]]:
    """Assign convs to sessions of 1..4 boards; (conv_id, global index)."""
    specs: list[tuple[str, int]] = []
    sess = 0
    ci = 0
    while ci < n_convs:
        k = int(rng.randint(1, 5))
        for b in range(1, k + 1):
            if ci >= n_convs:
                break
            specs.append((f"conv-{sess:04d}-{b:02d}", ci))
            ci += 1
        sess += 1
    return specs


class _Buf:
    def __init__(self) -> None:
        self.conv_ids: list[str] = []
        self.turn_idxs: list[int] = []
        self.roles: list[str] = []
        self.texts: list[str] = []
        self.tools: list[str | None] = []
        self.tss: list[datetime] = []

    def table(self) -> pa.Table:
        return pa.table(
            {
                "conv_id": pa.array(self.conv_ids, pa.string()),
                "turn_idx": pa.array(self.turn_idxs, pa.int32()),
                "role": pa.array(self.roles, pa.string()),
                "text": pa.array(self.texts, pa.string()),
                "tool": pa.array(self.tools, pa.string()),
                "ts": pa.array(self.tss, pa.timestamp("us")),
            }
        )


def _gen_conv(rng, buf: _Buf, conv_id: str, i: int, pool: list[str], changed: set[str]) -> None:
    hot = (i % 100) == 7  # ~1% hot convs, 100x steps (skew exercise)
    base_n = int(rng.randint(3, 9))
    n_steps = base_n * 100 if hot else base_n
    if hot:
        run1 = [pool[j] for j in rng.randint(0, len(pool), size=n_steps)]
    else:
        run1 = [pool[j] for j in rng.choice(len(pool), size=min(n_steps, len(pool)), replace=False)]

    start = BASE_TS + timedelta(seconds=int(rng.randint(0, SPREAD_S)))
    t = start
    turn = 0

    def emit(role: str, text: str, tool: str | None) -> None:
        nonlocal turn, t
        buf.conv_ids.append(conv_id)
        buf.turn_idxs.append(turn)
        buf.roles.append(role)
        buf.texts.append(text)
        buf.tools.append(tool)
        buf.tss.append(t)
        turn += 1
        t = t + timedelta(seconds=int(rng.randint(5, 90)))

    emit("user", f"please run the test plan for {conv_id}", None)

    # executions: run 1 all steps; failing steps retried (<=3 attempts)
    executions: list[tuple[str, int, str]] = []
    pending = [(s, 1) for s in run1]
    while pending:
        nxt: list[tuple[str, int]] = []
        for step, attempt in pending:
            r = rng.random_sample()
            if attempt == 1:
                status = "fail" if r < 0.10 else ("error" if r < 0.12 else "pass")
            else:
                status = "fail" if r < 0.25 else ("error" if r < 0.27 else "pass")
            executions.append((step, attempt, status))
            if status != "pass" and attempt < 3:
                nxt.append((step, attempt + 1))
        pending = nxt

    for step, attempt, status in executions:
        tool = TOOL_BY_PREFIX[step[0]]
        lines = []
        if rng.random_sample() < 0.25:
            lines.append(FILLER[int(rng.randint(0, len(FILLER)))])
        lines.append(f"TOOL_CALL {tool} ARGS=step={step},attempt={attempt}")
        if attempt >= 2:
            lines.append(f"RETEST {step} ATTEMPT={attempt}")
        stepline = f"STEP {step} STATUS={status}"
        pfx = step[0]
        if pfx in "crlv":
            lo, nom, hi = _limits(step, t, changed)
            val = round(float(rng.normal(nom, nom * 0.08)), 4)
            stepline += f" VALUE={_fmt(val)}"
            if pfx == "v":
                stepline += f" LIM3={_fmt(nom)},{_fmt(hi)},{_fmt(lo)}"
            else:
                stepline += f" LIM2={_fmt(hi)},{_fmt(lo)}"
        lines.append(stepline)
        if rng.random_sample() < 0.2:
            lines.append(FILLER[int(rng.randint(0, len(FILLER)))])
        emit("tool", "\n".join(lines), tool)
        if rng.random_sample() < 0.10:
            emit("assistant", FILLER[int(rng.randint(0, len(FILLER)))], None)

    emit("assistant", f"test plan for {conv_id} complete", None)


def _dims() -> dict[str, pa.Table]:
    td = tool_dim_rows()
    tool_dim = pa.table(
        {
            "tool": pa.array([r[0] for r in td], pa.string()),
            "category": pa.array([r[1] for r in td], pa.string()),
            "unit": pa.array([r[2] for r in td], pa.string()),
            "route_key": pa.array([r[3] for r in td], pa.string()),
        }
    )
    rd = role_dim_rows()
    role_dim = pa.table(
        {
            "role": pa.array([r[0] for r in rd], pa.string()),
            "role_group": pa.array([r[1] for r in rd], pa.string()),
            "weight": pa.array([r[2] for r in rd], pa.float64()),
        }
    )
    return {"tool_dim": tool_dim, "role_dim": role_dim}


def ensure(sf_name: str) -> str:
    """Generate (once) and return the synthdata dir for a scale name.

    transcripts are written as N_FILES part files (one parquet file would pin
    the scan to a single Spark task); dims are single files.
    """
    if sf_name not in SCALES:
        raise ValueError(f"unknown scale {sf_name!r}; known: {sorted(SCALES)}")
    out = os.path.join(SYNTH_ROOT, sf_name)
    meta_path = os.path.join(out, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            m = json.load(f)
            # n_files participates in the cache key: the file count caps scan
            # parallelism, so a split change must regenerate (content is a pure
            # function of the conv specs and does not depend on the split)
            if m.get("gen_version") == GEN_VERSION and m.get("n_files") == N_FILES[sf_name]:
                return out
    os.makedirs(out, exist_ok=True)
    # clear any prior transcripts output: a regeneration with fewer part files
    # (or a file<->directory shape change) must not leave stale parts behind
    tpath = os.path.join(out, "transcripts.parquet")
    if os.path.isdir(tpath):
        import shutil

        shutil.rmtree(tpath)
    elif os.path.exists(tpath):
        os.remove(tpath)
    rng = np.random.RandomState(SEED + _crc(sf_name) % 1000)
    pool = step_pool()
    changed = limit_changes_steps(pool)
    specs = _conv_specs(rng, SCALES[sf_name])
    n_files = N_FILES[sf_name]
    total_rows = 0
    if n_files == 1:
        buf = _Buf()
        for conv_id, i in specs:
            _gen_conv(rng, buf, conv_id, i, pool, changed)
        tbl = buf.table()
        total_rows = tbl.num_rows
        pq.write_table(tbl, os.path.join(out, "transcripts.parquet"))
    else:
        ddir = os.path.join(out, "transcripts.parquet")
        os.makedirs(ddir, exist_ok=True)
        per = (len(specs) + n_files - 1) // n_files
        buf = _Buf()
        part = 0
        for k, (conv_id, i) in enumerate(specs):
            _gen_conv(rng, buf, conv_id, i, pool, changed)
            if (k + 1) % per == 0 or k == len(specs) - 1:
                tbl = buf.table()
                total_rows += tbl.num_rows
                pq.write_table(tbl, os.path.join(ddir, f"part-{part:04d}.parquet"))
                buf = _Buf()
                part += 1
    for name, tbl in _dims().items():
        pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))
    with open(meta_path, "w") as f:
        json.dump({"gen_version": GEN_VERSION, "sf": sf_name, "rows": total_rows, "n_files": n_files}, f)
    return out


def synth_dir_for(sf_dir: str) -> str:
    """Map a driver sf dir (/root/testdata/sf0.01) to our synthdata dir. A
    dir that already holds a transcripts.parquet (e.g. the split-halves
    scaling experiment's symlink views, scripts/split_halves.py) is used
    as-is — driver testdata dirs never contain transcripts, so the mapping
    for them is unchanged."""
    if os.path.exists(os.path.join(sf_dir, "transcripts.parquet")):
        return sf_dir
    return ensure(os.path.basename(os.path.normpath(sf_dir)))


if __name__ == "__main__":
    import sys

    for sf in sys.argv[1:] or list(SCALES):
        d = ensure(sf)
        with open(os.path.join(d, "_meta.json")) as f:
            print(sf, json.load(f))


# ---------------------------------------------------------------- media ----

MEDIA_VERSION = 1
N_MEDIA = {"sf0.001": 60, "sf0.01": 300, "sf0.1": 1000, "sf1": 3000, "sf4": 3000}


def ensure_media(sf_name: str) -> str:
    """Deterministic multimodal table: opaque binary payloads + typed metadata.
    Independent versioning so transcripts need no regeneration."""
    import hashlib

    out = os.path.join(SYNTH_ROOT, sf_name)
    os.makedirs(out, exist_ok=True)
    meta_path = os.path.join(out, "_media_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f).get("media_version") == MEDIA_VERSION:
                return out
    n = N_MEDIA.get(sf_name, 60)
    ids, types, payloads, widths, heights, fpss, durs, srs = [], [], [], [], [], [], [], []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        size = 256 + (i * 37) % 2048
        # deterministic pseudo-payload: md5 chain
        chunks = []
        seed = f"media-{sf_name}-{i}".encode()
        while sum(len(c) for c in chunks) < size:
            seed = hashlib.md5(seed).digest()
            chunks.append(seed)
        payload = b"".join(chunks)[:size]
        ids.append(i)
        types.append(mt)
        payloads.append(payload)
        widths.append(64 + (i % 8) * 32 if mt in ("image", "video") else None)
        heights.append(64 + (i % 5) * 32 if mt in ("image", "video") else None)
        fpss.append(24 if mt == "video" else None)
        durs.append(round(1.0 + (i % 30) / 3.0, 2) if mt in ("audio", "video") else None)
        srs.append(16000 if mt == "audio" else None)
    tbl = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "fps": pa.array(fpss, pa.int32()),
            "duration_s": pa.array(durs, pa.float64()),
            "sample_rate": pa.array(srs, pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "media.parquet"))
    with open(meta_path, "w") as f:
        json.dump({"media_version": MEDIA_VERSION, "rows": n}, f)
    return out


DOCS_VERSION = 1
# the testdata documents vocabulary (31 query-language tokens), reproduced so
# synthesized tiers exercise the same tokenizer/shingle shapes
DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
DOC_LANGS = ["en", "de", "zh", "fr", "es"]
DOC_LANG_W = [0.41, 0.14, 0.15, 0.15, 0.15]  # en-heavy, like testdata sf0.1
N_DOCS = {"sf0.001": 60, "sf0.01": 600, "sf0.1": 6000, "sf1": 50000, "sf4": 200000}
# 12-token boilerplate on ~30% of docs: its word trigrams and char 8-gram
# fingerprints land in >10^4 docs at sf1 — far past MAX_SHINGLE_DF, so the
# df-caps must BIND at this tier, not merely exist
DOC_BOILER = "the fast scan filter join sort merge hash group window batch stream"


def ensure_documents(sf_name: str) -> str:
    """Deterministic `documents` table for scale tiers the driver testdata
    does not provide (testdata ships documents only to sf0.1; the sf1
    correctness sweep needs one — VERDICT r04 item 6). Same schema and shape
    as testdata documents (doc_id, text, lang, source, n_chars; 31-token
    vocabulary, 5 langs, 20 sources), plus the structures the sweep must
    stress: 2-6 per-doc rare tokens (SimHash signatures diverge, keeping the
    brute-force oracle's result set family-sized), planted near-dup families
    (single-token edit of the previous doc) and exact dups, and the
    boilerplate phrase above. Pure function of (sf_name, DOCS_VERSION)."""
    out = os.path.join(SYNTH_ROOT, sf_name)
    os.makedirs(out, exist_ok=True)
    meta_path = os.path.join(out, "_docs_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f).get("docs_version") == DOCS_VERSION:
                return out
    n = N_DOCS[sf_name]
    rng = np.random.default_rng(zlib.crc32(f"docs-{sf_name}-v{DOCS_VERSION}".encode()))
    texts: list[str] = []
    langs: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 0 and r < 0.005:  # exact duplicate of the previous doc
            texts.append(texts[-1])
            langs.append(langs[-1])
            continue
        if i > 0 and r < 0.08:  # near-dup family: one token swapped
            toks = texts[-1].split(" ")
            toks[int(rng.integers(0, len(toks)))] = DOC_VOCAB[int(rng.integers(0, 31))]
            texts.append(" ".join(toks))
            langs.append(langs[-1])
            continue
        length = int(rng.integers(30, 91))
        toks = [DOC_VOCAB[int(j)] for j in rng.integers(0, 31, size=length)]
        for _ in range(int(rng.integers(2, 7))):  # rare tokens separate docs
            toks[int(rng.integers(0, length))] = f"rt{int(rng.integers(0, n))}q{i % 97}"
        if rng.random() < 0.3:
            toks = DOC_BOILER.split(" ") + toks
        texts.append(" ".join(toks))
        langs.append(DOC_LANGS[int(rng.choice(5, p=DOC_LANG_W))])
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))
    with open(meta_path, "w") as f:
        json.dump({"docs_version": DOCS_VERSION, "rows": n}, f)
    return out


EMB_VERSION = 1
EMB_DIM = 64
N_EMB = {"sf1": 20_000}  # > IVF_K × 1024, so the semantic auto-sizing trigger BINDS
N_EMB_LABELS = 10
EMB_NEAR_DUP_EVERY = 40  # vec_id i ≡ 0 (mod 40), i ≥ 1000 → near-dup of i-1


def ensure_embeddings(sf_name: str) -> str:
    """Deterministic `embeddings` table for scale tiers the driver testdata
    does not provide (testdata ships embeddings only to sf0.1 / 2 000 rows;
    the r06 semantic-dedup proof needs a tier ABOVE the auto-sizing trigger
    n > IVF_K·target_bucket — VERDICT r05 item 1). Same schema as testdata
    embeddings (vec_id, embedding array<float>, label int; 64 dims, 10
    labels) and a similar similarity profile: weak label structure (mean
    intra-label cosine ≈ 0.05, so threshold-0.35 pair sets stay a planted
    minority, not all-pairs) plus planted near-dup pairs (~0.9 cosine, one
    every EMB_NEAR_DUP_EVERY ids past the centroid-seed range) for recall
    checks. Pure function of (sf_name, EMB_VERSION)."""
    out = os.path.join(SYNTH_ROOT, sf_name)
    os.makedirs(out, exist_ok=True)
    meta_path = os.path.join(out, "_emb_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f).get("emb_version") == EMB_VERSION:
                return out
    if sf_name not in N_EMB:
        # ADVICE r06: a bare KeyError named nothing — say which tiers this
        # synthesizer covers and where the smaller ones live instead
        raise ValueError(
            f"ensure_embeddings: no synthetic embeddings tier {sf_name!r} "
            f"(supported: {sorted(N_EMB)}); tiers up to sf0.1 ship in the "
            "driver testdata at /root/testdata/<sf>/embeddings.parquet"
        )
    n = N_EMB[sf_name]
    rng = np.random.default_rng(zlib.crc32(f"emb-{sf_name}-v{EMB_VERSION}".encode()))
    centers = rng.standard_normal((N_EMB_LABELS, EMB_DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n) % N_EMB_LABELS
    vecs = 0.1 * centers[labels] + 0.1 * rng.standard_normal((n, EMB_DIM))
    # planted near-dups: small perturbation of the previous vector (cos ≈ 0.9);
    # start past the fixed/trained centroid seed ids so seeds stay distinct
    for i in range(1000, n, EMB_NEAR_DUP_EVERY):
        vecs[i] = vecs[i - 1] + 0.035 * rng.standard_normal(EMB_DIM)
        labels[i] = labels[i - 1]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))
    with open(meta_path, "w") as f:
        json.dump({"emb_version": EMB_VERSION, "rows": n}, f)
    return out
