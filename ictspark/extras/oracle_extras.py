"""DuckDB oracle SQL for the training-data extras and driver-table operator
queries. `documents`/`embeddings`/`events`/TPC-H tables are pre-registered
views in the driver's DuckDB; media/transcripts are read by absolute path.
"""

from __future__ import annotations

from ictspark.extras.dedup import (
    LSH_R_AUTO,
    LSH_THRESHOLD,
    MAX_SHINGLE_DF,
    N_MINHASH_AUTO,
    N_SIMHASH_BITS,
    SIMHASH_MAX_HAMMING,
    WINNOW_MIN_SHARED,
)
from ictspark.extras.curation import MIX_BUDGET_TOKENS, PACK_WINDOW
from ictspark.extras.similarity import IVF_K, N_QUERIES, SEMANTIC_THRESHOLD
from ictspark.extras.textstats import LANG_PROFILES, STOPWORDS, TOKEN_RE

_TSF = "%Y-%m-%d %H:%M:%S"

_TOKS = """
toks AS (
  SELECT doc_id, pos, token FROM (
    SELECT doc_id,
           unnest(generate_series(1, len(string_split(lower(text), ' ')))) AS pos,
           unnest(string_split(lower(text), ' ')) AS token
    FROM documents
  ) WHERE token <> ''
)"""

_SHINGLES = _TOKS + f""",
sh_all AS (
  SELECT DISTINCT doc_id, token || ' ' || t1 || ' ' || t2 AS shingle FROM (
    SELECT doc_id, token,
           lead(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
           lead(token, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
    FROM toks
  ) WHERE t2 IS NOT NULL
),
sh AS (
  -- identical df-cap to dedup.shingles (MAX_SHINGLE_DF): boilerplate
  -- shingles above the cap never reach candidate generation in either engine
  SELECT doc_id, shingle FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh_all
  ) WHERE df <= {MAX_SHINGLE_DF}
)"""


_SHINGLES_UNCAPPED = _TOKS + """,
sh AS (
  -- NO df-cap: the incremental signature store freezes signatures at ingest,
  -- so they must be pure per-doc functions (extras/incremental.py) — the
  -- matching Spark path passes max_df=None
  SELECT DISTINCT doc_id, token || ' ' || t1 || ' ' || t2 AS shingle FROM (
    SELECT doc_id, token,
           lead(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
           lead(token, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
    FROM toks
  ) WHERE t2 IS NOT NULL
)"""


def _minhash_sig() -> str:
    # AUTO constants (r06): the graded no-kwargs Spark path derives
    # r/bands/k from LSH_THRESHOLD (dedup.minhash_rows_for/_bands_for) and
    # hashes via dedup.mh_coeffs' linear permutations of one md5 digest, so
    # the oracle interpolates the SAME derived values and coefficients — a
    # sizing or hash-family change on either side desyncs parity loudly
    from ictspark.extras.dedup import MH_PRIME, mh_coeffs

    cols = ", ".join(
        f"min(({a} * hi + {b} * lo + {c}) % {MH_PRIME}) AS mh{i}"
        for i, (a, b, c) in enumerate(mh_coeffs(N_MINHASH_AUTO))
    )
    return f"""hv AS (
  SELECT doc_id, v >> 30 AS hi, v & 1073741823 AS lo FROM (
    SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS v FROM sh
  )
),
sig AS (SELECT doc_id, {cols} FROM hv GROUP BY 1)"""


def _simhash_sig() -> str:
    """64-bit SimHash as two non-negative 32-bit halves (r04, matching
    dedup.simhash): low-half bit j = parity of hex nibble j of md5(token),
    high half from the '#hi'-salted md5. Halves avoid bit 63 entirely —
    DuckDB's `<<` overflow-checks and a signed construction would diverge."""
    half = 32
    bits = []
    for pref in ("hl", "hh"):
        for j in range(half):
            nib = f"(strpos('0123456789abcdef', substr({pref}, {j + 1}, 1)) - 1)"
            bits.append(
                f"CASE WHEN SUM(CASE WHEN {nib} % 2 = 1 THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS {pref}{j}"
            )
    lo = " + ".join(f"hl{j} * {2**j}" for j in range(half))
    hi = " + ".join(f"hh{j} * {2**j}" for j in range(half))
    return f"""
td AS (SELECT DISTINCT doc_id, token FROM toks),
th AS (SELECT doc_id, md5(token) AS hl, md5(token || '#hi') AS hh FROM td),
bits AS (SELECT doc_id, {", ".join(bits)} FROM th GROUP BY 1),
sig AS (SELECT doc_id, CAST({hi} AS BIGINT) AS sim_hi, CAST({lo} AS BIGINT) AS sim_lo FROM bits)"""


def _minhash_pairs_ctes() -> str:
    """CTE `scored`: est_jaccard for ALL doc pairs — the BRUTE-FORCE
    definition (r06, the SRP/simhash-oracle standard): with the auto sizer's
    r=1 single-hash bands, any pair with est ≥ θ > 0 shares ≥ ⌈θk⌉ ≥ 1
    minhash and is therefore a banded candidate, so the Spark LSH path must
    EQUAL the est-threshold-over-all-pairs definition — which is exactly
    what this oracle now states, independently of the banding algorithm.
    (The former oracle reproduced the banded candidate generation itself —
    same-algorithm-both-sides proves less.) Shared by minhash_lsh_pairs and
    the dedup_components/keep_list recursive ground truth."""
    assert LSH_R_AUTO == 1, (
        "brute oracle == banded path only holds for single-hash bands; "
        f"auto sizer moved to r={LSH_R_AUTO} — restate the oracle"
    )
    est = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(N_MINHASH_AUTO)
    )
    return f"""scored AS (
  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b,
         ROUND(({est}) / {float(N_MINHASH_AUTO)}, 4) AS est_jaccard
  FROM sig sa JOIN sig sb ON sa.doc_id < sb.doc_id
)"""


def extras_oracles(transcripts_path: str, media_path: str) -> dict[str, str]:
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    q: dict[str, str] = {}

    # LEFT JOIN + NULLIF (r06): a zero-token doc has no rows in the token
    # CTE — it must still appear with n_tokens=0 and NULL ratios, matching
    # the Spark side's try_divide row (an inner join silently dropped it)
    q["doc_stats"] = f"""
WITH {_TOKS},
agg AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(CASE WHEN token IN ({sw}) THEN 1 ELSE 0 END) AS BIGINT) AS sw
  FROM toks GROUP BY 1
)
SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(lower(d.text), '{TOKEN_RE}')) AS BIGINT) AS n_bpe_tokens,
       ROUND(a.sw * 1.0 / NULLIF(a.n_tokens, 0), 4) AS stopword_ratio,
       ROUND(length(d.text) * 1.0 / NULLIF(a.n_tokens, 0), 4) AS avg_token_len
FROM documents d LEFT JOIN agg a USING (doc_id)"""

    q["quality_score"] = f"""
WITH {_TOKS},
agg AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(CASE WHEN token IN ({sw}) THEN 1 ELSE 0 END) AS BIGINT) AS sw
  FROM toks GROUP BY 1
),
s AS (
  -- LEFT JOIN + NULLIF (r06): zero-token docs score 0.0 (NULL ratios fail
  -- both band predicates), matching Spark's try_divide path
  SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
         a.sw * 1.0 / NULLIF(a.n_tokens, 0) AS stopword_ratio,
         length(d.text) * 1.0 / NULLIF(a.n_tokens, 0) AS avg_token_len
  FROM documents d LEFT JOIN agg a USING (doc_id)
)
SELECT doc_id,
       ROUND(least(n_tokens / 50.0, 1.0) * 0.5
             + CASE WHEN stopword_ratio > 0.01 AND stopword_ratio < 0.6 THEN 0.3 ELSE 0.0 END
             + CASE WHEN avg_token_len > 3 AND avg_token_len < 12 THEN 0.2 ELSE 0.0 END,
             4) AS quality
FROM s"""

    q["fingerprint"] = """
SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents"""

    q["rolling_fingerprint"] = """
SELECT doc_id, MIN(md5(substr(text, CAST(p AS INT), 8))) AS rfp
FROM (
  SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS p
  FROM (SELECT doc_id, COALESCE(text, '') AS text FROM documents)
)
GROUP BY 1"""

    # shared winnowing-selection CTEs (one definition against the one Spark
    # copy in textstats.winnow_selected)
    _winnow_sel = """g AS (
  SELECT doc_id, p, md5(substr(text, CAST(p AS INT), 8)) AS h
  FROM (
    SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS p
    FROM (SELECT doc_id, COALESCE(text, '') AS text FROM documents)
  )
),
sel AS (
  SELECT DISTINCT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
  FROM g
)"""

    q["winnow_fingerprint"] = f"""
WITH {_winnow_sel}
SELECT doc_id, COUNT(*) AS n_fps,
       md5(string_agg(fp, ',' ORDER BY fp)) AS fp_digest
FROM sel GROUP BY 1"""

    q["winnow_reuse_pairs"] = f"""
WITH {_winnow_sel},
capped AS (
  SELECT doc_id, fp FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY fp) AS df FROM sel
  ) WHERE df <= {MAX_SHINGLE_DF}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {WINNOW_MIN_SHARED}"""

    q["unigram_logprob"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
),
t2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
freq AS (SELECT token, COUNT(*) AS n_tok FROM t2 GROUP BY 1),
tot AS (SELECT CAST(SUM(n_tok) AS DOUBLE) AS total FROM freq)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(AVG(ln(n_tok / (SELECT total FROM tot))), 6) AS avg_logprob
FROM t2 JOIN freq USING (token)
GROUP BY 1"""

    langs = sorted(LANG_PROFILES)

    def _count_sum(lang: str) -> str:
        terms = " + ".join(
            f"(length(lo) - length(replace(lo, '{bg}', ''))) / 2"
            for bg in LANG_PROFILES[lang]
        )
        return f"CAST({terms} AS BIGINT) AS n_{lang}"

    arms = []
    for lang in langs[:-1]:
        cond = " AND ".join(f"n_{lang} >= n_{o}" for o in langs if o != lang)
        arms.append(f"WHEN {cond} THEN '{lang}'")
    case = "CASE " + " ".join(arms) + f" ELSE '{langs[-1]}' END"
    q["lang_id"] = f"""
WITH lowered AS (SELECT doc_id, lang, lower(COALESCE(text, '')) AS lo FROM documents),
scored AS (SELECT doc_id, lang, {", ".join(_count_sum(lang) for lang in langs)} FROM lowered)
SELECT doc_id, lang, {case} AS lang_pred FROM scored"""

    q["dedup_exact"] = """
SELECT md5(lower(trim(text))) AS fp, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
FROM documents GROUP BY 1"""

    q["ngram_jaccard_pairs"] = f"""
WITH {_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(inter * 1.0 / (na.n_sh + nb.n_sh - inter), 4) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE ROUND(inter * 1.0 / (na.n_sh + nb.n_sh - inter), 4) >= 0.2"""

    q["minhash_lsh_pairs"] = f"""
WITH {_SHINGLES},
{_minhash_sig()},
{_minhash_pairs_ctes()}
SELECT * FROM scored WHERE est_jaccard >= {LSH_THRESHOLD}"""

    q["simhash_pairs"] = f"""
WITH {_TOKS},
{_simhash_sig()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sim_hi, b.sim_hi)) + bit_count(xor(a.sim_lo, b.sim_lo)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim_hi, b.sim_hi)) + bit_count(xor(a.sim_lo, b.sim_lo)) <= {SIMHASH_MAX_HAMMING}"""

    _NORM = """
e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, label, v, sqrt(list_inner_product(v, v)) AS norm FROM e)"""

    q["ann_bruteforce"] = f"""
WITH {_NORM},
pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         ROUND(list_inner_product(q.v, c.v) / (q.norm * c.norm), 6) AS sim
  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
)
SELECT q_id, c_id, sim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS INT) AS rank
  FROM pairs
) WHERE rank <= 5"""

    bucket = " || ".join(
        f"CASE WHEN v[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(8)
    )
    q["ann_bucketed"] = f"""
WITH {_NORM},
nb AS (SELECT *, {bucket} AS bucket FROM n),
cand AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         ROUND(list_inner_product(q.v, c.v) / (q.norm * c.norm), 6) AS sim
  FROM nb q JOIN nb c ON q.bucket = c.bucket AND q.vec_id < 10 AND q.vec_id <> c.vec_id
)
SELECT q_id, c_id, sim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS INT) AS rank
  FROM cand
) WHERE rank <= 3"""

    q["ann_ivf"] = f"""
WITH {_NORM},
cents AS (
  SELECT vec_id AS cent_id, v AS cv, norm AS cn FROM n
  WHERE vec_id >= 10 AND vec_id < 26
),
scored AS (
  SELECT n.vec_id, n.v, n.norm, c.cent_id,
         ROUND(list_inner_product(n.v, c.cv) / (n.norm * c.cn), 6) AS csim
  FROM n CROSS JOIN cents c
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS crank
  FROM scored
),
lists AS (SELECT vec_id AS c_id, v, norm, cent_id FROM ranked WHERE crank = 1),
probes AS (
  SELECT vec_id AS q_id, v AS qv, norm AS qn, cent_id
  FROM ranked WHERE vec_id < 10 AND crank <= 4
),
cand AS (
  SELECT p.q_id, l.c_id,
         ROUND(list_inner_product(p.qv, l.v) / (p.qn * l.norm), 6) AS sim
  FROM probes p JOIN lists l ON p.cent_id = l.cent_id AND p.q_id <> l.c_id
)
SELECT q_id, c_id, sim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS INT) AS rank
  FROM cand
) WHERE rank <= 3"""

    q["ann_multiprobe"] = f"""
WITH {_NORM},
nb AS (SELECT *, {bucket} AS bucket FROM n),
qp AS (SELECT vec_id AS q_id, v AS qv, norm AS qn, bucket FROM nb WHERE vec_id < 10),
probes AS (
  SELECT q_id, qv, qn,
         CASE WHEN i = 0 THEN bucket
              ELSE substr(bucket, 1, CAST(i AS INT) - 1)
                   || (CASE WHEN substr(bucket, CAST(i AS INT), 1) = '1' THEN '0' ELSE '1' END)
                   || substr(bucket, CAST(i AS INT) + 1)
         END AS bucket
  FROM qp, generate_series(0, 8) AS t(i)
),
cand AS (
  SELECT DISTINCT q_id, c.vec_id AS c_id,
         ROUND(list_inner_product(qv, c.v) / (qn * c.norm), 6) AS sim
  FROM probes p JOIN nb c ON p.bucket = c.bucket AND p.q_id <> c.vec_id
)
SELECT q_id, c_id, sim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS INT) AS rank
  FROM cand
) WHERE rank <= 3"""

    q["ann_quantized_rerank"] = f"""
WITH {_NORM},
nq AS (
  SELECT vec_id, v, norm,
         greatest(list_max(list_transform(v, x -> abs(x))) / 127.0, 1e-12) AS scale,
         {bucket} AS bucket
  FROM n
),
nqq AS (
  SELECT *, list_transform(v, x -> round(x / scale)) AS qv FROM nq
),
cand AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.v AS qfv, c.v AS cv,
         q.norm AS qn, c.norm AS cn,
         ROUND(list_inner_product(q.qv, c.qv) * q.scale * c.scale / (q.norm * c.norm), 6) AS qsim
  FROM nqq q JOIN nqq c ON q.bucket = c.bucket AND q.vec_id < 10 AND q.vec_id <> c.vec_id
),
short AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY qsim DESC, c_id) AS qrank
  FROM cand
)
SELECT q_id, c_id, approx_sim, sim, rank FROM (
  SELECT q_id, c_id, qsim AS approx_sim,
         ROUND(list_inner_product(qfv, cv) / (qn * cn), 6) AS sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY ROUND(list_inner_product(qfv, cv) / (qn * cn), 6) DESC, c_id) AS INT) AS rank
  FROM short WHERE qrank <= 8
) WHERE rank <= 3"""

    q["embedding_dup_pairs"] = f"""
WITH {_NORM}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_inner_product(a.v, b.v) / (a.norm * b.norm), 6) AS sim
FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND(list_inner_product(a.v, b.v) / (a.norm * b.norm), 6) >= 0.35"""

    q["embedding_quantize"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (
  SELECT vec_id, v, greatest(list_max(list_transform(v, x -> abs(x))) / 127.0, 1e-12) AS scale
  FROM e
),
qt AS (
  SELECT vec_id, v, scale,
         list_transform(v, x -> CAST(round(x / scale) AS INT)) AS qvec
  FROM s
)
SELECT vec_id, ROUND(scale, 6) AS scale,
       array_to_string(qvec, ',') AS qvec,
       ROUND(list_max(list_transform(range(1, len(v) + 1),
                                     i -> abs(v[i] - qvec[i] * scale))), 6) AS max_abs_err
FROM qt"""

    q["embedding_norm_stats"] = f"""
WITH {_NORM},
agg AS (
  SELECT label, COUNT(*) AS n, SUM(norm) AS s1, SUM(norm * norm) AS s2
  FROM n GROUP BY 1
),
stats AS (
  SELECT label, n, s1 / n AS mean_norm,
         sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0)) AS sd_norm
  FROM agg WHERE n > 1
)
SELECT n.label, MAX(s.n) AS n,
       ROUND(MAX(s.mean_norm), 6) AS mean_norm,
       ROUND(MAX(s.sd_norm), 6) AS sd_norm,
       CAST(SUM(CASE WHEN abs(n.norm - s.mean_norm) > 3 * s.sd_norm THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM n JOIN stats s ON n.label = s.label
GROUP BY 1"""

    q["media_dedup"] = f"""
SELECT md5(hex(payload)) AS fp, COUNT(*) AS n_copies,
       MIN(media_id) AS keeper, MIN(media_type) AS media_type
FROM read_parquet('{media_path}') GROUP BY 1"""

    q["media_stats"] = f"""
SELECT media_type, COUNT(*) AS n,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
       ROUND(AVG(octet_length(payload)), 4) AS avg_bytes,
       CAST(SUM(CASE WHEN width IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_dims
FROM read_parquet('{media_path}') GROUP BY 1"""

    q["frame_sample_plan"] = f"""
SELECT media_id, CAST(unnest(generate_series(0, n_frames - 1, 30)) AS INT) AS frame_idx
FROM (
  SELECT media_id, CAST(duration_s * fps AS INT) AS n_frames
  FROM read_parquet('{media_path}') WHERE media_type = 'video'
)"""

    # ----------------------------- curation ops -----------------------------

    # Ground-truth connected components via WITH RECURSIVE transitive closure
    # over the same LSH candidate edges — the Spark side iterates min-label
    # propagation, so a hash match proves the iteration converged to the true
    # partition.
    q["dedup_components"] = f"""
WITH RECURSIVE {_SHINGLES},
{_minhash_sig()},
{_minhash_pairs_ctes()},
e0 AS (SELECT doc_a, doc_b FROM scored WHERE est_jaccard >= {LSH_THRESHOLD}),
edges AS (SELECT doc_a, doc_b FROM e0 UNION SELECT doc_b, doc_a FROM e0),
reach AS (
  SELECT doc_id AS doc, doc_id AS r FROM documents
  UNION
  SELECT e.doc_a AS doc, reach.r FROM edges e JOIN reach ON reach.doc = e.doc_b
)
SELECT doc AS doc_id, MIN(r) AS component FROM reach GROUP BY 1"""

    q["dedup_keep_list"] = f"""
WITH RECURSIVE {_SHINGLES},
{_minhash_sig()},
{_minhash_pairs_ctes()},
e0 AS (SELECT doc_a, doc_b FROM scored WHERE est_jaccard >= {LSH_THRESHOLD}),
edges AS (SELECT doc_a, doc_b FROM e0 UNION SELECT doc_b, doc_a FROM e0),
reach AS (
  SELECT doc_id AS doc, doc_id AS r FROM documents
  UNION
  SELECT e.doc_a AS doc, reach.r FROM edges e JOIN reach ON reach.doc = e.doc_b
),
comp AS (SELECT doc AS doc_id, MIN(r) AS component FROM reach GROUP BY 1),
sizes AS (SELECT component, COUNT(*) AS n_members FROM comp GROUP BY 1)
SELECT doc_id, component, n_members, doc_id = component AS keep
FROM comp JOIN sizes USING (component)"""

    # incremental store ground truth (r07): IDENTICAL shape to dedup_keep_list
    # but over UNCAPPED shingles — the store's frozen signatures are pure
    # per-doc functions, and the oracle is corpus-one-shot (brute est over all
    # pairs + recursive closure), so the driver's hash match proves the
    # batched new-vs-stored ingest path equals the one-shot definition
    q["dedup_incremental"] = f"""
WITH RECURSIVE {_SHINGLES_UNCAPPED},
{_minhash_sig()},
{_minhash_pairs_ctes()},
e0 AS (SELECT doc_a, doc_b FROM scored WHERE est_jaccard >= {LSH_THRESHOLD}),
edges AS (SELECT doc_a, doc_b FROM e0 UNION SELECT doc_b, doc_a FROM e0),
reach AS (
  SELECT doc_id AS doc, doc_id AS r FROM documents
  UNION
  SELECT e.doc_a AS doc, reach.r FROM edges e JOIN reach ON reach.doc = e.doc_b
),
comp AS (SELECT doc AS doc_id, MIN(r) AS component FROM reach GROUP BY 1),
sizes AS (SELECT component, COUNT(*) AS n_members FROM comp GROUP BY 1)
SELECT doc_id, component, n_members, doc_id = component AS keep
FROM comp JOIN sizes USING (component)"""

    q["corpus_mix"] = """
WITH counts AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
mn AS (SELECT MIN(n_docs) AS min_docs FROM counts),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
  FROM documents
)
SELECT doc_id, r.lang, c.n_docs, (SELECT min_docs FROM mn) AS min_docs,
       rnk <= (SELECT min_docs FROM mn) AS keep
FROM ranked r JOIN counts c ON r.lang = c.lang"""

    # single-window ground truth for the two-phase token prefix sum; default
    # weights = uniform over the languages present (the Spark default)
    q["mixture_plan"] = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(COALESCE(len(list_filter(string_split(lower(text), ' '), t -> t <> '')), 0) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS mkey
  FROM documents
),
nl AS (SELECT CAST(COUNT(DISTINCT lang) AS DOUBLE) AS n_langs FROM documents),
c AS (
  SELECT doc_id, lang, n_tokens,
         -- CAST: DuckDB's windowed SUM promotes to HUGEINT (→ float64 in
         -- pandas); Spark stays BIGINT
         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY mkey, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
  FROM d
)
SELECT doc_id, lang, n_tokens,
       CAST(round((1.0 / (SELECT n_langs FROM nl)) * {MIX_BUDGET_TOKENS}) AS BIGINT) AS target_tokens,
       tokens_before,
       tokens_before < CAST(round((1.0 / (SELECT n_langs FROM nl)) * {MIX_BUDGET_TOKENS}) AS BIGINT) AS keep
FROM c"""

    # r07: the subword-budget variant — same single-window plan as
    # mixture_plan but n_tokens = the deterministic BPE-ish approximation
    # (textstats.subword_count_col): letter runs ceil(len/4), digit runs
    # ceil(len/3), every other glyph (incl. each CJK char) 1
    _SUBWORD = (
        f"CAST(COALESCE(list_sum(list_transform(regexp_extract_all(lower(text), "
        f"'{TOKEN_RE}'), p -> CASE WHEN regexp_matches(p, '^[a-z]') THEN (len(p) + 3) // 4 "
        f"WHEN regexp_matches(p, '^[0-9]') THEN (len(p) + 2) // 3 ELSE 1 END)), 0) AS BIGINT)"
    )
    q["mixture_plan_subword"] = f"""
WITH d AS (
  SELECT doc_id, lang,
         {_SUBWORD} AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS mkey
  FROM documents
),
nl AS (SELECT CAST(COUNT(DISTINCT lang) AS DOUBLE) AS n_langs FROM documents),
c AS (
  SELECT doc_id, lang, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY mkey, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
  FROM d
)
SELECT doc_id, lang, n_tokens,
       CAST(round((1.0 / (SELECT n_langs FROM nl)) * {MIX_BUDGET_TOKENS}) AS BIGINT) AS target_tokens,
       tokens_before,
       tokens_before < CAST(round((1.0 / (SELECT n_langs FROM nl)) * {MIX_BUDGET_TOKENS}) AS BIGINT) AS keep
FROM c"""

    # sh_all (uncapped), not sh: the bench side is DISTINCT so the join is
    # linear regardless of shingle df — and mass contamination (a benchmark
    # shingle in >cap training docs) must stay visible (ADVICE r03)
    q["contamination_check"] = f"""
WITH {_SHINGLES},
bench AS (SELECT DISTINCT shingle FROM sh_all WHERE doc_id < 25),
train AS (SELECT * FROM sh_all WHERE doc_id >= 25),
hits AS (SELECT doc_id, COUNT(*) AS n FROM train JOIN bench USING (shingle) GROUP BY 1)
SELECT d.doc_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared_shingles,
       COALESCE(h.n, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id >= 25) d
LEFT JOIN hits h ON d.doc_id = h.doc_id"""

    from ictspark.extras.textstats import (
        GOPHER_MAX_BULLET_FRAC,
        GOPHER_MAX_DUP_LINE_FRAC,
        GOPHER_MAX_DUP_PARA_FRAC,
        GOPHER_MAX_ELLIPSIS_FRAC,
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_STOPWORD_HITS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
    )

    gsw = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)

    def _gopher_ctes(src: str, pfx: str) -> str:
        """The full Rae et al. 2021 §A1.1 battery over table ``src`` as CTEs
        ending in ``{pfx}`` (doc_id, values, flags, pass_gopher). ONE
        definition shared by the standalone gopher_rules oracle and the
        gopher-enabled manifest chains — two hand-copies of ten rule
        expressions would silently diverge (the r09 refactor rule)."""
        return f"""{pfx}_g AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), w -> w <> '') AS words,
    list_filter(string_split(coalesce(text, ''), chr(10)), l -> trim(l) <> '') AS lines,
    list_filter(string_split(coalesce(text, ''), chr(10) || chr(10)), p -> trim(p) <> '') AS paras,
    len(regexp_extract_all(coalesce(text, ''), '#|\\.\\.\\.')) AS n_sym
  FROM {src}
),
{pfx}_v AS (
  SELECT doc_id,
    CAST(len(words) AS BIGINT) AS n_words,
    ROUND(list_sum(list_transform(words, w -> length(w))) * 1.0 / NULLIF(len(words), 0), 4) AS mean_word_len,
    ROUND(n_sym * 1.0 / NULLIF(len(words), 0), 4) AS symbol_word_ratio,
    ROUND(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) * 1.0
          / NULLIF(len(lines), 0), 4) AS bullet_line_frac,
    ROUND(len(list_filter(lines, l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…'))) * 1.0
          / NULLIF(len(lines), 0), 4) AS ellipsis_line_frac,
    ROUND(len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) * 1.0
          / NULLIF(len(words), 0), 4) AS alpha_word_frac,
    CAST(len(list_filter([{gsw}], s -> list_contains(words, s))) AS BIGINT) AS stopword_hits,
    ROUND((len(lines) - len(list_distinct(lines))) * 1.0 / NULLIF(len(lines), 0), 4) AS dup_line_frac,
    ROUND((len(paras) - len(list_distinct(paras))) * 1.0 / NULLIF(len(paras), 0), 4) AS dup_para_frac
  FROM {pfx}_g
),
{pfx} AS (
  SELECT *,
    (pass_word_count AND pass_mean_word_len AND pass_symbol_ratio AND pass_bullet
     AND pass_ellipsis AND pass_alpha AND pass_stopwords AND pass_dup_lines
     AND pass_dup_paras) AS pass_gopher
  FROM (
    SELECT *,
      COALESCE(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}, FALSE) AS pass_word_count,
      COALESCE(mean_word_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN} AND {GOPHER_MAX_MEAN_WORD_LEN}, FALSE) AS pass_mean_word_len,
      COALESCE(symbol_word_ratio <= {GOPHER_MAX_SYMBOL_RATIO}, FALSE) AS pass_symbol_ratio,
      COALESCE(bullet_line_frac <= {GOPHER_MAX_BULLET_FRAC}, FALSE) AS pass_bullet,
      COALESCE(ellipsis_line_frac <= {GOPHER_MAX_ELLIPSIS_FRAC}, FALSE) AS pass_ellipsis,
      COALESCE(alpha_word_frac >= {GOPHER_MIN_ALPHA_FRAC}, FALSE) AS pass_alpha,
      stopword_hits >= {GOPHER_MIN_STOPWORD_HITS} AS pass_stopwords,
      COALESCE(dup_line_frac <= {GOPHER_MAX_DUP_LINE_FRAC}, FALSE) AS pass_dup_lines,
      COALESCE(dup_para_frac <= {GOPHER_MAX_DUP_PARA_FRAC}, FALSE) AS pass_dup_paras
    FROM {pfx}_v
  )
)"""

    q["gopher_rules"] = f"""
WITH {_gopher_ctes("documents", "gr")}
SELECT * FROM gr"""

    # paragraph_dedup (r09): the Spark side keeps the globally-min
    # (doc_id, para_idx) occurrence per trimmed-paragraph hash via one
    # min-struct agg; DuckDB states the same lexicographic minimum as two
    # grouped mins (min doc_id per hash, then min para_idx within it)
    q["paragraph_dedup"] = """
WITH segs AS (
  SELECT doc_id,
         unnest(string_split(COALESCE(text, ''), chr(10) || chr(10))) AS para,
         unnest(generate_series(1, len(string_split(COALESCE(text, ''), chr(10) || chr(10))))) - 1 AS para_idx
  FROM documents
),
content AS (
  SELECT doc_id, para_idx, para,
         md5(regexp_replace(para, '^\\s+|\\s+$', '', 'g')) AS h
  FROM segs WHERE regexp_replace(para, '^\\s+|\\s+$', '', 'g') <> ''
),
f1 AS (SELECT h, MIN(doc_id) AS fdoc FROM content GROUP BY 1),
f2 AS (
  SELECT c.h, f1.fdoc, MIN(c.para_idx) AS fidx
  FROM content c JOIN f1 ON c.h = f1.h AND c.doc_id = f1.fdoc
  GROUP BY 1, 2
),
m AS (
  SELECT c.doc_id, c.para_idx, c.para,
         (c.doc_id = f2.fdoc AND c.para_idx = f2.fidx) AS kept
  FROM content c JOIN f2 USING (h)
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_paras,
         CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
         COALESCE(string_agg(para, chr(10) || chr(10) ORDER BY para_idx)
                  FILTER (WHERE kept), '') AS new_text
  FROM m GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_paras, 0) AS BIGINT) AS n_paras,
       CAST(COALESCE(a.n_removed, 0) AS BIGINT) AS n_removed,
       ROUND(a.n_removed * 1.0 / NULLIF(a.n_paras, 0), 4) AS removed_para_frac,
       COALESCE(a.new_text, '') AS new_text
FROM documents d LEFT JOIN agg a USING (doc_id)"""

    # paragraph_dedup_incremental (r09): the store's N-batch ingest must
    # equal the one-shot definition over the union corpus — same SQL; the
    # hash match is what proves the journaled-store path
    q["paragraph_dedup_incremental"] = q["paragraph_dedup"]

    # repeated_ngram_spans (r09): k=8 token-gram spans, keeper = global
    # lexicographic-min (doc_id, s) per k-gram (two grouped mins, the
    # paragraph_dedup shape); islands-and-gaps merges covered ranges
    # (break when s - prev > k, the Spark interval-merge condition)
    q["repeated_ngram_spans"] = """
WITH raw AS (
  SELECT doc_id,
         unnest(string_split_regex(COALESCE(text, ''), '\\s+')) AS token,
         unnest(generate_series(1, len(string_split_regex(COALESCE(text, ''), '\\s+')))) AS rp
  FROM documents
),
toks AS (
  SELECT doc_id, token,
         row_number() OVER (PARTITION BY doc_id ORDER BY rp) - 1 AS pos
  FROM raw WHERE token <> ''
),
arr AS (
  SELECT doc_id, list(token ORDER BY pos) AS tl, COUNT(*) AS n
  FROM toks GROUP BY 1
),
occs AS (
  SELECT a.doc_id, u.s,
         md5(array_to_string(a.tl[CAST(u.s AS INT) + 1 : CAST(u.s AS INT) + 8], ' ')) AS h
  FROM arr a, unnest(generate_series(0, a.n - 8)) AS u(s)
  WHERE a.n >= 8
),
f1 AS (SELECT h, MIN(doc_id) AS fdoc, COUNT(*) AS cnt FROM occs GROUP BY 1),
f2 AS (
  SELECT o.h, f1.fdoc, MIN(o.s) AS fs, MAX(f1.cnt) AS cnt
  FROM occs o JOIN f1 ON o.h = f1.h AND o.doc_id = f1.fdoc
  GROUP BY 1, 2
),
dup AS (
  SELECT o.doc_id, o.s FROM occs o JOIN f2 USING (h)
  WHERE f2.cnt >= 2 AND NOT (o.doc_id = f2.fdoc AND o.s = f2.fs)
),
isl AS (
  SELECT doc_id, s,
         SUM(CASE WHEN prev IS NULL OR s > prev + 8 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s) AS g
  FROM (SELECT doc_id, s,
               lag(s) OVER (PARTITION BY doc_id ORDER BY s) AS prev FROM dup)
),
spans AS (
  SELECT doc_id, MIN(s) AS lo, MAX(s) + 8 - 1 AS hi
  FROM isl GROUP BY doc_id, g
),
rem AS (SELECT doc_id, SUM(hi - lo + 1) AS removed FROM spans GROUP BY 1),
ka AS (
  SELECT t.doc_id, string_agg(t.token, ' ' ORDER BY t.pos) AS new_text
  FROM toks t
  WHERE NOT EXISTS (
    SELECT 1 FROM spans sp
    WHERE sp.doc_id = t.doc_id AND t.pos BETWEEN sp.lo AND sp.hi)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(r.removed, 0) AS BIGINT) AS removed_tokens,
       ROUND(COALESCE(r.removed, 0) * 1.0 / NULLIF(COALESCE(a.n, 0), 0), 4) AS removed_frac,
       COALESCE(ka.new_text, '') AS new_text
FROM documents d
LEFT JOIN arr a USING (doc_id)
LEFT JOIN rem r USING (doc_id)
LEFT JOIN ka USING (doc_id)"""

    # decontaminate_fuzzy (r09): doc-level MinHash est-Jaccard vs the
    # benchmark split (bench = doc_id < 25, train = rest). Signatures are
    # UNCAPPED (max_df=None — a contamination verdict must not depend on
    # train-corpus shingle frequencies); single-hash bands (r=1 at the
    # production threshold) make the banded Spark plan EQUAL the
    # brute-force cross-side definition stated here
    _fz_est = " + ".join(
        f"CASE WHEN t.mh{i} = b.mh{i} THEN 1 ELSE 0 END"
        for i in range(N_MINHASH_AUTO)
    )

    # repeated_ngram_spans_incremental (r09): the span store's N-batch
    # ingest must converge on the ONE-SHOT definition over the union —
    # identical oracle, k=8 pinned both sides (extras/incr_spans.py)
    q["repeated_ngram_spans_incremental"] = q["repeated_ngram_spans"]

    q["decontaminate_fuzzy"] = f"""
WITH {_SHINGLES_UNCAPPED},
{_minhash_sig()},
scored AS (
  SELECT t.doc_id AS t_id, ({_fz_est}) / {float(N_MINHASH_AUTO)} AS est
  FROM sig t JOIN sig b ON t.doc_id >= 25 AND b.doc_id < 25
),
hits AS (
  SELECT t_id, CAST(COUNT(*) AS BIGINT) AS n_bench_hits,
         ROUND(MAX(est), 4) AS max_est
  FROM scored WHERE est >= {LSH_THRESHOLD} GROUP BY 1
)
SELECT d.doc_id, CAST(COALESCE(h.n_bench_hits, 0) AS BIGINT) AS n_bench_hits,
       h.max_est, COALESCE(h.n_bench_hits, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id >= 25) d
LEFT JOIN hits h ON d.doc_id = h.t_id"""

    # decontaminate_spans (r09): k=8 spans covered by ANY benchmark k-gram
    # (bench = doc_id < 25, train = rest — the contamination_check
    # convention); same islands merge as repeated_ngram_spans, no keeper
    q["decontaminate_spans"] = """
WITH raw AS (
  SELECT doc_id,
         unnest(string_split_regex(COALESCE(text, ''), '\\s+')) AS token,
         unnest(generate_series(1, len(string_split_regex(COALESCE(text, ''), '\\s+')))) AS rp
  FROM documents
),
toks AS (
  SELECT doc_id, token,
         row_number() OVER (PARTITION BY doc_id ORDER BY rp) - 1 AS pos
  FROM raw WHERE token <> ''
),
arr AS (
  SELECT doc_id, list(token ORDER BY pos) AS tl, COUNT(*) AS n
  FROM toks GROUP BY 1
),
occs AS (
  SELECT a.doc_id, u.s,
         md5(array_to_string(a.tl[CAST(u.s AS INT) + 1 : CAST(u.s AS INT) + 8], ' ')) AS h
  FROM arr a, unnest(generate_series(0, a.n - 8)) AS u(s)
  WHERE a.n >= 8
),
bench AS (SELECT DISTINCT h FROM occs WHERE doc_id < 25),
hit AS (
  SELECT o.doc_id, o.s FROM occs o JOIN bench USING (h) WHERE o.doc_id >= 25
),
isl AS (
  SELECT doc_id, s,
         SUM(CASE WHEN prev IS NULL OR s > prev + 8 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s) AS g
  FROM (SELECT doc_id, s,
               lag(s) OVER (PARTITION BY doc_id ORDER BY s) AS prev FROM hit)
),
spans AS (
  SELECT doc_id, MIN(s) AS lo, MAX(s) + 8 - 1 AS hi
  FROM isl GROUP BY doc_id, g
),
rem AS (SELECT doc_id, SUM(hi - lo + 1) AS removed FROM spans GROUP BY 1),
ka AS (
  SELECT t.doc_id, string_agg(t.token, ' ' ORDER BY t.pos) AS new_text
  FROM toks t
  WHERE t.doc_id >= 25 AND NOT EXISTS (
    SELECT 1 FROM spans sp
    WHERE sp.doc_id = t.doc_id AND t.pos BETWEEN sp.lo AND sp.hi)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(r.removed, 0) AS BIGINT) AS removed_tokens,
       ROUND(COALESCE(r.removed, 0) * 1.0 / NULLIF(COALESCE(a.n, 0), 0), 4) AS removed_frac,
       COALESCE(ka.new_text, '') AS new_text
FROM (SELECT doc_id FROM documents WHERE doc_id >= 25) d
LEFT JOIN arr a USING (doc_id)
LEFT JOIN rem r USING (doc_id)
LEFT JOIN ka USING (doc_id)"""

    # dsir_weights (r09, Xie et al. 2023): hashed unigram+bigram importance
    # log-ratios, target = doc_id%5==0 split, 4096 md5-prefix buckets (the
    # '0x'||substr(md5,.) idiom); ln() not log() — DuckDB log is base 10
    q["dsir_weights"] = f"""
WITH {_TOKS},
feats AS (
  SELECT doc_id, CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 4096 AS b
  FROM toks
  UNION ALL
  SELECT doc_id,
         CAST('0x' || substr(md5(token || ' ' || t2), 1, 8) AS BIGINT) % 4096 AS b
  FROM (SELECT doc_id, token,
               lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
        FROM toks)
  WHERE t2 IS NOT NULL
),
tfe AS (SELECT * FROM feats WHERE doc_id % 5 = 0),
rfe AS (SELECT * FROM feats WHERE doc_id % 5 <> 0),
tc AS (SELECT b, COUNT(*) AS ct FROM tfe GROUP BY 1),
rc AS (SELECT b, COUNT(*) AS cr FROM rfe GROUP BY 1),
tt AS (SELECT COUNT(*) * 1.0 AS tt FROM tfe),
rt AS (SELECT COUNT(*) * 1.0 AS rt FROM rfe),
ratio AS (
  SELECT COALESCE(tc.b, rc.b) AS b,
         ln((COALESCE(ct, 0) + 1.0) / (tt + 4096))
         - ln((COALESCE(cr, 0) + 1.0) / (rt + 4096)) AS lr
  FROM tc FULL OUTER JOIN rc ON tc.b = rc.b, tt, rt
)
SELECT r.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats, ROUND(SUM(lr), 6) AS logw
FROM rfe r JOIN ratio USING (b)
GROUP BY 1"""

    # dsir_weights_incremental (r09): the journaled store's N-batch ingest
    # must converge on the ONE-SHOT definition over the union raw corpus —
    # identical oracle, identical split convention (extras/incr_dsir.py)
    q["dsir_weights_incremental"] = q["dsir_weights"]

    # dsir_select (r09): the selection half — rank by length-normalized
    # importance (logw/n_feats), keep the token-budgeted prefix with
    # mixture_plan's begin-boundary semantics. The oracle's single global
    # window IS the semantics; the engine's two-phase score-bucket prefix
    # must hash-match it exactly
    q["dsir_select"] = f"""
WITH {_TOKS},
feats AS (
  SELECT doc_id, CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 4096 AS b
  FROM toks
  UNION ALL
  SELECT doc_id,
         CAST('0x' || substr(md5(token || ' ' || t2), 1, 8) AS BIGINT) % 4096 AS b
  FROM (SELECT doc_id, token,
               lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
        FROM toks)
  WHERE t2 IS NOT NULL
),
tfe AS (SELECT * FROM feats WHERE doc_id % 5 = 0),
rfe AS (SELECT * FROM feats WHERE doc_id % 5 <> 0),
tc AS (SELECT b, COUNT(*) AS ct FROM tfe GROUP BY 1),
rc AS (SELECT b, COUNT(*) AS cr FROM rfe GROUP BY 1),
tt AS (SELECT COUNT(*) * 1.0 AS tt FROM tfe),
rt AS (SELECT COUNT(*) * 1.0 AS rt FROM rfe),
ratio AS (
  SELECT COALESCE(tc.b, rc.b) AS b,
         ln((COALESCE(ct, 0) + 1.0) / (tt + 4096))
         - ln((COALESCE(cr, 0) + 1.0) / (rt + 4096)) AS lr
  FROM tc FULL OUTER JOIN rc ON tc.b = rc.b, tt, rt
),
wts AS (
  SELECT r.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats, ROUND(SUM(lr), 6) AS logw
  FROM rfe r JOIN ratio USING (b)
  GROUP BY 1
),
ntok AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM toks
  WHERE doc_id % 5 <> 0 GROUP BY 1
),
scored AS (
  SELECT w.doc_id, w.n_feats, w.logw, ROUND(w.logw / w.n_feats, 6) AS score,
         n.n_tokens
  FROM wts w JOIN ntok n USING (doc_id)
)
SELECT doc_id, n_feats, logw, score, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS tokens_before,
       COALESCE(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) < 2000
         AS keep
FROM scored"""


    # dsir_select_incremental (r09): the store's standing selection must
    # converge on the ONE-SHOT dsir_select over the union (extras/incr_dsir
    # select_read derives ws token counts integer-exactly from n_feats)
    q["dsir_select_incremental"] = q["dsir_select"]

    q["repetition_score"] = f"""
WITH {_TOKS},
tri AS (
  SELECT doc_id, token || ' ' || t1 || ' ' || t2 AS tri FROM (
    SELECT doc_id, token,
           lead(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
           lead(token, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
    FROM toks
  ) WHERE t2 IS NOT NULL
),
per AS (SELECT doc_id, tri, COUNT(*) AS n FROM tri GROUP BY 1, 2)
SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_trigrams,
       CAST(MAX(n) AS BIGINT) AS max_trigram_n,
       ROUND(MAX(n) * 1.0 / SUM(n), 4) AS repetition
FROM per GROUP BY 1"""

    q["stratified_sample"] = """
SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'"""

    q["top_terms_per_lang"] = """
WITH toks AS (
  SELECT lang, unnest(string_split(lower(text), ' ')) AS token FROM documents
),
t2 AS (SELECT lang, token FROM toks WHERE token <> ''),
tf AS (SELECT lang, token, COUNT(*) AS tf FROM t2 GROUP BY 1, 2),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
nl AS (SELECT COUNT(DISTINCT lang) AS n FROM documents),
scored AS (
  SELECT lang, token, tf, df,
         ROUND(tf * ln((SELECT n FROM nl) * 1.0 / df), 6) AS tfidf
  FROM tf JOIN df USING (token)
)
SELECT lang, token, tf, df, tfidf, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY tfidf DESC, token) AS INT) AS rank
  FROM scored
) WHERE rank <= 5"""

    q["length_percentiles"] = """
WITH d AS (SELECT lang, length(COALESCE(text, '')) AS n_chars, doc_id FROM documents),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM d
)
SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
       MAX(CASE WHEN rnk = CAST(ceil(0.50 * n) AS BIGINT) THEN n_chars END) AS p50,
       MAX(CASE WHEN rnk = CAST(ceil(0.90 * n) AS BIGINT) THEN n_chars END) AS p90,
       MAX(CASE WHEN rnk = CAST(ceil(0.99 * n) AS BIGINT) THEN n_chars END) AS p99
FROM r GROUP BY 1"""

    from ictspark.extras.curation import EMAIL_RE, URL_RE

    q["scrub_stats"] = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{URL_RE}')) AS BIGINT) AS n_urls,
       md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'), '{URL_RE}', '<URL>', 'g')) AS scrubbed_fp,
       regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'), '{URL_RE}', '<URL>', 'g') <> text AS was_scrubbed
FROM documents"""

    # The mapInPandas featurizer's (stubbed) fake decode is deterministic —
    # byte count + quantized byte mean — so it is DuckDB-expressible: extract
    # byte values from hex(payload), identical floor-quantization on both
    # sides (was rows-only in r01).
    q["media_featurize"] = f"""
WITH m AS (
  SELECT media_id, media_type, hex(payload) AS h, octet_length(payload) AS n
  FROM read_parquet('{media_path}')
),
b AS (
  SELECT media_id, media_type, n, h,
         unnest(generate_series(1, n)) AS i
  FROM m
),
s AS (
  SELECT media_id,
         SUM((strpos('0123456789ABCDEF', substr(h, 2*i-1, 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(h, 2*i, 1)) - 1) AS total
  FROM b GROUP BY 1
)
SELECT m.media_id, m.media_type, CAST(m.n AS BIGINT) AS n_bytes,
       CASE WHEN m.n = 0 THEN 0.0
            ELSE floor(s.total * 1.0 / m.n * 10000 + 0.5) / 10000 END AS byte_mean
FROM m LEFT JOIN s ON m.media_id = s.media_id"""

    # ------------------------- driver-table operator queries -------------------------

    q["events_hourly"] = f"""
SELECT strftime(date_trunc('hour', ts), '{_TSF}') AS hour, event_type,
       COUNT(*) AS n, ROUND(CAST(SUM(value) AS DOUBLE), 2) AS sum_value
FROM events GROUP BY 1, 2"""

    q["events_shift_buckets"] = """
SELECT CASE WHEN EXTRACT(hour FROM ts) >= 6 AND EXTRACT(hour FROM ts) < 14 THEN 'shift_a'
            WHEN EXTRACT(hour FROM ts) >= 14 AND EXTRACT(hour FROM ts) < 22 THEN 'shift_b'
            ELSE 'shift_c' END AS shift,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events GROUP BY 1"""

    q["events_day_0600"] = f"""
SELECT strftime(date_trunc('day', ts - INTERVAL 6 HOUR), '%Y-%m-%d') AS shifted_day,
       COUNT(*) AS n
FROM events GROUP BY 1"""

    q["tpch_q1like"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
       ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem GROUP BY 1, 2"""

    q["events_sessionize"] = f"""
WITH m AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_no
  FROM m
)
SELECT user_id, sess_no, COUNT(*) AS n_events,
       strftime(MIN(ts), '{_TSF}') AS sess_start,
       strftime(MAX(ts), '{_TSF}') AS sess_end
FROM s GROUP BY 1, 2"""

    q["tpch_q5like"] = """
SELECT n_name,
       ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1"""

    q["parts_by_brand"] = """
SELECT p_brand, COUNT(*) AS n_items,
       ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
       ROUND(AVG(p_retailprice), 2) AS avg_retail
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1"""

    q["top_customers"] = """
SELECT c_custkey, c_name, ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS revenue,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
ORDER BY revenue DESC, c_custkey
LIMIT 10"""

    q["bigram_logprob"] = f"""
WITH {_TOKS},
b2 AS (
  SELECT doc_id, t1, t2 FROM (
    SELECT doc_id, token AS t1,
           lead(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
    FROM toks
  ) WHERE t2 IS NOT NULL
),
uni AS (SELECT token AS t1, COUNT(*) AS c1 FROM toks GROUP BY 1),
big AS (SELECT t1, t2, COUNT(*) AS c2 FROM b2 GROUP BY 1, 2),
v AS (SELECT CAST(COUNT(DISTINCT token) AS DOUBLE) AS vsize FROM toks)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(AVG(ln((c2 + 1.0) / (c1 + (SELECT vsize FROM v)))), 6) AS avg_logprob
FROM b2 JOIN big USING (t1, t2) JOIN uni USING (t1)
GROUP BY 1"""

    # Held-out-reference LM scoring (r07): model tables from the doc_id%5==0
    # reference split, scored side = the rest; LEFT joins + COALESCE state
    # the add-one smoothing for bigrams/unigrams the reference never saw —
    # the defined-on-unseen property self-scoring never exercises
    q["lm_score_reference"] = """
WITH rtoks AS (
  SELECT doc_id, pos, token FROM (
    SELECT doc_id,
           unnest(generate_series(1, len(string_split(lower(text), ' ')))) AS pos,
           unnest(string_split(lower(text), ' ')) AS token
    FROM documents WHERE doc_id % 5 = 0
  ) WHERE token <> ''
),
stoks AS (
  SELECT doc_id, pos, token FROM (
    SELECT doc_id,
           unnest(generate_series(1, len(string_split(lower(text), ' ')))) AS pos,
           unnest(string_split(lower(text), ' ')) AS token
    FROM documents WHERE doc_id % 5 <> 0
  ) WHERE token <> ''
),
runi AS (SELECT token AS t1, COUNT(*) AS c1 FROM rtoks GROUP BY 1),
rbig AS (
  SELECT t1, t2, COUNT(*) AS c2 FROM (
    SELECT token AS t1, lead(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
    FROM rtoks
  ) WHERE t2 IS NOT NULL GROUP BY 1, 2
),
rv AS (SELECT CAST(COUNT(DISTINCT token) AS DOUBLE) AS vsize FROM rtoks),
sb AS (
  SELECT doc_id, t1, t2 FROM (
    SELECT doc_id, token AS t1,
           lead(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
    FROM stoks
  ) WHERE t2 IS NOT NULL
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(AVG(ln((COALESCE(c2, 0) + 1.0) / (COALESCE(c1, 0) + (SELECT vsize FROM rv)))), 6) AS avg_logprob
FROM sb LEFT JOIN rbig USING (t1, t2) LEFT JOIN runi USING (t1)
GROUP BY 1"""

    # NB quality classifier (r08): multinomial NB trained on the %5==0
    # (clean) and reversed-%5==1 (noisy) splits, scoring the %5>=2 rest;
    # equal priors, add-one smoothing over the JOINT training vocabulary
    q["nb_quality_score"] = """
WITH ctoks AS (
  SELECT token FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS token
    FROM documents WHERE doc_id % 5 = 0
  ) WHERE token <> ''
),
ntoks AS (
  SELECT token FROM (
    SELECT unnest(string_split(reverse(lower(text)), ' ')) AS token
    FROM documents WHERE doc_id % 5 = 1
  ) WHERE token <> ''
),
cc AS (SELECT token, COUNT(*) AS c_clean FROM ctoks GROUP BY 1),
nc AS (SELECT token, COUNT(*) AS c_noisy FROM ntoks GROUP BY 1),
model AS (
  SELECT COALESCE(cc.token, nc.token) AS token,
         COALESCE(c_clean, 0) AS c_clean, COALESCE(c_noisy, 0) AS c_noisy
  FROM cc FULL OUTER JOIN nc ON cc.token = nc.token
),
tot AS (
  SELECT CAST(SUM(c_clean) AS DOUBLE) AS n_clean,
         CAST(SUM(c_noisy) AS DOUBLE) AS n_noisy,
         CAST(COUNT(*) AS DOUBLE) AS vsize
  FROM model
),
stoks AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
    FROM documents WHERE doc_id % 5 >= 2
  ) WHERE token <> ''
),
scored AS (
  SELECT s.doc_id,
         ln((COALESCE(m.c_clean, 0) + 1.0) / (t.n_clean + t.vsize))
         - ln((COALESCE(m.c_noisy, 0) + 1.0) / (t.n_noisy + t.vsize)) AS llr
  FROM stoks s LEFT JOIN model m USING (token) CROSS JOIN tot t
)
SELECT doc_id, COUNT(*) AS n_tokens, ROUND(AVG(llr), 6) AS avg_llr,
       ROUND(AVG(llr), 6) > 0 AS pred_clean
FROM scored GROUP BY 1"""

    # SemDeDup (cluster-blocked semantic dedup): the fixed-subset coarse
    # quantizer makes the assignment — and therefore the whole operator —
    # bit-reproducible in SQL (same CTE skeleton as ann_ivf's lists)
    _SEM_ASSIGN = f"""{_NORM},
cents AS (
  SELECT vec_id AS cent_id, v AS cv, norm AS cn FROM n
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + IVF_K}
),
scored AS (
  SELECT n.vec_id, n.v, n.norm, c.cent_id,
         ROUND(list_inner_product(n.v, c.cv) / (n.norm * c.cn), 6) AS csim
  FROM n CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, v, norm, cent_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
sempairs AS (
  SELECT a.cent_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
         ROUND(list_inner_product(a.v, b.v) / (a.norm * b.norm), 6) AS sim
  FROM assign a JOIN assign b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
)"""

    q["semantic_dup_pairs"] = f"""
WITH {_SEM_ASSIGN}
SELECT cent_id, vec_a, vec_b, sim FROM sempairs WHERE sim >= {SEMANTIC_THRESHOLD}"""

    q["pack_sequences"] = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(COALESCE(len(list_filter(string_split(lower(text), ' '), t -> t <> '')), 0) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM d
)
SELECT doc_id, source, n_tokens,
       CAST(floor(start / {float(PACK_WINDOW)}) AS BIGINT) AS seq_id,
       CAST(start - CAST(floor(start / {float(PACK_WINDOW)}) AS BIGINT) * {PACK_WINDOW} AS BIGINT) AS seq_off
FROM c"""

    q["semantic_keep_list"] = f"""
WITH {_SEM_ASSIGN},
dropped AS (SELECT DISTINCT vec_b AS vec_id FROM sempairs WHERE sim >= {SEMANTIC_THRESHOLD})
SELECT a.vec_id, a.cent_id,
       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
FROM assign a LEFT JOIN dropped d USING (vec_id)"""

    # incremental semantic dedup (r08): the oracle is the ONE-SHOT SemDeDup
    # keep list over the union corpus — the hash match proves the batched
    # assignment-store ingest equals the greedy lowest-id definition
    q["semantic_dedup_incremental"] = q["semantic_keep_list"]

    # single-global-window ground truth for training_order's two-phase rank
    q["training_order"] = """
SELECT doc_id,
       ROW_NUMBER() OVER (
         ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id
       ) AS global_rank
FROM documents"""

    # prototypicality: fixed-subset assignment + within-cluster hardness rank
    q["prototypicality"] = f"""
WITH {_NORM},
cents AS (
  SELECT vec_id AS cent_id, v AS cv, norm AS cn FROM n
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + IVF_K}
),
scored AS (
  SELECT n.vec_id, c.cent_id,
         ROUND(list_inner_product(n.v, c.cv) / (n.norm * c.cn), 6) AS csim
  FROM n CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cent_id, csim AS proto_sim FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT vec_id, cent_id, proto_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY cent_id ORDER BY proto_sim, vec_id) AS INT) AS hardness_rank
FROM assign"""

    # ---------------- composed curation pipeline (VERDICT r05 item 2) -------
    # One CTE chain restating every stage of curation.curate_pipeline over the
    # SURVIVORS of the previous stage — quality → exact dedup → near-dup
    # components (WITH RECURSIVE ground truth over the stage-3 corpus) →
    # contamination → token-budget mixture → sequence packing. The chain is
    # what the oracle proves: drop reasons partition the corpus (disjoint by
    # stage construction) and packing sees only kept docs.
    from ictspark.extras.curation import (
        BENCHMARK_MAX_ID,
        CURATE_BUDGET_TOKENS,
        QUALITY_MIN,
    )
    from ictspark.extras.dedup import MH_PRIME, mh_coeffs

    _mh_cols = ", ".join(
        f"min(({a} * hi + {b} * lo + {c}) % {MH_PRIME}) AS mh{i}"
        for i, (a, b, c) in enumerate(mh_coeffs(N_MINHASH_AUTO))
    )
    _est3 = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(N_MINHASH_AUTO)
    )

    def _trigram_ctes(src: str, pfx: str) -> str:
        """tokens + word-trigram shingles over table ``src`` (uncapped:
        {pfx}_all; df-capped within ``src``: {pfx})."""
        return f"""{pfx}_t AS (
  SELECT doc_id, pos, token FROM (
    SELECT doc_id,
           unnest(generate_series(1, len(string_split(lower(text), ' ')))) AS pos,
           unnest(string_split(lower(text), ' ')) AS token
    FROM {src}
  ) WHERE token <> ''
),
{pfx}_all AS (
  SELECT DISTINCT doc_id, token || ' ' || t1 || ' ' || t2 AS shingle FROM (
    SELECT doc_id, token,
           lead(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
           lead(token, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
    FROM {pfx}_t
  ) WHERE t2 IS NOT NULL
),
{pfx} AS (
  SELECT doc_id, shingle FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY shingle) AS df FROM {pfx}_all
  ) WHERE df <= {MAX_SHINGLE_DF}
)"""

    _mix_target = (
        f"CAST(round((1.0 / (SELECT n_langs FROM nl5)) * {CURATE_BUDGET_TOKENS}) AS BIGINT)"
    )
    def _manifest_sql(
        nd_src: str, gopher: bool = False, augment: bool = False, tokenizer: str = "ws"
    ) -> str:
        """The composed-pipeline CTE chain, parameterized on the near-dup
        shingle source: "sh3" (df-capped — the one-shot graded definition)
        or "sh3_all" (uncapped — the per-doc-pure definition the INCREMENTAL
        manifest maintains; the df-cap is corpus-dependent, so a frozen
        store can't use it) — and on the optional Gopher stage 2b (r09:
        the shared ``_gopher_ctes`` battery over the stage-2 survivors,
        fails dropping as 'gopher' before exact-dup sees them). Same chain
        otherwise, stage for stage. ``augment`` switches the corpus to the
        stopword-augmented fixture view (``__spark_entry__._docs_gopherable``
        mirrored): the raw synthetic corpus contains ZERO of the 8 published
        Gopher stopwords, so the un-augmented battery would annihilate it
        and the graded gopher chains would attest nothing downstream.
        ``tokenizer`` (r09) switches the ntok CTE — the unit the budget
        line, packing and reported n_tokens are measured in — between the
        whitespace count and the shared ``_SUBWORD`` expression."""
        docs = "docs_aug" if augment else "documents"
        ntok_expr = (
            _SUBWORD
            if tokenizer == "subword"
            else "CAST(COALESCE(len(list_filter(string_split(lower(text), ' '), t -> t <> '')), 0) AS BIGINT)"
        )
        aug_cte = (
            """
docs_aug AS (
  SELECT * REPLACE (coalesce(text, '')
    || ' the a' || CAST(doc_id AS VARCHAR)
    || ' of b' || CAST(doc_id AS VARCHAR)
    || ' and c' || CAST(doc_id AS VARCHAR)
    || ' that' AS text)
  FROM documents
),"""
            if augment
            else ""
        )
        if gopher:
            s2_stage = f""",
{_gopher_ctes("s2q", "g2")},
s2 AS (SELECT s2q.* FROM s2q JOIN g2 USING (doc_id) WHERE g2.pass_gopher)"""
            gopher_reason = """
  UNION ALL
  SELECT doc_id, 'gopher' FROM g2 WHERE NOT pass_gopher"""
        else:
            s2_stage = """,
s2 AS (SELECT * FROM s2q)"""
            gopher_reason = ""
        return f"""
WITH RECURSIVE{aug_cte}
ntok AS (
  SELECT doc_id,
         {ntok_expr} AS n_tokens
  FROM {docs}
),
qt AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM {docs}
  ) WHERE token <> ''
),
qagg AS (
  SELECT doc_id, COUNT(*) AS n_toks,
         CAST(SUM(CASE WHEN token IN ({sw}) THEN 1 ELSE 0 END) AS BIGINT) AS swc
  FROM qt GROUP BY 1
),
qual AS (
  -- LEFT JOIN + NULLIF (r06): a zero-token doc must score 0.0 and fall to
  -- the quality stage, not vanish from the manifest as silently "kept"
  SELECT d.doc_id,
         ROUND(least(COALESCE(a.n_toks, 0) / 50.0, 1.0) * 0.5
               + CASE WHEN a.swc * 1.0 / NULLIF(a.n_toks, 0) > 0.01 AND a.swc * 1.0 / NULLIF(a.n_toks, 0) < 0.6 THEN 0.3 ELSE 0.0 END
               + CASE WHEN length(d.text) * 1.0 / NULLIF(a.n_toks, 0) > 3 AND length(d.text) * 1.0 / NULLIF(a.n_toks, 0) < 12 THEN 0.2 ELSE 0.0 END,
               4) AS quality
  FROM {docs} d LEFT JOIN qagg a USING (doc_id)
),
s2q AS (
  SELECT d.* FROM {docs} d JOIN qual USING (doc_id)
  WHERE doc_id >= {BENCHMARK_MAX_ID} AND quality >= {QUALITY_MIN}
){s2_stage},
ex AS (SELECT doc_id, md5(lower(trim(text))) AS fp FROM s2),
exk AS (SELECT fp, MIN(doc_id) AS keeper FROM ex GROUP BY 1),
s3 AS (
  SELECT s2.* FROM s2 JOIN ex ON s2.doc_id = ex.doc_id
  JOIN exk ON ex.fp = exk.fp WHERE s2.doc_id = exk.keeper
),
{_trigram_ctes("s3", "sh3")},
hv3 AS (
  SELECT doc_id, v >> 30 AS hi, v & 1073741823 AS lo FROM (
    SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS v FROM {nd_src}
  )
),
sig3 AS (SELECT doc_id, {_mh_cols} FROM hv3 GROUP BY 1),
e0 AS (
  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b
  FROM sig3 sa JOIN sig3 sb ON sa.doc_id < sb.doc_id
  WHERE ROUND(({_est3}) / {float(N_MINHASH_AUTO)}, 4) >= {LSH_THRESHOLD}
),
edges AS (SELECT doc_a, doc_b FROM e0 UNION SELECT doc_b, doc_a FROM e0),
reach AS (
  SELECT doc_id AS doc, doc_id AS r FROM s3
  UNION
  SELECT e.doc_a AS doc, reach.r FROM edges e JOIN reach ON reach.doc = e.doc_b
),
comp AS (SELECT doc AS doc_id, MIN(r) AS component FROM reach GROUP BY 1),
s4 AS (SELECT s3.* FROM s3 JOIN comp USING (doc_id) WHERE doc_id = component),
bdocs AS (SELECT * FROM {docs} WHERE doc_id < {BENCHMARK_MAX_ID}),
{_trigram_ctes("bdocs", "shb")},
benchsh AS (SELECT DISTINCT shingle FROM shb_all),
{_trigram_ctes("s4", "sh4")},
cont AS (SELECT DISTINCT sh4_all.doc_id FROM sh4_all JOIN benchsh USING (shingle)),
s5 AS (SELECT * FROM s4 WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
nl5 AS (SELECT CAST(COUNT(DISTINCT lang) AS DOUBLE) AS n_langs FROM s5),
c5 AS (
  SELECT s5.doc_id, s5.lang, n.n_tokens,
         CAST(COALESCE(SUM(n.n_tokens) OVER (
             PARTITION BY s5.lang ORDER BY md5(CAST(s5.doc_id AS VARCHAR)), s5.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
  FROM s5 JOIN ntok n ON s5.doc_id = n.doc_id
),
s6 AS (SELECT doc_id FROM c5 WHERE tokens_before < {_mix_target}),
p6 AS (
  SELECT d.doc_id, d.source, n.n_tokens
  FROM {docs} d JOIN s6 ON d.doc_id = s6.doc_id JOIN ntok n ON d.doc_id = n.doc_id
),
pk AS (
  SELECT doc_id,
         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
  FROM p6
),
packed AS (
  SELECT doc_id,
         CAST(floor(start / {float(PACK_WINDOW)}) AS BIGINT) AS seq_id,
         CAST(start - CAST(floor(start / {float(PACK_WINDOW)}) AS BIGINT) * {PACK_WINDOW} AS BIGINT) AS seq_off
  FROM pk
),
reasons AS (
  SELECT doc_id, 'benchmark' AS drop_reason FROM {docs} WHERE doc_id < {BENCHMARK_MAX_ID}
  UNION ALL
  SELECT doc_id, 'quality' FROM qual WHERE doc_id >= {BENCHMARK_MAX_ID} AND quality < {QUALITY_MIN}{gopher_reason}
  UNION ALL
  SELECT ex.doc_id, 'exact_dup' FROM ex JOIN exk ON ex.fp = exk.fp WHERE ex.doc_id <> exk.keeper
  UNION ALL
  SELECT doc_id, 'near_dup' FROM comp WHERE doc_id <> component
  UNION ALL
  SELECT doc_id, 'contaminated' FROM cont
  UNION ALL
  SELECT doc_id, 'budget' FROM c5 WHERE tokens_before >= {_mix_target}
)
SELECT d.doc_id, d.lang, d.source, n.n_tokens,
       r.drop_reason, r.doc_id IS NULL AS keep, p.seq_id, p.seq_off
FROM {docs} d
JOIN ntok n ON d.doc_id = n.doc_id
LEFT JOIN reasons r ON d.doc_id = r.doc_id
LEFT JOIN packed p ON d.doc_id = p.doc_id"""

    q["curation_manifest"] = _manifest_sql("sh3")
    # gopher-enabled manifests (VERDICT r08 item 3), both over the
    # stopword-augmented fixture view so stage 2b splits the corpus
    # (word-count rule) instead of annihilating it: the one-shot chain and
    # the COMBINED incremental path (per-doc facts incl. the Gopher verdict
    # through the journaled store), each under its own external oracle
    q["curation_manifest_gopher"] = _manifest_sql("sh3", gopher=True, augment=True)
    # subword-budgeted one-shot manifest (VERDICT r08 item 6): the budget
    # line, packing and n_tokens in training-spend units; the incremental
    # subword store is pinned by test_incr_curation against this definition
    q["curation_manifest_subword"] = _manifest_sql("sh3", tokenizer="subword")
    q["curation_manifest_incremental_gopher"] = _manifest_sql(
        "sh3_all", gopher=True, augment=True
    )
    # incremental manifest (r08): the ORACLE is the one-shot chain — the
    # driver's hash match proves N-batch ingest == the one-shot definition
    q["curation_manifest_incremental"] = _manifest_sql("sh3_all")

    return q
