"""Text-analysis operators for a training-data pipeline over `documents`.

All built-in-function implementations (JVM-side, whole-stage codegen) — every
operator here, including the language-ID heuristic, is SQL-expressible and
fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

# BPE-ish token classes: letter runs, digit runs, single non-alnum glyphs
TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def subword_count_col(text_col: str = "text") -> F.Column:
    """Deterministic subword-token count approximation (VERDICT r06 item 7):
    real training budgets are TOKENIZER tokens, not whitespace words — about
    chars/4 for Latin scripts, ~1 per character for CJK, digit strings
    near-per-digit. Splitting on the family's BPE-ish TOKEN_RE classes
    (letter runs / digit runs / single other glyphs — the ``n_bpe_tokens``
    precedent, parity-proven portable) and weighting each piece:

        letter run  → ceil(len/4)   (≈ cl100k Latin chars-per-token)
        digit run   → ceil(len/3)   (numbers tokenize near-per-digit)
        other glyph → 1             (each CJK char / symbol is ONE match of
                                     the single-glyph class, so CJK lands at
                                     ~1 token/char with no script table)

    Integer-only arithmetic (ceil via (len+k-1) div k) and one
    regexp_extract_all + aggregate — engine-portable (DuckDB:
    list_sum(list_transform(...))) and JVM-side. An approximation by design:
    a seeded merge-table BPE would drag per-row Python into the hot path for
    a budget decision that only needs to be consistent and scale-correct."""
    # NULL text counts 0 tokens on both engines (coalesce here; the oracle's
    # list_sum(NULL) coalesces to 0 — the winnow_selected NULL rationale)
    pieces = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(TOKEN_RE), 0
    )
    per = lambda p: (  # noqa: E731
        F.when(p.rlike("^[a-z]"), F.floor((F.length(p) + 3) / 4))
        .when(p.rlike("^[0-9]"), F.floor((F.length(p) + 2) / 3))
        .otherwise(F.lit(1))
    )
    return F.aggregate(
        pieces, F.lit(0).cast("bigint"), lambda acc, p: acc + per(p).cast("bigint")
    )


def doc_stats(documents: DataFrame) -> DataFrame:
    """Quality-scoring features: token counts, lengths, stopword ratio.

    Zero-token docs (empty/whitespace-only text) get NULL ratios via
    ``try_divide`` — under Spark's default ANSI mode a plain division
    crashed the whole job on the first such doc (code-review r06), and the
    DuckDB oracle's x/NULLIF(n,0) produces the same NULLs, so both engines
    emit the row instead of one crashing and the other dropping it.
    Downstream, quality_score's band predicates are NULL-safe (a NULL ratio
    fails both bands → contributes 0), so an empty doc scores 0.0 and is
    dropped by any sane quality threshold rather than slipping through."""
    toks = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)).alias("n_bpe_tokens"),
        F.round(
            F.try_divide(F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))), F.size(toks)),
            4,
        ).alias("stopword_ratio"),
        F.round(F.try_divide(F.length("text"), F.size(toks)), 4).alias("avg_token_len"),
    )


def quality_col(text_col: str = "text") -> F.Column:
    """The composite quality score as ONE column EXPRESSION (r10): consumers
    that already hold the document row attach it with ``withColumn`` instead
    of joining the corpus against itself on doc_id — curate_pipeline's stage
    1 formerly paid a full sort-merge self-join (2 Exchanges + sorts of the
    text corpus) purely to re-attach this per-row projection. Identical
    math/rounding to ``quality_score`` (the bands read the same
    round(·, 4)-ed ratios doc_stats reports)."""
    toks = F.filter(F.split(F.lower(text_col), " "), lambda t: t != "")
    n_tokens = F.size(toks)
    sr = F.round(
        F.try_divide(F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))), F.size(toks)), 4
    )
    atl = F.round(F.try_divide(F.length(text_col), F.size(toks)), 4)
    return F.round(
        F.least(n_tokens / 50.0, F.lit(1.0)) * 0.5
        + F.when((sr > 0.01) & (sr < 0.6), 0.3).otherwise(0.0)
        + F.when((atl > 3) & (atl < 12), 0.2).otherwise(0.0),
        4,
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Composite quality score (length-normalized + stopword sanity band)."""
    return documents.select("doc_id", quality_col().alias("quality"))


def fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of normalized text (portable across engines)."""
    return documents.select(
        "doc_id", F.md5(F.lower(F.trim("text"))).alias("fp")
    )


# Gopher rule-filter constants (Rae et al. 2021 §A1.1; Penedo et al. 2023 §4
# runs the same battery). Thresholds are the PUBLISHED values, not tuned to
# the fixture corpus — fidelity to the paper is the contract.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_MAX_DUP_LINE_FRAC = 0.3
GOPHER_MAX_DUP_PARA_FRAC = 0.3


def gopher_rules(documents: DataFrame) -> DataFrame:
    """Gopher/RefinedWeb-style rule battery (VERDICT r07 item 4): the
    published per-document heuristics a production pretraining filter runs
    (Rae et al. 2021 §A1.1 "quality filtering"; Penedo et al. 2023 §4),
    as one row of rule VALUES plus pass/fail FLAGS per doc:

      word count in [50, 100k]        mean word length in [3, 10]
      symbol-to-word ratio <= 0.1     ('#' or '...' occurrences per word)
      bullet-led line share <= 0.9    ellipsis-ended line share <= 0.3
      alpha-bearing word share >= 0.8 stopword hits >= 2 (of the paper's 8)
      duplicate-line fraction <= 0.3  duplicate-paragraph fraction <= 0.3

    Scale shape: ENTIRELY per-row — array higher-order functions over the
    split text, zero shuffles, zero joins; at 100 TB this is a pure map
    stage that rides whatever partitioning the scan gives it and pipelines
    into whatever consumes it (whole-stage codegen end to end). Flags are
    computed from the ROUNDED values so boundary docs land identically in
    Spark and the DuckDB oracle. Zero-word/zero-line docs get NULL ratios
    (try_divide) and coalesce to failing the flag — an empty doc fails, it
    does not crash (the doc_stats ANSI-mode rule). Reference analog: the
    per-log acceptance gate in the ingest loop (main.rs:496-500,
    ``push_from_file`` — a log the parser rejects by local inspection never
    reaches any report)."""
    text = F.coalesce(F.col("text"), F.lit(""))
    words = F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")
    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")
    paras = F.filter(F.split(text, "\n\n"), lambda p: F.trim(p) != "")
    d = documents.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.round(
            F.try_divide(
                F.aggregate(words, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)),
                F.size(words),
            ),
            4,
        ).alias("mean_word_len"),
        F.round(
            F.try_divide(F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\."), 0)), F.size(words)),
            4,
        ).alias("symbol_word_ratio"),
        F.round(
            F.try_divide(
                F.size(F.filter(lines, lambda l: F.trim(l).rlike("^[-*•]"))), F.size(lines)
            ),
            4,
        ).alias("bullet_line_frac"),
        F.round(
            F.try_divide(
                F.size(
                    F.filter(
                        lines,
                        lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…"),
                    )
                ),
                F.size(lines),
            ),
            4,
        ).alias("ellipsis_line_frac"),
        F.round(
            F.try_divide(F.size(F.filter(words, lambda w: w.rlike("[a-z]"))), F.size(words)), 4
        ).alias("alpha_word_frac"),
        F.size(
            F.filter(
                F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
                lambda s: F.array_contains(words, s),
            )
        ).alias("stopword_hits"),
        F.round(
            F.try_divide(F.size(lines) - F.size(F.array_distinct(lines)), F.size(lines)), 4
        ).alias("dup_line_frac"),
        F.round(
            F.try_divide(F.size(paras) - F.size(F.array_distinct(paras)), F.size(paras)), 4
        ).alias("dup_para_frac"),
    )
    ok = lambda c: F.coalesce(c, F.lit(False))  # noqa: E731
    return d.select(
        "*",
        ok(F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)).alias("pass_word_count"),
        ok(
            F.col("mean_word_len").between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        ).alias("pass_mean_word_len"),
        ok(F.col("symbol_word_ratio") <= GOPHER_MAX_SYMBOL_RATIO).alias("pass_symbol_ratio"),
        ok(F.col("bullet_line_frac") <= GOPHER_MAX_BULLET_FRAC).alias("pass_bullet"),
        ok(F.col("ellipsis_line_frac") <= GOPHER_MAX_ELLIPSIS_FRAC).alias("pass_ellipsis"),
        ok(F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_FRAC).alias("pass_alpha"),
        (F.col("stopword_hits") >= GOPHER_MIN_STOPWORD_HITS).alias("pass_stopwords"),
        ok(F.col("dup_line_frac") <= GOPHER_MAX_DUP_LINE_FRAC).alias("pass_dup_lines"),
        ok(F.col("dup_para_frac") <= GOPHER_MAX_DUP_PARA_FRAC).alias("pass_dup_paras"),
    ).withColumn(
        "pass_gopher",
        F.col("pass_word_count")
        & F.col("pass_mean_word_len")
        & F.col("pass_symbol_ratio")
        & F.col("pass_bullet")
        & F.col("pass_ellipsis")
        & F.col("pass_alpha")
        & F.col("pass_stopwords")
        & F.col("pass_dup_lines")
        & F.col("pass_dup_paras"),
    )


def repetition_score(documents: DataFrame) -> DataFrame:
    """Boilerplate/repetition quality signal: per doc, the most frequent word
    3-gram's share of all (non-distinct) 3-grams. Machine-generated or
    template text scores high; natural prose low. Trigrams come from the ONE
    shared definition (dedup.word_trigrams) so this can never drift from the
    oracle's _TOKS tokenization; then two map-side-combinable aggregations."""
    from ictspark.extras.dedup import word_trigrams

    tri = word_trigrams(documents).withColumnRenamed("shingle", "tri")
    per = tri.groupBy("doc_id", "tri").agg(F.count(F.lit(1)).alias("n"))
    return per.groupBy("doc_id").agg(
        F.sum("n").alias("n_trigrams"),
        F.max("n").alias("max_trigram_n"),
        F.round(F.max("n") / F.sum("n"), 4).alias("repetition"),
    )


LANG_PROFILES = {
    "en": ["th", "he", "in", "er", "an"],
    "de": ["en", "er", "ch", "de", "ei"],
    "fr": ["es", "le", "de", "en", "re"],
    "es": ["de", "la", "os", "en", "es"],
    "zh": ["zh", "ng", "sh", "ia", "ao"],
}


def lang_id(documents: DataFrame) -> DataFrame:
    """Language-ID via character-bigram profile scoring, all built-in
    functions (JVM-side, whole-stage codegen — no Python in the plan).

    Per language: sum of non-overlapping bigram occurrence counts
    (count = (len - len(replace(text, bg, ''))) / 2). All languages share the
    same denominator (len + 1), so the argmax reduces to integer count
    comparison — no floats. Tie-break is lexicographic on language code
    (the first CASE arm in sorted order whose count >= every other wins),
    matching the original sorted-scan implementation. SQL-expressible, so the
    driver runs a full rows+schema+hash oracle (was rows-only in r01)."""
    low = F.lower(F.coalesce(F.col("text"), F.lit("")))

    def count_sum(bigrams: list[str]) -> F.Column:
        c = None
        for bg in bigrams:
            one = (F.length(low) - F.length(F.replace(low, F.lit(bg), F.lit("")))) / 2
            c = one if c is None else c + one
        return c.cast("bigint")

    langs = sorted(LANG_PROFILES)
    scored = documents.select(
        "doc_id",
        "lang",
        *[count_sum(LANG_PROFILES[lang]).alias(f"n_{lang}") for lang in langs],
    )
    pred = None
    for lang in langs[:-1]:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = F.col(f"n_{lang}") >= F.col(f"n_{other}")
            cond = c if cond is None else cond & c
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    pred = pred.otherwise(langs[-1])
    return scored.select("doc_id", "lang", pred.alias("lang_pred"))


def rolling_fingerprint(documents: DataFrame, k: int = 8) -> DataFrame:
    """Rolling-hash document fingerprint: minimum md5 over ALL k-char
    shingles — robust to local edits, unlike the whole-text md5. Kept for
    compatibility; ``winnow_fingerprint`` below is the production form
    (per-window minima → a fingerprint SET, not one global min).
    Engine-portable: both Spark and DuckDB compute min(md5(substr(text,i,k)));
    NULL text coalesces to '' (same cross-engine NULL rationale as
    winnow_selected)."""
    d = documents.select("doc_id", F.coalesce("text", F.lit("")).alias("text"))
    pos = F.explode(F.sequence(F.lit(1), F.greatest(F.length("text") - (k - 1), F.lit(1))))
    return (
        d.select("doc_id", "text", pos.alias("p"))
        .select("doc_id", F.md5(F.expr(f"substring(text, p, {k})")).alias("h"))
        .groupBy("doc_id")
        .agg(F.min("h").alias("rfp"))
    )


def unigram_logprob(documents: DataFrame) -> DataFrame:
    """Corpus-LM quality score (the cheap first-pass LM filter a curation
    pipeline runs before an expensive perplexity model): per doc, the mean
    ln P(token) under the corpus's own unigram distribution. Documents of
    ultra-rare tokens (gibberish, encoding damage) score very low; pure
    boilerplate scores near the top — both tails are what the keep/drop
    policy thresholds on.

    Plan: one groupBy(token) for the frequency table (vocabulary-bounded —
    broadcastable at any corpus size), one BROADCAST hash join of the token
    stream against it (hinted, not left to AQE estimates — the token key is
    maximally skewed by stopwords, so a conservative estimate falling back to
    a shuffle join would hot-spot exactly where broadcast is free; VERDICT
    r04 item 3), one map-side-combinable groupBy(doc_id). All built-in; ln
    and round(6) are single identical ops in both engines."""
    toks = documents.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).where(F.col("token") != "")
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_tok"))
    # total corpus tokens = COUNT of the token stream — same number as
    # SUM(freq.n_tok) (the oracle's form) but computed as a plain map-side
    # count, so the plan holds exactly ONE token-keyed Exchange (the freq
    # build); summing freq would re-derive it with a second one.
    total = toks.agg(F.count(F.lit(1)).cast("double").alias("total"))
    scored = toks.join(F.broadcast(freq), "token").crossJoin(F.broadcast(total))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg(F.log(F.col("n_tok") / F.col("total"))), 6).alias("avg_logprob"),
    )


def nb_quality_score(
    documents: DataFrame, clean_docs: DataFrame, noisy_docs: DataFrame
) -> DataFrame:
    """Naive-Bayes quality classifier trained IN-ENGINE (VERDICT r07 item 5)
    — the deterministic, oracle-expressible stand-in for CCNet's fastText
    quality classifier, one step past corpus-statistic scoring: a
    multinomial NB over whitespace tokens, trained on a labeled fixture
    (``clean_docs`` = trusted reference text, ``noisy_docs`` = corrupted /
    junk sample), scoring every doc by its length-normalized log-likelihood
    ratio with add-one smoothing over the joint training vocabulary,

        llr(w) = ln((c_clean(w)+1) / (N_clean+V))
               - ln((c_noisy(w)+1) / (N_noisy+V))
        avg_llr(doc) = mean over token positions;  pred_clean = avg_llr > 0
        (equal class priors — the decision threshold is 0 by construction).

    Why NB and not the unigram/bigram corpus LMs: a SELF-corpus LM scores
    whatever dominates the corpus highest, so mass boilerplate fools it
    (test_nb_beats_unigram_on_boilerplate proves the separation NB gets and
    self-scoring provably cannot). Why not fastText itself: a gradient
    model is nondeterministic across partitionings and inexpressible in the
    oracle; NB's sufficient statistics are exact groupBy counts.

    Plan shape (the lm_score_against rule): the model is two vocab-bounded
    count tables FULL-OUTER-merged into one (token, c_clean, c_noisy) frame
    — broadcast (vocab-bounded regardless of corpus size, stopword-skewed
    join key); totals are one crossJoined broadcast row; scoring is one
    LEFT join + map-side-combinable groupBy(doc_id). Unseen tokens stay
    defined via the +1/V smoothing — scoring a corpus the model never saw
    is the whole point. pred_clean thresholds the ROUNDED score so boundary
    docs land identically in both engines."""

    def _toks(d: DataFrame) -> DataFrame:
        return d.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
        ).where(F.col("token") != "")

    ct = _toks(clean_docs).groupBy("token").agg(F.count(F.lit(1)).alias("c_clean"))
    nt = _toks(noisy_docs).groupBy("token").agg(F.count(F.lit(1)).alias("c_noisy"))
    model = (
        ct.join(nt, "token", "full_outer")
        .select(
            "token",
            F.coalesce("c_clean", F.lit(0)).alias("c_clean"),
            F.coalesce("c_noisy", F.lit(0)).alias("c_noisy"),
        )
    )
    totals = model.agg(
        F.sum("c_clean").cast("double").alias("n_clean"),
        F.sum("c_noisy").cast("double").alias("n_noisy"),
        F.count(F.lit(1)).cast("double").alias("vsize"),
    )
    scored = (
        _toks(documents)
        .join(F.broadcast(model), "token", "left")
        .crossJoin(F.broadcast(totals))
    )
    llr = F.log(
        (F.coalesce("c_clean", F.lit(0)) + 1.0) / (F.col("n_clean") + F.col("vsize"))
    ) - F.log(
        (F.coalesce("c_noisy", F.lit(0)) + 1.0) / (F.col("n_noisy") + F.col("vsize"))
    )
    out = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg(llr), 6).alias("avg_llr"),
    )
    return out.withColumn("pred_clean", F.col("avg_llr") > 0)


def winnow_selected(documents: DataFrame, k: int = 8, w: int = 16) -> DataFrame:
    """The winnowing selection itself: DISTINCT (doc_id, fp) selected
    fingerprints — shared by winnow_fingerprint (digest) and
    dedup.winnow_reuse_pairs (candidate join) so the two can never drift.
    NULL text is coalesced to '' — a NULL doc is fingerprinted as the empty
    string in both engines (code-review r04).

    r10 (guide §4.2 — hand whole batches to native code): the selection is
    ONE ``mapInArrow`` stage — per doc, md5 every k-char shingle (hashlib —
    byte-identical to Spark/DuckDB md5 on the same UTF-8 bytes), take each
    position's forward-w-window minimum (vectorized ``np.minimum`` over the
    S32 hash array — the same clamped-tail window the former
    ``rowsBetween(0, w-1)`` computed), and emit the doc's distinct selected
    set. This replaces explode(1..len) → corpus-wide window Exchange+Sort →
    corpus-wide DISTINCT Exchange (3 shuffled passes over ~|chars| rows,
    measured 3.6 s at sf0.1/32) with a pure map stage (~1 s): zero
    Exchanges, and the per-doc distinct is complete because a doc is one
    Arrow row. Docs are hash-repartitioned first ONLY when the scan yields
    fewer splits than the session's parallelism (small local fixtures —
    one 1.5 MB parquet file = one task otherwise); at production split
    counts the stage rides the scan partitioning untouched. Output rows are
    identical (set semantics; consumers aggregate or join)."""
    d = documents.select("doc_id", F.coalesce("text", F.lit("")).alias("text"))
    spark = documents.sparkSession
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par, "doc_id")

    def _batches(it):
        import hashlib
        from collections import deque

        import pyarrow as pa

        out_schema = pa.schema([("doc_id", pa.int64()), ("fp", pa.string())])
        for batch in it:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            o_ids: list[int] = []
            o_fps: list[str] = []
            for did, txt in zip(ids, texts):
                n = max(len(txt) - (k - 1), 1)
                hs = [
                    hashlib.md5(txt[p : p + k].encode("utf-8")).hexdigest()
                    for p in range(n)
                ]
                # every position p selects min(hs[p : p+w]) (tail windows
                # clamp, exactly the former rowsBetween(0, w-1)): O(n)
                # monotonic-deque sliding min over the REVERSED sequence,
                # where the forward window becomes a backward one
                rev = hs[::-1]
                fps: set[str] = set()
                dq: deque[int] = deque()
                for i, h in enumerate(rev):
                    while dq and rev[dq[-1]] >= h:
                        dq.pop()
                    dq.append(i)
                    if dq[0] <= i - w:
                        dq.popleft()
                    fps.add(rev[dq[0]])
                for fp in sorted(fps):
                    o_ids.append(did)
                    o_fps.append(fp)
            yield pa.RecordBatch.from_arrays(
                [pa.array(o_ids, pa.int64()), pa.array(o_fps, pa.string())],
                schema=out_schema,
            )

    return d.mapInArrow(_batches, "doc_id bigint, fp string")


def winnow_fingerprint(documents: DataFrame, k: int = 8, w: int = 16) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the standard content-defined fingerprinting scheme; VERDICT r03 item 7):
    hash every k-char shingle, slide a w-hash window over the sequence, and
    SELECT each window's minimum hash. The fingerprint set (distinct selected
    hashes, expected density 2/(w+1)) localizes shared substrings — any match
    of length ≥ w+k-1 shares a fingerprint — at ~w/2× fewer stored hashes
    than the all-shingles set.

    Output per doc: fingerprint count + an order-insensitive digest (md5 of
    the sorted comma-joined set), compact and engine-portable. Plan: one
    generate (positions) inside codegen, ONE window shuffle on doc_id for the
    sliding min, then a map-side-combinable agg — rows are linear in corpus
    chars and fingerprints stored are ~2/(w+1) of that."""
    sel = winnow_selected(documents, k, w)
    return sel.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.md5(F.concat_ws(",", F.array_sort(F.collect_list("fp")))).alias("fp_digest"),
    )


def bigram_logprob(documents: DataFrame) -> DataFrame:
    """Second-order corpus-LM quality score (the step between the unigram
    filter and a real perplexity model): per doc, the mean ln P(w_i | w_1)
    under the corpus's own bigram distribution with add-one (Laplace)
    smoothing over the corpus vocabulary,

        ln((c(w_1 w_i) + 1) / (c(w_1) + V)).

    Repetitive boilerplate scores HIGH (its bigrams are corpus-frequent),
    shuffled/garbled text scores LOW even when its unigrams are common —
    exactly the split the unigram filter cannot see. Docs need ≥ 2 tokens to
    appear (one row per scored bigram position). The estimator stays defined
    for unseen bigrams (the +1), so the same tables score a held-out corpus.

    Plan (same skeleton as unigram_logprob): one doc-keyed window builds the
    bigram stream (lead over pos — the tokenization/ordering contract shared
    with dedup.word_trigrams); the UNIGRAM frequency table is
    vocabulary-bounded and broadcast-hinted, but the BIGRAM table is NOT —
    distinct (t1, t2) pairs grow with the corpus (vocab²-bounded, not
    vocab-bounded), so forcing a broadcast would collect an unbounded table
    to the driver at exactly the scale this engine targets (code-review
    r05). Its join stays an AQE-decided hash join on the bigram key; both
    aggs are map-side combinable.

    r07: now the reference_docs == documents special case of
    ``lm_score_against`` (one shared scoring plan; self-scoring makes every
    scored bigram corpus-present, so the general form's left joins hit on
    every row and the values are unchanged)."""
    return lm_score_against(documents, documents)


def _bigram_stream(documents: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(token stream, bigram stream) under the family's shared whitespace
    tokenization — one definition for the model-building and scoring sides."""
    toks = documents.select(
        "doc_id", F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "token")
    ).where(F.col("token") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = toks.withColumn("t2", F.lead("token", 1).over(w)).where(F.col("t2").isNotNull())
    return toks, bg


def lm_score_against(documents: DataFrame, reference_docs: DataFrame) -> DataFrame:
    """Held-out-reference LM scoring (VERDICT r06 item 5) — the CCNet-shaped
    quality filter: per doc, the mean ln P(w_i | w_{i-1}) under a bigram LM
    trained on a CLEAN REFERENCE corpus (add-one smoothing over the
    reference vocabulary),

        ln((c_ref(w_1 w_i) + 1) / (c_ref(w_1) + V_ref)).

    This is what ``bigram_logprob`` (self-scoring) cannot do: a corpus-self
    LM scores repeated boilerplate HIGH because its n-grams dominate the
    corpus — the production filter keeps docs the reference model finds
    predictable, so gibberish and boilerplate both rank below clean prose
    (test_lm_score_against_separates: self-scoring provably cannot separate
    the same fixture). Unseen bigrams/unigrams stay defined via the +1 / V
    smoothing (LEFT joins, counts coalesced to 0) — the whole point of
    scoring a corpus the model never saw.

    Plan: model tables come from the reference side — unigram counts
    vocabulary-bounded and broadcast-hinted (stopword-skewed join key, the
    unigram_logprob rule), bigram counts deliberately NOT broadcast
    (vocab²-bounded, AQE-decided; code-review r05) — and the scored corpus's
    bigram stream left-joins them; both aggs map-side combinable. The
    reference corpus is typically small (a curated clean sample), but
    nothing here requires it."""
    rtoks, rbg = _bigram_stream(reference_docs)
    uni = rtoks.groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
    big = rbg.groupBy("token", "t2").agg(F.count(F.lit(1)).alias("c2"))
    vocab = rtoks.select("token").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("vsize")
    )
    _, bg = _bigram_stream(documents)
    scored = (
        bg.select("doc_id", "token", "t2")
        .join(big, ["token", "t2"], "left")
        .join(F.broadcast(uni), "token", "left")
        .crossJoin(F.broadcast(vocab))
    )
    lp = F.log(
        (F.coalesce("c2", F.lit(0)) + 1.0) / (F.coalesce("c1", F.lit(0)) + F.col("vsize"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg(lp), 6).alias("avg_logprob"),
    )
