"""Deduplication operators for a training-data pipeline over `documents`.

Four families (exact, MinHash+LSH, SimHash, n-gram Jaccard), each expressed in
built-in DataFrame ops so the DuckDB oracle can run the same math:

- hashes are md5 hex strings (identical in both engines); MinHash uses the
  *lexicographic min* of salted md5 strings — engine-portable, no integer
  hash-function mismatch;
- SimHash bits come from md5 hex-nibble parity, combined with bit_count/xor
  (both engines);
- the O(n²) verification joins are the small-scale baseline; the LSH band
  bucket-join IS the scale path (candidates only, no cross join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "token")
    ).where(F.col("token") != "")


def _barrier(df: DataFrame) -> DataFrame:
    """Materialization barrier for a small per-doc proxy frame (signatures,
    fingerprints, k-gram occurrences) that is consumed MORE THAN ONCE —
    both sides of a self-join, or several aggregation branches. Without it
    the whole upstream chain executes once per consumer: ``mapInArrow``
    stages do not canonicalize equal across plan branches (each call
    pickles a fresh function object), so Spark's exchange reuse never
    fires and the Python tokenize/hash pass runs per side (measured: the
    minhash/simhash/winnow self-joins each carried TWO full signature
    builds, r10 plans/). Guide §8.4: decide with small rows, and
    materialize the proxy so re-attaching it cannot sneak the recompute
    back in. A RELIABLE checkpoint when the session has one configured
    (the real-cluster path — at 100 TB these proxy tables are the stage
    outputs a pipeline persists anyway), localCheckpoint otherwise (the
    curate_pipeline barrier rule)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


MAX_SHINGLE_DF = 100  # document-frequency cap: shingles in more docs are dropped
# Shared defaults interpolated by BOTH the Spark operators and the DuckDB
# oracle builder (oracle_extras) — a default change on either side cannot
# silently desync the other (ADVICE r04): parity would catch it, but only as
# an opaque hash mismatch; a shared constant makes the coupling explicit.
SIMHASH_MAX_HAMMING = 3  # simhash_pairs: pairs at hamming distance ≤ this
WINNOW_MIN_SHARED = 2  # winnow_reuse_pairs: min shared fingerprints per pair


def word_trigrams(documents: DataFrame) -> DataFrame:
    """NON-distinct word 3-grams per doc: (doc_id, shingle), one row per
    occurrence. The single tokenization+trigram definition shared by the
    dedup family (via shingles) and textstats.repetition_score — one Spark
    copy against the oracle's one _TOKS copy, so they cannot drift apart."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    t = _tokens(documents)
    return (
        t.withColumn("t1", F.lead("token", 1).over(w))
        .withColumn("t2", F.lead("token", 2).over(w))
        .where(F.col("t2").isNotNull())
        .select("doc_id", F.concat_ws(" ", "token", "t1", "t2").alias("shingle"))
    )


def shingles(documents: DataFrame, n: int = 3, max_df: int | None = MAX_SHINGLE_DF) -> DataFrame:
    """Distinct word n-gram shingles per doc (n=3), df-capped.

    Hot-bucket defense (VERDICT r02 item 4): a boilerplate shingle shared by
    10⁶ docs turns any shingle-equi-join into a quadratic bucket. Shingles
    whose document frequency exceeds ``max_df`` are dropped BEFORE candidate
    generation — standard near-dup practice (ultra-common shingles carry no
    discriminative signal; dropping them changes Jaccard only for pairs whose
    overlap was boilerplate anyway). The filter is one count-over-window on
    the shingle key — the same shuffle the downstream join needs, no extra
    pass over the documents. The DuckDB oracle applies the identical cap
    (oracle_extras._SHINGLES), so parity hashes prove both engines see the
    same definition."""
    sh = word_trigrams(documents).distinct()
    if max_df is not None:
        sh = (
            sh.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("shingle")))
            .where(F.col("df") <= max_df)
            .drop("df")
        )
    return sh


def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact dedup on normalized text: hash-groupBy, keep min doc_id."""
    return (
        documents.groupBy(F.md5(F.lower(F.trim("text"))).alias("fp"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper"))
    )


BRUTE_MAX_DOCS = 100_000  # ngram_jaccard_pairs guard — see below


def ngram_jaccard_pairs(
    documents: DataFrame, threshold: float = 0.2, max_docs: int | None = BRUTE_MAX_DOCS
) -> DataFrame:
    """Pairwise word-3-gram Jaccard ≥ threshold — the brute-force
    VERIFICATION baseline: it scores every shingle-sharing pair exactly, so
    parity against it proves the banded paths complete. The candidate join
    itself is df-cap-bounded (equi on shingle, bucket ≤ MAX_SHINGLE_DF), but
    the pair-scoring aggregation grows with Σ shared-shingle pairs — at
    corpus scale that is real money spent on exactness the LSH paths don't
    need. r06 (the VERDICT r05 residual): the verification-baseline contract
    is now a GUARD, not a docstring — corpora above ``max_docs`` raise and
    point at ``minhash_lsh_pairs`` (the production path); pass
    ``max_docs=None`` for a deliberate large-scale exact run. The size probe
    is one column-free count (parquet answers it from footer metadata)."""
    if max_docs is not None:
        n = documents.count()
        if n > max_docs:
            raise ValueError(
                f"ngram_jaccard_pairs is the brute-force verification baseline "
                f"({n} docs > max_docs={max_docs}): use minhash_lsh_pairs for "
                "production near-dup, or pass max_docs=None to force an exact run"
            )
    sh = shingles(documents)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
    )
    return j.where(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


N_MINHASH = 12  # demo/fixture signature size (explicit path only — see below)
LSH_BANDS = 4  # demo band count; rows per band = N_MINHASH / LSH_BANDS = 3
LSH_R = N_MINHASH // LSH_BANDS
LSH_THRESHOLD = 0.2  # default est-Jaccard threshold — shared with the oracle
AUTO_MAX_K = 64  # signature-size budget the auto sizer trades precision under
AUTO_MAX_BANDS = 512  # sanity rail: below ~0.02 Jaccard the recall formula
# demands thousands of bands — raise instead of silently building that plan


def minhash_bands_for(threshold: float, r: int = LSH_R, target_recall: float = 0.999) -> int:
    """Bands needed so a pair at EXACTLY ``threshold`` Jaccard is caught with
    probability ≥ target_recall under the LSH OR-construction (VERDICT r05
    item 5 — the MinHash mirror of ``similarity.srp_bands_for``):

        recall = 1 - (1 - j^r)^bands,   j = threshold

    (j^r = probability all ``r`` minhashes of one band agree, since each
    minhash collides with probability equal to the Jaccard). Pairs above the
    threshold have higher j, so this bounds the whole result set. Note the
    asymmetry with SRP: the per-hash collision probability here is j ITSELF
    (not 1-θ/π), so LOW thresholds are intrinsically expensive — j=0.2, r=3
    needs ~860 bands for 0.999 recall, which is why the auto sizer drops r
    when the threshold is low and why production near-dup thresholds (≥0.5)
    keep band counts modest."""
    import math

    q = min(max(threshold, 0.0) ** r, 1.0 - 1e-12)
    q = max(q, 1e-12)  # threshold 0 → finite (astronomical) answer, no domain error
    target_recall = min(target_recall, 1.0 - 1e-12)
    return max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - q)))


def minhash_rows_for(
    threshold: float, max_k: int = AUTO_MAX_K, target_recall: float = 0.999
) -> int:
    """Rows-per-band (r) for the auto sizer: the LARGEST r whose recall-sized
    signature k = r × bands_for(threshold, r) fits the ``max_k`` budget —
    larger r makes each band more selective (a band matches only on r
    simultaneous hash collisions, so the background candidate rate falls as
    j_bg^r), which is the precision/occupancy side of the trade; the bands
    formula then buys recall back. Low thresholds force r down to 1 (j^r
    collapses too fast to afford the bands otherwise); r=1 banding stays
    occupancy-bounded because a minhash VALUE is owned by one shingle, so a
    bucket's size is capped by the shingle df-cap (MAX_SHINGLE_DF), the same
    bound the shingle equi-joins rely on."""
    best = 1
    for r in range(1, 9):
        if r * minhash_bands_for(threshold, r, target_recall) <= max_k:
            best = r
    return best


# Auto-sized constants at the default threshold — interpolated by BOTH the
# no-kwargs Spark path and the DuckDB oracle builder (oracle_extras), the
# shared-constant rule: r=1 / 42 bands / k=42 at threshold 0.2, recall 0.9999.
def _auto_lsh_params() -> tuple[int, int, int]:
    from ictspark.extras.similarity import AUTO_TARGET_RECALL

    r = minhash_rows_for(LSH_THRESHOLD, AUTO_MAX_K, AUTO_TARGET_RECALL)
    bands = minhash_bands_for(LSH_THRESHOLD, r, AUTO_TARGET_RECALL)
    return r, bands, r * bands


LSH_R_AUTO, LSH_BANDS_AUTO, N_MINHASH_AUTO = _auto_lsh_params()


MH_PRIME = 2_147_483_647  # 2^31 - 1 — the permutation modulus (Mersenne)
_MH_HALF_MASK = (1 << 30) - 1


def mh_coeffs(k: int) -> list[tuple[int, int, int]]:
    """Deterministic (a, b, c) coefficients for the k MinHash permutations —
    md5-derived (no RNG, reproducible across engines/runs), a and b forced
    odd/nonzero. Shared with the oracle builder (oracle_extras interpolates
    the same values), the shared-constant rule."""
    import hashlib

    def c(tag: str) -> int:
        return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16) % MH_PRIME

    return [(c(f"mh-a{i}") | 1, c(f"mh-b{i}") | 1, c(f"mh-c{i}")) for i in range(k)]


def minhash_signatures(
    documents: DataFrame, k: int = N_MINHASH, max_df: int | None = MAX_SHINGLE_DF
) -> DataFrame:
    """k MinHash values per doc (BIGINT): min over shingles of k linear
    permutations of ONE md5 digest,

        v  = first 60 bits of md5(shingle);  hi, lo = v's 30-bit halves
        mh_i = (a_i·hi + b_i·lo + c_i) mod (2^31 - 1)

    ``max_df`` keeps the shingle df-cap by default; the incremental
    signature store passes ``max_df=None`` because a frozen stored signature
    must be a PURE function of the document — the df-cap makes signatures
    corpus-dependent (a shingle crossing the cap as the corpus grows would
    silently change already-stored docs' signatures; extras/incremental.py).

    r06 rework of the former per-permutation salted-md5 form (min of
    md5(shingle || '#i') strings): k md5 computations per shingle row and k
    32-char string min-aggs dominated the auto-sized path (k=42 → 10.3 s of
    a 12 s sf0.1 run). One md5 + k integer multiply-add-mods is the standard
    minwise family (2-universal over the digest halves; all intermediates
    < 2^62, no overflow in either engine) and the min-agg compares BIGINTs.
    The per-shingle saving scales with corpus size. The hex parse is
    engine-portable: Spark conv(hex, 16, 10), DuckDB CAST('0x…' AS BIGINT).
    """
    # r10: the per-doc DISTINCT trigram-hash set (doc_id, hi, lo) is built
    # in ONE mapInArrow stage (guide §4.2) — same tokenization (lower,
    # split ' ', drop empties), same md5/60-bit parse, per-doc set dedup in
    # place of the corpus-wide DISTINCT — so the plan drops the trigram
    # lead-window Exchange+Sort AND the distinct Exchange, and what remains
    # shuffles (doc_id, hi, lo) longs only (df-cap window + signature
    # groupBy). Proved row-identical to the JVM
    # word_trigrams→md5→conv→distinct chain with exceptAll both directions
    # at sf0.1; the df cap counts per (hi, lo), identical to per-shingle —
    # the signature already equates a shingle with its md5. Repartitions
    # only when the scan yields fewer splits than the session parallelism.
    spark = documents.sparkSession
    d = documents.select("doc_id", F.coalesce("text", F.lit("")).alias("text"))
    if d.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    id_t = d.schema["doc_id"].dataType.simpleString()

    def _hv_batches(it):
        import hashlib

        import numpy as np
        import pyarrow as pa

        half_mask = _MH_HALF_MASK
        for batch in it:
            texts = batch.column("text").to_pylist()
            n = batch.num_rows
            counts: list[int] = []
            his: list[int] = []
            los: list[int] = []
            for txt in texts:
                toks = [t for t in txt.lower().split(" ") if t]
                vs = {
                    int(
                        hashlib.md5(
                            (" ".join(toks[i : i + 3])).encode("utf-8")
                        ).hexdigest()[:15],
                        16,
                    )
                    for i in range(len(toks) - 2)
                }
                counts.append(len(vs))
                for v in vs:
                    his.append(v >> 30)
                    los.append(v & half_mask)
            idx = pa.array(
                np.repeat(np.arange(n, dtype=np.int64), np.array(counts, dtype=np.int64))
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id").take(idx),
                    pa.array(his, pa.int64()),
                    pa.array(los, pa.int64()),
                ],
                names=["doc_id", "hi", "lo"],
            )

    hv = d.mapInArrow(_hv_batches, f"doc_id {id_t}, hi bigint, lo bigint")
    if max_df is not None:
        hv = (
            hv.withColumn(
                "df", F.count(F.lit(1)).over(Window.partitionBy("hi", "lo"))
            )
            .where(F.col("df") <= max_df)
            .drop("df")
        )
    aggs = [
        F.min(
            (F.lit(a) * F.col("hi") + F.lit(b) * F.col("lo") + F.lit(c)) % F.lit(MH_PRIME)
        ).alias(f"mh{i}")
        for i, (a, b, c) in enumerate(mh_coeffs(k))
    ]
    return hv.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    documents: DataFrame,
    k: int | None = None,
    bands: int | None = None,
    threshold: float = LSH_THRESHOLD,
    max_df: int | None = MAX_SHINGLE_DF,
) -> DataFrame:
    """MinHash+LSH near-dup: band bucket-join for candidates (the scale path —
    no cross join), then estimated Jaccard = matching-minhash fraction.

    Sizing (r06 — the SRP default-path contract, VERDICT r05 item 5): with
    neither ``k`` nor ``bands`` given, both derive from ``threshold``: r =
    ``minhash_rows_for`` (precision under the AUTO_MAX_K budget), bands =
    ``minhash_bands_for`` at recall ≥ AUTO_TARGET_RECALL, k = r × bands. A
    caller who changes ``threshold`` alone therefore gets a plan whose
    recall FOLLOWS the threshold — the silent-recall-drop gap the SRP sizers
    closed in r03-r05. At the default threshold 0.2 the derivation lands on
    r=1 / 42 bands / k=42: single-hash bands, whose buckets are bounded by
    the shingle df-cap, and — because any pair with est_jaccard ≥ threshold
    must share ≥ ⌈θk⌉ ≥ 1 minhash — the banded result now equals the
    brute-force est-threshold definition EXACTLY, not just probabilistically.
    The demo/fixture constants (k=12, bands=4) are reachable only by passing
    BOTH explicitly; passing exactly one raises (there is no principled way
    to derive the other from it, and falling back to a demo constant is the
    foot-gun this contract exists to close). Thresholds low enough to demand
    > AUTO_MAX_BANDS bands raise rather than silently building an
    astronomical plan. Gated by test_minhash_auto_sizing_default and
    test_minhash_recall_at_production_threshold."""
    if (k is None) != (bands is None):
        raise ValueError(
            "minhash_lsh_pairs: pass BOTH k and bands (explicit/demo path) or "
            "NEITHER (auto-sized from threshold) — one alone would silently "
            "fall back to a fixture constant"
        )
    if k is None:
        from ictspark.extras.similarity import AUTO_TARGET_RECALL

        r = minhash_rows_for(threshold, AUTO_MAX_K, AUTO_TARGET_RECALL)
        bands = minhash_bands_for(threshold, r, AUTO_TARGET_RECALL)
        if bands > AUTO_MAX_BANDS:
            raise ValueError(
                f"minhash_lsh_pairs: threshold={threshold} needs {bands} bands "
                f"for recall {AUTO_TARGET_RECALL} — pass explicit (k, bands) "
                "if this cost is really intended"
            )
        k = r * bands
    r = k // bands
    # r10 barrier: the signature frame (ONE narrow row per doc, k longs)
    # feeds BOTH sides of the band self-join — and on the r > 1 path two
    # more scoring joins. Un-materialized, every branch re-runs the whole
    # mapInArrow tokenize+md5 pass (plans/r10/minhash_lsh_pairs_cur.txt:
    # 2× MapInArrow, 2× df-cap Window, 2× signature agg; no exchange
    # reuse across Python nodes). Measured: local wall ~flat at sf0.1/32
    # (2.2 → 2.1 s warm; the duplicate chains ran CONCURRENTLY on idle
    # cores) and −6% at sf1 — the real win is the HALVED per-byte Python
    # hash work, which a busy 100 TB cluster pays for twice either way.
    sig = _barrier(minhash_signatures(documents, k, max_df=max_df))
    # ONE posexplode pass over the signature frame, not a bands-way union of
    # selects (r06): each union branch replayed the whole signature
    # aggregation — 42 auto-sized bands made that 42 shingle-groupBy jobs
    # where one suffices (observed 23 s → ~5 s at sf0.1). posexplode keeps
    # the same (doc_id, band, bkey) rows from a single scan of sig.
    band_keys = F.array(
        *[
            F.concat_ws("|", *[F.col(f"mh{i}") for i in range(b * r, (b + 1) * r)])
            for b in range(bands)
        ]
    )
    buckets = sig.select("doc_id", F.posexplode(band_keys).alias("band", "bkey"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    joined = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    if r == 1 and k == bands:
        # Single-hash bands COVERING every signature position (k == bands —
        # always true on the auto path, where k = r*bands; an explicit
        # non-divisible (k, bands) leaves tail positions outside the bands
        # and must take the full-signature scoring path below, else their
        # matches silently vanish from est — code-review r06): a matching
        # BAND row IS a matching signature
        # POSITION, so est_jaccard = matching-band count / k directly from
        # the candidate join — one map-side-combinable groupBy, no distinct
        # pass and no re-join of the k-column signature frame (r06: at sf1
        # the 26M low-precision candidates made those two wide sig joins
        # ~2/3 of the whole query; counting in place cut 75 s → ~25 s).
        # Identical output: round(cnt/k, 4) = the positional-match fraction.
        return (
            joined.groupBy(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .agg(F.count(F.lit(1)).alias("nm"))
            .select(
                "doc_a",
                "doc_b",
                F.round(F.col("nm") / F.lit(float(k)), 4).alias("est_jaccard"),
            )
            .where(F.col("est_jaccard") >= threshold)
        )
    # r > 1 (explicit/demo path): band matches under-count positional
    # matches, so score candidates against the full signatures
    cand = (
        joined.select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.alias("sa")
    est = F.round(
        sum(
            F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0) for i in range(k)
        )
        / F.lit(float(k)),
        4,
    )
    out = (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sig.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
    )
    return out.where(F.col("est_jaccard") >= threshold)


N_SIMHASH_BITS = 64  # r04 (VERDICT r03 item 1a): was 16 — see simhash_pairs
_HALF_BITS = 32  # stored as two non-negative 32-bit halves (engine-portable:
# a single 64-bit value needs bit 63, and DuckDB's `<<` overflow-checks while
# Spark's sum would; two halves < 2^32 need no shifts, no sign handling)


def simhash(documents: DataFrame) -> DataFrame:
    """64-bit SimHash over distinct tokens, as two 32-bit halves (sim_hi,
    sim_lo). Bit j of the low half = parity of hex nibble j of md5(token);
    the high half salts the token ('#hi') for 32 more independent bits.
    Width matters at scale: 16-bit signatures give 8-bit pigeonhole chunks →
    256 bucket values → ~N/256 docs per bucket and a squared candidate join
    at 10⁹ docs (VERDICT r03 item 1); 64 bits give 16-bit chunks → 65 536
    values per chunk, keeping buckets bounded.

    r10 (guide §4.2 — the winnow/minhash rewrite applied to the flagged
    cost center): the WHOLE signature is one ``mapInArrow`` map stage —
    per doc, the distinct token set (same lower/split-' '/drop-empties
    tokenization), two hashlib md5 digests per distinct token (memoized
    per task: the vocabulary is corpus-bounded, so a reused worker hashes
    each token once), and a vectorized NumPy nibble-parity majority vote.
    ZERO Exchanges where the former plan paid a vocab DISTINCT shuffle, a
    broadcast join and a 64-column aggregation (measured 1.9 s → 0.4 s
    warm / 6.0 s → 2.2 s cold at sf0.1/32); rows proved identical with
    exceptAll both directions. Token-less docs emit no signature row,
    exactly like the former groupBy. Repartitions only when the scan
    yields fewer splits than the session parallelism."""
    spark = documents.sparkSession
    d = documents.select("doc_id", F.coalesce("text", F.lit("")).alias("text"))
    if d.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    id_t = d.schema["doc_id"].dataType.simpleString()

    def _batches(it):
        import hashlib

        import numpy as np
        import pyarrow as pa

        cache: dict[str, tuple[bytes, bytes]] = {}

        def digests(tok: str) -> tuple[bytes, bytes]:
            r = cache.get(tok)
            if r is None:
                r = (
                    hashlib.md5(tok.encode("utf-8")).digest(),
                    hashlib.md5((tok + "#hi").encode("utf-8")).digest(),
                )
                cache[tok] = r
            return r

        def majority(blob: bytes, m: int) -> int:
            # md5 hex char 2k is byte k's high nibble, char 2k+1 its low
            # nibble; signature bit j = 1 iff MORE than half the tokens
            # have parity 1 at nibble j (2·count > m, the strict rule)
            dm = np.frombuffer(blob, np.uint8).reshape(m, 16)
            cnt_even = ((dm >> 4) & 1).sum(axis=0)
            cnt_odd = (dm & 1).sum(axis=0)
            val = 0
            for k in range(16):
                if 2 * int(cnt_even[k]) > m:
                    val |= 1 << (2 * k)
                if 2 * int(cnt_odd[k]) > m:
                    val |= 1 << (2 * k + 1)
            return val

        for batch in it:
            texts = batch.column("text").to_pylist()
            keep: list[int] = []
            his: list[int] = []
            los: list[int] = []
            for i, txt in enumerate(texts):
                toks = {t for t in txt.lower().split(" ") if t}
                m = len(toks)
                if m == 0:
                    continue
                pairs = [digests(t) for t in toks]
                keep.append(i)
                los.append(majority(b"".join(p[0] for p in pairs), m))
                his.append(majority(b"".join(p[1] for p in pairs), m))
            idx = pa.array(np.array(keep, dtype=np.int64))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id").take(idx),
                    pa.array(his, pa.int64()),
                    pa.array(los, pa.int64()),
                ],
                names=["doc_id", "sim_hi", "sim_lo"],
            )

    return d.mapInArrow(_batches, f"doc_id {id_t}, sim_hi bigint, sim_lo bigint")


def _chunk_expr(a: int, b: int) -> F.Column:
    """Bits [a, b) of the 64-bit signature (lo = bits 0-31, hi = 32-63) as a
    non-negative bigint. Handles chunks straddling the half boundary."""
    if b <= _HALF_BITS:
        return F.shiftright(F.col("sim_lo"), a).bitwiseAND(F.lit((1 << (b - a)) - 1))
    if a >= _HALF_BITS:
        return F.shiftright(F.col("sim_hi"), a - _HALF_BITS).bitwiseAND(
            F.lit((1 << (b - a)) - 1)
        )
    low_w = _HALF_BITS - a
    low = F.shiftright(F.col("sim_lo"), a).bitwiseAND(F.lit((1 << low_w) - 1))
    high = F.col("sim_hi").bitwiseAND(F.lit((1 << (b - _HALF_BITS)) - 1))
    return low + high * F.lit(1 << low_w)


def simhash_pairs(documents: DataFrame, max_hamming: int = SIMHASH_MAX_HAMMING) -> DataFrame:
    """SimHash near-dup pairs: hamming distance ≤ max_hamming (default 3).

    Scale shape (the 100 TB path): pigeonhole banding. The 64-bit signature is
    split into ``max_hamming + 1`` disjoint bit chunks; any pair within
    hamming distance d ≤ max_hamming differs in at most d chunks, so at least
    one chunk matches EXACTLY. Candidates therefore come from an equi-join on
    (chunk_idx, chunk_value) — per-bucket shuffle, no cross/theta join — and
    the exact hamming check on candidates makes the result identical to the
    brute-force all-pairs definition (the DuckDB oracle still computes the
    brute-force form, so the hash match proves the equivalence).

    Bucket occupancy (why 64 bits): max_hamming=3 → 4 chunks × 16 bits →
    65 536 values per chunk. At 10⁹ docs a uniform chunk bucket holds ~15 k
    docs (~10⁸ candidate pairs per chunk across ALL buckets — linear-ish),
    vs the old 16-bit/8-bit-chunk shape where each of 256 buckets held ~4 M
    docs and the join squared."""
    # r10 barrier: TWO narrow longs per doc feed both sides of the
    # pigeonhole self-join; without it the mapInArrow signature stage runs
    # once per side (4 MapInArrow nodes in plans/r10/simhash_pairs_cur.txt).
    s = _barrier(simhash(documents))
    n_chunks = max_hamming + 1
    chunk_bits = -(-N_SIMHASH_BITS // n_chunks)  # ceil
    # ONE posexplode pass over the signature frame, not an n_chunks-way union
    # of selects (r10, the minhash_lsh_pairs r06 lesson): each union branch
    # re-executed the post-shuffle 64-agg majority vote — and the self-join
    # doubled that again, 8 HashAggregate evaluations where one suffices
    # (66 Exchanges → 5 in the physical plan; measured 6.8 s → ~2.5 s warm
    # at sf0.1/32). posexplode keeps the same (doc_id, chunk, cval) rows
    # from a single evaluation, so the pair set is byte-identical.
    chunk_vals = F.array(
        *[
            _chunk_expr(j * chunk_bits, min((j + 1) * chunk_bits, N_SIMHASH_BITS))
            for j in range(n_chunks)
        ]
    )
    buckets = s.select(
        "doc_id", "sim_hi", "sim_lo", F.posexplode(chunk_vals).alias("chunk", "cval")
    )
    a_ = buckets.alias("a")
    b_ = buckets.alias("b")
    ham = F.bit_count(F.col("a.sim_lo").bitwiseXOR(F.col("b.sim_lo"))) + F.bit_count(
        F.col("a.sim_hi").bitwiseXOR(F.col("b.sim_hi"))
    )
    return (
        a_.join(
            b_,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cval") == F.col("b.cval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(ham <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )


def winnow_reuse_pairs(
    documents: DataFrame,
    k: int = 8,
    w: int = 16,
    min_shared: int = WINNOW_MIN_SHARED,
    max_df: int | None = MAX_SHINGLE_DF,
) -> DataFrame:
    """Fingerprint-index near-dup candidates (r04): pairs of docs sharing
    ≥ ``min_shared`` winnowing fingerprints, via an equi-join on the
    fingerprint key — the character-level companion to the word-shingle
    families (robust to whitespace/tokenization differences the word 3-grams
    miss, e.g. reformatted code or concatenated tokens).

    Scale shape: identical to the shingle joins — the fingerprint is the
    bucket key, a df-cap (count-over-window riding the join's own Exchange)
    drops boilerplate fingerprints before they can square a bucket, and
    winnowing has ALREADY thinned the key stream to ~2/(w+1) of all k-grams,
    so the join input is ~8× smaller than a raw k-gram join at w=16."""
    from ictspark.extras.textstats import winnow_selected

    sel = winnow_selected(documents, k, w)
    if max_df is not None:
        sel = (
            sel.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("fp")))
            .where(F.col("df") <= max_df)
            .drop("df")
        )
    # r10 barrier: the winnowed fingerprint index (~2/(w+1) of the k-gram
    # stream — the thinned proxy, exactly what a MOSS-style index stores)
    # feeds both sides of the self-join; un-materialized, the mapInArrow
    # winnowing pass and the df-cap window run once per side.
    sel = _barrier(sel)
    a, b = sel.alias("a"), sel.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def paragraph_dedup(documents: DataFrame) -> DataFrame:
    """Corpus-wide repeated-PARAGRAPH dedup (VERDICT r08 item 2) — the
    sub-document granularity of Lee et al. 2021 ("Deduplicating Training
    Data Makes Language Models Better"): boilerplate paragraphs (license
    headers, nav bars, signatures) repeat across millions of documents that
    are NOT near-duplicates of each other, so doc-granular dedup never sees
    them. Only the globally FIRST occurrence of each paragraph survives —
    the exact-dedup min-id keeper rule one level down, applied per
    (doc_id, para_idx) so within-doc repeats dedupe too.

    Semantics: paragraphs are the double-newline split segments; a segment
    is a dedup unit iff it has non-whitespace content (whitespace-only
    segments are formatting, not content — they are dropped from the
    rewrite, which re-joins kept paragraphs with a single blank line). The
    keeper of a paragraph hash is its lexicographically-min (doc_id,
    para_idx) occurrence. Output, one row per input doc: (doc_id, n_paras,
    n_removed, removed_para_frac, new_text) — a doc with no content
    paragraphs passes through with 0/0/NULL/''.

    Scale shape: one explode (map stage), one min-STRUCT aggregation on the
    paragraph hash — map-side partial combine, so a paragraph repeated 10⁷
    times collapses inside each scan partition before the shuffle (the
    reason this is an agg + join, not a row_number window: a window puts
    every occurrence of a hot hash in ONE task's sort) — one equi-join back
    on the hash (build side is one row per distinct hash; output = input
    rows exactly, so a hot key inflates nothing beyond its own row count,
    which AQE skew-split handles), and one doc_id regroup for the rewrite.
    No cartesian anywhere; text crosses the wire twice (hash join +
    regroup), the irreducible cost of a rewrite emitter."""
    # full whitespace strip, not trim(): trim removes SPACES only in both
    # Spark and DuckDB, which would make a tab-padded segment "content"
    stripped = F.regexp_replace("para", r"^\s+|\s+$", "")
    segs = (
        documents.select(
            "doc_id",
            F.posexplode(F.split(F.coalesce("text", F.lit("")), "\n\n")).alias(
                "para_idx", "para"
            ),
        )
        .where(stripped != "")
        .withColumn("h", F.md5(stripped))
    )
    first = segs.groupBy("h").agg(
        F.min(F.struct("doc_id", "para_idx")).alias("first")
    )
    marked = segs.join(first, "h").withColumn(
        "kept",
        (F.col("doc_id") == F.col("first.doc_id"))
        & (F.col("para_idx") == F.col("first.para_idx")),
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.when(~F.col("kept"), 1).otherwise(0)).alias("n_removed"),
        # collect_list skips the NULLs the when() leaves for removed paras;
        # array_sort orders the structs by para_idx (first field), so the
        # rewrite is deterministic regardless of task arrival order
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("kept"), F.struct("para_idx", "para")))
                ),
                lambda s: s["para"],
            ),
            "\n\n",
        ).alias("new_text"),
    )
    return documents.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_paras", F.lit(0)).cast("bigint").alias("n_paras"),
        F.coalesce("n_removed", F.lit(0)).cast("bigint").alias("n_removed"),
        F.round(F.try_divide("n_removed", "n_paras"), 4).alias("removed_para_frac"),
        F.coalesce("new_text", F.lit("")).alias("new_text"),
    )


def _span_base(documents: DataFrame, k: int) -> tuple[DataFrame, DataFrame]:
    """Shared head of the token-span family: (per-doc token arrays, k-gram
    occurrence stream (doc_id, s, h)) under the family's whitespace
    tokenization — positions 0-based after dropping empty splits.

    The occurrence stream explodes NARROW token rows and builds each
    k-gram with one ``lead()`` chain inside a single per-doc window (the
    same Sort also yields the post-filter position via ``row_number``).
    Plan-audit note (r09, measured — same-session alternating A/B at
    sf1/32, digests identical, recorded in PLANS.md): this replaced a
    per-row ``transform(sequence, i -> array_join(slice(...)))`` shingle
    build that looked like the better plan (pure map, no Exchange) but
    ran ~2.1x SLOWER end-to-end (12.5-13 s vs 6-6.5 s warm for
    repeated_ngram_spans) — materializing n_tokens sliced STRING copies
    per row (~k x |doc| transient bytes) costs more than one
    Exchange+Sort of narrow (doc_id, pos, token) rows. Same lesson, same
    round, as curation.dsir_feature_stream; numeric higher-order folds
    (the similarity family's dot products) measured fine and stay."""
    toks = F.filter(
        F.split(F.coalesce("text", F.lit("")), r"\s+"), lambda w: w != ""
    )
    base = documents.select(
        "doc_id", toks.alias("toks")
    ).withColumn("n_tokens", F.size("toks"))
    tr = documents.select(
        "doc_id",
        F.posexplode(F.split(F.coalesce("text", F.lit("")), r"\s+")).alias("p", "w"),
    ).where(F.col("w") != "")
    win = Window.partitionBy("doc_id").orderBy("p")
    cols = [F.col("w")] + [F.lead("w", j).over(win) for j in range(1, k)]
    s = tr.select(
        "doc_id",
        (F.row_number().over(win) - 1).alias("s"),
        F.concat_ws(" ", *cols).alias("g"),
        F.lead("w", k - 1).over(win).alias("last"),
    )
    occs = s.where(F.col("last").isNotNull()).select(
        "doc_id", "s", F.md5("g").alias("h")
    )
    return base, occs


def _cut_spans(
    base: DataFrame, starts: DataFrame, k: int, min_span: int
) -> DataFrame:
    """Shared tail: merge each doc's duplicate k-gram starts into maximal
    covered spans (per-doc array math — overlapping or adjacent k-windows
    fuse; break when the next start clears the running end by > 1), forgive
    spans under ``min_span``, cut the rest from the rewrite."""
    merged = starts.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("s")).alias("starts")
    ).withColumn(
        "spans",
        F.expr(
            f"""filter(
                 aggregate(starts,
                   cast(array() as array<struct<lo:int,hi:int>>),
                   (acc, st) -> if(size(acc) = 0 or st > element_at(acc, -1).hi + 1,
                     concat(acc, array(struct(st as lo, st + {k} - 1 as hi))),
                     concat(slice(acc, 1, size(acc) - 1),
                            array(struct(element_at(acc, -1).lo as lo,
                                         st + {k} - 1 as hi))))),
                 iv -> iv.hi - iv.lo + 1 >= {min_span})"""
        ),
    ).select("doc_id", "spans")
    out = base.join(merged, "doc_id", "left").withColumn(
        "spans", F.coalesce("spans", F.expr("cast(array() as array<struct<lo:int,hi:int>>)"))
    )
    kept = F.filter(
        "toks",
        lambda w, i: ~F.exists(
            "spans", lambda iv: (i >= iv["lo"]) & (i <= iv["hi"])
        ),
    )
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.aggregate(
            "spans", F.lit(0), lambda acc, iv: acc + iv["hi"] - iv["lo"] + 1
        ).cast("bigint").alias("removed_tokens"),
        F.round(
            F.try_divide(
                F.aggregate("spans", F.lit(0), lambda acc, iv: acc + iv["hi"] - iv["lo"] + 1),
                F.col("n_tokens"),
            ),
            4,
        ).alias("removed_frac"),
        F.array_join(kept, " ").alias("new_text"),
    )


def repeated_ngram_spans(
    documents: DataFrame, k: int = 10, min_span: int | None = None
) -> DataFrame:
    """Corpus-wide repeated TOKEN-SPAN removal — the exact-substring half
    of Lee et al. 2021 (their suffix-array ExactSubstr at 50 tokens),
    re-expressed at k-token-gram granularity so it distributes: any
    substring repeat of >= k whitespace tokens shares at least one k-gram,
    and a doc position sits in a removed span iff a repeated, non-keeper
    k-gram occurrence covers it. `paragraph_dedup` catches boilerplate the
    author delimited; this catches the spans they didn't (inlined license
    text, quoted replies, templated sentences) at token granularity.

    Semantics: tokens are the non-empty ``\\s+`` splits of ``text``,
    positioned 0-based after filtering. Every k-gram occurrence ``(doc_id,
    s)`` of a k-gram value that occurs >= 2 times corpus-wide is a
    duplicate UNLESS it is the value's keeper = lexicographically-min
    (doc_id, s) — so exactly one copy of every repeated region survives
    globally, the min-id keeper rule at token granularity. Each duplicate
    occurrence covers token positions [s, s+k-1]; per doc, overlapping or
    adjacent covered ranges merge into maximal spans, spans shorter than
    ``min_span`` (default k) are forgiven, and surviving spans are cut
    from the rewrite. Output one row per input doc: (doc_id, n_tokens,
    removed_tokens, removed_frac, new_text) — new_text re-joins kept
    tokens with single spaces (canonical whitespace, like the rewrite
    emitters upstream).

    Scale shape: shingling explodes narrow token rows and builds each
    k-gram in one per-doc lead() window — ONE Exchange+Sort of (doc_id,
    pos, token) rows, measured 2.1x faster than the per-row array
    transform it replaced (_span_base docstring); the keeper agg is one
    min-STRUCT + count groupBy on the
    k-gram md5 with map-side partial combine, so a k-gram repeated 10^7
    times collapses inside each scan partition before the shuffle; the
    join back is one equi-join against one row per distinct k-gram; span
    merging is per-doc array math on collected duplicate starts (bounded
    by doc length, no window over the corpus). No cartesian anywhere.
    The occurrence set feeds BOTH the keeper agg and the join probe side —
    a materialization barrier after the shingle build stops the declarative
    double text-scan (measured 40.8 -> 18.5 s at sf1/32, same session):
    a RELIABLE checkpoint when the session has one configured (the
    real-cluster path — at 100 TB this is the stage output a pipeline
    persists anyway), localCheckpoint otherwise (the curate_pipeline
    barrier rule)."""
    if min_span is None:
        min_span = k
    if k < 2:
        raise ValueError("k must be >= 2 (a 1-gram span removes every repeated token)")
    if min_span < k:
        raise ValueError(f"min_span {min_span} < k {k}: spans are unions of k-windows")
    base, occs = _span_base(documents, k)
    occs = _barrier(occs)  # ONE tokenize/shingle pass feeds keeper agg + probe
    first = occs.groupBy("h").agg(
        F.min(F.struct("doc_id", "s")).alias("first"),
        F.count(F.lit(1)).alias("cnt"),
    )
    dups = (
        occs.join(first, "h")
        .where(
            (F.col("cnt") >= 2)
            & ~(
                (F.col("doc_id") == F.col("first.doc_id"))
                & (F.col("s") == F.col("first.s"))
            )
        )
        .select("doc_id", "s")
    )
    return _cut_spans(base, dups, k, min_span)


def decontaminate_spans(
    documents: DataFrame,
    benchmark_docs: DataFrame,
    k: int = 10,
    min_span: int | None = None,
) -> DataFrame:
    """Span-level benchmark DECONTAMINATION — the surgical form of
    ``curation.contamination_check``: instead of dropping a whole doc that
    shares eval n-grams (which throws away a long clean doc over one quoted
    question), cut exactly the token spans that overlap the benchmark set.
    Any training-doc position covered by a k-gram that occurs ANYWHERE in
    the benchmark corpus is contaminated — no keeper rule, eval text never
    trains. Same tokenization, same covered-range merge, same ``min_span``
    forgiveness, same output shape as ``repeated_ngram_spans``:
    (doc_id, n_tokens, removed_tokens, removed_frac, new_text).

    Scale shape: the benchmark k-gram set is distinct-reduced (bounded by
    the eval corpus, typically tiny against the training corpus —
    broadcast-ready); the probe side is one left-semi equi-join of the
    training occurrence stream against it; everything downstream is the
    per-doc array math of the family tail. One text pass per side, zero
    windows, no cartesian."""
    if min_span is None:
        min_span = k
    if k < 2:
        raise ValueError("k must be >= 2 (a 1-gram cut removes every shared token)")
    if min_span < k:
        raise ValueError(f"min_span {min_span} < k {k}: spans are unions of k-windows")
    base, occs = _span_base(documents, k)
    _, bocc = _span_base(benchmark_docs, k)
    bench_h = bocc.select("h").distinct()
    hits = occs.join(bench_h, "h", "left_semi").select("doc_id", "s")
    return _cut_spans(base, hits, k, min_span)


def decontaminate_fuzzy(
    train_docs: DataFrame,
    benchmark_docs: DataFrame,
    threshold: float = LSH_THRESHOLD,
) -> DataFrame:
    """Doc-level FUZZY benchmark decontamination — the near-duplicate
    complement of the exact family: `contamination_check` counts exact
    shingle overlaps and `decontaminate_spans` cuts exactly-quoted spans,
    but a paraphrased or lightly-edited eval item shares few exact
    k-grams while its MinHash estimate stays high. Flag every training
    doc whose estimated Jaccard against ANY benchmark doc reaches
    ``threshold`` (the production gate before a doc-drop or manual
    review). Output one row per TRAIN doc: (doc_id, n_bench_hits,
    max_est, contaminated) — clean docs keep 0 / NULL / false, so both
    filters stay visible downstream.

    Semantics: signatures are ``minhash_signatures(max_df=None)`` — PURE
    per-doc functions (a contamination verdict must not depend on
    train-corpus shingle frequencies), same auto sizing as the no-kwargs
    `minhash_lsh_pairs` path (r rows/band, bands from recall at
    ``threshold``). The single-hash-band case (r=1, every production
    threshold ≤ ~0.5) makes the banded candidate set EXACTLY the
    est ≥ threshold set — any pair with est ≥ θ > 0 shares ≥ 1 minhash —
    so the DuckDB oracle states the brute-force cross-side definition and
    the banded plan must hash-match it. r > 1 sizings raise: the
    exact-equality contract is the point of the graded path.

    Scale shape: band bucket equi-join (never a cross join), benchmark
    side broadcast-sized in practice (eval suites are tiny next to a
    crawl); matching-band counting is one map-side-combinable groupBy
    per (train, bench) candidate; the per-train rollup is a second small
    groupBy; the final LEFT join restores clean docs.

    NOT a ``curate_pipeline`` stage, deliberately: the pipeline's stage 5
    drops any doc sharing >= 1 benchmark trigram shingle, which strictly
    subsumes this operator (an est of 0.2 needs ~9/42 matching minhash
    positions — overwhelming true shingle overlap), so a fuzzy stage
    after it could never fire. This operator is the POLICY ALTERNATIVE
    for pipelines whose exact stage is span-surgical
    (``decontaminate_spans``) or match-count-thresholded
    (``contamination_check``) rather than any-overlap-drops-the-doc."""
    from ictspark.extras.similarity import AUTO_TARGET_RECALL

    r = minhash_rows_for(threshold, AUTO_MAX_K, AUTO_TARGET_RECALL)
    bands = minhash_bands_for(threshold, r, AUTO_TARGET_RECALL)
    if bands > AUTO_MAX_BANDS:
        raise ValueError(
            f"decontaminate_fuzzy: threshold={threshold} needs {bands} bands "
            f"for recall {AUTO_TARGET_RECALL} — raise the threshold"
        )
    if r != 1:
        raise ValueError(
            f"decontaminate_fuzzy: threshold={threshold} auto-sizes to "
            f"r={r} rows/band — the exact banded==brute equality this "
            "operator grades requires single-hash bands (r=1); lower the "
            "threshold or use minhash_lsh_pairs for probabilistic recall"
        )
    k = r * bands

    def buckets(docs: DataFrame, side: str) -> DataFrame:
        sig = minhash_signatures(docs, k, max_df=None)
        keys = F.array(*[F.col(f"mh{b}").cast("string") for b in range(bands)])
        return sig.select(
            F.col("doc_id").alias(f"{side}_id"),
            F.posexplode(keys).alias("band", "bkey"),
        )

    cand = buckets(train_docs, "t").join(
        buckets(benchmark_docs, "b"), ["band", "bkey"]
    )
    est = (
        cand.groupBy("t_id", "b_id")
        .agg((F.count(F.lit(1)) / k).alias("est"))
        .where(F.col("est") >= threshold)
    )
    per_doc = est.groupBy("t_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bench_hits"),
        F.round(F.max("est"), 4).alias("max_est"),
    )
    return (
        train_docs.select("doc_id")
        .join(per_doc, F.col("doc_id") == F.col("t_id"), "left")
        .select(
            "doc_id",
            F.coalesce("n_bench_hits", F.lit(0)).cast("bigint").alias("n_bench_hits"),
            "max_est",
            # coalesce BEFORE the compare: NULL > 0 is NULL, and a NULL
            # contaminated flag is invisible to both keep and drop filters
            (F.coalesce("n_bench_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
