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


def ngram_jaccard_pairs(documents: DataFrame, threshold: float = 0.2) -> DataFrame:
    """Pairwise word-3-gram Jaccard ≥ threshold (brute-force verification path)."""
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


N_MINHASH = 12
LSH_BANDS = 4  # rows per band = N_MINHASH / LSH_BANDS = 3


def minhash_signatures(documents: DataFrame, k: int = N_MINHASH) -> DataFrame:
    """k MinHash values per doc: lexicographic min of salted md5(shingle)."""
    sh = shingles(documents)
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    documents: DataFrame, k: int = N_MINHASH, bands: int = LSH_BANDS, threshold: float = 0.2
) -> DataFrame:
    """MinHash+LSH near-dup: band bucket-join for candidates (the scale path —
    no cross join), then estimated Jaccard = matching-minhash fraction."""
    r = k // bands
    sig = minhash_signatures(documents, k)
    buckets = None
    for band in range(bands):
        cols = [f"mh{i}" for i in range(band * r, (band + 1) * r)]
        part = sig.select(
            "doc_id", F.lit(band).alias("band"), F.concat_ws("|", *cols).alias("bkey")
        )
        buckets = part if buckets is None else buckets.unionByName(part)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
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


def _parity_mask(col_name: str) -> F.Column:
    """The 32 hex-nibble parity bits of the named md5 column packed into ONE
    non-negative bigint (bit j = parity of nibble j). The expensive part —
    32 substring+instr probes per value — runs once per DISTINCT token (see
    simhash), not once per (doc, token) occurrence."""
    mask = None
    for j in range(_HALF_BITS):
        nib = F.expr(f"instr('0123456789abcdef', substring({col_name}, {j + 1}, 1)) - 1")
        bit = (nib % 2 == 1).cast("bigint") * F.lit(1 << j)
        mask = bit if mask is None else mask + bit
    return mask


def _half_sig(mask_col: str, prefix: str) -> list[F.Column]:
    """32 majority-vote signature bits from a packed parity-mask column:
    bit j is set iff MORE tokens have parity 1 than parity 0 at position j —
    2·Σ((mask>>j)&1) > count, identical to the former Σ(±1) > 0 formulation
    but over cheap integer shift/and instead of per-row string probing."""
    return [
        (
            2 * F.sum(F.shiftright(F.col(mask_col), j).bitwiseAND(F.lit(1)))
            > F.count(F.lit(1))
        )
        .cast("int")
        .alias(f"{prefix}{j}")
        for j in range(_HALF_BITS)
    ]


def simhash(documents: DataFrame) -> DataFrame:
    """64-bit SimHash over distinct tokens, as two 32-bit halves (sim_hi,
    sim_lo). Bit j of the low half = parity of hex nibble j of md5(token);
    the high half salts the token ('#hi') for 32 more independent bits.
    Width matters at scale: 16-bit signatures give 8-bit pigeonhole chunks →
    256 bucket values → ~N/256 docs per bucket and a squared candidate join
    at 10⁹ docs (VERDICT r03 item 1); 64 bits give 16-bit chunks → 65 536
    values per chunk, keeping buckets bounded.

    Plan (r05 rework of the flagged cost center): the 64 hex-parity probes
    run once per DISTINCT token — a VOCABULARY-bounded dimension packing
    each half into one bigint mask — and the (doc, token) stream joins that
    dimension (broadcast-hinted: vocab-bounded build side, stopword-skewed
    key, the unigram_logprob argument) before a map-side-combinable
    majority vote of shift/and bit extractions. Same signatures bit-for-bit
    as the inline form (the oracle is unchanged); the per-occurrence work
    drops from 64 string probes to 64 integer shifts."""
    t = _tokens(documents).select("doc_id", "token").distinct()
    vocab = (
        t.select("token")
        .distinct()
        .withColumn("hl", F.md5("token"))
        .withColumn("hh", F.md5(F.concat(F.col("token"), F.lit("#hi"))))
        .select("token", _parity_mask("hl").alias("ml"), _parity_mask("hh").alias("mh"))
    )
    j = t.join(F.broadcast(vocab), "token")
    sig = j.groupBy("doc_id").agg(*_half_sig("ml", "hl"), *_half_sig("mh", "hh"))
    lo = sum(F.col(f"hl{j}") * F.lit(2**j) for j in range(_HALF_BITS))
    hi = sum(F.col(f"hh{j}") * F.lit(2**j) for j in range(_HALF_BITS))
    return sig.select(
        "doc_id", hi.cast("bigint").alias("sim_hi"), lo.cast("bigint").alias("sim_lo")
    )


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
    s = simhash(documents)
    n_chunks = max_hamming + 1
    chunk_bits = -(-N_SIMHASH_BITS // n_chunks)  # ceil
    buckets = None
    for j in range(n_chunks):
        a, b = j * chunk_bits, min((j + 1) * chunk_bits, N_SIMHASH_BITS)
        part = s.select(
            "doc_id", "sim_hi", "sim_lo", F.lit(j).alias("chunk"), _chunk_expr(a, b).alias("cval")
        )
        buckets = part if buckets is None else buckets.unionByName(part)
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
    a, b = sel.alias("a"), sel.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
