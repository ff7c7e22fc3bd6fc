"""Incremental dedup over a persisted MinHash signature store (VERDICT r06
item 1) — the step from "operators that run at 100 TB" to "a pipeline that
INGESTS at 100 TB". A real corpus arrives in batches; re-LSHing the whole
corpus per batch is O(corpus) work per O(batch) of new data. This module
persists per-doc MinHash signatures once, at ingest, and each new batch:

  (a) signatures ONLY the new batch (``dedup.minhash_signatures`` with
      ``max_df=None`` — a frozen stored signature must be a PURE function of
      the document, and the df-cap is corpus-dependent: a shingle crossing
      the cap as the corpus grows would silently change already-stored
      docs' signatures);
  (b) candidate-joins new-vs-(stored ∪ new) on the band keys — the SAME
      r=1 single-hash band join as ``dedup.minhash_lsh_pairs``'s auto path,
      but never old-vs-old (those pairs were found when their batches
      ingested — this asymmetry IS the incrementality: per-batch work is
      O(new × collision rate), not O(corpus²));
  (c) MERGEs the keep-list labels through the checkpoint protocol
      (``checkpoint.Lineage`` journal, the ``run_incremental`` pattern):
      signatures append as an immutable ``batch=<id>`` partition, labels
      write as a new snapshot version, and ONE journal commit line flips
      both live — a crash before the commit leaves the previous state
      authoritative and the re-ingest overwrite is idempotent. Re-ingesting
      a committed batch id is a no-op (and raises if its CONTENT changed —
      the same input-signature discipline the transcript checkpoint keeps).

Label maintenance is exact, not approximate: the prior labels collapse every
existing component to a star (member ↔ component edges, diameter ≤ 2), new
candidate pairs are unioned in, and ``curation.connected_components``
min-label propagation re-converges — new edges can MERGE old components (the
keeper re-election property ``curate_pipeline`` tests single-shot). The
equality contract, pinned by test_incremental and the ``dedup_incremental``
driver oracle (brute est-over-all-pairs + WITH RECURSIVE ground truth):
N-batch incremental ingest == ``full_recompute`` over the union corpus,
bit-for-bit, for any batch split and any arrival order.

Reference analog: the AutoUpdate incremental path (main.rs:257-310) — scan
only new logs, merge into standing per-product state; this is its
extras-family twin. Store format: parquet dirs behind the same
``ICTSPARK_FORMAT`` seam as the routed store; on Iceberg the labels snapshot
becomes a MERGE INTO and signatures an append (ICEBERG.md gates).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ictspark.checkpoint import Lineage
from ictspark.extras.curation import connected_components
from ictspark.extras.dedup import (
    AUTO_MAX_K,
    LSH_THRESHOLD,
    minhash_bands_for,
    minhash_rows_for,
    minhash_signatures,
)


def _auto_k(threshold: float) -> int:
    """Signature size for the store at this threshold — auto-derived like
    ``minhash_lsh_pairs``'s no-kwargs path. The store supports ONLY r=1
    (single-hash bands): with r=1 a matching band row IS a matching
    signature position, so est_jaccard comes from counting the candidate
    join in place — no full-signature re-join against the store — and the
    banded result EQUALS the brute est-threshold definition exactly (the
    oracle's form). Thresholds whose auto sizing lands r>1 would need the
    two-phase scoring path; raise rather than silently storing signatures a
    later ingest can't score incrementally."""
    from ictspark.extras.similarity import AUTO_TARGET_RECALL

    r = minhash_rows_for(threshold, AUTO_MAX_K, AUTO_TARGET_RECALL)
    if r != 1:
        raise ValueError(
            f"signature store supports single-hash bands only (r=1); "
            f"threshold={threshold} auto-sizes to r={r} — lower the "
            "threshold or extend the store with the two-phase scoring path"
        )
    return minhash_bands_for(threshold, r, AUTO_TARGET_RECALL)


def _sig_root(store_dir: str) -> str:
    return os.path.join(store_dir, "signatures")


def _labels_path(store_dir: str, version: str) -> str:
    return os.path.join(store_dir, "labels", f"v={version}")


def _lineage(store_dir: str) -> Lineage:
    return Lineage(os.path.join(store_dir, "_ck"))


def _committed(entries: list[dict]) -> list[dict]:
    return [e for e in entries if e.get("status") == "committed"]


def _input_sig(batch_docs: DataFrame) -> tuple[int, int, str]:
    """(row count, distinct doc_id count, content signature) of a batch —
    count + mod-2^31 sum + bit_xor of xxhash64(doc_id, text): exactly
    ``checkpoint._day_stats``'s change-detection algebra (multiset-safe sum
    that can't overflow ANSI bigint below 2^32 rows, plus an independent
    64-bit xor). Any added/removed/edited doc changes it. The distinct count
    rides the same single aggregation — it feeds the within-batch
    duplicate-id guard (code-review r07)."""
    h = F.xxhash64("doc_id", F.coalesce("text", F.lit("\u0000")))
    r = batch_docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("nd"),
        F.coalesce(F.sum(F.pmod(h, F.lit(2**31))), F.lit(0)).alias("s"),
        F.coalesce(F.bit_xor(h), F.lit(0)).alias("x"),
    ).first()
    return int(r["n"]), int(r["nd"]), f"{r['n']}:{r['s']}:{r['x']}"


def _read_labels(spark: SparkSession, store_dir: str, entries: list[dict]) -> DataFrame | None:
    """The labels snapshot the LAST journal commit points at (None before the
    first commit). The journal, not the directory listing, is authoritative —
    a crash after a labels write but before its commit line leaves an orphan
    version dir that is simply never read (and is overwritten idempotently
    when that batch retries)."""
    comm = _committed(entries)
    if not comm:
        return None
    return spark.read.parquet(_labels_path(store_dir, comm[-1]["labels_version"]))


def _band_buckets(sig: DataFrame, k: int) -> DataFrame:
    """(doc_id, band, bkey) bucket rows — r=1: band = signature position,
    bkey = that position's minhash value; one posexplode pass (the
    minhash_lsh_pairs r06 shape)."""
    return sig.select(
        "doc_id", F.posexplode(F.array(*[F.col(f"mh{i}") for i in range(k)])).alias("band", "bkey")
    )


def ingest_batch(
    batch_docs: DataFrame,
    store_dir: str,
    batch_id: str,
    threshold: float = LSH_THRESHOLD,
) -> dict:
    """Ingest one batch of documents into the signature store; returns stats.

    Steps (docstring at module top): signature the batch, candidate-join
    new-vs-(stored ∪ new), union the prior labels' star edges, re-converge
    components, write the new labels snapshot, journal ONE commit. Batch ids
    must be fresh strings (committed ids are idempotently skipped; content
    drift under a reused id raises); doc_ids must be globally unique across
    batches (enforced against the standing labels — a re-pushed doc_id
    would corrupt the frozen signature store, so it fails loudly)."""
    spark = batch_docs.sparkSession
    lin = _lineage(store_dir)
    entries = lin.entries()
    n_docs, n_distinct, sig_str = _input_sig(batch_docs)
    for e in _committed(entries):
        if e["partition"] == batch_id:
            if e.get("input_sig") != sig_str:
                raise ValueError(
                    f"batch {batch_id!r} already committed with different "
                    f"content (stored {e.get('input_sig')}, got {sig_str}): "
                    "batch ids are immutable — use a new id for new data"
                )
            return {"batch": batch_id, "skipped": True, "n_docs": n_docs, "n_new_pairs": 0}
    if n_distinct != n_docs:
        # code-review r07: an internally-duplicated batch (upstream retry
        # glued two files) would otherwise COMMIT — merged signatures,
        # duplicate label rows, n_members=2 singletons — with no error
        raise ValueError(
            f"batch {batch_id!r} contains duplicate doc_ids "
            f"({n_docs} rows, {n_distinct} distinct): doc_ids must be unique"
        )
    t0 = time.time()
    k = _auto_k(threshold)
    # code-review r07: the sizing params are part of the store's identity —
    # mixing thresholds would read truncated signatures (smaller k: silently
    # wrong est) or crash on missing columns (larger k); every commit records
    # (threshold, k) and every ingest must match the store's first commit
    for e in _committed(entries):
        if "k" in e and (e.get("k") != k or e.get("threshold") != threshold):
            raise ValueError(
                f"store {store_dir!r} was built at threshold={e.get('threshold')} "
                f"(k={e.get('k')}); this ingest derives k={k} from "
                f"threshold={threshold} — a store's sizing is immutable, use a "
                "new store for a new threshold"
            )
    prior = _read_labels(spark, store_dir, entries)
    if prior is not None:
        n_overlap = batch_docs.select("doc_id").join(prior, "doc_id", "left_semi").count()
        if n_overlap:
            raise ValueError(
                f"batch {batch_id!r} re-pushes {n_overlap} doc_ids already in "
                "the store: doc_ids must be globally unique across batches"
            )
    # (a) signature ONLY the new batch; write-then-reread so the immutable
    # store partition — not the input frame's lineage — backs everything
    # downstream (and the overwrite makes a crash-retry idempotent)
    sig_path = os.path.join(_sig_root(store_dir), f"batch={batch_id}")
    minhash_signatures(batch_docs, k, max_df=None).write.mode("overwrite").parquet(sig_path)
    sig_new = spark.read.parquet(sig_path)
    # (b) candidates: new-vs-new (canonical a<b) ∪ new-vs-stored (sides
    # disjoint by the uniqueness guard; canonicalized with least/greatest) —
    # NEVER stored-vs-stored. With r=1, counting matching (band, bkey) rows
    # per pair IS the positional-match count, so est = n_matches / k.
    b_new = _band_buckets(sig_new, k)
    a, b = b_new.alias("a"), b_new.alias("b")
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    committed_ids = [e["partition"] for e in _committed(entries)]
    if committed_ids:
        sig_root = _sig_root(store_dir)
        sig_old = (
            spark.read.option("basePath", sig_root)
            .parquet(*[os.path.join(sig_root, f"batch={cid}") for cid in committed_ids])
            .drop("batch")
        )
        o = _band_buckets(sig_old, k).alias("o")
        cross = a.join(
            o, (F.col("a.band") == F.col("o.band")) & (F.col("a.bkey") == F.col("o.bkey"))
        ).select(
            F.least(F.col("a.doc_id"), F.col("o.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("o.doc_id")).alias("doc_b"),
        )
        cand = cand.unionByName(cross)
    new_pairs = (
        cand.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("nm"))
        .where(F.col("nm") / F.lit(float(k)) >= threshold)
        .select("doc_a", "doc_b")
        .persist()
    )
    n_new_pairs = new_pairs.count()
    # (c) exact label maintenance: prior components as stars + new edges,
    # min-label propagation re-converges (old components are diameter ≤ 2,
    # so the loop pays O(1) extra rounds over the new-edge diameter)
    new_ids = batch_docs.select("doc_id")  # NOT sig_new: shingle-less docs
    # have no signature rows but are still corpus members (singletons)
    edges = new_pairs
    nodes = new_ids
    if prior is not None:
        star = prior.where(F.col("doc_id") != F.col("component")).select(
            F.col("doc_id").alias("doc_a"), F.col("component").alias("doc_b")
        )
        edges = edges.unionByName(star)
        nodes = prior.select("doc_id").unionByName(new_ids)
    # persist + materialize the symmetric edges before CC (the
    # dedup_components pattern — code-review r07: un-persisted, every
    # O(diameter) propagation round re-ran this union+distinct shuffle and
    # re-read the prior labels parquet)
    sym = (
        edges.unionByName(
            edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .distinct()
        .persist()
    )
    sym.count()
    new_pairs.unpersist()
    try:
        labels = connected_components(nodes, sym)
    finally:
        sym.unpersist()
    labels.write.mode("overwrite").parquet(_labels_path(store_dir, batch_id))
    labels.unpersist()
    lin.commit(
        batch_id,
        rows=n_docs,
        input_sig=sig_str,
        n_new_pairs=n_new_pairs,
        labels_version=batch_id,
        threshold=threshold,
        k=k,
        duration_s=round(time.time() - t0, 3),
    )
    # prune superseded labels snapshots (code-review r07: O(corpus) rows per
    # snapshot × one snapshot per batch grows without bound; only the last
    # committed version is ever read). Keep the new current AND its immediate
    # predecessor — a reader that grabbed a frame just before this ingest
    # stays valid; anything older is unreachable via the journal.
    import shutil

    prev_versions = [e["labels_version"] for e in _committed(entries)]
    keep_versions = {batch_id} | set(prev_versions[-1:])
    for v in set(prev_versions) - keep_versions:
        shutil.rmtree(_labels_path(store_dir, v), ignore_errors=True)
    return {"batch": batch_id, "skipped": False, "n_docs": n_docs, "n_new_pairs": n_new_pairs}


def ingest_stream(
    stream_docs: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    threshold: float = LSH_THRESHOLD,
    available_now: bool = True,
):
    """The ingest path AS A STREAM (r07): a Structured Streaming document
    source drained into the signature store through ``foreachBatch``, one
    ``ingest_batch`` per micro-batch with ``batch_id = f"s{epoch_id:09d}"``.

    Exactly-once by COMPOSITION, not by a new mechanism: Spark replays a
    failed epoch under the SAME epoch_id with the SAME source offsets, so a
    retry re-enters ``ingest_batch`` under an already-committed batch id with
    identical content and hits the journal's idempotent skip; a crash BEFORE
    the store commit re-runs the whole ingest whose writes are overwrite-
    idempotent. The two journals (Spark's streaming checkpoint and the
    store's lineage) never disagree observably: the store journal is the
    authoritative one, and the streaming checkpoint only ever re-offers work
    the store either skips or safely redoes. This is the same double-journal
    argument ``checkpoint.run_incremental`` makes for the transcript store
    (checkpoint.py:208), applied to the curation family.

    Empty micro-batches return without touching the journal (availableNow
    commonly emits one). The returned ``StreamingQuery`` is live; with the
    default availableNow trigger it self-terminates when the source is
    drained — ``query.awaitTermination()`` then read ``keep_list``.

    Scale shape: identical to batch ingest — per-epoch work is
    O(batch × collision rate) regardless of store size, so a continuous
    trigger gives standing near-dup maintenance over an arriving corpus with
    no recompute. Store-side guards (content drift, duplicate/re-pushed
    doc_ids, sizing immutability) fail the QUERY loudly rather than commit
    corruption — upstream must fix the feed, exactly like the batch path."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_batch(batch_df, store_dir, f"s{epoch_id:09d}", threshold)

    writer = (
        stream_docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def components(spark: SparkSession, store_dir: str) -> DataFrame:
    """Current (doc_id, component) labels — the last committed snapshot."""
    labels = _read_labels(spark, store_dir, _lineage(store_dir).entries())
    if labels is None:
        raise ValueError(f"signature store {store_dir!r} has no committed batches")
    return labels


def keep_list(spark: SparkSession, store_dir: str) -> DataFrame:
    """The standing keep/drop decision over everything ingested so far:
    (doc_id, component, n_members, keep) — ``curation.dedup_keep_list``'s
    output shape, read from the store instead of recomputed."""
    from ictspark.extras.curation import keep_columns

    return keep_columns(components(spark, store_dir))


def full_recompute(documents: DataFrame, threshold: float = LSH_THRESHOLD) -> DataFrame:
    """One-shot ground truth for the equality contract: the same keep list
    computed from scratch over the whole corpus — uncapped LSH pairs
    (matching the store's pure-per-doc signatures) → connected components →
    min-id keeper. ``curation.dedup_keep_list`` minus the df-cap."""
    from ictspark.extras.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(documents, threshold=threshold, max_df=None).persist()
    sym = (
        pairs.select("doc_a", "doc_b")
        .unionByName(pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
        .distinct()
        .persist()
    )
    sym.count()
    pairs.unpersist()
    try:
        labels = connected_components(documents.select("doc_id"), sym)
    finally:
        sym.unpersist()
    from ictspark.extras.curation import keep_columns

    out = keep_columns(labels).localCheckpoint(eager=True)
    labels.unpersist()
    return out


def incremental_keep_list_demo(
    spark: SparkSession,
    documents: DataFrame,
    n_batches: int = 3,
    threshold: float = LSH_THRESHOLD,
    store_dir: str | None = None,
) -> DataFrame:
    """The graded driver entry (``dedup_incremental``): split the corpus into
    ``n_batches`` deterministic arrival batches (doc_id mod — interleaved,
    so near-dup pairs routinely STRADDLE batches and the new-vs-stored join
    is genuinely exercised), ingest them in order into a store, and return
    the standing keep list. Its oracle is the brute est-over-all-pairs +
    WITH RECURSIVE ground truth over the whole corpus (uncapped) — the
    driver's hash match proves the batched ingest path equals the one-shot
    definition.

    The default store dir is DETERMINISTIC in (corpus content, n_batches,
    threshold) — code-review r07: a fresh mkdtemp per invocation left one
    full signature store per grading/parity run accumulating under /tmp;
    keyed on the content signature, a re-run on the same corpus re-enters
    the same store and every ingest is an idempotent journal skip (which
    also exercises the resume path for free)."""
    import hashlib
    import tempfile

    store = store_dir
    if store is None:
        _, _, sig_str = _input_sig(documents)
        key = hashlib.md5(f"{sig_str}|{n_batches}|{threshold}".encode()).hexdigest()[:12]
        store = os.path.join(tempfile.gettempdir(), f"ictspark_incr_demo_{key}")
    for i in range(n_batches):
        ingest_batch(
            documents.where(F.col("doc_id") % n_batches == i), store, f"b{i:03d}", threshold
        )
    return keep_list(spark, store)
