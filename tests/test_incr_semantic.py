"""Incremental semantic dedup over the persisted assignment store (VERDICT
r07 item 6): N-batch ingest must equal the one-shot SemDeDup keep list
bit-for-bit (fixed centroids pinned), including a late-arriving LOW vec_id
flipping an already-stored keeper; the store must refuse drift loudly."""

import pytest
from pyspark.sql import functions as F

from ictspark import io
from ictspark.extras import incr_semantic, similarity

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return io.load_table(spark, SF, "embeddings").cache()


def _kl(df):
    return sorted((r["vec_id"], r["cent_id"], r["keep"]) for r in df.collect())


def test_incremental_equals_one_shot(spark, emb, tmp_path_factory):
    """3 interleaved batches == one-shot semantic_keep_list, and a different
    split/arrival order converges to the identical list."""
    cents = similarity.fixed_centroids(emb)
    full = _kl(similarity.semantic_keep_list(emb, centroids=cents))
    store3 = str(tmp_path_factory.mktemp("sem3"))
    stats = [
        incr_semantic.ingest_vectors(
            emb.where(F.col("vec_id") % 3 == i), store3, f"b{i:03d}", centroids=cents
        )
        for i in range(3)
    ]
    assert sum(s["n_vecs"] for s in stats) == emb.count()
    assert any(s["n_new_pairs"] > 0 for s in stats[1:])  # cross-batch pairs found
    assert _kl(incr_semantic.semantic_keep_read(spark, store3)) == full
    store2 = str(tmp_path_factory.mktemp("sem2"))
    for i in (1, 0):  # different split AND arrival order
        incr_semantic.ingest_vectors(
            emb.where(F.col("vec_id") % 2 == i), store2, f"half{i}", centroids=cents
        )
    assert _kl(incr_semantic.semantic_keep_read(spark, store2)) == full


def test_late_low_id_flips_stored_keeper(spark, emb, tmp_path_factory):
    """The greedy rule's cross-batch property: a stored vector that was a
    keeper is flipped to dropped when a LOWER-id near-duplicate arrives in a
    later batch — the pair lands with the stored id as vec_b."""
    cents = similarity.fixed_centroids(emb)
    full = similarity.semantic_keep_list(emb, centroids=cents)
    # pick a dropped vector whose ONLY qualifying lower-id neighbor is lo
    # (ADVICE r08: an arbitrary pair let another lower-id neighbor drop hi
    # already in batch 1, making the flip check vacuous — this filter
    # guarantees hi is a KEEPER mid-stream, so the flip is exercised)
    pairs = similarity.semantic_dup_pairs(emb, centroids=cents)
    pick = (
        pairs.groupBy("vec_b")
        .agg(F.count(F.lit(1)).alias("n"), F.min("vec_a").alias("lo"))
        .where(F.col("n") == 1)
        .orderBy("vec_b")
        .first()
    )
    assert pick is not None, "corpus has no single-neighbor dropped vector"
    lo, hi = pick["lo"], pick["vec_b"]
    store = str(tmp_path_factory.mktemp("semflip"))
    # batch 1: everything EXCEPT the low endpoint -> hi may be kept
    incr_semantic.ingest_vectors(
        emb.where(F.col("vec_id") != lo), store, "first", centroids=cents
    )
    mid = {r["vec_id"]: r["keep"] for r in incr_semantic.semantic_keep_read(spark, store).collect()}
    assert mid[hi] == 1  # hi IS a keeper before lo arrives — flip guaranteed
    # batch 2: the low endpoint arrives -> hi must flip to dropped
    incr_semantic.ingest_vectors(
        emb.where(F.col("vec_id") == lo), store, "second", centroids=cents
    )
    fin = {r["vec_id"]: r["keep"] for r in incr_semantic.semantic_keep_read(spark, store).collect()}
    assert fin[hi] == 0  # the keeper flipped
    oracle = {r["vec_id"]: r["keep"] for r in full.collect()}
    assert fin == oracle


def test_empty_batch_ingests(spark, emb, tmp_path_factory):
    """ADVICE r08: an EMPTY embedding batch's partitionBy write leaves no
    data files — the read-back and every later multi-path stored read must
    survive it (same latent pattern as the sig store's shingle-less batch)."""
    cents = similarity.fixed_centroids(emb)
    store = str(tmp_path_factory.mktemp("semempty"))
    empty = emb.where(F.lit(False))
    s = incr_semantic.ingest_vectors(empty, store, "e0", centroids=cents)
    assert not s["skipped"] and s["n_vecs"] == 0 and s["n_new_pairs"] == 0
    # keep_read over an all-empty store is loud, not a schema crash
    with pytest.raises(ValueError, match="no ingested vectors"):
        incr_semantic.semantic_keep_read(spark, store)
    # a real batch after the empty one reads THROUGH the empty partition
    incr_semantic.ingest_vectors(emb, store, "all", centroids=cents)
    # ...and a trailing empty batch with a non-empty store behind it
    incr_semantic.ingest_vectors(empty, store, "e1", centroids=cents)
    assert _kl(incr_semantic.semantic_keep_read(spark, store)) == _kl(
        similarity.semantic_keep_list(emb, centroids=cents)
    )


def test_store_guards(spark, emb, tmp_path_factory):
    cents = similarity.fixed_centroids(emb)
    store = str(tmp_path_factory.mktemp("semg"))
    b0 = emb.where(F.col("vec_id") % 3 == 0)
    incr_semantic.ingest_vectors(b0, store, "b0", centroids=cents)
    # committed-id re-ingest with identical content: idempotent skip
    again = incr_semantic.ingest_vectors(b0, store, "b0", centroids=cents)
    assert again["skipped"]
    # same id, different content: loud
    with pytest.raises(ValueError, match="different content"):
        incr_semantic.ingest_vectors(
            emb.where(F.col("vec_id") % 3 == 1), store, "b0", centroids=cents
        )
    # sizing immutability
    with pytest.raises(ValueError, match="immutable"):
        incr_semantic.ingest_vectors(
            emb.where(F.col("vec_id") % 3 == 1), store, "b1",
            centroids=cents, threshold=0.9,
        )
    # centroid pinning: a different quantizer is refused
    with pytest.raises(ValueError, match="centroid"):
        incr_semantic.ingest_vectors(
            emb.where(F.col("vec_id") % 3 == 1), store, "b1",
            centroids=similarity.fixed_centroids(emb, k=8),
        )
    # duplicate vec_ids inside one batch
    with pytest.raises(ValueError, match="duplicate"):
        incr_semantic.ingest_vectors(
            b0.unionByName(b0.limit(1)), store, "b2", centroids=cents
        )
    # re-pushing an already-stored vec_id in a NEW batch
    with pytest.raises(ValueError, match="re-pushes"):
        incr_semantic.ingest_vectors(b0.limit(1), store, "b3", centroids=cents)
    # first ingest without centroids
    with pytest.raises(ValueError, match="first ingest"):
        incr_semantic.ingest_vectors(b0, str(tmp_path_factory.mktemp("semx")), "b0")
