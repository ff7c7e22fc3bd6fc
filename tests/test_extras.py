"""Training-data extras: dedup/similarity/textstats/multimodal invariants."""

import os

import pytest
from pyspark.sql import functions as F

from ictspark import io, synth
from ictspark.extras import dedup, multimodal, similarity, textstats

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return io.load_table(spark, SF, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return io.load_table(spark, SF, "embeddings").cache()


def test_dedup_exact_partitions_docs(docs):
    groups = dedup.dedup_exact(docs)
    total = groups.agg(F.sum("n_docs")).first()[0]
    assert total == docs.count()
    assert groups.where(F.col("keeper").isNull()).count() == 0


def test_ngram_jaccard_bounds(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.1)
    bad = pairs.where((F.col("jaccard") < 0.1) | (F.col("jaccard") > 1.0)).count()
    assert bad == 0
    assert pairs.where(F.col("doc_a") >= F.col("doc_b")).count() == 0


def test_minhash_est_tracks_true_jaccard(docs):
    """LSH candidate pairs' estimated jaccard correlates with true jaccard."""
    true = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    est = dedup.minhash_lsh_pairs(docs, threshold=0.3).collect()
    assert len(est) > 0
    for r in est:
        t = true.get((r["doc_a"], r["doc_b"]), 0.0)
        assert t > 0.05, f"LSH flagged an unrelated pair {r}"


def test_simhash_is_16bit(docs):
    s = dedup.simhash(docs)
    assert s.where((F.col("simhash") < 0) | (F.col("simhash") >= 2**16)).count() == 0


def test_ann_bruteforce_shape(emb):
    r = similarity.ann_bruteforce(emb)
    per_q = r.groupBy("q_id").count().collect()
    assert all(row["count"] == similarity.TOP_K for row in per_q)
    assert len(per_q) == similarity.N_QUERIES
    # ranks are dense 1..k with sims non-increasing
    from pyspark.sql import Window
    w = Window.partitionBy("q_id").orderBy("rank")
    bad = r.withColumn("prev", F.lag("sim").over(w)).where(F.col("prev") < F.col("sim")).count()
    assert bad == 0


def test_ann_bucketed_subset_of_bruteforce_space(emb):
    r = similarity.ann_bucketed(emb)
    assert r.where(F.col("rank") > 3).count() == 0
    assert r.count() > 0


def test_doc_stats_sane(docs):
    s = textstats.doc_stats(docs)
    assert s.where(F.col("n_tokens") <= 0).count() == 0
    assert s.where((F.col("stopword_ratio") < 0) | (F.col("stopword_ratio") > 1)).count() == 0
    assert s.count() == docs.count()


def test_fingerprint_distinct(docs):
    fp = textstats.fingerprint(docs)
    assert fp.select("fp").distinct().count() == docs.select("text").distinct().count()


def test_lang_id_outputs_known_langs(docs):
    out = textstats.lang_id(docs)
    langs = {r["lang_pred"] for r in out.select("lang_pred").distinct().collect()}
    assert langs <= {"en", "de", "fr", "es", "zh", "und"}
    assert out.count() == docs.count()


@pytest.fixture(scope="module")
def media(spark):
    d = synth.ensure_media("sf0.01")
    return spark.read.parquet(os.path.join(d, "media.parquet")).cache()


def test_media_featurize_matches_payload(media):
    f = multimodal.featurize(media)
    j = f.join(media.select("media_id", F.length("payload").alias("true_bytes")), "media_id")
    assert j.where(F.col("n_bytes") != F.col("true_bytes")).count() == 0
    assert f.count() == media.count()


def test_media_decode_stub_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|decode requires"):
        multimodal.featurize(media, fake_decode=False).collect()


def test_frame_plan_steps(media):
    p = multimodal.frame_sample_plan(media, every_n=30)
    assert p.where(F.col("frame_idx") % 30 != 0).count() == 0
    assert p.count() > 0
