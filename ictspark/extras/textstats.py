"""Text-analysis operators for a training-data pipeline over `documents`.

All built-in-function implementations (JVM-side); the language-ID heuristic is
the one deliberately non-SQL-expressible op (character n-gram scoring in a
pandas UDF) and gets a rows-only driver check.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

# BPE-ish token classes: letter runs, digit runs, single non-alnum glyphs
TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def doc_stats(documents: DataFrame) -> DataFrame:
    """Quality-scoring features: token counts, lengths, stopword ratio."""
    toks = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)).alias("n_bpe_tokens"),
        F.round(
            F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))) / F.size(toks), 4
        ).alias("stopword_ratio"),
        F.round(F.length("text") / F.size(toks), 4).alias("avg_token_len"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Composite quality score (length-normalized + stopword sanity band)."""
    s = doc_stats(documents)
    return s.select(
        "doc_id",
        F.round(
            F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * 0.5
            + F.when((F.col("stopword_ratio") > 0.01) & (F.col("stopword_ratio") < 0.6), 0.3)
            .otherwise(0.0)
            + F.when((F.col("avg_token_len") > 3) & (F.col("avg_token_len") < 12), 0.2)
            .otherwise(0.0),
            4,
        ).alias("quality"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of normalized text (portable across engines)."""
    return documents.select(
        "doc_id", F.md5(F.lower(F.trim("text"))).alias("fp")
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Language-ID via character-bigram profile scoring (pandas UDF; the
    deliberately non-SQL-expressible op → rows-only driver check).

    Deterministic: profiles are fixed tables, scoring is argmax with
    lexicographic tie-break.
    """
    from pyspark.sql.functions import pandas_udf

    PROFILES = {
        "en": ["th", "he", "in", "er", "an"],
        "de": ["en", "er", "ch", "de", "ei"],
        "fr": ["es", "le", "de", "en", "re"],
        "es": ["de", "la", "os", "en", "es"],
        "zh": ["zh", "ng", "sh", "ia", "ao"],
    }

    @pandas_udf("string")
    def _pred(texts: pd.Series) -> pd.Series:
        low = texts.fillna("").str.lower()

        def score(t: str) -> str:
            best, best_s = "und", -1.0
            for lang in sorted(PROFILES):
                s = sum(t.count(bg) for bg in PROFILES[lang]) / (len(t) + 1)
                if s > best_s:
                    best, best_s = lang, s
            return best

        return low.map(score)

    return documents.select("doc_id", "lang", _pred(F.col("text")).alias("lang_pred"))


def rolling_fingerprint(documents: DataFrame, k: int = 8) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-style): minimum md5 over
    all k-char shingles — robust to local edits, unlike the whole-text md5.
    Engine-portable: both Spark and DuckDB compute min(md5(substr(text,i,k)))."""
    pos = F.explode(F.sequence(F.lit(1), F.greatest(F.length("text") - (k - 1), F.lit(1))))
    return (
        documents.select("doc_id", "text", pos.alias("p"))
        .select("doc_id", F.md5(F.expr(f"substring(text, p, {k})")).alias("h"))
        .groupBy("doc_id")
        .agg(F.min("h").alias("rfp"))
    )
