"""Text-analysis functions on real-language samples (the oracle query
covers cross-engine parity; these pin semantic behavior)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.functions.text import (
    bpe_ish_token_count,
    lang_id,
    quality_score,
    token_count,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(
        col(F.col("text")).alias("v")
    ).collect()[0].v


def test_lang_id_on_real_sentences(spark):
    samples = {
        "the cat is in the house and it is warm for now": "en",
        "der Hund ist nicht mit der Katze und das ist gut": "de",
        "le chat est dans la maison et il est content pour le moment": "fr",
        "el perro es grande y la casa es una de las mejores": "es",
        "xyzzy plugh qwerty asdf": "und",
    }
    for text, want in samples.items():
        assert _one(spark, text, lang_id) == want, text


def test_token_counts(spark):
    assert _one(spark, "a b  c", token_count) == 3  # double space: no empty token
    assert _one(spark, "", token_count) == 0
    # BPE-ish: words + standalone symbols
    assert _one(spark, "hello, world!", bpe_ish_token_count) == 4


def test_quality_score_ordering(spark):
    good = "the quick brown fox jumps over the lazy dog and it is a fine day " * 10
    bad = "1234 5678 !!! ??? ;;; 000 111" * 10
    assert _one(spark, good, quality_score) > _one(spark, bad, quality_score)


def test_quality_score_bounded(spark):
    for text in ["", "a", "the " * 500, "!!!!" * 100]:
        v = _one(spark, text, quality_score)
        assert v is None or 0.0 <= v <= 1.0
