"""Invariant coverage for the round-6 tokenizer/sampling additions —
the oracle twins prove cross-engine equality; these pin the algebraic
properties that equality alone would not catch if both sides drifted
together."""

from __future__ import annotations

from dc_moving_violations_cloud_etl_spark.queries import get_queries

get_queries()

from dc_moving_violations_cloud_etl_spark.queries.registry import QUERIES  # noqa: E402


def test_negative_samples_shape_and_membership(spark, sf_dir):
    from dc_moving_violations_cloud_etl_spark.queries.corpus_ops import (
        _NEG_K,
        _SKIPGRAM_TOP,
        _uni_words,
    )

    rows = QUERIES["corpus_negative_samples"].build(spark, sf_dir).collect()
    # exactly one negative per (pair, k): the bucketed alias-table
    # lookup must resolve each draw to exactly ONE covering interval
    assert len(rows) == _SKIPGRAM_TOP * _NEG_K
    keys = {(r["rank"], r["k"]) for r in rows}
    assert len(keys) == _SKIPGRAM_TOP * _NEG_K
    vocab = {
        r["w"] for r in _uni_words(spark, sf_dir).select("w").collect()
    }
    for r in rows:
        assert r["neg_word"] in vocab
        assert r["is_collision"] == (
            r["neg_word"] in (r["w1"], r["w2"])
        )


def test_fertility_invariants(spark, sf_dir):
    rows = QUERIES["corpus_tokenizer_fertility"].build(spark, sf_dir).collect()
    by_lang: dict[str, dict[str, object]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["coder"]] = r
    for lang, coders in by_lang.items():
        assert set(coders) == {"bpe", "unigram"}, lang
        # same word universe under both coders; every word >= 1 piece
        assert coders["bpe"]["n_words"] == coders["unigram"]["n_words"]
        for r in coders.values():
            assert r["n_subword_tokens"] >= r["n_words"]
            assert r["fertility_r6"] >= 1.0
