"""Corpus finalization operators (queries/corpus_ops.py) + streaming
dedup: oracle parity at the test SF plus the operator-level invariants
the oracle can't see (determinism under re-partitioning, split ratios,
packing bin budgets)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark.queries.corpus_ops import (
    _PACK_BUDGET,
    _make_pack_fn,
    _pack_sequences,
    _redact_pii,
    _shuffle_split,
)
from dc_moving_violations_cloud_etl_spark.queries.registry import QUERIES, get_queries

from .conftest import assert_df_matches_oracle


def _oracle(name: str) -> str:
    get_queries()
    return QUERIES[name].oracle


def test_shuffle_split_oracle_parity(spark, sf_dir, ddb):
    assert_df_matches_oracle(
        _shuffle_split(spark, sf_dir),
        ddb,
        _oracle("curation_shuffle_split"),
        "curation_shuffle_split",
    )


def test_shuffle_split_invariants(spark, sf_dir):
    df = _shuffle_split(spark, sf_dir).cache()
    try:
        n = df.count()
        # every doc assigned exactly once
        assert df.select("doc_id").distinct().count() == n
        # positions are dense ranks within (split, shard): max == count
        per = (
            df.groupBy("split", "shard")
            .agg(F.count("*").alias("n"), F.max("position").alias("mx"))
            .collect()
        )
        assert all(r["n"] == r["mx"] for r in per)
        # deterministic under re-partitioning (the rand()-split failure mode)
        again = (
            _shuffle_split(spark, sf_dir)
            .repartition(7)
            .select("doc_id", "split", "shard", "position")
        )
        assert (
            df.select("doc_id", "split", "shard", "position")
            .exceptAll(again)
            .count()
            == 0
        )
    finally:
        df.unpersist()


def test_redact_pii_oracle_parity(spark, sf_dir, ddb):
    assert_df_matches_oracle(
        _redact_pii(spark, sf_dir), ddb, _oracle("text_redact_pii"), "text_redact_pii"
    )


def test_redact_pii_fires_on_every_row(spark, sf_dir):
    df = _redact_pii(spark, sf_dir)
    # the injected PII guarantees >=1 of each class per row, and the
    # redacted text must not retain any injected marker
    bad = df.filter(
        (F.col("n_emails") < 1) | (F.col("n_phones") < 1) | (F.col("n_ips") < 1)
    ).count()
    assert bad == 0


def test_pack_sequences_oracle_parity(spark, sf_dir, ddb):
    assert_df_matches_oracle(
        _pack_sequences(spark, sf_dir),
        ddb,
        _oracle("curation_pack_sequences"),
        "curation_pack_sequences",
    )


def test_pack_group_fold():
    import pandas as pd

    fn = _make_pack_fn(10)
    pdf = pd.DataFrame(
        {
            "lang": ["en"] * 5,
            "shard": [0] * 5,
            "doc_id": [1, 2, 3, 4, 5],
            "n_tokens": [4, 4, 4, 12, 1],
        }
    )
    out = fn(pdf)
    # greedy: [4,4]=8 | [4]=4 overflow at 12 -> oversized doc own bin | [1]
    assert list(out["bin_id"]) == [1, 2, 3, 4]
    assert list(out["n_docs"]) == [2, 1, 1, 1]
    assert list(out["bin_tokens"]) == [8, 4, 12, 1]


def test_pack_bins_respect_budget_or_single_doc(spark, sf_dir):
    out = _pack_sequences(spark, sf_dir)
    over = out.filter(
        (F.col("bin_tokens") > _PACK_BUDGET) & (F.col("n_docs") > 1)
    ).count()
    assert over == 0


def test_stream_dedup_watermark_oracle_parity(spark, sf_dir, ddb):
    from dc_moving_violations_cloud_etl_spark.streaming.dedup import dedup_streaming

    assert_df_matches_oracle(
        dedup_streaming(spark, sf_dir),
        ddb,
        _oracle("stream_dedup_watermark"),
        "stream_dedup_watermark",
    )


def _py_wordpiece(word_freq: dict[str, int], rounds: int):
    """Pure-Python WordPiece reference: ##-continuation pre-split,
    likelihood-ratio pair selection, greedy left-to-right non-overlap
    merge — the independent third implementation the Spark trainer and
    the DuckDB oracle are both validated against."""
    seqs = {
        w: [w[0]] + ["##" + c for c in w[1:]] for w in word_freq
    }
    merges = []
    for r in range(1, rounds + 1):
        sym_cnt: dict[str, int] = {}
        pair_cnt: dict[tuple[str, str], int] = {}
        for w, f in word_freq.items():
            s = seqs[w]
            for t in s:
                sym_cnt[t] = sym_cnt.get(t, 0) + f
            for x, y in zip(s, s[1:]):
                pair_cnt[(x, y)] = pair_cnt.get((x, y), 0) + f
        # max(score) with lexicographically-SMALLEST pair tiebreak
        best = min(
            pair_cnt.items(),
            key=lambda kv: (
                -(kv[1] / (sym_cnt[kv[0][0]] * sym_cnt[kv[0][1]])),
                " ".join(kv[0]),
            ),
        )
        (a, b), cnt = best
        score = cnt / (sym_cnt[a] * sym_cnt[b])
        new_token = a + b[2:]
        merges.append((r, f"{a} {b}", new_token, cnt, score))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(new_token)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def test_wordpiece_matches_pure_python_reference(spark, sf_dir):
    from dc_moving_violations_cloud_etl_spark.operators.text import (
        normalized,
        tokens,
    )
    from dc_moving_violations_cloud_etl_spark.queries.corpus_ops import (
        _WP_ROUNDS,
        _wordpiece_core,
    )
    from dc_moving_violations_cloud_etl_spark.queries.extensions import _docs

    wf = {
        r["w"]: r["cnt"]
        for r in _docs(spark, sf_dir)
        .select(F.explode(tokens(normalized(F.col("text")))).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    expected = _py_wordpiece(wf, _WP_ROUNDS)
    got, _ = _wordpiece_core(spark, sf_dir)
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g[:4] == e[:4], (g, e)
        assert abs(g[4] - e[4]) < 1e-15, (g, e)


def test_trainers_break_on_degenerate_corpus(spark, tmp_path):
    """ADVICE r9: a corpus whose words all collapse to single symbols
    leaves no adjacent pairs — the per-round argmax must BREAK (like the
    oracle's recursive CTE, which just stops emitting rows), not raise
    IndexError on an empty collect."""
    import pandas as pd

    from dc_moving_violations_cloud_etl_spark.queries.corpus_ops import (
        _bpe_core,
        _wordpiece_core,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a b c a", "b c a b"],  # every word is one symbol
            "lang": ["en", "en"],
            "source": ["t", "t"],
            "n_chars": [7, 7],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    sf = str(tmp_path)
    bpe_merges, _ = _bpe_core(spark, sf)
    wp_merges, _ = _wordpiece_core(spark, sf)
    assert bpe_merges == []
    assert wp_merges == []
