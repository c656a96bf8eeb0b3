"""Curation-pipeline operator tests: the mechanics the oracle-parity
sweep can't see — merge associativity of the foreachBatch upsert state,
quantization edge cases, sampling determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark import catalog
from dc_moving_violations_cloud_etl_spark.streaming.upsert import _batch_aggregate


def _final(df):
    return df.select(
        "user_id",
        F.col("last.ts").alias("ts"),
        F.col("last.event_id").alias("event_id"),
        F.col("n_events").cast("long").alias("n_events"),
    )


def test_foreachbatch_merge_state_is_associative(spark, sf_dir):
    """Any micro-batch slicing of the input must produce the same store:
    merge(agg(A), agg(B)) == agg(A ∪ B). This is the property that makes
    the foreachBatch upsert correct under arbitrary trigger slicing."""
    ev = catalog.base(spark, sf_dir, "events")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)

    merged_sliced = (
        _batch_aggregate(a)
        .unionByName(_batch_aggregate(b))
        .groupBy("user_id")
        .agg(F.max("last").alias("last"), F.sum("n_events").alias("n_events"))
    )
    merged_once = _batch_aggregate(ev)

    got = sorted(map(tuple, _final(merged_sliced).collect()))
    want = sorted(map(tuple, _final(merged_once).collect()))
    assert got == want and len(got) > 0


def test_quantize_int8_edges(spark, sf_dir, tmp_path):
    """Zero vectors quantize to all-zero (no div-by-zero); values at the
    scale extreme hit exactly ±127; reconstruction stays within scale/2."""
    from dc_moving_violations_cloud_etl_spark.queries.curation import (
        quantize_int8_frame,
    )

    # the frame-level core accepts any dimensionality; the registered
    # query's 64-dim ingestion filter is covered by the driver sims
    emb = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 0.0]),  # zero vector
            (2, [1.0, -1.0, 0.5]),  # symmetric extremes
            (3, [0.1, 0.2, -0.4]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in quantize_int8_frame(emb).collect()}

    assert out[1]["q_sum"] == 0 and out[1]["q_min"] == 0 and out[1]["q_max"] == 0
    # [1, -1, 0.5] at scale 1/127 → [127, -127, 64 (63.5 rounds up)]
    assert out[2]["q_max"] == 127 and out[2]["q_min"] == -127
    assert out[2]["q_sum"] == 64
    # [0.1, 0.2, -0.4] at scale 0.4/127: 0.2/(0.4/127) is 63.4999…
    # in IEEE doubles (not the real-arithmetic 63.5) → floor(+0.5) = 63.
    # Deterministic: identical double sequence in Spark and the oracle.
    assert (out[3]["q_min"], out[3]["q_max"], out[3]["q_sum"]) == (-127, 63, -32)


def test_stratified_sample_deterministic(spark, sf_dir):
    """Hash-mod sampling is reproducible run-to-run and never exceeds
    the stratum size."""
    from dc_moving_violations_cloud_etl_spark.queries.curation import (
        _stratified_sample,
    )

    r1 = sorted(map(tuple, _stratified_sample(spark, sf_dir).collect()))
    r2 = sorted(map(tuple, _stratified_sample(spark, sf_dir).collect()))
    assert r1 == r2 and len(r1) > 0
    for _lang, n_docs, n_sampled in r1:
        assert 0 <= n_sampled <= n_docs


def _stage_dirty_docs(spark, tmp_path):
    """A corpus fixture with the inputs the shipped fixtures never
    contain: a short (<5 token) doc and a NULL-text doc."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 46),
            (2, "tiny doc", "en", "s", 8),
            (3, None, "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "dirty")
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_ngram_novelty_short_and_null_docs(spark, tmp_path):
    """Docs with <= 4 tokens contribute NO 5-grams (pre-fix: Spark's
    descending sequence(1, 0) made slice(w, 0, 5) a runtime error) and
    NULL texts contribute nothing (r10 review findings)."""
    from dc_moving_violations_cloud_etl_spark.queries import registry

    q = registry.get_queries()["doc_ngram_novelty"]
    rows = {r["doc_id"]: r for r in q(spark, _stage_dirty_docs(spark, tmp_path)).collect()}
    assert 1 in rows and rows[1]["n_grams"] == 4  # 8 tokens -> 4 grams
    assert 2 not in rows and 3 not in rows


def test_udtf_chunks_skip_null_text(spark, tmp_path):
    """The UDTF chunk plan must contribute NOTHING for a NULL-text doc,
    matching the declarative twin (pre-fix it fabricated a 1-token
    chunk, r10 review finding)."""
    from dc_moving_violations_cloud_etl_spark.queries import registry

    d = _stage_dirty_docs(spark, tmp_path)
    qs = registry.get_queries()
    udtf_rows = {
        r["lang"]: r for r in qs["udtf_chunk_explode"](spark, d).collect()
    }
    plan_rows = {
        r["lang"]: r for r in qs["curation_chunk_plan"](spark, d).collect()
    }
    # doc 1 (8 tokens) and doc 2 (2 tokens) chunk; doc 3 contributes 0
    assert udtf_rows.keys() == plan_rows.keys() == {"en"}
    assert (
        udtf_rows["en"]["total_chunk_tokens"]
        == plan_rows["en"]["total_chunk_tokens"]
    )


def test_pack_and_sample_tolerate_dirty_docs(spark, tmp_path):
    """pack_sequences crashed on int(NaN) for NULL-text docs and
    weighted_sample handed NULL clocks the top-k slots under Spark's
    NULLS-FIRST ASC (the oracle sorts them last) — both r10 review
    findings."""
    from dc_moving_violations_cloud_etl_spark.queries import registry

    d = _stage_dirty_docs(spark, tmp_path)
    qs = registry.get_queries()
    packed = qs["curation_pack_sequences"](spark, d).collect()
    assert sum(r["n_docs"] for r in packed) == 2  # doc 3 (NULL) excluded
    sample = qs["corpus_weighted_sample"](spark, d).collect()
    assert [r["doc_id"] for r in sample][-1] == 3  # NULL clock sorts LAST
    assert sample[-1]["clock_r10"] is None


def test_rank_metrics_exclude_unscored_docs(spark, tmp_path):
    """AUC and Spearman exclude docs whose signal is NULL: keeping the
    NULL group ranked it at OPPOSITE ends in Spark (NULLS FIRST) vs the
    DuckDB oracle (NULLS LAST), shifting every midrank/rank (r10 review
    findings)."""
    from dc_moving_violations_cloud_etl_spark.queries import registry

    docs = spark.createDataFrame(
        [
            (1, "the of and a to in is it for on repeated words", "en", "s", 40),
            (2, "zebra quark nebula doldrum vortex plinth oboe klaxon mirth jute", "de", "s", 40),
            (3, None, "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "ranky")
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
    qs = registry.get_queries()
    auc = qs["eval_auc_quality_gate"](spark, d).collect()[0]
    assert auc["n_pos"] + auc["n_neg"] == 2  # NULL-score doc excluded
    sp = qs["eval_spearman_signals"](spark, d).collect()[0]
    assert sp["n_docs"] == 2
