"""Evaluation-pipeline and spectral operators (round 6, second batch):
the measurement layer a training-data engine feeds — generation-quality
metrics (ROUGE-n overlap, pass@k), selection-policy evaluation
(best-of-n reward curves), classifier trust (calibration / ECE), plus
two heavyweight distributed algorithms: covariance PCA by power
iteration and suffix-array construction by prefix doubling.

The reference's surface (sql/analysis_queries.sql:5-91) stops at
GROUP-BY analytics; these extend the engine's LLM-data-pipeline layer
(SURVEY.md extension surface) where model outputs and data-selection
policies get EVALUATED, each as pure DataFrame ops with a DuckDB
oracle twin.

Shared numeric posture: every score is either integer-exact (counts,
micro-unit loadings, suffix ranks) or a single/bounded chain of IEEE
double ops over exact inputs, rounded before any ordering or
comparison — the same round-before-compare discipline as the rest of
the registry (see datasel_ops module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import caching
from ..expressions import wide_product
from ..operators.ranking import global_topk
from ..operators.text import STOPWORDS, normalized, tokens
from .datasel_ops import NB_SCORED_CTE, nb_scored
from .extensions import _docs, _emb
from .registry import QuerySpec, register

_TOKS_CTE = r"""
WITH toks AS (
  SELECT doc_id, lang,
         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')),
                      ' ') AS t
  FROM documents
)
"""


def _bigrams(t: F.Column) -> F.Column:
    """Distinct token-bigram set of a token array (the ROUGE-2 unit)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat(
            F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)
        ),
    )
    return F.array_distinct(
        F.when(F.size(t) > 1, grams).otherwise(F.array().cast("array<string>"))
    )


# ---------------------------------------------------------------------------
# ROUGE-2 overlap between candidate/reference document pairs
# ---------------------------------------------------------------------------


def _rouge_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 (distinct-bigram precision/recall/F1) over deterministic
    candidate/reference pairs — each doc scored against the NEXT doc of
    the same language (the fixture's stand-in for a generated-output /
    reference-output pair table; a real eval run joins candidates to
    references on example_id and reuses this exact plan).

    100 TB shape: the bigram sets are per-row ARRAY columns built by a
    ``transform`` fused into the scan — set intersection is
    ``array_intersect`` inside whole-stage codegen, so the pair scoring
    is shuffle-free; the only shuffles are the lang-keyed pairing
    window and the final per-lang aggregate. No explode, no join of
    corpus against corpus.
    """
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", _bigrams(tokens(normalized(F.col("text")))).alias("cb")
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    pairs = (
        d.withColumn("rb", F.lead("cb").over(w))
        .where(F.col("rb").isNotNull())
        .withColumn("ov", F.size(F.array_intersect("cb", "rb")))
        .withColumn(
            "p",
            F.when(F.size("cb") > 0, F.col("ov") / F.size("cb")).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn(
            "r",
            F.when(F.size("rb") > 0, F.col("ov") / F.size("rb")).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn(
            "f1",
            F.when(
                F.col("p") + F.col("r") > 0.0,
                2.0 * F.col("p") * F.col("r") / (F.col("p") + F.col("r")),
            ).otherwise(F.lit(0.0)),
        )
    )
    return (
        pairs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.avg("p"), 6).alias("rouge2_precision"),
            F.round(F.avg("r"), 6).alias("rouge2_recall"),
            F.round(F.avg("f1"), 6).alias("rouge2_f1"),
        )
        .orderBy("lang")
    )


register(
    QuerySpec(
        "eval_rouge2_pairs",
        _rouge_bigram,
        _TOKS_CTE
        + """
, grams AS (
  SELECT doc_id, lang,
         list_distinct(CASE WHEN len(t) > 1 THEN
           list_transform(generate_series(1, len(t)-1),
                          i -> t[i] || ' ' || t[i+1])
           ELSE [] END) AS cb
  FROM toks
),
pairs AS (
  SELECT lang, cb,
         lead(cb) OVER (PARTITION BY lang ORDER BY doc_id) AS rb
  FROM grams
),
scored AS (
  SELECT lang,
         CASE WHEN len(cb) > 0
              THEN len(list_intersect(cb, rb)) / CAST(len(cb) AS DOUBLE)
              ELSE 0.0 END AS p,
         CASE WHEN len(rb) > 0
              THEN len(list_intersect(cb, rb)) / CAST(len(rb) AS DOUBLE)
              ELSE 0.0 END AS r
  FROM pairs WHERE rb IS NOT NULL
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_pairs,
       round(avg(p), 6) AS rouge2_precision,
       round(avg(r), 6) AS rouge2_recall,
       round(avg(CASE WHEN p + r > 0.0 THEN 2.0*p*r/(p+r)
                      ELSE 0.0 END), 6) AS rouge2_f1
FROM scored GROUP BY lang ORDER BY lang
""",
        doc="ROUGE-2 distinct-bigram precision/recall/F1 over "
        "deterministic same-lang candidate/reference doc pairs — the "
        "generation-eval overlap metric as pure array expressions "
        "(array_intersect in codegen, no explode, no corpus join)",
        tags=("extension", "eval", "text", "metric"),
    )
)


# ---------------------------------------------------------------------------
# Best-of-n selection: the BoN reward curve
# ---------------------------------------------------------------------------

_BON_BUCKETS = 48
_BON_NS = (1, 2, 4, 8)


def _bon_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n rejection-sampling gain curve: candidates grouped into
    deterministic md5 "prompt" buckets, scored by type-token ratio (the
    stand-in reward model), drawn in seed-free md5 order; for each
    n ∈ {1,2,4,8} the selected reward is the max over the first n draws
    — the measured BoN curve that sizes how many samples per prompt a
    rejection-sampling pipeline should pay for.

    One ranking pass serves every n (max over ``CASE WHEN rn <= n``),
    so the curve costs a single prompt-keyed window + one aggregate —
    at 100 TB the window key is the real prompt id and the plan is
    unchanged.
    """
    d = _docs(spark, sf_dir).select(
        "doc_id", tokens(normalized(F.col("text"))).alias("t")
    )
    scored = d.select(
        "doc_id",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit("g:"), F.col("doc_id").cast("string"))), 1, 8),
                16,
                10,
            ).cast("long"),
            F.lit(_BON_BUCKETS),
        ).alias("prompt"),
        F.md5(F.concat(F.lit("d:"), F.col("doc_id").cast("string"))).alias("draw"),
        (
            F.size(F.array_distinct("t")).cast("double")
            / F.size("t").cast("double")
        ).alias("reward"),
    )
    w = Window.partitionBy("prompt").orderBy("draw", "doc_id")
    ranked = scored.withColumn("rn", F.row_number().over(w))
    per_prompt = ranked.groupBy("prompt").agg(
        F.count(F.lit(1)).alias("n_cand"),
        *[
            F.max(F.when(F.col("rn") <= n, F.col("reward"))).alias(f"b{n}")
            for n in _BON_NS
        ],
    ).where(F.col("n_cand") >= max(_BON_NS))
    curve = per_prompt.agg(
        F.count(F.lit(1)).cast("long").alias("n_prompts"),
        *[F.avg(f"b{n}").alias(f"m{n}") for n in _BON_NS],
    )
    stack_expr = ", ".join(f"{n}, m{n}" for n in _BON_NS)
    return (
        curve.select(
            "n_prompts",
            F.col("m1").alias("base"),
            F.expr(
                f"stack({len(_BON_NS)}, {stack_expr}) AS (n_samples, m)"
            ),
        )
        .select(
            F.col("n_samples").cast("int").alias("n_samples"),
            "n_prompts",
            F.round("m", 6).alias("mean_best_reward"),
            F.round(F.col("m") / F.col("base"), 6).alias("lift_vs_n1"),
        )
        .orderBy("n_samples")
    )


register(
    QuerySpec(
        "mining_best_of_n_gains",
        _bon_gains,
        _TOKS_CTE
        + f"""
, scored AS (
  SELECT doc_id,
         CAST('0x' || substr(md5('g:' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % {_BON_BUCKETS} AS prompt,
         md5('d:' || CAST(doc_id AS VARCHAR)) AS draw,
         len(list_distinct(t)) / CAST(len(t) AS DOUBLE) AS reward
  FROM toks
),
ranked AS (
  SELECT prompt, reward,
         row_number() OVER (PARTITION BY prompt ORDER BY draw, doc_id)
           AS rn
  FROM scored
),
per_prompt AS (
  SELECT prompt, count(*) AS n_cand,
         {", ".join(f"max(CASE WHEN rn <= {n} THEN reward END) AS b{n}" for n in _BON_NS)}
  FROM ranked GROUP BY prompt HAVING count(*) >= {max(_BON_NS)}
),
curve AS (
  SELECT CAST(count(*) AS BIGINT) AS n_prompts,
         {", ".join(f"avg(b{n}) AS m{n}" for n in _BON_NS)}
  FROM per_prompt
)
{" UNION ALL ".join(
    f"SELECT CAST({n} AS INT) AS n_samples, n_prompts, "
    f"round(m{n}, 6) AS mean_best_reward, "
    f"round(m{n} / m1, 6) AS lift_vs_n1 FROM curve"
    for n in _BON_NS
)}
ORDER BY n_samples
""",
        doc="best-of-n rejection-sampling gain curve (n=1,2,4,8): max "
        "reward over the first n seed-free md5 draws per prompt bucket, "
        "all four n from ONE ranking pass — the sampling-budget curve "
        "an RLHF data pipeline sizes against",
        tags=("extension", "mining", "eval", "sampling"),
    )
)


# ---------------------------------------------------------------------------
# pass@k estimator (HumanEval-style unbiased combinatorial estimate)
# ---------------------------------------------------------------------------

_PASSK_BUCKETS = 32
_PASSK_KS = (1, 5, 10)


def _pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021, HumanEval): per prompt bucket
    with n samples and c passes, ``pass@k = 1 - C(n-c, k)/C(n, k)``,
    computed as the exact telescoping product
    ``1 - prod_{i=0..k-1} (n-c-i)/(n-i)`` (hits an exact 0 term when
    n-c < k, so the formula needs no branch), averaged over prompts
    with n >= k. The "pass" flag is the engine's own quality gate
    (stopword ratio >= 0.02 — a deterministic verifier stand-in).

    The product is a bounded ``aggregate`` HOF over ``sequence(0,k-1)``
    — per-row constant work, one aggregate per k from the same
    per-prompt (n, c) table; the fold order is fixed, so both engines
    run the identical IEEE sequence.
    """
    d = _docs(spark, sf_dir).select(
        "doc_id", tokens(normalized(F.col("text"))).alias("t")
    )
    flagged = d.select(
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit("p:"), F.col("doc_id").cast("string"))), 1, 8),
                16,
                10,
            ).cast("long"),
            F.lit(_PASSK_BUCKETS),
        ).alias("prompt"),
        (
            F.size(F.filter("t", lambda t: t.isin(*STOPWORDS))).cast("double")
            / F.size("t").cast("double")
            >= 0.02
        ).cast("int").alias("pass_flag"),
    )
    nc = flagged.groupBy("prompt").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pass_flag").alias("c")
    )

    def pk(k: int) -> F.Column:
        prod = F.aggregate(
            F.sequence(F.lit(0), F.lit(k - 1)),
            F.lit(1.0),
            lambda acc, i: acc
            * (F.col("n") - F.col("c") - i).cast("double")
            / (F.col("n") - i).cast("double"),
        )
        return F.lit(1.0) - prod

    rows = [
        nc.where(F.col("n") >= k).agg(
            F.lit(k).cast("int").alias("k"),
            F.count(F.lit(1)).cast("long").alias("n_prompts"),
            F.round(F.avg(pk(k)), 6).alias("mean_pass_at_k"),
        )
        for k in _PASSK_KS
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("k")


register(
    QuerySpec(
        "eval_pass_at_k",
        _pass_at_k,
        _TOKS_CTE
        + f"""
, flagged AS (
  SELECT CAST('0x' || substr(md5('p:' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % {_PASSK_BUCKETS} AS prompt,
         CASE WHEN len(list_filter(t, x -> x IN
                ({", ".join("'" + s + "'" for s in STOPWORDS)})))
              / CAST(len(t) AS DOUBLE) >= 0.02
              THEN 1 ELSE 0 END AS pass_flag
  FROM toks
),
nc AS (
  SELECT prompt, count(*) AS n, sum(pass_flag) AS c
  FROM flagged GROUP BY prompt
)
{" UNION ALL ".join(
    f"SELECT CAST({k} AS INT) AS k, CAST(count(*) AS BIGINT) AS n_prompts, "
    f"round(avg(1.0 - list_reduce(list_transform(generate_series(0, {k-1}), "
    f"i -> (n-c-i) / CAST(n-i AS DOUBLE)), (a, b) -> a*b)), 6) "
    f"AS mean_pass_at_k FROM nc WHERE n >= {k}"
    for k in _PASSK_KS
)}
ORDER BY k
""",
        doc="unbiased pass@k estimator (k=1,5,10): exact telescoping "
        "product 1 - prod (n-c-i)/(n-i) per prompt bucket over the "
        "quality-gate pass flag, averaged over prompts with n >= k — "
        "the HumanEval acceptance metric as a bounded aggregate HOF",
        tags=("extension", "eval", "metric"),
    )
)

# ---------------------------------------------------------------------------
# Classifier calibration: reliability bins + expected calibration error
# ---------------------------------------------------------------------------


def _calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + ECE for the trained Naive-Bayes language
    classifier (the model behind ``curation_naive_bayes_langid``): the
    held-out posterior confidence of each prediction (softmax over the
    per-class log scores, max-shifted for stability) is bucketed into
    10 bins; per bin the mean confidence is compared to the observed
    accuracy, and the expected calibration error is the doc-weighted
    mean absolute gap — the audit that decides whether a quality/lang
    classifier's scores can gate data at a chosen threshold.

    One scoring pass shared with the confusion-matrix query
    (``datasel_ops.nb_scored``); the softmax is two doc-keyed 5-row
    aggregates, the bins a 10-row aggregate, and the ECE a window over
    that 10-row table — nothing after the scoring pass is data-sized.
    Scores round to 4dp before the softmax (the NB argmax rule) and
    confidences to 6dp before binning, so cross-engine float-sum
    jitter cannot move a doc across a bin edge.
    """
    s = nb_scored(spark, sf_dir).select(
        "doc_id", "actual", "c", F.round("s", 4).alias("sr")
    )
    mx = s.groupBy("doc_id").agg(F.max("sr").alias("smax"))
    p = s.join(mx, "doc_id").withColumn(
        "ex", F.exp(F.col("sr") - F.col("smax"))
    )
    z = p.groupBy("doc_id").agg(F.sum("ex").alias("z"))
    w_doc = Window.partitionBy("doc_id").orderBy(F.desc("sr"), F.asc("c"))
    pred = (
        p.join(z, "doc_id")
        .withColumn("conf", F.round(F.col("ex") / F.col("z"), 6))
        .withColumn("rn", F.row_number().over(w_doc))
        .where(F.col("rn") == 1)
        .select(
            "conf",
            (F.col("c") == F.col("actual")).cast("int").alias("correct"),
        )
    )
    bins = (
        pred.withColumn(
            "bin",
            F.least(F.floor(F.col("conf") * 10).cast("int"), F.lit(9)),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("conf"), 6).alias("mean_conf"),
            F.round(F.avg("correct"), 6).alias("accuracy"),
        )
        .withColumn(
            "abs_gap", F.round(F.abs(F.col("mean_conf") - F.col("accuracy")), 6)
        )
    )
    # ECE over the <=10-row bin table (bounded input: unpartitioned is safe)
    w_all = Window.partitionBy()
    return bins.withColumn(
        "ece",
        F.round(
            F.sum(F.col("n_docs") * F.col("abs_gap")).over(w_all)
            / F.sum("n_docs").over(w_all),
            6,
        ),
    ).orderBy("bin")


register(
    QuerySpec(
        "curation_calibration_ece",
        _calibration_ece,
        NB_SCORED_CTE
        + """
, sr AS (SELECT doc_id, actual, c, round(s, 4) AS sr FROM scored),
mx AS (SELECT doc_id, max(sr) AS smax FROM sr GROUP BY doc_id),
p AS (
  SELECT sr.doc_id, actual, c, sr.sr, exp(sr.sr - mx.smax) AS ex
  FROM sr JOIN mx USING (doc_id)
),
z AS (SELECT doc_id, sum(ex) AS z FROM p GROUP BY doc_id),
pred AS (
  SELECT p.doc_id, round(ex / z.z, 6) AS conf,
         CASE WHEN c = actual THEN 1 ELSE 0 END AS correct,
         row_number() OVER (PARTITION BY p.doc_id
                            ORDER BY sr DESC, c) AS rn
  FROM p JOIN z USING (doc_id)
),
bins AS (
  SELECT least(CAST(floor(conf * 10) AS INT), 9) AS bin,
         CAST(count(*) AS BIGINT) AS n_docs,
         round(avg(conf), 6) AS mean_conf,
         round(avg(CAST(correct AS DOUBLE)), 6) AS accuracy
  FROM pred WHERE rn = 1 GROUP BY 1
)
SELECT bin, n_docs, mean_conf, accuracy,
       round(abs(mean_conf - accuracy), 6) AS abs_gap,
       round(sum(n_docs * round(abs(mean_conf - accuracy), 6)) OVER ()
             / sum(n_docs) OVER (), 6) AS ece
FROM bins ORDER BY bin
""",
        doc="reliability diagram + expected calibration error for the "
        "trained NB language classifier: held-out softmax confidence "
        "binned x10 vs observed accuracy, doc-weighted mean |gap| — "
        "the can-this-classifier-gate-data audit",
        tags=("extension", "eval", "curation", "classifier", "audit"),
    )
)

# ---------------------------------------------------------------------------
# Distributed PCA: top principal component by power iteration
# ---------------------------------------------------------------------------

_PCA_ITERS = 8
_PCA_TOPD = 8
_PCA_Q = 1000  # milli-unit embedding quantization
_PCA_V = 1_000_000  # micro-unit eigenvector components
_PCA_DIM = 64  # declared embedding dimensionality (fixture contract)


def _pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding covariance by power
    iteration — distributed PCA in the shape it actually takes on a
    data engine: ONE Arrow-batched corpus pass accumulates the exact
    integer second-moment matrix (the classic treeAggregate X'X), then
    8 fixed matrix-vector rounds run entirely on the d x d = 4096-row
    bounded table. Covariance is recovered moment-wise
    (n*S_jk - m_j*m_k) so no centering pass touches the corpus.

    Cross-engine exactness: embeddings quantize to milli-units
    (floor(x*1000+0.5), engine-round-safe); per-batch partial Gram
    products are int64 (numpy X'X), merged with DECIMAL(38,0) sums, so
    S, m, and C are aggregation-order-independent integers. The
    iterate stays an INTEGER micro-unit vector: each round computes
    u = C.v in exact decimal, renormalizes v' = floor(u/max|u|*1e6+.5)
    through one deterministic double division — both engines run the
    bit-identical schedule, no accumulated float drift. The final
    report is the Rayleigh quotient share lambda/trace(C) (scale
    factors cancel) + the top-|loading| dims in integer micro-units.

    100 TB shape: the corpus is touched once (map-only, Arrow batches,
    constant memory); everything after is bounded by d^2. The oracle
    unrolls the identical 8 rounds as chained CTEs over a MATERIALIZED
    covariance (DuckDB would otherwise inline C once per round).
    """
    # malformed rows (NULL or ragged embeddings) are excluded up front:
    # the Arrow Gram pass reshapes each batch to (rows, d) and a single
    # off-dimension vector would kill the job (r10 dirty-fixture audit);
    # the oracle applies the identical filter
    return pca_top_component(
        _emb(spark, sf_dir)
        .select("embedding")
        .where(
            F.col("embedding").isNotNull()
            & (F.size("embedding") == _PCA_DIM)
        )
    )


def pca_top_component(
    emb: DataFrame, iters: int = _PCA_ITERS, topd: int = _PCA_TOPD
) -> DataFrame:
    """Core of ``embedding_pca_power_iteration`` over any one-column
    DataFrame of equal-length float arrays — factored so property tests
    can feed synthetic corpora (tests/test_eval_property.py). A
    zero-variance corpus (max|u| = 0) degrades gracefully: the iterate
    collapses to the zero vector and the variance share reports NULL
    (guarded divisions on both engines)."""

    def gram_batches(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            la = batch.column(0)
            if len(la) == 0:
                continue
            flat = la.flatten().to_numpy(zero_copy_only=False)
            arr = flat.astype(np.float64).reshape(len(la), -1)
            q = np.floor(arr * float(_PCA_Q) + 0.5).astype(np.int64)
            d = q.shape[1]
            s = q.T @ q  # exact int64 within a batch
            m = q.sum(axis=0)
            idx = np.arange(d, dtype=np.int32)
            jj, kk = np.meshgrid(idx, idx, indexing="ij")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        np.concatenate([jj.ravel(), idx, [-1]]), pa.int32()
                    ),
                    pa.array(
                        np.concatenate(
                            [kk.ravel(), np.full(d, -1, np.int32), [-1]]
                        ),
                        pa.int32(),
                    ),
                    pa.array(
                        np.concatenate([s.ravel(), m, [q.shape[0]]]),
                        pa.int64(),
                    ),
                ],
                names=["j", "k", "v"],
            )

    stats = caching.persist_tracked(
        emb.mapInArrow(gram_batches, "j int, k int, v long")
        .groupBy("j", "k")
        .agg(F.sum(F.col("v").cast("decimal(38,0)")).alias("v"))
    )
    s_tab = stats.where((F.col("j") >= 0) & (F.col("k") >= 0))
    # j >= 0 guard: the global-count row is (j=-1, k=-1) and also
    # matches k == -1 — without it the power-iteration seed carries a
    # phantom dim=-1 entry (harmless at iters>=1 because the cov join
    # drops it, but wrong for the iters=0 path, r10 review)
    m_tab = stats.where((F.col("k") == -1) & (F.col("j") >= 0)).select(
        F.col("j").alias("dim"), F.col("v").alias("m")
    )
    n_tab = stats.where(F.col("j") == -1).select(
        F.col("v").cast("decimal(38,0)").alias("n")
    )
    cov = caching.persist_tracked(
        s_tab.join(
            F.broadcast(m_tab.select(F.col("dim").alias("j"), F.col("m").alias("mj"))),
            "j",
        )
        .join(
            F.broadcast(m_tab.select(F.col("dim").alias("k"), F.col("m").alias("mk"))),
            "k",
        )
        .crossJoin(F.broadcast(n_tab))
        .select(
            "j",
            "k",
            (F.col("n") * F.col("v") - F.col("mj") * F.col("mk")).alias("c"),
        )
    )

    v = m_tab.select("dim", F.lit(_PCA_V).cast("long").alias("v"))
    for _ in range(iters):
        u = (
            cov.join(
                F.broadcast(
                    v.select(F.col("dim").alias("k"), F.col("v").alias("vk"))
                ),
                "k",
            )
            .groupBy("j")
            .agg(
                F.sum(F.col("c") * F.col("vk").cast("decimal(38,0)")).alias("u")
            )
        )
        umax = u.agg(F.max(F.abs(F.col("u"))).alias("um"))
        v = (
            u.crossJoin(F.broadcast(umax))
            .select(
                F.col("j").alias("dim"),
                F.when(F.col("um") == 0, F.lit(0).cast("long"))
                .otherwise(
                    F.floor(
                        F.col("u").cast("double")
                        / F.col("um").cast("double")
                        * F.lit(float(_PCA_V))
                        + F.lit(0.5)
                    ).cast("long")
                )
                .alias("v"),
            )
            .localCheckpoint()
        )

    uf = (
        cov.join(
            F.broadcast(v.select(F.col("dim").alias("k"), F.col("v").alias("vk"))),
            "k",
        )
        .groupBy("j")
        .agg(F.sum(F.col("c") * F.col("vk").cast("decimal(38,0)")).alias("u"))
    )
    num = uf.join(
        F.broadcast(v.select(F.col("dim").alias("j"), F.col("v").alias("vj"))),
        "j",
    ).agg(F.sum(F.col("u") * F.col("vj").cast("decimal(38,0)")).alias("num"))
    den = v.agg(
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("den")
    )
    trace = cov.where(F.col("j") == F.col("k")).agg(
        F.sum("c").alias("tr")
    )
    share = (
        num.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(trace))
        .select(
            F.when(
                (F.col("den") == 0) | (F.col("tr") == 0), F.lit(None)
            )
            .otherwise(
                F.round(
                    F.col("num").cast("double")
                    / F.col("den").cast("double")
                    / F.col("tr").cast("double"),
                    6,
                )
            )
            .alias("var_explained_top1")
        )
    )
    w_load = Window.orderBy(
        F.desc(F.abs(F.col("v"))), F.asc("dim")
    )  # 64-row aggregate-derived table: bounded, unpartitioned is safe
    return (
        v.withColumn("rank", F.row_number().over(w_load).cast("long"))
        .where(F.col("rank") <= topd)
        .crossJoin(F.broadcast(share))
        .select(
            "rank",
            F.col("dim").cast("int").alias("dim"),
            F.col("v").alias("loading_micro"),
            "var_explained_top1",
        )
        .orderBy("rank")
    )


def _pca_sql() -> str:
    parts = [
        f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_PCA_Q} + 0.5)
              AS BIGINT) AS q
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = {_PCA_DIM}
),
m AS (SELECT dim, sum(q) AS m FROM q GROUP BY dim),
n AS (SELECT count(*) AS n FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = {_PCA_DIM}),
s AS (
  SELECT a.dim AS j, b.dim AS k, sum(a.q * b.q) AS s
  FROM q a JOIN q b USING (vec_id) GROUP BY 1, 2
),
cov AS MATERIALIZED (
  SELECT s.j, s.k, n.n * s.s - mj.m * mk.m AS c
  FROM s CROSS JOIN n
  JOIN m mj ON mj.dim = s.j JOIN m mk ON mk.dim = s.k
),
v0 AS (SELECT dim, CAST({_PCA_V} AS BIGINT) AS v FROM m)"""
    ]
    for t in range(1, _PCA_ITERS + 1):
        parts.append(
            f""",
u{t} AS MATERIALIZED (
  SELECT cov.j AS dim, sum(cov.c * v.v) AS u
  FROM cov JOIN v{t - 1} v ON v.dim = cov.k GROUP BY cov.j
),
v{t} AS MATERIALIZED (
  SELECT dim,
         CASE WHEN (SELECT max(abs(u)) FROM u{t}) = 0
              THEN CAST(0 AS BIGINT)
              ELSE CAST(floor(CAST(u AS DOUBLE)
                   / (SELECT max(abs(CAST(u AS DOUBLE))) FROM u{t})
                   * {_PCA_V}.0 + 0.5) AS BIGINT) END AS v
  FROM u{t}
)"""
        )
    last = f"v{_PCA_ITERS}"
    parts.append(
        f""",
uf AS (
  SELECT cov.j AS dim, sum(cov.c * v.v) AS u
  FROM cov JOIN {last} v ON v.dim = cov.k GROUP BY cov.j
),
rq AS (
  SELECT (SELECT sum(uf.u * v.v) FROM uf JOIN {last} v USING (dim)) AS num,
         (SELECT sum(v * v) FROM {last}) AS den,
         (SELECT sum(c) FROM cov WHERE j = k) AS tr
)
SELECT CAST(row_number() OVER (ORDER BY abs(v.v) DESC, v.dim)
            AS BIGINT) AS rank,
       CAST(v.dim AS INT) AS dim, v.v AS loading_micro,
       CASE WHEN rq.den = 0 OR rq.tr = 0 THEN NULL
            ELSE round(CAST(rq.num AS DOUBLE) / CAST(rq.den AS DOUBLE)
                       / CAST(rq.tr AS DOUBLE), 6) END
         AS var_explained_top1
FROM {last} v CROSS JOIN rq
ORDER BY abs(v.v) DESC, v.dim
LIMIT {_PCA_TOPD}"""
    )
    return "".join(parts)


register(
    QuerySpec(
        "embedding_pca_power_iteration",
        _pca_power,
        _pca_sql(),
        doc="distributed PCA: exact integer second moments in ONE "
        "Arrow-batched corpus pass (treeAggregate X'X), covariance "
        "recovered moment-wise, then 8 fixed power-iteration rounds on "
        "the bounded d^2 table with an integer micro-unit iterate — "
        "top-|loading| dims + Rayleigh variance-explained share",
        tags=("extension", "embedding", "iterative", "arrow", "training"),
    )
)


# ---------------------------------------------------------------------------
# Suffix-array construction by prefix doubling -> repeated-substring groups
# ---------------------------------------------------------------------------

_SA_WIN = 48  # per-doc window (chars of normalized text)
_SA_MINLEN = 12  # report suffixes at least this long
_SA_TOPK = 10


def _suffix_doubling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array ranks by PREFIX DOUBLING (Manber-Myers; the
    distributed suffix-sort shape behind Lee et al. exact substring
    dedup): every character position of the (48-char-windowed,
    normalized) corpus gets an integer rank; round k upgrades
    rank_k -> rank_2k by densely re-ranking the pair
    (rank_k(p), rank_k(p+k)) — 6 rounds (1,2,4,8,16,32) cover the
    window, after which rank equality IS equality of the suffix to the
    window end. The report groups positions by final rank: the top
    repeated suffixes (>= 12 chars, >= 2 occurrences) with position
    and document counts — repeated-substring detection without ever
    joining strings against strings.

    100 TB shape: each doubling is ONE doc-keyed ``lead`` window
    (bounded partitions) plus, where a dense re-rank is needed, ONE
    distinct over rank pairs and ONE ``global_rank`` over the distinct
    pairs (range-repartition + constant-size offset ledger — never an
    unpartitioned data-sized sort), joined back on the pair. O(log
    window) rounds, every stage partition-parallel; per-round
    ``localCheckpoint`` flattens lineage exactly like the
    connected-components loop (operators/dedup.py:541). Three classic
    SA accelerations keep the constant small: (1) ranks SEED from the
    4-char prefix (dense rank of ``substring(pos, 4)`` — lexicographic
    string order equals suffix order at this depth, collapsing two
    doubling rounds); (2) the FIRST doubling uses a COMPOSITE rank
    ``r*(M+2) + (nr+1)`` instead of a dense re-rank — order-exact
    because pair order equals composite numeric order, and overflow-
    safe because M is the seed-rank count, bounded by the alphabet^4
    (never the corpus), so no sort touches the data until ranks are
    genuinely data-sized; (3) the LAST level never re-ranks at all —
    the final grouping keys directly on the (rank, continuation-rank)
    pair, which already identifies the full-window suffix. Net: two
    data-sized ranking passes for a 48-char window instead of six.
    Suffix STRINGS materialize only in the final top-k report; the
    working set is (doc_id, pos, rank) integers — the reason this
    scales where the oracle's group-by-substring (fine at sf0.01)
    would shuffle corpus text at every suffix length.
    """
    return suffix_repeat_groups(
        _docs(spark, sf_dir).select(
            "doc_id",
            F.substring(normalized(F.col("text")), 1, _SA_WIN).alias("s"),
        )
    )


def suffix_repeat_groups(docs: DataFrame) -> DataFrame:
    """Core of ``corpus_suffix_array_doubling`` over any (doc_id, s)
    DataFrame of pre-windowed strings — factored so property tests can
    feed synthetic corpora (tests/test_eval_property.py)."""
    from ..operators.ranking import global_rank

    _SA_SEED = 4  # initial ranks from the 4-char prefix
    d = caching.persist_tracked(docs)
    # positions + seed key: one pass — the zero-width-lookahead regex
    # emits the (up to) 4-gram at EVERY offset in position order (the
    # shingles_raw construction; greedy {{1,4}} keeps the short tails)
    pos_tab = d.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(
                "s", F.lit(f"(?=(.{{1,{_SA_SEED}}}))"), F.lit(1)
            )
        ).alias("pos", "g"),
    )
    # every join below pins shuffle_hash: all sides are corpus-sized
    # in general (position tables, dense-rank pair tables, the
    # windowed-text doc table), and their repeated-content payloads
    # compress so hard in shuffle stats that AQE broadcast-demotes a
    # side and OOMs the driver — caught LIVE by the r7 100x smoke
    # (the build died at the dense re-rank checkpoint with "Not enough
    # memory to build and broadcast"); same class and fix as the r6
    # dedup catch (SCALING.md join-strategy audit).
    seeds = global_rank(
        pos_tab.select("g").distinct(), F.asc("g"), alias="r"
    ).hint("shuffle_hash")
    # NOTE (r14, measured): removing this checkpoint and reading m_seed
    # off the seed-rank table was tried and REVERTED — 6.2 s → 9.0 s
    # isolated median. The checkpoint is what keeps the global_rank
    # subtree (range-sampling pass + offset-ledger broadcast) from
    # re-evaluating under both the m_seed scalar and the first
    # doubling's window.
    cur = (
        pos_tab.join(seeds, "g")
        .select("doc_id", "pos", "r")
        .localCheckpoint()
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")

    def next_rank(df: DataFrame, k: int) -> DataFrame:
        return df.withColumn(
            "nr",
            F.coalesce(F.lead("r", k).over(w_doc), F.lit(-1).cast("long")),
        )

    # r4 -> r8 by COMPOSITE rank: M bounded by |alphabet|^4, the one
    # constant-size scalar sync of the build
    m_seed = cur.agg(F.max("r")).collect()[0][0] or 0
    cur = next_rank(cur, _SA_SEED).select(
        "doc_id",
        "pos",
        (
            F.col("r") * F.lit(int(m_seed) + 2)
            + (F.col("nr") + F.lit(1))
        ).alias("r"),
    ).localCheckpoint()

    # r8 -> r16 -> r32 by dense re-rank (ranks are data-sized now)
    for k in (2 * _SA_SEED, 4 * _SA_SEED):
        paired = next_rank(cur, k)
        pairs = paired.select("r", "nr").distinct()
        ranked = global_rank(
            pairs, F.asc("r"), F.asc("nr"), alias="r2"
        ).hint("shuffle_hash")
        cur = (
            paired.join(ranked, ["r", "nr"])
            .select("doc_id", "pos", F.col("r2").alias("r"))
            .localCheckpoint()
        )

    # r32 + continuation at 32 covers the 48-char window: group on the
    # PAIR — identity is all the report needs, no final re-rank
    final = next_rank(cur, 8 * _SA_SEED)
    suf = final.join(d.hint("shuffle_hash"), "doc_id").select(
        "r",
        "nr",
        "doc_id",
        F.expr(f"substring(s, pos + 1, {_SA_WIN})").alias("suffix"),
        (F.length("s") - F.col("pos")).alias("sl"),
    )
    groups = (
        suf.where(F.col("sl") >= _SA_MINLEN)
        .groupBy("r", "nr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_positions"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min("suffix").alias("suffix"),
        )
        .where(F.col("n_positions") >= 2)
    )
    return global_topk(
        groups, _SA_TOPK, F.desc("n_positions"), F.asc("suffix")
    ).select("rank", "suffix", "n_positions", "n_docs").orderBy("rank")


register(
    QuerySpec(
        "corpus_suffix_array_doubling",
        _suffix_doubling,
        rf"""
WITH d AS (
  SELECT doc_id,
         substr(lower(regexp_replace(trim(text), '\s+', ' ', 'g')),
                1, {_SA_WIN}) AS s
  FROM documents
),
pos AS (
  SELECT doc_id, substr(s, CAST(t.i AS INT)) AS suffix,
         length(s) - t.i + 1 AS sl
  FROM d, unnest(generate_series(1, CAST(length(s) AS BIGINT))) AS t(i)
),
groups AS (
  SELECT suffix, CAST(count(*) AS BIGINT) AS n_positions,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM pos WHERE sl >= {_SA_MINLEN}
  GROUP BY suffix HAVING count(*) >= 2
)
SELECT CAST(row_number() OVER (ORDER BY n_positions DESC, suffix)
            AS BIGINT) AS rank,
       suffix, n_positions, n_docs
FROM groups
ORDER BY n_positions DESC, suffix
LIMIT {_SA_TOPK}
""",
        doc="suffix-array ranks by prefix doubling (6 rounds of "
        "lead-window pairing + distributed dense re-rank): top "
        "repeated >=12-char suffixes with position/doc counts — the "
        "suffix-sort primitive behind exact substring dedup, working "
        "set all-integer until the final report",
        tags=("extension", "dedup", "iterative", "text", "suffix-array"),
    )
)

# ---------------------------------------------------------------------------
# Ranking-quality metrics: Mann-Whitney AUC and Spearman rank correlation
# ---------------------------------------------------------------------------


def _auc_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC of the stopword-ratio signal as an is-English detector,
    computed as the Mann-Whitney rank-sum statistic with PROPER tied
    midranks: AUC = (sum of positive midranks - n_pos(n_pos+1)/2) /
    (n_pos * n_neg). The classifier-free ranking-quality number a data
    pipeline reports for any candidate quality gate before picking a
    threshold (the calibration audit's companion).

    100 TB shape: one corpus pass reduces to a per-DISTINCT-SCORE
    histogram (n_pos_s, n_neg_s); midranks come from a cumulative
    window over that aggregate (allowed: its input is the reduced
    histogram, not the corpus), and the statistic is one exact sum —
    no per-row ranking, no corpus-sized window. Midranks are exact
    half-integers; sums route through DECIMAL so both engines agree
    bit-for-bit before the single final division.
    """
    d = _docs(spark, sf_dir).select(
        "lang", tokens(normalized(F.col("text"))).alias("t")
    )
    scored = d.select(
        # when/otherwise, not a bare boolean cast: a NULL lang must land
        # in the NEGATIVE class (the twin's CASE ... ELSE 0) — the cast
        # form made y NULL and silently dropped the doc from BOTH
        # n_pos and n_neg (r11 dirty-fixture audit)
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        (
            F.size(F.filter("t", lambda t: t.isin(*STOPWORDS))).cast("double")
            / F.size("t").cast("double")
        ).alias("s"),
    )
    # unscored docs (NULL s, e.g. NULL text) are excluded: both engines
    # would otherwise keep the NULL histogram group but RANK it at
    # opposite ends (Spark window ORDER BY is NULLS FIRST, DuckDB's is
    # NULLS LAST), shifting every midrank and the AUC (r10 review) —
    # and an unscorable doc has no business in n_pos/n_neg anyway
    hist = (
        scored.where(F.col("s").isNotNull())
        .groupBy("s")
        .agg(
            F.sum("y").cast("long").alias("np_s"),
            F.sum(1 - F.col("y")).cast("long").alias("nn_s"),
        )
    )
    w_cum = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    mid = hist.withColumn(
        "below", F.coalesce(F.sum(F.col("np_s") + F.col("nn_s")).over(w_cum), F.lit(0))
    ).withColumn(
        # midrank in half-units to stay integer-exact: 2*midrank
        "mid2",
        2 * F.col("below") + F.col("np_s") + F.col("nn_s") + 1,
    )
    return mid.agg(
        F.sum("np_s").cast("long").alias("n_pos"),
        F.sum("nn_s").cast("long").alias("n_neg"),
        F.round(
            # try_divide: a single-class corpus (no positives or no
            # negatives) zeroes n_pos*n_neg — AUC is undefined there and
            # must report NULL (DuckDB's x/0), not die under ANSI
            F.try_divide(
                (
                    # wide_product, not multiply-then-widen: np_s * mid2
                    # in long wraps/errors once the rank-sum crosses
                    # 2^63 (~3e9 docs) — widen ONE factor so the
                    # product itself is DECIMAL(38,0) (ADVICE r10)
                    F.sum(wide_product(F.col("np_s"), F.col("mid2")))
                    .cast("double")
                    / 2.0
                )
                - (
                    F.sum("np_s").cast("double")
                    * (F.sum("np_s").cast("double") + 1.0)
                    / 2.0
                ),
                F.sum("np_s").cast("double") * F.sum("nn_s").cast("double"),
            ),
            6,
        ).alias("auc"),
    )


register(
    QuerySpec(
        "eval_auc_quality_gate",
        _auc_quality_gate,
        _TOKS_CTE
        + f"""
, scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         len(list_filter(t, x -> x IN
           ({", ".join("'" + s + "'" for s in STOPWORDS)})))
           / CAST(len(t) AS DOUBLE) AS s
  FROM toks
),
hist AS (
  SELECT s, CAST(sum(y) AS BIGINT) AS np_s,
         CAST(sum(1 - y) AS BIGINT) AS nn_s
  FROM scored WHERE s IS NOT NULL GROUP BY s
),
mid AS (
  SELECT np_s, nn_s,
         2 * coalesce(sum(np_s + nn_s) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + np_s + nn_s + 1 AS mid2
  FROM hist
)
SELECT CAST(sum(np_s) AS BIGINT) AS n_pos,
       CAST(sum(nn_s) AS BIGINT) AS n_neg,
       round(((CAST(sum(CAST(np_s AS HUGEINT) * mid2) AS DOUBLE) / 2.0)
              - (CAST(sum(np_s) AS DOUBLE) * (CAST(sum(np_s) AS DOUBLE) + 1.0)
                 / 2.0))
             / (CAST(sum(np_s) AS DOUBLE) * CAST(sum(nn_s) AS DOUBLE)),
             6) AS auc
FROM mid
""",
        doc="Mann-Whitney AUC with exact tied midranks for the "
        "stopword-ratio is-English gate: one corpus pass to a "
        "distinct-score histogram, cumulative midranks over the "
        "reduced table, a single exact rank-sum — threshold-free "
        "ranking quality for any candidate filter signal",
        tags=("extension", "eval", "metric", "quality"),
    )
)


def _spearman_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between two per-doc quality signals
    (type-token ratio vs stopword ratio) under a deterministic
    tie-broken total order: rho = 1 - 6*sum(d^2) / (n(n^2-1)) — do two
    cheap heuristics actually agree on document ordering, the question
    that decides whether a second gate adds signal or just noise.

    Ranks come from TWO ``global_rank`` passes (range-repartition +
    offset ledger — never an unpartitioned data-sized sort); d^2 sums
    are exact integers through DECIMAL. Tie-broken (doc_id) Spearman,
    not midrank Spearman: both engines apply the identical total
    order, so the statistic is bit-reproducible.
    """
    from ..operators.ranking import global_rank

    d = _docs(spark, sf_dir).select(
        "doc_id", tokens(normalized(F.col("text"))).alias("t")
    )
    scored = d.select(
        "doc_id",
        (
            F.size(F.array_distinct("t")).cast("double")
            / F.size("t").cast("double")
        ).alias("a"),
        (
            F.size(F.filter("t", lambda t: t.isin(*STOPWORDS))).cast("double")
            / F.size("t").cast("double")
        ).alias("b"),
    )
    # docs with NULL signals (NULL text) rank FIRST under Spark's ASC
    # but LAST under the oracle's row_number ORDER BY, shifting every
    # rank and the rho — an unscorable doc is excluded on both sides
    # (r10 review)
    scored = scored.where(F.col("a").isNotNull() & F.col("b").isNotNull())
    ra = global_rank(scored, F.asc("a"), F.asc("doc_id"), alias="ra").select(
        "doc_id", "ra"
    )
    rb = global_rank(scored, F.asc("b"), F.asc("doc_id"), alias="rb").select(
        "doc_id", "rb"
    )
    return ra.join(rb, "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.lit(1.0)
            - 6.0
            * F.sum(
                ((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))).cast(
                    "decimal(38,0)"
                )
            ).cast("double")
            / (
                F.count(F.lit(1)).cast("double")
                * (
                    F.count(F.lit(1)).cast("double")
                    * F.count(F.lit(1)).cast("double")
                    - 1.0
                )
            ),
            6,
        ).alias("spearman_rho"),
    )


register(
    QuerySpec(
        "eval_spearman_signals",
        _spearman_signals,
        _TOKS_CTE
        + f"""
, scored AS (
  SELECT doc_id,
         len(list_distinct(t)) / CAST(len(t) AS DOUBLE) AS a,
         len(list_filter(t, x -> x IN
           ({", ".join("'" + s + "'" for s in STOPWORDS)})))
           / CAST(len(t) AS DOUBLE) AS b
  FROM toks
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY a, doc_id) AS ra,
         row_number() OVER (ORDER BY b, doc_id) AS rb
  FROM scored WHERE a IS NOT NULL AND b IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       round(1.0 - 6.0 * CAST(sum((ra - rb) * (ra - rb)) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE)
                * (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE) - 1.0)),
             6) AS spearman_rho
FROM ranked
""",
        doc="tie-broken Spearman rank correlation between the "
        "type-token-ratio and stopword-ratio quality signals via two "
        "distributed global-rank passes and an exact integer d^2 sum "
        "— the do-two-gates-agree audit",
        tags=("extension", "eval", "metric", "statistics"),
    )
)

# ---------------------------------------------------------------------------
# nDCG@10 + MRR@10: graded retrieval-ranking quality
# ---------------------------------------------------------------------------

_NDCG_BUCKETS = 32
_NDCG_K = 10


def _ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 and MRR@10 of the type-token-ratio ranker against the
    graded quality label (high=2 / medium=1 / low=0 — the engine's own
    heuristic quality classes as relevance): per md5 "query" bucket,
    rank candidates by the model score, score the top-10 with
    DCG = sum (2^rel - 1)/log2(rank+1), normalize by the ideal DCG of
    the same bucket, and take the reciprocal rank of the first
    highly-relevant hit — the two standard graded retrieval metrics,
    completing the ranking-eval family beside AUC and Spearman.

    One bucket-keyed window ranks by score, a second ranks by
    relevance for the ideal DCG — both windows share the bucket key
    and the bucket-grain aggregate that follows; nothing after the
    two windows is data-sized. nDCG of a bucket with no relevant docs
    is defined 0 (guarded on both engines).
    """
    d = _docs(spark, sf_dir).select(
        "doc_id", tokens(normalized(F.col("text"))).alias("t")
    )
    scored = d.select(
        "doc_id",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("q:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(_NDCG_BUCKETS),
        ).alias("q"),
        (
            F.size(F.array_distinct("t")).cast("double")
            / F.size("t").cast("double")
        ).alias("s"),
        F.when(F.size("t") < 20, F.lit(0))
        .when(
            (
                F.size(F.filter("t", lambda x: x.isin(*STOPWORDS))).cast(
                    "double"
                )
                / F.size("t").cast("double")
                >= 0.02
            )
            & (F.size("t") >= 40),
            F.lit(2),
        )
        .otherwise(F.lit(1))
        .alias("rel"),
    )
    w_score = Window.partitionBy("q").orderBy(F.desc("s"), F.asc("doc_id"))
    w_ideal = Window.partitionBy("q").orderBy(F.desc("rel"), F.asc("doc_id"))
    ranked = scored.withColumn("rk", F.row_number().over(w_score)).withColumn(
        "irk", F.row_number().over(w_ideal)
    )
    gain = F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0)
    per_q = ranked.groupBy("q").agg(
        F.sum(
            F.when(F.col("rk") <= _NDCG_K, gain / F.log2(F.col("rk") + 1.0))
        ).alias("dcg"),
        F.sum(
            F.when(F.col("irk") <= _NDCG_K, gain / F.log2(F.col("irk") + 1.0))
        ).alias("idcg"),
        F.min(F.when((F.col("rel") == 2) & (F.col("rk") <= _NDCG_K), F.col("rk"))).alias(
            "first_rel"
        ),
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(
            F.avg(
                F.when(F.col("idcg") > 0.0, F.col("dcg") / F.col("idcg")).otherwise(
                    F.lit(0.0)
                )
            ),
            6,
        ).alias("mean_ndcg_at10"),
        F.round(
            F.avg(
                F.coalesce(
                    F.lit(1.0) / F.col("first_rel").cast("double"), F.lit(0.0)
                )
            ),
            6,
        ).alias("mean_mrr_at10"),
    )


register(
    QuerySpec(
        "eval_ndcg_mrr",
        _ndcg_mrr,
        _TOKS_CTE
        + f"""
, scored AS (
  SELECT doc_id,
         CAST('0x' || substr(md5('q:' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % {_NDCG_BUCKETS} AS q,
         len(list_distinct(t)) / CAST(len(t) AS DOUBLE) AS s,
         CASE WHEN len(t) < 20 THEN 0
              WHEN len(list_filter(t, x -> x IN
                     ({", ".join("'" + s + "'" for s in STOPWORDS)})))
                   / CAST(len(t) AS DOUBLE) >= 0.02 AND len(t) >= 40
              THEN 2 ELSE 1 END AS rel
  FROM toks
),
ranked AS (
  SELECT q, rel,
         row_number() OVER (PARTITION BY q ORDER BY s DESC, doc_id) AS rk,
         row_number() OVER (PARTITION BY q ORDER BY rel DESC, doc_id) AS irk
  FROM scored
),
per_q AS (
  SELECT q,
         sum(CASE WHEN rk <= {_NDCG_K}
                  THEN (power(2.0, rel) - 1.0) / log2(rk + 1.0) END) AS dcg,
         sum(CASE WHEN irk <= {_NDCG_K}
                  THEN (power(2.0, rel) - 1.0) / log2(irk + 1.0) END) AS idcg,
         min(CASE WHEN rel = 2 AND rk <= {_NDCG_K} THEN rk END) AS first_rel
  FROM ranked GROUP BY q
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       round(avg(CASE WHEN idcg > 0.0 THEN dcg / idcg ELSE 0.0 END), 6)
         AS mean_ndcg_at10,
       round(avg(coalesce(1.0 / CAST(first_rel AS DOUBLE), 0.0)), 6)
         AS mean_mrr_at10
FROM per_q
""",
        doc="graded retrieval metrics nDCG@10 + MRR@10 for the "
        "type-token-ratio ranker against the heuristic quality grades "
        "(high/medium/low as relevance 2/1/0): two bucket-keyed rank "
        "windows + one bucket-grain aggregate — completes the "
        "ranking-eval family beside AUC and Spearman",
        tags=("extension", "eval", "metric", "retrieval"),
    )
)
