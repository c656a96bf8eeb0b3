"""Model-based data selection and statistical LM operators (round 6):
the curation stages that sit between heuristic filtering and training —
DSIR-style importance weighting, Kneser-Ney bigram smoothing, a trained
Naive-Bayes language classifier, bipartite HITS, and the
sequence-length histogram a batch-shaping pipeline plans against.

The reference's query surface (sql/analysis_queries.sql:5-91) is flat
GROUP-BY analytics; these extend the engine's LLM-data-pipeline layer
(SURVEY.md extension surface) with the standard model-based selection
toolkit, each expressed as pure DataFrame aggregations/joins (no UDFs)
with an exact DuckDB oracle twin.

Scale posture, shared across the module: every per-document score is an
explode -> hash-aggregate -> broadcast-join of a BOUNDED model table
(hashed feature buckets, class-conditional counts, per-class priors) —
the corpus side is touched in one pass, the model side is vocabulary-
or bucket-bounded, never corpus-sized. Floats appear only in final
log/ratio expressions over exact integer counts, rounded before any
ordering, so the oracle comparison is stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import caching
from ..operators.ranking import global_topk
from ..operators.text import normalized, tokens
from .extensions import _docs
from .mining_ops import _events
from .registry import QuerySpec, register

# ---------------------------------------------------------------------------
# DSIR importance weights (hashed n-gram log-likelihood ratios)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 512
_DSIR_TARGET_LANG = "en"


def _bucket(c: F.Column, salt: str) -> F.Column:
    """Hashed feature bucket in [0, _DSIR_BUCKETS): md5-prefix mod, the
    same portable construction as corpus_ops._md5_mod."""
    h = F.md5(F.concat(F.lit(salt), c))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _DSIR_BUCKETS
    )


def _dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every corpus
    document by how much its hashed n-gram feature distribution looks
    like a TARGET domain (here the ``en`` slice) versus the raw corpus.

    Per-feature weight: lambda_f = ln p_target(f) - ln p_raw(f) with
    add-one smoothing over the _DSIR_BUCKETS hashed unigram+bigram
    buckets; a document's score is the MEAN lambda over its feature
    occurrences (mean, not sum, so length does not masquerade as
    domain fit). Selection then resamples by weight — the rank column
    a downstream sampler consumes.

    100 TB shape: one explode pass over the corpus builds the feature
    stream — adjacency comes from an ARRAY transform fused into the
    scan (the ``corpus_bigram_lm_nll`` pattern), not a per-doc lead
    window, so feature extraction is shuffle-free; the model is a
    512-row bucket table (two hash-aggregates + a window over 512
    rows), broadcast back against the stream. No corpus-sized join
    side, no driver loop.
    """
    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", tokens(normalized(F.col("text"))).alias("t")
    )
    uni = docs.select(
        "doc_id", "lang", F.explode("t").alias("w")
    ).select("doc_id", "lang", _bucket(F.col("w"), "u:").alias("f"))
    bi = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN size(t) > 1 THEN transform(sequence(1, "
                "size(t)-1), i -> concat(t[i-1], ' ', t[i])) "
                "ELSE array() END"
            )
        ).alias("g"),
    ).select("doc_id", "lang", _bucket(F.col("g"), "b:").alias("f"))
    # materialized once (r14, guide §1.2): the stream feeds the model
    # aggregate AND the final scoring join — unpersisted it was
    # recomputed three times (raw counts, target counts, scoring), each
    # a full corpus re-tokenization; the raw and target counts are also
    # fused into ONE conditional aggregate (identical integers: the
    # former left join + coalesce(t_f, 0) is the conditional count)
    feats = caching.persist_tracked(uni.unionByName(bi))

    model = feats.groupBy("f").agg(
        F.count(F.lit(1)).alias("r_f"),
        F.count(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, 1)
        ).alias("t_f"),
    )
    # bucket-bounded model table (<= 512 rows): totals via windows over
    # the bucket table itself, never the corpus
    lam = (
        model
        .withColumn("t_tot", F.sum("t_f").over(Window.partitionBy()))
        .withColumn("r_tot", F.sum("r_f").over(Window.partitionBy()))
        .select(
            "f",
            (
                F.log(
                    (F.col("t_f") + 1.0)
                    / (F.col("t_tot") + F.lit(float(_DSIR_BUCKETS)))
                )
                - F.log(
                    (F.col("r_f") + 1.0)
                    / (F.col("r_tot") + F.lit(float(_DSIR_BUCKETS)))
                )
            ).alias("lam"),
        )
    )
    return (
        feats.join(F.broadcast(lam), "f")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.round(F.avg("lam"), 6).alias("avg_log_ratio"),
        )
        .orderBy("doc_id")
    )


register(
    QuerySpec(
        "corpus_dsir_importance_weights",
        _dsir_weights,
        rf"""
WITH toks AS (
  SELECT doc_id, lang,
         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')),
                      ' ') AS t
  FROM documents
),
tok AS (
  SELECT doc_id, lang, unnest(t) AS w, generate_subscripts(t, 1) AS pos
  FROM toks
),
grams AS (
  SELECT doc_id, lang, w,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok
),
feats AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5('u:' || w), 1, 8) AS BIGINT)
           % {_DSIR_BUCKETS} AS f
  FROM grams
  UNION ALL
  SELECT doc_id, lang,
         CAST('0x' || substr(md5('b:' || w || ' ' || w2), 1, 8) AS BIGINT)
           % {_DSIR_BUCKETS} AS f
  FROM grams WHERE w2 IS NOT NULL
),
raw AS (SELECT f, count(*) AS r_f FROM feats GROUP BY f),
tgt AS (SELECT f, count(*) AS t_f FROM feats
        WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY f),
lam AS (
  SELECT raw.f,
         ln((coalesce(tgt.t_f, 0) + 1.0)
            / (sum(coalesce(tgt.t_f, 0)) OVER () + {_DSIR_BUCKETS}.0))
         - ln((raw.r_f + 1.0)
              / (sum(raw.r_f) OVER () + {_DSIR_BUCKETS}.0)) AS lam
  FROM raw LEFT JOIN tgt ON raw.f = tgt.f
)
SELECT feats.doc_id, feats.lang,
       CAST(count(*) AS BIGINT) AS n_feats,
       round(avg(lam.lam), 6) AS avg_log_ratio
FROM feats JOIN lam ON feats.f = lam.f
GROUP BY feats.doc_id, feats.lang
ORDER BY feats.doc_id
""",
        doc="DSIR importance weights: hashed unigram+bigram buckets, "
        "per-feature target-vs-raw log-likelihood ratio, per-doc mean "
        "— the importance-resampling selection signal (Xie et al. "
        "2023) next to the heuristic and perplexity filters",
        tags=("extension", "corpus", "curation", "sampling", "dsir"),
    )
)


# ---------------------------------------------------------------------------
# Kneser-Ney smoothed bigram LM (interpolated, absolute discounting)
# ---------------------------------------------------------------------------

_KN_D = 0.75
_KN_TOPK = 50


def _kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities — the classical
    n-gram smoothing (Kneser & Ney 1995; Chen & Goodman 1999) beside
    the add-one bigram LM (``corpus_bigram_lm_nll``):

        P_KN(w2|w1) = max(c(w1 w2) - D, 0) / c(w1)
                      + (D * N1+(w1 *) / c(w1)) * N1+(* w2) / N1+(* *)

    with discount D = 0.75, where N1+ counts DISTINCT continuation
    types, the part that makes KN the strongest count-based smoother
    (the continuation probability of "francisco" is low even though
    its unigram count is high).

    Shape: bigrams come from an array transform fused into the scan
    (shuffle-free adjacency, the ``corpus_bigram_lm_nll`` pattern);
    all five statistics are hash-aggregates of the bigram table
    (counts and distinct-type counts); the scoring join touches only
    the vocabulary-bounded count tables, and the final report is the
    global top-k via the lossless per-partition pre-reduction
    (operators/ranking.global_topk — no data-sized single-task sort).
    """
    big = (
        _docs(spark, sf_dir)
        .select(tokens(normalized(F.col("text"))).alias("t"))
        .select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) > 1 THEN transform(sequence(1, "
                    "size(t)-1), i -> struct(t[i-1] AS w1, t[i] AS w2)) "
                    "ELSE array() END"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    n1b = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    nbt = c2.agg(F.count(F.lit(1)).cast("double").alias("nbt"))
    scored = (
        c2.join(c1, "w1")
        .join(n1b, "w2")
        .crossJoin(F.broadcast(nbt))
        .select(
            "w1",
            "w2",
            F.col("c2").cast("long").alias("c2"),
            F.round(
                F.greatest(F.col("c2") - F.lit(_KN_D), F.lit(0.0))
                / F.col("c1")
                + (F.lit(_KN_D) * F.col("n1f") / F.col("c1"))
                * (F.col("n1b") / F.col("nbt")),
                6,
            ).alias("p_kn"),
        )
    )
    return global_topk(
        scored, _KN_TOPK, F.desc("c2"), F.asc("w1"), F.asc("w2")
    ).select("rank", "w1", "w2", "c2", "p_kn")


register(
    QuerySpec(
        "corpus_kneser_ney_bigram",
        _kneser_ney_bigram,
        rf"""
WITH toks AS (
  SELECT doc_id,
         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')),
                      ' ') AS t
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS pos FROM toks
),
big AS (
  SELECT w1, w2 FROM (
    SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok
  ) WHERE w2 IS NOT NULL
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c2) AS c1, count(*) AS n1f FROM c2 GROUP BY w1),
n1b AS (SELECT w2, count(*) AS n1b FROM c2 GROUP BY w2),
nbt AS (SELECT CAST(count(*) AS DOUBLE) AS nbt FROM c2)
SELECT CAST(row_number() OVER (ORDER BY c2.c2 DESC, c2.w1, c2.w2)
            AS BIGINT) AS rank,
       c2.w1, c2.w2, CAST(c2.c2 AS BIGINT) AS c2,
       round(greatest(c2.c2 - {_KN_D}, 0.0) / c1.c1
             + ({_KN_D} * c1.n1f / c1.c1) * (n1b.n1b / nbt.nbt),
             6) AS p_kn
FROM c2 JOIN c1 USING (w1) JOIN n1b USING (w2) CROSS JOIN nbt
ORDER BY rank
LIMIT {_KN_TOPK}
""",
        doc="interpolated Kneser-Ney bigram probabilities (D=0.75, "
        "continuation-type backoff) for the top-50 bigrams — the "
        "classical strongest count-based LM smoother next to the "
        "add-one bigram NLL",
        tags=("extension", "corpus", "text", "language-model"),
    )
)


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes language classifier (train/test split)
# ---------------------------------------------------------------------------

_NB_TEST_MOD = 5  # doc_id % 5 == 0 -> held-out test set


def nb_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out Naive-Bayes class scores ``(doc_id, actual, c, s)`` —
    the shared scoring table behind the confusion matrix
    (``curation_naive_bayes_langid``) and the calibration audit
    (``eval_ops.curation_calibration_ece``). See
    ``_naive_bayes_langid`` for the model/scoring shape discussion.
    """
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.explode(tokens(normalized(F.col("text")))).alias("w"),
    )
    is_test = F.col("doc_id") % _NB_TEST_MOD == 0
    train, test = d.where(~is_test), d.where(is_test)

    cw = train.groupBy(F.col("lang").alias("c"), "w").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cls = (
        train.groupBy(F.col("lang").alias("c"))
        .agg(
            F.count(F.lit(1)).alias("tot_c"),
            F.countDistinct("doc_id").alias("n_docs_c"),
        )
        .withColumn(
            "ln_prior",
            F.log(
                F.col("n_docs_c")
                / F.sum("n_docs_c").over(Window.partitionBy())
            ),
        )
    )
    vocab = train.agg(F.countDistinct("w").cast("double").alias("v"))

    return (
        test.crossJoin(F.broadcast(cls.select("c", "ln_prior", "tot_c")))
        .join(F.broadcast(cw), ["c", "w"], "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", F.col("lang").alias("actual"), "c")
        .agg(
            (
                F.max("ln_prior")
                + F.sum(
                    F.log(
                        (F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)
                        / (F.col("tot_c") + F.col("v"))
                    )
                )
            ).alias("s")
        )
    )


def _naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED language identification: multinomial Naive Bayes with
    add-one smoothing, fit on the 80% train split (doc_id % 5 != 0) and
    evaluated as a confusion matrix on the held-out 20% — the
    model-based classifier beside the marker-stopword heuristic
    (``lang_id_confusion``). NB over token counts is the standard
    fastText-adjacent baseline for corpus language routing.

    Relational form (no UDFs): the model is (class priors, per-class
    token totals, per-(class, token) counts) — three hash-aggregates of
    the train split, each vocabulary-bounded. Scoring joins every test
    token occurrence against the 5-row class table and the
    (class, token) count table (both broadcast; at web scale the count
    table is vocab x classes — storage-resident and shuffle-joinable,
    still never corpus-sized), sums log-probabilities per (doc, class),
    and takes the per-doc argmax with a 5-row window. Scores are
    rounded to 4dp before the argmax so the cross-engine float-sum
    jitter (~1e-12) cannot flip a prediction; ties break on class name.
    """
    scored = nb_scored(spark, sf_dir)
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round(F.col("s"), 4)), F.asc("c")
    )
    pred = scored.withColumn("rn", F.row_number().over(w_doc)).where(
        F.col("rn") == 1
    )
    return (
        pred.groupBy(
            F.col("actual").alias("actual_lang"),
            F.col("c").alias("pred_lang"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("actual_lang", "pred_lang")
    )


# the shared scored-table CTE prefix (through ``scored``) — reused by the
# calibration audit oracle in eval_ops.py
NB_SCORED_CTE = rf"""
WITH d AS (
  SELECT doc_id, lang, unnest(
    string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')
  ) AS w
  FROM documents
),
train AS (SELECT * FROM d WHERE doc_id % {_NB_TEST_MOD} <> 0),
test AS (SELECT * FROM d WHERE doc_id % {_NB_TEST_MOD} = 0),
cw AS (SELECT lang AS c, w, count(*) AS cnt FROM train GROUP BY lang, w),
cls AS (
  SELECT lang AS c, count(*) AS tot_c, count(DISTINCT doc_id) AS n_docs_c,
         ln(count(DISTINCT doc_id)
            / sum(count(DISTINCT doc_id)) OVER ()) AS ln_prior
  FROM train GROUP BY lang
),
v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM train),
scored AS (
  SELECT test.doc_id, test.lang AS actual, cls.c,
         max(cls.ln_prior)
         + sum(ln((coalesce(cw.cnt, 0) + 1.0)
                  / (cls.tot_c + (SELECT v FROM v)))) AS s
  FROM test CROSS JOIN cls
  LEFT JOIN cw ON cw.c = cls.c AND cw.w = test.w
  GROUP BY test.doc_id, test.lang, cls.c
)
"""

register(
    QuerySpec(
        "curation_naive_bayes_langid",
        _naive_bayes_langid,
        NB_SCORED_CTE
        + """
, pred AS (
  SELECT doc_id, actual, c,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY round(s, 4) DESC, c) AS rn
  FROM scored
)
SELECT actual AS actual_lang, c AS pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM pred WHERE rn = 1
GROUP BY actual, c
ORDER BY actual_lang, pred_lang
""",
        doc="trained multinomial Naive Bayes language classifier "
        "(add-one smoothing, 80/20 hash split) evaluated as a "
        "held-out confusion matrix — the model-based lang-ID next to "
        "the stopword heuristic",
        tags=("extension", "curation", "text", "training", "classifier"),
    )
)


# ---------------------------------------------------------------------------
# HITS hubs & authorities over the bipartite user -> item click graph
# ---------------------------------------------------------------------------

_HITS_ITERS = 3
_HITS_TOPK = 10


def _hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999) on the bipartite user->item click graph:
    hub scores live on users, authority scores on items, with the
    mutual-reinforcement updates a(i) = sum_u h(u), h(u) = sum_i a(i)
    over click edges, L1-normalized each round, 3 fixed iterations.
    PageRank (``graph_pagerank_coclick``) ranks by random-walk mass on
    the co-click projection; HITS keeps the two-sided structure — the
    recommender-ish "broad engaged users confer authority" signal.

    Iterative posture mirrors pagerank_undirected: the distinct edge
    list is built once; each half-iteration is ONE join of a
    node-score vector against the edges plus one groupBy; the L1
    normalizer is a broadcast 1-row aggregate (the legitimate scalar
    per round), and ``localCheckpoint`` truncates lineage. The final
    report is the global top-k via the lossless pre-reduction, never a
    data-sized single-task sort. Scores round to 8dp on both engines
    (cross-engine sum drift ~1e-15, far inside the quantum).
    """
    e = (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("u"),
            F.get_json_object("props", "$.k").try_cast("long").alias("k"),
        )
        .where(F.col("k").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    auth = hits_authorities(e, _HITS_ITERS)
    scored = auth.select("k", F.round("a", 8).alias("authority"))
    return global_topk(
        scored, _HITS_TOPK, F.desc("authority"), F.asc("k")
    ).select("rank", F.col("k").alias("item_k"), "authority")


def hits_authorities(edges: DataFrame, n_iter: int = _HITS_ITERS) -> DataFrame:
    """Fixed-iteration HITS over a bipartite ``(u, k)`` edge list →
    authority scores ``(k, a)`` (L1-normalized). The iteration core of
    ``graph_hits_bipartite``, factored over a generic edge list so the
    algorithm is property-testable against a dense numpy reference
    (tests/test_datasel.py) — the same layering as
    ``pagerank_undirected``."""
    hub = edges.select("u").distinct().withColumn("h", F.lit(1.0))
    auth = None
    for it in range(n_iter):
        a_raw = edges.join(hub, "u").groupBy("k").agg(F.sum("h").alias("a"))
        a_tot = a_raw.agg(F.sum("a").alias("t"))
        # the auth half stays lazy: its only consumers are the hub half
        # below (whose checkpoint materializes both) and the final
        # return of the LAST round — one materialization per round, not
        # two (r14, guide §2.4; the L1-normalizer scalars are broadcast
        # futures, evaluated concurrently with the streamed side)
        auth = a_raw.crossJoin(F.broadcast(a_tot)).select(
            "k", (F.col("a") / F.col("t")).alias("a")
        )
        if it == n_iter - 1:
            # the last round's hub half is never consumed — building
            # (and checkpointing) it was pure dead work
            break
        h_raw = edges.join(auth, "k").groupBy("u").agg(F.sum("a").alias("h"))
        h_tot = h_raw.agg(F.sum("h").alias("t"))
        hub = (
            h_raw.crossJoin(F.broadcast(h_tot))
            .select("u", (F.col("h") / F.col("t")).alias("h"))
            .localCheckpoint()
        )
    return auth


def _hits_oracle() -> str:
    """Unrolled 3-iteration HITS as chained CTEs (same structure as
    the pagerank oracle's unrolled power iterations)."""
    parts = [
        """
WITH e AS (
  SELECT DISTINCT user_id AS u,
         TRY_CAST(CASE WHEN json_valid(props) AND regexp_matches(json_extract_string(props, '$.k'), '^[\\x00-\\x20\\x7f]*[+-]?[0-9]+[\\x00-\\x20\\x7f]*$') THEN regexp_replace(json_extract_string(props, '$.k'), '^[\\x00-\\x20\\x7f]+|[\\x00-\\x20\\x7f]+$', '', 'g') END AS BIGINT) AS k
  FROM events
  WHERE event_type = 'click'
    AND TRY_CAST(CASE WHEN json_valid(props) AND regexp_matches(json_extract_string(props, '$.k'), '^[\\x00-\\x20\\x7f]*[+-]?[0-9]+[\\x00-\\x20\\x7f]*$') THEN regexp_replace(json_extract_string(props, '$.k'), '^[\\x00-\\x20\\x7f]+|[\\x00-\\x20\\x7f]+$', '', 'g') END AS BIGINT) IS NOT NULL
),
h0 AS (SELECT DISTINCT u, 1.0 AS h FROM e)"""
    ]
    prev_h = "h0"
    auth = None
    for i in range(1, _HITS_ITERS + 1):
        auth = f"a{i}"
        parts.append(
            f""",
a{i}_raw AS (SELECT e.k, sum({prev_h}.h) AS a
             FROM e JOIN {prev_h} USING (u) GROUP BY e.k),
a{i} AS (SELECT k, a / (SELECT sum(a) FROM a{i}_raw) AS a FROM a{i}_raw),
h{i}_raw AS (SELECT e.u, sum(a{i}.a) AS h
             FROM e JOIN a{i} USING (k) GROUP BY e.u),
h{i} AS (SELECT u, h / (SELECT sum(h) FROM h{i}_raw) AS h FROM h{i}_raw)"""
        )
        prev_h = f"h{i}"
    parts.append(
        f"""
SELECT CAST(row_number() OVER (ORDER BY round(a, 8) DESC, k) AS BIGINT)
         AS rank,
       k AS item_k, round(a, 8) AS authority
FROM {auth}
ORDER BY rank
LIMIT {_HITS_TOPK}"""
    )
    return "".join(parts)


register(
    QuerySpec(
        "graph_hits_bipartite",
        _hits_bipartite,
        _hits_oracle(),
        doc="HITS hubs/authorities over the bipartite user->item click "
        "graph (3 L1-normalized iterations, top-10 authorities) — the "
        "two-sided mutual-reinforcement ranking next to PageRank's "
        "co-click projection",
        tags=("extension", "graph", "iterative", "mining"),
    )
)


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021) — per-lang pass-rate report
# ---------------------------------------------------------------------------

_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021, Appendix A
    — the canonical heuristic battery MassiveText/RefinedWeb/Dolma all
    derive from), evaluated per document and reported as per-lang pass
    rates:

    - word count in [50, 100,000]
    - mean word length in [3, 10]
    - >= 80% of words contain at least one alphabetic character
    - >= 2 distinct "stop words" from the canonical 8-word probe list

    Every rule is a whole-stage-codegen array expression over the
    token array (aggregate/filter HOFs — no explode, no shuffle until
    the one per-lang hash-aggregate); output is lang-bounded. The
    thresholds are Gopher's own, kept verbatim so the pass rates mean
    what the paper's mean — the synthetic fixture mostly fails the
    50-word floor, which the report makes visible rather than hiding.
    """
    t = tokens(normalized(F.col("text")))
    d = _docs(spark, sf_dir).select(
        "lang",
        F.size(t).alias("n_words"),
        (
            F.aggregate(
                t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
            )
            / F.size(t)
        ).alias("mean_wlen"),
        (
            F.size(F.filter(t, lambda x: x.rlike("[a-z]")))
            / F.size(t)
        ).alias("alpha_frac"),
        F.size(
            F.array_intersect(
                F.array_distinct(t),
                F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
            )
        ).alias("n_stop"),
    )
    flags = d.select(
        "lang",
        F.col("n_words").between(50, 100000).cast("int").alias("p_wc"),
        F.col("mean_wlen").between(3.0, 10.0).cast("int").alias("p_wl"),
        (F.col("alpha_frac") >= 0.8).cast("int").alias("p_alpha"),
        (F.col("n_stop") >= 2).cast("int").alias("p_stop"),
    ).withColumn(
        "p_all",
        (
            (F.col("p_wc") == 1)
            & (F.col("p_wl") == 1)
            & (F.col("p_alpha") == 1)
            & (F.col("p_stop") == 1)
        ).cast("int"),
    )
    return (
        flags.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("p_wc").cast("long").alias("pass_wordcount"),
            F.sum("p_wl").cast("long").alias("pass_meanwordlen"),
            F.sum("p_alpha").cast("long").alias("pass_alphafrac"),
            F.sum("p_stop").cast("long").alias("pass_stopwords"),
            F.sum("p_all").cast("long").alias("pass_all"),
            F.round(F.sum("p_all") / F.count(F.lit(1)), 6).alias(
                "pass_rate"
            ),
        )
        .orderBy("lang")
    )


register(
    QuerySpec(
        "curation_gopher_rules",
        _gopher_rules,
        rf"""
WITH d AS (
  SELECT lang,
         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')),
                      ' ') AS t
  FROM documents
),
m AS (
  SELECT lang,
         len(t) AS n_words,
         CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
           / len(t) AS mean_wlen,
         CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
              AS DOUBLE) / len(t) AS alpha_frac,
         len(list_intersect(list_distinct(t),
             {list(_GOPHER_STOPWORDS)})) AS n_stop
  FROM d
),
flags AS (
  SELECT lang,
         CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS p_wc,
         CASE WHEN mean_wlen BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END AS p_wl,
         CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END AS p_alpha,
         CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS p_stop
  FROM m
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p_wc) AS BIGINT) AS pass_wordcount,
       CAST(sum(p_wl) AS BIGINT) AS pass_meanwordlen,
       CAST(sum(p_alpha) AS BIGINT) AS pass_alphafrac,
       CAST(sum(p_stop) AS BIGINT) AS pass_stopwords,
       CAST(sum(p_wc * p_wl * p_alpha * p_stop) AS BIGINT) AS pass_all,
       round(CAST(sum(p_wc * p_wl * p_alpha * p_stop) AS DOUBLE)
             / count(*), 6) AS pass_rate
FROM flags
GROUP BY lang
ORDER BY lang
""",
        doc="Gopher rule battery (Rae et al. 2021: word-count bounds, "
        "mean word length, alpha-word fraction, stopword probe) as "
        "per-lang pass rates — the canonical heuristic filter next to "
        "the model-based DSIR/perplexity/NB signals",
        tags=("extension", "curation", "text", "quality"),
    )
)


# ---------------------------------------------------------------------------
# sequence-length histogram (power-of-2 buckets) for batch shaping
# ---------------------------------------------------------------------------


def _seqlen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-sequence-length histogram in power-of-2 buckets per lang —
    what a training-data pipeline consults to pick packing lengths,
    bucket boundaries for length-grouped batching, and truncation
    budgets. Pure projections + one hash-aggregate; the bucket count
    is log-bounded (~20 buckets at any corpus size), so the report is
    constant-size regardless of scale.
    """
    d = _docs(spark, sf_dir).select(
        "lang", F.size(tokens(normalized(F.col("text")))).alias("n")
    )
    b = d.withColumn(
        "bucket_lo", F.pow(F.lit(2.0), F.floor(F.log2("n"))).cast("long")
    )
    cell = b.groupBy("lang", "bucket_lo").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n").cast("long").alias("min_toks"),
        F.max("n").cast("long").alias("max_toks"),
    )
    w_lang = Window.partitionBy("lang")
    return (
        cell.withColumn(
            "share",
            F.round(F.col("n_docs") / F.sum("n_docs").over(w_lang), 6),
        )
        .orderBy("lang", "bucket_lo")
    )


register(
    QuerySpec(
        "corpus_seqlen_histogram",
        _seqlen_histogram,
        r"""
WITH d AS (
  SELECT lang,
         len(string_split(lower(regexp_replace(trim(text), '\s+', ' ',
                                               'g')), ' ')) AS n
  FROM documents
),
b AS (
  SELECT lang, n,
         CAST(power(2.0, floor(log2(n))) AS BIGINT) AS bucket_lo
  FROM d
),
cell AS (
  SELECT lang, bucket_lo, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(min(n) AS BIGINT) AS min_toks,
         CAST(max(n) AS BIGINT) AS max_toks
  FROM b GROUP BY lang, bucket_lo
)
SELECT lang, bucket_lo, n_docs, min_toks, max_toks,
       round(n_docs / sum(n_docs) OVER (PARTITION BY lang), 6) AS share
FROM cell
ORDER BY lang, bucket_lo
""",
        doc="token-sequence-length histogram in power-of-2 buckets per "
        "lang (+ per-lang share) — the batch-shaping / packing-length "
        "planning report",
        tags=("extension", "corpus", "text", "statistics"),
    )
)
