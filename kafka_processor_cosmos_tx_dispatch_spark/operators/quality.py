"""In-engine trained quality classifier (logistic regression, integer
fixed-point, fully lazy).

The curation pipelines the reference's users run (CCNet/fastText-style
quality gates) apply a LINEAR classifier over hashed n-gram features;
``queries.text_quality_model`` is that inference shape with fixed
weights. This module TRAINS the weights in-engine: full-batch logistic
regression over hashed unigram+bigram bucket counts against a
bootstrap label column, as T unrolled gradient steps — the
``text_bpe_train`` lazy-loop shape, where the model state between
steps is a 1-row broadcast DataFrame (an ``array<long>`` of
fixed-point weights), never a driver-side collect.

Numeric contract (so a SQL oracle hash-compares bit-for-bit):

- Weights are integer MICRO units; scores/probabilities integer MILLI.
- The sigmoid is the *hard* sigmoid ``p = clamp(500 + z/4, 0, 1000)``
  (slope 1/4 at the origin, like the real one) — no transcendentals.
- All divisions are integer ``DIV`` (truncation toward zero — Spark's
  ``DIV`` and DuckDB's ``//`` agree on negatives).
- Gradient steps are diagonally preconditioned:
  ``w_b -= (g_b * 1000) DIV (h_b * den_t)`` with ``g_b = Σ_docs
  err·cnt_b`` and ``h_b = Σ_docs cnt_b²`` (a fixed per-bucket Newton
  scaling). Because g and h both scale linearly with corpus size, the
  step is CORPUS-SIZE-INVARIANT with no explicit N division. The
  ``den_t`` schedule (default 1, 2, 4) is a halving learning rate —
  hashed n-gram count features are strongly collinear along document
  length, and a constant step oscillates along that direction while
  the decaying schedule converges (measured: train AUC 0.785/0.970/
  0.797 at sf0.001/0.01/0.1 vs 0.25-0.5 for every constant-rate
  variant).

Scale: the corpus is never shuffled for scoring — the model re-enters
each step as a 1-row broadcast crossJoin and ``z`` is a row-local
array fold (the DSIR broadcast-model shape, operators/sampling.py).
Per step the only shuffle is the bucket-keyed gradient aggregate
(≤ buckets+1 rows out, map-side combinable); ``h`` adds one
(doc,bucket)-keyed count agg computed once. The corpus is re-scanned
once per gradient step plus once for the preconditioner (T+1 scans in
the single lazy plan); the 1-row model states and the ≤buckets+1-row
``h`` are lazily persist()ed — without that the nested model chain
re-derives the corpus feature subtree exponentially in T (measured 28
scans → 5 at T=3, sf0.1 7.0 s → 1.4 s). A many-epoch production run
would checkpoint the feature frame once instead.

Reference parity note: the reference (TopologyProducer.kt) has no
training surface — this extends the engine toward the LLM-curation
workload per the build brief.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import exprs as EX
from ..functions import text as TX
from .cache import PlanCache

__all__ = [
    "default_quality_label",
    "quality_features",
    "quality_train_model",
    "quality_train_unpersist",
    "quality_scored",
    "quality_train",
]

# Cache-lifetime ownership (ADVICE r13): each trainer invocation lazily
# persist()s h plus one 1-row model frame per gradient step; with no
# owner those blocks would accumulate for the session lifetime as the
# trainer runs over ever-changing inputs. The PlanCache evicts the
# previous run's frames ONLY when the training inputs actually changed
# (anchor plan or config key differ) — a re-run over the same corpus
# keeps the caches hot via CacheManager persist() dedupe, which bench
# minima and interactive sessions rely on. A stale returned model that
# is re-collected after eviction stays CORRECT (persist is only a cache
# hint; the lineage recomputes).
_TRAINER_CACHE = PlanCache()


def quality_train_unpersist() -> int:
    """Unpersist every cached frame of the most recent
    quality_train_model invocation; returns how many were freed."""
    return _TRAINER_CACHE.evict()


def default_quality_label() -> Column:
    """The bootstrap training label shared by the batch trainer queries
    (queries/text.py) and the streaming twin (streaming/incremental.py):
    English ∩ the Gopher word-count gate (50..100k empty-filtered
    whitespace tokens). Factored here so the twin's
    row-identical-to-batch contract cannot drift (ADVICE r13)."""
    t = F.filter(TX.tokens(F.col("text")), lambda w: w != "")
    return (F.col("lang") == "en") & F.size(t).between(50, 100000)


def quality_features(
    docs: DataFrame,
    label: Column,
    buckets: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, y, fb) per document: y = label as 0/1 int, fb = hashed
    unigram+bigram bucket ids in [0, buckets) with one trailing BIAS
    pseudo-bucket ``buckets`` (so the bias trains like any weight).
    Duplicates kept — they are the counts. Empty docs keep the bias
    feature, so no row drops."""
    t = EX.bind(
        F.filter(TX.tokens(F.col(text_col)), lambda w: w != ""),
        lambda tc: F.concat(tc, TX.word_shingles(tc, 2)),
    )
    fb = F.concat(
        F.transform(
            t,
            lambda f: F.conv(F.substring(F.md5(f), 1, 15), 16, 10).cast(
                "long"
            )
            % buckets,
        ),
        F.array(F.lit(buckets).cast("long")),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(label, 1).otherwise(0).cast("int").alias("y"),
        fb.alias("fb"),
    )


def _score_micro(warr: Column, fb: Column) -> Column:
    """z = Σ_occurrences w[bucket] — row-local array fold (micro)."""
    return F.aggregate(
        fb,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(warr, (b + 1).cast("int")),
    )


def _p_milli_expr(z_col: str) -> str:
    return f"GREATEST(CAST(0 AS BIGINT), LEAST(CAST(1000 AS BIGINT), 500 + ({z_col} DIV 1000) DIV 4))"


def quality_train_model(
    feats: DataFrame,
    buckets: int = 512,
    lr_dens: Sequence[int] = (1, 2, 4),
) -> DataFrame:
    """Train and return the model as ONE row ``[warr: array<long>]``
    of length buckets+1 (index ``buckets`` = bias), lazily — the whole
    T-step trainer is a single Catalyst plan."""
    spark = feats.sparkSession
    occ = feats.select("doc_id", "y", F.explode("fb").alias("b"))
    # h_b = Σ_docs cnt² — step-invariant diagonal preconditioner.
    # Persisted (lazily): every unrolled step's delta joins it, and each
    # persisted TINY frame (≤ buckets+1 rows; the models are 1 row)
    # breaks the otherwise-exponential re-derivation of the corpus
    # feature subtree inside the nested model chain (measured: 28
    # parquet scans → T+2 without changing one-lazy-plan semantics —
    # persist materializes on first action only).
    fc = occ.groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    h = fc.groupBy("b").agg(F.sum(F.col("c") * F.col("c")).alias("h"))
    # keep the caches when re-training on the same inputs (persist()
    # dedupes into them); evict them when the corpus/label/config moved
    _TRAINER_CACHE.begin(h, (buckets, tuple(lr_dens)))
    h = _TRAINER_CACHE.register(h.persist())

    model = spark.range(1).select(
        F.expr(f"array_repeat(CAST(0 AS BIGINT), {buckets + 1})").alias(
            "warr"
        )
    )
    for den in lr_dens:
        errd = feats.crossJoin(F.broadcast(model)).select(
            "doc_id",
            "fb",
            _score_micro(F.col("warr"), F.col("fb")).alias("z"),
            "y",
        )
        errd = errd.select(
            "doc_id",
            "fb",
            (
                F.expr(_p_milli_expr("z")) - F.lit(1000) * F.col("y")
            ).alias("err"),
        )
        g = errd.select(
            F.explode("fb").alias("b"), "err"
        ).groupBy("b").agg(F.sum("err").alias("g"))
        delta = g.join(h, "b").select(
            "b",
            F.expr(f"(g * 1000) DIV (h * {den})").alias("d"),
        )
        dmap = delta.agg(
            F.map_from_entries(
                F.collect_list(F.struct("b", "d"))
            ).alias("dm")
        )
        model = model.crossJoin(F.broadcast(dmap)).select(
            F.transform(
                F.sequence(F.lit(0), F.lit(buckets)),
                lambda j: F.element_at(
                    F.col("warr"), (j + 1).cast("int")
                )
                - F.coalesce(
                    F.element_at(F.col("dm"), j.cast("long")),
                    F.lit(0).cast("long"),
                ),
            ).alias("warr")
        ).persist()
        _TRAINER_CACHE.register(model)
    return model


def quality_scored(feats: DataFrame, model: DataFrame) -> DataFrame:
    """(doc_id, y, p_milli) — score every document with the model via
    one broadcast crossJoin + row-local fold; no shuffle."""
    return (
        feats.crossJoin(F.broadcast(model))
        .select(
            "doc_id",
            "y",
            _score_micro(F.col("warr"), F.col("fb")).alias("z"),
        )
        .select(
            "doc_id",
            "y",
            F.expr(_p_milli_expr("z")).alias("p_milli"),
        )
    )


def quality_train(
    docs: DataFrame,
    label: Column,
    buckets: int = 512,
    lr_dens: Sequence[int] = (1, 2, 4),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The full trainer surface: (bucket, w) rows of the final model
    (buckets+1 rows; bucket == ``buckets`` is the bias)."""
    feats = quality_features(
        docs, label, buckets=buckets, id_col=id_col, text_col=text_col
    )
    model = quality_train_model(feats, buckets=buckets, lr_dens=lr_dens)
    return model.select(
        F.posexplode("warr").alias("bucket", "w")
    ).select(F.col("bucket").cast("int").alias("bucket"), "w")
