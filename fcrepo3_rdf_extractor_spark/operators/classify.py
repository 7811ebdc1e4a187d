"""Trained quality-classifier filtering — the modality CCNet / LLaMA-style
pipelines run AFTER the structural filters: a linear classifier over
hashed text features scores every document by "how much does this look
like the target corpus", and the keep decision thresholds the score.
DSIR (operators/text.py:dsir_importance) is the importance-sampling
variant of the same idea; this is the discriminative one.

Design (idiomatic Spark, not a port of any ML library):
- features are L1-normalized hashed-unigram bucket counts, buckets keyed
  by the first two hex chars of md5(token) — string keys, portable to
  the DuckDB oracle with no integer conversion (same trick as
  dsir_importance)
- the weight vector is METADATA (<= 257 doubles incl. bias): it lives on
  the driver between iterations and broadcasts into each step — the same
  driver-held-literal discipline as kmeans_train / pq_train_codebooks
- one iteration = two distributed aggregations: per-doc score (join
  features with the broadcast weight table, groupBy doc_id) and the
  gradient (groupBy bucket). Both shuffles carry map-side partial
  aggregation; the per-iteration collect is the 256-row gradient —
  metadata-sized, the canonical bounded driver loop over distributed
  steps.
- full-batch gradient ascent on the log-likelihood with a fixed
  iteration count and zero initialization: no RNG, no convergence
  test — deterministic, resumable, and exactly unrollable as the
  oracle's CTE chain.

Scale shape at 100 TB: the corpus explodes once into (doc_id, bucket)
rows and is re-aggregated per iteration; everything else is
metadata-sized. A production run would persist the feature table once
(it is reused n_iter times) — the trainer takes a ``persist_features``
flag for exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col

BIAS_KEY = "__bias__"


def hashed_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, g, x): L1-normalized hashed-unigram bucket counts —
    x(d, g) = count of tokens of d hashing to g / total tokens of d.
    Buckets are md5-prefix strings (<= 256 of them)."""
    toks = df.select(
        id_col, F.explode(tokens_col(F.col(text_col))).alias("_tok")
    ).select(id_col, F.substring(F.md5("_tok"), 1, 2).alias("g"))
    n = toks.groupBy(id_col).agg(F.count("*").alias("_n"))
    return (
        toks.groupBy(id_col, "g")
        .agg(F.count("*").alias("_c"))
        .join(n, id_col)
        .select(id_col, "g", (F.col("_c") / F.col("_n")).alias("x"))
    )


def logreg_train(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    lr: float = 2.0,
    n_iter: int = 4,
    persist_features: bool = True,
) -> dict[str, float]:
    """Full-batch logistic regression over hashed-unigram features:
    returns {bucket -> weight} including ``BIAS_KEY``. ``label`` is a
    boolean/0-1 Column over ``df`` (e.g. ``F.col('lang') == 'en'``).

    Update rule (gradient ASCENT on log-likelihood, no regularization):
    w += lr/n_docs * sum_d (y_d - sigmoid(w.x_d + b)) x_d, same for the
    bias with x = 1. Weights exist for buckets OBSERVED in the corpus
    (unobserved buckets have x = 0 everywhere, so their weight stays 0
    and never matters); zero-initialized.

    The bias rides the SAME aggregation as the weights: every document
    gets a ``BIAS_KEY`` pseudo-bucket with x = 1 in the feature frame,
    so its weight term contributes b to every z and its gradient row is
    exactly sum(r). One iteration is therefore ONE action (the <=257-row
    gradient collect) and the scored subplan evaluates once — the
    previous separate bias collect evaluated it twice per iteration."""
    labeled = df.select(id_col, label.cast("double").alias("y"))
    feats = hashed_features(df, text_col, id_col).unionByName(
        labeled.select(
            id_col, F.lit(BIAS_KEY).alias("g"), F.lit(1.0).alias("x")
        )
    )
    if persist_features:
        feats = feats.persist()
    try:
        n_docs = labeled.count()
        buckets = [r.g for r in feats.select("g").distinct().collect()]
        w = {g: 0.0 for g in buckets}
        spark = df.sparkSession
        for _ in range(n_iter):
            wtab = F.broadcast(
                spark.createDataFrame(list(w.items()), "g string, w double")
            )
            z = (
                feats.join(wtab, "g")
                .groupBy(id_col)
                .agg(F.sum(F.col("x") * F.col("w")).alias("z"))
            )
            scored = labeled.join(z, id_col, "left").select(
                id_col,
                (
                    F.col("y")
                    - F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-F.coalesce("z", F.lit(0.0))))
                ).alias("r"),
            )
            grad = (
                feats.join(scored, id_col)
                .groupBy("g")
                .agg(F.sum(F.col("r") * F.col("x")).alias("gw"))
            )
            # the ONE metadata-sized action per iteration: <=256 bucket
            # gradients + the BIAS_KEY row (= sum of residuals)
            for row in grad.collect():
                w[row.g] += lr * row.gw / n_docs
    finally:
        if persist_features:
            feats.unpersist()
    return dict(w)


def classifier_eval(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    holdout_chars: tuple[str, ...] = ("0", "1", "2", "3"),
    lr: float = 2.0,
    n_iter: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Measured classifier evaluation — train on a deterministic
    complement slice, score the held-out slice, and report ONE row:
    (n_train, n_holdout, n_pos, n_neg, accuracy, auc). The split is
    content-independent and portable (first hex char of md5(doc_id)
    in ``holdout_chars`` → holdout; default 4/16 = 25%), so the same
    rule replays in any engine and is stable under corpus growth.

    AUC is the tie-aware Mann-Whitney statistic computed WITHOUT a
    corpus-sized sort: scored docs first collapse to per-distinct-score
    (pos, neg) counts — and because ``classifier_score`` rounds
    p_target to 6 decimals, that table is HARD-BOUNDED at 1e6+1 rows
    regardless of corpus size — then one ordered prefix sum over the
    bounded table yields, for each score s, the count of negatives
    strictly below s; AUC = sum(pos_s * (neg_below_s + neg_s/2)) /
    (n_pos * n_neg). The single-partition window is therefore
    metadata-scale by construction (same bounded-table discipline as
    the ANN recall gates), never a window over documents.

    Accuracy uses the ``keep`` decision (thresholded on the UNrounded
    probability, matching ``classifier_score``). The quality FLOOR for
    this gate is pinned in pytest on a separable planted corpus
    (test_logreg_holdout_accuracy_gate / test_classifier_eval_*);
    on corpora whose classes share a vocabulary the honest reading is
    AUC ~ 0.5 and this operator reports it rather than hiding it."""
    hx = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    train = df.filter(~hx.isin(*holdout_chars))
    hold = df.filter(hx.isin(*holdout_chars))
    w = logreg_train(train, label, text_col, id_col, lr, n_iter)
    scored = classifier_score(hold, w, text_col, id_col, threshold)
    labeled = hold.select(id_col, label.cast("double").alias("y"))
    ev = scored.join(labeled, id_col)
    by_score = ev.groupBy("p_target").agg(
        F.sum("y").alias("pos"),
        F.sum(F.lit(1.0) - F.col("y")).alias("neg"),
        F.sum(
            (F.col("keep") == (F.col("y") == 1.0)).cast("double")
        ).alias("ok"),
    )
    wdw = (
        Window.orderBy("p_target")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = by_score.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(wdw), F.lit(0.0))
    )
    metrics = cum.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.round(
            F.sum("ok") / (F.sum("pos") + F.sum("neg")), 6
        ).alias("accuracy"),
        F.round(
            F.try_divide(
                F.sum(
                    F.col("pos")
                    * (F.col("neg_below") + F.col("neg") / F.lit(2.0))
                ),
                F.sum("pos") * F.sum("neg"),
            ),
            6,
        ).alias("auc"),
        # try_divide: a single-class holdout (n_pos or n_neg = 0) has
        # an UNDEFINED AUC — report NULL, never an ANSI DIVIDE_BY_ZERO
        # job abort (the oracle's CASE WHEN mirrors this)
    )
    counts = train.agg(F.count("*").alias("n_train")).crossJoin(
        hold.agg(F.count("*").alias("n_holdout"))
    )
    # 1-row x 1-row scalar panel join — the documented-fine BNLJ class
    return counts.crossJoin(metrics).select(
        "n_train", "n_holdout", "n_pos", "n_neg", "accuracy", "auc"
    )


def classifier_score(
    df: DataFrame,
    weights: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document with a trained classifier: (id, p_target,
    keep). The weight table is metadata — broadcast, one join + one
    per-doc aggregation; at 10^12 files this is one pass."""
    b = weights.get(BIAS_KEY, 0.0)
    items = [(g, v) for g, v in weights.items() if g != BIAS_KEY]
    wtab = F.broadcast(
        df.sparkSession.createDataFrame(items, "g string, w double")
    )
    feats = hashed_features(df, text_col, id_col)
    z = (
        feats.join(wtab, "g")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("w")).alias("z"))
    )
    p = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.coalesce("z", F.lit(0.0)) + F.lit(b)))
    )
    return (
        df.select(id_col)
        .join(z, id_col, "left")
        .select(
            id_col,
            F.round(p, 6).alias("p_target"),
            (p >= threshold).alias("keep"),
        )
    )
