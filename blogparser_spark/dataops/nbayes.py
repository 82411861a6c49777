"""Multinomial Naive Bayes text classifier over hashed word features —
the fastText-without-embeddings baseline (Joulin et al. 2017 cite
McCallum & Nigam 1998's multinomial NB as the classical linear-text-
classifier baseline; CCNet-style pipelines use exactly this shape for
cheap language/quality routing). Trained distributed ON the corpus with
a deterministic hash split, so no external model artifact exists and
every weight is reproducible from the input table.

Model: add-one-smoothed multinomial NB over B md5-hashed token buckets
(the dsir_bucket_counts feature map, curation.py):
    llw(c, b)  = ln (cnt(c, b) + 1) - ln (cnt(c, ·) + B)
    prior(c)   = ln (docs(c) + 1) - ln (docs(·) + L)
    score(d,c) = prior(c) + sum over tokens t of llw(c, bucket(t))
prediction = argmax_c score (tie-break: class asc).

Shape / scale: training collapses corpus-scale token volume to an
(L × B)-row weight table in ONE partial hash agg (only (class, bucket,
partial-count) rows shuffle); the model joins back BROADCAST at scoring
time; per-document scores are one partial agg keyed on the doc; the
argmax is min(struct(-score, class)) — map-side-combinable, no window.
Everything is codegen-native Columns; no UDF anywhere.

Determinism / oracle portability: counts are exact ints; weights are
ln-ratios of exact ints quantized to integer micros (floor(x*1e6+0.5),
module convention), so per-doc scores are exact integer sums —
aggregation order is never observable and the DuckDB oracle replays the
arithmetic verbatim. The train/test split is md5('<salt>:<id>') % k, the
curation.py sampling convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from blogparser_spark.dataops.common import md5_bucket, micro as _micro
from blogparser_spark.dataops.textstats import tokens

NB_BUCKETS = 32
NB_SPLIT_MOD = 5  # doc_id-hash fold count: fold 0 tests, folds 1-4 train


def nb_bucket(col: Column, n_buckets: int = NB_BUCKETS) -> Column:
    """md5-hash a token to a feature bucket (common.md5_bucket — the
    dsir_bucket_counts expression, exact in DuckDB)."""
    return md5_bucket(col, n_buckets)


def split_fold(id_col: Column, salt: str = "nb") -> Column:
    """Deterministic md5 fold in [0, NB_SPLIT_MOD) — fold 0 is the held-
    out test set, the rest train (the curation.py hash-split convention:
    no shuffle, no sampling state, identical in DuckDB)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % NB_SPLIT_MOD
    )


def _doc_tokens(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    label_col: str,
    n_buckets: int = NB_BUCKETS,
) -> DataFrame:
    """(id, label, fold, bucket) one row per token occurrence."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        split_fold(F.col(id_col)).alias("fold"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).select(
        "id", "label", "fold", nb_bucket(F.col("tok"), n_buckets).alias("bucket")
    )


def nb_train(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = NB_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Train on the hash-split train folds. Returns (weights, priors):
    weights = (label, bucket, cnt, llw_u) on the FULL label × bucket
    spine (smoothing must see absent buckets — the dsir_log_ratios rule);
    priors = (label, n_docs, prior_u). Both are (L × B)- and L-sized
    dims: always broadcastable, at any corpus scale."""
    spark = docs.sparkSession
    toks = _doc_tokens(docs, text_col, id_col, label_col, n_buckets).filter(
        F.col("fold") != 0
    )
    labels = docs.select(F.col(label_col).alias("label")).distinct()
    spine = labels.crossJoin(
        spark.range(n_buckets).select(F.col("id").alias("bucket"))
    )
    counts = toks.groupBy("label", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    full = spine.join(counts, ["label", "bucket"], "left").select(
        "label",
        "bucket",
        F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"),
    )
    class_tot = full.groupBy("label").agg(
        F.sum("cnt").cast("bigint").alias("ctot")
    )
    weights = full.join(F.broadcast(class_tot), "label").select(
        "label",
        "bucket",
        "cnt",
        _micro(
            F.log(F.col("cnt") + 1) - F.log(F.col("ctot") + n_buckets)
        ).alias("llw_u"),
    )
    docs_per = (
        docs.select(
            F.col(label_col).alias("label"),
            split_fold(F.col(id_col)).alias("fold"),
        )
        .filter(F.col("fold") != 0)
        .groupBy("label")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
    n_labels = labels.count()  # L-bounded driver constant (like k in kmeans)
    docs_full = labels.join(docs_per, "label", "left").select(
        "label", F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs")
    )
    tot = docs_full.agg(F.sum("n_docs").cast("bigint").alias("ntot"))
    priors = docs_full.crossJoin(F.broadcast(tot)).select(
        "label",
        "n_docs",
        _micro(
            F.log(F.col("n_docs") + 1) - F.log(F.col("ntot") + n_labels)
        ).alias("prior_u"),
    )
    return weights, priors


def nb_predict(
    docs: DataFrame,
    weights: DataFrame,
    priors: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = NB_BUCKETS,
) -> DataFrame:
    """Score the fold-0 test documents: (id, label, pred, score_u).
    `n_buckets` must match the value the weights were trained with.
    Tokens explode once, join the BROADCAST weight dim on bucket (L rows
    out per token), partial-agg per (doc, candidate), add the prior, and
    take the argmax as min(struct(-score, candidate)) — no window, no
    second pass over text.

    Zero-token documents are EXCLUDED: a fold-0 doc whose text tokenizes
    to nothing has no rows after the explode, so it appears in neither
    the output nor nb_confusion's totals (the confusion matrix counts
    scoreable docs, not the fold size). The DuckDB oracle and the Python
    twin replicate the same exclusion."""
    toks = _doc_tokens(docs, text_col, id_col, label_col, n_buckets).filter(
        F.col("fold") == 0
    )
    scored = (
        toks.join(
            F.broadcast(
                weights.select(
                    F.col("label").alias("cand"), "bucket", "llw_u"
                )
            ),
            "bucket",
        )
        .groupBy("id", "label", "cand")
        .agg(F.sum("llw_u").cast("bigint").alias("tok_u"))
        .join(
            F.broadcast(priors.select(F.col("label").alias("cand"), "prior_u")),
            "cand",
        )
        .select(
            "id",
            "label",
            "cand",
            (F.col("tok_u") + F.col("prior_u")).alias("score_u"),
        )
    )
    return (
        scored.groupBy("id", "label")
        .agg(
            F.min(
                F.struct((-F.col("score_u")).alias("neg"), F.col("cand"))
            ).alias("b")
        )
        .select(
            "id",
            "label",
            F.col("b.cand").alias("pred"),
            (-F.col("b.neg")).cast("bigint").alias("score_u"),
        )
    )


def nb_confusion(pred: DataFrame) -> DataFrame:
    """(label, pred, n_docs) confusion matrix over the test fold — the
    L²-row evaluation summary. Totals count SCOREABLE docs only:
    zero-token fold-0 docs never reach nb_predict's output (see its
    docstring), so sum(n_docs) can undercount the fold size."""
    return pred.groupBy("label", "pred").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
