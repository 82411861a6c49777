"""Relational BM25 extractive summary — the reference's summary pipeline
(parser/summary.go:43-161) re-expressed as explode → hash-agg → window.

The Go implementation is O(sentences² × tokens) per document: for every
token of every sentence it rescans all sentences to count document frequency
(summary.go:49-55). Relationally the same quantities are linear:

    tf(doc, sent, term)  = count(*)            group by (doc, sent, term)
    df(doc, term)        = count(distinct sent) group by (doc, term)
    N(doc), avg_len(doc) = count / avg          group by doc

and the BM25 sum runs as one more hash aggregation. Faithfulness notes
(SURVEY.md §2.6):
  - the reference sums per token *occurrence*, not per distinct term
    (summary.go:49 iterates tokens) — reproduced by the trailing ×tf;
  - idf = max(0, ln((N-df+0.5)/(df+0.5))) (summary.go:57-62), k1=1.2 b=0.75;
  - top-2 sentences are emitted in original order (summary.go:149-157);
    Go's sort.Slice is unstable on score ties — we pin the tie-break to
    sent_idx (documented deviation, makes results deterministic);
  - ≤2 sentences → no scoring, pure truncation (summary.go:110-112);
  - the result is truncated to 300 runes + '・・・' (summary.go:164-171).

Term weights (posWeights, summary.go:23-30) enter via an optional broadcast
dimension join — the lookup-enrich pattern; absent terms weight 1.0.

Scale: every aggregation here is partial-aggregatable; the only shuffles are
on (doc, …) keys, and the window partitions by doc only for rows that
survived the per-sentence rollup (sentence grain, not token grain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from blogparser_spark.functions import patterns as P

K1 = P.BM25_K1
B = P.BM25_B
TOP_K = 2


def explode_sentences(
    df: DataFrame, doc_col: str, text_col: str, delim: str = P.SENTENCE_DELIM
) -> DataFrame:
    """(doc, text) → (doc, sent_idx, sentence): split on the delimiter, trim,
    drop empties, keep original positions (splitSentences, summary.go:244-254)."""
    sents = F.filter(
        F.transform(F.split(F.col(text_col), delim), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    return df.select(
        F.col(doc_col).alias("doc"), F.posexplode(sents).alias("sent_idx", "sentence")
    )


def bm25_sentence_scores(
    sent_df: DataFrame, weights_dim: DataFrame | None = None
) -> DataFrame:
    """(doc, sent_idx, sentence) → + bm25 score.

    weights_dim: optional broadcast dim (term string, weight double) — the
    posWeights analog; unmatched terms get weight 1.0."""
    toks = sent_df.select(
        "doc",
        "sent_idx",
        F.length("sentence").alias("sent_len"),
        F.explode(
            F.filter(F.split(F.lower("sentence"), r"\s+"), lambda t: t != "")
        ).alias("term"),
    )
    if weights_dim is not None:
        toks = toks.join(F.broadcast(weights_dim), "term", "left").withColumn(
            "weight", F.coalesce("weight", F.lit(1.0))
        )
    else:
        toks = toks.withColumn("weight", F.lit(1.0))

    tf = toks.groupBy("doc", "sent_idx", "sent_len", "term", "weight").agg(
        F.count("*").alias("tf")
    )
    df_t = tf.groupBy("doc", "term").agg(F.countDistinct("sent_idx").alias("df"))
    doc_stats = sent_df.groupBy("doc").agg(
        F.count("*").alias("n_sents"), F.avg(F.length("sentence")).alias("avg_len")
    )

    idf = F.greatest(
        F.lit(0.0),
        F.log((F.col("n_sents") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
    )
    # per-occurrence summation: the whole-term contribution × tf again
    term_score = (
        idf
        * F.col("tf")
        * (K1 + 1)
        / (F.col("tf") + K1 * (1 - B + B * F.col("sent_len") / F.col("avg_len")))
        * F.col("weight")
        * F.col("tf")
    )
    # doc_stats is one row per doc — NOT broadcastable at corpus scale;
    # the join keys already share the (doc, …) partitioning, AQE handles it
    scored = (
        tf.join(df_t, ["doc", "term"])
        .join(doc_stats, "doc")
        .groupBy("doc", "sent_idx")
        .agg(F.sum(term_score).alias("score"))
    )
    return sent_df.join(scored, ["doc", "sent_idx"], "left").withColumn(
        "score", F.coalesce("score", F.lit(0.0))
    )


def bm25_summary(
    df: DataFrame,
    doc_col: str,
    text_col: str,
    weights_dim: DataFrame | None = None,
    top_k: int = TOP_K,
    delim: str = P.SENTENCE_DELIM,
) -> DataFrame:
    """(doc, text) → (doc, summary): BM25 top-k sentences re-ordered by
    position, concatenated with no separator, truncated to 300 runes."""
    from blogparser_spark.functions.text import truncate_summary

    sent = explode_sentences(df, doc_col, text_col, delim)
    n_per_doc = Window.partitionBy("doc")
    sent = sent.withColumn("n_sents", F.count("*").over(n_per_doc))

    few = sent.filter(F.col("n_sents") <= top_k)
    many = sent.filter(F.col("n_sents") > top_k).drop("n_sents")

    scored = bm25_sentence_scores(many, weights_dim)
    rank_w = Window.partitionBy("doc").orderBy(F.desc("score"), F.asc("sent_idx"))
    picked = scored.withColumn("rank", F.row_number().over(rank_w)).filter(
        F.col("rank") <= top_k
    )

    assembled = (
        picked.select("doc", "sent_idx", "sentence")
        .unionByName(few.select("doc", "sent_idx", "sentence"))
        .groupBy("doc")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("sent_idx", "sentence"))
                    ),
                    lambda s: s["sentence"],
                ),
                "",
            ).alias("summary_raw")
        )
    )
    return assembled.select(
        F.col("doc"), truncate_summary(F.col("summary_raw")).alias("summary")
    )
