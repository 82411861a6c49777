"""Unigram-LM subword tokenizer (Kudo, "Subword Regularization", ACL 2018
— the SentencePiece unigram model) trained distributed with hard-EM:
Viterbi-segment the word dictionary under the current piece scores, count
piece usage, prune, re-estimate. Complements the BPE family in
dataops/lm.py — the two dominant subword-tokenizer algorithms are then
both first-class, trainable, and oracle-replayable.

Shape / scale (the BPE reduction, lm.py word_freq_dict): corpus-scale
token volume collapses to a VOCABULARY-scale (word, cnt) dictionary in
one partial hash agg, and every EM quantity — candidate pieces, DP
lattice, path counts — is weighted by cnt and sized by the dictionary,
never by the corpus. At 100 TB the dictionary is ~10^8 words; every step
below is a bounded number (max_word_len) of dict-sized codegen
joins/partial aggs with the piece table BROADCAST (piece vocab is 10^4-
10^5 rows — orders below any broadcast threshold).

Viterbi is RELATIONAL, not a UDF: the segmentation lattice is an edge
table (word, j, i, piece) for every ≤max_piece_len substring span, and
shortest-path over the position-DAG is max_word_len sequential rounds of
  best(i) = min over edges (j -> i) of best(j) + cost(piece)
each one dict-sized join + min(struct) partial agg (the map-side-
combinable min(struct) convention from dedup.py). The backtrace is the
same number of bounded rounds walking prev pointers. No per-row Python,
no global windows (the prune top-V is a TakeOrdered limit), no collect —
the learned piece table itself is the (small) result.

Determinism / oracle portability: piece log-probabilities live in
integer micros, floor(x*1e6 + 0.5) of ln-ratios of exact integer counts
(module convention — tie-free, absorbs libm ulp skew between engines);
path costs are exact integer sums of micros; argmin tie-break is
min(struct(cost_u, prev)) — prev asc prefers the LONGEST last piece, and
the span is then fully determined by (word, prev, pos), so no residual
tie exists. The DuckDB oracles replay the same DP as unrolled CTEs.

Reference scope note: the reference has no subword tokenizer (its
tokenizer is parser/summary.go:216's dictionary lookup); this module is
part of the LLM-data-pipeline surface the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blogparser_spark.dataops.common import micro as _micro
from blogparser_spark.dataops.lm import word_freq_dict


def seed_pieces(wd: DataFrame, max_piece_len: int = 4) -> DataFrame:
    """(piece, cnt) candidate-piece counts: every substring of length
    1..max_piece_len of every dictionary word, weighted by the word's
    corpus count — the standard unigram seed vocabulary (Kudo 2018 §3.2
    seeds from frequent substrings). Double explode(sequence) fan-out is
    dict × len × max_piece_len rows, then one partial hash agg back to
    piece-vocabulary size."""
    return (
        _spans(wd.select("cnt", "word"), max_piece_len)
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def _spans(wd: DataFrame, max_piece_len: int) -> DataFrame:
    """One row per substring span word[j..i), i-j ≤ max_piece_len, with
    the span's piece text; passes through every other input column."""
    return (
        wd.select(
            "*", F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i")
        )
        .select(
            "*",
            F.explode(F.sequence(F.lit(1), F.lit(max_piece_len))).alias("m"),
        )
        .filter(F.col("m") <= F.col("i"))
        .select(
            "*",
            (F.col("i") - F.col("m")).alias("j"),
            F.col("word").substr(
                F.col("i") - F.col("m") + F.lit(1), F.col("m")
            ).alias("piece"),
        )
        .drop("m")
    )


def piece_scores(pieces: DataFrame) -> DataFrame:
    """(piece, cnt, logp_u): unigram log-probability ln(cnt/total) in
    integer micros. The 1-row total joins back broadcast — no collect."""
    tot = pieces.agg(F.sum("cnt").cast("bigint").alias("total"))
    return pieces.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        _micro(F.log("cnt") - F.log("total")).alias("logp_u"),
    )


def _lattice_edges(
    wd: DataFrame, scores: DataFrame, max_piece_len: int
) -> DataFrame:
    """(word, j, i, piece, logp_u) — one row per in-vocabulary span. The
    piece table joins BROADCAST (piece vocab ≪ any broadcast threshold
    at any corpus scale)."""
    return _spans(wd.select("word"), max_piece_len).join(
        F.broadcast(scores.select("piece", "logp_u")), "piece"
    )


def viterbi_best(
    wd: DataFrame,
    scores: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 8,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Forward DP table (word, pos, cost_u, prev): the min-cost
    segmentation of every dictionary word's prefix word[0..pos) under
    `scores`, cost_u = sum of -logp_u micros. max_word_len sequential
    rounds — position i is computed from all positions < i in one
    dict-sized join + min(struct) partial agg. Words longer than
    max_word_len are excluded up front (documented cap — raise the
    parameter; the loop is O(max_word_len)). localCheckpoint every few
    rounds truncates the growing lineage (the BPE-learner convention)."""
    wd = wd.filter(F.length("word") <= max_word_len)
    edges = _lattice_edges(wd, scores, max_piece_len).localCheckpoint()
    best = wd.select(
        "word",
        F.lit(0).alias("pos"),
        F.lit(0).cast("bigint").alias("cost_u"),
        F.lit(-1).alias("prev"),
    )
    for i in range(1, max_word_len + 1):
        step = (
            edges.filter(F.col("i") == i)
            .join(
                best.select(
                    "word",
                    F.col("pos").alias("j"),
                    F.col("cost_u").alias("pc"),
                ),
                ["word", "j"],
            )
            .groupBy("word")
            .agg(
                F.min(
                    F.struct(
                        (F.col("pc") - F.col("logp_u")).alias("cost_u"),
                        F.col("j").alias("prev"),
                    )
                ).alias("b")
            )
            .select(
                "word",
                F.lit(i).alias("pos"),
                F.col("b.cost_u").alias("cost_u"),
                F.col("b.prev").alias("prev"),
            )
        )
        best = best.unionByName(step)
        if i % checkpoint_every == 0 or i == max_word_len:
            best = best.localCheckpoint()
    return best


def viterbi_path_pieces(
    wd: DataFrame,
    scores: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 8,
    best: DataFrame | None = None,
) -> DataFrame:
    """(word, cnt, pos, prev, piece) — one row per piece on each word's
    Viterbi path. The backtrace walks prev pointers from pos = len(word):
    max_word_len bounded rounds, each a dict-sized join. This raw row
    form is the authoritative path representation: EM counts aggregate
    from it directly, so a piece that happens to CONTAIN the display
    delimiter can never be miscounted. Pass a precomputed `best` DP table
    to avoid re-running the forward rounds (viterbi_segments shares its
    own)."""
    if best is None:
        best = viterbi_best(wd, scores, max_piece_len, max_word_len)
    wd = wd.filter(F.length("word") <= max_word_len)
    cur = wd.select(
        "word", "cnt", F.length("word").cast("int").alias("pos")
    ).join(best, ["word", "pos"])
    out = None
    for _ in range(max_word_len):
        emit = cur.filter(F.col("pos") > 0).select(
            "word",
            "cnt",
            "pos",
            "prev",
            F.col("word").substr(
                F.col("prev") + F.lit(1), F.col("pos") - F.col("prev")
            ).alias("piece"),
        )
        out = emit if out is None else out.unionByName(emit)
        cur = (
            emit.filter(F.col("prev") > 0)
            .select("word", "cnt", F.col("prev").alias("pos"))
            .join(best, ["word", "pos"])
        )
    return out


def viterbi_segments(
    wd: DataFrame,
    scores: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 8,
) -> DataFrame:
    """(word, cnt, toks, n_pieces, cost_u) — the Viterbi segmentation of
    every dictionary word, pieces joined '|' in path order (display
    form — use viterbi_path_pieces for anything that must count pieces
    exactly). Per-word piece lists are ≤ max_word_len elements so the
    final collect_list is bounded (the capped-collect convention)."""
    best = viterbi_best(wd, scores, max_piece_len, max_word_len)
    wd = wd.filter(F.length("word") <= max_word_len)
    out = viterbi_path_pieces(wd, scores, max_piece_len, max_word_len, best)
    segs = out.groupBy("word", "cnt").agg(
        F.concat_ws(
            "|",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "piece"))),
                lambda x: x["piece"],
            ),
        ).alias("toks"),
        F.count("*").cast("bigint").alias("n_pieces"),
    )
    cost = wd.select(
        "word", F.length("word").cast("int").alias("pos")
    ).join(best, ["word", "pos"]).select("word", "cost_u")
    return segs.join(cost, "word")


def em_round(
    wd: DataFrame,
    scores: DataFrame,
    vocab_size: int,
    max_piece_len: int = 4,
    max_word_len: int = 8,
) -> DataFrame:
    """One hard-EM round (Kudo 2018 §3.2 with Viterbi counts in place of
    full forward-backward expectations — the deterministic 'hard'
    variant, documented deviation): the E-step counts each piece's usage
    on the Viterbi paths weighted by word cnt; the prune keeps the top
    `vocab_size` pieces by (cnt desc, piece asc) — a TakeOrdered limit,
    no global window — plus ALWAYS every single character (coverage
    guarantee: a char dropped from the vocab would make some word
    unsegmentable next round); the M-step re-estimates add-one-smoothed
    scores over the kept set (the Laplace floor gives never-used single
    chars a finite logp). Returns (piece, cnt, logp_u)."""
    path = viterbi_path_pieces(wd, scores, max_piece_len, max_word_len)
    used = path.groupBy("piece").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    kept_top = used.orderBy(F.desc("cnt"), F.asc("piece")).limit(vocab_size)
    singles_extra = (
        scores.filter(F.length("piece") == 1)
        .select("piece")
        .join(kept_top, "piece", "left_anti")
        .join(used.withColumnRenamed("cnt", "used_cnt"), "piece", "left")
        .select(
            "piece",
            F.coalesce(F.col("used_cnt"), F.lit(0))
            .cast("bigint")
            .alias("cnt"),
        )
    )
    kept = kept_top.unionByName(singles_extra)
    tot = kept.agg(
        (F.sum("cnt") + F.count("*")).cast("bigint").alias("total")
    )
    return kept.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        _micro(F.log(F.col("cnt") + 1) - F.log("total")).alias("logp_u"),
    )


def train_hard_em(
    docs: DataFrame,
    vocab_size: int = 24,
    n_rounds: int = 2,
    text_col: str = "text",
    max_piece_len: int = 4,
    max_word_len: int = 8,
) -> DataFrame:
    """End-to-end unigram training: corpus → word dict → seed substring
    vocabulary → n_rounds of hard-EM (segment, count, prune, re-score).
    Returns the final (piece, cnt, logp_u) table — piece-vocab-sized."""
    wd = word_freq_dict(docs, text_col).localCheckpoint()
    scores = piece_scores(seed_pieces(wd, max_piece_len)).localCheckpoint()
    for _ in range(n_rounds):
        scores = em_round(
            wd, scores, vocab_size, max_piece_len, max_word_len
        ).localCheckpoint()
    return scores
