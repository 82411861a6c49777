"""Relational BM25 summary vs a direct pure-Python port of the reference's
scoring (parser/summary.go:43-161): per-occurrence summation, idf floor at 0,
k1=1.2 b=0.75, top-2 in original order, 300-rune truncation."""

from __future__ import annotations

import math

import pytest

K1, B = 1.2, 0.75


def py_bm25_scores(
    sentences: list[str], weights: dict[str, float] | None = None
) -> list[float]:
    """Direct port of calculateBM25Score (summary.go:43-74): iterate token
    OCCURRENCES (not distinct terms), per-term weight (getWordWeight analog,
    summary.go:227-241; default 1.0), df over sentences."""
    token_lists = [[t for t in s.lower().split() if t] for s in sentences]
    n = len(sentences)
    avg_len = sum(len(s) for s in sentences) / n
    scores = []
    for i, toks in enumerate(token_lists):
        score = 0.0
        for tok in toks:  # per occurrence, like the Go loop
            df = sum(1 for tl in token_lists if tok in tl)
            idf = max(0.0, math.log((n - df + 0.5) / (df + 0.5)))
            tf = toks.count(tok)
            w = (weights or {}).get(tok, 1.0)
            score += idf * tf * (K1 + 1) / (
                tf + K1 * (1 - B + B * len(sentences[i]) / avg_len)
            ) * w
        scores.append(score)
    return scores


@pytest.fixture(scope="module")
def sent_rows():
    return [
        ("d1", 0, "spark runs queries fast on big data"),
        ("d1", 1, "the optimizer rewrites queries for speed"),
        ("d1", 2, "pandas is slow for big data work loads"),
        ("d1", 3, "spark spark spark wins the benchmark race"),
        ("d2", 0, "one lonely sentence here"),
    ]


def test_bm25_scores_match_python_oracle(spark, sent_rows):
    from blogparser_spark.operators.summary_bm25 import bm25_sentence_scores

    df = spark.createDataFrame(sent_rows, "doc string, sent_idx int, sentence string")
    got = {
        (r["doc"], r["sent_idx"]): r["score"]
        for r in bm25_sentence_scores(df).collect()
    }
    d1 = [s for d, i, s in sent_rows if d == "d1"]
    want = py_bm25_scores(d1)
    for i, w in enumerate(want):
        assert got[("d1", i)] == pytest.approx(w, rel=1e-9)


def test_bm25_weights_dim_broadcast_join(spark, sent_rows):
    """W1 posWeights analog: term weights enter via a broadcast dim join and
    scale each occurrence's contribution."""
    from blogparser_spark.operators.summary_bm25 import bm25_sentence_scores

    df = spark.createDataFrame(sent_rows, "doc string, sent_idx int, sentence string")
    weights = {"spark": 2.0, "queries": 0.5}
    dim = spark.createDataFrame(list(weights.items()), "term string, weight double")
    got = {
        (r["doc"], r["sent_idx"]): r["score"]
        for r in bm25_sentence_scores(df, weights_dim=dim).collect()
    }
    d1 = [s for d, i, s in sent_rows if d == "d1"]
    want = py_bm25_scores(d1, weights)
    for i, w in enumerate(want):
        assert got[("d1", i)] == pytest.approx(w, rel=1e-9)


def test_bm25_summary_top2_original_order(spark):
    from blogparser_spark.operators.summary_bm25 import bm25_summary

    # sentences crafted so the two highest-scoring are idx 3 and 1 — the
    # summary must emit them in ORIGINAL order (1 then 3), summary.go:149-157
    text = "。".join(
        [
            "common words common words common words",
            "rare unique tokens zebra quark",
            "common words common words common words",
            "singular exotic lexeme phoenix griffin",
        ]
    )
    df = spark.createDataFrame([("d", text)], "doc string, text string")
    out = bm25_summary(df, "doc", "text").collect()[0]["summary"]
    s1, s3 = "rare unique tokens zebra quark", "singular exotic lexeme phoenix griffin"
    assert out == s1 + s3


def test_bm25_summary_few_sentences_truncation_path(spark):
    from blogparser_spark.operators.summary_bm25 import bm25_summary

    # ≤2 sentences → no scoring, pure concat+truncate (summary.go:110-112)
    df = spark.createDataFrame(
        [("a", "first part。second part"), ("b", "x" * 400)],
        "doc string, text string",
    )
    got = {r["doc"]: r["summary"] for r in bm25_summary(df, "doc", "text").collect()}
    assert got["a"] == "first partsecond part"
    assert got["b"] == "x" * 300 + "・・・"
    assert len(got["b"]) == 303
