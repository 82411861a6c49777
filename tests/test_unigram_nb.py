"""Unigram-LM tokenizer (dataops/unigram.py) and multinomial Naive Bayes
classifier (dataops/nbayes.py): parity against pure-Python twins on tiny
fixtures, algebraic invariants, and plan contracts (broadcast dims, no
Window, no Python boundary)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from blogparser_spark.dataops import nbayes as nb
from blogparser_spark.dataops import unigram as ug
from blogparser_spark.dataops.lm import word_freq_dict

TEXTS = ["abab abc cab", "abab abab cab b", "cc abc abab"]


@pytest.fixture(scope="module")
def tiny_docs(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    df.cache().count()
    return df


def _py_seed(max_piece_len=3):
    words = Counter()
    for t in TEXTS:
        for w in t.split():
            words[w] += 1
    pieces = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for m in range(1, max_piece_len + 1):
                if i + m <= len(w):
                    pieces[w[i : i + m]] += c
    tot = sum(pieces.values())
    return words, {
        p: (c, math.floor((math.log(c) - math.log(tot)) * 1e6 + 0.5))
        for p, c in pieces.items()
    }


def _py_viterbi(w, scores, max_piece_len=3):
    best = {0: (0, -1)}
    for i in range(1, len(w) + 1):
        cands = []
        for m in range(1, max_piece_len + 1):
            j = i - m
            if j < 0 or j not in best:
                continue
            p = w[j:i]
            if p not in scores:
                continue
            cands.append((best[j][0] - scores[p][1], j))
        if cands:
            best[i] = min(cands)
    toks, pos = [], len(w)
    while pos > 0:
        prev = best[pos][1]
        toks.append(w[prev:pos])
        pos = prev
    return "|".join(reversed(toks)), len(toks), best[len(w)][0]


def test_unigram_seed_matches_python_twin(spark, tiny_docs):
    wd = word_freq_dict(tiny_docs)
    got = {
        r.piece: (r.cnt, r.logp_u)
        for r in ug.piece_scores(ug.seed_pieces(wd, 3)).collect()
    }
    _, exp = _py_seed(3)
    assert got == exp


def test_unigram_viterbi_matches_python_twin(spark, tiny_docs):
    wd = word_freq_dict(tiny_docs)
    scores = ug.piece_scores(ug.seed_pieces(wd, 3))
    rows = ug.viterbi_segments(wd, scores, 3, 8).collect()
    words, py_scores = _py_seed(3)
    assert {r.word for r in rows} == set(words)
    for r in rows:
        toks, n, cost = _py_viterbi(r.word, py_scores, 3)
        assert (r.toks, r.n_pieces, r.cost_u) == (toks, n, cost), r.word
        assert r.cnt == words[r.word]


def test_unigram_em_keeps_singles_and_caps_vocab(spark, tiny_docs):
    wd = word_freq_dict(tiny_docs)
    seed = ug.piece_scores(ug.seed_pieces(wd, 3))
    out = ug.em_round(wd, seed, vocab_size=2, max_piece_len=3).collect()
    pieces = {r.piece for r in out}
    # every single character of the corpus survives the prune
    for ch in set("".join(TEXTS)) - {" "}:
        assert ch in pieces
    # at most vocab_size multi-char pieces
    assert sum(1 for p in pieces if len(p) > 1) <= 2
    # smoothed scores: all finite negatives, ln-consistent with counts
    tot = sum(r.cnt for r in out) + len(out)
    for r in out:
        exp = math.floor(
            (math.log(r.cnt + 1) - math.log(tot)) * 1e6 + 0.5
        )
        assert r.logp_u == exp


def test_unigram_em_counts_conserve_word_mass(spark, tiny_docs):
    """E-step piece counts weighted by word cnt must sum to
    sum(word_cnt * n_pieces) of the segmentation — no path drops mass."""
    wd = word_freq_dict(tiny_docs)
    seed = ug.piece_scores(ug.seed_pieces(wd, 3))
    segs = ug.viterbi_segments(wd, seed, 3, 8)
    total = segs.agg(
        F.sum(F.col("cnt") * F.col("n_pieces")).alias("t")
    ).collect()[0]["t"]
    out = ug.em_round(wd, seed, vocab_size=1000, max_piece_len=3)
    assert sum(r.cnt for r in out.collect()) == total


def test_unigram_plan_no_window_no_python(spark, tiny_docs):
    wd = word_freq_dict(tiny_docs)
    seed = ug.piece_scores(ug.seed_pieces(wd, 3))
    out = ug.em_round(wd, seed, 4, 3, 8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # prune is TakeOrdered, argmin is min(struct)
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # piece scores join broadcast


def _py_nb(rows, n_buckets=32):
    """Pure-Python twin of nb_train/nb_predict over (id, label, text)."""
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def fold(i):
        return h(f"nb:{i}") % nb.NB_SPLIT_MOD

    labels = sorted({lab for _, lab, _ in rows})
    cnt = Counter()
    docs_per = Counter()
    for i, lab, t in rows:
        if fold(i) == 0:
            continue
        docs_per[lab] += 1
        for tok in t.lower().split():
            if tok:
                cnt[(lab, h(tok) % n_buckets)] += 1
    ctot = {lab: sum(c for (l, _), c in cnt.items() if l == lab) for lab in labels}
    w = {
        (lab, b): math.floor(
            (math.log(cnt.get((lab, b), 0) + 1) - math.log(ctot[lab] + n_buckets))
            * 1e6
            + 0.5
        )
        for lab in labels
        for b in range(n_buckets)
    }
    ntot = sum(docs_per.values())
    pr = {
        lab: math.floor(
            (math.log(docs_per.get(lab, 0) + 1) - math.log(ntot + len(labels)))
            * 1e6
            + 0.5
        )
        for lab in labels
    }
    preds = {}
    for i, lab, t in rows:
        if fold(i) != 0:
            continue
        toks = [tok for tok in t.lower().split() if tok]
        if not toks:
            continue
        scores = {
            c: pr[c] + sum(w[(c, h(tok) % n_buckets)] for tok in toks)
            for c in labels
        }
        preds[i] = (lab, min((-s, c) for c, s in scores.items())[1])
    return w, pr, preds


@pytest.fixture(scope="module")
def nb_docs(spark):
    rows = [
        (i, ["en", "de", "fr"][i % 3], TEXTS[i % len(TEXTS)] + f" w{i % 7}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    df.cache().count()
    return rows, df


def test_nb_train_matches_python_twin(spark, nb_docs):
    rows, df = nb_docs
    weights, priors = nb.nb_train(df)
    got_w = {(r.label, r.bucket): r.llw_u for r in weights.collect()}
    got_p = {r.label: r.prior_u for r in priors.collect()}
    exp_w, exp_p, _ = _py_nb(rows)
    assert got_w == exp_w
    assert got_p == exp_p
    # full spine: every (label, bucket) pair present exactly once
    assert len(got_w) == 3 * nb.NB_BUCKETS


def test_nb_predict_matches_python_twin(spark, nb_docs):
    rows, df = nb_docs
    weights, priors = nb.nb_train(df)
    pred = nb.nb_predict(df, weights, priors)
    got = {r.id: (r.label, r.pred) for r in pred.collect()}
    _, _, exp = _py_nb(rows)
    assert got == exp
    assert len(got) > 0  # the test fold is non-empty at n=60


def test_nb_confusion_totals(spark, nb_docs):
    rows, df = nb_docs
    weights, priors = nb.nb_train(df)
    conf = nb.nb_confusion(nb.nb_predict(df, weights, priors))
    n = sum(r.n_docs for r in conf.collect())
    _, _, exp = _py_nb(rows)
    assert n == len(exp)


def test_nb_predict_plan_broadcast_no_window(spark, nb_docs):
    _, df = nb_docs
    weights, priors = nb.nb_train(df)
    pred = nb.nb_predict(df, weights, priors)
    plan = pred._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # argmax is min(struct), not row_number
    assert "EvalPython" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # weights + priors dims


def test_unigram_em_counts_survive_pipe_in_tokens(spark):
    """EM piece counts aggregate from the raw backtrace rows, so a corpus
    token CONTAINING the '|' display delimiter is counted as one piece,
    never fragmented by re-splitting the joined string."""
    df = spark.createDataFrame(
        [(0, "a|b a|b xy"), (1, "a|b xy xy")], ["doc_id", "text"]
    )
    wd = word_freq_dict(df)
    seed = ug.piece_scores(ug.seed_pieces(wd, 3))
    out = {r.piece: r.cnt for r in
           ug.em_round(wd, seed, vocab_size=4, max_piece_len=3).collect()}
    # 'a|b' (3 chars, within max_piece_len) is its own most-likely piece:
    # it must be counted 3 times as ONE piece, and the fragment counts of
    # 'a'/'b' must NOT absorb its occurrences
    assert out.get("a|b") == 3
    # mass conservation against the segmentation's own totals
    segs = ug.viterbi_segments(wd, seed, 3, 8)
    total = segs.agg(
        F.sum(F.col("cnt") * F.col("n_pieces")).alias("t")
    ).collect()[0]["t"]
    full = ug.em_round(wd, seed, vocab_size=1000, max_piece_len=3)
    assert sum(r.cnt for r in full.collect()) == total


def test_nb_nondefault_buckets_thread_through(spark, nb_docs):
    """n_buckets=8 must shape the spine AND the token hashing on both the
    train and predict paths (regression: the bucketing once ignored it)."""
    rows, df = nb_docs
    weights, priors = nb.nb_train(df, n_buckets=8)
    got_w = {(r.label, r.bucket): r.llw_u for r in weights.collect()}
    assert len(got_w) == 3 * 8
    exp_w, _, exp_pred = _py_nb(rows, n_buckets=8)
    assert got_w == exp_w
    # token mass is conserved: counts sum equals train-fold token count
    n_train_toks = sum(
        len(t.split()) for i, _l, t in rows
        if __import__("hashlib").md5(f"nb:{i}".encode()).hexdigest()[:8]
        and int(__import__("hashlib").md5(f"nb:{i}".encode()).hexdigest()[:8], 16) % 5 != 0
    )
    assert sum(r.cnt for r in weights.collect()) == n_train_toks
    pred = nb.nb_predict(df, weights, priors, n_buckets=8)
    got = {r.id: (r.label, r.pred) for r in pred.collect()}
    assert got == exp_pred


def test_unigram_dp_is_one_shuffle_fused(spark, tiny_docs):
    """The whole Viterbi DP — every position AND the backtrace — runs in
    ONE groupBy("word") fold (the round-5 fusion): with the dictionary
    and scores pre-materialized, segmenting costs a bounded handful of
    jobs/stages, where the former 8-round forward + 8-round backtrace
    design measured 38 jobs / 67 stages on this same fixture. Counted
    via the status tracker over a dedicated job group."""
    wd = word_freq_dict(tiny_docs, "text").localCheckpoint()
    scores = ug.piece_scores(ug.seed_pieces(wd, 3)).localCheckpoint()
    sc = spark.sparkContext
    sc.setJobGroup("ug-fused", "viterbi fused-DP job count")
    try:
        ug.viterbi_segments(wd, scores, 3, 8).collect()
    finally:
        sc.setJobGroup("ug-fused-done", "")
    tracker = sc.statusTracker()
    jobs = tracker.getJobIdsForGroup("ug-fused")
    stages = set()
    for j in jobs:
        stages.update(tracker.getJobInfo(j).stageIds)
    assert 0 < len(jobs) <= 12, jobs
    assert len(stages) <= 20, sorted(stages)
