"""Relational BM25 summary vs a direct pure-Python port of the reference's
scoring (parser/summary.go:43-161): per-occurrence summation, idf floor at 0,
k1=1.2 b=0.75, the reference's mixed-unit length normalization (docLen =
kept-token count, avgDocLen = mean sentence BYTES), top-2 in original order,
300-rune truncation — plus the POS-weighted tokenizer chain and the
reference-exact (first-2) GenerateSummary mode."""

from __future__ import annotations

import math

import pytest

K1, B = 1.2, 0.75


def py_bm25_scores(
    sentences: list[str],
    weights: dict[str, float] | None = None,
    token_lists: list[list[tuple[str, float]]] | None = None,
) -> list[float]:
    """Direct port of calculateBM25Score (summary.go:43-74): iterate token
    OCCURRENCES (not distinct terms); docLen = len(vector) i.e. kept tokens
    (summary.go:45), avgDocLen = mean Go len(sent) i.e. BYTES
    (summary.go:121-127); df over sentences."""
    if token_lists is None:
        token_lists = [
            [(t, (weights or {}).get(t, 1.0)) for t in s.lower().split() if t]
            for s in sentences
        ]
    n = len(sentences)
    avg_len = sum(len(s.encode("utf-8")) for s in sentences) / n
    scores = []
    for toks in token_lists:
        score = 0.0
        doc_len = len(toks)
        surfaces = [t for t, _ in toks]
        for tok, w in toks:  # per occurrence, like the Go loop
            df = sum(1 for tl in token_lists if tok in [t for t, _ in tl])
            idf = max(0.0, math.log((n - df + 0.5) / (df + 0.5)))
            tf = surfaces.count(tok)
            score += idf * tf * (K1 + 1) / (
                tf + K1 * (1 - B + B * doc_len / avg_len)
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


def test_bm25_pos_weighted_matches_python_oracle(spark):
    """The full W1 chain on Japanese + mixed text: heuristic segmentation,
    POS tagging, broadcast dim_pos_weight join with prefix fallback,
    weight-0 drop (summary.go:186-241)."""
    from blogparser_spark.functions.jpos import tokenize_pos_py
    from blogparser_spark.operators.enrich import dim_pos_weight
    from blogparser_spark.operators.summary_bm25 import bm25_pos_sentence_scores

    sents = [
        "これは分散処理の基盤です",
        "Sparkはデータを高速に処理する",
        "遅い処理は最適化で速くなる",
        "カタカナトークンとkanji漢字が混ざる文123",
    ]
    rows = [("d", i, s) for i, s in enumerate(sents)]
    df = spark.createDataFrame(rows, "doc string, sent_idx int, sentence string")
    got = {
        r["sent_idx"]: r["score"]
        for r in bm25_pos_sentence_scores(df, dim_pos_weight(spark)).collect()
    }
    token_lists = [[(t, w) for t, _pos, w in tokenize_pos_py(s)] for s in sents]
    want = py_bm25_scores(sents, token_lists=token_lists)
    for i, w in enumerate(want):
        assert got[i] == pytest.approx(w, rel=1e-9), sents[i]


def test_pos_tokenizer_drops_function_words():
    from blogparser_spark.functions.jpos import tokenize_pos_py

    toks = tokenize_pos_py("これは分散処理の基盤です")
    surfaces = [t for t, _, _ in toks]
    assert "は" not in surfaces and "の" not in surfaces and "です" not in surfaces
    assert "分散処理" in surfaces  # kanji run → 名詞-一般
    pos = {t: p for t, p, _ in toks}
    assert pos["分散処理"] == "名詞-一般"
    w = {t: w for t, _, w in toks}
    assert w["分散処理"] == 1.5  # posWeights exact hit (summary.go:25)
    # latin + digits + katakana
    toks2 = dict((t, (p, w)) for t, p, w in tokenize_pos_py("Spark spark 123 データベース"))
    assert toks2["Spark"] == ("名詞-固有名詞", 2.0)
    assert toks2["spark"] == ("名詞-一般", 1.5)
    assert toks2["123"] == ("名詞-数", 1.0)  # prefix fallback 名詞→1.0
    assert toks2["データベース"] == ("名詞-固有名詞", 2.0)


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

    # ≤2 sentences → no scoring; the ORIGINAL text is truncated, delimiters
    # preserved (summary.go:110-112 returns `text`, not re-joined sentences)
    df = spark.createDataFrame(
        [("a", "first part。second part"), ("b", "x" * 400)],
        "doc string, text string",
    )
    got = {r["doc"]: r["summary"] for r in bm25_summary(df, "doc", "text").collect()}
    assert got["a"] == "first part。second part"
    assert got["b"] == "x" * 300 + "・・・"
    assert len(got["b"]) == 303


def test_generate_summary_reference_golden(spark):
    """The reference's ACTUAL selection behavior: first two sentences,
    regardless of score (summary.go:141-158 — `ranked` holds every index,
    so the order-preserving scan always takes sentences 0 and 1). Golden
    from summary_test.go:93-101."""
    from blogparser_spark.operators.summary_bm25 import generate_summary_reference

    df = spark.createDataFrame(
        [("g", "今日は天気です。明日は雨です。明後日は晴れです。")],
        "doc string, text string",
    )
    out = generate_summary_reference(df, "doc", "text").collect()[0]["summary"]
    assert out == "今日は天気です明日は雨です"


def test_lemma_deinflection_inflected_forms():
    """Suffix de-inflection: lemma ≠ surface on inflected verbs/adjectives
    (the reference's word.Lemma = kagome features[6], summary.go:216). The
    segmenter merges a kanji stem with a directly-attached inflection
    suffix so the rewritten lemma is the true dictionary form."""
    from blogparser_spark.functions.jpos import lemma_py, tokenize_pos_py

    # merged kanji+suffix tokens → true lemmas
    assert lemma_py("飛びます") == "飛ぶ"
    assert lemma_py("走りました") == "走る"
    assert lemma_py("嬉しかった") == "嬉しい"
    assert lemma_py("読んだ") == "読む"
    assert lemma_py("書いて") == "書く"
    assert lemma_py("話して") == "話す"
    # uninflected / ineligible tokens keep lemma = surface
    assert lemma_py("高い") == "高い"
    assert lemma_py("データベース") == "データベース"
    assert lemma_py("spark") == "spark"
    assert lemma_py("ました") == "ました"  # bare suffix: empty stem → no rule

    toks = dict((t, (p, w)) for t, p, w in tokenize_pos_py("鳥が飛びます。嬉しかった"))
    assert toks["飛ぶ"] == ("動詞-自立", 1.2)  # posWeights exact 動詞-自立
    assert toks["嬉しい"] == ("形容詞-自立", 1.2)
    assert "飛びます" not in toks and "嬉しかった" not in toks


def test_lemma_irregular_verbs_three_twins(spark):
    """Irregular する/来る forms don't follow the godan/ichidan suffix rows
    (します would suffix-rewrite to しる, きました to きる) — the exact-match
    IRREGULAR_LEMMAS stage must fire first, identically in all three twins
    (Spark Column, generated DuckDB SQL, pure Python)."""
    import duckdb
    from pyspark.sql import functions as F

    from blogparser_spark.functions import jpos
    from blogparser_spark.functions.jpos import IRREGULAR_LEMMAS, lemma_py

    assert lemma_py("します") == "する"
    assert lemma_py("しました") == "する"
    assert lemma_py("して") == "する"
    assert lemma_py("きました") == "くる"
    assert lemma_py("来ます") == "来る"
    # a suffix-rule token is untouched by the irregular stage
    assert lemma_py("話して") == "話す"
    assert lemma_py("走ります") == "走る"

    toks = sorted(IRREGULAR_LEMMAS) + ["話して", "飛びます", "高い", "は"]
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    got_spark = {
        r["t"]: r["l"]
        for r in df.select("t", jpos.lemma_of(F.col("t")).alias("l")).collect()
    }
    con = duckdb.connect()
    got_sql = dict(
        con.execute(
            "SELECT t, " + jpos.lemma_case_sql("t") + " FROM (SELECT unnest(?) AS t)",
            [toks],
        ).fetchall()
    )
    want = {t: lemma_py(t) for t in toks}
    assert got_spark == want
    assert got_sql == want
    # irregular lemmas carry verb POS downstream (kept, not dropped)
    pos = {
        r["t"]: r["p"]
        for r in df.select(
            "t",
            jpos.pos_of_lemma(
                F.col("t"), jpos.lemma_of(F.col("t"))
            ).alias("p"),
        ).collect()
    }
    assert pos["します"] == "動詞-自立" and pos["来ました"] == "動詞-自立"


def test_lemma_spark_matches_python_twin(spark):
    """Spark lemma/POS Columns vs the pure-Python twin on inflected text."""
    from pyspark.sql import functions as F

    from blogparser_spark.functions import jpos

    sents = [
        "鳥が飛びます",
        "昨日は走りました",
        "嬉しかったです",
        "本を読んだ後で手紙を書いて友達と話して高い山を見た",
        "Spark 123 データベース の処理",
    ]
    df = spark.createDataFrame([(s,) for s in sents], "sentence string")
    rows = (
        df.select(F.explode(jpos.segment(F.col("sentence"))).alias("surface"))
        .withColumn("lemma", jpos.lemma_of(F.col("surface")))
        .withColumn("pos", jpos.pos_of_lemma(F.col("surface"), F.col("lemma")))
        .collect()
    )
    import re

    from blogparser_spark.functions.jpos import SEGMENT_RE, _pos_py, lemma_py

    want = []
    for s in sents:
        for tok in re.findall(SEGMENT_RE, s):
            lemma = lemma_py(tok)
            pos = (
                ("形容詞-自立" if lemma.endswith("い") else "動詞-自立")
                if lemma != tok
                else _pos_py(tok)
            )
            want.append((tok, lemma, pos))
    got = [(r["surface"], r["lemma"], r["pos"]) for r in rows]
    assert sorted(got) == sorted(want)
    assert any(l != s for s, l, _ in got)  # de-inflection actually fired


def test_bm25_summary_custom_delim_routes_to_scoring(spark):
    """The few/many routing must count sentences with the CALLER's
    delimiter — counting with the default 。 on ascii text saw one
    'sentence' per doc and silently truncated instead of scoring."""
    from blogparser_spark.operators.summary_bm25 import bm25_summary

    text = "[.]".join(
        [
            "common words common words common words",
            "rare unique tokens zebra quark",
            "common words common words common words",
            "singular exotic lexeme phoenix griffin",
        ]
    )
    df = spark.createDataFrame([("d", text)], "doc string, text string")
    out = bm25_summary(df, "doc", "text", delim=r"\[\.\]").collect()[0]["summary"]
    s1, s3 = "rare unique tokens zebra quark", "singular exotic lexeme phoenix griffin"
    assert out == s1 + s3  # scored + original order, not a truncation of text


# Hand-labeled morphology gold: per sentence, the content lemmas a
# dictionary (kagome/IPA) tokenizer recovers, under the repo's documented
# merge convention (サ変 noun+する compounds merge into one verb token whose
# lemma is noun+する; okurigana lexicon words are single noun tokens). The
# first sentence is the reference's golden summary input
# (parser/summary_test.go:93-106).
MORPH_GOLD = [
    ("今日は天気です。明日は雨です。明後日は晴れです。",
     ["今日", "天気", "明日", "雨", "明後日", "晴れ"]),
    ("昨日は勉強しました", ["昨日", "勉強する"]),
    ("友達と話しました", ["友達", "話す"]),
    ("会議の準備して資料を確認します", ["会議", "準備する", "資料", "確認する"]),
    ("新しい本を読んだ", ["新しい", "本", "読む"]),
    ("東京へ旅行します", ["東京", "旅行する"]),
    ("データベースに書き込みしました", ["データベース", "書き込み", "する"]),
    ("お問い合わせは電話でお願いします", ["問い合わせ", "電話", "お願い", "する"]),
    ("鳥が飛びます", ["鳥", "飛ぶ"]),
    ("嬉しかった", ["嬉しい"]),
    ("Sparkで検索します", ["Spark", "検索する"]),
    ("気持ちいい天気です", ["気持ち", "いい", "天気"]),
    ("お振り込みの手続きをしました", ["振り込み", "手続き", "する"]),
    ("明日は曇りです", ["明日", "曇り"]),
    ("引っ越しの準備をします", ["引っ越し", "準備", "する"]),
    ("このラーメンはおいしいです", ["ラーメン", "おいしい"]),
    ("映画はたのしかったです", ["映画", "たのしい"]),
    # known residual: a particle-glued kana run hides its verb (できる
    # is unrecoverable without a lattice; the glued-run gate at least
    # keeps the mangled token out of the vectors)
    ("それはできないと思います", ["できる", "思う"]),
]


def test_morphology_parity_rate():
    """Per-token parity against the hand-labeled gold (multiset
    intersection of kept lemmas per sentence): the round-5 ambiguity
    lexicons (SURU_NOUNS compounds, okurigana SEGMENT_LEXICON, the
    particle split + KANA_LEXICON guard, adjective+copula de-inflection,
    the glued-run gate) reach 46/48 (0.958) where the pre-lexicon twin
    scored 24/42 on the original corpus. The two residuals are the
    honorific prefix merge (お願いします → 願い, not お願い) and a verb
    hidden inside a particle-glued kana run (それはできない…) — the
    documented lattice-morphology deviation's remaining surface."""
    from collections import Counter

    from blogparser_spark.functions.jpos import tokenize_pos_py

    total = matched = 0
    for sent, gold in MORPH_GOLD:
        got = Counter(t for t, _p, _w in tokenize_pos_py(sent))
        g = Counter(gold)
        matched += sum((got & g).values())
        total += sum(g.values())
    rate = matched / total
    assert (matched, total) == (46, 48), (matched, total)
    assert rate > 0.94
    # the specific ambiguities the lexicons decide
    from blogparser_spark.functions.jpos import lemma_py

    assert lemma_py("勉強しました") == "勉強する"  # サ変 compound
    assert lemma_py("話しました") == "話す"  # godan stays godan
    assert lemma_py("できました") == "できる"  # kana potential verb
    assert lemma_py("できない") == lemma_py("できなかった") == "できる"
    toks = [t for t, _p, _w in tokenize_pos_py("手続きをしました")]
    assert toks == ["手続き", "する"]  # particle split, no をす token
    # the split must NOT dismember copulas into phantom weighted verbs
    # (です → で+す gave ('す', 動詞, 1.2) before the KANA_LEXICON guard)
    assert tokenize_pos_py("これはペンです。") == [("ペン", "名詞-一般", 1.5)]
    assert [t for t, _p, _w in tokenize_pos_py("昨日は雨でした。")] == [
        "昨日", "雨"
    ]
    assert [t for t, _p, _w in tokenize_pos_py("明日は晴れでしょう")] == [
        "明日", "晴れ"
    ]
    assert [t for t, _p, _w in tokenize_pos_py("昨日は雨だった")] == [
        "昨日", "雨"
    ]


def test_morphology_lexicons_three_twins(spark):
    """The lexicon stages fire identically in all three twins (Spark
    Column, generated DuckDB SQL, pure Python) for both the lemma and the
    POS of lexicon/compound/split tokens."""
    import duckdb
    from pyspark.sql import functions as F

    from blogparser_spark.functions import jpos
    from blogparser_spark.functions.jpos import _pos_py, lemma_py

    toks = [
        "勉強しました", "旅行します", "確認して", "話しました", "出しました",
        "晴れ", "曇り", "問い合わせ", "気持ち", "買い物",
        "できました", "できる", "しました", "飛びます", "高い", "は",
    ]
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    got_spark = {
        r["t"]: (r["l"], r["p"])
        for r in df.select(
            "t",
            jpos.lemma_of(F.col("t")).alias("l"),
            jpos.pos_of(F.col("t")).alias("p"),
        ).collect()
    }
    con = duckdb.connect()
    got_sql = {
        t: (l, p)
        for t, l, p in con.execute(
            "SELECT t, " + jpos.lemma_case_sql("t") + ", "
            + jpos.pos_case_sql("t") + " FROM (SELECT unnest(?) AS t)",
            [toks],
        ).fetchall()
    }
    got_py = {t: (lemma_py(t), _pos_py(t)) for t in toks}
    assert got_spark == got_sql == got_py
    assert got_py["勉強しました"][0] == "勉強する"
    assert got_py["出しました"][0] == "出す"  # not in SURU_NOUNS → godan
    assert got_py["晴れ"] == ("晴れ", "名詞-一般")
