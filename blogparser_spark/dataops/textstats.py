"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

These are corpus-hygiene stages a training-data pipeline runs before dedup /
filtering. All are pure native-Column expressions (JVM-side, whole-stage
codegen): at 100 TB the scan is the only cost — no shuffle, no Python
boundary. Filters composed from these columns push down to the parquet scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# whitespace tokens: documents payloads are space-separated words
TOKEN_SPLIT = " "
# BPE-ish lexer: letter runs | digit runs | single non-alnum-non-space —
# the shape a byte-pair pretokenizer produces (same regex runs in DuckDB/RE2)
BPE_ISH_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language stopword marker sets (public common function words);
# langid scores distinct-token overlap against each set
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "una", "es"),
    "fr": ("le", "la", "les", "de", "et", "des", "un", "une", "est", "dans"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "den", "von", "mit"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties dropped (split never yields NULL)."""
    return F.filter(F.split(col, TOKEN_SPLIT), lambda t: t != "")


def bpe_ish_tokens(col: Column) -> Column:
    """Sub-word-ish lexemes via regexp_extract_all — the token-count a BPE
    tokenizer's pretokenizer would see."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_REGEX), 0)


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens / n_bpe_tokens / n_chars / n_bytes / avg_token_len."""
    c = F.col(text_col)
    toks = tokens(c)
    return (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("n_bpe_tokens", F.size(bpe_ish_tokens(c)))
        .withColumn("n_chars", F.length(c))
        .withColumn("n_bytes", F.octet_length(c))
        .withColumn(
            "avg_token_len",
            F.round(
                F.aggregate(
                    toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
                )
                / F.greatest(F.size(toks), F.lit(1)),
                6,
            ),
        )
    )


def ascii_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII — the CJK-vs-Latin discriminator
    (CJK scripts don't use spaces, so token features alone fail there)."""
    ascii_len = F.length(F.regexp_replace(col, r"[^\x00-\x7f]", ""))
    return ascii_len / F.greatest(F.length(col), F.lit(1))


def _let(bound: Column, body) -> Column:
    """Let-binding (see dataops/dedup.py): evaluate `bound` once per row,
    reference it as a lambda variable — a subtree referenced k times would
    otherwise be duplicated k× in the generated code (whole-stage codegen
    compile measured ~50s cold for the naive langid+quality composition)."""
    return F.element_at(F.transform(F.array(bound), body), 1)


def lang_scores(col: Column) -> dict[str, Column]:
    """Distinct-token overlap with each language's marker set."""
    toks = F.array_distinct(tokens(F.lower(col)))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: CJK by ascii-ratio, else argmax marker overlap
    with ties broken alphabetically ascending (no markers → 'und').

    The argmax is a greatest() over (score, priority, lang) structs —
    lexicographic struct ordering gives the deterministic tie-break natively.
    The distinct-token array is let-bound so it appears once, not once per
    language, in the generated code."""
    c = F.col(text_col)
    langs = sorted(LANG_MARKERS)  # alphabetical; earlier lang wins ties

    def best_of(toks: Column) -> Column:
        structs = [
            F.struct(
                F.size(
                    F.array_intersect(
                        toks, F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
                    )
                ).alias("s"),
                F.lit(len(langs) - 1 - i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
        return F.greatest(*structs)

    best = _let(F.array_distinct(tokens(F.lower(c))), best_of)
    pred = (
        F.when(ascii_ratio(c) < 0.5, F.lit("zh"))
        .when(best["s"] <= 0, F.lit("und"))
        .otherwise(best["lang"])
    )
    return df.withColumn("lang_pred", pred)


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features + a composite score in [0,1]:
    length band, stopword presence, alpha ratio, mean token length band.
    The score is a filter key — a training pipeline drops quality < cutoff;
    expressed natively so the filter pushes into the scan. All token-derived
    quantities come out of ONE let-bound struct so the split/filter subtree
    appears once in the generated code."""
    c = F.col(text_col)
    all_markers = sorted({w for ws in LANG_MARKERS.values() for w in ws})

    feats = _let(
        tokens(F.lower(c)),
        lambda toks: F.struct(
            F.greatest(F.size(toks), F.lit(1)).alias("n"),
            F.size(F.filter(toks, lambda t: t.isin(*all_markers))).alias("n_stop"),
            F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)).alias(
                "tok_len_sum"
            ),
        ),
    )
    return _with_quality_from(df, c, feats)


def _with_quality_from(df: DataFrame, c: Column, feats: Column) -> DataFrame:
    n = feats["n"]
    stop_ratio = feats["n_stop"] / n
    alpha_ratio = F.length(F.regexp_replace(c, r"[^A-Za-zÀ-ɏ一-鿿]", "")) / F.greatest(
        F.length(c), F.lit(1)
    )
    len_band = F.when((F.length(c) >= 50) & (F.length(c) <= 10000), 1.0).otherwise(0.3)
    mean_tok = feats["tok_len_sum"] / n
    tok_band = F.when((mean_tok >= 2.0) & (mean_tok <= 12.0), 1.0).otherwise(0.4)
    score = F.round(
        0.3 * len_band
        + 0.3 * tok_band
        + 0.2 * F.least(stop_ratio * 4, F.lit(1.0))
        + 0.2 * alpha_ratio,
        6,
    )
    return (
        df.withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("alpha_ratio", F.round(alpha_ratio, 6))
        .withColumn("quality", score)
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_bigram_cutoff: float = 0.18,
    dup_trigram_cutoff: float = 0.30,
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1, the
    public repetition filters), adapted to word n-grams:

      top_bigram_frac  — occurrences of the most frequent bigram / bigrams
      dup_trigram_frac — fraction of trigram occurrences that are repeats
                         (1 - distinct/total)
      repetitive       — either fraction over its cutoff → drop candidate

    Shape — ONE pass, all codegen (CLAUDE.md rule 1: explode → native fns
    → partial hash aggs, no array HOFs, no join): posexplode the tokens
    once, build both gram sizes relationally with lead() over the per-doc
    window, stack() them into (n, gram) rows, then groupBy (id, n, gram)
    count → groupBy id. The narrow side is range-partitioned on the doc id
    BEFORE the fan-out (rule 4: a single-file scan would otherwise explode
    on one core) and RangePartitioning(id) satisfies the window's
    clustering requirement, so the window reuses that one exchange. Docs
    too short to form an n-gram contribute 0 fractions (posexplode_outer
    keeps the row; NULL grams are excluded from the fractions)."""
    from blogparser_spark.operators.skew import range_partition_for_windows

    parts = df.sparkSession.sparkContext.defaultParallelism
    t = range_partition_for_windows(df, parts, id_col).select(
        F.col(id_col), F.posexplode_outer(tokens(F.col(text_col))).alias("pos", "w")
    )
    win = Window.partitionBy(id_col).orderBy("pos")
    l1, l2 = F.lead("w", 1).over(win), F.lead("w", 2).over(win)
    g = t.select(
        F.col(id_col),
        F.when(l1.isNotNull(), F.concat_ws(" ", F.col("w"), l1)).alias("g2"),
        F.when(l2.isNotNull(), F.concat_ws(" ", F.col("w"), l1, l2)).alias("g3"),
    )
    per = (
        g.select(F.col(id_col), F.expr("stack(2, 2, g2, 3, g3) AS (n, g)"))
        .groupBy(id_col, "n", "g")
        .agg(F.count("*").alias("cnt"))
    )

    def _s(n: int, expr: Column) -> Column:
        live = (F.col("n") == n) & F.col("g").isNotNull()
        return F.sum(F.when(live, expr).otherwise(0))

    top_cnt = F.max(
        F.when((F.col("n") == 2) & F.col("g").isNotNull(), F.col("cnt")).otherwise(0)
    )
    return (
        per.groupBy(id_col)
        .agg(
            F.round(
                top_cnt / F.greatest(_s(2, F.col("cnt")), F.lit(1)), 6
            ).alias("top_bigram_frac"),
            F.round(
                (_s(3, F.col("cnt")) - _s(3, F.lit(1)))
                / F.greatest(_s(3, F.col("cnt")), F.lit(1)),
                6,
            ).alias("dup_trigram_frac"),
        )
        .withColumn(
            "repetitive",
            (F.col("top_bigram_frac") > top_bigram_cutoff)
            | (F.col("dup_trigram_frac") > dup_trigram_cutoff),
        )
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-normalized
    lowercase text (stable under incidental whitespace edits — the rolling
    hash analog with cross-engine-identical md5)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))


def tfidf_top_terms(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document TF-IDF keyword extraction: top-k terms by
    tf · (ln((N+1)/(df+1)) + 1) (smoothed idf, round-6), ties broken by
    term ascending. Emits (id, rank, term, tf, score).

    Shape — three partial hash aggs and one co-keyed join, no all-pairs:
    explode → (doc, term) counts (map-side combined) → per-term document
    frequency derived FROM the tf table (already one row per (doc, term),
    so df is a count, not a count-distinct) → join back on `term`, both
    sides already keyed on it → corpus size N attached as a broadcast
    1-row aggregate (no driver-side collect) → per-doc top-k window.
    Every shuffle key is a term or a doc id; at 10^12 turns the only
    wide state is the vocabulary-sized df table."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    n = df.agg(F.count("*").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n))
        .withColumn(
            "_idf",
            F.round(
                F.log((F.col("_n") + F.lit(1.0)) / (F.col("_df") + F.lit(1.0)))
                + F.lit(1.0),
                6,
            ),
        )
        .withColumn("score", F.round(F.col("tf") * F.col("_idf"), 6))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "score")
    )


def with_compression_ratio(
    df: DataFrame, text_col: str = "text", level: int = 6
) -> DataFrame:
    """zlib compression ratio per document (compressed/uncompressed bytes):
    the classic redundancy signal quality rulesets thresh on (highly
    repetitive machine-generated text compresses far below prose; random
    noise sits near 1). Runs as one Arrow-batched pandas UDF — zlib is
    C-speed and deterministic for a fixed level, so the pure-Python twin
    in the tests is byte-exact. Empty/NULL texts report ratio 1.0 (nothing
    to judge). No SQL engine exposes zlib, so this op is pytest-verified
    rather than DuckDB-oracled (like the streaming family)."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if t is None:
                return 1.0
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        return texts.map(one)

    return df.withColumn("compression_ratio", ratio(F.col(text_col)))


def compression_ratio_py(text: str | None, level: int = 6) -> float:
    """Pure-Python twin of with_compression_ratio (test oracle)."""
    import zlib

    if text is None:
        return 1.0
    raw = text.encode("utf-8")
    if not raw:
        return 1.0
    return round(len(zlib.compress(raw, level)) / len(raw), 6)


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_k: int = 30,
) -> DataFrame:
    """Corpus-level bigram collocations ranked by pointwise mutual
    information: pmi = ln( p(xy) / (p(x) p(y)) ) with p from corpus-wide
    unigram/bigram frequencies (Church & Hanks 1990).

    Tokens are lowercased [a-z0-9]+ runs so the unit is engine-neutral.
    Plan shape: one posexplode fan-out, a lead() window keyed by the doc
    (bounded partitions — a document's token count, never the corpus),
    then two partial hash aggs on vocab-sized grids; the totals join is a
    broadcast of a 1-row aggregate. No all-pairs anything; 100 TB safe.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda t: t != "",
            )
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    bi = toks.select(
        F.col("tok").alias("x"), F.lead("tok").over(w).alias("y")
    ).where(F.col("y").isNotNull())
    uni_counts = toks.groupBy(F.col("tok").alias("x")).agg(
        F.count("*").alias("n_x")
    )
    bi_counts = bi.groupBy("x", "y").agg(F.count("*").alias("n_xy"))
    totals = toks.agg(F.count("*").alias("t_uni")).crossJoin(
        bi.agg(F.count("*").alias("t_bi"))
    )
    joined = (
        bi_counts.where(F.col("n_xy") >= min_count)
        .join(uni_counts, "x")
        .join(
            uni_counts.select(F.col("x").alias("y"), F.col("n_x").alias("n_y")),
            "y",
        )
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.log(
        (F.col("n_xy") / F.col("t_bi"))
        / ((F.col("n_x") / F.col("t_uni")) * (F.col("n_y") / F.col("t_uni")))
    )
    scored = joined.select(
        F.concat_ws(" ", "x", "y").alias("bigram"),
        F.col("n_xy").alias("n_pair"),
        F.round(pmi, 6).alias("pmi"),
    )
    return scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(top_k)


def inverted_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_postings: int = 20,
) -> DataFrame:
    """Inverted-index posting lists: term -> document frequency, total term
    frequency, and the first `max_postings` doc ids in ascending order
    (joined to a string so the value is engine-canonical).

    Plan: explode -> per-(term, doc) partial count -> row_number window on
    (term, id) -> per-term agg collecting ONLY the rows ranked <= cap (the
    when() inside collect_list drops the rest as nulls BEFORE they reach
    the aggregation buffer — bounded reduce-side state on stop-word-like
    terms, the same discipline as the LSH bucket caps). The window and the
    agg share the term key, so the shuffle layout is reused. df/tf remain
    exact over ALL postings; only the sample list is capped."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda t: t != "",
            )
        ).alias("term"),
    )
    per_doc = toks.groupBy("term", "id").agg(F.count("*").alias("tf"))
    wr = Window.partitionBy("term").orderBy("id")
    ranked = per_doc.withColumn("rn", F.row_number().over(wr))
    agg = ranked.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("total_tf"),
        F.concat_ws(
            ",",
            F.sort_array(
                F.collect_list(
                    F.when(F.col("rn") <= max_postings, F.col("id"))
                )
            ),
        ).alias("postings_head"),
    )
    return agg.where(F.col("df") >= min_df)


def zipf_fit(
    df: DataFrame, text_col: str = "text", top_n: int = 200
) -> DataFrame:
    """Zipf/power-law fit of the token frequency distribution: OLS of
    ln(freq) on ln(rank) over the top_n terms — one row (n_terms, slope,
    intercept). A healthy natural-language corpus reads slope ~ -1;
    template/boilerplate-dominated corpora flatten or step. This is the
    vocabulary-distribution audit a training-data pipeline runs next to
    langid/quality.

    Shape: explode -> per-token partial count (the only corpus-sized
    stage), then a DISTRIBUTED top-n (orderBy+limit compiles to
    TakeOrderedAndProject: each partition keeps its local top_n and the
    driver merges n·partitions candidates — the vocabulary never funnels
    through one partition), a rank window over the <= top_n survivors,
    and a closed-form OLS aggregate. Ties rank deterministically by
    (count desc, token asc); float sums enter only in the final tiny
    aggregate
    (round-6, the entropy convention)."""
    toks = df.select(
        F.explode(
            F.filter(
                F.split(F.col(text_col), r"\s+"), lambda x: F.length(x) > 0
            )
        ).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    top = (
        counts.orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(top_n)
        .withColumn("rank", F.row_number().over(w))
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("cnt").cast("double"))
    agg = top.agg(
        F.count("*").alias("n_terms"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    n = F.col("n_terms").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    return agg.select(
        "n_terms",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


def oov_rate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 100,
) -> DataFrame:
    """Out-of-vocabulary audit: per document, the fraction of token
    OCCURRENCES not covered by the corpus's top-`vocab_size` vocabulary —
    (id, n_tokens, n_oov, oov_rate). High OOV flags encoding damage,
    boilerplate explosions, or language the tokenizer was not built for;
    the aggregate distribution is the coverage curve a vocab-size choice
    is judged by.

    Shape: the vocabulary is a DISTRIBUTED top-k over the per-token counts
    (orderBy+limit = TakeOrderedAndProject: local top-k per partition, a
    driver merge of k·partitions candidates — no single-partition window)
    broadcast back onto the exploded occurrences as a left join; per-doc
    coverage is one partial agg. Ties at the vocabulary boundary rank
    deterministically by (count desc, token asc). oov_rate is one
    exact-int division, round-6."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.col(text_col), r"\s+"), lambda x: F.length(x) > 0
            )
        ).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("_c"))
    vocab = (
        counts.orderBy(F.desc("_c"), F.asc("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("_in_vocab"))
    )
    j = toks.join(F.broadcast(vocab), "tok", "left")
    return j.groupBy(F.col("id").alias(id_col)).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
            .cast("double")
            / F.count("*"),
            6,
        ).alias("oov_rate"),
    )


# ------------------------------------------------------- Gopher rule bank ---

# Rae et al. 2021 ("Scaling Language Models: ... Gopher"), Table A1 — the
# canonical pre-training document filter bank. Thresholds are the paper's.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_BULLETS = ("- ", "* ", "• ")


def gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Per-document Gopher quality-rule evaluation: word-count band, mean
    word length band [3,10], symbol-to-word ratio ('#' and '...') <= 0.1,
    bullet-line fraction <= 0.9, ellipsis-line fraction <= 0.3, fraction of
    words with an alphabetic character >= 0.8, and >= 2 of the 8 Gopher
    stop words present — plus the conjunction `gopher_pass`.

    All rules are native Column expressions over ONE let-bound token struct
    and one let-bound line array (the split subtrees appear once in
    codegen); threshold comparisons run on UNROUNDED small-integer ratios
    so they are bit-equal across engines, and the reported fractions are
    round-6 for the oracle. No shuffle: at 100 TB this is scan-speed, and a
    `gopher_pass` filter pushes into the parquet scan."""
    c = F.col(text_col)

    tok_feats = _let(
        tokens(c),
        lambda toks: F.struct(
            F.size(toks).alias("n"),
            F.aggregate(
                toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
            ).alias("len_sum"),
            F.size(
                F.filter(toks, lambda t: F.length(F.regexp_replace(t, "[^A-Za-z]", "")) > 0)
            ).alias("n_alpha"),
            F.size(
                F.array_intersect(
                    F.array_distinct(F.transform(toks, F.lower)),
                    F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
                )
            ).alias("n_stop"),
        ),
    )
    line_feats = _let(
        F.filter(F.split(c, "\n"), lambda l: l != ""),
        lambda lines: F.struct(
            F.size(lines).alias("n_lines"),
            F.size(
                F.filter(
                    lines,
                    lambda l: F.array_contains(
                        F.array(*[F.ltrim(l).startswith(b) for b in GOPHER_BULLETS]),
                        True,
                    ),
                )
            ).alias("n_bullet"),
            F.size(
                F.filter(
                    lines,
                    lambda l: F.rtrim(l).endswith("...")
                    | F.rtrim(l).endswith("…"),
                )
            ).alias("n_ellipsis"),
        ),
    )

    n = F.col("_tf")["n"]
    n1 = F.greatest(n, F.lit(1))
    nl = F.greatest(F.col("_lf")["n_lines"], F.lit(1))
    hash_cnt = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    ell_cnt = (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / F.lit(3)
    mean_len = F.col("_tf")["len_sum"] / n1
    sym_ratio = (hash_cnt + ell_cnt) / n1
    bullet_frac = F.col("_lf")["n_bullet"] / nl
    ell_frac = F.col("_lf")["n_ellipsis"] / nl
    alpha_frac = F.col("_tf")["n_alpha"] / n1

    return (
        df.withColumn("_tf", tok_feats)
        .withColumn("_lf", line_feats)
        .select(
            F.col(id_col),
            n.cast("bigint").alias("n_words"),
            F.round(mean_len, 6).alias("mean_word_len"),
            F.round(sym_ratio, 6).alias("symbol_word_ratio"),
            F.round(bullet_frac, 6).alias("bullet_line_frac"),
            F.round(ell_frac, 6).alias("ellipsis_line_frac"),
            F.round(alpha_frac, 6).alias("alpha_word_frac"),
            F.col("_tf")["n_stop"].cast("bigint").alias("n_stop_hits"),
            ((n >= min_words) & (n <= max_words)).alias("pass_word_count"),
            ((mean_len >= 3) & (mean_len <= 10)).alias("pass_mean_word_len"),
            (sym_ratio <= 0.1).alias("pass_symbol_ratio"),
            (bullet_frac <= 0.9).alias("pass_bullet"),
            (ell_frac <= 0.3).alias("pass_ellipsis"),
            (alpha_frac >= 0.8).alias("pass_alpha"),
            (F.col("_tf")["n_stop"] >= 2).alias("pass_stopwords"),
            (
                (n >= min_words)
                & (n <= max_words)
                & (mean_len >= 3)
                & (mean_len <= 10)
                & (sym_ratio <= 0.1)
                & (bullet_frac <= 0.9)
                & (ell_frac <= 0.3)
                & (alpha_frac >= 0.8)
                & (F.col("_tf")["n_stop"] >= 2)
            ).alias("gopher_pass"),
        )
    )


def keyword_tags(
    docs: DataFrame,
    keyword_to_tag: dict[str, str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dictionary-based document tagging: map tokens through a broadcast
    (keyword → tag) dimension and collect each document's distinct tag
    set — the taxonomy-labeling pass (topic routing, compliance flags)
    that precedes per-tag sampling policies. The dim is bounded by
    construction (a curated dictionary), so the join is broadcast; the
    corpus moves only matched (id, tag) rows into one partial agg. Tags
    come back sorted and joined (the cross-engine array convention) with
    the match count."""
    spark = docs.sparkSession
    dim = spark.createDataFrame(
        sorted(keyword_to_tag.items()), "kw string, tag string"
    )
    occ = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("kw")
    ).join(F.broadcast(dim), "kw")
    return occ.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_keyword_hits"),
        F.array_join(F.array_sort(F.collect_set("tag")), ",").alias("tags"),
    )
